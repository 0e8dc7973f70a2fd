"""Minimal MJPEG-in-AVI (RIFF) container codec — pure stdlib/numpy.

Gives the video modality a REAL decode path (the reference treats
media as opaque blobs; SURVEY §2 multimodal row): an AVI demuxer that
walks the RIFF chunk tree to the ``movi`` list and yields the raw
JPEG payload of each ``00dc``/``00db`` frame, plus a matching muxer
so tests and benchmarks can synthesize deterministic videos with the
in-repo JPEG codec (ops/jpeg.py) — no external data, no ffmpeg.

Format knowledge is public (Microsoft RIFF/AVI spec; OpenDML). Only
the subset a single-video-stream MJPEG file uses is implemented:

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' 56  (dwMicroSecPerFrame, ..., dwTotalFrames, ...,
                    dwWidth, dwHeight)
        LIST <sz> 'strl'
          'strh' 56 ('vids', 'MJPG', ..., dwScale, dwRate, ...)
          'strf' 40 (BITMAPINFOHEADER)
      LIST <sz> 'movi'
        '00dc' <sz> <jpeg bytes>  (chunks pad to even offsets)

Real-world AVIs carry extra chunks (idx1, JUNK, INFO); the walker
skips anything it does not recognize, so those parse fine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class AviStream:
    """Demuxed MJPEG stream: raw JPEG payload per frame + timing."""

    frames: tuple[bytes, ...]
    width: int
    height: int
    fps: float

    @property
    def duration_ms(self) -> int:
        return int(len(self.frames) * 1000 / self.fps) if self.fps else 0


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def demux_avi(payload: bytes) -> AviStream:
    """Walk the RIFF tree; collect video-frame chunks and timing.

    Tolerant: unknown chunks are skipped by size, so files with idx1 /
    JUNK / INFO blocks demux fine. Raises ValueError on a non-AVI
    payload or a structurally truncated file.
    """
    payload = bytes(payload)
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    width = height = 0
    us_per_frame = 0
    scale = rate = 0

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, us_per_frame, scale, rate
        i = lo
        while i + 8 <= hi:
            fourcc = payload[i : i + 4]
            (sz,) = struct.unpack_from("<I", payload, i + 4)
            body_lo, body_hi = i + 8, min(i + 8 + sz, hi)
            if fourcc == b"LIST":
                # list type occupies the first 4 body bytes
                walk(body_lo + 4, body_hi)
            elif fourcc == b"avih" and sz >= 40:
                (us_per_frame,) = struct.unpack_from("<I", payload, body_lo)
                width, height = struct.unpack_from("<II", payload, body_lo + 32)
            elif fourcc == b"strh" and sz >= 32:
                if payload[body_lo : body_lo + 4] == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", payload, body_lo + 20
                    )
            elif fourcc[2:4] in (b"dc", b"db"):
                if i + 8 + sz > hi:
                    # a frame chunk whose declared size extends past the
                    # enclosing list/file bound is structural truncation
                    # — raise rather than clip a partial JPEG payload
                    # into the frame decoder (ADVICE r3, low)
                    raise ValueError(
                        f"truncated AVI: frame chunk at {i} declares "
                        f"{sz} bytes but only {hi - i - 8} remain"
                    )
                frames.append(payload[body_lo:body_hi])
            i = body_lo + sz + (sz & 1)  # chunks pad to even offsets

    walk(12, len(payload))
    if scale and rate:
        fps = rate / scale
    elif us_per_frame:
        fps = 1_000_000 / us_per_frame
    else:
        fps = 0.0
    return AviStream(tuple(frames), width, height, fps)


def mux_avi(frames: list[bytes], width: int, height: int, fps: int) -> bytes:
    """Assemble an MJPEG AVI from pre-encoded JPEG frame payloads."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0,  # maxbytes/sec, padding, flags
        len(frames), 0, 1, 0,  # total frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,  # dims + reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 10_000, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def synthesize_avi(
    asset_id: int, n_frames: int = 6, width: int = 32, height: int = 24,
    fps: int = 4,
) -> bytes:
    """Deterministic test video: per-frame gradient shifted by frame
    index, JPEG-encoded with the in-repo codec (ops/jpeg.py)."""
    from hbase_rdf_spark.ops.jpeg import encode_gray

    frames = []
    for f in range(n_frames):
        r = np.arange(height, dtype=np.float32)[:, None]
        c = np.arange(width, dtype=np.float32)[None, :]
        frames.append(encode_gray((asset_id * 31 + f * 16 + r * 3 + c) % 256))
    return mux_avi(frames, width, height, fps)

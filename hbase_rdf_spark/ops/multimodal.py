"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. Decode is a PLUGGABLE KERNEL per
modality: real, dependency-free codecs ship for PGM/PPM (Netpbm, pure
numpy), PNG (stdlib zlib + full scanline unfiltering), GIF
(pure-Python LZW), baseline JPEG (pure-numpy Huffman + IDCT,
ops/jpeg.py), and PCM WAV audio (stdlib ``wave``); only video (MP4 —
needs ffmpeg/pyav, absent in this container) uses a deterministic hash
stub swappable for a cv2/pyav kernel with zero plan changes. The
Spark-side contract that matters at 100 TB is real and tested:

- schema: (asset_id, modality, media: binary, meta: struct)
- partitioning: assets repartitioned by size-aware buckets so one huge
  video cannot skew a task (``repartitionByRange`` on (modality, size));
- batch shape: mapInPandas receives bounded Arrow batches
  (spark.sql.execution.arrow.maxRecordsPerBatch) so peak memory is
  batch_rows × max_asset_size;
- deterministic fake kernels keep the dataflow testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id bigint, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = "asset_id bigint, modality string, feature array<float>, n_bytes int"
FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_hash string"


# ---------------------------------------------------------------------------
# pluggable decode kernels
# ---------------------------------------------------------------------------
# The Spark contract (schema, size-balanced partitioning, bounded Arrow
# batches) is kernel-agnostic: a kernel only maps payload bytes ↔ a 2-D
# float32 array (rows × cols; audio decodes to 1 × n_samples). REAL
# kernels ship for PGM/PPM (Netpbm), PNG (stdlib zlib inflate + full
# scanline unfiltering), GIF (pure-Python LZW), baseline JPEG
# (pure-numpy Huffman + IDCT, ops/jpeg.py), and PCM WAV; only video
# (MP4 — needs ffmpeg/pyav, absent here) falls back to the
# deterministic hash stub, swappable for a cv2/pyav kernel with zero
# plan changes.


class HashStubKernel:
    """STUB decode for codec-bearing formats: hash-seeded 8×8 luma grid,
    deterministic so the dataflow is testable end to end."""

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer((h * 2)[:64], dtype=np.uint8)
            .reshape(8, 8)
            .astype(np.float32)
        )

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        m = dict(meta or {})
        return hashlib.sha256(
            arr.astype(np.float32).tobytes()
            + f"{m.get('width')}x{m.get('height')}".encode()
        ).digest()


class PgmKernel:
    """REAL Netpbm grayscale codec (P5 binary / P2 ASCII) in pure numpy.

    PGM needs no external library: header tokens (magic, width, height,
    maxval; '#' comments) followed by the raster. Proves the batch
    contract holds for an actual image decode."""

    @staticmethod
    def _tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
        toks, i = [], 0
        while len(toks) < n and i < len(payload):
            c = payload[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                toks.append(payload[i:j])
                i = j
        return toks, i + 1  # single whitespace after maxval precedes raster

    @staticmethod
    def _ascii_raster(payload: bytes, off: int, n: int) -> np.ndarray:
        """P2/P3 sample values: whitespace-separated ints, with '#'
        comments (running to end of line) stripped first."""
        import re

        body = re.sub(rb"#[^\n]*", b"", payload[off - 1 :])
        return np.array(body.split()[:n], dtype=np.uint16)

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        payload = bytes(payload)
        toks, off = self._tokens(payload, 4)
        magic, w, h = toks[0], int(toks[1]), int(toks[2])
        if magic == b"P5":
            raster = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off)
        elif magic == b"P2":
            raster = self._ascii_raster(payload, off, w * h)
        else:
            raise ValueError(f"not a PGM payload (magic {magic!r})")
        return raster.reshape(h, w).astype(np.float32)

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        h, w = arr.shape
        header = f"P5 {w} {h} 255\n".encode()
        return header + arr.clip(0, 255).astype(np.uint8).tobytes()

    @staticmethod
    def resample(arr: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
        """Nearest-neighbor resample via index mapping (vectorized)."""
        h, w = arr.shape
        ri = (np.arange(new_h) * h // new_h).clip(0, h - 1)
        ci = (np.arange(new_w) * w // new_w).clip(0, w - 1)
        return arr[np.ix_(ri, ci)]


class PpmKernel(PgmKernel):
    """REAL Netpbm COLOR codec (P6 binary / P3 ASCII) in pure numpy.

    RGB rasters decode to the shared 2-D float32 contract via ITU-R
    BT.601 luma (0.299 R + 0.587 G + 0.114 B), so every downstream
    stage (pooled features, nearest-neighbor resample) applies
    unchanged; encode replicates gray back to three channels. Header
    parsing (tokens, comments) is inherited from :class:`PgmKernel`.
    """

    _LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        payload = bytes(payload)
        toks, off = self._tokens(payload, 4)
        magic, w, h = toks[0], int(toks[1]), int(toks[2])
        if magic == b"P6":
            raster = np.frombuffer(
                payload, dtype=np.uint8, count=w * h * 3, offset=off
            )
        elif magic == b"P3":
            raster = self._ascii_raster(payload, off, w * h * 3)
        else:
            raise ValueError(f"not a PPM payload (magic {magic!r})")
        rgb = raster.reshape(h, w, 3).astype(np.float32)
        return rgb @ self._LUMA

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        h, w = arr.shape
        header = f"P6 {w} {h} 255\n".encode()
        gray = arr.clip(0, 255).astype(np.uint8)
        return header + np.repeat(gray[..., None], 3, axis=2).tobytes()


class PngKernel(PgmKernel):
    """REAL PNG codec in pure stdlib zlib + numpy — no imaging library.

    Decode: 8-bit depth, color types 0/2/6 (gray / RGB / RGBA),
    non-interlaced; all five scanline filters (None/Sub/Up/Average/
    Paeth) unfiltered per the PNG spec §9 (RFC 2083 §6.2-6.6). Color
    decodes to BT.601 luma like :class:`PpmKernel` so the shared 2-D
    float32 contract holds. Encode emits filter-0 grayscale.
    Nearest-neighbor ``resample`` inherited from :class:`PgmKernel`.
    """

    _SIG = b"\x89PNG\r\n\x1a\n"

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        import struct
        import zlib

        data = bytes(payload)
        if data[:8] != self._SIG:
            raise ValueError("not a PNG payload (bad signature)")
        pos, idat, ihdr = 8, [], None
        while pos + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            typ = data[pos + 4 : pos + 8]
            chunk = data[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                ihdr = chunk
            elif typ == b"IDAT":
                idat.append(chunk)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # length + type + data + CRC
        if ihdr is None or not idat:
            raise ValueError("PNG missing IHDR/IDAT")
        w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
            ">IIBBBBB", ihdr
        )
        if depth != 8 or inter != 0:
            raise ValueError(
                f"only 8-bit non-interlaced PNG supported "
                f"(depth={depth}, interlace={inter})"
            )
        ch = {0: 1, 2: 3, 6: 4}.get(ctype)
        if ch is None:
            raise ValueError(f"unsupported PNG color type {ctype}")
        raw = zlib.decompress(b"".join(idat))
        stride = w * ch
        out = np.zeros((h, stride), dtype=np.int32)
        prev = np.zeros(stride, dtype=np.int32)
        rp = 0
        for y in range(h):
            f = raw[rp]
            row = np.frombuffer(
                raw, np.uint8, stride, rp + 1
            ).astype(np.int32)
            rp += 1 + stride
            if f == 0:
                cur = row
            elif f == 2:  # Up
                cur = (row + prev) & 0xFF
            elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential
                cur = row.copy()
                for i in range(stride):
                    a = cur[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (
                            b if pb <= pc else c
                        )
                    cur[i] = (cur[i] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {f}")
            prev = cur
            out[y] = cur
        arr = out.reshape(h, w, ch).astype(np.float32)
        if ch == 1:
            return arr[..., 0]
        return arr[..., :3] @ PpmKernel._LUMA

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        import binascii
        import struct
        import zlib

        h, w = arr.shape
        g = arr.clip(0, 255).astype(np.uint8)
        raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            self._SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )


class GifKernel(PgmKernel):
    """REAL GIF codec in pure Python — LZW decompression per the GIF89a
    spec (variable code width, CLEAR/END codes, dictionary growth to
    4096), global/local color tables, BT.601 luma output. First frame
    only (animation = repeated image blocks); interlace unsupported.
    Encode emits a valid single-frame GIF with a genuine growing-LZW
    stream (grayscale palette), so round-trips exercise the dictionary
    paths. ``resample`` inherited from :class:`PgmKernel`.
    """

    @staticmethod
    def _lzw_decode(data: bytes, min_size: int) -> list[int]:
        clear, end = 1 << min_size, (1 << min_size) + 1
        total_bits = len(data) * 8
        pos, size = 0, min_size + 1
        # windowed LSB-first bit reader: O(n) — a whole-stream bigint
        # with per-code shifts is O(n^2) on megabyte LZW streams
        acc, acc_n, byte_i = 0, 0, 0
        table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
        next_code, prev = end + 1, None
        out: list[int] = []
        while pos + size <= total_bits:
            while acc_n < size:
                acc |= data[byte_i] << acc_n
                acc_n += 8
                byte_i += 1
            code = acc & ((1 << size) - 1)
            acc >>= size
            acc_n -= size
            pos += size
            if code == clear:
                size = min_size + 1
                table = [(i,) for i in range(clear)] + [(), ()]
                next_code, prev = end + 1, None
                continue
            if code == end:
                break
            if code < next_code and code < len(table):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + (prev[0],)
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + (entry[0],))
                next_code += 1
                if next_code == (1 << size) and size < 12:
                    size += 1
            prev = entry
        return out

    @staticmethod
    def _lzw_encode(indices: list[int], min_size: int) -> bytes:
        clear, end = 1 << min_size, (1 << min_size) + 1
        bits: list[tuple[int, int]] = []  # (code, width)
        size = min_size + 1
        table: dict[tuple[int, ...], int] = {
            (i,): i for i in range(clear)
        }
        next_code = end + 1
        bits.append((clear, size))
        w: tuple[int, ...] = ()
        for k in indices:
            wk = w + (k,)
            if wk in table:
                w = wk
                continue
            bits.append((table[w], size))
            if next_code < 4096:
                table[wk] = next_code
                next_code += 1
                # decoder grows when ITS next_code hits 2^size right
                # after consuming the code we just emitted — mirror it
                if next_code == (1 << size) + 1 and size < 12:
                    size += 1
            w = (k,)
        if w:
            bits.append((table[w], size))
        bits.append((end, size))
        out = bytearray()
        acc, acc_n = 0, 0  # windowed accumulator: O(n), not bigint O(n^2)
        for code, width in bits:
            acc |= code << acc_n
            acc_n += width
            while acc_n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                acc_n -= 8
        if acc_n:
            out.append(acc & 0xFF)
        return bytes(out) or b"\x00"

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        data = bytes(payload)
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF payload (bad signature)")
        packed = data[10]
        pos = 13
        palette = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            palette = np.frombuffer(
                data, np.uint8, n * 3, pos
            ).reshape(n, 3)
            pos += n * 3
        while pos < len(data):
            b = data[pos]
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                w = int.from_bytes(data[pos + 5 : pos + 7], "little")
                h = int.from_bytes(data[pos + 7 : pos + 9], "little")
                ipacked = data[pos + 9]
                pos += 10
                if ipacked & 0x40:
                    raise ValueError("interlaced GIF not supported")
                if ipacked & 0x80:
                    n = 2 << (ipacked & 0x07)
                    palette = np.frombuffer(
                        data, np.uint8, n * 3, pos
                    ).reshape(n, 3)
                    pos += n * 3
                if palette is None:
                    raise ValueError("GIF image without a color table")
                min_size = data[pos]
                pos += 1
                lzw = bytearray()
                while data[pos] != 0:
                    ln = data[pos]
                    lzw += data[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = self._lzw_decode(bytes(lzw), min_size)
                if len(idx) < w * h:
                    raise ValueError("GIF raster underflow")
                rgb = palette[np.asarray(idx[: w * h])].reshape(h, w, 3)
                return rgb.astype(np.float32) @ PpmKernel._LUMA
            elif b == 0x3B:  # trailer
                break
            else:
                raise ValueError(f"unknown GIF block 0x{b:02x}")
        raise ValueError("GIF contains no image block")

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        h, w = arr.shape
        g = arr.clip(0, 255).astype(np.uint8)
        out = bytearray(b"GIF89a")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0xF7, 0, 0])  # global 256-entry table, 8-bit
        out += bytes(v for i in range(256) for v in (i, i, i))  # gray
        out += b"\x2c" + bytes(4)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += b"\x00\x08"  # no local table; LZW min code size 8
        lzw = self._lzw_encode([int(x) for x in g.ravel()], 8)
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00\x3b"
        return bytes(out)


class JpegKernel(PgmKernel):
    """REAL baseline JPEG codec in pure numpy (ops/jpeg.py): SOF0
    grayscale/YCbCr decode to the luma plane (Huffman + dequant + IDCT,
    restart markers, byte unstuffing); encode emits a near-lossless
    grayscale baseline JPEG with custom canonical Huffman tables.
    Progressive (SOF2) raises. ``resample`` inherited."""

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        from hbase_rdf_spark.ops.jpeg import decode_luma

        return decode_luma(bytes(payload))

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        from hbase_rdf_spark.ops.jpeg import encode_gray

        return encode_gray(arr)


class WavKernel:
    """REAL PCM WAV decode via the stdlib ``wave`` module: 16-bit mono/
    stereo frames → 1 × n_samples float32 (uint8-scaled amplitudes, so
    the shared pooled-feature math applies unchanged)."""

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(bytes(payload))) as wf:
            raw = wf.readframes(wf.getnframes())
            width, n_ch = wf.getsampwidth(), wf.getnchannels()
        if width != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {width}")
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32)
        if n_ch > 1:
            samples = samples.reshape(-1, n_ch).mean(axis=1)
        return np.abs(samples.reshape(1, -1)) / 256.0

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        raise NotImplementedError("audio re-encode not needed by any operator")


class AviMjpegKernel:
    """REAL video decode: MJPEG-in-AVI demux (ops/video.py RIFF
    walker) + in-repo baseline-JPEG frame decode (ops/jpeg.py).
    ``decode`` returns the first frame's luma plane so the shared
    pooled-feature math applies unchanged; per-frame access goes
    through :func:`sample_frames`."""

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        from hbase_rdf_spark.ops.jpeg import decode_luma
        from hbase_rdf_spark.ops.video import demux_avi

        stream = demux_avi(bytes(payload))
        if not stream.frames:
            raise ValueError("AVI payload contains no video frames")
        return decode_luma(stream.frames[0])

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        from hbase_rdf_spark.ops.jpeg import encode_gray
        from hbase_rdf_spark.ops.video import mux_avi

        h, w = arr.shape
        return mux_avi([encode_gray(arr)], w, h, fps=1)


class SniffingKernel:
    """Default kernel: dispatch DECODE on payload magic bytes to the
    matching REAL codec (PNG/GIF/JPEG/PGM/PPM/WAV/AVI); unknown
    payloads (e.g. the synthetic test fixtures) fall back to the
    deterministic hash stub. Encode: PNG for images (real + lossless),
    stub otherwise — re-encode format needs no source-format
    knowledge. RIFF disambiguates on the format tag at offset 8
    (``AVI `` vs ``WAVE``)."""

    def __init__(self, encode_kernel: object | None = None):
        self._kernels = [
            (( b"\x89PNG",), PngKernel()),
            ((b"GIF87a", b"GIF89a"), GifKernel()),
            ((b"\xff\xd8",), JpegKernel()),
            ((b"P5", b"P2"), PgmKernel()),
            ((b"P6", b"P3"), PpmKernel()),
        ]
        self._wav = WavKernel()
        self._avi = AviMjpegKernel()
        self._stub = HashStubKernel()
        self._enc = encode_kernel

    def _route(self, payload: bytes):
        head = bytes(payload[:12])
        if head.startswith(b"RIFF"):
            return self._avi if head[8:12] == b"AVI " else self._wav
        for magics, kern in self._kernels:
            if head.startswith(magics):
                return kern
        return self._stub

    def decode(self, payload: bytes, meta=None) -> np.ndarray:
        return self._route(bytes(payload)).decode(payload, meta)

    def encode(self, arr: np.ndarray, meta=None) -> bytes:
        return (self._enc or self._stub).encode(arr, meta)

    resample = staticmethod(PgmKernel.resample)


#: default kernel registry — every modality decodes REAL formats via
#: magic-byte sniffing (image: PNG/GIF/JPEG/PGM/PPM; audio: PCM WAV;
#: video: MJPEG-in-AVI); unknown payloads (synthetic fixtures, codecs
#: not in this container like H.264/MP4) fall back to the
#: deterministic hash stub
DEFAULT_KERNELS: dict[str, object] = {
    "image": SniffingKernel(),
    "audio": SniffingKernel(),
    "video": SniffingKernel(),
}


def _pooled_feature(arr: np.ndarray, feature_dim: int) -> list[float]:
    """Shared post-decode math — identical for every kernel, so a
    kernel swap changes ONLY the decode step."""
    v = arr.mean(axis=0)
    return (np.resize(v, feature_dim) / 255.0).astype(np.float32).tolist()


def extract_features(
    assets: DataFrame,
    feature_dim: int = 16,
    kernels: dict[str, object] | None = None,
) -> DataFrame:
    """binary media → fixed-dim feature vector, Arrow-batched.

    ``kernels`` maps modality → decode kernel (default: the stub
    registry; pass e.g. ``{"image": PgmKernel()}`` for real decoding).
    The hot path keeps one Python roundtrip; everything inside the
    batch is vectorized numpy over the decoded arrays.
    """
    ks = {**DEFAULT_KERNELS, **(kernels or {})}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, sizes = [], []
            for payload, mod in zip(b["media"], b["modality"]):
                arr = ks[mod].decode(bytes(payload))
                feats.append(_pooled_feature(arr, feature_dim))
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "modality": b["modality"],
                    "feature": feats,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return size_balanced(assets).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    MJPEG-in-AVI payloads take the REAL path: RIFF demux
    (ops/video.py), pick every ``every_ms``-th frame from the stream's
    own fps, JPEG-decode it (ops/jpeg.py) and hash the decoded luma
    plane — so ``frame_hash`` identifies frame CONTENT, invariant to
    container re-muxing. Other containers (H.264/MP4 — codecs absent
    here) keep the deterministic payload-hash stub with the identical
    batch contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_rdf_spark.ops.jpeg import decode_luma
        from hbase_rdf_spark.ops.video import demux_avi, is_avi

        for b in batches:
            rows = []
            for aid, payload, meta in zip(b["asset_id"], b["media"], b["meta"]):
                payload = bytes(payload)
                if is_avi(payload):
                    stream = demux_avi(payload)
                    step = max(
                        1, round(every_ms * stream.fps / 1000.0)
                    ) if stream.fps else 1
                    for i in range(0, len(stream.frames), step):
                        luma = decode_luma(stream.frames[i])
                        h = hashlib.sha256(
                            luma.astype(np.uint8).tobytes()
                        ).hexdigest()[:16]
                        rows.append((int(aid), i, h))
                    continue
                dur = (meta or {}).get("duration_ms") or 0
                n = max(1, dur // every_ms)
                base = hashlib.sha256(payload).hexdigest()[:16]
                for i in range(int(n)):
                    rows.append((int(aid), i, f"{base}-{i}"))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_hash"])

    videos = assets.filter(F.col("modality") == "video")
    return size_balanced(videos).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id bigint, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)


def resize_images(
    assets: DataFrame,
    max_side: int = 256,
    kernel: object | None = None,
) -> DataFrame:
    """Image resize: payload → payload with clamped dimensions.

    ``kernel=None`` uses the hash stub (formats whose codecs aren't in
    this container); ``kernel=PgmKernel()`` performs a REAL
    decode → nearest-neighbor resample → re-encode under the identical
    batch contract. Metadata dims are always updated for real,
    preserving aspect ratio, so downstream partitioning/pruning logic
    over meta is fully exercised either way.
    """
    k = kernel or HashStubKernel()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for aid, mod, payload, meta in zip(
                b["asset_id"], b["modality"], b["media"], b["meta"]
            ):
                m = dict(meta or {})
                w, h = m.get("width") or 0, m.get("height") or 0
                if mod == "image" and max(w, h) > max_side:
                    scale = max_side / max(w, h)
                    m["width"] = max(1, int(w * scale))
                    m["height"] = max(1, int(h * scale))
                    if isinstance(k, HashStubKernel):
                        # stand-in for the resampled pixel buffer
                        payload = hashlib.sha256(
                            bytes(payload)
                            + f"{m['width']}x{m['height']}".encode()
                        ).digest()
                    else:
                        arr = k.decode(bytes(payload))
                        arr = PgmKernel.resample(arr, m["height"], m["width"])
                        payload = k.encode(arr, m)
                rows.append(
                    (
                        int(aid), mod, bytearray(payload),
                        (
                            m.get("width"), m.get("height"),
                            m.get("sample_rate"), m.get("duration_ms"),
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "modality", "media", "meta"]
            )

    return size_balanced(assets).mapInPandas(run, schema=RESIZE_SCHEMA)


def size_balanced(assets: DataFrame, partitions: int | None = None) -> DataFrame:
    """Range-partition by (modality, payload size): large assets spread
    across tasks instead of hash-clumping — the skew guard for binary
    columns."""
    n = partitions or int(
        assets.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return assets.withColumn("_sz", F.length("media")).repartitionByRange(
        n, "modality", "_sz"
    ).drop("_sz")


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 13)
        modality = ["image", "audio", "video"][i % 3]
        meta = (
            64 + i % 32, 48 + i % 16,
            16000 if modality == "audio" else 0,
            3000 + 500 * (i % 7) if modality == "video" else 0,
        )
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)

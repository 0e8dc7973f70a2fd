"""Baseline JPEG codec in pure numpy — no imaging library.

Decoder: baseline sequential DCT JPEGs (SOF0), 8-bit, grayscale or
YCbCr with any sampling factors; restart markers and 0xFF00 byte
stuffing handled. Returns the LUMA (Y) plane as float32 — chroma
blocks are entropy-decoded (the bitstream demands it) and discarded,
which matches the multimodal contract (2-D luma arrays, see
ops/multimodal.py). Progressive (SOF2) and arithmetic coding raise.

Encoder: single-component (grayscale) baseline JPEG with CUSTOM
canonical Huffman tables (embedded via DHT — any valid table is legal)
and a unit quantization table, so decode(encode(x)) is near-lossless
and round-trips exercise the full marker/Huffman/DCT path without
needing the spec's Annex-K constants.

Implements ITU-T T.81: B.2 marker syntax, F.2 decoding procedures
(EXTEND, DECODE, ZRL/EOB), A.3.3 DCT.
"""

from __future__ import annotations

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: spatial = C.T @ coef @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_C = _dct_matrix()


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (RSTn handled by the
    caller via ``restart()``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: feed 1-bits (padding convention) so a
                # final partial MCU can flush; caller detects markers
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2  # FF Dn


class _Huff:
    """Canonical Huffman decoder from DHT (BITS[16] + HUFFVAL)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def decode_luma(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to its float32 luma plane (h × w)."""
    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        m = d[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:  # EOI
            break
        ln = int.from_bytes(d[pos + 2 : pos + 4], "big")
        seg = d[pos + 4 : pos + 2 + ln]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables not supported")
                qt[tq] = np.frombuffer(
                    seg, np.uint8, 64, i + 1
                ).astype(np.float32)
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, vals)
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({
                    "id": cid, "hs": samp >> 4, "vs": samp & 0x0F,
                    "tq": tq,
                })
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline SOF0 supported (got SOF 0x{m:02x})"
            )
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            order = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"], comp["ac"] = tabs >> 4, tabs & 0x0F
                order.append(comp)
            br = _BitReader(d, pos + 2 + ln)
            return _decode_scan(
                br, order, qt, huff_dc, huff_ac, w, h, restart_interval
            )
        pos += 2 + ln
    raise ValueError("JPEG contains no scan")


def _decode_scan(br, order, qt, huff_dc, huff_ac, w, h, dri):
    hmax = max(c["hs"] for c in order)
    vmax = max(c["vs"] for c in order)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # the first scan component is Y by JFIF convention
    luma = order[0]
    lw, lh = mcux * 8 * luma["hs"], mcuy * 8 * luma["vs"]
    plane = np.zeros((lh, lw), dtype=np.float32)
    pred = {c["id"]: 0 for c in order}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                br.restart()
                pred = {c["id"]: 0 for c in order}
            n_mcu += 1
            for c in order:
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = _decode_block(
                            br, huff_dc[c["dc"]], huff_ac[c["ac"]],
                            qt[c["tq"]], pred, c["id"],
                        )
                        if c is luma:
                            y0 = (my * c["vs"] + by) * 8
                            x0 = (mx * c["hs"] + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
    return plane[:h, :w]


def _decode_block(br, hdc, hac, q, pred, cid):
    coef = np.zeros(64, dtype=np.float32)
    t = hdc.decode(br)
    diff = _extend(br.read(t), t) if t else 0
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = hac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        coef[k] = _extend(br.read(s), s)
        k += 1
    dq = coef * q
    block = np.zeros(64, dtype=np.float32)
    block[_ZIGZAG] = dq
    return _C.T @ block.reshape(8, 8) @ _C + 128.0


# -- encoder (grayscale, custom canonical tables) ----------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-padding


# custom canonical tables: 12 DC symbols at 5 bits, 256 AC symbols at
# 9 bits — valid (all-ones code unused at each length), no Annex-K
# constants required
_DC_BITS = [0, 0, 0, 0, 13] + [0] * 11  # DC sizes 0-12 (diff range ±2047 at unit quant)
_DC_VALS = bytes(range(13))
# 253 nine-bit + 3 ten-bit codes = 256 symbols; canonical assignment
# leaves the all-ones code unused at both lengths (T.81 C.2)
_AC_BITS = [0] * 8 + [253, 3] + [0] * 6
_AC_VALS = bytes(range(256))


def _codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_block(
    bw: _BitWriter, block: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Forward-DCT + unit-quantize + entropy-encode one 8×8 spatial
    block (values 0-255); returns the new DC predictor."""
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.round(coef.reshape(64)[_ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = int(abs(diff)).bit_length()
    c, ln = dc_codes[t]
    bw.write(c, ln)
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        bw.write(mag & ((1 << t) - 1), t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        sz = int(abs(v)).bit_length()
        c, ln = ac_codes[(run << 4) | sz]
        bw.write(c, ln)
        mag = v if v >= 0 else v + (1 << sz) - 1
        bw.write(mag & ((1 << sz) - 1), sz)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return pred


def encode_gray(arr: np.ndarray) -> bytes:
    """Grayscale baseline JPEG with unit quantization (near-lossless)."""
    import struct

    h, w = arr.shape
    q = np.ones(64, dtype=np.float32)
    dc_codes = _codes(_DC_BITS, _DC_VALS)
    ac_codes = _codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.zeros((ph, pw), dtype=np.float32)
    img[:h, :w] = np.clip(arr, 0, 255)
    img[h:, :w] = img[h - 1 : h, :w]  # edge-pad
    img[:, w:] = img[:, w - 1 : w]

    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            pred = _encode_block(
                bw, img[y0 : y0 + 8, x0 : x0 + 8], pred,
                dc_codes, ac_codes,
            )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + q.astype(np.uint8).tobytes())
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + _DC_VALS
        + b"\x10" + bytes(_AC_BITS) + _AC_VALS,
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )

"""Pure-stdlib + numpy baseline JPEG codec.

Closes the last common image codec behind ``decode_image``'s
ValueError contract (PNG and WAV are already native): baseline
sequential DCT (SOF0), 8-bit samples, Huffman entropy coding,
grayscale or YCbCr with sampling factors 1-2 per axis (4:4:4 /
4:2:2 / 4:2:0), DRI/RSTn restart intervals. Out of scope — and
rejected with a precise ValueError so callers know what they fed in:
progressive (SOF2), arithmetic coding, 12-bit precision, hierarchical
modes.

Decoding pipeline: marker parse (DQT/SOF0/DHT/SOS/DRI) -> canonical
Huffman decode of the entropy stream (byte-unstuffing 0xFF00, DC
predictors reset at restarts) -> dequantize -> un-zigzag -> exact
orthonormal 8x8 IDCT in numpy -> nearest-neighbor chroma upsample ->
JFIF YCbCr->RGB. The per-symbol bit loop is python (entropy decode is
inherently serial within a scan); everything after coefficients is
vectorized numpy. In the engine this runs inside mapInPandas batches
— the Arrow batch axis is the distribution lever, same contract as
the PNG codec's per-row filter loop.

The encoder exists so tests can round-trip without PIL in the
container: Annex-K quant tables scaled by quality, the standard
Huffman tables, optional 2x2-averaged 4:2:0. Every byte it emits is a
spec-conformant interchange JPEG (tables embedded in DQT/DHT), so the
decoder is exercised through the same marker surface a camera file
uses.

Reference analog: the plugin stores opaque documents and delegates
media handling entirely (SURVEY §2 multimodal extension row); this
module is the training-data-pipeline decode step.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal DCT-II basis: IDCT = M.T @ coef @ M, FDCT = M @ x @ M.T
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.125) if _u == 0 else 0.5
        _DCT_M[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# standard Huffman tables (Annex K.3.3): (BITS[1..16], HUFFVAL)
_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def idct2(coef: np.ndarray) -> np.ndarray:
    """Exact orthonormal 2-D 8x8 inverse DCT."""
    return _DCT_M.T @ coef @ _DCT_M


def fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


# ------------------------------------------------------------- huffman

def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical order (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2           # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _HitRestart()     # caller realigns
            else:
                # EOI / next marker: pad with 1-bits (spec behavior
                # for the final truncated byte)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_restart(self) -> None:
        """Skip to just after the next RSTn marker; drop partial bits."""
        self.acc = self.nbits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _HitRestart(Exception):
    pass


def _decode_huff(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("JPEG: invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: low-order `size` bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# -------------------------------------------------------------- decode

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w) grayscale or
    (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:              # EOI
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:              # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:                  # 16-bit table
                    vals = np.frombuffer(seg[i:i + 128],
                                         dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64],
                                         dtype=np.uint8).astype(np.int64)
                    i += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals        # store natural order
                qt[tq] = t
        elif marker == 0xC4:            # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = \
                    _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:            # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("JPEG: 1 or 3 components only")
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                raise ValueError("JPEG: sampling factors 1-2 only")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG: only baseline sequential (SOF0) is supported — "
                f"got SOF marker 0x{marker:02X} (progressive/extended)")
        elif marker == 0xDD:            # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:            # SOS
            ns = seg[0]
            scan_map = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan_map[cs] = (tt >> 4, tt & 15)
            return _decode_scan(payload, pos, w, h, comps, scan_map,
                                qt, huff_dc, huff_ac, restart_interval)
        # APPn/COM/others: skipped
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(data: bytes, pos: int, w: int, h: int, comps, scan_map,
                 qt, huff_dc, huff_ac, restart_interval: int
                 ) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.align_past_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                tdc, tac = scan_map[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            zz = _decode_block(r, huff_dc[tdc],
                                               huff_ac[tac], pred, ci)
                        except _HitRestart:
                            # restart hit mid-fill (truncated-stream
                            # guard); realign and retry the block
                            r.align_past_restart()
                            pred = [0] * len(comps)
                            zz = _decode_block(r, huff_dc[tdc],
                                               huff_ac[tac], pred, ci)
                        coef = np.zeros(64, dtype=np.float64)
                        # zz is zigzag-ordered; q natural — align both
                        coef[ZIGZAG] = zz * q[ZIGZAG]
                        px = idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # nearest-neighbor upsample to full resolution
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(r: _BitReader, tdc: dict, tac: dict, pred: list,
                  ci: int) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = _decode_huff(r, tdc)
    diff = _extend(r.receive(size), size)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff(r, tac)
        rrun, ssize = rs >> 4, rs & 15
        if ssize == 0:
            if rrun == 15:              # ZRL
                k += 16
                continue
            break                       # EOB
        k += rrun
        if k > 63:
            raise ValueError("JPEG: AC run overflows block")
        zz[k] = _extend(r.receive(ssize), ssize)
        k += 1
    return zz


# -------------------------------------------------------------- encode

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_block(wtr: _BitWriter, zz: np.ndarray, pred: int,
                  enc_dc: dict, enc_ac: dict) -> int:
    def mag(v: int) -> tuple[int, int]:
        size = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << size) - 1
        return size, bits

    diff = int(zz[0]) - pred
    size, bits = mag(diff)
    code, ln = enc_dc[size]
    wtr.write(code, ln)
    if size:
        wtr.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = enc_ac[0x00]     # EOB
                wtr.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = enc_ac[0xF0]     # ZRL
                wtr.write(code, ln)
                run = 0
            continue
        size, bits = mag(v)
        code, ln = enc_ac[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(bits, size)
        run = 0
    return int(zz[0])


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 85,
                         subsampling: str = "4:4:4",
                         restart_interval: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, 3) RGB -> baseline JFIF JPEG bytes.
    ``subsampling``: '4:4:4' or '4:2:0' (2x2-averaged chroma).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline needs uint8 input")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg_baseline needs (h,w) or (h,w,3)")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    h, w = arr.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = 128.0 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1] \
            + 0.5 * a[..., 2]
        cr = 128.0 + 0.5 * a[..., 0] - 0.418688 * a[..., 1] \
            - 0.081312 * a[..., 2]
        if subsampling == "4:2:0":
            def down(p):
                ph = p[:2 * (p.shape[0] // 2), :2 * (p.shape[1] // 2)]
                if ph.size == 0:        # 1-pixel edge fallback
                    ph = p
                d = (ph[0::2, 0::2] + ph[1::2, 0::2]
                     + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
                return d
            cb, cr = down(cb), down(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), p in zip(samp, planes):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        q = np.empty((ph, pw), dtype=np.float64)
        q[:p.shape[0], :p.shape[1]] = p
        q[p.shape[0]:, :p.shape[1]] = p[-1:, :]      # edge replicate
        q[:, p.shape[1]:] = q[:, p.shape[1] - 1:p.shape[1]]
        padded.append(q)

    enc_dc = [_build_encode_table(*_STD_DC_LUMA),
              _build_encode_table(*_STD_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_STD_AC_LUMA),
              _build_encode_table(*_STD_AC_CHROMA)]
    wtr = _BitWriter()
    pred = [0] * len(planes)
    qtabs = [ql, qc]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                q = qtabs[qsel[ci]]
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.round(fdct2(blk) / q.reshape(8, 8)
                                        ).astype(np.int64)
                        zz = coef.reshape(64)[ZIGZAG]
                        pred[ci] = _encode_block(
                            wtr, zz, pred[ci],
                            enc_dc[tsel], enc_ac[tsel])
    wtr.flush()

    out = bytearray(b"\xff\xd8")                     # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tq, tab):
        zz = tab.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    nc = len(planes)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, bits, vals):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *_STD_DC_LUMA) + dht(1, 0, *_STD_AC_LUMA)
    if not gray:
        out += dht(0, 1, *_STD_DC_CHROMA) + dht(1, 1, *_STD_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wtr.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


def expected_roundtrip(arr: np.ndarray, quality: int = 85,
                       subsampling: str = "4:4:4") -> np.ndarray:
    """Independent reference reconstruction: what a spec-exact decoder
    must produce for encode_jpeg_baseline(arr) — computed WITHOUT the
    entropy layer (FDCT -> quant -> dequant -> IDCT -> color), so a
    decoder bug cannot cancel an encoder bug in tests."""
    gray = arr.ndim == 2
    ql = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(QUANT_CHROMA, quality).reshape(8, 8)
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qs = [ql]
    else:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = 128.0 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1] \
            + 0.5 * a[..., 2]
        cr = 128.0 + 0.5 * a[..., 0] - 0.418688 * a[..., 1] \
            - 0.081312 * a[..., 2]
        if subsampling == "4:2:0":
            def down(p):
                ph = p[:2 * (p.shape[0] // 2), :2 * (p.shape[1] // 2)]
                d = (ph[0::2, 0::2] + ph[1::2, 0::2]
                     + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
                return d
            cb, cr = down(cb), down(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qs = [ql, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    recon = []
    for (sh, sv), p, q in zip(samp, planes, qs):
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        pad = np.empty((ph, pw), dtype=np.float64)
        pad[:p.shape[0], :p.shape[1]] = p
        pad[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        pad[:, p.shape[1]:] = pad[:, p.shape[1] - 1:p.shape[1]]
        r = np.empty_like(pad)
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                blk = pad[y0:y0 + 8, x0:x0 + 8] - 128.0
                cq = np.round(fdct2(blk) / q) * q
                r[y0:y0 + 8, x0:x0 + 8] = idct2(cq) + 128.0
        if sh != hmax or sv != vmax:
            r = np.repeat(np.repeat(r, vmax // sv, axis=0),
                          hmax // sh, axis=1)
        recon.append(r[:h, :w])
    if gray:
        return np.clip(np.round(recon[0]), 0, 255).astype(np.uint8)
    y, cb, cr = recon
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([rr, gg, bb], axis=-1)),
                   0, 255).astype(np.uint8)

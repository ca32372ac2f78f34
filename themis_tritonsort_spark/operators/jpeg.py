"""Pure-python baseline JPEG codec (ITU-T T.81 sequential DCT).

Decoder: baseline (SOF0), 8-bit, 1- or 3-component scans, standard
huffman entropy coding, byte stuffing, DRI/RSTn restart intervals,
the common subsampling layouts (4:4:4, 4:2:2, 4:2:0 — any h/v in
{1, 2}).  Progressive (SOF2), arithmetic coding, and 12-bit inputs
return None (the caller falls back or raises in strict mode).

Encoder: the fixture-generation path — grayscale or color with
selectable luma subsampling (4:4:4 / 4:2:2 / 4:2:0) and optional
DRI/RSTn restart intervals, Annex K example quantization + huffman
tables.  It exists so tests can synthesize REAL baseline JPEGs in a
container with no image libraries; round-tripping it through the
decoder exercises every decode stage (marker walk, huffman, RLE,
dequant, zigzag, IDCT, subsampled MCU assembly, restart resync,
color transform).

Everything is numpy; the 8x8 IDCT is the orthonormal DCT-II matrix
applied two-sided, vectorized over all blocks of a component at
once, so decode cost is a handful of (n_blocks, 8, 8) einsums — fine
for Arrow-batch-sized payloads inside mapInPandas (the only caller;
see operators/multimodal.py decode_image).

Reference parity note: the reference engine has no media codecs at
all — this supports the beyond-reference multimodal surface
(SURVEY §2 'multimodal columns').
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# natural-order position of each zigzag index (inverse permutation)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K (K.1/K.2) example quantization tables, zigzag order
QUANT_LUMA = np.array([
    16, 11, 12, 14, 12, 10, 16, 14,
    13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37,
    29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68,
    87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113,
    121, 112, 100, 120, 92, 101, 103, 99,
])
QUANT_CHROMA = np.array([
    17, 18, 18, 24, 21, 24, 47, 26,
    26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K (K.3) standard huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal DCT-II basis matrix (8x8): block = C @ coeff @ C.T is
# the 2-D inverse transform when coeff carries the T.81 scale factors
_C = np.zeros((8, 8))
for _k in range(8):
    _n = np.arange(8)
    _C[:, _k] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
        np.sqrt(0.125) if _k == 0 else 0.5
    )


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial."""
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) coefficients."""
    return np.einsum("ki,nkl,lj->nij", _C, blocks, _C)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, canonical T.81 code assignment."""
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
    enc = {}
    for (length, code), sym in _build_decode_table(bits, vals).items():
        enc[sym] = (code, length)
    return enc


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2  # stuffed FF
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: consumed by caller
            else:
                return False  # segment end
        else:
            self.pos = p + 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # T.81 F.2.2.5: pad with 1-bits at segment end
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        out = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return out

    def decode_symbol(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def sync_restart(self) -> None:
        """Discard remaining bits and step over an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        self.pos = len(d)


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline sequential JPEG -> HxWx3 uint8 RGB, or None if the
    payload is not a JPEG this decoder supports."""
    if not payload.startswith(b"\xff\xd8"):
        return None
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    out_planes = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        seg[p : p + 64], np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    qtables[tq] = np.frombuffer(
                        seg[p : p + 128], ">u2"
                    ).astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if precision != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "tq": seg[8 + 3 * i]}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                return None
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                tdta = seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            out_planes = _decode_scan(
                payload, pos + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
            break
        pos += seglen

    if frame is None or out_planes is None:
        return None
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        plane = out_planes[c["id"]]
        # upsample by pixel replication to full resolution
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = (f.astype(np.float64) for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _decode_scan(payload, data_pos, frame, scan, qtables, htables,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient block grids
    grids = {}
    for c, _, _ in scan:
        grids[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), np.int32
        )
    reader = _BitReader(payload, data_pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c, _, _ in scan}
            for c, td, ta in scan:
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, np.int32)
                        size = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read(size), size)
                        pred[c["id"]] += diff
                        coeffs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC overflow")
                            coeffs[k] = _extend(reader.read(size), size)
                            k += 1
                        grids[c["id"]][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = coeffs
            mcu_count += 1

    planes = {}
    for c, _, _ in scan:
        grid = grids[c["id"]]
        gy, gx, _ = grid.shape
        q = qtables[c["tq"]]
        deq = (grid.reshape(-1, 64) * q[None, :])[:, UNZIGZAG]
        spatial = _idct2(deq.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        plane = (
            spatial.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
        planes[c["id"]] = plane
    return planes


# ---------------------------------------------------------------------------
# Encoder (fixture path: grayscale or 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def pad_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bit padding

    def marker(self, m: int) -> None:
        self.pad_byte()
        self.out.extend(bytes([0xFF, m]))

    def flush(self) -> bytes:
        self.pad_byte()
        return bytes(self.out)


def _encode_block(writer, block, q, dc_enc, ac_enc, pred: int) -> int:
    """DCT + quantize + entropy-code one (8, 8) spatial block; returns
    the new DC predictor."""
    coeff = _dct2(block.reshape(1, 8, 8) - 128.0).reshape(64)[ZIGZAG]
    row = np.round(coeff / q).astype(np.int32)
    diff = int(row[0]) - pred
    size = int(diff and int(np.floor(np.log2(abs(diff)))) + 1)
    code, length = dc_enc[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]
            writer.write(zc, zl)
            run -= 16
        size = int(np.floor(np.log2(abs(v)))) + 1
        code, length = ac_enc[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ec, el = ac_enc[0x00]
        writer.write(ec, el)
    return int(row[0])


def encode_jpeg(
    arr: np.ndarray,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 (or HxW grayscale) uint8 -> baseline JFIF bytes, Annex K
    tables.  ``subsample`` = luma (h, v) factors: (1, 1) is 4:4:4,
    (2, 1) 4:2:2, (2, 2) 4:2:0 (chroma is box-averaged).
    ``restart_interval`` > 0 inserts DRI/RSTn markers every that many
    MCUs.  Both exist so the DECODER's subsampling and restart paths
    are exercisable without any external image library."""
    gray = arr.ndim == 2
    hs, vs = (1, 1) if gray else subsample
    if hs not in (1, 2) or vs not in (1, 2):
        raise ValueError(f"subsample factors must be 1 or 2, got {subsample}")
    h, w = arr.shape[:2]
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)
    if gray:
        y = arr.astype(np.float64)
        planes, chroma = [y], []
    else:
        a = arr.astype(np.float64)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes, chroma = [y], [cb, cr]

    def pad_to(p: np.ndarray, rows: int, cols: int) -> np.ndarray:
        return np.pad(
            np.clip(np.round(p), 0, 255),
            ((0, rows - p.shape[0]), (0, cols - p.shape[1])),
            mode="edge",
        )

    luma = pad_to(planes[0], mcuy * 8 * vs, mcux * 8 * hs)
    chroma_planes = []
    for p in chroma:
        # box-average downsample by (vs, hs), then pad to the MCU grid
        pp = pad_to(p, mcuy * 8 * vs, mcux * 8 * hs)
        down = pp.reshape(
            pp.shape[0] // vs, vs, pp.shape[1] // hs, hs
        ).mean(axis=(1, 3))
        chroma_planes.append(np.round(down))

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    segment(0xDB, bytes([0x00]) + bytes(QUANT_LUMA.tolist()))
    if not gray:
        segment(0xDB, bytes([0x01]) + bytes(QUANT_CHROMA.tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (hs << 4) | vs, 0])
    for i in range(1, ncomp):
        sof += bytes([i + 1, 0x11, 1])
    segment(0xC0, sof)
    tables = [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        tables += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in tables:
        segment(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp]) + bytes([1, 0x00])
    for i in range(1, ncomp):
        sos += bytes([i + 1, 0x11])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for by in range(vs):
                for bx in range(hs):
                    r0, c0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    preds[0] = _encode_block(
                        writer,
                        luma[r0 : r0 + 8, c0 : c0 + 8],
                        QUANT_LUMA, dc_l, ac_l, preds[0],
                    )
            for ci, plane in enumerate(chroma_planes, start=1):
                r0, c0 = my * 8, mx * 8
                preds[ci] = _encode_block(
                    writer,
                    plane[r0 : r0 + 8, c0 : c0 + 8],
                    QUANT_CHROMA, dc_c, ac_c, preds[ci],
                )
            mcu_count += 1
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)

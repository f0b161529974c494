"""Baseline JPEG codec, stdlib + NumPy only — no libjpeg/Pillow.

Closes the last compressed-codec gap in the multimodal decode path
(the reference stores page screenshots as image BYTES next to the
transcript rows — ``01_Notebook_v8.ipynb`` BRONZE DDL; PNG is handled
by :mod:`.multimodal`). Scope: ITU-T T.81 baseline sequential DCT,
8-bit, Huffman entropy coding, 1 or 3 components, any sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart intervals. Progressive, arithmetic
coding, and 12-bit precision raise ``NotImplementedError``.

Execution shape: the codec runs inside Arrow-batched ``mapInPandas``
workers (see :func:`.multimodal.extract_features` /
:func:`.multimodal.resize_images`), one payload per row — per-image
NumPy work, no per-pixel Python except the inherently sequential
Huffman bit-stream. The IDCT/FDCT are single ``einsum`` calls over all
8×8 blocks of a component at once; dequantize/zigzag/level-shift are
whole-array ops. At 100 TB the parallelism axis is rows-per-executor,
not pixels, so a vectorized-per-image kernel is the right grain.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K — public tables) ---------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# Orthonormal 8-point DCT-II basis: T @ block @ T.T == JPEG FDCT,
# T.T @ coeffs @ T == IDCT (T is orthogonal).
_x = np.arange(8)
DCT_T = np.sqrt(2 / 8.0) * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
DCT_T[0, :] = np.sqrt(1 / 8.0)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol lookup for the bit-serial decoder."""
    return {(length, code): sym for sym, (code, length) in _huff_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker (the caller handles RST alignment)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("corrupt JPEG: truncated entropy data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, nbits: int) -> int:
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_restart(self) -> None:
        """Consume padding up to and including the next RST marker."""
        self.acc, self.n = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("corrupt JPEG: expected restart marker before end of data")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the size-bit raw value to its signed
    coefficient (negative values are stored one's-complemented)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- decode

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (h, w, 3) RGB (grayscale replicated).

    Pure NumPy: Huffman entropy decode (bit-serial — the one inherently
    sequential stage), then dequantize / un-zigzag / IDCT / upsample /
    color-convert as whole-array ops (one ``einsum`` IDCT per
    component over all its blocks).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if pos + 1 >= len(payload):
            raise ValueError("corrupt JPEG: truncated marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(payload):
            raise ValueError("corrupt JPEG: truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if pos + seglen > len(payload):
            raise ValueError("corrupt JPEG: truncated segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qt[tq] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=off + 1).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                if len(bits) < 16 or off + 17 + nv > len(seg):
                    raise ValueError("corrupt JPEG: truncated DHT segment")
                vals = list(seg[off + 17 : off + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decoder(bits, vals)
                off += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(payload, pos + seglen, frame, scan, qt, dc_tabs, ac_tabs, restart_interval)
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, dc_tabs, ac_tabs, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        if c["id"] not in scan:
            raise ValueError(f"corrupt JPEG: SOS missing component id {c['id']}")
        c["dc_t"], c["ac_t"] = scan[c["id"]]
        if c["dc_t"] not in dc_tabs or c["ac_t"] not in ac_tabs:
            raise ValueError(
                f"corrupt JPEG: missing Huffman table (dc={c['dc_t']}, ac={c['ac_t']})"
            )
        if c["tq"] not in qt:
            raise ValueError(f"corrupt JPEG: missing quant table {c['tq']}")
        c["pred"] = 0
    rd = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rd.align_restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                        try:
                            _decode_block(rd, blk, dc_tabs[c["dc_t"]], ac_tabs[c["ac_t"]], c)
                        except _RestartMarker:
                            raise ValueError("unexpected restart marker")
            mcu += 1
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        blocks = deq[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("xu,nuv,yv->nxy", DCT_T.T, blocks, DCT_T.T) + 128.0
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    out = np.clip(np.stack(planes, axis=-1), 0, 255)
    if len(comps) == 1:
        return np.repeat(np.round(out).astype(np.uint8), 3, axis=2)
    y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(rd, blk, dc_tab, ac_tab, comp):
    size = rd.huff(dc_tab)
    diff = _extend(rd.bits(size), size) if size else 0
    comp["pred"] += diff
    blk[0] = comp["pred"]
    k = 1
    while k < 64:
        sym = rd.huff(ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(rd.bits(size), size)
        k += 1


# ---------------------------------------------------------------- encode

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _encode_block(wtr, blk, pred, dc_c, ac_c) -> int:
    diff = int(blk[0]) - pred
    size = abs(diff).bit_length()
    code, length = dc_c[size]
    wtr.write(code, length)
    if size:
        wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_c[0xF0]
            wtr.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_c[run * 16 + size]
        wtr.write(code, length)
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, length = ac_c[0x00]
        wtr.write(code, length)
    return int(blk[0])


def encode_jpeg(
    pixels: np.ndarray, *, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """uint8 (h, w[, 3]) → baseline JPEG bytes (Annex-K Huffman tables,
    libjpeg-style quality scaling; ``subsample=True`` → 4:2:0 chroma,
    ``restart_interval`` → DRI + RSTn markers). Exists so the decoder
    is testable without any image library in the container — and
    because a synthetic-media generator needs a real DCT codec to
    exercise the decode path with actual frequency-domain loss."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[..., None], 3, axis=2)
    h, w = px.shape[:2]
    y = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    cb = -0.168736 * px[..., 0] - 0.331264 * px[..., 1] + 0.5 * px[..., 2] + 128.0
    cr = 0.5 * px[..., 0] - 0.418688 * px[..., 1] - 0.081312 * px[..., 2] + 128.0
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    sub = 2 if subsample else 1
    hmax = vmax = sub
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    if subsample:  # 2×2 box-average chroma
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    dc_lum_c, ac_lum_c = _huff_codes(*DC_LUM), _huff_codes(*AC_LUM)
    dc_ch_c, ac_ch_c = _huff_codes(*DC_CHROM), _huff_codes(*AC_CHROM)

    def quantize(plane: np.ndarray, q: np.ndarray, bh: int, bw: int) -> np.ndarray:
        padded = (
            np.pad(plane, ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])), mode="edge")
            - 128.0
        )
        blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coeffs = np.einsum("ux,nxy,vy->nuv", DCT_T, blocks, DCT_T).reshape(-1, 64)
        # q is in natural (raster) order; the coefficient stream — and
        # the DQT segment per T.81 B.2.4.1 — are in zigzag order
        return np.round(coeffs[:, ZIGZAG] / q[ZIGZAG][None, :]).astype(np.int64)

    # per-component block grids, MCU-aligned like the decoder's
    comps = [
        {"plane": y, "q": qlum, "hf": sub, "vf": sub, "tabs": (dc_lum_c, ac_lum_c)},
        {"plane": cb, "q": qchrom, "hf": 1, "vf": 1, "tabs": (dc_ch_c, ac_ch_c)},
        {"plane": cr, "q": qchrom, "hf": 1, "vf": 1, "tabs": (dc_ch_c, ac_ch_c)},
    ]
    for c in comps:
        c["bw"], c["bh"] = mcus_x * c["hf"], mcus_y * c["vf"]
        c["blocks"] = quantize(c["plane"], c["q"], c["bh"], c["bw"])
        c["pred"] = 0
    wtr = _BitWriter()
    parts: list[bytes] = []
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                parts.append(wtr.flush())
                parts.append(bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]))
                wtr = _BitWriter()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["vf"]):
                    for bx in range(c["hf"]):
                        blk = c["blocks"][(my * c["vf"] + by) * c["bw"] + mx * c["hf"] + bx]
                        c["pred"] = _encode_block(wtr, blk, c["pred"], *c["tabs"])
            mcu += 1
    parts.append(wtr.flush())
    entropy = b"".join(parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dht(tc: int, th: int, table) -> bytes:
        bits, vals = table
        return bytes([tc * 16 + th] + bits + vals)

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qchrom[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv, tq in ((1, sub * 16 + sub, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += struct.pack(">BBB", cid, hv, tq)
    out += seg(0xC0, sof)
    out += seg(0xC4, dht(0, 0, DC_LUM)) + seg(0xC4, dht(1, 0, AC_LUM))
    out += seg(0xC4, dht(0, 1, DC_CHROM)) + seg(0xC4, dht(1, 1, AC_CHROM))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return out

"""Baseline-JPEG codec in stdlib + numpy ONLY (no codec libraries).

Same honest-decoder pattern as the PNG path in ``multimodal.py``: the
environment ships no PIL/libjpeg/ffmpeg, but baseline sequential JPEG
(ITU-T T.81) is decodable with a marker-segment walk, canonical Huffman
tables read from the file's own DHT segments, and an 8×8 type-II IDCT
expressed as two numpy matmuls.  Scope (raises ``ValueError`` outside it,
so the multimodal stage stays honest about what it can do):

- decode: baseline DCT (SOF0), 8-bit, 1 or 3 components, any sampling
  factors (2:1 chroma subsampling etc. upsampled by replication),
  restart markers (DRI/RSTn) supported; progressive (SOF2), arithmetic
  coding and 12-bit precision are rejected.
- encode: baseline 4:4:4 (or grayscale), Annex-K quantization tables
  scaled by a libjpeg-style ``quality`` knob, Annex-K Huffman tables.

All constant tables below are from the public JPEG spec (ITU-T T.81
Annex K); the decode path trusts only tables read from the payload.
JPEG is lossy: round-trips are asserted statistically in tests
(mean-abs-error bounds), unlike the bit-exact PNG round-trip.
"""

from __future__ import annotations

import numpy as np

# zigzag scan: position i of the zigzag sequence holds natural index
# ZIGZAG[i] (row-major) of the 8x8 block
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 quantization tables (natural row-major order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _dct_basis() -> np.ndarray:
    """T[u, x] = c(u)·cos((2x+1)uπ/16); forward F = T·B·Tᵀ, inverse
    B = Tᵀ·F·T (orthonormal type-II DCT)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    t = np.cos((2 * x + 1) * u * np.pi / 16)
    t[0] *= np.sqrt(0.5)
    return t * 0.5


_T = _dct_basis()


def _build_decode_table(bits, vals) -> dict:
    """Canonical Huffman: (code_length, code) -> symbol."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals) -> dict:
    """Canonical Huffman: symbol -> (code, code_length)."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over already-destuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict,
                  qt: np.ndarray, dc_pred: int):
    zz = np.zeros(64, dtype=np.int64)
    s = br.decode_huff(dc_tab)
    dc_pred += _extend(br.read_bits(s), s)
    zz[0] = dc_pred
    k = 1
    while k < 64:
        rs = br.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:            # ZRL: 16 zeros
                k += 16
                continue
            break                  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    nat = np.zeros(64, dtype=np.float64)
    nat[ZIGZAG] = zz * qt          # dequantize (both in zigzag order)
    block = _T.T @ nat.reshape(8, 8) @ _T
    return np.clip(np.round(block + 128), 0, 255).astype(np.uint8), dc_pred


def _destuff(payload: bytes, pos: int):
    """Collect entropy-coded segments from ``pos``: 0xFF00 unstuffs to
    0xFF, RSTn markers split segments (decoder resets DC predictions per
    segment), any other marker ends the scan.  Returns (segments, pos)."""
    segs, cur = [], bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = payload[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:    # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:                      # EOI or next segment marker
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) RGB uint8 (or (h, w, 1) gray)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qts, dec_tabs = {}, {}
    frame = None
    scan = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:         # EOI
            break
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:         # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization not supported")
                qts[tq] = np.frombuffer(
                    seg[i + 1:i + 65], np.uint8).astype(np.int64)
                i += 65
        elif marker == 0xC4:       # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                dec_tabs[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:       # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential JPEG (SOF0) supported, "
                f"got SOF marker 0x{marker:02x}")
        elif marker == 0xDD:       # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:       # SOS — entropy data follows the header
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                     seg[2 + 2 * c] & 0x0F) for c in range(ns)]
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cid] for cid, _, _ in scan]
    tabs = {cid: (td, ta) for cid, td, ta in scan}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]),
                                np.uint8) for c in comps}

    segs, _ = _destuff(payload, pos)
    mcus_total = mcux * mcuy
    per_seg = restart_interval or mcus_total
    mcu = 0
    for seg_bytes in segs:
        if mcu >= mcus_total:
            break
        br = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, mcus_total - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in order:
                td, ta = tabs[c["id"]]
                dc_t = dec_tabs.get((0, td))
                ac_t = dec_tabs.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("JPEG scan references missing DHT")
                qt = qts[c["tq"]]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        blk, preds[c["id"]] = _decode_block(
                            br, dc_t, ac_t, qt, preds[c["id"]])
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + u) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            mcu += 1

    # upsample by replication to full-resolution grid, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w].astype(np.float64))
    if len(full) == 1:
        return full[0].astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (baseline 4:4:4 / grayscale, Annex-K tables)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:             # pad with 1-bits per spec
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_enc: dict, ac_enc: dict, dc_pred: int) -> int:
    f = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    zz = np.round(f.reshape(-1)[ZIGZAG] / qt).astype(np.int64)
    diff = int(zz[0]) - dc_pred
    s = int(abs(diff)).bit_length()
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.flatnonzero(zz[1:]) + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            code, ln = ac_enc[0xF0]      # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[idx])
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k = int(idx) + 1
    if k < 64:
        code, ln = ac_enc[0x00]          # EOB
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    q = np.empty((ph, pw), np.float64)
    q[:h, :w] = p
    q[h:, :w] = p[-1:, :]                      # edge-replicate padding
    q[:, w:] = q[:, w - 1:w]
    return q


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w[, 1]) gray uint8 -> baseline JPEG bytes
    (Annex-K Huffman tables, quality-scaled Annex-K quant).

    ``subsampling``: '444' (one 8×8 block per component per MCU) or
    '420' (2×2-mean-downsampled chroma, 16×16 MCUs).  A nonzero
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs
    (exercising the decoder's segment-reset path)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if nch == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
    # quant tables are stored in (and applied to) zigzag order
    qt_l = _scaled_qt(QT_LUMA, quality).reshape(-1)[ZIGZAG]
    qt_c = _scaled_qt(QT_CHROMA, quality).reshape(-1)[ZIGZAG]
    dc_l, ac_l = (_build_encode_table(*HUFF_DC_LUMA),
                  _build_encode_table(*HUFF_AC_LUMA))
    dc_c, ac_c = (_build_encode_table(*HUFF_DC_CHROMA),
                  _build_encode_table(*HUFF_AC_CHROMA))

    sub = 2 if (subsampling == "420" and nch == 3) else 1
    samp = [(sub, sub)] + [(1, 1)] * (nch - 1)
    if sub == 2:                               # 2×2-mean chroma downsample
        for i in (1, 2):
            p = _pad_edge(planes[i], -(-h // 2) * 2, -(-w // 2) * 2)
            planes[i] = (p[0::2, 0::2] + p[0::2, 1::2]
                         + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    hmax = vmax = sub
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = [_pad_edge(p, mcuy * 8 * sv, mcux * 8 * sh)
              for p, (sh, sv) in zip(planes, samp)]

    bw = _BitWriter()
    preds = [0] * nch
    mcu = 0
    data = bytearray()
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                data += bw.flush()
                data += bytes([0xFF,
                               0xD0 + ((mcu // restart_interval - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * nch
            for ci in range(nch):
                sh, sv = samp[ci]
                qt = qt_l if ci == 0 else qt_c
                dc_e, ac_e = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for v in range(sv):
                    for u in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + u) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(bw, blk, qt, dc_e,
                                                  ac_e, preds[ci])
            mcu += 1
    data += bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_l.astype(np.uint8)))
    if nch == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_c.astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([nch])
    for ci in range(nch):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    for tc, th, (bits, vals) in ((0, 0, HUFF_DC_LUMA),
                                 (1, 0, HUFF_AC_LUMA),
                                 (0, 1, HUFF_DC_CHROMA),
                                 (1, 1, HUFF_AC_CHROMA)):
        if nch == 1 and th == 1:
            continue
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                    + bytes(vals))
    sos = bytes([nch])
    for ci in range(nch):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bytes(data)
    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg(w: int, h: int, seed: int = 0, nch: int = 3,
               quality: int = 90) -> bytes:
    """Deterministic smooth test image (random noise compresses terribly
    and round-trips loosely; a smooth gradient exercises the same code
    paths with a tight reconstruction-error bound)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = [128 + 100 * np.sin(xx / 17 + float(rng.uniform(0, 6)))
            * np.cos(yy / 13 + float(rng.uniform(0, 6)))
            for _ in range(nch)]
    img = np.clip(np.stack(base, axis=2), 0, 255).astype(np.uint8)
    return encode_jpeg(img if nch > 1 else img[:, :, 0], quality=quality)

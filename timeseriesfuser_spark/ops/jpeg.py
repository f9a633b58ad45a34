"""Pure-numpy baseline JPEG codec (VERDICT r14 #4) — the last gated
image format with an in-repo decode path.

Scope: BASELINE SEQUENTIAL JPEG (SOF0, plus SOF1 extended-sequential
with 8-bit precision) — grayscale and 3-component YCbCr at 4:4:4,
4:2:2 and 4:2:0 sampling, DHT tables read from the file (canonical
Huffman per ITU T.81 C.2), 8- and 16-bit DQT, restart markers/DRI,
0xFF00 byte destuffing, APPn/COM skip. Progressive (SOF2),
arithmetic-coded, hierarchical and 12-bit frames raise
``NotImplementedError`` — honestly gated, same contract as the other
codecs in :mod:`.multimodal` (a user ``decode_fn`` overrides).

Everything here is stdlib + numpy; the entropy decode walks symbols in
Python against a cached 16-bit-prefix LUT (a handful of table builds
per process, then O(1) per symbol), and the whole dequant → de-zigzag
→ IDCT tail is one vectorized int64 einsum over all blocks of a
component — no per-pixel Python.

Exactness contract (what lets a DuckDB oracle see through the lossy
container): the decoder's IDCT is a Q15 fixed-point orthonormal
DCT-III evaluated in exact int64 (single einsum, bound
64·2^14·2^14·2^25 < 2^63, round-half-up descale). For an image whose
8x8 blocks are each CONSTANT (only the DC coefficient is nonzero) and
a quantization table whose DC entry divides 8·(v-128), the encode →
decode round trip is PIXEL-EXACT: the forward DC quantizes without
loss, every AC coefficient is exactly zero, and the Q15 IDCT residue
(|1 - 11585²·8/2^30| ≈ 4e-5 relative) is far below the 0.5 rounding
threshold for 8-bit samples. ``contract/media.py``'s
``pixel_phash_jpeg_dedup`` leans on exactly this: an md5-hex raster
upscaled to constant 8x8 blocks survives a REAL entropy-coded JPEG
round trip bit-for-bit, so the SQL oracle re-derives the pHash from
the raster arithmetic while only the engine exercises the container.
"""
from __future__ import annotations

from typing import Iterable, Optional, Tuple, Union

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------------------
# shared tables


def _zigzag() -> np.ndarray:
    """ZZ[k] = row-major natural index of the k-th zigzag position
    (generated, not transcribed — the T.81 diagonal walk)."""
    out = []
    for d in range(15):
        cells = [(i, d - i) for i in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 0:
            cells.reverse()  # even diagonals walk up-right from (d, 0)
        out.extend(i * 8 + j for i, j in cells)
    return np.asarray(out, dtype=np.int64)


_ZZ = _zigzag()

#: Q15 orthonormal DCT-II matrix: A[u, x] = round(2^15 * a(u) *
#: cos((2x+1)u*pi/16)) — the decoder's integer IDCT basis (transposed
#: use), sibling of multimodal.phash_dct_table's Q20 table but sized so
#: a full 64-term dequantized einsum stays inside int64.
_IDCT_SCALE = 1 << 15


def _dct8_q15() -> np.ndarray:
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0] = 1.0 / np.sqrt(8.0)
    return np.rint(a * _IDCT_SCALE).astype(np.int64)


_A15 = _dct8_q15()

#: float orthonormal DCT-II for the ENCODER's forward transform (the
#: encoder is allowed float: the decoder's integer IDCT is what the
#: exactness contract pins).
def _dct8_f64() -> np.ndarray:
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0] = 1.0 / np.sqrt(8.0)
    return a


_AF = _dct8_f64()

# Annex K example quantization tables (ITU T.81 Tables K.1/K.2) — the
# de-facto "quality 50" tables every JPEG tool ships.
_QUANT_LUMA = np.asarray(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.asarray(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K example Huffman specs (bits[16], huffval). The DECODER never
# assumes these — it builds tables from the file's own DHT segments —
# so encoder/decoder round trips hold for any canonical table; these
# are just what our encoder writes.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
assert len(_AC_LUMA_VALS) == sum(_AC_LUMA_BITS)
assert len(_AC_CHROMA_VALS) == sum(_AC_CHROMA_BITS)


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) per T.81 C.2: lengths ascending, codes
    counting up, left-shifted at each new length."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _csize(v: int) -> int:
    return int(v).bit_length() if v else 0


def _norm_quant(
    quant: Union[None, int, Iterable, Tuple],
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (luma_table, chroma_table), each 64 natural-order ints."""
    if quant is None:
        return _QUANT_LUMA.copy(), _QUANT_CHROMA.copy()
    if isinstance(quant, (int, np.integer)):
        if not 1 <= int(quant) <= 65535:
            raise ValueError(f"quant must be in [1, 65535]: {quant}")
        t = np.full(64, int(quant), dtype=np.int64)
        return t, t.copy()
    if isinstance(quant, tuple) and len(quant) == 2:
        lu = np.asarray(quant[0], dtype=np.int64).reshape(64)
        ch = np.asarray(quant[1], dtype=np.int64).reshape(64)
    else:
        lu = np.asarray(quant, dtype=np.int64).reshape(64)
        ch = lu.copy()
    for t in (lu, ch):
        if (t < 1).any() or (t > 65535).any():
            raise ValueError("quant table entries must be in [1, 65535]")
    return lu, ch


def _plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """plane (H8, W8) → quantized zigzag coefficients (n_blocks, 64)
    int64, blocks in row-major block order (float forward DCT)."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    b = b.reshape(-1, 8, 8).astype(np.float64) - 128.0
    coef = np.einsum("ux,bxy,vy->buv", _AF, b, _AF)
    q = np.rint(coef.reshape(-1, 64) / qtab[None, :]).astype(np.int64)
    np.clip(q[:, 1:], -1023, 1023, out=q[:, 1:])  # baseline AC range
    np.clip(q[:, :1], -2047, 2047, out=q[:, :1])
    return q[:, _ZZ]  # natural → zigzag


def _pad_edge(plane: np.ndarray, h8: int, w8: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, h8 - h), (0, w8 - w)), mode="edge")


def encode_jpeg(
    arr: "np.ndarray",
    *,
    quant: Union[None, int, Iterable, Tuple] = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a 2-D grayscale or 3-D RGB uint8 array as a baseline
    sequential JFIF JPEG (SOF0, Annex-K Huffman tables, optional DRI
    restart markers).

    ``quant``: None → Annex K example tables; an int → a flat table of
    that value for all 64 frequencies (``quant=8`` with constant-8x8-
    block input is the pixel-exact oracle path — module docstring); a
    64-entry array → custom table; a (luma, chroma) tuple → both.
    ``subsampling``: '444', '422' or '420' (ignored for grayscale);
    chroma is box-mean downsampled. Dimensions need not be multiples of
    the MCU size — planes are edge-padded, the decoder crops.
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = np.clip(np.rint(a.astype(np.float64)), 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise ValueError(f"expected 2-D gray or 3-D RGB array: {a.shape}")
    if a.shape[0] < 1 or a.shape[1] < 1:
        raise ValueError("empty image")
    if a.shape[0] > 65535 or a.shape[1] > 65535:
        raise ValueError("image dimension exceeds the JPEG 16-bit limit")
    if restart_interval < 0 or restart_interval > 65535:
        raise ValueError(f"restart_interval out of range: {restart_interval}")
    q_lu, q_ch = _norm_quant(quant)
    gray = a.ndim == 2
    h, w = a.shape[0], a.shape[1]

    if gray:
        samp = [(1, 1)]
        planes = [a.astype(np.float64)]
        qsel = [0]
    else:
        if subsampling not in ("444", "422", "420"):
            raise ValueError(f"subsampling must be 444/422/420: {subsampling}")
        hy, vy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        samp = [(hy, vy), (1, 1), (1, 1)]
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        # chroma box-mean downsample by the luma sampling factors
        def down(p, fx, fy):
            if fx == 1 and fy == 1:
                return p
            ph = _pad_edge(p, -(-h // fy) * fy, -(-w // fx) * fx)
            return ph.reshape(
                ph.shape[0] // fy, fy, ph.shape[1] // fx, fx
            ).mean(axis=(1, 3))

        planes = [y, down(cb, hy, vy), down(cr, hy, vy)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_blocks = []
    for ci, ((hi, vi), plane) in enumerate(zip(samp, planes)):
        p8 = _pad_edge(plane, mcuy * vi * 8, mcux * hi * 8)
        qt = q_lu if qsel[ci] == 0 else q_ch
        zz = _plane_blocks(p8, qt)
        comp_blocks.append(zz.reshape(mcuy * vi, mcux * hi, 64))

    # --- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    qtabs = [q_lu] if gray else [q_lu, q_ch]
    for tid, qt in enumerate(qtabs):
        wide = bool((qt > 255).any())
        body = bytes([(int(wide) << 4) | tid]) + (
            qt[_ZZ].astype(">u2").tobytes() if wide
            else bytes(int(x) for x in qt[_ZZ])
        )
        out += b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body
    nf = 1 if gray else 3
    sof = bytearray()
    sof += (8).to_bytes(1, "big") + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(nf)
    for ci in range(nf):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    huffspecs = [
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ]
    if not gray:
        huffspecs += [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in huffspecs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sos = bytearray([nf])
    for ci in range(nf):
        tsel = 0 if (gray or ci == 0) else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    # --- entropy-coded scan (interleaved MCU order)
    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_codes.append(_canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_codes.append(_canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))
    tsel = [0] + ([1, 1] if not gray else [])
    bw = _BitWriter()
    pred = [0] * nf
    rst = 0
    mcus_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcus_done
                and mcus_done % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * nf
            for ci in range(nf):
                hi, vi = samp[ci]
                dct, act = dc_codes[tsel[ci]], ac_codes[tsel[ci]]
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_blocks[ci][my * vi + by, mx * hi + bx]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        sz = _csize(diff)
                        c, ln = dct[sz]
                        bw.write(c, ln)
                        if sz:
                            amp = diff if diff > 0 else diff + (1 << sz) - 1
                            bw.write(amp, sz)
                        run = 0
                        for k in range(1, 64):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = act[0xF0]  # ZRL
                                bw.write(c, ln)
                                run -= 16
                            sz = _csize(v)
                            c, ln = act[(run << 4) | sz]
                            bw.write(c, ln)
                            amp = v if v > 0 else v + (1 << sz) - 1
                            bw.write(amp, sz)
                            run = 0
                        if run:
                            c, ln = act[0x00]  # EOB
                            bw.write(c, ln)
            mcus_done += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

_LUT_CACHE: dict = {}


def _decode_lut(bits: bytes, vals: bytes):
    """16-bit-prefix lookup table: lut[peek16] = (symbol, code_length),
    None for invalid prefixes. Cached by table spec — a process decodes
    a handful of DISTINCT tables across millions of images."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = [None] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("malformed DHT: counts exceed values")
            sym = vals[k]
            base = code << (16 - length)
            span = 1 << (16 - length)
            if base + span > 65536:
                raise ValueError("malformed DHT: code overflow")
            entry = (sym, length)
            lut[base : base + span] = [entry] * span
            code += 1
            k += 1
        code <<= 1
    if len(_LUT_CACHE) > 256:  # bounded cache
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


class _BitReader:
    """MSB-first reader over a destuffed entropy segment; the tail is
    virtually 1-padded (spec padding) — running off the real data by
    more than one pad byte means a truncated stream."""

    __slots__ = ("data", "n", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def _fill(self, need: int) -> None:
        while self.cnt < need:
            if self.pos < self.n:
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf = (self.buf << 8) | 0xFF  # virtual 1-padding
                self.pos += 1
            self.cnt += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.cnt - 16)) & 0xFFFF

    def consume(self, nbits: int) -> None:
        self.cnt -= nbits
        self.buf &= (1 << self.cnt) - 1

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.buf >> (self.cnt - nbits)) & ((1 << nbits) - 1)
        self.consume(nbits)
        return v

    def overrun(self) -> bool:
        return (self.pos - (self.cnt // 8)) > self.n + 1


def _receive_extend(br: _BitReader, size: int) -> int:
    v = br.read(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _find_scan_end(data: bytes, start: int) -> int:
    """End of the entropy-coded segment: the first 0xFF followed by a
    byte that is neither 0x00 (stuffing) nor RST0-7."""
    i = start
    n = len(data)
    while True:
        i = data.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        nxt = data[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i


def decode_jpeg(data: bytes) -> "np.ndarray":
    """Decode a baseline sequential JPEG → uint8 array, 2-D for
    grayscale, (H, W, 3) RGB for 3-component YCbCr (BT.601 full-range,
    the JFIF convention). Chroma planes are upsampled by sample
    replication. Raises ``ValueError`` on malformed streams and
    ``NotImplementedError`` for progressive / arithmetic / 12-bit /
    hierarchical frames (gated — supply a ``decode_fn``)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict = {}
    huff: dict = {}
    frame = None
    ri = 0
    pos = 2
    n = len(data)
    segs_zz: Optional[list] = None
    scan_samp = None

    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        while pos < n and data[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= n:
            break
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray RST: no payload
        if pos + 2 > n:
            raise ValueError("truncated marker segment")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated marker segment")
        body = data[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    if i + 128 > len(body):
                        raise ValueError("truncated DQT")
                    t = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    if i + 64 > len(body):
                        raise ValueError("truncated DQT")
                    t = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = t  # DQT stores zigzag order
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = body[i + 1 : i + 17]
                cnt = sum(bits)
                i += 17
                if i + cnt > len(body):
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _decode_lut(bits, body[i : i + cnt])
                i += cnt
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline-compatible)
            if len(body) < 6:
                raise ValueError("truncated SOF")
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision is gated (baseline 8-bit "
                    "only); supply decode_fn for extended precisions"
                )
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            nf = body[5]
            if fh == 0 or fw == 0:
                raise ValueError("DNL-deferred dimensions not supported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG is gated (grayscale/YCbCr only)"
                )
            comps = []
            for ci in range(nf):
                o = 6 + 3 * ci
                if o + 3 > len(body):
                    raise ValueError("truncated SOF")
                cid, hv, tqi = body[o], body[o + 1], body[o + 2]
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} is gated (1-2 only)"
                    )
                comps.append((cid, hi, vi, tqi))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/arithmetic/hierarchical JPEG is gated "
                "(baseline sequential only); supply decode_fn"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            fh, fw, comps = frame
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG is gated"
                )
            scan_tables = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cid] = (tt >> 4, tt & 15)
            scan_end = _find_scan_end(data, pos)
            ecs = data[pos:scan_end]
            pos = scan_end
            segs_zz, scan_samp = _decode_scan(
                ecs, frame, scan_tables, huff, ri
            )
            # after the scan, resume marker parsing (EOI expected)
        # else: APPn / COM / unknown — skipped via seglen

    if frame is None or segs_zz is None:
        raise ValueError("no decodable scan found (missing SOF/SOS)")
    return _reconstruct(frame, segs_zz, scan_samp, qt)


def _decode_scan(ecs, frame, scan_tables, huff, ri):
    """Entropy-decode one interleaved scan → per-component quantized
    zigzag block arrays (by, bx, 64) int32."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    n_mcu = mcux * mcuy

    # split on RST markers, destuff each segment
    segments = []
    i = 0
    while True:
        j = i
        while True:
            j = ecs.find(b"\xff", j)
            if j < 0 or j + 1 >= len(ecs):
                segments.append(ecs[i:].replace(b"\xff\x00", b"\xff"))
                j = -1
                break
            if ecs[j + 1] == 0x00:
                j += 2
                continue
            if 0xD0 <= ecs[j + 1] <= 0xD7:
                segments.append(ecs[i:j].replace(b"\xff\x00", b"\xff"))
                i = j + 2
                j = i
                break
            segments.append(ecs[i:j].replace(b"\xff\x00", b"\xff"))
            j = -1
            break
        if j < 0:
            break

    if ri:
        expected = -(-n_mcu // ri)
        if len(segments) < expected:
            raise ValueError(
                f"restart interval {ri}: expected {expected} entropy "
                f"segments, found {len(segments)}"
            )
    elif not segments:
        raise ValueError("empty entropy-coded segment")

    out = []
    luts = []
    for cid, hi, vi, _tq in comps:
        if cid not in scan_tables:
            raise ValueError(f"scan references unknown component id {cid}")
        td, ta = scan_tables[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references an undefined Huffman table")
        luts.append((huff[(0, td)], huff[(1, ta)]))
        out.append(
            np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        )

    seg_idx = 0
    br = _BitReader(segments[0])
    pred = [0] * len(comps)
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated restart segment")
            br = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, hi, vi, _tq) in enumerate(comps):
            lut_dc, lut_ac = luts[ci]
            for by in range(vi):
                for bx in range(hi):
                    blk = out[ci][my * vi + by, mx * hi + bx]
                    e = lut_dc[br.peek16()]
                    if e is None:
                        raise ValueError("invalid DC Huffman code")
                    sz, ln = e
                    br.consume(ln)
                    if sz:
                        pred[ci] += _receive_extend(br, sz)
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        e = lut_ac[br.peek16()]
                        if e is None:
                            raise ValueError("invalid AC Huffman code")
                        sym, ln = e
                        br.consume(ln)
                        run, sz = sym >> 4, sym & 15
                        if sz == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _receive_extend(br, sz)
                        k += 1
        if br.overrun():
            raise ValueError("truncated entropy-coded data")
    return out, (hmax, vmax)


def _reconstruct(frame, segs_zz, scan_samp, qt):
    fh, fw, comps = frame
    hmax, vmax = scan_samp
    planes = []
    for ci, (cid, hi, vi, tqi) in enumerate(comps):
        if tqi not in qt:
            raise ValueError(f"component references undefined DQT {tqi}")
        zz = segs_zz[ci]
        by, bx = zz.shape[0], zz.shape[1]
        deq = zz.reshape(-1, 64).astype(np.int64) * qt[tqi][_ZZ][None, :]
        # corrupt streams can run the DC predictor away — clip so the
        # int64 einsum bound (64·2^14·2^14·2^25) holds
        np.clip(deq, -(1 << 25), 1 << 25, out=deq)
        nat = np.zeros_like(deq)
        nat[:, _ZZ] = deq
        c = nat.reshape(-1, 8, 8)
        acc = np.einsum("ux,buv,vy->bxy", _A15, c, _A15)
        px = ((acc + (1 << 29)) >> 30) + 128
        np.clip(px, 0, 255, out=px)
        p = (
            px.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
            .astype(np.uint8)
        )
        sy, sx = vmax // vi, hmax // hi
        if sy > 1:
            p = np.repeat(p, sy, axis=0)
        if sx > 1:
            p = np.repeat(p, sx, axis=1)
        planes.append(p[:fh, :fw])
    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)

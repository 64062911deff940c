"""Baseline JPEG (JFIF) codec — real entropy coding, real transform,
pure stdlib+numpy, deterministic integer arithmetic end to end.

Scope (honest): baseline sequential DCT, 8-bit precision, 3-component
YCbCr at 4:4:4 or 4:2:0 sampling (the dominant real-world layouts) plus
single-component grayscale (``encode_jpeg_gray``; the decoder accepts
1-component SOF frames), standard JPEG Annex K Huffman + quantization
tables with the classic IJG quality scaling. Progressive scans, other
sampling layouts, arithmetic coding and 12-bit precision fail loudly — a
decoder that guesses is worse than none.

Everything here derives from public specs: ITU-T T.81 (the JPEG spec,
incl. Annex K's example tables), the JFIF spec, and the widely published
IJG quality-scaling formula. The transform is an integer fixed-point DCT
of this repo's own design (Q13 cosine table, single rounding shift, no
intermediate rounding) so encode → decode is a deterministic integer
function of the input — the property every cross-engine gate in this repo
is built on (see queries/mediaops.media_jpeg_decode, whose DuckDB oracle
replays the DC path analytically).

Reference parity: the reference engine has no media surface at all
(payloads are opaque JSON strings, /root/reference/pkg/spider/worker.go);
this module is north-rule scope — the "interleaved text+media" story.

Scale shape: decoding runs inside Arrow-batched ``mapInPandas`` stages
(functions/media.real_decode dispatch) — a pure map, no shuffle. The
IDCT/fDCT are vectorized numpy matmuls over all blocks at once; only the
entropy coder is a sequential bit loop (inherent to Huffman streams).
"""

from __future__ import annotations

import math
import struct

# --------------------------------------------------------------------------
# Integer fixed-point DCT (Q13 cosine table, Q28 products)
#
# M[u][x] = round(2^13 · C(u) · cos((2x+1)uπ/16)), C(0)=1/√2 else 1.
# fDCT:  F = (M f Mᵀ + 2^27) >> 28   (floor shift — matches >> on int64)
# IDCT:  f = (Mᵀ F M + 2^27) >> 28   (then +128, clamp to [0,255])
# No intermediate rounding: each output value is ONE integer expression of
# the inputs, so a DC-only block decodes to exactly
# floor((dc·q·5793² + 2^27) / 2^28) + 128 — the analytic formula the SQL
# oracle recomputes. Row sums of M for u≥1 are exactly 0 (the rounded
# entries cancel in ± pairs), so a constant block transforms to a pure-DC
# spectrum with ACs exactly 0 — asserted in tests.
# --------------------------------------------------------------------------

DCT_SHIFT = 28
DCT_ROUND = 1 << 27
DC0 = 5793  # M[0][x]: round(2^13/√2), same for every x


def _cos_table():
    import numpy as np

    m = np.zeros((8, 8), dtype=np.int64)
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = int(round((1 << 13) * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)))
    return m


_M = None


def _m():
    global _M
    if _M is None:
        _M = _cos_table()
    return _M


# --------------------------------------------------------------------------
# Color space (JFIF YCbCr), Q16 integer constants. All three forward
# expressions are provably non-negative for RGB in [0,255], so a plain
# truncating integer division by 2^16 IS the floor — the same expression
# works verbatim in DuckDB. The inverse uses floor shifts on possibly
# negative values (arithmetic >> in numpy/Python; the SQL twin uses the
# repo's floor-div trick).
# --------------------------------------------------------------------------

CY = (19595, 38470, 7471)          # 0.299, 0.587, 0.114 in Q16 (sum = 2^16)
CCB = (-11059, -21709, 32768)      # -0.1687, -0.3313, 0.5
CCR = (32768, -27439, -5329)       # 0.5, -0.4187, -0.0813
C_OFF = (128 << 16) + 32768        # chroma offset + rounding
Y_RND = 32768
IRCR = 91881                       # 1.402 in Q16
IGCB, IGCR = 22554, 46802          # 0.344136, 0.714136
IBCB = 116130                      # 1.772


def rgb_to_ycbcr(rgb):
    """(h, w, 3) uint8 RGB → (h, w, 3) int64 YCbCr, integer-exact."""
    import numpy as np

    p = rgb.astype(np.int64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = (CY[0] * r + CY[1] * g + CY[2] * b + Y_RND) >> 16
    cb = (CCB[0] * r + CCB[1] * g + CCB[2] * b + C_OFF) >> 16
    cr = (CCR[0] * r + CCR[1] * g + CCR[2] * b + C_OFF) >> 16
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc):
    """(h, w, 3) int64 YCbCr → (h, w, 3) uint8 RGB, integer-exact with
    arithmetic-shift (floor) rounding and [0,255] clamping."""
    import numpy as np

    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + ((IRCR * cr + Y_RND) >> 16)
    g = y - ((IGCB * cb + IGCR * cr + Y_RND) >> 16)
    b = y + ((IBCB * cb + Y_RND) >> 16)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 §K.1/K.3) + IJG quality scaling
# --------------------------------------------------------------------------

QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits[1..16], values) — standard DC/AC tables, T.81 Annex K.3
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def quality_scale(base: int, quality: int) -> int:
    """The classic IJG scaling: scale = 5000/q below 50 else 200−2q;
    entry = clamp((base·scale + 50) // 100, 1, 255). Pure integers."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality must be in [1,100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return min(255, max(1, (base * scale + 50) // 100))


def scaled_qtables(quality: int):
    """(luma[64], chroma[64]) natural-order quant tables at ``quality``."""
    ql = [quality_scale(v, quality) for v in QT_LUMA]
    qc = [quality_scale(v, quality) for v in QT_CHROMA]
    return ql, qc


def quantize(value: int, q: int) -> int:
    """Round-half-away-from-zero division — one branch, SQL-expressible:
    sign(v) · ((2|v| + q) // (2q))."""
    if value >= 0:
        return (2 * value + q) // (2 * q)
    return -((-2 * value + q) // (2 * q))


# --------------------------------------------------------------------------
# Bit-level entropy coding
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing, T.81 §B.1.1.5
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment: unstuffs 0xFF00, stops at any
    other marker (left for the segment parser)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 7)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    if nxt is not None else "JPEG entropy stream truncated at 0xFF"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _canonical_codes(bits, values):
    """(value → (code, length)) canonical Huffman assignment, T.81 §C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """min/max-code table walk (T.81 §F.2.2.3) — decodes one symbol per
    call from a _BitReader."""

    def __init__(self, bits, values):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        if k != len(self.values):
            raise ValueError(
                f"DHT count mismatch: bits promise {k} values, got {len(self.values)}"
            )

    def decode(self, br: _BitReader) -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code (>16 bits) in JPEG stream")
            code = (code << 1) | br.bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


def _magnitude_bits(v: int):
    """(category, appended-bits) for a DC diff / AC value, T.81 §F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of _magnitude_bits, T.81 §F.2.2.1 EXTEND."""
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _fdct_blocks(blocks):
    """int64 (n, 8, 8) spatial (level-shifted) → (n, 8, 8) coefficients.
    One einsum pair, single rounding shift (arithmetic >> floors)."""
    import numpy as np

    m = _m()
    g = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    return (g + DCT_ROUND) >> DCT_SHIFT


def _idct_blocks(coefs):
    """int64 (n, 8, 8) dequantized coefficients → (n, 8, 8) spatial
    (still level-shifted; caller adds 128 and clamps)."""
    import numpy as np

    m = _m()
    g = np.einsum("ux,nuv,vy->nxy", m, coefs, m)
    return (g + DCT_ROUND) >> DCT_SHIFT


def _to_blocks(plane):
    """(H, W) int64, H/W multiples of 8 → (nby, nbx, 8, 8) block view
    flattened to (n, 8, 8), row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_block(bw: _BitWriter, f, q, dct, act, pred: int) -> int:
    """Entropy-encode one quantized block (DC diff + AC run-length);
    returns the new DC predictor."""
    zz = [quantize(int(f.flat[ZIGZAG[i]]), q[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    s, bits = _magnitude_bits(diff)
    code, ln = dct[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits = _magnitude_bits(zz[i])
        code, ln = act[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = act[0x00]  # EOB
        bw.put(code, ln)
    return zz[0]


def _pad_replicate(plane, ph: int, pw: int):
    """Edge-replicate a (h, w) int64 plane up to (ph, pw)."""
    import numpy as np

    h, w = plane.shape
    out = np.empty((ph, pw), dtype=np.int64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(width: int, height: int, rgb, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """Encode a (height, width, 3) RGB array as a real baseline JFIF JPEG:
    integer YCbCr conversion, edge-replicated padding, integer fDCT,
    Annex-K-scaled quantization, canonical Huffman entropy coding with
    byte stuffing. ``subsampling``: "444" (every component full-res, 1×1
    MCUs) or "420" (chroma box-averaged 2×2 with round-half-up — the
    dominant real-world layout; MCU = 4 Y blocks + Cb + Cr over a 16×16
    tile). Deterministic: same input → same bytes."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    if width < 1 or height < 1 or width > 65535 or height > 65535:
        raise ValueError(f"bad JPEG dimensions {width}x{height}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    ycc = rgb_to_ycbcr(rgb)
    ql, qc = scaled_qtables(quality)
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    if subsampling == "444":
        samp = (0x11, 0x11, 0x11)
        ph, pw = (height + 7) & ~7, (width + 7) & ~7
        planes = [_pad_replicate(ycc[:, :, c], ph, pw) for c in range(3)]
    else:
        samp = (0x22, 0x11, 0x11)
        ph, pw = (height + 15) & ~15, (width + 15) & ~15
        y = _pad_replicate(ycc[:, :, 0], ph, pw)
        # chroma box average 2×2 with round-half-up — integer, deterministic
        sub = []
        for c in (1, 2):
            p = _pad_replicate(ycc[:, :, c], ph, pw)
            q4 = p.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3))
            sub.append((q4 + 2) >> 2)
        planes = [y, sub[0], sub[1]]

    comp_coefs = [_fdct_blocks(_to_blocks(p - 128)) for p in planes]

    bw = _BitWriter()
    pred = [0, 0, 0]
    if subsampling == "444":
        nbx, nby = pw // 8, ph // 8
        for by in range(nby):
            for bx in range(nbx):
                for c in range(3):
                    q = ql if c == 0 else qc
                    dct, act = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
                    pred[c] = _encode_block(
                        bw, comp_coefs[c][by * nbx + bx], q, dct, act, pred[c]
                    )
    else:
        mcux, mcuy = pw // 16, ph // 16
        ybw = pw // 8  # Y plane blocks per row
        cbw = pw // 16  # chroma plane blocks per row
        for my in range(mcuy):
            for mx in range(mcux):
                for vy in range(2):  # 4 Y blocks, raster within the MCU
                    for vx in range(2):
                        bi = (2 * my + vy) * ybw + (2 * mx + vx)
                        pred[0] = _encode_block(
                            bw, comp_coefs[0][bi], ql, dc_l, ac_l, pred[0]
                        )
                for c in (1, 2):
                    bi = my * cbw + mx
                    pred[c] = _encode_block(
                        bw, comp_coefs[c][bi], qc, dc_c, ac_c, pred[c]
                    )
    entropy = bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tbl in ((0, ql), (1, qc)):
        zz_tbl = bytes(tbl[ZIGZAG[i]] for i in range(64))
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + zz_tbl
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack(">BBB", cid, samp[cid - 1], tq)
    for tc_th, (bits, values) in (
        (0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA),
        (0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA),
    ):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tables)
    out += b"\x00\x3F\x00"  # Ss, Se, Ah/Al (baseline full scan)
    out += entropy
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def encode_jpeg_gray(width: int, height: int, gray, quality: int = 85) -> bytes:
    """Encode a (height, width) 8-bit grayscale array as a real baseline
    single-component JFIF JPEG (luma tables only, 1×1 sampling) — the
    common web layout for scanned/monochrome content. Deterministic."""
    import numpy as np

    gray = np.asarray(gray, dtype=np.uint8).reshape(height, width)
    if width < 1 or height < 1 or width > 65535 or height > 65535:
        raise ValueError(f"bad JPEG dimensions {width}x{height}")
    ql, _ = scaled_qtables(quality)
    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    ph, pw = (height + 7) & ~7, (width + 7) & ~7
    plane = _pad_replicate(gray.astype(np.int64), ph, pw)
    coefs = _fdct_blocks(_to_blocks(plane - 128))

    bw = _BitWriter()
    pred = 0
    for bi in range(len(coefs)):
        pred = _encode_block(bw, coefs[bi], ql, dc_l, ac_l, pred)
    entropy = bw.flush()

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes(ql[ZIGZAG[i]] for i in range(64))
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    for tc_th, (bits, values) in ((0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 8, 1) + struct.pack(">BB", 1, 0x00)
    out += b"\x00\x3F\x00"
    out += entropy
    out += b"\xFF\xD9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg_pixels(payload: bytes):
    """REAL byte-level baseline JPEG decode to a (height, width, 3) uint8
    RGB array: marker walk (DQT/SOF0/DHT/DRI/SOS, APPn/COM skipped),
    canonical Huffman entropy decode with byte unstuffing and restart
    handling, dequantize, vectorized integer IDCT, +128 level shift,
    nearest chroma upsampling for subsampled planes, integer YCbCr→RGB,
    crop to the SOF dimensions. Only baseline 8-bit 3-component 4:4:4 or
    4:2:0 is accepted; everything else fails loudly."""
    import numpy as np

    d = payload
    if d[:2] != b"\xFF\xD8":
        raise ValueError(f"not a JPEG (SOI missing, got {d[:2]!r})")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[int, _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG: no SOS before end of data")
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}, got 0x{d[pos]:02X}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(d):
            raise ValueError("truncated JPEG: fill bytes run to end of data")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", d[pos : pos + 2])
        seg = d[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError(f"truncated JPEG segment 0xFF{marker:02X} at byte {pos}")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported (baseline)")
                zz = seg[p + 1 : p + 65]
                if len(zz) != 64:
                    raise ValueError("truncated DQT table")
                nat = [0] * 64
                for i in range(64):
                    nat[ZIGZAG[i]] = zz[i]
                qtables[tq] = nat
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {nc} (grayscale or YCbCr)"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, samp >> 4, samp & 15, tq))
            samps = tuple((hh, vv) for _, hh, vv, _ in comps)
            if samps not in (
                ((1, 1),),  # grayscale
                ((1, 1), (1, 1), (1, 1)),  # 4:4:4
                ((2, 2), (1, 1), (1, 1)),  # 4:2:0
            ):
                raise ValueError(
                    f"unsupported sampling layout {samps} "
                    "(grayscale, 4:4:4 and 4:2:0 only)"
                )
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0xFF{marker:02X} (baseline only)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                huff[tc_th] = _HuffDecoder(bits, values)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            break
        elif marker == 0xD9:
            raise ValueError("JPEG EOI before SOS: no image data")
        # APPn / COM / others: skip
        pos += seglen

    if sof is None:
        raise ValueError("JPEG SOS before SOF0")
    ns = seg[0]
    if ns != len(sof[2]):
        raise ValueError(
            f"scan component count {ns} does not match SOF ({len(sof[2])})"
        )
    scan = []
    for i in range(ns):
        cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
        scan.append((cs, tables >> 4, tables & 15))
    w, h, comps = sof
    by_id = {cid: (hh, vv, tq) for cid, hh, vv, tq in comps}
    hmax = max(hh for _, hh, _, _ in comps)
    vmax = max(vv for _, _, vv, _ in comps)
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        if (0x00 | td) not in huff or (0x10 | ta) not in huff:
            raise ValueError(f"scan references missing Huffman table dc={td} ac={ta}")
        hh, vv, tq = by_id[cs]
        if tq not in qtables:
            raise ValueError(f"component {cs} references missing DQT {tq}")
        order.append((huff[0x00 | td], huff[0x10 | ta], qtables[tq], hh, vv))

    entropy_start = pos + seglen
    br = _BitReader(d, entropy_start)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy
    # per-component coefficient planes sized in blocks
    plane_bw = [mcux * hh for _, _, _, hh, _ in order]
    plane_bh = [mcuy * vv for _, _, _, _, vv in order]
    coefs = [
        np.zeros((plane_bh[c] * plane_bw[c], 64), dtype=np.int64)
        for c in range(len(order))
    ]
    pred = [0] * len(order)
    mcu = 0
    expected_rst = 0
    while mcu < n_mcus:
        my, mx = divmod(mcu, mcux)
        try:
            for c, (dct, act, q, hh, vv) in enumerate(order):
                for vy in range(vv):
                    for vx in range(hh):
                        s = dct.decode(br)
                        if s > 11:
                            raise ValueError(f"invalid DC category {s}")
                        diff = _extend(br.bits(s), s)
                        pred[c] += diff
                        bi = (my * vv + vy) * plane_bw[c] + (mx * hh + vx)
                        blk = coefs[c][bi]
                        blk[0] = pred[c] * q[0]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            blk[ZIGZAG[k]] = _extend(br.bits(s), s) * q[ZIGZAG[k]]
                            k += 1
            mcu += 1
            if restart_interval and mcu < n_mcus and mcu % restart_interval == 0:
                br.byte_align()
                # consume the RSTn marker
                p = br.pos
                if d[p : p + 1] != b"\xFF" or not (0xD0 <= d[p + 1] <= 0xD7):
                    raise ValueError(f"expected restart marker at byte {p}")
                if (d[p + 1] & 7) != expected_rst:
                    raise ValueError(
                        f"restart marker out of order: got RST{d[p + 1] & 7}, "
                        f"expected RST{expected_rst}"
                    )
                br.pos = p + 2
                expected_rst = (expected_rst + 1) & 7
                pred = [0] * len(order)
        except _RestartMarker:
            raise ValueError("unexpected restart marker (no DRI)") from None

    planes = []
    for c, (_, _, _, hh, vv) in enumerate(order):
        bh, bw_ = plane_bh[c], plane_bw[c]
        spatial = _idct_blocks(coefs[c].reshape(bh * bw_, 8, 8)) + 128
        plane = (
            spatial.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        plane = np.clip(plane, 0, 255)
        # nearest (pixel-replication) chroma upsample back to full res
        if vmax // vv > 1:
            plane = np.repeat(plane, vmax // vv, axis=0)
        if hmax // hh > 1:
            plane = np.repeat(plane, hmax // hh, axis=1)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])
    if len(planes) == 1:  # grayscale: the luma plane IS the image
        g = planes[0][:h, :w].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(planes, axis=-1)[:h, :w]
    return ycbcr_to_rgb(ycc)


def decode_jpeg(payload: bytes) -> dict:
    """JPEG decode to the same integer-exact channel statistics as the
    other real image decoders (PPM/BMP/PNG) — see
    :func:`decode_jpeg_pixels` for the byte-level parse."""
    rgb = decode_jpeg_pixels(payload).astype("int64")
    height, width = rgb.shape[0], rgb.shape[1]
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }

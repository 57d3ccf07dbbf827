"""From-scratch lossy-WebP (VP8 intra key-frame) codec — stdlib + numpy.

The reference accepts ``webp`` through PIL
(/root/reference/src/simple_ocr/config.py:114, adapters decode via PIL);
this repo's VP8L (lossless) decoder landed earlier — this module closes
the LOSSY half with a real RFC 6386-shaped codec pair:

* boolean arithmetic coder (§7): decoder with 8-bit renormalization,
  encoder with exact carry handling (big-int lower bound);
* key-frame syntax: frame tag + start code + dims, first-partition header
  (color space, segmentation off, loop filter fields, partition count,
  quantizer indices, coefficient-probability update flags, per-MB skip),
  per-MB intra modes — 16×16 DC/V/H/TM, B_PRED with all ten 4×4 submodes
  coded under above/left submode contexts, chroma DC/V/H/TM — and a
  separate DCT-token partition; B_PRED macroblocks take plane-3
  coefficients with no Y2 (contexts carried over) and reconstruct
  subblock-sequentially, each 4×4 predicting from already-written pixels
  including the above-right rule;
* coefficient tokens (§13): 12-symbol token tree over [plane][band][ctx]
  probabilities, zero-run continuation without EOB, category extra bits,
  per-block nonzero contexts carried across the MB grid exactly as the
  spec's above/left arrays do;
* transforms: the spec's integer inverse DCT (20091/35468 multipliers)
  and inverse Walsh–Hadamard for the Y2 DC plane; the ENCODER derives its
  forward transforms numerically as the float inverse of the decoder's
  linearized inverse — by construction the pair reconstructs within
  integer-rounding error without transcribing forward-transform constants;
* full decoder-parity reconstruction in the encoder (prediction from
  reconstructed neighbors, dequant + integer IDCT), so tests assert the
  decoder's pixels are BIT-EXACT to the encoder's own reconstruction.

Honesty seams, stated loudly: the normative DEFAULT probability tables
and quantizer ladders of RFC 6386 are multi-KB constants that cannot be
verified in this sandbox (no spec text, no libwebp/PIL to cross-decode);
this module ships its OWN clearly-marked tables (same shapes, same roles)
— every file this encoder produces decodes exactly, but interoperating
with external VP8 files additionally requires dropping in the RFC's
constants for ``DEFAULT_COEFF_PROBS``, ``COEFF_UPDATE_PROBS``,
``KF_BMODE_PROB``, ``DC_QLOOKUP``/``AC_QLOOKUP``. Both loop-filter
profiles are implemented as reconstruction post-passes (simple:
luma-only 2-tap; normal: luma+chroma 4/6-tap with high-edge-variance
dispatch) — the tables are the one remaining interop seam.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedVp8Error(ValueError):
    """Interframes, B_PRED, loop-filtered or corrupt payloads — the seam
    where a full libwebp-class decoder would take over."""


# ---------------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    """8-bit-renormalizing arithmetic decoder over a byte string."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self._bits = 0  # bits consumed since last byte load

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            bit = 1
            self.range -= split
            self.value -= bigsplit
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self._bits += 1
            if self._bits == 8:
                self._bits = 0
                nxt = self._d[self._pos] if self._pos < len(self._d) else 0
                self._pos += 1
                self.value |= nxt
        return bit

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.get(128) else v

    def tree(self, tree: tuple[int, ...], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Exact mirror of :class:`BoolDecoder`. The lower interval bound is a
    Python big int, so carries propagate arithmetically instead of through
    the in-stream carry walk real encoders need — the emitted bytes are the
    binary expansion of the final lower bound, which the decoder retraces
    bit-for-bit."""

    def __init__(self) -> None:
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def literal(self, value: int, nbits: int) -> None:
        for i in reversed(range(nbits)):
            self.put(128, (value >> i) & 1)

    def tree(self, tree: tuple[int, ...], probs, symbol: int) -> None:
        # walk the tree emitting the branch bits that lead to -symbol
        path: list[tuple[int, int]] = []

        def walk(i: int) -> bool:
            for b in (0, 1):
                t = tree[i + b]
                if t == -symbol and t <= 0:
                    path.append((i >> 1, b))
                    return True
                if t > 0:
                    path.append((i >> 1, b))
                    if walk(t):
                        return True
                    path.pop()
            return False

        if not walk(0):
            raise ValueError(f"symbol {symbol} not in tree")
        for pi, b in path:
            self.put(probs[pi], b)

    def flush(self) -> bytes:
        # the decoder pre-loads 16 bits, so the code value occupies
        # nbits + 8 fractional bits; pad the lower bound to whole bytes
        # (zero continuation keeps the value inside [low, low+range))
        total = self.nbits + 8
        pad = -total % 8
        v = self.low << pad
        n = (total + pad) // 8
        return v.to_bytes(n, "big") + b"\x00\x00"


# ---------------------------------------------------------------------------
# Trees and fixed key-frame mode probabilities (RFC 6386 §8, §11)
# ---------------------------------------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)

# 4x4 submodes (B_PRED macroblocks)
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
#: key-frame submode probabilities are context-conditioned on the above
#: and left neighbors' submodes (a 10x10x9 table in RFC 6386 §11.4); this
#: codec ships ONE module-own 9-vector for every context — the context
#: TRACKING below is structurally faithful, the values are a documented
#: drop-in seam like the coefficient tables
KF_BMODE_PROB = (132, 112, 140, 128, 130, 128, 128, 128, 128)
#: a 16x16-mode neighbor contributes its "equivalent" submode as context
MODE_TO_SUBMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# coefficient token alphabet (§13.2)
ZERO_TOKEN, ONE_TOKEN, TWO_TOKEN, THREE_TOKEN, FOUR_TOKEN = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6 = 5, 6, 7, 8, 9, 10
EOB_TOKEN = 11

COEFF_TREE = (
    -EOB_TOKEN, 2,
    -ZERO_TOKEN, 4,
    -ONE_TOKEN, 6,
    8, 12,
    -TWO_TOKEN, 10,
    -THREE_TOKEN, -FOUR_TOKEN,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)

#: (base value, extra-bit probabilities) per category token
CAT_EXTRA = {
    CAT1: (5, (159,)),
    CAT2: (7, (165, 145)),
    CAT3: (11, (173, 148, 140)),
    CAT4: (19, (176, 155, 140, 135)),
    CAT5: (35, (180, 157, 141, 134, 130)),
    CAT6: (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# MODULE-OWN default token probabilities [plane 4][band 8][ctx 3][node 11]
# (shape and role of RFC 6386 §13.5's table; values are this codec's own —
# heavy EOB/ZERO bias, flatter toward high categories). Swapping in the
# normative table is a one-constant change.
_NODE = (198, 120, 240, 180, 170, 160, 150, 150, 150, 150, 150)
DEFAULT_COEFF_PROBS = tuple(
    tuple(tuple(_NODE for _ in range(3)) for _ in range(8)) for _ in range(4)
)
#: probabilities for the header's per-prob update FLAGS (all "keep") —
#: same shape/role as the RFC's coeff_update_probs, module-own values
COEFF_UPDATE_PROB = 250

# MODULE-OWN quantizer ladders (monotone, VP8-shaped: dc ~4..500,
# ac ~4..560 over 128 indices). Same role as dc_qlookup/ac_qlookup.
DC_QLOOKUP = tuple(4 + (i * i) // 36 + i for i in range(128))
AC_QLOOKUP = tuple(4 + (i * i) // 32 + i for i in range(128))


def _quantizers(qi: int) -> tuple[int, int, int, int, int, int]:
    """(y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac) for a quantizer index,
    with the spec's Y2 scaling (dc×2, ac×155/100 min 8) and UV DC cap."""
    qi = max(0, min(127, qi))
    dc, ac = DC_QLOOKUP[qi], AC_QLOOKUP[qi]
    y2_dc = dc * 2
    y2_ac = max(8, (ac * 155) // 100)
    uv_dc = min(dc, 132)
    return dc, ac, y2_dc, y2_ac, uv_dc, ac


# ---------------------------------------------------------------------------
# Transforms: integer inverse (spec §14.3/§14.4) + numeric forward
# ---------------------------------------------------------------------------

_COS = 20091  # cospi8sqrt2 - 1, Q16
_SIN = 35468  # sinpi8sqrt2, Q16


def _idct_pass(src: np.ndarray) -> np.ndarray:
    """One butterfly pass over axis-0 4-vectors (vectorized across axis 1)."""
    a1 = src[0] + src[2]
    b1 = src[0] - src[2]
    t1 = (src[1] * _SIN) >> 16
    t2 = src[3] + ((src[3] * _COS) >> 16)
    c1 = t1 - t2
    t1 = src[1] + ((src[1] * _COS) >> 16)
    t2 = (src[3] * _SIN) >> 16
    d1 = t1 + t2
    return np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1])


def idct4x4(block: np.ndarray) -> np.ndarray:
    """VP8 integer inverse DCT, (4,4) int in → (4,4) int32 out: columns
    then rows, final (x + 4) >> 3."""
    cols = _idct_pass(block.astype(np.int64))
    rows = _idct_pass(cols.T).T
    return ((rows + 4) >> 3).astype(np.int32)


def idct4x4_batch(blocks: np.ndarray) -> np.ndarray:
    """Batched inverse DCT, (n,4,4) → (n,4,4): both butterfly passes run
    once over all blocks (the per-block hot path of reconstruction)."""
    x = blocks.astype(np.int64)
    n = x.shape[0]
    p1 = _idct_pass(x.transpose(1, 0, 2).reshape(4, -1))
    p1 = p1.reshape(4, n, 4).transpose(1, 0, 2)
    p2 = _idct_pass(p1.transpose(2, 0, 1).reshape(4, -1))
    p2 = p2.reshape(4, n, 4).transpose(1, 2, 0)
    return ((p2 + 4) >> 3).astype(np.int32)


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """VP8 inverse Walsh–Hadamard (Y2 DC plane), (4,4) int32 → (4,4)."""
    ip = block.astype(np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    tmp = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1])
    t = tmp.T
    a1 = t[0] + t[3]
    b1 = t[1] + t[2]
    c1 = t[1] - t[2]
    d1 = t[0] - t[3]
    out = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1])
    return ((out.T + 3) >> 3).astype(np.int32)


def _linear_matrix(fn) -> np.ndarray:
    """(16,16) float matrix of a 4x4 integer transform's LINEAR part,
    probed column-by-column with scaled unit inputs (the integer rounding
    becomes negligible at large amplitude)."""
    m = np.empty((16, 16))
    for i in range(16):
        e = np.zeros(16, dtype=np.int64)
        e[i] = 1 << 16
        out = fn(e.reshape(4, 4).astype(np.int64))
        m[:, i] = out.reshape(16) / (1 << 16)
    return m


_FDCT_M = np.linalg.inv(_linear_matrix(idct4x4))
_FWHT_M = np.linalg.inv(_linear_matrix(iwht4x4))


def fdct4x4(res: np.ndarray) -> np.ndarray:
    """Forward DCT = numeric inverse of the integer IDCT's linear part."""
    return np.rint(_FDCT_M @ res.reshape(16).astype(np.float64)).astype(
        np.int64
    ).reshape(4, 4)


def fdct4x4_batch(res: np.ndarray) -> np.ndarray:
    """Batched forward DCT, (n,4,4) → (n,4,4): one matmul."""
    flat = res.reshape(res.shape[0], 16).astype(np.float64)
    return np.rint(flat @ _FDCT_M.T).astype(np.int64).reshape(-1, 4, 4)


def fwht4x4(res: np.ndarray) -> np.ndarray:
    return np.rint(_FWHT_M @ res.reshape(16).astype(np.float64)).astype(
        np.int64
    ).reshape(4, 4)


# ---------------------------------------------------------------------------
# Intra prediction (16x16 luma / 8x8 chroma; §12.2)
# ---------------------------------------------------------------------------


def _predict(mode: int, above: np.ndarray | None, left: np.ndarray | None,
             corner: int, size: int) -> np.ndarray:
    """One intra-predicted block. ``above``/``left`` are reconstructed
    neighbor rows/cols (None outside the frame), ``corner`` the above-left
    sample (128 outside)."""
    if mode == DC_PRED:
        if above is None and left is None:
            val = 128
        elif above is None:
            val = (int(left.sum()) + size // 2) // size
        elif left is None:
            val = (int(above.sum()) + size // 2) // size
        else:
            val = (int(above.sum()) + int(left.sum()) + size) // (2 * size)
        return np.full((size, size), val, dtype=np.int32)
    if mode == V_PRED:
        row = above if above is not None else np.full(size, 127)
        return np.tile(row.astype(np.int32), (size, 1))
    if mode == H_PRED:
        col = left if left is not None else np.full(size, 129)
        return np.tile(col.astype(np.int32).reshape(-1, 1), (1, size))
    # TM_PRED
    row = (above if above is not None else np.full(size, 127)).astype(np.int32)
    col = (left if left is not None else np.full(size, 129)).astype(np.int32)
    p = col.reshape(-1, 1) + row.reshape(1, -1) - int(corner)
    return np.clip(p, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _predict4(mode: int, A: np.ndarray, L: np.ndarray, P: int) -> np.ndarray:
    """One 4x4 intra-predicted subblock. ``A`` holds the 8 above pixels
    (4 above + 4 above-right), ``L`` the 4 left pixels, ``P`` the corner.
    The ten modes follow the spec's averaging structure (``avg2``/``avg3``
    over the edge sequences); like the probability tables, the four
    compound-diagonal modes (VR/VL/HD/HU) are self-consistent module
    definitions rather than externally cross-validated pixel tables."""
    A = A.astype(np.int32)
    L = L.astype(np.int32)
    out = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        out[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        out[:] = np.clip(L.reshape(4, 1) + A[:4].reshape(1, 4) - P, 0, 255)
    elif mode == B_VE:
        e = np.concatenate(([P], A[:5]))
        row = np.array([_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)])
        out[:] = row.reshape(1, 4)
    elif mode == B_HE:
        e = np.array([P, L[0], L[1], L[2], L[3], L[3]])
        col = np.array([_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)])
        out[:] = col.reshape(4, 1)
    elif mode == B_LD:
        e = np.concatenate((A, [A[7]]))
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r, c] = _avg3(e[i], e[i + 1], e[min(i + 2, 8)])
    elif mode == B_RD:
        e = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]])
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                out[r, c] = _avg3(e[i - 1], e[i], e[min(i + 1, 8)])
    elif mode == B_VR:
        e = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]])
        for r in range(4):
            for c in range(4):
                i = 4 + c - (r >> 1)
                if (r % 2) == 0:
                    out[r, c] = _avg2(e[i], e[min(i + 1, 8)])
                else:
                    out[r, c] = _avg3(e[i - 1], e[i], e[min(i + 1, 8)])
    elif mode == B_VL:
        e = np.concatenate((A, [A[7]]))
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if (r % 2) == 0:
                    out[r, c] = _avg2(e[i], e[i + 1])
                else:
                    out[r, c] = _avg3(e[i], e[i + 1], e[min(i + 2, 8)])
    elif mode == B_HD:
        e = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]])
        for r in range(4):
            for c in range(4):
                i = 3 - r + (c >> 1)
                if (c % 2) == 0:
                    out[r, c] = _avg2(e[i], e[min(i + 1, 7)])
                else:
                    out[r, c] = _avg3(e[i], e[min(i + 1, 7)], e[min(i + 2, 7)])
    else:  # B_HU
        e = np.array([L[0], L[1], L[2], L[3], L[3]])
        for r in range(4):
            for c in range(4):
                i = min(r + (c >> 1), 3)
                if (c % 2) == 0:
                    out[r, c] = _avg2(e[i], e[min(i + 1, 4)])
                else:
                    out[r, c] = _avg3(e[i], e[min(i + 1, 4)], e[min(i + 2, 4)])
    return out


def _sub_neighbors(y_plane: np.ndarray, r0: int, c0: int, sr: int, sc: int,
                   mb_last_col: bool) -> tuple[np.ndarray, np.ndarray, int]:
    """(A8, L4, P) for the 4x4 subblock whose top-left pixel is (r0, c0).
    Frame edges take the 127 (above) / 129 (left) / 128 (origin corner)
    conventions of the 16x16 path. Above-right pixels are real when the
    four pixels at ``y_plane[r0-1, c0+4:c0+8]`` are already reconstructed
    in decode order (any subblock except the right MB column below the MB
    top row, and except past the padded frame edge) — otherwise the last
    above pixel is replicated; both codec sides share this rule."""
    h, w = y_plane.shape
    if r0 == 0:
        A = np.full(8, 127, dtype=np.int32)
    else:
        A = np.empty(8, dtype=np.int32)
        A[:4] = y_plane[r0 - 1, c0 : c0 + 4]
        ar_ok = c0 + 8 <= w and (sr == 0 or sc < 3) and not (
            sr == 0 and sc == 3 and mb_last_col
        )
        A[4:] = y_plane[r0 - 1, c0 + 4 : c0 + 8] if ar_ok else A[3]
    L = (
        y_plane[r0 : r0 + 4, c0 - 1].astype(np.int32)
        if c0
        else np.full(4, 129, dtype=np.int32)
    )
    P = int(y_plane[r0 - 1, c0 - 1]) if (r0 and c0) else (
        127 if r0 else 129 if c0 else 128
    )
    return A, L, P


# ---------------------------------------------------------------------------
# Coefficient-token coding (§13)
# ---------------------------------------------------------------------------


def _decode_coeffs(bd: BoolDecoder, probs, first: int, ctx: int,
                   qdc: int, qac: int) -> tuple[np.ndarray, int]:
    """One block's dequantized coefficients (natural order) + nonzero flag."""
    out = np.zeros(16, dtype=np.int64)
    c = first
    nz = 0
    prev_zero = False
    while c < 16:
        p = probs[COEFF_BANDS[c]][ctx]
        start = 2 if prev_zero else 0  # a zero run cannot end in EOB
        i = start
        while True:
            i = COEFF_TREE[i + bd.get(p[i >> 1])]
            if i <= 0:
                tok = -i
                break
        if tok == EOB_TOKEN:
            break
        if tok == ZERO_TOKEN:
            ctx = 0
            prev_zero = True
            c += 1
            continue
        prev_zero = False
        if tok <= FOUR_TOKEN:
            val = tok  # ONE..FOUR encode their value
        else:
            base, extra_probs = CAT_EXTRA[tok]
            extra = 0
            for ep in extra_probs:
                extra = (extra << 1) | bd.get(ep)
            val = base + extra
        if bd.get(128):
            val = -val
        out[ZIGZAG[c]] = val * (qdc if c == 0 else qac)
        nz = 1
        ctx = 1 if abs(val) == 1 else 2
        c += 1
    return out, nz


def _token_for(val: int) -> int:
    a = abs(val)
    if a <= 4:
        return (ZERO_TOKEN, ONE_TOKEN, TWO_TOKEN, THREE_TOKEN, FOUR_TOKEN)[a]
    for tok in (CAT1, CAT2, CAT3, CAT4, CAT5, CAT6):
        base, probs = CAT_EXTRA[tok]
        if a < base + (1 << len(probs)):
            return tok
    raise UnsupportedVp8Error(f"coefficient {val} out of range")


def _encode_coeffs(be: BoolEncoder, probs, first: int, ctx: int,
                   quant: np.ndarray) -> int:
    """Encode one block's QUANTIZED coefficients (natural order); returns
    the nonzero flag. Mirrors ``_decode_coeffs`` decision-for-decision."""
    zz = [int(quant[ZIGZAG[c]]) for c in range(16)]
    last = -1
    for c in range(first, 16):
        if zz[c]:
            last = c
    nz = 1 if last >= first else 0
    c = first
    prev_zero = False
    while c < 16:
        p = probs[COEFF_BANDS[c]][ctx]
        if c > last:
            if not prev_zero:  # EOB is only codable after a nonzero
                _put_tree_from(be, p, EOB_TOKEN, 0)
            break
        val = zz[c]
        tok = _token_for(val)
        _put_tree_from(be, p, tok, 2 if prev_zero else 0)
        if tok == ZERO_TOKEN:
            ctx = 0
            prev_zero = True
            c += 1
            continue
        prev_zero = False
        if tok > FOUR_TOKEN:
            base, extra_probs = CAT_EXTRA[tok]
            extra = abs(val) - base
            for k, ep in enumerate(extra_probs):
                be.put(ep, (extra >> (len(extra_probs) - 1 - k)) & 1)
        be.put(128, 1 if val < 0 else 0)
        ctx = 1 if abs(val) == 1 else 2
        c += 1
    return nz


def _put_tree_from(be: BoolEncoder, probs, symbol: int, start: int) -> None:
    """Tree-encode from a given start node (2 = the no-EOB entry point)."""
    path: list[tuple[int, int]] = []

    def walk(i: int) -> bool:
        for b in (0, 1):
            t = COEFF_TREE[i + b]
            if t <= 0 and -t == symbol:
                path.append((i >> 1, b))
                return True
            if t > 0:
                path.append((i >> 1, b))
                if walk(t):
                    return True
                path.pop()
        return False

    if not walk(start):
        raise ValueError(f"token {symbol} unreachable from node {start}")
    for pi, b in path:
        be.put(probs[pi], b)


# ---------------------------------------------------------------------------
# Color conversion (shared with the JPEG module's convention: full-range
# BT.601 — self-consistent across this codec pair)
# ---------------------------------------------------------------------------


def _rgb_to_yuv420(img: np.ndarray):
    h, w = img.shape[:2]
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    # pad to whole MBs (replicate edges), subsample chroma 2x2
    mh, mw = -h % 16, -w % 16
    y = np.pad(y, ((0, mh), (0, mw)), mode="edge")
    cb = np.pad(cb, ((0, mh), (0, mw)), mode="edge")
    cr = np.pad(cr, ((0, mh), (0, mw)), mode="edge")
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    to8 = lambda a: np.clip(np.rint(a), 0, 255).astype(np.uint8)
    return to8(y), to8(cb), to8(cr)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                   h: int, w: int) -> np.ndarray:
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (crf - 128)
    g = yf - 0.344136 * (cbf - 128) - 0.714136 * (crf - 128)
    b = yf + 1.772 * (cbf - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)[:h, :w]


# ---------------------------------------------------------------------------
# Loop filter (simple profile, §15.2) — a LUMA post-pass over the
# reconstructed frame. Intra prediction reads the unfiltered
# reconstruction, so both codec sides run this identically after the MB
# loop; a constant surface passes through unchanged (a = 0), which keeps
# constant-gray exactness intact.
# ---------------------------------------------------------------------------


def _sclamp(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -128, 127)


def _simple_edge(p1, p0, q0, q1, limit: int):
    """Common adjustment of the simple filter across one edge (vectorized
    along it): returns (new_p0, new_q0). Values are unsigned uint8 rows."""
    P1 = p1.astype(np.int32) - 128
    P0 = p0.astype(np.int32) - 128
    Q0 = q0.astype(np.int32) - 128
    Q1 = q1.astype(np.int32) - 128
    mask = (np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1)) <= limit
    a = _sclamp(_sclamp(P1 - Q1) + 3 * (Q0 - P0))
    F = _sclamp(a + 4) >> 3
    E = _sclamp(a + 3) >> 3
    new_q0 = np.where(mask, np.clip(Q0 - F + 128, 0, 255), q0)
    new_p0 = np.where(mask, np.clip(P0 + E + 128, 0, 255), p0)
    return new_p0.astype(np.int32), new_q0.astype(np.int32)


def _filter_limits(level: int, sharpness: int) -> tuple[int, int, int]:
    """(macroblock-edge limit, interior/subblock-edge limit, interior
    threshold) — the single derivation both filter profiles use."""
    interior = level
    if sharpness:
        interior >>= 1 if sharpness <= 4 else 2
        interior = min(interior, 9 - sharpness)
    interior = max(interior, 1)
    return (level + 2) * 2 + interior, level * 2 + interior, interior


def _hev_threshold(level: int) -> int:
    """High-edge-variance threshold (key-frame schedule)."""
    return 2 if level >= 40 else (1 if level >= 15 else 0)


def _normal_mask(px, limit: int, interior: int) -> np.ndarray:
    """Normal-profile filter mask over p3..q3 (8 rows of edge pixels)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (x.astype(np.int32) for x in px)
    return (
        (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
        & ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit)
    )


def _normal_subblock_edge(px, limit: int, interior: int, hev_thr: int):
    """Normal-profile 4-tap filter (subblock edges): adjusts p1,p0,q0,q1.
    ``px`` is the tuple (p3..q3) of uint-valued rows; returns the adjusted
    (p1, p0, q0, q1)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (x.astype(np.int32) for x in px)
    mask = _normal_mask(px, limit, interior)
    hev = (np.abs(p1 - p0) > hev_thr) | (np.abs(q1 - q0) > hev_thr)
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    f = np.where(hev, _sclamp(ps1 - qs1), 0)
    f = _sclamp(f + 3 * (qs0 - ps0))
    f = np.where(mask, f, 0)
    F1 = _sclamp(f + 4) >> 3
    F2 = _sclamp(f + 3) >> 3
    qs0 = _sclamp(qs0 - F1)
    ps0 = _sclamp(ps0 + F2)
    a = np.where(~hev & mask, (F1 + 1) >> 1, 0)
    qs1 = _sclamp(qs1 - a)
    ps1 = _sclamp(ps1 + a)
    to8 = lambda v: np.clip(v + 128, 0, 255).astype(np.int32)
    return to8(ps1), to8(ps0), to8(qs0), to8(qs1)


def _normal_mb_edge(px, limit: int, interior: int, hev_thr: int):
    """Normal-profile 6-tap filter (MB edges): adjusts p2..q2. High-edge-
    variance positions take the sharp 4-tap instead (spec structure; the
    27/18/9 taper constants follow the reference filter)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (x.astype(np.int32) for x in px)
    mask = _normal_mask(px, limit, interior)
    hev = (np.abs(p1 - p0) > hev_thr) | (np.abs(q1 - q0) > hev_thr)
    ps2, ps1, ps0 = p2 - 128, p1 - 128, p0 - 128
    qs0, qs1, qs2 = q0 - 128, q1 - 128, q2 - 128
    w = _sclamp(_sclamp(ps1 - qs1) + 3 * (qs0 - ps0))
    # hev positions: sharp 4-tap on p0/q0 only
    fh = np.where(mask & hev, w, 0)
    F1 = _sclamp(fh + 4) >> 3
    F2 = _sclamp(fh + 3) >> 3
    qs0 = _sclamp(qs0 - F1)
    ps0 = _sclamp(ps0 + F2)
    # non-hev positions: tapered 6-tap across three pixel pairs
    wn = np.where(mask & ~hev, w, 0)
    u = _sclamp((27 * wn + 63) >> 7)
    qs0 = _sclamp(qs0 - u)
    ps0 = _sclamp(ps0 + u)
    u = _sclamp((18 * wn + 63) >> 7)
    qs1 = _sclamp(qs1 - u)
    ps1 = _sclamp(ps1 + u)
    u = _sclamp((9 * wn + 63) >> 7)
    qs2 = _sclamp(qs2 - u)
    ps2 = _sclamp(ps2 + u)
    to8 = lambda v: np.clip(v + 128, 0, 255).astype(np.int32)
    return tuple(to8(v) for v in (ps2, ps1, ps0, qs0, qs1, qs2))


def _gather_v(plane, rows, x):
    """(p3..q3) columns around vertical edge x."""
    return tuple(plane[rows, x + d] for d in range(-4, 4))


def _gather_h(plane, y, cols):
    return tuple(plane[y + d, cols] for d in range(-4, 4))


def _loop_filter_normal(planes, level, sharpness, mb_rows, mb_cols,
                        interior_flags) -> None:
    """Normal-profile loop filter post-pass: luma AND chroma, MB edges
    with the 6-tap filter, interior edges with the 4-tap, in MB raster
    order. Same self-consistency contract as the rest of the codec."""
    y_plane, u_plane, v_plane = planes
    mb_limit, sub_limit, interior = _filter_limits(level, sharpness)
    hev_thr = _hev_threshold(level)

    def v_edge(plane, rows, x, lim, mb):
        px = _gather_v(plane, rows, x)
        if mb:
            out = _normal_mb_edge(px, lim, interior, hev_thr)
            for d, v in zip(range(-3, 3), out):
                plane[rows, x + d] = v
        else:
            out = _normal_subblock_edge(px, lim, interior, hev_thr)
            for d, v in zip(range(-2, 2), out):
                plane[rows, x + d] = v

    def h_edge(plane, y, cols, lim, mb):
        px = _gather_h(plane, y, cols)
        if mb:
            out = _normal_mb_edge(px, lim, interior, hev_thr)
            for d, v in zip(range(-3, 3), out):
                plane[y + d, cols] = v
        else:
            out = _normal_subblock_edge(px, lim, interior, hev_thr)
            for d, v in zip(range(-2, 2), out):
                plane[y + d, cols] = v

    for mby in range(mb_rows):
        for mbx in range(mb_cols):
            y0, x0 = mby * 16, mbx * 16
            c0, cx0 = mby * 8, mbx * 8
            yrows = slice(y0, y0 + 16)
            crows = slice(c0, c0 + 8)
            if mbx:
                v_edge(y_plane, yrows, x0, mb_limit, True)
                v_edge(u_plane, crows, cx0, mb_limit, True)
                v_edge(v_plane, crows, cx0, mb_limit, True)
            if interior_flags[mby][mbx]:
                for dx in (4, 8, 12):
                    v_edge(y_plane, yrows, x0 + dx, sub_limit, False)
                v_edge(u_plane, crows, cx0 + 4, sub_limit, False)
                v_edge(v_plane, crows, cx0 + 4, sub_limit, False)
            ycols = slice(x0, x0 + 16)
            ccols = slice(cx0, cx0 + 8)
            if mby:
                h_edge(y_plane, y0, ycols, mb_limit, True)
                h_edge(u_plane, c0, ccols, mb_limit, True)
                h_edge(v_plane, c0, ccols, mb_limit, True)
            if interior_flags[mby][mbx]:
                for dy in (4, 8, 12):
                    h_edge(y_plane, y0 + dy, ycols, sub_limit, False)
                h_edge(u_plane, c0 + 4, ccols, sub_limit, False)
                h_edge(v_plane, c0 + 4, ccols, sub_limit, False)


def _loop_filter_simple(y_plane, level, sharpness, mb_rows, mb_cols,
                        interior_flags) -> None:
    """In-place simple loop filter over the luma plane, in MB raster order
    (left MB edge, interior vertical edges, top MB edge, interior
    horizontal edges — later edges see earlier edges' output).
    ``interior_flags[mby][mbx]`` gates the subblock edges: they are
    filtered only for MBs that coded coefficients or are B_PRED."""
    mb_limit, sub_limit, _ = _filter_limits(level, sharpness)
    for mby in range(mb_rows):
        for mbx in range(mb_cols):
            y0, x0 = mby * 16, mbx * 16
            rows = slice(y0, y0 + 16)
            if mbx:  # left MB edge (vertical)
                p1, q0 = y_plane[rows, x0 - 2], y_plane[rows, x0]
                p0, q1 = y_plane[rows, x0 - 1], y_plane[rows, x0 + 1]
                y_plane[rows, x0 - 1], y_plane[rows, x0] = _simple_edge(
                    p1, p0, q0, q1, mb_limit
                )
            if interior_flags[mby][mbx]:
                for dx in (4, 8, 12):
                    x = x0 + dx
                    p1, q0 = y_plane[rows, x - 2], y_plane[rows, x]
                    p0, q1 = y_plane[rows, x - 1], y_plane[rows, x + 1]
                    y_plane[rows, x - 1], y_plane[rows, x] = _simple_edge(
                        p1, p0, q0, q1, sub_limit
                    )
            cols = slice(x0, x0 + 16)
            if mby:  # top MB edge (horizontal)
                p1, q0 = y_plane[y0 - 2, cols], y_plane[y0, cols]
                p0, q1 = y_plane[y0 - 1, cols], y_plane[y0 + 1, cols]
                y_plane[y0 - 1, cols], y_plane[y0, cols] = _simple_edge(
                    p1, p0, q0, q1, mb_limit
                )
            if interior_flags[mby][mbx]:
                for dy in (4, 8, 12):
                    yy = y0 + dy
                    p1, q0 = y_plane[yy - 2, cols], y_plane[yy, cols]
                    p0, q1 = y_plane[yy - 1, cols], y_plane[yy + 1, cols]
                    y_plane[yy - 1, cols], y_plane[yy, cols] = _simple_edge(
                        p1, p0, q0, q1, sub_limit
                    )


# ---------------------------------------------------------------------------
# Frame codec
# ---------------------------------------------------------------------------


def _mb_blocks_decode(bd, probs, qs, left_nz, above_nz, mbx, has_y2=True):
    """Decode one macroblock's [Y2 +] 16 Y + 4 U + 4 V dequantized blocks.
    B_PRED macroblocks carry no Y2: their Y blocks keep their own DC
    (first coefficient 0) and use plane 3's probabilities; the Y2 nonzero
    contexts are left untouched (the carry-over rule)."""
    y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac = qs
    if has_y2:
        ctx = left_nz["y2"] + above_nz["y2"][mbx]
        y2, nz2 = _decode_coeffs(bd, probs[1], 0, ctx, y2_dc, y2_ac)
        left_nz["y2"] = nz2
        above_nz["y2"][mbx] = nz2
        dc = iwht4x4(y2.reshape(4, 4))
        y_plane_idx, first = 0, 1
    else:
        dc = None
        y_plane_idx, first = 3, 0
    yblocks = []
    for r in range(4):
        for c in range(4):
            a = above_nz["y"][mbx * 4 + c] if r == 0 else yblocks[(r - 1) * 4 + c][1]
            l = left_nz["y"][r] if c == 0 else yblocks[r * 4 + c - 1][1]
            coeffs, nz = _decode_coeffs(
                bd, probs[y_plane_idx], first, a + l, y_dc, y_ac
            )
            if has_y2:
                coeffs[0] = dc[r, c]
            yblocks.append((coeffs, nz))
    for r in range(4):
        left_nz["y"][r] = yblocks[r * 4 + 3][1]
    for c in range(4):
        above_nz["y"][mbx * 4 + c] = yblocks[3 * 4 + c][1]
    uvblocks = {}
    for plane in ("u", "v"):
        blocks = []
        for r in range(2):
            for c in range(2):
                a = above_nz[plane][mbx * 2 + c] if r == 0 else blocks[c][1]
                l = left_nz[plane][r] if c == 0 else blocks[r * 2][1]
                coeffs, nz = _decode_coeffs(bd, probs[2], 0, a + l, uv_dc, uv_ac)
                blocks.append((coeffs, nz))
        for r in range(2):
            left_nz[plane][r] = blocks[r * 2 + 1][1]
        for c in range(2):
            above_nz[plane][mbx * 2 + c] = blocks[2 + c][1]
        uvblocks[plane] = blocks
    return yblocks, uvblocks


def _bpred_luma(y_plane, mby, mbx, mb_last_col, submodes, yblocks) -> None:
    """Sequential 4x4 reconstruction of a B_PRED MB's luma: each subblock
    predicts from pixels already written (including earlier subblocks of
    the same MB), so order is part of the bitstream contract."""
    for r in range(4):
        for c in range(4):
            r0, c0 = mby * 16 + r * 4, mbx * 16 + c * 4
            A, L, P = _sub_neighbors(y_plane, r0, c0, r, c, mb_last_col)
            out = _predict4(submodes[r * 4 + c], A, L, P)
            if yblocks is not None:
                out = out + idct4x4(yblocks[r * 4 + c][0].reshape(4, 4))
            y_plane[r0 : r0 + 4, c0 : c0 + 4] = np.clip(out, 0, 255)


def _reconstruct_mb(planes, mby, mbx, ymode, uvmode, yblocks, uvblocks,
                    submodes=None, mb_last_col=False):
    """Prediction + residual IDCT for one MB, into the plane buffers."""
    y_plane, u_plane, v_plane = planes
    y0, x0 = mby * 16, mbx * 16
    if ymode == B_PRED:
        _bpred_luma(y_plane, mby, mbx, mb_last_col, submodes, yblocks)
    else:
        above = y_plane[y0 - 1, x0 : x0 + 16] if mby else None
        left = y_plane[y0 : y0 + 16, x0 - 1] if mbx else None
        corner = int(y_plane[y0 - 1, x0 - 1]) if (mby and mbx) else (
            127 if mby else 129 if mbx else 128
        )
        pred = _predict(ymode, above, left, corner, 16)
        out = pred.copy()
        if yblocks is not None:
            res = idct4x4_batch(
                np.stack([b[0] for b in yblocks]).reshape(16, 4, 4)
            )
            for r in range(4):
                for c in range(4):
                    out[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res[r * 4 + c]
        y_plane[y0 : y0 + 16, x0 : x0 + 16] = np.clip(out, 0, 255)
    for plane_name, plane in (("u", u_plane), ("v", v_plane)):
        y0c, x0c = mby * 8, mbx * 8
        above = plane[y0c - 1, x0c : x0c + 8] if mby else None
        left = plane[y0c : y0c + 8, x0c - 1] if mbx else None
        corner = int(plane[y0c - 1, x0c - 1]) if (mby and mbx) else (
            127 if mby else 129 if mbx else 128
        )
        pred = _predict(uvmode, above, left, corner, 8)
        out = pred.copy()
        if uvblocks is not None:
            res = idct4x4_batch(
                np.stack(
                    [b[0] for b in uvblocks[plane_name]]
                ).reshape(4, 4, 4)
            )
            for r in range(2):
                for c in range(2):
                    out[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res[r * 2 + c]
        plane[y0c : y0c + 8, x0c : x0c + 8] = np.clip(out, 0, 255)


def _fresh_nz(mb_cols: int):
    above = {
        "y": np.zeros(mb_cols * 4, dtype=np.int32),
        "u": np.zeros(mb_cols * 2, dtype=np.int32),
        "v": np.zeros(mb_cols * 2, dtype=np.int32),
        "y2": np.zeros(mb_cols, dtype=np.int32),
    }
    return above


def _zero_left():
    return {
        "y": np.zeros(4, dtype=np.int32),
        "u": np.zeros(2, dtype=np.int32),
        "v": np.zeros(2, dtype=np.int32),
        "y2": 0,
    }


def _clear_mb_nz(left_nz, above_nz, mbx, has_y2=True) -> None:
    left_nz["y"][:] = 0
    left_nz["u"][:] = 0
    left_nz["v"][:] = 0
    above_nz["y"][mbx * 4 : mbx * 4 + 4] = 0
    above_nz["u"][mbx * 2 : mbx * 2 + 2] = 0
    above_nz["v"][mbx * 2 : mbx * 2 + 2] = 0
    if has_y2:  # B_PRED MBs never touch the Y2 contexts (carry-over rule)
        left_nz["y2"] = 0
        above_nz["y2"][mbx] = 0


def _submode_probs(above: int, left: int):
    """Probability vector for one submode, conditioned on the above/left
    neighbor submodes. This is the SINGLE lookup both codec sides call —
    the spec's 10x10x9 table plugs in here; the module ships one shared
    vector (the documented seam)."""
    _ = (above, left)
    return KF_BMODE_PROB


def _code_submodes(code_one, above_modes, left_modes, mbx,
                   modes=None) -> list[int]:
    """One traversal of a B_PRED MB's 16 submodes with the spec's
    above/left context bookkeeping, shared by the decoder (``code_one``
    reads a tree symbol) and the encoder (it writes ``modes[i]``)."""
    out: list[int] = []
    for r in range(4):
        for c in range(4):
            above = above_modes[mbx * 4 + c] if r == 0 else out[(r - 1) * 4 + c]
            left = left_modes[r] if c == 0 else out[r * 4 + c - 1]
            sym = None if modes is None else modes[r * 4 + c]
            out.append(code_one(_submode_probs(above, left), sym))
    for r in range(4):
        left_modes[r] = out[r * 4 + 3]
    for c in range(4):
        above_modes[mbx * 4 + c] = out[3 * 4 + c]
    return out


def _read_submodes(bd, above_modes, left_modes, mbx) -> list[int]:
    return _code_submodes(
        lambda p, _: bd.tree(BMODE_TREE, p), above_modes, left_modes, mbx
    )


def _write_submodes(be, above_modes, left_modes, mbx, modes) -> None:
    def one(p, sym: int) -> int:
        be.tree(BMODE_TREE, p, sym)
        return sym

    _code_submodes(one, above_modes, left_modes, mbx, modes)


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 key-frame bytes (a ``VP8 `` chunk body) → (h, w, 3) RGB."""
    if len(data) < 10:
        raise UnsupportedVp8Error("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise UnsupportedVp8Error("interframe — only key frames exist in WebP")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise UnsupportedVp8Error("bad VP8 start code")
    w_code, h_code = struct.unpack_from("<HH", data, 6)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise UnsupportedVp8Error("zero dimension")
    # corrupt headers can claim 16383x16383 over a handful of payload
    # bytes (the bool decoder zero-fills past the end) — at crawl scale
    # that stalls an extraction actor on one poisoned row. The per-MB
    # loops are Python (~3 ms/MB), so the cap must bound WORK, not just
    # memory: 1M pixels ≈ 4096 MBs ≈ 12 s worst case, while the engine's
    # real inputs are thumbnails
    if width * height > (1 << 20):
        raise UnsupportedVp8Error(
            f"{width}x{height} exceeds the engine's decode cap"
        )
    header = data[10 : 10 + first_part_size]
    tokens = data[10 + first_part_size :]
    bd = BoolDecoder(header)

    bd.get(128)  # color space
    bd.get(128)  # clamping
    if bd.get(128):
        raise UnsupportedVp8Error("segmentation unsupported")
    filter_simple = bd.get(128)  # filter type: 1 = simple profile
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    if bd.get(128):
        raise UnsupportedVp8Error("per-mode loop-filter deltas unsupported")
    if bd.literal(2):
        raise UnsupportedVp8Error("multiple token partitions unsupported")
    y_ac_qi = bd.literal(7)
    for _ in range(5):  # y_dc, y2_dc, y2_ac, uv_dc, uv_ac deltas
        if bd.get(128):
            bd.signed(4)
            raise UnsupportedVp8Error("quantizer deltas unsupported")
    bd.get(128)  # refresh entropy (meaningless on key frames here)
    probs = [
        [[list(DEFAULT_COEFF_PROBS[i][j][k]) for k in range(3)]
         for j in range(8)]
        for i in range(4)
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.get(COEFF_UPDATE_PROB):
                        probs[i][j][k][l] = bd.literal(8)
    skip_enabled = bd.get(128)
    prob_skip = bd.literal(8) if skip_enabled else 0

    mb_cols, mb_rows = (width + 15) // 16, (height + 15) // 16
    qs = _quantizers(y_ac_qi)
    y_plane = np.zeros((mb_rows * 16, mb_cols * 16), dtype=np.int32)
    u_plane = np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int32)
    v_plane = np.zeros_like(u_plane)
    td = BoolDecoder(tokens)
    above_nz = _fresh_nz(mb_cols)
    above_modes = np.full(mb_cols * 4, B_DC, dtype=np.int32)
    interior_flags = [[True] * mb_cols for _ in range(mb_rows)]
    for mby in range(mb_rows):
        left_nz = _zero_left()
        left_modes = [B_DC] * 4
        for mbx in range(mb_cols):
            skip = bool(bd.get(prob_skip)) if skip_enabled else False
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            submodes = None
            if ymode == B_PRED:
                submodes = _read_submodes(bd, above_modes, left_modes, mbx)
            else:
                sub = MODE_TO_SUBMODE[ymode]
                above_modes[mbx * 4 : mbx * 4 + 4] = sub
                left_modes = [sub] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            has_y2 = ymode != B_PRED
            interior_flags[mby][mbx] = (not skip) or ymode == B_PRED
            if skip:
                _clear_mb_nz(left_nz, above_nz, mbx, has_y2)
                yblocks = uvblocks = None
            else:
                yblocks, uvblocks = _mb_blocks_decode(
                    td, probs, qs, left_nz, above_nz, mbx, has_y2
                )
            _reconstruct_mb(
                (y_plane, u_plane, v_plane), mby, mbx, ymode, uvmode,
                yblocks, uvblocks, submodes, mbx == mb_cols - 1,
            )
    if filter_level:
        if filter_simple:
            _loop_filter_simple(
                y_plane, filter_level, sharpness, mb_rows, mb_cols,
                interior_flags,
            )
        else:
            _loop_filter_normal(
                (y_plane, u_plane, v_plane), filter_level, sharpness,
                mb_rows, mb_cols, interior_flags,
            )
    return _yuv420_to_rgb(
        y_plane.astype(np.uint8), u_plane.astype(np.uint8),
        v_plane.astype(np.uint8), height, width,
    )


# ---------------------------------------------------------------------------
# Encoder (decoder-parity reconstruction; returns bitstream AND its recon)
# ---------------------------------------------------------------------------


def _quantize_blocks(coeffs: np.ndarray, first: int, qdc: int, qac: int
                     ) -> np.ndarray:
    """Quantize (n, 16) coefficient rows: rint against the per-position
    step, clamped to the token alphabet's maximum (CAT6 ceiling). The one
    place the ±2114 ceiling and rounding live."""
    steps = np.where(np.arange(16) == 0, qdc, qac)
    q = np.clip(np.rint(coeffs / steps).astype(np.int64), -2114, 2114)
    if first:
        q[:, :first] = 0
    return q


def _quantize_block(coeffs: np.ndarray, first: int, qdc: int, qac: int
                    ) -> np.ndarray:
    return _quantize_blocks(coeffs.reshape(1, 16), first, qdc, qac)[0]


def _best_mode(src: np.ndarray, above, left, corner, size: int
               ) -> tuple[int, int]:
    best, best_sad = DC_PRED, None
    for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
        pred = _predict(mode, above, left, corner, size)
        sad = int(np.abs(src.astype(np.int32) - pred).sum())
        if best_sad is None or sad < best_sad:
            best, best_sad = mode, sad
    return best, best_sad


def _bpred_trial(y_rec, src, mby, mbx, last_col, qdc, qac):
    """Greedy per-subblock B_PRED pass WRITING into ``y_rec`` (callers
    save/restore the MB region if 16x16 wins): each subblock tries all ten
    modes against the source, quantizes the winner's residual, and
    reconstructs so later subblocks predict from true decoder state.
    Returns (submodes, quantized blocks, reconstruction SAD)."""
    total = 0
    modes: list[int] = []
    quants: list[np.ndarray] = []
    deq_steps = np.where(np.arange(16) == 0, qdc, qac)
    for r in range(4):
        for c in range(4):
            r0, c0 = mby * 16 + r * 4, mbx * 16 + c * 4
            A, L, P = _sub_neighbors(y_rec, r0, c0, r, c, last_col)
            sblk = src[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4].astype(np.int32)
            best, bsad, bpred = B_DC, None, None
            for m in range(10):
                pred = _predict4(m, A, L, P)
                sad = int(np.abs(sblk - pred).sum())
                if bsad is None or sad < bsad:
                    best, bsad, bpred = m, sad, pred
            f = fdct4x4(sblk.astype(np.int64) - bpred)
            q = _quantize_block(f, 0, qdc, qac)
            out = np.clip(
                bpred + idct4x4((q * deq_steps).reshape(4, 4)), 0, 255
            )
            y_rec[r0 : r0 + 4, c0 : c0 + 4] = out
            total += int(np.abs(sblk - out).sum())
            modes.append(best)
            quants.append(q)
    return modes, quants, total


def encode_vp8(img: np.ndarray, qi: int = 8,
               filter_level: int | None = None,
               filter_type: str = "simple") -> tuple[bytes, np.ndarray]:
    """(h, w, 3) uint8 RGB → (VP8 key-frame bytes, the encoder's OWN
    reconstruction as RGB). The reconstruction is what a spec decoder must
    reproduce bit-exactly — tests assert ``decode_vp8(bytes) == recon``.
    ``filter_level`` sets the loop filter (None derives a level from the
    quantizer; 0 disables) and ``filter_type`` picks the profile
    (``simple`` = luma-only 2-tap, ``normal`` = luma+chroma 4/6-tap);
    both sides run the identical post-pass, so parity is preserved."""
    h, w = img.shape[:2]
    # clamp to the header field widths (7-bit qi, 6-bit level) — wrapped
    # literals would desynchronize the bitstream from the returned recon
    qi = max(0, min(127, qi))
    if filter_level is not None:
        filter_level = max(0, min(63, filter_level))
    if h > 0x3FFF or w > 0x3FFF:
        raise ValueError("dimensions exceed VP8 limits")
    if h * w > (1 << 20):
        # above this the encoder would emit streams its own decoder
        # refuses (work cap) — and far above it, a first partition past
        # the 19-bit frame-tag size field, which would truncate silently
        raise ValueError("image exceeds the codec's 1M-pixel cap")
    y, cb, cr = _rgb_to_yuv420(img)
    mb_rows, mb_cols = y.shape[0] // 16, y.shape[1] // 16
    qs = _quantizers(qi)
    y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac = qs

    if filter_level is None:
        filter_level = min(63, qi // 4)
    simple = filter_type != "normal"
    hdr = BoolEncoder()
    hdr.put(128, 0)  # color space
    hdr.put(128, 0)  # clamping
    hdr.put(128, 0)  # segmentation off
    hdr.put(128, 1 if simple else 0)  # filter type
    hdr.literal(filter_level, 6)
    hdr.literal(0, 3)  # sharpness
    hdr.put(128, 0)  # no lf deltas
    hdr.literal(0, 2)  # one token partition
    hdr.literal(qi, 7)
    for _ in range(5):
        hdr.put(128, 0)  # no quantizer deltas
    hdr.put(128, 1)  # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    hdr.put(COEFF_UPDATE_PROB, 0)  # keep default probs
    prob_skip = 128
    hdr.put(128, 1)  # mb_no_coeff_skip enabled
    hdr.literal(prob_skip, 8)

    probs = DEFAULT_COEFF_PROBS
    tok = BoolEncoder()
    y_rec = np.zeros_like(y, dtype=np.int32)
    u_rec = np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.int32)
    v_rec = np.zeros_like(u_rec)
    above_nz = _fresh_nz(mb_cols)
    above_modes = np.full(mb_cols * 4, B_DC, dtype=np.int32)
    interior_flags = [[True] * mb_cols for _ in range(mb_rows)]
    # two-pass per MB: quantize against reconstructed neighbors, decide
    # skip, then emit modes+skip to hdr and tokens to tok
    for mby in range(mb_rows):
        left_nz = _zero_left()
        left_modes = [B_DC] * 4
        for mbx in range(mb_cols):
            y0, x0 = mby * 16, mbx * 16
            last_col = mbx == mb_cols - 1
            above = y_rec[y0 - 1, x0 : x0 + 16] if mby else None
            left = y_rec[y0 : y0 + 16, x0 - 1] if mbx else None
            corner = int(y_rec[y0 - 1, x0 - 1]) if (mby and mbx) else (
                127 if mby else 129 if mbx else 128
            )
            src_y = y[y0 : y0 + 16, x0 : x0 + 16]
            mode16, _ = _best_mode(src_y, above, left, corner, 16)
            # build the 16x16 candidate fully (quantize + reconstruct) so
            # the B_PRED decision compares RECONSTRUCTION SAD on both
            # sides — comparing against prediction SAD let B_PRED "win"
            # constant MBs and lose their exact reconstruction
            pred_y = _predict(mode16, above, left, corner, 16)
            res = src_y.astype(np.int64) - pred_y
            # batched candidate build: one fdct matmul over the 16 blocks,
            # one vectorized quantize, one batched idct for the recon SAD
            blocks = (
                res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
            )
            f_all = fdct4x4_batch(blocks)
            ysteps = np.where(np.arange(16) == 0, y_dc, y_ac)
            q_all = _quantize_blocks(
                f_all.reshape(16, 16), 1, y_dc, y_ac
            )  # first=1: DC travels via Y2
            yq16 = list(q_all)
            dcs = f_all[:, 0, 0].reshape(4, 4)
            y2q16 = _quantize_block(fwht4x4(dcs), 0, y2_dc, y2_ac)
            dc16 = iwht4x4((y2q16.reshape(4, 4) *
                            np.where(np.arange(16).reshape(4, 4) == 0,
                                     y2_dc, y2_ac)))
            deq_all = q_all * ysteps
            deq_all[:, 0] = dc16.reshape(16)
            res_all = idct4x4_batch(deq_all.reshape(16, 4, 4))
            out16 = pred_y.astype(np.int64).copy()
            for r in range(4):
                for c in range(4):
                    out16[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res_all[
                        r * 4 + c
                    ]
            sad16 = int(
                np.abs(src_y.astype(np.int64) - np.clip(out16, 0, 255)).sum()
            )
            # B_PRED trial on the real buffer (restored below) — skipped
            # when 16x16 already reconstructs perfectly: the strict < can
            # never prefer B_PRED over SAD 0, and flat corpora (constant
            # thumbnails, padding MBs) would pay the 160-prediction trial
            # for nothing
            if sad16 > 0:
                save = y_rec[y0 : y0 + 16, x0 : x0 + 16].copy()
                submodes, bp_q, bp_sad = _bpred_trial(
                    y_rec, src_y, mby, mbx, last_col, y_dc, y_ac
                )
                y_rec[y0 : y0 + 16, x0 : x0 + 16] = save
            else:
                submodes, bp_q, bp_sad = None, None, sad16 + 1
            use_bpred = bp_sad < sad16
            ymode = B_PRED if use_bpred else mode16
            if use_bpred:
                yq, y2q = bp_q, None
            else:
                submodes = None
                yq, y2q = yq16, y2q16

            y0c, x0c = mby * 8, mbx * 8
            uv_src = {"u": cb[y0c : y0c + 8, x0c : x0c + 8],
                      "v": cr[y0c : y0c + 8, x0c : x0c + 8]}
            uv_rec_planes = {"u": u_rec, "v": v_rec}
            uvq = {}
            # one uv mode for both planes: pick on U (decoder parity holds
            # regardless of choice quality)
            plane = u_rec
            above_u = plane[y0c - 1, x0c : x0c + 8] if mby else None
            left_u = plane[y0c : y0c + 8, x0c - 1] if mbx else None
            corner_u = int(plane[y0c - 1, x0c - 1]) if (mby and mbx) else (
                127 if mby else 129 if mbx else 128
            )
            uvmode, _ = _best_mode(uv_src["u"], above_u, left_u, corner_u, 8)
            for pname in ("u", "v"):
                plane = uv_rec_planes[pname]
                above_c = plane[y0c - 1, x0c : x0c + 8] if mby else None
                left_c = plane[y0c : y0c + 8, x0c - 1] if mbx else None
                corner_c = int(plane[y0c - 1, x0c - 1]) if (mby and mbx) else (
                    127 if mby else 129 if mbx else 128
                )
                pred = _predict(uvmode, above_c, left_c, corner_c, 8)
                resc = uv_src[pname].astype(np.int64) - pred
                blocks = []
                for r in range(2):
                    for c in range(2):
                        f = fdct4x4(resc[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4])
                        blocks.append(_quantize_block(f, 0, uv_dc, uv_ac))
                uvq[pname] = blocks

            y_zero = (
                not any(q.any() for q in yq)
                if use_bpred
                else (not y2q.any() and not any(q[1:].any() for q in yq))
            )
            skip = y_zero and not any(
                b.any() for bs in uvq.values() for b in bs
            )
            interior_flags[mby][mbx] = (not skip) or use_bpred
            hdr.put(prob_skip, 1 if skip else 0)
            hdr.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if use_bpred:
                _write_submodes(hdr, above_modes, left_modes, mbx, submodes)
            else:
                sub = MODE_TO_SUBMODE[ymode]
                above_modes[mbx * 4 : mbx * 4 + 4] = sub
                left_modes = [sub] * 4
            hdr.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            if skip:
                _clear_mb_nz(left_nz, above_nz, mbx, has_y2=not use_bpred)
                yblocks = uvblocks = None
            else:
                # emit tokens with the decoder's context discipline
                if use_bpred:
                    dc = None
                    y_plane_idx, first = 3, 0
                else:
                    ctx = left_nz["y2"] + above_nz["y2"][mbx]
                    nz2 = _encode_coeffs(tok, probs[1], 0, ctx, y2q)
                    left_nz["y2"] = nz2
                    above_nz["y2"][mbx] = nz2
                    dc = iwht4x4((y2q.reshape(4, 4) *
                                  np.where(np.arange(16).reshape(4, 4) == 0,
                                           y2_dc, y2_ac)))
                    y_plane_idx, first = 0, 1
                ynz = []
                yblocks = []
                for r in range(4):
                    for c in range(4):
                        a = above_nz["y"][mbx * 4 + c] if r == 0 else ynz[(r - 1) * 4 + c]
                        l = left_nz["y"][r] if c == 0 else ynz[r * 4 + c - 1]
                        q = yq[r * 4 + c]
                        nz = _encode_coeffs(
                            tok, probs[y_plane_idx], first, a + l, q
                        )
                        ynz.append(nz)
                        deq = q * np.where(np.arange(16) == 0, y_dc, y_ac)
                        if dc is not None:
                            deq[0] = dc[r, c]
                        yblocks.append((deq, nz))
                for r in range(4):
                    left_nz["y"][r] = ynz[r * 4 + 3]
                for c in range(4):
                    above_nz["y"][mbx * 4 + c] = ynz[3 * 4 + c]
                uvblocks = {}
                for pname in ("u", "v"):
                    blocks = []
                    bnz = []
                    for r in range(2):
                        for c in range(2):
                            a = above_nz[pname][mbx * 2 + c] if r == 0 else bnz[c]
                            l = left_nz[pname][r] if c == 0 else bnz[r * 2]
                            q = uvq[pname][r * 2 + c]
                            nz = _encode_coeffs(tok, probs[2], 0, a + l, q)
                            bnz.append(nz)
                            deq = q * np.where(np.arange(16) == 0, uv_dc, uv_ac)
                            blocks.append((deq, nz))
                    for r in range(2):
                        left_nz[pname][r] = bnz[r * 2 + 1]
                    for c in range(2):
                        above_nz[pname][mbx * 2 + c] = bnz[2 + c]
                    uvblocks[pname] = blocks
            _reconstruct_mb(
                (y_rec, u_rec, v_rec), mby, mbx, ymode, uvmode,
                yblocks, uvblocks, submodes, last_col,
            )

    if filter_level:
        if simple:
            _loop_filter_simple(
                y_rec, filter_level, 0, mb_rows, mb_cols, interior_flags
            )
        else:
            _loop_filter_normal(
                (y_rec, u_rec, v_rec), filter_level, 0, mb_rows, mb_cols,
                interior_flags,
            )
    header = hdr.flush()
    tokens = tok.flush()
    if len(header) >= (1 << 19):  # frame-tag size field is 19 bits
        raise ValueError("first partition exceeds the 19-bit size field")
    tag = (0) | (0 << 1) | (1 << 4) | (len(header) << 5)
    out = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", w, h)
        + header
        + tokens
    )
    recon = _yuv420_to_rgb(
        y_rec.astype(np.uint8), u_rec.astype(np.uint8),
        v_rec.astype(np.uint8), h, w,
    )
    return out, recon


def make_webp_lossy(img: np.ndarray, qi: int = 8) -> bytes:
    """RGB array → a complete lossy WebP file (RIFF + ``VP8 `` chunk)."""
    frame, _ = encode_vp8(img, qi=qi)
    if len(frame) % 2:
        frame += b"\x00"
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

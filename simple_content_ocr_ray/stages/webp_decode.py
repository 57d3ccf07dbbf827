"""Real from-scratch WebP-LOSSLESS (VP8L) decoding — stdlib + numpy only.

The reference's supported image list includes webp
(/root/reference/src/simple_ocr/config.py:114, accepted at
services/ocr_service.py:240) and decodes it with PIL; PIL is absent here.
VP8L needs no external codec — it is canonical prefix coding (DEFLATE-style)
over ARGB pixels with LZ77 backward references, an optional color cache,
and four reversible transforms — so this module implements the actual
bitstream per the public "WebP Lossless Bitstream Specification", in the
style of the PNG/GIF/JPEG decoders in this package:

* RIFF/WEBP container walk to the ``VP8L`` chunk (signature 0x2F);
* LSB-first bit reader; prefix codes read MSB-of-code-first (the DEFLATE
  convention), canonical code assignment per symbol order;
* code-length codes with the spec's reorder table and 16/17/18 repeats,
  the ``max_symbol`` shortcut, and the 1–2 symbol "simple" code form;
* entropy-coded image: per-pixel green/length/cache symbol, LZ77 lengths
  and distances (both the plain form and the 120-entry two-dimensional
  near-pixel distance map), color-cache hits (``0x1e35a7bd`` hash insert
  on every emitted pixel), and meta prefix groups from a subresolution
  entropy image;
* all four transforms, inverted in reverse read order: PREDICTOR (14
  modes with the spec's border rules), COLOR (per-block signed 3.5-bit
  cross-channel deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette with
  delta-coded entries and sub-byte pixel bundling for palettes ≤ 16).

Lossy WebP (``VP8 `` chunks) routes to the VP8 key-frame codec in
``vp8_codec.py`` (intra 16×16 + B_PRED 4×4 prediction, boolean
arithmetic coding, integer IDCT/IWHT, both loop-filter profiles). Its
remaining seam — external files relying on RFC 6386's normative default
probability tables — surfaces here as ``UnsupportedWebpError``.

``make_webp_lossless`` is the matching from-scratch ENCODER subset used by
tests and the ``webp_real_meta`` query: literal/LZ77/color-cache coding
with real canonical prefix codes, optionally wrapped in each transform.
Decoder correctness is asserted by pixel-exact roundtrips across every
encoder mode plus a pinned prefix of the distance map table.

Per-pixel entropy decode is a python loop (like the GIF-LZW decoder);
acceptable for the metadata-extraction engine this feeds, where payloads
are thumbnails, not gigapixel scans — and contained behind the same
actor-pool seam as every other codec.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWebpError(ValueError):
    """Unsupported VP8 features / corrupt payloads — the decoder seam."""


# --------------------------------------------------------------------------
# Bit IO — VP8L is little-endian bit-packed; prefix codes are read with the
# code's MSB arriving first (DEFLATE convention)
# --------------------------------------------------------------------------

class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bits(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.pos
        if (p + n) > 8 * len(d):
            raise UnsupportedWebpError("truncated VP8L bitstream")
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        d = self.data
        if p >= 8 * len(d):
            raise UnsupportedWebpError("truncated VP8L bitstream")
        self.pos = p + 1
        return (d[p >> 3] >> (p & 7)) & 1


class _LsbBitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes go MSB-first into the LSB-first stream."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# --------------------------------------------------------------------------
# Canonical prefix codes (DEFLATE-style assignment)
# --------------------------------------------------------------------------

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) with codes assigned in symbol order within
    each length, lengths ascending (RFC1951 §3.2.2)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixDecoder:
    """(length, code) → symbol lookup walked bit-by-bit."""

    def __init__(self, lengths: list[int]) -> None:
        self.single = None
        nz = [(s, l) for s, l in enumerate(lengths) if l]
        if len(nz) == 1:
            self.single = nz[0][0]  # zero-bit code: always this symbol
            return
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        if not self.table:
            raise UnsupportedWebpError("empty prefix code")

    def read(self, br: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise UnsupportedWebpError("invalid prefix code")


#: spec reorder of the code-length alphabet
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _LsbBitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            first = br.read_bits(8)
        else:
            first = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[first] = 1
            dec = _PrefixDecoder(lengths)
            dec.single = first  # 1 symbol = zero bits per spec
            return dec
        second = br.read_bits(8)
        lengths[first] = 1
        lengths[second] = 1
        return _PrefixDecoder(lengths)
    # normal: code-length code first
    num_cl = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read_bits(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    max_symbol = alphabet_size
    if br.read_bit():  # use length / max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
        if max_symbol > alphabet_size:
            raise UnsupportedWebpError("max_symbol exceeds alphabet")
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < max_symbol:
        s = cl_dec.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if i >= alphabet_size:
                    raise UnsupportedWebpError("code length overflow")
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read_bits(3)
        else:  # 18
            i += 11 + br.read_bits(7)
    if i > alphabet_size:
        raise UnsupportedWebpError("code length overflow")
    return _PrefixDecoder(lengths)


# --------------------------------------------------------------------------
# LZ77 value coding and the 2-D distance map
# --------------------------------------------------------------------------

def _lz77_value(code: int, br: _LsbBitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value → (prefix code, extra bits value, extra bit count) — the
    encoder-side inverse of ``_lz77_value``."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    b = (v >> extra) & 1
    offset = (2 + b) << extra
    return 2 * extra + b + 2, v - offset, extra


def _make_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry near-pixel map: all (x, y) offsets with
    y ∈ [0, 7], x ∈ [-7, 8] that point to an already-decoded pixel
    (the ranges the distance-code encoding ``x = 8 - (v & 0xF)``,
    ``y = v >> 4`` can represent — an earlier draft used y ≤ 15 / x ≤ 7
    and diverged from the spec at index 96), ordered by squared euclidean
    distance (ties: larger y first, then positive x before negative).
    The FULL table is pinned against the spec's plane-code LUT in tests."""
    cand = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cand[:120]


DISTANCE_MAP = _make_distance_map()


def _plane_code_to_distance(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    x, y = DISTANCE_MAP[code - 1]
    dist = y * width + x
    return max(dist, 1)


# --------------------------------------------------------------------------
# Entropy-coded image
# --------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD
_NUM_LENGTH_CODES = 24


def _decode_entropy_image(
    br: _LsbBitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """One spatially-coded ARGB image (w × h uint32). ``level0`` enables
    meta prefix recursion (sub-images never recurse, per the spec)."""
    cache_bits = 0
    cache = None
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise UnsupportedWebpError("invalid color cache size")
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)

    huff_img = None
    huff_bits = 0
    huff_w = 0
    n_groups = 1
    if level0 and br.read_bit():  # meta prefix codes
        huff_bits = br.read_bits(3) + 2
        huff_w = (w + (1 << huff_bits) - 1) >> huff_bits
        hh = (h + (1 << huff_bits) - 1) >> huff_bits
        sub = _decode_entropy_image(br, huff_w, hh, False)
        huff_img = (((sub >> 16) & 0xFF) << 8) | ((sub >> 8) & 0xFF)
        n_groups = int(huff_img.max()) + 1

    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),   # green+len+cache
                _read_prefix_code(br, 256),          # red
                _read_prefix_code(br, 256),          # blue
                _read_prefix_code(br, 256),          # alpha
                _read_prefix_code(br, 40),           # distance
            )
        )

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    g_dec = groups[0]
    while pos < n:
        if huff_img is not None:
            y, x = divmod(pos, w)
            g_dec = groups[
                int(huff_img[(y >> huff_bits) * huff_w + (x >> huff_bits)])
            ]
        s = g_dec[0].read(br)
        if s < 256:  # literal
            red = g_dec[1].read(br)
            blue = g_dec[2].read(br)
            alpha = g_dec[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + _NUM_LENGTH_CODES:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_code = g_dec[4].read(br)
            dist = _plane_code_to_distance(w, _lz77_value(dist_code, br))
            if dist > pos or pos + length > n:
                raise UnsupportedWebpError("invalid backward reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
        else:  # color cache hit
            if cache is None:
                raise UnsupportedWebpError("cache symbol without cache")
            px = int(cache[s - 256 - _NUM_LENGTH_CODES])
            out[pos] = px
            pos += 1
    return out  # flat (row-major); callers reshape


# --------------------------------------------------------------------------
# Transforms (inverse)
# --------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _select(t: int, l: int, tl: int) -> int:
    d = 0
    for sh in (24, 16, 8, 0):
        a = (t >> sh) & 0xFF
        b = (l >> sh) & 0xFF
        c = (tl >> sh) & 0xFF
        d += abs(b - c) - abs(a - c)
    return t if d <= 0 else l


def _clamp_add_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        c = (tl >> sh) & 0xFF
        d = a - c
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation toward 0
        out |= max(0, min(255, a + half)) << sh
    return out


def _inverse_predictor(img: np.ndarray, w: int, h: int, modes: np.ndarray,
                       bits: int) -> None:
    """In-place: residuals + prediction (mod 256 per channel)."""
    tiles_w = (w + (1 << bits) - 1) >> bits

    def addpix(a: int, p: int) -> int:
        return (
            ((((a >> 24) + (p >> 24)) & 0xFF) << 24)
            | ((((a >> 16) + (p >> 16)) & 0xFF) << 16)
            | (((((a >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8)
            | (((a & 0xFF) + (p & 0xFF)) & 0xFF)
        )

    for i in range(w * h):
        y, x = divmod(i, w)
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(img[i - 1])  # row 0: left
        elif x == 0:
            pred = int(img[i - w])  # col 0: top
        else:
            mode = int(modes[(y >> bits) * tiles_w + (x >> bits)])
            L = int(img[i - 1])
            T = int(img[i - w])
            TL = int(img[i - w - 1])
            TR = int(img[i - w + 1])  # x=w-1 wraps to row start (spec quirk)
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_half(_avg2(L, T), TL)
            else:
                raise UnsupportedWebpError(f"predictor mode {mode}")
        img[i] = addpix(int(img[i]), pred)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color_transform(img: np.ndarray, w: int, h: int,
                             elems: np.ndarray, bits: int) -> None:
    tiles_w = (w + (1 << bits) - 1) >> bits
    for i in range(w * h):
        y, x = divmod(i, w)
        e = int(elems[(y >> bits) * tiles_w + (x >> bits)])
        g2r = e & 0xFF
        g2b = (e >> 8) & 0xFF
        r2b = (e >> 16) & 0xFF
        px = int(img[i])
        g = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        red = (red + _ct_delta(g2r, g)) & 0xFF
        blue = (blue + _ct_delta(g2b, g)) & 0xFF
        blue = (blue + _ct_delta(r2b, red)) & 0xFF
        img[i] = (px & 0xFF00FF00) | (red << 16) | blue


def _inverse_subtract_green(img: np.ndarray) -> None:
    g = (img >> 8) & 0xFF
    r = ((img >> 16) & 0xFF) + g
    b = (img & 0xFF) + g
    img[:] = (img & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)


def _palette_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    img: np.ndarray, w: int, h: int, palette: np.ndarray, wbits: int
) -> np.ndarray:
    """Unbundle sub-byte indices and look up the palette; returns the
    full-width image."""
    out = np.zeros(w * h, dtype=np.uint32)
    if wbits == 0:
        idx = (img >> 8) & 0xFF
        bad = idx >= len(palette)
        lut = palette
        safe = np.where(bad, 0, idx)
        out[:] = np.where(bad, 0, lut[safe])
        return out
    px_per_byte = 1 << wbits
    ibits = 8 >> wbits  # bits per index
    packed_w = (w + px_per_byte - 1) // px_per_byte
    mask = (1 << ibits) - 1
    for y in range(h):
        for x in range(w):
            g = int(img[y * packed_w + (x >> wbits)] >> 8) & 0xFF
            k = (g >> ((x & (px_per_byte - 1)) * ibits)) & mask
            out[y * w + x] = palette[k] if k < len(palette) else 0
    return out


# --------------------------------------------------------------------------
# Top-level decode
# --------------------------------------------------------------------------

def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes → (h, w, 4) RGBA uint8. Lossless (VP8L) decodes with the
    prefix-code pipeline below; lossy (``VP8 ``) decodes with the VP8
    key-frame codec in ``vp8_codec.py`` (intra 16×16, self-consistent
    probability tables — see that module's docstring for the interop
    seams, which surface here as ``UnsupportedWebpError``)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedWebpError("not a WebP payload (missing RIFF/WEBP)")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(body)
        if tag == b"VP8 ":
            from .vp8_codec import UnsupportedVp8Error, decode_vp8

            try:
                rgb = decode_vp8(body)
            except UnsupportedVp8Error as exc:
                raise UnsupportedWebpError(f"lossy VP8: {exc}") from exc
            rgba = np.empty((*rgb.shape[:2], 4), dtype=np.uint8)
            rgba[..., :3] = rgb
            rgba[..., 3] = 255
            return rgba
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise UnsupportedWebpError("no VP8L or VP8 chunk found")


def _decode_vp8l(body: bytes) -> np.ndarray:
    if not body or body[0] != 0x2F:
        raise UnsupportedWebpError("bad VP8L signature")
    br = _LsbBitReader(body[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bit()  # alpha hint
    if br.read_bits(3) != 0:
        raise UnsupportedWebpError("unknown VP8L version")

    transforms = []  # (type, data...) in read order
    seen = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read_bits(2)
        if ttype in seen:
            raise UnsupportedWebpError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = br.read_bits(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("predictor", ((sub >> 8) & 0xFF), bits, cur_w))
        elif ttype == 1:  # COLOR
            bits = br.read_bits(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", sub, bits, cur_w))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            palette_size = br.read_bits(8) + 1
            pal_deltas = _decode_entropy_image(br, palette_size, 1, False)
            # entries are delta-coded per channel
            pal = np.zeros(palette_size, dtype=np.uint32)
            prev = 0
            for i in range(palette_size):
                d = int(pal_deltas[i])
                px = 0
                for sh in (24, 16, 8, 0):
                    px |= ((((prev >> sh) & 0xFF) + ((d >> sh) & 0xFF)) & 0xFF) << sh
                pal[i] = px
                prev = px
            wbits = _palette_width_bits(palette_size)
            transforms.append(("palette", pal, wbits, cur_w))
            if wbits:
                cur_w = (cur_w + (1 << wbits) - 1) >> wbits

    img = _decode_entropy_image(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, wbits, full_w = t
            img = _inverse_color_indexing(img, full_w, h, pal, wbits)
            cur_w = full_w
        elif t[0] == "subtract_green":
            _inverse_subtract_green(img)
        elif t[0] == "color":
            _, elems, bits, tw = t
            _inverse_color_transform(img, tw, h, elems, bits)
        else:  # predictor
            _, modes, bits, tw = t
            _inverse_predictor(img, tw, h, modes, bits)

    argb = img.reshape(h, w)
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (argb >> 16) & 0xFF
    rgba[:, :, 1] = (argb >> 8) & 0xFF
    rgba[:, :, 2] = argb & 0xFF
    rgba[:, :, 3] = (argb >> 24) & 0xFF
    return rgba


# --------------------------------------------------------------------------
# Encoder subset (tests + webp_real_meta fixture synthesis)
# --------------------------------------------------------------------------

def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Canonical Huffman code lengths from symbol frequencies (heapq tree;
    complete by construction). Fixture images are small, so the depth cap
    is asserted rather than rebalanced."""
    import heapq

    items = [(f, s) for s, f in freqs.items() if f > 0]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][1]: 1}
    heap = [(f, s, (s,)) for f, s in items]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for _, s in items}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(g1[0], g2[0]), g1 + g2))
    if max(depth.values()) > max_len:
        raise ValueError("huffman depth exceeds format limit for fixture")
    return depth


def _write_prefix_code(
    bw: _LsbBitWriter, lengths_map: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple or normal form); returns symbol →
    (code, length) for the token pass — empty dict means zero-bit code."""
    syms = sorted(lengths_map)
    if not syms:
        lengths_map = {0: 1}
        syms = [0]
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(syms) - 1, 1)
        first = syms[0]
        if first > 1:
            bw.write_bits(1, 1)
            bw.write_bits(first, 8)
        else:
            bw.write_bits(0, 1)
            bw.write_bits(first, 1)
        if len(syms) == 1:
            return {}  # zero-bit code
        bw.write_bits(syms[1], 8)
        lengths = [0] * alphabet_size
        lengths[syms[0]] = lengths[syms[1]] = 1
        return _canonical_codes(lengths)
    # normal form
    bw.write_bits(0, 1)
    lengths = [0] * alphabet_size
    for s, ln in lengths_map.items():
        lengths[s] = ln
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lens_map = _huff_lengths(cl_freq, max_len=7)
    cl_lengths = [0] * 19
    for v, ln in cl_lens_map.items():
        cl_lengths[v] = ln
    # how many kCodeLengthCodeOrder entries must be written to cover every
    # used code-length symbol
    num_cl = 4
    for i, sym in enumerate(_CL_ORDER):
        if cl_lengths[sym]:
            num_cl = max(num_cl, i + 1)
    bw.write_bits(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write_bits(cl_lengths[_CL_ORDER[i]], 3)
    bw.write_bits(0, 1)  # no max_symbol shortcut: emit every entry
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = len(cl_codes) == 1
    for ln in lengths:
        if not single_cl:  # single-symbol CL code = zero bits per entry
            code, cln = cl_codes[ln]
            bw.write_code(code, cln)
    return _canonical_codes(lengths)


def _tokenize(
    data: np.ndarray, cache_bits: int, lz77: bool
) -> list[tuple]:
    tokens: list[tuple] = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    i, n = 0, len(data)

    def insert(px: int) -> None:
        cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while i < n:
        px = int(data[i])
        if lz77 and i > 0 and px == int(data[i - 1]):
            j = i
            while j < n and int(data[j]) == int(data[j - 1]) and j - i < 4096:
                j += 1
            if j - i >= 3:
                tokens.append(("copy", j - i, 1))
                if cache is not None:
                    for k in range(i, j):
                        insert(int(data[k]))
                i = j
                continue
        if cache is not None:
            hsh = (_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[hsh] == px:
                tokens.append(("cache", hsh))
                i += 1
                continue
            cache[hsh] = px
        tokens.append(("lit", px))
        i += 1
    return tokens


def _encode_entropy_image(
    bw: _LsbBitWriter,
    data: np.ndarray,
    cache_bits: int = 0,
    lz77: bool = False,
    dist_mode: str = "plain",
    level0: bool = True,
) -> None:
    bw.write_bits(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write_bits(cache_bits, 4)
    if level0:
        bw.write_bits(0, 1)  # no meta prefix groups

    tokens = _tokenize(data, cache_bits, lz77)
    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    fr: list[dict[int, int]] = [{}, {}, {}, {}, {}]  # green/red/blue/alpha/dist

    def bump(d: dict, s: int) -> None:
        d[s] = d.get(s, 0) + 1

    def dist_value(dist: int) -> int:
        if dist_mode == "map" and dist == 1:
            return 2  # DISTANCE_MAP index 1 = (1, 0) = one pixel left
        return dist + 120

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            bump(fr[0], (px >> 8) & 0xFF)
            bump(fr[1], (px >> 16) & 0xFF)
            bump(fr[2], px & 0xFF)
            bump(fr[3], (px >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(fr[0], 256 + _lz77_code(t[1])[0])
            bump(fr[4], _lz77_code(dist_value(t[2]))[0])
        else:
            bump(fr[0], 256 + _NUM_LENGTH_CODES + t[1])

    codes = []
    for d, size in zip(fr, (green_size, 256, 256, 256, 40)):
        codes.append(_write_prefix_code(bw, _huff_lengths(d), size))

    def emit(ci: int, sym: int) -> None:
        if codes[ci]:  # zero-bit (single-symbol) codes emit nothing
            code, ln = codes[ci][sym]
            bw.write_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            emit(0, (px >> 8) & 0xFF)
            emit(1, (px >> 16) & 0xFF)
            emit(2, px & 0xFF)
            emit(3, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            lc, lx, ln = _lz77_code(t[1])
            emit(0, 256 + lc)
            if ln:
                bw.write_bits(lx, ln)
            dc, dx, dn = _lz77_code(dist_value(t[2]))
            emit(4, dc)
            if dn:
                bw.write_bits(dx, dn)
        else:
            emit(0, 256 + _NUM_LENGTH_CODES + t[1])


def _rgba_to_argb(rgba: np.ndarray) -> np.ndarray:
    h, w = rgba.shape[:2]
    px = rgba.astype(np.uint32)
    if rgba.shape[2] == 3:
        a = np.full((h, w), 255, np.uint32)
    else:
        a = px[:, :, 3]
    return (
        (a << 24) | (px[:, :, 0] << 16) | (px[:, :, 1] << 8) | px[:, :, 2]
    ).reshape(-1)


def _forward_predictor(
    data: np.ndarray, w: int, h: int, mode: int
) -> np.ndarray:
    """Residuals under one predictor mode for every non-border pixel, with
    the decoder's exact border rules (left on row 0, top on column 0,
    TR-wrap at x = w-1)."""
    orig = data.copy()
    res = np.zeros_like(data)

    def subpix(a: int, p: int) -> int:
        return (
            ((((a >> 24) - (p >> 24)) & 0xFF) << 24)
            | ((((a >> 16) - (p >> 16)) & 0xFF) << 16)
            | (((((a >> 8) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 8)
            | (((a & 0xFF) - (p & 0xFF)) & 0xFF)
        )

    for i in range(w * h):
        y, x = divmod(i, w)
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(orig[i - 1])
        elif x == 0:
            pred = int(orig[i - w])
        else:
            L, T, TL = int(orig[i - 1]), int(orig[i - w]), int(orig[i - w - 1])
            TR = int(orig[i - w + 1])
            if mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_half(_avg2(L, T), TL)
            else:
                raise ValueError(f"encoder does not support mode {mode}")
        res[i] = subpix(int(orig[i]), pred)
    return res


def make_webp_lossless(
    rgba: np.ndarray,
    transform: str | None = None,
    cache_bits: int = 0,
    lz77: bool = False,
    dist_mode: str = "plain",
    predictor_mode: int = 7,
    tile_bits: int = 4,
) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a REAL VP8L lossless WebP.

    ``transform`` ∈ {None, 'subtract_green', 'predictor', 'color',
    'palette'}; ``cache_bits`` enables the color cache; ``lz77`` emits
    distance-1 runs (``dist_mode='map'`` uses the 2-D near-pixel code,
    'plain' the direct form). Lossless throughout — decode must reproduce
    the input exactly."""
    h, w = rgba.shape[:2]
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("dimensions exceed VP8L limits")
    data = _rgba_to_argb(rgba)

    bw = _LsbBitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(1 if rgba.shape[2] == 4 else 0, 1)
    bw.write_bits(0, 3)  # version

    cur_w = w
    if transform == "subtract_green":
        bw.write_bits(1, 1)
        bw.write_bits(2, 2)
        g = (data >> 8) & 0xFF
        r = (((data >> 16) & 0xFF) - g) & 0xFF
        b = ((data & 0xFF) - g) & 0xFF
        data = (data & np.uint32(0xFF00FF00)) | (r << 16) | b
    elif transform == "predictor":
        bw.write_bits(1, 1)
        bw.write_bits(0, 2)
        bw.write_bits(tile_bits - 2, 3)
        tw = (w + (1 << tile_bits) - 1) >> tile_bits
        th = (h + (1 << tile_bits) - 1) >> tile_bits
        sub = np.full(tw * th, 0xFF000000 | (predictor_mode << 8), np.uint32)
        _encode_entropy_image(bw, sub, level0=False)
        data = _forward_predictor(data, w, h, predictor_mode)
    elif transform == "color":
        bw.write_bits(1, 1)
        bw.write_bits(1, 2)
        bw.write_bits(tile_bits - 2, 3)
        tw = (w + (1 << tile_bits) - 1) >> tile_bits
        th = (h + (1 << tile_bits) - 1) >> tile_bits
        g2r, g2b, r2b = 0x10, 0xF0, 0x08  # fixed non-trivial elements
        sub = np.full(
            tw * th, 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r, np.uint32
        )
        _encode_entropy_image(bw, sub, level0=False)
        out = data.copy()
        for i in range(len(data)):
            px = int(data[i])
            g = (px >> 8) & 0xFF
            R = (px >> 16) & 0xFF
            B = px & 0xFF
            sr = (R - _ct_delta(g2r, g)) & 0xFF
            sb = (B - _ct_delta(g2b, g) - _ct_delta(r2b, R)) & 0xFF
            out[i] = (px & 0xFF00FF00) | (sr << 16) | sb
        data = out
    elif transform == "palette":
        bw.write_bits(1, 1)
        bw.write_bits(3, 2)
        pal_vals, idx = np.unique(data, return_inverse=True)
        if len(pal_vals) > 256:
            raise ValueError("more than 256 colors — no palette")
        bw.write_bits(len(pal_vals) - 1, 8)
        deltas = np.zeros(len(pal_vals), np.uint32)
        prev = 0
        for i, v in enumerate(pal_vals):
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((int(v >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas[i] = d
            prev = int(v)
        _encode_entropy_image(bw, deltas, level0=False)
        wbits = _palette_width_bits(len(pal_vals))
        if wbits:
            px_per_byte = 1 << wbits
            ibits = 8 >> wbits
            packed_w = (w + px_per_byte - 1) // px_per_byte
            packed = np.zeros(packed_w * h, np.uint32)
            idx2 = idx.reshape(h, w)
            for y in range(h):
                for x in range(w):
                    packed[y * packed_w + (x >> wbits)] |= np.uint32(
                        int(idx2[y, x]) << ((x & (px_per_byte - 1)) * ibits)
                    ) << np.uint32(8)
            data = np.uint32(0xFF000000) | packed
            cur_w = packed_w
        else:
            data = np.uint32(0xFF000000) | (idx.astype(np.uint32) << 8)
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    bw.write_bits(0, 1)  # end of transforms

    _encode_entropy_image(
        bw, data, cache_bits=cache_bits, lz77=lz77, dist_mode=dist_mode,
        level0=True,
    )
    body = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --------------------------------------------------------------------------
# Engine seam (same output layout as the other image engines)
# --------------------------------------------------------------------------

class WebpImageEngine:
    """Engine-seam wrapper: REAL decode of BOTH WebP halves — lossless
    VP8L here, lossy VP8 key frames via ``vp8_codec.py`` — → typed image
    metadata (width, height, channels, mean brightness), identical layout
    to ``PngImageEngine``/``JpegImageEngine``. External files relying on
    the normative default probability tables raise → failed rows, the
    documented interop seam."""

    name = "webp-decode"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        img = decode_webp(payload)
        h, w, _ = img.shape
        brightness = float(np.round(img[:, :, :3].mean(), 4))
        return EngineResult(
            text=f"[image {w}x{h} ch=4 brightness={brightness}]",
            page_count=1,
            metadata={
                "engine": self.name,
                "width": str(w),
                "height": str(h),
                "channels": "4",
                "brightness": str(brightness),
            },
        )

"""Real from-scratch BMP / GIF / TIFF decoding — stdlib + numpy only.

Completes the real-decoder image family (PNG: stages/png_decode.py, JPEG:
stages/jpeg_decode.py) for the remaining formats the reference accepts via
PIL (/root/reference/src/simple_ocr/config.py:113-120): BI_RGB BMP
(8-bit palette / 24 / 32-bit) plus RLE8-compressed BMP (all escape codes:
EOL/EOB/delta/literal-with-pad), GIF87a/89a with a REAL LZW decoder
(variable-width codes, clear/EOI, interlace), and baseline TIFF
(grayscale / RGB, strips, both endiannesses) with the four common
compressions: none (1), LZW (5 — MSB-first codes with the TIFF 6.0
"EarlyChange" width rule, where the decoder widens one code EARLIER than
GIF because its table lags the encoder's by one entry), PackBits (32773),
and Deflate (8 / legacy 32946), each optionally under horizontal-
differencing Predictor 2 (tag 317).

Each format gets a matching minimal ENCODER used by tests and fixture
synthesis — the GIF encoder emits genuine LZW (dictionary build + variable
code widths), so the decoder's code-growth path is exercised by real
compressed streams, not just degenerate clear-code sequences.

All decoders raise ``UnsupportedImageError`` (shared with the PNG decoder)
on unsupported variants or corrupt payloads — failed ROWS at the engine
seam, never failed tasks.
"""

from __future__ import annotations

import struct

import numpy as np

from .png_decode import UnsupportedImageError

# --------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, BI_RGB uncompressed)
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → uint8 array (h, w) for 8-bit grayscale-palette images or
    (h, w, 3) RGB for 24/32-bit. Bottom-up and top-down rows, 4-byte row
    padding, BI_RGB only."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedImageError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise UnsupportedImageError("BITMAPCOREHEADER unsupported")
    w, h_signed = struct.unpack_from("<iI", payload, 18)[0], struct.unpack_from(
        "<i", payload, 22
    )[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression not in (0, 1):
        raise UnsupportedImageError(f"BMP compression {compression} unsupported")
    if compression == 1 and bpp != 8:
        raise UnsupportedImageError("BI_RLE8 requires 8-bit pixels")
    if bpp not in (8, 24, 32):
        raise UnsupportedImageError(f"BMP bpp {bpp} unsupported")
    if w <= 0 or h_signed == 0 or (compression == 1 and h_signed < 0):
        raise UnsupportedImageError("degenerate BMP dimensions")
    top_down = h_signed < 0
    h = abs(h_signed)
    palette = None
    if bpp == 8:
        (colors,) = struct.unpack_from("<I", payload, 46)
        colors = colors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(payload, np.uint8, colors * 4, pal_off)
        palette = raw.reshape(colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
    if compression == 1:
        rows = _bmp_rle8_decode(payload[data_off:], w, h)[::-1]  # bottom-up
    else:
        row_bytes = (w * bpp // 8 + 3) // 4 * 4
        need = data_off + row_bytes * h
        if len(payload) < need:
            raise UnsupportedImageError("truncated BMP pixel data")
        rows = np.frombuffer(payload, np.uint8, row_bytes * h, data_off).reshape(
            h, row_bytes
        )
        if not top_down:
            rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        rgb = palette[idx]
        # grayscale palettes (r==g==b) collapse to a single channel
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
            rgb[:, :, 1] == rgb[:, :, 2]
        ).all():
            return rgb[:, :, 0].copy()
        return rgb
    ch = bpp // 8
    px = rows[:, : w * ch].reshape(h, w, ch)
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB


def _bmp_rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 stream → (h, w) palette indices in BOTTOM-UP row order
    (row 0 of the result is the bottom scanline, as stored). Handles all
    four escapes: 00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy
    delta (skipped cells stay 0 per the de-facto convention), and
    00 n≥3 absolute runs padded to a 16-bit boundary."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data) + 1:
        if pos + 2 > len(data):
            raise UnsupportedImageError("truncated BMP RLE8 stream")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run: v repeated n times
            if y >= h or x + n > w:
                raise UnsupportedImageError("BMP RLE8 run overflows row")
            out[y, x : x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if pos + 2 > len(data):
                raise UnsupportedImageError("truncated BMP RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise UnsupportedImageError("BMP RLE8 delta out of range")
        else:  # absolute mode: v literal bytes, word-aligned
            end = pos + v
            if end > len(data) or y >= h or x + v > w:
                raise UnsupportedImageError("BMP RLE8 literal overflows")
            out[y, x : x + v] = np.frombuffer(data, np.uint8, v, pos)
            x += v
            pos = end + (v & 1)  # pad to 16-bit boundary
    raise UnsupportedImageError("BMP RLE8 stream missing end-of-bitmap")


def _bmp_rle8_encode(pixels: np.ndarray) -> bytes:
    """(h, w) indices → BI_RLE8 stream (bottom-up): maximal runs ≤255 per
    row, end-of-line after each row, end-of-bitmap terminator."""
    out = bytearray()
    for y in range(pixels.shape[0] - 1, -1, -1):
        row = pixels[y]
        i = 0
        while i < len(row):
            v = row[i]
            n = 1
            while i + n < len(row) and n < 255 and row[i + n] == v:
                n += 1
            out += bytes([n, int(v)])
            i += n
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def make_bmp(pixels: np.ndarray, rle: bool = False) -> bytes:
    """Encode (h, w) grayscale (8-bit gray palette) or (h, w, 3) RGB
    (24-bit) as a bottom-up BMP — uncompressed BI_RGB, or BI_RLE8 when
    ``rle=True`` (grayscale only, per the format)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if rle and not gray:
        raise ValueError("BI_RLE8 encodes 8-bit (grayscale-palette) only")
    bpp = 8 if gray else 24
    row_bytes = (w * bpp // 8 + 3) // 4 * 4
    pal = b""
    if gray:
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    data_off = 14 + 40 + len(pal)
    if rle:
        body = _bmp_rle8_encode(pixels)
    else:
        parts = []
        for y in range(h - 1, -1, -1):  # bottom-up
            if gray:
                row = pixels[y].tobytes()
            else:
                row = pixels[y, :, ::-1].tobytes()  # RGB → BGR
            parts.append(row + b"\x00" * (row_bytes - len(row)))
        body = b"".join(parts)
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 1 if rle else 0,
                       len(body), 2835, 2835, 256 if gray else 0, 0)
    out += pal + body
    return bytes(out)


# --------------------------------------------------------------------------
# GIF (87a/89a, real LZW, optional interlace)
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width from min_code_size+1 up to 12
    bits, CLEAR resets the table, EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader (LSB-first per GIF spec)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise UnsupportedImageError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table() -> tuple[list[bytes], int, int]:
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code >= clear + 2):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise UnsupportedImageError("invalid LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise UnsupportedImageError("LZW stream ended early")
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (h, w, 3) RGB uint8 (or (h, w) when the
    active palette is grayscale). Real LZW decode; interlace supported;
    extensions skipped."""
    if not (payload.startswith(b"GIF87a") or payload.startswith(b"GIF89a")):
        raise UnsupportedImageError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise UnsupportedImageError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code, b"".join(chunks), w * h)
            if iflags & 0x40:  # interlaced row order
                rows = idx.reshape(h, w)
                out_rows = np.empty_like(rows)
                y = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for dst in range(start, h, step):
                        out_rows[dst] = rows[y]
                        y += 1
                idx = out_rows.ravel()
            rgb = pal[idx.reshape(h, w)]
            if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
                rgb[:, :, 1] == rgb[:, :, 2]
            ).all():
                return rgb[:, :, 0].copy()
            return rgb
        elif b == 0x3B:  # trailer
            break
        else:
            raise UnsupportedImageError(f"unknown GIF block 0x{b:02x}")
    raise UnsupportedImageError("no image data in GIF")


def _lzw_encode(min_code_size: int, idx: np.ndarray) -> bytes:
    """Real GIF LZW encoder (dictionary build + variable code widths)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for v in idx.tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            # width grows when next_code EXCEEDS the current width's range
            if next_code == (1 << width):
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(pixels: np.ndarray) -> bytes:
    """Encode (h, w) uint8 grayscale as a GIF89a with a 256-gray palette and
    REAL LZW compression."""
    if pixels.ndim != 2:
        raise ValueError("make_gif takes (h, w) grayscale")
    h, w = pixels.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += b"".join(bytes([v, v, v]) for v in range(256))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([8])  # LZW min code size
    lzw = _lzw_encode(8, pixels.ravel())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# TIFF (baseline, strips; compressions 1/5/32773/8 + Predictor 2)
# --------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}

_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first variable-width codes (9→12 bits),
    Clear=256, EOI=257. EarlyChange width rule: the DECODER widens when
    its next free code reaches ``(1<<width)-1`` — one code earlier than
    the encoder, because the decoder's string table lags the encoder's by
    exactly one entry at the moment each code is read (libtiff's
    ``maxcode = MAXCODE(nbits)-1``)."""
    out = bytearray()
    acc = nbits = pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise UnsupportedImageError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        nbits -= width
        code = acc >> nbits
        acc &= (1 << nbits) - 1
        return code

    table: list[bytes] = []
    free = _LZW_FIRST
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read_code(width)
        if code == _LZW_CLEAR:
            table, free, width, prev = [], _LZW_FIRST, 9, None
            continue
        if code == _LZW_EOI:
            break
        if code < 256:
            entry = bytes([code])
        elif code - _LZW_FIRST < len(table):
            entry = table[code - _LZW_FIRST]
        elif code == free and prev is not None:
            entry = prev + prev[:1]
        else:
            raise UnsupportedImageError("invalid TIFF LZW code")
        out += entry
        if prev is not None and free < 4094:
            table.append(prev + entry[:1])
            free += 1
            if free == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise UnsupportedImageError("TIFF LZW stream ended early")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder, exactly mirroring the decoder's width
    schedule (encoder widens at ``free == 1<<width`` — one later than the
    decoder; see _tiff_lzw_decode) and resetting at table code 4094."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {}
    free = _LZW_FIRST
    width = 9
    put(_LZW_CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if len(cand) == 1 or cand in table:
            prefix = cand
            continue
        put(prefix[0] if len(prefix) == 1 else table[prefix], width)
        if free == 4094:
            put(_LZW_CLEAR, width)
            table, free, width = {}, _LZW_FIRST, 9
        else:
            table[cand] = free
            free += 1
            if free == (1 << width) and width < 12:
                width += 1
        prefix = bytes([b])
    if prefix:
        put(prefix[0] if len(prefix) == 1 else table[prefix], width)
        free += 1
        if free == (1 << width) and width < 12:
            width += 1
    put(_LZW_EOI, width)
    if nbits:
        put(0, 8 - nbits)  # flush: pad final byte with zero bits
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF compression 32773): n in 0..127 → copy n+1
    literal bytes; n in -127..-1 → repeat next byte 1-n times; -128 noop."""
    out = bytearray()
    pos = 0
    while len(out) < expected and pos < len(data):
        n = data[pos] - 256 if data[pos] > 127 else data[pos]
        pos += 1
        if n >= 0:
            if pos + n + 1 > len(data):
                raise UnsupportedImageError("truncated PackBits literal")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n != -128:
            if pos >= len(data):
                raise UnsupportedImageError("truncated PackBits run")
            out += bytes([data[pos]]) * (1 - n)
            pos += 1
    if len(out) < expected:
        raise UnsupportedImageError("PackBits stream ended early")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: maximal runs ≥2 as replicate packets, the rest as
    literal packets, both capped at 128 bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal: scan forward until a run of ≥3 starts (2-byte runs are
        # cheaper folded into the literal) or the 128 cap
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _unpredict2(arr: np.ndarray) -> np.ndarray:
    """Reverse TIFF Predictor 2 (horizontal differencing): cumulative sum
    mod 256 along each row, per sample channel."""
    return np.cumsum(arr, axis=1, dtype=np.uint8)


def _predict2(arr: np.ndarray) -> np.ndarray:
    d = arr.astype(np.int16)
    d[:, 1:] -= arr[:, :-1].astype(np.int16)
    return (d % 256).astype(np.uint8)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF (first IFD) → uint8 (h, w) or (h, w, ch).
    Both byte orders; BitsPerSample 8; PhotometricInterpretation 0/1/2;
    strip layout; compressions none (1), LZW (5), PackBits (32773) and
    Deflate (8 / legacy 32946), decompressed PER STRIP, plus horizontal
    Predictor 2 (tag 317). Anything else hits the seam."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise UnsupportedImageError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise UnsupportedImageError("bad TIFF magic")

    def read_entry(off: int):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            return tag, None
        total = size * cnt
        if total <= 4:
            raw_off = off + 8
        else:
            (raw_off,) = struct.unpack_from(bo + "I", payload, off + 8)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        vals = struct.unpack_from(bo + fmt * cnt, payload, raw_off)
        return tag, list(vals)

    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, vals = read_entry(ifd_off + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals

    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    strip_offs = tags.get(273)
    spp = tags.get(277, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    strip_counts = tags.get(279)
    predictor = tags.get(317, [1])[0]
    if compression not in (1, 5, 8, 32773, 32946):
        raise UnsupportedImageError(f"TIFF compression {compression} unsupported")
    if predictor not in (1, 2):
        raise UnsupportedImageError(f"TIFF predictor {predictor} unsupported")
    if any(b != 8 for b in bits):
        raise UnsupportedImageError("only 8-bit TIFF supported")
    if photo not in (0, 1, 2) or not w or not h or strip_offs is None:
        raise UnsupportedImageError("unsupported/degenerate TIFF layout")
    if strip_counts is None:
        if compression != 1:
            raise UnsupportedImageError("compressed TIFF missing StripByteCounts")
        strip_counts = [w * spp * min(rows_per_strip, h)] * len(strip_offs)
    chunks = []
    for i, (o, c) in enumerate(zip(strip_offs, strip_counts)):
        raw = payload[o : o + c]
        if len(raw) < c:
            raise UnsupportedImageError("truncated TIFF strips")
        rows_here = min(rows_per_strip, h - i * rows_per_strip)
        expected = rows_here * w * spp
        if compression == 1:
            if len(raw) < expected:
                raise UnsupportedImageError("truncated TIFF strips")
            plain = raw[:expected]
        elif compression == 5:
            plain = _tiff_lzw_decode(raw, expected)
        elif compression == 32773:
            plain = _packbits_decode(raw, expected)
        else:  # 8 / 32946: Deflate
            import zlib

            try:
                plain = zlib.decompress(raw)
            except zlib.error as exc:
                raise UnsupportedImageError(f"bad TIFF deflate strip: {exc}")
            if len(plain) < expected:
                raise UnsupportedImageError("short TIFF deflate strip")
            plain = plain[:expected]
        chunks.append(plain)
    arr = np.frombuffer(b"".join(chunks), np.uint8, w * h * spp).reshape(
        h, w, spp
    )
    if predictor == 2:
        arr = _unpredict2(arr)
    if photo == 0:  # WhiteIsZero
        arr = 255 - arr
    return arr[:, :, 0].copy() if spp == 1 else arr.copy()


def make_tiff(
    pixels: np.ndarray, compression: int = 1, predictor: int = 1
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB as a little-endian
    single-strip TIFF — uncompressed (1), LZW (5), Deflate (8) or
    PackBits (32773), optionally under horizontal Predictor 2."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    raw = pixels.reshape(h, w, spp)
    if predictor == 2:
        raw = _predict2(raw)
    elif predictor != 1:
        raise ValueError(f"predictor {predictor} unsupported")
    plain = raw.tobytes()
    if compression == 1:
        data = plain
    elif compression == 5:
        data = _tiff_lzw_encode(plain)
    elif compression == 8:
        import zlib

        data = zlib.compress(plain)
    elif compression == 32773:
        data = _packbits_encode(plain)
    else:
        raise ValueError(f"compression {compression} unsupported")
    # layout: header(8) + data + IFD
    data_off = 8
    ifd_off = data_off + len(data)
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, spp, None),       # BitsPerSample (inline if spp<=2)
        (259, 3, 1, compression),  # Compression
        (262, 3, 1, 1 if gray else 2),  # Photometric: BlackIsZero / RGB
        (273, 4, 1, data_off),     # StripOffsets
        (277, 3, 1, spp),          # SamplesPerPixel
        (278, 4, 1, h),            # RowsPerStrip
        (279, 4, 1, len(data)),    # StripByteCounts
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor: horizontal differencing
    extra = b""
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    out_entries = b""
    for tag, typ, cnt, val in entries:
        if tag == 258:
            if spp == 1:
                out_entries += struct.pack("<HHIHH", tag, typ, 1, 8, 0)
            else:
                out_entries += struct.pack("<HHII", tag, typ, spp, extra_off + len(extra))
                extra += struct.pack("<HHH", 8, 8, 8)
        else:
            out_entries += struct.pack("<HHII", tag, typ, cnt, val)
    return (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + data
        + struct.pack("<H", len(entries)) + out_entries + struct.pack("<I", 0)
        + extra
    )


# --------------------------------------------------------------------------
# Engine seams (same output layout as Png/JpegImageEngine)
# --------------------------------------------------------------------------


def _meta_engine(name: str, decode):
    class _Engine:
        def extract(self, url: str, payload: bytes, content_type: str):
            from .engines import EngineResult

            img = decode(payload)
            if img.ndim == 2:
                h, w = img.shape
                ch = 1
            else:
                h, w, ch = img.shape
            brightness = float(np.round(img.mean(), 4))
            return EngineResult(
                text=f"[image {w}x{h} ch={ch} brightness={brightness}]",
                page_count=1,
                metadata={
                    "engine": name,
                    "width": str(w),
                    "height": str(h),
                    "channels": str(ch),
                    "brightness": str(brightness),
                },
            )

    _Engine.name = name
    _Engine.__name__ = f"{name.title().replace('-', '')}Engine"
    return _Engine


BmpImageEngine = _meta_engine("bmp-decode", decode_bmp)
GifImageEngine = _meta_engine("gif-decode", decode_gif)
TiffImageEngine = _meta_engine("tiff-decode", decode_tiff)

# registered in stages/engines.py (lazy factories)


# --------------------------------------------------------------------------
# ICO (Windows icon container: DIB or embedded-PNG entries)
# --------------------------------------------------------------------------
#
# Favicons are the highest-frequency icon payloads in a web crawl — every
# host serves one, and crawlers store them beside the pages. The container
# is an ICONDIR (reserved=0, type=1, count) followed by 16-byte directory
# entries; each image is either a PNG file verbatim (Vista+) or a DIB: a
# BITMAPINFOHEADER whose biHeight covers BOTH the XOR (color) bitmap and
# the 1-bpp AND (transparency) mask stacked bottom-up.

_ICO_ENTRY = struct.Struct("<BBBBHHII")


def ico_entries(payload: bytes) -> list[dict]:
    """Parse the ICONDIR → one dict per entry: width/height (256 decoded
    from the 0 byte), bpp, size, offset, and whether the image data is an
    embedded PNG."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise UnsupportedImageError("not an ICO payload")
    (count,) = struct.unpack_from("<H", payload, 4)
    if not 1 <= count <= 256:
        raise UnsupportedImageError(f"implausible ICO image count {count}")
    if len(payload) < 6 + 16 * count:
        raise UnsupportedImageError("truncated ICO directory")
    entries = []
    for i in range(count):
        w8, h8, _colors, _rsv, _planes, bpp, size, off = _ICO_ENTRY.unpack_from(
            payload, 6 + 16 * i
        )
        if off + size > len(payload) or size < 8:
            raise UnsupportedImageError("ICO entry out of bounds")
        entries.append(
            {
                "width": w8 or 256,
                "height": h8 or 256,
                "bpp": bpp,
                "size": size,
                "offset": off,
                "is_png": payload[off : off + 8] == b"\x89PNG\r\n\x1a\n",
            }
        )
    return entries


def _decode_ico_dib(data: bytes) -> np.ndarray:
    """ICO DIB entry (BITMAPINFOHEADER, biHeight = 2×true height) → RGBA.
    8-bit palette / 24 / 32-bit XOR data; the AND mask drives alpha for
    non-32-bit entries (32-bit carries its own alpha channel)."""
    if len(data) < 40:
        raise UnsupportedImageError("truncated ICO DIB header")
    (hdr_size,) = struct.unpack_from("<I", data, 0)
    if hdr_size != 40:
        raise UnsupportedImageError(f"ICO DIB header size {hdr_size} unsupported")
    w = struct.unpack_from("<i", data, 4)[0]
    h2 = struct.unpack_from("<i", data, 8)[0]
    _planes, bpp = struct.unpack_from("<HH", data, 12)
    (compression,) = struct.unpack_from("<I", data, 16)
    if compression != 0:
        raise UnsupportedImageError(f"ICO DIB compression {compression} unsupported")
    if bpp not in (8, 24, 32):
        raise UnsupportedImageError(f"ICO DIB bpp {bpp} unsupported")
    if w <= 0 or h2 <= 0 or h2 % 2:
        raise UnsupportedImageError("degenerate ICO DIB dimensions")
    h = h2 // 2
    off = 40
    palette = None
    if bpp == 8:
        (colors,) = struct.unpack_from("<I", data, 32)
        colors = colors or 256
        raw = np.frombuffer(data, np.uint8, colors * 4, off)
        palette = raw.reshape(colors, 4)[:, :3][:, ::-1].copy()  # BGRX → RGB
        off += colors * 4
    xor_row = (w * bpp // 8 + 3) // 4 * 4
    and_row = ((w + 31) // 32) * 4
    if len(data) < off + xor_row * h + and_row * h:
        raise UnsupportedImageError("truncated ICO DIB pixel data")
    rows = np.frombuffer(data, np.uint8, xor_row * h, off).reshape(h, xor_row)
    rows = rows[::-1]  # bottom-up
    rgba = np.empty((h, w, 4), np.uint8)
    if bpp == 8:
        rgba[:, :, :3] = palette[rows[:, :w]]
        rgba[:, :, 3] = 255
    else:
        ch = bpp // 8
        px = rows[:, : w * ch].reshape(h, w, ch)
        rgba[:, :, :3] = px[:, :, 2::-1]  # BGR(A) → RGB
        rgba[:, :, 3] = px[:, :, 3] if ch == 4 else 255
    if bpp != 32:  # AND mask: bit set = transparent
        mrows = np.frombuffer(
            data, np.uint8, and_row * h, off + xor_row * h
        ).reshape(h, and_row)[::-1]
        bits = np.unpackbits(mrows, axis=1)[:, :w]
        rgba[:, :, 3] = np.where(bits == 1, 0, rgba[:, :, 3])
    return rgba


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO bytes → (h, w, 4) RGBA of the LARGEST entry (ties: highest bpp,
    then first), matching what a favicon consumer renders. Entries may be
    DIBs or embedded PNGs."""
    entries = ico_entries(payload)
    best = max(
        range(len(entries)),
        key=lambda i: (
            entries[i]["width"] * entries[i]["height"],
            entries[i]["bpp"],
            -i,
        ),
    )
    e = entries[best]
    data = payload[e["offset"] : e["offset"] + e["size"]]
    if e["is_png"]:
        from .png_decode import decode_png

        img = decode_png(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full((*img.shape[:2], 1), 255, np.uint8)], axis=2
            )
        return img
    return _decode_ico_dib(data)


def make_ico(images: list[np.ndarray], png_mask: int = 0) -> bytes:
    """Encode RGB (h, w, 3) / RGBA (h, w, 4) uint8 arrays as a multi-image
    ICO. Entry ``i`` is stored as an embedded PNG when bit ``i`` of
    ``png_mask`` is set, else as a 32-bit DIB with an all-opaque AND mask
    (alpha rides the 32-bit channel)."""
    if not 1 <= len(images) <= 256:
        raise ValueError("ICO holds 1..256 images")
    blobs = []
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO entries are 1..256 px")
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full((h, w, 1), 255, np.uint8)], axis=2
            )
        if (png_mask >> i) & 1:
            from .png_decode import make_png

            blobs.append(make_png(img))
            continue
        and_row = ((w + 31) // 32) * 4
        dib = bytearray()
        dib += struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 4 * w * h, 0, 0, 0, 0
        )
        for y in range(h - 1, -1, -1):  # XOR bottom-up, BGRA
            dib += img[y, :, [2, 1, 0, 3]].T.tobytes()
        dib += b"\x00" * (and_row * h)  # AND mask: all opaque
        blobs.append(bytes(dib))
    out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", len(images)))
    off = 6 + 16 * len(images)
    for img, blob in zip(images, blobs):
        h, w = img.shape[:2]
        out += _ICO_ENTRY.pack(w % 256, h % 256, 0, 0, 1, 32, len(blob), off)
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


class IcoImageEngine:
    """Engine-seam wrapper: real ICO decode (largest entry) → typed metadata
    with the container-level image count beside the raster geometry."""

    name = "ico-decode"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        entries = ico_entries(payload)
        img = decode_ico(payload)
        h, w, _ = img.shape
        brightness = float(np.round(img[:, :, :3].mean(), 4))
        return EngineResult(
            text=f"[icon {w}x{h} images={len(entries)} brightness={brightness}]",
            page_count=1,
            metadata={
                "engine": self.name,
                "width": str(w),
                "height": str(h),
                "channels": "4",
                "n_images": str(len(entries)),
                "brightness": str(brightness),
            },
        )


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte router over the whole real-decoder family: any image
    format the reference accepts (config.py:113-120) → uint8 pixel array,
    one call. Raises ``UnsupportedImageError`` for unknown magics — the
    shared failed-row seam."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        from .png_decode import decode_png

        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from .jpeg_decode import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return decode_gif(payload)
    if payload.startswith((b"II*\x00", b"MM\x00*")):
        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp_decode import decode_webp

        return decode_webp(payload)
    if payload[:4] == b"\x00\x00\x01\x00":
        return decode_ico(payload)
    raise UnsupportedImageError("unknown image magic")


def decode_gif_frames(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """ALL frames of an animated GIF89a: (frames, per-frame delays in
    centiseconds). Frames composite onto the logical screen per the
    Graphic Control Extension disposal semantics supported here —
    disposal 1 (leave in place: later frames paint over the composite at
    their own (left, top) offset) and 2 (restore to background); each
    frame's emitted array is the full composited screen, which is what a
    sampler feeds a vision model. Transparency index honored (transparent
    pixels keep the underlying composite). Frame pixel data is the same
    real LZW decode as ``decode_gif``."""
    if not (payload.startswith(b"GIF87a") or payload.startswith(b"GIF89a")):
        raise UnsupportedImageError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    if global_pal is not None:
        screen[:] = global_pal[bg % len(global_pal)]
    background = screen.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay = 0
    transparent = -1
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # Graphic Control Ext
                gflags = payload[pos + 1]
                delay = struct.unpack_from("<H", payload, pos + 2)[0]
                transparent = payload[pos + 4] if gflags & 0x01 else -1
                disposal = (gflags >> 2) & 0x07
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            lx, ty, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise UnsupportedImageError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code, b"".join(chunks), w * h)
            if iflags & 0x40:
                rows = idx.reshape(h, w)
                out_rows = np.empty_like(rows)
                y = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for dst in range(start, h, step):
                        out_rows[dst] = rows[y]
                        y += 1
                idx = out_rows.ravel()
            idx = idx.reshape(h, w)
            region = screen[ty : ty + h, lx : lx + w]
            rgb = pal[idx]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(screen.copy())
            delays.append(delay)
            if disposal == 2:  # restore background in the frame's rect
                screen[ty : ty + h, lx : lx + w] = background[
                    ty : ty + h, lx : lx + w
                ]
            delay, transparent, disposal = 0, -1, 0
        elif b == 0x3B:
            break
        else:
            raise UnsupportedImageError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise UnsupportedImageError("no image data in GIF")
    return frames, delays


def make_gif_anim(
    frames: list[np.ndarray],
    delays_cs: list[int],
    offsets: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    disposal: int = 1,
) -> bytes:
    """Animated GIF89a encoder: one global grayscale palette, a NETSCAPE
    loop block, and per-frame Graphic Control Extensions (delay +
    disposal). Frames are (h, w) grayscale index arrays painted at their
    ``offsets`` (default (0, 0)) onto a ``screen`` (default first frame's
    size). Real LZW per frame — the decoder's multi-frame walk, GCE parse
    and compositing are exercised by genuine streams."""
    offsets = offsets or [(0, 0)] * len(frames)
    sh, sw = screen or frames[0].shape
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | 7, 0, 0)
    out += bytes(v for v in range(256) for _ in range(3))  # gray palette
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for px, cs, (lx, ty) in zip(frames, delays_cs, offsets):
        h, w = px.shape
        out += b"\x21\xf9\x04" + bytes([disposal << 2]) + struct.pack(
            "<H", cs
        ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", lx, ty, w, h, 0)
        out += bytes([8])
        lzw = _lzw_encode(8, px.ravel())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

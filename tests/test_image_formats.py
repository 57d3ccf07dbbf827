"""From-scratch BMP / GIF(LZW) / TIFF codec tests (stages/image_formats.py).

All three formats are LOSSLESS here, so roundtrips must be pixel-exact —
including the GIF path through a REAL LZW encoder (variable code widths,
12-bit growth, table resets), not a degenerate clear-code stream.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_content_ocr_ray.stages.image_formats import (
    decode_bmp,
    decode_gif,
    decode_tiff,
    make_bmp,
    make_gif,
    make_tiff,
)
from simple_content_ocr_ray.stages.png_decode import UnsupportedImageError


@pytest.mark.parametrize("shape", [(13, 21), (5, 8), (1, 1), (16, 4)])
def test_bmp_gray_roundtrip_exact(shape):
    px = np.random.RandomState(sum(shape)).randint(0, 256, shape, np.uint8)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)


def test_bmp_rgb_roundtrip_exact():
    px = np.random.RandomState(1).randint(0, 256, (7, 9, 3), np.uint8)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)


def test_bmp_row_padding_odd_width():
    # width 3 → 3-byte gray rows padded to 4; a padding bug shifts every row
    px = np.arange(15, dtype=np.uint8).reshape(5, 3)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)


@pytest.mark.parametrize(
    "px",
    [
        np.random.RandomState(2).randint(0, 256, (17, 23), np.uint8),
        np.full((4, 6), 128, np.uint8),
        np.tile(np.arange(256, dtype=np.uint8), (5, 2))[:, :300],
    ],
    ids=["random", "constant", "gradient"],
)
def test_gif_roundtrip_exact_real_lzw(px):
    assert np.array_equal(decode_gif(make_gif(px)), px)


def test_gif_large_image_code_width_growth_and_reset():
    # 60k pixels of noise force the LZW table through 12-bit codes and a
    # table reset — the decoder paths a degenerate stream never exercises
    px = np.random.RandomState(3).randint(0, 256, (200, 300), np.uint8)
    assert np.array_equal(decode_gif(make_gif(px)), px)


def test_tiff_gray_and_rgb_roundtrip_exact():
    g = np.random.RandomState(4).randint(0, 256, (11, 19), np.uint8)
    c = np.random.RandomState(5).randint(0, 256, (6, 10, 3), np.uint8)
    assert np.array_equal(decode_tiff(make_tiff(g)), g)
    assert np.array_equal(decode_tiff(make_tiff(c)), c)


def test_unsupported_seams():
    for fn, bad in (
        (decode_bmp, b"nope"),
        (decode_gif, b"GIF89a"),  # truncated after signature
        (decode_tiff, b"II"),
        (decode_tiff, b"MM\x00\x2a\x00\x00\x00\x08"),  # empty IFD area
    ):
        with pytest.raises((UnsupportedImageError, Exception)):
            fn(bad)
    # TIFF compression outside {none, LZW, Deflate, PackBits} hits the
    # documented seam by name (7 = JPEG-in-TIFF)
    t = bytearray(make_tiff(np.zeros((2, 2), np.uint8)))
    idx = t.find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x01\x00")
    assert idx > 0
    t[idx + 8] = 7
    with pytest.raises(UnsupportedImageError, match="compression"):
        decode_tiff(bytes(t))


def test_engines_in_real_route(ray_session):
    """bmp/gif/tiff payloads flow through the preset=real extraction
    pipeline to their real decoders, emitting the standard metadata line."""
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    payloads = {
        "bmp": make_bmp(np.full((3, 5), 10, np.uint8)),
        "gif": make_gif(np.full((4, 6), 20, np.uint8)),
        "tiff": make_tiff(np.full((2, 7), 30, np.uint8)),
    }
    pages = pa.table(
        {
            "url": [f"https://x.example/{k}" for k in payloads],
            "warc_ts": pa.array([0] * 3, pa.timestamp("us")),
            "html": pa.array(list(payloads.values()), pa.binary()),
            "text": [""] * 3,
            "lang": ["en"] * 3,
        }
    )
    out = (
        extraction_pipeline(rd.from_arrow(pages), preset="real")
        .to_pandas()
        .set_index("content_type")
    )
    assert out.loc["bmp", "text"] == "[image 5x3 ch=1 brightness=10.0]"
    assert out.loc["gif", "text"] == "[image 6x4 ch=1 brightness=20.0]"
    assert out.loc["tiff", "text"] == "[image 7x2 ch=1 brightness=30.0]"
    assert (out["status"] == "completed").all()


def test_decode_image_routes_every_format():
    """The magic-byte router reaches the right decoder for each family
    member and raises the shared seam error for unknown magics."""
    import numpy as np
    import pytest

    from simple_content_ocr_ray.stages.image_formats import (
        decode_image,
        make_bmp,
        make_gif,
        make_tiff,
    )
    from simple_content_ocr_ray.stages.jpeg_decode import make_jpeg
    from simple_content_ocr_ray.stages.png_decode import UnsupportedImageError, make_png
    from simple_content_ocr_ray.stages.webp_decode import make_webp_lossless

    grey = (np.add.outer(np.arange(16), np.arange(16)) * 7 % 256).astype(np.uint8)
    rgb = np.stack([grey, grey.T, 255 - grey], axis=2)

    blobs = [
        make_png(grey),
        make_bmp(rgb),
        make_gif(grey),
        make_tiff(grey),
        make_jpeg(rgb),          # lossy: dims checked, pixels approximate
        make_webp_lossless(rgb),
    ]
    for blob in blobs:
        out = decode_image(blob)
        assert out.dtype == np.uint8
        assert out.shape[0] == 16 and out.shape[1] == 16
    # lossless greyscale paths reproduce the pixels exactly
    for blob in (make_png(grey), make_tiff(grey)):
        out = decode_image(blob)
        flat = out[:, :, 0] if out.ndim == 3 else out
        assert (flat == grey).all()
    with pytest.raises(UnsupportedImageError):
        decode_image(b"\x00\x01\x02 not an image")


# --------------------------------------------------------------------------
# Compressed TIFF (LZW / Deflate / PackBits, Predictor 2) and BMP RLE8
# --------------------------------------------------------------------------


@pytest.mark.parametrize("comp", [5, 8, 32773])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_compressed_roundtrips_exact(comp, pred):
    rng = np.random.RandomState(comp + pred)
    for shape in [(6, 9), (6, 9, 3), (1, 1), (23, 57)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_tiff(make_tiff(px, comp, pred)), px)
        flat = np.full(shape, 200, np.uint8)
        assert np.array_equal(decode_tiff(make_tiff(flat, comp, pred)), flat)


def test_tiff_compression_actually_shrinks_flat_images():
    flat = np.full((64, 100), 7, np.uint8)
    plain = len(make_tiff(flat))
    for comp in (5, 8, 32773):
        assert len(make_tiff(flat, comp)) < plain / 4


def test_tiff_lzw_width_growth_and_table_reset():
    """A stream long enough to cross every code-width boundary (9→12) and
    force the 4094 table reset must roundtrip byte-exact — this is where
    the EarlyChange encoder/decoder width schedules would desynchronize."""
    from simple_content_ocr_ray.stages.image_formats import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, 300_000).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
    rep = bytes(range(256)) * 800  # dictionary-heavy, hits the reset
    assert _tiff_lzw_decode(_tiff_lzw_encode(rep), len(rep)) == rep


def test_tiff_lzw_early_change_is_one_before_gif():
    """The 255th code after CLEAR must be written at 10 bits (encoder
    bumps after table entry 511) while the decoder bumps one entry
    earlier — a GIF-style decoder (bump at 1<<width) applied to this
    stream would misparse. Verified structurally: decoding with the
    decoder's threshold shifted by one corrupts the roundtrip."""
    from simple_content_ocr_ray.stages import image_formats as imf

    data = bytes(range(256)) * 4  # 254+ fresh table entries, no repeats early
    enc = imf._tiff_lzw_encode(data)
    assert imf._tiff_lzw_decode(enc, len(data)) == data
    # sanity: the stream is NOT a valid GIF-threshold stream — flipping the
    # decoder's width rule to GIF's (1 << width) must break decode
    orig = imf._tiff_lzw_decode.__code__
    src_ok = True
    try:
        out = _gif_threshold_lzw_decode(enc, len(data))
        src_ok = out == data
    except UnsupportedImageError:
        src_ok = False
    assert not src_ok
    assert orig is imf._tiff_lzw_decode.__code__


def _gif_threshold_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW decoder with GIF's LATE width change — used only to prove
    the EarlyChange schedule is load-bearing."""
    out = bytearray()
    acc = nbits = pos = 0

    def read_code(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise UnsupportedImageError("truncated")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        nbits -= width
        code = acc >> nbits
        acc &= (1 << nbits) - 1
        return code

    table, free, width, prev = [], 258, 9, None
    while len(out) < expected:
        code = read_code(width)
        if code == 256:
            table, free, width, prev = [], 258, 9, None
            continue
        if code == 257:
            break
        if code < 256:
            entry = bytes([code])
        elif code - 258 < len(table):
            entry = table[code - 258]
        elif code == free and prev is not None:
            entry = prev + prev[:1]
        else:
            raise UnsupportedImageError("invalid code")
        out += entry
        if prev is not None and free < 4094:
            table.append(prev + entry[:1])
            free += 1
            if free == (1 << width) and width < 12:  # GIF: one LATER
                width += 1
        prev = entry
    if len(out) < expected:
        raise UnsupportedImageError("ended early")
    return bytes(out[:expected])


def test_tiff_multi_strip_compressed_decode():
    """Hand-built two-strip LZW TIFF with Predictor 2: each strip is an
    independent LZW stream; the predictor is per-row so strip boundaries
    don't leak. Exercises the per-strip expected-length accounting."""
    import struct

    from simple_content_ocr_ray.stages.image_formats import (
        _predict2,
        _tiff_lzw_encode,
    )

    px = np.arange(5 * 7, dtype=np.uint8).reshape(5, 7) * 3
    pred = _predict2(px.reshape(5, 7, 1)).reshape(5, 7)
    s1 = _tiff_lzw_encode(pred[:3].tobytes())
    s2 = _tiff_lzw_encode(pred[3:].tobytes())
    off1 = 8
    off2 = off1 + len(s1)
    ifd_off = off2 + len(s2)
    entries = [
        (256, 4, 1, 7), (257, 4, 1, 5), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, 3), (317, 3, 1, 2),
    ]
    # strip arrays (2 values each) live past the IFD
    extra_off = ifd_off + 2 + 12 * (len(entries) + 2) + 4
    entries.insert(5, (273, 4, 2, extra_off))
    entries.insert(7, (279, 4, 2, extra_off + 8))
    body = b"".join(struct.pack("<HHII", *e) for e in sorted(entries))
    extra = struct.pack("<II", off1, off2) + struct.pack("<II", len(s1), len(s2))
    blob = (
        b"II*\x00" + struct.pack("<I", ifd_off) + s1 + s2
        + struct.pack("<H", len(entries)) + body + struct.pack("<I", 0) + extra
    )
    assert np.array_equal(decode_tiff(blob), px)


def test_tiff_unsupported_compression_and_predictor_hit_seam():
    px = np.zeros((2, 2), np.uint8)
    blob = bytearray(make_tiff(px))
    # Compression tag value lives in the IFD; corrupt it to JPEG-in-TIFF (7)
    i = blob.find(b"\x03\x01")  # tag 259 little-endian
    blob[i + 8] = 7
    with pytest.raises(UnsupportedImageError, match="compression 7"):
        decode_tiff(bytes(blob))
    blob2 = bytearray(make_tiff(px, predictor=2))
    j = blob2.find(b"\x3d\x01")  # tag 317
    blob2[j + 8] = 3  # floating-point predictor: unsupported
    with pytest.raises(UnsupportedImageError, match="predictor 3"):
        decode_tiff(bytes(blob2))


def test_tiff_truncated_compressed_strip_raises():
    px = np.random.RandomState(3).randint(0, 256, (9, 13)).astype(np.uint8)
    for comp in (5, 8, 32773):
        blob = make_tiff(px, comp)
        # chop bytes out of the strip body (strip starts at offset 8)
        cut = blob[:30] + blob[60:]
        with pytest.raises(UnsupportedImageError):
            decode_tiff(cut)


@pytest.mark.parametrize("shape", [(5, 8), (17, 31), (1, 1), (3, 256)])
def test_bmp_rle8_roundtrip_exact(shape):
    rng = np.random.RandomState(shape[1])
    px = (rng.randint(0, 5, shape) * 51).astype(np.uint8)
    assert np.array_equal(decode_bmp(make_bmp(px, rle=True)), px)


def test_bmp_rle8_escape_codes_decoded():
    """Hand-built stream using delta + absolute-literal escapes (which the
    encoder never emits) — skipped cells default to palette index 0."""
    import struct

    from simple_content_ocr_ray.stages.image_formats import _bmp_rle8_decode

    # 4x3 image: run 1x9; delta (0,+1); literal [1,2,3] (+pad byte);
    # EOL; run 4x5; EOB
    stream = bytes(
        [1, 9, 0, 2, 0, 1, 0, 3, 1, 2, 3, 0, 0, 0, 4, 5, 0, 1]
    )
    out = _bmp_rle8_decode(stream, 4, 3)
    assert out[0].tolist() == [9, 0, 0, 0]  # bottom row stored first
    assert out[1].tolist() == [0, 1, 2, 3]  # delta kept x=1, literal filled
    assert out[2].tolist() == [5, 5, 5, 5]


def test_bmp_rle8_rejects_overflow_and_missing_eob():
    from simple_content_ocr_ray.stages.image_formats import _bmp_rle8_decode

    with pytest.raises(UnsupportedImageError, match="overflows"):
        _bmp_rle8_decode(bytes([9, 1, 0, 1]), 4, 2)
    with pytest.raises(UnsupportedImageError, match="end-of-bitmap"):
        _bmp_rle8_decode(bytes([2, 1]), 4, 2)


def test_bmp_rle_requires_8bit_and_bottom_up():
    rgb = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError):
        make_bmp(rgb, rle=True)


# --------------------------------------------------------------------------
# Animated GIF (multi-frame decode, GCE, compositing)
# --------------------------------------------------------------------------


def test_gif_anim_roundtrip_offsets_and_delays():
    from simple_content_ocr_ray.stages.image_formats import (
        decode_gif_frames,
        make_gif_anim,
    )

    f1 = np.full((4, 6), 10, np.uint8)
    f2 = np.full((2, 3), 200, np.uint8)
    frames, delays = decode_gif_frames(
        make_gif_anim([f1, f2], [5, 12], offsets=[(0, 0), (2, 1)])
    )
    assert delays == [5, 12] and len(frames) == 2
    assert (frames[0][:, :, 0] == 10).all()
    exp = frames[0].copy()
    exp[1:3, 2:5] = 200  # second frame painted at (left=2, top=1)
    assert np.array_equal(frames[1], exp)


def test_gif_anim_disposal_restore_background():
    from simple_content_ocr_ray.stages.image_formats import (
        decode_gif_frames,
        make_gif_anim,
    )

    base = np.full((4, 4), 10, np.uint8)
    patch = np.full((2, 2), 99, np.uint8)
    blob = make_gif_anim(
        [base, patch, patch],
        [1, 1, 1],
        offsets=[(0, 0), (1, 1), (0, 0)],
        screen=(4, 4),
        disposal=2,  # restore to background after each frame
    )
    frames, _ = decode_gif_frames(blob)
    # frame 2's patch area was restored to background (palette bg = 0)
    # before frame 3 painted at (0,0): the (1,1) patch must NOT persist
    assert (frames[2][2:4, 2:4, 0] == 0).all()
    assert (frames[2][0:2, 0:2, 0] == 99).all()


def test_gif_anim_rejects_truncated_and_empty():
    from simple_content_ocr_ray.stages.image_formats import (
        decode_gif_frames,
        make_gif_anim,
    )

    import struct

    blob = make_gif_anim([np.zeros((3, 3), np.uint8)], [0])
    with pytest.raises((UnsupportedImageError, IndexError, ValueError)):
        decode_gif_frames(blob[:30])
    # structurally valid GIF with no image data at all
    empty = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b"
    with pytest.raises(UnsupportedImageError, match="no image data"):
        decode_gif_frames(empty)

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
    # compressed TIFF hits the documented seam by name
    t = bytearray(make_tiff(np.zeros((2, 2), np.uint8)))
    # flip the Compression tag value (tag 259) from 1 to 5 (LZW)
    idx = t.find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x01\x00")
    assert idx > 0
    t[idx + 8] = 5
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

"""From-scratch VP8L (WebP-lossless) codec tests (stages/webp_decode.py).

Lossless means roundtrips must be PIXEL-EXACT: a single wrong bit anywhere
in the prefix coding, LZ77 copy, color cache, or any transform inverse
shows up as a pixel diff.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_content_ocr_ray.stages.webp_decode import (
    DISTANCE_MAP,
    UnsupportedWebpError,
    decode_webp,
    make_webp_lossless,
)


def _check(img: np.ndarray, **kw) -> None:
    out = decode_webp(make_webp_lossless(img, **kw))
    if img.shape[2] == 3:
        ref = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    else:
        ref = img
    assert np.array_equal(out, ref)


#: the spec's plane-code lookup table (encoder side): index j = y*16 +
#: (8 - x) for y ∈ [0,7], x ∈ [-7,8]; value = 0-based distance code,
#: 255 = not-a-neighbor. DISTANCE_MAP must be exactly its inverse.
_PLANE_TO_CODE_LUT = [
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
]


def test_distance_map_matches_spec_lut():
    """Pin ALL 120 entries against the published plane-code LUT: the map
    must be its exact inverse (a wrong offset silently corrupts backward
    references in real-world files using 2-D distance codes)."""
    assert len(DISTANCE_MAP) == 120
    seen = set()
    for j, code in enumerate(_PLANE_TO_CODE_LUT):
        if code == 255:
            continue
        y, x = j >> 4, 8 - (j & 0xF)
        assert DISTANCE_MAP[code] == (x, y), (code, x, y, DISTANCE_MAP[code])
        seen.add(code)
    assert seen == set(range(120))
    # every entry must point at an already-decoded pixel
    assert all(y > 0 or x > 0 for x, y in DISTANCE_MAP)


def test_plain_literals_roundtrip():
    rng = np.random.default_rng(0)
    _check(rng.integers(0, 256, (13, 17, 4), dtype=np.uint8))
    _check(rng.integers(0, 256, (9, 5, 3), dtype=np.uint8))
    _check(rng.integers(0, 256, (1, 1, 4), dtype=np.uint8))


def test_color_cache_roundtrip():
    rng = np.random.default_rng(1)
    # few distinct colors → many cache hits
    pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    img = pal[rng.integers(0, 5, (20, 20))]
    for bits in (1, 4, 8):
        _check(img, cache_bits=bits)


def test_lz77_runs_both_distance_forms():
    rng = np.random.default_rng(2)
    img = np.tile(rng.integers(0, 256, (1, 1, 4), dtype=np.uint8), (20, 30, 1))
    img[10, 15] = [1, 2, 3, 4]
    _check(img, lz77=True, dist_mode="plain")
    _check(img, lz77=True, dist_mode="map")  # 2-D near-pixel code
    _check(img, lz77=True, cache_bits=4)  # cache inserts during copies


@pytest.mark.parametrize("mode", [1, 2, 3, 4, 7, 11, 12, 13])
def test_predictor_transform_roundtrip(mode):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 19, 4), dtype=np.uint8)
    _check(img, transform="predictor", predictor_mode=mode, tile_bits=3)


def test_subtract_green_and_color_transform():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (14, 18, 4), dtype=np.uint8)
    _check(img, transform="subtract_green")
    _check(img, transform="color", tile_bits=2)


@pytest.mark.parametrize(
    "npal,shape",
    [(2, (10, 23)), (4, (8, 8)), (9, (12, 13)), (16, (6, 31)),
     (17, (5, 40)), (200, (30, 30))],
)
def test_palette_with_pixel_bundling(npal, shape):
    """Palette sizes straddling every bundling regime (8/4/2/1 px per
    byte), with widths that don't divide the bundle size."""
    rng = np.random.default_rng(npal)
    pal = rng.integers(0, 256, (npal, 4), dtype=np.uint8)
    img = pal[rng.integers(0, npal, shape)]
    _check(img, transform="palette")


def test_engine_metadata():
    from simple_content_ocr_ray.stages.webp_decode import WebpImageEngine

    img = np.full((6, 10, 3), 200, np.uint8)
    res = WebpImageEngine().extract("", make_webp_lossless(img), "webp")
    assert res.metadata["width"] == "10"
    assert res.metadata["height"] == "6"
    assert float(res.metadata["brightness"]) == 200.0


def test_unsupported_seams():
    with pytest.raises(UnsupportedWebpError):
        decode_webp(b"")
    with pytest.raises(UnsupportedWebpError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOTW" + b"\x00" * 16)
    # lossy VP8 chunk: documented seam
    lossy = b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
    with pytest.raises(UnsupportedWebpError, match="lossy"):
        decode_webp(lossy)


def test_truncated_vp8l_raises_unsupported():
    img = np.random.default_rng(5).integers(0, 256, (12, 12, 4), np.uint8)
    data = make_webp_lossless(img)
    for cut in (len(data) // 2, len(data) - 2):
        with pytest.raises(UnsupportedWebpError):
            decode_webp(data[:cut])


def test_webp_routes_through_real_route():
    """A VP8L payload through the extraction stage: sniffed as webp,
    decoded by the real engine; a lossy VP8 payload becomes a failed row."""
    import pyarrow as pa

    from simple_content_ocr_ray.stages.extract import REAL_ROUTE, ExtractStage

    good = make_webp_lossless(np.full((4, 4, 3), 60, np.uint8))
    lossy = b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
    batch = pa.table({"url": ["a", "b"], "html": [good, lossy]})
    from simple_content_ocr_ray.stages.sniff import sniff_batch

    out = ExtractStage(route=REAL_ROUTE)(sniff_batch(batch))
    assert out["content_type"].to_pylist() == ["webp", "webp"]
    assert out["status"].to_pylist() == ["completed", "failed"]
    assert "lossy" in out["error"].to_pylist()[1]

"""Real PNG decode (stages/png_decode.py): exact pixel roundtrips, filter
reconstruction, CRC validation, the unsupported-variant seam, and the
actor-pool e2e route."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simple_content_ocr_ray.stages import png_decode


def test_rgb_roundtrip_exact():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(png_decode.decode_png(png_decode.make_png(img)), img)


def test_grey_and_rgba_roundtrip():
    rng = np.random.RandomState(12)
    grey = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    out = png_decode.decode_png(png_decode.make_png(grey))
    assert np.array_equal(out[:, :, 0], grey)
    rgba = rng.randint(0, 256, size=(6, 4, 4), dtype=np.uint8)
    assert np.array_equal(png_decode.decode_png(png_decode.make_png(rgba)), rgba)


def _repack_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Re-encode img rows with specific PNG filters (encoder-side filtering)
    so the decoder's reconstruction paths are exercised."""
    h, w, ch = img.shape
    raws = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        f = ftypes[y % len(ftypes)]
        if f == 0:
            enc = row.copy()
        elif f == 1:
            enc = row.copy()
            enc[ch:] = row[ch:] - row[:-ch]
        elif f == 2:
            enc = row - prev
        else:
            raise ValueError(f)
        raws.append(bytes([f]) + enc.tobytes())
        prev = row
    raw = b"".join(raws)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        png_decode.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_sub_and_up_filters_reconstruct():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)
    payload = _repack_with_filters(img, [0, 1, 2])
    assert np.array_equal(png_decode.decode_png(payload), img)


def test_crc_corruption_detected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(png_decode.make_png(img))
    b[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(png_decode.UnsupportedImageError, match="CRC"):
        png_decode.decode_png(bytes(b))


def test_unsupported_variants_raise_at_seam():
    with pytest.raises(png_decode.UnsupportedImageError):
        png_decode.decode_png(b"\xff\xd8\xff jpeg bytes")
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    b = png_decode.make_png(img)
    # patch IHDR to claim 16-bit depth (and fix the CRC so depth is reached)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    patched = (
        png_decode.PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(png_decode.UnsupportedImageError, match="variant"):
        png_decode.decode_png(patched)


def test_engine_through_extraction_pipeline(ray_session):
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    rng = np.random.RandomState(14)
    rows = []
    for i in range(6):
        img = rng.randint(0, 256, size=(10 + i, 20, 3), dtype=np.uint8)
        rows.append(
            {
                "url": f"https://img.example/{i}",
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": png_decode.make_png(img),
                "text": "",
                "lang": "en",
                "_mean": float(np.round(img.mean(), 4)),
                "_h": 10 + i,
            }
        )
    expected = {r["url"]: (r["_h"], r["_mean"]) for r in rows}
    df = pd.DataFrame([{k: v for k, v in r.items() if not k.startswith("_")} for r in rows])
    out = extraction_pipeline(
        rd.from_pandas(df), route={"png": "png-decode"}
    ).to_pandas()
    assert (out["status"] == "completed").all()
    for r in out.itertuples():
        h, mean = expected[r.url]
        meta = dict(r.metadata)
        # width/height land in the typed metadata struct; the remaining
        # features ride in the text payload (the struct schema is fixed)
        assert meta["width"] == "20"
        assert meta["height"] == str(h)
        assert r.text == f"[image 20x{h} ch=3 brightness={mean}]"

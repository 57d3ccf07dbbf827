"""EXIF (APP1 / TIFF-IFD) parser + writer: both byte orders, inline and
out-of-line values, sub-IFD linking, malformed-structure errors, and the
pipeline query shape."""

from __future__ import annotations

import numpy as np
import pytest

from simple_content_ocr_ray.stages.exif import (
    ExifError,
    exif_app1_payload,
    insert_exif,
    make_exif_app1,
    parse_exif,
)
from simple_content_ocr_ray.stages.jpeg_decode import decode_jpeg, make_jpeg


def _jpg(gray: int = 100, h: int = 6, w: int = 10) -> bytes:
    return make_jpeg(np.full((h, w), gray, dtype=np.uint8))


@pytest.mark.parametrize("big_endian", [False, True])
def test_full_roundtrip_both_byte_orders(big_endian):
    app1 = make_exif_app1(
        orientation=6,
        make="camX",
        model="m-1000",
        datetime="2024:01:02 03:04:05",
        pixel_x=10,
        pixel_y=6,
        big_endian=big_endian,
    )
    jpg = insert_exif(_jpg(), app1)
    got = parse_exif(jpg)
    assert got == {
        "byte_order": "MM" if big_endian else "II",
        "orientation": 6,
        "make": "camX",
        "model": "m-1000",
        "datetime": "2024:01:02 03:04:05",
        "pixel_x": 10,
        "pixel_y": 6,
        "gps_lat": None,
        "gps_lon": None,
    }


def test_decoder_skips_app1_pixels_identical():
    plain = _jpg()
    tagged = insert_exif(plain, make_exif_app1(orientation=8, make="z"))
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(tagged))


def test_no_exif_returns_none():
    assert parse_exif(_jpg()) is None
    assert exif_app1_payload(_jpg()) is None


def test_minimal_orientation_only_inline_value():
    got = parse_exif(insert_exif(_jpg(), make_exif_app1(orientation=3)))
    assert got["orientation"] == 3
    assert got["make"] is None and got["pixel_x"] is None


def test_bad_byte_order_raises():
    app1 = bytearray(make_exif_app1(orientation=1))
    # corrupt the TIFF byte-order mark ("II" → "XX")
    idx = bytes(app1).find(b"Exif\x00\x00") + 6
    app1[idx : idx + 2] = b"XX"
    with pytest.raises(ExifError):
        parse_exif(insert_exif(_jpg(), bytes(app1)))


def test_out_of_range_ifd_offset_raises():
    app1 = bytearray(make_exif_app1(orientation=1))
    idx = bytes(app1).find(b"Exif\x00\x00") + 6
    # IFD0 offset field (bytes 4-8 of the TIFF header), little-endian here
    app1[idx + 4 : idx + 8] = (2**31).to_bytes(4, "little")
    with pytest.raises(ExifError):
        parse_exif(insert_exif(_jpg(), bytes(app1)))


def test_unknown_tags_and_types_are_skipped():
    """A foreign entry with an unknown value type must not break parsing."""
    import struct

    # hand-build: II header, IFD0 with orientation + a type-99 entry
    e = "<"
    entries = struct.pack(e + "H", 2)
    entries += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", 5) + b"\x00\x00"
    entries += struct.pack(e + "HHI", 0x9999, 99, 1) + b"\x00\x00\x00\x00"
    tiff = b"II" + struct.pack(e + "HI", 42, 8) + entries + struct.pack(e + "I", 0)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    got = parse_exif(insert_exif(_jpg(), app1))
    assert got["orientation"] == 5


def test_query_and_oracle_columns_match(ray_session):
    from simple_content_ocr_ray.pipelines.media import (
        _JPEG_EXIF_META_SQL,
        jpeg_exif_meta,
    )

    df = jpeg_exif_meta("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.sql(_JPEG_EXIF_META_SQL).df()
    got = df.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_gps_roundtrip_and_scrub():
    """GPS IFD writes/parses as signed decimal degrees; scrub removes the
    coordinates, keeps the camera tags, and is idempotent + byte-stable on
    GPS-free payloads."""
    import numpy as np

    from simple_content_ocr_ray.stages.exif import scrub_exif_gps
    from simple_content_ocr_ray.stages.jpeg_decode import make_jpeg

    base = make_jpeg(np.full((6, 10), 80, dtype=np.uint8))
    for be in (False, True):
        app1 = make_exif_app1(
            orientation=2, make="camG", pixel_x=10, pixel_y=6,
            gps=(37.7749, -122.4194), big_endian=be,
        )
        jpg = insert_exif(base, app1)
        got = parse_exif(jpg)
        assert abs(got["gps_lat"] - 37.7749) < 2e-6
        assert abs(got["gps_lon"] - -122.4194) < 2e-6
        clean, had = scrub_exif_gps(jpg)
        assert had is True
        after = parse_exif(clean)
        assert after["gps_lat"] is None and after["gps_lon"] is None
        assert after["make"] == "camG" and after["orientation"] == 2
        assert after["pixel_x"] == 10 and after["byte_order"] == ("MM" if be else "II")
        # idempotent: a scrubbed payload passes through byte-identical
        again, had2 = scrub_exif_gps(clean)
        assert had2 is False and again == clean
    # no-EXIF payload: untouched
    same, had = scrub_exif_gps(base)
    assert had is False and same == base

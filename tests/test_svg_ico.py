"""SVG text/geometry extraction and ICO container decode (r4 additions:
the vector and icon halves of the web image family the reference's raster
list stops short of — config.py:113-120)."""

import numpy as np
import pytest

from simple_content_ocr_ray.reference_semantics import sniff_bytes
from simple_content_ocr_ray.stages.image_formats import (
    IcoImageEngine,
    UnsupportedImageError,
    decode_ico,
    ico_entries,
    make_ico,
)
from simple_content_ocr_ray.stages.svg_text import (
    SvgTextEngine,
    UnsupportedSvgError,
    make_svg,
    parse_svg,
)

# --------------------------------------------------------------------------
# SVG
# --------------------------------------------------------------------------


def test_svg_parse_geometry_and_runs():
    svg = make_svg(120, 60, ["hello world", "second run"], n_rects=3,
                   title="Logo")
    m = parse_svg(svg)
    assert (m["width"], m["height"]) == (120.0, 60.0)
    assert m["viewbox"] == (0.0, 0.0, 120.0, 60.0)
    assert m["n_shapes"] == 3
    assert m["text"] == "hello world\nsecond run"
    assert m["title"] == "Logo"


def test_svg_tspan_collapses_into_parent_run():
    messy = parse_svg(make_svg(10, 10, ["a b c"], messy=True))
    plain = parse_svg(make_svg(10, 10, ["a b c"]))
    assert messy["text"] == plain["text"] == "a b c"
    assert messy["n_text_runs"] == plain["n_text_runs"] == 1


def test_svg_defs_text_is_invisible():
    m = parse_svg(make_svg(10, 10, ["visible"]))
    assert "INVISIBLE" not in m["text"]
    assert m["n_text_runs"] == 1


def test_svg_units_and_viewbox_fallback():
    m = parse_svg(
        b'<svg xmlns="http://www.w3.org/2000/svg" width="2in" '
        b'viewBox="0 0 10 20"/>'
    )
    assert m["width"] == 192.0  # 2in at 96 px/in
    assert m["height"] == 20.0  # from viewBox
    m2 = parse_svg(b"<svg><text>t</text></svg>")  # unsized, un-namespaced
    assert m2["width"] == 0.0 and m2["text"] == "t"
    m3 = parse_svg(b'<svg width="50%" height="5pt"/>')
    assert m3["width"] == 0.0  # relative units unresolvable
    assert m3["height"] == pytest.approx(5 * 96 / 72)


def test_svg_seams():
    with pytest.raises(UnsupportedSvgError, match="malformed"):
        parse_svg(b"<svg><unclosed></svg")
    with pytest.raises(UnsupportedSvgError, match="root element"):
        parse_svg(b"<html><body/></html>")
    with pytest.raises(UnsupportedSvgError, match="entity"):
        parse_svg(b'<!DOCTYPE svg [<!ENTITY a "b">]><svg>&a;</svg>')


# --------------------------------------------------------------------------
# ICO
# --------------------------------------------------------------------------


def test_ico_dib_rgba_roundtrip_exact():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 12, 4), dtype=np.uint8)
    assert (decode_ico(make_ico([img])) == img).all()


def test_ico_multi_entry_picks_largest_mixed_storage():
    rng = np.random.RandomState(1)
    imgs = [
        rng.randint(0, 256, (16, 16, 4), dtype=np.uint8),
        rng.randint(0, 256, (32, 32, 3), dtype=np.uint8),
        rng.randint(0, 256, (8, 8), dtype=np.uint8),
    ]
    payload = make_ico(imgs, png_mask=0b010)  # middle entry stored as PNG
    es = ico_entries(payload)
    assert [(e["width"], e["is_png"]) for e in es] == [
        (16, False), (32, True), (8, False)]
    out = decode_ico(payload)
    expected = np.concatenate(
        [imgs[1], np.full((32, 32, 1), 255, np.uint8)], axis=2)
    assert (out == expected).all()


def test_ico_256px_width_byte_zero():
    payload = make_ico([np.full((256, 256, 3), 9, np.uint8)], png_mask=1)
    e = ico_entries(payload)[0]
    assert e["width"] == e["height"] == 256
    assert decode_ico(payload).shape == (256, 256, 4)


def test_ico_and_mask_drives_alpha_for_24bit():
    # hand-build a 24-bit DIB entry whose AND mask marks one pixel clear
    import struct

    w = h = 2
    xor_rows = b""
    for _y in range(h):  # BGR, rows already 4-byte aligned (2*3=6 → pad 2)
        xor_rows += (b"\x01\x02\x03" * w + b"\x00\x00")
    and_rows = bytes([0b01000000, 0, 0, 0]) + bytes(4)  # top-right clear
    dib = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0)
    dib += xor_rows + and_rows
    payload = (
        b"\x00\x00\x01\x00\x01\x00"
        + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24, len(dib), 22)
        + dib
    )
    img = decode_ico(payload)
    # and_rows is bottom-up: its first row is the BOTTOM row of the image
    assert img[1, 1, 3] == 0 and img[0, 0, 3] == 255
    assert (img[0, 0, :3] == [3, 2, 1]).all()  # BGR → RGB


def test_ico_seams():
    with pytest.raises(UnsupportedImageError, match="count"):
        decode_ico(b"\x00\x00\x01\x00\xff\xff")
    with pytest.raises(UnsupportedImageError, match="not an ICO"):
        decode_ico(b"\x00\x00\x02\x00\x01\x00")  # cursor, not icon
    good = make_ico([np.zeros((4, 4, 3), np.uint8)])
    with pytest.raises(UnsupportedImageError, match="out of bounds"):
        decode_ico(good[:-10])


# --------------------------------------------------------------------------
# Sniff + route integration
# --------------------------------------------------------------------------


def test_sniff_svg_and_ico():
    assert sniff_bytes(make_svg(5, 5, ["x"])) == "svg"  # <?xml prolog form
    assert sniff_bytes(b"<svg xmlns='...'></svg>") == "svg"
    assert sniff_bytes(b"  \n<svg></svg>") == "svg"
    assert sniff_bytes(make_ico([np.zeros((2, 2, 3), np.uint8)])) == "ico"
    # sitemap-style XML must NOT classify as svg
    assert sniff_bytes(b'<?xml version="1.0"?><urlset></urlset>') == "unknown"
    # implausible ICO counts stay unknown (0 and >256)
    assert sniff_bytes(b"\x00\x00\x01\x00\x00\x00rest") == "unknown"
    assert sniff_bytes(b"\x00\x00\x01\x00\x02\x04rest") == "unknown"


def test_svg_ico_engines_in_real_route(ray_session):
    """svg/ico payloads flow through preset=real to the new engines; on the
    mock-parity DEFAULT_ROUTE they are failed rows (the reference does not
    list these types — exceed-honestly policy, same as OOXML)."""
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    payloads = {
        "svg": make_svg(30, 20, ["icon label"], n_rects=1),
        "ico": make_ico([np.full((6, 5, 3), 40, np.uint8)]),
    }
    pages = pa.table(
        {
            "url": [f"https://x.example/{k}" for k in payloads],
            "warc_ts": pa.array([0] * 2, pa.timestamp("us")),
            "html": pa.array(list(payloads.values()), pa.binary()),
            "text": [""] * 2,
            "lang": ["en"] * 2,
        }
    )
    real = (
        extraction_pipeline(rd.from_arrow(pages), preset="real")
        .to_pandas()
        .set_index("content_type")
    )
    assert real.loc["svg", "text"] == "icon label"
    assert real.loc["svg", "status"] == "completed"
    assert real.loc["ico", "text"] == "[icon 5x6 images=1 brightness=40.0]"
    assert real.loc["ico", "status"] == "completed"

    mock = (
        extraction_pipeline(rd.from_arrow(pages), preset="mock")
        .to_pandas()
        .set_index("content_type")
    )
    assert (mock["status"] == "failed").all()

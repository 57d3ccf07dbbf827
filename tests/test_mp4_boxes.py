"""MP4 / ISO-BMFF container metadata parser (r4, stages/mp4_boxes.py)."""

import struct

import pytest

from simple_content_ocr_ray.reference_semantics import sniff_bytes
from simple_content_ocr_ray.stages.mp4_boxes import (
    Mp4VideoEngine,
    UnsupportedMp4Error,
    make_mp4,
    parse_mp4,
)


@pytest.mark.parametrize("version1", [False, True])
def test_roundtrip_both_header_versions(version1):
    p = make_mp4(5500, 640, 360, 24, with_audio=True, version1=version1)
    m = parse_mp4(p)
    assert m["major_brand"] == "isom"
    assert m["duration_ms"] == 5500
    assert m["n_tracks"] == 2
    vid, snd = m["tracks"]
    assert (vid["handler"], vid["width"], vid["height"], vid["n_samples"]) == (
        "vide", 640, 360, 24)
    assert snd["handler"] == "soun" and snd["n_samples"] == 12
    assert vid["duration_ms"] == 5500


def test_unknown_boxes_are_skipped():
    p = make_mp4(1000, 320, 240, 5)
    # splice an unknown top-level box between ftyp and moov
    ftyp_end = 8 + struct.unpack_from(">I", p, 0)[0] - 8
    ftyp_len = struct.unpack_from(">I", p, 0)[0]
    unknown = struct.pack(">I", 16) + b"wxyz" + b"\x00" * 8
    spliced = p[:ftyp_len] + unknown + p[ftyp_len:]
    assert parse_mp4(spliced)["duration_ms"] == 1000
    assert ftyp_end  # silence linters


def test_largesize_box():
    p = make_mp4(2000, 100, 50, 3)
    # rewrite mdat as a 64-bit largesize box
    i = p.find(b"mdat") - 4
    (size,) = struct.unpack_from(">I", p, i)
    body = p[i + 8 : i + size]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    assert parse_mp4(p[:i] + large)["duration_ms"] == 2000


def test_seams():
    with pytest.raises(UnsupportedMp4Error, match="ftyp"):
        parse_mp4(b"\x00" * 32)
    with pytest.raises(UnsupportedMp4Error, match="moov"):
        parse_mp4(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4)
    good = make_mp4(1000, 2, 2, 1)
    with pytest.raises(UnsupportedMp4Error):
        parse_mp4(good[:60])


def test_sniff_and_engine():
    p = make_mp4(1500, 320, 240, 7)
    assert sniff_bytes(p) == "mp4"
    res = Mp4VideoEngine().extract("", p, "mp4")
    assert res.text == "[video 320x240 1500ms tracks=1 samples=7]"
    assert res.metadata["major_brand"] == "isom"


def test_mp4_in_real_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    pages = pa.table(
        {
            "url": ["https://x.example/clip"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([make_mp4(9000, 1280, 720, 30)], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    real = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert real.loc[0, "content_type"] == "mp4"
    assert real.loc[0, "status"] == "completed"
    assert real.loc[0, "text"] == "[video 1280x720 9000ms tracks=1 samples=30]"
    mock = extraction_pipeline(rd.from_arrow(pages), preset="mock").to_pandas()
    assert mock.loc[0, "status"] == "failed"


def test_avif_geometry_both_brands():
    from simple_content_ocr_ray.stages.mp4_boxes import make_avif, parse_avif

    for brand in (b"avif", b"heic", b"mif1"):
        m = parse_avif(make_avif(512, 384, brand))
        assert (m["width"], m["height"]) == (512, 384)
        assert m["has_pitm"] and m["n_props"] == 2
        assert m["major_brand"] == brand.decode()


def test_avif_seams():
    from simple_content_ocr_ray.stages.mp4_boxes import make_avif, parse_avif

    with pytest.raises(UnsupportedMp4Error, match="image brand"):
        parse_avif(make_mp4(1000, 2, 2, 1))
    with pytest.raises(UnsupportedMp4Error):
        parse_avif(make_avif(1, 1)[:30])


def test_avif_sniff_and_real_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.stages.mp4_boxes import make_avif

    payload = make_avif(800, 600)
    assert sniff_bytes(payload) == "avif"
    assert sniff_bytes(make_mp4(1000, 2, 2, 1)) == "mp4"
    pages = pa.table(
        {
            "url": ["https://x.example/i.avif"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([payload], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    real = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert real.loc[0, "content_type"] == "avif"
    assert real.loc[0, "text"] == "[image 800x600 brand=avif]"
    assert real.loc[0, "status"] == "completed"

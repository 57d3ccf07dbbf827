"""Transparent gzip decompression with bomb guards (r4,
stages/gzip_transparent.py)."""

import gzip

import pytest

from simple_content_ocr_ray.reference_semantics import sniff_bytes
from simple_content_ocr_ray.stages.engines import UnsupportedTypeError
from simple_content_ocr_ray.stages.gzip_transparent import (
    GzipBombError,
    GzipTransparentEngine,
    gunzip_guarded,
)

HTML = (
    b"<!doctype html><html><body><article><p>inner content here"
    b"</p></article></body></html>"
)


def test_roundtrip_through_inner_html_engine():
    r = GzipTransparentEngine().extract("", gzip.compress(HTML), "gzip")
    assert r.text == "inner content here"
    assert r.metadata["transport"] == "gzip"
    assert r.metadata["inner_type"] == "html"


def test_ratio_bomb_guard():
    bomb = gzip.compress(b"\x00" * 5_000_000)  # ~1022:1
    with pytest.raises(GzipBombError, match="ratio"):
        gunzip_guarded(bomb)


def test_absolute_cap_guard():
    with pytest.raises(GzipBombError, match="exceeds 100 bytes"):
        gunzip_guarded(gzip.compress(b"a" * 200), max_out=100)


def test_truncated_and_corrupt_streams():
    with pytest.raises(GzipBombError, match="truncated"):
        gunzip_guarded(gzip.compress(b"data")[:-4])
    with pytest.raises(GzipBombError, match="corrupt"):
        gunzip_guarded(b"\x1f\x8b\x08\x00garbage-follows")


def test_inner_unknown_fails_with_inner_seam():
    with pytest.raises(UnsupportedTypeError, match="inside gzip"):
        GzipTransparentEngine().extract(
            "", gzip.compress(b"GARBAGE\x00payload"), "gzip"
        )


def test_nested_gzip_is_rejected_not_recursed():
    # gzip-in-gzip routes back to this engine's name → explicit rejection
    inner = gzip.compress(HTML)
    with pytest.raises(UnsupportedTypeError, match="gzip"):
        GzipTransparentEngine().extract("", gzip.compress(inner), "gzip")


def test_sniff_and_real_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    payload = gzip.compress(HTML)
    assert sniff_bytes(payload) == "gzip"
    pages = pa.table(
        {
            "url": ["https://x.example/page.gz"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([payload], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    real = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert real.loc[0, "content_type"] == "gzip"
    assert real.loc[0, "status"] == "completed"
    assert real.loc[0, "text"] == "inner content here"
    mock = extraction_pipeline(rd.from_arrow(pages), preset="mock").to_pandas()
    assert mock.loc[0, "status"] == "failed"

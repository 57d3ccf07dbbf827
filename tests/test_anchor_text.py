"""Anchor-text index extraction (pipelines/extract_queries.py).

The full-corpus aggregation is oracle-checked by the driver/sweep; these
tests pin the extraction semantics of the PRODUCTION per-batch function
(`anchor_pairs`) on hand-built HTML — paired capture, relative and
protocol-relative URL resolution, and non-HTML row exclusion.
"""

from __future__ import annotations

import pandas as pd

from simple_content_ocr_ray.pipelines.extract_queries import anchor_pairs


def _pairs(rows: list[tuple[str, bytes]]) -> pd.DataFrame:
    return anchor_pairs(pd.DataFrame(rows, columns=["url", "html"]))


def test_relative_hrefs_resolve_against_page_origin():
    got = _pairs(
        [("https://ex.com/p1", b'<!doctype html><a href="/about">About Us</a>')]
    )
    assert got.iloc[0].tolist() == ["https://ex.com/about", "About Us"]


def test_http_origin_resolves_too():
    got = _pairs(
        [("http://ex.com/p1", b'<!doctype html><a href="/b">c</a>')]
    )
    assert got.iloc[0].tolist() == ["http://ex.com/b", "c"]


def test_protocol_relative_hrefs_take_the_page_scheme():
    got = _pairs(
        [
            (
                "https://ex.com/p1",
                b'<!doctype html><a href="//cdn.org/x">cdn</a>',
            )
        ]
    )
    assert got.iloc[0].tolist() == ["https://cdn.org/x", "cdn"]


def test_absolute_hrefs_pass_through():
    got = _pairs(
        [
            (
                "https://ex.com/p1",
                b'<!doctype html><a href="https://other.org/x">cross link</a>',
            )
        ]
    )
    assert got.iloc[0].tolist() == ["https://other.org/x", "cross link"]


def test_unparseable_origin_drops_rows_instead_of_nan_targets():
    got = _pairs(
        [("ftp://weird/p", b'<!doctype html><a href="/a">a</a>')]
    )
    assert len(got) == 0


def test_non_html_rows_and_pages_without_links_are_excluded():
    got = _pairs(
        [
            ("https://ex.com/pdf", b"%PDF-1.4 not html"),
            ("https://ex.com/empty", b"<!doctype html><p>no links</p>"),
            ("https://ex.com/p", b'<!doctype html><a href="/a">a</a>'),
        ]
    )
    assert len(got) == 1 and got.iloc[0]["target"] == "https://ex.com/a"


def test_distributed_matches_oracle(ray_session, sf_dir):
    """End-to-end: the Ray aggregation equals the DuckDB mirror."""
    import duckdb

    from simple_content_ocr_ray.pipelines.extract_queries import (
        _ANCHOR_TEXT_INDEX_SQL,
        anchor_text_index,
    )

    got = anchor_text_index(sf_dir)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.sql(_ANCHOR_TEXT_INDEX_SQL)
        .df()
        .sort_values(["target", "anchor"])
        .reset_index(drop=True)
    )
    want["n_links"] = want["n_links"].astype("int64")
    pd.testing.assert_frame_equal(got, want)

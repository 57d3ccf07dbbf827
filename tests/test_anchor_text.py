"""Anchor-text index extraction (pipelines/extract_queries.py).

The full-corpus aggregation is oracle-checked by the driver/sweep; these
tests pin the extraction semantics on hand-built HTML — paired capture,
relative-URL resolution, and non-HTML row exclusion — via the same
per-batch `prepare` path the distributed query runs.
"""

from __future__ import annotations

import pandas as pd


def _pairs(rows: list[tuple[str, bytes]]) -> pd.DataFrame:
    """Run anchor_text_index's per-batch extraction on raw (url, html)."""
    import numpy as np

    df = pd.DataFrame(rows, columns=["url", "html"])
    html = df["html"].map(
        lambda b: b.decode("utf-8", "ignore") if isinstance(b, bytes) else ""
    )
    is_html = html.str.startswith("<!doctype html>")
    origin = df.loc[is_html, "url"].str.extract(r"^(https://[^/]+)", expand=False)
    found = html[is_html].str.findall(r'<a href="([^"]+)">([^<]*)</a>')
    out = pd.DataFrame({"origin": origin, "pair": found}).explode("pair")
    out = out.dropna(subset=["pair"])
    href = out["pair"].str[0]
    target = np.where(href.str.startswith("/"), out["origin"] + href, href)
    return pd.DataFrame({"target": target, "anchor": out["pair"].str[1]})


def test_relative_hrefs_resolve_against_page_origin():
    got = _pairs(
        [("https://ex.com/p1", b'<!doctype html><a href="/about">About Us</a>')]
    )
    assert got.iloc[0].tolist() == ["https://ex.com/about", "About Us"]


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

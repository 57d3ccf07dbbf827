"""Sitemap parsing + coverage audit (pipelines/extract_queries.py)."""

from __future__ import annotations

import pandas as pd

from simple_content_ocr_ray.pipelines.extract_queries import (
    make_sitemap,
    parse_sitemap,
)


def test_parse_sitemap_namespace_aware():
    urls = parse_sitemap(make_sitemap(5))
    assert len(urls) == 7
    assert urls[0] == "https://site5.example/00000005"
    assert urls[-1] == "https://site5.example/extra/2"


def test_parse_sitemap_handles_whitespace_and_missing_lastmod():
    raw = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>  https://a.example/x </loc></url>"
        b"<url><loc>https://a.example/y</loc><lastmod>2024-02-02</lastmod>"
        b"</url></urlset>"
    )
    assert parse_sitemap(raw) == ["https://a.example/x", "https://a.example/y"]


def test_parse_sitemap_malformed_returns_empty():
    assert parse_sitemap(b"<urlset><loc>unclosed") == []
    assert parse_sitemap(b"not xml at all") == []


def test_coverage_matches_oracle(ray_session, sf_dir):
    import duckdb

    from simple_content_ocr_ray.pipelines.extract_queries import (
        _SITEMAP_COVERAGE_SQL,
        sitemap_coverage,
    )

    got = sitemap_coverage(sf_dir).sort_values("domain").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.sql(_SITEMAP_COVERAGE_SQL)
        .df()
        .sort_values("domain")
        .reset_index(drop=True)
        .astype({"n_sitemap_urls": "int64", "n_matched": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)
    # extras are listed but never crawled; later strides exceed the corpus
    assert (got["n_matched"] < got["n_sitemap_urls"]).all()


# ---- Cache-Control parsing (recrawl_schedule) ----


def test_cache_control_directive_precedence():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        parse_cache_control,
    )

    assert parse_cache_control("max-age=3600") == 3600
    assert parse_cache_control("public, max-age=300, must-revalidate") == 300
    # no-store / no-cache win over any max-age
    assert parse_cache_control("no-store") == 0
    assert parse_cache_control("no-cache, max-age=600") == 0
    assert parse_cache_control("MAX-AGE=42") == 42  # case-insensitive
    assert parse_cache_control('max-age="90"') == 90  # quoted value


def test_cache_control_defaults_and_garbage():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        _DEFAULT_TTL_S,
        parse_cache_control,
    )

    assert parse_cache_control("") == _DEFAULT_TTL_S
    assert parse_cache_control("private") == _DEFAULT_TTL_S
    assert parse_cache_control("max-age=banana") == _DEFAULT_TTL_S
    assert parse_cache_control("max-age=-5") == 0  # clamped, not negative


def test_sitemapindex_expands_to_same_urls():
    from simple_content_ocr_ray.pipelines.extract_queries import (
        expand_sitemap,
        sitemap_child_url,
    )

    def fetch(url):
        import re

        m = re.match(r"https://site(\d+)\.example/sitemap-(\d)\.xml$", url)
        return make_sitemap(int(m.group(1)), int(m.group(2))) if m else None

    # nested domain (k % 3 == 0): index expands to the flat url set
    flat = expand_sitemap(make_sitemap(4), fetch)  # k=4 serves flat
    nested = expand_sitemap(make_sitemap(3), fetch)  # k=3 serves an index
    assert len(nested) == 7 and len(set(nested)) == 7
    from simple_content_ocr_ray.pipelines.extract_queries import _SITEMAP_STRIDES

    assert sorted(nested) == sorted(
        [f"https://site3.example/{3 + 97 * j:08d}" for j in _SITEMAP_STRIDES]
        + [f"https://site3.example/extra/{i}" for i in (1, 2)]
    )
    assert len(flat) == 7

    # index <loc>s are never mistaken for page urls by the flat parser
    assert parse_sitemap(make_sitemap(3)) == []
    assert sitemap_child_url(3, 0).endswith("sitemap-0.xml")

    # a missing child costs that child only; depth bound stops cycles
    assert expand_sitemap(make_sitemap(3), lambda u: None) == []
    cyclic = make_sitemap(3)
    assert expand_sitemap(cyclic, lambda u: cyclic) == []

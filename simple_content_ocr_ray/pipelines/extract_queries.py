"""Driver-contract queries for the extraction pipeline itself.

The ``pages`` input is synthesized deterministically from the ``documents``
table (sources/synth_pages.py), so every expected output is expressible as
ANSI SQL over ``documents`` — including the byte-identical main-text check:
for HTML rows the extractor must reproduce ``documents.text`` exactly after
stripping the generated boilerplate.

SQL mirrors of the synthesis rules (see synth_pages.py):
  url        = 'https://site' || (doc_id % 97) || '.example/' || lpad(doc_id, 8, '0')
  class      : doc_id%20 in (0,1) → pdf · ==2 → image(png) · ==3 → garbage · else html
  pdf bytes  = 9 + n_chars*50  → page_count = greatest(1, bytes // 51200)
  png bytes  = 8 + n_chars
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.agg import grouped_aggregate
from ..sources.synth_pages import synth_pages_parquet
from .extract import extraction_pipeline, read_pages

_URL_SQL = (
    "'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/' || "
    "lpad(CAST(doc_id AS VARCHAR), 8, '0')"
)


def _extracted(sf_dir: str, duplicate_every: int = 0) -> rd.Dataset:
    pages_dir = synth_pages_parquet(sf_dir, duplicate_every=duplicate_every)
    return extraction_pipeline(read_pages(pages_dir))


def extract_html_text(sf_dir: str) -> rd.Dataset:
    """Byte-identical main text per url for every HTML page."""
    ds = _extracted(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["content_type"], "html")).select(
            ["url", "text"]
        ),
        batch_format="pyarrow",
    )


_EXTRACT_HTML_TEXT_SQL = f"""
SELECT {_URL_SQL} AS url, text
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
"""


def route_counts(sf_dir: str) -> pd.DataFrame:
    """Content-sniff router distribution (M1/M2 analog)."""
    ds = _extracted(sf_dir)
    agg = grouped_aggregate(ds, ["content_type", "status"], {"n": (None, "count")})
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df


_ROUTE_COUNTS_SQL = """
SELECT CASE
         WHEN doc_id % 20 IN (0, 1) THEN 'pdf'
         WHEN doc_id % 20 = 2 THEN 'png'
         WHEN doc_id % 20 = 3 THEN 'unknown'
         ELSE 'html'
       END AS content_type,
       CASE WHEN doc_id % 20 = 3 THEN 'failed' ELSE 'completed' END AS status,
       COUNT(*) AS n
FROM documents
GROUP BY 1, 2
"""


def pdf_page_counts(sf_dir: str) -> rd.Dataset:
    """Size-based page estimation over the PDF route (M9 semantics:
    max(1, bytes // 51200))."""
    ds = _extracted(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["content_type"], "pdf"))
        return pa.table(
            {
                "url": t["url"],
                "page_count": pa.compute.cast(t["page_count"], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_PDF_PAGE_COUNTS_SQL = f"""
SELECT {_URL_SQL} AS url,
       GREATEST(1, (9 + n_chars * 50) // 51200) AS page_count
FROM documents
WHERE doc_id % 20 IN (0, 1)
"""


def failed_rows(sf_dir: str) -> rd.Dataset:
    """Unsupported payloads become FAILED rows with the reference's error
    message shape (deepseek_engine.py:257-263), never failed tasks."""
    ds = _extracted(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.equal(t["status"], "failed")).select(
            ["url", "error"]
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_FAILED_ROWS_SQL = f"""
SELECT {_URL_SQL} AS url,
       'Unsupported document type: application/octet-stream' AS error
FROM documents
WHERE doc_id % 20 = 3
"""


def dedup_exact_pages(sf_dir: str) -> rd.Dataset:
    """Exact dedup by url (D1: at-least-once duplicate-job suppression).

    Input re-emits every doc_id%100==7 row; hash-partition on url and keep
    one row per group. Output = distinct (url, text) — byte-identical text
    must survive dedup."""
    pages_dir = synth_pages_parquet(sf_dir, duplicate_every=100)
    pages = read_pages(pages_dir)
    deduped = (
        pages.select_columns(["url", "html", "text"])
        .groupby("url")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
    ds = extraction_pipeline(deduped)
    return ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["content_type"], "html")).select(
            ["url", "text"]
        ),
        batch_format="pyarrow",
    )


# after dedup the duplicated rows collapse: expected output == all html docs
_DEDUP_EXACT_PAGES_SQL = _EXTRACT_HTML_TEXT_SQL


QUERIES: dict[str, Callable[[str], object]] = {
    "extract_html_text": extract_html_text,
    "route_counts": route_counts,
    "pdf_page_counts": pdf_page_counts,
    "failed_rows": failed_rows,
    "dedup_exact_pages": dedup_exact_pages,
}

ORACLES: dict[str, str] = {
    "extract_html_text": _EXTRACT_HTML_TEXT_SQL,
    "route_counts": _ROUTE_COUNTS_SQL,
    "pdf_page_counts": _PDF_PAGE_COUNTS_SQL,
    "failed_rows": _FAILED_ROWS_SQL,
    "dedup_exact_pages": _DEDUP_EXACT_PAGES_SQL,
}

"""Heavy-document explode → per-page extract → ordered re-combine.

The reference processes a document's pages sequentially inside one worker
(deepseek_engine.py:144-149) and joins them with exact separators
(_combine_pages, deepseek_engine.py:336-358). One 100-page document in a
block of 1-page docs is the skew case (SURVEY.md §7.5 risk 4): the Ray-native
answer is to EXPLODE multi-page docs into per-page rows (flat map), extract
pages in parallel anywhere in the cluster, and re-combine per url with
``groupby("url").map_groups`` ordered by ``page_num`` — byte-identical to the
single-worker path, verified by tests.

Partitioning assumption: re-combine shuffles on ``url`` (all pages of a doc
co-locate); page order is restored by an explicit sort inside each group —
dataset-level order is never relied upon (§2.8 semantics).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..reference_semantics import (
    CONTENT_TYPE_TO_MIME,
    combine_pages,
    estimate_page_count,
)

#: docs with more pages than this use the explode path (analog of the
#: reference's max_pdf_pages admission cap, config.py:109-112)
EXPLODE_THRESHOLD_PAGES = 2
MAX_PAGES_CAP = 100


def page_markdown(url: str, page_num: int, mime: str, size_bytes: int) -> str:
    """Deterministic per-page extraction output (the per-page unit the
    reference's engines produce one-at-a-time)."""
    return (
        f"# Page {page_num}\n\n"
        f"Extracted from {url} ({mime}, {size_bytes} bytes), "
        f"page {page_num}."
    )


def paged_extract_row(url: str, payload: bytes) -> tuple[str, int]:
    """Single-worker reference path: render each page in order, combine with
    exact separator semantics. Returns (combined_markdown, page_count)."""
    mime = CONTENT_TYPE_TO_MIME["pdf"]
    size = len(payload)
    pages = min(MAX_PAGES_CAP, estimate_page_count(mime, size))
    mds = [page_markdown(url, i + 1, mime, size) for i in range(pages)]
    return combine_pages(mds), pages


def explode_pages(pdf_pages: rd.Dataset) -> rd.Dataset:
    """1 doc row → N page rows carrying (url, page_num, mime, size)."""

    def fn(t: pa.Table) -> pa.Table:
        urls, nums, sizes = [], [], []
        for url, payload in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            size = len(payload or b"")
            n = min(MAX_PAGES_CAP, estimate_page_count("application/pdf", size))
            urls.extend([url] * n)
            nums.extend(range(1, n + 1))
            sizes.extend([size] * n)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "page_num": pa.array(nums, pa.int32()),
                "size_bytes": pa.array(sizes, pa.int64()),
            }
        )

    return pdf_pages.map_batches(fn, batch_format="pyarrow")


def extract_page_rows(pages: rd.Dataset) -> rd.Dataset:
    """Per-page extraction — parallel across the cluster, any order."""

    def fn(t: pa.Table) -> pa.Table:
        mds = [
            page_markdown(u, int(p), CONTENT_TYPE_TO_MIME["pdf"], int(s))
            for u, p, s in zip(
                t["url"].to_pylist(),
                t["page_num"].to_pylist(),
                t["size_bytes"].to_pylist(),
            )
        ]
        return t.append_column("page_md", pa.array(mds, pa.string()))

    return pages.map_batches(fn, batch_format="pyarrow")


def recombine(page_rows: rd.Dataset) -> rd.Dataset:
    """url-keyed shuffle → per-BLOCK sort by (url, page_num) →
    exact-separator combine of every complete url run in the block (r4:
    ``map_sorted_runs`` — one python call per block instead of one per url,
    so combining millions of heavy documents costs per-block dispatch, not
    ms × |urls|). The only ordering guarantee used is within-run."""
    from ..functions.agg import map_sorted_runs

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "page_num"], kind="mergesort")
        out = df.groupby("url", sort=False).agg(
            text=("page_md", lambda s: combine_pages(list(s))),
            page_count=("page_md", "size"),
        )
        out["page_count"] = out["page_count"].astype("int32")
        return out.reset_index()

    return map_sorted_runs(page_rows, "url", fn)


def exploded_extraction(pdf_docs: rd.Dataset) -> rd.Dataset:
    """Full explode/recombine pipeline over pdf-route doc rows."""
    return recombine(extract_page_rows(explode_pages(pdf_docs)))


class PagedPdfEngine:
    """Per-page extraction + exact-separator combine inside one worker — the
    reference's sequential document path (deepseek_engine.py:144-167). The
    explode/recombine pipeline above is the distributed restatement; both are
    byte-identical per url (asserted in tests), which is what makes the
    size-threshold routing in ``split_extraction_pipeline`` safe."""

    name = "paged-pdf"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        text, pages = paged_extract_row(url, payload)
        return EngineResult(
            text=text,
            page_count=pages,
            metadata={
                "engine": self.name,
                "mime_type": CONTENT_TYPE_TO_MIME["pdf"],
                "size_bytes": str(len(payload)),
                "page_count": str(pages),
            },
        )

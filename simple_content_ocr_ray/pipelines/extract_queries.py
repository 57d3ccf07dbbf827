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

import os
import re
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.agg import grouped_aggregate
from ..sources.synth_pages import (
    N_HOSTS,
    RECRAWL_RESIDUE,
    RECRAWL_SAME_RESIDUE,
    RECRAWL_SUFFIX,
    synth_pages_parquet,
)
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


def extract_html_text_density(sf_dir: str) -> rd.Dataset:
    """The SECOND main-content strategy end-to-end: jusText-style
    context-free per-paragraph density classification
    (``stages/html_extractor.py:DensityExtractor``) over the same page
    corpus — byte-identical main text per url, hash-checked against the
    SAME ground truth as the Readability-style flagship
    (``extract_html_text``). Two published extraction techniques, two
    independent oracled channels; where their rules genuinely diverge is
    pinned by unit tests instead. Actor pool; extractor built once per
    actor."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    class DensityStage:
        def __init__(self) -> None:
            from ..stages.html_extractor import DensityExtractor

            self.ex = DensityExtractor()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            urls, texts = [], []
            for u, payload in zip(df["url"], df["html"]):
                raw = bytes(payload)
                if not raw.startswith(b"<!doctype html>"):
                    continue
                urls.append(u)
                texts.append(self.ex.extract(raw.decode("utf-8"))[0])
            return pd.DataFrame({"url": urls, "text": texts})

    return pages.map_batches(
        DensityStage, batch_format="pandas", concurrency=(1, 4)
    )


def extract_real_routes(sf_dir: str) -> rd.Dataset:
    """The FLAGSHIP configuration end-to-end: real-payload corpus (valid
    minimal PDFs and PNGs — synth_pages.py real_payloads) through the
    ``preset="real"`` route, so EVERY content type runs its real decoder
    (html-main-content, pdf-text, png-decode) — the reference always runs a
    real engine per route (ocr_service.py:83-108). Asserts byte-identical
    text per url on every route at once: HTML must reproduce
    ``documents.text``, PDFs must recover their per-page text joined with
    the reference page separator, PNGs their decoded-metadata line, and
    garbage rows must fail with the reference error message."""
    pages_dir = synth_pages_parquet(sf_dir, real_payloads=True)
    ds = extraction_pipeline(read_pages(pages_dir), preset="real")

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "status": t["status"],
                "text": t["text"],
                "page_count": pa.compute.cast(t["page_count"], pa.int64()),
                "content_type": t["content_type"],
                "error": t["error"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# PAGE_SEP ('\n\n---\n\n') is embedded literally — DuckDB string literals
# accept raw newlines. Real-PDF pages: 1 + doc_id % 3, page 1 = text,
# page p = 'page p' (synth_pages.real_pdf_page_texts). Real-PNG metadata
# line: constant-pixel image, mean brightness == doc_id % 256 exactly
# (synth_pages.real_png_pixels).
_EXTRACT_REAL_ROUTES_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE WHEN doc_id % 20 = 3 THEN 'failed' ELSE 'completed' END AS status,
       CASE
         WHEN doc_id % 20 IN (0, 1) THEN
           CASE doc_id % 3
             WHEN 0 THEN text
             WHEN 1 THEN text || '\n\n---\n\npage 2'
             ELSE text || '\n\n---\n\npage 2\n\n---\n\npage 3'
           END
         WHEN doc_id % 20 = 2 THEN
           '[image ' || CAST(16 + doc_id % 9 AS VARCHAR) || 'x'
           || CAST(4 + doc_id % 7 AS VARCHAR)
           || ' ch=1 brightness=' || CAST(doc_id % 256 AS VARCHAR) || '.0]'
         WHEN doc_id % 20 = 3 THEN ''
         ELSE text
       END AS text,
       CASE WHEN doc_id % 20 IN (0, 1) THEN 1 + doc_id % 3
            ELSE 1 END AS page_count,
       CASE WHEN doc_id % 20 IN (0, 1) THEN 'pdf'
            WHEN doc_id % 20 = 2 THEN 'png'
            WHEN doc_id % 20 = 3 THEN 'unknown'
            ELSE 'html' END AS content_type,
       CASE WHEN doc_id % 20 = 3
            THEN 'Unsupported document type: application/octet-stream'
            ELSE '' END AS error
FROM documents
"""


#: hostile-input corpus classes, keyed by doc_id % 8 — each exercises a
#: DISTINCT real-decoder failure mode so the failed-row taxonomy is itself
#: oracled per error class (r5, VERDICT r4 task 8)
_HOSTILE_CLASSES = (
    "trunc_gzip",      # 0 valid gzip of the HTML page, cut at half
    "trunc_jpeg",      # 1 progressive JPEG cut mid-stream
    "damaged_pdf",     # 2 CRLF-damaged + tail-truncated PDF
    "mojibake",        # 3 invalid UTF-8 bytes inside a utf-8 HTML page
    "trunc_png",       # 4 PNG with the IDAT stream cut
    "garbage",         # 5 unknown magic (the classic unsupported row)
    "ok",              # 6 control: valid HTML, must complete clean
    "gzip_garbage",    # 7 valid gzip wrapping unknown magic
)


def _hostile_payload(d: int, text: str, lang: str) -> bytes:
    """Deterministic hostile payload for doc ``d`` (class = d % 8)."""
    import gzip as _gzip

    from ..sources.synth_pages import _HTML_TEMPLATE

    html = _HTML_TEMPLATE.format(
        doc_id=d, host=d % 97, lang=lang, body=f"<p>{text}</p>"
    ).encode("utf-8")
    cls = d % 8
    if cls == 0:
        g = _gzip.compress(html, compresslevel=1)
        return g[: len(g) // 2]
    if cls == 1:
        import numpy as np

        from ..stages.jpeg_decode import make_progressive_jpeg

        px = np.full((8 + d % 5, 12 + d % 7), d % 256, dtype=np.uint8)
        j = make_progressive_jpeg(px)
        return j[: int(len(j) * 0.85)]
    if cls == 2:
        from ..stages.pdf_text import make_minimal_pdf

        p = make_minimal_pdf([[text]])
        return p.replace(b"stream\n", b"stream\r\n", 1)[: len(p) - 20]
    if cls == 3:
        return html.replace(b"<p>", b"<p>\xe9\xa0 \xff ", 1)
    if cls == 4:
        import numpy as np

        from ..stages.png_decode import make_png

        png = make_png(np.full((8, 8), d % 256, dtype=np.uint8))
        return png[: len(png) // 2]
    if cls == 5:
        return b"GARBAGE\x00payload " + text.encode("utf-8")[:32]
    if cls == 6:
        return html
    return _gzip.compress(b"GARBAGE\x00inner " + str(d).encode(), compresslevel=1)


def _classify_hostile_row(status: str, ctype: str, error: str, text: str) -> str:
    """Map an OBSERVED pipeline row to its error class — total function;
    anything unexpected lands in 'other' and breaks the oracle's counts."""
    if status == "completed":
        if "�" in text:
            return "mojibake"
        return "ok" if ctype == "html" else "other"
    if "truncated gzip" in error:
        return "trunc_gzip"
    if "(inside gzip)" in error:
        return "gzip_garbage"
    if ctype == "jpeg":
        return "trunc_jpeg"
    if "content stream" in error or "/Type /Page" in error:
        return "damaged_pdf"
    if "IDAT" in error:
        return "trunc_png"
    if error.startswith("Unsupported document type"):
        return "garbage"
    return "other"


def error_class_counts(sf_dir: str) -> pd.DataFrame:
    """Failed-row TAXONOMY oracle (r5): a hostile-input corpus — truncated
    gzip, mid-stream-truncated progressive JPEG, CRLF-damaged PDF, mojibake
    charsets, cut IDAT PNGs, garbage inside and outside gzip, plus a clean
    control — through the FULL ``preset="real"`` pipeline. Every row is
    classified from its OBSERVED (status, content_type, error, text) alone
    and the per-class counts must equal the fixture arithmetic — so each
    hostile class provably fails in its OWN typed error class (stable
    across partitionings), not just 'failed'."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def build(t: pa.Table) -> pa.Table:
        from ..sources.synth_pages import url_for

        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        return pa.table(
            {
                "url": pa.array([url_for(d) for d in ids], pa.string()),
                "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
                "html": pa.array(
                    [_hostile_payload(d, tx, lg)
                     for d, tx, lg in zip(ids, texts, langs)],
                    pa.binary(),
                ),
                "text": pa.array([""] * len(ids), pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    pages = docs.map_batches(build, batch_format="pyarrow")
    ds = extraction_pipeline(pages, preset="real")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        cls = [
            _classify_hostile_row(s, c, e, tx)
            for s, c, e, tx in zip(
                df["status"], df["content_type"], df["error"], df["text"]
            )
        ]
        return pd.DataFrame({"error_class": pd.Series(cls, dtype="object")})

    out = grouped_aggregate(
        ds.map_batches(classify, batch_format="pandas"),
        ["error_class"],
        {"n": (None, "count")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("error_class").reset_index(drop=True)


_ERROR_CLASS_COUNTS_SQL = """
SELECT CASE doc_id % 8
         WHEN 0 THEN 'trunc_gzip'
         WHEN 1 THEN 'trunc_jpeg'
         WHEN 2 THEN 'damaged_pdf'
         WHEN 3 THEN 'mojibake'
         WHEN 4 THEN 'trunc_png'
         WHEN 5 THEN 'garbage'
         WHEN 6 THEN 'ok'
         ELSE 'gzip_garbage' END AS error_class,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1 ORDER BY 1
"""


def gzip_real_routes(sf_dir: str) -> rd.Dataset:
    """The flagship corpus with EVERY payload stored gzip (the as-fetched
    Content-Encoding case): the gzip-transparent engine must gunzip
    (bomb-guarded), re-sniff, and dispatch each inner type to its real
    decoder — text byte-identical to the uncompressed run on every route,
    inner garbage still failing as rows."""
    import gzip

    pages_dir = synth_pages_parquet(sf_dir, real_payloads=True)

    def wrap(t: pa.Table) -> pa.Table:
        wrapped = [
            gzip.compress(bytes(p), compresslevel=1)
            for p in t["html"].to_pylist()
        ]
        return t.set_column(
            t.schema.get_field_index("html"), "html",
            pa.array(wrapped, pa.binary()),
        )

    ds = extraction_pipeline(
        read_pages(pages_dir).map_batches(wrap, batch_format="pyarrow"),
        preset="real",
    )

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "status": t["status"],
                "text": t["text"],
                "content_type": t["content_type"],
                "error": t["error"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_GZIP_REAL_ROUTES_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE WHEN doc_id % 20 = 3 THEN 'failed' ELSE 'completed' END AS status,
       CASE
         WHEN doc_id % 20 IN (0, 1) THEN
           CASE doc_id % 3
             WHEN 0 THEN text
             WHEN 1 THEN text || '\n\n---\n\npage 2'
             ELSE text || '\n\n---\n\npage 2\n\n---\n\npage 3'
           END
         WHEN doc_id % 20 = 2 THEN
           '[image ' || CAST(16 + doc_id % 9 AS VARCHAR) || 'x'
           || CAST(4 + doc_id % 7 AS VARCHAR)
           || ' ch=1 brightness=' || CAST(doc_id % 256 AS VARCHAR) || '.0]'
         WHEN doc_id % 20 = 3 THEN ''
         ELSE text
       END AS text,
       'gzip' AS content_type,
       CASE WHEN doc_id % 20 = 3
            THEN 'Unsupported file type: unknown (inside gzip)'
            ELSE '' END AS error
FROM documents
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

    Input re-emits every doc_id%100==7 row; output = distinct (url, text) —
    byte-identical text must survive dedup.

    Topology (r3 — replaces the groupby(url).map_groups(head(1)) that cost
    ~ms per group, i.e. the slow path at billions of near-singleton url
    groups): at-least-once redeliveries are BYTE-IDENTICAL rows, so

      1. a per-batch ``drop_duplicates("url")`` inside the payload stage
         suppresses redelivered work cheaply (redeliveries are typically
         adjacent — same source partition);
      2. survivors extract normally (extraction is deterministic per row,
         so extracting a rare cross-batch duplicate twice is harmless —
         bounded by the duplicate fraction, vs. a payload-carrying keeper
         shuffle that would move the whole corpus);
      3. the final dedup runs on the SLIM (url, text) output via
         ``grouped_aggregate`` — per-batch arg-min partials + adaptive
         final merge (the clean_corpus keeper topology), min() over the
         identical texts per url. Payloads never shuffle; no per-group
         python anywhere."""
    pages_dir = synth_pages_parquet(sf_dir, duplicate_every=100)
    pages = read_pages(pages_dir).map_batches(
        lambda df: df[["url", "html", "text"]].drop_duplicates("url"),
        batch_format="pandas",
    )
    ds = extraction_pipeline(pages)
    slim = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["content_type"], "html")).select(
            ["url", "text"]
        ),
        batch_format="pyarrow",
    )
    return grouped_aggregate(slim, ["url"], {"text": ("text", "min")})


# after dedup the duplicated rows collapse: expected output == all html docs
_DEDUP_EXACT_PAGES_SQL = _EXTRACT_HTML_TEXT_SQL


#: above this many distinct urls the latest-snapshot filter switches from a
#: broadcast (url → max warc_ts) map to a distributed hash join
LATEST_BROADCAST_MAX_URLS = 5_000_000
RECRAWL_EVERY = 50


def latest_page_text(
    sf_dir: str, broadcast_max_urls: int = LATEST_BROADCAST_MAX_URLS
) -> rd.Dataset:
    """Re-crawl dedup: keep each url's NEWEST snapshot (max ``warc_ts``) —
    the Common-Crawl multi-snapshot shape — then extract. The input re-emits
    every doc_id % RECRAWL_EVERY == RECRAWL_RESIDUE page as a 30-days-later snapshot with changed
    content; the newest text must win, byte-exactly.

    Scale shape: pass 1 aggregates (url → max warc_ts) moving only the two
    thin columns (never a payload); pass 2 keeps a row iff its ts equals its
    url's max. Below ``broadcast_max_urls`` the slim map is broadcast once
    (``ray.put``) and the filter is worker-local — zero payload shuffle.
    Above it, the survivors are selected by a distributed hash join of pages
    against the slim max table on (url, warc_ts); with the hash-bucketed
    layout (``sources/bucketed.py``) that join is co-partitioned and
    shuffle-free."""
    import ray

    pages_dir = synth_pages_parquet(sf_dir, recrawl_every=RECRAWL_EVERY)
    pages = read_pages(pages_dir)
    maxts = grouped_aggregate(
        pages.select_columns(["url", "warc_ts"]),
        ["url"],
        {"max_ts": ("warc_ts", "max")},
    ).materialize()  # count() + the downstream consumer reuse one execution
    if maxts.count() <= broadcast_max_urls:
        mdf = maxts.to_pandas()
        ref = ray.put(dict(zip(mdf["url"], mdf["max_ts"])))

        def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            return df[df["warc_ts"] == df["url"].map(m)]

        latest = pages.map_batches(keep_latest, batch_format="pandas")
    else:
        latest = pages.join(
            maxts.map_batches(
                lambda df: df.rename(columns={"max_ts": "warc_ts"}),
                batch_format="pandas",
            ),
            join_type="inner",
            num_partitions=16,
            on=("url", "warc_ts"),
        )
    ds = extraction_pipeline(latest)
    return ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["content_type"], "html")).select(
            ["url", "text"]
        ),
        batch_format="pyarrow",
    )


_LATEST_PAGE_TEXT_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
            THEN text || '{RECRAWL_SUFFIX}'
            ELSE text END AS text
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
"""


def recrawl_churn_stats(sf_dir: str) -> pd.DataFrame:
    """Crawl-churn report over the multi-snapshot pages table: per domain,
    how many urls exist and how many were re-crawled (≥2 snapshots) — the
    freshness statistic a crawl scheduler feeds on. Only (url, warc_ts)
    leave the scan; snapshot counts per url collapse inside the partial
    aggregate, then one bounded per-domain rollup."""
    pages_dir = synth_pages_parquet(sf_dir, recrawl_every=RECRAWL_EVERY)
    urls = rd.read_parquet(pages_dir, columns=["url"])

    per_url = grouped_aggregate(urls, ["url"], {"n_snapshots": (None, "count")})

    def domain_rows(df: pd.DataFrame) -> pd.DataFrame:
        host = df["url"].str.extract(r"^https?://([^/]+)", expand=False)
        return pd.DataFrame(
            {
                "domain": host,
                "recrawled": (df["n_snapshots"] > 1).astype("int64"),
            }
        )

    out = grouped_aggregate(
        per_url,
        ["domain"],
        {"n_urls": (None, "count"), "n_recrawled": ("recrawled", "sum")},
        prepare=domain_rows,
    ).to_pandas()
    out = out.astype({"n_urls": "int64", "n_recrawled": "int64"})
    return out.sort_values("domain").reset_index(drop=True)


_RECRAWL_CHURN_SQL = f"""
SELECT 'site' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example' AS domain,
       COUNT(*) AS n_urls,
       CAST(SUM(CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_recrawled
FROM documents
GROUP BY 1 ORDER BY 1
"""


def snapshot_change_rate(sf_dir: str) -> pd.DataFrame:
    """Content-level crawl-churn report: per domain, how many urls were
    re-crawled (≥2 snapshots in the pages table) and what fraction of those
    re-crawls actually CHANGED the page (>1 distinct extracted-text digest
    among the url's snapshots) — the signal that separates sites worth
    frequent re-crawling from ones serving byte-identical pages. The fixture
    mixes changed re-crawls (residue {RECRAWL_RESIDUE}) with no-op re-crawls
    (residue {RECRAWL_SAME_RESIDUE}) and non-HTML pages whose extracted text
    is empty either way, so the rate is non-trivial per domain.

    Scale topology: only (url, 16-byte digest) leaves the scan — page text
    never shuffles. Distinct digests per url collapse inside the partial
    aggregate of the first grouped pass ((url, h) keys), the second pass
    reduces to one row per url, and the domain rollup is bounded by |hosts|.
    """
    import hashlib

    pages_dir = synth_pages_parquet(
        sf_dir, recrawl_every=RECRAWL_EVERY, recrawl_same_every=RECRAWL_EVERY
    )
    pages = rd.read_parquet(pages_dir, columns=["url", "text"])

    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": df["url"],
                "h": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]],
            }
        )

    per_variant = grouped_aggregate(
        pages, ["url", "h"], {"n": (None, "count")}, prepare=hash_rows
    )
    per_url = grouped_aggregate(
        per_variant,
        ["url"],
        {"n_variants": (None, "count"), "n_snapshots": ("n", "sum")},
    )

    def domain_rows(df: pd.DataFrame) -> pd.DataFrame:
        recrawled = df["n_snapshots"].to_numpy() > 1
        host = df.loc[recrawled, "url"].str.extract(r"^https?://([^/]+)", expand=False)
        return pd.DataFrame(
            {
                "domain": host,
                "changed": (df.loc[recrawled, "n_variants"] > 1).astype("int64"),
            }
        )

    out = grouped_aggregate(
        per_url,
        ["domain"],
        {"n_recrawled": (None, "count"), "n_changed": ("changed", "sum")},
        prepare=domain_rows,
    ).to_pandas()
    out = out.astype({"n_recrawled": "int64", "n_changed": "int64"})
    out["change_rate"] = out["n_changed"] / out["n_recrawled"]
    return out.sort_values("domain").reset_index(drop=True)


#: mirror from first principles: a url is re-crawled iff its doc residue is
#: one of the two recrawl fixtures; its content changed iff it is the
#: suffix-appending residue AND the payload class is html (non-html pages
#: extract to the empty string in every snapshot).
_SNAPSHOT_CHANGE_SQL = f"""
SELECT 'site' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example' AS domain,
       COUNT(*) AS n_recrawled,
       CAST(SUM(CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
                      AND doc_id % 20 NOT IN (0, 1, 2, 3)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       SUM(CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
                 AND doc_id % 20 NOT IN (0, 1, 2, 3)
                THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS change_rate
FROM documents
WHERE doc_id % {RECRAWL_EVERY} IN ({RECRAWL_RESIDUE}, {RECRAWL_SAME_RESIDUE})
GROUP BY 1 ORDER BY 1
"""


#: deterministic denylist fixture: every host id with this residue mod 10
BLOCK_RESIDUE = 3


def blocked_domain_pages(sf_dir: str) -> pd.DataFrame:
    """URL blocklist filtering (the C4/RefinedWeb domain-denylist step),
    applied AT THE READ — blocked urls are dropped before any payload
    reaches an engine, which at 100 TB is the cheapest work you never do.
    The denylist broadcasts once (``ray.put``; a real multi-million-domain
    list is tens of MB — same topology); membership is a worker-local set
    probe on the regex-extracted host. Only the ``url`` column is read for
    this per-domain survivor count; in the full pipeline the identical
    filter runs inline ahead of the extraction actor pool."""
    import ray

    blocked = frozenset(
        f"site{h}.example" for h in range(N_HOSTS) if h % 10 == BLOCK_RESIDUE
    )
    ref = ray.put(blocked)

    pages_dir = synth_pages_parquet(sf_dir)
    urls = rd.read_parquet(pages_dir, columns=["url"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        deny = ray.get(ref)
        host = df["url"].str.extract(r"^https?://([^/]+)", expand=False)
        return pd.DataFrame({"domain": host[~host.isin(deny)]})

    out = grouped_aggregate(
        urls, ["domain"], {"n_pages": (None, "count")}, prepare=prepare
    ).to_pandas()
    out["n_pages"] = out["n_pages"].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


_BLOCKED_DOMAIN_PAGES_SQL = f"""
SELECT 'site' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example' AS domain,
       COUNT(*) AS n_pages
FROM documents
WHERE (doc_id % {N_HOSTS}) % 10 != {BLOCK_RESIDUE}
GROUP BY 1 ORDER BY 1
"""


def canonical_url_dedup(sf_dir: str) -> pd.DataFrame:
    """URL canonicalization + dedup — the crawl-frontier normalization step
    (r4): the same page arrives under uppercase hosts, tracking parameters,
    explicit default ports and fragments; canonicalizing BEFORE the url
    dedup collapses those variants so a page is fetched/extracted once.

    Rules (the standard RFC-3986-flavored subset): lowercase scheme+host,
    strip default :443/:80 ports, drop ``utm_*``/``ref`` tracking params
    (other query params SURVIVE), drop fragments. All vectorized pandas
    regex passes — DuckDB mirrors each pass with the same patterns, so the
    canonical forms are string-identical both sides.

    Messy variants are synthesized deterministically per doc (doc_id % 5
    picks the corruption; doc_id % 7 == 0 adds a LEGITIMATE ``page=2``
    param that must survive), so the fixture exercises every rule and the
    collapse is exactly checkable: variants of a doc group to one canonical
    url with keeper = min doc_id. Only slim url rows shuffle (partial+final
    aggregate) — payloads never move."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        base_host = pd.Series([f"site{x % N_HOSTS}.example" for x in d])
        path = pd.Series([f"/doc/{x % 500}" for x in d])
        q = pd.Series(["?page=2" if x % 7 == 0 else "" for x in d])
        variant = d % 5
        url = pd.Series([""] * len(d))
        for v, fmt in (
            (0, lambda h, p, qq: f"https://{h}{p}{qq}"),
            (1, lambda h, p, qq: f"HTTPS://{h.upper()}{p}{qq}"),
            (2, lambda h, p, qq: (
                f"https://{h}{p}{qq}&utm_source=crawler&utm_medium=bot"
                if qq else f"https://{h}{p}?utm_source=crawler&utm_medium=bot"
            )),
            (3, lambda h, p, qq: f"https://{h}:443{p}{qq}"),
            (4, lambda h, p, qq: f"https://{h}{p}{qq}#section-2"),
        ):
            m = variant == v
            url[m] = [
                fmt(h, p_, qq)
                for h, p_, qq in zip(base_host[m], path[m], q[m])
            ]
        return pd.DataFrame({"doc_id": d, "url": url})

    def canonicalize(s: pd.Series) -> pd.Series:
        parts = s.str.extract(r"^(?P<scheme>[A-Za-z]+)://(?P<host>[^/?#]+)(?P<rest>.*)$")
        host = parts["host"].str.lower().str.replace(
            r":(443|80)$", "", regex=True
        )
        rest = parts["rest"].str.replace(r"#.*$", "", regex=True)
        rest = rest.str.replace(r"&(utm_[a-z]+|ref)=[^&#]*", "", regex=True)
        rest = rest.str.replace(r"\?(utm_[a-z]+|ref)=[^&#]*&", "?", regex=True)
        rest = rest.str.replace(r"\?(utm_[a-z]+|ref)=[^&#]*$", "", regex=True)
        return parts["scheme"].str.lower() + "://" + host + rest

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"canonical_url": canonicalize(df["url"]), "doc_id": df["doc_id"]}
        )

    out = grouped_aggregate(
        docs.map_batches(messy, batch_format="pandas"),
        ["canonical_url"],
        {"n_variants": (None, "count"), "keeper_doc_id": ("doc_id", "min")},
        prepare=prepare,
    ).to_pandas()
    out = out.astype({"n_variants": "int64", "keeper_doc_id": "int64"})
    return out.sort_values("canonical_url").reset_index(drop=True)


def _canonical_url_dedup_sql() -> str:
    return f"""
WITH messy AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'https://site' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                  || '.example/doc/' || CAST(doc_id % 500 AS VARCHAR)
                  || CASE WHEN doc_id % 7 = 0 THEN '?page=2' ELSE '' END
      WHEN 1 THEN 'HTTPS://SITE' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                  || '.EXAMPLE/doc/' || CAST(doc_id % 500 AS VARCHAR)
                  || CASE WHEN doc_id % 7 = 0 THEN '?page=2' ELSE '' END
      WHEN 2 THEN 'https://site' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                  || '.example/doc/' || CAST(doc_id % 500 AS VARCHAR)
                  || CASE WHEN doc_id % 7 = 0
                     THEN '?page=2&utm_source=crawler&utm_medium=bot'
                     ELSE '?utm_source=crawler&utm_medium=bot' END
      WHEN 3 THEN 'https://site' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                  || '.example:443/doc/' || CAST(doc_id % 500 AS VARCHAR)
                  || CASE WHEN doc_id % 7 = 0 THEN '?page=2' ELSE '' END
      ELSE 'https://site' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
                  || '.example/doc/' || CAST(doc_id % 500 AS VARCHAR)
                  || CASE WHEN doc_id % 7 = 0 THEN '?page=2' ELSE '' END
                  || '#section-2'
    END AS url
  FROM documents
), split AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                        ':(443|80)$', '') AS host,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+(.*)$', 1) AS rest
  FROM messy
), canon AS (
  SELECT doc_id,
         scheme || '://' || host ||
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(rest, '#.*$', ''),
               '&(utm_[a-z]+|ref)=[^&#]*', '', 'g'),
             '\\?(utm_[a-z]+|ref)=[^&#]*&', '?'),
           '\\?(utm_[a-z]+|ref)=[^&#]*$', '') AS canonical_url
  FROM split
)
SELECT canonical_url, COUNT(*) AS n_variants, MIN(doc_id) AS keeper_doc_id
FROM canon GROUP BY 1 ORDER BY 1
"""


#: minimum whitespace tokens for the refreshed-corpus quality gate
REFRESH_MIN_TOKENS = 15


def refreshed_corpus(sf_dir: str) -> rd.Dataset:
    """WEB-REFRESH FLAGSHIP — the end-to-end ingestion a crawl refresh runs,
    composing this repo's web-side operators in their scale order:

      1. domain BLOCKLIST at the read (worker-local host probe — blocked
         payloads never reach an engine),
      2. LATEST-SNAPSHOT dedup over the multi-snapshot pages table (slim
         (url → max warc_ts) pass, payloads never shuffle),
      3. main-content EXTRACTION (actor-pool engines, byte-exact text),
      4. a QUALITY GATE (≥ REFRESH_MIN_TOKENS whitespace tokens) on the
         extracted html text.

    All per-row filters run before or inside the one extraction pass; the
    only aggregate is the slim max-ts table. Mirrored end-to-end by a
    single SQL CTE. Returns a streaming Dataset of (url, text)."""
    import ray

    blocked = frozenset(
        f"site{h}.example" for h in range(N_HOSTS) if h % 10 == BLOCK_RESIDUE
    )
    deny_ref = ray.put(blocked)

    pages_dir = synth_pages_parquet(sf_dir, recrawl_every=RECRAWL_EVERY)
    pages = read_pages(pages_dir)

    def drop_blocked(df: pd.DataFrame) -> pd.DataFrame:
        deny = ray.get(deny_ref)
        host = df["url"].str.extract(r"^https?://([^/]+)", expand=False)
        return df[~host.isin(deny)]

    pages = pages.map_batches(drop_blocked, batch_format="pandas")

    maxts = grouped_aggregate(
        pages.select_columns(["url", "warc_ts"]),
        ["url"],
        {"max_ts": ("warc_ts", "max")},
    ).materialize()
    mdf = maxts.to_pandas()  # slim; the join path of latest_page_text at scale
    ts_ref = ray.put(dict(zip(mdf["url"], mdf["max_ts"])))

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ts_ref)
        return df[df["warc_ts"] == df["url"].map(m)]

    ds = extraction_pipeline(pages.map_batches(keep_latest, batch_format="pandas"))

    def quality_gate(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["content_type"], "html"))
        n_tokens = pa.compute.add(
            pa.compute.count_substring(t["text"], " "), 1
        )
        return t.filter(
            pa.compute.greater_equal(n_tokens, REFRESH_MIN_TOKENS)
        ).select(["url", "text"])

    return ds.map_batches(quality_gate, batch_format="pyarrow")


_REFRESHED_CORPUS_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
            THEN text || '{RECRAWL_SUFFIX}'
            ELSE text END AS text
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
  AND (doc_id % {N_HOSTS}) % 10 != {BLOCK_RESIDUE}
  AND len(string_split(CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
                            THEN text || '{RECRAWL_SUFFIX}'
                            ELSE text END, ' ')) >= {REFRESH_MIN_TOKENS}
"""


def exploded_pdf_text(sf_dir: str) -> rd.Dataset:
    """Heavy-doc path: explode pdf docs to page rows, extract pages in
    parallel, re-combine per url ordered by page_num (byte-exact separators,
    deepseek_engine.py:336-358 semantics)."""
    import pyarrow.compute as pc

    from ..stages.combine import exploded_extraction

    pages_dir = synth_pages_parquet(sf_dir)
    pages = read_pages(pages_dir)

    def pdf_only(t):
        import pyarrow as pa

        mask = [bool(p and p.startswith(b"%PDF")) for p in t["html"].to_pylist()]
        return t.filter(pa.array(mask)).select(["url", "html"])

    docs = pages.map_batches(pdf_only, batch_format="pyarrow")
    out = exploded_extraction(docs)
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("page_count"),
            "page_count",
            pc.cast(t["page_count"], "int64"),
        ),
        batch_format="pyarrow",
    )


# page markdown / separators reconstructed in SQL (chr(10) = newline):
#   md(i) = '# Page i\n\nExtracted from <url> (application/pdf, <size> bytes), page i.'
#   combined = md(1) || ('\n\n---\n\n<!-- Page i -->\n\n' || md(i) for i in 2..p)
_EXPLODED_PDF_TEXT_SQL = f"""
WITH pdfs AS (
  SELECT {_URL_SQL} AS url,
         9 + n_chars * 50 AS size_bytes,
         GREATEST(1, LEAST(100, (9 + n_chars * 50) // 51200)) AS page_count
  FROM documents
  WHERE doc_id % 20 IN (0, 1)
)
SELECT url,
  array_to_string(
    list_transform(range(1, CAST(page_count AS INTEGER) + 1), i ->
      CASE WHEN i = 1 THEN '' ELSE
        chr(10) || chr(10) || '---' || chr(10) || chr(10) ||
        '<!-- Page ' || i || ' -->' || chr(10) || chr(10)
      END ||
      '# Page ' || i || chr(10) || chr(10) ||
      'Extracted from ' || url || ' (application/pdf, ' || size_bytes ||
      ' bytes), page ' || i || '.'
    ), '') AS text,
  page_count
FROM pdfs
"""


def image_meta(sf_dir: str) -> rd.Dataset:
    """Multimodal plumbing: route image payloads to the image-decode stub
    actor stage (typed metadata out of a binary column). The decode itself is
    a deterministic fake (no PIL in this environment — see ImageDecodeEngine);
    schema, batching, actor wiring and output layout are real."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pages_dir = synth_pages_parquet(sf_dir)
    ds = extraction_pipeline(
        read_pages(pages_dir),
        route={"html": "html-main-content", "pdf": "mock", "png": "image-decode-stub"},
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["content_type"], "png"))
        meta = t["metadata"].combine_chunks()
        return pa.table(
            {
                "url": t["url"],
                "size_bytes": pc.cast(meta.field("size_bytes"), pa.int64()),
                "width": pc.cast(meta.field("width"), pa.int64()),
                "height": pc.cast(meta.field("height"), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_IMAGE_META_SQL = f"""
SELECT {_URL_SQL} AS url,
       8 + n_chars AS size_bytes,
       64 + ((8 + n_chars) % 1024) AS width,
       64 + (((8 + n_chars) // 2) % 1024) AS height
FROM documents
WHERE doc_id % 20 = 2
"""


def split_pdf_text(sf_dir: str) -> rd.Dataset:
    """The integrated skew router (split_extraction_pipeline): light PDFs run
    per-document in the actor pool, heavy ones explode/recombine; output is
    byte-identical either way so the SQL truth is one expression."""
    import pyarrow.compute as pc

    from .extract import split_extraction_pipeline

    pages_dir = synth_pages_parquet(sf_dir)
    ds = split_extraction_pipeline(read_pages(pages_dir))

    def fn(t):
        import pyarrow as pa

        t = t.filter(pc.equal(t["content_type"], "pdf"))
        return pa.table(
            {
                "url": t["url"],
                "text": t["text"],
                "page_count": pc.cast(t["page_count"], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-domain rollup over extracted pages — the Common-Crawl-shaped
    aggregation (domains are the natural partition/skew unit at 100 TB):
    page count, failed count, and total extracted HTML characters. Domain
    extraction is a vectorized Arrow regex over the url column; the rollup
    is the partial+final grouped aggregate (one partial per domain per
    batch crosses the shuffle)."""
    ds = _extracted(sf_dir)

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        urls = pa.array(df["url"], pa.string())
        # extract_regex yields null on no-match (replace_substring_regex
        # would silently pass the whole URL through as the "domain");
        # non-URL rows are grouped under an explicit sentinel instead
        hosts = pc.struct_field(
            pc.extract_regex(urls, pattern=r"^[a-z][a-z0-9+.-]*://(?P<h>[^/]+)"), "h"
        )
        domain = pc.fill_null(hosts, "(invalid-url)")
        text = pa.array(df["text"], pa.string())
        is_html = (df["content_type"] == "html").to_numpy()
        chars = pc.utf8_length(text).fill_null(0).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "domain": domain.to_pandas(),
                "failed": (df["status"] == "failed").astype("int64"),
                "html_chars": np.where(is_html, chars, 0).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        ds,
        ["domain"],
        {
            "n_pages": (None, "count"),
            "n_failed": ("failed", "sum"),
            "html_chars": ("html_chars", "sum"),
        },
        prepare=prepare,
    ).to_pandas()
    return agg.astype(
        {"n_pages": "int64", "n_failed": "int64", "html_chars": "int64"}
    )


_DOMAIN_STATS_SQL = """
SELECT 'site' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS domain,
       COUNT(*) AS n_pages,
       COUNT(*) FILTER (WHERE doc_id % 20 = 3) AS n_failed,
       CAST(COALESCE(SUM(length(text))
                     FILTER (WHERE doc_id % 20 NOT IN (0,1,2,3)), 0)
            AS BIGINT) AS html_chars
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Link-graph construction (href extraction from raw crawl HTML)
# --------------------------------------------------------------------------

class _SpanAuditStage:
    """Actor-pool stage (extractor compiled once per actor): per HTML page,
    re-extract and verify that every emitted span's RAW slice of the input
    reproduces its paragraph after the same normalization the extractor
    applies (tag strip → entity unescape → whitespace collapse). Emits
    per-batch partial counts only."""

    def __init__(self) -> None:
        import html as html_mod
        import re

        from ..stages.html_extractor import HtmlMainContentExtractor

        self.ext = HtmlMainContentExtractor()
        self.unescape = html_mod.unescape
        self.tag_re = re.compile(r"<[^>]*>")

    def _span_ok(self, html_str: str, span: dict, para: str) -> bool:
        raw = html_str[span["start"] : span["end"]]
        rebuilt = " ".join(self.unescape(self.tag_re.sub(" ", raw)).split())
        return rebuilt == para

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_html = n_pages_ok = n_spans = n_spans_ok = 0
        for payload in df["html"]:
            b = bytes(payload)
            if not b.startswith(b"<!doctype html>"):
                continue
            n_html += 1
            html_str = b.decode("utf-8", "ignore")
            text, spans = self.ext.extract(html_str)
            paras = text.split("\n\n") if text else []
            page_ok = len(paras) == len(spans)
            for span, para in zip(spans, paras):
                n_spans += 1
                if self._span_ok(html_str, span, para):
                    n_spans_ok += 1
                else:
                    page_ok = False
            n_pages_ok += int(page_ok)
        return pd.DataFrame(
            {
                "n_html_pages": [n_html],
                "n_pages_ok": [n_pages_ok],
                "n_spans": [n_spans],
                "n_spans_ok": [n_spans_ok],
            }
        )


def span_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide audit of the north-rule span invariant: every extracted
    paragraph's (start, end) offsets must slice the RAW page bytes back to
    that paragraph (modulo the extractor's own normalization). One
    streaming pass emitting four counters per batch, summed in a bounded
    final reduce — the kind of continuous integrity monitor a 100 TB run
    keeps beside its throughput counters."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["html"])
    parts = pages.map_batches(
        _SpanAuditStage, batch_format="pandas", concurrency=2
    ).to_pandas()
    out = parts.sum().to_frame().T.astype("int64")
    return out.reset_index(drop=True)


_SPAN_INTEGRITY_AUDIT_SQL = """
SELECT COUNT(*) AS n_html_pages,
       COUNT(*) AS n_pages_ok,
       COUNT(*) AS n_spans,
       COUNT(*) AS n_spans_ok
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
"""


def page_link_graph(sf_dir: str) -> pd.DataFrame:
    """Crawl link-graph edges: parse every HTML payload's ``href``s out of
    the raw bytes and count (source domain, link target) edges — the
    first step of any web-graph / PageRank-over-crawl pipeline.

    The extraction is REAL (regex over the decoded payload, exploded per
    match, one vectorized pass — not derived from metadata); the oracle
    can still mirror it because the synthesized boilerplate carries a fixed
    link set per HTML page, so a wrong parser (missed nav, double-counted
    footer) breaks the count exactly. Topology: map_batches explode →
    partial+final grouped count; the shuffle carries (domain, href)
    partials, never pages."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        html = df["html"].map(
            lambda b: b.decode("utf-8", "ignore") if isinstance(b, bytes) else ""
        )
        is_html = html.str.startswith("<!doctype html>")
        src = df.loc[is_html, "url"].str.extract(r"^https://([^/]+)/", expand=False)
        hrefs = html[is_html].str.findall(r'href="([^"]+)"')
        out = pd.DataFrame({"domain": src, "href": hrefs}).explode("href")
        return out.dropna()

    agg = grouped_aggregate(pages, ["domain", "href"], {"n": (None, "count")},
                            prepare=edges).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values(["domain", "href"]).reset_index(drop=True)


_PAGE_LINK_GRAPH_SQL = """
SELECT 'site' || CAST(doc_id % 97 AS VARCHAR) || '.example' AS domain,
       u.href, COUNT(*) AS n
FROM documents,
     unnest(['/', '/news', '/about', '/login', '/rel/1', '/rel/2', '/rel/3',
             '/terms', '/privacy']) AS u(href)
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# URL canonicalization (crawl-frontier normalization)
# --------------------------------------------------------------------------

def normalize_urls(u: pd.Series) -> pd.Series:
    """The canonicalization chain itself — a fixed sequence of
    engine-agnostic regex rewrites (idempotent: re-normalizing a canonical
    URL is a no-op, asserted in tests)."""
    u = u.str.replace(r"#.*$", "", regex=True)  # fragment
    # schemeless rows get an empty prefix and pass through case-untouched
    prefix = u.str.extract(r"^([A-Za-z]+://[^/?#]*)", expand=False).fillna("")
    # lowercase scheme+host only (path/query are case-sensitive)
    rest = pd.Series(
        [s[len(p):] for s, p in zip(u, prefix)], dtype="object", index=u.index
    )
    u = prefix.str.lower() + rest
    # strip ALL leading www. labels in one pass — one-at-a-time stripping is
    # not idempotent on hosts like www.www.com
    u = u.str.replace(r"^https://(www\.)+", "https://", regex=True)
    u = u.str.replace(r"([?&])utm_[a-z_]+=[^&]*", r"\1", regex=True)
    u = u.str.replace(r"&&+", "&", regex=True)
    u = u.str.replace(r"\?&", "?", regex=True)
    u = u.str.replace(r"/+\?", "?", regex=True)
    u = u.str.replace(r"[?&]+$", "", regex=True)
    u = u.str.replace(r"/+$", "", regex=True)
    return u


def parse_robots(raw: bytes) -> list[tuple[bool, str]]:
    """``robots.txt`` → ordered (is_allow, path_pattern) rules for the ``*``
    user-agent, per RFC 9309: agent lines open a group, rule lines close
    it; only groups naming ``*`` apply here. Path patterns may contain the
    RFC 9309 §2.2.3 special characters ``*`` (any octet sequence) and a
    trailing ``$`` (end-of-path anchor); plain prefixes are the common
    special case."""
    rules: list[tuple[bool, str]] = []
    applies = False
    in_agents = False
    for line in raw.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_agents:  # a new group starts: reset applicability
                applies = value == "*"
                in_agents = True
            else:
                applies = applies or value == "*"
        elif field == "sitemap":
            # Sitemap is a non-group directive (RFC 9309 §2.3 "other
            # records") — it neither opens nor closes an agent group
            continue
        else:
            in_agents = False
            # an EMPTY Disallow means "allow all" (RFC 9309) — drop it
            # rather than treating it as a match-everything prefix
            if applies and field in ("allow", "disallow") and value:
                rules.append((field == "allow", value))
    return rules


def _robots_pattern(pattern: str) -> "re.Pattern[str]":
    """Compiled matcher for one RFC 9309 path pattern: ``*`` spans any
    octets, a TRAILING ``$`` anchors the end (an interior ``$`` is literal,
    per the RFC's grammar); everything else matches literally. Anchored at
    the path start like the plain-prefix rule it generalizes."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def robots_sitemaps(raw: bytes) -> list[str]:
    """Absolute sitemap URLs declared by ``Sitemap:`` lines anywhere in a
    robots.txt (group-independent per RFC 9309 §2.3) — the discovery hook
    a crawler feeds into the sitemap audit."""
    out: list[str] = []
    for line in raw.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value:
                out.append(value)
    return out


def parse_crawl_delay(raw: bytes) -> int | None:
    """``Crawl-delay`` (seconds) for the ``*`` user-agent — the de-facto
    politeness directive (not in RFC 9309 but honored by most crawlers).
    Same group semantics as ``parse_robots``; non-numeric values ignored."""
    delay: int | None = None
    applies = False
    in_agents = False
    for line in raw.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_agents:
                applies = value == "*"
            elif value == "*":
                applies = True
            in_agents = True
            continue
        in_agents = False
        if field == "crawl-delay" and applies and delay is None:
            try:
                delay = int(float(value))
            except ValueError:
                pass
    return delay


def crawl_delay_schedule(sf_dir: str) -> pd.DataFrame:
    """Politeness budget per host: parse each domain's Crawl-delay with the
    real robots parser (even-K domains declare ``1 + K%9`` seconds; odd-K
    domains none → the crawler default of 1 s), derive the hourly fetch
    budget and the hours to drain that host's page backlog. The rules
    table is |domains|-bounded; page counts come from one slim grouped
    count — the frontier itself never moves."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    counts = grouped_aggregate(
        docs.map_batches(
            lambda df: pd.DataFrame(
                {"k": (df["doc_id"].to_numpy() % 97).astype("int64")}
            ),
            batch_format="pandas",
        ),
        ["k"],
        {"n_pages": (None, "count")},
    ).to_pandas()

    def robots_txt(k: int) -> bytes:
        lines = ["User-agent: googlebot", "Crawl-delay: 30",
                 "", "User-agent: *", "Disallow: /login"]
        if k % 2 == 0:
            lines.append(f"Crawl-delay: {1 + k % 9}")
        return "\n".join(lines).encode()

    out = counts.copy()
    delays = [
        parse_crawl_delay(robots_txt(int(k))) or 1 for k in out["k"]
    ]
    out["domain"] = [f"site{int(k)}.example" for k in out["k"]]
    out["crawl_delay_s"] = pd.Series(delays, dtype="int64")
    out["fetches_per_hour"] = (3600 // out["crawl_delay_s"]).astype("int64")
    out["n_pages"] = out["n_pages"].astype("int64")
    out["drain_minutes"] = (
        (out["n_pages"] * out["crawl_delay_s"] + 59) // 60
    ).astype("int64")
    return (
        out[["domain", "crawl_delay_s", "fetches_per_hour", "n_pages",
             "drain_minutes"]]
        .sort_values("domain")
        .reset_index(drop=True)
    )


_CRAWL_DELAY_SCHEDULE_SQL = """
WITH per AS (
  SELECT doc_id % 97 AS k, COUNT(*) AS n_pages FROM documents GROUP BY 1
)
SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS domain,
       CASE WHEN k % 2 = 0 THEN 1 + k % 9 ELSE 1 END AS crawl_delay_s,
       3600 // (CASE WHEN k % 2 = 0 THEN 1 + k % 9 ELSE 1 END)
         AS fetches_per_hour,
       n_pages,
       (n_pages * (CASE WHEN k % 2 = 0 THEN 1 + k % 9 ELSE 1 END) + 59) // 60
         AS drain_minutes
FROM per
"""


def robots_allows(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309 precedence: the most specific matching rule wins, measured
    by pattern OCTET COUNT (§2.2.2 — for plain prefixes that is prefix
    length; wildcard patterns count their raw octets); on a tie Allow wins.
    No matching rule means allowed."""
    verdict, best_len = True, -1
    for allow, pattern in rules:
        if "*" in pattern or pattern.endswith("$"):
            hit = _robots_pattern(pattern).match(path) is not None
        else:
            hit = path.startswith(pattern)
        if hit:
            n = len(pattern)
            if n > best_len or (n == best_len and allow):
                verdict, best_len = allow, n
    return verdict


def robots_allowed_links(sf_dir: str) -> pd.DataFrame:
    """Crawl-policy filtering — the robots.txt compliance pass every
    polite crawler runs on its frontier: parse each domain's (synthesized,
    deterministic) robots.txt BYTES with a real RFC 9309 parser, then
    judge every distinct out-link of the crawl by longest-prefix-match
    precedence.

    Per-domain policy (pure functions of the domain index K, so the oracle
    mirrors the whole table): ``/login`` is always disallowed; domains with
    K%3==0 disallow ``/rel/`` but re-Allow ``/rel/2`` (exercising the
    Allow-beats-shorter-Disallow rule); domains with K%5==0 also disallow
    ``/news``. Scale shape: links collapse to the distinct (domain, href)
    table via the same partial+final count as page_link_graph; the rules
    table is |domains|-bounded and broadcast into the verdict stage."""
    edges = page_link_graph(sf_dir)[["domain", "href"]]

    def robots_txt(k: int) -> bytes:
        lines = ["User-agent: googlebot", "Disallow: /private",
                 "", "User-agent: *", "Disallow: /login"]
        if k % 3 == 0:
            lines += ["Disallow: /rel/", "Allow: /rel/2"]
        if k % 5 == 0:
            lines += ["Disallow: /news"]
        return "\n".join(lines).encode()

    rules = {
        d: parse_robots(robots_txt(int(d.removeprefix("site").split(".")[0])))
        for d in edges["domain"].unique()
    }
    edges = edges.copy()
    edges["allowed"] = [
        robots_allows(rules[d], h) for d, h in zip(edges["domain"], edges["href"])
    ]
    return edges.sort_values(["domain", "href"]).reset_index(drop=True)


def robots_wildcard_audit(sf_dir: str) -> pd.DataFrame:
    """RFC 9309 §2.2.3 wildcard-pattern compliance: judge a deterministic
    frontier against robots.txt rules that exercise ``*`` spans, trailing
    ``$`` anchors, and octet-count precedence — the cases real-world
    robots.txt files use constantly (``Disallow: /*.zip$``) and a
    prefix-only matcher silently gets wrong.

    Per-domain policy: ``Disallow: /dl/*.zip$`` (anchored — ``.zip.html``
    stays allowed), ``Disallow: /tmp*`` with ``Allow: /tmp/keep`` (longer
    octet count wins), and odd domains add ``Disallow: /*?session=``.
    Robots bytes PARSE distributed (map_batches over the per-domain payload
    table); the |domains|-bounded rule set broadcasts into the vectorized
    verdict pass over the frontier. The oracle mirrors each verdict with
    LIKE arithmetic over the same deterministic paths."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ks = sorted(
        grouped_aggregate(
            docs.map_batches(
                lambda df: pd.DataFrame({"k": df["doc_id"].to_numpy() % 97}),
                batch_format="pandas",
            ),
            ["k"],
            {"n": (None, "count")},
        ).to_pandas()["k"].astype(int)
    )

    def robots_txt(k: int) -> bytes:
        lines = [
            "User-agent: *",
            "Disallow: /dl/*.zip$",
            "Disallow: /tmp*",
            "Allow: /tmp/keep",
        ]
        if k % 2 == 1:
            lines.append("Disallow: /*?session=")
        return "\n".join(lines).encode()

    payloads = rd.from_items(
        [{"k": int(k), "payload": robots_txt(int(k))} for k in ks]
    )

    def parse_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["k"].astype("int64"),
                "rules": [parse_robots(bytes(p)) for p in df["payload"]],
            }
        )

    rules = {
        int(r["k"]): r["rules"]
        for _, r in payloads.map_batches(parse_batch, batch_format="pandas")
        .to_pandas()
        .iterrows()
    }
    rules_ref = ray.put(rules)

    def paths_for(df: pd.DataFrame) -> pd.DataFrame:
        rb = ray.get(rules_ref)
        rows = []
        for x in df["k"]:
            k = int(x)
            for path in (
                f"/dl/report{k}.zip",
                f"/dl/report{k}.zip.html",
                f"/tmp/cache{k}",
                f"/tmp/keep/{k}",
                f"/page{k}?session=abc",
                f"/page{k}",
            ):
                rows.append(
                    {
                        "domain": f"site{k}.example",
                        "path": path,
                        "allowed": int(robots_allows(rb[k], path)),
                    }
                )
        return pd.DataFrame(rows, columns=["domain", "path", "allowed"]).astype(
            {"allowed": "int64"}
        )

    out = (
        rd.from_items([{"k": int(k)} for k in ks])
        .map_batches(paths_for, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["domain", "path"]).reset_index(drop=True)


_ROBOTS_WILDCARD_AUDIT_SQL = """
WITH k AS (SELECT DISTINCT doc_id % 97 AS k FROM documents),
p AS (
  SELECT k, path FROM k, LATERAL (
    SELECT unnest([
      '/dl/report' || k || '.zip',
      '/dl/report' || k || '.zip.html',
      '/tmp/cache' || k,
      '/tmp/keep/' || k,
      '/page' || k || '?session=abc',
      '/page' || k
    ]) AS path
  )
)
SELECT 'site' || k || '.example' AS domain, path,
       CAST(CASE
         WHEN path LIKE '/dl/%.zip' THEN 0
         WHEN path LIKE '/tmp/keep%' THEN 1
         WHEN path LIKE '/tmp%' THEN 0
         WHEN k % 2 = 1 AND path LIKE '%?session=%' THEN 0
         ELSE 1
       END AS BIGINT) AS allowed
FROM p ORDER BY domain, path
"""


def anchor_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """The per-batch extraction behind ``anchor_text_index`` (module-level
    so unit tests exercise THIS code, not a copy): paired href+anchor
    capture, then URL resolution — site-relative ``/p`` against the page
    origin (http or https), protocol-relative ``//host/p`` against the
    page scheme, absolute hrefs pass through. Rows whose origin cannot be
    parsed are dropped rather than emitting NaN targets."""
    html = df["html"].map(
        lambda b: b.decode("utf-8", "ignore") if isinstance(b, bytes) else ""
    )
    is_html = html.str.startswith("<!doctype html>")
    url = df.loc[is_html, "url"]
    origin = url.str.extract(r"^(https?://[^/]+)", expand=False)
    scheme = url.str.extract(r"^(https?):", expand=False)
    found = html[is_html].str.findall(r'<a href="([^"]+)">([^<]*)</a>')
    out = pd.DataFrame(
        {"origin": origin, "scheme": scheme, "pair": found}
    ).explode("pair")
    out = out.dropna()
    href = out["pair"].str[0]
    proto_rel = href.str.startswith("//")
    target = np.where(
        proto_rel,
        out["scheme"] + ":" + href,
        np.where(href.str.startswith("/"), out["origin"] + href, href),
    )
    return pd.DataFrame({"target": target, "anchor": out["pair"].str[1]})


def anchor_text_index(sf_dir: str) -> pd.DataFrame:
    """Incoming-anchor-text index — the classic web-graph enrichment used
    to build retrieval/query training pairs (anchor text ≈ a human-written
    query for the target page): extract every ``<a href>…</a>`` PAIR from
    the raw HTML bytes with a paired-capture regex, resolve site-relative
    hrefs against the page origin to an ABSOLUTE target URL, and count
    (target, anchor) occurrences across the corpus.

    Differs from ``page_link_graph`` (href-only edge counts) in both
    halves real pipelines need: the anchor TEXT travels with the edge, and
    targets are canonical absolute URLs ready for a URL-keyed join against
    the crawl. The synthesized boilerplate pins each href to a fixed
    anchor string, so a wrong parser (split pair, nested-tag grab, missed
    resolution) breaks the SQL mirror exactly. Scale shape: map_batches
    explode → partial+final grouped count; the shuffle carries (target,
    anchor) partials, never pages."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])
    agg = grouped_aggregate(
        pages, ["target", "anchor"], {"n_links": (None, "count")},
        prepare=anchor_pairs,
    ).to_pandas()
    agg["n_links"] = agg["n_links"].astype("int64")
    return agg.sort_values(["target", "anchor"]).reset_index(drop=True)


_ANCHOR_TEXT_INDEX_SQL = """
SELECT 'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example'
         || l.href AS target,
       l.anchor,
       COUNT(*) AS n_links
FROM documents
CROSS JOIN (VALUES ('/', 'home'), ('/news', 'latest news'),
                   ('/about', 'about us'), ('/login', 'sign in'),
                   ('/rel/1', 'related article one'),
                   ('/rel/2', 'related article two'),
                   ('/rel/3', 'trending story three'),
                   ('/terms', 'terms'), ('/privacy', 'privacy'))
           AS l(href, anchor)
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
GROUP BY 1, 2
"""


_ROBOTS_ALLOWED_LINKS_SQL = """
WITH doms AS (SELECT DISTINCT doc_id % 97 AS k FROM documents
              WHERE doc_id % 20 NOT IN (0, 1, 2, 3)),
paths(href) AS (VALUES ('/'), ('/news'), ('/about'), ('/login'),
                        ('/rel/1'), ('/rel/2'), ('/rel/3'),
                        ('/terms'), ('/privacy'))
SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS domain,
       href,
       CASE
         WHEN href = '/login' THEN FALSE
         WHEN k % 3 = 0 AND href IN ('/rel/1', '/rel/3') THEN FALSE
         WHEN k % 5 = 0 AND href = '/news' THEN FALSE
         ELSE TRUE
       END AS allowed
FROM doms CROSS JOIN paths
"""


#: per-doc Cache-Control fixture (pure function of doc_id, like robots)
_CACHE_HEADERS = (
    "max-age=3600",
    "max-age=86400, public",
    "no-store",
    "no-cache, max-age=600",
    "public, max-age=300, must-revalidate",
    "",
)
_DEFAULT_TTL_S = 7 * 86400


def parse_cache_control(value: str, default_ttl: int = _DEFAULT_TTL_S) -> int:
    """Seconds until a fetched page should be re-fetched, per its
    Cache-Control header (RFC 9111 subset): ``no-store``/``no-cache``
    mean refetch immediately (0), ``max-age=N`` wins otherwise, and an
    absent/unparseable header takes the crawler's default TTL."""
    directives: dict[str, str] = {}
    for part in value.split(","):
        part = part.strip().lower()
        if not part:
            continue
        k, _, v = part.partition("=")
        directives[k.strip()] = v.strip().strip('"')
    if "no-store" in directives or "no-cache" in directives:
        return 0
    if "max-age" in directives:
        try:
            return max(0, int(directives["max-age"]))
        except ValueError:
            return default_ttl
    return default_ttl


def recrawl_schedule(sf_dir: str) -> rd.Dataset:
    """Fetch-scheduling pass — the politeness/freshness planner of a
    continuous crawler: parse each page's (synthesized, deterministic)
    Cache-Control header with a real RFC 9111 directive parser and emit
    when the URL is due for re-fetch (``warc_ts`` + TTL; no-store/no-cache
    mean immediately, absent means the crawler default). Scale shape:
    embarrassingly parallel vectorized map_batches over (url, warc_ts)
    only — payloads never read, the six header patterns parse once per
    batch and broadcast via take()."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "warc_ts"])
    ttls = np.array(
        [parse_cache_control(h) for h in _CACHE_HEADERS], dtype="int64"
    )
    headers = np.array(_CACHE_HEADERS, dtype=object)

    def sched(df: pd.DataFrame) -> pd.DataFrame:
        d = df["url"].str[-8:].astype("int64") % 6
        return pd.DataFrame(
            {
                "url": df["url"],
                "cache_control": headers.take(d),
                "next_fetch_ts": df["warc_ts"]
                + pd.to_timedelta(ttls.take(d), unit="s"),
            }
        )

    return pages.map_batches(sched, batch_format="pandas")


_RECRAWL_SCHEDULE_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE doc_id % 6
         WHEN 0 THEN 'max-age=3600'
         WHEN 1 THEN 'max-age=86400, public'
         WHEN 2 THEN 'no-store'
         WHEN 3 THEN 'no-cache, max-age=600'
         WHEN 4 THEN 'public, max-age=300, must-revalidate'
         ELSE ''
       END AS cache_control,
       TIMESTAMP '2024-01-01 00:00:00'
         + to_microseconds(doc_id * 1000000)
         + to_microseconds(CAST(CASE doc_id % 6
             WHEN 0 THEN 3600 WHEN 1 THEN 86400 WHEN 2 THEN 0
             WHEN 3 THEN 0 WHEN 4 THEN 300 ELSE {_DEFAULT_TTL_S}
           END AS BIGINT) * 1000000) AS next_fetch_ts
FROM documents
"""


# --------------------------------------------------------------------------
# Conditional-revalidation planning (ETag / Last-Modified)
# --------------------------------------------------------------------------

#: synthesized validator headers per residue — a real recrawl spends most
#: of its bandwidth on unchanged pages, so validators decide METHOD:
#: If-None-Match when an ETag exists (strongest), If-Modified-Since when
#: only Last-Modified does, unconditional refetch otherwise. Weak ETags
#: (W/"…") still allow conditional GET per RFC 9110 §13.1.2.
_VALIDATOR_HEADERS = (
    'etag: "v{d}-abc"',
    "last-modified: Mon, 01 Jan 2024 00:00:00 GMT",
    'etag: W/"weak-{d}"',
    "",
)


def parse_validators(raw: str) -> tuple[str | None, str | None]:
    """(etag, last_modified) from a response-header blob — header names
    case-insensitive, values trimmed, first occurrence wins."""
    etag = lastmod = None
    for line in raw.splitlines():
        name, _, value = line.partition(":")
        n = name.strip().lower()
        if n == "etag" and etag is None:
            etag = value.strip()
        elif n == "last-modified" and lastmod is None:
            lastmod = value.strip()
    return etag, lastmod


def etag_revalidation_plan(sf_dir: str) -> rd.Dataset:
    """Conditional-fetch planner: parse each capture's (synthesized,
    deterministic) validator headers and emit the cheapest correct
    recrawl method — ``if-none-match`` when an ETag exists (strong or
    weak; RFC 9110 allows weak validators for GET revalidation),
    ``if-modified-since`` when only Last-Modified does, ``refetch``
    otherwise. A planner that sends unconditional GETs for validated
    pages re-downloads the unchanged web every cycle. Vectorized-per-
    batch header parse over (url) only; no shuffle."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        d = df["url"].str[-8:].astype("int64")
        methods, validators = [], []
        for dd in d:
            raw = _VALIDATOR_HEADERS[int(dd) % 4].format(d=int(dd))
            etag, lastmod = parse_validators(raw)
            if etag is not None:
                methods.append("if-none-match")
                validators.append(etag)
            elif lastmod is not None:
                methods.append("if-modified-since")
                validators.append(lastmod)
            else:
                methods.append("refetch")
                validators.append("")
        return pd.DataFrame(
            {"url": df["url"], "method": methods, "validator": validators}
        )

    return pages.map_batches(plan, batch_format="pandas")


_ETAG_REVALIDATION_SQL = f"""
SELECT {_URL_SQL} AS url,
       CASE doc_id % 4
         WHEN 0 THEN 'if-none-match'
         WHEN 1 THEN 'if-modified-since'
         WHEN 2 THEN 'if-none-match'
         ELSE 'refetch' END AS method,
       CASE doc_id % 4
         WHEN 0 THEN '"v' || doc_id || '-abc"'
         WHEN 1 THEN 'Mon, 01 Jan 2024 00:00:00 GMT'
         WHEN 2 THEN 'W/"weak-' || doc_id || '"'
         ELSE '' END AS validator
FROM documents
"""


_SITEMAP_STRIDES = (0, 2, 7, 53, 200)


def _sitemap_locs(k: int) -> list[str]:
    return [
        f"https://site{k}.example/{k + 97 * j:08d}" for j in _SITEMAP_STRIDES
    ] + [f"https://site{k}.example/extra/{i}" for i in (1, 2)]


def _urlset(locs: list[str]) -> bytes:
    body = "".join(
        f"<url><loc>{u}</loc><lastmod>2024-01-15</lastmod></url>" for u in locs
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"{body}</urlset>"
    ).encode()


def sitemap_child_url(k: int, part: int) -> str:
    return f"https://site{k}.example/sitemap-{part}.xml"


def make_sitemap(k: int, part: int | None = None) -> bytes:
    """Deterministic sitemap for domain index ``k``: five doc URLs at
    growing strides — the later ones exist only at larger corpus scales,
    so matched counts vary by sf — plus two URLs the crawler never
    fetched. Every THIRD domain serves a ``<sitemapindex>`` of two child
    sitemaps splitting the same URL set (the real sitemap-of-sitemaps
    layout big sites use); ``part`` fetches a child. The flat and nested
    layouts list identical URLs, so the coverage oracle is layout-blind —
    exactly the property a correct index expansion must preserve."""
    locs = _sitemap_locs(k)
    if k % 3 != 0:
        return _urlset(locs)
    if part is None:  # the index document
        subs = "".join(
            f"<sitemap><loc>{sitemap_child_url(k, i)}</loc>"
            "<lastmod>2024-01-15</lastmod></sitemap>"
            for i in (0, 1)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{subs}</sitemapindex>"
        ).encode()
    return _urlset(locs[part::2])  # child part holds every other URL


def parse_sitemap(raw: bytes) -> list[str]:
    """``<loc>`` URLs of a sitemap.xml, via a real namespace-aware XML
    parse (not regex); malformed XML yields an empty list (one bad
    sitemap costs one domain, never the task)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return []
    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    urls = [
        el.text.strip()
        for el in root.iter(f"{ns}loc")
        if el.text and el.text.strip()
    ]
    if root.tag == f"{ns}sitemapindex":
        return []  # index <loc>s are CHILD SITEMAPS, not page urls
    return urls


def expand_sitemap(raw: bytes, fetch, max_depth: int = 3) -> list[str]:
    """Page URLs of a sitemap, transparently expanding ``<sitemapindex>``
    documents by fetching child sitemaps through ``fetch(url) -> bytes |
    None`` (recursion bounded; a missing/malformed child costs that child
    only). Flat urlsets pass straight through."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return []
    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    if root.tag != f"{ns}sitemapindex":
        return parse_sitemap(raw)
    if max_depth <= 0:
        return []
    out: list[str] = []
    for el in root.iter(f"{ns}loc"):
        if not (el.text and el.text.strip()):
            continue
        child = fetch(el.text.strip())
        if child is not None:
            out.extend(expand_sitemap(child, fetch, max_depth - 1))
    return out


def sitemap_coverage(sf_dir: str) -> pd.DataFrame:
    """Sitemap-vs-crawl audit — the coverage report a crawl operator runs
    per domain: parse each domain's (synthesized, deterministic)
    sitemap.xml with a real XML parser, then count how many listed URLs
    the crawl actually fetched. Scale shape: the sitemap URL set is tiny
    (domains × 7) and BROADCAST into a map_batches membership filter over
    the pages; matched (domain, url) partials dedupe at the driver
    bounded by the sitemap size, never the crawl size."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url"])

    listed: dict[str, str] = {}
    n_listed: dict[str, int] = {}
    def fetch(url: str) -> bytes | None:
        import re as _re

        m = _re.match(r"https://site(\d+)\.example/sitemap-(\d)\.xml$", url)
        return make_sitemap(int(m.group(1)), int(m.group(2))) if m else None

    for k in range(97):  # url_for() hashes doc_id % 97 — every index occurs
        urls = expand_sitemap(make_sitemap(k), fetch)
        dom = f"site{k}.example"
        n_listed[dom] = len(urls)
        for u in urls:
            listed[u] = dom
    listed_ref = ray.put(listed)

    def matched(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(listed_ref)
        hit = df["url"].map(lk)
        out = pd.DataFrame({"url": df["url"], "domain": hit}).dropna()
        # typed (possibly empty) frame — object-dtype empties trip Ray's
        # block size estimator
        return out.drop_duplicates("url").astype(
            {"url": "string", "domain": "string"}
        )

    hits = pages.map_batches(matched, batch_format="pandas").to_pandas()
    hits = hits.drop_duplicates("url")
    counts = hits.groupby("domain").size()
    return pd.DataFrame(
        {
            "domain": sorted(n_listed),
            "n_sitemap_urls": [n_listed[d] for d in sorted(n_listed)],
            "n_matched": [int(counts.get(d, 0)) for d in sorted(n_listed)],
        }
    ).astype({"n_sitemap_urls": "int64", "n_matched": "int64"})


_SITEMAP_COVERAGE_SQL = f"""
WITH cand AS (
  SELECT ks.k, ks.k + 97 * t.j AS did
  FROM range(97) ks(k), unnest({list(_SITEMAP_STRIDES)}) AS t(j)
)
SELECT 'site' || CAST(cand.k AS VARCHAR) || '.example' AS domain,
       7 AS n_sitemap_urls,
       COUNT(d.doc_id) AS n_matched
FROM cand LEFT JOIN documents d ON d.doc_id = cand.did
GROUP BY 1
"""


FRONTIER_SHARDS = 16


def frontier_shards(sf_dir: str) -> pd.DataFrame:
    """Crawl-frontier sharding — the fetch-assignment pass of a
    distributed crawler: every distinct out-link target goes to one of
    ``FRONTIER_SHARDS`` fetch shards by ``md5(host) % K``, so a host's
    URLs always land on ONE shard (politeness: per-host rate limiting
    needs a single owner) while hosts spread evenly. Emits per-shard
    frontier size and host count.

    The md5 assignment is the same deterministic-hash trick the CMS/HLL
    oracles use, so the whole table is hash-checked in SQL. Scale shape:
    targets come from the (target) distinct-count partials of the link
    extraction (payloads never shuffle); the shard table is K rows."""
    import hashlib

    edges = page_link_graph(sf_dir)[["domain", "href"]]
    targets = pd.DataFrame(
        {
            "host": edges["domain"],
            "target": "https://" + edges["domain"] + edges["href"],
        }
    ).drop_duplicates("target")
    shard = targets["host"].map(
        lambda h: int.from_bytes(
            hashlib.md5(h.encode()).digest()[:8], "big"
        ) % FRONTIER_SHARDS
    )
    out = (
        pd.DataFrame({"shard": shard, "target": targets["target"],
                      "host": targets["host"]})
        .groupby("shard")
        .agg(n_urls=("target", "count"), n_hosts=("host", "nunique"))
        .reset_index()
    )
    out["shard"] = out["shard"].astype("int64")
    out["n_urls"] = out["n_urls"].astype("int64")
    out["n_hosts"] = out["n_hosts"].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


_FRONTIER_SHARDS_SQL = f"""
WITH hosts AS (
  SELECT DISTINCT 'site' || CAST(doc_id % 97 AS VARCHAR) || '.example'
           AS host
  FROM documents WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
),
t AS (
  SELECT host,
         CAST(CAST(('0x' || substring(md5(host), 1, 16)) AS UBIGINT)
              % {FRONTIER_SHARDS} AS BIGINT) AS shard,
         u.href
  FROM hosts,
       unnest(['/', '/news', '/about', '/login', '/rel/1', '/rel/2',
               '/rel/3', '/terms', '/privacy']) AS u(href)
)
SELECT shard, COUNT(*) AS n_urls, COUNT(DISTINCT host) AS n_hosts
FROM t GROUP BY shard
"""


def page_head_meta(sf_dir: str) -> rd.Dataset:
    """DOM-head metadata enrichment — the standard webtext annotation pass:
    ``<title>``, first ``<h1>``, the declared ``<html lang>`` and the
    out-link count, parsed from the RAW page bytes (vectorized pandas .str
    regex over the decoded payload — not derived from table metadata). The
    synthesized boilerplate pins every field to a pure function of doc_id,
    so a wrong parser (grabbing a nested tag, missing the lang attribute,
    over/under-counting hrefs) breaks the SQL mirror exactly. Scale shape:
    embarrassingly parallel map_batches, no shuffle, streaming Dataset
    out."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    def head(df: pd.DataFrame) -> pd.DataFrame:
        html = df["html"].map(
            lambda b: b.decode("utf-8", "ignore") if isinstance(b, bytes) else ""
        )
        is_html = html.str.startswith("<!doctype html>")
        html = html[is_html]
        return pd.DataFrame(
            {
                "url": df.loc[is_html, "url"],
                "title": html.str.extract(r"<title>([^<]*)</title>", expand=False),
                "h1": html.str.extract(r"<h1>([^<]*)</h1>", expand=False),
                "html_lang": html.str.extract(
                    r'<html lang="([^"]*)"', expand=False
                ),
                "n_links": html.str.count(r'href="').astype("int64"),
            }
        )

    return pages.map_batches(head, batch_format="pandas")


_PAGE_HEAD_META_SQL = f"""
SELECT {_URL_SQL} AS url,
       'Document ' || CAST(doc_id AS VARCHAR) AS title,
       'site' || CAST(doc_id % 97 AS VARCHAR) || ' portal' AS h1,
       lang AS html_lang,
       9 AS n_links
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
"""


def url_canonicalize(sf_dir: str) -> pd.DataFrame:
    """Crawl-URL canonicalization — the frontier/dedup normalizer every web
    pipeline runs before URL-keyed joins: lowercase scheme+host, strip
    ``www.``, drop the fragment, drop ``utm_*`` tracking params (fixing up
    separators), and strip directory trailing slashes.

    The messy input URL is synthesized deterministically from ``doc_id``
    (mixed-case scheme/host, optional www/tracking/fragment/trailing slash)
    so the oracle reconstructs it in SQL; the normalize chain itself is a
    fixed sequence of engine-agnostic regex rewrites, identical on both
    sides. Scale shape: embarrassingly parallel vectorized map_batches —
    no state, no shuffle."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64").reset_index(drop=True)
        ds_ = d.astype(str)

        def pick(mask: pd.Series, yes, no="") -> pd.Series:
            return pd.Series(np.where(mask, yes, no), dtype="object")

        scheme = pick(d % 2 == 0, "HTTPS://", "https://")
        www = pick(d % 3 == 0, "WWW.")
        host = "Site" + (d % 97).astype(str) + ".Example"
        path = "/" + ds_.str.zfill(8)
        slash = pick(d % 4 == 0, "/")
        q = pick(
            d % 5 == 0,
            "?utm_source=feed"
            + pick(d % 10 == 0, "&id=" + ds_)
            + "&utm_campaign=c" + (d % 7).astype(str),
        )
        frag = pick(d % 6 == 0, "#sec" + (d % 9).astype(str))
        u = (scheme + www + host + path + slash + q + frag).astype("object")
        return pd.DataFrame({"doc_id": d, "url_canonical": normalize_urls(u)})

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(fn, batch_format="pandas").to_pandas()


_URL_CANONICALIZE_SQL = r"""
WITH messy AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
         || 'Site' || CAST(doc_id % 97 AS VARCHAR) || '.Example'
         || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN
               '?utm_source=feed'
               || (CASE WHEN doc_id % 10 = 0
                        THEN '&id=' || CAST(doc_id AS VARCHAR) ELSE '' END)
               || '&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)
             ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0
                  THEN '#sec' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END) AS u
  FROM documents
), s1 AS (
  SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM messy
), s2 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z]+://[^/?#]*)'))
           || substr(u, length(regexp_extract(u, '^([A-Za-z]+://[^/?#]*)')) + 1)
           AS u
  FROM s1
), s3 AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(u, '^https://(www\.)+', 'https://'),
                     '([?&])utm_[a-z_]+=[^&]*', '\1', 'g'),
                   '&&+', '&', 'g'),
                 '\?&', '?'),
               '/+\?', '?'),
             '[?&]+$', ''),
           '/+$', '') AS u
  FROM s2
)
SELECT doc_id, u AS url_canonical FROM s3
"""


def _cdx_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch CDX capture rows (shared by ``cdx_index`` and
    ``cdx_prefix_scan``): synthesize the messy url variant, derive the
    SURT key, digest and length. See ``cdx_index`` for the rules."""
    import hashlib

    d = df["doc_id"].to_numpy()
    host = pd.Series([f"site{x % N_HOSTS}.example" for x in d])
    path = pd.Series([f"/articles/{x % 500}" for x in d])
    variant = d % 4
    url = pd.Series([""] * len(d))
    for v, fmt in (
        (0, lambda h, p: f"https://www.{h}{p}"),
        (1, lambda h, p: f"https://{h.upper()}:443{p}"),
        (2, lambda h, p: f"http://{h}{p}?b=2&a=1"),
        (3, lambda h, p: f"https://{h}{p}?z=9"),
    ):
        m = variant == v
        url[m] = [fmt(h, p_) for h, p_ in zip(host[m], path[m])]

    parts = url.str.extract(r"^[A-Za-z]+://(?P<host>[^/?#]+)(?P<rest>.*)$")
    h = (
        parts["host"].str.lower()
        .str.replace(r":(443|80)$", "", regex=True)
        .str.replace(r"^www\.", "", regex=True)
    )
    rev = h.str.split(".").map(lambda xs: ",".join(reversed(xs)))
    p = parts["rest"].str.replace(r"\?.*$", "", regex=True)
    q = parts["rest"].str.extract(r"\?(.*)$")[0].fillna("")
    q_sorted = q.map(lambda s: "&".join(sorted(s.split("&"))) if s else "")
    surt = rev + ")" + p + np.where(q_sorted != "", "?" + q_sorted, "")

    text = df["text"].fillna("")
    return pd.DataFrame(
        {
            "surt_key": surt,
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(d % 86400, unit="s"),
            "url": url,
            "mime": "text/html",
            "status": np.full(len(d), 200, dtype="int64"),
            "digest": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in text],
            "length": text.str.encode("utf-8").str.len().astype("int64"),
        }
    )


def cdx_index(sf_dir: str) -> pd.DataFrame:
    """CDX-style capture index — the Common Crawl URL-index artifact: one
    row per capture keyed by the SURT (Sort-friendly URI Reordering
    Transform) of its url, plus capture timestamp, mime, status, payload
    digest and byte length — the exact fields cc-index serves so lookups
    and prefix scans run without touching WARC payloads.

    SURT rules (the documented subset, mirrored term-for-term in SQL):
    lowercase host, strip a leading ``www.``, strip default ``:80``/
    ``:443`` ports, reverse the dot-labels comma-joined, ``)`` joins
    host to path, query parameters sorted bytewise. Messy url variants
    (www, uppercase+port, unsorted params) are synthesized per doc so
    every rule fires. Digest = md5 of the text payload (DuckDB ``md5``
    hashes the same UTF-8 bytes); length = payload byte length (``strlen``).

    Scale shape: the index derives per batch (hashing is per-row C work,
    string rules vectorized) with no shuffle; the CDX artifact itself is
    a SORTED file family, so at corpus scale the tail is
    ``ds.sort("surt_key")`` + per-range shard writes (the
    ``sources/sorted_layout.py`` machinery) — here the test-scale table
    sorts driver-side."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = docs.map_batches(_cdx_rows, batch_format="pandas").to_pandas()
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out.sort_values(["surt_key", "ts", "url"]).reset_index(drop=True)


_CDX_INDEX_SQL = f"""
WITH capt AS (
  SELECT doc_id, text,
    'site' || CAST(doc_id % {N_HOSTS} AS VARCHAR) || '.example' AS h0,
    '/articles/' || CAST(doc_id % 500 AS VARCHAR) AS p0
  FROM documents
),
u AS (
  SELECT doc_id, text, p0,
    CASE doc_id % 4
      WHEN 0 THEN 'https://www.' || h0 || p0
      WHEN 1 THEN 'https://' || upper(h0) || ':443' || p0
      WHEN 2 THEN 'http://' || h0 || p0 || '?b=2&a=1'
      ELSE 'https://' || h0 || p0 || '?z=9'
    END AS url,
    CASE doc_id % 4 WHEN 2 THEN 'a=1&b=2' WHEN 3 THEN 'z=9' ELSE '' END AS q_sorted,
    h0 AS host
  FROM capt
)
SELECT
  array_to_string(list_reverse(string_split(host, '.')), ',') || ')' || p0
    || CASE WHEN q_sorted = '' THEN '' ELSE '?' || q_sorted END AS surt_key,
  TIMESTAMP '2026-01-01' + to_seconds(doc_id % 86400) AS ts,
  url,
  'text/html' AS mime,
  CAST(200 AS BIGINT) AS status,
  md5(text) AS digest,
  CAST(strlen(text) AS BIGINT) AS length
FROM u
ORDER BY surt_key, ts, url
"""


CDX_SCAN_HOST = 7  # host whose captures the prefix lookup serves
CDX_LAYOUT_VERSION = 1


def _cdx_layout_dir(sf_dir: str) -> str:
    """Cache dir of the SURT-sorted capture layout; keyed by path AND the
    source table's mtime+size so a regenerated documents.parquet under the
    same path can never serve a stale layout."""
    import hashlib as _hashlib

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(abs_dir, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    tag = _hashlib.blake2b(f"{abs_dir}|{stamp}".encode(), digest_size=4).hexdigest()
    return f"/tmp/scor_cdx/{os.path.basename(abs_dir)}_{tag}_v{CDX_LAYOUT_VERSION}"


def cdx_prefix_scan(sf_dir: str) -> pd.DataFrame:
    """CDX lookups SERVED from the sorted layout — what cc-index actually
    does: the capture table is range-clustered by SURT once (cached,
    atomic — ``sources/sorted_layout.py``), and a host-prefix query opens
    ONLY the ranges overlapping ``[prefix, prefix+0x7f]``, never the full
    index. The oracle runs the equivalent full-scan ``LIKE prefix%`` —
    pruning must not change the answer; tests additionally assert that
    fewer ranges than the whole layout are touched."""
    from ..sources.sorted_layout import MANIFEST_NAME, read_range, write_sorted

    out = _cdx_layout_dir(sf_dir)
    if not os.path.exists(os.path.join(out, MANIFEST_NAME)):
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        write_sorted(docs.map_batches(_cdx_rows, batch_format="pandas"), out, "surt_key")
    prefix = f"example,site{CDX_SCAN_HOST})"
    res = read_range(out, prefix, prefix + "\x7f").to_pandas()
    res = res.drop(columns=["range_id"], errors="ignore")
    res["ts"] = res["ts"].astype("datetime64[us]")
    return res.sort_values(["surt_key", "ts", "url"]).reset_index(drop=True)


_CDX_PREFIX_SCAN_SQL = (
    _CDX_INDEX_SQL.replace(
        "ORDER BY surt_key, ts, url",
        f"""HAVING_PLACEHOLDER
ORDER BY surt_key, ts, url""",
    ).replace(
        "FROM u\n",
        f"FROM u\nWHERE array_to_string(list_reverse(string_split(host, '.')), ',')"
        f" || ')' || p0 || CASE WHEN q_sorted = '' THEN '' ELSE '?' || q_sorted END"
        f" LIKE 'example,site{CDX_SCAN_HOST})%'\n",
    ).replace("HAVING_PLACEHOLDER\n", "")
)


# --------------------------------------------------------------------------
# Per-host template detection (boilerplate-line discovery)
# --------------------------------------------------------------------------

def host_template_lines(sf_dir: str) -> pd.DataFrame:
    """Per-host TEMPLATE discovery — the site-level analog of CCNet's
    corpus-wide line dedup (justext/boilerpipe's core signal): a raw-HTML
    line that appears on more than half of a host's pages is template
    (nav, footer, styling), not content. Output: (host, n_template_lines).
    The synthesized boilerplate makes the truth arithmetic: 15 constant
    non-empty lines are shared by every page of a host, the ``<html lang>``
    line joins them exactly when one language holds a strict majority of
    the host's HTML pages, and title/script/body lines are per-doc unique —
    so a parser that over- or under-merges lines breaks the mirror exactly.

    Scale shape: per-page line sets explode inside map_batches; ONE
    (host, line-hash) grouped count (pre-shrunk per batch) plus a tiny
    per-host page count; the >50% gate and final rollup run over the
    already-aggregated table. Raw pages never shuffle."""
    pages_dir = synth_pages_parquet(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    def explode_lines(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hashlib

        hosts, lines = [], []
        for url, payload in zip(df["url"], df["html"]):
            txt = bytes(payload).decode("utf-8", "ignore")
            if not txt.startswith("<!doctype html>"):
                continue
            host = url.split("/")[2]
            for ln in set(txt.split("\n")):
                if ln:
                    hosts.append(host)
                    # 16-byte digest: the shuffle carries hashes, not HTML
                    lines.append(_hashlib.md5(ln.encode()).digest())
        return pd.DataFrame(
            {
                "host": pd.Series(hosts, dtype="object"),
                "line": pd.Series(lines, dtype="object"),
            }
        )

    per_line = grouped_aggregate(
        pages.map_batches(explode_lines, batch_format="pandas"),
        ["host", "line"],
        {"k": (None, "count")},
    )

    def count_pages(df: pd.DataFrame) -> pd.DataFrame:
        is_html = df["html"].map(
            lambda p: bytes(p).startswith(b"<!doctype html>")
        )
        out = df.loc[is_html, ["url"]]
        return pd.DataFrame(
            {"host": out["url"].str.split("/").str[2]}
        )

    n_pages = (
        grouped_aggregate(
            pages.map_batches(count_pages, batch_format="pandas"),
            ["host"],
            {"n": (None, "count")},
        )
        .to_pandas()
        .set_index("host")["n"]
    )

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        n = df["host"].map(n_pages).astype("int64")
        return df.loc[df["k"] * 2 > n, ["host"]]

    agg = grouped_aggregate(
        per_line, ["host"], {"n_template_lines": (None, "count")}, prepare=gate
    ).to_pandas()
    agg["n_template_lines"] = agg["n_template_lines"].astype("int64")
    return agg.sort_values("host").reset_index(drop=True)


_HOST_TEMPLATE_LINES_SQL = """
WITH html_docs AS (
  SELECT doc_id, lang, doc_id % 97 AS h FROM documents
  WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
),
per_host AS (SELECT h, COUNT(*) AS n FROM html_docs GROUP BY 1),
lang_top AS (
  SELECT h, MAX(c) AS m
  FROM (SELECT h, lang, COUNT(*) AS c FROM html_docs GROUP BY 1, 2)
  GROUP BY 1
)
SELECT 'site' || CAST(p.h AS VARCHAR) || '.example' AS host,
       CAST(15 + CASE WHEN l.m * 2 > p.n THEN 1 ELSE 0 END AS BIGINT)
         AS n_template_lines
FROM per_host p JOIN lang_top l USING (h)
ORDER BY host
"""


# --------------------------------------------------------------------------
# Incremental extraction (recrawl refresh: re-extract only changed payloads)
# --------------------------------------------------------------------------

INCR_VERSION = 1


def _incr_prev_dir(sf_dir: str) -> str:
    """Cache dir of the 'previous run' artifact (url, payload digest,
    extracted text); keyed by path AND source mtime+size (stale-cache rule,
    see ``_cdx_layout_dir``)."""
    import hashlib as _hashlib

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(abs_dir, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    tag = _hashlib.blake2b(f"{abs_dir}|{stamp}".encode(), digest_size=4).hexdigest()
    return f"/tmp/scor_incr/{os.path.basename(abs_dir)}_{tag}_v{INCR_VERSION}"


def _payload_digests(ds: rd.Dataset) -> rd.Dataset:
    """(url, digest) per HTML page — the reuse key, computed WITHOUT
    decoding: md5 over the raw payload bytes."""
    import hashlib as _hashlib

    def dig(t: pa.Table) -> pa.Table:
        payloads = t["html"].to_pylist()
        keep = [
            i for i, p in enumerate(payloads)
            if p is not None and p.startswith(b"<!doctype html>")
        ]
        return pa.table(
            {
                "url": t["url"].take(pa.array(keep, pa.int64())),
                "digest": pa.array(
                    [_hashlib.md5(payloads[i]).digest() for i in keep], pa.binary()
                ),
            }
        )

    return ds.map_batches(dig, batch_format="pyarrow")


class _IncrementalHtmlStage:
    """Actor-pool stage of the incremental refresh: rows whose payload
    digest matches the previous run emit the PREVIOUS text (the engine never
    runs); changed or new rows run the real html-main-content engine. One
    pass, no branch re-execution."""

    def __init__(self) -> None:
        from ..stages.engines import HtmlEngine

        self.engine = HtmlEngine()  # once per actor (T1 pattern)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        urls, texts, reused = [], [], []
        prev_ok = df["digest"] == df["digest_prev"]  # NaN-safe: != when prev missing
        for url, payload, text_prev, ok in zip(
            df["url"], df["html"], df["text_prev"], prev_ok
        ):
            urls.append(url)
            if ok:
                texts.append(text_prev)
                reused.append(1)
            else:
                texts.append(self.engine.extract(url, bytes(payload), "html").text)
                reused.append(0)
        return pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "text": pd.Series(texts, dtype="object"),
                "reused": pd.Series(reused, dtype="int64"),
            }
        )


def incremental_extract(sf_dir: str) -> pd.DataFrame:
    """Recrawl-aware INCREMENTAL main-content refresh — the operator that
    makes re-processing a 10^12-page crawl affordable: the previous run's
    output (url, raw-payload digest, extracted text — a cached artifact
    here, the prior run's parquet in production) is hash-joined against the
    new crawl's LATEST snapshots, and only urls whose payload digest changed
    (or that are new) go through the extraction engine; unchanged urls carry
    the previous text forward untouched. Output (url, text, reused) must be
    byte-identical to a full re-extraction — the oracle asserts text AND the
    exact reuse set.

    Scale topology: the previous artifact holds no payloads (url, 16-byte
    digest, text); the reuse decision is ONE native left_outer hash join on
    url — current-crawl payloads cross that single shuffle once (zero times
    if both sides use the url-bucketed layout, ``sources/bucketed.py``) —
    and the reuse/extract split happens per ROW inside one actor stage, so
    neither branch re-executes lineage. Engine state loads once per actor."""
    prev = _incr_prev_dir(sf_dir)
    if not os.path.isdir(prev):
        # "previous run": full extraction of the base snapshot
        base = read_pages(synth_pages_parquet(sf_dir))
        extracted = extraction_pipeline(base).map_batches(
            lambda t: t.filter(pa.compute.equal(t["content_type"], "html")).select(
                ["url", "text"]
            ),
            batch_format="pyarrow",
        )
        prev_art = _payload_digests(base).join(
            extracted, join_type="inner", num_partitions=8, on=("url",)
        )
        tmp = f"{prev}.tmp.{os.getpid()}"
        prev_art.write_parquet(tmp)
        try:
            os.rename(tmp, prev)
        except OSError:
            import shutil as _shutil

            _shutil.rmtree(tmp, ignore_errors=True)

    pages = read_pages(synth_pages_parquet(sf_dir, recrawl_every=RECRAWL_EVERY))

    # latest snapshot per url: slim (url → max_ts) pass, payloads stay put
    maxts = grouped_aggregate(
        pages.select_columns(["url", "warc_ts"]),
        ["url"],
        {"max_ts": ("warc_ts", "max")},
    ).to_pandas()
    ts_ref = ray.put(dict(zip(maxts["url"], maxts["max_ts"])))

    def keep_latest_html(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ts_ref)
        df = df[df["warc_ts"] == df["url"].map(m)]
        is_html = df["html"].map(
            lambda p: p is not None and bytes(p).startswith(b"<!doctype html>")
        )
        return df.loc[is_html, ["url", "html"]]

    latest = pages.map_batches(keep_latest_html, batch_format="pandas")
    def add_digest(t: pa.Table) -> pa.Table:
        import hashlib as _hashlib

        return t.append_column(
            "digest",
            pa.array(
                [_hashlib.md5(p).digest() for p in t["html"].to_pylist()],
                pa.binary(),
            ),
        )

    def rename_prev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "digest_prev": t["digest"],
                "text_prev": t["text"],
            }
        )

    cur = latest.map_batches(add_digest, batch_format="pyarrow")
    prev_ds = rd.read_parquet(prev).map_batches(rename_prev, batch_format="pyarrow")
    joined = cur.join(
        prev_ds, join_type="left_outer", num_partitions=8, on=("url",)
    )
    out = joined.map_batches(
        _IncrementalHtmlStage, batch_format="pandas", concurrency=(1, 4)
    ).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


_INCREMENTAL_EXTRACT_SQL = f"""
SELECT {_URL_SQL} AS url,
       text || CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE}
                     THEN '{RECRAWL_SUFFIX}' ELSE '' END AS text,
       CAST(CASE WHEN doc_id % {RECRAWL_EVERY} = {RECRAWL_RESIDUE} THEN 0 ELSE 1 END
            AS BIGINT) AS reused
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
ORDER BY url
"""


# --------------------------------------------------------------------------
# Corpus snapshot diff (crawl-ops: added / removed / changed / unchanged)
# --------------------------------------------------------------------------

DIFF_ADDED_RES = 13  # docs absent from snapshot A → "added" in B
DIFF_REMOVED_RES = 17  # docs absent from snapshot B → "removed"
DIFF_CHANGED_RES = 5  # B serves different content for these urls


def corpus_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot diff between two crawls of the same corpus — the operator an
    incremental-recrawl pipeline runs to budget work: per url, is it added
    (B only), removed (A only), changed (both present, content digest
    differs) or unchanged. The two snapshots are derived deterministically
    (A drops residue-{13}, B drops residue-{17} and rewrites residue-{5}
    content), so the oracle reconstructs every class by arithmetic.

    Scale shape: each side reduces to (url, 16-byte digest) AT THE READ —
    page text never shuffles — then ONE native hash-partitioned
    ``full_outer`` join on the url key classifies every row vectorized.
    No driver-side set logic; both snapshot scans and the join stream."""
    import hashlib as _hashlib

    def digests(t: pa.Table, drop_res: int, change: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % drop_res != 0
        ids = ids[keep]
        texts = t["text"].to_pandas()[keep]
        if change:
            changed = ids % DIFF_CHANGED_RES == 0
            texts = texts.where(~changed, texts + " [updated]")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "digest": pa.array(
                    [_hashlib.md5(s.encode()).digest() for s in texts], pa.binary()
                ),
            }
        )

    path = os.path.join(sf_dir, "documents.parquet")
    snap_a = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        lambda t: digests(t, DIFF_ADDED_RES, change=False), batch_format="pyarrow"
    )
    snap_b = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        lambda t: digests(t, DIFF_REMOVED_RES, change=True), batch_format="pyarrow"
    )
    joined = snap_a.join(
        snap_b,
        join_type="full_outer",
        num_partitions=8,
        on=("doc_id",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["digest_a"], df["digest_b"]
        status = np.where(
            a.isna(),
            "added",
            np.where(b.isna(), "removed", np.where(a != b, "changed", "unchanged")),
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "status": status}
        )

    out = joined.map_batches(classify, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_CORPUS_DIFF_SQL = f"""
SELECT doc_id,
       CASE
         WHEN doc_id % {DIFF_ADDED_RES} = 0 THEN 'added'
         WHEN doc_id % {DIFF_REMOVED_RES} = 0 THEN 'removed'
         WHEN doc_id % {DIFF_CHANGED_RES} = 0 THEN 'changed'
         ELSE 'unchanged'
       END AS status
FROM documents
WHERE NOT (doc_id % {DIFF_ADDED_RES} = 0 AND doc_id % {DIFF_REMOVED_RES} = 0)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# WAT sidecar roundtrip (crawl-ops: metadata artifact)
# --------------------------------------------------------------------------

WAT_LAYOUT_VERSION = 1


def _wat_shards_dir(sf_dir: str) -> str:
    """Cache dir of the exported WAT shard family; keyed by path AND the
    source table's mtime+size (stale-cache rule, see ``_cdx_layout_dir``)."""
    import hashlib as _hashlib

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(abs_dir, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    tag = _hashlib.blake2b(f"{abs_dir}|{stamp}".encode(), digest_size=4).hexdigest()
    return f"/tmp/scor_wat/{os.path.basename(abs_dir)}_{tag}_v{WAT_LAYOUT_VERSION}"


def wat_head_index(sf_dir: str) -> pd.DataFrame:
    """End-to-end WAT sidecar roundtrip — the metadata artifact that
    completes the archive family (WARC raw / WET text / CDX index): export
    the crawl as ``.warc.wat.gz`` metadata shards (``sources/readers.py:
    write_wat`` — JSON envelopes with REAL parsed head title/lang/metas and
    the outlink list), then rebuild the head index purely FROM the shards
    (``read_wat_index``) with the raw pages never re-read. The oracle
    reconstructs title/lang/n_links from ``documents`` — a writer that drops
    a link or a reader that misparses an envelope breaks the mirror exactly.

    Scale shape: shard-per-block export (atomic per-shard renames, whole
    directory published by a single atomic rename), FILE-granular parse-back,
    no shuffle anywhere; the artifact is cached keyed by source mtime+size.
    Non-HTML captures (pdf/image/garbage payload classes) stay in the WAT —
    the query keeps them out via the null-title filter, and tests assert
    they are present in the index with n_links = 0."""
    from ..sources.readers import read_wat_index, write_wat

    out = _wat_shards_dir(sf_dir)
    if not os.path.isdir(out):
        pages_dir = synth_pages_parquet(sf_dir)
        tmp = f"{out}.tmp.{os.getpid()}"
        write_wat(read_pages(pages_dir), tmp, overwrite_dir=True)
        try:
            os.rename(tmp, out)  # atomic publish; loser of a race cleans up
        except OSError:
            import shutil as _shutil

            _shutil.rmtree(tmp, ignore_errors=True)
    idx = read_wat_index(out).to_pandas()
    idx = idx[idx["title"].notna()]
    return (
        idx[["url", "title", "html_lang", "n_links"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


_WAT_HEAD_INDEX_SQL = f"""
SELECT {_URL_SQL} AS url,
       'Document ' || CAST(doc_id AS VARCHAR) AS title,
       lang AS html_lang,
       CAST(9 AS BIGINT) AS n_links
FROM documents
WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
ORDER BY url
"""


# --------------------------------------------------------------------------
# RSS / Atom feed parsing (crawl-ops: feed-driven discovery)
# --------------------------------------------------------------------------

_FEED_EPOCH = "2024-01-01 00:00:00"
_FEED_STRIDES = (0, 1, 2, 3, 4)
#: phantom entries point at doc ids the crawl NEVER holds (offset keeps the
#: 8-digit url shape, so they parse like real entries and reach the
#: membership join — which is the thing that must drop them)
_FEED_PHANTOM_OFFSET = 90_000_000


def _feed_entry_fields(k: int, j: int) -> tuple[int, str, str, str]:
    """(did, url, title, iso_ts) for entry j of domain k's feed — shared by
    the generator, so parse-side output is exactly reconstructable."""
    from datetime import datetime, timedelta

    did = k + 97 * j
    url = f"https://site{k}.example/{did:08d}"
    ts = datetime.fromisoformat(_FEED_EPOCH) + timedelta(hours=did)
    return did, url, f"Post {did}", ts.isoformat()


def make_feed(k: int) -> bytes:
    """Deterministic syndication feed for domain ``k``: RSS 2.0 for even
    domains, Atom for odd — both formats must round-trip through the same
    parser. Five real entries plus two phantoms the crawl never fetched."""
    from datetime import datetime, timezone
    from email.utils import format_datetime

    entries = [_feed_entry_fields(k, j) for j in _FEED_STRIDES]
    for j in (9, 11):
        did, _, t, iso = _feed_entry_fields(k, j)
        did_p = did + _FEED_PHANTOM_OFFSET
        entries.append(
            (did_p, f"https://site{k}.example/{did_p:08d}", t, iso)
        )
    if k % 2 == 0:  # RSS 2.0 with RFC 822 dates
        items = "".join(
            f"<item><title>{t}</title><link>{u}</link>"
            f"<pubDate>{format_datetime(datetime.fromisoformat(iso).replace(tzinfo=timezone.utc))}</pubDate>"
            "</item>"
            for _, u, t, iso in entries
        )
        body = (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>site{k}</title><link>https://site{k}.example/</link>"
            f"{items}</channel></rss>"
        )
    else:  # Atom with ISO 8601 dates
        items = "".join(
            f"<entry><title>{t}</title><link href=\"{u}\"/>"
            f"<updated>{iso}Z</updated></entry>"
            for _, u, t, iso in entries
        )
        body = (
            '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>site{k}</title>{items}</feed>"
        )
    return body.encode()


def parse_feed(raw: bytes) -> list[dict]:
    """Entries of an RSS 2.0 or Atom feed via a real namespace-aware XML
    parse: ``(url, title, published)`` with RFC 822 (RSS pubDate) and ISO
    8601 (Atom updated) dates both parsed to naive-UTC datetimes.
    Malformed XML yields [] — one bad feed costs one feed, never the task."""
    import xml.etree.ElementTree as ET
    from datetime import timezone
    from email.utils import parsedate_to_datetime

    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return []
    out: list[dict] = []
    if root.tag == "rss":
        for item in root.iter("item"):
            link = item.findtext("link")
            pub = item.findtext("pubDate")
            if not link or not pub:
                continue
            try:
                ts = parsedate_to_datetime(pub)
            except (TypeError, ValueError):
                continue
            if ts.tzinfo is None:  # RFC 5322 '-0000' → naive: means UTC
                ts = ts.replace(tzinfo=timezone.utc)
            out.append(
                {
                    "url": link.strip(),
                    "title": (item.findtext("title") or "").strip(),
                    "published": ts.astimezone(timezone.utc).replace(tzinfo=None),
                }
            )
    else:
        from datetime import datetime

        ns = "{http://www.w3.org/2005/Atom}"
        for item in root.iter(f"{ns}entry"):
            links = item.findall(f"{ns}link")
            # the article url is the rel-less/rel=alternate link, NOT a
            # feed-internal rel=self/edit link that may come first
            link_el = next(
                (e for e in links if e.get("rel") in (None, "alternate")),
                links[0] if links else None,
            )
            upd = item.findtext(f"{ns}updated")
            if link_el is None or not upd:
                continue
            href = link_el.get("href")
            if not href:
                continue
            try:
                ts = datetime.fromisoformat(upd.replace("Z", "+00:00"))
            except ValueError:
                continue
            if ts.tzinfo is None:  # tz-less <updated> → treat as UTC
                ts = ts.replace(tzinfo=timezone.utc)
            out.append(
                {
                    "url": href.strip(),
                    "title": (item.findtext(f"{ns}title") or "").strip(),
                    "published": ts.astimezone(timezone.utc).replace(tzinfo=None),
                }
            )
    return out


def feed_entries(sf_dir: str) -> pd.DataFrame:
    """Feed-driven discovery audit: parse every domain's syndication feed
    (RSS and Atom mixed, real XML + real date parsing) and keep the entries
    whose document the crawl actually holds. Scale shape: feeds parse
    DISTRIBUTED (map_batches over the feed payload table — at real scale
    that table is millions of fetched feeds); the parsed entry set is tiny
    and broadcast into a membership filter over the streamed documents
    table — the crawl side never shuffles."""
    feeds = rd.from_items(
        [{"k": k, "payload": make_feed(k)} for k in range(97)]
    )

    def parse_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, payload in zip(df["k"], df["payload"]):
            fmt = "rss" if int(k) % 2 == 0 else "atom"
            for e in parse_feed(bytes(payload)):
                rows.append(
                    {
                        "domain": f"site{int(k)}.example",
                        "fmt": fmt,
                        "url": e["url"],
                        "title": e["title"],
                        "published": e["published"],
                    }
                )
        out = pd.DataFrame(
            rows, columns=["domain", "fmt", "url", "title", "published"]
        )
        out["published"] = out["published"].astype("datetime64[us]")
        return out

    entries = feeds.map_batches(parse_batch, batch_format="pandas").to_pandas()
    # entry link encodes the doc id: .../<did:08d>; phantoms have a suffix
    did = pd.to_numeric(entries["url"].str.extract(r"/(\d{8})$")[0], errors="coerce")
    entries = entries.assign(doc_id=did).dropna(subset=["doc_id"])
    entries["doc_id"] = entries["doc_id"].astype("int64")
    lookup_ref = ray.put(set(entries["doc_id"]))

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def crawled(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        hit = df[df["doc_id"].isin(lk)][["doc_id"]]
        return hit.astype({"doc_id": "int64"})

    have = set(
        docs.map_batches(crawled, batch_format="pandas").to_pandas()["doc_id"]
    )  # bounded by the entry set, never the crawl
    out = entries[entries["doc_id"].isin(have)]
    return (
        out[["domain", "fmt", "doc_id", "url", "title", "published"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_FEED_ENTRIES_SQL = f"""
SELECT 'site' || CAST(d.doc_id % 97 AS VARCHAR) || '.example' AS domain,
       CASE WHEN (d.doc_id % 97) % 2 = 0 THEN 'rss' ELSE 'atom' END AS fmt,
       d.doc_id,
       'https://site' || CAST(d.doc_id % 97 AS VARCHAR) || '.example/'
         || lpad(CAST(d.doc_id AS VARCHAR), 8, '0') AS url,
       'Post ' || CAST(d.doc_id AS VARCHAR) AS title,
       TIMESTAMP '{_FEED_EPOCH}' + INTERVAL (d.doc_id) HOUR AS published
FROM documents d
WHERE d.doc_id < {97 * len(_FEED_STRIDES)}
"""


# --------------------------------------------------------------------------
# HTML table extraction (structured layout parse — stages/html_tables.py)
# --------------------------------------------------------------------------


def table_html_payload(lang: str, source: str, n_chars: int) -> bytes:
    """Deterministic table-bearing page: every cell is a pure function of
    the document's columns so the SQL oracle can reconstruct the full grid.
    Deliberately hostile markup on the ORACLE-CHECKED path: a decoy table
    inside <script>, an attribute containing '>', inner markup + entities
    in cells, implicitly-closed td/tr (row 2 never closes its cells), and a
    colspan gap in the second table."""
    return (
        "<html><head><title>t</title><style>td{color:red}</style></head><body>"
        "<p>Prose outside any table; the extractor must ignore it.</p>"
        '<script>var decoy = "<table><tr><td>never</td></tr></table>";</script>'
        '<table class="data" summary="a>b">'
        "<tr><th>lang</th><th>source</th><th>n_chars</th><th>title</th>"
        "<th>price</th><th>day</th></tr>"
        f"<tr><td> {lang} </td><td><b>{source}</b></td><td>{n_chars}</td>"
        f"<td>A &amp; B {lang}</td>"
        f"<td>{n_chars // 100}.{n_chars % 100:02d}</td>"
        f"<td>2024-01-{1 + n_chars % 28:02d}</td></tr>"
        f"<tr><td>{lang.upper()}<td>{source}!<td>{n_chars * 2}"
        f"<td>C &lt;D&gt; {source}"
        f"<td>{n_chars * 2 // 100}.{n_chars * 2 % 100:02d}"
        f"<td>2024-02-{1 + n_chars % 28:02d}</table>"
        '<table><tr><td>x1</td><td colspan="2">wide</td><td>x2</td></tr></table>'
        "</body></html>"
    ).encode()


def html_table_cells(sf_dir: str) -> rd.Dataset:
    """Real end-to-end table extraction: synthesize a valid-but-hostile
    table-bearing HTML page per document, run the from-scratch structure
    parser in an actor pool, emit one row per recovered cell with its true
    (table, row, col) grid position. Streaming — ~15 slim rows out per doc,
    payloads never shuffle."""
    from ..stages.html_tables import TableExtractStage

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def with_html(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["html"] = [
            table_html_payload(l, s, int(n))
            for l, s, n in zip(df["lang"], df["source"], df["n_chars"])
        ]
        return df[["doc_id", "html"]]

    return ds.map_batches(with_html, batch_format="pandas").map_batches(
        TableExtractStage,
        fn_constructor_kwargs={"id_col": "doc_id"},
        batch_format="pandas",
        concurrency=(1, 4),
    )


_HTML_TABLE_CELLS_SQL = """
SELECT doc_id, 0 AS table_idx, 0 AS row_idx, 0 AS col_idx, 'lang' AS cell FROM documents
UNION ALL SELECT doc_id, 0, 0, 1, 'source' FROM documents
UNION ALL SELECT doc_id, 0, 0, 2, 'n_chars' FROM documents
UNION ALL SELECT doc_id, 0, 0, 3, 'title' FROM documents
UNION ALL SELECT doc_id, 0, 1, 0, lang FROM documents
UNION ALL SELECT doc_id, 0, 1, 1, source FROM documents
UNION ALL SELECT doc_id, 0, 1, 2, CAST(n_chars AS VARCHAR) FROM documents
UNION ALL SELECT doc_id, 0, 1, 3, 'A & B ' || lang FROM documents
UNION ALL SELECT doc_id, 0, 2, 0, upper(lang) FROM documents
UNION ALL SELECT doc_id, 0, 2, 1, source || '!' FROM documents
UNION ALL SELECT doc_id, 0, 2, 2, CAST(n_chars * 2 AS VARCHAR) FROM documents
UNION ALL SELECT doc_id, 0, 2, 3, 'C <D> ' || source FROM documents
UNION ALL SELECT doc_id, 0, 0, 4, 'price' FROM documents
UNION ALL SELECT doc_id, 0, 0, 5, 'day' FROM documents
UNION ALL SELECT doc_id, 0, 1, 4,
  CAST(n_chars // 100 AS VARCHAR) || '.'
    || lpad(CAST(n_chars % 100 AS VARCHAR), 2, '0') FROM documents
UNION ALL SELECT doc_id, 0, 1, 5,
  '2024-01-' || lpad(CAST(1 + n_chars % 28 AS VARCHAR), 2, '0') FROM documents
UNION ALL SELECT doc_id, 0, 2, 4,
  CAST(n_chars * 2 // 100 AS VARCHAR) || '.'
    || lpad(CAST(n_chars * 2 % 100 AS VARCHAR), 2, '0') FROM documents
UNION ALL SELECT doc_id, 0, 2, 5,
  '2024-02-' || lpad(CAST(1 + n_chars % 28 AS VARCHAR), 2, '0') FROM documents
UNION ALL SELECT doc_id, 1, 0, 0, 'x1' FROM documents
UNION ALL SELECT doc_id, 1, 0, 1, 'wide' FROM documents
UNION ALL SELECT doc_id, 1, 0, 3, 'x2' FROM documents
"""


def table_column_types(sf_dir: str) -> pd.DataFrame:
    """WebTables-style SCHEMA INFERENCE over the extracted tables: classify
    every data cell of the first table (int / float / date / str by exact
    pattern) and promote each column through the standard lattice — all
    int → bigint, numeric mix → double, all date → date, anything else →
    varchar. Headers come from row 0. This is the step that turns crawled
    HTML tables into typed ingestable columns; a parser slip (grid
    misalignment, entity residue, implicit-close loss) changes a column's
    cell set and flips its inferred type. Topology: cells stream from the
    extraction actor pool into a bounded (col, kind) grouped count — the
    rollup is |cols|×4 rows regardless of corpus size."""
    import re as _re

    from ..functions.agg import grouped_aggregate

    # materialize ONCE: the classify pass and the header pass both consume
    # this, and the table is slim (≈21 grid cells per doc, payloads gone)
    cells = html_table_cells(sf_dir).materialize()

    _INT = _re.compile(r"^-?\d+$")
    _FLT = _re.compile(r"^-?\d+\.\d+$")
    _DT = _re.compile(r"^\d{4}-\d{2}-\d{2}$")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["table_idx"] == 0) & (df["row_idx"] > 0)]
        kind = np.where(
            d["cell"].str.match(_INT), "int",
            np.where(
                d["cell"].str.match(_FLT), "float",
                np.where(d["cell"].str.match(_DT), "date", "str"),
            ),
        )
        return pd.DataFrame({"col_idx": d["col_idx"].astype("int64"),
                             "kind": kind})

    counts = grouped_aggregate(
        cells, ["col_idx", "kind"], {"n": (None, "count")}, prepare=classify
    ).to_pandas()

    headers = (
        cells.map_batches(
            lambda d: d[(d["table_idx"] == 0) & (d["row_idx"] == 0)][
                ["col_idx", "cell"]
            ].drop_duplicates(),
            batch_format="pandas",
        )
        .to_pandas()
        .drop_duplicates()
        .set_index("col_idx")["cell"]
    )

    rows = []
    for col, grp in counts.groupby("col_idx"):
        kinds = set(grp["kind"])
        if kinds == {"int"}:
            t = "bigint"
        elif kinds <= {"int", "float"}:
            t = "double"
        elif kinds == {"date"}:
            t = "date"
        else:
            t = "varchar"
        rows.append(
            {
                "col_idx": int(col),
                "header": headers.loc[col],
                "inferred_type": t,
                "n_cells": int(grp["n"].sum()),
            }
        )
    out = pd.DataFrame(rows).astype({"col_idx": "int64", "n_cells": "int64"})
    return out.sort_values("col_idx").reset_index(drop=True)


_TABLE_COLUMN_TYPES_SQL = """
WITH n AS (SELECT COUNT(*) * 2 AS c FROM documents)
SELECT * FROM (VALUES
  (0, 'lang', 'varchar'), (1, 'source', 'varchar'), (2, 'n_chars', 'bigint'),
  (3, 'title', 'varchar'), (4, 'price', 'double'), (5, 'day', 'date')
) t(col_idx, header, inferred_type)
CROSS JOIN (SELECT CAST(c AS BIGINT) AS n_cells FROM n)
ORDER BY col_idx
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "feed_entries": feed_entries,
    "wat_head_index": wat_head_index,
    "corpus_diff": corpus_diff,
    "incremental_extract": incremental_extract,
    "host_template_lines": host_template_lines,
    "html_table_cells": html_table_cells,
    "table_column_types": table_column_types,
    "cdx_index": cdx_index,
    "cdx_prefix_scan": cdx_prefix_scan,
    "image_meta": image_meta,
    "page_link_graph": page_link_graph,
    "anchor_text_index": anchor_text_index,
    "frontier_shards": frontier_shards,
    "sitemap_coverage": sitemap_coverage,
    "recrawl_schedule": recrawl_schedule,
    "etag_revalidation_plan": etag_revalidation_plan,
    "page_head_meta": page_head_meta,
    "robots_allowed_links": robots_allowed_links,
    "robots_wildcard_audit": robots_wildcard_audit,
    "url_canonicalize": url_canonicalize,
    "canonical_url_dedup": canonical_url_dedup,
    "exploded_pdf_text": exploded_pdf_text,
    "split_pdf_text": split_pdf_text,
    "extract_html_text": extract_html_text,
    "extract_html_text_density": extract_html_text_density,
    "extract_real_routes": extract_real_routes,
    "error_class_counts": error_class_counts,
    "route_counts": route_counts,
    "span_integrity_audit": span_integrity_audit,
    "gzip_real_routes": gzip_real_routes,
    "crawl_delay_schedule": crawl_delay_schedule,
    "pdf_page_counts": pdf_page_counts,
    "failed_rows": failed_rows,
    "dedup_exact_pages": dedup_exact_pages,
    "latest_page_text": latest_page_text,
    "blocked_domain_pages": blocked_domain_pages,
    "recrawl_churn_stats": recrawl_churn_stats,
    "snapshot_change_rate": snapshot_change_rate,
    "refreshed_corpus": refreshed_corpus,
    "domain_stats": domain_stats,
}

ORACLES: dict[str, str] = {
    "span_integrity_audit": _SPAN_INTEGRITY_AUDIT_SQL,
    "gzip_real_routes": _GZIP_REAL_ROUTES_SQL,
    "crawl_delay_schedule": _CRAWL_DELAY_SCHEDULE_SQL,
    "feed_entries": _FEED_ENTRIES_SQL,
    "wat_head_index": _WAT_HEAD_INDEX_SQL,
    "corpus_diff": _CORPUS_DIFF_SQL,
    "incremental_extract": _INCREMENTAL_EXTRACT_SQL,
    "host_template_lines": _HOST_TEMPLATE_LINES_SQL,
    "html_table_cells": _HTML_TABLE_CELLS_SQL,
    "table_column_types": _TABLE_COLUMN_TYPES_SQL,
    "cdx_index": _CDX_INDEX_SQL,
    "cdx_prefix_scan": _CDX_PREFIX_SCAN_SQL,
    "image_meta": _IMAGE_META_SQL,
    "exploded_pdf_text": _EXPLODED_PDF_TEXT_SQL,
    "split_pdf_text": _EXPLODED_PDF_TEXT_SQL,  # both paths, one truth
    "extract_html_text": _EXTRACT_HTML_TEXT_SQL,
    "extract_html_text_density": _EXTRACT_HTML_TEXT_SQL,
    "extract_real_routes": _EXTRACT_REAL_ROUTES_SQL,
    "error_class_counts": _ERROR_CLASS_COUNTS_SQL,
    "route_counts": _ROUTE_COUNTS_SQL,
    "pdf_page_counts": _PDF_PAGE_COUNTS_SQL,
    "failed_rows": _FAILED_ROWS_SQL,
    "dedup_exact_pages": _DEDUP_EXACT_PAGES_SQL,
    "latest_page_text": _LATEST_PAGE_TEXT_SQL,
    "blocked_domain_pages": _BLOCKED_DOMAIN_PAGES_SQL,
    "canonical_url_dedup": _canonical_url_dedup_sql(),
    "recrawl_churn_stats": _RECRAWL_CHURN_SQL,
    "snapshot_change_rate": _SNAPSHOT_CHANGE_SQL,
    "refreshed_corpus": _REFRESHED_CORPUS_SQL,
    "domain_stats": _DOMAIN_STATS_SQL,
    "page_link_graph": _PAGE_LINK_GRAPH_SQL,
    "anchor_text_index": _ANCHOR_TEXT_INDEX_SQL,
    "frontier_shards": _FRONTIER_SHARDS_SQL,
    "sitemap_coverage": _SITEMAP_COVERAGE_SQL,
    "recrawl_schedule": _RECRAWL_SCHEDULE_SQL,
    "etag_revalidation_plan": _ETAG_REVALIDATION_SQL,
    "page_head_meta": _PAGE_HEAD_META_SQL,
    "robots_allowed_links": _ROBOTS_ALLOWED_LINKS_SQL,
    "robots_wildcard_audit": _ROBOTS_WILDCARD_AUDIT_SQL,
    "url_canonicalize": _URL_CANONICALIZE_SQL,
}

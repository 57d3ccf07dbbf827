"""Alternative sources for the pages schema.

The primary source is parquet with inline payloads. For side-file corpora
(one document per file on disk/object store — the reference's S1/S2 download
path, content_client.py:71-103 / test_local_file.py:32-50) we read the files
distributed and normalize into the same pages schema, so every downstream
stage is source-agnostic.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from .synth_pages import _EPOCH_US  # 2024-01-01 UTC — single source of truth


def read_pages_from_binary_files(paths: str | list[str]) -> rd.Dataset:
    """Directory (or list) of raw document files → pages(url, warc_ts, html,
    text, lang). url = file:// path; text/lang empty (to be filled by the
    pipeline)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_pages(batch: dict) -> pa.Table:
        paths_ = [str(p) for p in batch["path"]]
        n = len(paths_)
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths_], pa.string()),
                "warc_ts": pa.array([_EPOCH_US] * n, pa.timestamp("us")),
                "html": pa.array(list(batch["bytes"]), pa.binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="numpy")


def read_pages_from_jsonl(paths: str | list[str]) -> rd.Dataset:
    """JSON-lines corpus (Common-Crawl WET/CC-style dumps: one JSON object
    per line with url / timestamp / html-base64 / text / lang fields) →
    the canonical pages schema. ``read_json`` splits files into blocks and
    parses distributed; the base64 payload decode is a vectorized Arrow
    map — downstream stages stay source-agnostic.

    Missing fields take the same defaults as the binary-file source."""
    import base64

    ds = rd.read_json(paths)

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        n = len(batch)

        def col(name, default):
            if name in cols:
                return batch[name]
            return pa.array([default] * n)

        raw_html = col("html_b64", "")
        html = pa.array(
            [base64.b64decode(v) if v else b"" for v in raw_html.to_pylist()],
            pa.binary(),
        )
        if "warc_ts" in cols:
            ts = pa.compute.cast(batch["warc_ts"], pa.timestamp("us"))
        else:
            ts = pa.array([_EPOCH_US] * n, pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.compute.cast(col("url", ""), pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": pa.compute.cast(col("text", ""), pa.string()),
                "lang": pa.compute.cast(col("lang", ""), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_pages_from_csv(paths: str | list[str]) -> rd.Dataset:
    """CSV corpus (url, warc_ts, html_b64, text, lang — header row) → the
    canonical pages schema. ``read_csv`` splits files into blocks and parses
    distributed (Arrow CSV reader per block); payload transport is base64
    like the JSONL source, decoded vectorized. Missing columns take the
    same defaults as the other sources, so every downstream stage stays
    source-agnostic."""
    import base64

    ds = rd.read_csv(paths)

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        n = len(batch)

        def col(name, default):
            if name in cols:
                return batch[name]
            return pa.array([default] * n)

        raw_html = col("html_b64", "")
        html = pa.array(
            [
                base64.b64decode(v) if v else b""
                for v in raw_html.to_pylist()
            ],
            pa.binary(),
        )
        if "warc_ts" in cols:
            ts = pa.compute.cast(batch["warc_ts"], pa.timestamp("us"))
        else:
            ts = pa.array([_EPOCH_US] * n, pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.compute.cast(col("url", ""), pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": pa.compute.cast(col("text", ""), pa.string()),
                "lang": pa.compute.cast(col("lang", ""), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")

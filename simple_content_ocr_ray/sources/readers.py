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

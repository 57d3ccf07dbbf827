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


def read_pages_from_jsonl(
    paths: str | list[str], compression: str | None = None
) -> rd.Dataset:
    """JSON-lines corpus (Common-Crawl WET/CC-style dumps: one JSON object
    per line with url / timestamp / html-base64 / text / lang fields) →
    the canonical pages schema. ``read_json`` splits files into blocks and
    parses distributed; the base64 payload decode is a vectorized Arrow
    map — downstream stages stay source-agnostic.

    Missing fields take the same defaults as the binary-file source.

    ``compression="gzip"`` reads ``.jsonl.gz`` dumps (the on-the-wire shape
    of real WET drops) — decompression happens INSIDE the distributed read
    tasks via Arrow's input stream, file-granular parallel like the plain
    path; nothing is inflated on the driver."""
    import base64

    ds = rd.read_json(
        paths,
        **(
            {"arrow_open_stream_args": {"compression": compression}}
            if compression
            else {}
        ),
    )

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


def read_pages_from_warclite(paths: str | list[str]) -> rd.Dataset:
    """WARC-style crawl archives → the canonical pages schema. Each file
    holds concatenated records of the (simplified, self-describing) form::

        WARC/1.0\\r\\n
        WARC-Target-URI: <url>\\r\\n
        WARC-Date: <iso timestamp>\\r\\n
        Content-Length: <payload bytes>\\r\\n
        \\r\\n
        <payload>\\r\\n\\r\\n

    Parallelism is FILE-granular (real WARC segments are ~1 GB and
    self-contained, so one file per task is the natural unit — the same
    reason Common Crawl ships thousands of segment files); within a file
    the parser walks Content-Length offsets, so payloads may contain
    anything, including header-lookalike bytes."""
    import datetime as _dt

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"]:
            buf = bytes(blob)
            pos = 0
            while True:
                start = buf.find(b"WARC/1.0\r\n", pos)
                if start < 0:
                    break
                head_end = buf.find(b"\r\n\r\n", start)
                if head_end < 0:
                    break
                headers = {}
                for line in buf[start + 10 : head_end].split(b"\r\n"):
                    k, _, v = line.partition(b": ")
                    headers[k.decode()] = v.decode()
                n = int(headers.get("Content-Length", "0"))
                body_start = head_end + 4
                payloads.append(buf[body_start : body_start + n])
                urls.append(headers.get("WARC-Target-URI", ""))
                raw_ts = headers.get("WARC-Date", "")
                if raw_ts:
                    ts = int(
                        _dt.datetime.fromisoformat(
                            raw_ts.replace("Z", "+00:00")
                        ).timestamp()
                        * 1_000_000
                    )
                else:
                    ts = _EPOCH_US
                tss.append(ts)
                pos = body_start + n
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="numpy")

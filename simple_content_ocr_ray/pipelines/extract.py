"""End-to-end extraction pipeline builders.

The Ray restatement of the reference lifecycle (SURVEY.md §3.4):

    read_parquet(pages) → sniff content type → ExtractStage actor pool
      → (optional dedup / resume filter) → write_parquet(out)

Never calls ``ray.init`` — the caller (driver, bench, tests) owns the session.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import ray.data as rd

from ..stages.extract import ExtractStage
from ..stages.sniff import sniff_batch

#: Payload rows are multi-KB; a few hundred rows per batch keeps
#: batch × concurrency bounded in worker heaps (SURVEY.md §7.5 risk 3).
DEFAULT_BATCH_SIZE = 256


def default_concurrency() -> tuple[int, int]:
    """Actor-pool size for the extract stage: leave headroom for the read,
    sniff, and write stages so no stage starves (at 100 TB the same ratio
    applies per node)."""
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 0)) or (os.cpu_count() or 8)
    hi = max(2, int(ncpu * 0.75))
    return (1, hi)


def read_pages(pages_dir: str, columns: Optional[list[str]] = None) -> rd.Dataset:
    """Pruned read of a pages table directory."""
    return rd.read_parquet(pages_dir, columns=columns)


def extraction_pipeline(
    pages: rd.Dataset,
    *,
    route: Optional[dict[str, str]] = None,
    engine_config: Optional[dict[str, dict[str, Any]]] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
    row_timeout_s: Optional[float] = None,
    ray_remote_args: Optional[dict[str, Any]] = None,
) -> rd.Dataset:
    """pages(url, warc_ts, html, text, lang) → extracted(url, status, text,
    spans, page_count, content_type, error, processing_time_ms, metadata).

    The extract stage is an autoscaling actor pool: engines are constructed
    once per actor (heavy init amortized across batches), batches are
    zero-copy Arrow. Only (url, payload) are shipped to the actors — hint
    columns like ``text``/``lang``/``warc_ts`` are projected away first so
    they never cross the object store.
    """
    payload_col = "html"
    schema = pages.schema(fetch_if_missing=False)  # never force upstream exec
    if schema is not None:
        names = schema.names
        if "url" in names and payload_col in names and len(names) > 2:
            pages = pages.select_columns(["url", payload_col])
    ds = pages.map_batches(sniff_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        ExtractStage,
        fn_constructor_kwargs={
            "route": route,
            "engine_config": engine_config,
            "row_timeout_s": row_timeout_s,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
        # per-stage resources (e.g. {"num_gpus": 0.25} for GPU engines —
        # the reference's one-worker-per-GPU placement, SURVEY §4.1)
        **(ray_remote_args or {}),
    )
    return ds


def split_extraction_pipeline(
    pages: rd.Dataset,
    *,
    explode_threshold_pages: int | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
) -> rd.Dataset:
    """Skew-aware variant: one pipeline, two physical paths.

    PDFs estimated under the page threshold run per-document inside the actor
    pool (PagedPdfEngine — the reference's sequential path); PDFs over it are
    EXPLODED into page rows, extracted anywhere in the cluster, and
    re-combined per url. The two paths are byte-identical per url (tests), so
    the router is purely a physical-plan decision — exactly how one 100-page
    document stops dominating a block of 1-page docs at 100 TB.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..reference_semantics import estimate_page_count
    from ..stages.combine import (
        EXPLODE_THRESHOLD_PAGES,
        PagedPdfEngine,
        exploded_extraction,
    )
    from ..stages.extract import EXTRACTED_SCHEMA, METADATA_TYPE, SPAN_TYPE

    threshold = (
        EXPLODE_THRESHOLD_PAGES if explode_threshold_pages is None
        else explode_threshold_pages
    )
    # project hint columns away before anything ships to workers (same as
    # extraction_pipeline)
    schema = pages.schema(fetch_if_missing=False)
    if schema is not None and {"url", "html"} <= set(schema.names) and len(schema.names) > 2:
        pages = pages.select_columns(["url", "html"])
    # materialize before branching: both branches consume this lineage, and
    # Ray re-executes the shared read+sniff prefix per consumer otherwise.
    # (Pinned blocks spill to disk; the alternative is a second full source
    # read — for a one-pass split you would write both branches from a single
    # map_batches instead.)
    sniffed = pages.map_batches(sniff_batch, batch_format="pyarrow").materialize()

    def is_heavy(t: pa.Table) -> pa.Array:
        sizes = pc.binary_length(t["html"]).to_pylist()
        kinds = t["content_type"].to_pylist()
        return pa.array(
            [
                k == "pdf" and estimate_page_count("application/pdf", s) > threshold
                for k, s in zip(kinds, sizes)
            ]
        )

    light = sniffed.map_batches(
        lambda t: t.filter(pc.invert(is_heavy(t))), batch_format="pyarrow"
    )
    heavy = sniffed.map_batches(
        lambda t: t.filter(is_heavy(t)).select(["url", "html"]),
        batch_format="pyarrow",
    )

    from ..stages.extract import DEFAULT_ROUTE

    route = dict(DEFAULT_ROUTE)
    route["pdf"] = PagedPdfEngine  # factory-valued route: per-page semantics
    light_out = light.map_batches(
        ExtractStage,
        fn_constructor_kwargs={"route": route},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )

    def to_extracted_schema(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty_spans = pa.ListArray.from_arrays(
            pa.array([0] * (n + 1), pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.string())],
                names=["start", "end", "kind"],
            ),
        )
        meta = pa.StructArray.from_arrays(
            [
                pa.array(["paged-pdf"] * n),
                pa.array(["application/pdf"] * n),
                pa.array([""] * n),
                pa.array([str(v) for v in t["page_count"].to_pylist()]),
                pa.array([""] * n),
                pa.array([""] * n),
                pa.array([""] * n),
            ],
            names=["engine", "mime_type", "size_bytes", "page_count",
                   "processed_at", "width", "height"],
        )
        return pa.Table.from_arrays(
            [
                t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"],
                pa.array(["completed"] * n),
                t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"],
                empty_spans,
                pa.compute.cast(t["page_count"], pa.int32()).combine_chunks(),
                pa.array(["pdf"] * n),
                pa.array([""] * n),
                pa.array([0] * n, pa.int64()),
                meta,
            ],
            schema=EXTRACTED_SCHEMA,
        )

    heavy_out = exploded_extraction(heavy).map_batches(
        to_extracted_schema, batch_format="pyarrow"
    )
    return light_out.union(heavy_out)


def run_extraction(
    pages_dir: str,
    out_dir: Optional[str] = None,
    split_failed: bool = False,
    **kwargs: Any,
) -> rd.Dataset | None:
    """Convenience: read → extract → (optionally) write partitioned parquet.

    ``split_failed=True`` writes hive-partitioned by status in ONE pass —
    ``out/status=completed/`` and ``out/status=failed/`` — the reference's
    DLQ routing (openspec job-processing spec: failed jobs to a dead-letter
    subject) as a storage layout instead of a second queue."""
    ds = extraction_pipeline(read_pages(pages_dir), **kwargs)
    if out_dir is None:
        return ds
    if split_failed:
        ds.write_parquet(out_dir, partition_cols=["status"])
    else:
        ds.write_parquet(out_dir)
    return None

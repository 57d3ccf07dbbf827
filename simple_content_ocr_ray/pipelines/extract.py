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
    preset: Optional[str] = None,
    engine_config: Optional[dict[str, dict[str, Any]]] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
    row_timeout_s: Optional[float] = None,
    max_payload_bytes: Optional[int] = None,
    ray_remote_args: Optional[dict[str, Any]] = None,
) -> rd.Dataset:
    """pages(url, warc_ts, html, text, lang) → extracted(url, status, text,
    spans, page_count, content_type, error, processing_time_ms, metadata).

    ``preset="real"`` routes every content type to its REAL decoder
    (pdf-text / png-decode / jpeg-decode; stages/extract.py REAL_ROUTE) —
    the flagship configuration, matching the reference's always-real engines
    (ocr_service.py:83-108). ``preset="mock"`` (or None with no ``route``)
    keeps the byte-exact reference MockOCREngine parity route for pdf/image.

    The extract stage is an autoscaling actor pool: engines are constructed
    once per actor (heavy init amortized across batches), batches are
    zero-copy Arrow. Only (url, payload) are shipped to the actors — hint
    columns like ``text``/``lang``/``warc_ts`` are projected away first so
    they never cross the object store.
    """
    if preset is not None:
        if preset not in ("real", "mock"):
            raise ValueError(f"unknown preset {preset!r} (use 'real' or 'mock')")
        if route is not None:
            raise ValueError(
                "pass either route= or preset=, not both (a preset IS a route)"
            )
        if preset == "real":
            from ..stages.extract import REAL_ROUTE

            route = REAL_ROUTE
    payload_col = "html"
    schema = pages.schema(fetch_if_missing=False)  # never force upstream exec
    if schema is not None:
        names = schema.names
        if "url" in names and payload_col in names and len(names) > 2:
            keep = ["url", payload_col]
            if "hints" in names:  # per-row job hints ride along to the stage
                keep.append("hints")
            if set(keep) != set(names):
                pages = pages.select_columns(keep)
    ds = pages.map_batches(sniff_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        ExtractStage,
        fn_constructor_kwargs={
            "route": route,
            "engine_config": engine_config,
            "row_timeout_s": row_timeout_s,
            "max_payload_bytes": max_payload_bytes,
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
    threshold = (
        EXPLODE_THRESHOLD_PAGES if explode_threshold_pages is None
        else explode_threshold_pages
    )
    # project hint columns away before anything ships to workers (same as
    # extraction_pipeline)
    schema = pages.schema(fetch_if_missing=False)
    if schema is not None and {"url", "html"} <= set(schema.names) and len(schema.names) > 2:
        pages = pages.select_columns(["url", "html"])
    # LAZY shared prefix: the two branches each re-execute the pruned read +
    # sniff (cheap, streaming) rather than pinning the sniffed corpus in the
    # object store — at 100 TB two column-pruned source reads are strictly
    # cheaper than a full-corpus materialize/spill. For a single source pass
    # end-to-end use run_split_extraction (write-side split, below).
    sniffed = pages.map_batches(sniff_batch, batch_format="pyarrow")

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

    heavy_out = exploded_extraction(heavy).map_batches(
        combined_rows_to_extracted, batch_format="pyarrow"
    )
    return light_out.union(heavy_out)


def _empty_spans(n: int):
    import pyarrow as pa

    return pa.ListArray.from_arrays(
        pa.array([0] * (n + 1), pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.string())],
            names=["start", "end", "kind"],
        ),
    )


def combined_rows_to_extracted(t):
    """(url, text, page_count) combined-PDF rows → full EXTRACTED_SCHEMA."""
    import pyarrow as pa

    from ..stages.extract import EXTRACTED_SCHEMA

    n = t.num_rows
    meta = pa.StructArray.from_arrays(
        [
            pa.array(["paged-pdf"] * n, pa.string()),
            pa.array(["application/pdf"] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([str(v) for v in t["page_count"].to_pylist()], pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([""] * n, pa.string()),
        ],
        names=["engine", "mime_type", "size_bytes", "page_count",
               "processed_at", "width", "height"],
    )
    return pa.Table.from_arrays(
        [
            t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"],
            pa.array(["completed"] * n, pa.string()),
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            _empty_spans(n),
            pa.compute.cast(t["page_count"], pa.int32()).combine_chunks(),
            pa.array(["pdf"] * n, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([0] * n, pa.int64()),
            meta,
        ],
        schema=EXTRACTED_SCHEMA,
    )


class SplitRouterStage:
    """ONE-pass skew router for the write-side split: light rows are fully
    extracted in this actor (PagedPdfEngine semantics for light PDFs); heavy
    PDFs are exploded into UNEXTRACTED page rows. Both come out in one
    unified schema (EXTRACTED_SCHEMA + page_num + size_bytes + part) so a
    single hive-partitioned ``write_parquet(partition_cols=['part'])``
    routes them to ``part=light`` / ``part=pages`` without a second source
    pass — the Ray-native restatement of the reference's DLQ-style routing
    at the storage layer."""

    def __init__(self, explode_threshold_pages: int | None = None) -> None:
        from ..stages.combine import EXPLODE_THRESHOLD_PAGES, PagedPdfEngine
        from ..stages.extract import DEFAULT_ROUTE, ExtractStage

        route = dict(DEFAULT_ROUTE)
        route["pdf"] = PagedPdfEngine
        self._extract = ExtractStage(route=route)
        self.threshold = (
            EXPLODE_THRESHOLD_PAGES if explode_threshold_pages is None
            else explode_threshold_pages
        )

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..reference_semantics import estimate_page_count
        from ..stages.combine import MAX_PAGES_CAP
        from ..stages.extract import EXTRACTED_SCHEMA

        sizes = pc.binary_length(t["html"]).to_pylist()
        kinds = t["content_type"].to_pylist()
        heavy_mask = pa.array(
            [
                k == "pdf"
                and estimate_page_count("application/pdf", s) > self.threshold
                for k, s in zip(kinds, sizes)
            ]
        )
        light = t.filter(pc.invert(heavy_mask))
        heavy = t.filter(heavy_mask)

        out_light = self._extract(light)
        n = out_light.num_rows
        out_light = (
            out_light.append_column("page_num", pa.array([0] * n, pa.int32()))
            .append_column("size_bytes", pa.array([0] * n, pa.int64()))
            .append_column("part", pa.array(["light"] * n, pa.string()))
        )

        import numpy as np

        h_sizes = pc.binary_length(heavy["html"]).to_numpy(zero_copy_only=False)
        n_pages = np.minimum(
            MAX_PAGES_CAP,
            np.fromiter(
                (estimate_page_count("application/pdf", int(s)) for s in h_sizes),
                dtype=np.int64,
                count=len(h_sizes),
            ),
        )
        # vectorized explode: repeat urls/sizes, ragged 1..n page numbers
        urls = np.repeat(
            np.asarray(heavy["url"].to_pylist(), dtype=object), n_pages
        )
        szs = np.repeat(h_sizes.astype(np.int64), n_pages)
        total = int(n_pages.sum())
        starts = np.cumsum(n_pages) - n_pages
        nums = np.arange(total, dtype=np.int64) - np.repeat(starts, n_pages) + 1
        m = total
        meta = pa.StructArray.from_arrays(
            [pa.array([""] * m, pa.string())] * 7,
            names=["engine", "mime_type", "size_bytes", "page_count",
                   "processed_at", "width", "height"],
        )
        out_pages = pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(["pending"] * m, pa.string()),
                pa.array([""] * m, pa.string()),
                _empty_spans(m),
                pa.array([0] * m, pa.int32()),
                pa.array(["pdf"] * m, pa.string()),
                pa.array([""] * m, pa.string()),
                pa.array([0] * m, pa.int64()),
                meta,
            ],
            schema=EXTRACTED_SCHEMA,
        )
        out_pages = (
            out_pages.append_column("page_num", pa.array(nums, pa.int32()))
            .append_column("size_bytes", pa.array(szs, pa.int64()))
            .append_column("part", pa.array(["pages"] * m, pa.string()))
        )
        return pa.concat_tables([out_light, out_pages])


def run_split_extraction(
    pages_dir: str,
    out_dir: str,
    explode_threshold_pages: int | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
) -> None:
    """Skew-aware extraction with ONE streaming pass over the source.

    Pass A reads+sniffs the corpus once; ``SplitRouterStage`` extracts light
    rows inline and explodes heavy PDFs into unextracted page rows; a single
    hive-partitioned write routes them to ``{out}/part=light`` and
    ``{out}/part=pages``. Pass B re-reads ONLY the (tiny, skew-tail)
    ``part=pages`` partition, extracts pages cluster-parallel, recombines
    per url and writes ``{out}/part=heavy``. Consumers read with
    ``read_split_output``; the intermediate ``part=pages`` doubles as a
    page-granular checkpoint (a killed pass B can rerun from it without
    touching the source)."""
    import pyarrow.compute as pc

    from ..stages.combine import extract_page_rows, recombine

    pages = read_pages(pages_dir)
    schema = pages.schema(fetch_if_missing=False)
    if schema is not None and {"url", "html"} <= set(schema.names) and len(schema.names) > 2:
        pages = pages.select_columns(["url", "html"])
    unified = pages.map_batches(sniff_batch, batch_format="pyarrow").map_batches(
        SplitRouterStage,
        fn_constructor_kwargs={"explode_threshold_pages": explode_threshold_pages},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
    unified.write_parquet(out_dir, partition_cols=["part"])

    pages_part = os.path.join(out_dir, "part=pages")
    if not os.path.isdir(pages_part):
        return  # no heavy documents in this corpus — nothing to combine
    page_rows = rd.read_parquet(
        pages_part, columns=["url", "page_num", "size_bytes"]
    )
    combined = recombine(extract_page_rows(page_rows)).map_batches(
        combined_rows_to_extracted, batch_format="pyarrow"
    )

    def tag_heavy(t):
        import pyarrow as pa

        n = t.num_rows
        return (
            t.append_column("page_num", pa.array([0] * n, pa.int32()))
            .append_column("size_bytes", pa.array([0] * n, pa.int64()))
            .append_column("part", pa.array(["heavy"] * n, pa.string()))
        )

    combined.map_batches(tag_heavy, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"]
    )


def read_split_output(out_dir: str) -> rd.Dataset:
    """Final rows of a run_split_extraction output: light + combined heavy
    (the ``part=pages`` intermediate is excluded)."""
    drop = lambda t: t.drop_columns(["page_num", "size_bytes"])  # noqa: E731
    out = rd.read_parquet(os.path.join(out_dir, "part=light")).map_batches(
        drop, batch_format="pyarrow"
    )
    heavy_part = os.path.join(out_dir, "part=heavy")
    if os.path.isdir(heavy_part):
        out = out.union(
            rd.read_parquet(heavy_part).map_batches(drop, batch_format="pyarrow")
        )
    return out


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

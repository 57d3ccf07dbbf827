"""Partition-granular checkpoint manifest: resumable extraction without a
broker.

The reference gets at-least-once resumability from NATS ack bookkeeping
(/root/reference/src/simple_ocr/workers/nats_worker.py:220,238) and specifies
backfill checkpoint/resume + idempotent skip of done content
(openspec/.../specs/ocr-service/spec.md:154-166). The Ray-native restatement
(north_rule requirement):

  * the input is processed as named partitions (one partition = one input
    file / shard);
  * each finished partition is written DISTRIBUTED (``ds.write_parquet`` to
    a temp directory — blocks stream straight from the workers, the driver
    never holds partition data) and published atomically (directory rename
    ``part-<name>/``) plus a manifest row ``_manifest/<name>.json`` with
    counts, bytes, failures, and wall time (the per-partition lineage +
    metrics record); row/failure counts come from the written files' footers
    and a status-column-only scan, not from re-executing the pipeline;
  * a resumed run lists the manifest, anti-joins the partition list (J2),
    and processes only missing partitions — already-written partitions are
    byte-stable because the pipeline is deterministic.

This runs each partition as an independent Ray Data pipeline over one file
(partitions are processed serially here for bounded memory; at cluster scale
you run the same loop with ``ray job submit`` per partition range, or raise
``max_parallel_partitions``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import ray.data as rd


def _partition_name(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def list_input_partitions(pages_dir: str) -> list[str]:
    return sorted(
        os.path.join(pages_dir, f)
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )


def finished_partitions(out_dir: str) -> set[str]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    return {
        os.path.splitext(f)[0]
        for f in os.listdir(mdir)
        if f.endswith(".json") and not f.startswith("_")  # _run.json = config
    }


def read_manifest(out_dir: str) -> list[dict[str, Any]]:
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json") and not f.startswith("_"):
                with open(os.path.join(mdir, f)) as fh:
                    rows.append(json.load(fh))
    return rows


def _check_run_config(out_dir: str, cfg: dict[str, Any], force: bool) -> None:
    """Persist the run-level config (engine preset, dedup mode) in the
    manifest on first run; refuse a RESUME whose config differs — otherwise
    a run started under ``preset=mock`` resumed under ``preset=real``
    silently yields mixed mock/real output across partitions of one out_dir
    (ADVICE r3). ``force=True`` reprocesses everything, so it may also
    rewrite the config."""
    path = os.path.join(out_dir, "_manifest", "_run.json")
    if os.path.exists(path) and not force:
        with open(path) as fh:
            prev = json.load(fh)
        if prev != cfg:
            raise ValueError(
                f"resume config mismatch for {out_dir}: this run was started "
                f"with {prev}, resume requested {cfg}; rerun with the "
                "original settings or pass force=True (--force) to "
                "reprocess every partition"
            )
        return
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(cfg, fh)
    os.replace(tmp, path)


def run_partitioned_extraction(
    pages_dir: str,
    out_dir: str,
    pipeline_fn=None,
    force: bool = False,
    dedup_urls: bool = False,
    **pipeline_kwargs: Any,
) -> dict[str, Any]:
    """Process every unfinished input partition; returns a summary.

    ``pipeline_fn(dataset, **kwargs) -> dataset`` defaults to the standard
    extraction pipeline. Idempotent: re-running after a kill skips finished
    partitions (identified via the manifest) and rewrites partials atomically.
    The run-level config (preset, dedup mode) is persisted in the manifest;
    resuming with a different config raises unless ``force=True``.

    ``force=True`` is the job-level ``force`` hint (reference job-processing
    spec.md:187-190): existing derived output is ignored and every partition
    is reprocessed/republished. (Resume granularity here is the partition,
    so force is a run-level switch, not per-row.)

    ``dedup_urls=True`` claims every url through the sharded
    ``StreamingDeduper`` index BEFORE extraction, so a url appearing in
    several input partitions (recrawls) is extracted exactly once across the
    whole run — including across a kill/resume: the index is checkpointed
    after each published partition and restored on resume, and claims from
    an unpublished (reprocessed) partition are re-claimed fresh because the
    snapshot trails the publish. Per-partition survivor materialization is
    bounded by the partition, not the corpus.
    """
    from ..pipelines.extract import extraction_pipeline

    pipeline_fn = pipeline_fn or extraction_pipeline
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    _check_run_config(
        out_dir,
        {
            "preset": pipeline_kwargs.get("preset") or "mock",
            "dedup_urls": bool(dedup_urls),
        },
        force,
    )

    # sweep temp files/dirs from killed runs. Temp names start with '_' so
    # parquet readers ignore them even if a crash leaves one behind mid-write.
    import shutil

    for d in (out_dir, os.path.join(out_dir, "_manifest")):
        for f in os.listdir(d):
            if ".tmp" in f:
                p = os.path.join(d, f)
                try:
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
                except OSError:
                    pass

    mdir = os.path.join(out_dir, "_manifest")
    snap_dir = os.path.join(mdir, "_dedup_index")
    if force:
        # force invalidates ALL prior state, not just the partition list: a
        # killed force-run resumed later must not skip partitions whose
        # manifest rows (and dedup claims) came from the PREVIOUS config —
        # that silently yields mixed-config output across one out_dir.
        for f in os.listdir(mdir):
            if f.endswith(".json") and not f.startswith("_"):
                os.remove(os.path.join(mdir, f))
        for d in (snap_dir, snap_dir + ".old"):
            shutil.rmtree(d, ignore_errors=True)

    deduper = None
    if dedup_urls:
        from .dedup_index import StreamingDeduper

        deduper = StreamingDeduper.restore_available(snap_dir) or StreamingDeduper()

    done = set() if force else finished_partitions(out_dir)
    todo = [
        p for p in list_input_partitions(pages_dir) if _partition_name(p) not in done
    ]
    summary = {"skipped": len(done), "processed": 0, "rows": 0, "failed_rows": 0}

    for path in todo:
        name = _partition_name(path)
        t0 = time.time()
        src = rd.read_parquet(path)
        if deduper is not None:
            src = deduper.dedup(src, column="url")
        ds = pipeline_fn(src, **pipeline_kwargs)
        import glob

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out_path = os.path.join(out_dir, f"part-{name}")
        tmp_path = os.path.join(out_dir, f"_part-{name}.tmp.{os.getpid()}")
        # distributed write: blocks go worker → file, never through the driver
        ds.write_parquet(tmp_path)
        files = sorted(glob.glob(os.path.join(tmp_path, "*.parquet")))
        n_rows = n_failed = 0
        def footer_counts(fpaths):
            rows = failed = nbytes = 0
            for f in fpaths:
                meta = pq.read_metadata(f)  # footer only
                rows += meta.num_rows
                nbytes += os.path.getsize(f)
                if any(
                    meta.schema.column(i).name == "status"
                    for i in range(meta.num_columns)
                ):
                    status = pq.read_table(f, columns=["status"])["status"]
                    failed += pc.sum(
                        pc.cast(pc.equal(status, "failed"), "int64")
                    ).as_py() or 0
            return rows, failed, nbytes

        n_rows, n_failed, out_bytes = footer_counts(files)
        if n_rows:
            if os.path.isdir(out_path):  # crash between rename and manifest row
                shutil.rmtree(out_path)
            os.replace(tmp_path, out_path)  # atomic publish (directory rename)
        else:
            shutil.rmtree(tmp_path, ignore_errors=True)
            if deduper is not None and os.path.isdir(out_path):
                # resume after a kill between checkpoint and manifest row:
                # the rerun survives 0 urls (already claimed) but the prior
                # publish is intact — count the manifest row from it.
                n_rows, n_failed, out_bytes = footer_counts(
                    sorted(glob.glob(os.path.join(out_path, "*.parquet")))
                )
        if deduper is not None:
            # snapshot AFTER publish, BEFORE the manifest row: a kill between
            # the two makes resume reprocess this partition against the prior
            # snapshot — its urls are re-claimed fresh, never dropped.
            deduper.checkpoint(snap_dir)
        elapsed = time.time() - t0
        manifest_row = {
            "partition": name,
            "input_path": path,
            "rows": n_rows,
            "failed_rows": n_failed,
            "output_bytes": out_bytes,
            "wall_sec": round(elapsed, 3),
            "docs_per_s": round(n_rows / elapsed, 1) if elapsed > 0 else 0.0,
        }
        mtmp = os.path.join(out_dir, "_manifest", f"{name}.json.tmp.{os.getpid()}")
        with open(mtmp, "w") as fh:
            json.dump(manifest_row, fh)
        os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{name}.json"))
        summary["processed"] += 1
        summary["rows"] += n_rows
        summary["failed_rows"] += n_failed
    return summary

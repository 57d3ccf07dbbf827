"""Cluster job entrypoint — the ``ray job submit`` surface of the engine
(the north-rule launch path; the reference's analog is its NATS worker
loop, ``/root/reference/src/simple_ocr/workers/nats_worker.py``).

On a real fixed-size cluster:

    ray job submit --working-dir . -- \
        python -m simple_content_ocr_ray.job \
            --pages-dir s3://bucket/pages --out-dir s3://bucket/extracted

Differences from the interactive CLI (``python -m simple_content_ocr_ray
extract``), which this wraps:

* connects to the SUBMITTING cluster (``ray.init(address="auto")``) instead
  of starting a local session — the job runs on whatever N-node cluster the
  job server fronts; set ``RAY_ADDRESS=local`` to smoke-test the identical
  code path on one machine (tests do);
* partition-granular RESUME is the default (``state/manifest.py``): a
  killed-and-resubmitted job skips published partitions, so the job is
  idempotent at the submit level — resubmit until exit 0;
* the run summary (per-partition counts, bytes, failures, docs/s) prints as
  the job's final stdout line, and a non-zero exit marks the job failed for
  the submitter's retry loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m simple_content_ocr_ray.job",
        description="ray-job-submit entrypoint: resumable partitioned extraction",
    )
    ap.add_argument("--pages-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--preset", choices=["real", "mock"], default="real")
    ap.add_argument("--force", action="store_true", help="reprocess every partition")
    ap.add_argument(
        "--dedup-urls", action="store_true",
        help="claim urls through the sharded streaming dedup index",
    )
    ap.add_argument(
        "--wet-out", default=None,
        help="also export completed rows as Common Crawl WET shards",
    )
    args = ap.parse_args(argv)

    # workers must import this package; under `ray job submit --working-dir`
    # the runtime env ships it, under a bare test invocation cwd suffices
    os.environ.setdefault(
        "PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import ray

    owns = not ray.is_initialized()
    if owns:
        # "auto" joins the cluster that the job server submitted into;
        # RAY_ADDRESS=local (the sandbox/test default) starts one locally
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .state.manifest import run_partitioned_extraction

        summary = run_partitioned_extraction(
            args.pages_dir,
            args.out_dir,
            force=args.force,
            preset=args.preset,
            dedup_urls=args.dedup_urls,
        )
        if args.wet_out:
            import pyarrow.compute as pc
            import ray.data as rd

            from .sources.readers import write_wet

            done = rd.read_parquet(args.out_dir).map_batches(
                lambda t: t.filter(pc.equal(t["status"], "completed")),
                batch_format="pyarrow",
            )
            manifest = write_wet(done, args.wet_out, overwrite_dir=True)
            summary["wet_shards"] = len(manifest)
            summary["wet_records"] = int(manifest["n_records"].sum())
        print(json.dumps(summary))
        return 0
    except Exception as e:  # noqa: BLE001 — the submitter retries on non-zero
        print(json.dumps({"error": f"{type(e).__name__}: {e}"}), file=sys.stderr)
        return 1
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())

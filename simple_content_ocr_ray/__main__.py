"""CLI entry point — the batch analog of the reference's local runner
(examples/test_local_file.py:230-286) and worker main
(workers/nats_worker.py:305-338):

  python -m simple_content_ocr_ray extract  <pages_dir> <out_dir>
      [--resume [--force]] [--split-failed] [--split-skew]
  python -m simple_content_ocr_ray synth    <sf_dir> [--dup N]
  python -m simple_content_ocr_ray engines
  python -m simple_content_ocr_ray query    <name> [sf_dir] [--out out.parquet]
  python -m simple_content_ocr_ray queries

Owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="simple_content_ocr_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ex = sub.add_parser("extract", help="run the extraction pipeline")
    p_ex.add_argument("pages_dir")
    p_ex.add_argument("out_dir")
    p_ex.add_argument(
        "--resume",
        action="store_true",
        help="partition-granular resumable mode (manifest checkpoint)",
    )
    p_ex.add_argument(
        "--force",
        action="store_true",
        help="with --resume: ignore existing output, reprocess every partition "
        "(the job-level force hint)",
    )
    p_ex.add_argument(
        "--split-failed",
        action="store_true",
        help="hive-partition output by status (DLQ layout: status=failed/)",
    )
    p_ex.add_argument(
        "--split-skew",
        action="store_true",
        help="one-source-pass skew split: light rows extracted inline, heavy "
        "PDFs exploded via part=pages and recombined to part=heavy",
    )
    p_ex.add_argument(
        "--preset",
        choices=["real", "mock"],
        default="real",
        help="engine routing: 'real' (default) runs the real decoders on "
        "every route (pdf-text/png/jpeg/bmp/gif/tiff); 'mock' keeps the "
        "reference MockOCREngine byte-parity route for pdf/image",
    )
    p_ex.add_argument(
        "--dedup-urls",
        action="store_true",
        help="with --resume: claim urls through the sharded streaming dedup "
        "index so recrawled urls are extracted once across all partitions "
        "(index checkpointed per partition, restored on resume)",
    )
    p_ex.add_argument(
        "--wet-out",
        default=None,
        help="also export the completed rows' extracted text as "
        ".warc.wet.gz shards (Common Crawl WET framing) to this directory",
    )
    p_ex.add_argument(
        "--warc-out",
        default=None,
        help="also archive the INPUT pages (url, warc_ts, raw payload) as "
        ".warc.gz response shards (Common Crawl framing) to this directory "
        "— the raw-crawl sink pairing read_pages_from_warc",
    )
    p_ex.add_argument(
        "--wat-out",
        default=None,
        help="also export the INPUT pages' metadata sidecar (JSON envelopes "
        "with parsed head title/lang/metas and the outlink list) as "
        ".warc.wat.gz shards to this directory — pairs with read_wat_index",
    )
    p_ex.add_argument(
        "--ipc-out",
        default=None,
        help="also archive the INPUT pages as Arrow IPC (.arrow) shards — "
        "the zero-transcode handoff sink pairing read_pages_from_ipc",
    )
    p_ex.add_argument(
        "--thumbs-out",
        default=None,
        help="also write PNG thumbnails of the input's image payloads "
        "(any format in the real-decoder family) as parquet to this "
        "directory — the reference design doc's companion thumbnailer",
    )
    p_ex.add_argument("--num-cpus", type=int, default=None)

    p_sy = sub.add_parser("synth", help="synthesize the pages table from an sf dir")
    p_sy.add_argument("sf_dir")
    p_sy.add_argument("--dup", type=int, default=0)
    p_sy.add_argument(
        "--mock-payloads",
        action="store_true",
        help="magic-bytes-only pdf/image payloads (the byte-parity mock "
        "corpus); the default synthesizes REAL payloads to pair with "
        "extract's default --preset real",
    )

    sub.add_parser("engines", help="list registered extraction engines")

    p_q = sub.add_parser("query", help="run a registered pipeline/operator by name")
    p_q.add_argument("name")
    p_q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    p_q.add_argument("--out", default=None, help="write result parquet here")
    p_q.add_argument("--num-cpus", type=int, default=None)

    sub.add_parser("queries", help="list registered query names")

    p_cu = sub.add_parser(
        "curate",
        help="run the composed curation flagship (extract → quality → "
        "exact dedup → near-dup → pack → WET + manifest)",
    )
    p_cu.add_argument("pages_dir")
    p_cu.add_argument("out_dir")
    p_cu.add_argument("--num-cpus", type=int, default=None)
    p_cu.add_argument("--batch-size", type=int, default=2048)
    p_cu.add_argument(
        "--min-distinct-ratio",
        type=float,
        default=None,
        help="override the quality distinct-token-ratio floor (default "
        "0.3; scale it down for paragraph-replicated corpora)",
    )

    args = parser.parse_args(argv)

    if args.cmd == "curate":
        import ray

        owns_session = not ray.is_initialized()
        if owns_session:
            ray.init(
                address="local",
                num_cpus=args.num_cpus
                or int(os.environ.get("RAY_GRAFT_CPUS") or 0)
                or None,
                include_dashboard=False,
                logging_level="ERROR",
            )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        try:
            from .pipelines.curate import curate_at_scale

            kw = {"batch_size": args.batch_size}
            if args.min_distinct_ratio is not None:
                kw["min_distinct_ratio"] = args.min_distinct_ratio
            res = curate_at_scale(args.pages_dir, args.out_dir, **kw)
            print(
                json.dumps(
                    {
                        "stages": dict(
                            zip(
                                res["report"]["stage"],
                                (int(x) for x in res["report"]["n"]),
                            )
                        ),
                        "wet_shards": int(len(res["wet_manifest"])),
                        "out_dir": args.out_dir,
                    }
                )
            )
        finally:
            if owns_session:
                ray.shutdown()
        return 0

    if args.cmd == "queries":
        from .registry import all_queries

        print(json.dumps(sorted(all_queries())))
        return 0

    if args.cmd == "query":
        import ray

        owns_session = not ray.is_initialized()
        if owns_session:
            ray.init(
                address="local",
                num_cpus=args.num_cpus
                or int(os.environ.get("RAY_GRAFT_CPUS") or 0)
                or None,
                include_dashboard=False,
                logging_level="ERROR",
            )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        try:
            from .registry import all_queries

            qs = all_queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; see `queries`", file=sys.stderr)
                return 2
            res = qs[args.name](args.sf_dir)
            import pandas as pd

            df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            if args.out:
                df.to_parquet(args.out)
                print(json.dumps({"rows": len(df), "out": args.out}))
            else:
                print(df.head(20).to_string())
                print(json.dumps({"rows": len(df)}))
        finally:
            if owns_session:
                ray.shutdown()
        return 0

    if args.cmd == "engines":
        from .stages.engines import list_engines

        print(json.dumps(list_engines()))
        return 0

    if args.cmd == "synth":
        from .sources.synth_pages import synth_pages_parquet

        print(
            synth_pages_parquet(
                args.sf_dir,
                duplicate_every=args.dup,
                real_payloads=not args.mock_payloads,
            )
        )
        return 0

    # extract — owns the Ray session
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus or int(os.environ.get("RAY_GRAFT_CPUS") or 0) or None,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if args.wet_out and args.split_skew:
        print(
            "--wet-out is not supported with --split-skew "
            "(the skew layout holds page rows, not final documents)",
            file=sys.stderr,
        )
        return 2

    def export_wet(summary: dict) -> None:
        """Completed rows → WET shards; supported after plain AND resumed
        runs (both layouts carry the status column)."""
        if not args.wet_out:
            return
        import pyarrow.compute as pc
        import ray.data as rd

        from .sources.readers import write_wet

        done = rd.read_parquet(args.out_dir).map_batches(
            lambda t: t.filter(pc.equal(t["status"], "completed")),
            batch_format="pyarrow",
        )
        manifest = write_wet(done, args.wet_out, overwrite_dir=True)
        summary["wet_out"] = args.wet_out
        summary["wet_shards"] = len(manifest)
        summary["wet_records"] = int(manifest["n_records"].sum())

    def export_warc(summary: dict) -> None:
        """Raw input pages → WARC response shards (works with every run
        layout — it reads the INPUT, not the extraction output)."""
        if not getattr(args, "warc_out", None):
            return
        import ray.data as rd

        from .sources.readers import write_warc

        pages = rd.read_parquet(args.pages_dir)
        manifest = write_warc(pages, args.warc_out, overwrite_dir=True)
        summary["warc_out"] = args.warc_out
        summary["warc_shards"] = len(manifest)
        summary["warc_records"] = int(manifest["n_records"].sum())

    def export_wat(summary: dict) -> None:
        """Input pages → WAT metadata shards (reads the INPUT, works with
        every run layout)."""
        if not getattr(args, "wat_out", None):
            return
        import ray.data as rd

        from .sources.readers import write_wat

        pages = rd.read_parquet(args.pages_dir)
        manifest = write_wat(pages, args.wat_out, overwrite_dir=True)
        summary["wat_out"] = args.wat_out
        summary["wat_shards"] = len(manifest)
        summary["wat_records"] = int(manifest["n_records"].sum())

    def export_ipc(summary: dict) -> None:
        """Input pages → Arrow IPC shards (reads the INPUT, works with
        every run layout)."""
        if not getattr(args, "ipc_out", None):
            return
        import ray.data as rd

        from .sources.readers import write_ipc

        pages = rd.read_parquet(args.pages_dir)
        manifest = write_ipc(pages, args.ipc_out, overwrite_dir=True)
        summary["ipc_out"] = args.ipc_out
        summary["ipc_shards"] = len(manifest)
        summary["ipc_records"] = int(manifest["n_records"].sum())

    def export_thumbs(summary: dict) -> None:
        """Input image payloads → PNG thumbnail parquet (reads the INPUT,
        works with every run layout)."""
        if not getattr(args, "thumbs_out", None):
            return
        import pandas as pd
        import ray.data as rd

        from .stages.media import ImageThumbnailStage

        magics = (b"\x89PNG", b"\xff\xd8", b"BM", b"GIF8", b"II*\x00", b"MM\x00*", b"RIFF")

        def images_only(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["html"].map(
                lambda b: isinstance(b, (bytes, bytearray))
                and bytes(b).startswith(magics)
            )
            out = df.loc[keep, ["url", "html"]].rename(columns={"html": "png"})
            return out

        thumbs = (
            rd.read_parquet(args.pages_dir, columns=["url", "html"])
            .map_batches(images_only, batch_format="pandas")
            .map_batches(ImageThumbnailStage, batch_format="pandas", concurrency=2)
        )
        thumbs.write_parquet(args.thumbs_out)
        summary["thumbs_out"] = args.thumbs_out

    try:
        if args.resume:
            from .state.manifest import run_partitioned_extraction

            summary = run_partitioned_extraction(
                args.pages_dir, args.out_dir, force=args.force,
                preset=args.preset, dedup_urls=args.dedup_urls,
            )
            export_wet(summary)
            export_warc(summary)
            export_wat(summary)
            export_ipc(summary)
            export_thumbs(summary)
            print(json.dumps(summary))
        elif args.split_skew:
            from .pipelines.extract import run_split_extraction

            run_split_extraction(args.pages_dir, args.out_dir)
            summary = {"out_dir": args.out_dir, "layout": "part=light|pages|heavy"}
            export_warc(summary)
            export_wat(summary)
            export_ipc(summary)
            export_thumbs(summary)
            print(json.dumps(summary))
        else:
            from .pipelines.extract import run_extraction

            run_extraction(
                args.pages_dir,
                args.out_dir,
                split_failed=args.split_failed,
                preset=args.preset,
            )
            summary = {"out_dir": args.out_dir, "preset": args.preset}
            export_wet(summary)
            export_warc(summary)
            export_wat(summary)
            export_ipc(summary)
            export_thumbs(summary)
            print(json.dumps(summary))
    finally:
        if owns_session:
            ray.shutdown()  # never tear down a caller-owned session
    return 0


if __name__ == "__main__":
    sys.exit(main())

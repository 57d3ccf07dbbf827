"""Per-stage audit of the headline extraction pipeline: runs it over a
synthesized pages corpus and prints Ray Data's operator-level stats
(wall time, CPU time, rows, memory) so regressions in any stage are visible.

Usage: python tools/stage_audit.py [sf_dir] [n_pages]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS") or 8),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_content_ocr_ray.pipelines.extract import (
        extraction_pipeline,
        read_pages,
    )
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages_dir = synth_pages_parquet(sf_dir)
    out = "/tmp/scor_stage_audit_out"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    ds = extraction_pipeline(read_pages(pages_dir))
    ds.write_parquet(out)
    print(ds.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

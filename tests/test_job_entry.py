"""python -m simple_content_ocr_ray.job — the ray-job-submit entrypoint:
runs the resumable partitioned extraction inside an existing Ray session
(the submitted cluster), prints a JSON summary, and a resubmitted job
skips published partitions (idempotent at the submit level)."""

from __future__ import annotations

import json

from simple_content_ocr_ray.job import main
from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

SF = "/root/testdata/sf0.001"


def test_job_runs_and_resubmit_skips(ray_session, tmp_path, capsys):
    pages = synth_pages_parquet(SF)
    out = str(tmp_path / "extracted")

    assert main(["--pages-dir", pages, "--out-dir", out]) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["rows"] == 500
    assert s1["skipped"] == 0 and s1["processed"] > 0

    # resubmit: every partition already published → all skipped
    assert main(["--pages-dir", pages, "--out-dir", out]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["processed"] == 0
    assert s2["skipped"] == s1["processed"]


def test_job_bad_input_exits_nonzero(ray_session, tmp_path, capsys):
    rc = main(
        ["--pages-dir", str(tmp_path / "nope"), "--out-dir", str(tmp_path / "o")]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "error" in err

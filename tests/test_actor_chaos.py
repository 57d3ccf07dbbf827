"""In-flight worker-loss chaos test: SIGKILL one extractor-pool actor
PROCESS while the flagship pipeline is mid-run and assert the run still
completes with output identical to an undisturbed run.

This is the intra-partition half of the fault story — the partition
manifest (test_combine_resume) covers DRIVER death between partitions;
here a WORKER dies inside one partition's execution and Ray Data's task
retry + actor replacement must absorb it (north_rule: fixed multi-node
cluster at 10^12 docs — worker loss is routine, not exceptional).
"""

import os
import signal
import threading
import time

import pandas as pd


def _run(pages, **kw):
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    out = extraction_pipeline(pages, preset="real", batch_size=64, **kw)
    df = out.to_pandas()[["url", "status", "text"]]
    return df.sort_values("url").reset_index(drop=True)


def _extract_worker_pids() -> list[int]:
    import ray

    # GCS-backed actor table (the dashboard state API is disabled here)
    pids = []
    for info in ray._private.state.actors().values():
        if (
            info.get("State") == "ALIVE"
            and "ExtractStage" in info.get("ActorClassName", "")
            and info.get("Pid")
        ):
            pids.append(int(info["Pid"]))
    return pids


def test_pipeline_survives_actor_sigkill(pages_dir, ray_session):
    import ray.data as rd

    # ~8k rows: long enough that the kill lands mid-run, short enough for CI
    base = rd.read_parquet(pages_dir).to_pandas()
    big = pd.concat(
        [base.assign(url=base["url"] + f"?rep={i}") for i in range(16)],
        ignore_index=True,
    )
    pages = rd.from_pandas(big).repartition(32)

    expected = _run(rd.from_pandas(big).repartition(32), concurrency=(2, 2))

    killed = {"pid": None}

    def killer():
        deadline = time.time() + 60
        while time.time() < deadline:
            pids = _extract_worker_pids()
            if pids:
                time.sleep(0.3)  # let it pick up in-flight work first
                try:
                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                except OSError:
                    continue
                return
            time.sleep(0.05)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    got = _run(pages, concurrency=(2, 2))
    t.join(timeout=65)

    assert killed["pid"] is not None, "chaos kill never fired — test is vacuous"
    # the killed pid was really one of ours and is really gone
    assert killed["pid"] != os.getpid()
    pd.testing.assert_frame_equal(got, expected)
    # failed ROWS (garbage-payload class) are identical too — the kill did
    # not convert retryable task loss into extra failed rows
    assert (got["status"] == "failed").sum() == (
        expected["status"] == "failed"
    ).sum()

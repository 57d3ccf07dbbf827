"""Skew / heavy-document fixture (FIXTURES.md §5): a few rows carry payloads
100-1000× the median; the pipeline must complete with failed-row containment
intact and the explode path must cap pages at MAX_PAGES_CAP."""

import pyarrow as pa
import ray.data as rd

from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
from simple_content_ocr_ray.stages.combine import MAX_PAGES_CAP, exploded_extraction


def _skewed_table() -> pa.Table:
    urls, payloads = [], []
    for i in range(200):
        urls.append(f"https://small.example/{i:06d}")
        payloads.append(b"%PDF-1.4\n" + b"x" * 2_000)  # ~2 KB
    # two heavy hitters: ~2 MB and ~8 MB (≫ 100 pages estimated)
    urls.append("https://heavy.example/1")
    payloads.append(b"%PDF-1.4\n" + b"x" * (2 * 1024 * 1024))
    urls.append("https://heavy.example/2")
    payloads.append(b"%PDF-1.4\n" + b"x" * (8 * 1024 * 1024))
    return pa.table({"url": pa.array(urls), "html": pa.array(payloads, pa.binary())})


def test_pipeline_handles_heavy_docs():
    t = _skewed_table()
    out = extraction_pipeline(
        rd.from_arrow(t).repartition(4), batch_size=32, concurrency=(1, 2)
    ).take_all()
    assert len(out) == t.num_rows
    by_url = {r["url"]: r for r in out}
    assert by_url["https://heavy.example/2"]["status"] == "completed"
    # size-based estimate: 8 MB / 50 KB ≈ 163 pages (mock path, uncapped)
    assert by_url["https://heavy.example/2"]["page_count"] > 100


def test_explode_path_caps_pages():
    t = _skewed_table()
    out = exploded_extraction(rd.from_arrow(t).repartition(4)).take_all()
    by_url = {r["url"]: r for r in out}
    assert by_url["https://heavy.example/2"]["page_count"] == MAX_PAGES_CAP
    assert by_url["https://heavy.example/1"]["page_count"] <= MAX_PAGES_CAP
    # heavy docs recombine byte-stably: last page marker present
    assert f"<!-- Page {MAX_PAGES_CAP} -->" in by_url["https://heavy.example/2"]["text"]
    assert len(out) == t.num_rows


def test_row_timeout_produces_failed_row():
    """A hung engine call becomes a failed ROW (straggler guard), not a hung
    task — a daemon watchdog thread enforces the deadline (Ray actor UDFs run
    off the main thread, so SIGALRM is not available), and the stage rebuilds
    the engine afterwards because the abandoned thread may still mutate it."""
    from simple_content_ocr_ray.stages.engines import EngineResult, register_engine

    class SlowEngine:
        def __init__(self, sleep_s: float = 2.0):
            self.sleep_s = sleep_s
            self.n = 0

        def extract(self, url, payload, content_type):
            self.n += 1
            if self.n % 2 == 0:  # every other row hangs
                import time

                time.sleep(self.sleep_s)
            return EngineResult(text="fast enough")

    register_engine("slow", SlowEngine)  # driver-side registry (extension API)
    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(6)]),
            "html": pa.array([b"<!doctype html><html><body></body></html>"] * 6, pa.binary()),
        }
    )
    out = extraction_pipeline(
        rd.from_arrow(t),
        route={"html": SlowEngine},  # factory travels by value to workers
        row_timeout_s=0.3,
        batch_size=8,
        concurrency=1,
    ).take_all()
    statuses = [r["status"] for r in sorted(out, key=lambda r: r["url"])]
    assert statuses.count("failed") == 3
    failed = [r for r in out if r["status"] == "failed"]
    assert all("timeout" in r["error"].lower() for r in failed)
    ok = [r for r in out if r["status"] == "completed"]
    assert all(r["text"] == "fast enough" for r in ok)


def test_one_pass_split_write_matches_pipeline(tmp_path):
    """run_split_extraction (single source pass, hive-partitioned routing,
    then a pages-only combine pass) must produce byte-identical rows to the
    lazy two-branch split_extraction_pipeline — at both a threshold with no
    heavy docs and one where every PDF takes the explode path."""
    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract import (
        read_pages,
        read_split_output,
        run_split_extraction,
        split_extraction_pipeline,
    )
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages_dir = synth_pages_parquet("/root/testdata/sf0.001")
    cols = ["url", "status", "text", "page_count", "content_type", "error"]
    for thr in (None, 0):
        out = str(tmp_path / f"split_{thr}")
        run_split_extraction(pages_dir, out, explode_threshold_pages=thr)
        a = (
            read_split_output(out).to_pandas()[cols]
            .sort_values("url").reset_index(drop=True)
        )
        b = (
            split_extraction_pipeline(
                read_pages(pages_dir), explode_threshold_pages=thr
            ).to_pandas()[cols]
            .sort_values("url").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_engine_instance_rebuilt_after_timeout():
    """After a row timeout the stage must swap in a fresh engine instance —
    the abandoned watchdog thread may still be mutating the old one."""
    import time as _time

    from simple_content_ocr_ray.stages.engines import EngineResult
    from simple_content_ocr_ray.stages.extract import ExtractStage

    class HangOnce:
        calls = 0

        def extract(self, url, payload, content_type):
            HangOnce.calls += 1
            if HangOnce.calls == 1:
                _time.sleep(1.0)
            return EngineResult(text="ok")

    stage = ExtractStage(route={"html": HangOnce}, row_timeout_s=0.2)
    before = id(stage._engines["html"])
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "html": pa.array([b"x", b"y"], pa.binary()),
            "content_type": pa.array(["html", "html"]),
        }
    )
    out = stage(batch).to_pylist()
    assert out[0]["status"] == "failed" and "timeout" in out[0]["error"].lower()
    assert out[1]["status"] == "completed"
    assert id(stage._engines["html"]) != before
    # failure metadata parity: pinned timestamp + page_count present
    from simple_content_ocr_ray import PIN_PROCESSED_AT

    assert out[0]["metadata"]["processed_at"] == PIN_PROCESSED_AT
    assert out[0]["metadata"]["page_count"] == "1"

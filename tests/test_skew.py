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

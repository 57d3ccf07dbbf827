"""Explode/recombine byte-identity + manifest resume tests."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from simple_content_ocr_ray.stages.combine import (
    exploded_extraction,
    paged_extract_row,
)
from simple_content_ocr_ray.state.manifest import (
    finished_partitions,
    read_manifest,
    run_partitioned_extraction,
)


def _pdf_docs(pages_table) -> pa.Table:
    mask = [p.startswith(b"%PDF") for p in pages_table["html"].to_pylist()]
    return pages_table.filter(pa.array(mask)).select(["url", "html"])


def test_exploded_equals_single_worker_path(pages_table):
    """The distributed explode → shuffle → recombine path must be
    byte-identical to the sequential per-document path (M5+M8 invariant)."""
    docs = _pdf_docs(pages_table)
    expected = {
        url: paged_extract_row(url, payload)
        for url, payload in zip(docs["url"].to_pylist(), docs["html"].to_pylist())
    }
    out = exploded_extraction(rd.from_arrow(docs).repartition(5)).take_all()
    assert len(out) == len(expected)
    for row in out:
        exp_text, exp_pages = expected[row["url"]]
        assert row["text"] == exp_text, row["url"]
        assert row["page_count"] == exp_pages


def test_multi_page_combine_has_separators(pages_table):
    # synthesize a heavy doc: 200 KB pdf-like payload → 4 pages
    heavy = pa.table(
        {
            "url": pa.array(["https://heavy.example/1"], pa.string()),
            "html": pa.array([b"%PDF-1.4\n" + b"x" * (200 * 1024)], pa.binary()),
        }
    )
    out = exploded_extraction(rd.from_arrow(heavy)).take_all()
    assert len(out) == 1
    text = out[0]["text"]
    assert out[0]["page_count"] == 4
    assert text.count("\n\n---\n\n") == 3
    assert "<!-- Page 4 -->" in text
    assert "<!-- Page 1 -->" not in text  # first page has no marker


def test_partitioned_resume(pages_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    s1 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s1["processed"] > 0 and s1["skipped"] == 0
    n_parts = s1["processed"]
    manifest = read_manifest(out_dir)
    assert len(manifest) == n_parts
    assert all(m["rows"] > 0 and m["wall_sec"] > 0 for m in manifest)

    # full rerun: everything skipped, nothing reprocessed
    s2 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s2["processed"] == 0 and s2["skipped"] == n_parts

    # simulate a killed run: delete one manifest row + its output
    victim = manifest[0]["partition"]
    os.remove(os.path.join(out_dir, "_manifest", f"{victim}.json"))
    os.remove(os.path.join(out_dir, f"part-{victim}.parquet"))
    s3 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s3["processed"] == 1 and s3["skipped"] == n_parts - 1
    assert victim in finished_partitions(out_dir)

    # resumed union is complete and matches the input row count
    back = rd.read_parquet(out_dir)
    n_in = rd.read_parquet(pages_dir).count()
    assert back.count() == n_in


def test_manifest_counts_failures(pages_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    manifest = read_manifest(out_dir)
    assert sum(m["failed_rows"] for m in manifest) > 0  # the garbage class

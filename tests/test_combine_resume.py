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

    # simulate a killed run: delete one manifest row + its output directory
    import shutil

    victim = manifest[0]["partition"]
    os.remove(os.path.join(out_dir, "_manifest", f"{victim}.json"))
    shutil.rmtree(os.path.join(out_dir, f"part-{victim}"))
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


def test_split_pipeline_routes_both_paths_byte_identically(pages_table):
    """The size-threshold router: light PDFs extract in-worker, heavy PDFs via
    explode/shuffle — all byte-identical to the sequential reference path."""
    from simple_content_ocr_ray.pipelines.extract import split_extraction_pipeline

    # mix the synth pages with two heavy pdfs (4 and 6 estimated pages)
    heavy = pa.table(
        {
            "url": pa.array(["https://heavy.example/a", "https://heavy.example/b"]),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array(
                [b"%PDF-1.4\n" + b"x" * (210 * 1024), b"%PDF-1.4\n" + b"x" * (310 * 1024)],
                pa.binary(),
            ),
            "text": pa.array(["", ""]),
            "lang": pa.array(["en", "en"]),
        }
    )
    mixed = pa.concat_tables([pages_table, heavy])
    out = split_extraction_pipeline(
        rd.from_arrow(mixed).repartition(4), concurrency=(1, 2)
    ).take_all()
    assert len(out) == mixed.num_rows
    by_url = {r["url"]: r for r in out}
    # heavy docs went through explode/recombine
    assert by_url["https://heavy.example/b"]["page_count"] == 6
    assert "<!-- Page 6 -->" in by_url["https://heavy.example/b"]["text"]
    # every pdf (light or heavy) matches the sequential per-page anchor
    for url, payload, ctype in zip(
        mixed["url"].to_pylist(),
        mixed["html"].to_pylist(),
        [None] * mixed.num_rows,
    ):
        if payload.startswith(b"%PDF"):
            exp_text, exp_pages = paged_extract_row(url, payload)
            assert by_url[url]["text"] == exp_text, url
            assert by_url[url]["page_count"] == exp_pages
    # html rows still byte-exact vs the documents text
    texts = dict(zip(pages_table["url"].to_pylist(), pages_table["text"].to_pylist()))
    for url, expected in texts.items():
        if expected:
            assert by_url[url]["text"] == expected


def test_resume_cleans_stale_tmp_files(pages_dir, tmp_path):
    """A run killed mid-write leaves a tmp partition directory; resume must
    sweep it and never double-count (tmp names are '_'-prefixed so parquet
    readers ignore them even before the sweep)."""
    import glob
    import shutil

    out_dir = str(tmp_path / "out3")
    run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    part = sorted(glob.glob(os.path.join(out_dir, "part-*")))[0]
    name = os.path.basename(part)[len("part-") :]
    # simulate the kill: stale duplicate tmp dir + missing manifest row
    shutil.copytree(part, os.path.join(out_dir, f"_part-{name}.tmp.99999"))
    os.remove(os.path.join(out_dir, "_manifest", f"{name}.json"))
    s = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s["processed"] == 1
    assert not glob.glob(os.path.join(out_dir, "*tmp*"))
    assert rd.read_parquet(out_dir).count() == rd.read_parquet(pages_dir).count()


def test_resume_recovers_unpublished_partition(pages_dir, tmp_path):
    """Crash BETWEEN directory publish and manifest write: the partition dir
    exists but no manifest row — resume must reprocess and republish it
    without double-counting rows."""
    import glob
    import shutil

    out_dir = str(tmp_path / "out4")
    run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    part = sorted(glob.glob(os.path.join(out_dir, "part-*")))[0]
    name = os.path.basename(part)[len("part-") :]
    os.remove(os.path.join(out_dir, "_manifest", f"{name}.json"))  # dir stays
    s = run_partitioned_extraction(pages_dir, out_dir, concurrency=2)
    assert s["processed"] == 1
    assert rd.read_parquet(out_dir).count() == rd.read_parquet(pages_dir).count()


def test_resume_preset_mismatch_raises(pages_dir, tmp_path):
    """The manifest records the preset; resuming under a different preset
    must fail instead of silently mixing mock/real partitions (ADVICE r3)."""
    import pytest

    out_dir = str(tmp_path / "out_preset")
    run_partitioned_extraction(pages_dir, out_dir, concurrency=2, preset="mock")
    with pytest.raises(ValueError, match="config mismatch"):
        run_partitioned_extraction(pages_dir, out_dir, concurrency=2, preset="real")
    # force reprocesses everything and may change the recorded config
    s = run_partitioned_extraction(
        pages_dir, out_dir, concurrency=2, preset="real", force=True
    )
    assert s["processed"] > 0
    # subsequent resume under the new preset is clean
    s2 = run_partitioned_extraction(pages_dir, out_dir, concurrency=2, preset="real")
    assert s2["processed"] == 0


def _two_partition_pages(tmp_path) -> str:
    """Two input partitions sharing urls B and C (recrawl overlap)."""
    import pyarrow.parquet as pq

    d = tmp_path / "pages_dup"
    d.mkdir()
    mk = lambda urls: pa.table(  # noqa: E731
        {
            "url": pa.array([f"https://ex.com/{u}" for u in urls], pa.string()),
            "html": pa.array(
                [f"<html><body><p>doc {u} body text</p></body></html>".encode()
                 for u in urls],
                pa.binary(),
            ),
        }
    )
    pq.write_table(mk(["a", "b", "c"]), str(d / "p1.parquet"))
    pq.write_table(mk(["b", "c", "d"]), str(d / "p2.parquet"))
    return str(d)


def test_dedup_urls_across_partitions(pages_dir, tmp_path):
    """dedup_urls=True: a url present in several input partitions is
    extracted exactly once across the whole run."""
    src = _two_partition_pages(tmp_path)
    out_dir = str(tmp_path / "out_dd")
    s = run_partitioned_extraction(src, out_dir, concurrency=2, dedup_urls=True)
    assert s["processed"] == 2
    urls = [r["url"] for r in rd.read_parquet(out_dir).take_all()]
    assert sorted(urls) == sorted(
        f"https://ex.com/{u}" for u in ["a", "b", "c", "d"]
    )


def test_dedup_urls_survives_kill_and_resume(tmp_path):
    """Kill the run after partition 1 commits; the resumed run restores the
    checkpointed index, so partition 2 still drops the urls partition 1
    already claimed — each url extracted exactly once across kill+resume."""
    import pytest

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    src = _two_partition_pages(tmp_path)
    out_dir = str(tmp_path / "out_ddk")
    calls = {"n": 0}

    def dying_pipeline(ds, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated kill before partition 2")
        return extraction_pipeline(ds, **kw)

    with pytest.raises(RuntimeError, match="simulated kill"):
        run_partitioned_extraction(
            src, out_dir, pipeline_fn=dying_pipeline, dedup_urls=True
        )
    assert len(finished_partitions(out_dir)) == 1

    # resume with the standard pipeline (config unchanged → no mismatch)
    s = run_partitioned_extraction(src, out_dir, dedup_urls=True)
    assert s["skipped"] == 1 and s["processed"] == 1
    urls = [r["url"] for r in rd.read_parquet(out_dir).take_all()]
    assert sorted(urls) == sorted(
        f"https://ex.com/{u}" for u in ["a", "b", "c", "d"]
    )
    manifest = read_manifest(out_dir)
    assert sum(m["rows"] for m in manifest) == 4


def test_killed_force_run_resumed_without_force(tmp_path):
    """force invalidates ALL prior manifest rows up front: a force run
    killed mid-way and resumed WITHOUT --force must reprocess the
    partitions the old config produced, not skip them (mixed mock/real
    output otherwise)."""
    import pyarrow.parquet as pq
    import pytest

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.stages.pdf_text import make_minimal_pdf

    d = tmp_path / "pages_pdf"
    d.mkdir()
    for i, name in enumerate(["p1", "p2"]):
        t = pa.table(
            {
                "url": [f"https://ex.com/{name}"],
                "html": [make_minimal_pdf([[f"real text {i}"]])],
            }
        )
        pq.write_table(t, str(d / f"{name}.parquet"))
    out_dir = str(tmp_path / "out_force")

    # run 1: mock preset everywhere
    run_partitioned_extraction(str(d), out_dir, preset="mock")
    texts = [r["text"] for r in rd.read_parquet(out_dir).take_all()]
    assert all("Mock OCR" in t or "#" in t for t in texts)  # mock markdown

    # run 2: --force --preset real, killed after partition 1
    calls = {"n": 0}

    def dying(ds, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("kill")
        return extraction_pipeline(ds, **kw)

    with pytest.raises(RuntimeError):
        run_partitioned_extraction(
            str(d), out_dir, pipeline_fn=dying, preset="real", force=True
        )
    # stale mock-era manifest rows must be gone: only p1's new row exists
    assert finished_partitions(out_dir) == {"p1"}

    # run 3: resume WITHOUT force under the new config
    s = run_partitioned_extraction(str(d), out_dir, preset="real")
    assert s["processed"] == 1 and s["skipped"] == 1
    rows = {r["url"]: r for r in rd.read_parquet(out_dir).take_all()}
    for i, name in enumerate(["p1", "p2"]):
        assert rows[f"https://ex.com/{name}"]["text"] == f"real text {i}"


def test_incremental_extract_reuses_unchanged(ray_session, sf_dir):
    """Incremental refresh: unchanged urls carry the previous run's text
    (reused=1) and only recrawled-changed urls pass through the engine."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        RECRAWL_EVERY,
        incremental_extract,
    )
    from simple_content_ocr_ray.sources.synth_pages import (
        RECRAWL_RESIDUE,
        RECRAWL_SUFFIX,
        payload_class,
    )

    out = incremental_extract(sf_dir)
    assert len(out) > 0
    did = out["url"].str.extract(r"/(\d{8})$", expand=False).astype(int)
    changed = did % RECRAWL_EVERY == RECRAWL_RESIDUE
    assert (out.loc[changed, "reused"] == 0).all()
    assert (out.loc[~changed, "reused"] == 1).all()
    assert changed.any() and (~changed).any()
    assert out.loc[changed, "text"].str.endswith(RECRAWL_SUFFIX).all()
    assert all(payload_class(d) == "html" for d in did)

    # second run hits the cached previous artifact and is identical
    again = incremental_extract(sf_dir)
    assert again.equals(out)

"""End-to-end: the Ray Data pipeline must produce byte-identical rows to the
plain-Python reference-semantics oracle at several parallelism/partitioning
settings (SURVEY.md §5 rebuild test plan)."""

import pyarrow as pa
import pytest
import ray.data as rd

from simple_content_ocr_ray.pipelines.extract import extraction_pipeline, read_pages
from simple_content_ocr_ray.reference_semantics import extract_row


@pytest.fixture(scope="module")
def oracle_rows(pages_table):
    rows = {}
    for url, payload in zip(
        pages_table["url"].to_pylist(), pages_table["html"].to_pylist()
    ):
        rows[url] = extract_row(url, payload)
    return rows


def _check_against_oracle(out: pa.Table, oracle_rows):
    assert out.num_rows == len(oracle_rows)
    got = {r["url"]: r for r in out.to_pylist()}
    assert set(got) == set(oracle_rows)
    for url, exp in oracle_rows.items():
        g = got[url]
        assert g["status"] == exp["status"], url
        assert g["text"] == exp["text"], url  # byte-identical text per url
        assert g["page_count"] == exp["page_count"], url
        assert g["content_type"] == exp["content_type"], url
        assert g["error"] == exp["error"], url
        assert g["spans"] == exp["spans"], url
        # FULL metadata parity, including the failure path (page_count "1",
        # pinned processed_at) — width/height are pipeline-only extras that
        # default to "" when the oracle doesn't set them
        for k in g["metadata"]:
            assert g["metadata"][k] == exp["metadata"].get(k, ""), (url, k)


@pytest.mark.parametrize("nblocks,batch_size", [(1, 1024), (7, 64), (16, 16)])
def test_pipeline_matches_oracle(pages_table, oracle_rows, nblocks, batch_size):
    ds = rd.from_arrow(pages_table).repartition(nblocks)
    out = extraction_pipeline(
        ds, batch_size=batch_size, concurrency=(1, 2)
    ).to_arrow_refs()
    import ray

    tables = [ray.get(ref) for ref in out]
    combined = pa.concat_tables([t for t in tables if t.num_rows])
    _check_against_oracle(combined, oracle_rows)


def test_pipeline_from_parquet_dir(pages_dir, oracle_rows):
    ds = read_pages(pages_dir)
    out = extraction_pipeline(ds, concurrency=2)
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_size=4096, batch_format="pyarrow")]
    )
    _check_against_oracle(tbl, oracle_rows)


def test_failed_rows_do_not_kill_blocks(pages_table):
    # Route everything to a mock engine that fails every 3rd call: the
    # pipeline must still emit one row per input with mixed statuses.
    ds = rd.from_arrow(pages_table.select(["url", "html"]))
    out = extraction_pipeline(
        ds,
        route={"html": "mock", "pdf": "mock", "png": "mock"},
        engine_config={"mock": {"fail_every": 3}},
        concurrency=(1, 2),
    )
    counts = dict(
        (r["status"], r["count()"]) for r in out.groupby("status").count().take_all()
    )
    assert counts.get("failed", 0) > 0
    assert counts.get("completed", 0) > 0
    assert sum(counts.values()) == pages_table.num_rows


def test_write_parquet_roundtrip(pages_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    ds = extraction_pipeline(read_pages(pages_dir), concurrency=2)
    ds.write_parquet(out_dir)
    back = rd.read_parquet(out_dir)
    assert back.count() == read_pages(pages_dir).count()
    schema = back.schema()
    assert "text" in schema.names and "spans" in schema.names


def test_dlq_split_write(pages_dir, tmp_path):
    """D5: failed rows land under a separate status partition in one pass."""
    import os

    from simple_content_ocr_ray.pipelines.extract import run_extraction

    out_dir = str(tmp_path / "dlq")
    run_extraction(pages_dir, out_dir, split_failed=True, concurrency=2)
    assert os.path.isdir(os.path.join(out_dir, "status=completed"))
    assert os.path.isdir(os.path.join(out_dir, "status=failed"))
    failed = rd.read_parquet(os.path.join(out_dir, "status=failed"))
    completed = rd.read_parquet(os.path.join(out_dir, "status=completed"))
    n_in = rd.read_parquet(pages_dir).count()
    assert failed.count() + completed.count() == n_in
    assert failed.count() == n_in // 20  # the 5% garbage class


def test_latest_page_text_recrawl_semantics(ray_session):
    """Both latest-snapshot paths (broadcast map, distributed hash join)
    agree, and every recrawled url carries the NEWER text."""
    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract_queries import (
        RECRAWL_EVERY,
        latest_page_text,
    )
    from simple_content_ocr_ray.sources.synth_pages import (
        RECRAWL_RESIDUE,
        RECRAWL_SUFFIX,
        url_for,
    )

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        return ds.to_pandas().sort_values("url").reset_index(drop=True)

    a = norm(latest_page_text(sf))
    b = norm(latest_page_text(sf, broadcast_max_urls=0))  # force the join path
    pd.testing.assert_frame_equal(a, b)

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = a.set_index("url")["text"]
    checked_recrawled = checked_plain = 0
    for _, row in docs.iterrows():
        d = int(row["doc_id"])
        if d % 20 in (0, 1, 2, 3):
            continue  # non-html routes
        if d % RECRAWL_EVERY == RECRAWL_RESIDUE:
            assert got[url_for(d)] == row["text"] + RECRAWL_SUFFIX
            checked_recrawled += 1
        else:
            assert got[url_for(d)] == row["text"]
            checked_plain += 1
    assert checked_recrawled > 0 and checked_plain > 0


def test_snapshot_change_rate_classifies_recrawls(ray_session):
    """Changed (suffix) re-crawls of HTML pages count as changed; no-op
    re-crawls and non-HTML re-crawls (empty text both snapshots) do not —
    checked against a brute-force pandas recomputation over the pages table."""
    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract_queries import (
        RECRAWL_EVERY,
        snapshot_change_rate,
    )
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    sf = "/root/testdata/sf0.001"
    got = snapshot_change_rate(sf)
    assert list(got.columns) == ["domain", "n_recrawled", "n_changed", "change_rate"]
    assert (got["n_recrawled"] >= got["n_changed"]).all()

    pages_dir = synth_pages_parquet(
        sf, recrawl_every=RECRAWL_EVERY, recrawl_same_every=RECRAWL_EVERY
    )
    pages = pd.read_parquet(pages_dir, columns=["url", "text"])
    per_url = pages.groupby("url")["text"].agg(["count", "nunique"])
    rec = per_url[per_url["count"] > 1]
    assert len(rec) > 0 and (rec["nunique"] > 1).any() and (rec["nunique"] == 1).any()
    dom = rec.index.str.extract(r"^https?://([^/]+)", expand=False)
    exp = (
        pd.DataFrame({"domain": dom, "changed": (rec["nunique"] > 1).to_numpy()})
        .groupby("domain")
        .agg(n_recrawled=("changed", "size"), n_changed=("changed", "sum"))
        .reset_index()
    )
    merged = got.merge(exp, on="domain", how="outer", suffixes=("", "_exp"))
    assert len(merged) == len(got) == len(exp)
    assert (merged["n_recrawled"] == merged["n_recrawled_exp"]).all()
    assert (merged["n_changed"] == merged["n_changed_exp"]).all()


def test_refreshed_corpus_composition(ray_session):
    """The web-refresh flagship = blocklist ∘ latest-snapshot ∘ extract ∘
    quality gate — consistent with its constituent operators run separately."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        BLOCK_RESIDUE,
        REFRESH_MIN_TOKENS,
        latest_page_text,
        refreshed_corpus,
    )
    from simple_content_ocr_ray.sources.synth_pages import N_HOSTS

    sf = "/root/testdata/sf0.001"
    got = refreshed_corpus(sf).to_pandas().sort_values("url").reset_index(drop=True)
    base = latest_page_text(sf).to_pandas()
    host_id = base["url"].str.extract(r"site(\d+)\.example", expand=False).astype(int)
    n_tokens = base["text"].str.count(" ") + 1
    exp = (
        base[(host_id % 10 != BLOCK_RESIDUE) & (n_tokens >= REFRESH_MIN_TOKENS)]
        .sort_values("url")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp)
    assert 0 < len(got) < len(base)


def test_worker_crash_mid_run_recovers(ray_session, tmp_path):
    """Kill ONE worker process mid-pipeline (hard os._exit, not an
    exception) and assert Ray Data retries the lost task and the run
    completes with exactly the expected output — the single-node stand-in
    for a node loss on the real cluster. A flag file makes the crash fire
    once across retries."""
    import os as _os

    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import (
        extraction_pipeline,
        read_pages,
    )
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    flag = tmp_path / "crashed_once"

    def maybe_crash(df):
        # first task to get here takes the flag and dies without cleanup
        try:
            fd = _os.open(str(flag), _os.O_CREAT | _os.O_EXCL)
            _os.close(fd)
            _os._exit(1)
        except FileExistsError:
            pass
        return df

    pages_dir = synth_pages_parquet("/root/testdata/sf0.001")
    ds = extraction_pipeline(
        rd.read_parquet(pages_dir).map_batches(maybe_crash, batch_format="pandas")
    )
    counts = {
        r["status"]: r["count()"]
        for r in ds.groupby("status").count().take_all()
    }
    assert flag.exists()  # the crash really fired
    assert counts == {"completed": 475, "failed": 25}

"""Hash-bucketed layout (sources/bucketed.py): partition integrity, layout
determinism, and the shuffle-free co-bucketed join."""

from __future__ import annotations

import glob
import shutil

import numpy as np
import pandas as pd
import ray.data as rd

from simple_content_ocr_ray.sources import bucketed

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


def _write(tmpdir: str) -> tuple[str, str]:
    docs_dir = f"{tmpdir}/docs_bucketed"
    emb_dir = f"{tmpdir}/emb_bucketed"
    shutil.rmtree(docs_dir, ignore_errors=True)
    shutil.rmtree(emb_dir, ignore_errors=True)
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
    bucketed.write_bucketed(docs, docs_dir, "doc_id", N_BUCKETS)
    bucketed.write_bucketed(emb, emb_dir, "vec_id", N_BUCKETS)
    return docs_dir, emb_dir


def test_bucketed_roundtrip_and_integrity(ray_session, tmp_path):
    docs_dir, _ = _write(str(tmp_path))
    assert len(glob.glob(f"{docs_dir}/bucket=*")) <= N_BUCKETS
    all_rows = []
    for b in range(N_BUCKETS):
        if not glob.glob(f"{docs_dir}/bucket={b}"):
            continue
        part = bucketed.read_bucket(docs_dir, b).to_pandas()
        # every row in the bucket actually hashes there
        assert (
            bucketed.bucket_of(part["doc_id"].to_numpy(), N_BUCKETS) == b
        ).all()
        all_rows.append(part)
    got = pd.concat(all_rows).sort_values("doc_id").reset_index(drop=True)
    exp = (
        pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "lang"]], exp)


def test_cobucketed_join_no_shuffle(ray_session, tmp_path):
    docs_dir, emb_dir = _write(str(tmp_path))
    got = bucketed.bucket_join_counts(
        docs_dir, emb_dir, "doc_id", "vec_id", N_BUCKETS
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id"])
    exp_total = len(docs.merge(emb, left_on="doc_id", right_on="vec_id"))
    assert int(got["n_joined"].sum()) == exp_total


def test_bucket_assignment_deterministic():
    keys = np.arange(1000, dtype="int64")
    a = bucketed.bucket_of(keys, 16)
    b = bucketed.bucket_of(keys, 16)
    assert np.array_equal(a, b)
    # reasonably balanced: no bucket more than 2x the mean
    counts = np.bincount(a, minlength=16)
    assert counts.max() <= 2 * counts.mean()

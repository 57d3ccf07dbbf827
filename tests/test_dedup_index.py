"""Sharded streaming dedup index: cross-partition state, idempotent
re-ingestion, shard accounting."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_streaming_dedup_cross_partition_and_idempotent(ray_session):
    from simple_content_ocr_ray.state.dedup_index import StreamingDeduper

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = docs.count()
    dd = StreamingDeduper(n_shards=4)

    first = dd.dedup(docs).to_pandas()
    distinct_texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].nunique()
    # one survivor per distinct text, no duplicate texts among survivors
    assert len(first) == distinct_texts
    assert first["text"].nunique() == len(first)
    assert dd.index_size() == distinct_texts

    # re-ingesting the SAME partition is a no-op (at-least-once resume)
    again = dd.dedup(docs).to_pandas()
    assert len(again) == 0
    assert dd.index_size() == distinct_texts

    # a fresh index is independent state
    dd2 = StreamingDeduper(n_shards=4)
    assert len(dd2.dedup(docs).to_pandas()) == distinct_texts
    assert n >= distinct_texts


def test_streaming_dedup_stats_partitions(ray_session):
    from simple_content_ocr_ray.state.dedup_index import streaming_dedup_stats

    out = streaming_dedup_stats(SF)
    assert out["partition"].tolist() == ["a", "b"]
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    half = len(docs) // 2
    a = docs[docs.doc_id < half]["text"]
    b = docs[docs.doc_id >= half]["text"]
    assert out.loc[0, "n_in"] == half and out.loc[1, "n_in"] == len(docs) - half
    assert out.loc[0, "n_survived"] == a.nunique()
    assert out.loc[1, "n_survived"] == len(set(b) - set(a))


def test_streaming_dedup_result_stable_across_consumptions(ray_session):
    """dedup() must materialize: consuming the returned dataset twice (or a
    retried task) must NOT re-claim keys and change the answer."""
    from simple_content_ocr_ray.state.dedup_index import StreamingDeduper

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dd = StreamingDeduper(n_shards=2)
    surv = dd.dedup(docs)
    n1 = surv.count()
    n2 = len(surv.to_pandas())  # second consumption of the same result
    assert n1 == n2 > 0


def test_checkpoint_restore_resumes_index(ray_session, tmp_path):
    """A restored index remembers every accepted key: re-ingesting the
    checkpointed partition yields 0 survivors; a fresh partition dedups
    against the restored history exactly as it would in-process."""
    import pandas as pd
    import ray.data as rd

    from simple_content_ocr_ray.state.dedup_index import StreamingDeduper

    a = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["alpha", "beta", "gamma"]})
    b = pd.DataFrame({"doc_id": [4, 5, 6], "text": ["beta", "delta", "alpha"]})

    d1 = StreamingDeduper(n_shards=4)
    surv_a = d1.dedup(rd.from_pandas(a)).to_pandas()
    assert sorted(surv_a["text"]) == ["alpha", "beta", "gamma"]
    snap = str(tmp_path / "dedup_snap")
    d1.checkpoint(snap)

    d2 = StreamingDeduper.restore(snap)
    assert d2.index_size() == d1.index_size() == 3
    again = d2.dedup(rd.from_pandas(a)).to_pandas()
    assert len(again) == 0  # resume semantic: nothing re-claimed
    surv_b = d2.dedup(rd.from_pandas(b)).to_pandas()
    assert sorted(surv_b["text"]) == ["delta"]

    # checkpoint after more ingestion overwrites atomically and round-trips
    d2.checkpoint(snap)
    d3 = StreamingDeduper.restore(snap)
    assert d3.index_size() == 4


def test_checkpoint_swap_kill_window_restores_parked_snapshot(tmp_path):
    """A kill between parking the old snapshot and renaming the new one in
    must still leave a restorable snapshot (.old) — never zero snapshots."""
    import os
    import ray.data as rd

    from simple_content_ocr_ray.state.dedup_index import StreamingDeduper

    snap = str(tmp_path / "snap")
    dd = StreamingDeduper(n_shards=2)
    ds = rd.from_items([{"text": f"t{i}"} for i in range(20)])
    dd.dedup(ds)
    dd.checkpoint(snap)
    # simulate the kill window: primary parked at .old, new one never landed
    os.rename(snap, snap + ".old")
    back = StreamingDeduper.restore_available(snap)
    assert back is not None
    assert back.index_size() == 20
    # re-ingesting yields zero survivors — the resume semantic
    assert back.dedup(ds).count() == 0
    # nothing at all → None (fresh index)
    import shutil

    shutil.rmtree(snap + ".old")
    assert StreamingDeduper.restore_available(snap) is None

"""Fifth-session additions: event transition matrix (LEAD semantics) and
sequence packing (distributed prefix scan) — both adaptive paths asserted
byte-equal and checked against pandas/numpy brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_event_transitions_paths_equal_and_brute_force(ray_session):
    from simple_content_ocr_ray.functions.window import event_transitions

    out = event_transitions(SF)
    forced = event_transitions(SF, small_threshold=0)  # keyed-shuffle path
    pd.testing.assert_frame_equal(out, forced)

    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    et = ev["event_type"].to_numpy()
    same = ev["user_id"].to_numpy()[:-1] == ev["user_id"].to_numpy()[1:]
    exp = (
        pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        .groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    merged = out.merge(exp, on=["from_type", "to_type"], suffixes=("", "_exp"))
    assert len(merged) == len(out) == len(exp)
    assert (merged["n"] == merged["n_exp"]).all()
    # probabilities row-normalize to 1 within each from_type
    sums = out.groupby("from_type")["p"].sum()
    assert (np.abs(sums - 1.0) < 1e-2).all()


def test_packed_sequences_paths_equal_and_brute_force(ray_session):
    from simple_content_ocr_ray.pipelines.train_feed import (
        SEQ_BUDGET,
        packed_sequences,
    )

    out = packed_sequences(SF)
    forced = packed_sequences(SF, small_threshold=0)  # distributed prefix scan
    pd.testing.assert_frame_equal(out, forced)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n_tok = docs["text"].str.split(" ").str.len().to_numpy(dtype="int64")
    start = np.cumsum(n_tok) - n_tok
    exp = (
        pd.DataFrame(
            {"seq_id": start // SEQ_BUDGET, "n_tok": n_tok, "doc_id": docs["doc_id"]}
        )
        .groupby("seq_id", as_index=False)
        .agg(
            n_docs=("n_tok", "size"),
            total_tokens=("n_tok", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
    )
    pd.testing.assert_frame_equal(out, exp.astype("int64"), check_dtype=False)
    # every sequence except possibly the last spans >= the token budget
    # (docs straddle boundaries, so a sequence's own token sum can exceed it)
    assert (out["total_tokens"].iloc[:-1].cumsum() >= SEQ_BUDGET * np.arange(1, len(out))).all()


def test_packed_sequences_bucket_boundary(ray_session):
    """The distributed path must agree even when buckets are tiny (many
    buckets, non-trivial offsets): shrink the bucket width via monkeypatch."""
    import simple_content_ocr_ray.pipelines.train_feed as tf

    orig = tf.PACK_BUCKET_W
    try:
        tf.PACK_BUCKET_W = 7  # dozens of buckets at sf0.001
        forced = tf.packed_sequences(SF, small_threshold=0)
    finally:
        tf.PACK_BUCKET_W = orig
    base = tf.packed_sequences(SF)
    pd.testing.assert_frame_equal(base, forced)

"""Round-granular checkpoint/resume for iterative algorithms
(state/iter_checkpoint.py): a killed label-propagation run resumes from the
last committed round, never re-executes finished rounds, and converges to
output byte-identical to an uninterrupted run."""

import os

import pandas as pd
import pytest
import ray.data as rd

from simple_content_ocr_ray.state.iter_checkpoint import (
    IterCheckpointer,
    SimulatedCrash,
    checkpointed_min_label_components,
)


def _graph():
    """Two chains + singletons: chain 0-1-2-3-4 (diameter 4 forces several
    rounds of min-label propagation) and pair 10-11."""
    nodes = rd.from_pandas(pd.DataFrame({"doc_id": list(range(5)) + [10, 11, 20]}))
    pairs = pd.DataFrame(
        {"doc_a": [4, 3, 2, 1, 10], "doc_b": [3, 2, 1, 0, 11]}
    )
    return nodes, pairs


def _labels_df(ds):
    return (
        ds.to_pandas()
        .astype({"node": "int64", "label": "int64"})
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_kill_and_resume_matches_uninterrupted_run(tmp_path, ray_session):
    nodes, pairs = _graph()
    # uninterrupted reference run
    ref, ref_rounds = checkpointed_min_label_components(
        nodes, pairs, str(tmp_path / "ref")
    )
    ref_df = _labels_df(ref)
    assert ref_rounds >= 3  # the chain actually needs multiple rounds
    assert (ref_df.loc[ref_df["node"] <= 4, "label"] == 0).all()
    assert (ref_df.loc[ref_df["node"].isin([10, 11]), "label"] == 10).all()
    assert int(ref_df.loc[ref_df["node"] == 20, "label"].iloc[0]) == 20

    # crash after one committed round, then resume
    ck = str(tmp_path / "ckpt")
    with pytest.raises(SimulatedCrash):
        checkpointed_min_label_components(nodes, pairs, ck, die_after_rounds=1)
    resumed, resumed_rounds = checkpointed_min_label_components(nodes, pairs, ck)
    pd.testing.assert_frame_equal(_labels_df(resumed), ref_df)
    # the crashed run committed round 1; the resume executed the REST only
    assert resumed_rounds == ref_rounds - 1


def test_completed_run_resumes_as_noop(tmp_path, ray_session):
    nodes, pairs = _graph()
    ck = str(tmp_path / "ckpt")
    first, n1 = checkpointed_min_label_components(nodes, pairs, ck)
    again, n2 = checkpointed_min_label_components(nodes, pairs, ck)
    assert n1 > 0 and n2 == 0  # converged marker short-circuits everything
    pd.testing.assert_frame_equal(_labels_df(first), _labels_df(again))


def test_checkpointer_prunes_and_survives_partial_tmp(tmp_path, ray_session):
    ck = IterCheckpointer(str(tmp_path), keep=2)
    st = rd.from_pandas(pd.DataFrame({"node": [1], "label": [1]}))
    for r in (1, 2, 3, 4):
        ck.save(r, st, {"label_sum": r})
    assert ck.committed_rounds() == [3, 4]  # older rounds pruned
    # a crash mid-write leaves only a .tmp dir — ignored by latest()
    os.makedirs(str(tmp_path / "round=9.tmp.123"))
    r, meta = ck.latest()
    assert r == 4 and meta["label_sum"] == 4
    assert len(ck.load(4).take_all()) == 1

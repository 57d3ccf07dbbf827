"""Corpus-level operator tests: components (both topologies), heavy hitters,
hash split determinism."""

import hashlib

import pandas as pd

from simple_content_ocr_ray.functions.corpus_ops import (
    VAL_HEX_CUTOFF,
    doc_split_assign,
    lang_top_tokens,
    near_dup_components,
)


def _components_df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_components_distributed_path_matches_union_find(sf_dir):
    small = _components_df(near_dup_components(sf_dir))
    large = _components_df(near_dup_components(sf_dir, small_max_edges=0))
    pd.testing.assert_frame_equal(small, large)
    # every component label is the min doc_id of its members
    mins = small.groupby("component")["doc_id"].min()
    assert (mins.index == mins.values).all()


def test_components_cover_corpus_and_twins(sf_dir, documents_table):
    out = _components_df(near_dup_components(sf_dir))
    ids = set(out["doc_id"])
    # each injected twin shares its original's component
    twins = out[out["doc_id"] >= 1_000_000]
    assert len(twins) > 0
    by_id = dict(zip(out["doc_id"], out["component"]))
    for t in twins["doc_id"]:
        orig = t - 1_000_000
        if orig in ids:
            assert by_id[t] == by_id[orig] == min(by_id[orig], orig)


def test_lang_top_tokens_shape(sf_dir):
    out = lang_top_tokens(sf_dir)
    assert set(out.columns) == {"lang", "token", "n", "rk"}
    # ranks are 1..k per lang, counts non-increasing within a lang
    for _, g in out.groupby("lang"):
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert (g["n"].diff().dropna() <= 0).all()


def test_doc_split_assign_deterministic(sf_dir):
    a = doc_split_assign(sf_dir).to_pandas().sort_values("doc_id")
    b = doc_split_assign(sf_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    for d, s in zip(a["doc_id"], a["split"]):
        expect = (
            "val"
            if hashlib.md5(str(int(d)).encode()).hexdigest()[:2] < VAL_HEX_CUTOFF
            else "train"
        )
        assert s == expect
    assert set(a["split"]) == {"train", "val"}

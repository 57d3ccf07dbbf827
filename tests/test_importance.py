"""DSIR importance resampling: brute-force parity, target-tilt semantics,
partition independence of the Gumbel-top-k draw."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from simple_content_ocr_ray.functions.importance import (
    DSIR_BUCKETS,
    DSIR_SAMPLE_K,
    DSIR_SCALE,
    DSIR_TARGET_LANG,
    _U_DENOM,
    dsir_doc_weights,
    dsir_resample,
)


def _feats(text: str) -> list[str]:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(feat: str) -> int:
    h = int.from_bytes(hashlib.md5(feat.encode()).digest()[8:16], "little")
    return h % DSIR_BUCKETS


def _brute_weights(docs: pd.DataFrame) -> pd.DataFrame:
    """Pure-python DSIR reimplementation — no shared code with the operator
    beyond the published formula."""
    cq = np.zeros(DSIR_BUCKETS)
    ct = np.zeros(DSIR_BUCKETS)
    for _, row in docs.iterrows():
        for f in _feats(row["text"]):
            b = _bucket(f)
            cq[b] += 1
            if row["lang"] == DSIR_TARGET_LANG:
                ct[b] += 1
    lr = np.log((ct + 1) / (ct.sum() + DSIR_BUCKETS)) - np.log(
        (cq + 1) / (cq.sum() + DSIR_BUCKETS)
    )
    lri = (np.sign(lr * DSIR_SCALE) * np.floor(np.abs(lr * DSIR_SCALE) + 0.5)).astype(
        "int64"
    )
    rows = []
    for _, row in docs.iterrows():
        fs = _feats(row["text"])
        rows.append(
            {
                "doc_id": row["doc_id"],
                "n_feats": len(fs),
                "logw_micro": int(sum(int(lri[_bucket(f)]) for f in fs)),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs_head(documents_table):
    return documents_table.to_pandas().head(120)


def test_dsir_weights_match_brute_force(sf_dir, documents_table):
    got = (
        dsir_doc_weights(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = documents_table.to_pandas()
    want = _brute_weights(docs).sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(docs)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_feats", "logw_micro"]], want, check_dtype=False
    )


def test_dsir_weights_tilt_toward_target(sf_dir, documents_table):
    w = dsir_doc_weights(sf_dir).to_pandas()
    docs = documents_table.to_pandas()[["doc_id", "lang"]]
    m = w.merge(docs, on="doc_id")
    mean_t = m.loc[m["lang"] == DSIR_TARGET_LANG, "logw_micro"].mean()
    mean_o = m.loc[m["lang"] != DSIR_TARGET_LANG, "logw_micro"].mean()
    assert mean_t > mean_o, "target-domain docs must score higher on average"


def test_dsir_resample_is_gumbel_topk_of_weights(sf_dir):
    sel = dsir_resample(sf_dir)
    assert len(sel) == DSIR_SAMPLE_K
    assert sel["doc_id"].is_unique

    w = dsir_doc_weights(sf_dir).to_pandas()
    keys = {}
    for doc_id, lw in zip(w["doc_id"], w["logw_micro"]):
        h = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[8:16], "little")
        u = (h % _U_DENOM + 0.5) / _U_DENOM
        keys[doc_id] = lw / DSIR_SCALE + -math.log(-math.log(u))
    want = set(sorted(keys, key=keys.get, reverse=True)[:DSIR_SAMPLE_K])
    assert set(sel["doc_id"]) == want


def test_dsir_resample_deterministic(sf_dir):
    a = dsir_resample(sf_dir)
    b = dsir_resample(sf_dir)
    pd.testing.assert_frame_equal(a, b)

"""Margin-based bitext mining: brute-force parity and margin semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from simple_content_ocr_ray.functions.similarity import (
    MARGIN_K,
    MARGIN_NQ,
    MARGIN_T,
    xlingual_margin_pairs,
)


def _brute(sf_dir: str) -> pd.DataFrame:
    df = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    M = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    xm, ym = ids % 2 == 0, ids % 2 == 1
    X, xi = M[xm], ids[xm]
    Y, yi = M[ym], ids[ym]
    C = X @ Y.T  # (|X|, |Y|)
    # a_x over Y for the query block; a_y over the FULL X side
    a_x_all = np.sort(C, axis=1)[:, -MARGIN_K:].mean(axis=1)
    a_y = np.sort(C.T, axis=1)[:, -MARGIN_K:].mean(axis=1)
    rows = []
    for qp in np.flatnonzero(xi < 2 * MARGIN_NQ):
        margin = C[qp] / ((a_x_all[qp] + a_y) / 2)
        best = np.lexsort((yi, -margin))[0]
        rows.append(
            {
                "query_id": int(xi[qp]),
                "matched_id": int(yi[best]),
                "cosine_sim": round(float(C[qp, best]), 4),
                "margin": round(float(margin[best]), 4),
                "accepted": int(margin[best] >= MARGIN_T),
            }
        )
    return pd.DataFrame(rows).sort_values("query_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def mined(sf_dir):
    return xlingual_margin_pairs(sf_dir)


def test_margin_pairs_match_brute_force(sf_dir, mined):
    want = _brute(sf_dir)
    assert len(mined) == MARGIN_NQ
    pd.testing.assert_frame_equal(
        mined.reset_index(drop=True), want, check_dtype=False, atol=1e-9
    )


def test_margin_pairs_shape(mined):
    assert (mined["matched_id"] % 2 == 1).all(), "matches come from the target side"
    assert (mined["query_id"] % 2 == 0).all()
    assert mined["query_id"].is_unique
    assert set(mined["accepted"]) <= {0, 1}


def test_margin_demotes_hubs():
    """A hub vector close to EVERY source is out-margined by a true match:
    plain cosine argmax picks the hub, the margin criterion does not."""
    rng = np.random.default_rng(7)
    d = 16
    x = rng.normal(size=d)
    x /= np.linalg.norm(x)
    # y0: genuine translation (very close to x, far from others)
    y0 = x + 0.05 * rng.normal(size=d)
    y0 /= np.linalg.norm(y0)
    # hub: moderately close to everything (centroid-ish)
    others = rng.normal(size=(6, d))
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    hub = np.vstack([x, others]).mean(axis=0)
    hub /= np.linalg.norm(hub)
    X = np.vstack([x, others])
    Y = np.vstack([y0, hub, rng.normal(size=(4, d))])
    Y /= np.linalg.norm(Y, axis=1, keepdims=True)
    C = X @ Y.T
    k = 2
    a_x = np.sort(C, axis=1)[:, -k:].mean(axis=1)
    a_y = np.sort(C.T, axis=1)[:, -k:].mean(axis=1)
    margin = C[0] / ((a_x[0] + a_y) / 2)
    assert np.argmax(margin) == 0, "margin must pick the true match over the hub"
    assert margin[0] > margin[1]

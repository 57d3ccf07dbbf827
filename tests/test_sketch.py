"""Sketches (functions/sketch.py): HLL accuracy + determinism, Misra-Gries
exactness at high capacity and error bound at low capacity."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from simple_content_ocr_ray.functions import sketch

SF = "/root/testdata/sf0.001"


def test_hll_within_error_bound(ray_session):
    got = sketch.hll_distinct_users(SF)
    assert list(got.columns) == ["approx_distinct"]
    exact = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])[
        "user_id"
    ].nunique()
    est = int(got["approx_distinct"].iloc[0])
    # p=12 → standard error 1.04/sqrt(4096) ≈ 1.6%; allow 5 sigma + small-n slack
    assert abs(est - exact) <= max(0.10 * exact, 5)


def test_hll_deterministic_across_batch_splits(ray_session):
    a = sketch.hll_distinct_users(SF)["approx_distinct"].iloc[0]
    b = sketch.hll_distinct_users(SF)["approx_distinct"].iloc[0]
    assert a == b


def test_hll_registers_merge_associative():
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 10_000, size=5000).astype("int64")
    whole = sketch._hll_registers(keys)
    split = np.maximum(
        sketch._hll_registers(keys[:1700]), sketch._hll_registers(keys[1700:])
    )
    assert np.array_equal(whole, split)


def test_hll_per_type_within_error_bound(ray_session):
    got = sketch.type_distinct_users_hll(SF)
    assert list(got.columns) == ["event_type", "approx_distinct"]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    assert set(got["event_type"]) == set(exact.index)
    assert list(got["event_type"]) == sorted(got["event_type"])
    for _, row in got.iterrows():
        true_n = int(exact[row["event_type"]])
        assert abs(int(row["approx_distinct"]) - true_n) <= max(0.10 * true_n, 5)


def test_hll_per_type_distributed_merge_matches_driver(ray_session):
    """Forcing the distributed key-grouped register merge (threshold 0) must
    yield the exact same estimates as the driver-side merge — the max-merge
    is associative, so the topology cannot change the result."""
    driver = sketch.type_distinct_users_hll(SF)
    dist = sketch.type_distinct_users_hll(SF, driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True), dist.reset_index(drop=True)
    )


def _true_counts() -> Counter:
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    c = Counter()
    for t in texts:
        c.update(t.split(" "))
    return c


def test_mg_exact_at_high_capacity(ray_session):
    got = sketch.approx_top_tokens(SF)
    true = _true_counts()
    exp = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[: sketch.MG_TOPK]
    assert list(zip(got["token"], got["n"])) == exp


def test_mg_error_bound_at_low_capacity(ray_session):
    cap = 8
    got = sketch.approx_top_tokens(SF, capacity=cap).set_index("token")["n"]
    true = _true_counts()
    n_tokens = sum(true.values())
    # every reported count is a lower bound within n/(cap+1) of truth
    for token, n in got.items():
        assert n <= true[token]
        assert true[token] - n <= n_tokens / (cap + 1) * 2  # 2 merge levels
    # no token with true count > bound is missed entirely
    bound = n_tokens / (cap + 1) * 2
    for token, tn in true.items():
        if tn > bound:
            assert token in got.index


def test_quantile_sketch_rank_error_bound(ray_session):
    """Merged sketch quantiles land within the N/(m-1) rank-error bound of
    the exact order statistics (checked at 1% N for slack across batchings),
    and a small-m sketch still respects its own coarser bound."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.sketch import (
        QS_QUANTILES,
        event_value_quantiles_sketch,
    )

    sf = "/root/testdata/sf0.001"
    out = event_value_quantiles_sketch(sf)
    assert list(out.columns) == ["q", "approx_value"]
    assert len(out) == len(QS_QUANTILES)

    v = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"]
    exact = np.sort(np.rint(v.to_numpy() * 1_000_000).astype("int64"))
    n = len(exact)
    for q, got in zip(out["q"], out["approx_value"]):
        got_u = int(round(got * 1_000_000))
        lo = np.searchsorted(exact, got_u, side="left")
        hi = np.searchsorted(exact, got_u, side="right")
        rank_err = min(abs(lo - q * n), abs(hi - q * n))
        assert rank_err <= 0.01 * n + 1, (q, got, rank_err)


def test_cms_error_bounds(ray_session):
    """Count-Min guarantees: est >= true always; est <= true + (e/W)·N with
    high probability (checked with the slack of the min over D rows)."""
    from simple_content_ocr_ray.functions.sketch import CMS_W, token_counts_cms

    got = token_counts_cms(SF).set_index("token")["est_n"]
    true = _true_counts()
    n_total = sum(true.values())
    bound = 2.718 / CMS_W * n_total * 3  # generous multiple of the eps bound
    for token, est in got.items():
        assert est >= true[token]
        assert est - true[token] <= max(bound, 2)


def test_cms_matrix_merge_linear():
    import numpy as np

    from simple_content_ocr_ray.functions.sketch import _cms_matrix

    toks = np.array(["a", "b", "c", "d", "e"], dtype=object)
    whole = _cms_matrix(toks, np.array([5, 4, 3, 2, 1]))
    split = _cms_matrix(toks[:2], np.array([5, 4])) + _cms_matrix(
        toks[2:], np.array([3, 2, 1])
    )
    assert np.array_equal(whole, split)


def test_hll_overlap_accuracy(ray_session):
    from simple_content_ocr_ray.functions.sketch import view_purchase_overlap_hll

    got = view_purchase_overlap_hll(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    views = set(ev.loc[ev["event_type"] == "view", "user_id"])
    buys = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    exact = len(views & buys)
    est = int(got["approx_both"].iloc[0])
    # inclusion-exclusion compounds three ±1.6% sketches; generous small-n slack
    assert abs(est - exact) <= max(0.15 * exact, 8)
    assert abs(int(got["approx_view"].iloc[0]) - len(views)) <= max(0.10 * len(views), 5)


def test_events_dual_distinct_exact(ray_session):
    """Both distinct counts from the one-pass tagged stream equal pandas
    nunique per type."""
    from simple_content_ocr_ray.functions.window import events_dual_distinct

    got = events_dual_distinct(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id", "ts"])
    ev["day"] = ev["ts"].dt.normalize()
    exact = ev.groupby("event_type").agg(
        u=("user_id", "nunique"), d=("day", "nunique")
    )
    assert set(got.index) == set(exact.index)
    for t in exact.index:
        assert got.loc[t, "n_distinct_users"] == exact.loc[t, "u"]
        assert got.loc[t, "n_active_days"] == exact.loc[t, "d"]


def test_grouped_quantile_sketch_rank_error_per_key(ray_session):
    """Per-key sketch quantiles land within the per-key rank-error bound of
    the exact order statistics."""
    from simple_content_ocr_ray.functions.sketch import (
        QS_QUANTILES,
        type_value_quantiles_sketch,
    )

    out = type_value_quantiles_sketch(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for et, g in ev.groupby("event_type"):
        exact = np.sort(np.rint(g["value"].to_numpy() * 1_000_000).astype("int64"))
        n = len(exact)
        sub = out[out["event_type"] == et]
        assert list(sub["q"]) == list(QS_QUANTILES)
        for q, got in zip(sub["q"], sub["approx_value"]):
            got_u = int(round(got * 1_000_000))
            lo = np.searchsorted(exact, got_u, side="left")
            hi = np.searchsorted(exact, got_u, side="right")
            rank_err = min(abs(lo - q * n), abs(hi - q * n))
            assert rank_err <= 0.02 * n + 1, (et, q, got, rank_err)


def test_analyze_documents_exactness_and_bounds(sf_dir, ray_session):
    import duckdb
    import os

    from simple_content_ocr_ray.functions.sketch import analyze_documents

    df = analyze_documents(sf_dir).set_index("col_name")
    con = duckdb.connect()
    doc = os.path.join(sf_dir, "documents.parquet")
    exact = con.sql(
        f"select count(distinct doc_id), count(distinct lang),"
        f" min(doc_id), max(doc_id), count(*) - count(text)"
        f" from '{doc}'"
    ).fetchone()
    # HLL ndv within 5% of exact at this cardinality; tiny cardinalities
    # (lang) are exact via linear counting
    assert abs(df.loc["doc_id", "approx_ndv"] - exact[0]) <= 0.05 * exact[0]
    assert df.loc["lang", "approx_ndv"] == exact[1]
    assert df.loc["doc_id", "min_s"] == str(exact[2])
    assert df.loc["doc_id", "max_s"] == str(exact[3])
    assert (df["n_nulls"] == 0).all() and exact[4] == 0


def test_histogram_quantile_sketch_value_bound_and_determinism(ray_session):
    """r5 histogram sketch: approx within one cell width of the exact
    quantile, and identical across repeated runs (partition-independent —
    the property that made the SQL oracle possible)."""
    from simple_content_ocr_ray.functions.sketch import (
        QS_BINS,
        event_value_quantiles_sketch,
    )

    sf = "/root/testdata/sf0.001"
    a = event_value_quantiles_sketch(sf)
    b = event_value_quantiles_sketch(sf)
    pd.testing.assert_frame_equal(a, b)

    v = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"]
    v6 = np.rint(v.to_numpy() * 1_000_000).astype("int64")
    width = (int(v6.max()) - int(v6.min()) + 1) / QS_BINS
    exact = np.sort(v6)
    n = len(exact)
    for q, got in zip(a["q"], a["approx_value"]):
        got_u = got * 1_000_000
        target = exact[min(n - 1, int(np.ceil(q * n)) - 1) if q * n >= 1 else 0]
        assert abs(got_u - target) <= width + 1, (q, got_u, target, width)

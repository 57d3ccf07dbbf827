"""Round-2 relational additions: rollup, interpolated percentiles, JSON
props extraction — vs pandas/numpy references."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_content_ocr_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_event_value_percentiles_match_numpy(ray_session):
    got = relational.event_value_percentiles(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    ev["value_u"] = np.rint(ev["value"] * 1e6).astype("int64")
    for etype, g in ev.groupby("event_type"):
        for q in relational.PCTS:
            exp = np.percentile(
                g["value_u"].to_numpy().astype("float64"), q * 100, method="linear"
            )
            assert abs(got.loc[etype, f"p{int(q*100)}"] - round(exp / 1e6, 4)) < 1e-9


def test_props_value_stats_match_pandas(ray_session):
    got = relational.props_value_stats(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "props"])
    import json

    ev["k"] = [json.loads(p)["k"] for p in ev["props"]]
    for etype, g in ev.groupby("event_type"):
        assert got.loc[etype, "n"] == len(g)
        assert got.loc[etype, "sum_k"] == g["k"].sum()
        assert got.loc[etype, "max_k"] == g["k"].max()
        assert abs(got.loc[etype, "avg_k"] - round(g["k"].sum() / len(g), 4)) < 1e-9


def test_orders_rollup_levels_consistent(ray_session):
    got = relational.orders_rollup(SF)
    finest = got[got["o_orderpriority"].notna()]
    by_status = got[got["o_orderpriority"].isna() & got["o_orderstatus"].notna()]
    total = got[got["o_orderstatus"].isna()]
    assert len(total) == 1
    assert finest["n_orders"].sum() == total["n_orders"].iloc[0]
    assert by_status["n_orders"].sum() == total["n_orders"].iloc[0]
    # money sums roll up exactly at every level
    assert abs(finest["sum_price"].sum() - total["sum_price"].iloc[0]) < 1e-6


def test_orders_cube_levels_consistent(ray_session):
    got = relational.orders_cube(SF)
    finest = got[got["o_orderpriority"].notna() & got["o_orderstatus"].notna()]
    by_status = got[got["o_orderpriority"].isna() & got["o_orderstatus"].notna()]
    by_priority = got[got["o_orderstatus"].isna() & got["o_orderpriority"].notna()]
    total = got[got["o_orderstatus"].isna() & got["o_orderpriority"].isna()]
    assert len(total) == 1
    n = total["n_orders"].iloc[0]
    assert finest["n_orders"].sum() == n
    assert by_status["n_orders"].sum() == n
    assert by_priority["n_orders"].sum() == n
    for lvl in (finest, by_status, by_priority):
        assert abs(lvl["sum_price"].sum() - total["sum_price"].iloc[0]) < 1e-6
    # the cube strictly extends the rollup's grouping sets
    rollup = relational.orders_rollup(SF)
    assert len(got) == len(rollup) + len(by_priority)


def test_daily_revenue_ma7_window_math(ray_session):
    got = relational.daily_revenue_ma7(SF).sort_values("ship_day").reset_index(drop=True)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_discount"],
    )
    li["day"] = li["l_shipdate"].dt.floor("D")
    li["rev_u"] = np.rint(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 1e6
    ).astype("int64")
    daily = li.groupby("day")["rev_u"].sum().sort_index()
    # spot-check a handful of trailing 7-day windows
    days = daily.index
    for i in [0, 1, len(days) // 2, len(days) - 1]:
        d = days[i]
        win = daily[(daily.index > d - pd.Timedelta(days=7)) & (daily.index <= d)]
        row = got[got["ship_day"] == d].iloc[0]
        from simple_content_ocr_ray.functions.agg import round_half_away

        assert abs(row["sum7"] - round_half_away(win.sum() / 1e6)) < 1e-9
        assert abs(row["avg7"] - round_half_away(win.sum() / len(win) / 1e6)) < 1e-9


def test_user_funnel_counts_bruteforce(ray_session):
    from simple_content_ocr_ray.functions.joins import user_funnel_counts

    got = user_funnel_counts(SF)
    forced = user_funnel_counts(SF, small_threshold=0)
    pd.testing.assert_frame_equal(got, forced)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
    n_view = n_vc = n_funnel = 0
    for _, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        n_view += 1
        t1 = views.min()
        clicks = g.loc[(g["event_type"] == "click") & (g["ts"] > t1), "ts"]
        if clicks.empty:
            continue
        n_vc += 1
        t2 = clicks.min()
        if ((g["event_type"] == "purchase") & (g["ts"] > t2)).any():
            n_funnel += 1
    assert got.iloc[0].tolist() == [n_view, n_vc, n_funnel]


def test_q3_shipping_priority_bruteforce(ray_session):
    got = relational.q3_shipping_priority(SF)
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    keys = set(cust.loc[cust["c_mktsegment"] == relational.Q3_SEGMENT, "c_custkey"])
    o = orders[(orders["o_custkey"].isin(keys)) & (orders["o_orderdate"] < relational.Q3_CUTOFF)]
    j = li[li["l_shipdate"] > relational.Q3_CUTOFF].merge(
        o, left_on="l_orderkey", right_on="o_orderkey"
    )
    j["rev_u"] = np.rint(j["l_extendedprice"] * (1 - j["l_discount"]) * 1e6).astype("int64")
    agg = (
        j.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)["rev_u"]
        .sum()
        .sort_values(["rev_u", "o_orderdate", "o_orderkey"], ascending=[False, True, True])
        .head(relational.Q3_TOPK)
    )
    assert list(got["o_orderkey"]) == list(agg["o_orderkey"])
    assert np.allclose(got["revenue"], (agg["rev_u"] / 1e6).round(4), atol=1e-9)


def test_clean_corpus_rules(ray_session):
    from simple_content_ocr_ray.pipelines.clean import (
        MAX_MEAN_TOKEN_LEN,
        MIN_DISTINCT_RATIO,
        MIN_TOKENS,
        clean_corpus,
    )

    got = clean_corpus(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    kept = set(got["doc_id"])
    seen_hash = {}
    for r in docs.sort_values("doc_id").itertuples():
        toks = r.text.split(" ")
        nt = len(toks)
        ok = (
            nt >= MIN_TOKENS
            and len(set(toks)) / nt >= MIN_DISTINCT_RATIO
            and (r.n_chars - (nt - 1)) / nt <= MAX_MEAN_TOKEN_LEN
        )
        if not ok:
            assert r.doc_id not in kept
            continue
        if r.text in seen_hash:
            assert r.doc_id not in kept  # only the first keeper survives
        else:
            seen_hash[r.text] = r.doc_id
            assert r.doc_id in kept


def test_lineitem_correlations_match_numpy(ray_session):
    got = relational.lineitem_correlations(SF).set_index(["col_a", "col_b"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=list(relational.CORR_COLS))
    for (a, b), row in got.iterrows():
        exp = np.corrcoef(li[a], li[b])[0, 1]
        assert abs(row["corr"] - round(exp, 4)) < 2e-4  # rounding-method slack
    assert len(got) == 3


def test_clean_corpus_paths_equal(ray_session):
    from simple_content_ocr_ray.pipelines.clean import clean_corpus

    small = clean_corpus(SF)
    large = clean_corpus(SF, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)


def test_events_hourly_gapfill_dense_axis(ray_session):
    got = relational.events_hourly_gapfill(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    lo, hi = ev["ts"].min().floor("h"), ev["ts"].max().floor("h")
    # dense: one row per hour, no gaps
    assert len(got) == int((hi - lo) / pd.Timedelta(hours=1)) + 1
    assert got["event_hour"].is_monotonic_increasing
    assert (got["event_hour"].diff().dropna() == pd.Timedelta(hours=1)).all()
    # zero-filled hours really had no events; totals add up
    assert got["n_events"].sum() == len(ev)
    empty = got[got["n_events"] == 0]
    if len(empty):
        h = empty["event_hour"].iloc[0]
        assert not ((ev["ts"] >= h) & (ev["ts"] < h + pd.Timedelta(hours=1))).any()


def test_orders_fulfillment_left_outer_nulls(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import orders_fulfillment

    sf = "/root/testdata/sf0.001"
    out = orders_fulfillment(sf)
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey"])
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey"])
    # every order present exactly once (left-outer preserves the left side)
    assert sorted(out["o_orderkey"]) == sorted(orders["o_orderkey"])
    empty = set(orders["o_orderkey"]) - set(li["l_orderkey"])
    sub = out[out["o_orderkey"].isin(empty)]
    assert len(sub) == len(empty)
    assert (sub["n_items"] == 0).all() and (sub["revenue"] == 0).all()
    matched = out[~out["o_orderkey"].isin(empty)]
    assert (matched["n_items"] > 0).all()


def test_ntile_bucket_sizes_and_order(ray_session):
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import (
        NTILE_BUCKETS,
        _ntile_ranks,
        orders_priority_ntile,
    )

    # the NTILE size rule: first n%b buckets get the extra row
    assert _ntile_ranks(10, 4).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert _ntile_ranks(3, 4).tolist() == [1, 2, 3]

    sf = "/root/testdata/sf0.001"
    out = orders_priority_ntile(sf)
    orders = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    assert len(out) == len(orders)
    merged = out.merge(orders, on=["o_orderkey", "o_orderpriority"])
    for _, g in merged.groupby("o_orderpriority"):
        sizes = g["quartile"].value_counts().sort_index()
        assert sizes.max() - sizes.min() <= 1  # balanced buckets
        # quartiles respect the price ordering: max price in q <= min in q+1
        for q in range(1, NTILE_BUCKETS):
            lo = g.loc[g["quartile"] == q, "o_totalprice"].max()
            hi = g.loc[g["quartile"] == q + 1, "o_totalprice"].min()
            assert lo <= hi + 1e-9


def test_view_only_user_days_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import view_only_user_days

    sf = "/root/testdata/sf0.001"
    out = view_only_user_days(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"])
    ev["day"] = ev["ts"].dt.floor("D")
    views = set(map(tuple, ev.loc[ev.event_type == "view", ["user_id", "day"]].values.tolist()))
    buys = set(map(tuple, ev.loc[ev.event_type == "purchase", ["user_id", "day"]].values.tolist()))
    exp = views - buys
    got = set(zip(out["user_id"].tolist(), out["day"].tolist()))
    assert got == exp


def test_q5_local_supplier_volume_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import (
        Q5_REGION,
        Q5_YEAR_HI,
        Q5_YEAR_LO,
        q5_local_supplier_volume,
    )

    sf = "/root/testdata/sf0.001"
    out = q5_local_supplier_volume(sf)
    region = pd.read_parquet(f"{sf}/region.parquet")
    nation = pd.read_parquet(f"{sf}/nation.parquet")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    supp = pd.read_parquet(f"{sf}/supplier.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")

    rk = region.loc[region.r_name == Q5_REGION, "r_regionkey"]
    nat = nation[nation.n_regionkey.isin(rk)]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    j = j[
        (j.c_nationkey == j.s_nationkey)
        & (j.o_orderdate >= Q5_YEAR_LO)
        & (j.o_orderdate < Q5_YEAR_HI)
    ]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    exp = j.groupby("n_name")["rev"].sum().sort_values(ascending=False)
    assert out["n_name"].tolist() == exp.index.tolist()
    assert (out["revenue"] - exp.values).abs().max() < 0.01


def test_cohort_retention_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import cohort_retention

    sf = "/root/testdata/sf0.001"
    out = cohort_retention(sf)
    forced = cohort_retention(sf, small_threshold=0)  # keyed-shuffle path
    pd.testing.assert_frame_equal(out, forced)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ud = pd.DataFrame(
        {"user_id": ev.user_id, "day": ev.ts.dt.floor("D")}
    ).drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min().rename("cohort_day")
    m = ud.join(cohort, on="user_id")
    m["day_offset"] = (m.day - m.cohort_day).dt.days
    exp = (
        m.groupby(["cohort_day", "day_offset"])["user_id"]
        .nunique()
        .reset_index(name="n_users")
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert out["n_users"].tolist() == exp["n_users"].tolist()
    assert out["day_offset"].tolist() == exp["day_offset"].tolist()
    # offset-0 row of each cohort counts the whole cohort
    total_users = ev["user_id"].nunique()
    assert out.loc[out.day_offset == 0, "n_users"].sum() == total_users


def test_orders_above_cust_avg_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import orders_above_cust_avg

    sf = "/root/testdata/sf0.001"
    out = orders_above_cust_avg(sf)
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    avg = orders.groupby("o_custkey")["o_totalprice"].transform("mean")
    exp = orders[orders.o_totalprice > avg].sort_values("o_orderkey")
    assert out["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    # every kept order strictly beats its customer's mean
    merged = out.merge(
        orders.groupby("o_custkey")["o_totalprice"].mean().rename("m"),
        on="o_custkey",
    )
    assert (merged.o_totalprice > merged.m - 1e-6).all()


def test_longest_doc_per_group_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import longest_doc_per_group

    sf = "/root/testdata/sf0.001"
    out = longest_doc_per_group(sf)
    docs = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )
    exp = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby(["lang", "source"])
        .head(1)
        .sort_values(["lang", "source"])
    )
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["n_chars"].tolist() == exp["n_chars"].tolist()


def test_user_event_journeys_paths_equal(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import user_event_journeys

    sf = "/root/testdata/sf0.001"
    small = user_event_journeys(sf)
    forced = user_event_journeys(sf, small_threshold=0)  # keyed-shuffle path
    pd.testing.assert_frame_equal(small, forced)
    ev = pd.read_parquet(f"{sf}/events.parquet")
    u = ev.user_id.iloc[0]
    seq = ev[ev.user_id == u].sort_values(["ts", "event_id"])["event_type"]
    assert small.loc[small.user_id == u, "journey"].iloc[0] == ",".join(seq)


def test_user_modal_event_brute_force(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import user_modal_event

    sf = "/root/testdata/sf0.001"
    out = user_modal_event(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    cnt = ev.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    exp = (
        cnt.sort_values(["n", "event_type"], ascending=[False, True])
        .groupby("user_id")
        .head(1)
        .sort_values("user_id")
    )
    assert out["modal_event"].tolist() == exp["event_type"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_event_value_winsorized_matches_numpy(ray_session):
    got = relational.event_value_winsorized(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    ev["vu"] = np.rint(ev["value"] * 1_000_000).astype("int64")
    for etype, g in ev.groupby("event_type"):
        v = np.sort(g["vu"].to_numpy())
        n = len(v)
        lo = v[-(-5 * n // 100) - 1]
        hi = v[-(-95 * n // 100) - 1]
        wmean = np.clip(v, lo, hi).sum() / n / 1e6
        assert abs(got.loc[etype, "wmean"] - wmean) < 1e-3
        assert got.loc[etype, "lo_cut"] <= got.loc[etype, "hi_cut"]
        # winsorized mean is within the clip bounds
        assert got.loc[etype, "lo_cut"] <= got.loc[etype, "wmean"] <= got.loc[etype, "hi_cut"]


def test_event_value_trend_matches_numpy(ray_session):
    """Slope/intercept from distributed integer moments equal a numpy
    least-squares fit on the same (day, micro-value) points."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.pipelines.relational import (
        TREND_ANCHOR,
        event_value_trend,
    )

    got = event_value_trend(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    anchor = pd.Timestamp(TREND_ANCHOR)
    ev["x"] = (ev["ts"].dt.normalize() - anchor).dt.days
    for etype, g in ev.groupby("event_type"):
        slope, intercept = np.polyfit(
            g["x"].to_numpy(dtype="float64"), g["value"].to_numpy(), 1
        )
        assert abs(got.loc[etype, "slope_per_day"] - slope) < 1e-4, etype
        assert abs(got.loc[etype, "intercept"] - intercept) < 1e-3, etype
        assert got.loc[etype, "n_events"] == len(g)


def test_clean_filter_attribution_all_branches(ray_session, tmp_path):
    """A crafted corpus exercising every attribution branch (short doc,
    repetitive doc, long-token doc, exact duplicate, keeper) — counts and
    shares must match a hand computation; the real corpus run must be
    internally consistent with clean_corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_content_ocr_ray.pipelines.clean import (
        clean_corpus,
        clean_filter_attribution,
    )

    good = " ".join(f"w{i}" for i in range(20))  # 20 distinct short tokens
    rep = " ".join(["dup"] * 20)  # distinct_ratio 1/20 < 0.3
    # 20 DISTINCT 30-char tokens: passes distinct_ratio, fails mean len
    longtok = " ".join("x" * 28 + f"{i:02d}" for i in range(20))
    short = "only three words"
    rows = [
        (1, good),
        (2, good),  # exact duplicate of 1 → 'duplicate'
        (3, rep),
        (4, longtok),
        (5, short),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = clean_filter_attribution(str(tmp_path)).set_index("reason")
    assert got.loc["kept", "n_docs"] == 1
    assert got.loc["duplicate", "n_docs"] == 1
    assert got.loc["distinct_ratio", "n_docs"] == 1
    assert got.loc["mean_token_len", "n_docs"] == 1
    assert got.loc["min_tokens", "n_docs"] == 1
    assert got["n_docs"].sum() == 5
    assert abs(got["share"].sum() - 1.0) < 1e-9

    real = clean_filter_attribution(SF).set_index("reason")
    docs_n = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    assert real["n_docs"].sum() == docs_n
    assert real.loc["kept", "n_docs"] == len(clean_corpus(SF))


def test_weighted_sample_orders_aes_math(ray_session):
    """The sampled order set equals a from-scratch A-ES computation over
    exact per-order revenue, and sampling is revenue-biased."""
    import hashlib

    import numpy as np

    from simple_content_ocr_ray.pipelines.relational import (
        WEIGHTED_ORDERS_K,
        weighted_sample_orders,
    )

    got = weighted_sample_orders(SF)
    line = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    rev_u = (
        pd.Series(
            np.rint(
                line["l_extendedprice"].to_numpy()
                * (1 - line["l_discount"].to_numpy())
                * 1_000_000
            ).astype("int64"),
            index=line["l_orderkey"].to_numpy(),
        )
        .groupby(level=0)
        .sum()
    )
    u = np.array(
        [
            int(hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16)
            for k in rev_u.index
        ],
        dtype="float64",
    )
    skey = np.log((u + 1.0) / (2.0**32 + 2.0)) / rev_u.to_numpy(dtype="float64")
    order = np.lexsort((rev_u.index.to_numpy(), -skey))
    exp = set(rev_u.index.to_numpy()[order][:WEIGHTED_ORDERS_K])
    assert set(got["o_orderkey"]) == exp
    assert dict(zip(got["o_orderkey"], got["revenue_u"])) == {
        k: int(rev_u[k]) for k in exp
    }
    # revenue weighting is real: sampled orders skew high-revenue
    assert got["revenue_u"].mean() > rev_u.mean()


def test_q18_large_orders_bruteforce(ray_session):
    got = relational.q18_large_orders(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    qty = (
        pd.Series(
            np.rint(li["l_quantity"].to_numpy() * 100).astype("int64"),
            index=li["l_orderkey"].to_numpy(),
        )
        .groupby(level=0)
        .sum()
    )
    big = qty[qty > relational.Q18_QTY_THRESHOLD * 100]
    j = orders[orders["o_orderkey"].isin(big.index)].copy()
    j["total_qty"] = (big.loc[j["o_orderkey"]].to_numpy() / 100.0).round(4)
    j = j.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"], ascending=[False, True, True]
    ).head(relational.Q18_TOPK)
    assert list(got["o_orderkey"]) == list(j["o_orderkey"])
    assert np.allclose(got["total_qty"], j["total_qty"], atol=1e-9)
    assert (got["total_qty"] > relational.Q18_QTY_THRESHOLD).all()
    assert len(got) > 0


def test_part_pair_counts_bruteforce(ray_session):
    from collections import Counter
    from itertools import combinations

    from simple_content_ocr_ray.pipelines.relational import (
        BASKET_TOPK,
        part_pair_counts,
    )

    got = part_pair_counts(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    c = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            if a < b:
                c[(a, b)] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BASKET_TOPK]
    assert [(int(r.part_a), int(r.part_b), int(r.n)) for r in got.itertuples()] == [
        (a, b, n) for (a, b), n in exp
    ]


def test_event_value_histogram_properties(ray_session):
    """Bins are 0..9, per-type totals conserve row counts, bin assignment
    matches a numpy recomputation."""
    from simple_content_ocr_ray.functions.agg import grouped_aggregate  # noqa: F401
    from simple_content_ocr_ray.pipelines.relational import (
        HIST_BINS,
        event_value_histogram,
    )

    got = event_value_histogram(SF)
    assert got["bin"].between(0, HIST_BINS - 1).all()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    vu = np.rint(ev["value"].to_numpy() * 1e6).astype("int64")
    lo, hi = vu.min(), vu.max()
    ev["bin"] = (vu - lo) * HIST_BINS // (hi - lo + 1)
    exp = ev.groupby(["event_type", "bin"]).size()
    assert got["n"].sum() == len(ev)
    for r in got.itertuples():
        assert r.n == exp[(r.event_type, r.bin)]


def test_canonical_url_dedup_rules():
    """Every canonicalization rule collapses to the clean form; legitimate
    query params survive; keeper is the min doc_id of the variant group."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        canonical_url_dedup,
    )

    out = canonical_url_dedup(SF)
    urls = out["canonical_url"]
    # no tracking params, uppercase, fragments, or explicit default ports
    assert not urls.str.contains("utm_").any()
    assert not urls.str.contains("#").any()
    assert not urls.str.contains(":443").any()
    assert (urls == urls.str.lower()).all()
    # legitimate params survive canonicalization
    assert urls.str.contains(r"\?page=2", regex=True).any()
    # grouping matches a tiny in-test mirror of the canonical key
    import ray.data as rd

    from simple_content_ocr_ray.sources.synth_pages import N_HOSTS

    ids = [r["doc_id"] for r in
           rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).take_all()]
    expected = {}
    for d in ids:
        key = (d % N_HOSTS, d % 500, "?page=2" if d % 7 == 0 else "")
        expected.setdefault(key, []).append(d)
    assert len(out) == len(expected)
    got = dict(zip(out["canonical_url"], zip(out["n_variants"], out["keeper_doc_id"])))
    for (h, p, q), members in expected.items():
        url = f"https://site{h}.example/doc/{p}{q}"
        n, keeper = got[url]
        assert n == len(members) and keeper == min(members)


def test_corpus_diff_all_classes_present(sf_dir):
    from simple_content_ocr_ray.pipelines.extract_queries import (
        DIFF_ADDED_RES,
        DIFF_CHANGED_RES,
        DIFF_REMOVED_RES,
        corpus_diff,
    )

    df = corpus_diff(sf_dir).set_index("doc_id")
    counts = df["status"].value_counts()
    assert set(counts.index) == {"added", "removed", "changed", "unchanged"}
    for did, status in df["status"].items():
        if did % DIFF_ADDED_RES == 0:
            assert status == "added"
        elif did % DIFF_REMOVED_RES == 0:
            assert status == "removed"
        elif did % DIFF_CHANGED_RES == 0:
            assert status == "changed"
        else:
            assert status == "unchanged"
    # urls in neither snapshot never appear
    assert not any(
        d % DIFF_ADDED_RES == 0 and d % DIFF_REMOVED_RES == 0 for d in df.index
    )


def test_wilson_lower_bound_ranks_small_samples_conservatively(ray_session):
    """The statistical property the operator exists for: a perfect tiny
    sample must not outrank a near-perfect large one by the bound."""
    import numpy as np

    from simple_content_ocr_ray.pipelines.relational import (
        _WILSON_Z,
        source_quality_wilson,
    )

    out = source_quality_wilson("/root/testdata/sf0.001")
    assert (out["wilson_lower"] <= out["pass_rate"]).all()
    assert (out["wilson_lower"] >= 0).all()
    # closed-form check on one row
    r = out.iloc[0]
    n, p = r["n_docs"], r["n_pass"] / r["n_docs"]
    z2 = _WILSON_Z**2
    lower = (p + z2 / (2 * n) - _WILSON_Z * np.sqrt(
        p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n)
    assert abs(r["wilson_lower"] - round(lower, 4)) < 1e-9

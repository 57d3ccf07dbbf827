"""Round-4 TPC-H-style additions (q6/q7/q10/q13/q14/q16) vs pandas
brute-force references over sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_content_ocr_ray.pipelines.relational import (
    Q6_DISC_HI_C,
    Q6_DISC_LO_C,
    Q6_HI,
    Q6_LO,
    Q6_QTY_MAX,
    Q7_NATION_A,
    Q7_NATION_B,
    Q7_YEAR_HI,
    Q7_YEAR_LO,
    Q10_QUARTER_HI,
    Q10_QUARTER_LO,
    Q10_TOPK,
    Q14_MONTH_HI,
    Q14_MONTH_LO,
    Q14_PROMO_TYPE,
    Q16_EXCL_BRAND,
    Q16_EXCL_TYPE,
    Q16_SIZES,
    q6_forecast_revenue,
    q7_volume_shipping,
    q10_returned_items,
    q13_order_distribution,
    q14_promo_revenue,
    q16_parts_supplier_counts,
)

SF = "/root/testdata/sf0.001"


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def test_q6_brute_force(ray_session):
    out = q6_forecast_revenue(SF)
    li = _li()
    disc_c = np.rint(li.l_discount * 100).astype("int64")
    m = (
        (li.l_shipdate >= Q6_LO)
        & (li.l_shipdate < Q6_HI)
        & (disc_c >= Q6_DISC_LO_C)
        & (disc_c <= Q6_DISC_HI_C)
        & (li.l_quantity < Q6_QTY_MAX)
    )
    exp = (li.l_extendedprice * li.l_discount)[m].sum()
    assert len(out) == 1
    assert abs(out["revenue"].iloc[0] - exp) < 0.01
    assert exp > 0  # the band actually selects rows at this sf


def test_q7_brute_force(ray_session):
    out = q7_volume_shipping(SF)
    li = _li()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            nation.rename(columns={"n_name": "supp_nation"}),
            left_on="s_nationkey",
            right_on="n_nationkey",
        )
        .merge(
            nation.rename(
                columns={"n_name": "cust_nation", "n_nationkey": "ck"}
            )[["ck", "cust_nation"]],
            left_on="c_nationkey",
            right_on="ck",
        )
    )
    pair = {Q7_NATION_A, Q7_NATION_B}
    j = j[
        j.supp_nation.isin(pair)
        & j.cust_nation.isin(pair)
        & (j.supp_nation != j.cust_nation)
        & (j.l_shipdate >= Q7_YEAR_LO)
        & (j.l_shipdate < Q7_YEAR_HI)
    ]
    j["l_year"] = j.l_shipdate.dt.year
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    exp = (
        j.groupby(["supp_nation", "cust_nation", "l_year"])["rev"]
        .sum()
        .reset_index()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp) > 0
    assert out["supp_nation"].tolist() == exp["supp_nation"].tolist()
    assert out["l_year"].tolist() == exp["l_year"].tolist()
    assert (out["revenue"] - exp["rev"]).abs().max() < 0.01


def test_q10_brute_force(ray_session):
    out = q10_returned_items(SF)
    li = _li()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders = orders[
        (orders.o_orderdate >= Q10_QUARTER_LO)
        & (orders.o_orderdate < Q10_QUARTER_HI)
    ]
    j = li[li.l_returnflag == "R"].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    per = (
        j.groupby("o_custkey")["rev"].sum().reset_index(name="rev")
    )
    per = per.sort_values(
        ["rev", "o_custkey"], ascending=[False, True]
    ).head(Q10_TOPK)
    assert len(out) == min(Q10_TOPK, len(per)) > 0
    assert out["c_custkey"].tolist() == per["o_custkey"].tolist()
    assert (out["revenue"].to_numpy() - per["rev"].to_numpy()).max() < 0.01


def test_q13_includes_zero_order_customers(ray_session):
    out = q13_order_distribution(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    counts = orders.groupby("o_custkey").size()
    full = cust.set_index("c_custkey").index.map(counts).fillna(0).astype(int)
    exp = pd.Series(full).value_counts()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == exp.to_dict()
    assert int(out["custdist"].sum()) == len(cust)  # every customer bucketed


def test_q14_brute_force(ray_session):
    out = q14_promo_revenue(SF)
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j.l_shipdate >= Q14_MONTH_LO) & (j.l_shipdate < Q14_MONTH_HI)]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    exp = 100.0 * j.loc[j.p_type == Q14_PROMO_TYPE, "rev"].sum() / j["rev"].sum()
    assert len(out) == 1
    assert abs(out["promo_revenue"].iloc[0] - exp) < 0.01
    assert 0 < out["promo_revenue"].iloc[0] < 100


def test_q16_brute_force(ray_session):
    out = q16_parts_supplier_counts(SF)
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    part = part[
        (part.p_brand != Q16_EXCL_BRAND)
        & (part.p_type != Q16_EXCL_TYPE)
        & (part.p_size.isin(Q16_SIZES))
    ]
    bad = set(supp.loc[supp.s_acctbal < 0, "s_suppkey"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[~j.l_suppkey.isin(bad)]
    exp = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
    )
    assert len(out) == len(exp) > 0
    got = {
        (r.p_brand, r.p_type, int(r.p_size)): int(r.supplier_cnt)
        for r in out.itertuples()
    }
    expd = {
        (r.p_brand, r.p_type, int(r.p_size)): int(r.supplier_cnt)
        for r in exp.itertuples()
    }
    assert got == expd
    # the ordering contract: supplier_cnt desc, then keys asc
    key = list(
        zip(-out["supplier_cnt"], out["p_brand"], out["p_type"], out["p_size"])
    )
    assert key == sorted(key)

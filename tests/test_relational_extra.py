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

"""Temporal joins (functions/joins.py) vs brute-force pandas references."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_content_ocr_ray.functions import joins

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_asof_join_matches_bruteforce(ray_session):
    got = (
        joins.events_asof_join(SF)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = _events()
    p = ev[ev["event_type"] == "purchase"].sort_values("event_id")
    views = ev[ev["event_type"] == "view"]
    exp_view_ts = []
    for _, row in p.iterrows():
        prior = views[(views["user_id"] == row["user_id"]) & (views["ts"] <= row["ts"])]
        exp_view_ts.append(prior["ts"].max() if len(prior) else pd.NaT)
    assert list(got["event_id"]) == list(p["event_id"])
    pd.testing.assert_series_equal(
        got["view_ts"].reset_index(drop=True),
        pd.Series(exp_view_ts, dtype="datetime64[us]").reset_index(drop=True),
        check_names=False,
    )
    # lag is the exact microsecond difference where a view exists
    has = got["view_ts"].notna()
    lag = (
        got.loc[has, "ts"].astype("int64") - got.loc[has, "view_ts"].astype("int64")
    ).astype("float64")
    assert np.array_equal(got.loc[has, "lag_us"].to_numpy(), lag.to_numpy())
    assert got.loc[~has, "lag_us"].isna().all()


def test_range_join_matches_bruteforce(ray_session):
    got = joins.events_range_join(SF).sort_values("window_id").reset_index(drop=True)
    ev = _events()
    t0 = ev["ts"].min().floor("D")
    for i in [0, 1, 17, 59]:
        lo = t0 + pd.Timedelta(hours=joins.RANGE_HOP_H * i)
        hi = lo + pd.Timedelta(hours=joins.RANGE_WIDTH_H)
        inside = ev[(ev["ts"] >= lo) & (ev["ts"] < hi)]
        row = got.iloc[i]
        assert row["n_events"] == len(inside)
        exp = np.rint(inside["value"].to_numpy() * 1e6).astype("int64").sum() / 1e6
        assert abs(row["sum_value"] - round(exp, 4)) < 1e-9
    # overlapping hop/width ⇒ every event lands in 1 or 2 windows
    assert got["n_events"].sum() >= len(ev)


def test_range_join_windows_overlap(ray_session):
    got = joins.events_range_join(SF)
    assert len(got) == joins.RANGE_N_WINDOWS
    w = got.sort_values("window_id")
    assert (w["w_end"] - w["w_start"] == pd.Timedelta(hours=joins.RANGE_WIDTH_H)).all()
    assert (
        w["w_start"].diff().dropna() == pd.Timedelta(hours=joins.RANGE_HOP_H)
    ).all()


def test_user_running_totals_bruteforce(ray_session):
    from simple_content_ocr_ray.functions.window import user_running_totals

    got = user_running_totals(SF).sort_values("event_id").reset_index(drop=True)
    ev = _events().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    value_u = np.rint(ev["value"].to_numpy() * 1e6).astype("int64")
    ev = ev.assign(vu=value_u)
    run = ev.groupby("user_id")["vu"].cumsum() / 1e6
    exp = ev.assign(running_value=run.round(4)).sort_values("event_id")
    assert np.allclose(
        got["running_value"].to_numpy(), exp["running_value"].to_numpy(), atol=1e-9
    )
    # gaps: NaN on each user's first event, >= 0 after
    merged = got.set_index("event_id")
    for uid, g in ev.groupby("user_id"):
        ids = g["event_id"].to_numpy()
        gaps = merged.loc[ids, "gap_us"].to_numpy()
        assert np.isnan(gaps[0])
        assert (gaps[1:] >= 0).all()


def test_asof_join_paths_equal(ray_session):
    small = joins.events_asof_join(SF).sort_values("event_id").reset_index(drop=True)
    shuffled = (
        joins.events_asof_join(SF, small_threshold=0)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, shuffled, check_like=True)


def test_running_totals_paths_equal(ray_session):
    from simple_content_ocr_ray.functions.window import user_running_totals

    small = user_running_totals(SF).sort_values("event_id").reset_index(drop=True)
    shuffled = (
        user_running_totals(SF, small_threshold=0)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(small, shuffled, check_like=True)

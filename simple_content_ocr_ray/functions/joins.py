"""Temporal join operators Ray Data has no native primitive for: as-of join
and interval (range) join, built the Ray-Data-first way.

The reference processes one document at a time and has no join surface at
all (its openspec/ only *specifies* backfill lookups — SURVEY.md §2.4); these
operators cover what a training-data pipeline over event logs needs:

* ``events_asof_join`` — for every purchase event, the most recent prior (or
  simultaneous) view event of the SAME user.  Topology: a single keyed
  shuffle (``groupby(user_id).map_groups``) — the only partitioning an as-of
  join fundamentally needs — with a vectorized ``searchsorted`` merge inside
  each group.  At 100 TB the groups are per-user event histories (small);
  skew on a hot user is bounded by that user's history, not the corpus.

* ``events_range_join`` — count/sum of events falling in each of a set of
  OVERLAPPING time windows.  The window table is small (windows-per-corpus,
  not rows-per-corpus), so this is a broadcast range join: the sorted
  interval table is ``ray.put`` once, and every batch matches its rows
  against all intervals with two binary searches per interval
  (O(W log B) per batch, no shuffle at all).  This is the scale path for
  any fact×small-intervals join; a fact×fact interval join would instead
  bucket both sides by coarse time range and pair within buckets.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import round_half_away


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


# --------------------------------------------------------------------------
# As-of join (purchase ← latest prior view, per user)
# --------------------------------------------------------------------------

def _asof_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user's events: match each purchase to the latest view with
    view.ts <= purchase.ts. Vectorized: sort views once, searchsorted."""
    p = g[g["event_type"] == "purchase"]
    if len(p) == 0:
        return pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "view_ts": pd.Series([], dtype="datetime64[us]"),
                "lag_us": pd.Series([], dtype="float64"),
            }
        )
    v_ts = np.sort(
        g.loc[g["event_type"] == "view", "ts"].to_numpy(dtype="datetime64[us]")
    )
    p_ts = p["ts"].to_numpy(dtype="datetime64[us]")
    # index of the last view <= purchase ts (side="right" then -1)
    idx = np.searchsorted(v_ts, p_ts, side="right") - 1
    has = idx >= 0
    view_ts = np.full(len(p), np.datetime64("NaT", "us"))
    view_ts[has] = v_ts[idx[has]]
    lag = np.full(len(p), np.nan)
    lag[has] = (p_ts[has].astype("int64") - view_ts[has].astype("int64")).astype(
        "float64"
    )
    return pd.DataFrame(
        {
            "event_id": p["event_id"].to_numpy(),
            "user_id": p["user_id"].to_numpy(),
            "ts": p_ts,
            "view_ts": view_ts,
            "lag_us": lag,
        }
    )


def events_asof_join(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """AS-OF JOIN: each purchase event joined to the same user's most recent
    view event at or before it (NULL when the user never viewed before).

    ``lag_us`` is the exact microsecond gap as a float (NULL-able); both
    sides compute it from the same integer microsecond timestamps, so it is
    bit-identical to the SQL oracle.

    Adaptive like ``user_sessions``: below the threshold the filtered log is
    sorted once and merged vectorized (Ray's sort-based groupby has a fixed
    multi-second shuffle cost that dwarfs small inputs); above it, the keyed
    shuffle — the partitioning an as-of join fundamentally needs at scale —
    with ONE ``merge_asof(by='user_id')`` call per sorted block
    (``map_sorted_runs``, r4: dispatch cost independent of the user count).
    Both paths share ``_asof_frame``; tests assert byte-equal outputs."""
    from .agg import map_sorted_runs

    events = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    # pre-filter: only the two joined event types ever enter the shuffle
    events = events.filter(
        expr="event_type == 'purchase' or event_type == 'view'"
    )

    def _asof_frame(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            df[df["event_type"] == "purchase"]
            .sort_values("ts", kind="mergesort")
            .reset_index(drop=True)
        )
        v = (
            df.loc[df["event_type"] == "view", ["user_id", "ts"]]
            .sort_values("ts", kind="mergesort")
            .rename(columns={"ts": "view_ts"})
        )
        m = pd.merge_asof(
            p,
            v,
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
        )
        ts_us = m["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        view_us = m["view_ts"].to_numpy(dtype="datetime64[us]")
        lag = np.where(
            np.isnat(view_us),
            np.nan,
            (ts_us - view_us.astype("int64")).astype("float64"),
        )
        out_df = pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "ts": m["ts"].astype("datetime64[us]"),
                "view_ts": pd.Series(view_us),
                "lag_us": lag,
            }
        )
        return out_df.astype({"event_id": "int64", "user_id": "int64"})

    # decide the path from footer metadata (an upper bound on the filtered
    # size) — no execution, no object-store pinning
    if events_row_count(sf_dir) <= small_threshold:
        return _asof_frame(events.to_pandas())
    df = map_sorted_runs(events, "user_id", _asof_frame).to_pandas()
    return df.astype({"event_id": "int64", "user_id": "int64"})


_EVENTS_ASOF_JOIN_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
), best AS (
  SELECT p.event_id, MAX(v.vts) AS view_ts
  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vts <= p.ts
  GROUP BY p.event_id
)
SELECT p.event_id, p.user_id, p.ts, best.view_ts,
       CAST(epoch_us(p.ts) - epoch_us(best.view_ts) AS DOUBLE) AS lag_us
FROM p JOIN best USING (event_id)
"""


# --------------------------------------------------------------------------
# Broadcast interval (range) join
# --------------------------------------------------------------------------

#: overlapping promo windows: hop 12 h, width 18 h (each event hits 1-2)
RANGE_N_WINDOWS = 60
RANGE_HOP_H = 12
RANGE_WIDTH_H = 18


def events_row_count(sf_dir: str) -> int:
    """Row count from the parquet footer — the adaptive small-vs-shuffle
    decision must not execute (let alone pin) the dataset; at corpus scale a
    ``materialize()`` just to count would hold the whole filtered log in the
    object store."""
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows


def ts_range_from_footers(sf_dir: str) -> tuple:
    """(min, max) of events.ts from parquet row-group statistics — zero
    data bytes read. Scalars like window anchors / gap-fill ranges must not
    cost a corpus pass at 100 TB."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata
    idx = md.schema.to_arrow_schema().get_field_index("ts")
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:  # fall back to a scan
            import ray.data as _rd

            ds = _rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
            return ds.min("ts"), ds.max("ts")
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def _min_ts_from_footers(sf_dir: str):
    return ts_range_from_footers(sf_dir)[0]


def _window_table(t0: np.datetime64) -> pd.DataFrame:
    start = t0 + np.arange(RANGE_N_WINDOWS) * np.timedelta64(RANGE_HOP_H, "h")
    return pd.DataFrame(
        {
            "window_id": np.arange(RANGE_N_WINDOWS, dtype="int64"),
            "w_start": start.astype("datetime64[us]"),
            "w_end": (start + np.timedelta64(RANGE_WIDTH_H, "h")).astype(
                "datetime64[us]"
            ),
        }
    )


def events_range_join(sf_dir: str) -> pd.DataFrame:
    """RANGE JOIN: per overlapping promo window (hop 12 h, width 18 h,
    anchored at the corpus's first day), the count of events and exact sum of
    ``value`` inside [w_start, w_end).

    The window table is derived from a one-number driver aggregate
    (``min(ts)``) and broadcast via ``ray.put``; each batch computes, per
    window, two binary searches over its ts-sorted rows plus a prefix-sum
    lookup for the value total — O(W log B) with no shuffle. Partials
    (one row per window per batch) are merged on the driver: bounded by
    windows × batches, independent of corpus size."""
    events = _read_events(sf_dir, ["ts", "value"])
    t0 = np.datetime64(
        pd.Timestamp(_min_ts_from_footers(sf_dir)).floor("D").to_datetime64(), "us"
    )
    win = _window_table(t0)
    starts = win["w_start"].to_numpy(dtype="datetime64[us]")
    ends = win["w_end"].to_numpy(dtype="datetime64[us]")
    win_ref = ray.put((starts, ends))

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        starts, ends = ray.get(win_ref)
        order = np.argsort(df["ts"].to_numpy(dtype="datetime64[us]"), kind="stable")
        ts = df["ts"].to_numpy(dtype="datetime64[us]")[order]
        # exact money-scaled prefix sums → order-independent int64 totals
        val_u = np.rint(df["value"].to_numpy()[order] * 1_000_000).astype("int64")
        prefix = np.concatenate(([0], np.cumsum(val_u)))
        lo = np.searchsorted(ts, starts, side="left")
        hi = np.searchsorted(ts, ends, side="left")
        return pd.DataFrame(
            {
                "window_id": np.arange(len(starts), dtype="int64"),
                "n_events": (hi - lo).astype("int64"),
                "sum_value_u": prefix[hi] - prefix[lo],
            }
        )

    partials = events.map_batches(
        per_batch, batch_format="pandas", batch_size=65536
    ).to_pandas()
    agg = (
        partials.groupby("window_id", sort=True)[["n_events", "sum_value_u"]]
        .sum()
        .reset_index()
    )
    out = win.merge(agg, on="window_id", how="left")
    return pd.DataFrame(
        {
            "window_id": out["window_id"].astype("int64"),
            "w_start": out["w_start"],
            "w_end": out["w_end"],
            "n_events": out["n_events"].fillna(0).astype("int64"),
            "sum_value": round_half_away(out["sum_value_u"].fillna(0) / 1_000_000.0),
        }
    )


_EVENTS_RANGE_JOIN_SQL = f"""
WITH b AS (
  SELECT date_trunc('day', MIN(ts)) AS t0 FROM events
), win AS (
  SELECT r.range AS window_id,
         b.t0 + r.range * INTERVAL {RANGE_HOP_H} HOUR AS w_start,
         b.t0 + r.range * INTERVAL {RANGE_HOP_H} HOUR
              + INTERVAL {RANGE_WIDTH_H} HOUR AS w_end
  FROM b, range({RANGE_N_WINDOWS}) r
)
SELECT win.window_id, win.w_start, win.w_end,
       COUNT(e.ts) AS n_events,
       ROUND(COALESCE(SUM(CAST(ROUND(e.value * 1000000, 0) AS BIGINT)), 0)
             / 1000000.0, 4) AS sum_value
FROM win LEFT JOIN events e ON e.ts >= win.w_start AND e.ts < win.w_end
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Sequence funnel (view → click → purchase, strictly increasing ts)
# --------------------------------------------------------------------------

def _funnel_times(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user funnel timestamps — fully vectorized grouped merges, so the
    same code serves the single-node path (whole frame) and each shuffle
    group (one user's frame)."""
    v = (
        df[df["event_type"] == "view"]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t1")
        .reset_index()
    )
    c = df[df["event_type"] == "click"].merge(v, on="user_id")
    c = (
        c[c["ts"] > c["t1"]]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t2")
        .reset_index()
    )
    p = df[df["event_type"] == "purchase"].merge(c, on="user_id")
    p = (
        p[p["ts"] > p["t2"]]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t3")
        .reset_index()
    )
    out = v.merge(c, on="user_id", how="left").merge(p, on="user_id", how="left")
    return out


def user_funnel_counts(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Funnel conversion: distinct users with a view, a click strictly after
    their first view, and a purchase strictly after that first qualifying
    click. One row: (n_view, n_view_click, n_funnel).

    Adaptive: small logs run the vectorized grouped merges on one node;
    large logs shuffle by user and run the SAME grouped merges once per
    sorted block (``map_sorted_runs``, r4 — every user's rows co-located,
    dispatch independent of user count); the per-user flags are
    count-reduced — the driver sees three integers."""
    from .agg import map_sorted_runs

    events = _read_events(sf_dir, ["user_id", "ts", "event_type"]).filter(
        expr="event_type == 'view' or event_type == 'click' or event_type == 'purchase'"
    )

    if events_row_count(sf_dir) <= small_threshold:
        t = _funnel_times(events.to_pandas())
    else:
        t = map_sorted_runs(events, "user_id", _funnel_times).to_pandas()
    return pd.DataFrame(
        {
            "n_view": pd.Series([len(t)], dtype="int64"),
            "n_view_click": pd.Series([int(t["t2"].notna().sum())], dtype="int64"),
            "n_funnel": pd.Series([int(t["t3"].notna().sum())], dtype="int64"),
        }
    )


_USER_FUNNEL_COUNTS_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_funnel
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "user_funnel_counts": user_funnel_counts,
}
ORACLES: dict[str, str] = {
    "events_asof_join": _EVENTS_ASOF_JOIN_SQL,
    "events_range_join": _EVENTS_RANGE_JOIN_SQL,
    "user_funnel_counts": _USER_FUNNEL_COUNTS_SQL,
}

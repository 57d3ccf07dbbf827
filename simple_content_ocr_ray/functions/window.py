"""Streaming-shaped semantics over the ``events`` log table (SURVEY.md §2.8):
Ray Data has no event-time windows, so windows are expressed as a keyed
shuffle plus in-run vectorized math — the partitioning assumption (all
events of a user co-located) is exactly what a keyed log partitioning gives
at scale.

Large-path shape (r4): every windowed operator here runs ONE vectorized UDF
call per sorted BLOCK via ``map_sorted_runs`` — the UDF re-sorts the block
by (user_id, ts, …) and applies the SAME multi-user vectorized function the
small path uses on the whole log. The r3 ``groupby(user_id).map_groups``
paid ~ms of python dispatch per user — ruinous at 10^9 users; per-block
dispatch is group-count-independent.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import grouped_aggregate, map_sorted_runs, round_half_away

SESSION_GAP_MIN = 30


def _sessions_for_sorted(df: pd.DataFrame) -> pd.DataFrame:
    """Sessionize a frame already sorted by (user_id, ts) — vectorized: a new
    session starts at a user change or a gap > SESSION_GAP_MIN."""
    new_session = (df["user_id"] != df["user_id"].shift()) | (
        df["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
    )
    sid = new_session.cumsum()
    out = df.groupby(sid).agg(
        user_id=("user_id", "first"),
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("ts", "size"),
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out.reset_index(drop=True)


def user_sessions(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds 30 minutes. Returns one row per session.

    Adaptive like grouped_aggregate: small logs are sorted once and
    sessionized vectorized; large logs shuffle by user and sessionize each
    sorted BLOCK in one vectorized call (``map_sorted_runs`` — the keyed-log
    partitioning assumption at scale, python dispatch per block, not per
    user). The path decision reads the parquet footer row count — no
    execution, no object-store pinning."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        return _sessions_for_sorted(df.reset_index(drop=True))

    if events_row_count(sf_dir) <= small_threshold:
        return sessions(events.to_pandas())
    return map_sorted_runs(events, "user_id", sessions).to_pandas()


_USER_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Hopping (sliding) window aggregate
# --------------------------------------------------------------------------

HOP_MIN = 30
WINDOW_MIN = 60


def events_sliding_windows(sf_dir: str) -> pd.DataFrame:
    """Hopping-window aggregate: per (event_type, 60-minute window hopping
    every 30 minutes), event count and exact sum of ``value``.

    With hop = width/2 every event belongs to exactly two windows
    (floor30(ts) and floor30(ts) - 30 min), so window assignment is a
    per-batch vectorized row duplication — no window state, no sort. The
    duplicated rows feed the partial+final grouped aggregate, so the shuffle
    moves one (type, window) partial per batch, not 2× the event log."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )
    hop = pd.Timedelta(minutes=HOP_MIN)

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        w1 = df["ts"].dt.floor(f"{HOP_MIN}min")
        value_u = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        return pd.DataFrame(
            {
                "event_type": np.tile(df["event_type"].to_numpy(), 2),
                "w_start": np.concatenate([w1.to_numpy(), (w1 - hop).to_numpy()]),
                "value_u": np.tile(value_u, 2),
            }
        )

    agg = grouped_aggregate(
        events,
        ["event_type", "w_start"],
        {"sum_value_u": ("value_u", "sum"), "n_events": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "w_start": agg["w_start"],
            "sum_value": round_half_away(agg["sum_value_u"] / 1_000_000.0),
            "n_events": agg["n_events"].astype("int64"),
        }
    )


_EVENTS_SLIDING_SQL = f"""
WITH assigned AS (
  SELECT event_type, time_bucket(INTERVAL {HOP_MIN} MINUTE, ts) AS w_start,
         value
  FROM events
  UNION ALL
  SELECT event_type,
         time_bucket(INTERVAL {HOP_MIN} MINUTE, ts)
           - INTERVAL {HOP_MIN} MINUTE AS w_start,
         value
  FROM events
)
SELECT event_type, w_start,
       ROUND(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) / 1000000.0, 4)
         AS sum_value,
       COUNT(*) AS n_events
FROM assigned
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Ordered per-key window functions (running sum, lag delta)
# --------------------------------------------------------------------------

def user_running_totals(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """SQL-window-function analog: per user ordered by ts, the running total
    of ``value`` and the gap (microseconds) since the user's previous event.

    One keyed shuffle; inside each sorted block ONE vectorized call computes
    per-user grouped cumsum/diff (pandas C-level groupby cumsum — the same
    function the small path runs on the whole log; the block's user runs
    are complete by the ``map_sorted_runs`` invariant). Money values are
    cumsum-ed as exactly-scaled int64, so running totals are bit-identical
    to the SQL oracle at every row. Tests assert both paths byte-equal."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        value_u = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        run_u = (
            pd.Series(value_u).groupby(df["user_id"].to_numpy(), sort=False).cumsum()
        )
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        gap = np.diff(ts_us, prepend=ts_us[:1]).astype("float64")
        new_user = ~pd.Series(df["user_id"].to_numpy()).duplicated().to_numpy()
        gap[new_user] = np.nan
        out_df = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "running_value": round_half_away(run_u.to_numpy() / 1_000_000.0),
                "gap_us": gap,
            }
        )
        return out_df.astype({"event_id": "int64", "user_id": "int64"})

    if events_row_count(sf_dir) <= small_threshold:
        return running(events.to_pandas())
    out = map_sorted_runs(events, "user_id", running)
    return out.to_pandas().astype({"event_id": "int64", "user_id": "int64"})


_USER_RUNNING_TOTALS_SQL = """
SELECT event_id, user_id, ts,
       ROUND(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) / 1000000.0, 4)
         AS running_value,
       CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
            AS DOUBLE) AS gap_us
FROM events
"""


# --------------------------------------------------------------------------
# Cohort retention (first-day cohort × day offset → distinct active users)
# --------------------------------------------------------------------------

def cohort_retention(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Classic retention matrix: cohort a user by their first active calendar
    day, then count distinct users active at each day offset from their
    cohort day.

    Scale shape: raw events are deduped to (user, day) per batch FIRST, so
    the only keyed shuffle moves at most |users| × |days| rows, never raw
    events; per user-group one min() gives the cohort and each distinct day
    emits exactly one (cohort, offset) row — making the final small
    partial+final count an exact distinct-user count with no second
    distinct pass.

    Adaptive like ``user_sessions``: below the row threshold the deduped
    (user, day) pairs are reduced vectorized on the driver (the shuffle's
    multi-second fixed cost dwarfs a 100k-row log); above it the keyed
    shuffle runs. Tests assert both paths equal."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()

    def finish(per_user: pd.DataFrame) -> pd.DataFrame:
        out = per_user.astype({"day_offset": "int64", "n_users": "int64"})
        return out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)

    if events_row_count(sf_dir) <= small_threshold:
        ud = (
            events.map_batches(user_days, batch_format="pandas")
            .to_pandas()
            .drop_duplicates()
        )
        cohort = ud.groupby("user_id")["day"].transform("min")
        per_user = (
            pd.DataFrame(
                {
                    "cohort_day": cohort,
                    "day_offset": (ud["day"] - cohort).dt.days,
                }
            )
            .groupby(["cohort_day", "day_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return finish(per_user)

    def offsets(df: pd.DataFrame) -> pd.DataFrame:
        # every complete user run in the block, one vectorized pass: distinct
        # (user, day), per-user min day via C-level grouped transform
        df = df.drop_duplicates(["user_id", "day"])
        # int day arithmetic: pandas Series can't hold datetime64[D]
        days = df["day"].to_numpy(dtype="datetime64[D]").astype("int64")
        uid = df["user_id"].to_numpy()
        cohort = (
            pd.Series(days).groupby(uid, sort=False).transform("min").to_numpy()
        )
        return pd.DataFrame(
            {
                "cohort_day": cohort.astype("datetime64[D]").astype("datetime64[us]"),
                "day_offset": days - cohort,
            }
        )

    per_user = map_sorted_runs(
        events.map_batches(user_days, batch_format="pandas"), "user_id", offsets
    )
    out = grouped_aggregate(
        per_user, ["cohort_day", "day_offset"], {"n_users": (None, "count")}
    ).to_pandas()
    return finish(out)


_COHORT_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), c AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1
)
SELECT c.cohort_day,
       DATE_DIFF('day', c.cohort_day, ud.day) AS day_offset,
       COUNT(*) AS n_users
FROM ud JOIN c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Grouped mode (most frequent value per key)
# --------------------------------------------------------------------------

def user_modal_event(sf_dir: str) -> pd.DataFrame:
    """Each user's most frequent event type (ties broken alphabetically) and
    its count — the grouped MODE shape. Two aggregation levels, both
    distributed: (user, event_type) counts via partial+final sums (the only
    shuffle, at most |users|×|types| rows), then an argmax per user over
    that bounded table (at 10^9 users that step becomes the partial-top-1
    shape of ``longest_doc_per_group``) — no raw-event shuffle, no sort."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )
    counts = grouped_aggregate(
        events, ["user_id", "event_type"], {"n": (None, "count")}
    ).to_pandas()
    counts = counts.sort_values(
        ["n", "event_type"], ascending=[False, True], kind="mergesort"
    )
    out = (
        counts.groupby("user_id", sort=False)
        .head(1)
        .rename(columns={"event_type": "modal_event"})
        .astype({"user_id": "int64", "n": "int64"})
    )
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "modal_event", "n"]
    ]


_USER_MODAL_EVENT_SQL = """
SELECT user_id, modal_event, n FROM (
  SELECT user_id, event_type AS modal_event, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Ordered string aggregation (per-user event journey)
# --------------------------------------------------------------------------

def user_event_journeys(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Ordered STRING_AGG per user: each user's event types joined with ','
    in (ts, event_id) order, plus the event count — the order-sensitive
    grouped-concat shape (sequence mining's input format).

    Same adaptive topology as ``user_sessions``: one vectorized sort on
    small logs, a keyed shuffle + one call per sorted block
    (``map_sorted_runs``) on large ones — order-sensitive logic stays
    inside the complete user runs either way."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def journeys(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = df.groupby("user_id", sort=False).agg(
            journey=("event_type", ",".join), n_events=("event_type", "size")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index().astype({"user_id": "int64"})

    if events_row_count(sf_dir) <= small_threshold:
        out = journeys(events.to_pandas())
    else:
        out = map_sorted_runs(events, "user_id", journeys).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


_USER_EVENT_JOURNEYS_SQL = """
SELECT user_id,
       STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS journey,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Event transition matrix (Markov next-event counts, LEAD semantics)
# --------------------------------------------------------------------------

def event_transitions(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """First-order Markov transition matrix over each user's ts-ordered event
    stream: for every consecutive (event, next-event) pair within a user,
    the count and the row-normalized transition probability — the
    sequence-mining LEAD shape (page-path / next-action models).

    Scale topology: the only keyed shuffle is ``groupby(user_id)``, the
    events table's one canonical partitioning; each group emits its LOCAL
    (from, to) counts (at most |types|² rows per user, not per event), and
    the partial+final grouped aggregate sums them. The probability
    normalization runs on the final |types|² table — bounded by the type
    vocabulary, never the log. Small logs skip the shuffle: one vectorized
    sort + shift (paths byte-equal, asserted in tests)."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def pairs_sorted(df: pd.DataFrame) -> pd.DataFrame:
        """(from,to) local counts for a frame sorted by (user_id, ts, event_id)."""
        et = df["event_type"].to_numpy()
        same_user = df["user_id"].to_numpy()[:-1] == df["user_id"].to_numpy()[1:]
        out = pd.DataFrame(
            {"from_type": et[:-1][same_user], "to_type": et[1:][same_user]}
        )
        return out.groupby(["from_type", "to_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    if events_row_count(sf_dir) <= small_threshold:
        df = events.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        counts = pairs_sorted(df)
    else:
        local = map_sorted_runs(
            events,
            "user_id",
            lambda df: pairs_sorted(
                df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            ),
        )
        counts = grouped_aggregate(
            local, ["from_type", "to_type"], {"n": ("n", "sum")}
        ).to_pandas()

    counts["n"] = counts["n"].astype("int64")
    tot = counts.groupby("from_type")["n"].transform("sum")
    counts["p"] = round_half_away(counts["n"] / tot)
    return counts.sort_values(["from_type", "to_type"]).reset_index(drop=True)


_EVENT_TRANSITIONS_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY from_type), 4) AS p
FROM nxt WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


def daily_bounce_rate(sf_dir: str) -> pd.DataFrame:
    """Per-day bounce rate: the share of sessions (30-minute gap rule, same
    semantics as ``user_sessions``) holding exactly ONE event, keyed by the
    session's start day. Fully distributed: the keyed session shuffle emits
    one slim (day, is_bounce) row per session, then a partial+final day
    rollup — the sessions table never lands on the driver."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def session_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort").reset_index(
            drop=True
        )
        s = _sessions_for_sorted(df)  # handles every user run in the block
        return pd.DataFrame(
            {
                "day": s["session_start"].dt.floor("D"),
                "bounce": (s["n_events"] == 1).astype("int64"),
            }
        )

    sess = map_sorted_runs(events, "user_id", session_rows)
    out = grouped_aggregate(
        sess, ["day"], {"n_sessions": (None, "count"), "n_bounce": ("bounce", "sum")}
    ).to_pandas()
    out = out.astype({"n_sessions": "int64", "n_bounce": "int64"})
    out["bounce_rate"] = round_half_away(
        out["n_bounce"].to_numpy() / out["n_sessions"].to_numpy()
    )
    return out.sort_values("day").reset_index(drop=True)


_DAILY_BOUNCE_RATE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sess AS (
  SELECT date_trunc('day', MIN(ts)) AS day, COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, sid
)
SELECT day, COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS bounce_rate
FROM sess GROUP BY day ORDER BY day
"""


DAU_WINDOW_DAYS = 7


def rolling_dau_7d(sf_dir: str) -> pd.DataFrame:
    """Rolling 7-day distinct active users per day — the classic
    NON-decomposable window aggregate (distinct counts can't be merged
    across overlapping windows, so naive approaches re-scan 7× or hold
    per-day user sets). Exact in three bounded steps: (1) dedup the log to
    distinct (day, user) pairs — the only corpus-sized shuffle, pre-shrunk
    per batch; (2) explode each pair into the ≤7 window-end days it serves
    — a 7× blow-up of the DEDUPED pairs, not the log; (3) dedup (window,
    user) and count per window, both inside one partial+final aggregate.
    Days with activity in the trailing window but no events that day still
    appear (window-end days come from the explode)."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"day": df["ts"].dt.floor("D"), "user_id": df["user_id"]}
        ).drop_duplicates()

    pairs = grouped_aggregate(
        events, ["day", "user_id"], {"n": (None, "count")}, prepare=day_pairs
    )

    def explode_windows(df: pd.DataFrame) -> pd.DataFrame:
        reps = DAU_WINDOW_DAYS
        day = np.repeat(df["day"].to_numpy(), reps)
        off = np.tile(
            np.arange(reps, dtype="timedelta64[D]"), len(df)
        ).astype("timedelta64[ns]")
        return pd.DataFrame(
            {
                "w_day": day + off,
                "user_id": np.repeat(df["user_id"].to_numpy(), reps),
            }
        ).drop_duplicates()

    win_pairs = grouped_aggregate(
        pairs, ["w_day", "user_id"], {"n": (None, "count")}, prepare=explode_windows
    )
    counts = grouped_aggregate(
        win_pairs, ["w_day"], {"dau_7d": (None, "count")}
    ).to_pandas()
    # window-end days past the final event day are artifacts of the explode
    max_day = counts["w_day"].max() - pd.Timedelta(days=DAU_WINDOW_DAYS - 1)
    counts = counts[counts["w_day"] <= max_day]
    counts["dau_7d"] = counts["dau_7d"].astype("int64")
    return (
        counts.rename(columns={"w_day": "day"})
        .sort_values("day")
        .reset_index(drop=True)
    )


_ROLLING_DAU_SQL = f"""
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), w AS (
  SELECT DISTINCT day + to_days(CAST(o AS INT)) AS w_day, user_id
  FROM du, unnest(range(0, {DAU_WINDOW_DAYS})) AS t(o)
)
SELECT w_day AS day, COUNT(DISTINCT user_id) AS dau_7d
FROM w
WHERE w_day <= (SELECT MAX(date_trunc('day', ts)) FROM events)
GROUP BY w_day ORDER BY w_day
"""


SKEW_TOPK = 10


def key_skew_report(sf_dir: str, k: int = SKEW_TOPK) -> pd.DataFrame:
    """Shuffle-skew diagnostic: the top-k hottest keys and each one's share
    of the total row count — what you run BEFORE choosing a partition key at
    100 TB (a key with a double-digit share needs salting, see
    ``type_distinct_users_salted``). One partial-count pass into the
    distributed local-then-final top-k — the driver receives k rows plus
    one total, never the per-key table (at 10^9 keys that table is itself
    corpus-sized)."""
    from .agg import topk

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    counts = grouped_aggregate(
        events, ["user_id"], {"n": (None, "count")}
    ).materialize()
    total = int(counts.sum("n"))
    top = topk(counts, ["n", "user_id"], k, descending=[True, False]).to_pandas()
    out = pd.DataFrame(
        {
            "user_id": top["user_id"].to_numpy(),
            "n": top["n"].to_numpy().astype("int64"),
            "share": round_half_away(top["n"].to_numpy() / total),
        }
    )
    return out.reset_index(drop=True)


_KEY_SKEW_REPORT_SQL = f"""
SELECT user_id, n, ROUND(n * 1.0 / (SELECT COUNT(*) FROM events), 4) AS share
FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
ORDER BY n DESC, user_id LIMIT {SKEW_TOPK}
"""


#: rate threshold (events within one wall-clock minute) above which a user
#: is flagged — the crawl/bot shape a web-events pipeline filters on
BOT_EPM_THRESHOLD = 2


def bot_rate_flags(sf_dir: str) -> pd.DataFrame:
    """Rate-based bot detection: a user whose burst rate ever reaches
    ``BOT_EPM_THRESHOLD`` events within one minute is flagged. Two grouped
    aggregates, both partial+final: (user, minute) counts — the only
    time the full log is keyed — then a per-user max over that bounded
    table. No sort, no sessionization, no driver loop over events."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "minute": df["ts"].dt.floor("min")}
        )

    per_min = grouped_aggregate(
        events, ["user_id", "minute"], {"n": (None, "count")}, prepare=prepare
    )
    per_user = grouped_aggregate(
        per_min, ["user_id"], {"max_epm": ("n", "max")}
    ).to_pandas()
    per_user["max_epm"] = per_user["max_epm"].astype("int64")
    per_user["is_bot"] = (per_user["max_epm"] >= BOT_EPM_THRESHOLD).astype("int64")
    return per_user.sort_values("user_id").reset_index(drop=True)


_BOT_RATE_FLAGS_SQL = f"""
WITH pm AS (
  SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, MAX(n) AS max_epm,
       CASE WHEN MAX(n) >= {BOT_EPM_THRESHOLD} THEN 1 ELSE 0 END AS is_bot
FROM pm GROUP BY user_id ORDER BY user_id
"""


def purchase_attribution(
    sf_dir: str, small_threshold: int = 2_000_000
) -> pd.DataFrame:
    """Last-touch attribution: for every purchase, which event type
    IMMEDIATELY preceded it in the same user's timeline, and how long
    before — the conversion-path report (LAG window + gap statistics).

    Only slim (prev_type, gap_us) rows leave the per-user ordering; the
    rollup is bounded by |event types|. Adaptive like the other window
    ops: small logs take one vectorized global sort with user-boundary
    masking (no per-group python); large logs take the user-keyed shuffle
    that all the windowed operators share. Gap math runs on exact µs
    int64, so the rounded means are bit-identical to the SQL oracle."""
    from .agg import grouped_aggregate, round_half_away
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def _slim(df: pd.DataFrame, same_user: np.ndarray) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        types = df["event_type"].to_numpy()
        prev_type = np.roll(types, 1)
        gap = ts_us - np.roll(ts_us, 1)
        m = (types == "purchase") & same_user
        return pd.DataFrame(
            {
                "prev_event_type": prev_type[m],
                "gap_us": pd.Series(gap[m], dtype="int64"),
            }
        )

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = pd.Series(df["user_id"].to_numpy()).duplicated().to_numpy()
        return _slim(df, same_user)

    if events_row_count(sf_dir) <= small_threshold:
        slim = rd.from_pandas(per_block(events.to_pandas()))
    else:
        slim = map_sorted_runs(events, "user_id", per_block)

    agg = grouped_aggregate(
        slim,
        ["prev_event_type"],
        {"n_purchases": (None, "count"), "sum_gap_us": ("gap_us", "sum")},
    ).to_pandas()
    out = pd.DataFrame(
        {
            "prev_event_type": agg["prev_event_type"],
            "n_purchases": agg["n_purchases"].astype("int64"),
            "avg_gap_s": round_half_away(
                agg["sum_gap_us"].to_numpy(dtype="float64")
                * 1.0
                / agg["n_purchases"].to_numpy(dtype="float64")
                / 1_000_000.0,
                4,
            ),
        }
    )
    return out.sort_values("prev_event_type").reset_index(drop=True)


def event_trigram_counts(
    sf_dir: str, small_threshold: int = 2_000_000
) -> pd.DataFrame:
    """Second-order sequence mining: counts of every consecutive ordered
    event-type TRIPLE within a user's timeline (the funnel-DISCOVERY
    complement of the fixed view→click→purchase funnel: which 3-step paths
    actually happen, and how often). Same one-keyed-shuffle topology as
    :func:`event_transitions` with a double shift — each group emits at
    most |types|³ local count rows, never per-event rows."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def triples_sorted(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        if len(df) < 3:
            empty = pd.Series([], dtype="object")
            return pd.DataFrame(
                {"t1": empty, "t2": empty, "t3": empty,
                 "n": pd.Series([], dtype="int64")}
            )
        same = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        out = pd.DataFrame(
            {"t1": et[:-2][same], "t2": et[1:-1][same], "t3": et[2:][same]}
        )
        return (
            out.groupby(["t1", "t2", "t3"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    if events_row_count(sf_dir) <= small_threshold:
        df = events.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        counts = triples_sorted(df)
    else:
        local = map_sorted_runs(
            events,
            "user_id",
            lambda df: triples_sorted(
                df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            ),
        )
        counts = grouped_aggregate(
            local, ["t1", "t2", "t3"], {"n": ("n", "sum")}
        ).to_pandas()
    counts["n"] = counts["n"].astype("int64")
    return counts.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


_EVENT_TRIGRAM_COUNTS_SQL = """
WITH w AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER win AS t2,
         LEAD(event_type, 2) OVER win AS t3
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, COUNT(*) AS n
FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY t1, t2, t3
"""


ACTIVE_WINDOW_US = 5 * 60 * 1_000_000  # each event covers [ts, ts+5min)


def user_active_time(
    sf_dir: str, small_threshold: int = 2_000_000
) -> pd.DataFrame:
    """Interval-union ("gaps and islands"): each event covers a 5-minute
    window; overlapping windows merge into islands, and the report is each
    user's island count and total COVERED time — the wall-clock-active
    metric session counts can't give (overlaps must not double-count).

    Vectorized sweep over EVERY user run in one call (shared by both
    paths): lexsort by (user, start), per-user running max of interval ends
    via C-level grouped cummax, an island starts at a user change or where
    start > previous running max; island bounds reduce to exact µs int64
    sums, rolled up per user with grouped sums — no python per user
    anywhere. Only slim (user_id, n_islands, active_us) rows leave the
    shuffle on the large path."""
    from .joins import events_row_count

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        s = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        order = np.lexsort((s, uid))
        uid, s = uid[order], s[order]
        f = s + ACTIVE_WINDOW_US
        run_max = (
            pd.Series(f).groupby(uid, sort=False).cummax().to_numpy()
        )
        new_user = np.ones(len(s), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new = new_user.copy()
        new[1:] |= s[1:] > run_max[:-1]
        # each island's end = run_max at its last member
        last = np.r_[new[1:], True]
        per_island_user = uid[new]
        span = run_max[last] - s[new]
        isl = pd.DataFrame({"user_id": per_island_user, "span": span})
        out = isl.groupby("user_id", sort=False, as_index=False).agg(
            n_islands=("span", "size"), active_us=("span", "sum")
        )
        return out

    if events_row_count(sf_dir) <= small_threshold:
        out = islands(events.to_pandas())
    else:
        out = map_sorted_runs(events, "user_id", islands).to_pandas()
    out = out.astype(
        {"user_id": "int64", "n_islands": "int64", "active_us": "int64"}
    )
    return out.sort_values("user_id").reset_index(drop=True)


_USER_ACTIVE_TIME_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {ACTIVE_WINDOW_US} AS f
  FROM events
), w AS (
  SELECT user_id, s, f,
         MAX(f) OVER (PARTITION BY user_id ORDER BY s, f
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM e
), isl AS (
  SELECT user_id, s, f,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, f
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM w
), g AS (
  SELECT user_id, island, MIN(s) AS st, MAX(f) AS en
  FROM isl GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_islands, CAST(SUM(en - st) AS BIGINT) AS active_us
FROM g GROUP BY user_id
"""


def events_dual_distinct(sf_dir: str) -> pd.DataFrame:
    """Two COUNT(DISTINCT …) of different columns per group from ONE
    corpus pass and one shuffle — the multi-distinct shape engines usually
    pay two scans for: each batch dedups (type, user) and (type, day)
    locally and emits both into a single tagged slim stream; the grouped
    count over (type, tag, value) keys collapses global repeats, and the
    final per-(type, tag) row count is the distinct count. No per-group
    sets, no second scan."""
    from .agg import grouped_aggregate

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"],
    )

    def tagged(df: pd.DataFrame) -> pd.DataFrame:
        days = (
            df["ts"].to_numpy(dtype="datetime64[D]").astype("int64")
        )
        a = pd.DataFrame(
            {"event_type": df["event_type"], "tag": "user", "v": df["user_id"].astype("int64")}
        ).drop_duplicates()
        b = pd.DataFrame(
            {"event_type": df["event_type"], "tag": "day", "v": pd.Series(days, dtype="int64")}
        ).drop_duplicates()
        return pd.concat([a, b], ignore_index=True)

    per_value = grouped_aggregate(
        events, ["event_type", "tag", "v"], {"n": (None, "count")}, prepare=tagged
    )
    counts = (
        grouped_aggregate(
            per_value, ["event_type", "tag"], {"n_distinct": (None, "count")}
        )
        .to_pandas()
        .pivot(index="event_type", columns="tag", values="n_distinct")
        .reset_index()
    )
    out = pd.DataFrame(
        {
            "event_type": counts["event_type"],
            "n_distinct_users": counts["user"].astype("int64"),
            "n_active_days": counts["day"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


_EVENTS_DUAL_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_distinct_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days
FROM events GROUP BY event_type
"""


_PURCHASE_ATTRIBUTION_SQL = """
WITH w AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER win AS prev_type,
         LAG(ts) OVER win AS prev_ts
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type AS prev_event_type, COUNT(*) AS n_purchases,
       ROUND(SUM(epoch_us(ts) - epoch_us(prev_ts)) * 1.0 / COUNT(*)
             / 1000000.0, 4) AS avg_gap_s
FROM w WHERE event_type = 'purchase' AND prev_type IS NOT NULL
GROUP BY prev_type
"""


# --------------------------------------------------------------------------
# Exponential-decay (half-life) engagement scoring — exact scaled integers
# --------------------------------------------------------------------------

DECAY_MAX_AGE_DAYS = 14  # ages clamp here; weight = 2^(14 - age) fits int64


def user_decay_scores(sf_dir: str) -> pd.DataFrame:
    """Per-user recency-weighted engagement: each event contributes
    ``value`` halved per day of age relative to the corpus' newest event
    (one-day half-life), ages clamped at {max_age} days — the freshness
    score a recrawl/recommendation scheduler ranks by.

    Float Σ value·2^(-age) is NOT distribution-safe (float sums are
    order-dependent, and a shuffle reorders them — a hash oracle would be
    flaky at the rounding boundary), so the score is computed in EXACT
    scaled integers: cents(value) · 2^({max_age} - clamped_age) summed as
    int64 — associative, order-independent, bit-stable under any
    partitioning. The newest-ts scalar is one tiny aggregate broadcast
    into the per-batch weighting; the per-user rollup is a standard
    partial+final grouped sum of slim int64 rows."""
    import pyarrow.compute as pc

    from .agg import grouped_aggregate, round_half_away

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )
    max_ts = events.max("ts")

    def weighted(df: pd.DataFrame) -> pd.DataFrame:
        age_days = (
            (max_ts - df["ts"]).dt.total_seconds() // 86400
        ).astype("int64").clip(upper=DECAY_MAX_AGE_DAYS)
        cents = (
            np.sign(df["value"].to_numpy())
            * np.floor(np.abs(df["value"].to_numpy()) * 100 + 0.5)
        ).astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "scaled": cents
                * np.left_shift(
                    np.int64(1),
                    DECAY_MAX_AGE_DAYS - age_days.to_numpy(),
                ),
            }
        )

    out = grouped_aggregate(
        events, ["user_id"], {"scaled": ("scaled", "sum")}, prepare=weighted
    ).to_pandas()
    # surface as a 4dp decimal score (scaled / 2^max_age / 100) — derived
    # from the EXACT integer, so rounding happens once, identically in SQL
    out["decay_score"] = round_half_away(
        out["scaled"] / (1 << DECAY_MAX_AGE_DAYS) / 100.0
    )
    out = out.astype({"user_id": "int64", "scaled": "int64"})
    return (
        out[["user_id", "scaled", "decay_score"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


user_decay_scores.__doc__ = user_decay_scores.__doc__.format(
    max_age=DECAY_MAX_AGE_DAYS
)

_USER_DECAY_SCORES_SQL = f"""
WITH m AS (SELECT MAX(ts) AS mx FROM events),
w AS (
  SELECT user_id,
         CAST(ROUND(value * 100, 0) AS BIGINT)
           * CAST(POWER(2, {DECAY_MAX_AGE_DAYS} - LEAST(
               CAST(date_diff('second', ts, (SELECT mx FROM m)) // 86400
                    AS BIGINT), {DECAY_MAX_AGE_DAYS})) AS BIGINT) AS scaled
  FROM events
)
SELECT user_id, CAST(SUM(scaled) AS BIGINT) AS scaled,
       ROUND(SUM(scaled) / {1 << DECAY_MAX_AGE_DAYS} / 100.0, 4)
         AS decay_score
FROM w GROUP BY user_id ORDER BY user_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "user_decay_scores": user_decay_scores,
    "purchase_attribution": purchase_attribution,
    "events_dual_distinct": events_dual_distinct,
    "user_active_time": user_active_time,
    "event_trigram_counts": event_trigram_counts,
    "key_skew_report": key_skew_report,
    "bot_rate_flags": bot_rate_flags,
    "rolling_dau_7d": rolling_dau_7d,
    "daily_bounce_rate": daily_bounce_rate,
    "cohort_retention": cohort_retention,
    "event_transitions": event_transitions,
    "user_event_journeys": user_event_journeys,
    "user_modal_event": user_modal_event,
    "user_sessions": user_sessions,
    "events_sliding_windows": events_sliding_windows,
    "user_running_totals": user_running_totals,
}
ORACLES: dict[str, str] = {
    "user_decay_scores": _USER_DECAY_SCORES_SQL,
    "purchase_attribution": _PURCHASE_ATTRIBUTION_SQL,
    "events_dual_distinct": _EVENTS_DUAL_DISTINCT_SQL,
    "user_active_time": _USER_ACTIVE_TIME_SQL,
    "event_trigram_counts": _EVENT_TRIGRAM_COUNTS_SQL,
    "key_skew_report": _KEY_SKEW_REPORT_SQL,
    "bot_rate_flags": _BOT_RATE_FLAGS_SQL,
    "rolling_dau_7d": _ROLLING_DAU_SQL,
    "daily_bounce_rate": _DAILY_BOUNCE_RATE_SQL,
    "cohort_retention": _COHORT_RETENTION_SQL,
    "event_transitions": _EVENT_TRANSITIONS_SQL,
    "user_event_journeys": _USER_EVENT_JOURNEYS_SQL,
    "user_modal_event": _USER_MODAL_EVENT_SQL,
    "user_sessions": _USER_SESSIONS_SQL,
    "events_sliding_windows": _EVENTS_SLIDING_SQL,
    "user_running_totals": _USER_RUNNING_TOTALS_SQL,
}

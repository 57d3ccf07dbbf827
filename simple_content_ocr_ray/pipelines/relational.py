"""Relational operator pipelines over the TPC-H-ish driver tables.

Covers the relational capability surface the reference specifies but never
implements (SURVEY.md §2.4-§2.6: dedup D1, priority ordering D2/D3, backfill
anti-join J1/J2, status splits D5, metric aggregations A1-A5) restated as
Ray Data pipelines, each paired with an ANSI-SQL oracle in ``ORACLES``.

Cross-engine float determinism: money aggregates are summed as exactly-scaled
int64 (``rint(expr * 10^k)``) in BOTH the Ray pipeline and the SQL oracle, so
sums are bit-identical regardless of accumulation order; quotients/averages
are then derived from identical integers and rounded to 4 decimals.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import ray.data as rd

from ..functions.agg import (
    broadcast_merge,
    broadcast_semi_filter,
    distinct_values,
    grouped_aggregate,
    round_half_away,
    topk,
)


def _read(
    sf_dir: str, table: str, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, **kwargs
    )


# --------------------------------------------------------------------------
# Q1-style pricing summary (filter → derived columns → grouped aggregate)
# --------------------------------------------------------------------------

def q1_pricing(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": np.rint(df["l_quantity"] * 100).astype("int64"),
                "price_c": np.rint(df["l_extendedprice"] * 100).astype("int64"),
                "disc_c": np.rint(df["l_discount"] * 100).astype("int64"),
                "disc_price_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
                "charge_u": np.rint(
                    df["l_extendedprice"]
                    * (1 - df["l_discount"])
                    * (1 + df["l_tax"])
                    * 1_000_000
                ).astype("int64"),
            }
        )
        return out

    agg = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_c": ("qty_c", "sum"),
            "sum_price_c": ("price_c", "sum"),
            "sum_disc_c": ("disc_c", "sum"),
            "sum_disc_price_u": ("disc_price_u", "sum"),
            "sum_charge_u": ("charge_u", "sum"),
            "count_order": (None, "count"),
        },
        prepare=prepare,
    )
    df = agg.to_pandas()
    n = df["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": round_half_away(df["sum_qty_c"] / 100.0),
            "sum_base_price": round_half_away(df["sum_price_c"] / 100.0),
            "sum_disc_price": round_half_away(df["sum_disc_price_u"] / 1_000_000.0),
            "sum_charge": round_half_away(df["sum_charge_u"] / 1_000_000.0),
            "avg_qty": round_half_away(df["sum_qty_c"] / 100.0 / n),
            "avg_price": round_half_away(df["sum_price_c"] / 100.0 / n),
            "avg_disc": round_half_away(df["sum_disc_c"] / 100.0 / n),
            "count_order": n,
        }
    )
    return out


_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_qty,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_base_price,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) / 1000000.0, 4) AS sum_disc_price,
  ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) / 1000000.0, 4) AS sum_charge,
  ROUND(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_qty,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_price,
  ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 100.0 / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Top-k ordering (D2/D3 analog: priority/size ordering without a full sort)
# --------------------------------------------------------------------------

def top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = topk(ds, ["o_totalprice", "o_orderkey"], 10, descending=[True, False])
    df = out.to_pandas()
    df["o_totalprice"] = round_half_away(df["o_totalprice"])
    return df


_TOP_ORDERS_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
FROM orders
ORDER BY orders.o_totalprice DESC, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# Broadcast dimension join + grouped aggregate
# --------------------------------------------------------------------------

def customer_order_totals(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = pads.dataset(os.path.join(sf_dir, "customer.parquet")).to_table(
        columns=["c_custkey", "c_mktsegment"]
    )
    joined = broadcast_merge(
        orders, customer.to_pandas(), left_on="o_custkey", right_on="c_custkey"
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["price_c"] = np.rint(df["o_totalprice"] * 100).astype("int64")
        return df

    agg = grouped_aggregate(
        joined,
        ["c_mktsegment"],
        {"total_price_c": ("price_c", "sum"), "n_orders": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    return pd.DataFrame(
        {
            "c_mktsegment": agg["c_mktsegment"],
            "total_price": round_half_away(agg["total_price_c"] / 100.0),
            "n_orders": agg["n_orders"].astype("int64"),
        }
    )


_CUSTOMER_ORDER_TOTALS_SQL = """
SELECT
  c_mktsegment,
  ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total_price,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Anti-join (J1/J2: the backfill "content without derived output" filter)
# --------------------------------------------------------------------------

def customers_no_big_orders(sf_dir: str) -> pd.DataFrame:
    """Customers with no order above 300k — the backfill anti-join shape:
    filter the big side, distinct its keys (per-batch local dedup first),
    broadcast the key set, anti-filter the small side."""
    import pyarrow.compute as pc

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_totalprice"],
        filter=pads.field("o_totalprice") > 300000.0,  # row-group pushdown
    )
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)),
        batch_format="pyarrow",
    )
    with_big = distinct_values(big, "o_custkey")
    customer = _read(sf_dir, "customer", columns=["c_custkey"])
    return broadcast_semi_filter(customer, with_big, "c_custkey", anti=True).to_pandas()


_CUSTOMERS_NO_BIG_ORDERS_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
)
"""


# --------------------------------------------------------------------------
# Tumbling-window aggregate over the events stream table
# --------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> pd.DataFrame:
    events = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "event_hour": df["ts"].dt.floor("h"),
                "value_u": np.rint(df["value"] * 1_000_000).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        events,
        ["event_type", "event_hour"],
        {"sum_value_u": ("value_u", "sum"), "n_events": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "event_hour": agg["event_hour"],
            "sum_value": round_half_away(agg["sum_value_u"] / 1_000_000.0),
            "n_events": agg["n_events"].astype("int64"),
        }
    )


_EVENTS_HOURLY_SQL = """
SELECT
  event_type,
  date_trunc('hour', ts) AS event_hour,
  ROUND(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) / 1000000.0, 4) AS sum_value,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Priority backlog (D2: FIFO-per-priority restated as grouped metrics)
# --------------------------------------------------------------------------

def priority_backlog(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate"])
    agg = grouped_aggregate(
        orders,
        ["o_orderpriority"],
        {
            "n_orders": (None, "count"),
            "oldest": ("o_orderdate", "min"),
            "newest": ("o_orderdate", "max"),
        },
    ).to_pandas()
    agg["n_orders"] = agg["n_orders"].astype("int64")
    return agg


_PRIORITY_BACKLOG_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       MIN(o_orderdate) AS oldest, MAX(o_orderdate) AS newest
FROM orders
GROUP BY o_orderpriority
"""


def distinct_user_count(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) via per-batch local dedup before the global unique —
    the shuffle only ever sees already-deduplicated batch remainders."""
    events = _read(sf_dir, "events", columns=["user_id"])
    n = len(distinct_values(events, "user_id"))
    return pd.DataFrame({"n_users": pd.Series([n], dtype="int64")})


_DISTINCT_USER_COUNT_SQL = "SELECT COUNT(DISTINCT user_id) AS n_users FROM events"


def largest_docs(sf_dir: str) -> pd.DataFrame:
    """Size-based ordering (D3: 'prioritize smaller documents' / heavy-doc
    skew diagnostics): top 20 documents by size, via distributed local-top-k —
    no full sort."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return topk(docs, ["n_chars", "doc_id"], 20, descending=[True, False]).to_pandas()


_LARGEST_DOCS_SQL = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 20
"""


def supplier_nation_hash_join(sf_dir: str) -> pd.DataFrame:
    """Native hash-partitioned join (Ray ≥2.46 ``Dataset.join``) — the
    large×large path where neither side is broadcastable. Falls back to the
    broadcast join when the API is absent."""
    supplier = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    if hasattr(supplier, "join"):
        joined = supplier.join(
            nation,
            join_type="inner",
            num_partitions=8,
            on=("s_nationkey",),
            right_on=("n_nationkey",),
        )
    else:  # pragma: no cover
        joined = broadcast_merge(
            supplier, nation.to_pandas(), left_on="s_nationkey", right_on="n_nationkey"
        )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["n_name"]].copy()
        out["bal_c"] = np.rint(df["s_acctbal"] * 100).astype("int64")
        return out

    agg = grouped_aggregate(
        joined,
        ["n_name"],
        {"total_acctbal_c": ("bal_c", "sum"), "n_suppliers": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_name": agg["n_name"],
            "total_acctbal": round_half_away(agg["total_acctbal_c"] / 100.0),
            "n_suppliers": agg["n_suppliers"].astype("int64"),
        }
    )


_SUPPLIER_NATION_HASH_JOIN_SQL = """
SELECT n_name,
       ROUND(SUM(CAST(ROUND(s_acctbal * 100, 0) AS BIGINT)) / 100.0, 4) AS total_acctbal,
       COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def priority_sorted_orders(sf_dir: str) -> pd.DataFrame:
    """D2 priority FIFO ordering via a real distributed sort: urgent-first,
    oldest-first, first 100. (``topk`` is the cheap path; this exercises the
    all-to-all ``Dataset.sort``.)"""
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"]
    )
    out = (
        orders.sort(["o_orderpriority", "o_orderdate", "o_orderkey"])
        .limit(100)
        .to_pandas()
    )
    return out


_PRIORITY_SORTED_ORDERS_SQL = """
SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
ORDER BY o_orderpriority, o_orderdate, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# ROLLUP (multi-level aggregate from ONE distributed pass)
# --------------------------------------------------------------------------

def _orders_finest(sf_dir: str) -> pd.DataFrame:
    """ONE distributed pass at the finest grain (status, priority) — counts
    and exact money sums. Both grouping-set queries (ROLLUP and CUBE)
    re-aggregate these bounded partials; the corpus is scanned once per
    query and only this |status|×|priority| table reaches the driver."""
    orders = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": df["o_orderstatus"],
                "o_orderpriority": df["o_orderpriority"],
                "price_c": np.rint(df["o_totalprice"] * 100).astype("int64"),
            }
        )

    return grouped_aggregate(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": (None, "count"), "sum_price_c": ("price_c", "sum")},
        prepare=prepare,
    ).to_pandas()


def _grouping_sets_output(levels: list[pd.DataFrame]) -> pd.DataFrame:
    out = pd.concat(levels, ignore_index=True)
    return pd.DataFrame(
        {
            "o_orderstatus": out["o_orderstatus"],
            "o_orderpriority": out["o_orderpriority"],
            "n_orders": out["n_orders"].astype("int64"),
            "sum_price": round_half_away(out["sum_price_c"] / 100.0, 2),
        }
    )


def _level(finest: pd.DataFrame, by: str | None) -> pd.DataFrame:
    vals = ["n_orders", "sum_price_c"]
    if by is None:
        return pd.DataFrame(
            {
                "o_orderstatus": [None],
                "o_orderpriority": [None],
                "n_orders": [finest["n_orders"].sum()],
                "sum_price_c": [finest["sum_price_c"].sum()],
            }
        )
    other = (
        "o_orderpriority" if by == "o_orderstatus" else "o_orderstatus"
    )
    return finest.groupby(by, as_index=False)[vals].sum().assign(**{other: None})


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(o_orderstatus, o_orderpriority): counts and exact
    money sums at all three levels — (status, priority), (status), ().

    The corpus is scanned ONCE at the finest grain; the coarser levels are
    re-aggregated from the finest partials on the driver (bounded by the
    key-combination count, not the row count) — the standard rollup trick
    that avoids one shuffle per grouping set."""
    finest = _orders_finest(sf_dir)
    return _grouping_sets_output(
        [finest, _level(finest, "o_orderstatus"), _level(finest, None)]
    )


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(o_orderstatus, o_orderpriority): all FOUR grouping sets
    — (status, priority), (status), (priority), () — from the same single
    finest-grain distributed pass as ``orders_rollup``. The extra set the
    cube adds over the rollup ((priority) alone) is one more driver-side
    re-aggregation of the bounded finest partials."""
    finest = _orders_finest(sf_dir)
    return _grouping_sets_output(
        [
            finest,
            _level(finest, "o_orderstatus"),
            _level(finest, "o_orderpriority"),
            _level(finest, None),
        ]
    )


_ORDERS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
         AS sum_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


_ORDERS_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
         AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# Interpolated percentiles (percentile_cont) from a value histogram
# --------------------------------------------------------------------------

PCTS = (0.25, 0.5, 0.75, 0.95)


def event_value_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact interpolated percentiles (SQL ``quantile_cont`` semantics) of
    ``value`` per event_type. Values are money-scaled to int64 so the
    histogram domain is discrete; the shuffle moves one (type, value) count
    per batch, never the events. Interpolation (lower + frac·(upper−lower))
    runs on the same integers the oracle aggregates, so results match to
    the rounded decimal."""
    events = _read(sf_dir, "events", columns=["event_type", "value"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_u": np.rint(df["value"] * 1_000_000).astype("int64"),
            }
        )

    hist = grouped_aggregate(
        events, ["event_type", "value_u"], {"cnt": (None, "count")}, prepare=prepare
    ).to_pandas()
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_u")
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["value_u"].to_numpy().astype("float64")
        n = int(cum[-1])
        row = {"event_type": etype}
        for q in PCTS:
            h = (n - 1) * q
            lo_i = int(np.floor(h))
            hi_i = int(np.ceil(h))
            lo = vals[np.searchsorted(cum, lo_i + 1)]
            hi = vals[np.searchsorted(cum, hi_i + 1)]
            x = lo + (h - lo_i) * (hi - lo)
            row[f"p{int(q * 100)}"] = round_half_away(x / 1_000_000.0)
        rows.append(row)
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


_EVENT_VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(CAST(ROUND(value * 1000000, 0) AS BIGINT), 0.25)
             / 1000000.0, 4) AS p25,
       ROUND(quantile_cont(CAST(ROUND(value * 1000000, 0) AS BIGINT), 0.5)
             / 1000000.0, 4) AS p50,
       ROUND(quantile_cont(CAST(ROUND(value * 1000000, 0) AS BIGINT), 0.75)
             / 1000000.0, 4) AS p75,
       ROUND(quantile_cont(CAST(ROUND(value * 1000000, 0) AS BIGINT), 0.95)
             / 1000000.0, 4) AS p95
FROM events
GROUP BY event_type
"""


# winsorization bounds as exact percent ranks (integer rank math)
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


def event_value_winsorized(sf_dir: str) -> pd.DataFrame:
    """Robust (winsorized) grouped mean: per event_type, clip ``value`` to
    its own [p05, p95] (``quantile_disc`` cutoffs) and average — the
    outlier-resistant statistic a quality dashboard wants over heavy-tailed
    web data. ONE distributed pass: the same money-scaled (type, value)
    count histogram as ``event_value_percentiles`` yields the cutoffs AND
    the clipped sum (Σ clip(v)·cnt, exact int64) — no second scan, no
    re-shuffle; events never move, only histogram rows do."""
    events = _read(sf_dir, "events", columns=["event_type", "value"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_u": np.rint(df["value"] * 1_000_000).astype("int64"),
            }
        )

    hist = grouped_aggregate(
        events, ["event_type", "value_u"], {"cnt": (None, "count")}, prepare=prepare
    ).to_pandas()
    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("value_u")
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["value_u"].to_numpy()
        cnt = g["cnt"].to_numpy()
        n = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, -(-WINSOR_LO_PCT * n // 100))])
        hi = int(vals[np.searchsorted(cum, -(-WINSOR_HI_PCT * n // 100))])
        wsum = int((np.clip(vals, lo, hi) * cnt).sum())
        rows.append(
            {
                "event_type": etype,
                "lo_cut": round_half_away(lo / 1_000_000.0),
                "hi_cut": round_half_away(hi / 1_000_000.0),
                "wmean": round_half_away(wsum / n / 1_000_000.0),
            }
        )
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


_EVENT_VALUE_WINSORIZED_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vu FROM events
), c AS (
  SELECT event_type,
         quantile_disc(vu, {WINSOR_LO_PCT / 100.0}) AS lo,
         quantile_disc(vu, {WINSOR_HI_PCT / 100.0}) AS hi
  FROM v GROUP BY event_type
)
SELECT v.event_type,
       ROUND(MIN(c.lo) / 1000000.0, 4) AS lo_cut,
       ROUND(MIN(c.hi) / 1000000.0, 4) AS hi_cut,
       ROUND(SUM(LEAST(GREATEST(vu, c.lo), c.hi)) * 1.0
             / COUNT(*) / 1000000.0, 4) AS wmean
FROM v JOIN c ON v.event_type = c.event_type
GROUP BY v.event_type
"""


# --------------------------------------------------------------------------
# Semi-structured (JSON) field extraction + rollup
# --------------------------------------------------------------------------

def props_value_stats(sf_dir: str) -> pd.DataFrame:
    """Extract the integer ``k`` field from the JSON ``props`` column
    (vectorized regex — no per-row json.loads) and aggregate per
    event_type: count, sum, max, and 4-decimal average."""
    events = _read(sf_dir, "events", columns=["event_type", "props"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype("int64")
        )
        return pd.DataFrame({"event_type": df["event_type"], "k": k})

    agg = grouped_aggregate(
        events,
        ["event_type"],
        {"n": (None, "count"), "sum_k": ("k", "sum"), "max_k": ("k", "max")},
        prepare=prepare,
    ).to_pandas()
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "sum_k": agg["sum_k"].astype("int64"),
            "max_k": agg["max_k"].astype("int64"),
            "avg_k": round_half_away(agg["sum_k"] / agg["n"]),
        }
    ).sort_values("event_type").reset_index(drop=True)


_PROPS_VALUE_STATS_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MAX(k) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 4) AS avg_k
FROM x
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Time-series: daily revenue + 7-day moving window
# --------------------------------------------------------------------------

def daily_revenue_ma7(sf_dir: str) -> pd.DataFrame:
    """Per ship-day revenue with a 7-calendar-day trailing window (sum and
    average over the days present in the window) — the moving-aggregate
    analog of a RANGE interval frame.

    The corpus pass is one partial+final aggregate keyed by day (bounded
    domain: one row per calendar day crosses the shuffle); the rolling
    window runs over that bounded daily series on the driver with a
    vectorized two-pointer prefix-sum — never over line items."""
    li = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice", "l_discount"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ship_day": df["l_shipdate"].dt.floor("D"),
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    daily = (
        grouped_aggregate(
            li, ["ship_day"], {"rev_u": ("rev_u", "sum")}, prepare=prepare
        )
        .to_pandas()
        .sort_values("ship_day")
        .reset_index(drop=True)
    )
    days = daily["ship_day"].to_numpy(dtype="datetime64[D]").astype("int64")
    rev = daily["rev_u"].to_numpy()
    prefix = np.concatenate(([0], np.cumsum(rev)))
    # first index inside the trailing 7-day window [d-6, d]
    lo = np.searchsorted(days, days - 6, side="left")
    hi = np.arange(len(days)) + 1
    sum7_u = prefix[hi] - prefix[lo]
    n_in_win = hi - lo
    return pd.DataFrame(
        {
            "ship_day": daily["ship_day"],
            "revenue": round_half_away(rev / 1_000_000.0),
            "sum7": round_half_away(sum7_u / 1_000_000.0),
            "avg7": round_half_away(sum7_u / n_in_win / 1_000_000.0),
        }
    )


_DAILY_REVENUE_MA7_SQL = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS ship_day,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                  AS BIGINT)) AS rev_u
  FROM lineitem GROUP BY 1
)
SELECT ship_day,
       ROUND(rev_u / 1000000.0, 4) AS revenue,
       ROUND(SUM(rev_u) OVER w / 1000000.0, 4) AS sum7,
       ROUND(SUM(rev_u) OVER w / COUNT(*) OVER w / 1000000.0, 4) AS avg7
FROM daily
WINDOW w AS (ORDER BY ship_day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Q3-style three-table analytical join (shipping priority)
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = pd.Timestamp("1998-06-01")
Q3_TOPK = 10


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: customers in one segment × their orders placed before
    the cutoff × line items shipped after it; revenue per order; top-10 by
    (revenue desc, o_orderdate asc, orderkey).

    Join topology for 100 TB: the segment's customer-key set is a broadcast
    semi-filter on orders (Bloom variant at 10^12 keys — same call shape);
    the filtered orders are the SMALL side of a broadcast merge into the
    lineitem scan (at larger selectivity this becomes the hash-join path of
    ``supplier_nation_hash_join``); revenue partials pre-aggregate per batch
    before the per-order groupby; the final ordering is
    local-topk-then-final-topk — no global sort anywhere."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust_keys = (
        cust.map_batches(
            lambda df: df.loc[df["c_mktsegment"] == Q3_SEGMENT, ["c_custkey"]],
            batch_format="pandas",
        )
        .to_pandas()["c_custkey"]
        .to_numpy()
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )
    orders = broadcast_semi_filter(orders, cust_keys, "o_custkey")
    orders_small = (
        orders.map_batches(
            lambda df: df.loc[
                df["o_orderdate"] < Q3_CUTOFF,
                ["o_orderkey", "o_orderdate", "o_orderpriority"],
            ],
            batch_format="pandas",
        )
    )
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )
    # shipdate predicate pushed BELOW the join: it halves the probe side
    # before any hash lookup, and the projection drops l_shipdate so the
    # join moves three columns, not four
    li = li.map_batches(
        lambda df: df.loc[
            df["l_shipdate"] > Q3_CUTOFF,
            ["l_orderkey", "l_extendedprice", "l_discount"],
        ],
        batch_format="pandas",
    )
    joined = broadcast_merge(
        li,
        orders_small.to_pandas(),
        left_on="l_orderkey",
        right_on="o_orderkey",
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "o_orderdate": df["o_orderdate"],
                "o_orderpriority": df["o_orderpriority"],
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    agg_ds = grouped_aggregate(
        joined,
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        {"rev_u": ("rev_u", "sum")},
        prepare=prepare,
    )
    agg = topk(
        agg_ds,
        ["rev_u", "o_orderdate", "o_orderkey"],
        Q3_TOPK,
        descending=[True, False, False],
    ).to_pandas()
    agg["revenue"] = round_half_away(agg["rev_u"] / 1_000_000.0)
    out = agg[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]
    return out.reset_index(drop=True).astype({"o_orderkey": "int64"})


_Q3_SHIPPING_PRIORITY_SQL = f"""
WITH j AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0)
                  AS BIGINT)) AS rev_u
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY 1, 2, 3
)
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(rev_u / 1000000.0, 4) AS revenue
FROM j
ORDER BY rev_u DESC, o_orderdate, o_orderkey
LIMIT {Q3_TOPK}
"""


# --------------------------------------------------------------------------
# Distributed correlation matrix (single-pass moment sums)
# --------------------------------------------------------------------------

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def lineitem_correlations(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlations between lineitem numeric columns from
    ONE streaming pass: each batch emits the moment sums (n, Σx, Σy, Σxy,
    Σx², Σy²) per pair — a constant-size partial regardless of batch size —
    and the driver combines a handful of rows. The textbook distributed-
    statistics shape (same partial-sums topology as ``label_centroid_norms``
    in embedding space)."""
    li = _read(sf_dir, "lineitem", columns=list(CORR_COLS))
    # pair names sorted lexically so rows line up with the SQL oracle
    pairs = sorted(
        tuple(sorted((CORR_COLS[i], CORR_COLS[j])))
        for i in range(len(CORR_COLS))
        for j in range(i + 1, len(CORR_COLS))
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a, b in pairs:
            x = df[a].to_numpy(dtype="float64")
            y = df[b].to_numpy(dtype="float64")
            rows.append(
                {
                    "col_a": a,
                    "col_b": b,
                    "n": len(x),
                    "sx": x.sum(),
                    "sy": y.sum(),
                    "sxy": (x * y).sum(),
                    "sxx": (x * x).sum(),
                    "syy": (y * y).sum(),
                }
            )
        return pd.DataFrame(rows)

    parts = li.map_batches(moments, batch_format="pandas").to_pandas()
    agg = parts.groupby(["col_a", "col_b"], sort=True).sum().reset_index()
    n = agg["n"]
    num = n * agg["sxy"] - agg["sx"] * agg["sy"]
    den = np.sqrt(
        (n * agg["sxx"] - agg["sx"] ** 2) * (n * agg["syy"] - agg["sy"] ** 2)
    )
    return pd.DataFrame(
        {
            "col_a": agg["col_a"],
            "col_b": agg["col_b"],
            "corr": (num / den).round(4),
        }
    )


_LINEITEM_CORRELATIONS_SQL = """
SELECT * FROM (
  SELECT 'l_extendedprice' AS col_a, 'l_quantity' AS col_b,
         ROUND(corr(l_extendedprice, l_quantity), 4) AS corr FROM lineitem
  UNION ALL
  SELECT 'l_discount', 'l_extendedprice',
         ROUND(corr(l_discount, l_extendedprice), 4) FROM lineitem
  UNION ALL
  SELECT 'l_discount', 'l_quantity',
         ROUND(corr(l_discount, l_quantity), 4) FROM lineitem
)
"""


# --------------------------------------------------------------------------
# Gap-filled hourly series (dense time axis from footer stats)
# --------------------------------------------------------------------------

def events_hourly_gapfill(sf_dir: str) -> pd.DataFrame:
    """Hourly event counts + exact sums over a DENSE hour axis: every hour
    between min(ts) and max(ts) appears, zero-filled when empty — the
    gap-fill every monitoring/training-curve consumer needs.

    The hour range comes from parquet footer statistics (no scan); the data
    pass is the usual one partial per (hour, batch); the reindex runs over
    the bounded hour axis on the driver (hours-per-corpus, not rows)."""
    from ..functions.joins import ts_range_from_footers

    lo, hi = ts_range_from_footers(sf_dir)
    events = _read(sf_dir, "events", columns=["ts", "value"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_hour": df["ts"].dt.floor("h"),
                "value_u": np.rint(df["value"] * 1_000_000).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        events,
        ["event_hour"],
        {"sum_value_u": ("value_u", "sum"), "n_events": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    axis = pd.date_range(
        pd.Timestamp(lo).floor("h"), pd.Timestamp(hi).floor("h"), freq="h"
    )
    dense = (
        agg.set_index("event_hour")
        .reindex(axis)
        .fillna(0)
        .rename_axis("event_hour")
        .reset_index()
    )
    return pd.DataFrame(
        {
            "event_hour": dense["event_hour"].astype("datetime64[us]"),
            "n_events": dense["n_events"].astype("int64"),
            "sum_value": round_half_away(dense["sum_value_u"] / 1_000_000.0),
        }
    )


_EVENTS_HOURLY_GAPFILL_SQL = """
WITH b AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
), hours AS (
  SELECT unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS event_hour
  FROM b
), agg AS (
  SELECT date_trunc('hour', ts) AS eh, COUNT(*) AS n,
         SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS su
  FROM events GROUP BY 1
)
SELECT hours.event_hour,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_events,
       ROUND(COALESCE(agg.su, 0) / 1000000.0, 4) AS sum_value
FROM hours LEFT JOIN agg ON agg.eh = hours.event_hour
"""


def orders_fulfillment(sf_dir: str) -> pd.DataFrame:
    """Per-order line count and revenue INCLUDING orders with no line items
    (the left-outer-join path: `Dataset.join(join_type='left_outer')`).
    Topology: lineitem is pre-aggregated per orderkey FIRST (partial sums in
    map_batches, one grouped merge), so the outer join's right side is one
    row per order, not one per line item — the shuffle moves aggregates."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    per_order = grouped_aggregate(
        li,
        ["l_orderkey"],
        {"rev_u": ("rev_u", "sum"), "n_items": (None, "count")},
        prepare=prepare,
    )
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = orders.join(
        per_order,
        join_type="left_outer",
        num_partitions=max(2, min(8, cpus)),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_orderstatus": df["o_orderstatus"],
                "n_items": df["n_items"].fillna(0).astype("int64"),
                "revenue": round_half_away(df["rev_u"].fillna(0) / 1_000_000.0),
            }
        )

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


_ORDERS_FULFILLMENT_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) AS rev_u,
         COUNT(*) AS n_items
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus,
       CAST(COALESCE(p.n_items, 0) AS BIGINT) AS n_items,
       ROUND(COALESCE(p.rev_u, 0) / 1000000.0, 4) AS revenue
FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
"""


NTILE_BUCKETS = 4


def _ntile_ranks(n: int, buckets: int) -> np.ndarray:
    """SQL NTILE bucket ids (1-based) for n ordered rows: the first n%buckets
    buckets get one extra row."""
    base, rem = divmod(n, buckets)
    sizes = np.full(buckets, base, dtype=np.int64)
    sizes[:rem] += 1
    return np.repeat(np.arange(1, buckets + 1, dtype=np.int64), sizes)


def orders_priority_ntile(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """SQL ``NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY
    o_totalprice, o_orderkey)`` — quartile assignment within each priority
    class, deterministic via the orderkey tiebreak.

    Same topology family as ``user_running_totals``: one keyed shuffle
    (``groupby(o_orderpriority).map_groups``) with an in-group stable sort;
    adaptively a single driver-side sort for small tables. The partition
    key has only 5 values, so at corpus scale the in-group sort IS the cost
    — exactly the cost the SQL window function pays, since NTILE's global
    rank within a partition cannot be computed without ordering it."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def ntile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_orderpriority": g["o_orderpriority"].to_numpy(),
                "quartile": _ntile_ranks(len(g), NTILE_BUCKETS),
            }
        )

    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(sf_dir, "orders.parquet")).num_rows
    if n_rows <= small_threshold:
        df = orders.to_pandas()
        out = pd.concat(
            [ntile(g) for _, g in df.groupby("o_orderpriority", sort=True)],
            ignore_index=True,
        )
    else:
        out = (
            orders.groupby("o_orderpriority")
            .map_groups(ntile, batch_format="pandas")
            .to_pandas()
        )
    return out.sort_values("o_orderkey").reset_index(drop=True)


_ORDERS_PRIORITY_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
FROM orders
"""


def orders_profile(sf_dir: str) -> pd.DataFrame:
    """Data profiling — the schema-audit pass run before any pipeline over
    an unknown table: per column, null count, exact distinct count, and
    numeric min/max. One streaming pass emits per-batch partials (null/
    min/max sums and the batch's DEDUPED full-128-bit value digests — at
    10^12 distinct values the collision odds are ~1e-13, so the count is
    exact in practice where a truncated 64-bit hash would measurably
    collide), the driver merges; the distinct side is bounded by distinct
    values × batches, and at unbounded cardinality it degrades to the HLL
    sketch (``hll_distinct_users``) with the same partial topology.
    Non-numeric columns report NULL min/max."""
    import hashlib

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    orders = _read(sf_dir, "orders", columns=cols)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            nn = int(s.isna().sum())
            vals = s.dropna()
            uniq = vals.unique()
            digests = b"".join(
                hashlib.md5(str(v).encode("utf-8")).digest() for v in uniq
            )
            if c in numeric and len(vals):
                mn, mx = float(vals.min()), float(vals.max())
            else:
                mn = mx = np.nan
            rows.append((c, nn, digests, mn, mx))
        return pd.DataFrame(
            rows, columns=["col", "n_null", "hashes", "min_num", "max_num"]
        )

    parts = orders.map_batches(partials, batch_format="pandas").to_pandas()
    out_rows = []
    for c in cols:
        p = parts[parts["col"] == c]
        uniq = np.unique(
            np.concatenate(
                [np.frombuffer(b, dtype="S16") for b in p["hashes"]]
            )
            if len(p)
            else np.array([], dtype="S16")
        )
        mn = p["min_num"].min()
        mx = p["max_num"].max()
        out_rows.append((c, int(p["n_null"].sum()), len(uniq), mn, mx))
    return pd.DataFrame(
        out_rows, columns=["col", "n_null", "n_distinct", "min_num", "max_num"]
    ).astype({"n_null": "int64", "n_distinct": "int64"})


def _profile_sql() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    selects = []
    for c in [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]:
        if c in numeric:
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS col, COUNT(*) - COUNT({c}) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return "\nUNION ALL\n".join(selects)


def orders_percent_rank(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """SQL PERCENT_RANK / CUME_DIST within each priority class, ordered by
    (o_totalprice, o_orderkey) — the unique tiebreak makes RANK ==
    ROW_NUMBER, so pr = (rn-1)/(n-1) and cd = rn/n, computed exactly as the
    window functions define them. Same keyed-shuffle + in-group stable sort
    topology (and adaptive small path) as ``orders_priority_ntile``."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        n = len(g)
        rn = np.arange(1, n + 1, dtype="float64")
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "o_orderpriority": g["o_orderpriority"].to_numpy(),
                "pr": (rn - 1) / (n - 1) if n > 1 else np.zeros(n),
                "cd": rn / n,
            }
        )

    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(sf_dir, "orders.parquet")).num_rows
    if n_rows <= small_threshold:
        df = orders.to_pandas()
        out = pd.concat(
            [ranks(g) for _, g in df.groupby("o_orderpriority", sort=True)],
            ignore_index=True,
        )
    else:
        out = (
            orders.groupby("o_orderpriority")
            .map_groups(ranks, batch_format="pandas")
            .to_pandas()
        )
    return out.sort_values("o_orderkey").reset_index(drop=True)


_ORDERS_PERCENT_RANK_SQL = """
SELECT o_orderkey, o_orderpriority,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def view_only_user_days(sf_dir: str) -> pd.DataFrame:
    """Set difference (SQL EXCEPT) at (user, day) grain: user-days with at
    least one view and no purchase. Both sides are per-batch-deduped before
    anything wide; the purchase side is broadcast as a composite-key
    anti-join filter (the Bloom prefilter of ``bloom_semi_prefilter`` is
    the 10^12-key variant of the same shape)."""
    events = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def side(etype: str):
        def prep(d: pd.DataFrame) -> pd.DataFrame:
            d = d[d["event_type"] == etype]
            return pd.DataFrame(
                {
                    "user_id": d["user_id"],
                    "day": d["ts"].dt.floor("D"),
                }
            ).drop_duplicates()

        return grouped_aggregate(
            events.map_batches(prep, batch_format="pandas"),
            ["user_id", "day"],
            {"n": (None, "count")},
        ).select_columns(["user_id", "day"])

    pur = side("purchase").to_pandas()
    # composite (user, day) key packed to one int64 for the broadcast set
    pur_keys = (
        pur["user_id"].to_numpy(dtype=np.int64) * 1_000_000
        + pur["day"].to_numpy(dtype="datetime64[D]").astype(np.int64)
    )

    def pack(d: pd.DataFrame) -> pd.DataFrame:
        d = d.copy()
        d["k"] = (
            d["user_id"].to_numpy(dtype=np.int64) * 1_000_000
            + d["day"].to_numpy(dtype="datetime64[us]").astype("datetime64[D]").astype(np.int64)
        )
        return d

    out = (
        broadcast_semi_filter(
            side("view").map_batches(pack, batch_format="pandas"),
            pur_keys.tolist(),
            "k",
            anti=True,
        )
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "day": pd.Series([], dtype="datetime64[us]")}
        )
    out = out[["user_id", "day"]].astype(
        {"user_id": "int64", "day": "datetime64[us]"}
    )
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


_VIEW_ONLY_USER_DAYS_SQL = """
SELECT user_id, day FROM (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
  WHERE event_type = 'view'
  EXCEPT
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
  WHERE event_type = 'purchase'
)
"""


# --------------------------------------------------------------------------
# Q5-style six-table join (local supplier volume)
# --------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_YEAR_LO = pd.Timestamp("1996-01-01")
Q5_YEAR_HI = pd.Timestamp("1997-01-01")


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation from line items where the ordering
    customer and the supplier share a nation inside one region, orders in a
    one-year window.

    Join topology for 100 TB: region→nation→(customer, supplier) collapse
    into two driver-side key→nation maps (dimension tables — tiny next to
    the facts); the year's orders annotated with the customer nation become
    the small side of a broadcast merge into the single lineitem scan; the
    supplier nation joins map-side from the broadcast supplier map; the
    same-nation equality filters per batch; revenue partials pre-aggregate
    before the 5-row final groupby. One pass over each fact table, zero
    fact-side shuffles (hash-join fallback for a wider order window is
    ``supplier_nation_hash_join``'s path)."""
    import pyarrow.parquet as pq

    # dimension tables: read driver-side (5 / 25 / |customers| / |suppliers|
    # rows — tiny next to the facts; at 100 TB customer/supplier graduate to
    # the pruned-Ray-read + broadcast_merge path, same downstream shape)
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    rkeys = set(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    name_by_nat = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nat_keys = set(name_by_nat)

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust_nat_by_key = dict(
        zip(cust["c_custkey"], cust["c_nationkey"].where(cust["c_nationkey"].isin(nat_keys), -1))
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    supp_nat_by_key = dict(
        zip(supp["s_suppkey"], supp["s_nationkey"].where(supp["s_nationkey"].isin(nat_keys), -1))
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def year_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= Q5_YEAR_LO) & (df["o_orderdate"] < Q5_YEAR_HI)
        df = df.loc[m]
        cust_nat = df["o_custkey"].map(cust_nat_by_key)
        keep = cust_nat >= 0
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"][keep], "cust_nat": cust_nat[keep]}
        )

    orders_small = orders.map_batches(year_orders, batch_format="pandas").to_pandas()
    order_nat_by_key = dict(zip(orders_small["o_orderkey"], orders_small["cust_nat"]))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    # both map-side joins + the same-nation filter + revenue partials run in
    # ONE pass inside the grouped aggregate's prepare (closure maps ship to
    # the object store once, not per batch)
    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        cust_nat = df["l_orderkey"].map(order_nat_by_key)
        supp_nat = df["l_suppkey"].map(supp_nat_by_key)
        keep = cust_nat.notna() & (cust_nat == supp_nat) & (supp_nat >= 0)
        df = df[keep]
        return pd.DataFrame(
            {
                "n_name": supp_nat[keep].astype("int64").map(name_by_nat),
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li, ["n_name"], {"rev_u": ("rev_u", "sum")}, prepare=prepare
    ).to_pandas()
    agg["revenue"] = round_half_away(agg["rev_u"] / 1_000_000.0)
    return (
        agg.sort_values(["rev_u", "n_name"], ascending=[False, True])[
            ["n_name", "revenue"]
        ].reset_index(drop=True)
    )


_Q5_LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                      AS BIGINT)) / 1000000.0, 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                  AS BIGINT)) DESC, n_name
"""


# --------------------------------------------------------------------------
# Correlated-subquery decorrelation: orders above their customer's average
# --------------------------------------------------------------------------

def orders_above_cust_avg(sf_dir: str) -> pd.DataFrame:
    """Orders whose total price is strictly above their own customer's
    average order price — the classic correlated subquery, decorrelated into
    two passes: a per-customer grouped aggregate (exact int64 cent sums),
    then a broadcast of the (sum, count) map back into a second scan that
    filters per batch. The comparison is done in integers
    (``price_c * n > sum_c``), so the predicate is bit-exact — no float
    threshold can disagree with the SQL oracle.

    At 100 TB the per-customer map outgrows one broadcast; the same two-pass
    shape then hash-partitions both scans by ``o_custkey`` (one canonical
    key, reused), which is ``supplier_nation_hash_join``'s path."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "price_c": np.rint(df["o_totalprice"] * 100).astype("int64"),
            }
        )

    per_cust = grouped_aggregate(
        orders,
        ["o_custkey"],
        {"sum_c": ("price_c", "sum"), "n": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    import ray

    ref = ray.put(
        (
            dict(zip(per_cust["o_custkey"], per_cust["sum_c"])),
            dict(zip(per_cust["o_custkey"], per_cust["n"])),
        )
    )

    class AboveAvg:
        def __init__(self) -> None:
            self.sum_by, self.n_by = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            price_c = np.rint(df["o_totalprice"].to_numpy() * 100).astype("int64")
            sum_c = df["o_custkey"].map(self.sum_by).to_numpy(dtype="int64")
            n = df["o_custkey"].map(self.n_by).to_numpy(dtype="int64")
            keep = price_c * n > sum_c
            return pd.DataFrame(
                {
                    "o_orderkey": df["o_orderkey"].to_numpy()[keep],
                    "o_custkey": df["o_custkey"].to_numpy()[keep],
                    "o_totalprice": df["o_totalprice"].to_numpy()[keep],
                    "cust_avg": round_half_away(sum_c[keep] / 100.0 / n[keep]),
                }
            ).astype({"o_orderkey": "int64", "o_custkey": "int64"})

    out = orders.map_batches(
        AboveAvg, batch_format="pandas", concurrency=(1, 8)
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


_ORDERS_ABOVE_CUST_AVG_SQL = """
WITH a AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS sum_c,
         COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o.o_custkey, o_totalprice,
       ROUND(a.sum_c / 100.0 / a.n, 4) AS cust_avg
FROM orders o JOIN a ON o.o_custkey = a.o_custkey
WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * a.n > a.sum_c
"""


# --------------------------------------------------------------------------
# FULL OUTER join (day-of-month order revenue × event activity)
# --------------------------------------------------------------------------

def dom_activity_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two independently-aggregated fact tables on
    day-of-month: order count/revenue vs event count/value. BOTH unmatched
    directions are exercised deterministically: events stop at day 30 (so
    day 31 is order-only) and the order side excludes day 15 by business
    rule (so day 15 is event-only); unmatched measures coalesce to 0 and
    the join key coalesces across sides.

    Topology: each side is a partial+final grouped aggregate (shuffle
    bounded by 31 keys), then Ray Data's NATIVE hash full_outer join — the
    same operator that joins two large fact tables key-partitioned at
    corpus scale; nothing here relies on the sides being small."""
    from ..functions.agg import round_half_away

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def oprep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "dom": df["o_orderdate"].dt.day.astype("int64"),
                "price_u": np.rint(df["o_totalprice"].to_numpy() * 100).astype(
                    "int64"
                ),
            }
        )
        return out[out["dom"] != 15]

    o_agg = grouped_aggregate(
        orders,
        ["dom"],
        {"n_orders": (None, "count"), "rev_u": ("price_u", "sum")},
        prepare=oprep,
    )

    events = _read(sf_dir, "events", columns=["ts", "value"])

    def eprep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dom": df["ts"].dt.day.astype("int64"),
                "value_u": np.rint(df["value"].to_numpy() * 1_000_000).astype(
                    "int64"
                ),
            }
        )

    e_agg = grouped_aggregate(
        events,
        ["dom"],
        {"n_events": (None, "count"), "val_u": ("value_u", "sum")},
        prepare=eprep,
    )
    # carry the key on the right side too: if the join engine leaves the
    # left key null on right-only rows, coalesce from the copy
    e_agg = e_agg.map_batches(
        lambda df: df.assign(dom_e=df["dom"]), batch_format="pandas"
    )
    j = o_agg.join(
        e_agg, join_type="full_outer", num_partitions=4, on=("dom",)
    ).to_pandas()
    dom = j["dom"]
    if "dom_e" in j.columns:
        dom = dom.fillna(j["dom_e"])
    out = pd.DataFrame(
        {
            "dom": dom.astype("int64"),
            "n_orders": j["n_orders"].fillna(0).astype("int64"),
            "order_revenue": round_half_away(j["rev_u"].fillna(0) / 100.0),
            "n_events": j["n_events"].fillna(0).astype("int64"),
            "event_value": round_half_away(j["val_u"].fillna(0) / 1_000_000.0),
        }
    )
    return out.sort_values("dom").reset_index(drop=True)


_DOM_ACTIVITY_FULL_OUTER_SQL = """
WITH o AS (
  SELECT CAST(day(o_orderdate) AS BIGINT) AS dom, COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_u
  FROM orders WHERE day(o_orderdate) <> 15 GROUP BY 1
), e AS (
  SELECT CAST(day(ts) AS BIGINT) AS dom, COUNT(*) AS n_events,
         SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS val_u
  FROM events GROUP BY 1
)
SELECT dom,
       COALESCE(o.n_orders, 0) AS n_orders,
       ROUND(COALESCE(o.rev_u, 0) / 100.0, 4) AS order_revenue,
       COALESCE(e.n_events, 0) AS n_events,
       ROUND(COALESCE(e.val_u, 0) / 1000000.0, 4) AS event_value
FROM o FULL OUTER JOIN e USING (dom)
"""


# --------------------------------------------------------------------------
# Set intersection (users present in BOTH event populations)
# --------------------------------------------------------------------------

def view_purchase_users(sf_dir: str) -> pd.DataFrame:
    """INTERSECT shape: distinct users who both viewed and purchased. One
    pass flags each event per type, ONE user-keyed partial+final aggregate
    (shuffle bounded by |users|, not events), then a vectorized filter —
    no per-side distinct passes, no second shuffle."""
    events = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "is_v": (et == "view").astype("int64"),
                "is_p": (et == "purchase").astype("int64"),
            }
        )

    agg = grouped_aggregate(
        events,
        ["user_id"],
        {"n_v": ("is_v", "sum"), "n_p": ("is_p", "sum")},
        prepare=prep,
    ).to_pandas()
    out = agg.loc[(agg["n_v"] > 0) & (agg["n_p"] > 0), ["user_id"]].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_VIEW_PURCHASE_USERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# Equal-width grouped histogram (exact integer bin math)
# --------------------------------------------------------------------------

HIST_BINS = 10


#: Benford expected first-digit frequencies, ppm (log10(1 + 1/d) rounded) —
#: literal constants on BOTH sides so no float log rides the oracle compare
_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_first_digit(sf_dir: str) -> pd.DataFrame:
    """Benford's-law audit of the event value column — the standard
    anomaly screen for fabricated numeric data (organic amounts follow
    log10(1+1/d); synthetic/rounded data does not, and THIS corpus's
    uniform synth values won't either — the deviation column is the
    signal). One pass of per-batch digit partials (cents-scaled integer
    math, string first digit — no float log), 9-row final rollup with
    observed vs expected ppm and the absolute deviation."""
    events = _read(sf_dir, "events", columns=["value"])

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        cents = cents[cents > 0]
        first = pd.Series(cents.astype(str)).str[0].astype("int64")
        return pd.DataFrame({"digit": first})

    out = grouped_aggregate(
        events, ["digit"], {"n": (None, "count")}, prepare=digits
    ).to_pandas()
    out = out.astype({"digit": "int64", "n": "int64"})
    total = int(out["n"].sum())
    out["observed_ppm"] = (out["n"] * 1_000_000 // total).astype("int64")
    out["benford_ppm"] = out["digit"].map(_BENFORD_PPM).astype("int64")
    out["abs_dev_ppm"] = (out["observed_ppm"] - out["benford_ppm"]).abs()
    return out.sort_values("digit").reset_index(drop=True)


_BENFORD_FIRST_DIGIT_SQL = f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM events
  WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0
), c AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
), t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // t.total AS BIGINT) AS observed_ppm,
       CASE digit {' '.join(f"WHEN {k} THEN {v}" for k, v in _BENFORD_PPM.items())}
       END AS benford_ppm,
       CAST(ABS(n * 1000000 // t.total -
           CASE digit {' '.join(f"WHEN {k} THEN {v}" for k, v in _BENFORD_PPM.items())}
           END) AS BIGINT) AS abs_dev_ppm
FROM c, t
"""


#: Wilson z for a 95% lower confidence bound
_WILSON_Z = 1.96
#: quality pass threshold (chars) for the source-confidence table
_QUALITY_MIN_CHARS = 300


def source_quality_wilson(sf_dir: str) -> pd.DataFrame:
    """Per-source quality pass rate with its Wilson 95% LOWER bound — the
    statistically honest way to rank sources when their document counts
    differ by orders of magnitude (a 3/3 source must NOT outrank a
    4700/5000 one; the raw rate says it does, the Wilson bound says it
    does not). One slim (source → passes, total) aggregate; the bound is
    driver-side float math over the |sources|-bounded table, rounded to
    4 dp on both sides."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"],
                "passed": (
                    df["n_chars"].to_numpy() >= _QUALITY_MIN_CHARS
                ).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        docs, ["source"], {"n_pass": ("passed", "sum"), "n_docs": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    n = agg["n_docs"].to_numpy().astype("float64")
    p = agg["n_pass"].to_numpy().astype("float64") / n
    z2 = _WILSON_Z * _WILSON_Z
    lower = (
        p + z2 / (2 * n)
        - _WILSON_Z * np.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    out = pd.DataFrame(
        {
            "source": agg["source"],
            "n_docs": agg["n_docs"].astype("int64"),
            "n_pass": agg["n_pass"].astype("int64"),
            "pass_rate": np.round(p, 4),
            "wilson_lower": np.round(lower, 4),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


_SOURCE_QUALITY_WILSON_SQL = f"""
WITH s AS (
  SELECT source,
         COUNT(*) AS n_docs,
         COUNT(*) FILTER (WHERE n_chars >= {_QUALITY_MIN_CHARS}) AS n_pass
  FROM documents GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pass AS BIGINT) AS n_pass,
       ROUND(n_pass * 1.0 / n_docs, 4) AS pass_rate,
       ROUND((n_pass * 1.0 / n_docs + {_WILSON_Z}*{_WILSON_Z} / (2 * n_docs)
              - {_WILSON_Z} * sqrt((n_pass * 1.0 / n_docs)
                    * (1 - n_pass * 1.0 / n_docs) / n_docs
                    + {_WILSON_Z}*{_WILSON_Z} / (4 * n_docs * n_docs)))
             / (1 + {_WILSON_Z}*{_WILSON_Z} / n_docs), 4) AS wilson_lower
FROM s
"""


def event_value_histogram(sf_dir: str, bins: int = HIST_BINS) -> pd.DataFrame:
    """Equal-width value histogram per event type — the dashboard
    distribution panel. Two bounded passes: a constant-size min/max
    partial per batch fixes the GLOBAL bin edges (shared across types so
    panels align), then bin assignment is worker-local integer math over
    money-scaled micros — ``(vu - lo) * bins // (hi - lo + 1)`` — so edge
    rows land in the same bin on both sides bit-for-bit, with a
    |types|×bins-bounded rollup."""
    events = _read(sf_dir, "events", columns=["event_type", "value"])

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        vu = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        return pd.DataFrame({"lo": [int(vu.min())], "hi": [int(vu.max())]})

    mm = events.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    span = hi - lo + 1

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        vu = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        b = (vu - lo) * bins // span
        return pd.DataFrame({"event_type": df["event_type"], "bin": b})

    out = grouped_aggregate(
        events, ["event_type", "bin"], {"n": (None, "count")}, prepare=assign
    ).to_pandas()
    out = out.astype({"bin": "int64", "n": "int64"})
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


_EVENT_VALUE_HISTOGRAM_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vu
  FROM events
), mm AS (
  SELECT MIN(vu) AS lo, MAX(vu) AS hi FROM v
)
SELECT event_type,
       CAST((vu - mm.lo) * {HIST_BINS} // (mm.hi - mm.lo + 1) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM v, mm
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Market-basket co-occurrence via native self-join
# --------------------------------------------------------------------------

BASKET_TOPK = 15


def part_pair_counts(sf_dir: str, k: int = BASKET_TOPK) -> pd.DataFrame:
    """Market-basket mining (the Apriori candidate step): the top-k part
    PAIRS most often ordered together. A genuine SELF-JOIN — lineitem
    joined to itself on the order key through Ray's native hash join (both
    sides shuffle once on the same key), then a pair-keyed partial+final
    count and a distributed top-k. Baskets are small (a handful of parts
    per order), so the join fan-out is k²-per-order bounded, not
    quadratic in the table."""
    left = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]).map_batches(
        lambda df: df.rename(columns={"l_partkey": "part_a"}),
        batch_format="pandas",
    )
    right = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]).map_batches(
        lambda df: df.rename(columns={"l_partkey": "part_b"}),
        batch_format="pandas",
    )
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=max(2, min(16, cpus)),
        on=("l_orderkey",),
    ).filter(expr="part_a < part_b")
    counts = grouped_aggregate(
        joined, ["part_a", "part_b"], {"n": (None, "count")}
    )
    out = topk(counts, ["n", "part_a", "part_b"], k, descending=[True, False, False])
    out = out.to_pandas().astype(
        {"part_a": "int64", "part_b": "int64", "n": "int64"}
    )
    return out.reset_index(drop=True)


_PART_PAIR_COUNTS_SQL = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b
LIMIT {BASKET_TOPK}
"""


# --------------------------------------------------------------------------
# Q18-style large-volume orders (HAVING over a join, then top-k)
# --------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 300
Q18_TOPK = 100


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose TOTAL lineitem quantity exceeds a
    threshold (HAVING over the join), enriched with customer keys and
    ranked by price — the "who places the huge orders" report.

    Topology: ONE partial+final aggregate over lineitem produces per-order
    quantity sums (exact cents-free int64: qty scales by 100); the HAVING
    filter runs distributed on that slim table; only the SURVIVING keys —
    a threshold that high is selective by construction — broadcast to
    filter orders at the read; the final enrich + top-k runs on the
    filtered remainder. The fact table is never joined row-to-row and
    never shuffled."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype("int64"),
                "qty_c": np.rint(df["l_quantity"].to_numpy() * 100).astype(
                    "int64"
                ),
            }
        )

    per_order = grouped_aggregate(
        li, ["o_orderkey"], {"sum_qty_c": ("qty_c", "sum")}, prepare=qty_rows
    )
    big = per_order.map_batches(
        lambda df: df[df["sum_qty_c"] > Q18_QTY_THRESHOLD * 100],
        batch_format="pandas",
    ).to_pandas()  # selective by construction — bounded driver table

    orders = broadcast_semi_filter(
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        ),
        big["o_orderkey"].astype("int64"),
        "o_orderkey",
    ).to_pandas()
    out = orders.merge(
        big.astype({"o_orderkey": "int64", "sum_qty_c": "int64"}), on="o_orderkey"
    )
    out["total_qty"] = round_half_away(out["sum_qty_c"].to_numpy() / 100.0, 4)
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(Q18_TOPK)
    out = out[
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty"]
    ].reset_index(drop=True)
    return out.astype({"o_orderkey": "int64", "o_custkey": "int64"})


_Q18_LARGE_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty_c
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT))
         > {Q18_QTY_THRESHOLD * 100}
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       ROUND(b.sum_qty_c / 100.0, 4) AS total_qty
FROM big b JOIN orders o USING (o_orderkey)
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT {Q18_TOPK}
"""


# --------------------------------------------------------------------------
# Weighted sampling over a join (A-ES over aggregated join weights)
# --------------------------------------------------------------------------

WEIGHTED_ORDERS_K = 20


def weighted_sample_orders(sf_dir: str, k: int = WEIGHTED_ORDERS_K) -> pd.DataFrame:
    """Weighted sample without replacement of k ORDERS, probability
    proportional to order revenue — sampling over a join: the weight is an
    aggregate of the joined fact table (Σ extendedprice·(1−discount) per
    order), not a stored column. The A-ES key (ln(u)/w, u from
    md5(orderkey)) is deterministic and SQL-expressible, so the oracle
    reproduces the exact winner set.

    Topology: the weight table comes from ONE partial+final aggregate over
    lineitem (revenue in exact micros — no join materializes); key
    assignment is per-batch; selection is local-top-k-then-final; only the
    k winners join back to orders through a broadcast key set. The fact
    table is never shuffled and never joined row-to-row."""
    line = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype("int64"),
                "rev_u": np.rint(
                    df["l_extendedprice"].to_numpy()
                    * (1 - df["l_discount"].to_numpy())
                    * 1_000_000
                ).astype("int64"),
            }
        )

    rev = grouped_aggregate(
        line, ["o_orderkey"], {"revenue_u": ("rev_u", "sum")}, prepare=rev_rows
    )

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        h = [
            hashlib.md5(str(int(d)).encode()).hexdigest()[:8]
            for d in df["o_orderkey"]
        ]
        u = (np.array([int(x, 16) for x in h], dtype="float64") + 1.0) / (
            2.0**32 + 2.0
        )
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "revenue_u": df["revenue_u"].astype("int64"),
                "skey": np.log(u) / df["revenue_u"].to_numpy(dtype="float64"),
            }
        )

    winners = topk(
        rev.map_batches(keyed, batch_format="pandas"),
        ["skey", "o_orderkey"],
        k,
        descending=[True, False],
    ).to_pandas()[["o_orderkey", "revenue_u"]]

    keys = set(int(x) for x in winners["o_orderkey"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda df: df[df["o_orderkey"].isin(keys)], batch_format="pandas"
    ).to_pandas()
    out = winners.merge(orders, on="o_orderkey")
    out = out.astype(
        {"o_orderkey": "int64", "revenue_u": "int64", "o_custkey": "int64"}
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


_WEIGHTED_SAMPLE_ORDERS_SQL = f"""
WITH rev AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                       AS BIGINT)) AS BIGINT) AS revenue_u
  FROM lineitem GROUP BY l_orderkey
), keyed AS (
  SELECT o_orderkey, revenue_u,
         ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
             AS UBIGINT) + 1.0) / (4294967296.0 + 2.0)) / revenue_u AS skey
  FROM rev
), win AS (
  SELECT o_orderkey, revenue_u FROM keyed
  ORDER BY skey DESC, o_orderkey LIMIT {WEIGHTED_ORDERS_K}
)
SELECT w.o_orderkey, w.revenue_u, o.o_custkey, o.o_orderdate
FROM win w JOIN orders o USING (o_orderkey)
"""


# --------------------------------------------------------------------------
# Distributed linear regression (trend) from exact integer moments
# --------------------------------------------------------------------------

TREND_ANCHOR = "2024-01-01"  # fixed day-index origin, mirrored in the SQL


def event_value_trend(sf_dir: str) -> pd.DataFrame:
    """Per-event-type least-squares trend of ``value`` over time (the
    daily-drift monitor: is purchase value rising?). x = days since a fixed
    anchor, y = value in micros; slope and intercept come from the five
    classical moments (n, Σx, Σy, Σxy, Σx²), each an EXACT int64 partial
    sum per batch — constant-size state per (type, batch), one bounded
    shuffle, no sort, no driver row ever holds an event. The driver does
    the closed-form algebra on |types| rows in arbitrary-precision python
    ints, so the doubles are bit-identical to the oracle's HUGEINT-exact
    arithmetic. Headroom: Σxy stays exact while corpus_rows × x × y_micros
    < 2^63 (≈10^18 here); past that the partials widen to two-level int64
    or float128 — same merge shape."""
    events = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    anchor = pd.Timestamp(TREND_ANCHOR)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["ts"].dt.normalize() - anchor).dt.days.astype("int64")
        y = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )

    agg = grouped_aggregate(
        events,
        ["event_type"],
        {
            "n": (None, "count"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxy": ("sxy", "sum"),
            "sxx": ("sxx", "sum"),
        },
        prepare=moments,
    ).to_pandas()

    rows = []
    for r in agg.itertuples():
        n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy), int(r.sxy), int(r.sxx))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        rows.append(
            {
                "event_type": r.event_type,
                "n_events": n,
                "slope_per_day": float(
                    round_half_away(slope / 1_000_000.0, 6)
                ),
                "intercept": float(
                    round_half_away(intercept / 1_000_000.0, 6)
                ),
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"n_events": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


_EVENT_VALUE_TREND_SQL = f"""
WITH m AS (
  SELECT event_type,
         CAST(datediff('day', DATE '{TREND_ANCHOR}', CAST(ts AS DATE)) AS BIGINT) AS x,
         CAST(ROUND(value * 1000000, 0) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM m GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0, 6) AS slope_per_day,
       ROUND((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 1000000.0, 6) AS intercept
FROM s
"""


# --------------------------------------------------------------------------
# Q6-style forecast revenue (pure filter → scalar sum; the simplest TPC-H)
# --------------------------------------------------------------------------

Q6_LO = pd.Timestamp("1996-01-01")
Q6_HI = pd.Timestamp("1997-01-01")
Q6_DISC_LO_C = 5  # discount cents, inclusive
Q6_DISC_HI_C = 7
Q6_QTY_MAX = 24


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue delta from dropping small discounts — a pure
    filter → scalar sum with no join and no shuffle at all. The discount
    band compares exactly-scaled int64 cents in BOTH engines, so the float
    boundary (0.05 is not representable) can never disagree with the SQL
    oracle. Scale shape: per-batch int64 partials, one tiny final reduce —
    the canonical "full scan, constant output" pattern."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        disc_c = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        keep = (
            (df["l_shipdate"] >= Q6_LO).to_numpy()
            & (df["l_shipdate"] < Q6_HI).to_numpy()
            & (disc_c >= Q6_DISC_LO_C)
            & (disc_c <= Q6_DISC_HI_C)
            & (df["l_quantity"].to_numpy() < Q6_QTY_MAX)
        )
        sub = df[keep]
        return pd.DataFrame(
            {
                "g": np.zeros(len(sub), dtype="int64"),
                "rev_u": np.rint(
                    sub["l_extendedprice"] * sub["l_discount"] * 1_000_000
                ).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li, ["g"], {"rev_u": ("rev_u", "sum")}, prepare=prepare
    ).to_pandas()
    total = int(agg["rev_u"].sum())  # 0 rows if nothing matched
    return pd.DataFrame({"revenue": [round_half_away(total / 1_000_000.0)]})


_Q6_FORECAST_REVENUE_SQL = f"""
SELECT ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 1000000, 0)
                               AS BIGINT)), 0) / 1000000.0, 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN {Q6_DISC_LO_C} AND {Q6_DISC_HI_C}
  AND l_quantity < {Q6_QTY_MAX}
"""


# --------------------------------------------------------------------------
# Q7-style volume shipping (two-nation trade flows by year)
# --------------------------------------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_YEAR_LO = pd.Timestamp("1996-01-01")
Q7_YEAR_HI = pd.Timestamp("1998-01-01")


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: lineitem revenue shipped between two specific nations
    (supplier nation ≠ customer nation, both directions), grouped by ship
    year. Topology mirrors Q5: the nation pair prunes customers and
    suppliers to tiny driver-side key→nation maps; one orders pass keeps
    only orders from pruned customers (a few % of orders) and broadcasts
    orderkey→cust_nation; the single lineitem scan then does BOTH map-side
    joins, the cross-nation pair filter, and the revenue partials in one
    ``prepare``. Zero fact-side shuffles; at 100 TB the orderkey map
    graduates to a hash-partitioned join on the one canonical key
    (``supplier_nation_hash_join``'s path)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    key_by_name = dict(zip(nation["n_name"], nation["n_nationkey"]))
    ka, kb = int(key_by_name[Q7_NATION_A]), int(key_by_name[Q7_NATION_B])
    name_by_key = {ka: Q7_NATION_A, kb: Q7_NATION_B}

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin((ka, kb))]
    cust_nat_by_key = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin((ka, kb))]
    supp_nat_by_key = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_nat(df: pd.DataFrame) -> pd.DataFrame:
        cn = df["o_custkey"].map(cust_nat_by_key)
        keep = cn.notna()
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"][keep],
                "cust_nat": cn[keep].astype("int64"),
            }
        )

    orders_small = orders.map_batches(order_nat, batch_format="pandas").to_pandas()
    order_nat_by_key = dict(zip(orders_small["o_orderkey"], orders_small["cust_nat"]))

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= Q7_YEAR_LO) & (df["l_shipdate"] < Q7_YEAR_HI)
        df = df[m]
        supp_nat = df["l_suppkey"].map(supp_nat_by_key)
        cust_nat = df["l_orderkey"].map(order_nat_by_key)
        keep = supp_nat.notna() & cust_nat.notna() & (supp_nat != cust_nat)
        df = df[keep]
        sn = supp_nat[keep].astype("int64")
        cn = cust_nat[keep].astype("int64")
        return pd.DataFrame(
            {
                "supp_nation": sn.map(name_by_key),
                "cust_nation": cn.map(name_by_key),
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li,
        ["supp_nation", "cust_nation", "l_year"],
        {"rev_u": ("rev_u", "sum")},
        prepare=prepare,
    ).to_pandas()
    agg["revenue"] = round_half_away(agg["rev_u"] / 1_000_000.0)
    return (
        agg.sort_values(["supp_nation", "cust_nation", "l_year"])[
            ["supp_nation", "cust_nation", "l_year", "revenue"]
        ].reset_index(drop=True)
    )


_Q7_VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                      AS BIGINT)) / 1000000.0, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND cn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q10-style returned-item reporting (quarter join → per-customer top-k)
# --------------------------------------------------------------------------

Q10_QUARTER_LO = pd.Timestamp("1996-07-01")
Q10_QUARTER_HI = pd.Timestamp("1996-10-01")
Q10_TOPK = 20


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in one
    quarter — lineitem(returnflag='R') ⋈ orders(quarter) ⋈ customer ⋈
    nation, top 20 by lost revenue. Topology: the quarter prunes orders to
    a small broadcast orderkey→custkey map; one lineitem pass filters 'R',
    maps custkey map-side, and pre-aggregates revenue per customer (the
    partial+final aggregate is bounded by |customers|, not |lineitem|);
    the tiny result enriches from the driver-side customer/nation tables
    and takes the top 20 with an explicit custkey tiebreak so ranking is
    deterministic in both engines."""
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def quarter_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= Q10_QUARTER_LO) & (
            df["o_orderdate"] < Q10_QUARTER_HI
        )
        return df.loc[m, ["o_orderkey", "o_custkey"]]

    orders_small = orders.map_batches(
        quarter_orders, batch_format="pandas"
    ).to_pandas()
    cust_by_order = dict(zip(orders_small["o_orderkey"], orders_small["o_custkey"]))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        ck = df["l_orderkey"].map(cust_by_order)
        keep = ck.notna()
        df = df[keep]
        return pd.DataFrame(
            {
                "c_custkey": ck[keep].astype("int64"),
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    per_cust = grouped_aggregate(
        li, ["c_custkey"], {"rev_u": ("rev_u", "sum")}, prepare=prepare
    ).to_pandas()

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    ).to_pandas()
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    out = per_cust.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.sort_values(
        ["rev_u", "c_custkey"], ascending=[False, True]
    ).head(Q10_TOPK)
    return pd.DataFrame(
        {
            "c_custkey": out["c_custkey"].astype("int64").to_numpy(),
            "c_name": out["c_name"].to_numpy(),
            "revenue": round_half_away(out["rev_u"].to_numpy() / 1_000_000.0),
            "c_acctbal": out["c_acctbal"].to_numpy(),
            "n_name": out["n_name"].to_numpy(),
        }
    )


_Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey,
       c_name,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                      AS BIGINT)) / 1000000.0, 4) AS revenue,
       c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                  AS BIGINT)) DESC, c_custkey
LIMIT {Q10_TOPK}
"""


# --------------------------------------------------------------------------
# Q13-style customer order-count distribution (left join incl. zeros)
# --------------------------------------------------------------------------

def q13_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: the histogram of orders-per-customer INCLUDING
    customers with zero orders (the left-join subtlety Q13 exists to test).
    Topology: one partial+final count over orders keyed by customer (slim —
    two int64 columns), then the zero bucket is computed from the customer
    key table rather than materializing a joined fact table: customers with
    no orders = |customer| − |distinct custkeys in orders|. The histogram
    itself is a ≤ max-orders-per-customer-row groupby."""
    import pyarrow.parquet as pq

    per_cust = grouped_aggregate(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"],
        {"c_count": (None, "count")},
    ).to_pandas()
    n_customers = pq.read_metadata(
        os.path.join(sf_dir, "customer.parquet")
    ).num_rows
    hist = (
        per_cust.groupby("c_count").size().reset_index(name="custdist")
    )
    zeros = int(n_customers - len(per_cust))
    if zeros:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zeros]})],
            ignore_index=True,
        )
    hist = hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)
    return pd.DataFrame(
        {
            "c_count": hist["c_count"].astype("int64"),
            "custdist": hist["custdist"].astype("int64"),
        }
    )


_Q13_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q14-style promo revenue share (broadcast dimension → two scalar sums)
# --------------------------------------------------------------------------

Q14_MONTH_LO = pd.Timestamp("1996-09-01")
Q14_MONTH_HI = pd.Timestamp("1996-10-01")
Q14_PROMO_TYPE = "PROMO"


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: what fraction of one month's revenue came from
    promo-type parts. Topology: the part table collapses to a broadcast
    partkey→is_promo map (dimension, tiny next to lineitem); ONE lineitem
    pass computes both the promo and total int64 revenue partials; the
    percentage divides two identical int64 sums in both engines, so the
    float result is bit-identical."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    ).to_pandas()
    promo_keys = frozenset(
        part.loc[part["p_type"] == Q14_PROMO_TYPE, "p_partkey"].astype("int64")
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= Q14_MONTH_LO) & (df["l_shipdate"] < Q14_MONTH_HI)
        df = df[m]
        rev_u = np.rint(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
        ).astype("int64")
        is_promo = df["l_partkey"].isin(promo_keys).to_numpy()
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype="int64"),
                "promo_u": np.where(is_promo, rev_u, 0),
                "total_u": rev_u,
            }
        )

    agg = grouped_aggregate(
        li,
        ["g"],
        {"promo_u": ("promo_u", "sum"), "total_u": ("total_u", "sum")},
        prepare=prepare,
    ).to_pandas()
    promo = int(agg["promo_u"].sum())
    total = int(agg["total_u"].sum())
    pct = 100.0 * promo / total if total else 0.0
    return pd.DataFrame({"promo_revenue": [float(round_half_away(pct))]})


_Q14_PROMO_REVENUE_SQL = f"""
SELECT ROUND(
         100.0 * SUM(CASE WHEN p_type = '{Q14_PROMO_TYPE}'
                          THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)
                          ELSE 0 END)
         / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)),
         4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


# --------------------------------------------------------------------------
# Q16-style supplier counts per part group (distinct-pair dedup + NOT IN)
# --------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


def q16_parts_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers can deliver each
    (brand, type, size) part group, excluding one brand, one type family,
    off-list sizes, and a supplier blacklist (restated: suppliers with a
    negative account balance stand in for Q16's complaint filter; this
    corpus has no partsupp table, so distinct (l_partkey, l_suppkey) pairs
    observed in lineitem play that role — documented divergences, mirrored
    exactly in the SQL oracle).

    Topology: part prunes to the qualifying keys driver-side (dimension);
    a broadcast semi-filter keeps only qualifying parts' lineitems at the
    read; per-batch pair dedup pre-shrinks, then ONE partial+final
    aggregate keyed (partkey, suppkey) makes the pairs globally distinct
    without shuffling the fact table twice; the distinct-supplier count per
    (brand, type, size) then runs over a table bounded by |qualifying
    pairs|, never |lineitem|."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).to_pandas()
    part = part[
        (part["p_brand"] != Q16_EXCL_BRAND)
        & (part["p_type"] != Q16_EXCL_TYPE)
        & (part["p_size"].isin(Q16_SIZES))
    ]
    attrs_by_key = {
        int(k): (b, t, int(s))
        for k, b, t, s in zip(
            part["p_partkey"], part["p_brand"], part["p_type"], part["p_size"]
        )
    }
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    ).to_pandas()
    bad_supp = frozenset(
        supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].astype("int64")
    )

    li = broadcast_semi_filter(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]),
        attrs_by_key.keys(),
        "l_partkey",
    )

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["l_suppkey"].isin(bad_supp)]
        return df.drop_duplicates()  # pre-shrink before the keyed shuffle

    pairs = grouped_aggregate(
        li,
        ["l_partkey", "l_suppkey"],
        {"n": (None, "count")},
        prepare=pair_rows,
    ).to_pandas()  # bounded by |qualifying (part, supplier) pairs|

    attrs = pairs["l_partkey"].map(attrs_by_key)
    out = pd.DataFrame(
        {
            "p_brand": [a[0] for a in attrs],
            "p_type": [a[1] for a in attrs],
            "p_size": [a[2] for a in attrs],
            "s_suppkey": pairs["l_suppkey"].astype("int64"),
        }
    ).drop_duplicates()
    hist = (
        out.groupby(["p_brand", "p_type", "p_size"])
        .size()
        .reset_index(name="supplier_cnt")
    )
    hist = hist.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)
    hist["p_size"] = hist["p_size"].astype("int64")
    hist["supplier_cnt"] = hist["supplier_cnt"].astype("int64")
    return hist


_Q16_PARTS_SUPPLIER_COUNTS_SQL = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


QUERIES: dict[str, Callable[[str], pd.DataFrame]] = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "event_value_trend": event_value_trend,
    "weighted_sample_orders": weighted_sample_orders,
    "q18_large_orders": q18_large_orders,
    "part_pair_counts": part_pair_counts,
    "event_value_histogram": event_value_histogram,
    "benford_first_digit": benford_first_digit,
    "source_quality_wilson": source_quality_wilson,
    "dom_activity_full_outer": dom_activity_full_outer,
    "view_purchase_users": view_purchase_users,
    "orders_above_cust_avg": orders_above_cust_avg,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "orders_priority_ntile": orders_priority_ntile,
    "orders_percent_rank": orders_percent_rank,
    "orders_profile": orders_profile,
    "view_only_user_days": view_only_user_days,
    "orders_fulfillment": orders_fulfillment,
    "orders_rollup": orders_rollup,
    "orders_cube": orders_cube,
    "event_value_winsorized": event_value_winsorized,
    "event_value_percentiles": event_value_percentiles,
    "props_value_stats": props_value_stats,
    "daily_revenue_ma7": daily_revenue_ma7,
    "q3_shipping_priority": q3_shipping_priority,
    "lineitem_correlations": lineitem_correlations,
    "events_hourly_gapfill": events_hourly_gapfill,
    "distinct_user_count": distinct_user_count,
    "largest_docs": largest_docs,
    "supplier_nation_hash_join": supplier_nation_hash_join,
    "priority_sorted_orders": priority_sorted_orders,
    "q1_pricing": q1_pricing,
    "top_orders": top_orders,
    "customer_order_totals": customer_order_totals,
    "customers_no_big_orders": customers_no_big_orders,
    "events_hourly": events_hourly,
    "priority_backlog": priority_backlog,
}

ORACLES: dict[str, str] = {
    "q6_forecast_revenue": _Q6_FORECAST_REVENUE_SQL,
    "q7_volume_shipping": _Q7_VOLUME_SHIPPING_SQL,
    "q10_returned_items": _Q10_RETURNED_ITEMS_SQL,
    "q13_order_distribution": _Q13_ORDER_DISTRIBUTION_SQL,
    "q14_promo_revenue": _Q14_PROMO_REVENUE_SQL,
    "q16_parts_supplier_counts": _Q16_PARTS_SUPPLIER_COUNTS_SQL,
    "event_value_trend": _EVENT_VALUE_TREND_SQL,
    "weighted_sample_orders": _WEIGHTED_SAMPLE_ORDERS_SQL,
    "q18_large_orders": _Q18_LARGE_ORDERS_SQL,
    "part_pair_counts": _PART_PAIR_COUNTS_SQL,
    "event_value_histogram": _EVENT_VALUE_HISTOGRAM_SQL,
    "benford_first_digit": _BENFORD_FIRST_DIGIT_SQL,
    "source_quality_wilson": _SOURCE_QUALITY_WILSON_SQL,
    "dom_activity_full_outer": _DOM_ACTIVITY_FULL_OUTER_SQL,
    "view_purchase_users": _VIEW_PURCHASE_USERS_SQL,
    "orders_above_cust_avg": _ORDERS_ABOVE_CUST_AVG_SQL,
    "q5_local_supplier_volume": _Q5_LOCAL_SUPPLIER_VOLUME_SQL,
    "orders_priority_ntile": _ORDERS_PRIORITY_NTILE_SQL,
    "orders_percent_rank": _ORDERS_PERCENT_RANK_SQL,
    "orders_profile": _profile_sql(),
    "view_only_user_days": _VIEW_ONLY_USER_DAYS_SQL,
    "orders_fulfillment": _ORDERS_FULFILLMENT_SQL,
    "orders_rollup": _ORDERS_ROLLUP_SQL,
    "orders_cube": _ORDERS_CUBE_SQL,
    "event_value_winsorized": _EVENT_VALUE_WINSORIZED_SQL,
    "event_value_percentiles": _EVENT_VALUE_PERCENTILES_SQL,
    "props_value_stats": _PROPS_VALUE_STATS_SQL,
    "daily_revenue_ma7": _DAILY_REVENUE_MA7_SQL,
    "q3_shipping_priority": _Q3_SHIPPING_PRIORITY_SQL,
    "lineitem_correlations": _LINEITEM_CORRELATIONS_SQL,
    "events_hourly_gapfill": _EVENTS_HOURLY_GAPFILL_SQL,
    "distinct_user_count": _DISTINCT_USER_COUNT_SQL,
    "largest_docs": _LARGEST_DOCS_SQL,
    "supplier_nation_hash_join": _SUPPLIER_NATION_HASH_JOIN_SQL,
    "priority_sorted_orders": _PRIORITY_SORTED_ORDERS_SQL,
    "q1_pricing": _Q1_SQL,
    "top_orders": _TOP_ORDERS_SQL,
    "customer_order_totals": _CUSTOMER_ORDER_TOTALS_SQL,
    "customers_no_big_orders": _CUSTOMERS_NO_BIG_ORDERS_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "priority_backlog": _PRIORITY_BACKLOG_SQL,
}

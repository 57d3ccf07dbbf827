"""The remaining TPC-H-style query shapes (q2, q4, q8, q9, q11, q12, q15,
q17, q19, q20, q21, q22), completing the 22-query relational surface that
``pipelines/relational.py`` started.

The driver corpus has no ``partsupp`` table and its ``lineitem``/``orders``
lack TPC-H's commit/receipt dates, ship modes, containers, comments and
phones, so several queries are RESTATED (documented per query, mirrored
exactly in the SQL oracle — the same convention q16 established):

- ``partsupp`` ≡ the distinct ``(l_partkey, l_suppkey)`` pairs observed in
  lineitem; "supply cost" ≡ the minimum observed unit price
  ``ROUND(l_extendedprice / l_quantity * 100, 0)`` (exact int64 cents);
- "late" ≡ ``l_shipdate > o_orderdate + N days`` (timestamps compare as
  int64 microseconds — bit-exact in both engines);
- Q9's "profit" charges half the part's retail price per unit as cost;
- Q22's country code ≡ ``c_nationkey``.

Cross-engine float determinism follows the module convention in
``relational.py``: money flows as exactly-scaled int64
(``round_half_away(expr * 10^k)`` == DuckDB ``CAST(ROUND(expr * 10^k, 0) AS
BIGINT)`` — identical IEEE doubles in, half-away rounding on both sides),
so sums are order-independent and quotients derive from identical integers.

Join topology for 100 TB (shared across the module): region/nation/part/
supplier are dimensions and collapse to broadcast key→attr maps (one
``ray.put`` via closure capture, read per task from the object store);
orders windows shrink to broadcast orderkey maps; every fact-table pass is
ONE ``grouped_aggregate`` whose ``prepare`` applies the map-side joins,
filters, and int64 partials in the same stage — zero fact-side shuffles.
Where a broadcast side would outgrow one object at 10^12 rows, the
docstring names the hash-partition fallback (``supplier_nation_hash_join``'s
path in ``relational.py``) — the downstream shape is unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from ..functions.agg import (
    broadcast_semi_filter,
    grouped_aggregate,
    round_half_away,
)
from .relational import _read


def _dim(sf_dir: str, table: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side read of a dimension table (tiny next to the facts)."""
    import pyarrow.parquet as pq

    return pq.read_table(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    ).to_pandas()


def _nation_keys_in_region(sf_dir: str, region: str) -> tuple[set, dict]:
    """(nationkeys in region, nationkey→name over ALL nations)."""
    reg = _dim(sf_dir, "region")
    nat = _dim(sf_dir, "nation")
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    name_by_nat = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    in_region = set(nat.loc[nat["n_regionkey"].isin(rkeys), "n_nationkey"].astype(int))
    return in_region, name_by_nat


# --------------------------------------------------------------------------
# Q2-style minimum-cost supplier (correlated MIN subquery over "partsupp")
# --------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "ECONOMY"
Q2_TOPK = 100


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region offering the minimum supply cost, with the classic correlated
    ``MIN`` subquery decorrelated into a per-part aggregate. Restated per
    the module header: partsupp ≡ distinct lineitem (part, supplier) pairs,
    supply cost ≡ min observed unit price in exact cents.

    Topology: part (type filter) and in-region suppliers collapse to
    broadcast maps; ONE lineitem pass semi-filters on both keys and takes
    the per-(part, supplier) MIN unit-price partial; the pair table —
    bounded by |qualifying pairs|, not |lineitem| — resolves the per-part
    min and the winners driver-side. At 10^12 rows the pair table
    hash-partitions by partkey for the argmin instead (same shape)."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_name", "p_type"])
    part = part[part["p_type"] == Q2_TYPE]
    name_by_part = dict(zip(part["p_partkey"].astype(int), part["p_name"]))

    in_region, name_by_nat = _nation_keys_in_region(sf_dir, Q2_REGION)
    supp = _dim(sf_dir, "supplier")
    supp = supp[supp["s_nationkey"].isin(in_region)]
    attrs_by_supp = {
        int(k): (nm, float(ab), name_by_nat[int(nk)])
        for k, nm, ab, nk in zip(
            supp["s_suppkey"], supp["s_name"], supp["s_acctbal"], supp["s_nationkey"]
        )
    }

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_partkey"].isin(name_by_part) & df["l_suppkey"].isin(attrs_by_supp)
        df = df[m]
        cost_c = round_half_away(
            df["l_extendedprice"] / df["l_quantity"] * 100, 0
        ).astype("int64")
        return pd.DataFrame(
            {"l_partkey": df["l_partkey"], "l_suppkey": df["l_suppkey"], "cost_c": cost_c}
        )

    pairs = grouped_aggregate(
        li,
        ["l_partkey", "l_suppkey"],
        {"cost_c": ("cost_c", "min")},
        prepare=prepare,
    ).to_pandas()

    min_by_part = pairs.groupby("l_partkey")["cost_c"].transform("min")
    win = pairs[pairs["cost_c"] == min_by_part]
    attrs = win["l_suppkey"].map(attrs_by_supp)
    out = pd.DataFrame(
        {
            "s_acctbal": [a[1] for a in attrs],
            "s_name": [a[0] for a in attrs],
            "n_name": [a[2] for a in attrs],
            "p_partkey": win["l_partkey"].astype("int64"),
            "p_name": win["l_partkey"].map(name_by_part),
            "supply_cost": round_half_away(win["cost_c"] / 100.0),
        }
    )
    out = out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    ).head(Q2_TOPK)
    return out.reset_index(drop=True)


_Q2_MIN_COST_SUPPLIER_SQL = f"""
WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT)) AS cost_c
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND r_name = '{Q2_REGION}'
  GROUP BY l_partkey, l_suppkey
),
best AS (SELECT l_partkey AS bk, MIN(cost_c) AS min_c FROM pairs GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(cost_c / 100.0, 4) AS supply_cost
FROM pairs
JOIN best     ON l_partkey = bk AND cost_c = min_c
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT {Q2_TOPK}
"""


# --------------------------------------------------------------------------
# Q4-style order-priority checking (EXISTS semi-join)
# --------------------------------------------------------------------------

Q4_LO = pd.Timestamp("1997-07-01")
Q4_HI = pd.Timestamp("1997-10-01")
Q4_LATE_DAYS = 30


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: per-priority counts of one quarter's orders that had
    at least one late line item — the classic EXISTS semi-join. Restated
    per the module header: "late" ≡ ``l_shipdate > o_orderdate + 30 days``
    (the corpus has no commit/receipt dates).

    Topology: the quarter's orders shrink to a broadcast
    orderkey → (deadline_us, priority) map; ONE lineitem pass keeps rows
    past their order's deadline and dedups orderkeys per batch, so the
    aggregate sees at most |window orders| rows; the priority histogram is
    a 5-row driver-side fold over the qualifying-order set. At 10^12 rows
    the window-order map hash-partitions both scans by orderkey."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def window(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"] >= Q4_LO) & (df["o_orderdate"] < Q4_HI)
        df = df[m]
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                # stay in int64 microseconds: adding a Timedelta would
                # silently upcast datetime64[us] to [ns] and break the
                # comparison against shipdate's us-int64 view
                "deadline": df["o_orderdate"].astype("int64")
                + Q4_LATE_DAYS * 86_400_000_000,
                "o_orderpriority": df["o_orderpriority"],
            }
        )

    ow = orders.map_batches(window, batch_format="pandas").to_pandas()
    deadline_by_key = dict(zip(ow["o_orderkey"], ow["deadline"]))
    prio_by_key = dict(zip(ow["o_orderkey"], ow["o_orderpriority"]))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def late_keys(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["l_orderkey"].map(deadline_by_key)
        m = dl.notna() & (df["l_shipdate"].astype("int64") > dl)
        return df.loc[m, ["l_orderkey"]].drop_duplicates()

    qual = grouped_aggregate(
        li, ["l_orderkey"], {"n": (None, "count")}, prepare=late_keys
    ).to_pandas()

    prio = qual["l_orderkey"].map(prio_by_key)
    hist = (
        prio.value_counts().rename_axis("o_orderpriority").reset_index(name="order_count")
    )
    hist = hist.sort_values("o_orderpriority").reset_index(drop=True)
    hist["order_count"] = hist["order_count"].astype("int64")
    return hist


_Q4_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_LO:%Y-%m-%d}'
  AND o_orderdate <  TIMESTAMP '{Q4_HI:%Y-%m-%d}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q8-style national market share
# --------------------------------------------------------------------------

Q8_REGION = "AMERICA"
Q8_NATION = "NATION_6"
Q8_TYPE = "STANDARD"
Q8_LO = pd.Timestamp("1995-01-01")
Q8_HI = pd.Timestamp("1997-01-01")


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for one
    part type, by order year — the 8-table join. All joins are map-side:
    part keys, in-region customers, the two-year orders (→ year), and the
    supplier→is-target-nation map broadcast into ONE lineitem pass that
    emits per-year (target, total) int64 revenue partials; the share
    divides two identical integers. At 10^12 rows orders co-partition with
    lineitem on orderkey instead of broadcasting."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    part_keys = frozenset(part.loc[part["p_type"] == Q8_TYPE, "p_partkey"].astype(int))

    in_region, name_by_nat = _nation_keys_in_region(sf_dir, Q8_REGION)
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_keys = frozenset(cust.loc[cust["c_nationkey"].isin(in_region), "c_custkey"].astype(int))
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    target_nk = {k for k, v in name_by_nat.items() if v == Q8_NATION}
    target_supp = frozenset(supp.loc[supp["s_nationkey"].isin(target_nk), "s_suppkey"].astype(int))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def window(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["o_orderdate"] >= Q8_LO)
            & (df["o_orderdate"] < Q8_HI)
            & df["o_custkey"].isin(cust_keys)
        )
        df = df[m]
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
            }
        )

    ow = orders.map_batches(window, batch_format="pandas").to_pandas()
    year_by_key = dict(zip(ow["o_orderkey"], ow["o_year"]))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        year = df["l_orderkey"].map(year_by_key)
        m = year.notna() & df["l_partkey"].isin(part_keys)
        df = df[m]
        rev_u = np.rint(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
        ).astype("int64")
        is_target = df["l_suppkey"].isin(target_supp).to_numpy()
        return pd.DataFrame(
            {
                "o_year": year[m].astype("int64"),
                "nat_u": np.where(is_target, rev_u, 0),
                "tot_u": rev_u,
            }
        )

    agg = grouped_aggregate(
        li,
        ["o_year"],
        {"nat_u": ("nat_u", "sum"), "tot_u": ("tot_u", "sum")},
        prepare=prepare,
    ).to_pandas()
    agg = agg.sort_values("o_year").reset_index(drop=True)
    return pd.DataFrame(
        {
            "o_year": agg["o_year"].astype("int64"),
            "mkt_share": round_half_away(agg["nat_u"] / agg["tot_u"]),
        }
    )


_Q8_MARKET_SHARE_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN s_nationkey IN
                        (SELECT n_nationkey FROM nation WHERE n_name = '{Q8_NATION}')
                      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)
                      ELSE 0 END)
             * 1.0 /
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)),
             4) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q8_LO:%Y-%m-%d}'
  AND o_orderdate <  TIMESTAMP '{Q8_HI:%Y-%m-%d}'
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q9-style product-type profit
# --------------------------------------------------------------------------

Q9_NAME_WORD = "widget"


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over parts
    whose name contains one word. Restated per the module header: "profit"
    charges half the part's retail price per unit in place of the missing
    ``ps_supplycost`` — the arithmetic is mirrored term-for-term in the
    oracle, so the doubles agree bitwise before the half-away rounding.

    Topology: part (name filter → retail-price map), supplier → nation
    name, and orders → year collapse to broadcast maps feeding ONE
    lineitem pass of int64 profit partials keyed (nation, year)."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    part = part[part["p_name"].str.contains(Q9_NAME_WORD, regex=False)]
    retail_by_part = dict(zip(part["p_partkey"].astype(int), part["p_retailprice"]))

    _, name_by_nat = _nation_keys_in_region(sf_dir, "")  # name map only
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation_by_supp = {
        int(k): name_by_nat[int(nk)]
        for k, nk in zip(supp["s_suppkey"], supp["s_nationkey"])
    }

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    ow = orders.map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    year_by_key = dict(zip(ow["o_orderkey"], ow["o_year"]))

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        retail = df["l_partkey"].map(retail_by_part)
        m = retail.notna()
        df = df[m]
        amount = df["l_extendedprice"] * (1 - df["l_discount"]) - (
            0.5 * retail[m] * df["l_quantity"]
        )
        return pd.DataFrame(
            {
                "nation": df["l_suppkey"].map(nation_by_supp),
                "o_year": df["l_orderkey"].map(year_by_key).astype("int64"),
                "amount_u": round_half_away(amount * 1_000_000, 0).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li,
        ["nation", "o_year"],
        {"amount_u": ("amount_u", "sum")},
        prepare=prepare,
    ).to_pandas()
    agg = agg.sort_values(["nation", "o_year"], ascending=[True, False]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "nation": agg["nation"],
            "o_year": agg["o_year"].astype("int64"),
            "sum_profit": round_half_away(agg["amount_u"] / 1_000_000.0),
        }
    )


_Q9_PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                             - 0.5 * p_retailprice * l_quantity) * 1000000, 0)
                      AS BIGINT)) / 1000000.0, 4) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_WORD}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q11-style important parts (group HAVING vs a global-scalar subquery)
# --------------------------------------------------------------------------

Q11_REGION = "ASIA"
Q11_FRACTION = 0.001


def q11_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: parts whose traded value through one region's
    suppliers exceeds a fraction of the region's total — the GROUP BY
    HAVING (SELECT SUM(...) * f) global-scalar pattern. Restated per the
    module header (no partsupp): value ≡ discounted lineitem revenue,
    region stands in for Q11's single nation so the filter stays populated
    at every sf.

    Topology: in-region supplier keys broadcast into ONE lineitem pass of
    per-part int64 partials; the HAVING threshold is a driver-side fold
    over the per-part table (bounded by |parts|, the natural scale for a
    scalar both engines cast to double identically)."""
    in_region, _ = _nation_keys_in_region(sf_dir, Q11_REGION)
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_keys = frozenset(supp.loc[supp["s_nationkey"].isin(in_region), "s_suppkey"].astype(int))

    li = broadcast_semi_filter(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        supp_keys,
        "l_suppkey",
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_partkey": df["l_partkey"],
                "value_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    pv = grouped_aggregate(
        li, ["l_partkey"], {"value_u": ("value_u", "sum")}, prepare=prepare
    ).to_pandas()
    threshold = float(pv["value_u"].sum()) * Q11_FRACTION
    keep = pv[pv["value_u"] > threshold]
    keep = keep.sort_values(["value_u", "l_partkey"], ascending=[False, True]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "l_partkey": keep["l_partkey"].astype("int64"),
            "value": round_half_away(keep["value_u"] / 1_000_000.0),
        }
    )


_Q11_IMPORTANT_PARTS_SQL = f"""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) AS value_u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
  GROUP BY 1
)
SELECT l_partkey, ROUND(value_u / 1000000.0, 4) AS value
FROM pv
WHERE value_u > (SELECT CAST(SUM(value_u) AS DOUBLE) * {Q11_FRACTION} FROM pv)
ORDER BY value_u DESC, l_partkey
"""


# --------------------------------------------------------------------------
# Q12-style shipping-speed priority counts (CASE-sum pivot)
# --------------------------------------------------------------------------

Q12_LO = pd.Timestamp("1997-01-01")
Q12_HI = pd.Timestamp("1998-01-01")
Q12_FAST_DAYS = 30
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_ship_speed(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape: per ship-class counts of high- vs low-priority
    orders — the two-CASE-sum pivot. Restated per the module header (no
    ship modes or receipt dates): the class is FAST when the line shipped
    within 30 days of its order date, SLOW otherwise, over one year of
    shipments.

    Topology: orders collapse to a broadcast orderkey → (orderdate_us,
    is_high) pair of maps; ONE lineitem pass derives the class and the two
    CASE partials; the final table is 2 rows."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    ow = orders.map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "odate": df["o_orderdate"].astype("int64"),
                "is_high": df["o_orderpriority"].isin(Q12_HIGH),
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    odate_by_key = dict(zip(ow["o_orderkey"], ow["odate"]))
    high_by_key = dict(zip(ow["o_orderkey"], ow["is_high"]))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= Q12_LO) & (df["l_shipdate"] < Q12_HI)
        df = df[m]
        ship_us = df["l_shipdate"].astype("int64")
        odate = df["l_orderkey"].map(odate_by_key).astype("int64")
        fast = ship_us <= odate + Q12_FAST_DAYS * 86_400_000_000
        is_high = df["l_orderkey"].map(high_by_key).astype(bool)
        return pd.DataFrame(
            {
                "ship_speed": np.where(fast, "FAST", "SLOW"),
                "high_line_count": is_high.astype("int64"),
                "low_line_count": (~is_high).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li,
        ["ship_speed"],
        {
            "high_line_count": ("high_line_count", "sum"),
            "low_line_count": ("low_line_count", "sum"),
        },
        prepare=prepare,
    ).to_pandas()
    agg = agg.sort_values("ship_speed").reset_index(drop=True)
    agg["high_line_count"] = agg["high_line_count"].astype("int64")
    agg["low_line_count"] = agg["low_line_count"].astype("int64")
    return agg[["ship_speed", "high_line_count", "low_line_count"]]


_Q12_SHIP_SPEED_SQL = f"""
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL {Q12_FAST_DAYS} DAY
            THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO:%Y-%m-%d}'
  AND l_shipdate <  TIMESTAMP '{Q12_HI:%Y-%m-%d}'
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q15-style top supplier (aggregate view + global MAX equality)
# --------------------------------------------------------------------------

Q15_LO = pd.Timestamp("1997-01-01")
Q15_HI = pd.Timestamp("1997-04-01")


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    global maximum — the revenue-view + scalar-MAX pattern. One lineitem
    pass of per-supplier int64 revenue partials (bounded by |suppliers|);
    the MAX and the equality filter fold driver-side; supplier names join
    from the dimension map. Ties all surface, exactly as the SQL does."""
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= Q15_LO) & (df["l_shipdate"] < Q15_HI)
        df = df[m]
        return pd.DataFrame(
            {
                "l_suppkey": df["l_suppkey"],
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    rev = grouped_aggregate(
        li, ["l_suppkey"], {"rev_u": ("rev_u", "sum")}, prepare=prepare
    ).to_pandas()
    top = rev[rev["rev_u"] == rev["rev_u"].max()]

    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name"])
    name_by_supp = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    out = pd.DataFrame(
        {
            "s_suppkey": top["l_suppkey"].astype("int64"),
            "s_name": top["l_suppkey"].map(name_by_supp),
            "total_revenue": round_half_away(top["rev_u"] / 1_000_000.0),
        }
    )
    return out.sort_values("s_suppkey").reset_index(drop=True)


_Q15_TOP_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO:%Y-%m-%d}'
    AND l_shipdate <  TIMESTAMP '{Q15_HI:%Y-%m-%d}'
  GROUP BY 1
)
SELECT s_suppkey, s_name, ROUND(rev_u / 1000000.0, 4) AS total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_u = (SELECT MAX(rev_u) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q17-style small-quantity revenue (correlated AVG predicate)
# --------------------------------------------------------------------------

Q17_BRAND = "Brand#13"


def q17_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost to small-quantity
    orders of one brand's parts — the correlated ``l_quantity <
    0.2 * AVG(l_quantity)`` predicate, decorrelated into a per-part
    (sum, count) aggregate broadcast into a second scan. The predicate is
    compared in integers (``qty_c * 5 * n < sum_c``), so no float
    threshold can disagree with the oracle.

    At 10^12 rows the per-part map hash-partitions both scans by partkey
    (one canonical key, reused — ``supplier_nation_hash_join``'s path)."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_brand"])
    brand_keys = frozenset(part.loc[part["p_brand"] == Q17_BRAND, "p_partkey"].astype(int))

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = broadcast_semi_filter(_read(sf_dir, "lineitem", columns=li_cols), brand_keys, "l_partkey")

    def qty_prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_partkey": df["l_partkey"],
                "qty_c": np.rint(df["l_quantity"] * 100).astype("int64"),
            }
        )

    pa = grouped_aggregate(
        li, ["l_partkey"], {"sum_c": ("qty_c", "sum"), "n": (None, "count")}, prepare=qty_prepare
    ).to_pandas()
    sum_by_part = dict(zip(pa["l_partkey"], pa["sum_c"]))
    n_by_part = dict(zip(pa["l_partkey"], pa["n"]))

    li2 = broadcast_semi_filter(_read(sf_dir, "lineitem", columns=li_cols), brand_keys, "l_partkey")

    def small_qty(df: pd.DataFrame) -> pd.DataFrame:
        qty_c = np.rint(df["l_quantity"] * 100).astype("int64")
        s = df["l_partkey"].map(sum_by_part).astype("int64")
        n = df["l_partkey"].map(n_by_part).astype("int64")
        m = qty_c * 5 * n < s
        return pd.DataFrame(
            {
                "g": np.zeros(int(m.sum()), dtype="int64"),
                "price_c": np.rint(df.loc[m, "l_extendedprice"] * 100).astype("int64"),
            }
        )

    agg = grouped_aggregate(
        li2, ["g"], {"price_c": ("price_c", "sum")}, prepare=small_qty
    ).to_pandas()
    total_c = int(agg["price_c"].sum()) if len(agg) else 0
    return pd.DataFrame({"avg_yearly": [float(round_half_away(total_c / 100.0 / 7.0))]})


_Q17_SMALL_QTY_REVENUE_SQL = f"""
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sum_c,
         COUNT(*) AS n
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
  GROUP BY 1
)
SELECT ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)), 0)
             / 100.0 / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN pa USING (l_partkey)
WHERE CAST(ROUND(l_quantity * 100, 0) AS BIGINT) * 5 * n < sum_c
"""


# --------------------------------------------------------------------------
# Q19-style disjunctive-predicate revenue
# --------------------------------------------------------------------------

#: (brand, max size, min qty_c, max qty_c) — three OR-ed predicate groups
Q19_GROUPS = (
    ("Brand#12", 5, 100, 1_100),
    ("Brand#18", 10, 1_000, 2_000),
    ("Brand#24", 15, 2_000, 3_000),
)


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of (brand, size range,
    quantity range) predicate groups — the OR-of-ANDs pushdown test.
    Restated per the module header (no containers/ship modes): three
    groups over brand × size × quantity, quantities compared as exact
    cents (``qty_c`` int64) in both engines.

    Topology: part collapses to a broadcast partkey → (brand, size) map;
    ONE lineitem pass evaluates the whole disjunction vectorized (three
    boolean AND-chains OR-ed per batch) and folds one int64 revenue
    partial; output is a single row."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    brand_by_part = dict(zip(part["p_partkey"].astype(int), part["p_brand"]))
    size_by_part = dict(zip(part["p_partkey"].astype(int), part["p_size"].astype(int)))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        brand = df["l_partkey"].map(brand_by_part)
        size = df["l_partkey"].map(size_by_part)
        qty_c = np.rint(df["l_quantity"] * 100).astype("int64")
        keep = np.zeros(len(df), dtype=bool)
        for b, smax, qlo, qhi in Q19_GROUPS:
            keep |= (
                (brand == b) & (size >= 1) & (size <= smax) & (qty_c >= qlo) & (qty_c <= qhi)
            ).to_numpy()
        df = df[keep]
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype="int64"),
                "rev_u": np.rint(
                    df["l_extendedprice"] * (1 - df["l_discount"]) * 1_000_000
                ).astype("int64"),
            }
        )

    agg = grouped_aggregate(li, ["g"], {"rev_u": ("rev_u", "sum")}, prepare=prepare).to_pandas()
    total = int(agg["rev_u"].sum()) if len(agg) else 0
    return pd.DataFrame({"revenue": [float(round_half_away(total / 1_000_000.0))]})


def _q19_sql() -> str:
    clauses = [
        f"""(p_brand = '{b}' AND p_size BETWEEN 1 AND {smax}
         AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) BETWEEN {qlo} AND {qhi})"""
        for b, smax, qlo, qhi in Q19_GROUPS
    ]
    return f"""
SELECT ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                               AS BIGINT)), 0) / 1000000.0, 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {' OR '.join(clauses)}
"""


# --------------------------------------------------------------------------
# Q20-style potential part promotion (nested IN over "partsupp" aggregates)
# --------------------------------------------------------------------------

Q20_NAME_WORD = "rod"
Q20_REGION = "EUROPE"
Q20_LO = pd.Timestamp("1997-01-01")
Q20_HI = pd.Timestamp("1998-01-01")


def q20_potential_promotion(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers positioned to promote one part family —
    the nested IN-subquery chain. Restated per the module header (no
    partsupp/availqty): a supplier qualifies when their shipped quantity
    of a matching part in the year exceeded HALF that part's total across
    all suppliers (the dominant-supplier reading of ``availqty > 0.5 *
    qty``), and the supplier sits in one region.

    Topology: matching part keys broadcast into ONE lineitem pass of
    per-(part, supplier) int64 quantity partials (bounded by qualifying
    pairs); per-part totals, the dominance filter, and the region join
    fold driver-side over that pair table. At 10^12 rows the pair table
    hash-partitions by partkey for the totals instead."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_name"])
    rod_keys = frozenset(
        part.loc[part["p_name"].str.contains(Q20_NAME_WORD, regex=False), "p_partkey"].astype(int)
    )

    li = broadcast_semi_filter(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]),
        rod_keys,
        "l_partkey",
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["l_shipdate"] >= Q20_LO) & (df["l_shipdate"] < Q20_HI)
        df = df[m]
        return pd.DataFrame(
            {
                "l_partkey": df["l_partkey"],
                "l_suppkey": df["l_suppkey"],
                "qty_c": np.rint(df["l_quantity"] * 100).astype("int64"),
            }
        )

    sq = grouped_aggregate(
        li, ["l_partkey", "l_suppkey"], {"qty_c": ("qty_c", "sum")}, prepare=prepare
    ).to_pandas()
    tot_by_part = sq.groupby("l_partkey")["qty_c"].transform("sum")
    dominant = sq[sq["qty_c"] * 2 > tot_by_part]

    in_region, _ = _nation_keys_in_region(sf_dir, Q20_REGION)
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    supp = supp[supp["s_nationkey"].isin(in_region)]
    name_by_supp = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    keys = sorted(set(dominant["l_suppkey"].astype(int)) & set(name_by_supp))
    return pd.DataFrame(
        {
            "s_suppkey": pd.Series(keys, dtype="int64"),
            "s_name": [name_by_supp[k] for k in keys],
        }
    )


_Q20_POTENTIAL_PROMOTION_SQL = f"""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS qty_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{Q20_NAME_WORD}%'
    AND l_shipdate >= TIMESTAMP '{Q20_LO:%Y-%m-%d}'
    AND l_shipdate <  TIMESTAMP '{Q20_HI:%Y-%m-%d}'
  GROUP BY 1, 2
),
pt AS (SELECT l_partkey AS pk, SUM(qty_c) AS tot_c FROM sq GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name
FROM sq
JOIN pt       ON l_partkey = pk
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}' AND qty_c * 2 > tot_c
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q21-style suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------

Q21_REGION = "AMERICA"
Q21_LATE_DAYS = 60
Q21_TOPK = 100


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders — the EXISTS (another supplier) +
    NOT EXISTS (another LATE supplier) pair. Restated per the module
    header: "late" ≡ ``l_shipdate > o_orderdate + 60 days``, finished ≡
    ``o_orderstatus = 'F'``, supplier restricted to one region.

    Topology: the EXISTS/NOT-EXISTS pair decorrelates into per-order
    aggregates: ONE lineitem pass folds per-(order, supplier) any-late
    partials (pair table bounded by order × supplier incidence); per-order
    (supplier count, late count) and the sole-late qualification fold over
    that table; the final histogram is per supplier name. At 10^12 rows
    the pair table hash-partitions by orderkey for the order stats."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"])
    ow = orders.map_batches(
        lambda df: pd.DataFrame(
            {
                "o_orderkey": df.loc[df["o_orderstatus"] == "F", "o_orderkey"],
                "deadline": df.loc[df["o_orderstatus"] == "F", "o_orderdate"].astype("int64")
                + Q21_LATE_DAYS * 86_400_000_000,
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    deadline_by_key = dict(zip(ow["o_orderkey"], ow["deadline"]))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["l_orderkey"].map(deadline_by_key)
        m = dl.notna()
        df = df[m]
        late = (df["l_shipdate"].astype("int64") > dl[m]).astype("int64")
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"], "l_suppkey": df["l_suppkey"], "late": late}
        )

    pairs = grouped_aggregate(
        li, ["l_orderkey", "l_suppkey"], {"late": ("late", "max")}, prepare=prepare
    ).to_pandas()

    g = pairs.groupby("l_orderkey")["late"]
    n_supp = g.transform("size")
    n_late = g.transform("sum")
    qual = pairs[(pairs["late"] == 1) & (n_supp >= 2) & (n_late == 1)]

    in_region, _ = _nation_keys_in_region(sf_dir, Q21_REGION)
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    supp = supp[supp["s_nationkey"].isin(in_region)]
    name_by_supp = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    names = qual["l_suppkey"].map(name_by_supp).dropna()
    hist = names.value_counts().rename_axis("s_name").reset_index(name="numwait")
    hist["numwait"] = hist["numwait"].astype("int64")
    hist = hist.sort_values(["numwait", "s_name"], ascending=[False, True]).head(Q21_TOPK)
    return hist.reset_index(drop=True)


_Q21_WAITING_SUPPLIERS_SQL = f"""
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
ostats AS (
  SELECT l_orderkey AS ok, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM pairs GROUP BY 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs
JOIN ostats   ON l_orderkey = ok
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q21_REGION}' AND late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPK}
"""


# --------------------------------------------------------------------------
# Q22-style global sales opportunity (scalar AVG + NOT EXISTS anti-join)
# --------------------------------------------------------------------------

Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)
Q22_DORMANT_SINCE = pd.Timestamp("1999-01-01")


def q22_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: well-funded dormant customers per country — the
    scalar-AVG threshold plus NOT EXISTS anti-join. Restated per the
    module header: country code ≡ ``c_nationkey``, and "dormant" ≡ no
    orders since {Q22_DORMANT_SINCE} (every customer has SOME order in
    this corpus, so Q22's no-orders-ever reading would be vacuous).

    The threshold predicate compares in integers (``bal_c * n > sum_c``),
    so no float average can disagree with the oracle. Topology: the
    positive-balance (sum, count) folds from one customer pass; recent
    orderers collect from a date-pruned orders scan into a broadcast
    anti-filter (a Bloom prefilter at 10^12 rows — ``BloomFilter`` in
    ``functions/agg.py`` is that path); the final histogram is per
    nation."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].isin(Q22_NATIONS) & (df["c_acctbal"] > 0)]
        return pd.DataFrame(
            {
                "g": np.zeros(len(df), dtype="int64"),
                "bal_c": np.rint(df["c_acctbal"] * 100).astype("int64"),
            }
        )

    pos = grouped_aggregate(
        cust, ["g"], {"sum_c": ("bal_c", "sum"), "n": (None, "count")}, prepare=bal_prepare
    ).to_pandas()
    sum_c = int(pos["sum_c"].sum()) if len(pos) else 0
    n_pos = int(pos["n"].sum()) if len(pos) else 0

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda df: df.loc[df["o_orderdate"] >= Q22_DORMANT_SINCE, ["o_custkey"]].drop_duplicates(),
        batch_format="pandas",
    )
    recent_keys = frozenset(recent.to_pandas()["o_custkey"].astype(int))

    sel = broadcast_semi_filter(
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]),
        recent_keys,
        "c_custkey",
        anti=True,
    )

    def hist_prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"].isin(Q22_NATIONS)]
        bal_c = np.rint(df["c_acctbal"] * 100).astype("int64")
        m = bal_c * n_pos > sum_c
        return pd.DataFrame(
            {
                "cntrycode": df.loc[m, "c_nationkey"].astype("int64"),
                "bal_c": bal_c[m],
            }
        )

    agg = grouped_aggregate(
        sel,
        ["cntrycode"],
        {"numcust": (None, "count"), "bal_c": ("bal_c", "sum")},
        prepare=hist_prepare,
    ).to_pandas()
    agg = agg.sort_values("cntrycode").reset_index(drop=True)
    return pd.DataFrame(
        {
            "cntrycode": agg["cntrycode"].astype("int64"),
            "numcust": agg["numcust"].astype("int64"),
            "totacctbal": round_half_away(agg["bal_c"] / 100.0),
        }
    )


_Q22_SALES_OPPORTUNITY_SQL = f"""
WITH pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS sum_c, COUNT(*) AS n
  FROM customer
  WHERE c_nationkey IN {Q22_NATIONS} AND c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 4) AS totacctbal
FROM customer, pos
WHERE c_nationkey IN {Q22_NATIONS}
  AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * n > sum_c
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE:%Y-%m-%d}'
  )
GROUP BY c_nationkey
ORDER BY cntrycode
"""


QUERIES: dict[str, Callable[[str], pd.DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_ship_speed": q12_ship_speed,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_sales_opportunity": q22_sales_opportunity,
}

ORACLES: dict[str, str] = {
    "q2_min_cost_supplier": _Q2_MIN_COST_SUPPLIER_SQL,
    "q4_order_priority": _Q4_ORDER_PRIORITY_SQL,
    "q8_market_share": _Q8_MARKET_SHARE_SQL,
    "q9_product_profit": _Q9_PRODUCT_PROFIT_SQL,
    "q11_important_parts": _Q11_IMPORTANT_PARTS_SQL,
    "q12_ship_speed": _Q12_SHIP_SPEED_SQL,
    "q15_top_supplier": _Q15_TOP_SUPPLIER_SQL,
    "q17_small_qty_revenue": _Q17_SMALL_QTY_REVENUE_SQL,
    "q19_disjunctive_revenue": _q19_sql(),
    "q20_potential_promotion": _Q20_POTENTIAL_PROMOTION_SQL,
    "q21_waiting_suppliers": _Q21_WAITING_SUPPLIERS_SQL,
    "q22_sales_opportunity": _Q22_SALES_OPPORTUNITY_SQL,
}

"""Mergeable sketches — the approximate path for corpus-scale statistics:

* ``hll_distinct_users`` — HyperLogLog(p=12) distinct count. The exact
  ``distinct_user_count`` shuffles per-batch-deduped keys; at 10^12 distinct
  keys that is still an all-to-all of the key universe. HLL replaces it with
  one 4 KiB register array per batch that the driver merges with an
  elementwise max — constant memory regardless of cardinality, no shuffle,
  deterministic (keys hashed with splitmix64).

* ``approx_top_tokens`` — Misra-Gries heavy hitters over the token stream.
  The exact ``lang_top_tokens`` shuffles one (token, partial) per batch per
  token; MG bounds every partial at ``capacity`` counters no matter how
  large a batch's vocabulary is, and the merged summary has a hard error
  bound: with two truncation levels (per-batch, then final merge) every
  reported count is within 2·n_tokens/(capacity+1) of truth, and no token
  with true count above that bound is missed entirely. With
  ``capacity`` ≥ the corpus's distinct-token count the summary degrades to
  exact counts — this corpus's vocabulary is 31 tokens, so the default
  capacity (64) makes the query SQL-oracle-checkable while the small-capacity
  path is covered by an error-bound test.

Both summaries are associative and commutative, so the same merge works in a
tree (per-node pre-merge) on a real cluster; the driver only ever holds
O(batches × capacity) — never the corpus.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

HLL_P = 12
HLL_M = 1 << HLL_P
MG_CAPACITY = 64
MG_TOPK = 10


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 finalizer)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _md5_hash64(keys: np.ndarray) -> np.ndarray:
    """First 8 md5 bytes (big-endian) of the DECIMAL string of each key —
    the hash DuckDB reproduces bit-for-bit as
    ``('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 16))::UBIGINT``, the
    same technique that made simhash SQL-checkable (shingle_hashes_md5)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(k)).encode()).digest()[:8], "big")
            for k in keys
        ),
        dtype=np.uint64,
        count=len(keys),
    )


def _hll_registers(keys: np.ndarray, hash: str = "md5") -> np.ndarray:
    """uint8[HLL_M] register array for a batch of int64 keys.

    ``hash='md5'`` (default) makes every register value — and therefore the
    whole estimate — exactly computable by the DuckDB oracle (r4: moves the
    three HLL queries from rows-only to hash-checked). ``hash='splitmix64'``
    is the fully-vectorized scale path (same registers semantics, not
    SQL-mirrorable); both paths share the rank math below and are asserted
    to agree on error bounds in tests."""
    keys = np.unique(keys)  # registers max-merge: duplicates contribute
    if hash == "md5":       # nothing, and md5 is per-row python — hash
        h = _md5_hash64(keys)  # each DISTINCT key once per batch
    else:
        h = _splitmix64(keys.astype(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    low = h & np.uint64((1 << (64 - HLL_P)) - 1)
    # rank = leading zeros of the low 64-P bits + 1 = (64-P+1) - bit_length.
    # frexp's exponent IS the bit length, integer-exact for values < 2^53
    # (low has 52 bits at p=12) — no log2 rounding hazard.
    bitlen = np.frexp(low.astype(np.float64))[1]
    rank = ((64 - HLL_P + 1) - bitlen).astype(np.uint8)  # low=0 → max rank
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id count (HLL p=12, ±~1.6% at scale).
    One 4 KiB register row per batch; driver merge is elementwise max."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_registers(df["user_id"].to_numpy(dtype="int64"))
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = events.map_batches(partial, batch_format="pandas").to_pandas()
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for blob in parts["regs"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return pd.DataFrame({"approx_distinct": pd.Series([_hll_estimate(merged)], dtype="int64")})


# --------------------------------------------------------------------------
# ANALYZE: one-pass per-column statistics (planner food)
# --------------------------------------------------------------------------

_ANALYZE_COLS = [  # (name, is_int)
    ("doc_id", True),
    ("text", False),
    ("lang", False),
    ("source", False),
    ("n_chars", True),
]


def _hll_regs_any(values, is_int: bool) -> np.ndarray:
    """HLL registers over arbitrary distinct values, md5-keyed exactly like
    the DuckDB mirror: ints hash their decimal string (= CAST AS VARCHAR),
    strings hash themselves."""
    import hashlib

    regs = np.zeros(HLL_M, dtype=np.uint8)
    seen = set(values)
    h = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(
                    (str(int(v)) if is_int else v).encode()
                ).digest()[:8],
                "big",
            )
            for v in seen
        ),
        dtype=np.uint64,
        count=len(seen),
    )
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    low = h & np.uint64((1 << (64 - HLL_P)) - 1)
    bitlen = np.frexp(low.astype(np.float64))[1]
    rank = ((64 - HLL_P + 1) - bitlen).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def analyze_documents(sf_dir: str) -> pd.DataFrame:
    """ANALYZE over the documents table: ONE streaming pass emits per-column
    (n_nulls, min, max, approx_ndv) — the statistics a planner's
    footer-gated path choices feed on (this repo gates small-vs-distributed
    paths on exactly such bounds). Per batch each column contributes a
    constant-size partial (null count, min/max, one 4 KiB HLL register
    row); the driver merge is elementwise max + min/max + sum — state is
    O(columns), never O(rows). approx_ndv uses the md5-keyed HLL whose
    every register the DuckDB oracle recomputes bit-for-bit, so even the
    approximation is hash-checked, not tolerance-checked."""
    cols = [c for c, _ in _ANALYZE_COLS]
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=cols
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col, is_int in _ANALYZE_COLS:
            s = df[col]
            nn = int(s.isna().sum())
            sv = s.dropna()
            regs = _hll_regs_any(sv.tolist(), is_int)
            rows.append(
                {
                    "column": col,
                    "n_nulls": nn,
                    "min_s": "" if sv.empty else str(sv.min()),
                    "max_s": "" if sv.empty else str(sv.max()),
                    "regs": regs.tobytes(),
                    "empty": sv.empty,
                }
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for col, is_int in _ANALYZE_COLS:
        p = parts[(parts["column"] == col) & ~parts["empty"]]
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for blob in p["regs"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        if is_int:
            mn = str(min(int(x) for x in p["min_s"]))
            mx = str(max(int(x) for x in p["max_s"]))
        else:
            mn = min(p["min_s"])
            mx = max(p["max_s"])
        out.append(
            {
                "column": col,
                "n_nulls": int(parts.loc[parts["column"] == col, "n_nulls"].sum()),
                "min_s": mn,
                "max_s": mx,
                "approx_ndv": _hll_estimate(merged),
            }
        )
    res = pd.DataFrame(out).rename(columns={"column": "col_name"})
    res = res.astype({"n_nulls": "int64", "approx_ndv": "int64"})
    return res.sort_values("col_name").reset_index(drop=True)


def _analyze_sql() -> str:
    def one(col: str, is_int: bool) -> str:
        key = f"CAST({col} AS VARCHAR)" if is_int else col
        return f"""
SELECT '{col}' AS col_name,
       (SELECT CAST(COUNT(*) - COUNT({col}) AS BIGINT) FROM documents) AS n_nulls,
       (SELECT CAST(MIN({col}) AS VARCHAR) FROM documents) AS min_s,
       (SELECT CAST(MAX({col}) AS VARCHAR) FROM documents) AS max_s,
       (WITH rr AS (
          SELECT CAST(hv >> 52 AS BIGINT) AS idx,
                 CAST(CASE WHEN hv % 4503599627370496::UBIGINT = 0::UBIGINT
                      THEN 53
                      ELSE 53 - length(bin(hv % 4503599627370496::UBIGINT))
                      END AS BIGINT) AS rank
          FROM (SELECT CAST(('0x' || substring(md5({key}), 1, 16)) AS UBIGINT)
                  AS hv
                FROM (SELECT DISTINCT {col} FROM documents
                      WHERE {col} IS NOT NULL))
        )
        SELECT CAST(ROUND(
            CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                 THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END, 0) AS BIGINT)
        FROM (
          SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                   / (s + (4096 - nreg)) AS raw,
                 4096 - nreg AS zeros
          FROM (SELECT SUM(POWER(2.0, -r)) AS s, COUNT(*) AS nreg
                FROM (SELECT idx, MAX(rank) AS r FROM rr GROUP BY idx))
        )) AS approx_ndv"""

    return "\nUNION ALL\n".join(one(c, i) for c, i in _ANALYZE_COLS) + (
        "\nORDER BY col_name"
    )


def _mg_merge(counts: pd.Series, capacity: int) -> pd.Series:
    """Misra-Gries truncation: keep ≤ capacity counters by subtracting the
    (capacity+1)-th largest count from all and dropping ≤ 0."""
    if len(counts) <= capacity:
        return counts
    vals = counts.sort_values(ascending=False, kind="mergesort")
    thresh = vals.iloc[capacity]
    kept = counts - thresh
    return kept[kept > 0]


def approx_top_tokens(sf_dir: str, capacity: int = MG_CAPACITY) -> pd.DataFrame:
    """Top-10 tokens by (lower-bound) Misra-Gries count; each partial and the
    merged summary are bounded at ``capacity`` counters. Exact whenever the
    distinct-token count never exceeds ``capacity`` (true for this corpus at
    the default 64), which is what the SQL oracle checks."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        flat = (
            np.concatenate(toks.to_numpy())
            if len(df)
            else np.array([], dtype=object)
        )
        counts = pd.Series(flat).value_counts()
        counts = _mg_merge(counts, capacity)
        return pd.DataFrame(
            {"token": counts.index.to_numpy(), "n": counts.to_numpy()}
        )

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    merged = parts.groupby("token", sort=False)["n"].sum()
    merged = _mg_merge(merged, capacity)
    out = (
        merged.rename("n")
        .reset_index()
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(MG_TOPK)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["token", "n"]]


_APPROX_TOP_TOKENS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
)
SELECT token, n FROM c ORDER BY n DESC, token LIMIT {MG_TOPK}
"""


def type_distinct_users_hll(
    sf_dir: str, driver_merge_max_rows: int = 100_000
) -> pd.DataFrame:
    """Per-KEY approximate distinct count: one HLL register array per
    (event_type, batch), merged per key by elementwise max — the grouped
    variant of ``hll_distinct_users``. Adaptive merge: ≤ ``driver_merge_max_
    rows`` register rows merge on the driver; above that the max-merge runs
    as a DISTRIBUTED key-grouped reduction over the register column (the
    merge is associative — same result, tested equal), so the driver only
    ever holds |keys| merged arrays. No per-key value set ever
    materializes. Deterministic (md5 key hash — exactly SQL-mirrored, r4),
    ±~1.6% at p=12; accuracy asserted vs exact counts in tests."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            rows.append(
                (et, _hll_registers(g["user_id"].to_numpy(dtype="int64")).tobytes())
            )
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "regs": [merged.tobytes()]}
        )

    parts_ds = events.map_batches(partial, batch_format="pandas").materialize()
    if parts_ds.count() > driver_merge_max_rows:
        parts_ds = parts_ds.groupby("event_type").map_groups(
            _merge_group, batch_format="pandas"
        )
    parts = parts_ds.to_pandas()
    out_rows = []
    for et, g in parts.groupby("event_type", sort=True):
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        out_rows.append((et, _hll_estimate(merged)))
    return pd.DataFrame(out_rows, columns=["event_type", "approx_distinct"]).astype(
        {"approx_distinct": "int64"}
    )


def view_purchase_overlap_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate SET INTERSECTION cardinality by sketch composition:
    |A∩B| = est(A) + est(B) − est(A∪B), where the union sketch is just the
    elementwise max of the two HLL register arrays — no third pass, no key
    shuffle ever. The approximate counterpart of the exact
    ``view_purchase_users`` INTERSECT (which must move deduped keys);
    inclusion-exclusion error compounds the two sketches' ±1.6%, asserted
    against the exact overlap in tests."""
    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et in ("view", "purchase"):
            keys = df.loc[df["event_type"] == et, "user_id"].to_numpy(dtype="int64")
            rows.append((et, _hll_registers(keys).tobytes()))
        return pd.DataFrame(rows, columns=["side", "regs"])

    parts = events.map_batches(partial, batch_format="pandas").to_pandas()
    merged = {
        et: np.zeros(HLL_M, dtype=np.uint8) for et in ("view", "purchase")
    }
    for side, blob in zip(parts["side"], parts["regs"]):
        np.maximum(
            merged[side], np.frombuffer(blob, dtype=np.uint8), out=merged[side]
        )
    est_a = _hll_estimate(merged["view"])
    est_b = _hll_estimate(merged["purchase"])
    est_union = _hll_estimate(np.maximum(merged["view"], merged["purchase"]))
    return pd.DataFrame(
        {
            "approx_view": pd.Series([est_a], dtype="int64"),
            "approx_purchase": pd.Series([est_b], dtype="int64"),
            "approx_both": pd.Series([max(0, est_a + est_b - est_union)], dtype="int64"),
        }
    )


# --------------------------------------------------------------------------
# Count-Min sketch (linear mergeable frequency sketch)
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 2048  # counters per row: overestimate ≤ e/W · N per row, min over D


def _cms_row_index(tokens: np.ndarray, row: int) -> np.ndarray:
    """Counter index of each token in CMS row ``row``: first 8 md5 bytes of
    ``"{row}:{token}"`` mod W — d independent-enough hash functions that
    DuckDB reproduces bit-for-bit (r4: same technique as the HLL/simhash
    oracles), making the whole sketch — every cell, every probe —
    SQL-checkable."""
    import hashlib

    pre = f"{row}:".encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(pre + t.encode()).digest()[:8], "big")
            % CMS_W
            for t in tokens
        ),
        dtype=np.int64,
        count=len(tokens),
    )


def _cms_matrix(tokens: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """d×w int64 Count-Min matrix for (token, count) pairs."""
    m = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in range(CMS_D):
        np.add.at(m[r], _cms_row_index(tokens, r), counts)
    return m


def token_counts_cms(sf_dir: str) -> pd.DataFrame:
    """Approximate per-token frequencies from a Count-Min sketch — the
    LINEAR mergeable sketch (partials combine by elementwise SUM, unlike
    HLL's max or Misra-Gries' counter eviction), so any tree of merges is
    exact over the sketch. One 64 KiB matrix per batch crosses the wire;
    the probe set is the Misra-Gries top-10 (exact on this corpus), giving
    (token, est_n) with the classic guarantee est ≥ true and
    est ≤ true + (e/W)·N per row w.h.p. — asserted in tests."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        flat = (
            np.concatenate(toks.to_numpy()) if len(df) else np.array([], dtype=object)
        )
        uniq, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame({"m": [_cms_matrix(uniq, cnt).tobytes()]})

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    merged = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for blob in parts["m"]:
        merged += np.frombuffer(blob, dtype=np.int64).reshape(CMS_D, CMS_W)

    probe = approx_top_tokens(sf_dir)["token"].to_numpy()
    ests = np.full(len(probe), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        ests = np.minimum(ests, merged[r, _cms_row_index(probe, r)])
    out = pd.DataFrame({"token": probe, "est_n": ests})
    return out.sort_values("token").reset_index(drop=True)


#: exact SQL mirror of the Count-Min sketch (r4): md5 row hashes → DuckDB
#: rebuilds every cell total and takes the same min over rows per probe.
_TOKEN_COUNTS_CMS_SQL = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tc AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
cells AS (
  SELECT t.r,
         CAST(CAST(('0x' || substring(
             md5(CAST(t.r AS VARCHAR) || ':' || tc.token), 1, 16))
           AS UBIGINT) % {CMS_W} AS BIGINT) AS idx,
         SUM(tc.n) AS cell_n
  FROM tc, range({CMS_D}) t(r)
  GROUP BY 1, 2
),
probe AS (SELECT token, n FROM tc ORDER BY n DESC, token LIMIT {MG_TOPK})
SELECT p.token, CAST(MIN(c.cell_n) AS BIGINT) AS est_n
FROM probe p
CROSS JOIN range({CMS_D}) t(r)
JOIN cells c
  ON c.r = t.r
 AND c.idx = CAST(CAST(('0x' || substring(
         md5(CAST(t.r AS VARCHAR) || ':' || p.token), 1, 16))
       AS UBIGINT) % {CMS_W} AS BIGINT)
GROUP BY p.token
ORDER BY p.token
"""


# --------------------------------------------------------------------------
# Mergeable quantile sketch (weighted order-statistic summary)
# --------------------------------------------------------------------------

QS_BINS = 4096  # histogram resolution (value-space error = range / bins)
QS_QUANTILES = (0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99)


def event_value_quantiles_sketch(
    sf_dir: str, bins: int = QS_BINS, quantiles: tuple = QS_QUANTILES
) -> pd.DataFrame:
    """Approximate quantiles of ``events.value`` from a DETERMINISTIC
    mergeable histogram sketch (r5 — replaced the per-batch order-statistic
    summary, whose output depended on physical batch boundaries and was
    therefore only rows-only checkable): pass 1 finds the global
    [lo, hi] integer range of the 1e-6-quantized values (distributed
    min/max), pass 2 bins every value into ``bins`` equi-width cells and
    keeps per-cell (count, min) — both partial-aggregated inside
    ``map_batches``, merged by sum/min, so any tree of merges is exact and
    the result is independent of partitioning. Each quantile answers with
    the MINIMUM value of the first cell whose cumulative count reaches
    ``q·N`` — guaranteed within one cell width of the exact quantile
    (asserted vs numpy in tests) and exactly reproducible by the DuckDB
    mirror. The driver holds ≤ ``bins`` summary rows, never the stream."""
    from .agg import grouped_aggregate, round_half_away

    events = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "one": np.ones(len(df), dtype="int64"),
                "v6": np.rint(df["value"].to_numpy() * 1_000_000).astype("int64"),
            }
        )

    rng = grouped_aggregate(
        events, ["one"], {"lo": ("v6", "min"), "hi": ("v6", "max")},
        prepare=quantize,
    ).to_pandas()
    lo, hi = int(rng["lo"].iloc[0]), int(rng["hi"].iloc[0])
    width = hi - lo + 1

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        v6 = np.rint(df["value"].to_numpy() * 1_000_000).astype("int64")
        b = (v6 - lo) * bins // width
        return pd.DataFrame({"bin": b, "v6": v6})

    cells = grouped_aggregate(
        events,
        ["bin"],
        {"n": (None, "count"), "vmin": ("v6", "min")},
        prepare=binned,
    ).to_pandas().sort_values("bin")
    cum = cells["n"].to_numpy().cumsum()
    total = int(cum[-1])
    vmins = cells["vmin"].to_numpy()
    qs = np.asarray(quantiles, dtype="float64")
    pos = np.searchsorted(cum, qs * total, side="left").clip(0, len(vmins) - 1)
    return pd.DataFrame(
        {"q": qs, "approx_value": round_half_away(vmins[pos] / 1_000_000.0)}
    )


def type_value_quantiles_sketch(
    sf_dir: str, bins: int = QS_BINS, quantiles: tuple = QS_QUANTILES
) -> pd.DataFrame:
    """GROUPED deterministic histogram quantile sketch: the per-event-type
    variant of :func:`event_value_quantiles_sketch` — per-key [lo, hi]
    ranges (one grouped min/max pass), then per-(key, cell) (count, min)
    partials; both merge by sum/min so the result is independent of
    partitioning and exactly mirrored by the DuckDB oracle. Driver holds
    ≤ |keys|·bins summary rows; the value stream never leaves workers."""
    from .agg import grouped_aggregate, round_half_away

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def quantized(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "v6": np.rint(df["value"].to_numpy() * 1_000_000).astype("int64"),
            }
        )

    rng = (
        grouped_aggregate(
            events,
            ["event_type"],
            {"lo": ("v6", "min"), "hi": ("v6", "max")},
            prepare=quantized,
        )
        .to_pandas()
        .set_index("event_type")
    )
    lo_map = rng["lo"].to_dict()
    w_map = {k: int(rng["hi"][k]) - int(v) + 1 for k, v in lo_map.items()}

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        d = quantized(df)
        lo = d["event_type"].map(lo_map).to_numpy(dtype="int64")
        w = d["event_type"].map(w_map).to_numpy(dtype="int64")
        v6 = d["v6"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": d["event_type"],
                "bin": (v6 - lo) * bins // w,
                "v6": v6,
            }
        )

    cells = grouped_aggregate(
        events,
        ["event_type", "bin"],
        {"n": (None, "count"), "vmin": ("v6", "min")},
        prepare=binned,
    ).to_pandas()
    rows = []
    qs = np.asarray(quantiles, dtype="float64")
    for et, g in cells.groupby("event_type", sort=True):
        g = g.sort_values("bin")
        cum = g["n"].to_numpy().cumsum()
        vmins = g["vmin"].to_numpy()
        pos = np.searchsorted(cum, qs * int(cum[-1]), side="left").clip(
            0, len(vmins) - 1
        )
        for q, v in zip(qs, vmins[pos]):
            rows.append(
                (et, float(q), float(round_half_away(v / 1_000_000.0)))
            )
    return pd.DataFrame(rows, columns=["event_type", "q", "approx_value"])


_EVENT_VALUE_QUANTILES_SKETCH_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v6 FROM events
), r AS (
  SELECT MIN(v6) AS lo, MAX(v6) - MIN(v6) + 1 AS w FROM v
), cells AS (
  SELECT (v.v6 - r.lo) * {QS_BINS} // r.w AS bin,
         COUNT(*) AS n, MIN(v.v6) AS vmin
  FROM v, r GROUP BY 1
), cum AS (
  SELECT bin, vmin,
         SUM(n) OVER (ORDER BY bin) AS cum,
         SUM(n) OVER () AS total
  FROM cells
), qs AS (SELECT unnest([0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
SELECT qs.q,
       ROUND(MIN(cum.vmin) FILTER (WHERE cum.cum >= qs.q * cum.total)
             / 1000000.0, 4) AS approx_value
FROM qs CROSS JOIN cum
GROUP BY qs.q ORDER BY qs.q
"""

_TYPE_VALUE_QUANTILES_SKETCH_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v6 FROM events
), r AS (
  SELECT event_type, MIN(v6) AS lo, MAX(v6) - MIN(v6) + 1 AS w
  FROM v GROUP BY 1
), cells AS (
  SELECT v.event_type, (v.v6 - r.lo) * {QS_BINS} // r.w AS bin,
         COUNT(*) AS n, MIN(v.v6) AS vmin
  FROM v JOIN r USING (event_type) GROUP BY 1, 2
), cum AS (
  SELECT event_type, bin, vmin,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM cells
), qs AS (SELECT unnest([0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
SELECT cum.event_type, qs.q,
       ROUND(MIN(cum.vmin) FILTER (WHERE cum.cum >= qs.q * cum.total)
             / 1000000.0, 4) AS approx_value
FROM qs CROSS JOIN cum
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Exact SQL mirrors of the HLL estimates (r4): with the md5 key hash the
# whole sketch — register index, rank, bias-corrected estimate, linear-
# counting branch — is reproducible in DuckDB, so the three HLL queries are
# hash-checked instead of rows-only. 2^(64-p) = 4503599627370496;
# alpha(4096) = 0.7213/(1 + 1.079/4096).
# --------------------------------------------------------------------------

def _hll_rr_sql(key_expr: str, src: str) -> str:
    """(idx, rank) rows for the distinct keys of ``src``."""
    return f"""
  SELECT CAST(hv >> 52 AS BIGINT) AS idx,
         CAST(CASE WHEN hv % 4503599627370496::UBIGINT = 0::UBIGINT THEN 53
              ELSE 53 - length(bin(hv % 4503599627370496::UBIGINT))
              END AS BIGINT) AS rank
  FROM (
    SELECT CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 16))
                AS UBIGINT) AS hv
    FROM (SELECT DISTINCT {key_expr} FROM {src})
  )"""


_HLL_EST_SQL = """
  SELECT CAST(ROUND(
      CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
           THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END, 0) AS BIGINT)
  FROM (
    SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
             / (s + (4096 - nreg)) AS raw,
           4096 - nreg AS zeros
    FROM (
      SELECT SUM(POWER(2.0, -r)) AS s, COUNT(*) AS nreg
      FROM (SELECT idx, MAX(rank) AS r FROM rr GROUP BY idx)
    )
  )"""

_HLL_DISTINCT_USERS_SQL = f"""
WITH rr AS ({_hll_rr_sql("user_id", "events")})
SELECT ({_HLL_EST_SQL}) AS approx_distinct
"""

_TYPE_DISTINCT_USERS_HLL_SQL = f"""
WITH types AS (SELECT DISTINCT event_type FROM events)
SELECT event_type,
       (
         WITH rr AS (
           SELECT CAST(hv >> 52 AS BIGINT) AS idx,
                  CAST(CASE WHEN hv % 4503599627370496::UBIGINT = 0::UBIGINT
                       THEN 53
                       ELSE 53 - length(bin(hv % 4503599627370496::UBIGINT))
                       END AS BIGINT) AS rank
           FROM (
             SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 16)) AS UBIGINT) AS hv
             FROM (SELECT DISTINCT user_id FROM events e
                   WHERE e.event_type = types.event_type)
           )
         )
         {_HLL_EST_SQL}
       ) AS approx_distinct
FROM types ORDER BY event_type
"""

_VIEW_PURCHASE_OVERLAP_HLL_SQL = f"""
WITH est AS (
  SELECT
    (WITH rr AS ({_hll_rr_sql("user_id", "events WHERE event_type = 'view'")})
     {_HLL_EST_SQL}) AS approx_view,
    (WITH rr AS ({_hll_rr_sql("user_id",
                              "events WHERE event_type = 'purchase'")})
     {_HLL_EST_SQL}) AS approx_purchase,
    (WITH rr AS ({_hll_rr_sql(
        "user_id",
        "events WHERE event_type IN ('view', 'purchase')")})
     {_HLL_EST_SQL}) AS approx_union
)
SELECT approx_view, approx_purchase,
       GREATEST(0, approx_view + approx_purchase - approx_union)
         AS approx_both
FROM est
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "hll_distinct_users": hll_distinct_users,
    "analyze_documents": analyze_documents,
    "type_value_quantiles_sketch": type_value_quantiles_sketch,
    "approx_top_tokens": approx_top_tokens,
    "event_value_quantiles_sketch": event_value_quantiles_sketch,
    "type_distinct_users_hll": type_distinct_users_hll,
    "token_counts_cms": token_counts_cms,
    "view_purchase_overlap_hll": view_purchase_overlap_hll,
}
#: Every sketch here is now exactly mirrored: the HLL family via md5 keys
#: (r4), the quantile sketches via the deterministic histogram rewrite (r5)
#: whose per-cell (count, min) partials DuckDB rebuilds bit-for-bit, and
#: token_counts_cms via md5 row hashes. Accuracy-vs-exact bounds remain
#: asserted in tests/test_sketch.py.
ORACLES: dict[str, str] = {
    "event_value_quantiles_sketch": _EVENT_VALUE_QUANTILES_SKETCH_SQL,
    "type_value_quantiles_sketch": _TYPE_VALUE_QUANTILES_SKETCH_SQL,
    "approx_top_tokens": _APPROX_TOP_TOKENS_SQL,
    "hll_distinct_users": _HLL_DISTINCT_USERS_SQL,
    "analyze_documents": _analyze_sql(),
    "type_distinct_users_hll": _TYPE_DISTINCT_USERS_HLL_SQL,
    "view_purchase_overlap_hll": _VIEW_PURCHASE_OVERLAP_HLL_SQL,
    "token_counts_cms": _TOKEN_COUNTS_CMS_SQL,
}

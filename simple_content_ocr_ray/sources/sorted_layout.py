"""Range-clustered Parquet layout: cluster by key once, prune reads forever.

``write_sorted(ds, out, key)`` range-partitions the dataset on ``key`` and
writes one hive directory per contiguous key range, recording each range's
exact [min, max] in a JSON manifest. ``read_range(out, lo, hi)`` then opens
ONLY the ranges overlapping [lo, hi] — the storage-level analog of parquet
row-group pruning, and the "cluster by" half of the pick-one-
partitioning-key rule (``sources/bucketed.py`` is the hash half: buckets
co-locate equi-join keys; sorted ranges co-locate range scans).

Everything is distributed and single-pass over the data:

1. cut points come from a bounded stride SAMPLE of the key column (the
   driver holds num_ranges numbers, never the corpus);
2. range assignment is a worker-local ``searchsorted`` against the
   broadcast cuts, written with one hive-partitioned distributed write;
3. the manifest's exact per-range min/max/count is a grouped aggregate over
   per-batch partials (num_ranges rows), written LAST into a temp dir that
   is atomically renamed — a killed write leaves no readable layout.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import ray
import ray.data as rd

MANIFEST_NAME = "_range_manifest.json"
SAMPLE_CAP = 65536


def _cut_points(ds: rd.Dataset, key: str, num_ranges: int) -> np.ndarray:
    """num_ranges-1 ascending cut points from a bounded stride sample."""

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        stride = max(1, len(df) * 64 // SAMPLE_CAP)
        return df[[key]].iloc[::stride]

    s = ds.map_batches(sample, batch_format="pandas").to_pandas()[key].to_numpy()
    qs = np.linspace(0, 1, num_ranges + 1)[1:-1]
    if s.dtype.kind in ("O", "U", "S"):  # string keys (e.g. SURT): positional
        s = np.sort(s)                   # quantiles of the sorted sample
        idx = np.minimum((qs * (len(s) - 1)).round().astype(int), len(s) - 1)
        return np.unique(s[idx])
    return np.unique(np.quantile(s, qs, method="nearest"))


def write_sorted(
    ds: rd.Dataset, out_dir: str, key: str, num_ranges: int = 16
) -> list[dict]:
    """Range-clustered hive layout + manifest. Returns the manifest ranges
    (range_id, lo, hi, n_rows)."""
    cuts = _cut_points(ds, key, num_ranges)
    cuts_ref = ray.put(cuts)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cuts = ray.get(cuts_ref)
        df = df.copy()
        df["range_id"] = np.searchsorted(cuts, df[key].to_numpy(), side="right")
        return df

    tmp = out_dir + f".tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    assigned = ds.map_batches(assign, batch_format="pandas")
    assigned.write_parquet(tmp, partition_cols=["range_id"])

    # exact per-range stats from per-batch partials (num_ranges rows total)
    from ..functions.agg import grouped_aggregate

    stats = (
        grouped_aggregate(
            assigned,
            ["range_id"],
            {"lo": (key, "min"), "hi": (key, "max"), "n_rows": (None, "count")},
        )
        .to_pandas()
        .sort_values("range_id")
    )
    ranges = [
        {
            "range_id": int(r.range_id),
            "lo": r.lo.item() if hasattr(r.lo, "item") else r.lo,
            "hi": r.hi.item() if hasattr(r.hi, "item") else r.hi,
            "n_rows": int(r.n_rows),
        }
        for r in stats.itertuples()
    ]
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump({"key": key, "ranges": ranges}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return ranges


def _overlapping(out_dir: str, lo, hi) -> tuple[str, list[dict]]:
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        man = json.load(f)
    return man["key"], [
        r for r in man["ranges"] if not (r["hi"] < lo or r["lo"] > hi)
    ]


def read_range(out_dir: str, lo, hi, columns: list[str] | None = None) -> rd.Dataset:
    """Dataset over ONLY the range dirs overlapping [lo, hi] — plus an exact
    residual filter, since range boundaries are inclusive envelopes."""
    key, hit = _overlapping(out_dir, lo, hi)
    if not hit:
        return rd.from_pandas(pd.DataFrame())
    if columns is not None and key not in columns:
        columns = [*columns, key]
    import glob as _glob

    # read_parquet accepts a directory OR a list of files, not a list of
    # directories — expand each hit range dir to its parquet files
    paths = [
        p
        for r in hit
        for p in sorted(
            _glob.glob(os.path.join(out_dir, f"range_id={r['range_id']}", "*.parquet"))
        )
    ]
    ds = rd.read_parquet(paths, columns=columns)

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        return df[(df[key] >= lo) & (df[key] <= hi)]

    return ds.map_batches(residual, batch_format="pandas")


def ranges_scanned(out_dir: str, lo, hi) -> int:
    """How many range dirs a [lo, hi] query touches (pruning observability)."""
    return len(_overlapping(out_dir, lo, hi)[1])

"""Z-order (Morton) clustered Parquet layout: 2-D pruning from one layout.

``sorted_layout`` prunes range scans on ONE key; real query mixes filter on
two (user AND time, domain AND size). Sorting by either key alone leaves
box queries scanning everything on the other. The classic fix — the same
one table formats built on sorted files use — is Z-ORDER clustering:
quantize each key to a small rank, bit-interleave the ranks into a Morton
cell id, and cluster files by cell. Points close in BOTH dimensions land in
the same cell, so a 2-D box query touches O(box area) cells instead of
O(side) stripes.

Everything is distributed and single-pass over the data (same recipe as
``sorted_layout``):

1. per-key quantile cuts from a bounded stride sample (driver holds
   2×(2^bits − 1) numbers, never the corpus);
2. rank + interleave is a worker-local vectorized map, written with one
   hive-partitioned distributed write (``z_cell=<id>/``);
3. the manifest records each cell's EXACT 2-D envelope (min/max of both
   keys) + row count from per-batch partials, written last into a temp dir
   atomically renamed — a killed write leaves no readable layout.

``read_box`` opens only the cells whose envelope intersects the query box
(correct regardless of quantization skew — the envelope is exact), plus an
exact residual filter for the inclusive boundary rows.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import ray
import ray.data as rd

MANIFEST_NAME = "_zorder_manifest.json"
SAMPLE_CAP = 65536


def _key_cuts(ds: rd.Dataset, key: str, bits: int) -> np.ndarray:
    """2^bits − 1 ascending cut points from a bounded stride sample."""

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        stride = max(1, len(df) * 64 // SAMPLE_CAP)
        return df[[key]].iloc[::stride]

    s = ds.map_batches(sample, batch_format="pandas").to_pandas()[key].to_numpy()
    qs = np.linspace(0, 1, (1 << bits) + 1)[1:-1]
    return np.unique(np.quantile(s, qs, method="nearest"))


def _morton2(xr: np.ndarray, yr: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized 2-D Morton interleave of two rank arrays (< 2^bits)."""
    z = np.zeros(len(xr), dtype=np.int64)
    for b in range(bits):
        z |= ((xr >> b) & 1) << (2 * b)
        z |= ((yr >> b) & 1) << (2 * b + 1)
    return z


def write_zorder(
    ds: rd.Dataset, out_dir: str, key_x: str, key_y: str, bits: int = 3
) -> list[dict]:
    """Z-order clustered hive layout + manifest; returns the manifest cells
    (z_cell, x_lo, x_hi, y_lo, y_hi, n_rows). ``bits`` ranks per dimension
    → up to 4^bits cells."""
    cuts_x = _key_cuts(ds, key_x, bits)
    cuts_y = _key_cuts(ds, key_y, bits)
    cuts_ref = ray.put((cuts_x, cuts_y))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cx, cy = ray.get(cuts_ref)
        df = df.copy()
        xr = np.searchsorted(cx, df[key_x].to_numpy(), side="right").astype(np.int64)
        yr = np.searchsorted(cy, df[key_y].to_numpy(), side="right").astype(np.int64)
        df["z_cell"] = _morton2(xr, yr, bits)
        return df

    tmp = out_dir + f".tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    assigned = ds.map_batches(assign, batch_format="pandas")
    assigned.write_parquet(tmp, partition_cols=["z_cell"])

    # exact per-cell 2-D envelopes from per-batch partials (≤ 4^bits rows)
    from ..functions.agg import grouped_aggregate

    stats = (
        grouped_aggregate(
            assigned,
            ["z_cell"],
            {
                "x_lo": (key_x, "min"),
                "x_hi": (key_x, "max"),
                "y_lo": (key_y, "min"),
                "y_hi": (key_y, "max"),
                "n_rows": (None, "count"),
            },
        )
        .to_pandas()
        .sort_values("z_cell")
    )

    def _plain(v):
        return v.item() if hasattr(v, "item") else v

    cells = [
        {
            "z_cell": int(r.z_cell),
            "x_lo": _plain(r.x_lo),
            "x_hi": _plain(r.x_hi),
            "y_lo": _plain(r.y_lo),
            "y_hi": _plain(r.y_hi),
            "n_rows": int(r.n_rows),
        }
        for r in stats.itertuples()
    ]
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump({"key_x": key_x, "key_y": key_y, "cells": cells}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return cells


def _hit_cells(out_dir: str, x_lo, x_hi, y_lo, y_hi) -> tuple[str, str, list[dict]]:
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        man = json.load(f)
    hit = [
        c
        for c in man["cells"]
        if not (
            c["x_hi"] < x_lo or c["x_lo"] > x_hi or c["y_hi"] < y_lo or c["y_lo"] > y_hi
        )
    ]
    return man["key_x"], man["key_y"], hit


def read_box(
    out_dir: str, x_lo, x_hi, y_lo, y_hi, columns: list[str] | None = None
) -> rd.Dataset:
    """Dataset over ONLY the cells intersecting the 2-D box, plus an exact
    residual filter (cell envelopes are inclusive)."""
    import glob as _glob

    key_x, key_y, hit = _hit_cells(out_dir, x_lo, x_hi, y_lo, y_hi)
    if columns is not None:
        columns = list(dict.fromkeys([*columns, key_x, key_y]))
    if not hit:
        return rd.from_pandas(pd.DataFrame(columns=columns or []))
    paths = [
        p
        for c in hit
        for p in sorted(
            _glob.glob(os.path.join(out_dir, f"z_cell={c['z_cell']}", "*.parquet"))
        )
    ]
    ds = rd.read_parquet(paths, columns=columns)

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        df = df[
            (df[key_x] >= x_lo)
            & (df[key_x] <= x_hi)
            & (df[key_y] >= y_lo)
            & (df[key_y] <= y_hi)
        ]
        # the hive partition column is re-inferred from the paths; it is
        # layout metadata, not data — never return it
        if columns is not None:
            return df[columns]
        return df.drop(columns=["z_cell"], errors="ignore")

    return ds.map_batches(residual, batch_format="pandas")


def cells_scanned(out_dir: str, x_lo, x_hi, y_lo, y_hi) -> int:
    """How many cell dirs a box query touches (pruning observability)."""
    return len(_hit_cells(out_dir, x_lo, x_hi, y_lo, y_hi)[2])


# --------------------------------------------------------------------------
# Oracle-checked query over the pruned read path
# --------------------------------------------------------------------------

ZORDER_VERSION = 1
BOX_USER_LO, BOX_USER_HI = 2, 9
BOX_VALUE_LO, BOX_VALUE_HI = 5.0, 120.0


def zorder_box_scan(sf_dir: str) -> rd.Dataset:
    """(user AND value) box query served from the Z-order layout — the
    correctness probe for the pruned read path: cluster events once (cached,
    atomic), then answer the 2-D box from only the intersecting cells. The
    result must equal a plain full-scan WHERE, which is exactly what the SQL
    oracle runs."""
    import hashlib as _hashlib

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    # events.parquet's mtime+size join the cache key: a regenerated table
    # under the same path must rebuild the layout, never serve stale cells
    try:
        st = os.stat(os.path.join(abs_dir, "events.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    tag = _hashlib.blake2b(f"{abs_dir}|{stamp}".encode(), digest_size=4).hexdigest()
    out = f"/tmp/scor_zorder/{os.path.basename(abs_dir)}_{tag}_v{ZORDER_VERSION}"
    if not os.path.exists(os.path.join(out, MANIFEST_NAME)):
        ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "value"],
        )
        write_zorder(ds, out, "user_id", "value")
    return read_box(
        out,
        BOX_USER_LO,
        BOX_USER_HI,
        BOX_VALUE_LO,
        BOX_VALUE_HI,
        columns=["event_id", "user_id", "value"],
    )


_ZORDER_BOX_SCAN_SQL = f"""
SELECT event_id, user_id, value FROM events
WHERE user_id BETWEEN {BOX_USER_LO} AND {BOX_USER_HI}
  AND value BETWEEN {BOX_VALUE_LO} AND {BOX_VALUE_HI}
"""

QUERIES = {"zorder_box_scan": zorder_box_scan}
ORACLES = {"zorder_box_scan": _ZORDER_BOX_SCAN_SQL}

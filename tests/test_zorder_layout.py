"""Z-order clustered layout (sources/zorder_layout.py): 2-D box pruning
really prunes, results are exact, manifest envelopes are true."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data as rd

from simple_content_ocr_ray.sources import zorder_layout

SF = "/root/testdata/sf0.001"
BITS = 3


def _events() -> pd.DataFrame:
    return pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )


def _layout(tmpdir: str) -> str:
    out = f"{tmpdir}/events_by_user_value"
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    cells = zorder_layout.write_zorder(ds, out, "user_id", "value", bits=BITS)
    assert 1 < len(cells) <= 4**BITS
    return out


def test_zorder_manifest_envelopes_are_exact(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    with open(os.path.join(out, zorder_layout.MANIFEST_NAME)) as f:
        man = json.load(f)
    total = 0
    for c in man["cells"]:
        df = pd.concat(
            [
                pd.read_parquet(p)
                for p in sorted(
                    __import__("glob").glob(
                        os.path.join(out, f"z_cell={c['z_cell']}", "*.parquet")
                    )
                )
            ]
        )
        assert df["user_id"].min() == c["x_lo"] and df["user_id"].max() == c["x_hi"]
        assert df["value"].min() == c["y_lo"] and df["value"].max() == c["y_hi"]
        assert len(df) == c["n_rows"]
        total += len(df)
    assert total == len(_events())


def test_read_box_matches_bruteforce_filter(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    ev = _events()
    uq = lambda q: int(np.quantile(ev["user_id"], q))  # noqa: E731
    vq = lambda q: float(np.quantile(ev["value"], q))  # noqa: E731
    boxes = [
        (uq(0.2), uq(0.6), vq(0.1), vq(0.5)),
        (0, 10**9, -(10.0**9), 10.0**9),  # whole domain
        (uq(0.5), uq(0.52), vq(0.0), vq(0.3)),
    ]
    for x_lo, x_hi, y_lo, y_hi in boxes:
        got = (
            zorder_layout.read_box(out, x_lo, x_hi, y_lo, y_hi)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        exp = (
            ev[
                (ev["user_id"] >= x_lo)
                & (ev["user_id"] <= x_hi)
                & (ev["value"] >= y_lo)
                & (ev["value"] <= y_hi)
            ]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert list(got["event_id"]) == list(exp["event_id"])


def test_small_box_prunes_most_cells(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    with open(os.path.join(out, zorder_layout.MANIFEST_NAME)) as f:
        n_cells = len(json.load(f)["cells"])
    ev = _events()
    # a tight box around low quantiles of both keys
    x_hi = np.quantile(ev["user_id"], 0.15)
    y_hi = float(np.quantile(ev["value"], 0.15))
    scanned = zorder_layout.cells_scanned(
        out, ev["user_id"].min(), x_hi, float(ev["value"].min()), y_hi
    )
    assert scanned < n_cells / 2, (scanned, n_cells)
    # whole-domain box touches everything
    assert (
        zorder_layout.cells_scanned(out, 0, 10**9, -(10.0**9), 10.0**9) == n_cells
    )


def test_empty_box_returns_empty(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    got = zorder_layout.read_box(out, -10, -1, -10.0, -1.0)
    assert got.count() == 0


def test_morton_interleave_locality():
    """Morton ids of rank-adjacent points differ less than row-major ids do
    across the far dimension — sanity of the bit interleave itself."""
    xr = np.array([0, 1, 0, 1], dtype=np.int64)
    yr = np.array([0, 0, 1, 1], dtype=np.int64)
    z = zorder_layout._morton2(xr, yr, 2)
    assert list(z) == [0, 1, 2, 3]  # the 2x2 quad is contiguous
    # a point far in y lands far in z even when x matches
    far = zorder_layout._morton2(
        np.array([0], dtype=np.int64), np.array([3], dtype=np.int64), 2
    )[0]
    assert far > 3

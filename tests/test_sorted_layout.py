"""Range-clustered layout (sources/sorted_layout.py): pruning really
prunes, results are exact, manifest stats are true."""

from __future__ import annotations

import glob

import pandas as pd
import ray.data as rd

from simple_content_ocr_ray.sources import sorted_layout

SF = "/root/testdata/sf0.001"
N_RANGES = 8


def _layout(tmpdir: str) -> str:
    out = f"{tmpdir}/orders_by_price"
    ds = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    ranges = sorted_layout.write_sorted(ds, out, "o_totalprice", N_RANGES)
    assert 1 < len(ranges) <= N_RANGES
    return out


def test_write_sorted_manifest_is_exact(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    import json, os

    man = json.load(open(os.path.join(out, sorted_layout.MANIFEST_NAME)))
    assert sum(r["n_rows"] for r in man["ranges"]) == len(orders)
    for r in man["ranges"]:
        part = pd.read_parquet(f"{out}/range_id={r['range_id']}")
        assert part["o_totalprice"].min() == r["lo"]
        assert part["o_totalprice"].max() == r["hi"]
        assert len(part) == r["n_rows"]
    # ranges are non-overlapping in key space (contiguous clustering)
    rs = sorted(man["ranges"], key=lambda r: r["lo"])
    for a, b in zip(rs, rs[1:]):
        assert a["hi"] <= b["lo"]


def test_read_range_exact_and_pruned(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    lo, hi = orders["o_totalprice"].quantile([0.4, 0.55]).tolist()
    got = (
        sorted_layout.read_range(out, lo, hi)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = (
        orders[(orders["o_totalprice"] >= lo) & (orders["o_totalprice"] <= hi)]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["o_orderkey", "o_totalprice"]], exp)
    # a narrow query touches strictly fewer ranges than exist
    n_total = len(glob.glob(f"{out}/range_id=*"))
    assert sorted_layout.ranges_scanned(out, lo, hi) < n_total


def test_read_range_empty_window(ray_session, tmp_path):
    out = _layout(str(tmp_path))
    ds = sorted_layout.read_range(out, -2.0, -1.0)
    assert ds.count() == 0
    assert sorted_layout.ranges_scanned(out, -2.0, -1.0) == 0


def test_cdx_prefix_scan_prunes_ranges(ray_session):
    """The SURT prefix lookup opens strictly fewer ranges than the layout
    holds (string cut points work), and pruning does not change the rows."""
    import json
    import os

    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract_queries import (
        CDX_SCAN_HOST,
        _cdx_rows,
        cdx_prefix_scan,
    )
    from simple_content_ocr_ray.sources.sorted_layout import MANIFEST_NAME, ranges_scanned

    sf = "/root/testdata/sf0.001"
    out = cdx_prefix_scan(sf)
    assert len(out) > 0
    assert out["surt_key"].str.startswith(f"example,site{CDX_SCAN_HOST})").all()

    # brute force over the full capture table
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    full = _cdx_rows(docs)
    exp = full[full["surt_key"].str.startswith(f"example,site{CDX_SCAN_HOST})")]
    assert sorted(out["url"]) == sorted(exp["url"])

    # pruning: fewer ranges touched than the layout has
    from simple_content_ocr_ray.pipelines.extract_queries import _cdx_layout_dir

    layout = _cdx_layout_dir(sf)
    with open(os.path.join(layout, MANIFEST_NAME)) as f:
        n_total = len(json.load(f)["ranges"])
    prefix = f"example,site{CDX_SCAN_HOST})"
    assert ranges_scanned(layout, prefix, prefix + "\x7f") < n_total

"""Dataset.stats() structured parsing (r4, functions/stats_report.py)."""

from simple_content_ocr_ray.functions.stats_report import (
    bottleneck_report,
    parse_stats,
)

SAMPLE = """Operator 1 ReadRange->MapBatches(f): 8 tasks executed, 8 blocks produced in 0.55s
* Remote wall time: 39.81ms min, 58.57ms max, 46.89ms mean, 375.15ms total
* Remote cpu time: 32.17ms min, 52.58ms max, 46.13ms mean, 369.03ms total
* UDF time: 18.79ms min, 36.01ms max, 22.83ms mean, 182.6ms total
* Peak heap memory usage (MiB): 92.3 min, 93.85 max, 93 mean
* Output num rows per block: 6250 min, 6250 max, 6250 mean, 50000 total
* Output size bytes per block: 50000 min, 50000 max, 50000 mean, 400000 total

Operator 2 Write: 4 tasks executed, 4 blocks produced in 1.25s
* Remote wall time: 100ms min, 200ms max, 150ms mean, 600ms total
* UDF time: 10ms min, 20ms max, 15ms mean, 60ms total
* Output num rows per block: 100 min, 100 max, 100 mean, 400 total
"""


def test_parse_stats_rows_and_units():
    df = parse_stats(SAMPLE)
    assert len(df) == 2
    r = df.iloc[0]
    assert r["operator"] == "ReadRange->MapBatches(f)"
    assert r["n_tasks"] == 8 and r["n_blocks"] == 8
    assert abs(r["wall_s"] - 0.55) < 1e-9
    assert abs(r["remote_wall_s"] - 0.37515) < 1e-9
    assert abs(r["udf_s"] - 0.1826) < 1e-9
    assert r["rows"] == 50000 and r["bytes_out"] == 400000
    assert abs(r["peak_heap_mib"] - 93.85) < 1e-9
    assert abs(r["udf_frac"] - 0.1826 / 0.37515) < 1e-6
    # second operator has no cpu/bytes lines → NaN/None, not a crash
    r2 = df.iloc[1]
    assert r2["remote_cpu_s"] != r2["remote_cpu_s"]  # NaN
    assert r2["bytes_out"] != r2["bytes_out"]  # None → NaN in the column


def test_bottleneck_report_ranks_and_classifies():
    rep = bottleneck_report(SAMPLE, top=2)
    assert list(rep["operator"]) == ["Write", "ReadRange->MapBatches(f)"]
    assert abs(rep["wall_share"].sum() - 1.0) < 1e-6
    assert rep.iloc[0]["dominated_by"] == "framework/io"  # udf 60/600 = 0.1


def test_parse_real_pipeline_stats(ray_session):
    import ray.data as rd

    ds = rd.range(50_000).map_batches(lambda b: b).materialize()
    df = parse_stats(ds.stats())
    assert len(df) >= 1
    assert df["rows"].iloc[-1] == 50_000
    assert (df["wall_s"] > 0).all()


def test_empty_input():
    assert parse_stats("").empty
    assert bottleneck_report("").empty

"""Structured parsing of ``Dataset.stats()`` — the observability loop.

Tuning a Ray Data pipeline is "read ``ds.stats()``, find the stage whose
wall time is not useful compute, fix it, repeat". The stats text is meant
for eyeballs; this module turns it into a DataFrame so the loop can be
automated: per-operator wall/UDF/CPU time, rows, bytes, task counts, peak
heap — plus derived ratios (``udf_frac`` = UDF share of remote wall time,
``rows_per_s``) and the pipeline-level bottleneck ranking
(``bottleneck_report``). Used by tests and ad-hoc tuning sessions; the
format is pinned to the vendored Ray (2.49) and the parser is tolerant —
unknown lines are ignored, missing metrics become NaN, so a Ray upgrade
degrades to fewer columns, never a crash.
"""

from __future__ import annotations

import re

import pandas as pd

__all__ = ["parse_stats", "bottleneck_report"]

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (\d+) tasks executed, (\d+) blocks produced "
    r"in ([0-9.]+)s",
    re.M,
)
_TOTAL_RE = re.compile(
    r"^\* (Remote wall time|Remote cpu time|UDF time): .*?([0-9.]+)(ms|s|us)"
    r" total",
    re.M,
)
_ROWS_RE = re.compile(
    r"^\* Output num rows per block: .*?(\d+) total", re.M
)
_BYTES_RE = re.compile(
    r"^\* Output size bytes per block: .*?(\d+) total", re.M
)
_HEAP_RE = re.compile(
    r"^\* Peak heap memory usage \(MiB\): .*?([0-9.]+) max", re.M
)

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def parse_stats(stats_text: str) -> pd.DataFrame:
    """``Dataset.stats()`` text → one row per operator with columns
    (op_index, operator, n_tasks, n_blocks, wall_s, remote_wall_s,
    remote_cpu_s, udf_s, rows, bytes_out, peak_heap_mib, udf_frac,
    rows_per_s)."""
    chunks: list[tuple[re.Match, int, int]] = []
    ops = list(_OP_RE.finditer(stats_text))
    for i, m in enumerate(ops):
        end = ops[i + 1].start() if i + 1 < len(ops) else len(stats_text)
        chunks.append((m, m.end(), end))
    rows = []
    for m, start, end in chunks:
        body = stats_text[start:end]
        metrics: dict[str, float] = {}
        for tm in _TOTAL_RE.finditer(body):
            metrics[tm.group(1)] = float(tm.group(2)) * _UNIT[tm.group(3)]
        rmatch = _ROWS_RE.search(body)
        bmatch = _BYTES_RE.search(body)
        hmatch = _HEAP_RE.search(body)
        wall = float(m.group(5))
        udf = metrics.get("UDF time", float("nan"))
        rwall = metrics.get("Remote wall time", float("nan"))
        nrows = int(rmatch.group(1)) if rmatch else None
        rows.append(
            {
                "op_index": int(m.group(1)),
                "operator": m.group(2),
                "n_tasks": int(m.group(3)),
                "n_blocks": int(m.group(4)),
                "wall_s": wall,
                "remote_wall_s": rwall,
                "remote_cpu_s": metrics.get("Remote cpu time", float("nan")),
                "udf_s": udf,
                "rows": nrows,
                "bytes_out": int(bmatch.group(1)) if bmatch else None,
                "peak_heap_mib": float(hmatch.group(1)) if hmatch else None,
                "udf_frac": (udf / rwall) if rwall and rwall == rwall else float("nan"),
                "rows_per_s": (nrows / wall) if nrows and wall else float("nan"),
            }
        )
    return pd.DataFrame(rows)


def bottleneck_report(stats_text: str, top: int = 3) -> pd.DataFrame:
    """The operators to look at first: ranked by wall seconds, with the
    share of pipeline wall time and whether the time is UDF-dominated
    (your code) or framework/IO-dominated (batching, (de)serialization,
    shuffle)."""
    df = parse_stats(stats_text)
    if df.empty:
        return df
    total = df["wall_s"].sum()
    df = df.sort_values("wall_s", ascending=False).head(top).copy()
    df["wall_share"] = (df["wall_s"] / total).round(3)
    df["dominated_by"] = [
        "udf" if f == f and f >= 0.5 else "framework/io"
        for f in df["udf_frac"]
    ]
    return df[
        ["operator", "wall_s", "wall_share", "udf_frac", "dominated_by",
         "n_tasks", "rows"]
    ].reset_index(drop=True)

"""Small-file compaction — the table-maintenance pass every long-running
ingestion needs: crawl partitions land as many small parquet files (one per
task/partition flush), and small files poison later reads (per-file open
cost, tiny row groups, no column-chunk locality).

``compact_parquet`` rewrites a directory to ~``target_rows`` rows per file:
the output file count is computed from parquet FOOTERS only (no data pass),
then one streaming read → ``repartition(n)`` → write. Repartition here is
the cheap metadata variant (no shuffle: blocks are split/coalesced), so the
cost is one read + one write of the data — the floor for any rewrite.
Content is preserved row-for-row; only the file layout changes.
"""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import ray.data as rd


def dir_row_count(in_dir: str) -> int:
    """Total rows from footers only — no dataset execution."""
    total = 0
    for name in sorted(os.listdir(in_dir)):
        if name.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(in_dir, name)).num_rows
    return total


def compact_parquet(in_dir: str, out_dir: str, target_rows: int = 1_000_000) -> int:
    """Rewrite ``in_dir``'s parquet files into ≈``target_rows``-row files
    under ``out_dir``. Returns the output file count."""
    n = dir_row_count(in_dir)
    n_files = max(1, math.ceil(n / target_rows))
    ds = rd.read_parquet(in_dir)
    ds.repartition(n_files).write_parquet(out_dir)
    return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])

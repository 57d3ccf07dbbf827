"""Hash-bucketed Parquet layout: the pick-ONE-partitioning-key-and-reuse-it
primitive for 100 TB.

``write_bucketed(ds, out, key, n_buckets)`` routes every row to
``bucket=<hash(key) % n_buckets>/`` with one hive-partitioned distributed
write. Two tables bucketed with the same key and bucket count are
co-partitioned: a join can then proceed bucket-by-bucket
(``bucket_join_counts``) with NO shuffle — each bucket pair is an
independent task reading two small prefixes, which is how a repeated join
key amortizes its one-time shuffle across every later pipeline. The bucket
column is derived with the same splitmix64 hash on every worker, so the
layout is deterministic: re-running the write reproduces identical bucket
contents (partition-granular resume of bucketed OUTPUT is provided by
``state/manifest.py``, which wraps writes in atomic directory publishes).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.sketch import _splitmix64


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_splitmix64(keys.astype(np.uint64)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def write_bucketed(
    ds: rd.Dataset, out_dir: str, key: str, n_buckets: int = 16
) -> None:
    """Distributed hive-partitioned write of ``ds`` into
    ``out_dir/bucket=<i>/`` by ``hash(key) % n_buckets``."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = bucket_of(df[key].to_numpy(dtype="int64"), n_buckets)
        return df

    ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["bucket"]
    )


def read_bucket(out_dir: str, bucket: int, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(out_dir, f"bucket={bucket}"), columns=columns
    )


def bucket_join_counts(
    left_dir: str,
    right_dir: str,
    left_key: str,
    right_key: str,
    n_buckets: int,
) -> pd.DataFrame:
    """Shuffle-free equi-join row counts over two co-bucketed layouts: one
    independent Ray task per bucket merges the two bucket directories
    locally. Returns (bucket, n_joined) — the skeleton every bucket-local
    join/aggregate follows."""

    @ray.remote
    def one(bucket: int) -> tuple[int, int]:
        import pyarrow.parquet as pq

        lt = pq.read_table(
            os.path.join(left_dir, f"bucket={bucket}"), columns=[left_key]
        ).to_pandas()
        rt = pq.read_table(
            os.path.join(right_dir, f"bucket={bucket}"), columns=[right_key]
        ).to_pandas()
        joined = lt.merge(rt, left_on=left_key, right_on=right_key, how="inner")
        return bucket, len(joined)

    got = ray.get([one.remote(b) for b in range(n_buckets)])
    return pd.DataFrame(sorted(got), columns=["bucket", "n_joined"]).astype("int64")

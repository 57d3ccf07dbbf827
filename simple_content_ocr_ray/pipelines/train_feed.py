"""Training-feed surface: deterministic shuffled epochs over the extracted
corpus, streamed — the consumer side of the training-data pipeline.

A 100 TB corpus cannot be globally ``random_shuffle``-d per epoch (that is a
full all-to-all of every byte). The standard scale recipe, which this module
implements with pure Ray Data primitives:

* **block-order shuffle** (``randomize_block_order(seed=epoch)``) — permutes
  WHICH blocks stream first; zero data movement, only metadata;
* **local shuffle buffer** (``iter_batches(local_shuffle_buffer_size=...,
  local_shuffle_seed=...)``) — permutes rows within a bounded sliding
  window on the consumer; memory is capped by the buffer, not the corpus.

Together they give shuffle quality proportional to buffer/block size at
O(buffer) memory — the same trade tf.data / torchdata make. Determinism:
the same ``epoch`` yields byte-identical batch sequences across runs (seeds
derive from the epoch number); different epochs yield different orders.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
import ray.data as rd


def corpus_dataset(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=columns or ["doc_id", "text", "lang"],
    )


def epoch_batches(
    sf_dir: str,
    epoch: int,
    batch_size: int = 64,
    shuffle_buffer: int = 256,
    columns: list[str] | None = None,
) -> Iterator[pd.DataFrame]:
    """Stream one shuffled epoch as pandas batches. Deterministic in
    ``epoch``; memory bounded by ``shuffle_buffer`` rows per consumer."""
    ds = corpus_dataset(sf_dir, columns)
    ds = ds.randomize_block_order(seed=1_000_003 * (epoch + 1))
    yield from ds.iter_batches(
        batch_size=batch_size,
        batch_format="pandas",
        local_shuffle_buffer_size=shuffle_buffer,
        local_shuffle_seed=7_919 * (epoch + 1),
    )


def epoch_doc_order(sf_dir: str, epoch: int, batch_size: int = 64) -> np.ndarray:
    """The full doc_id visit order of one epoch (test/inspection helper)."""
    ids = [
        b["doc_id"].to_numpy()
        for b in epoch_batches(sf_dir, epoch, batch_size, columns=["doc_id"])
    ]
    return np.concatenate(ids) if ids else np.array([], dtype="int64")


# --------------------------------------------------------------------------
# Sequence packing (distributed prefix-scan over token counts)
# --------------------------------------------------------------------------

SEQ_BUDGET = 2048  # tokens per packed training sequence
PACK_BUCKET_W = 4096  # doc_ids per scan bucket (10^12 docs → ~2.4e8 buckets of
# 8-byte offsets ≈ 2 GB driver state; at that scale widen to 10^6-wide buckets)


def _docs_row_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def packed_sequences(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Pack documents (in doc_id order) into fixed token-budget training
    sequences: a doc belongs to the sequence in which it STARTS, i.e.
    ``seq_id = (running_token_sum_before_doc) // SEQ_BUDGET`` — the greedy
    contiguous packing rule trainers use to build fixed-length batches.
    Returns one row per sequence: doc span, doc count, token count.

    The global running sum is a distributed PREFIX SCAN, not a sort:

    1. pass 1 (column-pruned) computes per-bucket token sums via the
       partial+final grouped aggregate, where ``bucket = doc_id //
       PACK_BUCKET_W`` — output is bounded by the bucket count;
    2. the driver cumsums the bucket sums into per-bucket START OFFSETS
       (bounded driver state, broadcast once via ``ray.put``);
    3. pass 2 shuffles by bucket; each group sorts by doc_id locally,
       cumsums, adds its broadcast offset, and emits (seq_id, n_tokens)
       rows that feed a final bounded grouped aggregate.

    Two column-pruned passes over the text beat materializing an O(N)
    token-count table between them. Small corpora (footer row count ≤
    threshold) take one vectorized driver pass — paths asserted equal."""
    import pyarrow.compute as pc
    import ray

    from ..functions.agg import grouped_aggregate

    path = os.path.join(sf_dir, "documents.parquet")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype(
            {
                "seq_id": "int64",
                "n_docs": "int64",
                "total_tokens": "int64",
                "first_doc": "int64",
                "last_doc": "int64",
            }
        )
        return df.sort_values("seq_id").reset_index(drop=True)[
            ["seq_id", "n_docs", "total_tokens", "first_doc", "last_doc"]
        ]

    if _docs_row_count(sf_dir) <= small_threshold:
        t = rd.read_parquet(path, columns=["doc_id", "text"]).to_pandas()
        t = t.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n_tok = (t["text"].str.count(" ") + 1).to_numpy(dtype="int64")
        start = np.cumsum(n_tok) - n_tok
        out = pd.DataFrame({"seq_id": start // SEQ_BUDGET, "n_tok": n_tok,
                            "doc_id": t["doc_id"].to_numpy()})
        agg = out.groupby("seq_id", as_index=False).agg(
            n_docs=("n_tok", "size"), total_tokens=("n_tok", "sum"),
            first_doc=("doc_id", "min"), last_doc=("doc_id", "max"),
        )
        return finish(agg)

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": df["doc_id"].to_numpy() // PACK_BUCKET_W,
                "n_tok": (df["text"].str.count(" ") + 1).to_numpy(dtype="int64"),
            }
        )

    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    bsum = grouped_aggregate(
        docs, ["bucket"], {"tok": ("n_tok", "sum")}, prepare=prepare
    ).to_pandas().sort_values("bucket")
    cum = np.cumsum(bsum["tok"].to_numpy(dtype="int64"))
    offsets = dict(
        zip(bsum["bucket"].to_numpy().tolist(), np.concatenate([[0], cum[:-1]]).tolist())
    )
    off_ref = ray.put(offsets)

    def with_bucket(t):
        return t.append_column(
            "bucket",
            pc.cast(pc.floor(pc.divide(t["doc_id"], PACK_BUCKET_W)), "int64"),
        )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("doc_id", kind="mergesort")
        n_tok = (g["text"].str.count(" ") + 1).to_numpy(dtype="int64")
        start = off + np.cumsum(n_tok) - n_tok
        return pd.DataFrame(
            {
                "seq_id": start // SEQ_BUDGET,
                "n_tok": n_tok,
                "doc_id": g["doc_id"].to_numpy(),
            }
        )

    per_doc = (
        rd.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assign, batch_format="pandas")
    )
    agg = grouped_aggregate(
        per_doc,
        ["seq_id"],
        {
            "n_docs": (None, "count"),
            "total_tokens": ("n_tok", "sum"),
            "first_doc": ("doc_id", "min"),
            "last_doc": ("doc_id", "max"),
        },
    ).to_pandas()
    return finish(agg)


_PACKED_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT CAST((cum - n_tok) // {SEQ_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY 1
"""


QUERIES = {"packed_sequences": packed_sequences}
ORACLES = {"packed_sequences": _PACKED_SEQUENCES_SQL}

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

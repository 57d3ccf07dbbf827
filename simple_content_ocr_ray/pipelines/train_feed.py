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


def mixed_epoch_batches(
    sf_dir: str,
    epoch: int,
    weights: dict[str, int],
    batch_size: int = 64,
    shuffle_buffer: int = 256,
    columns: list[str] | None = None,
) -> Iterator[pd.DataFrame]:
    """Weighted INTERLEAVE of per-source streams — the tf.data
    ``sample_from_datasets`` analog: each source streams its own shuffled
    epoch (filter at the read, block-order shuffle, bounded local buffer),
    and the consumer weaves batches in a deterministic Bresenham schedule
    proportional to the integer ``weights`` (e.g. ``{"src1": 3, "src2": 1}``
    → 3 src1 batches per src2 batch, evenly spread, not in runs). A source
    that exhausts early drops out; the rest keep their relative cadence.
    Deterministic in ``epoch``; memory is one in-flight batch per source
    plus each stream's shuffle buffer — never a merged corpus."""
    cols = list(
        dict.fromkeys([*(columns or ["doc_id", "text", "lang"]), "source"])
    )
    streams = {}
    for src in sorted(weights):
        ds = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=cols
        ).filter(expr=f"source == '{src}'")
        ds = ds.randomize_block_order(seed=1_000_003 * (epoch + 1))
        streams[src] = iter(
            ds.iter_batches(
                batch_size=batch_size,
                batch_format="pandas",
                local_shuffle_buffer_size=shuffle_buffer,
                local_shuffle_seed=7_919 * (epoch + 1),
            )
        )
    # Bresenham cadence: at every step pick the live source whose emitted/
    # weight ratio is lowest (ties by name) — evenly interleaved by weight
    emitted = {s: 0 for s in streams}
    while streams:
        src = min(
            streams, key=lambda s: ((emitted[s] + 1) / weights[s], s)
        )
        try:
            yield next(streams[src])
            emitted[src] += 1
        except StopIteration:
            del streams[src]


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


def pack_sorted_df(df: pd.DataFrame, offset: int = 0) -> pd.DataFrame:
    """Assign seq_ids to a frame ALREADY sorted by doc_id, given the running
    token count before its first row. The single source of the packing rule
    (`seq_id = tokens-before-doc // SEQ_BUDGET`) — both the driver small
    path and the distributed scan call this."""
    n_tok = df["n_tok"].to_numpy(dtype="int64")
    start = offset + np.cumsum(n_tok) - n_tok
    out = df.copy()
    out["seq_id"] = start // SEQ_BUDGET
    return out


def pack_assign(slim: "rd.Dataset") -> "rd.Dataset":
    """Distributed prefix-scan seq assignment over a slim dataset with
    (doc_id, n_tok, *carry) columns: per-bucket token sums via the
    partial+final grouped aggregate, driver cumsum of the BOUNDED bucket
    offsets, one broadcast, then a bucket-keyed shuffle where each group
    sorts locally and calls ``pack_sorted_df`` with its offset. Returns the
    input rows + ``seq_id``; shared by ``packed_sequences`` and
    ``clean.curated_corpus``. The input is materialized (consumed twice:
    sums + assignment) — it is the slim projection, not the corpus."""
    import ray

    from ..functions.agg import grouped_aggregate

    slim = slim.map_batches(
        lambda df: df.assign(bucket=df["doc_id"].to_numpy() // PACK_BUCKET_W),
        batch_format="pandas",
    ).materialize()
    bsum = grouped_aggregate(
        slim, ["bucket"], {"tok": ("n_tok", "sum")}
    ).to_pandas().sort_values("bucket")
    cum = np.cumsum(bsum["tok"].to_numpy(dtype="int64"))
    offsets = dict(
        zip(bsum["bucket"].to_numpy().tolist(), np.concatenate([[0], cum[:-1]]).tolist())
    )
    off_ref = ray.put(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        return pack_sorted_df(g, off).drop(columns=["bucket"])

    return slim.groupby("bucket").map_groups(assign, batch_format="pandas")


def packed_sequences(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Pack documents (in doc_id order) into fixed token-budget training
    sequences: a doc belongs to the sequence in which it STARTS, i.e.
    ``seq_id = (running_token_sum_before_doc) // SEQ_BUDGET`` — the greedy
    contiguous packing rule trainers use to build fixed-length batches.
    Returns one row per sequence: doc span, doc count, token count.

    The global running sum is the distributed PREFIX SCAN of
    ``pack_assign`` (per-bucket token sums → driver cumsum of the bounded
    bucket offsets → one broadcast → bucket-keyed local assignment) over
    the slim (doc_id, n_tok) projection — 16 bytes/row regardless of text
    size. Small corpora (footer row count ≤ threshold) take one vectorized
    driver pass through the same ``pack_sorted_df`` rule — paths asserted
    equal (including a shrunken-bucket boundary test)."""
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

    def rollup(per_doc: pd.DataFrame) -> pd.DataFrame:
        return per_doc.groupby("seq_id", as_index=False).agg(
            n_docs=("n_tok", "size"), total_tokens=("n_tok", "sum"),
            first_doc=("doc_id", "min"), last_doc=("doc_id", "max"),
        )

    def slim_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tok": (df["text"].str.count(" ") + 1).to_numpy(dtype="int64"),
            }
        )

    if _docs_row_count(sf_dir) <= small_threshold:
        t = rd.read_parquet(path, columns=["doc_id", "text"]).to_pandas()
        slim = slim_batch(t).sort_values("doc_id", kind="mergesort").reset_index(
            drop=True
        )
        return finish(rollup(pack_sorted_df(slim)))

    slim = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        slim_batch, batch_format="pandas"
    )
    agg = grouped_aggregate(
        pack_assign(slim),
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


CHUNK_SIZE = 64  # words per chunk
CHUNK_STRIDE = 48  # step between chunk starts (CHUNK_SIZE - stride = overlap)


def doc_chunks(sf_dir: str) -> rd.Dataset:
    """Sliding-window document chunking — the context-window preparation
    step for RAG indexing / fixed-window training: each document becomes
    overlapping chunks of ``CHUNK_SIZE`` words every ``CHUNK_STRIDE`` words
    (the final chunk is shorter rather than padded; a doc at or under one
    window is exactly one chunk). Output rows carry the chunk's md5 instead
    of its text so the exploded table stays slim while remaining
    byte-exactly checkable.

    Embarrassingly parallel: a per-batch flat-map with no shuffle and no
    driver state; the result is returned as a streaming Dataset (at corpus
    scale it writes straight to partitioned parquet — roughly
    corpus_bytes × CHUNK_SIZE/CHUNK_STRIDE of text if text were carried,
    which is why only hashes leave the worker here)."""
    import hashlib
    import math

    docs = corpus_dataset(sf_dir, ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        idxs: list[int] = []
        nws: list[int] = []
        hs: list[str] = []
        for d, t in zip(df["doc_id"], df["text"]):
            w = t.split(" ")
            n = len(w)
            n_chunks = (
                1
                if n <= CHUNK_SIZE
                else math.ceil((n - CHUNK_SIZE) / CHUNK_STRIDE) + 1
            )
            for i in range(n_chunks):
                s = i * CHUNK_STRIDE
                e = min(s + CHUNK_SIZE, n)
                ids.append(int(d))
                idxs.append(i)
                nws.append(e - s)
                hs.append(hashlib.md5(" ".join(w[s:e]).encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "n_words": pd.Series(nws, dtype="int64"),
                "chunk_md5": hs,
            }
        )

    return docs.map_batches(explode, batch_format="pandas")


_DOC_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
), c AS (
  SELECT doc_id, w, n,
         unnest(range(0, CASE WHEN n <= {CHUNK_SIZE} THEN 1
                 ELSE CAST(CEIL((n - {CHUNK_SIZE})
                                / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1
                 END)) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx,
       CAST(LEAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)
            - chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS n_words,
       md5(array_to_string(
             w[chunk_idx * {CHUNK_STRIDE} + 1
               : LEAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)],
             ' ')) AS chunk_md5
FROM c
"""


SPLIT_FEED_CONSUMERS = 3


def split_feed(
    sf_dir: str, n_consumers: int = SPLIT_FEED_CONSUMERS, columns: list[str] | None = None
) -> list[list[pd.DataFrame]]:
    """Multi-consumer training feed via ``Dataset.streaming_split`` — the
    Ray Data API for feeding N trainer workers from ONE dataset without
    materializing per-worker copies: each consumer pulls a disjoint
    stream of blocks with backpressure, and the union is exactly one
    epoch. The iterators must be consumed CONCURRENTLY (the coordinator
    hands blocks to whichever consumer is ready), so each runs in its own
    thread here — in a real trainer each lives in its training worker.

    Returns the batches each consumer received; coverage guarantees
    (disjoint, complete) are asserted by ``split_feed_coverage`` and
    tests/test_train_feed.py."""
    import threading

    ds = corpus_dataset(sf_dir, columns or ["doc_id"])
    its = ds.streaming_split(n_consumers, equal=False)
    out: list[list[pd.DataFrame]] = [[] for _ in range(n_consumers)]

    def consume(i: int) -> None:
        for b in its[i].iter_batches(batch_size=256, batch_format="pandas"):
            out[i].append(b)

    threads = [threading.Thread(target=consume, args=(i,)) for i in range(n_consumers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return out


def split_feed_coverage(sf_dir: str) -> pd.DataFrame:
    """Driver-gate wrapper for ``split_feed``: one row asserting the
    multi-consumer stream is a PARTITION of the corpus — every doc seen
    exactly once across consumers, none twice, none missed. The row is
    deterministic even though the per-consumer assignment is not."""
    parts = split_feed(sf_dir)
    ids: list[np.ndarray] = [
        pd.concat(bs)["doc_id"].to_numpy() if bs else np.array([], dtype="int64")
        for bs in parts
    ]
    allids = np.concatenate(ids)
    return pd.DataFrame(
        {
            "n_consumers": pd.Series([len(parts)], dtype="int64"),
            "total_rows": pd.Series([len(allids)], dtype="int64"),
            "distinct_rows": pd.Series([len(np.unique(allids))], dtype="int64"),
        }
    )


_SPLIT_FEED_COVERAGE_SQL = f"""
SELECT CAST({SPLIT_FEED_CONSUMERS} AS BIGINT) AS n_consumers,
       CAST(COUNT(*) AS BIGINT) AS total_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS distinct_rows
FROM documents
"""


NTILE_BUCKETS = 4
BATCH_ROWS = 64
_LEN_BUCKET_W = 16  # value-range width of the distributed rank buckets


def length_bucketed_batches(
    sf_dir: str, small_threshold: int = 2_000_000
) -> pd.DataFrame:
    """Length-bucketed batching — the data-loader trick that minimizes
    padding waste: rank every document by (token length, doc_id), cut the
    ranking into NTILE_BUCKETS equal-size buckets (exact SQL ``ntile``
    semantics: earlier buckets absorb the remainder), and report each
    bucket's doc count, length range, and batch count at BATCH_ROWS rows
    per batch. min≈max within a bucket means near-zero padding.

    Scale shape: the global rank is a distributed prefix scan over VALUE-
    RANGE buckets (``n_tok // {w}`` — bucket order + in-bucket sort =
    total order): bounded per-bucket counts → driver cumsum → broadcast →
    one keyed shuffle where each run ranks locally (``map_sorted_runs``).
    Only the slim (doc_id, n_tok) projection moves. Small corpora take one
    driver sort through the same ntile rule — both paths tested equal."""
    import ray

    from ..functions.agg import grouped_aggregate, map_sorted_runs

    path = os.path.join(sf_dir, "documents.parquet")
    n_total = _docs_row_count(sf_dir)

    def ntile_of_rank(r: np.ndarray) -> np.ndarray:
        size_small, n_big = divmod(n_total, NTILE_BUCKETS)
        size_big = size_small + 1
        cut = n_big * size_big
        if size_small == 0:  # fewer docs than buckets
            return r + 1
        return (
            np.where(r < cut, r // size_big, n_big + (r - cut) // size_small)
            + 1
        )

    def slim_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tok": (df["text"].str.count(" ") + 1).to_numpy("int64"),
            }
        )

    def summarize(per_doc: pd.DataFrame) -> pd.DataFrame:
        out = (
            per_doc.groupby("bucket", as_index=False)
            .agg(
                n_docs=("n_tok", "size"),
                min_tokens=("n_tok", "min"),
                max_tokens=("n_tok", "max"),
            )
            .astype("int64")
        )
        out["n_batches"] = -(-out["n_docs"] // BATCH_ROWS)
        return out.sort_values("bucket").reset_index(drop=True)

    if n_total <= small_threshold:
        slim = slim_batch(
            rd.read_parquet(path, columns=["doc_id", "text"]).to_pandas()
        )
        slim = slim.sort_values(["n_tok", "doc_id"], kind="mergesort")
        slim["bucket"] = ntile_of_rank(np.arange(len(slim)))
        return summarize(slim)

    slim = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        slim_batch, batch_format="pandas"
    ).map_batches(
        lambda df: df.assign(vb=df["n_tok"].to_numpy() // _LEN_BUCKET_W),
        batch_format="pandas",
    ).materialize()
    counts = (
        grouped_aggregate(slim, ["vb"], {"n": (None, "count")})
        .to_pandas()
        .sort_values("vb")
    )
    cum = np.cumsum(counts["n"].to_numpy("int64"))
    offsets = dict(
        zip(
            counts["vb"].to_numpy().tolist(),
            np.concatenate([[0], cum[:-1]]).tolist(),
        )
    )
    off_ref = ray.put(offsets)

    def rank_runs(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["vb", "n_tok", "doc_id"], kind="mergesort")
        vb = df["vb"].to_numpy()
        starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
        lens = np.diff(np.r_[starts, len(vb)])
        base = np.repeat(
            np.array([off[int(v)] for v in vb[starts]], dtype="int64"), lens
        )
        within = np.arange(len(vb)) - np.repeat(starts, lens)
        df = df.assign(bucket=ntile_of_rank(base + within))
        return df[["n_tok", "bucket"]]

    ranked = map_sorted_runs(slim, "vb", rank_runs)
    agg = grouped_aggregate(
        ranked,
        ["bucket"],
        {
            "n_docs": (None, "count"),
            "min_tokens": ("n_tok", "min"),
            "max_tokens": ("n_tok", "max"),
        },
    ).to_pandas().astype("int64")
    agg["n_batches"] = -(-agg["n_docs"] // BATCH_ROWS)
    return agg.sort_values("bucket").reset_index(drop=True)


length_bucketed_batches.__doc__ = length_bucketed_batches.__doc__.format(
    w=_LEN_BUCKET_W
)

_LENGTH_BUCKETED_BATCHES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), b AS (
  SELECT n_tok, ntile({NTILE_BUCKETS}) OVER (ORDER BY n_tok, doc_id) AS bucket
  FROM t
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
       CAST(CEIL(COUNT(*) / {BATCH_ROWS}.0) AS BIGINT) AS n_batches
FROM b GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Padding-efficiency report: naive vs length-sorted batching
# --------------------------------------------------------------------------

PACK_REPORT_BATCH = 32


def packing_efficiency_report(
    sf_dir: str,
    b: int = PACK_REPORT_BATCH,
    small_threshold: int = 2_000_000,
) -> pd.DataFrame:
    """The WHY behind length bucketing, quantified: batch documents two
    ways — NAIVE arrival order (doc_id) vs LENGTH-SORTED (n_chars,
    doc_id) — pad every batch to its max, and report per strategy the
    real tokens, padded slots, and integer waste ppm.

    Scale shape (footer-gated, both paths tested equal): the naive
    strategy's batch id is ``doc_id // b`` directly (ids are contiguous —
    no rank needed); the sorted strategy gets its global rank from the
    SAME value-bucket distributed prefix scan as
    ``length_bucketed_batches`` (bounded per-value-bucket counts → driver
    cumsum → broadcast → in-run local ranks). Each strategy then reduces
    through one grouped (batch → max, n, sum) aggregate and a per-batch
    partial sum of (pad, real) — only the slim length column ever moves,
    and driver state is the bounded value-bucket histogram."""
    import ray

    from ..functions.agg import grouped_aggregate, map_sorted_runs

    path = os.path.join(sf_dir, "documents.parquet")
    n_total = _docs_row_count(sf_dir)

    def finish(real: int, pad: int, name: str) -> dict:
        return {
            "strategy": name,
            "real_tokens": int(real),
            "padded_tokens": int(pad),
            "waste_ppm": (1_000_000 * int(pad)) // (int(real) + int(pad)),
        }

    if n_total <= small_threshold:
        docs = rd.read_parquet(
            path, columns=["doc_id", "n_chars"]
        ).to_pandas()

        def waste(order: pd.DataFrame) -> tuple[int, int]:
            ln = order["n_chars"].to_numpy(dtype="int64")
            pad = 0
            for i in range(0, len(ln), b):
                chunk = ln[i : i + b]
                pad += int(chunk.max()) * len(chunk) - int(chunk.sum())
            return int(ln.sum()), pad

        rows = []
        for name, order in (
            ("naive", docs.sort_values("doc_id")),
            ("length_sorted", docs.sort_values(["n_chars", "doc_id"])),
        ):
            real, pad = waste(order.reset_index(drop=True))
            rows.append(finish(real, pad, name))
    else:
        slim = rd.read_parquet(path, columns=["doc_id", "n_chars"]).map_batches(
            lambda df: df.assign(
                vb=df["n_chars"].to_numpy(dtype="int64") // _LEN_BUCKET_W
            ),
            batch_format="pandas",
        ).materialize()

        def reduce_groups(grouped: rd.Dataset) -> tuple[int, int]:
            parts = grouped.map_batches(
                lambda d: pd.DataFrame(
                    {
                        "real": [int(d["s"].sum())],
                        "pad": [int((d["mx"] * d["n"] - d["s"]).sum())],
                    }
                ),
                batch_format="pandas",
            )
            return parts.sum("real"), parts.sum("pad")

        # naive: contiguous ids → batch id is pure arithmetic
        naive_groups = grouped_aggregate(
            slim,
            ["grp"],
            {"mx": ("n_chars", "max"), "n": (None, "count"),
             "s": ("n_chars", "sum")},
            prepare=lambda d: pd.DataFrame(
                {"grp": d["doc_id"].to_numpy(dtype="int64") // b,
                 "n_chars": d["n_chars"].to_numpy(dtype="int64")}
            ),
        )
        real_n, pad_n = reduce_groups(naive_groups)

        # sorted: distributed rank prefix scan (shared recipe)
        counts = (
            grouped_aggregate(slim, ["vb"], {"n": (None, "count")})
            .to_pandas()
            .sort_values("vb")
        )
        cum = np.cumsum(counts["n"].to_numpy("int64"))
        offsets = dict(
            zip(counts["vb"].to_numpy().tolist(),
                np.concatenate([[0], cum[:-1]]).tolist())
        )
        off_ref = ray.put(offsets)

        def rank_runs(df: pd.DataFrame) -> pd.DataFrame:
            off = ray.get(off_ref)
            df = df.sort_values(["vb", "n_chars", "doc_id"], kind="mergesort")
            vb = df["vb"].to_numpy()
            starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
            lens = np.diff(np.r_[starts, len(vb)])
            base = np.repeat(
                np.array([off[int(v)] for v in vb[starts]], dtype="int64"),
                lens,
            )
            within = np.arange(len(vb)) - np.repeat(starts, lens)
            return pd.DataFrame(
                {"grp": (base + within) // b,
                 "n_chars": df["n_chars"].to_numpy(dtype="int64")}
            )

        ranked = map_sorted_runs(slim, "vb", rank_runs)
        sorted_groups = grouped_aggregate(
            ranked,
            ["grp"],
            {"mx": ("n_chars", "max"), "n": (None, "count"),
             "s": ("n_chars", "sum")},
        )
        real_s, pad_s = reduce_groups(sorted_groups)
        rows = [finish(real_n, pad_n, "naive"),
                finish(real_s, pad_s, "length_sorted")]

    return pd.DataFrame(rows).astype(
        {"real_tokens": "int64", "padded_tokens": "int64", "waste_ppm": "int64"}
    ).sort_values("strategy").reset_index(drop=True)


_PACKING_EFFICIENCY_SQL = f"""
WITH naive AS (
  SELECT n_chars,
         (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {PACK_REPORT_BATCH}
           AS grp
  FROM documents
), srt AS (
  SELECT n_chars,
         (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1)
           // {PACK_REPORT_BATCH} AS grp
  FROM documents
), w AS (
  SELECT 'naive' AS strategy,
         CAST(SUM(s) AS BIGINT) AS real_tokens,
         CAST(SUM(mx * n - s) AS BIGINT) AS padded_tokens
  FROM (SELECT grp, MAX(n_chars) AS mx, COUNT(*) AS n, SUM(n_chars) AS s
        FROM naive GROUP BY grp)
  UNION ALL
  SELECT 'length_sorted',
         CAST(SUM(s) AS BIGINT),
         CAST(SUM(mx * n - s) AS BIGINT)
  FROM (SELECT grp, MAX(n_chars) AS mx, COUNT(*) AS n, SUM(n_chars) AS s
        FROM srt GROUP BY grp)
)
SELECT strategy, real_tokens, padded_tokens,
       CAST(1000000 * padded_tokens // (real_tokens + padded_tokens)
            AS BIGINT) AS waste_ppm
FROM w ORDER BY strategy
"""


QUERIES = {
    "length_bucketed_batches": length_bucketed_batches,
    "packing_efficiency_report": packing_efficiency_report,
    "packed_sequences": packed_sequences,
    "doc_chunks": doc_chunks,
    "split_feed_coverage": split_feed_coverage,
}
ORACLES = {
    "length_bucketed_batches": _LENGTH_BUCKETED_BATCHES_SQL,
    "packing_efficiency_report": _PACKING_EFFICIENCY_SQL,
    "packed_sequences": _PACKED_SEQUENCES_SQL,
    "doc_chunks": _DOC_CHUNKS_SQL,
    "split_feed_coverage": _SPLIT_FEED_COVERAGE_SQL,
}

"""C4-style corpus cleaning: the composed flagship pipeline a training-data
engine exists for — cheap per-doc quality filters FIRST (vectorized, no
shuffle), exact dedup LAST (one hash-keyed shuffle over the survivors).

Filter order matters at 100 TB: the quality pass drops rows before any
byte crosses the network, so the dedup shuffle only moves surviving
(hash, doc) pairs. The keeper rule (min doc_id per content hash) is decided
INSIDE the grouped shuffle — no keeper set is ever broadcast (it would be
O(corpus)).

Rules (mirroring C4/Gopher-style cleanups, SQL-oracled):
  * n_tokens >= 15            (too-short docs)
  * distinct_ratio >= 0.3     (degenerate repetition)
  * mean_token_len <= 8.0     (binary/gibberish junk)
  * exact-dup keeper only     (md5(text) group -> min doc_id)
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import pandas as pd
import ray.data as rd

MIN_TOKENS = 15
MIN_DISTINCT_RATIO = 0.3
MAX_MEAN_TOKEN_LEN = 8.0


def clean_corpus(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """Kept documents after quality filters + exact dedup: one row per
    keeper (doc_id, lang, n_tokens), sorted by doc_id.

    Keeper selection is a partial+final arg-min dedup: each batch keeps its
    min-doc_id row per content hash (bounded by distinct hashes per batch),
    and the final merge is adaptive — a single driver pass when the partials
    are small, a hash-keyed ``Dataset.join`` of the min-doc_id table against
    the partials when they are not. No ``map_groups`` (one Python call per
    group costs seconds at 10^4 groups, minutes at 10^7) and no keeper-set
    broadcast (O(corpus))."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"],
    )

    def quality(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
        mean_len = (df["n_chars"].astype("int64") - (n_tokens - 1)) / n_tokens
        keep = (
            (n_tokens >= MIN_TOKENS)
            & (n_distinct / n_tokens >= MIN_DISTINCT_RATIO)
            & (mean_len <= MAX_MEAN_TOKEN_LEN)
        )
        kept = df[keep]
        return pd.DataFrame(
            {
                "doc_id": kept["doc_id"].astype("int64"),
                "lang": kept["lang"],
                "n_tokens": n_tokens[keep],
                "text_hash": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in kept["text"]
                ],
            }
        )

    def local_keepers(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("doc_id", kind="mergesort").drop_duplicates(
            "text_hash", keep="first"
        )

    # quality filter + per-batch arg-min dedup fused in one stage
    partial = docs.map_batches(
        lambda df: local_keepers(quality(df)), batch_format="pandas"
    ).materialize()  # consumed twice below on the large path; bounded by
    # distinct hashes × batches, not corpus rows

    if partial.count() <= small_threshold:
        out = local_keepers(partial.to_pandas())
    else:
        mins = partial.groupby("text_hash").min("doc_id")
        # keeper rows = partials whose (text_hash, doc_id) matches the min —
        # a distributed hash join, no broadcast, no per-group python calls
        joined = partial.join(
            mins.map_batches(
                lambda df: df.rename(columns={"min(doc_id)": "keep_doc_id"}),
                batch_format="pandas",
            ),
            join_type="inner",
            num_partitions=16,
            on=("text_hash",),
        )
        out = joined.filter(expr="doc_id == keep_doc_id").to_pandas()
    out = out[["doc_id", "lang", "n_tokens"]].sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_tokens": "int64"})


_CLEAN_CORPUS_SQL = f"""
WITH q AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS distinct_ratio,
         (n_chars - (len(string_split(text, ' ')) - 1)) * 1.0
           / len(string_split(text, ' ')) AS mean_token_len
  FROM documents
), f AS (
  SELECT doc_id, lang, n_tokens, md5(text) AS h
  FROM q
  WHERE n_tokens >= {MIN_TOKENS}
    AND distinct_ratio >= {MIN_DISTINCT_RATIO}
    AND mean_token_len <= {MAX_MEAN_TOKEN_LEN}
), k AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk
  FROM f
)
SELECT doc_id, lang, n_tokens FROM k WHERE rk = 1
"""


QUERIES: dict[str, Callable[[str], object]] = {"clean_corpus": clean_corpus}
ORACLES: dict[str, str] = {"clean_corpus": _CLEAN_CORPUS_SQL}

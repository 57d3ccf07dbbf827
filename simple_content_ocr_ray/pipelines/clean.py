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


def clean_corpus(sf_dir: str) -> pd.DataFrame:
    """Kept documents after quality filters + exact dedup: one row per
    keeper (doc_id, lang, n_tokens), sorted by doc_id."""
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

    survivors = docs.map_batches(quality, batch_format="pandas")

    def keeper(g: pd.DataFrame) -> pd.DataFrame:
        first = g.sort_values("doc_id", kind="mergesort").head(1)
        return first[["doc_id", "lang", "n_tokens"]]

    kept = survivors.groupby("text_hash").map_groups(keeper, batch_format="pandas")
    out = kept.to_pandas().sort_values("doc_id").reset_index(drop=True)
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

"""Benchmark decontamination — the train/eval overlap scan every serious
training-data pipeline runs before shipping a corpus (the n-gram-overlap
method used for GPT-2/3-style dataset decontamination, public description
in the GPT-3 paper appendix C / PaLM §C).

The "benchmark" here is the SQL-derivable eval slice ``doc_id % 50 == 0``;
the operator flags every OTHER document sharing at least one word 4-gram
with any eval document and reports how many of its distinct 4-grams are
contaminated.

Scale topology: the eval side is tiny by definition (benchmarks are
thousands of docs, the corpus is billions), so its distinct shingle set is
built with one filtered pass + per-batch dedup and BROADCAST once
(``ray.put``); each training batch then counts membership with a sorted-
array ``np.isin`` — no shuffle at all. At extreme benchmark sizes the
broadcast set degrades to the Bloom prefilter (``agg.bloom_semi_prefilter``)
with exact verification of the survivors — same call shape.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

DECONTAM_N = 4
EVAL_MOD = 50


def _doc_shingles(text: str) -> np.ndarray:
    w = text.split(" ")
    if len(w) < DECONTAM_N:
        return np.array([text], dtype=object)
    return np.unique(
        [" ".join(w[i : i + DECONTAM_N]) for i in range(len(w) - DECONTAM_N + 1)]
    )


def contaminated_docs(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_hits) for every training doc sharing ≥1 word 4-gram with
    the eval slice (doc_id % 50 == 0)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def eval_shingles(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % EVAL_MOD == 0]
        if not len(sub):
            return pd.DataFrame({"g": pd.Series([], dtype=object)})
        sh = np.unique(np.concatenate([_doc_shingles(t) for t in sub["text"]]))
        return pd.DataFrame({"g": sh})

    eval_set = np.unique(
        docs.map_batches(eval_shingles, batch_format="pandas").to_pandas()["g"].to_numpy()
    )
    eval_ref = ray.put(eval_set)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        eval_set = ray.get(eval_ref)
        sub = df[df["doc_id"] % EVAL_MOD != 0]
        ids, hits = [], []
        for doc_id, text in zip(sub["doc_id"], sub["text"]):
            sh = _doc_shingles(text)
            n = int(np.isin(sh, eval_set, assume_unique=True).sum())
            if n:
                ids.append(int(doc_id))
                hits.append(n)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_hits": pd.Series(hits, dtype="int64"),
            }
        )

    out = docs.map_batches(scan, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_CONTAMINATED_DOCS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) < {DECONTAM_N} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(
                     range(1, len(w) - {DECONTAM_N - 2}),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                          || w[i+3]))
         END AS sh
  FROM t
), eval_sh AS (
  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % {EVAL_MOD} = 0
), train AS (
  SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % {EVAL_MOD} != 0
)
SELECT doc_id, COUNT(*) AS n_hits
FROM train JOIN eval_sh USING (g)
GROUP BY doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "contaminated_docs": contaminated_docs,
}
ORACLES: dict[str, str] = {
    "contaminated_docs": _CONTAMINATED_DOCS_SQL,
}

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


def _shingle_hashes64(text: str) -> np.ndarray:
    """Distinct word-4-gram shingles as int64 blake2b hashes (the Bloom path
    works on fixed-width keys, not strings; a ~2^-63 collision can only add
    one spurious n_hit — negligible against the oracle at any tested scale)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            >> 1
            for g in _doc_shingles(text)
        ),
        dtype=np.int64,
    )


def contaminated_docs_bloom(sf_dir: str, fp_rate: float = 0.01) -> pd.DataFrame:
    """Same contract as :func:`contaminated_docs`, via the oversized-benchmark
    topology: nothing broadcasts the full eval shingle set. Per-batch PARTIAL
    Bloom filters over the eval slice are OR-merged (driver holds ~10 bits
    per key, never the keys); the train side explodes to (doc_id, shingle)
    pairs pre-filtered through the broadcast Bloom (~fp_rate of non-matching
    pairs survive); the survivors get their EXACT hit count from a
    distributed hash join against the distinct eval-shingle dataset — Bloom
    false positives drop out there, so the output is exactly the
    `contaminated_docs` set."""
    from .agg import BloomFilter, grouped_aggregate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    # capacity from footer stats only: eval docs × a generous shingles/doc
    # bound (overestimating capacity just wastes bits, never correctness)
    capacity = max(1024, (n_rows // EVAL_MOD + 1) * 64)

    def eval_hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % EVAL_MOD == 0]
        if not len(sub):
            return pd.DataFrame({"g": pd.Series([], dtype="int64")})
        hs = [_shingle_hashes64(t) for t in sub["text"]]
        return pd.DataFrame({"g": np.unique(np.concatenate(hs))})

    eval_ds = grouped_aggregate(
        docs.map_batches(eval_hash_rows, batch_format="pandas"),
        ["g"],
        {"n": (None, "count")},
    ).select_columns(["g"]).materialize()

    def partial_bloom(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(capacity, fp_rate)
        bf.add_many(df["g"].to_numpy())
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    merged = BloomFilter(capacity, fp_rate)
    for b in eval_ds.map_batches(
        partial_bloom, batch_format="pandas"
    ).iter_batches(batch_format="pandas"):
        for raw in b["bits"]:
            merged.bits |= np.frombuffer(raw, dtype=np.uint8)
    bloom_ref = ray.put(merged)

    class TrainCandidates:
        def __init__(self) -> None:
            self.bf = ray.get(bloom_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["doc_id"] % EVAL_MOD != 0]
            ids, gs = [], []
            for doc_id, text in zip(sub["doc_id"], sub["text"]):
                hs = _shingle_hashes64(text)
                hit = hs[self.bf.contains_many(hs)]
                ids.extend([int(doc_id)] * len(hit))
                gs.extend(hit.tolist())
            return pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "g": pd.Series(gs, dtype="int64")}
            )

    cand = docs.map_batches(
        TrainCandidates, batch_format="pandas", concurrency=(1, 8)
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = cand.join(
        eval_ds, join_type="inner", num_partitions=max(2, min(8, cpus)), on=("g",)
    )
    out = (
        grouped_aggregate(joined, ["doc_id"], {"n_hits": (None, "count")})
        .to_pandas()
        .astype({"doc_id": "int64", "n_hits": "int64"})
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Fuzzy decontamination: exact word-3-gram Jaccard vs the eval slice
# --------------------------------------------------------------------------

def fuzzy_contaminated_docs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate decontamination — flag every training document whose
    exact word-3-gram Jaccard similarity to ANY eval document reaches the
    near-dup threshold (the fuzzy variant of :func:`contaminated_docs`:
    n-gram overlap catches verbatim leakage, this catches lightly edited
    eval copies — the PaLM/Llama-style "near-duplication with eval" scan).

    Corpus: the near-twin-augmented documents table (so eval docs provably
    have lightly-edited copies on the train side); eval slice = base docs
    with ``doc_id % EVAL_MOD == 0``. Output: one row per contaminated train
    doc — the best-matching eval doc (max Jaccard, ties to the smallest
    eval id), its similarity, and how many eval docs it matches.

    Scale topology: the eval side is a benchmark — tiny by definition — so
    its shingle-hash sets are collected once and BROADCAST (``ray.put``):
    a sorted (hash → eval_id) candidate index plus the per-doc sets for
    exact verification. Each training batch probes the index with two
    ``searchsorted`` calls per doc and exact-verifies only the candidate
    eval docs sharing ≥1 shingle — recall-complete (any pair with Jaccard
    > 0 shares a shingle) with zero shuffle. At extreme benchmark sizes the
    broadcast degrades to MinHash band buckets over the eval side (the
    ``dedup.minhash_lsh_pairs`` topology) or the Bloom prefilter of
    :func:`contaminated_docs_bloom` — same call shape.
    """
    from .dedup import (
        JACCARD_TAU,
        NEAR_TWIN_OFFSET,
        near_dup_corpus,
        shingle_hashes,
    )

    corpus = near_dup_corpus(sf_dir)

    def eval_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[(df["doc_id"] % EVAL_MOD == 0) & (df["doc_id"] < NEAR_TWIN_OFFSET)]
        ids, blobs = [], []
        for d, t in zip(sub["doc_id"], sub["text"]):
            if not t.strip():
                continue
            sh = np.sort(shingle_hashes(t))
            if len(sh):
                ids.append(int(d))
                blobs.append(sh.tobytes())
        return pd.DataFrame(
            {"eval_id": pd.Series(ids, dtype="int64"), "sh": blobs}
        )

    evals = corpus.map_batches(eval_rows, batch_format="pandas").to_pandas()
    eval_ids = evals["eval_id"].to_numpy()
    eval_sets = [np.frombuffer(b, dtype=np.int64) for b in evals["sh"]]
    all_h = (
        np.concatenate(eval_sets) if eval_sets else np.array([], dtype=np.int64)
    )
    all_eid = np.repeat(eval_ids, [len(s) for s in eval_sets]) if eval_sets else (
        np.array([], dtype=np.int64)
    )
    order = np.argsort(all_h, kind="stable")
    index_ref = ray.put(
        (all_h[order], all_eid[order], dict(zip(eval_ids.tolist(), eval_sets)))
    )

    class Scan:
        def __init__(self) -> None:
            self.all_h, self.all_eid, self.sets = ray.get(index_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sub = df[
                ~((df["doc_id"] % EVAL_MOD == 0) & (df["doc_id"] < NEAR_TWIN_OFFSET))
            ]
            ids: list[int] = []
            best_eids: list[int] = []
            best_js: list[float] = []
            n_matches: list[int] = []
            for doc_id, text in zip(sub["doc_id"], sub["text"]):
                if not text.strip():
                    continue
                sh = np.sort(shingle_hashes(text))
                if not len(sh):
                    continue
                lo = np.searchsorted(self.all_h, sh, side="left")
                hi = np.searchsorted(self.all_h, sh, side="right")
                m = hi > lo
                if not m.any():
                    continue
                cands = np.unique(
                    np.concatenate(
                        [self.all_eid[a:b] for a, b in zip(lo[m], hi[m])]
                    )
                )
                hits = []
                for eid in cands:
                    es = self.sets[int(eid)]
                    inter = np.intersect1d(sh, es, assume_unique=True).size
                    j = inter / (len(sh) + len(es) - inter)
                    if j >= JACCARD_TAU:
                        hits.append((j, int(eid)))
                if not hits:
                    continue
                best_j = max(h[0] for h in hits)
                ids.append(int(doc_id))
                best_eids.append(min(e for j, e in hits if j == best_j))
                best_js.append(best_j)
                n_matches.append(len(hits))
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "best_eval_id": pd.Series(best_eids, dtype="int64"),
                    "best_jaccard": pd.Series(best_js, dtype="float64"),
                    "n_eval_matches": pd.Series(n_matches, dtype="int64"),
                }
            )

    out = corpus.map_batches(Scan, batch_format="pandas", concurrency=(1, 8))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _fuzzy_contaminated_sql() -> str:
    from .dedup import JACCARD_TAU, MIN_TWIN_WORDS, NEAR_TWIN_OFFSET

    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
  UNION ALL
  SELECT doc_id + {NEAR_TWIN_OFFSET} AS doc_id,
         array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-2], ' ') AS text
  FROM documents
  WHERE doc_id % 5 = 0 AND len(string_split(text,' ')) >= {MIN_TWIN_WORDS}
), t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS sh
  FROM t
), ev AS (
  SELECT doc_id, sh FROM s
  WHERE doc_id % {EVAL_MOD} = 0 AND doc_id < {NEAR_TWIN_OFFSET}
), tr AS (
  SELECT doc_id, sh FROM s
  WHERE NOT (doc_id % {EVAL_MOD} = 0 AND doc_id < {NEAR_TWIN_OFFSET})
), pairs AS (
  SELECT tr.doc_id, ev.doc_id AS eval_id,
         len(list_intersect(tr.sh, ev.sh)) * 1.0
         / (len(tr.sh) + len(ev.sh) - len(list_intersect(tr.sh, ev.sh))) AS j
  FROM tr, ev
  WHERE len(list_intersect(tr.sh, ev.sh)) * 1.0
        / (len(tr.sh) + len(ev.sh) - len(list_intersect(tr.sh, ev.sh)))
        >= {JACCARD_TAU}
)
SELECT doc_id, eval_id AS best_eval_id, j AS best_jaccard, n_eval_matches
FROM (
  SELECT doc_id, eval_id, j,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_eval_matches,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY j DESC, eval_id) AS rn
  FROM pairs
) WHERE rn = 1
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "contaminated_docs": contaminated_docs,
    "contaminated_docs_bloom": contaminated_docs_bloom,
    "fuzzy_contaminated_docs": fuzzy_contaminated_docs,
}
ORACLES: dict[str, str] = {
    "contaminated_docs": _CONTAMINATED_DOCS_SQL,
    "contaminated_docs_bloom": _CONTAMINATED_DOCS_SQL,
    "fuzzy_contaminated_docs": _fuzzy_contaminated_sql(),
}

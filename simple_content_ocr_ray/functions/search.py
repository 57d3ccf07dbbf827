"""Lexical search / term-weighting operators over the ``documents`` corpus:
BM25 ranked retrieval and per-document TF-IDF keyword extraction.

The reference extracts text but never indexes it; a training-data pipeline
needs exactly these two to build quality filters ("does this doc actually
talk about X") and keyword metadata. Both are SQL-oracled.

Scale topology (100 TB):

* corpus statistics (N, avgdl, per-term df) are one-pass partial+final
  aggregates — the shuffle moves one (term, partial-df) row per batch;
* the query-term df map and the scalar stats are broadcast (``ray.put``),
  never joined: scoring is a stateless vectorized ``map_batches``;
* ranked retrieval uses local-top-k-then-final-top-k (no global sort);
* TF-IDF keyword extraction broadcasts the document-frequency vocabulary.
  That is the standard IR trade-off: vocabulary grows ~O(corpus^0.5)
  (Heaps' law) and is df-prunable, so it stays broadcastable long after the
  corpus itself does not; past that, the fallback is a (token)-keyed hash
  join of the exploded corpus against the df table — same partials, one
  more shuffle.

Tokenization is a split on single spaces, matching ``lang_top_tokens``'s
convention (corpus texts are single-space separated by construction).
"""

from __future__ import annotations

import math
import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import grouped_aggregate, topk

#: fixed retrieval query: two common terms + one rare term ("dup" appears
#: only in near-dup twin docs' vocabulary tail), so idf spread is exercised
BM25_QUERY = ("hash", "join", "dup")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
TFIDF_ROUND = 4


def _read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _explode(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_index, token) pairs for a batch plus per-row token counts."""
    toks = df["text"].str.split(" ")
    lens = toks.str.len().to_numpy()
    flat = np.concatenate(toks.to_numpy()) if len(df) else np.array([], dtype=object)
    rows = np.repeat(np.arange(len(df)), lens)
    return rows, flat, lens


def _corpus_stats(docs: rd.Dataset, terms: tuple[str, ...]) -> tuple[int, int, dict]:
    """One pass over the corpus → (N, total token count, df per query term).
    Partials are one row per batch — the driver merge is O(batches)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows, flat, lens = _explode(df)
        out = {"n_docs": [len(df)], "n_tokens": [int(lens.sum())]}
        for t in terms:
            hit = rows[flat == t]
            out[f"df_{t}"] = [int(np.unique(hit).size)]
        return pd.DataFrame(out)

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    n_tokens = int(parts["n_tokens"].sum())
    df_map = {t: int(parts[f"df_{t}"].sum()) for t in terms}
    return n_docs, n_tokens, df_map


def bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 documents by BM25(k1=1.2, b=0.75) for the fixed query
    ``hash join dup``; ties broken by doc_id. ``score`` is rounded to 4
    decimals; ranking/cut uses the raw double (identical arithmetic on both
    sides: integer tf/df/dl, one double division for avgdl)."""
    docs = _read_docs(sf_dir)
    n_docs, n_tokens, df_map = _corpus_stats(docs, BM25_QUERY)
    avgdl = n_tokens / n_docs
    idf = {
        t: math.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5) + 1.0)
        for t in BM25_QUERY
    }
    consts = ray.put((idf, avgdl))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idf, avgdl = ray.get(consts)
        rows, flat, lens = _explode(df)
        total = np.zeros(len(df))
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * lens / avgdl)
        for t, w in idf.items():
            tf = np.bincount(rows[flat == t], minlength=len(df)).astype("float64")
            total += w * (tf * (BM25_K1 + 1.0)) / (tf + norm)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "score": total})

    scored = docs.map_batches(score, batch_format="pandas")
    out = topk(scored, ["score", "doc_id"], BM25_TOPK, descending=[True, False])
    df = out.to_pandas()
    df["score"] = df["score"].round(TFIDF_ROUND)
    return df.astype({"doc_id": "int64"})


_BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
  SELECT COUNT(*) AS n, SUM(len(string_split(text, ' '))) / CAST(COUNT(*) AS
         DOUBLE) AS avgdl
  FROM documents
), q(term) AS (VALUES {", ".join(f"('{t}')" for t in BM25_QUERY)}),
df AS (
  SELECT q.term, COUNT(DISTINCT tok.doc_id) AS df
  FROM q LEFT JOIN tok ON tok.term = q.term GROUP BY q.term
), tf AS (
  SELECT tok.doc_id, tok.term, COUNT(*) AS tf
  FROM tok JOIN q ON q.term = tok.term GROUP BY 1, 2
), scored AS (
  SELECT dl.doc_id,
         SUM(COALESCE(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * ({BM25_K1} + 1.0))
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl /
                stats.avgdl)),
           0.0)) AS score
  FROM dl CROSS JOIN stats
  CROSS JOIN df
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = df.term
  GROUP BY dl.doc_id
)
SELECT doc_id, ROUND(score, {TFIDF_ROUND}) AS score
FROM scored ORDER BY scored.score DESC, doc_id LIMIT {BM25_TOPK}
"""


def tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per-document top TF-IDF term (tf × ln(N/df); ties broken by the
    lexically smallest term). The (term → df) vocabulary is built with a
    partial+final aggregate and broadcast to the scoring stage."""
    docs = _read_docs(sf_dir)

    def doc_terms(df: pd.DataFrame) -> pd.DataFrame:
        rows, flat, _ = _explode(df)
        pairs = pd.DataFrame({"row": rows, "term": flat})
        # per-doc distinct inside the batch, so partial df sums are exact
        # (each doc is one row, never split across batches)
        uniq = pairs.drop_duplicates()
        return pd.DataFrame({"term": uniq["term"].to_numpy()})

    df_tbl = grouped_aggregate(
        docs, ["term"], {"df": (None, "count")}, prepare=doc_terms
    ).to_pandas()
    n_docs = docs.count()
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype("int64"))))

    def best_term(df: pd.DataFrame) -> pd.DataFrame:
        df_map = ray.get(df_ref)
        rows, flat, _ = _explode(df)
        tf = (
            pd.DataFrame({"row": rows, "term": flat})
            .groupby(["row", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        dfv = tf["term"].map(df_map).to_numpy(dtype="float64")
        tf["tfidf"] = tf["tf"].to_numpy() * np.log(float(n_docs) / dfv)
        tf = tf.sort_values(
            ["row", "tfidf", "term"], ascending=[True, False, True], kind="mergesort"
        )
        best = tf.groupby("row", sort=False).head(1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[best["row"].to_numpy()],
                "term": best["term"].to_numpy(),
                "tfidf": best["tfidf"].round(TFIDF_ROUND).to_numpy(),
            }
        )

    out = docs.map_batches(best_term, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64"})


_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)
                                     DESC, tf.term) AS rk
  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
)
SELECT doc_id, term, ROUND(tfidf, {TFIDF_ROUND}) AS tfidf
FROM scored WHERE rk = 1
"""


# --------------------------------------------------------------------------
# Unigram language-model scoring (corpus-frequency perplexity proxy)
# --------------------------------------------------------------------------

def doc_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    add-one-smoothed unigram model — the classic cheap fluency/outlier
    score (a perplexity proxy without a neural LM): documents made of rare
    tokens score low.

    Same topology as TF-IDF: one partial+final pass builds (term, count)
    totals, the model (vocab-sized, df-prunable at corpus scale) is
    broadcast, and scoring is a stateless vectorized pass."""
    docs = _read_docs(sf_dir)

    def term_counts(df: pd.DataFrame) -> pd.DataFrame:
        _, flat, _ = _explode(df)
        return pd.DataFrame({"term": flat})

    counts = grouped_aggregate(
        docs, ["term"], {"n": (None, "count")}, prepare=term_counts
    ).to_pandas()
    total = int(counts["n"].sum())
    vocab = len(counts)
    model_ref = ray.put(dict(zip(counts["term"], counts["n"].astype("int64"))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(model_ref)
        rows, flat, lens = _explode(df)
        tok_n = pd.Series(flat).map(model).fillna(0).to_numpy(dtype="float64")
        logp = np.log((tok_n + 1.0) / (total + vocab))
        sums = np.bincount(rows, weights=logp, minlength=len(df))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "mean_logprob": np.round(sums / lens, TFIDF_ROUND),
            }
        )

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64"}).sort_values("doc_id").reset_index(drop=True)


_UNIGRAM_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), c AS (
  SELECT term, COUNT(*) AS n FROM tok GROUP BY 1
), consts AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS vocab
  FROM c
)
SELECT tok.doc_id,
       ROUND(AVG(ln((c.n + 1.0) / (consts.total + consts.vocab))),
             {TFIDF_ROUND}) AS mean_logprob
FROM tok JOIN c USING (term) CROSS JOIN consts
GROUP BY tok.doc_id
"""


# --------------------------------------------------------------------------
# PMI collocations (document-level co-occurrence mining)
# --------------------------------------------------------------------------

PMI_MIN_CO = 50
PMI_TOPK = 20


def top_collocations(sf_dir: str) -> pd.DataFrame:
    """Top-20 token pairs by document-level PMI (ln(n·c(a,b)/(df(a)·df(b))),
    co-occurrence ≥ 50 docs) — collocation mining over the corpus.

    Pair explosion happens INSIDE the partial-aggregate stage (each batch
    emits one (a, b, partial-count) row per distinct in-batch pair), so the
    shuffle moves pair partials, never per-doc pair lists. The df table is
    broadcast for the final PMI computation over the (already small)
    frequent-pair set. At corpus scale the quadratic per-doc pair blow-up
    is bounded by per-doc distinct-token counts (docs are length-capped
    upstream by the cleaning pipeline)."""
    docs = _read_docs(sf_dir)

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        # ragged-triu vectorized pair explosion (same unranking as
        # dedup._pairs_from_df): one lexsort over (row, term-code), group
        # sizes via bincount, closed-form rank→(i, j) — no per-doc python
        # loop. Terms are factorized to SORTED int codes first so the pair
        # counting runs on a single packed int64 key, never on strings
        # (65k-doc batches × ~800 pairs each = tens of millions of rows per
        # batch; string groupbys there cost minutes, int bincounts cost ms).
        rows, flat, _ = _explode(df)
        uniq = pd.DataFrame({"row": rows, "term": flat}).drop_duplicates()
        codes_raw, vocab = pd.factorize(uniq["term"], sort=True)
        codes = codes_raw.astype(np.int64)
        order = np.lexsort((codes, uniq["row"].to_numpy()))
        t = codes[order]
        g = uniq["row"].to_numpy()[order]
        counts = np.bincount(g, minlength=len(df))
        starts = np.cumsum(counts) - counts
        P = counts * (counts - 1) // 2
        total = int(P.sum())
        if total == 0:
            return pd.DataFrame({"a": [], "b": [], "c": []})
        nz = P > 0
        Pg, Sg = P[nz], starts[nz]
        gix = np.repeat(np.arange(len(Pg)), Pg)
        r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(Pg) - Pg, Pg)
        j = np.floor((1.0 + np.sqrt(1.0 + 8.0 * r)) / 2.0).astype(np.int64)
        j[j * (j - 1) // 2 > r] -= 1
        j[(j + 1) * j // 2 <= r] += 1
        i = r - j * (j - 1) // 2
        # codes are sorted within each row group, so a-code < b-code always
        key = (t[Sg[gix] + i] << np.int64(32)) | t[Sg[gix] + j]
        kc = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "a": vocab.take(kc[0] >> np.int64(32)),
                "b": vocab.take(kc[0] & np.int64(0xFFFFFFFF)),
                "c": kc[1].astype("int64"),
            }
        )

    co = grouped_aggregate(
        docs, ["a", "b"], {"c": ("c", "sum")}, prepare=pair_partials, batch_size=4096
    ).to_pandas()
    co = co[co["c"] >= PMI_MIN_CO]

    def doc_terms(df: pd.DataFrame) -> pd.DataFrame:
        rows, flat, _ = _explode(df)
        uniq = pd.DataFrame({"row": rows, "term": flat}).drop_duplicates()
        return pd.DataFrame({"term": uniq["term"].to_numpy()})

    df_tbl = grouped_aggregate(
        docs, ["term"], {"df": (None, "count")}, prepare=doc_terms
    ).to_pandas()
    n_docs = docs.count()
    dfm = dict(zip(df_tbl["term"], df_tbl["df"].astype("float64")))
    pmi = np.log(
        float(n_docs)
        * co["c"].astype("float64").to_numpy()
        / (co["a"].map(dfm).to_numpy() * co["b"].map(dfm).to_numpy())
    )
    out = pd.DataFrame(
        {
            "a": co["a"],
            "b": co["b"],
            "n_co": co["c"].astype("int64"),
            "raw": pmi,  # rank/cut on the raw double (same as the oracle)
            "pmi": np.round(pmi, TFIDF_ROUND),
        }
    )
    out = out.sort_values(
        ["raw", "a", "b"], ascending=[False, True, True], kind="mergesort"
    ).head(PMI_TOPK)
    return out.drop(columns=["raw"]).reset_index(drop=True)


_TOP_COLLOCATIONS_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM tok
), df AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tok GROUP BY 1
), co AS (
  SELECT x.term AS a, y.term AS b, COUNT(*) AS c
  FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND x.term < y.term
  GROUP BY 1, 2
), scored AS (
  SELECT co.a, co.b, co.c AS n_co,
         ROUND(ln(n.n * co.c / (da.df * db.df)), {TFIDF_ROUND}) AS pmi,
         ln(n.n * co.c / (da.df * db.df)) AS raw
  FROM co JOIN df da ON da.term = co.a
          JOIN df db ON db.term = co.b
          CROSS JOIN n
  WHERE co.c >= {PMI_MIN_CO}
)
SELECT a, b, n_co, pmi FROM scored
ORDER BY raw DESC, a, b LIMIT {PMI_TOPK}
"""


def source_lm_quality(sf_dir: str) -> pd.DataFrame:
    """Per-SOURCE fluency under the corpus's own add-one unigram LM — the
    rollup of :func:`doc_unigram_logprob` a mixture review reads: a source
    whose mean token log-probability sits far below the corpus is feeding
    rare-token noise (boilerplate, encoding damage, wrong language).

    Same topology as the per-doc scorer — one partial+final (term, count)
    pass builds the model, broadcast once — but the scoring pass emits ONE
    (source, Σlogp, n_tokens) partial per batch instead of per-doc rows, so
    the second pass's output is bounded by |sources| × batches."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def term_counts(df: pd.DataFrame) -> pd.DataFrame:
        _, flat, _ = _explode(df)
        return pd.DataFrame({"term": flat})

    counts = grouped_aggregate(
        docs, ["term"], {"n": (None, "count")}, prepare=term_counts
    ).to_pandas()
    total = int(counts["n"].sum())
    vocab = len(counts)
    model_ref = ray.put(dict(zip(counts["term"], counts["n"].astype("int64"))))

    def score_rows(df: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(model_ref)
        rows, flat, lens = _explode(df)
        tok_n = pd.Series(flat).map(model).fillna(0).to_numpy(dtype="float64")
        logp = np.log((tok_n + 1.0) / (total + vocab))
        sums = np.bincount(rows, weights=logp, minlength=len(df))
        return pd.DataFrame(
            {
                "source": df["source"],
                "slp": sums,
                "nt": pd.Series(lens, dtype="int64"),
            }
        )

    agg = grouped_aggregate(
        docs,
        ["source"],
        {"sum_logp": ("slp", "sum"), "n_tokens": ("nt", "sum")},
        prepare=score_rows,
    ).to_pandas()
    out = pd.DataFrame(
        {
            "source": agg["source"],
            "n_tokens": agg["n_tokens"].astype("int64"),
            "mean_logprob": np.round(
                agg["sum_logp"].to_numpy() / agg["n_tokens"].to_numpy(),
                TFIDF_ROUND,
            ),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


_SOURCE_LM_QUALITY_SQL = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), c AS (
  SELECT term, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
  ) GROUP BY 1
), consts AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS vocab
  FROM c
)
SELECT tok.source, COUNT(*) AS n_tokens,
       ROUND(AVG(ln((c.n + 1.0) / (consts.total + consts.vocab))),
             {TFIDF_ROUND}) AS mean_logprob
FROM tok JOIN c USING (term) CROSS JOIN consts
GROUP BY tok.source
"""


# --------------------------------------------------------------------------
# Bigram LM fluency (Laplace-smoothed conditional bigram model)
# --------------------------------------------------------------------------

BIGRAM_ROUND = 6


def doc_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Mean BIGRAM log-probability per document under the corpus's own
    Laplace-smoothed conditional model P(w2 | w1) = (c(w1,w2) + 1) /
    (c(w1·) + V) — the order-sensitive upgrade of
    :func:`doc_unigram_logprob`: shuffled or templated word salad scores low
    even when its unigram profile looks fluent (the KenLM-style filter of
    CCNet-family pipelines, without the neural LM).

    Topology: one partial+final pass builds the (w1, w2) bigram-count table
    (bounded by OBSERVED bigrams, not V²); prefix totals c(w1·) derive from
    it by a driver-side rollup of the already-small table; vocabulary size
    comes from the same term pass the unigram model uses. Both model maps
    are broadcast once (``ray.put``) and scoring is a stateless vectorized
    pass — no shuffle touches the corpus. At open-web scale the bigram
    table is count-prunable (drop hapax bigrams) before broadcast; kept
    exact here because the oracle mirrors the unpruned model."""
    docs = _read_docs(sf_dir)

    def bigram_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows, flat, _ = _explode(df)
        if len(flat) < 2:
            return pd.DataFrame({"w1": [], "w2": []})
        adj = rows[:-1] == rows[1:]  # consecutive tokens of the SAME doc
        return pd.DataFrame({"w1": flat[:-1][adj], "w2": flat[1:][adj]})

    bc = grouped_aggregate(
        docs, ["w1", "w2"], {"c": (None, "count")}, prepare=bigram_rows
    ).to_pandas()
    prefix = bc.groupby("w1", sort=False)["c"].sum()

    def term_rows(df: pd.DataFrame) -> pd.DataFrame:
        _, flat, _ = _explode(df)
        return pd.DataFrame({"term": flat})

    vocab = len(
        grouped_aggregate(
            docs, ["term"], {"n": (None, "count")}, prepare=term_rows
        ).to_pandas()
    )
    bc_ref = ray.put(
        dict(zip(zip(bc["w1"], bc["w2"]), bc["c"].astype("int64")))
    )
    pc_ref = ray.put(prefix.astype("int64").to_dict())

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bcm, pcm = ray.get(bc_ref), ray.get(pc_ref)
        rows, flat, _ = _explode(df)
        adj = rows[:-1] == rows[1:]
        r = rows[:-1][adj]
        w1, w2 = flat[:-1][adj], flat[1:][adj]
        c = np.fromiter(
            (bcm.get((a, b), 0) for a, b in zip(w1, w2)),
            dtype="float64",
            count=len(w1),
        )
        p = np.fromiter(
            (pcm.get(a, 0) for a in w1), dtype="float64", count=len(w1)
        )
        logp = np.log((c + 1.0) / (p + float(vocab)))
        sums = np.bincount(r, weights=logp, minlength=len(df))
        n_big = np.bincount(r, minlength=len(df))
        keep = n_big > 0  # single-token docs have no bigram positions
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep],
                "mean_logprob": np.round(
                    sums[keep] / n_big[keep], BIGRAM_ROUND
                ),
            }
        )

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64"}).sort_values("doc_id").reset_index(drop=True)


_BIGRAM_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
big AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2),
pc AS (SELECT w1, SUM(c) AS p FROM bc GROUP BY 1),
v AS (
  SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS vocab
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
)
SELECT big.doc_id,
       ROUND(AVG(ln((bc.c + 1.0) / (pc.p + v.vocab))), {BIGRAM_ROUND})
         AS mean_logprob
FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v
GROUP BY big.doc_id
ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "doc_bigram_logprob": doc_bigram_logprob,
    "bm25_topk": bm25_topk,
    "source_lm_quality": source_lm_quality,
    "tfidf_top_terms": tfidf_top_terms,
    "doc_unigram_logprob": doc_unigram_logprob,
    "top_collocations": top_collocations,
}
ORACLES: dict[str, str] = {
    "doc_bigram_logprob": _BIGRAM_SQL,
    "bm25_topk": _BM25_SQL,
    "source_lm_quality": _SOURCE_LM_QUALITY_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "doc_unigram_logprob": _UNIGRAM_SQL,
    "top_collocations": _TOP_COLLOCATIONS_SQL,
}

"""Repetition / frequency-structure operators — the Gopher-style "repetitive
document" signals (Rae et al. 2021, §A1.1 public filtering rules) and the
corpus frequency diagnostics (Zipf frequency-of-frequencies) a training-data
pipeline runs before fixing quality thresholds, plus chunk-granular exact
dedup (the paragraph-dedup analog of C4/RefinedWeb over a table whose texts
have no newlines: fixed 10-word chunks stand in for paragraphs).

All four are SQL-oracle-checked. Word semantics mirror DuckDB's
``string_split(text, ' ')`` exactly (NOT python ``str.split()`` — the no-arg
form collapses runs of whitespace, the SQL form does not).

Scale topology:

* ``doc_repetition_stats`` / ``doc_word_entropy`` — embarrassingly parallel
  map_batches; nothing shuffles.
* ``chunk_dedup`` — one shuffle keyed by chunk hash, pre-shrunk per batch
  (the same partial-aggregate shape as exact doc dedup: the shuffle moves
  one row per distinct chunk per batch, not one per chunk occurrence).
* ``token_freq_of_freqs`` — two grouped aggregates; the first is
  pre-aggregated per batch so the shuffle moves per-batch (token, count)
  partials bounded by vocabulary × batches, the second runs over the
  count-of-counts (tiny by construction).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import grouped_aggregate, round_half_away
from .dedup import _EXACT_CORPUS_SQL, exact_dup_corpus

CHUNK_WORDS = 10
#: composite keeper key stride: doc_id * STRIDE + chunk_idx must be unique,
#: so documents are bounded at STRIDE chunks (= 40960 words — far above the
#: corpus; a longer doc would need a wider stride, not a different design)
CHUNK_STRIDE = 4096


def _read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


# --------------------------------------------------------------------------
# Gopher-style repetition signals
# --------------------------------------------------------------------------

def doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document repetition metrics over space-split words:
    ``dup_word_frac`` (1 - distinct/total), ``top_word_frac`` (most frequent
    word's share), ``top_bigram_frac`` (most frequent adjacent bigram's share
    of the n-1 bigrams; 0 for one-word docs). Empty/whitespace-only docs are
    excluded (no denominator)."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids, nw, dupf, topw, topb = [], [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            if not text.strip():
                continue
            words = np.array(text.split(" "), dtype=object)
            n = len(words)
            _, wc = np.unique(words, return_counts=True)
            if n >= 2:
                grams = np.char.add(
                    np.char.add(words[:-1].astype(str), " "),
                    words[1:].astype(str),
                )
                _, bc = np.unique(grams, return_counts=True)
                tb = bc.max() / (n - 1)
            else:
                tb = 0.0
            ids.append(doc_id)
            nw.append(n)
            dupf.append(1.0 - len(wc) / n)
            topw.append(wc.max() / n)
            topb.append(tb)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_words": pd.Series(nw, dtype="int64"),
                "dup_word_frac": round_half_away(np.array(dupf)),
                "top_word_frac": round_half_away(np.array(topw)),
                "top_bigram_frac": round_half_away(np.array(topb)),
            }
        )

    out = (
        _read_docs(sf_dir)
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_DOC_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE length(trim(text)) > 0
), wc AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM t
), uw AS (
  SELECT doc_id, unnest(w) AS word FROM t
), topw AS (
  SELECT doc_id, MAX(c) AS topw
  FROM (SELECT doc_id, word, COUNT(*) AS c FROM uw GROUP BY 1, 2) GROUP BY 1
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
  FROM t WHERE len(w) >= 2
), topb AS (
  SELECT doc_id, MAX(c) AS topb
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
)
SELECT wc.doc_id, wc.n_words,
       ROUND(1.0 - wc.n_distinct * 1.0 / wc.n_words, 4) AS dup_word_frac,
       ROUND(topw.topw * 1.0 / wc.n_words, 4) AS top_word_frac,
       ROUND(COALESCE(topb.topb * 1.0 / (wc.n_words - 1), 0.0), 4) AS top_bigram_frac
FROM wc
JOIN topw USING (doc_id)
LEFT JOIN topb USING (doc_id)
"""


# --------------------------------------------------------------------------
# Word-distribution entropy (quality signal)
# --------------------------------------------------------------------------

def doc_word_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy (bits) of each document's word distribution — the
    low-entropy tail is boilerplate/repetition, the high tail is noise."""

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        ids, ent = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            if not text.strip():
                continue
            words = text.split(" ")
            _, counts = np.unique(np.array(words, dtype=object), return_counts=True)
            p = counts / counts.sum()
            ids.append(doc_id)
            ent.append(float(-(p * np.log2(p)).sum()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "word_entropy": round_half_away(np.array(ent)),
            }
        )

    out = (
        _read_docs(sf_dir)
        .map_batches(entropy, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_DOC_WORD_ENTROPY_SQL = """
WITH uw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  WHERE length(trim(text)) > 0
), c AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM uw GROUP BY 1, 2
), n AS (
  SELECT doc_id, SUM(cnt) AS n FROM c GROUP BY 1
)
SELECT c.doc_id,
       ROUND(-SUM((c.cnt * 1.0 / n.n) * log2(c.cnt * 1.0 / n.n)), 4) AS word_entropy
FROM c JOIN n USING (doc_id)
GROUP BY c.doc_id
"""


# --------------------------------------------------------------------------
# Chunk-granular exact dedup (paragraph-dedup analog)
# --------------------------------------------------------------------------

def chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup at fixed 10-word-chunk granularity over the exact-twin
    corpus: every distinct chunk gets its md5, its first (doc, chunk) owner
    and its occurrence count — the table a paragraph-dedup pass would consume
    to blank repeated spans. One hash-keyed shuffle, pre-shrunk per batch."""
    corpus = exact_dup_corpus(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hashes, keys = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            if not text.strip():
                continue
            words = text.split(" ")
            for ci in range(0, (len(words) + CHUNK_WORDS - 1) // CHUNK_WORDS):
                chunk = " ".join(words[ci * CHUNK_WORDS : (ci + 1) * CHUNK_WORDS])
                hashes.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
                keys.append(doc_id * CHUNK_STRIDE + ci)
        return pd.DataFrame(
            {
                "text_hash": pd.Series(hashes, dtype="object"),
                "k": pd.Series(keys, dtype="int64"),
            }
        )

    agg = grouped_aggregate(
        corpus.map_batches(explode, batch_format="pandas"),
        ["text_hash"],
        {"mk": ("k", "min"), "n_dups": (None, "count")},
    ).to_pandas()
    mk = agg["mk"].to_numpy(dtype=np.int64)
    return (
        pd.DataFrame(
            {
                "text_hash": agg["text_hash"],
                "keeper_doc_id": mk // CHUNK_STRIDE,
                "keeper_chunk": mk % CHUNK_STRIDE,
                "n_dups": agg["n_dups"].astype("int64"),
            }
        )
        .sort_values("text_hash")
        .reset_index(drop=True)
    )


_CHUNK_DEDUP_SQL = f"""
WITH corpus AS ({_EXACT_CORPUS_SQL}),
t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
  WHERE length(trim(text)) > 0
), c AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(w) / {CHUNK_WORDS}.0) AS BIGINT))) AS chunk_idx,
         w
  FROM t
), ch AS (
  SELECT doc_id * {CHUNK_STRIDE} + chunk_idx AS k,
         md5(array_to_string(
           w[(chunk_idx * {CHUNK_WORDS} + 1):(chunk_idx * {CHUNK_WORDS} + {CHUNK_WORDS})],
           ' ')) AS text_hash
  FROM c
)
SELECT text_hash,
       MIN(k) // {CHUNK_STRIDE} AS keeper_doc_id,
       MIN(k) % {CHUNK_STRIDE} AS keeper_chunk,
       COUNT(*) AS n_dups
FROM ch GROUP BY 1
"""


# --------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup
# --------------------------------------------------------------------------

#: Gear-style rolling boundary rule over a 4-char window: position i (1-based)
#: ends a chunk when the base-1001 polynomial of the trailing 4 chars
#: (((c1*1001 + c2)*1001 + c3)*1001 + c4) % CDC_MOD == 0. CDC_MOD prime →
#: average chunk ≈ CDC_MOD chars (base 1001 > any char code keeps the map
#: injective on 4-grams, so residues spread even over tiny alphabets — a
#: weighted SUM left entire small vocabularies boundary-free). The mixing is
#: a polynomial instead of a random gear table SO THE SQL ORACLE CAN
#: EVALUATE IT (ascii(substr(...))); the scale shape — boundaries from local
#: content only, so an insertion re-chunks ONE neighborhood instead of
#: shifting every downstream chunk like fixed-size chunking does — is the
#: real CDC property and is asserted by the shift-resistance test.
CDC_MOD = 61
CDC_WIN = 4


def _cdc_ends(text: str) -> np.ndarray:
    """1-based chunk END positions, vectorized (one numpy pass per doc, no
    per-position Python). Positions are CHARACTER offsets; the rule reads
    byte values, which equal character codes for the ASCII corpus (the SQL
    mirror's ascii()/substr() are character-based — documented seam for
    non-ASCII corpora)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if len(b) < CDC_WIN:
        return np.empty(0, dtype=np.int64)
    s = ((b[:-3] * 1001 + b[1:-2]) * 1001 + b[2:-1]) * 1001 + b[3:]
    return np.nonzero(s % CDC_MOD == 0)[0] + CDC_WIN


def cdc_chunks(text: str) -> list[str]:
    """Split ``text`` at the content-defined boundaries (used by the query
    explode AND directly by the shift-resistance test)."""
    ends = _cdc_ends(text)
    out: list[str] = []
    prev = 0
    for e in ends:
        out.append(text[prev:e])
        prev = int(e)
    if prev < len(text):
        out.append(text[prev:])
    return out


def cdc_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup at CONTENT-DEFINED chunk granularity over the exact-twin
    corpus — the storage/dedup-friendly alternative to ``chunk_dedup``'s
    fixed word windows: boundaries depend only on a local 4-char window, so
    edits re-chunk one neighborhood instead of shifting every later chunk.
    Output: one row per chunk content seen ≥ 2 times — (chunk_hash, n_docs
    distinct documents containing it, n_occ total occurrences).

    Scale topology: per-batch vectorized boundary scan + md5 per CHUNK (not
    per position) → one (hash, doc) pre-shrunk grouped count → a second
    hash-keyed count/sum over the already chunk-bounded intermediate; the
    dup-filtered result is bounded by the DUPLICATION volume."""
    corpus = exact_dup_corpus(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hashes, dids = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            for chunk in cdc_chunks(text):
                hashes.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
                dids.append(doc_id)
        return pd.DataFrame(
            {
                "chunk_hash": pd.Series(hashes, dtype="object"),
                "doc_id": pd.Series(dids, dtype="int64"),
            }
        )

    per_doc = grouped_aggregate(
        corpus.map_batches(explode, batch_format="pandas"),
        ["chunk_hash", "doc_id"],
        {"c": (None, "count")},
    )
    agg = grouped_aggregate(
        per_doc, ["chunk_hash"], {"n_docs": (None, "count"), "n_occ": ("c", "sum")}
    ).to_pandas()
    agg = agg[agg["n_occ"] >= 2]
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["n_occ"] = agg["n_occ"].astype("int64")
    return agg.sort_values("chunk_hash").reset_index(drop=True)


_CDC_CHUNK_DEDUP_SQL = f"""
WITH corpus AS ({_EXACT_CORPUS_SQL}),
b AS (
  SELECT doc_id, u.i AS e
  FROM corpus, LATERAL unnest(range(4, strlen(text) + 1)) AS u(i)
  WHERE (((CAST(ascii(substr(text, CAST(u.i AS INT) - 3, 1)) AS BIGINT) * 1001
           + ascii(substr(text, CAST(u.i AS INT) - 2, 1))) * 1001
           + ascii(substr(text, CAST(u.i AS INT) - 1, 1))) * 1001
           + ascii(substr(text, CAST(u.i AS INT), 1))) % {CDC_MOD} = 0
),
spans AS (
  SELECT doc_id, e, lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS s
  FROM b
),
chunks AS (
  SELECT c.doc_id, substr(c.text, CAST(w.s AS INT) + 1, CAST(w.e - w.s AS INT)) AS chunk
  FROM spans w JOIN corpus c USING (doc_id)
  UNION ALL
  SELECT c.doc_id, substr(c.text, CAST(coalesce(m.mx, 0) AS INT) + 1) AS chunk
  FROM corpus c
  LEFT JOIN (SELECT doc_id, max(e) AS mx FROM b GROUP BY 1) m USING (doc_id)
  WHERE coalesce(m.mx, 0) < strlen(c.text)
),
per_doc AS (
  SELECT md5(chunk) AS chunk_hash, doc_id, COUNT(*) AS c
  FROM chunks GROUP BY 1, 2
)
SELECT chunk_hash, COUNT(*) AS n_docs, CAST(SUM(c) AS BIGINT) AS n_occ
FROM per_doc GROUP BY 1 HAVING SUM(c) >= 2
ORDER BY chunk_hash
"""


# --------------------------------------------------------------------------
# Zipf frequency-of-frequencies
# --------------------------------------------------------------------------

def token_freq_of_freqs(sf_dir: str) -> pd.DataFrame:
    """Corpus token-frequency histogram of histograms: for each corpus-wide
    token count, how many distinct tokens have it (the Zipf tail diagnostic
    and the Good-Turing input). First aggregate is per-batch pre-counted so
    the shuffle moves (token, partial count) rows, not token occurrences."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for text in df["text"]:
            if text.strip():
                toks.extend(text.split(" "))
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "freq": pd.Series([], dtype="int64")}
            )
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pd.DataFrame({"token": u, "freq": c.astype(np.int64)})

    per_token = grouped_aggregate(
        _read_docs(sf_dir).map_batches(counts, batch_format="pandas"),
        ["token"],
        {"freq": ("freq", "sum")},
        prepare=None,
    )
    out = (
        grouped_aggregate(per_token, ["freq"], {"n_tokens": (None, "count")})
        .to_pandas()
        .astype({"freq": "int64", "n_tokens": "int64"})
    )
    return out.sort_values("freq").reset_index(drop=True)


_TOKEN_FOF_SQL = """
WITH uw AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
  WHERE length(trim(text)) > 0
), c AS (
  SELECT token, COUNT(*) AS freq FROM uw GROUP BY 1
)
SELECT freq, COUNT(*) AS n_tokens FROM c GROUP BY 1
"""


# --------------------------------------------------------------------------
# Cross-document repeated n-gram spans (boilerplate mining)
# --------------------------------------------------------------------------

REPEAT_N = 8


def repeated_ngrams(sf_dir: str) -> pd.DataFrame:
    """Word 8-grams (overlapping) occurring in ≥ 2 DISTINCT documents of the
    exact-twin corpus, with distinct-doc and total occurrence counts — the
    repeated-span mining step behind substring-level dedup (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better': repeated
    spans across documents are boilerplate to strip). One hash-keyed shuffle:
    each batch emits one (gram, doc, occ) row per distinct gram per doc
    (docs are unique across batches, so doc-distinctness needs no global
    dedup), the grouped merge counts docs and sums occurrences."""
    corpus = exact_dup_corpus(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hashes, occs = [], []
        for text in df["text"]:
            if not text.strip():
                continue
            words = text.split(" ")
            if len(words) < REPEAT_N:
                continue
            grams = [
                " ".join(words[i : i + REPEAT_N])
                for i in range(len(words) - REPEAT_N + 1)
            ]
            u, c = np.unique(np.array(grams, dtype=object), return_counts=True)
            hashes.extend(hashlib.md5(g.encode("utf-8")).hexdigest() for g in u)
            occs.extend(c.tolist())
        return pd.DataFrame(
            {
                "gram_hash": pd.Series(hashes, dtype="object"),
                "occ": pd.Series(occs, dtype="int64"),
            }
        )

    agg = grouped_aggregate(
        corpus.map_batches(explode, batch_format="pandas"),
        ["gram_hash"],
        {"n_docs": (None, "count"), "n_occ": ("occ", "sum")},
    ).to_pandas()
    out = agg[agg["n_docs"] >= 2].astype({"n_docs": "int64", "n_occ": "int64"})
    return out.sort_values("gram_hash").reset_index(drop=True)


_REPEATED_NGRAMS_SQL = f"""
WITH corpus AS ({_EXACT_CORPUS_SQL}),
t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
  WHERE length(trim(text)) > 0
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {REPEAT_N - 2}),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' '
                || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS gram
  FROM t WHERE len(w) >= {REPEAT_N}
)
SELECT md5(gram) AS gram_hash,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occ
FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
"""


# --------------------------------------------------------------------------
# BPE first-merge pair counts (tokenizer-training prep)
# --------------------------------------------------------------------------

BPE_TOPK = 20


def bpe_pair_counts(sf_dir: str, k: int = BPE_TOPK) -> pd.DataFrame:
    """The first iteration of BPE tokenizer training: corpus-weighted counts
    of adjacent character pairs, top-k by count — the statistic that picks
    the first merge rule.

    Two-level scale shape: the corpus-sized pass counts WORDS (token
    explosion inside the partial aggregate, one (word, n) partial per
    batch — the shuffle is bounded by the vocabulary, not the token
    stream); the quadratic-ish character work then runs over the BOUNDED
    word-count table (each distinct word explodes into len-1 pairs
    weighted by its corpus frequency) — never over raw text. This is
    exactly how production BPE trainers scale: count words once, train on
    the vocabulary."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def explode_words(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        flat = (
            np.concatenate(toks.to_numpy())
            if len(df)
            else np.array([], dtype=object)
        )
        out = pd.DataFrame({"w": flat})
        return out[out["w"] != ""]

    wc = grouped_aggregate(
        docs, ["w"], {"cnt": (None, "count")}, prepare=explode_words
    )

    def explode_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ws = df["w"].to_numpy()
        cnts = df["cnt"].to_numpy()
        pairs, ns = [], []
        for w, c in zip(ws, cnts):
            for i in range(len(w) - 1):
                pairs.append(w[i : i + 2])
                ns.append(c)
        return pd.DataFrame({"pair": pd.Series(pairs, dtype="object"),
                             "n": pd.Series(ns, dtype="int64")})

    agg = grouped_aggregate(wc, ["pair"], {"n": ("n", "sum")}, prepare=explode_pairs)
    out = agg.to_pandas()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "pair"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


BPE_ROUNDS = 6


def _apply_merges(symbols: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply merge rules in priority order (standard BPE semantics)."""
    for a, b in merges:
        out = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_merge_rounds(sf_dir: str, rounds: int = BPE_ROUNDS) -> pd.DataFrame:
    """FULL BPE merge-rule training for ``rounds`` iterations — the
    iterative extension of ``bpe_pair_counts``. The corpus is scanned
    exactly ONCE (the word-count pass, vocabulary-bounded shuffle); every
    round then re-tokenizes the distinct-WORD table under the merges so far
    (broadcast — the merge list is ``rounds`` entries), counts adjacent
    symbol pairs weighted by word frequency (partial+final), and the driver
    picks the argmax pair (ties lexicographic). This is the production BPE
    scale shape: train on the vocabulary, never on raw text. Deterministic;
    hash-checked (r5) against an UNROLLED DuckDB mirror of every round
    (see _bpe_chain_sql) plus a pure-python reference parity test."""
    import ray

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def explode_words(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        flat = (
            np.concatenate(toks.to_numpy())
            if len(df)
            else np.array([], dtype=object)
        )
        out = pd.DataFrame({"w": flat})
        return out[out["w"] != ""]

    wc = grouped_aggregate(
        docs, ["w"], {"cnt": (None, "count")}, prepare=explode_words
    ).materialize()

    merges: list[tuple[str, str]] = []
    out_rows = []
    for r in range(rounds):
        merges_ref = ray.put(list(merges))

        def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            ms = ray.get(merges_ref)
            lefts, rights, ns = [], [], []
            for w, c in zip(df["w"], df["cnt"]):
                syms = _apply_merges(list(w), ms)
                for i in range(len(syms) - 1):
                    lefts.append(syms[i])
                    rights.append(syms[i + 1])
                    ns.append(c)
            return pd.DataFrame(
                {
                    "left": pd.Series(lefts, dtype="object"),
                    "right": pd.Series(rights, dtype="object"),
                    "n": pd.Series(ns, dtype="int64"),
                }
            )

        agg = grouped_aggregate(
            wc, ["left", "right"], {"n": ("n", "sum")}, prepare=pair_counts
        ).to_pandas()
        if agg.empty:
            break
        agg = agg.sort_values(
            ["n", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        best = agg.iloc[0]
        merges.append((best["left"], best["right"]))
        out_rows.append(
            (r + 1, best["left"], best["right"], int(best["n"]))
        )
    return pd.DataFrame(
        out_rows, columns=["round", "left", "right", "pair_count"]
    ).astype({"round": "int64", "pair_count": "int64"})


def _bpe_chain_sql(rounds: int = BPE_ROUNDS) -> str:
    """Unrolled SQL mirror of the BPE trainer (r5 — moves both BPE queries
    from rows-only to hash-checked). Symbol sequences are encoded as
    SELF-DELIMITED strings — every symbol carries a trailing ``chr(1)``
    separator — so DuckDB's plain ``replace`` (leftmost, non-overlapping,
    resuming AFTER each replacement) applies a merge with exactly the
    semantics of ``_apply_merges``'s left-to-right scan, including the
    [a,a,a] + (a,a) → [aa,a] case. Each round is one MATERIALIZED CTE
    trio (pair explode → argmax with the trainer's (n DESC, left, right)
    tie-break → replace); MATERIALIZED stops DuckDB inlining the chain
    (each round references its predecessor twice — inlined it would blow
    up 2^rounds)."""
    sep = "chr(1)"
    parts = [
        """wc AS MATERIALIZED (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT w,
         list_aggregate(string_split(w, ''), 'string_agg', chr(1))
           || chr(1) AS s,
         cnt
  FROM wc
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT t.l[u.i] AS lft, t.l[u.i + 1] AS rgt, SUM(t.cnt) AS n
  FROM (SELECT string_split(rtrim(s, {sep}), {sep}) AS l, cnt
        FROM s{r - 1}) t,
       unnest(range(1, len(t.l))) AS u(i)
  GROUP BY 1, 2
),
m{r} AS MATERIALIZED (
  SELECT lft, rgt, n FROM p{r} ORDER BY n DESC, lft, rgt LIMIT 1
),
s{r} AS MATERIALIZED (
  SELECT w,
         replace(s,
                 (SELECT lft FROM m{r}) || {sep}
                   || (SELECT rgt FROM m{r}) || {sep},
                 (SELECT lft FROM m{r})
                   || (SELECT rgt FROM m{r}) || {sep}) AS s,
         cnt
  FROM s{r - 1}
)"""
        )
    return ",".join(parts)


def _bpe_merge_rounds_sql(rounds: int = BPE_ROUNDS) -> str:
    body = "\nUNION ALL ".join(
        f'SELECT {r} AS round, lft AS "left", rgt AS "right", '
        f"CAST(n AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + _bpe_chain_sql(rounds) + "\n" + body + "\nORDER BY round"


def _bpe_encode_stats_sql(rounds: int = BPE_ROUNDS) -> str:
    return (
        "WITH "
        + _bpe_chain_sql(rounds)
        + f""",
enc AS MATERIALIZED (
  SELECT w, len(string_split(rtrim(s, chr(1)), chr(1))) AS n_toks
  FROM s{rounds}
),
agg AS (
  SELECT dw.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(length(dw.w)) AS BIGINT) AS n_symbols,
         CAST(SUM(enc.n_toks) AS BIGINT) AS n_bpe_tokens
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents) dw
  JOIN enc ON enc.w = dw.w
  WHERE dw.w <> ''
  GROUP BY dw.doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_words, 0) AS n_words,
       COALESCE(agg.n_symbols, 0) AS n_symbols,
       COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
       COALESCE(agg.n_symbols - agg.n_bpe_tokens, 0) AS n_merges_applied
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
ORDER BY d.doc_id"""
    )


_BPE_PAIR_COUNTS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), wc AS (
  SELECT w, COUNT(*) AS cnt FROM toks WHERE w <> '' GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair,
         cnt
  FROM wc WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT {BPE_TOPK}
"""


def bpe_encode_stats(sf_dir: str, rounds: int = BPE_ROUNDS) -> pd.DataFrame:
    """Tokenizer APPLICATION — the step after :func:`bpe_merge_rounds`:
    encode every document under the trained merge rules and report per-doc
    token accounting (whitespace words, character symbols before merging,
    BPE tokens after merging, merges applied). The tokens-per-word fertility
    this yields is the number a data pipeline actually budgets on.

    Scale topology: training reuses the one-vocabulary-pass trainer; the
    merge list (``rounds`` entries) is broadcast via ``ray.put``; encoding
    is an embarrassingly parallel actor-pool pass with a PER-ACTOR
    word→token-count memo (Zipf's law makes the hit rate ~99%, so encoding
    costs ~O(distinct words) per actor, not O(corpus words)). Hash-checked
    (r5) against the unrolled-merge DuckDB mirror; pure-python parity test.
    """
    import ray

    merges_df = bpe_merge_rounds(sf_dir, rounds)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    merges_ref = ray.put(merges)

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    class Encode:
        def __init__(self) -> None:
            self.merges = ray.get(merges_ref)
            self.memo: dict[str, int] = {}

        def _word_tokens(self, w: str) -> int:
            n = self.memo.get(w)
            if n is None:
                n = len(_apply_merges(list(w), self.merges))
                self.memo[w] = n
            return n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, nw, nsym, nbpe = [], [], [], []
            for d, t in zip(df["doc_id"], df["text"]):
                words = [w for w in t.split(" ") if w]
                ids.append(int(d))
                nw.append(len(words))
                nsym.append(sum(len(w) for w in words))
                nbpe.append(sum(self._word_tokens(w) for w in words))
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_symbols": pd.Series(nsym, dtype="int64"),
                    "n_bpe_tokens": pd.Series(nbpe, dtype="int64"),
                }
            )

    out = docs.map_batches(Encode, batch_format="pandas", concurrency=(1, 8))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_merges_applied"] = df["n_symbols"] - df["n_bpe_tokens"]
    return df


# --------------------------------------------------------------------------
# Cross-document repeated SPANS (the strip-these-ranges output of
# substring-level dedup — Lee et al. 2022: repeated spans are boilerplate)
# --------------------------------------------------------------------------

SPAN_K = 8  # window width in words (the repeated_ngrams gram size)


def repeated_ngram_spans(
    sf_dir: str, k: int = SPAN_K, small_threshold: int = 2_000_000
) -> pd.DataFrame:
    """Per-document MERGED token spans covered by word-``k``-grams that occur
    in ≥ 2 distinct documents — the range list a substring-dedup pass would
    actually strip (``repeated_ngrams`` mines the gram table; this projects
    the hits back to positions and merges overlapping windows into maximal
    spans). Output: (doc_id, start_tok, end_tok, n_windows), 1-based
    inclusive token positions, ordered.

    Scale topology: one pass explodes (gram_hash, doc_id, pos) with the gram
    hash built by a VECTORIZED k-way rolling combine over per-word hashes
    (no per-position string building); duplicated grams fall out of a single
    grouped (min_doc, max_doc) aggregate — a gram is cross-doc iff
    min != max, so no count-distinct shuffle; hot positions are selected by
    broadcast semi-filter when the hot-gram set is small (it is bounded by
    the DUPLICATION volume, not the corpus) and the final per-doc interval
    merge is the adaptive sessions shape: vectorized single sort under the
    footer threshold, doc-keyed shuffle above it. A gram-hash collision
    (~2^-63) could mark one extra span; acceptable for a strip-list.
    """
    from .agg import broadcast_semi_filter

    docs = _read_docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import mix64

        out_doc, out_pos, out_gram = [], [], []
        for d, text in zip(df["doc_id"], df["text"]):
            words = text.split(" ")
            n = len(words) - k + 1
            if n <= 0:
                continue
            wh = pd.util.hash_array(np.asarray(words, dtype=object)).view(
                np.int64
            )
            grams = mix64(*[wh[i : n + i] for i in range(k)])
            out_doc.append(np.full(n, d, dtype=np.int64))
            out_pos.append(np.arange(1, n + 1, dtype=np.int64))  # 1-based
            out_gram.append(grams)
        if not out_doc:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("doc_id", "pos", "gram")}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_doc),
                "pos": np.concatenate(out_pos),
                "gram": np.concatenate(out_gram),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pandas")
    from .dedup import _shingle_rows_bound

    est = _shingle_rows_bound(sf_dir)
    if est <= small_threshold:
        exploded = exploded.materialize()  # two consumers below

    span = grouped_aggregate(
        exploded, ["gram"], {"lo": ("doc_id", "min"), "hi": ("doc_id", "max")}
    )
    hot = span.map_batches(
        lambda d: d.loc[d["lo"] != d["hi"], ["gram"]], batch_format="pandas"
    ).to_pandas()  # bounded by duplication volume
    if hot.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "start_tok", "end_tok", "n_windows")}
        )
    if len(hot) <= 5_000_000:
        positions = broadcast_semi_filter(
            exploded, hot["gram"].tolist(), "gram"
        ).select_columns(["doc_id", "pos"])
    else:  # pragma: no cover — huge hot sets hash-join instead of broadcast
        positions = exploded.join(
            rd.from_pandas(hot), join_type="inner", num_partitions=16,
            on=("gram",),
        ).select_columns(["doc_id", "pos"])

    def merge_sorted(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        brk = np.r_[True, (d[1:] != d[:-1]) | (p[1:] - p[:-1] > k)]
        gid = np.cumsum(brk) - 1
        out = pd.DataFrame({"doc_id": d, "pos": p, "gid": gid})
        g = out.groupby("gid", sort=True).agg(
            doc_id=("doc_id", "first"),
            start_tok=("pos", "min"),
            end_tok=("pos", "max"),
            n_windows=("pos", "count"),
        )
        g["end_tok"] += k - 1
        return g[["doc_id", "start_tok", "end_tok", "n_windows"]].astype("int64")

    pos_df = positions.to_pandas() if est <= small_threshold else None
    if pos_df is not None:
        pos_df = pos_df.sort_values(["doc_id", "pos"], kind="mergesort")
        return merge_sorted(pos_df.reset_index(drop=True)).reset_index(drop=True)
    # large path: doc-keyed shuffle, ONE vectorized merge per sorted block
    # (merge_sorted's break mask already handles doc changes — r4, replaces
    # the per-doc map_groups whose dispatch cost scaled with |docs|)
    from .agg import map_sorted_runs

    out = map_sorted_runs(
        positions,
        "doc_id",
        lambda df: merge_sorted(
            df.sort_values(["doc_id", "pos"], kind="mergesort").reset_index(
                drop=True
            )
        ),
    ).to_pandas()
    return out.sort_values(["doc_id", "start_tok"], kind="mergesort").reset_index(
        drop=True
    )


_REPEATED_SPANS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(w[i:i + {SPAN_K - 1}], ' ') AS gram
  FROM t, unnest(range(1, len(w) - {SPAN_K - 2})) AS r(i)
), hot AS (
  SELECT gram FROM g GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)
), p AS (
  SELECT doc_id, pos FROM g JOIN hot USING (gram)
), m AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SPAN_K} THEN 0 ELSE 1 END AS brk
  FROM p
), isl AS (
  SELECT doc_id, pos,
         SUM(COALESCE(brk, 1)) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS grp
  FROM m
)
SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + {SPAN_K - 1} AS end_tok,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, grp
ORDER BY doc_id, start_tok
"""


def strip_repeated_spans(sf_dir: str, k: int = SPAN_K) -> rd.Dataset:
    """APPLY the strip list: rewrite every document with its cross-doc
    repeated spans removed (the corpus-rewriting step of Lee et al.
    substring dedup — ``repeated_ngram_spans`` finds the ranges, this emits
    the cleaned corpus). Output: (doc_id, text_clean, n_tokens_removed),
    every doc, streaming.

    Scale shape: the span table is the mining output (bounded by
    duplication volume, already driver-resident) broadcast once via
    ``ray.put``; the rewrite is one stateless map_batches over the corpus —
    no shuffle. At 10^12 docs the span table would come from the persisted
    mining pass and the broadcast becomes a doc-keyed join; the rewrite
    pass is unchanged."""
    import ray

    spans = repeated_ngram_spans(sf_dir, k=k)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for row in spans.itertuples():
        by_doc.setdefault(int(row.doc_id), []).append(
            (int(row.start_tok), int(row.end_tok))
        )
    ref = ray.put(by_doc)

    class Rewrite:
        """Actor-pool stage: the span dict is fetched (and unpickled) ONCE
        per actor in __init__ — dicts are not zero-copy from the object
        store, so a per-batch ray.get would re-deserialize the whole strip
        list every batch."""

        def __init__(self) -> None:
            self.table = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out_text, removed = [], []
            for d, text in zip(df["doc_id"], df["text"]):
                cuts = self.table.get(int(d))
                if not cuts:
                    out_text.append(text)
                    removed.append(0)
                    continue
                words = text.split(" ")
                drop = np.zeros(len(words), dtype=bool)
                for a, b in cuts:  # 1-based inclusive token positions
                    drop[a - 1 : b] = True
                out_text.append(
                    " ".join(w for w, x in zip(words, drop) if not x)
                )
                removed.append(int(drop.sum()))
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "text_clean": out_text,
                    "n_tokens_removed": pd.Series(removed, dtype="int64"),
                }
            )

    return _read_docs(sf_dir).map_batches(
        Rewrite, batch_format="pandas", concurrency=(1, 8)
    )


_STRIP_SPANS_SQL = f"""
WITH spans AS ({_REPEATED_SPANS_SQL.replace("ORDER BY doc_id, start_tok", "")}
), t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS word
  FROM t, unnest(range(1, len(w) + 1)) AS r(i)
), kept AS (
  SELECT tok.doc_id, tok.pos, tok.word
  FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = tok.doc_id
      AND tok.pos BETWEEN s.start_tok AND s.end_tok
  )
)
SELECT t.doc_id,
       COALESCE((SELECT string_agg(word, ' ' ORDER BY pos)
                 FROM kept WHERE kept.doc_id = t.doc_id), '') AS text_clean,
       len(w) - COALESCE((SELECT COUNT(*) FROM kept
                          WHERE kept.doc_id = t.doc_id), 0)
         AS n_tokens_removed
FROM t
"""


LINE_DEDUP_FRACTION = 0.05
_LINE_N_HOSTS = 97


def line_dedup_clean(sf_dir: str) -> pd.DataFrame:
    """CCNet/RefinedWeb-style corpus-wide LINE dedup: a line that appears
    in more than ``LINE_DEDUP_FRACTION`` of all documents is boilerplate
    (nav bars, footers, cookie banners) and is stripped from every
    document; surviving lines rebuild each document in original order.
    The fraction threshold makes the semantics scale-invariant — the same
    rule fires identically at sf0.001 and at 10^12 docs.

    The corpus' texts have no newlines, so each doc synthesizes its
    4-line page deterministically: a per-host nav line (~1% of docs —
    kept), the doc's own text (unique — kept), a tag line shared by 1/7
    of docs (dropped), and a global footer (dropped).

    Scale topology (the CCNet shape): pass 1 is a line-hash frequency
    aggregate pre-shrunk per batch (one row per distinct line per batch
    crosses the shuffle); the >threshold hot set is SMALL BY CONSTRUCTION
    (only lines repeated across >5% of a corpus fit in it) and broadcasts
    into pass 2, which drops lines and rebuilds docs entirely within
    their own batch — payload text never shuffles."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        text = df["text"].fillna("")
        return pd.DataFrame(
            {
                "line": np.concatenate(
                    [
                        [f"site{x % _LINE_N_HOSTS}.example navigation home about contact" for x in d],
                        text.to_numpy(dtype=object),
                        [f"tag {x % 7}" for x in d],
                        ["copyright 2026 all rights reserved"] * len(d),
                    ]
                ),
            }
        )

    freq = grouped_aggregate(
        docs, ["line"], {"n": (None, "count")}, prepare=explode
    ).to_pandas()
    hot = frozenset(freq.loc[freq["n"] > n_docs * LINE_DEDUP_FRACTION, "line"])

    import ray

    hot_ref = ray.put(hot)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        hot_set = ray.get(hot_ref)
        d = df["doc_id"].to_numpy()
        text = df["text"].fillna("")
        lines_per_doc = [
            [f"site{x % _LINE_N_HOSTS}.example navigation home about contact", t, f"tag {x % 7}",
             "copyright 2026 all rights reserved"]
            for x, t in zip(d, text)
        ]
        kept = [[ln for ln in lines if ln not in hot_set] for lines in lines_per_doc]
        return pd.DataFrame(
            {
                "doc_id": d.astype("int64"),
                "clean_text": ["\n".join(k) for k in kept],
                "n_kept": pd.Series([len(k) for k in kept], dtype="int64"),
                "n_dropped": pd.Series([4 - len(k) for k in kept], dtype="int64"),
            }
        )

    out = docs.map_batches(rebuild, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_LINE_DEDUP_CLEAN_SQL = f"""
WITH lines AS (
  SELECT doc_id, 1 AS idx,
         'site' || CAST(doc_id % {_LINE_N_HOSTS} AS VARCHAR)
           || '.example navigation home about contact' AS line
  FROM documents
  UNION ALL SELECT doc_id, 2, text FROM documents
  UNION ALL SELECT doc_id, 3, 'tag ' || CAST(doc_id % 7 AS VARCHAR) FROM documents
  UNION ALL SELECT doc_id, 4, 'copyright 2026 all rights reserved' FROM documents
),
freq AS (SELECT line, COUNT(*) AS n FROM lines GROUP BY 1),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
kept AS (
  SELECT l.doc_id, l.idx, l.line
  FROM lines l JOIN freq f USING (line), total
  WHERE f.n <= total.n_docs * {LINE_DEDUP_FRACTION}
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY idx) AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(4 - COUNT(*) AS BIGINT) AS n_dropped
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "line_dedup_clean": line_dedup_clean,
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_merge_rounds": bpe_merge_rounds,
    "bpe_encode_stats": bpe_encode_stats,
    "repeated_ngrams": repeated_ngrams,
    "repeated_ngram_spans": repeated_ngram_spans,
    "strip_repeated_spans": strip_repeated_spans,
    "doc_repetition_stats": doc_repetition_stats,
    "doc_word_entropy": doc_word_entropy,
    "chunk_dedup": chunk_dedup,
    "token_freq_of_freqs": token_freq_of_freqs,
}

ORACLES: dict[str, str] = {
    "cdc_chunk_dedup": _CDC_CHUNK_DEDUP_SQL,
    "line_dedup_clean": _LINE_DEDUP_CLEAN_SQL,
    "bpe_pair_counts": _BPE_PAIR_COUNTS_SQL,
    "bpe_merge_rounds": _bpe_merge_rounds_sql(),
    "bpe_encode_stats": _bpe_encode_stats_sql(),
    "repeated_ngrams": _REPEATED_NGRAMS_SQL,
    "repeated_ngram_spans": _REPEATED_SPANS_SQL,
    "strip_repeated_spans": _STRIP_SPANS_SQL,
    "doc_repetition_stats": _DOC_REPETITION_SQL,
    "doc_word_entropy": _DOC_WORD_ENTROPY_SQL,
    "chunk_dedup": _CHUNK_DEDUP_SQL,
    "token_freq_of_freqs": _TOKEN_FOF_SQL,
}

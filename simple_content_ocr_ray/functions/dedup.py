"""Deduplication operators: exact, n-gram-Jaccard (inverted index), MinHash+LSH,
SimHash — the dedup family a training-data pipeline needs at corpus scale.

Because the driver's ``documents`` table has no natural duplicates (500 unique
texts over a 31-word vocabulary), each operator runs over a corpus augmented
with DETERMINISTIC twins that the SQL oracle can reconstruct:

  * exact twins:    doc_id % 7 == 0 → copy at doc_id + 2_000_000 (same text)
  * near-dup twins: doc_id % 5 == 0 and ≥ 12 words → copy at doc_id + 1_000_000
                    with the LAST TWO WORDS dropped

Near-dup detection uses word 3-gram shingles. All three near-dup algorithms
(inverted index, MinHash-LSH, SimHash) must discover exactly the twin pairs —
the oracle is the twin-construction rule itself, so a false positive or a
missed pair fails the gate.

Scale notes (100 TB): candidate generation is a shuffle keyed by shingle /
band-bucket with a stop-shingle df cap so hot keys can't explode a group;
the exact-verify step here collects only candidate docs' shingle sets
(bounded by the candidate count) — at 10^12 docs that step becomes a
pair-keyed distributed join, same topology.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Iterable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import broadcast_semi_filter, grouped_aggregate

MERSENNE_P = (1 << 61) - 1
NUM_PERMS = 128
NUM_BANDS = 64  # 64 bands × 2 rows: P(miss) = (1-j^2)^64 — negligible at j ≥ 0.5
JACCARD_TAU = 0.5
SIMHASH_HAMMING_TAU = 16
#: optional stop-shingle cap for candidate generation at corpus scale (a
#: shingle in more docs than this is skipped when building candidates).
#: None (default) = exact: every shared shingle can form a candidate, so the
#: result provably equals the exact-Jaccard oracle. At 10^12 docs you set a
#: cap (accepting possible misses on pairs whose every shared shingle is hot)
#: or use the MinHash path.
DF_CAP = None

NEAR_TWIN_OFFSET = 1_000_000
EXACT_TWIN_OFFSET = 2_000_000
MIN_TWIN_WORDS = 12


# --------------------------------------------------------------------------
# Shingling (shared by all near-dup ops; deterministic, salt-free hashes)
# --------------------------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word-k-gram shingles hashed to int64 (blake2b, deterministic
    across processes — python hash() is salted and must not be used here)."""
    words = text.split()
    if len(words) < k:
        grams: Iterable[str] = [" ".join(words)] if words else []
    else:
        grams = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
    out = {
        int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
        >> 1
        for g in grams
    }
    return np.fromiter(out, dtype=np.int64, count=len(out))


MERSENNE_P31 = (1 << 31) - 1


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    # universe and coefficients both < 2^31 so a*x + b < 2^63: exact int64
    # arithmetic (no object-dtype bignum fallback, ~50× slower), and a*x
    # wraps mod p many times so h is a genuine pseudo-permutation
    rng = np.random.RandomState(0xC0FFEE)
    a = rng.randint(1, MERSENNE_P31, size=NUM_PERMS).astype(np.int64)
    b = rng.randint(0, MERSENNE_P31, size=NUM_PERMS).astype(np.int64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-perm MinHash signature via (a*(x mod p) + b) mod p, p = 2^31-1,
    vectorized in pure int64."""
    if len(shingles) == 0:
        return np.full(NUM_PERMS, MERSENNE_P31, dtype=np.int64)
    x = (shingles % MERSENNE_P31)[:, None]
    hashes = (x * a[None, :] + b[None, :]) % MERSENNE_P31
    return hashes.min(axis=0)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over shingle hashes (unit weights)."""
    if len(shingles) == 0:
        return 0
    u = shingles.astype(np.uint64)
    bits = ((u[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int32
    )
    sums = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


# --------------------------------------------------------------------------
# Augmented corpora (deterministic twins, SQL-mirrorable)
# --------------------------------------------------------------------------

def _read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def exact_dup_corpus(sf_dir: str) -> rd.Dataset:
    # NB: both union branches must stay Arrow-blocked — Ray's batcher asserts
    # on mixed pandas/arrow block types when coalescing.
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = _read_docs(sf_dir)

    def twins(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 7 == 0))
        return t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], EXACT_TWIN_OFFSET),
        )

    return docs.union(docs.map_batches(twins, batch_format="pyarrow"))


_EXACT_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def near_dup_corpus(sf_dir: str) -> rd.Dataset:
    import pyarrow as pa

    docs = _read_docs(sf_dir)

    def twins(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_ids, out_texts = [], []
        for d, txt in zip(ids, texts):
            words = txt.split(" ")
            if d % 5 == 0 and len(words) >= MIN_TWIN_WORDS:
                out_ids.append(d + NEAR_TWIN_OFFSET)
                out_texts.append(" ".join(words[:-2]))
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()),
             "text": pa.array(out_texts, pa.string())}
        )

    return docs.union(docs.map_batches(twins, batch_format="pyarrow"))


#: ground truth from first principles: exact word-3-gram Jaccard ≥ τ over the
#: twin-augmented corpus, computed directly in SQL (list_transform 3-grams,
#: list_intersect). Both the inverted-index and the MinHash-LSH pipeline must
#: reproduce this set exactly — including the genuine near-dups that already
#: exist in the corpus, not just the injected twins.
_NEAR_PAIRS_SQL = f"""
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
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1.0
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {JACCARD_TAU}
"""


# --------------------------------------------------------------------------
# Exact dedup (D1): hash-partition on content hash → per-group first
# --------------------------------------------------------------------------

def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    corpus = exact_dup_corpus(sf_dir)

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_hash": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]
                ],
                "doc_id": df["doc_id"],
            }
        )

    agg = grouped_aggregate(
        corpus,
        ["text_hash"],
        {"keeper_doc_id": ("doc_id", "min"), "n_dups": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    agg["keeper_doc_id"] = agg["keeper_doc_id"].astype("int64")
    agg["n_dups"] = agg["n_dups"].astype("int64")
    return agg


_DEDUP_EXACT_DOCS_SQL = f"""
WITH corpus AS ({_EXACT_CORPUS_SQL})
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_dups
FROM corpus GROUP BY 1
"""


# --------------------------------------------------------------------------
# Shared candidate-verification (exact Jaccard on full shingle sets)
# --------------------------------------------------------------------------

def _verify_candidates(
    corpus: rd.Dataset, cand: pd.DataFrame, tau: float
) -> pd.DataFrame:
    """Exact-Jaccard verify of candidate pairs. Only candidate docs' shingle
    sets are pulled (semi-filtered scan — bounded by the candidate count)."""
    if cand.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    subset = broadcast_semi_filter(corpus, needed, "doc_id")

    def to_sets(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [set(shingle_hashes(t).tolist()) for t in df["text"]],
            }
        )

    sets = {
        r["doc_id"]: r["shingles"]
        for r in subset.map_batches(to_sets, batch_format="pandas").take_all()
    }
    keep_a, keep_b = [], []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union >= tau:
            keep_a.append(a)
            keep_b.append(b)
    return pd.DataFrame(
        {"doc_a": pd.Series(keep_a, dtype="int64"),
         "doc_b": pd.Series(keep_b, dtype="int64")}
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


_EMPTY_PAIRS = lambda: pd.DataFrame(  # noqa: E731
    {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
)


def _pairs_from_df(df: pd.DataFrame, key: str) -> pd.DataFrame:
    # singleton buckets (the vast majority) can't form pairs — drop them
    # vectorized so the python pair loop only ever sees multi-doc buckets
    df = df[df.duplicated(key, keep=False)]
    a_out: list[int] = []
    b_out: list[int] = []
    for _, g in df.groupby(key, sort=False):
        ids = sorted(set(g["doc_id"]))
        for i, x in enumerate(ids):
            for y in ids[i + 1 :]:
                a_out.append(x)
                b_out.append(y)
    if not a_out:
        return _EMPTY_PAIRS()
    return (
        pd.DataFrame(
            {"doc_a": pd.Series(a_out, dtype="int64"),
             "doc_b": pd.Series(b_out, dtype="int64")}
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )


def _pairs_from_groups(
    exploded: rd.Dataset, key: str, small_threshold: int = 5_000_000
) -> pd.DataFrame:
    """bucket/shingle groups → distinct candidate (doc_a < doc_b) pairs.

    Adaptive like grouped_aggregate: the exploded (key, doc_id) rows are
    first shrunk per batch (drop_duplicates); small remainders are merged in
    one step (Ray's per-group map_groups costs ~ms per group — ruinous for
    millions of near-singleton buckets), large ones go through the
    distributed groupby shuffle."""
    shrunk = exploded.map_batches(
        lambda d: d[[key, "doc_id"]].drop_duplicates(),
        batch_format="pandas",
    ).materialize()
    if shrunk.count() <= small_threshold:
        return _pairs_from_df(shrunk.to_pandas(), key)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return _EMPTY_PAIRS()
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame(
            {"doc_a": pd.Series(a, dtype="int64"),
             "doc_b": pd.Series(b, dtype="int64")}
        )

    cand = shrunk.groupby(key).map_groups(pairs, batch_format="pandas")
    df = cand.to_pandas()
    if df.empty:
        return _EMPTY_PAIRS()
    return df.drop_duplicates().reset_index(drop=True)


# --------------------------------------------------------------------------
# n-gram Jaccard via inverted shingle index (df-capped)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    corpus = near_dup_corpus(sf_dir).materialize()  # reused by the verify pass

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_sh = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            hs = shingle_hashes(t)
            rows_doc.extend([d] * len(hs))
            rows_sh.extend(hs.tolist())
        return pd.DataFrame({"doc_id": rows_doc, "shingle": rows_sh})

    exploded = corpus.map_batches(explode, batch_format="pandas").materialize()
    if DF_CAP is not None:
        # stop-shingle cap: df > DF_CAP shingles never generate candidates.
        # (vectorized pandas filter over the aggregated counts — a per-row
        # Dataset.filter here costs seconds per 100k shingles)
        df_counts = grouped_aggregate(
            exploded, ["shingle"], {"df": (None, "count")}
        ).to_pandas()
        hot = df_counts.loc[df_counts["df"] > DF_CAP, "shingle"].tolist()
        exploded = broadcast_semi_filter(
            exploded, hot, "shingle", anti=True
        ).materialize()
    cand = _pairs_from_groups(exploded, "shingle")
    return _verify_candidates(corpus, cand, JACCARD_TAU)


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

def minhash_lsh_pairs(sf_dir: str) -> pd.DataFrame:
    corpus = near_dup_corpus(sf_dir).materialize()  # reused by the verify pass
    a, b = _minhash_params()
    rows_per_band = NUM_PERMS // NUM_BANDS

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        docs, buckets = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            sig = minhash_signature(shingle_hashes(t), a, b)
            for band in range(NUM_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                h = hashlib.blake2b(
                    band.to_bytes(2, "big") + chunk.tobytes(), digest_size=8
                ).digest()
                docs.append(d)
                buckets.append(int.from_bytes(h, "big") >> 1)
        return pd.DataFrame({"doc_id": docs, "bucket": buckets})

    exploded = corpus.map_batches(band_rows, batch_format="pandas")
    cand = _pairs_from_groups(exploded, "bucket")
    return _verify_candidates(corpus, cand, JACCARD_TAU)


# --------------------------------------------------------------------------
# SimHash with banded bucketing + Hamming verify
# --------------------------------------------------------------------------

def simhash_pairs(sf_dir: str) -> pd.DataFrame:
    corpus = near_dup_corpus(sf_dir).materialize()

    def sim_rows(df: pd.DataFrame) -> pd.DataFrame:
        docs, bands, fps = [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            fp = simhash64(shingle_hashes(t))
            for band in range(8):  # 8 bands × 8 bits
                key = (band << 60) | ((fp >> (band * 8)) & 0xFF)
                docs.append(d)
                bands.append(key)
                fps.append(fp)
        return pd.DataFrame({"doc_id": docs, "bucket": bands, "fp": fps})

    exploded = corpus.map_batches(sim_rows, batch_format="pandas").materialize()
    fps: dict[int, int] = {}

    def collect_fp(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "fp"]].drop_duplicates()

    for r in exploded.map_batches(collect_fp, batch_format="pandas").take_all():
        fps[r["doc_id"]] = r["fp"]
    cand = _pairs_from_groups(exploded.select_columns(["doc_id", "bucket"]), "bucket")
    keep_a, keep_b = [], []
    for x, y in zip(cand["doc_a"], cand["doc_b"]):
        if bin(fps[x] ^ fps[y]).count("1") <= SIMHASH_HAMMING_TAU:
            keep_a.append(x)
            keep_b.append(y)
    return pd.DataFrame(
        {"doc_a": pd.Series(keep_a, dtype="int64"),
         "doc_b": pd.Series(keep_b, dtype="int64")}
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


QUERIES: dict[str, Callable[[str], object]] = {
    "dedup_exact_docs": dedup_exact_docs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_pairs": simhash_pairs,
}

ORACLES: dict[str, str] = {
    "dedup_exact_docs": _DEDUP_EXACT_DOCS_SQL,
    "ngram_jaccard_pairs": _NEAR_PAIRS_SQL,
    "minhash_lsh_pairs": _NEAR_PAIRS_SQL,
    # simhash_pairs: rows-only — its criterion is Hamming distance on the
    # 64-bit fingerprint, which SQL cannot reproduce; validated in tests
    # against a brute-force simhash implementation.
}

"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, fingerprinting, language-ID. These are the text-side
operators a large-scale training-data pipeline needs (SURVEY.md §7 /
round brief), built as vectorized ``map_batches`` stages.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .agg import grouped_aggregate


def _read_documents(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# --------------------------------------------------------------------------
# Token stats — fully vectorized (pyarrow compute kernels only)
# --------------------------------------------------------------------------

def doc_token_stats(sf_dir: str) -> rd.Dataset:
    ds = _read_documents(sf_dir, ["doc_id", "text", "n_chars"])

    # whitespace tokens + a BPE-ish word/punct regex (RE2 semantics on both
    # sides: pyarrow count_substring_regex and DuckDB regexp_extract_all)
    word_pat = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

    def fn(t: pa.Table) -> pa.Table:
        # single-space-separated corpora: tokens = spaces + 1
        n_tokens = pc.add(pc.count_substring(t["text"], " "), 1)
        n_word_tokens = pc.count_substring_regex(t["text"], word_pat)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_word_tokens": pc.cast(n_word_tokens, pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_DOC_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT)
         AS n_word_tokens,
       n_chars
FROM documents
"""


# --------------------------------------------------------------------------
# Quality scoring — length / diversity signals
# --------------------------------------------------------------------------

def doc_quality(sf_dir: str) -> rd.Dataset:
    ds = _read_documents(sf_dir, ["doc_id", "text", "n_chars"])

    from .agg import round_half_away as round4

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
        n_chars = batch["n_chars"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "distinct_ratio": round4(n_distinct / n_tokens),
                "mean_token_len": round4((n_chars - (n_tokens - 1)) / n_tokens),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_DOC_QUALITY_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')), 4) AS distinct_ratio,
       ROUND((n_chars - (len(string_split(text, ' ')) - 1)) * 1.0
             / len(string_split(text, ' ')), 4) AS mean_token_len
FROM documents
"""


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------

def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Content fingerprint per document (md5 hex — mirrors SQL md5())."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch["text"]
                ],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_DOC_FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def rolling_hash64(text: str, mod: int = (1 << 61) - 1, base: int = 257) -> int:
    """Polynomial rolling hash (Rabin-style) — deterministic, non-crypto."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * base + b) % mod
    return h


def doc_rolling_fingerprint(sf_dir: str) -> rd.Dataset:
    """Rolling-hash fingerprint. SQL-mirrorable on this corpus: the texts are
    pure printable ASCII, so the byte sequence equals per-character code
    points and DuckDB can fold the same recurrence with list_reduce over
    HUGEINT (the oracle below)."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": [rolling_hash64(t) for t in batch["text"]],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


# --------------------------------------------------------------------------
# Language ID — n-gram/stopword-profile heuristic (stateful actor stage)
# --------------------------------------------------------------------------

_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for with as on at by".split()),
    "de": frozenset("der die das und ist nicht mit ein eine zu von für auf".split()),
    "fr": frozenset("le la les et de des un une est pour avec sur dans que".split()),
    "es": frozenset("el la los las y de un una es para con en por que".split()),
}

_CJK_RE = re.compile(r"[一-鿿]")


class LangIdStage:
    """Callable class for map_batches actor pools: profiles compiled once per
    actor in __init__ (the T1-T3 stateful-stage pattern), scored per batch."""

    def __init__(self) -> None:
        self.profiles = _LANG_PROFILES
        self.cjk = _CJK_RE

    def _predict(self, text: str) -> str:
        if self.cjk.search(text):
            return "zh"
        words = text.lower().split()
        if not words:
            return "und"
        best_lang, best_hits = "und", 0
        for lang, stop in self.profiles.items():
            hits = sum(1 for w in words if w in stop)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "predicted_lang": [self._predict(t) for t in batch["text"]],
            }
        )


def langid_predict(sf_dir: str) -> rd.Dataset:
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        LangIdStage, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )


#: the heuristic is SQL-expressible: per-language stopword hit counts via
#: list_filter, argmax with first-strictly-greater-wins tie-break mirrored as
#: an ordered CASE (en beats de beats fr beats es on ties — exactly the
#: python dict-iteration semantics), CJK short-circuit via the same range.
def _langid_sql() -> str:
    def in_list(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang]))

    return f"""
WITH h AS (
  SELECT doc_id, text,
    len(list_filter(string_split(lower(text), ' '), x -> x IN ({in_list('en')}))) AS en_h,
    len(list_filter(string_split(lower(text), ' '), x -> x IN ({in_list('de')}))) AS de_h,
    len(list_filter(string_split(lower(text), ' '), x -> x IN ({in_list('fr')}))) AS fr_h,
    len(list_filter(string_split(lower(text), ' '), x -> x IN ({in_list('es')}))) AS es_h
  FROM documents
)
SELECT doc_id,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN en_h = 0 AND de_h = 0 AND fr_h = 0 AND es_h = 0 THEN 'und'
       WHEN en_h >= de_h AND en_h >= fr_h AND en_h >= es_h THEN 'en'
       WHEN de_h >= fr_h AND de_h >= es_h THEN 'de'
       WHEN fr_h >= es_h THEN 'fr'
       ELSE 'es' END AS predicted_lang
FROM h
"""


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID EVALUATION — the confusion matrix every classifier stage
    ships with: (labeled lang, predicted lang, n docs), predictions from the
    real distributed ``LangIdStage`` actor pool joined back to the corpus
    labels. Scale shape: prediction is the langid map_batches pass with the
    label column carried through; the matrix is one grouped count bounded
    by |langs|² — nothing else shuffles."""
    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])

    class Stage(LangIdStage):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = super().__call__(batch)
            out["lang"] = batch["lang"]
            return out

    pred = ds.map_batches(
        Stage, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )
    agg = grouped_aggregate(
        pred, ["lang", "predicted_lang"], {"n": (None, "count")}
    ).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values(["lang", "predicted_lang"]).reset_index(drop=True)


def _langid_confusion_sql() -> str:
    return f"""
WITH pred AS ({_langid_sql()})
SELECT d.lang, pred.predicted_lang, COUNT(*) AS n
FROM pred JOIN documents d USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


_DOC_ROLLING_FINGERPRINT_SQL = """
SELECT doc_id,
  CASE WHEN length(text) = 0 THEN 0
       ELSE CAST(list_reduce(
              list_transform(string_split(text, ''), c -> CAST(ascii(c) AS HUGEINT)),
              (acc, x) -> (acc * 257 + x) % 2305843009213693951) AS BIGINT)
  END AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
# Corpus-level aggregate: per-(lang, source) token totals
# --------------------------------------------------------------------------

def lang_source_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read_documents(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["lang", "source"]].copy()
        out["n_tokens"] = df["text"].str.count(" ").astype("int64") + 1
        out["n_chars"] = df["n_chars"].astype("int64")
        return out

    agg = grouped_aggregate(
        ds,
        ["lang", "source"],
        {
            "total_tokens": ("n_tokens", "sum"),
            "total_chars": ("n_chars", "sum"),
            "n_docs": (None, "count"),
        },
        prepare=prepare,
    ).to_pandas()
    for c in ("total_tokens", "total_chars", "n_docs"):
        agg[c] = agg[c].astype("int64")
    return agg


_LANG_SOURCE_STATS_SQL = """
SELECT lang, source,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang, source
"""


# --------------------------------------------------------------------------
# PII redaction (emails / phone numbers / IPs → typed placeholders)
# --------------------------------------------------------------------------

# RE2-compatible patterns (pyarrow/DuckDB) that Python `re` reads identically
PII_EMAIL_PAT = r"[a-z0-9]+@[a-z0-9.]+\.[a-z]+"
PII_PHONE_PAT = r"555-[0-9]{4}"
PII_IP_PAT = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+\b"


def pii_redaction(sf_dir: str) -> rd.Dataset:
    """Vectorized PII scrubbing: emails, phone numbers, and IPv4 addresses
    replaced with typed placeholders, with per-document match counts — the
    privacy-filtering stage of a training-data pipeline.

    The synthetic corpus contains no PII, so (twin-corpus style, like the
    dedup family) the query first injects DETERMINISTIC pseudo-PII derived
    from ``doc_id`` — the identical expression appears in the SQL oracle —
    and the operator under test is the redaction itself, checked byte-exact
    on the redacted text. Order of redaction passes matters (emails before
    IPs, so an address inside an email hostname is already gone); both
    engines apply the same order. Pure per-row transform: streams, no
    shuffle, nothing driver-side."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    email_re = re.compile(PII_EMAIL_PAT)
    phone_re = re.compile(PII_PHONE_PAT)
    ip_re = re.compile(PII_IP_PAT)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_id = df["doc_id"].astype("int64")
        text = df["text"].copy()
        # deterministic injection (mirrored verbatim in the SQL oracle)
        m5 = (doc_id % 5 == 0)
        text[m5] = text[m5] + " contact user" + doc_id[m5].astype(str) + "@mail.example.com"
        m7 = (doc_id % 7 == 0)
        text[m7] = text[m7] + " call 555-" + (1000 + doc_id[m7] % 9000).astype(str)
        m11 = (doc_id % 11 == 0)
        text[m11] = (
            text[m11]
            + " from 10.0."
            + (doc_id[m11] % 256).astype(str)
            + "."
            + (doc_id[m11] * 7 % 256).astype(str)
        )
        n_emails = text.str.count(email_re).astype("int64")
        redacted = text.str.replace(email_re, "<EMAIL>", regex=True)
        n_phones = redacted.str.count(phone_re).astype("int64")
        redacted = redacted.str.replace(phone_re, "<PHONE>", regex=True)
        n_ips = redacted.str.count(ip_re).astype("int64")
        redacted = redacted.str.replace(ip_re, "<IP>", regex=True)
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "redacted": redacted,
                "n_emails": n_emails,
                "n_phones": n_phones,
                "n_ips": n_ips,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_PII_REDACTION_SQL = rf"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call 555-' || (1000 + doc_id % 9000)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id * 7 % 256)
                 ELSE '' END AS text
  FROM documents
), pass1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL_PAT}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{PII_EMAIL_PAT}', '<EMAIL>', 'g') AS t
  FROM injected
), pass2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t, '{PII_PHONE_PAT}')) AS BIGINT) AS n_phones,
         regexp_replace(t, '{PII_PHONE_PAT}', '<PHONE>', 'g') AS t
  FROM pass1
)
SELECT doc_id,
       regexp_replace(t, '{PII_IP_PAT}', '<IP>', 'g') AS redacted,
       n_emails, n_phones,
       CAST(len(regexp_extract_all(t, '{PII_IP_PAT}')) AS BIGINT) AS n_ips
FROM pass2
"""


# --------------------------------------------------------------------------
# Feature normalization: per-language length z-scores
# --------------------------------------------------------------------------

def doc_length_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-document z-score of ``n_chars`` within its language — the
    two-pass feature-normalization shape (grouped moments, broadcast, scale
    in place). Moments are EXACT int64 sums (n_chars is integral), so mean
    and variance derive from identical integers in Ray and SQL; the oracle
    computes variance from the same explicit sums, not STDDEV(), making the
    cross-engine float path identical up to the final rounded division."""
    ds = _read_documents(sf_dir, ["doc_id", "lang", "n_chars"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["lang"]].copy()
        x = df["n_chars"].astype("int64")
        out["s"] = x
        out["ss"] = x * x
        return out

    import ray

    from .agg import round_half_away

    moments = grouped_aggregate(
        ds,
        ["lang"],
        {"s": ("s", "sum"), "ss": ("ss", "sum"), "n": (None, "count")},
        prepare=prepare,
    ).to_pandas()
    moments["mean"] = moments["s"] / moments["n"]
    moments["var"] = moments["ss"] / moments["n"] - moments["mean"] ** 2
    stats_ref = ray.put(
        (
            dict(zip(moments["lang"], moments["mean"])),
            dict(zip(moments["lang"], moments["var"])),
        )
    )

    class Scale:
        def __init__(self) -> None:
            self.mean_by_lang, self.var_by_lang = ray.get(stats_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mean = df["lang"].map(self.mean_by_lang).to_numpy()
            var = df["lang"].map(self.var_by_lang).to_numpy()
            z = (df["n_chars"].to_numpy(dtype="float64") - mean) / np.sqrt(var)
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "lang": df["lang"],
                    "z_chars": round_half_away(z),
                }
            )

    out = ds.map_batches(Scale, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_DOC_LENGTH_ZSCORE_SQL = """
WITH m AS (
  SELECT lang,
         SUM(CAST(n_chars AS BIGINT)) AS s,
         SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS ss,
         COUNT(*) AS n
  FROM documents GROUP BY 1
)
SELECT d.doc_id, d.lang,
       ROUND((d.n_chars - m.s * 1.0 / m.n)
             / sqrt(m.ss * 1.0 / m.n - (m.s * 1.0 / m.n) * (m.s * 1.0 / m.n)), 4)
         AS z_chars
FROM documents d JOIN m USING (lang)
"""


# --------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style bag-of-words scoring)
# --------------------------------------------------------------------------

HASH_DIM = 1001  # feature-hash buckets (odd, so weights are sign-balanced)
HASH_OFF = (HASH_DIM - 1) // 2


def _hashed_token_weights(uniques) -> np.ndarray:
    """Deterministic integer weight per unique token — md5-derived so the
    SQL oracle reconstructs it via md5_number_lower. Shared by the
    classifier and the CCNet bucketing so the two can never diverge."""
    w = np.empty(len(uniques), dtype="int64")
    for i, u in enumerate(uniques):
        h = int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
        w[i] = h % HASH_DIM - HASH_OFF
    return w


def doc_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Linear classifier over hashed bag-of-words features — the fastText /
    CCNet quality-filter shape: each token hashes to a bucket whose weight
    is a deterministic function of the hash, the doc's score is the mean
    token weight, and the keep/drop label thresholds the score at 0.

    Here the "trained" weight vector is derived from the hash itself
    (``w = md5_lower64(token) % HASH_DIM - HASH_OFF``) so the oracle can
    reconstruct it in SQL (`md5_number_lower`); swapping in real learned
    weights is a broadcast dict, same topology. Scale shape: embarrassingly
    parallel map_batches; per batch only the UNIQUE tokens are hashed (the
    md5 loop runs |vocab∩batch| times, not |tokens|), and integer weight
    sums make the 0-threshold exact — no float boundary flakes."""
    from .agg import round_half_away as round4

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        flat = toks.explode()
        codes, uniques = pd.factorize(flat.to_numpy())
        w = _hashed_token_weights(uniques)
        per_tok = pd.DataFrame({"doc_id": flat.index, "w": w[codes]})
        g = per_tok.groupby("doc_id", sort=False)["w"].agg(["sum", "size"])
        s = g["sum"].to_numpy(dtype="int64")
        n = g["size"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[g.index.to_numpy()],
                "n_tokens": n,
                "quality_score": round4(s / n),
                "label": np.where(s > 0, "keep", "drop"),
            }
        )

    return ds.map_batches(score, batch_format="pandas").to_pandas()


_DOC_QUALITY_CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), sc AS (
  SELECT doc_id,
         SUM(CAST(md5_number_lower(tok) % {HASH_DIM} AS BIGINT) - {HASH_OFF}) AS s,
         COUNT(*) AS n
  FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       ROUND(CAST(s AS BIGINT) * 1.0 / n, 4) AS quality_score,
       CASE WHEN s > 0 THEN 'keep' ELSE 'drop' END AS label
FROM sc
"""


# --------------------------------------------------------------------------
# Compression-ratio quality signal (zlib)
# --------------------------------------------------------------------------

ZLIB_LEVEL = 6


def doc_compress_ratio(sf_dir: str) -> rd.Dataset:
    """Compression-ratio quality feature (the RefinedWeb/Gopher-family
    repetitiveness signal): boilerplate and template spam compress far
    better than natural prose, so ``compressed/raw`` separates them with one
    cheap pass. Embarrassingly parallel ``map_batches`` — the zlib deflate
    runs at C speed per row, no shuffle, nothing leaves the worker but the
    3-column feature rows. Rows-only by design (SQL has no deflate);
    byte-exact semantics asserted against direct ``zlib.compress`` in
    tests. Returns a streaming Dataset — per-doc output never collects on
    the driver."""
    import zlib

    from .agg import round_half_away as round4

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in batch["text"]]
        comp = np.array(
            [len(zlib.compress(b, ZLIB_LEVEL)) for b in raw], dtype="int64"
        )
        raw_n = np.array([len(b) for b in raw], dtype="int64")
        # empty docs (raw 0) get ratio 0.0 — not inf — so downstream
        # threshold filters classify them deterministically
        ratio = np.divide(
            comp, raw_n, out=np.zeros(len(raw_n), dtype="float64"),
            where=raw_n > 0,
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "raw_bytes": raw_n,
                "comp_bytes": comp,
                "compress_ratio": round4(ratio),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


# --------------------------------------------------------------------------
# CCNet-style per-language head/middle/tail bucketing
# --------------------------------------------------------------------------

#: bucket fractions as exact rationals (numerator over BUCKET_DEN) so the
#: quantile_disc rank ceil(q·n) is integer math — no float-boundary flakes
BUCKET_DEN = 3


def lang_score_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet-style corpus partitioning: per LANGUAGE, split docs into
    head / middle / tail thirds by a model score (CCNet uses LM perplexity;
    here the score is the same integer hashed-bag-of-words sum as
    ``doc_quality_classifier`` so the oracle is exact — a real LM plugs into
    the same seam). Three stages, one tokenize: (1) score each doc once into
    a slim (doc_id, lang, score) table (materialized — 3 fixed-width columns,
    never the text), (2) per-lang tertile cutoffs from a (lang, score) count
    histogram with DuckDB ``quantile_disc`` semantics (value at 1-based rank
    ceil(q·n), exact integer rank math) — the shuffle moves one row per
    distinct (lang, score); if the score domain ever approaches corpus size,
    the mergeable quantile sketch (``sketch.py``) is the bounded-memory
    drop-in, (3) broadcast the |langs|×2 cutoffs and assign buckets
    worker-locally."""
    import ray

    ds = _read_documents(sf_dir, ["doc_id", "lang", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        flat = toks.explode()
        codes, uniques = pd.factorize(flat.to_numpy())
        w = _hashed_token_weights(uniques)
        per_tok = pd.DataFrame({"doc_id": flat.index, "w": w[codes]})
        s = per_tok.groupby("doc_id", sort=False)["w"].sum()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[s.index.to_numpy()],
                "lang": batch["lang"].to_numpy()[s.index.to_numpy()],
                "score": s.to_numpy(dtype="int64"),
            }
        )

    slim = ds.map_batches(score, batch_format="pandas").materialize()

    hist = grouped_aggregate(
        slim, ["lang", "score"], {"cnt": (None, "count")}
    ).to_pandas()
    cuts: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("score")
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["score"].to_numpy()
        n = int(cum[-1])
        ranks = [-(-k * n // BUCKET_DEN) for k in (1, 2)]  # ceil, exact ints
        c1, c2 = (int(vals[np.searchsorted(cum, r)]) for r in ranks)
        cuts[lang] = (c1, c2)
    cuts_ref = ray.put(cuts)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        c1 = df["lang"].map(lambda l: c[l][0]).to_numpy(dtype="int64")
        c2 = df["lang"].map(lambda l: c[l][1]).to_numpy(dtype="int64")
        s = df["score"].to_numpy()
        bucket = np.where(s <= c1, "tail", np.where(s <= c2, "middle", "head"))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"], "bucket": bucket}
        )

    return slim.map_batches(assign, batch_format="pandas")


_LANG_SCORE_BUCKETS_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
), sc AS (
  SELECT doc_id, lang,
         SUM(CAST(md5_number_lower(tok) % {HASH_DIM} AS BIGINT) - {HASH_OFF}) AS s
  FROM toks GROUP BY doc_id, lang
), cuts AS (
  SELECT lang, quantile_disc(s, 1.0/{BUCKET_DEN}) AS c1,
               quantile_disc(s, 2.0/{BUCKET_DEN}) AS c2
  FROM sc GROUP BY lang
)
SELECT doc_id, sc.lang,
       CASE WHEN s <= c1 THEN 'tail'
            WHEN s <= c2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM sc JOIN cuts ON sc.lang = cuts.lang
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Text normalization (NFC + casefold + whitespace collapse)
# --------------------------------------------------------------------------

def doc_normalize(sf_dir: str) -> pd.DataFrame:
    """Canonical text normalization before dedup/hashing — the CCNet-style
    cleanup pass: Unicode NFC composition, lowercasing, whitespace-run
    collapse, edge trim. Reports the normalized text and whether the doc
    changed (the dedup families key on normalized bytes, so `changed` is
    the fraction of the corpus whose raw bytes would have missed their
    duplicates). Embarrassingly parallel vectorized map_batches."""
    import unicodedata

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        raw = df["text"].astype(str)
        norm = pd.Series(
            [unicodedata.normalize("NFC", t) for t in raw], dtype="object"
        ).str.lower()
        norm = norm.str.replace(r"\s+", " ", regex=True).str.strip()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "text_norm": norm.to_numpy(),
                "changed": (norm.to_numpy() != raw.to_numpy()),
            }
        )

    return ds.map_batches(fn, batch_format="pandas").to_pandas()


_DOC_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS text_norm,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) <> text
         AS changed
FROM documents
"""


# --------------------------------------------------------------------------
# Mojibake repair (ftfy-style encoding fix: UTF-8 read back as Latin-1)
# --------------------------------------------------------------------------

#: accented suffix per language — makes every synthetic doc carry real
#: non-ASCII so the round-trip is exercised (the raw corpus is pure ASCII);
#: plain string literals, so the SQL mirror concatenates the same bytes.
_MOJI_WORDS = {
    "en": "naïve",
    "fr": "déjà vu",
    "es": "mañana",
    "de": "Größe",
    "zh": "中文编码",
}


def _mojibake_fix(s: str) -> str | None:
    """Reverse the classic corruption (UTF-8 bytes decoded as Latin-1):
    re-encode as Latin-1 and re-decode as UTF-8. Returns the repaired
    string, or None when the text is NOT mojibake — genuine Latin-1-range
    accents fail the UTF-8 re-decode, CJK can't encode to Latin-1 at all,
    so false positives need adversarial input, not prose."""
    try:
        fixed = s.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return None
    return fixed if fixed != s else None


def fix_mojibake(sf_dir: str) -> rd.Dataset:
    """Encoding-repair pass over a deterministically half-corrupted corpus:
    docs get a language-specific accented suffix, every third doc is then
    mangled by the UTF-8-as-Latin-1 mistake, and the stage detects + fixes
    mojibake per row. The oracle asserts the repaired text is byte-equal
    to the never-corrupted original AND that detection fires exactly on
    the corrupted rows. Embarrassingly parallel map_batches; the repair
    attempt is a cheap two-codec round-trip per row, no shuffle."""
    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        orig = df["text"] + " café " + df["lang"].map(_MOJI_WORDS)
        ids = df["doc_id"].to_numpy()
        served = [
            o.encode("utf-8").decode("latin-1") if int(i) % 3 == 0 else o
            for i, o in zip(ids, orig)
        ]
        fixed, flags = [], []
        for s in served:
            f = _mojibake_fix(s)
            fixed.append(f if f is not None else s)
            flags.append(1 if f is not None else 0)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "was_fixed": np.asarray(flags, dtype="int64"),
                "text": fixed,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_FIX_MOJIBAKE_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS was_fixed,
       text || ' café ' || CASE lang
         WHEN 'en' THEN 'naïve'
         WHEN 'fr' THEN 'déjà vu'
         WHEN 'es' THEN 'mañana'
         WHEN 'de' THEN 'Größe'
         WHEN 'zh' THEN '中文编码'
       END AS text
FROM documents
"""


# --------------------------------------------------------------------------
# Unicode NFC normalization audit
# --------------------------------------------------------------------------


def nfc_normalize_audit(sf_dir: str) -> rd.Dataset:
    """Unicode canonical-normalization pass — the corpus-hygiene step that
    makes visually-identical strings byte-identical BEFORE any hash-based
    dedup/decontam sees them (an NFD 'café' and an NFC 'café' are different
    md5s and different shingles; web text mixes both, e.g. macOS filenames
    and some CMS exports serve NFD). Deterministic fixture: a third of docs
    get a DECOMPOSED suffix (combining acute + the U+212B angstrom sign,
    which NFC maps to U+00C5 — a singleton composition a combining-only
    normalizer misses), a third get the precomposed equivalent (already
    NFC — must NOT be flagged), a third are untouched ASCII. Emits
    (doc_id, was_normalized, text_nfc); the oracle recomputes both with
    DuckDB's ``nfc_normalize``, which is codepoint-exact against Python's
    ``unicodedata`` (verified over composition, singleton, and
    canonical-reordering cases in tests). Embarrassingly parallel
    map_batches, no shuffle."""
    import unicodedata

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        # the two suffix literals RENDER identically but differ in bytes:
        # residue 0 is decomposed (e + U+0301, U+212B), residue 1 is the
        # precomposed NFC form (U+00E9, U+00C5)
        served = [
            t + " café Å" if int(i) % 3 == 0
            else t + " café Å" if int(i) % 3 == 1
            else t
            for i, t in zip(ids, df["text"])
        ]
        out = [unicodedata.normalize("NFC", s) for s in served]
        return pd.DataFrame(
            {
                "doc_id": ids,
                "was_normalized": np.asarray(
                    [1 if o != s else 0 for o, s in zip(out, served)],
                    dtype="int64",
                ),
                "text_nfc": out,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_NFC_NORMALIZE_AUDIT_SQL = """
WITH served AS (
  SELECT doc_id,
         text || CASE doc_id % 3
           WHEN 0 THEN ' cafe' || chr(769) || ' ' || chr(8491)
           WHEN 1 THEN ' caf' || chr(233) || ' ' || chr(197)
           ELSE '' END AS s
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN nfc_normalize(s) <> s THEN 1 ELSE 0 END AS BIGINT)
         AS was_normalized,
       nfc_normalize(s) AS text_nfc
FROM served
"""


# --------------------------------------------------------------------------
# Soft-404 detection (crawl-ops: error pages served with HTTP 200)
# --------------------------------------------------------------------------

#: the served body of a soft-404 capture (every doc_id % 11 == 0)
SOFT404_BODY = (
    "Error 404. The page you requested was not found on this server. "
    "It may have been moved or deleted."
)
#: appended to doc_id % 11 == 1 docs: a GENUINE article that merely quotes
#: an error — the length guard must keep the long ones out of the flag set
SOFT404_QUOTE = " editors note: the archive mirror returned error 404 last week."
SOFT404_MAX_LEN = 200


def soft404_flags(sf_dir: str) -> rd.Dataset:
    """Soft-404 classifier — the crawl-ops filter for error pages served
    with HTTP 200 (no status code to trust, so it must be detected from
    CONTENT): flag = error marker present AND the page is short. The fixture
    serves three deterministic classes so both classifier signals carry
    weight: true soft-404 bodies (residue 0 — marker + short → flagged),
    genuine articles QUOTING an error (residue 1 — marker, flagged only when
    the doc itself is short, so the length guard decides row by row), and
    clean docs (never flagged). The oracle reconstructs flag and served
    length per row from doc_id/n_chars arithmetic — a classifier that drops
    either signal breaks it exactly. Embarrassingly parallel map_batches,
    no shuffle; the marker scan is one vectorized pandas str op."""
    ds = _read_documents(sf_dir, ["doc_id", "text", "n_chars"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        r = ids % 11
        served = df["text"].copy()
        served[r == 0] = SOFT404_BODY
        served[r == 1] = served[r == 1] + SOFT404_QUOTE
        has_marker = served.str.contains("404", regex=False)
        length = served.str.len().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "is_soft404": (has_marker & (length < SOFT404_MAX_LEN)).astype(
                    "int64"
                ),
                "served_len": length,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_SOFT404_FLAGS_SQL = f"""
SELECT doc_id,
       CAST(CASE
         WHEN doc_id % 11 = 0 THEN 1
         WHEN doc_id % 11 = 1
              AND n_chars + {len(SOFT404_QUOTE)} < {SOFT404_MAX_LEN} THEN 1
         ELSE 0 END AS BIGINT) AS is_soft404,
       CAST(CASE
         WHEN doc_id % 11 = 0 THEN {len(SOFT404_BODY)}
         WHEN doc_id % 11 = 1 THEN n_chars + {len(SOFT404_QUOTE)}
         ELSE n_chars END AS BIGINT) AS served_len
FROM documents
"""


# --------------------------------------------------------------------------
# Luhn credit-card PII audit (checksum-validated, not just pattern-matched)
# --------------------------------------------------------------------------

LUHN_CARD_RES = 13  # docs with doc_id % 13 == 0 carry an injected card


def _make_card(d: int) -> str:
    """Deterministic 16-digit card for doc ``d``: 15-digit body from the id,
    a CORRECT Luhn check digit appended for even ids and a corrupted one
    (+1 mod 10) for odd ids — so pattern-matching alone overcounts 2× and
    only checksum validation gets the answer right."""
    body = str(d).rjust(15, "4")
    s = 0
    for i, ch in enumerate(body, start=1):
        dg = int(ch)
        if i % 2 == 1:  # odd left-position = even distance from the right
            v = 2 * dg
            s += v - 9 if v > 9 else v
        else:
            s += dg
    check = (10 - s % 10) % 10
    if d % 2 == 1:
        check = (check + 1) % 10
    return body + str(check)


def luhn_card_audit(sf_dir: str) -> pd.DataFrame:
    """Credit-card PII detection done properly: find 16-digit runs, then
    VALIDATE the Luhn checksum — the step that separates card numbers from
    order ids and phone digits (real pipelines that skip it redact half
    their SKUs). Twin-corpus style like ``pii_redaction``: deterministic
    cards derive from ``doc_id`` (valid for even ids, checksum-broken for
    odd), the identical construction appears in the SQL oracle, and the
    oracle RE-VALIDATES the extracted string through its own digit-sum
    expression — two independent Luhn implementations must agree. Checksum
    math is one vectorized digit-matrix pass per batch; pure map, no
    shuffle."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    card_re = re.compile(r"[0-9]{16}")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_id = df["doc_id"].astype("int64")
        text = df["text"].copy()
        hit = doc_id % LUHN_CARD_RES == 0
        text[hit] = text[hit] + " card " + doc_id[hit].map(_make_card)
        found = text.str.findall(card_re)
        n_cards = found.str.len().astype("int64")
        flat = [c for cards in found for c in cards]
        if flat:
            a = (
                np.frombuffer("".join(flat).encode(), dtype=np.uint8)
                .reshape(-1, 16)
                .astype(np.int64)
                - 48
            )
            b = a.copy()
            b[:, -2::-2] *= 2
            b[b > 9] -= 9
            valid = (b.sum(axis=1) % 10) == 0
        else:
            valid = np.array([], dtype=bool)
        n_valid = np.zeros(len(df), dtype="int64")
        rows = np.repeat(np.arange(len(df)), n_cards.to_numpy())
        np.add.at(n_valid, rows, valid.astype("int64"))
        out = pd.DataFrame(
            {"doc_id": doc_id, "n_cards": n_cards, "n_valid": n_valid}
        )
        return out[out["n_cards"] > 0]

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _luhn_sql() -> str:
    def sum_over(expr: str) -> str:
        terms = []
        for i in range(1, 16):
            dig = f"CAST(substring({expr},{i},1) AS INT)"
            if i % 2 == 1:
                terms.append(
                    f"CASE WHEN 2*{dig}>9 THEN 2*{dig}-9 ELSE 2*{dig} END"
                )
            else:
                terms.append(dig)
        return " + ".join(terms)

    return f"""
WITH b AS (
  SELECT doc_id, lpad(CAST(doc_id AS VARCHAR), 15, '4') AS body
  FROM documents WHERE doc_id % {LUHN_CARD_RES} = 0
), c AS (
  SELECT doc_id, body, (10 - (({sum_over('body')}) % 10)) % 10 AS check0
  FROM b
), card AS (
  SELECT doc_id,
         body || CAST(CASE WHEN doc_id % 2 = 1 THEN (check0 + 1) % 10
                           ELSE check0 END AS VARCHAR) AS card
  FROM c
), extracted AS (
  -- re-extract from the injected text and RE-VALIDATE independently
  SELECT doc_id, regexp_extract('pad ' || card || ' pad', '[0-9]{{16}}') AS m
  FROM card
)
SELECT doc_id, CAST(1 AS BIGINT) AS n_cards,
       CAST(CASE WHEN CAST(substring(m, 16, 1) AS INT)
                      = (10 - (({sum_over('substring(m, 1, 15)')}) % 10)) % 10
                 THEN 1 ELSE 0 END AS BIGINT) AS n_valid
FROM extracted ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Snapshot token drift (distribution-shift monitoring between recrawls)
# --------------------------------------------------------------------------


def snapshot_token_drift(sf_dir: str) -> pd.DataFrame:
    """Distribution-shift monitor between two crawl snapshots: per-token
    Jensen-Shannon divergence contributions (in ppm, natural log) between
    the token distributions of the OLD (even doc ids) and NEW (odd) halves
    — the drift dashboard a data-ops team watches so a recrawl that
    changed the corpus's language mix or boilerplate profile is caught
    before training. One partial+final aggregate keyed (side, token) —
    bounded by 2×vocabulary, never pages — then a driver-side divergence
    over the compact table; emitting every token (not a top-k) keeps the
    result float-tie-proof and lets the reader slice any way."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def side_tokens(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        flat = (
            np.concatenate(toks.to_numpy())
            if len(df)
            else np.array([], dtype=object)
        )
        side = np.repeat((df["doc_id"].to_numpy() % 2), lens)
        return pd.DataFrame({"side": side, "token": flat})

    counts = grouped_aggregate(
        docs, ["side", "token"], {"n": (None, "count")}, prepare=side_tokens
    ).to_pandas()
    piv = counts.pivot_table(
        index="token", columns="side", values="n", aggfunc="sum", fill_value=0
    )
    c0 = piv[0].to_numpy("int64") if 0 in piv.columns else np.zeros(len(piv), "int64")
    c1 = piv[1].to_numpy("int64") if 1 in piv.columns else np.zeros(len(piv), "int64")
    p0, p1 = c0 / c0.sum(), c1 / c1.sum()
    m = (p0 + p1) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = np.where(p0 > 0, p0 * np.log(np.where(p0 > 0, p0 / m, 1.0)), 0.0)
        t1 = np.where(p1 > 0, p1 * np.log(np.where(p1 > 0, p1 / m, 1.0)), 0.0)
    js_ppm = np.round(1_000_000 * (0.5 * t0 + 0.5 * t1), 4)
    out = pd.DataFrame({"token": piv.index.to_numpy(), "js_ppm": js_ppm})
    return out.sort_values("token").reset_index(drop=True)


_SNAPSHOT_TOKEN_DRIFT_SQL = """
WITH tok AS (
  SELECT doc_id % 2 AS side, unnest(string_split(text, ' ')) AS token
  FROM documents
), c AS (SELECT side, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
tot AS (SELECT side, SUM(n) AS t FROM c GROUP BY 1),
p AS (
  SELECT token,
         COALESCE(MAX(CASE WHEN side = 0 THEN n END), 0) * 1.0
           / (SELECT t FROM tot WHERE side = 0) AS p0,
         COALESCE(MAX(CASE WHEN side = 1 THEN n END), 0) * 1.0
           / (SELECT t FROM tot WHERE side = 1) AS p1
  FROM c GROUP BY token
)
SELECT token,
       ROUND(1000000 * (
         0.5 * CASE WHEN p0 > 0 THEN p0 * ln(p0 / ((p0 + p1) / 2)) ELSE 0 END
       + 0.5 * CASE WHEN p1 > 0 THEN p1 * ln(p1 / ((p0 + p1) / 2)) ELSE 0 END
       ), 4) AS js_ppm
FROM p ORDER BY token
"""


# --------------------------------------------------------------------------
# Invisible-character audit (zero-width + bidi controls)
# --------------------------------------------------------------------------

#: zero-width characters: ZWSP/ZWNJ/ZWJ/WJ + BOM-as-ZWNBSP
_ZERO_WIDTH = "\u200b\u200c\u200d\u2060\ufeff"
#: bidi override/embedding/isolate controls (Trojan-Source vector)
_BIDI = "\u202a\u202b\u202c\u202d\u202e\u2066\u2067\u2068\u2069"
_INVIS_RE = re.compile(f"[{_ZERO_WIDTH}{_BIDI}]")
_BIDI_RE = re.compile(f"[{_BIDI}]")


def scrub_invisible(s: str) -> str:
    """Remove zero-width and bidi-control characters — the curation scrub
    for invisible-text injection (hidden tokens, Trojan-Source reordering,
    SEO keyword hiding)."""
    return _INVIS_RE.sub("", s)


def invisible_char_audit(sf_dir: str) -> pd.DataFrame:
    """Audit + scrub of invisible characters over a deterministically
    poisoned corpus (every 7th doc gets a ZWSP inside its first word;
    every 13th a bidi override pair; the rest are clean): per doc the
    zero-width and bidi counts and the scrubbed length, which must equal
    the clean text's length — proving the scrub removes exactly the
    injection and nothing else. Pure per-batch map, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        poisoned = []
        for d, t in zip(df["doc_id"], df["text"]):
            d, t = int(d), str(t)
            if d % 7 == 0 and len(t) >= 2:
                t = t[:1] + "\u200b" + t[1:]
            if d % 13 == 0 and t:
                t = "\u202e" + t + "\u202c"
            poisoned.append(t)
        ser = pd.Series(poisoned)
        n_zw = ser.str.count(f"[{_ZERO_WIDTH}]").astype("int64")
        n_bidi = ser.str.count(f"[{_BIDI}]").astype("int64")
        scrubbed = ser.map(scrub_invisible)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_zero_width": n_zw,
                "n_bidi": n_bidi,
                "scrubbed_len": scrubbed.str.len().astype("int64"),
            }
        )

    out = docs.map_batches(audit, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_INVISIBLE_CHAR_AUDIT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 AND length(text) >= 2 THEN 1 ELSE 0 END
         AS n_zero_width,
       CASE WHEN doc_id % 13 = 0 AND length(text) > 0 THEN 2 ELSE 0 END
         AS n_bidi,
       length(text) AS scrubbed_len
FROM documents
"""


# --------------------------------------------------------------------------
# Multi-phrase blocklist scan (Aho–Corasick)
# --------------------------------------------------------------------------

#: multi-WORD phrases (the single-token case is word_blocklist_scores);
#: chosen from the synth vocabulary so hits actually occur
_PHRASE_BLOCKLIST = (
    "key order",
    "table scan",
    "group by",
    "slow query plan",
)


class AhoCorasick:
    """Classic Aho–Corasick automaton: one pass over the text finds every
    occurrence of every pattern simultaneously — the right shape for large
    blocklists where per-pattern scans would be O(patterns × text). Built
    once (per actor), goto/fail/output tables as plain dicts/lists."""

    def __init__(self, patterns: list[str]) -> None:
        self.patterns = list(patterns)
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for pid, pat in enumerate(self.patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            out[s].append(pid)
        fail = [0] * len(goto)
        from collections import deque

        q = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
                out[s].extend(out[fail[s]])
        self._goto, self._fail, self._out = goto, fail, out

    def count_hits(self, text: str) -> list[int]:
        """Occurrence count per pattern (overlaps counted, like LIKE scans
        at every offset)."""
        counts = [0] * len(self.patterns)
        s = 0
        goto, fail, out = self._goto, self._fail, self._out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for pid in out[s]:
                counts[pid] += 1
        return counts


class PhraseBlocklistStage:
    """Actor-pool stage: automaton built ONCE per actor (the stateful-
    setup pattern — for real blocklists this is thousands of phrases),
    one linear scan per document."""

    def __init__(self, patterns: tuple[str, ...] = _PHRASE_BLOCKLIST) -> None:
        self.ac = AhoCorasick(list(patterns))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, t in zip(df["doc_id"], df["text"]):
            for pid, n in enumerate(self.ac.count_hits(str(t))):
                if n:
                    rows.append((int(d), self.ac.patterns[pid], n))
        out = pd.DataFrame(rows, columns=["doc_id", "phrase", "n_hits"])
        return out.astype({"doc_id": "int64", "n_hits": "int64"})


def phrase_blocklist_hits(sf_dir: str) -> pd.DataFrame:
    """Multi-word blocklist scan over the corpus: every phrase found in one
    Aho–Corasick pass per document (vs O(patterns) LIKE scans), one row
    per (doc, phrase) with the occurrence count."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    out = docs.map_batches(
        PhraseBlocklistStage,
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 4),
    ).to_pandas()
    return out.sort_values(["doc_id", "phrase"]).reset_index(drop=True)


def _phrase_blocklist_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT doc_id, '{p}' AS phrase, "
        f"(length(text) - length(replace(text, '{p}', '')))"
        f" // length('{p}') AS n_hits FROM documents"
        for p in _PHRASE_BLOCKLIST
    )
    return f"SELECT doc_id, phrase, CAST(n_hits AS BIGINT) AS n_hits FROM ({selects}) WHERE n_hits > 0"


# --------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, §2.2) with per-rule attribution
# --------------------------------------------------------------------------

#: served page = the doc text as one good line plus planted violations, all
#: deterministic residues so the SQL mirror reconstructs every line:
#:   d%3==0  → a line WITHOUT terminal punctuation        (line dropped)
#:   d%4==1  → a line with fewer than 5 words             (line dropped)
#:   d%5==2  → a line containing "javascript"             (line dropped)
#:   d%7==3  → a "{" line                                 (whole DOC dropped)
#:   d%11==4 → a "lorem ipsum" line                       (whole DOC dropped)
_C4_NO_PUNCT = "breaking update posted by the editorial desk this morning"
_C4_SHORT = "Read more here."
_C4_JS = "Please enable javascript to view the comments powered by our partner."
_C4_BRACE = "function(){ window.dataLayer.push(arguments); }"
_C4_LOREM = "Lorem ipsum dolor sit amet, consectetur adipiscing elit."


def _c4_served_lines(d: int, text: str) -> list[str]:
    lines = [text + "."]
    if d % 3 == 0:
        lines.append(_C4_NO_PUNCT)
    if d % 4 == 1:
        lines.append(_C4_SHORT)
    if d % 5 == 2:
        lines.append(_C4_JS)
    if d % 7 == 3:
        lines.append(_C4_BRACE)
    if d % 11 == 4:
        lines.append(_C4_LOREM)
    return lines


def c4_line_filters(sf_dir: str) -> rd.Dataset:
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2 — the T5 corpus),
    applied line-by-line with per-rule attribution over a served page
    synthesized from each doc with planted violations:

      LINE rules — keep only lines that (a) end in terminal punctuation
      [.!?"], (b) have ≥ 5 words, (c) do not contain "javascript";
      DOCUMENT rules — drop any page containing "{" or the phrase
      "lorem ipsum" (case-insensitive) entirely.

    Emits (doc_id, doc_kept, n_kept, n_dropped, first_rule, clean_text):
    ``first_rule`` is the FIRST rule that fired anywhere on the page
    (doc-level rules win, then line rules in a/b/c order; 'none' for clean
    pages) — the attribution a corpus-curation report needs to say WHY
    yield dropped. Pure map over the corpus; no shuffle at any scale."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, text in zip(df["doc_id"], df["text"]):
            d = int(d)
            lines = _c4_served_lines(d, text)
            low = [ln.lower() for ln in lines]
            if any("{" in ln for ln in lines):
                rows.append((d, 0, 0, len(lines), "brace", ""))
                continue
            if any("lorem ipsum" in ln for ln in low):
                rows.append((d, 0, 0, len(lines), "lorem", ""))
                continue
            kept, first = [], "none"
            for ln, lo in zip(lines, low):
                if not ln.rstrip().endswith((".", "!", "?", '"')):
                    first = "punct" if first == "none" else first
                elif len(ln.split()) < 5:
                    first = "short" if first == "none" else first
                elif "javascript" in lo:
                    first = "javascript" if first == "none" else first
                else:
                    kept.append(ln)
            rows.append(
                (d, 1, len(kept), len(lines) - len(kept), first,
                 "\n".join(kept))
            )
        out = pd.DataFrame(
            rows,
            columns=[
                "doc_id", "doc_kept", "n_kept", "n_dropped", "first_rule",
                "clean_text",
            ],
        )
        return out.astype(
            {"doc_id": "int64", "doc_kept": "int64", "n_kept": "int64",
             "n_dropped": "int64"}
        )

    return ds.map_batches(fn, batch_format="pandas")


def _c4_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % 7 = 3 AS INT) AS has_brace,
         CAST(doc_id % 11 = 4 AS INT) AS has_lorem,
         CAST(doc_id % 3 = 0 AS INT) AS has_punct,
         CAST(doc_id % 4 = 1 AS INT) AS has_short,
         CAST(doc_id % 5 = 2 AS INT) AS has_js,
         text
  FROM documents
), n AS (
  SELECT *, 1 + has_punct + has_short + has_js + has_brace + has_lorem
           AS n_lines
  FROM base
)
SELECT doc_id,
       CAST(CASE WHEN has_brace + has_lorem > 0 THEN 0 ELSE 1 END AS BIGINT)
         AS doc_kept,
       CAST(CASE WHEN has_brace + has_lorem > 0 THEN 0
            ELSE 1 END AS BIGINT) AS n_kept,
       CAST(CASE WHEN has_brace + has_lorem > 0 THEN n_lines
            ELSE n_lines - 1 END AS BIGINT) AS n_dropped,
       CASE WHEN has_brace = 1 THEN 'brace'
            WHEN has_lorem = 1 THEN 'lorem'
            WHEN has_punct = 1 THEN 'punct'
            WHEN has_short = 1 THEN 'short'
            WHEN has_js = 1 THEN 'javascript'
            ELSE 'none' END AS first_rule,
       CASE WHEN has_brace + has_lorem > 0 THEN ''
            ELSE text || '.' END AS clean_text
FROM n ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Flesch reading ease — the classic readability score as a corpus filter
# signal (very low scores flag machine-generated / keyword-stuffed pages)
# --------------------------------------------------------------------------


def flesch_reading_ease(sf_dir: str) -> pd.DataFrame:
    """Per-document Flesch reading ease:
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``, with
    syllables estimated as vowel-group runs (min 1 per token — the standard
    heuristic) and sentences as ``[.!?]+`` runs (min 1). All three counts
    use the same token/regex definitions as the SQL mirror, and the final
    float expression is evaluated in the same operation order, so the
    score is bit-identical to DuckDB's DOUBLE arithmetic. Pure per-doc
    map, no shuffle."""
    import re as _re

    # Explicit whitespace class shared verbatim with the SQL mirror: Python's
    # ASCII \s includes \x0b (vertical tab) but RE2/DuckDB's does not, so
    # relying on the engines' \s definitions coinciding would split tokens
    # differently on \v-bearing text. [ \t\n\f\r] is the exact intersection.
    tok_re = _re.compile(r"[^ \t\n\f\r]+")
    vowel_re = _re.compile(r"[aeiouy]+")
    sent_re = _re.compile(r"[.!?]+")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, t in zip(df["doc_id"], df["text"]):
            low = str(t).lower()
            toks = tok_re.findall(low)
            w = max(1, len(toks))
            s = max(1, len(sent_re.findall(low)))
            syl = sum(max(1, len(vowel_re.findall(tok))) for tok in toks)
            fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
            rows.append((int(d), w, s, syl, fre))
        return pd.DataFrame(
            rows, columns=["doc_id", "n_words", "n_sentences", "n_syllables", "fre"]
        ).astype(
            {"doc_id": "int64", "n_words": "int64", "n_sentences": "int64",
             "n_syllables": "int64"}
        )

    out = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_FLESCH_SQL = """
WITH c AS (
  SELECT doc_id,
         GREATEST(1, len(regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r]+')))
           AS n_words,
         GREATEST(1, len(regexp_extract_all(lower(text), '[.!?]+')))
           AS n_sentences,
         COALESCE(list_sum(list_transform(
           regexp_extract_all(lower(text), '[^ \\t\\n\\f\\r]+'),
           w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))
         )), 0) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       206.835 - 1.015 * (n_words / n_sentences)
               - 84.6 * (n_syllables / n_words) AS fre
FROM c ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "flesch_reading_ease": flesch_reading_ease,
    "c4_line_filters": c4_line_filters,
    "phrase_blocklist_hits": phrase_blocklist_hits,
    "invisible_char_audit": invisible_char_audit,
    "snapshot_token_drift": snapshot_token_drift,
    "luhn_card_audit": luhn_card_audit,
    "fix_mojibake": fix_mojibake,
    "nfc_normalize_audit": nfc_normalize_audit,
    "soft404_flags": soft404_flags,
    "doc_normalize": doc_normalize,
    "doc_quality_classifier": doc_quality_classifier,
    "lang_score_buckets": lang_score_buckets,
    "doc_compress_ratio": doc_compress_ratio,
    "pii_redaction": pii_redaction,
    "doc_length_zscore": doc_length_zscore,
    "doc_token_stats": doc_token_stats,
    "doc_quality": doc_quality,
    "doc_fingerprint": doc_fingerprint,
    "doc_rolling_fingerprint": doc_rolling_fingerprint,
    "langid_predict": langid_predict,
    "langid_confusion": langid_confusion,
    "lang_source_stats": lang_source_stats,
}

ORACLES: dict[str, str] = {
    "flesch_reading_ease": _FLESCH_SQL,
    "phrase_blocklist_hits": _phrase_blocklist_sql(),
    "invisible_char_audit": _INVISIBLE_CHAR_AUDIT_SQL,
    "snapshot_token_drift": _SNAPSHOT_TOKEN_DRIFT_SQL,
    "luhn_card_audit": _luhn_sql(),
    "fix_mojibake": _FIX_MOJIBAKE_SQL,
    "nfc_normalize_audit": _NFC_NORMALIZE_AUDIT_SQL,
    "c4_line_filters": _c4_sql(),
    "soft404_flags": _SOFT404_FLAGS_SQL,
    "doc_normalize": _DOC_NORMALIZE_SQL,
    "doc_quality_classifier": _DOC_QUALITY_CLASSIFIER_SQL,
    "lang_score_buckets": _LANG_SCORE_BUCKETS_SQL,
    "pii_redaction": _PII_REDACTION_SQL,
    "doc_length_zscore": _DOC_LENGTH_ZSCORE_SQL,
    "doc_token_stats": _DOC_TOKEN_STATS_SQL,
    "doc_quality": _DOC_QUALITY_SQL,
    "doc_fingerprint": _DOC_FINGERPRINT_SQL,
    "doc_rolling_fingerprint": _DOC_ROLLING_FINGERPRINT_SQL,
    "langid_predict": _langid_sql(),
    "langid_confusion": _langid_confusion_sql(),
    "lang_source_stats": _LANG_SOURCE_STATS_SQL,
}

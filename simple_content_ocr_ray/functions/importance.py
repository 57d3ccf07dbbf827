"""DSIR-style importance resampling (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023 — public method).

Given a small TARGET domain (here: the ``lang = 'en'`` slice stands in for
"formal high-quality text"; a real run plugs in any target table) and the
RAW corpus, DSIR scores every raw document by the log-likelihood ratio of
its hashed n-gram features under the target vs the raw bag-of-ngram
distributions, then resamples documents proportionally to those importance
weights. It is the standard public recipe for tilting a web-scale corpus
toward a target domain without training a model.

Scale shape (the whole point at 100 TB):

* pass 1 builds BOTH feature distributions in one ``map_batches`` over the
  corpus — each batch emits at most ``DSIR_BUCKETS`` partial count rows
  (bucketed feature hashing bounds the "vocabulary" at 512 regardless of
  corpus size), merged by the adaptive partial+final aggregate. Nothing
  larger than 512 rows ever reaches the driver.
* the per-bucket log-ratio table (512 int64s) is broadcast via ``ray.put``
  once and read inside every scoring task — never re-shipped per batch.
* pass 2 scores documents embarrassingly parallel: per batch only the
  UNIQUE features are md5-hashed (Zipf makes |vocab ∩ batch| ≪ |tokens|),
  and per-doc sums are INTEGER micro-units, so the result is exact and
  order-free — no float-association drift between Ray's batch order and
  the SQL oracle's group order.
* resampling is the Gumbel-top-k trick (Kool et al. 2019, public): adding
  a deterministic md5-derived Gumbel to each log-weight and taking the
  global top-k draws k documents WITHOUT replacement proportionally to
  softmax(log w) — selection becomes a stateless per-row key plus the
  existing local-then-final distributed top-k. No RNG state, reproducible
  and resume-safe on any partitioning.

Reference scope note: the reference repo (tendant/simple-content-ocr) has
no corpus-curation layer; this module is part of the round brief's
training-data extensions, same registry/oracle contract as every operator.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import grouped_aggregate, topk

#: feature-hash buckets for the n-gram distributions. 512 keeps the
#: distribution tables trivially broadcastable (4 KiB of int64) while the
#: birthday-collision smoothing is exactly what hashed DSIR prescribes.
DSIR_BUCKETS = 512
#: log-ratio quantization: 1e-6 units in int64 — per-doc sums stay exact
#: (a doc needs ~10^12 features to overflow) and bit-identical to the SQL
#: oracle's BIGINT sum regardless of summation order.
DSIR_SCALE = 1_000_000
#: the stand-in target domain: the corpus' own English slice.
DSIR_TARGET_LANG = "en"
#: documents drawn by the Gumbel-top-k resample.
DSIR_SAMPLE_K = 50
#: Gumbel uniforms come from 53-bit md5 slices: u = (h % 2^53 + 0.5) / 2^53.
_U_DENOM = 1 << 53


def _md5_lower64(values) -> np.ndarray:
    """Lower 64 bits (little-endian) of md5 — the repo-wide hash that
    DuckDB mirrors exactly as ``md5_number_lower``. Returns uint64."""
    out = np.empty(len(values), dtype="uint64")
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[8:16], "little")
    return out


def _feature_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Explode each doc's text into its DSIR features (word unigrams +
    adjacent-word bigrams, occurrence-counted) with the doc's batch-local
    row position as the index. Vectorized: one explode, one shifted concat;
    the only Python-level loop anywhere is md5 over UNIQUE features."""
    toks = df["text"].str.split(" ")
    flat = toks.explode()
    pos = flat.index.to_numpy()
    uni = flat.to_numpy()
    if len(uni) > 1:
        left = pd.Series(uni[:-1], index=pos[:-1])
        right = pd.Series(uni[1:], index=pos[:-1])
        big = (left + " " + right)[pos[:-1] == pos[1:]]
        feats = pd.concat([flat, big])
    else:
        feats = flat
    return feats.to_frame(name="feat")


def _bucket_codes(feats: pd.Series) -> np.ndarray:
    """md5 bucket id per feature occurrence, hashing each unique feature once."""
    codes, uniques = pd.factorize(feats.to_numpy())
    buckets = (_md5_lower64(uniques) % DSIR_BUCKETS).astype("int64")
    return buckets[codes]


def _bucket_counts(sf_dir: str) -> pd.DataFrame:
    """Pass 1: per-bucket raw-corpus and target-slice feature counts.
    ≤ DSIR_BUCKETS rows per batch leave each task; the final merge is the
    shared adaptive partial+final aggregate."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "lang"]
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        ff = _feature_frame(df)
        b = _bucket_codes(ff["feat"])
        is_tgt = (
            df["lang"].to_numpy()[ff.index.to_numpy()] == DSIR_TARGET_LANG
        ).astype("int64")
        return pd.DataFrame({"bucket": b, "cq": np.ones(len(b), dtype="int64"), "ct": is_tgt})

    return grouped_aggregate(
        ds, ["bucket"], {"cq": ("cq", "sum"), "ct": ("ct", "sum")}, prepare=prepare
    ).to_pandas()


def _log_ratio_micro(counts: pd.DataFrame) -> np.ndarray:
    """Smoothed per-bucket log p_target/p_raw in int64 micro-units,
    half-away rounding (DuckDB ROUND semantics). Buckets no feature hashed
    into get the pure-smoothing ratio, same as the SQL mirror's outer join."""
    cq = np.zeros(DSIR_BUCKETS, dtype="int64")
    ct = np.zeros(DSIR_BUCKETS, dtype="int64")
    idx = counts["bucket"].to_numpy(dtype="int64")
    cq[idx] = counts["cq"].to_numpy(dtype="int64")
    ct[idx] = counts["ct"].to_numpy(dtype="int64")
    nq = float(cq.sum())
    nt = float(ct.sum())
    lr = np.log((ct + 1.0) / (nt + DSIR_BUCKETS)) - np.log(
        (cq + 1.0) / (nq + DSIR_BUCKETS)
    )
    scaled = lr * DSIR_SCALE
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype("int64")


def dsir_doc_weights(sf_dir: str) -> rd.Dataset:
    """Per-document DSIR log-importance weight over hashed unigram+bigram
    features: ``logw_micro = Σ_features round(1e6 · ln(p_tgt/p_raw))`` as an
    exact int64, plus the feature count. Two bounded passes (distribution
    build, then stateless scoring under a 4 KiB broadcast table); the
    per-doc output streams — nothing collects on the driver."""
    lri_ref = ray.put(_log_ratio_micro(_bucket_counts(sf_dir)))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lri = ray.get(lri_ref)
        ff = _feature_frame(df)
        w = lri[_bucket_codes(ff["feat"])]
        g = pd.DataFrame({"i": ff.index.to_numpy(), "w": w}).groupby("i", sort=False)[
            "w"
        ].agg(["sum", "size"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[g.index.to_numpy()],
                "n_feats": g["size"].to_numpy(dtype="int64"),
                "logw_micro": g["sum"].to_numpy(dtype="int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def dsir_resample(sf_dir: str) -> pd.DataFrame:
    """Gumbel-top-k importance resample: draw ``DSIR_SAMPLE_K`` documents
    without replacement with probability ∝ exp(logw). The Gumbel noise is a
    pure function of doc_id (md5 → 53-bit uniform → −ln(−ln u)), so the draw
    is deterministic, partition-independent, and mirrored exactly by the SQL
    oracle; selection is the shared distributed top-k (local candidates,
    bounded final — the corpus never sorts globally)."""
    weights = dsir_doc_weights(sf_dir)

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_lower64(df["doc_id"].astype("str").to_numpy())
        u = ((h % _U_DENOM).astype("float64") + 0.5) / _U_DENOM
        gumbel = -np.log(-np.log(u))
        df = df[["doc_id", "logw_micro"]].copy()
        df["key"] = df["logw_micro"].to_numpy(dtype="float64") / DSIR_SCALE + gumbel
        return df

    keyed = weights.map_batches(add_key, batch_format="pandas")
    out = topk(keyed, ["key"], DSIR_SAMPLE_K).to_pandas()
    from .agg import round_half_away

    out["key"] = round_half_away(out["key"])
    return (
        out.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "logw_micro", "key"]
        ]
    )


_DSIR_FEATS_SQL = f"""
  SELECT doc_id, lang,
         CAST(md5_number_lower(f.feat) % {DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (
    SELECT doc_id, lang,
           unnest(list_concat(
             toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]))) AS feat
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
  ) AS f
"""

_DSIR_RATIO_SQL = f"""
  c AS (
    SELECT bucket, COUNT(*) AS cq,
           SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct
    FROM feats GROUP BY 1
  ), tot AS (SELECT SUM(cq) AS nq, SUM(ct) AS nt FROM c),
  r AS (
    SELECT bucket,
           CAST(ROUND((ln((ct + 1.0) / (nt + {DSIR_BUCKETS}.0))
                       - ln((cq + 1.0) / (nq + {DSIR_BUCKETS}.0)))
                      * {DSIR_SCALE}, 0) AS BIGINT) AS lri
    FROM c CROSS JOIN tot
  )
"""

_DSIR_DOC_WEIGHTS_SQL = f"""
WITH feats AS ({_DSIR_FEATS_SQL}),
{_DSIR_RATIO_SQL}
SELECT feats.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(r.lri) AS BIGINT) AS logw_micro
FROM feats JOIN r USING (bucket)
GROUP BY 1
"""

_DSIR_RESAMPLE_SQL = f"""
WITH feats AS ({_DSIR_FEATS_SQL}),
{_DSIR_RATIO_SQL},
w AS (
  SELECT feats.doc_id, CAST(SUM(r.lri) AS BIGINT) AS logw_micro
  FROM feats JOIN r USING (bucket) GROUP BY 1
),
keyed AS (
  SELECT doc_id, logw_micro,
         logw_micro / {DSIR_SCALE}.0
           - ln(-ln((md5_number_lower(CAST(doc_id AS VARCHAR)) % {_U_DENOM}
                     + 0.5) / {_U_DENOM})) AS key
  FROM w
)
SELECT doc_id, logw_micro, ROUND(key, 4) AS key
FROM (SELECT * FROM keyed ORDER BY key DESC LIMIT {DSIR_SAMPLE_K})
ORDER BY doc_id
"""

QUERIES = {
    "dsir_doc_weights": dsir_doc_weights,
    "dsir_resample": dsir_resample,
}

ORACLES = {
    "dsir_doc_weights": _DSIR_DOC_WEIGHTS_SQL,
    "dsir_resample": _DSIR_RESAMPLE_SQL,
}

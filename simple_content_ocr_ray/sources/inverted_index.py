"""Sharded inverted-index layout: token → postings as hash-partitioned
Parquet — the storage half of corpus SEARCH at 100 TB.

``functions/search.py`` computes BM25/TF-IDF with per-query corpus passes;
that is right for ad-hoc scoring but a serving/analysis loop that probes
many terms wants the classic materialized index instead: one build pass,
then each lookup touches ``1/n_shards`` of the data plus Parquet predicate
pushdown — the same prune-at-the-read discipline as the bucketed /
range-clustered / Z-order layouts in this package.

Layout: ``out_dir/shard=<md5(token) % n_shards>/*.parquet`` with rows
(token, doc_id, tf). The shard hash is md5-based so every worker and every
later session derives identical routing with no shared state; within a
shard, files are sorted by token (the build pass sorts per shard-batch) so
row-group token stats make the pushdown selective.

Scale shape:
- build: one ``map_batches`` pass — per-batch token explode + per-(token,
  doc) tf counts (vocabulary-bounded partials) — into ONE hive-partitioned
  distributed write; no driver materialization, resumable at partition
  granularity via ``state/manifest.py`` like every layout here.
- lookup: reads ONLY the shards its terms hash to, with a pushed-down
  ``token IN (...)`` filter; cost is per-term postings, never corpus size.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Iterable

import numpy as np
import pandas as pd
import ray.data as rd

N_SHARDS = 16


def token_shard(token: str, n_shards: int = N_SHARDS) -> int:
    """Deterministic, process-independent shard of a token (md5 prefix)."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big") % n_shards


def build_inverted_index(
    docs: rd.Dataset, out_dir: str, n_shards: int = N_SHARDS
) -> None:
    """One distributed pass: (doc_id, text) → hive-partitioned postings
    ``shard=<i>/`` with rows (token, doc_id, tf), token-sorted per file."""

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
                "token": np.concatenate(toks.to_numpy()) if lens.sum() else [],
            }
        )
        g = (
            flat.groupby(["token", "doc_id"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        # vocabulary-bounded md5 work: hash each DISTINCT token once
        vocab = {t: token_shard(t, n_shards) for t in g["token"].unique()}
        g["shard"] = g["token"].map(vocab).astype("int64")
        g["tf"] = g["tf"].astype("int64")
        return g.sort_values(["shard", "token"]).reset_index(drop=True)

    docs.map_batches(postings, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["shard"]
    )


def index_lookup(
    index_dir: str, terms: Iterable[str], n_shards: int = N_SHARDS
) -> rd.Dataset:
    """Postings for ``terms``: reads only the shards the terms hash to,
    with the token predicate pushed into the Parquet scan."""
    import pyarrow.dataset as pads

    by_shard: dict[int, list[str]] = {}
    for t in terms:
        by_shard.setdefault(token_shard(t, n_shards), []).append(t)
    parts = []
    for shard, shard_terms in sorted(by_shard.items()):
        path = os.path.join(index_dir, f"shard={shard}")
        if not os.path.exists(path):
            continue
        parts.append(
            rd.read_parquet(
                path,
                columns=["token", "doc_id", "tf"],
                filter=pads.field("token").isin(shard_terms),
            )
        )
    if not parts:
        return rd.from_items([]).limit(0)
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


# --------------------------------------------------------------------------
# Oracled query
# --------------------------------------------------------------------------

#: probe terms: frequent corpus words + one guaranteed miss
LOOKUP_TERMS = ["scan", "window", "merge", "xyzzy-missing"]


def _index_cache_dir(sf_dir: str) -> str:
    docs_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(docs_path)
    key = f"{os.path.basename(os.path.normpath(sf_dir))}_{st.st_mtime_ns}_{st.st_size}_s{N_SHARDS}"
    return os.path.join("/tmp/scor_inverted_index", key)


def inverted_index_lookup(sf_dir: str) -> pd.DataFrame:
    """Build-once (cached per corpus fingerprint), then a pruned lookup of
    the probe terms → per-term document frequency and total term count.
    The build is the distributed pass; the lookup reads only the probed
    shards with predicate pushdown."""
    out_dir = _index_cache_dir(sf_dir)
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        tmp = out_dir + f".tmp{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        build_inverted_index(docs, tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
            fh.write("ok")
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)

    from ..functions.agg import grouped_aggregate

    hits = grouped_aggregate(
        index_lookup(out_dir, LOOKUP_TERMS),
        ["token"],
        {"n_docs": (None, "count"), "total_tf": ("tf", "sum")},
    ).to_pandas()
    hits = hits.astype({"n_docs": "int64", "total_tf": "int64"})
    return hits.sort_values("token").reset_index(drop=True)


_INVERTED_INDEX_LOOKUP_SQL = f"""
SELECT term AS token,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS total_tf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term IN ({", ".join("'" + t + "'" for t in LOOKUP_TERMS)})
GROUP BY term
"""


# --------------------------------------------------------------------------
# Positional postings + phrase lookup
# --------------------------------------------------------------------------

PHRASE = ("key", "order")  # a two-word phrase that occurs in the synth corpus


def build_positional_index(
    docs: rd.Dataset, out_dir: str, n_shards: int = N_SHARDS
) -> None:
    """Positional variant: rows (token, doc_id, pos) — one row per
    OCCURRENCE with its 0-based token position. Same shard routing and
    hive write as the frequency index; ~tf× larger, which is the classic
    positional-index trade."""

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        total = int(lens.sum())
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), lens),
                "token": np.concatenate(toks.to_numpy()) if total else [],
                "pos": (
                    np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
                ).astype("int64"),
            }
        )
        vocab = {t: token_shard(t, n_shards) for t in flat["token"].unique()}
        flat["shard"] = flat["token"].map(vocab).astype("int64")
        return flat.sort_values(["shard", "token"]).reset_index(drop=True)

    docs.map_batches(postings, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["shard"]
    )


def phrase_lookup(
    index_dir: str, phrase: tuple[str, ...], n_shards: int = N_SHARDS
) -> pd.DataFrame:
    """Exact phrase matching via positional-posting intersection: term i's
    postings shifted by -i must coincide. Reads only the phrase terms'
    shards; the merge is one vectorized pandas inner-join chain over slim
    (doc_id, pos) frames — per-term postings, never the corpus. Returns
    (doc_id, n_matches ≥ 1)."""
    import pyarrow.dataset as pads

    frames = []
    for i, term in enumerate(phrase):
        path = os.path.join(index_dir, f"shard={token_shard(term, n_shards)}")
        if not os.path.exists(path):
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "n_matches": pd.Series(dtype="int64")}
            )
        p = rd.read_parquet(
            path,
            columns=["token", "doc_id", "pos"],
            filter=pads.field("token") == term,
        ).to_pandas()
        p = pd.DataFrame(
            {"doc_id": p["doc_id"], "pos": p["pos"].to_numpy() - i}
        )
        frames.append(p)
    cur = frames[0]
    for nxt in frames[1:]:
        cur = cur.merge(nxt, on=["doc_id", "pos"], how="inner")
    out = (
        cur.groupby("doc_id", sort=True).size().reset_index(name="n_matches")
    )
    return out.astype({"doc_id": "int64", "n_matches": "int64"})


def _pos_index_cache_dir(sf_dir: str) -> str:
    docs_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(docs_path)
    key = (
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{st.st_mtime_ns}_{st.st_size}_pos_s{N_SHARDS}"
    )
    return os.path.join("/tmp/scor_inverted_index", key)


def phrase_doc_matches(sf_dir: str) -> pd.DataFrame:
    """Docs containing the exact phrase ``"key order"`` with occurrence
    counts, answered from the positional index (build cached per corpus
    fingerprint, lookup reads 2 shards)."""
    out_dir = _pos_index_cache_dir(sf_dir)
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        tmp = out_dir + f".tmp{os.getpid()}"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        build_positional_index(docs, tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
            fh.write("ok")
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return phrase_lookup(out_dir, PHRASE)


#: occurrences of "key order" = positions where token i = 'key' and token
#: i+1 = 'order'; mirrored by counting the aligned unnests
_PHRASE_DOC_MATCHES_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
)
SELECT a.doc_id, COUNT(*) AS n_matches
FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1
WHERE a.tok = 'key' AND b.tok = 'order'
GROUP BY a.doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "inverted_index_lookup": inverted_index_lookup,
    "phrase_doc_matches": phrase_doc_matches,
}

ORACLES: dict[str, str] = {
    "inverted_index_lookup": _INVERTED_INDEX_LOOKUP_SQL,
    "phrase_doc_matches": _PHRASE_DOC_MATCHES_SQL,
}

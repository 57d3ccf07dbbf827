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

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
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

    partial = docs.map_batches(
        # quality filter + per-batch arg-min dedup fused in one stage
        lambda df: _local_keepers(quality(df), "text_hash"),
        batch_format="pandas",
    ).materialize()  # consumed twice below on the large path; bounded by
    # distinct hashes × batches, not corpus rows
    out = _final_keepers(partial, "text_hash", small_threshold)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out[["doc_id", "lang", "n_tokens"]].sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_tokens": "int64"})


def _local_keepers(df: pd.DataFrame, hash_col: str) -> pd.DataFrame:
    """Per-batch arg-min dedup: the min-doc_id row per content hash."""
    return df.sort_values("doc_id", kind="mergesort").drop_duplicates(
        hash_col, keep="first"
    )


def _final_keepers(partial, hash_col: str, small_threshold: int):
    """Merge per-batch keeper partials into global keepers — the shared
    final step of ``clean_corpus`` and ``curated_corpus``. Adaptive: one
    driver pass when the partials are small (returns a DataFrame), else the
    hash-keyed ``Dataset.join`` of each hash's min doc_id back onto the
    partials (returns a Dataset; no keeper-set broadcast, no per-group
    python calls)."""
    if partial.count() <= small_threshold:
        return _local_keepers(partial.to_pandas(), hash_col)
    mins = (
        partial.groupby(hash_col)
        .min("doc_id")
        .map_batches(
            lambda df: df.rename(columns={"min(doc_id)": "keep_doc_id"}),
            batch_format="pandas",
        )
        .materialize()
    )
    # join partitions bounded WELL below the distinct-key count: Ray 2.49's
    # hash join builds schema-less empty partitions when a partition gets no
    # rows of the small side (ArrowInvalid "no match or multiple matches"),
    # which a heavy-duplication corpus (2M partials over few distinct
    # hashes) can hit even at the default 16 (r5, pinned in test_curate.py)
    nparts = min(16, max(1, mins.count() // 50 + 1))
    joined = partial.join(
        mins,
        join_type="inner",
        num_partitions=nparts,
        on=(hash_col,),
    )
    return joined.filter(expr="doc_id == keep_doc_id")


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


# --------------------------------------------------------------------------
# End-to-end curation flagship: normalize → classify → mix → dedup → pack
# --------------------------------------------------------------------------

def curated_corpus(sf_dir: str, small_threshold: int = 2_000_000) -> pd.DataFrame:
    """The full training-data curation chain in ONE pipeline, every stage
    SQL-mirrored: NFC/casefold/whitespace normalization → hashed linear
    quality classifier (keep score > 0, integer-exact) → deterministic
    source-mixture coin → exact dedup on normalized bytes (min-doc_id
    keeper) → token-budget sequence packing over the survivors.

    Scale topology follows ``clean_corpus``: all per-doc filters run
    vectorized BEFORE any shuffle (no byte of a dropped doc crosses the
    network), keeper selection is per-batch arg-min partials with an
    adaptive final merge (driver pass when bounded, hash-keyed
    ``Dataset.join`` otherwise), and the packing step is the distributed
    prefix scan of ``packed_sequences`` (bounded per-bucket offsets) on the
    large path. Returns (doc_id, source, n_tokens, seq_id) per kept doc."""
    import unicodedata

    import numpy as np

    from ..functions.corpus_ops import MIXTURE_DENOM, _mixture_rate_millis
    from ..functions.text_stats import HASH_DIM, HASH_OFF
    from .train_feed import pack_assign, pack_sorted_df

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        src = df["source"].to_numpy()
        norm = pd.Series(
            [unicodedata.normalize("NFC", t) for t in df["text"].astype(str)],
            dtype="object",
        ).str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

        # hashed linear classifier on the NORMALIZED tokens, integer-exact
        toks = norm.str.split(" ")
        flat = toks.explode()
        codes, uniques = pd.factorize(flat.to_numpy())
        w = np.empty(len(uniques), dtype="int64")
        for i, u in enumerate(uniques):
            h = int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
            w[i] = h % HASH_DIM - HASH_OFF
        g = (
            pd.DataFrame({"i": flat.index, "w": w[codes]})
            .groupby("i", sort=False)["w"]
            .agg(["sum", "size"])
        )
        s = g["sum"].to_numpy(dtype="int64")
        n_tok = g["size"].to_numpy(dtype="int64")

        src_num = np.fromiter((int(x[3:]) for x in src), dtype=np.int64, count=len(src))
        coin = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{int(a)}:{x}".encode()).digest()[8:16], "little"
                )
                % MIXTURE_DENOM
                for a, x in zip(d, src)
            ),
            dtype=np.int64,
            count=len(d),
        )
        keep = (s > 0) & (coin < _mixture_rate_millis(src_num))
        kept = np.nonzero(keep)[0]
        return pd.DataFrame(
            {
                "doc_id": d[kept],
                "source": src[kept],
                "n_tok": n_tok[kept],
                "h": [hashlib.md5(norm.iloc[i].encode("utf-8")).hexdigest() for i in kept],
            }
        )

    partial = docs.map_batches(
        lambda df: _local_keepers(survivors(df), "h"), batch_format="pandas"
    ).materialize()  # bounded by distinct hashes × batches

    def finish(per_doc: pd.DataFrame) -> pd.DataFrame:
        out = per_doc.rename(columns={"n_tok": "n_tokens"})[
            ["doc_id", "source", "n_tokens", "seq_id"]
        ]
        out = out.sort_values("doc_id").reset_index(drop=True)
        return out.astype({"doc_id": "int64", "n_tokens": "int64", "seq_id": "int64"})

    keep = _final_keepers(partial, "h", small_threshold)
    if isinstance(keep, pd.DataFrame):
        keep = keep.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        return finish(pack_sorted_df(keep))

    # distributed prefix scan over the keepers — shared with packed_sequences
    slim = keep.map_batches(
        lambda df: df[["doc_id", "source", "n_tok"]], batch_format="pandas"
    )
    return finish(pack_assign(slim).to_pandas())


def _curated_corpus_sql() -> str:
    """SQL mirror built from the SAME constants the Python stages import —
    retuning SEQ_BUDGET / HASH_DIM / the mixture rates keeps both sides in
    lockstep."""
    from ..functions.corpus_ops import MIXTURE_DENOM
    from ..functions.text_stats import HASH_DIM, HASH_OFF
    from .train_feed import SEQ_BUDGET

    return rf"""
WITH norm AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS t
  FROM documents
), feat AS (
  SELECT doc_id, source, md5(t) AS h,
         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tok
  FROM norm
), toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm
), q AS (
  SELECT doc_id,
         SUM(CAST(md5_number_lower(tok) % {HASH_DIM} AS BIGINT) - {HASH_OFF}) AS s
  FROM toks GROUP BY doc_id
), surv AS (
  SELECT f.doc_id, f.source, f.h, f.n_tok
  FROM feat f JOIN q USING (doc_id)
  WHERE q.s > 0
    AND md5_number_lower(CAST(f.doc_id AS VARCHAR) || ':' || f.source)
          % {MIXTURE_DENOM}
        < (CAST(substr(f.source, 4) AS BIGINT) % 4 + 1) * {MIXTURE_DENOM // 4}
), keep AS (
  SELECT doc_id, source, n_tok FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk FROM surv
  ) WHERE rk = 1
), packed AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM keep
)
SELECT doc_id, source, n_tok AS n_tokens,
       CAST((cum - n_tok) // {SEQ_BUDGET} AS BIGINT) AS seq_id
FROM packed
"""


def clean_filter_attribution(sf_dir: str) -> pd.DataFrame:
    """Filter ablation report for :func:`clean_corpus`: every document is
    attributed to the FIRST rule that removes it (min_tokens →
    distinct_ratio → mean_token_len → duplicate) or to 'kept' — the table a
    data-curation review reads before changing any threshold ("what is this
    filter actually costing me?"). Shares are of the whole corpus.

    Scale topology: rule attribution is a vectorized per-batch map feeding a
    |reasons|-bounded rollup (no shuffle of documents); the duplicate count
    falls out of the keeper pipeline already run by ``clean_corpus`` —
    passing docs minus keepers — so no extra dedup shuffle is added beyond
    the second corpus scan (fusable into one pass if the scan ever
    dominates)."""
    from ..functions.agg import grouped_aggregate, round_half_away

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )
    n_total = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows

    def reasons(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
        mean_len = (df["n_chars"].astype("int64") - (n_tokens - 1)) / n_tokens
        reason = np.where(
            n_tokens < MIN_TOKENS,
            "min_tokens",
            np.where(
                n_distinct / n_tokens < MIN_DISTINCT_RATIO,
                "distinct_ratio",
                np.where(
                    mean_len > MAX_MEAN_TOKEN_LEN, "mean_token_len", "pass"
                ),
            ),
        )
        return pd.DataFrame({"reason": reason})

    counts = (
        grouped_aggregate(docs, ["reason"], {"n": (None, "count")}, prepare=reasons)
        .to_pandas()
        .set_index("reason")["n"]
        .astype("int64")
    )
    n_pass = int(counts.get("pass", 0))
    n_kept = len(clean_corpus(sf_dir))
    rows = [
        (r, int(counts[r]))
        for r in ("min_tokens", "distinct_ratio", "mean_token_len")
        if r in counts.index and counts[r] > 0
    ]
    if n_pass - n_kept > 0:
        rows.append(("duplicate", n_pass - n_kept))
    if n_kept > 0:
        rows.append(("kept", n_kept))
    out = pd.DataFrame(rows, columns=["reason", "n_docs"]).astype(
        {"n_docs": "int64"}
    )
    out["share"] = round_half_away(
        out["n_docs"].to_numpy() * 1.0 / float(n_total), 6
    )
    return out.sort_values("reason").reset_index(drop=True)


_CLEAN_FILTER_ATTRIBUTION_SQL = f"""
WITH q AS (
  SELECT doc_id, md5(text) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS distinct_ratio,
         (n_chars - (len(string_split(text, ' ')) - 1)) * 1.0
           / len(string_split(text, ' ')) AS mean_token_len
  FROM documents
), r AS (
  SELECT doc_id, h,
         CASE WHEN n_tokens < {MIN_TOKENS} THEN 'min_tokens'
              WHEN distinct_ratio < {MIN_DISTINCT_RATIO} THEN 'distinct_ratio'
              WHEN mean_token_len > {MAX_MEAN_TOKEN_LEN} THEN 'mean_token_len'
              ELSE 'pass' END AS reason
  FROM q
), k AS (
  SELECT doc_id, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk
  FROM r WHERE reason = 'pass'
), lab AS (
  SELECT CASE WHEN r.reason <> 'pass' THEN r.reason
              WHEN k.rk = 1 THEN 'kept' ELSE 'duplicate' END AS reason
  FROM r LEFT JOIN k USING (doc_id)
)
SELECT reason, COUNT(*) AS n_docs,
       ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents), 6) AS share
FROM lab GROUP BY reason
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "clean_corpus": clean_corpus,
    "curated_corpus": curated_corpus,
    "clean_filter_attribution": clean_filter_attribution,
}
ORACLES: dict[str, str] = {
    "clean_corpus": _CLEAN_CORPUS_SQL,
    "curated_corpus": _curated_corpus_sql(),
    "clean_filter_attribution": _CLEAN_FILTER_ATTRIBUTION_SQL,
}

"""curate-at-scale — the composed end-to-end curation flagship (r5).

ONE job chaining every production stage a 100 TB corpus actually runs:

    read pages → real-route extraction → quality annotate/filter →
    exact dedup → MinHash-LSH near-dup dedup (verified) → sequence
    packing → WET export + reconciliation manifest

The per-stage operators all exist as oracled queries (`clean_corpus`,
`dedup_exact_docs`, `minhash_lsh_pairs`, `near_dup_components`,
`packed_sequences`, `write_wet`); this module composes them into one
pipeline so cross-stage backpressure is exercised end-to-end — the thing
the per-query bench cannot see — and reports counts that reconcile
input → kept → packed (`curate_at_scale_report` is the SQL-oracled view).

Scale topology:

* Stage A streams: extraction output + quality annotations are written
  STRAIGHT to partitioned parquet (``<out>/annotated``) — the job's only
  corpus-sized materialization is on disk (resumable), never pinned in
  the object store or on the driver.
* Every later stage re-reads column-pruned slices of that parquet:
  exact dedup moves (doc_key, text_hash, n_tok) partials only; the
  near-dup pass reads text for EXACT KEEPERS only (semi-filtered), so
  replicated crawls never explode the band index; pair generation uses
  the sorted-run path; components are union-find on the bounded pair
  list (the distributed min-label path of ``near_dup_components`` is the
  large-graph fallback).
* The WET export is shard-per-block with atomic renames (readers.py).

Doc keys: ``doc_key_from_url`` derives a stable int64 from the corpus's
url convention (``.../<digits>``, the synth/bench shape), falling back to
an md5-derived int for foreign urls. Any deterministic unique key works —
the reconciliation counts never depend on which member of a duplicate
group wins.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.agg import broadcast_semi_filter, grouped_aggregate
from .clean import (
    MAX_MEAN_TOKEN_LEN,
    MIN_DISTINCT_RATIO,
    MIN_TOKENS,
    _final_keepers,
    _local_keepers,
)

JACCARD_TAU_CURATE = 0.5  # same τ as the near-dup query family


def doc_key_from_url(url: str) -> int:
    tail = url.rsplit("/", 1)[-1]
    if tail.isdigit():
        return int(tail)
    return int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "big") >> 1


def _make_annotate(
    min_tokens: int, min_distinct_ratio: float, max_mean_token_len: float
):
    """Extraction output → slim annotated rows (one pass, vectorized where
    the work is string math; per-row python only for md5/key)."""

    def _annotate(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        status = t["status"].to_pylist()
        ctype = t["content_type"].to_pylist()
        texts = t["text"].to_pylist()
        n = len(urls)
        keys = np.empty(n, dtype=np.int64)
        n_tok = np.zeros(n, dtype=np.int64)
        quality = np.zeros(n, dtype=bool)
        hashes: list[str] = []
        is_html = np.zeros(n, dtype=bool)
        completed = np.zeros(n, dtype=bool)
        for i in range(n):
            keys[i] = doc_key_from_url(urls[i])
            completed[i] = status[i] == "completed"
            is_html[i] = completed[i] and ctype[i] == "html"
            if not is_html[i]:
                hashes.append("")
                continue
            text = texts[i]
            toks = text.split(" ")
            nt = len(toks)
            n_tok[i] = nt
            distinct_ratio = len(set(toks)) / nt
            mean_len = (len(text) - (nt - 1)) / nt
            quality[i] = (
                nt >= min_tokens
                and distinct_ratio >= min_distinct_ratio
                and mean_len <= max_mean_token_len
            )
            hashes.append(
                hashlib.md5(text.encode("utf-8")).hexdigest()
                if quality[i]
                else ""
            )
        return pa.table(
            {
                "doc_key": pa.array(keys),
                "completed": pa.array(completed),
                "is_html": pa.array(is_html),
                "quality": pa.array(quality),
                "n_tok": pa.array(n_tok),
                "text_hash": pa.array(hashes, pa.string()),
                "text": pa.array(
                    [tx if q else "" for tx, q in zip(texts, quality)],
                    pa.string(),
                ),
            }
        )

    return _annotate


def curate_at_scale(
    pages_dir: str,
    out_dir: str,
    *,
    tau: float = JACCARD_TAU_CURATE,
    small_threshold: int = 2_000_000,
    concurrency=None,
    batch_size: int = 2048,
    min_tokens: int = MIN_TOKENS,
    min_distinct_ratio: float = MIN_DISTINCT_RATIO,
    max_mean_token_len: float = MAX_MEAN_TOKEN_LEN,
) -> dict:
    """Run the composed curation job. Returns ``{"report": DataFrame(stage,
    n), "wet_manifest": DataFrame(path, n_records, n_bytes)}`` with the
    reconciliation invariants asserted (counts monotone, WET records ==
    final keepers)."""
    import ray

    from ..functions.corpus_ops import (
        _components_label_propagation,
        _union_find_labels,
    )
    from ..functions.dedup import (
        _minhash_params,
        _band_rows,
        _pairs_from_groups,
        _verify_pairs,
        NUM_BANDS,
    )
    from ..sources.readers import write_wet
    from .extract import extraction_pipeline, read_pages
    from .train_feed import pack_assign, pack_sorted_df

    # ---- stage A: extract + annotate, streamed to partitioned parquet ----
    kwargs = {"batch_size": batch_size}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    annotated_dir = os.path.join(out_dir, "annotated")
    import json
    import shutil

    # resumability: stage A (the expensive extraction pass) is skipped when
    # a COMPLETE annotated table for the same input + quality params already
    # sits in out_dir — a rerun after a later-stage failure re-derives
    # everything downstream from the on-disk table without re-extracting.
    # A partial write never carries the marker (written only after success).
    fprint = json.dumps(
        {
            "pages": sorted(
                (f, os.path.getsize(os.path.join(pages_dir, f)))
                for f in os.listdir(pages_dir)
                if f.endswith(".parquet")
            ),
            "params": [min_tokens, min_distinct_ratio, max_mean_token_len],
            "v": 1,
        },
        sort_keys=True,
    )
    marker = os.path.join(annotated_dir, "_CURATE_DONE")
    done = False
    try:
        with open(marker) as fh:
            done = fh.read() == fprint
    except OSError:
        pass
    if not done:
        shutil.rmtree(annotated_dir, ignore_errors=True)
        annotate = _make_annotate(
            min_tokens, min_distinct_ratio, max_mean_token_len
        )
        extraction_pipeline(
            read_pages(pages_dir), preset="real", **kwargs
        ).map_batches(annotate, batch_format="pyarrow").write_parquet(
            annotated_dir
        )
        with open(marker, "w") as fh:
            fh.write(fprint)

    ann = rd.read_parquet(
        annotated_dir, columns=["completed", "is_html", "quality"]
    )
    counts = grouped_aggregate(
        ann,
        ["one"],
        {
            "pages_in": (None, "count"),
            "completed": ("completed", "sum"),
            "html_text": ("is_html", "sum"),
            "quality_kept": ("quality", "sum"),
        },
        prepare=lambda df: pd.DataFrame(
            {
                "one": np.ones(len(df), dtype="int64"),
                "completed": df["completed"].astype("int64"),
                "is_html": df["is_html"].astype("int64"),
                "quality": df["quality"].astype("int64"),
            }
        ),
    ).to_pandas()
    pages_in = int(counts["pages_in"].iloc[0])
    n_completed = int(counts["completed"].iloc[0])
    n_html = int(counts["html_text"].iloc[0])
    n_quality = int(counts["quality_kept"].iloc[0])

    # ---- stage B: exact dedup over quality survivors (slim columns) ----
    def _slim_local(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["quality"]][["doc_key", "n_tok", "text_hash"]].rename(
            columns={"doc_key": "doc_id"}
        )
        # empty blocks must keep Arrow-stable dtypes (an empty object
        # column becomes Arrow null and poisons downstream join schemas)
        return _local_keepers(df, "text_hash").astype(
            {"doc_id": "int64", "n_tok": "int64", "text_hash": "string"}
        )

    partial = rd.read_parquet(
        annotated_dir, columns=["doc_key", "quality", "n_tok", "text_hash"]
    ).map_batches(_slim_local, batch_format="pandas").materialize()
    keep = _final_keepers(partial, "text_hash", small_threshold)
    large_path = not isinstance(keep, pd.DataFrame)
    if large_path:
        # keepers stay DISTRIBUTED: at 100 TB the exact-keeper table is
        # corpus-sized when duplication is low — it must never visit the
        # driver (the r5 small path below does, bounded by the threshold)
        keep_ds = keep.map_batches(
            lambda df: df[["doc_id", "n_tok"]], batch_format="pandas"
        ).materialize()
        exact_keepers = keep_ds.count()
    else:
        if "doc_id" not in keep.columns:  # zero survivors: schema-less empty
            keep = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_tok": pd.Series(dtype="int64"),
                                 "text_hash": pd.Series(dtype="object")})
        exact_keepers = len(keep)

    # ---- stage C: near-dup (LSH bands → sorted-run pairs → exact verify
    # → components → min-keeper) over the EXACT KEEPERS only ----
    def _qual_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["quality"]][["doc_key", "text"]].rename(
            columns={"doc_key": "doc_id"}
        )
        return df.drop_duplicates("doc_id").astype(
            {"doc_id": "int64", "text": "string"}
        )

    qual_text = rd.read_parquet(
        annotated_dir, columns=["doc_key", "quality", "text"]
    ).map_batches(_qual_rows, batch_format="pandas")
    if large_path:
        # hash join instead of a driver-held key-set broadcast; partitions
        # bounded well below the keeper count (Ray 2.49 hash join breaks on
        # partitions with no small-side rows — see clean._final_keepers)
        corpus_kept = qual_text.join(
            keep_ds.map_batches(
                lambda df: df[["doc_id"]], batch_format="pandas"
            ),
            join_type="inner",
            num_partitions=min(16, max(1, exact_keepers // 50 + 1)),
            on=("doc_id",),
        ).materialize()
    else:
        corpus_kept = broadcast_semi_filter(
            qual_text, set(keep["doc_id"].tolist()), "doc_id"
        ).materialize()  # consumed by band explode + both verify joins
    a, b = _minhash_params()
    exploded = corpus_kept.map_batches(
        lambda df: _band_rows(df, a, b), batch_format="pandas"
    )
    cand = _pairs_from_groups(
        exploded, "bucket", est_rows=exact_keepers * NUM_BANDS
    )
    pairs = _verify_pairs(corpus_kept, cand, tau)
    # verified pair table = the dedup output itself, bounded by the
    # DUPLICATION volume; union-find labels are bounded the same way
    labels = (
        _union_find_labels(pairs)
        if len(pairs) <= 2_000_000
        else None
    )
    if labels is not None:
        # drop the non-minimum members of every component
        drop_keys = {k for k, lbl in labels.items() if lbl != k}
    else:
        # nodes restricted to docs appearing in a pair — the propagation
        # output is then bounded by the duplication volume, not the corpus
        pair_nodes = pd.DataFrame(
            {"doc_id": pd.unique(pd.concat([pairs["doc_a"], pairs["doc_b"]]))}
        )
        lab = _components_label_propagation(
            rd.from_pandas(pair_nodes), pairs
        ).to_pandas()
        drop_keys = set(
            lab.loc[lab["doc_id"] != lab["component"], "doc_id"].tolist()
        )

    if large_path:
        final_ds = broadcast_semi_filter(
            keep_ds, drop_keys, "doc_id", anti=True
        ).materialize()
        near_keepers = final_ds.count()
    else:
        final = (
            keep[~keep["doc_id"].isin(drop_keys)]
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )
        near_keepers = len(final)

    # ---- stage D: sequence packing over final keepers ----
    if large_path:
        packed_ds = pack_assign(
            final_ds.map_batches(
                lambda df: df[["doc_id", "n_tok"]], batch_format="pandas"
            )
        ).materialize()
        agg = grouped_aggregate(
            packed_ds,
            ["one"],
            {"max_seq": ("seq_id", "max"), "tok": ("n_tok", "sum")},
            prepare=lambda df: pd.DataFrame(
                {
                    "one": np.ones(len(df), dtype="int64"),
                    "seq_id": df["seq_id"].astype("int64"),
                    "n_tok": df["n_tok"].astype("int64"),
                }
            ),
        ).to_pandas()
        n_seqs = int(agg["max_seq"].iloc[0]) + 1 if len(agg) else 0
        packed_tokens = int(agg["tok"].iloc[0]) if len(agg) else 0
    else:
        if len(final):
            packed = pack_sorted_df(final[["doc_id", "n_tok"]])
            n_seqs = int(packed["seq_id"].max()) + 1
            packed_tokens = int(packed["n_tok"].sum())
        else:
            n_seqs = packed_tokens = 0

    # ---- stage E: WET export of kept texts ----
    # global dedup by doc_id (replicated crawls carry a keeper's text in
    # MANY input rows across batches): one keyed sorted-run shuffle of the
    # keeper texts — the same volume the WET write itself must move
    from ..functions.agg import map_sorted_runs

    kept_corpus = broadcast_semi_filter(
        corpus_kept, drop_keys, "doc_id", anti=True
    )
    kept_text = map_sorted_runs(
        kept_corpus,
        "doc_id",
        lambda df: df.drop_duplicates("doc_id"),
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "url": pd.Series(
                    [f"curated://{int(k):016d}" for k in df["doc_id"]],
                    dtype="object",
                ),
                "text": df["text"].astype("object"),
            }
        ),
        batch_format="pandas",
    )
    wet_dir = os.path.join(out_dir, "wet")
    manifest = write_wet(kept_text, wet_dir, overwrite_dir=True)
    wet_records = int(manifest["n_records"].sum())

    assert pages_in >= n_completed >= n_html >= n_quality >= exact_keepers
    assert exact_keepers >= near_keepers == wet_records
    report = pd.DataFrame(
        {
            "stage": [
                "pages_in", "completed", "html_text", "quality_kept",
                "exact_keepers", "near_dup_keepers", "sequences",
                "packed_tokens", "wet_records",
            ],
            "n": pd.Series(
                [
                    pages_in, n_completed, n_html, n_quality, exact_keepers,
                    near_keepers, n_seqs, packed_tokens, wet_records,
                ],
                dtype="int64",
            ),
        }
    )
    return {"report": report, "wet_manifest": manifest}


# --------------------------------------------------------------------------
# Oracled registry view: the composed job on the synth corpus with exact
# duplicates injected (duplicate_every=10)
# --------------------------------------------------------------------------

CURATE_DUP_EVERY = 10


def curate_at_scale_report(sf_dir: str) -> pd.DataFrame:
    """The composed curation flagship on the real-payload synth corpus with
    exact-duplicate injection, reported as reconciliation counts — every
    stage's number mirrored arithmetically by the DuckDB oracle (including
    the near-dup component count via the recursive exact-Jaccard CTE)."""
    import tempfile

    from ..sources.synth_pages import synth_pages_parquet

    pages_dir = synth_pages_parquet(
        sf_dir, real_payloads=True, duplicate_every=CURATE_DUP_EVERY
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"scor_curate_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    return curate_at_scale(pages_dir, out_dir)["report"]


def _curate_report_sql() -> str:
    from .train_feed import SEQ_BUDGET

    return f"""
WITH RECURSIVE emissions AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % {CURATE_DUP_EVERY} = 7
), q AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS distinct_ratio,
         (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
           / len(string_split(text, ' ')) AS mean_token_len
  FROM documents
  WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
), qual AS (
  SELECT doc_id, text, n_tok FROM q
  WHERE n_tok >= {MIN_TOKENS}
    AND distinct_ratio >= {MIN_DISTINCT_RATIO}
    AND mean_token_len <= {MAX_MEAN_TOKEN_LEN}
), exact AS (
  SELECT doc_id, text, n_tok FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rk
    FROM qual
  ) WHERE rk = 1
), sh AS (
  SELECT doc_id, n_tok,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS sh
  FROM (SELECT doc_id, n_tok, string_split(text, ' ') AS w FROM exact)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= {JACCARD_TAU_CURATE}
), edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM pairs
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM exact
  UNION
  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
), keepers AS (
  SELECT e.doc_id, e.n_tok FROM exact e
  JOIN comp c ON c.doc_id = e.doc_id
  QUALIFY row_number() OVER (PARTITION BY c.component ORDER BY e.doc_id) = 1
), packed AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM keepers
), stages AS (
  SELECT 'pages_in' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM emissions
  UNION ALL
  SELECT 'completed', CAST(COUNT(*) AS BIGINT) FROM emissions
  WHERE doc_id % 20 <> 3
  UNION ALL
  SELECT 'html_text', CAST(COUNT(*) AS BIGINT) FROM emissions
  WHERE doc_id % 20 NOT IN (0, 1, 2, 3)
  UNION ALL
  SELECT 'quality_kept', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT e.doc_id FROM emissions e JOIN qual ON qual.doc_id = e.doc_id
    WHERE e.doc_id % 20 NOT IN (0, 1, 2, 3)
  )
  UNION ALL
  SELECT 'exact_keepers', CAST(COUNT(*) AS BIGINT) FROM exact
  UNION ALL
  SELECT 'near_dup_keepers', CAST(COUNT(*) AS BIGINT) FROM keepers
  UNION ALL
  SELECT 'sequences',
         CAST(MAX((cum - n_tok) // {SEQ_BUDGET}) + 1 AS BIGINT) FROM packed
  UNION ALL
  SELECT 'packed_tokens', CAST(SUM(n_tok) AS BIGINT) FROM keepers
  UNION ALL
  SELECT 'wet_records', CAST(COUNT(*) AS BIGINT) FROM keepers
)
SELECT stage, n FROM stages
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "curate_at_scale_report": curate_at_scale_report,
}
ORACLES: dict[str, str] = {
    "curate_at_scale_report": _curate_report_sql(),
}

"""Corpus-level training-data operators beyond per-row transforms:

* ``near_dup_components`` — connected components over the near-duplicate
  pair graph (the step a real dedup pipeline needs AFTER pair mining: a
  cluster → keeper assignment, not just pairs). Adaptive: union-find over
  the bounded pair list when it fits, distributed min-label propagation
  (join + grouped-min per round, converging in graph-diameter rounds) above
  the threshold.
* ``lang_top_tokens`` — per-language heavy hitters (vocabulary head) via
  per-batch token explosion + partial counts; the all-to-all only ever sees
  distinct (lang, token) partials.
* ``doc_split_assign`` — deterministic content-hash train/val split (the
  reproducible, join-free way to split a 10^12-doc corpus: no global
  sampling state, any worker can recompute a row's split).

All three have exact DuckDB oracles (connected components via a recursive
CTE over the same exact-Jaccard edge set).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import grouped_aggregate, round_half_away
from .dedup import _NEAR_PAIRS_SQL, near_dup_corpus, near_dup_pairs

# --------------------------------------------------------------------------
# Connected components over the near-dup graph
# --------------------------------------------------------------------------

#: pair lists at or below this size resolve components with driver
#: union-find (bounded by the MINED PAIR count — the operator's own output
#: scale, not the corpus); larger graphs use distributed label propagation.
COMPONENTS_SMALL_MAX_EDGES = 5_000_000
LABEL_PROP_MAX_ITERS = 64


def _union_find_labels(pairs: pd.DataFrame) -> dict[int, int]:
    """node → min-member-id of its component, for nodes appearing in edges."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # union-by-min keeps labels minimal
    return {n: find(n) for n in parent}


def _label_prop_round(
    edges: rd.Dataset, labels: rd.Dataset, num_partitions: int
) -> tuple[rd.Dataset, int]:
    """One min-label propagation round: join directed edges to current
    labels, take the per-node minimum, materialize. Returns the new labels
    and their sum (the monotone convergence witness — labels only ever
    decrease, so an unchanged sum means a fixpoint). Shared by the plain
    loop and the round-checkpointed variant (state/iter_checkpoint.py) so
    the two cannot drift."""
    msgs = edges.join(
        labels,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("node",),
    ).map_batches(
        lambda d: d.rename(columns={"dst": "node"})[["node", "label"]],
        batch_format="pandas",
    )
    labels = grouped_aggregate(
        labels.union(msgs), ["node"], {"label": ("label", "min")}
    ).materialize()
    return labels, labels.sum("label")


def directed_edges(pairs: rd.Dataset | pd.DataFrame) -> rd.Dataset:
    """(doc_a, doc_b) pair table → materialized directed edge table (both
    directions), the propagation input."""
    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs)
    return pairs.map_batches(
        lambda d: pd.concat(
            [
                d.rename(columns={"doc_a": "src", "doc_b": "dst"}),
                d.rename(columns={"doc_a": "dst", "doc_b": "src"}),
            ]
        )[["src", "dst"]],
        batch_format="pandas",
    ).materialize()


def _components_label_propagation(
    nodes: rd.Dataset, pairs: rd.Dataset | pd.DataFrame, num_partitions: int = 8
) -> rd.Dataset:
    """Distributed min-label propagation: each round joins directed edges to
    current labels and takes the per-node minimum; labels only decrease, so
    the sum of labels is a convergence witness. Rounds = graph diameter."""
    edges = directed_edges(pairs)
    num_partitions = max(
        2, min(num_partitions, int(ray.cluster_resources().get("CPU", num_partitions)))
    )

    labels = nodes.map_batches(
        lambda d: pd.DataFrame(
            {"node": d["doc_id"], "label": d["doc_id"]}
        ),
        batch_format="pandas",
    ).materialize()
    prev_sum = None
    for _ in range(LABEL_PROP_MAX_ITERS):
        labels, s = _label_prop_round(edges, labels, num_partitions)
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda d: pd.DataFrame(
            {
                "doc_id": d["node"].astype("int64"),
                "component": d["label"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def near_dup_components(
    sf_dir: str, small_max_edges: int = COMPONENTS_SMALL_MAX_EDGES
) -> rd.Dataset:
    """(doc_id, component) over the twin-augmented corpus, where component =
    the minimum doc_id reachable through exact-Jaccard ≥ τ near-duplicate
    pairs (mined by the MinHash pipeline — oracle-identical to the SQL edge
    set). Docs in no pair are their own component. Returns a streaming
    Dataset — the assignment is O(corpus) and never collects on the driver;
    only the mined pair list (the dedup output itself) is driver-bounded on
    the small path. The pair list comes from the SHARED mining pass
    (``near_dup_pairs`` — memoized), so components and keepers together cost
    one MinHash pipeline, not two."""
    pairs = near_dup_pairs(sf_dir)
    corpus = near_dup_corpus(sf_dir)
    if len(pairs) <= small_max_edges:
        ref = ray.put(_union_find_labels(pairs))

        def assign(d: pd.DataFrame) -> pd.DataFrame:
            labels = ray.get(ref)  # zero-copy from the local object store
            ids = d["doc_id"].astype("int64")
            return pd.DataFrame(
                {
                    "doc_id": ids,
                    "component": pd.Series(
                        [labels.get(int(i), int(i)) for i in ids],
                        dtype="int64",
                        index=ids.index,
                    ),
                }
            )

        return corpus.map_batches(assign, batch_format="pandas")
    return _components_label_propagation(corpus.select_columns(["doc_id"]), pairs)


_NEAR_DUP_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_NEAR_PAIRS_SQL}) q
), corpus AS (
  SELECT doc_id FROM documents WHERE length(trim(text)) > 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id
  FROM documents
  WHERE doc_id % 5 = 0 AND len(string_split(text,' ')) >= 12
), edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM pairs
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
"""


def checkpointed_components(sf_dir: str) -> pd.DataFrame:
    """``near_dup_components`` semantics through the ROUND-CHECKPOINTED
    label-propagation engine (``state/iter_checkpoint.py``): every round's
    label table commits atomically under a staleness-keyed /tmp directory,
    so a run killed in round r resumes at round r+1 with byte-identical
    final output (kill/resume pinned in tests/test_iter_checkpoint.py).
    Same oracle as the plain operator — the checkpointing must be
    semantically invisible. A completed checkpoint short-circuits to a
    plain read of the converged labels."""
    import hashlib as _hashlib

    from ..state.iter_checkpoint import checkpointed_min_label_components

    base = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(base, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    tag = _hashlib.blake2b(f"{base}|{stamp}".encode(), digest_size=4).hexdigest()
    ckpt = f"/tmp/scor_iter_ckpt/{os.path.basename(base)}_{tag}_v1"

    pairs = near_dup_pairs(sf_dir)
    nodes = near_dup_corpus(sf_dir).select_columns(["doc_id"])
    labels, _ = checkpointed_min_label_components(nodes, pairs, ckpt)
    out = labels.to_pandas().rename(
        columns={"node": "doc_id", "label": "component"}
    )
    out = out.astype({"doc_id": "int64", "component": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Per-language heavy hitters (vocabulary head)
# --------------------------------------------------------------------------

TOP_TOKENS_K = 10


def lang_top_tokens(sf_dir: str, k: int = TOP_TOKENS_K) -> pd.DataFrame:
    """Top-k tokens per language by occurrence count (ties broken by token).
    Token explosion happens inside the partial-aggregate stage, so the
    shuffle sees one (lang, token) partial per batch, not every occurrence."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        return pd.DataFrame(
            {
                "lang": df["lang"].repeat(toks.str.len()).to_numpy(),
                "token": np.concatenate(toks.to_numpy()),
            }
        )

    counts_ds = grouped_aggregate(
        ds, ["lang", "token"], {"n": (None, "count")}, prepare=prepare
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["lang", "n", "token"], ascending=[True, False, True], kind="mergesort"
        )
        return df.groupby("lang", sort=False).head(k)

    # per-batch prune before the driver merge: global counts are already one
    # row per (lang, token), so local-topk-then-final-topk is exact and the
    # driver sees ≤ batches × |langs| × k rows — never the full vocabulary
    counts = counts_ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    counts["n"] = counts["n"].astype("int64")
    counts = counts.sort_values(
        ["lang", "n", "token"], ascending=[True, False, True], kind="mergesort"
    )
    counts["rk"] = counts.groupby("lang", sort=False).cumcount() + 1
    out = counts[counts["rk"] <= k].reset_index(drop=True)
    out["rk"] = out["rk"].astype("int64")
    return out[["lang", "token", "n", "rk"]]


_LANG_TOP_TOKENS_SQL = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2
), r AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
  FROM c
)
SELECT lang, token, n, rk FROM r WHERE rk <= {TOP_TOKENS_K}
"""


# --------------------------------------------------------------------------
# Deterministic content-hash train/val split
# --------------------------------------------------------------------------

#: first md5 byte < 0x1a → val (26/256 ≈ 10.2%). Pure function of doc_id:
#: reproducible on any worker with no global sampling state.
VAL_HEX_CUTOFF = "1a"


def doc_split_assign(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        splits = [
            "val"
            if hashlib.md5(str(int(d)).encode()).hexdigest()[:2] < VAL_HEX_CUTOFF
            else "train"
            for d in df["doc_id"]
        ]
        return pd.DataFrame({"doc_id": df["doc_id"], "split": splits})

    return ds.map_batches(fn, batch_format="pandas")


_DOC_SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_HEX_CUTOFF}'
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


# --------------------------------------------------------------------------
# Stratified (per-language) deterministic sampling
# --------------------------------------------------------------------------

#: per-language target row count for the equalizing sample
STRATA_TARGET = 50


def stratified_sample(sf_dir: str, target: int = STRATA_TARGET) -> pd.DataFrame:
    """Language-equalizing sample: each stratum keeps ~``target`` docs via a
    per-stratum content-hash cutoff. Two passes: a tiny grouped count fixes
    the cutoffs, then a streaming filter applies them (broadcast — any
    worker decides a row's fate locally; no global sampling state, fully
    reproducible)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    counts = grouped_aggregate(ds, ["lang"], {"n": (None, "count")}).to_pandas()
    cutoffs = {
        lang: "zz"  # lexicographically above every hex byte: keep everything
        if (256 * target) // n >= 256
        else format((256 * target) // n, "02x")
        for lang, n in zip(counts["lang"], counts["n"])
    }
    ref = ray.put(cutoffs)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cut = ray.get(ref)
        mask = [
            hashlib.md5(str(int(d)).encode()).hexdigest()[:2] < cut[lang]
            for d, lang in zip(df["doc_id"], df["lang"])
        ]
        return df[pd.Series(mask, index=df.index)]

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_STRATIFIED_SAMPLE_SQL = f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
), cut AS (
  SELECT lang,
         CASE WHEN (256 * {STRATA_TARGET}) // n >= 256 THEN 'zz'
              ELSE lower(lpad(to_hex((256 * {STRATA_TARGET}) // n), 2, '0'))
         END AS cutoff
  FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN cut USING (lang)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < cutoff
"""


# --------------------------------------------------------------------------
# Exact grouped quantiles via value histograms
# --------------------------------------------------------------------------

QUANTILES = (0.5, 0.9, 0.99)


def lang_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p90/p99 of document length per language, computed from a
    (lang, n_chars) count histogram — the shuffle moves one row per distinct
    (lang, length) value, never the documents, so this stays exact at any
    corpus size with a bounded value domain. Matches DuckDB quantile_disc
    (value at 1-based rank ceil(q·n))."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )
    hist = grouped_aggregate(
        ds, ["lang", "n_chars"], {"cnt": (None, "count")}
    ).to_pandas()  # bounded: |langs| × |distinct lengths|
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        cum = g["cnt"].cumsum().to_numpy()
        vals = g["n_chars"].to_numpy()
        n = int(cum[-1])
        row = {"lang": lang}
        for q in QUANTILES:
            rank = int(np.ceil(q * n))
            row[f"p{int(q * 100)}"] = int(vals[np.searchsorted(cum, rank)])
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    for q in QUANTILES:
        out[f"p{int(q * 100)}"] = out[f"p{int(q * 100)}"].astype("int64")
    return out


_LANG_LENGTH_QUANTILES_SQL = """
SELECT lang,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Grouped exact distinct count (per-language vocabulary size)
# --------------------------------------------------------------------------

def lang_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """Exact distinct-token count per language. Per-batch local dedup of
    (lang, token) pairs (the grouped analog of ``distinct_values``) bounds
    what crosses the wire at |langs| × batch vocabulary; the final distinct
    + count happens on the deduped pair set. The approximate constant-
    memory path for this shape is a per-group HLL (see
    ``sketch.hll_distinct_users``) — this is the exact one."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        pairs = pd.DataFrame(
            {
                "lang": df["lang"].repeat(toks.str.len()).to_numpy(),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        return pairs.drop_duplicates()

    pairs = ds.map_batches(local_pairs, batch_format="pandas").to_pandas()
    out = (
        pairs.drop_duplicates()
        .groupby("lang", sort=True)
        .size()
        .rename("n_distinct_tokens")
        .reset_index()
    )
    out["n_distinct_tokens"] = out["n_distinct_tokens"].astype("int64")
    return out


_LANG_DISTINCT_TOKENS_SQL = """
SELECT lang, COUNT(DISTINCT token) AS n_distinct_tokens
FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY lang
"""


def lang_token_logodds(sf_dir: str) -> pd.DataFrame:
    """Distinctive-term analysis: per (lang, token), the smoothed log-odds
    ratio of the token's use inside the language vs the rest of the corpus
    (Monroe et al.'s "Fightin' Words" statistic with +1 smoothing) — the
    corpus-comparison tool for "what words characterize this slice". One
    vocabulary-bounded shuffle (token explosion inside the partial
    aggregate); the log-odds math runs on the driver over the
    |langs|×|vocab| count table. DuckDB ``ln`` bit-matches numpy ``log``
    here, so the oracle hash-checks the rounded statistic."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        return pd.DataFrame(
            {
                "lang": df["lang"].repeat(toks.str.len()).to_numpy(),
                "tok": np.concatenate(toks.to_numpy()),
            }
        )

    from .agg import round_half_away

    c = grouped_aggregate(
        ds, ["lang", "tok"], {"n": (None, "count")}, prepare=prepare
    ).to_pandas()  # bounded: |langs| × |vocab|
    n = c["n"].to_numpy(dtype="float64")
    nl = c.groupby("lang")["n"].transform("sum").to_numpy(dtype="float64")
    nt = c.groupby("tok")["n"].transform("sum").to_numpy(dtype="float64")
    ng = float(c["n"].sum())
    lor = np.log((n + 1) / (nl - n + 1)) - np.log(
        (nt - n + 1) / (ng - nl - (nt - n) + 1)
    )
    out = pd.DataFrame(
        {
            "lang": c["lang"],
            "tok": c["tok"],
            "lor": round_half_away(lor),
        }
    )
    return out.sort_values(["lang", "tok"]).reset_index(drop=True)


_LANG_TOKEN_LOGODDS_SQL = """
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT lang, tok, COUNT(*) AS n FROM t GROUP BY 1, 2
), l AS (
  SELECT lang, SUM(n) AS nl FROM c GROUP BY 1
), tot AS (
  SELECT tok, SUM(n) AS nt FROM c GROUP BY 1
), g AS (
  SELECT SUM(n) AS ng FROM c
)
SELECT c.lang, c.tok,
       ROUND(ln((c.n + 1.0) / (l.nl - c.n + 1.0))
             - ln((tot.nt - c.n + 1.0)
                  / (g.ng - l.nl - (tot.nt - c.n) + 1.0)), 4) AS lor
FROM c JOIN l USING (lang) CROSS JOIN g JOIN tot USING (tok)
ORDER BY c.lang, c.tok
"""


# --------------------------------------------------------------------------
# Salted exact grouped distinct (hot-key-safe shuffle)
# --------------------------------------------------------------------------

#: number of value-hash shards the distinct-count shuffle fans out to; at
#: corpus scale this is sized so |values|/S × |keys| fits one reducer's heap
NUM_DISTINCT_SALTS = 64


def type_distinct_users_salted(sf_dir: str) -> pd.DataFrame:
    """Exact per-key distinct count with VALUE-HASH SALTING — the hot-key
    pattern: a plain ``groupby(event_type)`` distinct would funnel every
    distinct user of the hottest event type through ONE reducer. Here the
    shuffle key is ``splitmix64(user_id) % S`` instead: every copy of a
    given user lands in the same salt shard, so per-shard dedup is globally
    correct and per-type distinct counts are additive across shards. Each
    reducer holds ≤ |users|/S × |types| rows REGARDLESS of key skew, and
    the final merge sums |types| × S bounded partials. Siblings:
    ``sketch.type_distinct_users_hll`` (approximate, constant memory),
    ``lang_distinct_tokens`` (exact, vocabulary-bounded driver merge)."""
    from .sketch import _splitmix64

    events = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df.drop_duplicates()  # per-batch pre-shrink before the shuffle
        salt = (
            _splitmix64(pairs["user_id"].to_numpy().astype(np.uint64))
            % np.uint64(NUM_DISTINCT_SALTS)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "event_type": pairs["event_type"].to_numpy(),
                "user_id": pairs["user_id"].to_numpy(),
                "salt": salt,
            }
        )

    def shard_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", sort=False)
            .size()
        )
        return pd.DataFrame(
            {"event_type": g.index.to_numpy(), "n": g.to_numpy().astype("int64")}
        )

    parts = (
        events.map_batches(local, batch_format="pandas")
        .groupby("salt")
        .map_groups(shard_counts, batch_format="pandas")
        .to_pandas()  # bounded: |types| × NUM_DISTINCT_SALTS rows
    )
    out = (
        parts.groupby("event_type", sort=True)["n"]
        .sum()
        .rename("n_distinct_users")
        .reset_index()
    )
    return out.astype({"n_distinct_users": "int64"})


_TYPE_DISTINCT_USERS_SALTED_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Deterministic weighted sample (A-ES / Efraimidis-Spirakis reservoir)
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 50


def weighted_sample_docs(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> pd.DataFrame:
    """Weighted sample without replacement of k documents, probability
    proportional to length (n_chars), via the Efraimidis-Spirakis A-ES
    scheme: each row gets key = ln(u)/w for a uniform u, and the k LARGEST
    keys win. u derives from md5(doc_id) — a pure row-local function — so
    the sample is deterministic, reproducible on any worker with no global
    RNG state, and expressible in SQL for the oracle.

    Topology: key assignment is embarrassingly parallel; selection is the
    local-top-k-then-final-top-k pattern (no sort, no shuffle of the
    corpus). This is the weighted complement of the un-weighted
    ``stratified_sample``."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        h = [
            hashlib.md5(str(int(d)).encode()).hexdigest()[:8]
            for d in df["doc_id"]
        ]
        u = (np.array([int(x, 16) for x in h], dtype="float64") + 1.0) / (
            2.0**32 + 2.0
        )
        w = df["n_chars"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
                "skey": np.log(u) / w,
            }
        )

    from .agg import topk

    out = topk(
        ds.map_batches(keyed, batch_format="pandas"),
        ["skey", "doc_id"],
        k,
        descending=[True, False],
    ).to_pandas()
    out = out[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_chars": "int64"})


_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) + 1.0) / (4294967296.0 + 2.0)) / n_chars AS skey
  FROM documents
)
SELECT doc_id, n_chars FROM keyed
ORDER BY skey DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
"""


def near_dup_pair_diffs(sf_dir: str) -> pd.DataFrame:
    """Dedup FORENSICS: for every verified near-dup pair, the token-set
    overlap breakdown (n_common / n_only_a / n_only_b / integer Jaccard
    ppm) — what a curation review reads to decide whether a family is
    true mirrors (diff ≈ 0), templated boilerplate (large shared head,
    distinct tails), or a threshold artifact. Consumes the SHARED
    memoized pair table; texts attach via the same broadcast topology as
    pair verification (pair list is the dedup output itself —
    driver-bounded); per-pair set math is python over that bounded list.
    All outputs integer, so distribution order cannot move a bit."""
    from .dedup import near_dup_pairs

    pairs = near_dup_pairs(sf_dir)
    cols = ["doc_a", "doc_b", "n_common", "n_only_a", "n_only_b",
            "token_jaccard_ppm"]
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    corpus = near_dup_corpus(sf_dir)
    need = set(pairs["doc_a"]) | set(pairs["doc_b"])
    need_ref = ray.put(need)

    def grab(df: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(need_ref)
        d = df[df["doc_id"].isin(want)]
        return d[["doc_id", "text"]]

    texts = corpus.map_batches(grab, batch_format="pandas").to_pandas()
    toks = {
        int(i): frozenset(t.split(" "))
        for i, t in zip(texts["doc_id"], texts["text"])
    }
    rows = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        wa, wb = toks[int(a)], toks[int(b)]
        c = len(wa & wb)
        u = len(wa) + len(wb) - c
        rows.append(
            (int(a), int(b), c, len(wa) - c, len(wb) - c,
             (1_000_000 * c) // u if u else 0)
        )
    out = pd.DataFrame(rows, columns=cols).astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _near_dup_pair_diffs_sql() -> str:
    from .dedup import _NEAR_PAIRS_SQL

    return f"""
WITH pairs AS ({_NEAR_PAIRS_SQL}),
corpus AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-2], ' ')
  FROM documents
  WHERE doc_id % 5 = 0 AND len(string_split(text,' ')) >= 12
),
t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM corpus)
SELECT p.doc_a, p.doc_b,
       CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS n_common,
       CAST(len(a.w) - len(list_intersect(a.w, b.w)) AS BIGINT) AS n_only_a,
       CAST(len(b.w) - len(list_intersect(a.w, b.w)) AS BIGINT) AS n_only_b,
       CAST(1000000 * len(list_intersect(a.w, b.w))
            // (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))
            AS BIGINT) AS token_jaccard_ppm
FROM pairs p
JOIN t a ON a.doc_id = p.doc_a
JOIN t b ON b.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


def near_dup_degree(sf_dir: str) -> pd.DataFrame:
    """Near-dup graph degree per document (number of exact-Jaccard ≥ τ
    partners) — the skew diagnostic run before clustering: a heavy-degree
    node is a template/boilerplate family. Bounded by the verified pair set
    (the dedup query's own output), so the final count runs driver-side on
    pairs, like every pair-list consumer."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(sf_dir)
    if pairs.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "degree": pd.Series([], dtype="int64")}
        )
    m = pd.concat([pairs["doc_a"], pairs["doc_b"]]).value_counts().sort_index()
    return pd.DataFrame(
        {"doc_id": m.index.astype("int64"), "degree": m.to_numpy().astype("int64")}
    ).reset_index(drop=True)


_NEAR_DUP_DEGREE_SQL = f"""
WITH pairs AS ({_NEAR_PAIRS_SQL}),
m AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id FROM pairs
)
SELECT doc_id, COUNT(*) AS degree FROM m GROUP BY 1
"""


LANGS = ("de", "en", "es", "fr", "zh")


def lang_source_pivot(sf_dir: str) -> pd.DataFrame:
    """Per-source doc counts pivoted to one fixed column per language (the
    SQL `COUNT(*) FILTER` pivot — fixed output schema by construction). The
    wide step is one pre-aggregated (source, lang) groupby; the pivot itself
    reshapes the tiny aggregate."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )
    agg = grouped_aggregate(
        docs, ["source", "lang"], {"n": (None, "count")}
    ).to_pandas()
    wide = agg.pivot_table(
        index="source", columns="lang", values="n", aggfunc="sum", fill_value=0
    )
    out = pd.DataFrame({"source": wide.index})
    for lang in LANGS:
        out[f"n_{lang}"] = (
            wide[lang].to_numpy().astype("int64") if lang in wide else 0
        )
    return out.sort_values("source").reset_index(drop=True)


_LANG_SOURCE_PIVOT_SQL = """
SELECT source,
       COUNT(*) FILTER (WHERE lang = 'de') AS n_de,
       COUNT(*) FILTER (WHERE lang = 'en') AS n_en,
       COUNT(*) FILTER (WHERE lang = 'es') AS n_es,
       COUNT(*) FILTER (WHERE lang = 'fr') AS n_fr,
       COUNT(*) FILTER (WHERE lang = 'zh') AS n_zh
FROM documents GROUP BY source
"""


# --------------------------------------------------------------------------
# Grouped argmax: the single longest document per (lang, source)
# --------------------------------------------------------------------------

def longest_doc_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-1 row per (lang, source) by ``n_chars`` (ties broken by smallest
    ``doc_id``) — the grouped-argmax / ROW_NUMBER()=1 shape. Distributed as
    partial top-1: each batch keeps at most one candidate row per group, the
    driver reduces |groups|×|batches| candidates — no shuffle of the corpus
    and no global sort (same local-then-final topology as ``topk``, but
    keyed)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return df.groupby(["lang", "source"], sort=False).head(1)

    cands = docs.map_batches(local_best, batch_format="pandas").to_pandas()
    out = local_best(cands).astype({"doc_id": "int64", "n_chars": "int64"})
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


_LONGEST_DOC_PER_GROUP_SQL = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


GROUP_TOPK = 3


def lang_top_docs(sf_dir: str, k: int = GROUP_TOPK) -> pd.DataFrame:
    """Top-k rows per group (k=3 longest docs per language, ties by smallest
    doc_id) — the grouped ROW_NUMBER() ≤ k shape, generalizing
    ``longest_doc_per_group``'s top-1: each batch keeps at most k candidate
    rows per group, the driver reduces |groups|×k×|batches| candidates —
    no corpus shuffle, no global sort. Includes the in-group rank."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return df.groupby("lang", sort=False).head(k)

    cands = docs.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = local_topk(cands).copy()
    out["rn"] = out.groupby("lang", sort=False).cumcount() + 1
    out = out.astype({"doc_id": "int64", "n_chars": "int64", "rn": "int64"})
    return out.sort_values(["lang", "rn"]).reset_index(drop=True)[
        ["lang", "rn", "doc_id", "n_chars"]
    ]


_LANG_TOP_DOCS_SQL = f"""
SELECT lang, rn, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= {GROUP_TOPK}
"""


EXACT_K_SAMPLE = 25


def lang_sample_exact_k(sf_dir: str, k: int = EXACT_K_SAMPLE) -> pd.DataFrame:
    """EXACTLY-k deterministic sample per group — the companion to
    ``stratified_sample`` (which targets ~k via a hash-rate cutoff and can
    be off by a few): rank each group's rows by a content hash (md5 of
    doc_id, ties by doc_id) and keep the k smallest. Uniform-random in
    distribution, reproducible from the row alone, and exact-k by
    construction. Same shuffle-free topology as ``lang_top_docs``: each
    batch contributes ≤ k candidates per group, the driver reduces
    |groups|×k×|batches| bounded candidates — the corpus never moves."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if "h" not in df.columns:
            df = df.assign(
                h=[
                    hashlib.md5(str(int(d)).encode()).hexdigest()
                    for d in df["doc_id"]
                ]
            )
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(k)

    cands = docs.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = local_topk(cands).drop(columns=["h"])
    out = out.astype({"doc_id": "int64"})
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)[
        ["lang", "doc_id"]
    ]


_LANG_SAMPLE_EXACT_K_SQL = f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= {EXACT_K_SAMPLE}
ORDER BY lang, doc_id
"""


# --------------------------------------------------------------------------
# PageRank (iterative edge-keyed shuffle, exact integer arithmetic)
# --------------------------------------------------------------------------

PAGERANK_ITERS = 3
PAGERANK_SCALE = 10**12  # ranks as SCALE-scaled int64 — exact, order-free sums
PAGERANK_OUTDEG = 3


def doc_pagerank(sf_dir: str, iters: int = PAGERANK_ITERS) -> pd.DataFrame:
    """PageRank over a deterministic doc-link graph — THE canonical
    iterative web-scale computation, in its native Ray Data topology: each
    Lloyd-style iteration is one edge-keyed shuffle (flat-map each node's
    rank into out-edge contributions, partial+final sum by destination),
    no adjacency ever materializes on the driver.

    The graph is derived from doc_id so the oracle reconstructs it in SQL
    (doc_ids are contiguous 0..N-1): node d links to (17·d + 13·k) mod N,
    k = 1..3. Damping 0.85 in EXACT integer arithmetic — ranks are
    SCALE-scaled int64, per-edge contributions are ``(r·85) // (3·100)``
    and the teleport term ``(15·SCALE) // (100·N)`` — so distributed sum
    order cannot perturb a single bit and the unrolled-CTE DuckDB oracle
    matches exactly. Per-node zero rows keep in-degree-0 nodes present."""
    import pyarrow.parquet as pq

    from .agg import grouped_aggregate

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    teleport = (15 * PAGERANK_SCALE) // (100 * n)
    r0 = PAGERANK_SCALE // n

    ranks = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(),
             "ru": np.full(len(df), r0, dtype="int64")}
        ),
        batch_format="pandas",
    )

    ks = np.arange(1, PAGERANK_OUTDEG + 1, dtype="int64")

    for _ in range(iters):

        def contribs(df: pd.DataFrame) -> pd.DataFrame:
            src = df["doc_id"].to_numpy()
            ru = df["ru"].to_numpy()
            dst = (17 * src[:, None] + 13 * ks[None, :]) % n
            c = (ru * 85) // (100 * PAGERANK_OUTDEG)
            return pd.DataFrame(
                {
                    # the per-node zero row keeps in-degree-0 nodes in the
                    # aggregate (they still earn the teleport term)
                    "doc_id": np.concatenate([dst.ravel(), src]),
                    "c": np.concatenate(
                        [np.repeat(c, PAGERANK_OUTDEG),
                         np.zeros(len(src), dtype="int64")]
                    ),
                }
            )

        summed = grouped_aggregate(
            ranks.map_batches(contribs, batch_format="pandas"),
            ["doc_id"],
            {"ru": ("c", "sum")},
        )
        ranks = summed.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(),
                 "ru": (df["ru"].to_numpy() + teleport).astype("int64")}
            ),
            batch_format="pandas",
        )

    out = ranks.to_pandas().rename(columns={"ru": "rank_u"})
    return out.astype({"doc_id": "int64", "rank_u": "int64"}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def _pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    scale, od = PAGERANK_SCALE, PAGERANK_OUTDEG
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "e AS (",
        f"  SELECT d.doc_id AS src,",
        f"         (17 * d.doc_id + 13 * t.k) % (SELECT c FROM nn) AS dst",
        f"  FROM documents d, (VALUES (1), (2), (3)) t(k)",
        "),",
        f"r0 AS (SELECT doc_id, {scale} // (SELECT c FROM nn) AS ru FROM documents)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.insert(
            len(parts),
            f", r{i} AS ("
            f"  SELECT d.doc_id,"
            f"         (15 * {scale}) // (100 * (SELECT c FROM nn))"
            f"         + COALESCE(CAST(SUM((p.ru * 85) // {100 * od}) AS BIGINT), 0)"
            f"           AS ru"
            f"  FROM documents d"
            f"  LEFT JOIN e ON e.dst = d.doc_id"
            f"  LEFT JOIN {prev} p ON p.doc_id = e.src"
            f"  GROUP BY d.doc_id)",
        )
        prev = f"r{i}"
    parts.append(f"SELECT doc_id, CAST(ru AS BIGINT) AS rank_u FROM {prev}")
    return "\n".join(parts)


HITS_TOPK = 100


def hits_scores(sf_dir: str) -> pd.DataFrame:
    """HITS hubs & authorities (Kleinberg) over a deterministic doc-link
    graph — the other canonical web-graph iteration next to
    ``doc_pagerank``, with the same exact-integer discipline: two
    unrolled unnormalized steps (a1 = in-degree, h1 = Σ a1 over
    out-links, a2 = Σ h1 over in-links) are pure int64 sums, so
    distributed accumulation order cannot move a bit and the unrolled-CTE
    oracle matches exactly.

    Graph (oracle-reconstructable from contiguous doc_ids): node d links
    to ``(23·d + 7·k) mod N`` for k = 1..(1 + d%3) — out-degree varies
    1..3 so in-degrees (and therefore scores) are non-uniform.

    Topology: edges derive per batch from doc_id (never materialized
    driver-side); a1 is one edge-keyed partial+final count; h1 computes
    in-batch from the broadcast a1 map (bounded by |nodes| — at 10^12
    docs this becomes a hash join on dst, the
    ``supplier_nation_hash_join`` path); a2 is a second edge-keyed
    shuffle of h1 contributions. Output: top-{HITS_TOPK} authorities."""
    import pyarrow.parquet as pq
    import ray

    from .agg import grouped_aggregate

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def edges_of(src: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(src_repeated, dst) for the varying-out-degree modular graph."""
        deg = 1 + (src % 3)
        src_rep = np.repeat(src, deg)
        # ragged arange (k = 1..deg per source), fully vectorized
        starts = np.repeat(np.cumsum(deg) - deg, deg)
        k = np.arange(len(src_rep), dtype="int64") - starts + 1
        return src_rep, (23 * src_rep + 7 * k) % n

    def a1_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, dst = edges_of(df["doc_id"].to_numpy())
        return pd.DataFrame({"doc_id": dst})

    a1 = grouped_aggregate(docs, ["doc_id"], {"a1": (None, "count")}, prepare=a1_partial).to_pandas()
    a1_ref = ray.put(dict(zip(a1["doc_id"].astype(int), a1["a1"].astype(int))))

    def h1_then_a2_contribs(df: pd.DataFrame) -> pd.DataFrame:
        a1_map = ray.get(a1_ref)
        src = df["doc_id"].to_numpy()
        src_rep, dst = edges_of(src)
        a1_dst = pd.Series(dst).map(a1_map).fillna(0).astype("int64")
        # h1 per source = sum of a1 over its out-links (all in this batch)
        h1_by_src = a1_dst.groupby(src_rep).sum()
        h1_rep = pd.Series(src_rep).map(h1_by_src).to_numpy(dtype="int64")
        # zero rows keep every node present (in-degree-0 authorities)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([dst, src]),
                "c": np.concatenate([h1_rep, np.zeros(len(src), dtype="int64")]),
            }
        )

    a2 = grouped_aggregate(
        docs, ["doc_id"], {"auth": ("c", "sum")}, prepare=h1_then_a2_contribs
    ).to_pandas()
    a2 = a2.astype({"doc_id": "int64", "auth": "int64"})
    out = a2.sort_values(["auth", "doc_id"], ascending=[False, True]).head(HITS_TOPK)
    return out.reset_index(drop=True)


_HITS_SCORES_SQL = f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT d.doc_id AS src,
         (23 * d.doc_id + 7 * t.k) % (SELECT c FROM nn) AS dst
  FROM documents d, (VALUES (1), (2), (3)) t(k)
  WHERE t.k <= 1 + d.doc_id % 3
),
a1 AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS a1 FROM e GROUP BY 1),
h1 AS (
  SELECT e.src, CAST(SUM(COALESCE(a1.a1, 0)) AS BIGINT) AS h1
  FROM e LEFT JOIN a1 ON a1.dst = e.dst
  GROUP BY e.src
),
a2 AS (
  SELECT d.doc_id, CAST(COALESCE(SUM(h1.h1), 0) AS BIGINT) AS auth
  FROM documents d
  LEFT JOIN e  ON e.dst = d.doc_id
  LEFT JOIN h1 ON h1.src = e.src
  GROUP BY d.doc_id
)
SELECT doc_id, auth FROM a2
ORDER BY auth DESC, doc_id
LIMIT {HITS_TOPK}
"""


# --------------------------------------------------------------------------
# Deterministic source-mixture sampling (corpus re-weighting)
# --------------------------------------------------------------------------

MIXTURE_DENOM = 1000


def _mixture_rate_millis(source_num: np.ndarray) -> np.ndarray:
    """Per-source keep rate in 1/MIXTURE_DENOM units: srcN keeps
    (N % 4 + 1)/4 of its docs — the training-mixture weights table, derived
    from the source name so the oracle can reconstruct it in SQL."""
    return (source_num % 4 + 1) * (MIXTURE_DENOM // 4)


def source_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Training-data mixture sampling: down-weight each source to its
    mixture rate with a DETERMINISTIC per-row coin —
    ``md5(doc_id ':' source) % 1000 < rate`` — so the sample is
    reproducible, resumable (a rerun keeps exactly the same rows) and
    joinable across stages. In production the rate map is a broadcast dict
    keyed by source; here it derives from the source name so DuckDB mirrors
    it. Embarrassingly parallel map_batches — no shuffle, no state."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        src = df["source"].to_numpy()
        src_num = np.fromiter(
            (int(s[3:]) for s in src), dtype=np.int64, count=len(src)
        )
        rate = _mixture_rate_millis(src_num)
        coin = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{int(a)}:{s}".encode()).digest()[8:16], "little"
                )
                % MIXTURE_DENOM
                for a, s in zip(d, src)
            ),
            dtype=np.int64,
            count=len(d),
        )
        m = coin < rate
        return pd.DataFrame({"doc_id": d[m], "source": src[m]})

    out = docs.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


_SOURCE_MIXTURE_SAMPLE_SQL = f"""
SELECT doc_id, source FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || source)
        % {MIXTURE_DENOM}
      < (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * {MIXTURE_DENOM // 4}
"""


# --------------------------------------------------------------------------
# Temperature mixture sampling (α = 1/2): target share ∝ sqrt(source size)
# --------------------------------------------------------------------------

TEMP_DENOM = 1_000_000  # coin resolution (ppm)
TEMP_BUDGET_DIV = 2  # doc budget = total docs // 2


def temperature_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Temperature-flattened source mixture (the LLaMA/PaLM data-mixing
    rule at α = 1/2): each source's TARGET share of the kept corpus is
    proportional to ``sqrt(n_source)`` — large sources down-weighted,
    small sources up-weighted relative to natural proportions — realized
    by a deterministic per-row md5 coin so the sample is reproducible and
    resumable. α = 1/2 specifically because IEEE ``sqrt`` is correctly
    rounded (bit-identical in numpy and DuckDB), and the weights are then
    QUANTIZED to integers (``round(sqrt(n)·1e6)``) so every downstream
    quantity — targets, thresholds, kept counts — is exact integer
    arithmetic with no float-summation order hazard.

    Scale shape: one slim grouped count (partial+final), driver holds one
    row per SOURCE (broadcast thresholds via closure), one coin-filter
    pass with per-batch partial counts. Returns the per-source
    reconciliation (source, n_docs, sqrt_weight_micro, n_target, n_kept).
    """
    import math

    from .agg import grouped_aggregate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    counts = grouped_aggregate(
        docs, ["source"], {"n": (None, "count")}
    ).to_pandas()
    counts["n"] = counts["n"].astype("int64")
    total_n = int(counts["n"].sum())
    counts["w"] = [
        int(round(math.sqrt(int(n)) * 1_000_000)) for n in counts["n"]
    ]
    total_w = int(counts["w"].sum())
    budget = total_n // TEMP_BUDGET_DIV
    counts["n_target"] = [
        budget * int(w) // total_w for w in counts["w"]
    ]
    thresh = {
        s: min(TEMP_DENOM, int(t) * TEMP_DENOM // int(n))
        for s, n, t in zip(counts["source"], counts["n"], counts["n_target"])
    }

    def partial_kept(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        src = df["source"].to_numpy()
        coin = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{int(a)}:{s}".encode()).digest()[8:16],
                    "little",
                )
                % TEMP_DENOM
                for a, s in zip(d, src)
            ),
            dtype=np.int64,
            count=len(d),
        )
        th = np.fromiter(
            (thresh[s] for s in src), dtype=np.int64, count=len(src)
        )
        return pd.DataFrame({"source": src[coin < th]})

    kept = grouped_aggregate(
        docs, ["source"], {"n_kept": (None, "count")}, prepare=partial_kept
    ).to_pandas()
    out = counts.merge(kept, on="source", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out = out.rename(columns={"n": "n_docs", "w": "sqrt_weight_micro"})
    return (
        out[["source", "n_docs", "sqrt_weight_micro", "n_target", "n_kept"]]
        .sort_values("source")
        .reset_index(drop=True)
        .astype(
            {
                "n_docs": "int64",
                "sqrt_weight_micro": "int64",
                "n_target": "int64",
                "n_kept": "int64",
            }
        )
    )


_TEMPERATURE_MIXTURE_SQL = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
), w AS (
  SELECT source, n,
         CAST(ROUND(sqrt(n) * 1000000, 0) AS BIGINT) AS w
  FROM c
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total_n,
         CAST(SUM(w) AS BIGINT) AS total_w
  FROM w
), t AS (
  SELECT w.source, w.n, w.w,
         (tot.total_n // {TEMP_BUDGET_DIV}) * w.w // tot.total_w AS n_target,
         LEAST({TEMP_DENOM},
               ((tot.total_n // {TEMP_BUDGET_DIV}) * w.w // tot.total_w)
                 * {TEMP_DENOM} // w.n) AS thresh
  FROM w, tot
), k AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM documents d JOIN t USING (source)
  WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR) || ':' || d.source)
          % {TEMP_DENOM} < t.thresh
  GROUP BY 1
)
SELECT t.source, t.n AS n_docs, t.w AS sqrt_weight_micro,
       CAST(t.n_target AS BIGINT) AS n_target,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN k USING (source)
ORDER BY t.source
"""


# --------------------------------------------------------------------------
# Token-budgeted mixture planner
# --------------------------------------------------------------------------

BUDGET_FRAC = 0.4  # target corpus size as a fraction of total tokens
BUDGET_DENOM = 1_000_000  # coin resolution (rates quantized to ppm)


def token_budget_mixture(sf_dir: str) -> pd.DataFrame:
    """Token-budgeted mixture planning: given a global token budget
    (``BUDGET_FRAC`` of the corpus), allocate it EQUALLY across sources and
    derive each source's deterministic sampling rate
    ``min(1, budget_per_source / source_tokens)`` — small sources are kept
    whole, big sources are downsampled toward balance (the practical version
    of the mixture-reweighting step in LLM data recipes). Reports, per
    source, the plan (token counts, rate in ppm) AND the realized sample
    (kept docs/tokens under the md5-coin filter), so planned vs realized
    rates are auditable in one table.

    Scale topology: pass 1 is a partial+final per-source token count
    (bounded by |sources|); the threshold math is driver-side over that tiny
    table; pass 2 re-streams the corpus through a worker-local coin filter
    (rate map broadcast via the closure) into a second bounded rollup. Two
    corpus scans, zero shuffles of the wide side, no driver row ever holds
    text."""
    import math

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"],
                "nt": pd.Series(
                    [len(t.split(" ")) for t in df["text"]], dtype="int64"
                ),
            }
        )

    per = grouped_aggregate(
        docs,
        ["source"],
        {"n_docs": (None, "count"), "n_tokens": ("nt", "sum")},
        prepare=tok_rows,
    ).to_pandas()
    per = per.astype({"n_docs": "int64", "n_tokens": "int64"})
    total = float(per["n_tokens"].sum())
    ns = float(len(per))
    per["rate_ppm"] = [
        int(
            math.floor(
                min(1.0, ((BUDGET_FRAC * total) / ns) / float(st)) * BUDGET_DENOM
            )
        )
        for st in per["n_tokens"]
    ]
    thresh = dict(zip(per["source"], per["rate_ppm"]))

    def kept_rows(df: pd.DataFrame) -> pd.DataFrame:
        srcs, nts = [], []
        for d, s, t in zip(df["doc_id"], df["source"], df["text"]):
            coin = (
                int.from_bytes(
                    hashlib.md5(f"{int(d)}#{s}".encode()).digest()[8:16], "little"
                )
                % BUDGET_DENOM
            )
            if coin < thresh[s]:
                srcs.append(s)
                nts.append(len(t.split(" ")))
        return pd.DataFrame(
            {"source": srcs, "nt": pd.Series(nts, dtype="int64")}
        )

    kept = grouped_aggregate(
        docs,
        ["source"],
        {"kept_docs": (None, "count"), "kept_tokens": ("nt", "sum")},
        prepare=kept_rows,
    ).to_pandas()

    out = per.merge(kept, on="source", how="left")
    out["kept_docs"] = out["kept_docs"].fillna(0).astype("int64")
    out["kept_tokens"] = out["kept_tokens"].fillna(0).astype("int64")
    out["rate_ppm"] = out["rate_ppm"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_TOKEN_BUDGET_MIXTURE_SQL = f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
), tot AS (
  SELECT CAST(SUM(nt) AS DOUBLE) AS t, COUNT(DISTINCT source) AS ns FROM tok
), plan AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
         CAST(FLOOR(LEAST(1.0, (({BUDGET_FRAC} * tot.t) / tot.ns)
                               / CAST(SUM(nt) AS DOUBLE)) * {BUDGET_DENOM})
              AS BIGINT) AS rate_ppm
  FROM tok, tot
  GROUP BY source, tot.t, tot.ns
), kept AS (
  SELECT k.source, COUNT(*) AS kept_docs, CAST(SUM(k.nt) AS BIGINT) AS kept_tokens
  FROM tok k JOIN plan p USING (source)
  WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || '#' || k.source)
          % {BUDGET_DENOM} < p.rate_ppm
  GROUP BY k.source
)
SELECT p.source, p.n_docs, p.n_tokens, p.rate_ppm,
       COALESCE(k.kept_docs, 0) AS kept_docs,
       COALESCE(k.kept_tokens, 0) AS kept_tokens
FROM plan p LEFT JOIN kept k USING (source)
"""


def corpus_report(sf_dir: str) -> pd.DataFrame:
    """One-call corpus health dashboard — the first thing run on a new
    drop: document/token volume, exact-duplicate rate, language/source
    breadth, and mean document length, as one (metric, value) table.

    Two bounded passes: a single partial+final scan accumulates the scalar
    sums (docs, tokens) and per-batch-deduped (lang, source) keys; the
    distinct-text count rides the same hash-collapse machinery as exact
    dedup. Every value is exact integer math (the mean rounds at the end),
    so the oracle is a UNION ALL of scalar selects."""
    import hashlib

    from .agg import round_half_away

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]],
                "lang": df["lang"],
                "source": df["source"],
                "nt": pd.Series(
                    [len(t.split(" ")) for t in df["text"]], dtype="int64"
                ),
            }
        )

    per_hash = grouped_aggregate(
        docs,
        ["h"],
        {"n": (None, "count"), "sum_nt": ("nt", "sum")},
        prepare=slim,
    ).to_pandas()
    n_docs = int(per_hash["n"].sum())
    n_tokens = int(per_hash["sum_nt"].sum())
    n_distinct_texts = len(per_hash)

    def cats(df: pd.DataFrame) -> pd.DataFrame:
        # no hashing needed for the categorical breadth counts
        return df[["lang", "source"]]

    langs = grouped_aggregate(
        docs, ["lang"], {"n": (None, "count")}, prepare=cats
    ).to_pandas()
    sources = grouped_aggregate(
        docs, ["source"], {"n": (None, "count")}, prepare=cats
    ).to_pandas()

    rows = [
        ("n_docs", float(n_docs)),
        ("n_tokens", float(n_tokens)),
        ("n_distinct_texts", float(n_distinct_texts)),
        ("n_exact_dup_docs", float(n_docs - n_distinct_texts)),
        ("n_langs", float(len(langs))),
        ("n_sources", float(len(sources))),
        (
            "mean_doc_tokens",
            float(round_half_away(float(n_tokens) * 1.0 / float(n_docs), 4)),
        ),
    ]
    return pd.DataFrame(rows, columns=["metric", "value"])


_CORPUS_REPORT_SQL = """
WITH t AS (
  SELECT md5(text) AS h, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
)
SELECT 'n_docs' AS metric, COUNT(*) * 1.0 AS value FROM t
UNION ALL SELECT 'n_tokens', SUM(nt) * 1.0 FROM t
UNION ALL SELECT 'n_distinct_texts', COUNT(DISTINCT h) * 1.0 FROM t
UNION ALL SELECT 'n_exact_dup_docs',
                 (COUNT(*) - COUNT(DISTINCT h)) * 1.0 FROM t
UNION ALL SELECT 'n_langs', COUNT(DISTINCT lang) * 1.0 FROM t
UNION ALL SELECT 'n_sources', COUNT(DISTINCT source) * 1.0 FROM t
UNION ALL SELECT 'mean_doc_tokens',
                 ROUND(SUM(nt) * 1.0 / COUNT(*), 4) FROM t
"""


def near_dup_keepers(sf_dir: str) -> pd.DataFrame:
    """Cluster-representative selection over the near-dup components — the
    Dolma/RedPajama rule "keep the LONGEST member" (min-id keepers lose
    content when the twin is the truncated copy): per component, the
    longest text wins, ties to the smallest doc_id, singletons keep
    themselves.

    Topology: the component labels come from the mined pair list
    (driver-bounded — it is the dedup output itself) via union-find,
    broadcast once; ONE corpus pass emits slim (component, doc_id, len)
    rows, and the keeper is a grouped ARGMAX — per-batch top-1 per
    component, bounded final reduce. At pair counts past the union-find
    bound the labels come from the distributed min-label propagation of
    ``near_dup_components`` and the argmax shape is unchanged."""
    from .dedup import near_dup_corpus, near_dup_pairs

    pairs = near_dup_pairs(sf_dir)
    labels_ref = ray.put(_union_find_labels(pairs))
    corpus = near_dup_corpus(sf_dir)

    def member_rows(df: pd.DataFrame) -> pd.DataFrame:
        labels = ray.get(labels_ref)
        ids = df["doc_id"].astype("int64")
        lens = df["text"].str.len().astype("int64")
        comp = pd.Series(
            [labels.get(int(i), int(i)) for i in ids], dtype="int64", index=ids.index
        )
        # per-batch top-1 per component (argmax partial)
        part = pd.DataFrame(
            {"component": comp, "doc_id": ids, "keeper_len": lens, "n": 1}
        )
        part = part.sort_values(
            ["component", "keeper_len", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        agg = part.groupby("component", sort=False).agg(
            doc_id=("doc_id", "first"),
            keeper_len=("keeper_len", "first"),
            n=("n", "sum"),
        )
        return agg.reset_index()

    parts = corpus.map_batches(member_rows, batch_format="pandas").to_pandas()
    parts = parts.sort_values(
        ["component", "keeper_len", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    keep = parts.groupby("component", sort=True).agg(
        keeper_doc_id=("doc_id", "first"),
        keeper_len=("keeper_len", "first"),
        n_members=("n", "sum"),
    )
    out = keep.reset_index().astype(
        {
            "component": "int64",
            "keeper_doc_id": "int64",
            "keeper_len": "int64",
            "n_members": "int64",
        }
    )
    return out[["component", "keeper_doc_id", "keeper_len", "n_members"]]


def _near_dup_keepers_sql() -> str:
    from .dedup import MIN_TWIN_WORDS, NEAR_TWIN_OFFSET

    return f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_NEAR_PAIRS_SQL}) q
), corpus AS (
  SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
  UNION ALL
  SELECT doc_id + {NEAR_TWIN_OFFSET} AS doc_id,
         array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-2], ' ') AS text
  FROM documents
  WHERE doc_id % 5 = 0 AND len(string_split(text,' ')) >= {MIN_TWIN_WORDS}
), edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM pairs
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
), ranked AS (
  SELECT c.component, c.doc_id, length(t.text) AS keeper_len,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY length(t.text) DESC, c.doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY c.component) AS n_members
  FROM comp c JOIN corpus t USING (doc_id)
)
SELECT component, doc_id AS keeper_doc_id, keeper_len, n_members
FROM ranked WHERE rk = 1
"""


def source_lang_kl(sf_dir: str) -> pd.DataFrame:
    """Per-source mixture drift: KL divergence of each source's language
    distribution from the corpus-wide distribution — the diagnostic that
    flags a crawl source whose language mix has shifted from the corpus
    it feeds (0 = identical mix; bigger = more skewed). KL is finite by
    construction: every (source, lang) cell's corpus marginal is positive.

    Scale topology: ONE partial+final count over (source, lang) — the only
    corpus pass; all probability/log math runs on the |sources|×|langs|
    count table on the driver. Results round to 6 decimals so the
    order-of-summation float noise between the distributed and SQL sums
    cannot flip the comparison."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )
    c = grouped_aggregate(
        docs, ["source", "lang"], {"n": (None, "count")}
    ).to_pandas()
    c["n"] = c["n"].astype("int64")
    n_total = float(c["n"].sum())
    lang_n = c.groupby("lang")["n"].sum().astype("int64")
    rows = []
    for source, g in c.groupby("source"):
        ns = float(g["n"].sum())
        kl = 0.0
        for lang, n in sorted(zip(g["lang"], g["n"])):
            p = float(n) * 1.0 / ns
            q = float(lang_n[lang]) * 1.0 / n_total
            kl += p * np.log(p / q)
        rows.append((source, int(ns), kl))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "kl_divergence"])
    out["kl_divergence"] = round_half_away(out["kl_divergence"].to_numpy(), 6)
    return out.sort_values("source").reset_index(drop=True)


_SOURCE_LANG_KL_SQL = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
), s AS (
  SELECT source, SUM(n) AS ns FROM c GROUP BY source
), g AS (
  SELECT lang, SUM(n) AS nl FROM c GROUP BY lang
), t AS (
  SELECT SUM(n) AS nt FROM c
)
SELECT c.source, CAST(s.ns AS BIGINT) AS n_docs,
       ROUND(SUM((c.n * 1.0 / s.ns)
                 * ln((c.n * 1.0 / s.ns) / (g.nl * 1.0 / t.nt))), 6)
         AS kl_divergence
FROM c
JOIN s USING (source)
JOIN g USING (lang)
CROSS JOIN t
GROUP BY c.source, s.ns
"""


def lang_outlier_docs(sf_dir: str) -> pd.DataFrame:
    """Label-consistency audit: documents whose ``lang`` differs from their
    SOURCE's majority language — the cheap mislabel/contamination screen a
    curation run applies before per-language mixing (a wrong-language page
    inside a monolingual source is usually boilerplate, spam, or a language-ID
    error). Majority ties break to the lexicographically smallest lang so the
    result is deterministic.

    Scale shape: one partial+final aggregate builds the (source, lang, n)
    table — bounded by |sources| × |langs|, never pages — the majority map is
    broadcast once, and flagging is a stateless vectorized filter over the
    streamed corpus. No shuffle touches the documents table."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source"],
    )
    counts = grouped_aggregate(
        docs, ["source", "lang"], {"n": (None, "count")}
    ).to_pandas()
    counts = counts.sort_values(
        ["source", "n", "lang"], ascending=[True, False, True], kind="mergesort"
    )
    majority = dict(
        zip(
            counts.drop_duplicates("source")["source"],
            counts.drop_duplicates("source")["lang"],
        )
    )
    maj_ref = ray.put(majority)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(maj_ref)
        ml = df["source"].map(m)
        out = df[df["lang"] != ml].copy()
        out["majority_lang"] = ml[df["lang"] != ml]
        return out[["doc_id", "source", "lang", "majority_lang"]].astype(
            {"doc_id": "int64"}
        )

    out = docs.map_batches(flag, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_LANG_OUTLIER_DOCS_SQL = """
WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
m AS (
  SELECT source, lang AS majority_lang FROM (
    SELECT source, lang,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
    FROM c
  ) WHERE rn = 1
)
SELECT d.doc_id, d.source, d.lang, m.majority_lang
FROM documents d JOIN m USING (source)
WHERE d.lang <> m.majority_lang
ORDER BY d.doc_id
"""


BFS_SEED_MOD = 101


def two_hop_neighbors(sf_dir: str) -> pd.DataFrame:
    """Breadth-first frontier expansion from a seed set: distinct nodes
    within ≤2 hops of each seed over the corpus link graph (same
    deterministic graph as ``doc_pagerank``/``hits_scores``) — the traversal
    shape behind seed-based crawl scoping and link-spam neighborhood audits.

    Scale shape (broadcast-frontier BFS): the FRONTIER is the small side —
    seeds × out-degree^hop rows — broadcast once per hop (``ray.put``),
    while the EDGE table only ever streams through ``map_batches``; each hop
    is a map-side semi-join emitting (seed, node) pairs, deduped by a
    partial+final aggregate bounded by the frontier, never the graph. No
    all-to-all shuffle at any hop; the pattern holds for any hop count whose
    frontier fits a broadcast (salt/partition the frontier beyond that)."""
    from .agg import grouped_aggregate

    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    ks = np.arange(1, 4, dtype="int64")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    seeds = sorted(
        int(d)
        for d in docs.map_batches(
            lambda df: df[df["doc_id"] % BFS_SEED_MOD == 0],
            batch_format="pandas",
        ).to_pandas()["doc_id"]
    )

    def hop(frontier: dict[int, np.ndarray]) -> pd.DataFrame:
        """One BFS hop: stream edges, keep those leaving the frontier,
        emit (seed, dst) for every seed that reached the edge's source."""
        ref = ray.put(frontier)

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(ref)
            src = df["doc_id"].to_numpy()
            hit = np.isin(src, np.fromiter(fr.keys(), dtype="int64"))
            src = src[hit]
            if not len(src):
                return pd.DataFrame(
                    {"seed": pd.Series([], dtype="int64"),
                     "node": pd.Series([], dtype="int64")}
                )
            dst = (17 * src[:, None] + 13 * ks[None, :]) % n
            out_seed, out_node = [], []
            for s_, row in zip(src, dst):
                for seed in fr[int(s_)]:
                    keep = row != s_  # drop self-loops
                    out_seed.append(np.full(keep.sum(), seed, dtype="int64"))
                    out_node.append(row[keep])
            return pd.DataFrame(
                {
                    "seed": np.concatenate(out_seed),
                    "node": np.concatenate(out_node),
                }
            )

        return grouped_aggregate(
            docs.map_batches(expand, batch_format="pandas"),
            ["seed", "node"],
            {"one": (None, "count")},
        ).to_pandas()[["seed", "node"]]

    h1 = hop({s: np.array([s], dtype="int64") for s in seeds})
    # frontier for hop 2: node → seeds that reached it
    fr2: dict[int, list] = {}
    for seed, node in zip(h1["seed"], h1["node"]):
        fr2.setdefault(int(node), []).append(int(seed))
    h2 = hop({k: np.array(v, dtype="int64") for k, v in fr2.items()})

    both = pd.concat([h1, h2]).drop_duplicates()
    both = both[both["node"] != both["seed"]]
    out = (
        both.groupby("seed", sort=True)
        .size()
        .rename("n_within_2")
        .reset_index()
        .astype({"seed": "int64", "n_within_2": "int64"})
    )
    return out


_TWO_HOP_NEIGHBORS_SQL = f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT doc_id AS src, (17 * doc_id + 13 * t.k) % (SELECT c FROM nn) AS dst
  FROM documents, (VALUES (1), (2), (3)) t(k)
  WHERE doc_id <> (17 * doc_id + 13 * t.k) % (SELECT c FROM nn)
),
s AS (SELECT doc_id AS seed FROM documents WHERE doc_id % {BFS_SEED_MOD} = 0),
h1 AS (SELECT DISTINCT s.seed, e.dst AS node FROM s JOIN e ON e.src = s.seed),
h2 AS (SELECT DISTINCT h1.seed, e.dst AS node FROM h1 JOIN e ON e.src = h1.node),
allhops AS (SELECT seed, node FROM h1 UNION SELECT seed, node FROM h2)
SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_within_2
FROM allhops WHERE node <> seed GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# k-core decomposition (iterative peeling) over the link graph
# --------------------------------------------------------------------------

#: k-core parameters: the core order and the peel-round cap shared by the
#: Ray side and the unrolled SQL mirror. The varying-out-degree HITS graph
#: (d → (23d+7k) mod N, k = 1..1+d%3) converges in 5/8/10 rounds at
#: N = 500 / 5k / 50k — the cap is slack above every test scale, and the
#: Ray side additionally STOPS at the fixpoint, so results are identical
#: whenever convergence happens within the cap (asserted in tests).
KCORE_K = 3
KCORE_ROUNDS = 16

#: at or below this many (distinct, undirected) edges the peel loop runs on
#: the driver over the ALREADY-AGGREGATED slim edge table — a distributed
#: round has fixed scheduling overhead regardless of size, so a bounded
#: graph peels ~9× faster in one numpy loop (bench: 14.6 s → 1.7 s; the
#: large path itself dropped to 2.2 s once the per-round actor-pool
#: filters became one fused map_batches task stage).
#: Same adaptive discipline as COMPONENTS_SMALL_MAX_EDGES; both paths are
#: asserted equal in tests.
KCORE_SMALL_MAX_EDGES = 5_000_000


def kcore_nodes(
    sf_dir: str,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    small_max_edges: int = KCORE_SMALL_MAX_EDGES,
) -> pd.DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete nodes
    of undirected degree < k until none remain; output the surviving
    nodes with their degree INSIDE the core subgraph. The k-core is the
    classic link-farm / spam-cluster separator next to PageRank/HITS —
    dense cores survive, tendrils and sparse boilerplate link rings peel
    away (Seidman 1983; web-graph usage per Kumar et al., "Trawling the
    Web for emerging cyber-communities").

    Graph: the deterministic varying-out-degree modular graph shared with
    ``hits_scores`` (node d → (23d + 7k) mod N for k = 1..1+d%3), made
    undirected and deduplicated.

    Topology per peel round (all slim int64 pair/node tables — payloads
    never enter):
      1. degree: one partial+final grouped count over both edge endpoints;
      2. the round's REMOVED set (deg < k) comes back to the driver — it
         is the per-round peel DELTA, so across the whole run the driver
         sees each node at most once; at 10^12-node scale the same filter
         runs as a Bloom-prefiltered distributed anti-join instead
         (``bloom_semi_prefilter``), with identical semantics;
      3. edges drop rows touching removed nodes via one broadcast
         anti-filter per endpoint, then MATERIALIZE — the standard
         iterative-graph tradeoff (per-round materialization of the edge
         table, as in GraphX/Pregel), which keeps round r+1 from
         re-executing round r's lineage.
    Terminates at the fixpoint (no removals) or after ``rounds`` peels,
    whichever is first — mirroring the unrolled SQL exactly whenever the
    fixpoint lands inside the cap."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def und_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = df["doc_id"].to_numpy()
        deg = 1 + (src % 3)
        src_rep = np.repeat(src, deg)
        starts = np.repeat(np.cumsum(deg) - deg, deg)
        kk = np.arange(len(src_rep), dtype="int64") - starts + 1
        dst = (23 * src_rep + 7 * kk) % n
        keep = src_rep != dst
        return pd.DataFrame(
            {
                "u": np.minimum(src_rep[keep], dst[keep]),
                "v": np.maximum(src_rep[keep], dst[keep]),
            }
        )

    edges = (
        grouped_aggregate(
            docs.map_batches(und_edges, batch_format="pandas"),
            ["u", "v"],
            {"m": (None, "count")},
        )
        .drop_columns(["m"])
        .materialize()
    )

    # SMALL path: the distinct-edge table (out-degree ≤ 3 → ≤ 3N edges, far
    # smaller after dedup) fits comfortably; peel in one driver numpy loop.
    # Each node id appears only in this slim pair table — payloads never
    # came near the graph.
    if 3 * n <= small_max_edges:
        e = edges.to_pandas()
        for _ in range(rounds):
            deg = pd.concat([e["u"], e["v"]]).value_counts()
            dead = set(deg[deg < k].index)
            if not dead:
                break
            e = e[~e["u"].isin(dead) & ~e["v"].isin(dead)]
        deg = pd.concat([e["u"], e["v"]]).value_counts().sort_index()
        deg = deg[deg >= k]
        return pd.DataFrame(
            {
                "doc_id": deg.index.to_numpy(dtype="int64"),
                "core_deg": deg.to_numpy(dtype="int64"),
            }
        )

    def both_ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])}
        )

    deg = None
    for _ in range(rounds):
        deg = grouped_aggregate(
            edges, ["node"], {"deg": (None, "count")}, prepare=both_ends
        ).materialize()
        removed = deg.filter(expr=f"deg < {k}").to_pandas()
        if removed.empty:
            break
        dead_ref = ray.put(frozenset(int(x) for x in removed["node"]))

        def drop_dead(df: pd.DataFrame, _ref=dead_ref) -> pd.DataFrame:
            dead = ray.get(_ref)
            return df[~df["u"].isin(dead) & ~df["v"].isin(dead)]

        edges = edges.map_batches(
            drop_dead, batch_format="pandas"
        ).materialize()
    else:
        # cap reached: recount so the reported degrees match the final
        # edge set (mirrors the SQL's last unrolled degree pass)
        deg = grouped_aggregate(
            edges, ["node"], {"deg": (None, "count")}, prepare=both_ends
        )

    out = deg.to_pandas()
    out = out[out["deg"] >= k].astype({"node": "int64", "deg": "int64"})
    out = out.rename(columns={"node": "doc_id", "deg": "core_deg"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peeling mirror: each round re-derives degrees and drops
    nodes below k; ``rounds`` rounds exactly (the Ray side's fixpoint
    early-exit is equivalent once converged — extra rounds are no-ops)."""
    parts = [
        """WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e0 AS MATERIALIZED (
  SELECT DISTINCT
         LEAST(d.doc_id, (23 * d.doc_id + 7 * t.k) % (SELECT c FROM nn)) AS u,
         GREATEST(d.doc_id, (23 * d.doc_id + 7 * t.k) % (SELECT c FROM nn)) AS v
  FROM documents d, (VALUES (1), (2), (3)) t(k)
  WHERE t.k <= 1 + d.doc_id % 3
    AND d.doc_id <> (23 * d.doc_id + 7 * t.k) % (SELECT c FROM nn)
)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
d{r} AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r})
        GROUP BY 1),
e{r + 1} AS MATERIALIZED (SELECT u, v FROM e{r}
        WHERE u NOT IN (SELECT node FROM d{r} WHERE deg < {k})
          AND v NOT IN (SELECT node FROM d{r} WHERE deg < {k}))"""
        )
    parts.append(
        f""",
dfin AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
        GROUP BY 1)
SELECT node AS doc_id, deg AS core_deg FROM dfin WHERE deg >= {k} ORDER BY 1"""
    )
    return "".join(parts)


# --------------------------------------------------------------------------
# Per-domain page cap (FineWeb-style domain balancing)
# --------------------------------------------------------------------------

DOMAIN_CAP = 5
_DOMAIN_MOD = 97  # the corpus' site<doc_id % 97>.example host mapping


def domain_cap_sample(sf_dir: str, cap: int = DOMAIN_CAP) -> pd.DataFrame:
    """Domain balancing: keep at most ``cap`` pages per registered domain,
    selected DETERMINISTICALLY by md5 rank (the FineWeb/RefinedWeb move
    against SEO farms and mirror forests dominating the token budget — a
    handful of hosts can contribute millions of near-identical pages).

    Topology: per-batch LOCAL pre-cap (each batch keeps its own ``cap``
    smallest md5 ranks per domain — min-k of min-ks is associative, so
    this loses nothing) shrinks the shuffle to ≤ cap rows per (domain,
    batch); one range shuffle by domain then ranks each domain-run inside
    whole sorted blocks (``map_sorted_runs`` — no per-domain python). The
    pre-cap also bounds any hot domain's sorted run by cap × #batches
    regardless of how many pages the domain has. Payload text never moves;
    the shuffle carries (doc_id, domain, rank-key) only."""
    from .agg import map_sorted_runs

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def local_cap(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": d,
                "domain": "site" + (d % _DOMAIN_MOD).astype(str) + ".example",
                "rk": [
                    hashlib.md5(str(x).encode()).hexdigest() for x in d
                ],
            }
        )
        out = out.sort_values(["rk", "doc_id"], kind="mergesort")
        return out.groupby("domain", sort=False).head(cap)

    def rank_runs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "rk", "doc_id"], kind="mergesort")
        df = df.copy()
        df["rank"] = df.groupby("domain", sort=False).cumcount() + 1
        return df[df["rank"] <= cap][["doc_id", "domain", "rank"]]

    shrunk = docs.map_batches(local_cap, batch_format="pandas")
    kept = map_sorted_runs(shrunk, "domain", rank_runs).to_pandas()
    kept = kept.astype({"doc_id": "int64", "rank": "int64"})
    return kept.sort_values(["domain", "rank"]).reset_index(drop=True)


_DOMAIN_CAP_SQL = f"""
SELECT doc_id, domain, rank FROM (
  SELECT doc_id,
         'site' || CAST(doc_id % {_DOMAIN_MOD} AS VARCHAR) || '.example'
           AS domain,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id % {_DOMAIN_MOD}
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
  FROM documents
) WHERE rank <= {DOMAIN_CAP}
ORDER BY domain, rank
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "kcore_nodes": kcore_nodes,
    "domain_cap_sample": domain_cap_sample,
    "two_hop_neighbors": two_hop_neighbors,
    "lang_outlier_docs": lang_outlier_docs,
    "doc_pagerank": doc_pagerank,
    "token_budget_mixture": token_budget_mixture,
    "source_lang_kl": source_lang_kl,
    "near_dup_keepers": near_dup_keepers,
    "corpus_report": corpus_report,
    "lang_top_docs": lang_top_docs,
    "lang_sample_exact_k": lang_sample_exact_k,
    "source_mixture_sample": source_mixture_sample,
    "temperature_mixture_sample": temperature_mixture_sample,
    "longest_doc_per_group": longest_doc_per_group,
    "near_dup_degree": near_dup_degree,
    "near_dup_pair_diffs": near_dup_pair_diffs,
    "lang_source_pivot": lang_source_pivot,
    "near_dup_components": near_dup_components,
    "checkpointed_components": checkpointed_components,
    "lang_distinct_tokens": lang_distinct_tokens,
    "lang_token_logodds": lang_token_logodds,
    "type_distinct_users_salted": type_distinct_users_salted,
    "weighted_sample_docs": weighted_sample_docs,
    "lang_top_tokens": lang_top_tokens,
    "doc_split_assign": doc_split_assign,
    "stratified_sample": stratified_sample,
    "lang_length_quantiles": lang_length_quantiles,
    "hits_scores": hits_scores,
}

ORACLES: dict[str, str] = {
    "kcore_nodes": _kcore_sql(),
    "domain_cap_sample": _DOMAIN_CAP_SQL,
    "two_hop_neighbors": _TWO_HOP_NEIGHBORS_SQL,
    "lang_outlier_docs": _LANG_OUTLIER_DOCS_SQL,
    "doc_pagerank": _pagerank_sql(),
    "hits_scores": _HITS_SCORES_SQL,
    "token_budget_mixture": _TOKEN_BUDGET_MIXTURE_SQL,
    "source_lang_kl": _SOURCE_LANG_KL_SQL,
    "near_dup_keepers": _near_dup_keepers_sql(),
    "corpus_report": _CORPUS_REPORT_SQL,
    "lang_top_docs": _LANG_TOP_DOCS_SQL,
    "lang_sample_exact_k": _LANG_SAMPLE_EXACT_K_SQL,
    "source_mixture_sample": _SOURCE_MIXTURE_SAMPLE_SQL,
    "temperature_mixture_sample": _TEMPERATURE_MIXTURE_SQL,
    "longest_doc_per_group": _LONGEST_DOC_PER_GROUP_SQL,
    "near_dup_degree": _NEAR_DUP_DEGREE_SQL,
    "near_dup_pair_diffs": _near_dup_pair_diffs_sql(),
    "lang_source_pivot": _LANG_SOURCE_PIVOT_SQL,
    "near_dup_components": _NEAR_DUP_COMPONENTS_SQL,
    "checkpointed_components": _NEAR_DUP_COMPONENTS_SQL,
    "lang_distinct_tokens": _LANG_DISTINCT_TOKENS_SQL,
    "lang_token_logodds": _LANG_TOKEN_LOGODDS_SQL,
    "type_distinct_users_salted": _TYPE_DISTINCT_USERS_SALTED_SQL,
    "weighted_sample_docs": _WEIGHTED_SAMPLE_SQL,
    "lang_top_tokens": _LANG_TOP_TOKENS_SQL,
    "doc_split_assign": _DOC_SPLIT_ASSIGN_SQL,
    "stratified_sample": _STRATIFIED_SAMPLE_SQL,
    "lang_length_quantiles": _LANG_LENGTH_QUANTILES_SQL,
}

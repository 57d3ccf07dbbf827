"""Similarity search over the ``embeddings`` table (``embedding:
list<float32>[64]``).

* ``ann_topk`` — exact brute-force cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one float64 matmul against it, local
  top-k survivors are merged in a final tiny top-k. This is the scalable
  baseline: the big side streams, the small side is broadcast.
* ``ann_ivf_topk`` — IVF variant (FAISS-style coarse quantizer): corpus is
  assigned to spherical-k-means cells; queries scan only their nprobe closest
  cells (rows-only check; recall is validated against brute force in tests).
* ``embedding_dup_pairs`` — near-duplicate vectors (cosine ≥ 0.99) over a
  corpus augmented with deterministic identical twins (vec_id % 5 == 0 →
  twin at vec_id + 1_000_000), so the SQL oracle can reconstruct the answer.

All cosine math is float64 on both sides (the SQL casts to DOUBLE[]) so
rounded values agree bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .agg import grouped_aggregate, round_half_away

N_QUERIES = 8
TOP_K = 10
DUP_TAU = 0.99
TWIN_OFFSET = 1_000_000


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _emb_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df = t.to_pandas()
    df = df[df["vec_id"] < N_QUERIES].sort_values("vec_id")
    return df["vec_id"].to_numpy(), _emb_matrix(df)


MMR_K = 10
MMR_POOL = 50
MMR_LAMBDA = 0.7


def mmr_topk(
    sf_dir: str, k: int = MMR_K, pool: int = MMR_POOL, lam: float = MMR_LAMBDA
) -> pd.DataFrame:
    """Diversified retrieval — Maximal Marginal Relevance: greedily pick k
    results per query maximizing ``λ·sim(query) − (1−λ)·max sim(already
    picked)``, so near-duplicate hits don't crowd the result list (the
    standard RAG/retrieval de-redundancy step).

    Topology: the candidate pool is the EXACT global top-``pool`` per query
    (the ann_topk local-then-final top-k shape, carrying each candidate's
    unit vector as bytes — pool×|queries| rows, never the corpus); the
    greedy selection is inherently sequential in k and runs on the driver
    over that bounded pool. Rows-only (iterative greedy is not SQL) with a
    numpy-mirror parity test."""
    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, qn))

    class PoolScorer:
        def __init__(self) -> None:
            self.qids, self.qn = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ self.qn.T
            vec_ids = df["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(self.qids):
                col = sims[:, j]
                mask = vec_ids != qid
                idx = np.argsort(-col[mask], kind="stable")[:pool]
                ids = vec_ids[mask][idx]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(ids), qid, dtype=np.int64),
                            "neighbor_id": ids.astype(np.int64),
                            "cosine_sim": col[mask][idx],
                            "emb": [v.tobytes() for v in Mn[mask][idx]],
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    partial = _read_emb(sf_dir).map_batches(
        PoolScorer, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(pool)

    cands = (
        partial.groupby("query_id").map_groups(final, batch_format="pandas").to_pandas()
    )

    rows = []
    for qid, g in cands.groupby("query_id", sort=True):
        g = g.reset_index(drop=True)
        S = np.stack([np.frombuffer(b, dtype="float64") for b in g["emb"]])
        rel = g["cosine_sim"].to_numpy()
        ids = g["neighbor_id"].to_numpy()
        picked: list[int] = []
        for rank in range(1, min(k, len(g)) + 1):
            if picked:
                red = (S @ S[picked].T).max(axis=1)
            else:
                red = np.zeros(len(g))
            score = lam * rel - (1 - lam) * red
            score[picked] = -np.inf
            # argmax with deterministic tie-break on neighbor_id
            best = np.lexsort((ids, -score))[0]
            picked.append(int(best))
            rows.append((int(qid), rank, int(ids[best]), float(score[best])))
    out = pd.DataFrame(
        rows, columns=["query_id", "rank", "neighbor_id", "mmr_score"]
    )
    from .agg import round_half_away

    out["mmr_score"] = round_half_away(out["mmr_score"])
    return out


def ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-k for query vectors vec_id < 8 (self excluded)."""
    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, qn))

    class Scorer:
        def __init__(self) -> None:
            self.qids, self.qn = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ self.qn.T  # (batch, nq)
            out = []
            vec_ids = df["vec_id"].to_numpy()
            for j, qid in enumerate(self.qids):
                col = sims[:, j]
                mask = vec_ids != qid
                idx = np.argsort(-col[mask], kind="stable")[:TOP_K]
                ids = vec_ids[mask][idx]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(ids), qid, dtype=np.int64),
                            "neighbor_id": ids.astype(np.int64),
                            "cosine_sim": col[mask][idx],
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    # local top-k per batch → tiny global merge per query
    partial = _read_emb(sf_dir).map_batches(
        Scorer, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(TOP_K)
        return g

    out = partial.groupby("query_id").map_groups(final, batch_format="pandas")
    df = out.to_pandas()
    from .agg import round_half_away

    df["cosine_sim"] = round_half_away(df["cosine_sim"])
    return df.reset_index(drop=True)


_ANN_TOPK_SQL = f"""
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS cosine_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id
         ) AS rk
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id < {N_QUERIES} AND e.vec_id <> q.vec_id
) WHERE rk <= {TOP_K}
"""


IVF_CELLS = 16
IVF_NPROBE = 6
IVF_KMEANS_ITERS = 8
#: k-means training-sample bound: a deterministic vec_id-stride sample of
#: about this many vectors is all that ever reaches the driver for training.
IVF_TRAIN_SAMPLE = 4096


def _train_centroids(Mn: np.ndarray, k: int = IVF_CELLS) -> np.ndarray:
    """Deterministic spherical k-means (fixed init from evenly spaced rows)
    over an ALREADY-BOUNDED training sample."""
    idx = np.linspace(0, len(Mn) - 1, k).astype(int)
    C = Mn[idx].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(Mn @ C.T, axis=1)
        for c in range(k):
            members = Mn[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def _training_sample(sf_dir: str, cap: int = IVF_TRAIN_SAMPLE) -> pd.DataFrame:
    """Bounded deterministic training sample: row count from parquet footers
    (no scan), then one streaming pass keeping vec_id % stride == 0 — at any
    corpus size the driver holds ≤ ~cap vectors, never the table."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    stride = max(1, n // cap)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["vec_id"].to_numpy() % stride == 0]

    return _read_emb(sf_dir).map_batches(keep, batch_format="pandas").to_pandas()


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k via IVF: corpus vectors are assigned to the nearest
    of 16 spherical-k-means centroids; each query scans only its IVF_NPROBE
    closest cells (~nprobe/cells of the corpus). Centroids are trained on a
    bounded distributed sample (``_training_sample``); assignment and cell
    scans are fully distributed. Rows-only check; recall vs brute force
    asserted in tests."""
    t = _training_sample(sf_dir)
    full = _emb_matrix(t)
    fulln = full / np.linalg.norm(full, axis=1, keepdims=True)
    C = _train_centroids(fulln)

    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qcells = np.argsort(-(qn @ C.T), axis=1)[:, :IVF_NPROBE]
    # cell → array of query indices probing it
    probe: dict[int, np.ndarray] = {}
    for c in range(IVF_CELLS):
        js = np.nonzero((qcells == c).any(axis=1))[0]
        if len(js):
            probe[c] = js
    ref = ray.put((qids, qn, C, probe))

    class CellScorer:
        """Scores each batch's vectors against the queries probing their
        cell — VECTORIZED (r3): rows are grouped by assigned cell and each
        (cell members × probing queries) block is ONE matmul, followed by a
        per-batch per-query top-k partial so the shuffle sees ≤ queries × k
        rows per batch instead of every candidate score. No per-row python
        in the scan."""

        def __init__(self) -> None:
            self.qids, self.qn, self.C, self.probe = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cells = np.argmax(Mn @ self.C.T, axis=1)
            vec_ids = df["vec_id"].to_numpy()
            q_parts, n_parts, s_parts = [], [], []
            for c in np.unique(cells):
                js = self.probe.get(int(c))
                if js is None:
                    continue
                rows = np.nonzero(cells == c)[0]
                S = Mn[rows] @ self.qn[js].T  # (members, probing queries)
                qcol = np.broadcast_to(
                    self.qids[js][None, :], S.shape
                ).ravel()
                ncol = np.broadcast_to(
                    vec_ids[rows][:, None], S.shape
                ).ravel()
                keep = qcol != ncol  # a query never matches itself
                q_parts.append(qcol[keep])
                n_parts.append(ncol[keep])
                s_parts.append(S.ravel()[keep])
            if not q_parts:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     "neighbor_id": pd.Series([], dtype="int64"),
                     "cosine_sim": pd.Series([], dtype="float64")}
                )
            out = pd.DataFrame(
                {
                    "query_id": np.concatenate(q_parts).astype(np.int64),
                    "neighbor_id": np.concatenate(n_parts).astype(np.int64),
                    "cosine_sim": np.concatenate(s_parts).astype(np.float64),
                }
            )
            # local top-k partial per query (ties to smallest neighbor_id,
            # matching the global merge's ordering)
            out = out.sort_values(
                ["query_id", "cosine_sim", "neighbor_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            return out.groupby("query_id", sort=False).head(TOP_K)

    partial = _read_emb(sf_dir).map_batches(
        CellScorer, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(TOP_K)

    df = partial.groupby("query_id").map_groups(final, batch_format="pandas").to_pandas()
    df["cosine_sim"] = round_half_away(df["cosine_sim"])
    return df.reset_index(drop=True)


#: random-hyperplane LSH banding for cosine near-dup: P(one bit differs) =
#: acos(cos)/π ≈ 0.029 at τ=0.99, so P(an 8-bit band matches) ≈ 0.79 and
#: P(all 16 bands miss) ≈ 7e-9 — exhaustive in practice at the τ this
#: operator targets, and identical vectors (the oracle's twins) collide with
#: certainty. Candidates are verified EXACTLY inside the bucket group.
EMB_LSH_BANDS = 16
EMB_LSH_BITS = 8
_EMB_LSH_SEED = 0x5EED


def _hyperplanes(dim: int) -> np.ndarray:
    return np.random.RandomState(_EMB_LSH_SEED).standard_normal(
        (EMB_LSH_BANDS * EMB_LSH_BITS, dim)
    )


def ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH: a corpus vector is a
    candidate for a query iff they share at least one 8-bit sign band (16
    bands, same family as ``embedding_dup_pairs``). The query signatures are
    broadcast; each batch computes its vectors' band keys, scores only the
    matched (vector, query) pairs exactly, and keeps a local top-k — the
    global merge sees ≤ batches × queries × k rows. Rows-only check; recall
    vs the exact scan asserted in tests."""
    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    H = _hyperplanes(Q.shape[1])
    qbits = (qn @ H.T) > 0
    qpacked = np.packbits(qbits, axis=1)[:, :EMB_LSH_BANDS]
    # (band, key) → query indices probing that bucket. MULTI-PROBE: each
    # query also probes every Hamming-1 variant of each band key (9 keys per
    # band), which lifts P(candidate found) from ~0.16 to ~0.49 per band for
    # cos≈0.8 neighbors at the cost of a 9× bigger (still tiny, query-side
    # only) probe table — the corpus side stays at 16 exact keys per vector.
    probe: dict[tuple[int, int], list[int]] = {}
    for j in range(len(qids)):
        for band in range(EMB_LSH_BANDS):
            key = int(qpacked[j, band])
            for variant in (key, *(key ^ (1 << b) for b in range(8))):
                lst = probe.setdefault((band, variant), [])
                if not lst or lst[-1] != j:
                    lst.append(j)
    ref = ray.put((qids, qn, probe))

    class LshScorer:
        def __init__(self) -> None:
            self.qids, self.qn, self.probe = ray.get(ref)
            self.H = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            if self.H is None:
                self.H = _hyperplanes(M.shape[1])
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            bits = (Mn @ self.H.T) > 0
            packed = np.packbits(bits, axis=1)[:, :EMB_LSH_BANDS]
            vec_ids = df["vec_id"].to_numpy()
            out = []
            matched: dict[int, list[int]] = {}
            for i in range(len(vec_ids)):
                qs: set[int] = set()
                for band in range(EMB_LSH_BANDS):
                    qs.update(self.probe.get((band, int(packed[i, band])), ()))
                for j in qs:
                    if vec_ids[i] != self.qids[j]:
                        matched.setdefault(j, []).append(i)
            for j, idxs in matched.items():
                sims = Mn[idxs] @ self.qn[j]
                order = np.argsort(-sims, kind="stable")[:TOP_K]
                ids = vec_ids[idxs][order]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(ids), self.qids[j], dtype=np.int64),
                            "neighbor_id": ids.astype(np.int64),
                            "cosine_sim": sims[order],
                        }
                    )
                )
            if not out:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     "neighbor_id": pd.Series([], dtype="int64"),
                     "cosine_sim": pd.Series([], dtype="float64")}
                )
            return pd.concat(out, ignore_index=True)

    partial = _read_emb(sf_dir).map_batches(
        LshScorer, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(TOP_K)

    df = partial.groupby("query_id").map_groups(final, batch_format="pandas").to_pandas()
    df["cosine_sim"] = round_half_away(df["cosine_sim"])
    return df.reset_index(drop=True)


PQ_M = 8  # subspaces (dim must be divisible)
PQ_KS = 16  # centroids per subspace → 4-bit codes, 16× compression at d=64
PQ_KMEANS_ITERS = 10
PQ_REFINE = 4  # ADC candidate pool = PQ_REFINE × TOP_K per batch


def _train_pq_codebooks(X: np.ndarray, m: int = PQ_M, ks: int = PQ_KS) -> np.ndarray:
    """Deterministic per-subspace k-means (fixed stride init) over an
    already-bounded sample → (m, ks, d/m) codebooks."""
    n, d = X.shape
    sub = d // m
    books = np.empty((m, ks, sub))
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        idx = np.linspace(0, n - 1, ks).astype(int)
        C = S[idx].copy()
        for _ in range(PQ_KMEANS_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def _pq_encode(Xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 codes (nearest codebook entry per subspace)."""
    n, d = Xn.shape
    m, ks, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        S = Xn[:, j * sub : (j + 1) * sub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def ann_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k via PRODUCT QUANTIZATION with exact re-ranking:
    per-subspace codebooks (trained on the bounded stride sample) compress
    each normalized vector to m 4-bit-ish codes (16× at d=64); each scan
    batch scores candidates by ADC — one (m × ks) lookup table per query,
    score = sum of table entries at the vector's codes, NO dot products —
    keeps an ADC candidate pool of PQ_REFINE×k per query, re-scores only
    that pool exactly, and emits a per-batch exact top-k partial. The global
    merge is identical to the brute-force path, so results carry EXACT
    cosines for the (approximately selected) neighbors.

    100 TB shape: codebooks are a tiny broadcast; the scan is one streaming
    pass; at 10^12 vectors the codes table (m bytes/vector) is the thing a
    real deployment would persist and scan instead of raw vectors — 16×
    less IO; the ADC inner loop is table lookups, not matmuls. Rows-only
    check; recall vs the exact scan asserted in tests."""
    t = _training_sample(sf_dir)
    full = _emb_matrix(t)
    fulln = full / np.linalg.norm(full, axis=1, keepdims=True)
    books = _train_pq_codebooks(fulln)

    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    m, ks, sub = books.shape
    # per-query ADC tables: lut[q, j, c] = qn_sub · codebook entry
    lut = np.einsum("qjs,jcs->qjc", qn.reshape(len(qids), m, sub), books)
    ref = ray.put((qids, qn, books, lut))

    class PqScorer:
        def __init__(self) -> None:
            self.qids, self.qn, self.books, self.lut = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M_ = _emb_matrix(df)
            Mn = M_ / np.linalg.norm(M_, axis=1, keepdims=True)
            codes = _pq_encode(Mn, self.books)  # (n, m)
            vec_ids = df["vec_id"].to_numpy()
            n = len(vec_ids)
            pool = min(n, PQ_REFINE * TOP_K)
            frames = []
            for qi in range(len(self.qids)):
                # ADC: approximate dot via table lookups only
                adc = self.lut[qi][np.arange(codes.shape[1])[None, :], codes].sum(
                    axis=1
                )
                cand = np.argpartition(-adc, pool - 1)[:pool]
                keep = vec_ids[cand] != self.qids[qi]
                cand = cand[keep]
                exact = Mn[cand] @ self.qn[qi]  # re-rank pool exactly
                order = np.argsort(-exact, kind="stable")[:TOP_K]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(
                                len(order), self.qids[qi], dtype=np.int64
                            ),
                            "neighbor_id": vec_ids[cand][order].astype(np.int64),
                            "cosine_sim": exact[order].astype(np.float64),
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

    partial = _read_emb(sf_dir).map_batches(
        PqScorer, batch_format="pandas", batch_size=4096, concurrency=(1, 4)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(TOP_K)

    df = partial.groupby("query_id").map_groups(final, batch_format="pandas").to_pandas()
    df["cosine_sim"] = round_half_away(df["cosine_sim"])
    return df.reset_index(drop=True)


def dup_twin_corpus(sf_dir: str) -> rd.Dataset:
    """Embeddings + exact twins at ``vec_id % 5 == 0`` (offset +TWIN_OFFSET),
    emitted from ONE read pass (a union of two branches scans the embeddings
    parquet twice) — the deterministic duplicate population the near-dup
    and semantic-dedup operators must discover."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def with_twins(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        tw = t.filter(pa.array(ids % 5 == 0))
        tw = tw.set_column(
            tw.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(tw["vec_id"], TWIN_OFFSET),
        )
        return pa.concat_tables([t, tw])

    return _read_emb(sf_dir).map_batches(with_twins, batch_format="pyarrow")


def embedding_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.99) over the twin-augmented
    corpus, via random-hyperplane LSH: vectors are bucketed by banded sign
    signatures (one shuffle keyed by (band, 8 packed sign bits)); the exact
    cosine check runs INSIDE the grouped pair generation on each bucket's
    member vectors. No whole-corpus broadcast or driver materialization at
    any scale — the big side only ever moves through the bucket shuffle."""
    from .dedup import _pairs_from_groups, mix64

    corpus = dup_twin_corpus(sf_dir)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "bucket": pd.Series([], dtype="int64"),
                 "embedding": pd.Series([], dtype="object")}
            )
        M = _emb_matrix(df)
        H = _hyperplanes(M.shape[1])  # deterministic, rebuilt per batch (64 KB)
        bits = (M @ H.T) > 0  # (n, bands*bits)
        packed = np.packbits(bits, axis=1)[:, : EMB_LSH_BANDS].astype(np.int64)
        band_ids = np.broadcast_to(
            np.arange(EMB_LSH_BANDS, dtype=np.int64), (n, EMB_LSH_BANDS)
        )
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["vec_id"].to_numpy(), EMB_LSH_BANDS),
                "bucket": mix64(band_ids.ravel(), packed.ravel()),
                "embedding": [
                    v for v in df["embedding"] for _ in range(EMB_LSH_BANDS)
                ],
            }
        )

    def cosine_ok(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
        M = _emb_matrix(g)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        # chunked einsum: one big fancy-index gather materializes
        # |pairs|×dim twice, which is memory-bandwidth-bound (~20× slower
        # than this on a throttled container); per-chunk gathers stay cache
        # resident
        out = np.empty(len(ia), dtype=bool)
        step = 65536
        for s in range(0, len(ia), step):
            e = min(s + step, len(ia))
            out[s:e] = (
                np.einsum("ij,ij->i", Mn[ia[s:e]], Mn[ib[s:e]]) >= DUP_TAU
            )
        return out

    import pyarrow.parquet as pq

    n_vec = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    exploded = corpus.map_batches(band_rows, batch_format="pandas")
    out = _pairs_from_groups(
        exploded, "bucket", pair_filter=cosine_ok, payload_cols=("embedding",),
        # footer-derived bound (twins ≤ 1 per 5): no materialize-to-count pin
        est_rows=(n_vec + n_vec // 5 + 1) * EMB_LSH_BANDS,
    )
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})
    if out.empty:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"),
             "vec_b": pd.Series([], dtype="int64")}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


_EMBEDDING_DUP_PAIRS_SQL = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {TWIN_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % 5 = 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {DUP_TAU}
"""


def _embedding_dim(sf_dir: str) -> int:
    """Vector width from the first row of the first row group (no full scan)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first["embedding"][0])


def label_centroid_norms(sf_dir: str) -> pd.DataFrame:
    """Per-label vector counts and mean-vector norms — the grouped numeric
    aggregate over the embedding column. The vector sum is decomposed into
    per-dimension scalar columns fed through ``grouped_aggregate``, so the
    combine is a standard partial-sum shuffle and the driver only ever sees
    one row per label (not one partial per batch)."""
    dim = _embedding_dim(sf_dir)
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        M = _emb_matrix(df)
        out = pd.DataFrame({f"s{i}": M[:, i] for i in range(dim)})
        out["label"] = df["label"].to_numpy()
        return out

    aggs: dict = {f"s{i}": (f"s{i}", "sum") for i in range(dim)}
    aggs["n_vecs"] = (None, "count")
    agg = grouped_aggregate(emb, ["label"], aggs, prepare=prepare).to_pandas()
    S = agg[[f"s{i}" for i in range(dim)]].to_numpy(dtype=np.float64)
    n = agg["n_vecs"].to_numpy(dtype=np.int64)
    norms = np.linalg.norm(S / n[:, None], axis=1)
    out = pd.DataFrame(
        {
            "label": agg["label"].astype("int64"),
            "n_vecs": pd.Series(n, dtype="int64"),
            "centroid_norm": round_half_away(norms),
        }
    )
    return out.reset_index(drop=True)


_LABEL_CENTROID_SQL = """
WITH e AS (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
), d AS (
  SELECT label, dim, SUM(v) AS sv, COUNT(*) AS c FROM e GROUP BY 1, 2
), per AS (
  SELECT label, SUM((sv / c) * (sv / c)) AS norm2, MAX(c) AS n_vecs
  FROM d GROUP BY label
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       ROUND(sqrt(norm2), 4) AS centroid_norm
FROM per
"""


def label_centroid_drift(sf_dir: str) -> pd.DataFrame:
    """Embedding drift monitor — the vector-space companion of
    ``snapshot_token_drift``: per label, the cosine between the centroid of
    the OLD half (even vec_ids) and the NEW half (odd) of the corpus. A
    label whose centroid rotated between snapshots signals upstream
    distribution shift (new scraper, new boilerplate, encoder change)
    before any training run finds out the hard way.

    Same decomposed-sum topology as ``label_centroid_norms``: per-dimension
    scalar partial sums keyed (label, side) through one
    ``grouped_aggregate`` — the driver sees 2 rows per label, never
    vectors. Sums run in float64 so the SQL mirror matches at 6 decimals."""
    dim = _embedding_dim(sf_dir)
    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"],
    )

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        M = _emb_matrix(df).astype(np.float64)
        out = pd.DataFrame({f"s{i}": M[:, i] for i in range(dim)})
        out["label"] = df["label"].to_numpy()
        out["side"] = df["vec_id"].to_numpy() % 2
        return out

    aggs: dict = {f"s{i}": (f"s{i}", "sum") for i in range(dim)}
    aggs["n_vecs"] = (None, "count")
    agg = grouped_aggregate(
        emb, ["label", "side"], aggs, prepare=prepare
    ).to_pandas()
    S = agg[[f"s{i}" for i in range(dim)]].to_numpy(dtype=np.float64)
    cent = S / agg["n_vecs"].to_numpy(dtype=np.float64)[:, None]
    agg = agg.assign(_row=np.arange(len(agg)))
    piv = agg.pivot(index="label", columns="side", values="_row")
    rows = []
    for label, r in piv.iterrows():
        if pd.isna(r.get(0)) or pd.isna(r.get(1)):
            continue  # a label present in only one half has no drift angle
        a, b = cent[int(r[0])], cent[int(r[1])]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        rows.append({"label": int(label), "centroid_cos": round(cos, 6)})
    return (
        pd.DataFrame(rows, columns=["label", "centroid_cos"])
        .astype({"label": "int64"})
        .sort_values("label")
        .reset_index(drop=True)
    )


_LABEL_CENTROID_DRIFT_SQL = """
WITH ex AS (
  SELECT label, vec_id % 2 AS side,
         generate_subscripts(embedding, 1) AS i,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
), c AS (
  SELECT label, side, i, SUM(v) AS s, COUNT(*) AS n FROM ex GROUP BY 1, 2, 3
), m AS (
  SELECT label, i,
         MAX(CASE WHEN side = 0 THEN s / n END) AS a,
         MAX(CASE WHEN side = 1 THEN s / n END) AS b
  FROM c GROUP BY 1, 2
)
SELECT CAST(label AS BIGINT) AS label,
       ROUND(SUM(a * b) / (sqrt(SUM(a * a)) * sqrt(SUM(b * b))), 6)
         AS centroid_cos
FROM m WHERE a IS NOT NULL AND b IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Distributed spherical k-means (full-corpus Lloyd iterations)
# --------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 6


def kmeans_clusters(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> pd.DataFrame:
    """Spherical k-means over the FULL embeddings table with every Lloyd
    iteration distributed: centroids (k×d — tiny) are broadcast per
    iteration, each batch emits per-cluster partial vector sums + counts,
    and the driver reduces k rows. Unlike ``ann_ivf_topk``'s
    train-on-a-sample coarse quantizer, this is the real clustering
    operator: the corpus is streamed ``iters + 1`` times and the driver
    never holds more than k×d floats.

    Init is the deterministic stride sample's k evenly spaced vectors, so
    results are reproducible across runs and batch splits up to float-sum
    ordering inside a batch. Returns (vec_id, cluster, sim)."""
    t = _training_sample(sf_dir, cap=4 * k).sort_values("vec_id")
    M = _emb_matrix(t)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    idx = np.linspace(0, len(Mn) - 1, k).astype(int)
    C = Mn[idx].copy()

    emb = _read_emb(sf_dir)
    # iterative algorithm, iters+1 passes over the table: small tables
    # (footer row count) are pinned in the object store so each Lloyd
    # iteration reads zero-copy blocks instead of re-scanning the parquet;
    # at corpus scale the pin would be a full-table spill, so large tables
    # keep the streaming re-read (the scan is the per-iteration price of
    # never materializing).
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(sf_dir, "embeddings.parquet")).num_rows
    if n_rows <= 2_000_000:
        emb = emb.materialize()
    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            C = ray.get(c_ref)
            X = _emb_matrix(df)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            assign = np.argmax(Xn @ C.T, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, Xn)
            counts = np.bincount(assign, minlength=len(C))
            nz = counts > 0
            return pd.DataFrame(
                {
                    "cluster": np.arange(len(C))[nz],
                    "vsum": [v.tobytes() for v in sums[nz]],
                    "n": counts[nz].astype("int64"),
                }
            )

        parts = emb.map_batches(partial, batch_format="pandas").to_pandas()
        # batch arrival order is not deterministic: fix the float-sum order
        parts = parts.sort_values(["cluster", "n", "vsum"], kind="mergesort")
        newC = C.copy()
        for c in range(k):
            rows = parts[parts["cluster"] == c]
            if len(rows):
                v = np.sum(
                    [np.frombuffer(b, dtype=np.float64) for b in rows["vsum"]],
                    axis=0,
                )
                n = np.linalg.norm(v)
                if n > 0:
                    newC[c] = v / n
        C = newC

    c_ref = ray.put(C)

    def assign_final(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(c_ref)
        X = _emb_matrix(df)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = Xn @ C.T
        a = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "cluster": a.astype("int64"),
                "sim": np.round(sims[np.arange(len(a)), a], 4),
            }
        )

    out = emb.map_batches(assign_final, batch_format="pandas").to_pandas()
    return out.astype({"vec_id": "int64"}).sort_values("vec_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# Distributed PCA (covariance from partial moment sums)
# --------------------------------------------------------------------------

PCA_COMPONENTS = 2


def embedding_pca_project(sf_dir: str, k: int = PCA_COMPONENTS) -> pd.DataFrame:
    """Project every embedding onto the corpus's top-k principal components.

    One streaming pass emits per-batch moment partials (n, Σx: d floats,
    Σxxᵀ: d×d floats — constant-size regardless of batch rows); the driver
    assembles the d×d covariance and eigendecomposes it (d is the embedding
    width, tiny). A second stateless pass projects. The standard distributed
    PCA topology: nothing corpus-sized ever leaves the workers.

    Eigenvector sign is fixed deterministically (largest-|coord| positive),
    so outputs are reproducible; not SQL-expressible (rows-only query),
    invariants tested against numpy's full-matrix PCA."""
    emb = _read_emb(sf_dir)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        X = _emb_matrix(df)
        return pd.DataFrame(
            {
                "n": [len(X)],
                "s": [X.sum(axis=0).tobytes()],
                "ss": [(X.T @ X).tobytes()],
            }
        )

    parts = emb.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    d = len(np.frombuffer(parts["s"].iloc[0], dtype=np.float64))
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s"]], axis=0)
    ss = np.sum(
        [np.frombuffer(b, dtype=np.float64).reshape(d, d) for b in parts["ss"]],
        axis=0,
    )
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k]  # top-k columns
    # deterministic sign: make the largest-magnitude coordinate positive
    for c in range(k):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    c_ref = ray.put((mean, comps))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        mean, comps = ray.get(c_ref)
        X = _emb_matrix(df) - mean
        P = X @ comps
        out = {"vec_id": df["vec_id"].to_numpy()}
        for c in range(P.shape[1]):
            out[f"pc{c + 1}"] = np.round(P[:, c], 6)
        return pd.DataFrame(out)

    out = emb.map_batches(project, batch_format="pandas").to_pandas()
    return out.astype({"vec_id": "int64"}).sort_values("vec_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune (Abbas et al. 2023 shape)
# --------------------------------------------------------------------------

SEMDEDUP_K = IVF_CELLS


def semdedup_keepers(sf_dir: str, k: int = SEMDEDUP_K) -> pd.DataFrame:
    """Semantic deduplication, SemDeDup topology: cluster the corpus with
    spherical k-means (centroids trained on the bounded stride sample),
    then WITHIN each cluster drop every vector whose cosine similarity to a
    lower-id cluster-mate is ≥ τ — the keeper is each duplicate component's
    min vec_id. Runs over the twin-augmented corpus so there are real
    duplicates to find.

    Scale shape: the O(g²) pairwise step is confined to one cluster's
    members (`groupby(cluster).map_groups`) — exactly why SemDeDup clusters
    first; at corpus scale k grows so g stays bounded, and the only wide
    ops are the assignment pass (broadcast k×d centroids) and the
    cluster-keyed shuffle. Returns (vec_id, cluster, keep_vec_id,
    is_keeper); rows-only query (k-means is not SQL-expressible) validated
    against a single-process numpy mirror in tests."""
    t = _training_sample(sf_dir).sort_values("vec_id")
    M = _emb_matrix(t)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    C = _train_centroids(Mn, k=k)
    c_ref = ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(c_ref)
        X = _emb_matrix(df)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "cluster": np.argmax(Xn @ C.T, axis=1).astype("int64"),
                "embedding": df["embedding"],
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        X = _emb_matrix(g)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = Xn @ Xn.T
        n = len(g)
        ids = g["vec_id"].to_numpy()
        # union-find over τ-edges; rows are vec_id-sorted so root = min id
        parent = np.arange(n)

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        ii, jj = np.nonzero(np.triu(sims >= DUP_TAU, 1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
        keep_ids = ids[roots]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(),
                "keep_vec_id": keep_ids,
                "is_keeper": keep_ids == ids,
            }
        )

    out = (
        dup_twin_corpus(sf_dir)
        .map_batches(assign, batch_format="pandas")
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.astype({"vec_id": "int64", "keep_vec_id": "int64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# Margin-based bitext mining (CCMatrix / LASER-style, Artetxe & Schwenk 2019)
# --------------------------------------------------------------------------

#: neighbors in each margin denominator (the papers use k=4).
MARGIN_K = 4
#: bounded source-side query block — mining runs block-wise over the source
#: corpus exactly like CCMatrix shards its source sentences.
MARGIN_NQ = 64
#: ratio-margin acceptance threshold (CCMatrix ships 1.04–1.06).
MARGIN_T = 1.05


def _margin_sides(sf_dir: str):
    """Deterministic two-'language' split of the embeddings table: even
    vec_ids are the source (X) side, odd the target (Y) side. Returns the
    full normalized X matrix + ids (the INDEXED side — at 10^12 rows this
    broadcast table is what the IVF/LSH index replaces) and the bounded
    query-block column positions within it."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df = t.to_pandas()
    x = df[df["vec_id"] % 2 == 0].sort_values("vec_id")
    X = _emb_matrix(x)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    xids = x["vec_id"].to_numpy()
    qpos = np.flatnonzero(xids < 2 * MARGIN_NQ)
    return xids, Xn, qpos


def xlingual_margin_pairs(sf_dir: str) -> pd.DataFrame:
    """Parallel-corpus mining with the RATIO margin criterion:

        margin(x, y) = cos(x, y) / ((avg_{k-NN_Y}(x) + avg_{k-NN_X}(y)) / 2)

    — for each source vector x in the bounded query block, the
    best-margin target-side match and whether it clears ``MARGIN_T``.
    Plain cosine argmax mines hubs (vectors close to everything); dividing
    by both sides' local neighborhood density is the published fix.

    Topology: two passes over the STREAMED target side, each emitting only
    bounded rows — pass 1: per-batch top-k cosine candidates per query
    (k·|queries| rows/batch) merged into the per-query denominator
    ``a_x``; pass 2: per-row exact ``a_y`` against the broadcast X index +
    per-batch argmax-margin candidate per query (|queries| rows/batch),
    final argmax on the driver over batches×|queries| rows. The corpus is
    never exploded, joined, or materialized; at 10^12 rows the broadcast
    X-side matmul swaps for the ann_ivf cell scan, same two-pass shape."""
    xids, Xn, qpos = _margin_sides(sf_dir)
    qids = xids[qpos]
    ref = ray.put((Xn, qpos, xids[qpos]))

    def _odd_only(t):
        import pyarrow.compute as pc

        return t.filter(pc.equal(pc.bit_wise_and(t.column("vec_id"), 1), 1))

    ds = _read_emb(sf_dir).map_batches(_odd_only, batch_format="pyarrow")

    class PassOne:
        def __init__(self) -> None:
            self.Xn, self.qpos, self.qids = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            q_cos = Mn @ self.Xn[self.qpos].T  # (batch, nq)
            y_ids = df["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(self.qids):
                col = q_cos[:, j]
                idx = np.lexsort((y_ids, -col))[:MARGIN_K]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(idx), qid, dtype="int64"),
                            "y_id": y_ids[idx].astype("int64"),
                            "cos": col[idx],
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    cands = (
        ds.map_batches(PassOne, batch_format="pandas", batch_size=4096, concurrency=(1, 4))
        .to_pandas()
    )  # bounded: batches × |queries| × k rows
    a_x = np.empty(len(qids))
    for j, qid in enumerate(qids):
        g = cands[cands["query_id"] == qid].sort_values(
            ["cos", "y_id"], ascending=[False, True], kind="mergesort"
        )
        a_x[j] = g["cos"].to_numpy()[:MARGIN_K].mean()
    ref2 = ray.put(a_x)

    class PassTwo:
        def __init__(self) -> None:
            self.Xn, self.qpos, self.qids = ray.get(ref)
            self.a_x = ray.get(ref2)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            C = Mn @ self.Xn.T  # (batch, |X|) — exact a_y vs the full index
            topk = np.sort(C, axis=1)[:, -MARGIN_K:]
            a_y = topk.mean(axis=1)
            q_cos = C[:, self.qpos]
            margin = q_cos / ((self.a_x[None, :] + a_y[:, None]) / 2.0)
            y_ids = df["vec_id"].to_numpy()
            rows = []
            for j, qid in enumerate(self.qids):
                col = margin[:, j]
                best = np.lexsort((y_ids, -col))[0]
                rows.append(
                    (int(qid), int(y_ids[best]), q_cos[best, j], col[best])
                )
            return pd.DataFrame(
                rows, columns=["query_id", "matched_id", "cos", "margin"]
            )

    part = (
        ds.map_batches(PassTwo, batch_format="pandas", batch_size=4096, concurrency=(1, 4))
        .to_pandas()
    )  # bounded: batches × |queries| rows
    best = (
        part.sort_values(
            ["margin", "matched_id"], ascending=[False, True], kind="mergesort"
        )
        .groupby("query_id", sort=True)
        .head(1)
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "query_id": best["query_id"].astype("int64"),
            "matched_id": best["matched_id"].astype("int64"),
            "cosine_sim": round_half_away(best["cos"]),
            "margin": round_half_away(best["margin"]),
            "accepted": (best["margin"] >= MARGIN_T).to_numpy().astype("int64"),
        }
    )


_XLINGUAL_MARGIN_SQL = f"""
WITH xf AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id % 2 = 0
), xq AS (
  SELECT vec_id, e FROM xf WHERE vec_id < {2 * MARGIN_NQ}
), y AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id % 2 = 1
), ay AS (
  SELECT vec_id, AVG(c) AS a_y FROM (
    SELECT y.vec_id, list_cosine_similarity(y.e, xf.e) AS c,
           row_number() OVER (
             PARTITION BY y.vec_id
             ORDER BY list_cosine_similarity(y.e, xf.e) DESC, xf.vec_id
           ) AS rk
    FROM y CROSS JOIN xf
  ) WHERE rk <= {MARGIN_K} GROUP BY 1
), cq AS (
  SELECT xq.vec_id AS query_id, y.vec_id AS y_id,
         list_cosine_similarity(xq.e, y.e) AS c
  FROM xq CROSS JOIN y
), ax AS (
  SELECT query_id, AVG(c) AS a_x FROM (
    SELECT query_id, c,
           row_number() OVER (
             PARTITION BY query_id ORDER BY c DESC, y_id
           ) AS rk
    FROM cq
  ) WHERE rk <= {MARGIN_K} GROUP BY 1
), m AS (
  SELECT query_id, y_id, c, c / ((a_x + a_y) / 2) AS margin
  FROM cq JOIN ax USING (query_id) JOIN ay ON ay.vec_id = cq.y_id
)
SELECT query_id, y_id AS matched_id, ROUND(c, 4) AS cosine_sim,
       ROUND(margin, 4) AS margin,
       CAST(CASE WHEN margin >= {MARGIN_T} THEN 1 ELSE 0 END AS BIGINT) AS accepted
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY margin DESC, y_id
  ) AS rk FROM m
) WHERE rk = 1
ORDER BY query_id
"""


# --------------------------------------------------------------------------
# HNSW (Malkov & Yashunin 2016) — completes the ANN family next to
# brute-force / IVF / LSH / PQ+ADC
# --------------------------------------------------------------------------

HNSW_M = 8  # max links per node per layer (2M at layer 0)
HNSW_EF_C = 64  # construction beam width
HNSW_EF_S = 48  # search beam width
#: one graph per map_batches shard: at 100 TB this is the sharded-HNSW
#: architecture (each worker owns a bounded in-memory graph over its shard;
#: queries broadcast, per-shard top-k partials merge globally) — memory per
#: actor is O(shard × M), never the corpus.
HNSW_SHARD = 4096


class _HnswGraph:
    """Deterministic in-memory HNSW over unit vectors (cosine via dot).

    Level assignment uses a Knuth-hash of ``vec_id`` instead of RNG, so the
    graph — and therefore the query output — is reproducible run to run.
    Construction is the paper's algorithm 1 (greedy descent to the node's
    level, beam search per layer, keep-closest neighbor selection with
    degree pruning); search is algorithm 2/5 (greedy upper layers, ef-beam
    at layer 0). Per-node loops are inherent to HNSW; they run inside the
    shard's actor and the candidate scoring is numpy dot products."""

    def __init__(self, m: int = HNSW_M, ef_c: int = HNSW_EF_C) -> None:
        self.m = m
        self.ef_c = ef_c
        self.vecs: np.ndarray | None = None
        self.levels: list[int] = []
        self.links: list[list[list[int]]] = []  # node → layer → neighbors
        self.entry = -1
        self.max_level = -1

    @staticmethod
    def _level_of(vec_id: int, m: int) -> int:
        u = (((int(vec_id) * 2654435761) & 0xFFFFFFFF) + 1) / 4294967297.0
        return int(-np.log(u) / np.log(m))

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, layer: int):
        """Beam search on one layer: returns [(sim, node)] best-first."""
        import heapq

        s_entry = float(self.vecs[entry] @ q)
        visited = {entry}
        cand = [(-s_entry, entry)]  # max-heap by sim
        best = [(s_entry, entry)]  # min-heap of the ef best
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            for nb in self.links[c][layer]:
                if nb in visited:
                    continue
                visited.add(nb)
                s = float(self.vecs[nb] @ q)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(best, (s, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted(best, reverse=True)

    def build(self, Mn: np.ndarray) -> "_HnswGraph":
        self.vecs = Mn
        n = len(Mn)
        self.levels = [self._level_of(i, self.m) for i in range(n)]
        self.links = [
            [[] for _ in range(lv + 1)] for lv in self.levels
        ]
        for i in range(n):
            if self.entry < 0:
                self.entry, self.max_level = i, self.levels[i]
                continue
            q = Mn[i]
            ep = self.entry
            # greedy descent through layers above the node's level
            for layer in range(self.max_level, self.levels[i], -1):
                improved = True
                while improved:
                    improved = False
                    s_ep = float(Mn[ep] @ q)
                    for nb in self.links[ep][layer] if layer < len(self.links[ep]) else []:
                        if float(Mn[nb] @ q) > s_ep:
                            ep, improved = nb, True
                            break
            # beam-insert at each layer ≤ node level
            for layer in range(min(self.levels[i], self.max_level), -1, -1):
                found = self._search_layer(q, ep, self.ef_c, layer)
                ep = found[0][1]
                cap = self.m * 2 if layer == 0 else self.m
                chosen = [nid for _, nid in found[: self.m]]
                self.links[i][layer] = list(chosen)
                for nb in chosen:
                    lst = self.links[nb][layer]
                    lst.append(i)
                    if len(lst) > cap:  # prune to the closest cap links
                        vs = self.vecs[lst] @ self.vecs[nb]
                        keep = np.argsort(-vs, kind="stable")[:cap]
                        self.links[nb][layer] = [lst[j] for j in keep]
            if self.levels[i] > self.max_level:
                self.entry, self.max_level = i, self.levels[i]
        return self

    def search(self, q: np.ndarray, k: int, ef: int = HNSW_EF_S):
        if self.entry < 0:
            return []
        ep = self.entry
        for layer in range(self.max_level, 0, -1):
            improved = True
            while improved:
                improved = False
                s_ep = float(self.vecs[ep] @ q)
                for nb in self.links[ep][layer] if layer < len(self.links[ep]) else []:
                    if float(self.vecs[nb] @ q) > s_ep:
                        ep, improved = nb, True
                        break
        return self._search_layer(q, ep, max(ef, k), 0)[:k]


def ann_hnsw_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate cosine top-k via SHARDED HNSW: each map_batches shard
    builds one deterministic graph over its vectors (actor-local, bounded
    memory), searches the broadcast query matrix, and emits per-shard
    top-k partials; a slim per-query merge picks the global top-k —
    identical merge topology to ``ann_topk``/``ann_ivf_topk``, so the
    shuffle carries ≤ shards × queries × k rows at any corpus size.
    Rows-only by declared design (approximate); recall vs the brute-force
    oracle is asserted in tests."""
    qids, Q = _query_matrix(sf_dir)
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, qn))

    class ShardSearcher:
        def __init__(self) -> None:
            self.qids, self.qn = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            M = _emb_matrix(df)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            g = _HnswGraph().build(Mn)
            vec_ids = df["vec_id"].to_numpy()
            out = []
            for j, qid in enumerate(self.qids):
                # +1 candidate so dropping a self-hit still leaves TOP_K
                hits = g.search(self.qn[j], TOP_K + 1)
                rows = [
                    (int(vec_ids[nid]), s)
                    for s, nid in hits
                    if int(vec_ids[nid]) != int(qid)
                ][:TOP_K]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(rows), qid, dtype=np.int64),
                            "neighbor_id": np.array(
                                [r[0] for r in rows], dtype=np.int64
                            ),
                            "cosine_sim": np.array([r[1] for r in rows]),
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

    partial = _read_emb(sf_dir).map_batches(
        ShardSearcher,
        batch_format="pandas",
        batch_size=HNSW_SHARD,
        concurrency=(1, 4),
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["cosine_sim", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(TOP_K)

    out = partial.groupby("query_id").map_groups(final, batch_format="pandas")
    df = out.to_pandas()
    df["cosine_sim"] = round_half_away(df["cosine_sim"])
    return df.sort_values(
        ["query_id", "cosine_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    ).reset_index(drop=True)


QUERIES: dict[str, Callable[[str], object]] = {
    "semdedup_keepers": semdedup_keepers,
    "embedding_pca_project": embedding_pca_project,
    "label_centroid_norms": label_centroid_norms,
    "label_centroid_drift": label_centroid_drift,
    "ann_topk": ann_topk,
    "mmr_topk": mmr_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_hnsw_topk": ann_hnsw_topk,
    "embedding_dup_pairs": embedding_dup_pairs,
    "kmeans_clusters": kmeans_clusters,
    "xlingual_margin_pairs": xlingual_margin_pairs,
}

ORACLES: dict[str, str] = {
    "label_centroid_norms": _LABEL_CENTROID_SQL,
    "label_centroid_drift": _LABEL_CENTROID_DRIFT_SQL,
    "ann_topk": _ANN_TOPK_SQL,
    "xlingual_margin_pairs": _XLINGUAL_MARGIN_SQL,
    "embedding_dup_pairs": _EMBEDDING_DUP_PAIRS_SQL,
    # ann_ivf_topk / ann_hnsw_topk: rows-only (approximate; recall
    # asserted in tests)
    # kmeans_clusters: rows-only (iterative, not SQL-expressible; invariants
    # asserted in tests/test_similarity_textstats.py)
    # semdedup_keepers: rows-only (k-means assignment not SQL-expressible;
    # validated against a numpy mirror + twin-recall in tests)
}

"""BM25 / TF-IDF (functions/search.py) vs brute-force references."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from simple_content_ocr_ray.functions import search

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _brute_bm25() -> list[tuple[int, float]]:
    docs = _docs()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = []
    for doc_id, t in toks.items():
        c = Counter(t)
        s = 0.0
        for q in search.BM25_QUERY:
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = c[q]
            s += idf * tf * (search.BM25_K1 + 1) / (
                tf
                + search.BM25_K1
                * (1 - search.BM25_B + search.BM25_B * len(t) / avgdl)
            )
        scores.append((doc_id, s))
    scores.sort(key=lambda x: (-x[1], x[0]))
    return scores[: search.BM25_TOPK]


def test_bm25_matches_bruteforce(ray_session):
    got = search.bm25_topk(SF)
    exp = _brute_bm25()
    assert list(got["doc_id"]) == [d for d, _ in exp]
    for g, (_, s) in zip(got["score"], exp):
        assert abs(g - round(s, search.TFIDF_ROUND)) < 1e-9


def test_tfidf_top_terms_matches_bruteforce(ray_session):
    got = search.tfidf_top_terms(SF).set_index("doc_id")
    docs = _docs()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    df = Counter()
    for t in toks.values():
        df.update(set(t))
    for doc_id, t in list(toks.items())[:50]:
        c = Counter(t)
        best = min(
            ((-tf * math.log(n / df[term]), term) for term, tf in c.items()),
        )
        assert got.loc[doc_id, "term"] == best[1]
        assert abs(got.loc[doc_id, "tfidf"] - round(-best[0], search.TFIDF_ROUND)) < 1e-9
    assert len(got) == len(docs)


def test_unigram_logprob_matches_bruteforce(ray_session):
    got = search.doc_unigram_logprob(SF).set_index("doc_id")
    docs = _docs()
    counts = Counter()
    for t in docs["text"]:
        counts.update(t.split(" "))
    total = sum(counts.values())
    vocab = len(counts)
    for r in docs.head(50).itertuples():
        toks = r.text.split(" ")
        exp = sum(math.log((counts[t] + 1.0) / (total + vocab)) for t in toks) / len(toks)
        assert abs(got.loc[r.doc_id, "mean_logprob"] - round(exp, search.TFIDF_ROUND)) < 1e-9
    # a doc of rare tokens must score below a doc of common tokens
    ranked = got["mean_logprob"]
    assert ranked.min() < ranked.max()


def test_top_collocations_pmi_math(ray_session):
    got = search.top_collocations(SF)
    docs = _docs()
    from collections import defaultdict

    doc_terms = [set(t.split(" ")) for t in docs["text"]]
    n = len(doc_terms)
    df = Counter()
    co = defaultdict(int)
    for terms in doc_terms:
        df.update(terms)
        ts = sorted(terms)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                co[(ts[i], ts[j])] += 1
    frequent = {p: c for p, c in co.items() if c >= search.PMI_MIN_CO}
    ranked = sorted(
        frequent.items(),
        key=lambda kv: (-math.log(n * kv[1] / (df[kv[0][0]] * df[kv[0][1]])), kv[0]),
    )[: search.PMI_TOPK]
    assert list(zip(got["a"], got["b"])) == [p for p, _ in ranked]
    for (a, b), c in ranked:
        row = got[(got["a"] == a) & (got["b"] == b)].iloc[0]
        assert row["n_co"] == c
        exp = math.log(n * c / (df[a] * df[b]))
        assert abs(row["pmi"] - round(exp, search.TFIDF_ROUND)) < 1e-9


def test_source_lm_quality_consistent_with_per_doc(ray_session):
    """The per-source mean equals the token-weighted mean recomputed from
    raw texts under the same model."""
    import numpy as np
    from collections import Counter

    got = search.source_lm_quality(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
    model = Counter()
    for t in docs["text"]:
        model.update(t.split(" "))
    total, vocab = sum(model.values()), len(model)
    for source, g in docs.groupby("source"):
        logps = [
            np.log((model[w] + 1.0) / (total + vocab))
            for t in g["text"]
            for w in t.split(" ")
        ]
        assert got.loc[source, "n_tokens"] == len(logps)
        assert abs(got.loc[source, "mean_logprob"] - np.mean(logps)) < 1e-3


def test_mmr_topk_matches_numpy_mirror(ray_session):
    """Distributed candidate pool + greedy selection equals a from-scratch
    numpy MMR over exact cosine; rank 1 is the plain nearest neighbor; the
    selected set is at least as diverse as plain top-k."""
    import numpy as np

    from simple_content_ocr_ray.functions.similarity import (
        MMR_LAMBDA,
        MMR_POOL,
        N_QUERIES,
        ann_topk,
        mmr_topk,
    )

    sf = "/root/testdata/sf0.001"
    got = mmr_topk(sf)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    M = np.stack([np.asarray(v, dtype="float64") for v in emb["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    plain = ann_topk(sf)
    for qid in range(N_QUERIES):
        qv = Mn[ids == qid][0]
        mask = ids != qid
        rel = Mn[mask] @ qv
        cand_idx = np.argsort(-rel, kind="stable")[:MMR_POOL]
        # stable order ties like the operator: (cosine desc, neighbor asc)
        order = np.lexsort((ids[mask][cand_idx], -rel[cand_idx]))
        cand_idx = cand_idx[order]
        S, r, nid = Mn[mask][cand_idx], rel[cand_idx], ids[mask][cand_idx]
        picked = []
        g = got[got["query_id"] == qid].sort_values("rank")
        for rank, row in enumerate(g.itertuples(), start=1):
            red = (S @ S[picked].T).max(axis=1) if picked else np.zeros(len(S))
            score = MMR_LAMBDA * r - (1 - MMR_LAMBDA) * red
            if picked:
                score[picked] = -np.inf
            best = np.lexsort((nid, -score))[0]
            assert row.neighbor_id == nid[best], (qid, rank)
            picked.append(best)
        # rank 1 equals the plain top-1
        top1 = plain[plain["query_id"] == qid].iloc[0]["neighbor_id"]
        assert g.iloc[0]["neighbor_id"] == top1


def test_doc_bigram_logprob_brute_force(sf_dir):
    """Exact brute-force mirror of the Laplace bigram model on a handful of
    docs: counts, prefix totals, and vocabulary computed naively."""
    import math
    import os

    import duckdb

    from simple_content_ocr_ray.functions.search import (
        BIGRAM_ROUND,
        doc_bigram_logprob,
    )

    got = doc_bigram_logprob(sf_dir)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}' "
        "ORDER BY doc_id"
    ).df()
    bc: dict = {}
    pc: dict = {}
    vocab = set()
    for t in docs["text"]:
        toks = t.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            pc[a] = pc.get(a, 0) + 1
    V = len(vocab)
    for _, r in docs.head(7).iterrows():
        toks = r["text"].split(" ")
        lps = [
            math.log((bc[(a, b)] + 1.0) / (pc[a] + V))
            for a, b in zip(toks, toks[1:])
        ]
        exp = round(sum(lps) / len(lps), BIGRAM_ROUND)
        row = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert abs(row["mean_logprob"] - exp) < 1e-9
    # order sensitivity: the bigram model is NOT a bag-of-words score — a
    # reversed token stream must change some document's score
    rev_lps = []
    for _, r in docs.head(7).iterrows():
        toks = r["text"].split(" ")[::-1]
        lps = [
            math.log((bc.get((a, b), 0) + 1.0) / (pc.get(a, 0) + V))
            for a, b in zip(toks, toks[1:])
        ]
        rev_lps.append(round(sum(lps) / len(lps), BIGRAM_ROUND))
    orig = got.set_index("doc_id").loc[docs.head(7)["doc_id"], "mean_logprob"]
    assert any(abs(a - b) > 1e-9 for a, b in zip(orig, rev_lps))

"""Dedup-family tests: determinism, brute-force equivalence, recall."""

import numpy as np
import pandas as pd
import pytest

from simple_content_ocr_ray.functions.dedup import (
    JACCARD_TAU,
    SIMHASH_HAMMING_TAU,
    _minhash_params,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash64,
    simhash_pairs,
    dedup_exact_docs,
)


def test_shingle_hashes_deterministic():
    a = shingle_hashes("one two three four five")
    b = shingle_hashes("one two three four five")
    assert sorted(a.tolist()) == sorted(b.tolist())
    assert len(a) == 3  # 5 words → 3 trigrams


def test_shingle_short_text():
    assert len(shingle_hashes("one two")) == 1
    assert len(shingle_hashes("")) == 0


def test_minhash_estimates_jaccard():
    a, b = _minhash_params()
    rng = np.random.RandomState(7)
    base = rng.randint(0, 2**60, size=200).astype(np.int64)
    other = base.copy()
    other[:60] = rng.randint(0, 2**60, size=60)  # ~0.54 true jaccard
    sa = minhash_signature(np.unique(base), a, b)
    sb = minhash_signature(np.unique(other), a, b)
    est = (sa == sb).mean()
    inter = len(np.intersect1d(base, other))
    true_j = inter / len(np.union1d(base, other))
    assert abs(est - true_j) < 0.15


def test_simhash_near_for_similar_far_for_different():
    s1 = shingle_hashes(" ".join(f"w{i}" for i in range(100)))
    s2 = shingle_hashes(" ".join(f"w{i}" for i in range(98)))  # drop last 2
    s3 = shingle_hashes(" ".join(f"x{i}" for i in range(100)))
    near = bin(simhash64(s1) ^ simhash64(s2)).count("1")
    far = bin(simhash64(s1) ^ simhash64(s3)).count("1")
    assert near <= 8
    assert far >= 20


def _brute_force_pairs(corpus: pd.DataFrame, tau: float) -> set[tuple[int, int]]:
    sets = {
        d: set(shingle_hashes(t).tolist())
        for d, t in zip(corpus["doc_id"], corpus["text"])
    }
    ids = sorted(sets)
    out = set()
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            inter = len(sets[x] & sets[y])
            union = len(sets[x]) + len(sets[y]) - inter
            if union and inter / union >= tau:
                out.add((x, y))
    return out


@pytest.fixture(scope="module")
def neardup_truth(sf_dir):
    import ray

    from simple_content_ocr_ray.functions.dedup import near_dup_corpus

    corpus = near_dup_corpus(sf_dir).to_pandas()
    return corpus, _brute_force_pairs(corpus, JACCARD_TAU)


def test_ngram_jaccard_matches_brute_force(sf_dir, neardup_truth):
    _, truth = neardup_truth
    df = ngram_jaccard_pairs(sf_dir)
    assert set(zip(df["doc_a"], df["doc_b"])) == truth


def test_minhash_lsh_matches_brute_force(sf_dir, neardup_truth):
    _, truth = neardup_truth
    df = minhash_lsh_pairs(sf_dir)
    assert set(zip(df["doc_a"], df["doc_b"])) == truth


def test_simhash_pairs_matches_brute_force(sf_dir, neardup_truth):
    corpus, _ = neardup_truth
    fps = {
        d: simhash64(shingle_hashes(t))
        for d, t in zip(corpus["doc_id"], corpus["text"])
    }
    ids = sorted(fps)
    # brute-force: all pairs within Hamming τ whose bucketing CAN find them
    # (8 bands of 8 bits guarantees discovery for hamming ≤ 7; the operator
    # additionally verifies candidates up to τ)
    expected = set()
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            h = bin(fps[x] ^ fps[y]).count("1")
            if h <= SIMHASH_HAMMING_TAU:
                # must share at least one exact 8-bit band to be discoverable
                if any(
                    ((fps[x] >> (b * 8)) & 0xFF) == ((fps[y] >> (b * 8)) & 0xFF)
                    for b in range(8)
                ):
                    expected.add((x, y))
    df = simhash_pairs(sf_dir)
    assert set(zip(df["doc_a"], df["doc_b"])) == expected


def test_dedup_exact_counts(sf_dir, documents_table):
    df = dedup_exact_docs(sf_dir)
    n_docs = documents_table.num_rows
    n_twins = sum(1 for d in documents_table["doc_id"].to_pylist() if d % 7 == 0)
    assert len(df) == n_docs  # twins collapse into their original's group
    assert df["n_dups"].sum() == n_docs + n_twins
    assert (df[df["n_dups"] == 2]["keeper_doc_id"] % 7 == 0).all()

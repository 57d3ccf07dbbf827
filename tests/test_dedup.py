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
    from simple_content_ocr_ray.functions.dedup import shingle_hashes_md5

    corpus, _ = neardup_truth
    fps = {
        d: simhash64(shingle_hashes_md5(t))
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


def _brute_force_capped_pairs(
    corpus: pd.DataFrame, tau: float, df_cap: int
) -> set[tuple[int, int]]:
    """Candidate pairs only from shingles with df <= cap, then exact verify —
    mirrors ngram_jaccard_pairs' capped path semantics."""
    from collections import Counter

    sets = {
        d: set(shingle_hashes(t).tolist())
        for d, t in zip(corpus["doc_id"], corpus["text"])
    }
    df_count = Counter(s for sh in sets.values() for s in sh)
    inv: dict[int, list[int]] = {}
    for d, sh in sets.items():
        for s in sh:
            if df_count[s] <= df_cap:
                inv.setdefault(s, []).append(d)
    cand = set()
    for docs in inv.values():
        docs = sorted(docs)
        for i, x in enumerate(docs):
            for y in docs[i + 1 :]:
                cand.add((x, y))
    out = set()
    for x, y in cand:
        inter = len(sets[x] & sets[y])
        union = len(sets[x]) + len(sets[y]) - inter
        if union and inter / union >= tau:
            out.add((x, y))
    return out


def test_ngram_capped_path(sf_dir, neardup_truth):
    """Force the df-capped (skew-safe) candidate path and check it against a
    brute force of the same cap semantics; capped results must also be a
    subset of the exact pair set (verify never passes a false positive)."""
    corpus, exact_truth = neardup_truth
    cap = 40  # drops the corpus's hottest shingles at sf0.001
    df = ngram_jaccard_pairs(sf_dir, df_cap=cap)
    got = set(zip(df["doc_a"], df["doc_b"]))
    assert got == _brute_force_capped_pairs(corpus, JACCARD_TAU, cap)
    assert got <= exact_truth


def test_ngram_auto_cap_engages_above_threshold(sf_dir, neardup_truth):
    """auto mode with a tiny exact_max_docs must take the capped branch (and
    still verify exactly)."""
    corpus, exact_truth = neardup_truth
    df = ngram_jaccard_pairs(sf_dir, df_cap="auto", exact_max_docs=10)
    got = set(zip(df["doc_a"], df["doc_b"]))
    from simple_content_ocr_ray.functions.dedup import DEFAULT_DF_CAP

    assert got == _brute_force_capped_pairs(corpus, JACCARD_TAU, DEFAULT_DF_CAP)
    assert got <= exact_truth


def test_pairs_from_groups_distributed_path(sf_dir, neardup_truth):
    """small_threshold=0 forces the groupby shuffle + distributed pair dedup;
    the verified output must equal the in-memory small path byte for byte."""
    import ray.data as rd

    from simple_content_ocr_ray.functions.dedup import (
        _pairs_from_groups,
        _verify_pairs,
        hamming64,
        mix64,
        near_dup_corpus,
        simhash64,
    )

    corpus = near_dup_corpus(sf_dir)

    def sim_rows(df):
        fps = np.fromiter(
            (simhash64(shingle_hashes(t)) for t in df["text"]),
            dtype=np.uint64,
            count=len(df),
        )
        rows = []
        for band in range(8):
            rows.append(
                pd.DataFrame(
                    {
                        "doc_id": df["doc_id"].to_numpy(),
                        "bucket": mix64(
                            np.full(len(df), band, dtype=np.int64),
                            ((fps >> np.uint64(8 * band)) & np.uint64(0xFF)).view(
                                np.int64
                            ),
                        ),
                        "fp": fps.view(np.int64),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    def hamming_ok(g, ia, ib):
        f = g["fp"].to_numpy().astype(np.int64)
        return hamming64(f[ia], f[ib]) <= SIMHASH_HAMMING_TAU

    exploded = corpus.map_batches(sim_rows, batch_format="pandas")
    small = _pairs_from_groups(
        exploded, "bucket", pair_filter=hamming_ok, payload_cols=("fp",)
    )
    large = _pairs_from_groups(
        exploded,
        "bucket",
        pair_filter=hamming_ok,
        payload_cols=("fp",),
        small_threshold=0,
    )
    assert isinstance(large, rd.Dataset)
    got = set(map(tuple, large.to_pandas()[["doc_a", "doc_b"]].to_numpy()))
    want = set(map(tuple, small[["doc_a", "doc_b"]].to_numpy()))
    assert got == want

    # Dataset-typed candidates flow through the distributed verify unchanged
    verified = _verify_pairs(corpus, large, 0.0)
    assert set(map(tuple, verified[["doc_a", "doc_b"]].to_numpy())) == want


def test_ngram_cooccurrence_distributed_path(sf_dir, neardup_truth):
    """small_threshold=0 forces the distributed co-occurrence topology
    (per-group pair emission + grouped multiplicity count); results must
    equal the in-memory path and the brute force."""
    _, truth = neardup_truth
    df = ngram_jaccard_pairs(sf_dir, small_threshold=0)
    assert set(zip(df["doc_a"], df["doc_b"])) == truth


def test_verify_pairs_hash_join_path(sf_dir, neardup_truth, monkeypatch):
    """Candidate DataFrames above the broadcast threshold must take the
    pair-keyed hash-join topology and produce identical verified pairs."""
    import simple_content_ocr_ray.functions.dedup as D

    corpus, truth = neardup_truth
    cand = pd.DataFrame(
        {"doc_a": [a for a, _ in sorted(truth)], "doc_b": [b for _, b in sorted(truth)]}
    )
    # add some false candidates that exact verification must reject
    ids = sorted(corpus["doc_id"])[:40]
    fake = pd.DataFrame({"doc_a": ids[:20], "doc_b": ids[20:40]})
    cand = pd.concat([cand, fake], ignore_index=True).drop_duplicates()

    corpus_ds = D.near_dup_corpus(sf_dir)
    via_broadcast = D._verify_pairs(corpus_ds, cand, D.JACCARD_TAU)
    monkeypatch.setattr(D, "VERIFY_BROADCAST_MAX_PAIRS", 0)
    via_joins = D._verify_pairs(corpus_ds, cand, D.JACCARD_TAU)
    pd.testing.assert_frame_equal(via_broadcast, via_joins)
    assert set(zip(via_joins["doc_a"], via_joins["doc_b"])) == truth


def test_hamming_typo_pairs_matches_brute_force(ray_session):
    """Both _pairs_from_groups paths vs an all-same-length-pairs brute force
    over the typo-twin corpus."""
    from simple_content_ocr_ray.functions.dedup import (
        HAMMING_TAU,
        hamming_typo_pairs,
        typo_twin_corpus,
    )

    sf = "/root/testdata/sf0.001"
    out = hamming_typo_pairs(sf)
    forced = hamming_typo_pairs(sf, small_threshold=0)  # grouped-shuffle path
    pd.testing.assert_frame_equal(out, forced)

    corpus = typo_twin_corpus(sf).to_pandas()
    from simple_content_ocr_ray.functions.dedup import HAMMING_MIN_LEN

    corpus = corpus[corpus["text"].str.len() >= HAMMING_MIN_LEN]
    exp = set()
    by_len = corpus.groupby(corpus["text"].str.len())
    for _, g in by_len:
        ids = g["doc_id"].to_numpy()
        texts = g["text"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                d = sum(1 for x, y in zip(texts[i], texts[j]) if x != y)
                if d <= HAMMING_TAU:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    exp.add((a, b))
    got = set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))
    assert got == exp
    assert len(exp) > 0  # the twin synthesis produced discoverable pairs


def test_containment_catches_quotes_jaccard_misses():
    """A short doc wholly contained in a long one: containment 1.0 flags it,
    Jaccard (m / union) stays below tau — the operator's reason to exist."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.dedup import (
        CONTAINMENT_TAU,
        JACCARD_TAU,
        _cooccurrence_pairs_df,
        shingle_hashes,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    longdoc = quote + " " + " ".join(f"w{i}" for i in range(40))
    rows = []
    for doc_id, text in ((1, quote), (2, longdoc)):
        hs = shingle_hashes(text)
        for h in hs:
            rows.append((doc_id, h, len(hs)))
    df = pd.DataFrame(rows, columns=["doc_id", "shingle", "n_sh"])

    cont = _cooccurrence_pairs_df(df, CONTAINMENT_TAU, criterion="containment")
    jac = _cooccurrence_pairs_df(df, JACCARD_TAU, criterion="jaccard")
    assert [(1, 2)] == list(zip(cont["doc_a"], cont["doc_b"]))
    assert jac.empty


def test_ngram_containment_paths_equal(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.dedup import ngram_containment_pairs

    sf = "/root/testdata/sf0.001"
    small = ngram_containment_pairs(sf)
    large = ngram_containment_pairs(sf, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)


def test_ngram_containment_capped_path_recall(ray_session):
    """The df-capped skew-safe path exists for containment too (review
    finding): candidates pruned by the stop-shingle cap are verified under
    the CONTAINMENT criterion; every pair the exact path finds whose
    shingles aren't all hot must survive."""
    import pandas as pd

    from simple_content_ocr_ray.functions.dedup import ngram_containment_pairs

    sf = "/root/testdata/sf0.001"
    exact = ngram_containment_pairs(sf)  # auto → exact below the threshold
    capped = ngram_containment_pairs(sf, df_cap=512)
    # at df_cap=512 no shingle in this corpus is hot, so the capped path
    # must reproduce the exact pair set through the verify join
    pd.testing.assert_frame_equal(exact, capped)


def test_doc_dup_fraction_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.agg import round_half_away
    from simple_content_ocr_ray.functions.dedup import (
        doc_dup_fraction,
        shingle_hashes,
    )

    sf = "/root/testdata/sf0.001"
    got = doc_dup_fraction(sf).set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = docs[docs["text"].str.strip().str.len() > 0]
    sets = {
        int(d): set(shingle_hashes(t).tolist())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    df_count: dict[int, int] = {}
    for s in sets.values():
        for h in s:
            df_count[h] = df_count.get(h, 0) + 1
    assert len(got) == len(sets)
    for d, s in sets.items():
        dup = sum(1 for h in s if df_count[h] > 1)
        assert got.loc[d, "n_shingles"] == len(s)
        assert abs(got.loc[d, "dup_fraction"] - round_half_away(dup / len(s))) < 1e-9


def test_mirrored_text_domains_bruteforce(ray_session):
    """Brute-force pandas recomputation over the exact-twin corpus; every
    exact twin lands on a different domain, so each duplicated text is a
    cross-domain mirror."""
    import hashlib

    import pandas as pd

    from simple_content_ocr_ray.functions.dedup import (
        EXACT_TWIN_OFFSET,
        mirrored_text_domains,
    )
    from simple_content_ocr_ray.sources.synth_pages import N_HOSTS

    sf = "/root/testdata/sf0.001"
    got = mirrored_text_domains(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = [(int(d), t) for d, t in zip(docs["doc_id"], docs["text"])]
    rows += [
        (int(d) + EXACT_TWIN_OFFSET, t)
        for d, t in zip(docs["doc_id"], docs["text"])
        if d % 7 == 0
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["h"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
    df["domain"] = [f"site{d % N_HOSTS}.example" for d in df["doc_id"]]
    pd_lvl = df.groupby(["h", "domain"])["doc_id"].agg(["size", "min"]).reset_index()
    exp = (
        pd_lvl.groupby("h")
        .agg(n_domains=("domain", "size"), n_copies=("size", "sum"),
             keeper_doc_id=("min", "min"))
        .reset_index()
    )
    exp = exp[exp["n_domains"] > 1].rename(columns={"h": "text_md5"})
    exp = exp.sort_values("text_md5").reset_index(drop=True).astype(
        {"n_domains": "int64", "n_copies": "int64", "keeper_doc_id": "int64"}
    )
    pd.testing.assert_frame_equal(got, exp)
    # the twin fixture guarantees mirrors exist and every twinned text is
    # flagged (distinct texts may collapse to one hash row, so compare sets)
    twin_hashes = set(df.loc[df["doc_id"] >= EXACT_TWIN_OFFSET, "h"])
    assert twin_hashes and twin_hashes <= set(got["text_md5"])


def test_source_dup_matrix_star_shape(ray_session):
    """Every pair involves the synthetic mirror feed (base sources provably
    share nothing); counts equal each source's distinct %7 texts."""
    import pandas as pd

    from simple_content_ocr_ray.functions.dedup import MIRROR_FEED, source_dup_matrix

    sf = "/root/testdata/sf0.001"
    got = source_dup_matrix(sf)
    assert len(got) > 0
    assert ((got["source_a"] == MIRROR_FEED) | (got["source_b"] == MIRROR_FEED)).all()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    tw = docs[docs["doc_id"] % 7 == 0]
    # per source: distinct texts that the mirror re-serves AND the source holds
    mirror_texts = set(tw["text"])
    for r in got.itertuples():
        src = r.source_a if r.source_b == MIRROR_FEED else r.source_b
        own = set(docs.loc[docs["source"] == src, "text"])
        assert r.n_shared_texts == len(own & mirror_texts), src


def test_metadata_gate_large_path_never_materializes_exploded(
    sf_dir, neardup_truth, monkeypatch
):
    """r3: with a footer-derived ``est_rows`` above the threshold the large
    path STREAMS into the bucket shuffle — nothing as large as the exploded
    table is ever pinned. Row-count spy over every materialize() call; the
    output must still equal the small path."""
    import ray.data as rd

    from simple_content_ocr_ray.functions.dedup import (
        SIMHASH_BANDS,
        _pairs_from_groups,
        hamming64,
        mix64,
        near_dup_corpus,
        simhash64,
    )

    corpus = near_dup_corpus(sf_dir)

    def sim_rows(df):
        n = len(df)
        fps = np.fromiter(
            (simhash64(shingle_hashes(t)) for t in df["text"]),
            dtype=np.uint64,
            count=n,
        )
        bytes_ = (
            fps[:, None]
            >> (np.uint64(8) * np.arange(SIMHASH_BANDS, dtype=np.uint64))
        ) & np.uint64(0xFF)
        band_ids = np.broadcast_to(
            np.arange(SIMHASH_BANDS, dtype=np.int64), (n, SIMHASH_BANDS)
        )
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), SIMHASH_BANDS),
                "bucket": mix64(band_ids.ravel(), bytes_.ravel()),
                "fp": np.repeat(fps.view(np.int64), SIMHASH_BANDS),
            }
        )

    def hamming_ok(g, ia, ib):
        f = g["fp"].to_numpy().astype(np.int64)
        return hamming64(f[ia], f[ib]) <= SIMHASH_HAMMING_TAU

    exploded = corpus.map_batches(sim_rows, batch_format="pandas")
    n_exploded = exploded.count()
    small = _pairs_from_groups(
        exploded, "bucket", pair_filter=hamming_ok, payload_cols=("fp",)
    )

    materialized_counts: list[int] = []
    orig = rd.Dataset.materialize

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        materialized_counts.append(out.count())
        return out

    monkeypatch.setattr(rd.Dataset, "materialize", spy)
    large = _pairs_from_groups(
        exploded,
        "bucket",
        pair_filter=hamming_ok,
        payload_cols=("fp",),
        est_rows=10**12,  # metadata says "huge" -> streaming large path
    )
    got = set(map(tuple, large.to_pandas()[["doc_a", "doc_b"]].to_numpy()))
    assert got == set(map(tuple, small[["doc_a", "doc_b"]].to_numpy()))
    # nothing LARGER than the exploded table is ever pinned. (r5: the
    # map_sorted_runs guard deliberately pins the sorted SHRUNK table — the
    # shuffle output itself, spillable — to verify block key-range
    # disjointness before trusting the fast path; the r3 defect this test
    # pins was a pre-shuffle gate materialization of the exploded table,
    # which must still never happen.)
    assert all(c <= n_exploded for c in materialized_counts), (
        materialized_counts,
        n_exploded,
    )


def test_metadata_gate_small_path_skips_count_pass(sf_dir, neardup_truth):
    """With est_rows under the threshold the small path runs in one pass
    (to_pandas executes the lazy pipeline directly) and matches the
    gate-free output."""
    from simple_content_ocr_ray.functions.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    _, truth = neardup_truth
    assert set(zip(*minhash_lsh_pairs(sf_dir)[["doc_a", "doc_b"]].T.values)) == truth
    # simhash output is stable across the gate change (brute-force test
    # elsewhere pins the semantics; this pins non-emptiness + determinism)
    a = simhash_pairs(sf_dir)
    b = simhash_pairs(sf_dir)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_near_dup_is_full_mining_restricted_to_new(sf_dir):
    import os

    from simple_content_ocr_ray.functions.dedup import (
        _old_band_index_dir,
        incremental_near_dup_pairs,
        minhash_lsh_pairs,
    )

    inc = incremental_near_dup_pairs(sf_dir)
    full = minhash_lsh_pairs(sf_dir)
    exp = (
        full[(full["doc_a"] % 2 == 1) | (full["doc_b"] % 2 == 1)]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        inc.sort_values(["doc_a", "doc_b"]).reset_index(drop=True), exp
    )
    # no old×old pair leaks through, and the restriction is non-vacuous
    assert ((inc["doc_a"] % 2 == 1) | (inc["doc_b"] % 2 == 1)).all()
    assert len(inc) < len(full)
    # the old-half index is a persisted artifact, reused on the next call
    idx = _old_band_index_dir(sf_dir)
    assert os.path.isdir(idx)
    before = sorted(os.listdir(idx))
    again = incremental_near_dup_pairs(sf_dir)
    assert sorted(os.listdir(idx)) == before  # read, not rebuilt
    pd.testing.assert_frame_equal(
        again.sort_values(["doc_a", "doc_b"]).reset_index(drop=True), exp
    )

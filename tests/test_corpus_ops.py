"""Corpus-level operator tests: components (both topologies), heavy hitters,
hash split determinism."""

import hashlib

import pandas as pd

from simple_content_ocr_ray.functions.corpus_ops import (
    VAL_HEX_CUTOFF,
    doc_split_assign,
    lang_top_tokens,
    near_dup_components,
)


def _components_df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_components_distributed_path_matches_union_find(sf_dir):
    small = _components_df(near_dup_components(sf_dir))
    large = _components_df(near_dup_components(sf_dir, small_max_edges=0))
    pd.testing.assert_frame_equal(small, large)
    # every component label is the min doc_id of its members
    mins = small.groupby("component")["doc_id"].min()
    assert (mins.index == mins.values).all()


def test_components_cover_corpus_and_twins(sf_dir, documents_table):
    out = _components_df(near_dup_components(sf_dir))
    ids = set(out["doc_id"])
    # each injected twin shares its original's component
    twins = out[out["doc_id"] >= 1_000_000]
    assert len(twins) > 0
    by_id = dict(zip(out["doc_id"], out["component"]))
    for t in twins["doc_id"]:
        orig = t - 1_000_000
        if orig in ids:
            assert by_id[t] == by_id[orig] == min(by_id[orig], orig)


def test_lang_top_tokens_shape(sf_dir):
    out = lang_top_tokens(sf_dir)
    assert set(out.columns) == {"lang", "token", "n", "rk"}
    # ranks are 1..k per lang, counts non-increasing within a lang
    for _, g in out.groupby("lang"):
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert (g["n"].diff().dropna() <= 0).all()


def test_doc_split_assign_deterministic(sf_dir):
    a = doc_split_assign(sf_dir).to_pandas().sort_values("doc_id")
    b = doc_split_assign(sf_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    for d, s in zip(a["doc_id"], a["split"]):
        expect = (
            "val"
            if hashlib.md5(str(int(d)).encode()).hexdigest()[:2] < VAL_HEX_CUTOFF
            else "train"
        )
        assert s == expect
    assert set(a["split"]) == {"train", "val"}


def test_stratified_sample_equalizes(sf_dir):
    from simple_content_ocr_ray.functions.corpus_ops import stratified_sample

    out = stratified_sample(sf_dir, target=40)
    per = out.groupby("lang").size()
    # hash sampling is binomial around the target: loose but meaningful bounds
    assert (per > 10).all() and (per < 90).all()
    # deterministic
    out2 = stratified_sample(sf_dir, target=40)
    pd.testing.assert_frame_equal(out, out2)


def test_lang_length_quantiles_match_numpy(sf_dir, documents_table):
    import numpy as np

    from simple_content_ocr_ray.functions.corpus_ops import lang_length_quantiles

    out = lang_length_quantiles(sf_dir)
    df = documents_table.select(["lang", "n_chars"]).to_pandas()
    for _, row in out.iterrows():
        vals = np.sort(df[df["lang"] == row["lang"]]["n_chars"].to_numpy())
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = int(np.ceil(q * len(vals)))
            assert row[col] == vals[rank - 1], (row["lang"], col)


def test_lang_distinct_tokens_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import lang_distinct_tokens

    sf = "/root/testdata/sf0.001"
    got = lang_distinct_tokens(sf).set_index("lang")["n_distinct_tokens"]
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "text"])
    for lang, g in docs.groupby("lang"):
        vocab = set()
        for t in g["text"]:
            vocab.update(t.split(" "))
        assert got[lang] == len(vocab)


def test_lang_sample_exact_k_deterministic(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import lang_sample_exact_k

    sf = "/root/testdata/sf0.001"
    a = lang_sample_exact_k(sf, k=7)
    b = lang_sample_exact_k(sf, k=7)
    pd.testing.assert_frame_equal(a, b)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    sizes = docs.groupby("lang").size()
    for lang, g in a.groupby("lang"):
        assert len(g) == min(7, sizes[lang])  # exactly k (or the whole group)
    # sampled rows are real corpus rows
    assert set(a["doc_id"]) <= set(docs["doc_id"])


def test_type_distinct_users_salted_exact(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import (
        type_distinct_users_salted,
    )

    sf = "/root/testdata/sf0.001"
    got = type_distinct_users_salted(sf)
    assert list(got.columns) == ["event_type", "n_distinct_users"]
    assert list(got["event_type"]) == sorted(got["event_type"])
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    for _, row in got.iterrows():
        assert int(row["n_distinct_users"]) == int(exact[row["event_type"]])


def test_contaminated_docs_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.decontam import (
        DECONTAM_N,
        EVAL_MOD,
        contaminated_docs,
    )

    sf = "/root/testdata/sf0.001"
    got = contaminated_docs(sf).set_index("doc_id")["n_hits"]
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    def shingles(t):
        w = t.split(" ")
        if len(w) < DECONTAM_N:
            return {t}
        return {" ".join(w[i : i + DECONTAM_N]) for i in range(len(w) - DECONTAM_N + 1)}

    eval_sh = set()
    for r in docs[docs["doc_id"] % EVAL_MOD == 0].itertuples():
        eval_sh |= shingles(r.text)
    exp = {}
    for r in docs[docs["doc_id"] % EVAL_MOD != 0].itertuples():
        n = len(shingles(r.text) & eval_sh)
        if n:
            exp[r.doc_id] = n
    assert dict(got) == exp


def test_fuzzy_contaminated_docs_bruteforce(ray_session):
    """Brute-force recomputation over the near-twin-augmented corpus: every
    (train, eval) pair's exact 3-gram Jaccard, best match and match count —
    and the injected near twins of eval docs MUST be flagged (recall check)."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.decontam import (
        EVAL_MOD,
        fuzzy_contaminated_docs,
    )
    from simple_content_ocr_ray.functions.dedup import (
        JACCARD_TAU,
        MIN_TWIN_WORDS,
        NEAR_TWIN_OFFSET,
        shingle_hashes,
    )

    sf = "/root/testdata/sf0.001"
    got = fuzzy_contaminated_docs(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    corpus = [(int(d), t) for d, t in zip(docs["doc_id"], docs["text"]) if t.strip()]
    for d, t in zip(docs["doc_id"], docs["text"]):
        w = t.split(" ")
        if d % 5 == 0 and len(w) >= MIN_TWIN_WORDS:
            corpus.append((int(d) + NEAR_TWIN_OFFSET, " ".join(w[:-2])))
    sets = {d: np.sort(shingle_hashes(t)) for d, t in corpus}
    is_eval = lambda d: d % EVAL_MOD == 0 and d < NEAR_TWIN_OFFSET  # noqa: E731
    exp = {}
    for d, _ in corpus:
        if is_eval(d):
            continue
        hits = []
        for e, _ in corpus:
            if not is_eval(e):
                continue
            inter = np.intersect1d(sets[d], sets[e], assume_unique=True).size
            j = inter / (len(sets[d]) + len(sets[e]) - inter)
            if j >= JACCARD_TAU:
                hits.append((j, e))
        if hits:
            bj = max(h[0] for h in hits)
            exp[d] = (min(e for j, e in hits if j == bj), bj, len(hits))
    assert {
        int(r.doc_id): (int(r.best_eval_id), r.best_jaccard, int(r.n_eval_matches))
        for r in got.itertuples()
    } == exp
    # recall: every ≥MIN_TWIN_WORDS eval doc's injected twin is flagged with
    # a best Jaccard at least as high as its similarity to its own source
    # (the best_eval_id may be a DIFFERENT eval doc on an exact tie)
    twin_checked = 0
    for d, t in zip(docs["doc_id"], docs["text"]):
        if d % EVAL_MOD == 0 and len(t.split(" ")) >= MIN_TWIN_WORDS:
            tw = int(d) + NEAR_TWIN_OFFSET
            inter = np.intersect1d(sets[tw], sets[int(d)], assume_unique=True).size
            j_own = inter / (len(sets[tw]) + len(sets[int(d)]) - inter)
            assert j_own >= JACCARD_TAU
            assert tw in exp and exp[tw][1] >= j_own
            twin_checked += 1
    assert twin_checked > 0


def test_weighted_sample_docs_aes_math(ray_session):
    import hashlib

    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import (
        WEIGHTED_SAMPLE_K,
        weighted_sample_docs,
    )

    sf = "/root/testdata/sf0.001"
    got = weighted_sample_docs(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    u = np.array(
        [
            int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
            for d in docs["doc_id"]
        ],
        dtype="float64",
    )
    key = np.log((u + 1.0) / (2.0**32 + 2.0)) / docs["n_chars"].to_numpy(dtype="float64")
    order = np.lexsort((docs["doc_id"].to_numpy(), -key))
    exp = set(docs["doc_id"].to_numpy()[order][:WEIGHTED_SAMPLE_K])
    assert set(got["doc_id"]) == exp
    # deterministic across runs
    again = weighted_sample_docs(sf)
    pd.testing.assert_frame_equal(got, again)
    # weighting is real: sampled docs skew long
    assert got["n_chars"].mean() > docs["n_chars"].mean()


def test_contaminated_docs_bloom_matches_exact(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.decontam import (
        contaminated_docs,
        contaminated_docs_bloom,
    )

    sf = "/root/testdata/sf0.001"
    exact = contaminated_docs(sf)
    # a deliberately high fp_rate stresses the exact-verify join: many Bloom
    # false positives must all drop out in the distributed hash join
    bloom = contaminated_docs_bloom(sf, fp_rate=0.2)
    pd.testing.assert_frame_equal(exact, bloom)


def test_near_dup_degree_consistent_with_pairs(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import near_dup_degree
    from simple_content_ocr_ray.functions.dedup import ngram_jaccard_pairs

    sf = "/root/testdata/sf0.001"
    deg = near_dup_degree(sf)
    pairs = ngram_jaccard_pairs(sf)
    exp = (
        pd.concat([pairs["doc_a"], pairs["doc_b"]])
        .value_counts()
        .sort_index()
    )
    assert dict(zip(deg["doc_id"], deg["degree"])) == dict(exp)
    # handshake lemma: degree sum = 2 × |pairs|
    assert deg["degree"].sum() == 2 * len(pairs)


def test_lang_source_pivot_mass(ray_session, documents_table):
    from simple_content_ocr_ray.functions.corpus_ops import LANGS, lang_source_pivot

    sf = "/root/testdata/sf0.001"
    out = lang_source_pivot(sf)
    count_cols = [f"n_{lang}" for lang in LANGS]
    assert out[count_cols].to_numpy().sum() == documents_table.num_rows
    import collections

    exp = collections.Counter(
        zip(
            documents_table["source"].to_pylist(),
            documents_table["lang"].to_pylist(),
        )
    )
    for row in out.itertuples():
        for lang in LANGS:
            assert getattr(row, f"n_{lang}") == exp.get((row.source, lang), 0)


def test_lang_token_logodds_semantics(ray_session):
    """Sign sanity: a token used relatively MORE inside a language than in
    the rest of the corpus gets positive log-odds; totals match exact
    counts; statistic is finite everywhere."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import lang_token_logodds

    sf = "/root/testdata/sf0.001"
    got = lang_token_logodds(sf)
    assert np.isfinite(got["lor"]).all()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "text"])
    rows = []
    for lang, text in zip(docs["lang"], docs["text"]):
        for t in text.split(" "):
            rows.append((lang, t))
    df = pd.DataFrame(rows, columns=["lang", "tok"])
    c = df.groupby(["lang", "tok"]).size()
    for (lang, tok), n in c.head(40).items():
        nl = int((df["lang"] == lang).sum())
        nt = int((df["tok"] == tok).sum())
        ng = len(df)
        exp = np.log((n + 1) / (nl - n + 1)) - np.log(
            (nt - n + 1) / (ng - nl - (nt - n) + 1)
        )
        row = got[(got["lang"] == lang) & (got["tok"] == tok)]["lor"].iloc[0]
        assert abs(row - exp) < 1e-3


def test_token_budget_mixture_math(ray_session):
    """Planned rates follow min(1, (frac·total/n_sources)/source_tokens);
    realized counts follow the md5 coin exactly; realized token share lands
    near the budget."""
    import hashlib
    import math

    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import (
        BUDGET_DENOM,
        BUDGET_FRAC,
        token_budget_mixture,
    )

    sf = "/root/testdata/sf0.001"
    got = token_budget_mixture(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    docs["nt"] = [len(t.split(" ")) for t in docs["text"]]
    per = docs.groupby("source")["nt"].agg(["count", "sum"])
    total, ns = float(per["sum"].sum()), float(len(per))
    exp_rate = {
        s: int(math.floor(min(1.0, ((BUDGET_FRAC * total) / ns) / float(st)) * BUDGET_DENOM))
        for s, st in per["sum"].items()
    }
    assert dict(zip(got["source"], got["rate_ppm"])) == exp_rate

    kept = docs[
        [
            int.from_bytes(hashlib.md5(f"{int(d)}#{s}".encode()).digest()[8:16], "little")
            % BUDGET_DENOM
            < exp_rate[s]
            for d, s in zip(docs["doc_id"], docs["source"])
        ]
    ]
    exp_kept = kept.groupby("source")["nt"].agg(["count", "sum"])
    for r in got.itertuples():
        assert int(r.kept_docs) == int(exp_kept["count"].get(r.source, 0))
        assert int(r.kept_tokens) == int(exp_kept["sum"].get(r.source, 0))
    # realized sample is a real downsample near the budget
    assert 0 < got["kept_tokens"].sum() < got["n_tokens"].sum()
    assert abs(got["kept_tokens"].sum() / total - BUDGET_FRAC) < 0.15


def test_source_lang_kl_properties(ray_session):
    """KL ≥ 0, zero iff the source matches the corpus mix — checked against
    a scipy-free numpy recomputation."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import source_lang_kl

    sf = "/root/testdata/sf0.001"
    got = source_lang_kl(sf).set_index("source")
    assert (got["kl_divergence"] >= 0).all()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["source", "lang"])
    glob = docs["lang"].value_counts(normalize=True)
    for source, g in docs.groupby("source"):
        p = g["lang"].value_counts(normalize=True)
        kl = float(sum(p[l] * np.log(p[l] / glob[l]) for l in p.index))
        assert abs(got.loc[source, "kl_divergence"] - kl) < 1e-5, source
        assert got.loc[source, "n_docs"] == len(g)


def test_near_dup_keepers_longest_wins(ray_session):
    """Keeper is the longest member of its component (ties min doc_id);
    every twin pair's keeper is the ORIGINAL (the twin drops two words);
    member counts match the components operator."""
    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import (
        near_dup_components,
        near_dup_keepers,
    )

    sf = "/root/testdata/sf0.001"
    keep = near_dup_keepers(sf)
    comp = near_dup_components(sf).to_pandas()
    sizes = comp.groupby("component").size()
    assert dict(zip(keep["component"], keep["n_members"])) == dict(sizes)
    # every multi-member component's keeper is NOT the dropped-words twin
    multi = keep[keep["n_members"] > 1]
    assert len(multi) > 0
    assert (multi["keeper_doc_id"] < 1_000_000).all()
    # keeper is a member of its component
    by_doc = dict(zip(comp["doc_id"], comp["component"]))
    for r in keep.itertuples():
        assert by_doc[r.keeper_doc_id] == r.component


def test_corpus_report_values(ray_session):
    import hashlib

    import pandas as pd

    from simple_content_ocr_ray.functions.corpus_ops import corpus_report

    sf = "/root/testdata/sf0.001"
    got = dict(zip(*corpus_report(sf).T.values))
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text", "lang", "source"])
    hashes = {hashlib.md5(t.encode()).hexdigest() for t in docs["text"]}
    assert got["n_docs"] == len(docs)
    assert got["n_tokens"] == sum(len(t.split(" ")) for t in docs["text"])
    assert got["n_distinct_texts"] == len(hashes)
    assert got["n_exact_dup_docs"] == len(docs) - len(hashes)
    assert got["n_langs"] == docs["lang"].nunique()
    assert got["n_sources"] == docs["source"].nunique()
    assert abs(got["mean_doc_tokens"] - got["n_tokens"] / got["n_docs"]) < 1e-3


def test_near_dup_pairs_shared_mining(sf_dir, monkeypatch):
    """r3: near_dup_components and near_dup_keepers consume ONE memoized
    mining pass (near_dup_pairs) — the MinHash pipeline runs at most once
    per corpus per process, and the memo returns equal copies."""
    from simple_content_ocr_ray.functions import corpus_ops, dedup

    dedup._NEAR_PAIRS_CACHE.clear()
    calls = []
    orig = dedup.minhash_lsh_pairs

    def counting(sf):
        calls.append(sf)
        return orig(sf)

    monkeypatch.setattr(dedup, "minhash_lsh_pairs", counting)
    a = dedup.near_dup_pairs(sf_dir)
    b = dedup.near_dup_pairs(sf_dir)
    assert len(calls) == 1
    pd.testing.assert_frame_equal(a, b)
    # the memo hands out copies — consumer mutation cannot poison it
    a.loc[:, "doc_a"] = -1
    assert (dedup.near_dup_pairs(sf_dir)["doc_a"] >= 0).all()
    # both component consumers run off the shared pass (no further mining)
    corpus_ops.near_dup_components(sf_dir).count()
    corpus_ops.near_dup_keepers(sf_dir)
    assert len(calls) == 1


# --------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# --------------------------------------------------------------------------


def _brute_kcore(n: int, k: int):
    """Reference peeling in plain pandas over the HITS modular graph."""
    import numpy as np

    d = np.arange(n)
    deg_out = 1 + d % 3
    src = np.repeat(d, deg_out)
    starts = np.repeat(np.cumsum(deg_out) - deg_out, deg_out)
    kk = np.arange(len(src)) - starts + 1
    dst = (23 * src + 7 * kk) % n
    m = src != dst
    e = pd.DataFrame(
        {"u": np.minimum(src[m], dst[m]), "v": np.maximum(src[m], dst[m])}
    ).drop_duplicates()
    while True:
        deg = pd.concat([e["u"], e["v"]]).value_counts()
        dead = set(deg[deg < k].index)
        if not dead:
            break
        e = e[~e["u"].isin(dead) & ~e["v"].isin(dead)]
    deg = pd.concat([e["u"], e["v"]]).value_counts().sort_index()
    return pd.DataFrame(
        {"doc_id": deg.index.astype("int64"), "core_deg": deg.values.astype("int64")}
    ).reset_index(drop=True)


def test_kcore_matches_brute_force_peeling(sf_dir, ray_session):
    import pyarrow.parquet as pq
    import os

    from simple_content_ocr_ray.functions.corpus_ops import KCORE_K, kcore_nodes

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    got = kcore_nodes(sf_dir)
    exp = _brute_kcore(n, KCORE_K)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["core_deg"] >= KCORE_K).all()
    # the peel is non-vacuous: some nodes were actually removed
    assert len(got) < n


def test_kcore_fixpoint_within_round_cap(sf_dir, ray_session):
    """The unrolled SQL runs exactly KCORE_ROUNDS rounds; the Ray side
    early-exits at the fixpoint. Equal results require convergence within
    the cap — assert one round fewer already yields the same output."""
    from simple_content_ocr_ray.functions.corpus_ops import (
        KCORE_ROUNDS,
        kcore_nodes,
    )

    a = kcore_nodes(sf_dir, rounds=KCORE_ROUNDS)
    b = kcore_nodes(sf_dir, rounds=KCORE_ROUNDS - 1)
    pd.testing.assert_frame_equal(a, b)


def test_kcore_forced_large_path_matches_small(sf_dir, ray_session):
    from simple_content_ocr_ray.functions.corpus_ops import kcore_nodes

    small = kcore_nodes(sf_dir)
    large = kcore_nodes(sf_dir, small_max_edges=0)
    pd.testing.assert_frame_equal(small, large)


def test_domain_cap_sample_matches_brute_force(sf_dir, ray_session):
    import hashlib

    from simple_content_ocr_ray.functions.corpus_ops import (
        DOMAIN_CAP,
        _DOMAIN_MOD,
        domain_cap_sample,
    )

    got = domain_cap_sample(sf_dir)
    # brute force: global md5 rank per domain
    import pyarrow.parquet as pq
    import os

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    df = pd.DataFrame({"doc_id": ids})
    df["domain"] = "site" + (df["doc_id"] % _DOMAIN_MOD).astype(str) + ".example"
    df["rk"] = [hashlib.md5(str(x).encode()).hexdigest() for x in df["doc_id"]]
    df = df.sort_values(["domain", "rk", "doc_id"]).reset_index(drop=True)
    df["rank"] = df.groupby("domain", sort=False).cumcount() + 1
    exp = (
        df[df["rank"] <= DOMAIN_CAP][["doc_id", "domain", "rank"]]
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "rank": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)
    # the cap actually bites: at least one domain lost a page
    assert len(got) < len(df)
    assert got.groupby("domain").size().max() <= DOMAIN_CAP


def test_temperature_mixture_flattens_shares(sf_dir, ray_session):
    """α=1/2 temperature sampling: target shares ∝ sqrt(n) — the largest
    source's target share is BELOW its natural share, the smallest's above
    (the data-mixing flattening property) — and the coin realizes each
    target within binomial noise."""
    import numpy as np

    from simple_content_ocr_ray.functions.corpus_ops import (
        temperature_mixture_sample,
    )

    out = temperature_mixture_sample(sf_dir)
    assert (out["n_kept"] <= out["n_docs"]).all()
    tot_n = out["n_docs"].sum()
    tot_t = out["n_target"].sum()
    big = out.loc[out["n_docs"].idxmax()]
    small = out.loc[out["n_docs"].idxmin()]
    if big["n_docs"] > small["n_docs"]:  # degenerate equal-size guard
        assert big["n_target"] / tot_t < big["n_docs"] / tot_n
        assert small["n_target"] / tot_t > small["n_docs"] / tot_n
    # realized kept counts track targets within 5 sigma of binomial noise
    for _, r in out.iterrows():
        p = min(1.0, r["n_target"] / max(1, r["n_docs"]))
        sigma = np.sqrt(max(1.0, r["n_docs"] * p * (1 - p)))
        assert abs(r["n_kept"] - r["n_target"]) <= 5 * sigma + 2, dict(r)

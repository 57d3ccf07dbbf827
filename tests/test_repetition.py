"""Repetition / frequency-structure operator tests: brute-force parity on the
real corpus plus edge-case invariants."""

import hashlib
from collections import Counter

import numpy as np

from simple_content_ocr_ray.functions.repetition import (
    CHUNK_WORDS,
    chunk_dedup,
    doc_repetition_stats,
    doc_word_entropy,
    token_freq_of_freqs,
)


def _brute_rep(text):
    words = text.split(" ")
    n = len(words)
    wc = Counter(words)
    if n >= 2:
        bc = Counter(" ".join(p) for p in zip(words[:-1], words[1:]))
        tb = max(bc.values()) / (n - 1)
    else:
        tb = 0.0
    return n, 1 - len(wc) / n, max(wc.values()) / n, tb


def test_repetition_stats_match_brute_force(sf_dir, documents_table):
    out = doc_repetition_stats(sf_dir).set_index("doc_id")
    texts = dict(
        zip(documents_table["doc_id"].to_pylist(), documents_table["text"].to_pylist())
    )
    checked = 0
    for doc_id, text in texts.items():
        if not text.strip():
            assert doc_id not in out.index
            continue
        n, dup, topw, topb = _brute_rep(text)
        row = out.loc[doc_id]
        assert row["n_words"] == n
        assert abs(row["dup_word_frac"] - dup) <= 5e-5 + 1e-9
        assert abs(row["top_word_frac"] - topw) <= 5e-5 + 1e-9
        assert abs(row["top_bigram_frac"] - topb) <= 5e-5 + 1e-9
        checked += 1
    assert checked > 100


def test_word_entropy_matches_brute_force(sf_dir, documents_table):
    out = doc_word_entropy(sf_dir).set_index("doc_id")
    ids = documents_table["doc_id"].to_pylist()
    texts = documents_table["text"].to_pylist()
    for doc_id, text in list(zip(ids, texts))[:50]:
        if not text.strip():
            continue
        c = np.array(list(Counter(text.split(" ")).values()), dtype=float)
        p = c / c.sum()
        expect = float(-(p * np.log2(p)).sum())
        assert abs(out.loc[doc_id, "word_entropy"] - expect) <= 5e-5 + 1e-9
    # entropy bounded by log2(n_words)
    rep = doc_repetition_stats(sf_dir).set_index("doc_id")
    joined = out.join(rep)
    assert (joined["word_entropy"] <= np.log2(joined["n_words"]) + 1e-9).all()
    assert (joined["word_entropy"] >= 0).all()


def test_chunk_dedup_counts_and_keepers(sf_dir, documents_table):
    out = chunk_dedup(sf_dir)
    # total occurrences = total chunks in the twin-augmented corpus
    total = 0
    chunk_owner = {}
    for doc_id, text in zip(
        documents_table["doc_id"].to_pylist(), documents_table["text"].to_pylist()
    ):
        if not text.strip():
            continue
        words = text.split(" ")
        reps = [doc_id] + ([doc_id + 2_000_000] if doc_id % 7 == 0 else [])
        for d in reps:
            for ci in range((len(words) + CHUNK_WORDS - 1) // CHUNK_WORDS):
                chunk = " ".join(words[ci * CHUNK_WORDS : (ci + 1) * CHUNK_WORDS])
                h = hashlib.md5(chunk.encode()).hexdigest()
                total += 1
                cur = chunk_owner.get(h)
                if cur is None or (d, ci) < cur:
                    chunk_owner[h] = (d, ci)
    assert out["n_dups"].sum() == total
    assert len(out) == len(chunk_owner)
    got = dict(zip(out["text_hash"], zip(out["keeper_doc_id"], out["keeper_chunk"])))
    assert got == chunk_owner
    # every exact twin's chunks are duplicates: n_dups >= 2
    twin_hashes = {
        h for h, (d, _) in chunk_owner.items() if d % 7 == 0
    }
    dups = out[out["text_hash"].isin(twin_hashes)]
    assert (dups["n_dups"] >= 2).all()


def test_token_fof_conserves_mass(sf_dir, documents_table):
    out = token_freq_of_freqs(sf_dir)
    c = Counter()
    for text in documents_table["text"].to_pylist():
        if text.strip():
            c.update(text.split(" "))
    fof = Counter(c.values())
    assert dict(zip(out["freq"], out["n_tokens"])) == dict(fof)
    # mass conservation: sum(freq * n_tokens) = total token occurrences
    assert (out["freq"] * out["n_tokens"]).sum() == sum(c.values())


def test_repeated_ngrams_brute_force(sf_dir, documents_table):
    from simple_content_ocr_ray.functions.repetition import REPEAT_N, repeated_ngrams

    out = repeated_ngrams(sf_dir)
    docs_occ = {}
    for doc_id, text in zip(
        documents_table["doc_id"].to_pylist(), documents_table["text"].to_pylist()
    ):
        if not text.strip():
            continue
        words = text.split(" ")
        if len(words) < REPEAT_N:
            continue
        reps = [doc_id] + ([doc_id + 2_000_000] if doc_id % 7 == 0 else [])
        grams = Counter(
            " ".join(words[i : i + REPEAT_N])
            for i in range(len(words) - REPEAT_N + 1)
        )
        for d in reps:
            for g, c in grams.items():
                h = hashlib.md5(g.encode()).hexdigest()
                nd, no = docs_occ.get(h, (0, 0))
                docs_occ[h] = (nd + 1, no + c)
    exp = {h: v for h, v in docs_occ.items() if v[0] >= 2}
    got = dict(zip(out["gram_hash"], zip(out["n_docs"], out["n_occ"])))
    assert got == exp
    # every twin-doc gram repeats by construction
    assert len(out) > 0 and (out["n_docs"] >= 2).all()


def test_bpe_merge_rounds_matches_reference(ray_session):
    """Distributed BPE training equals a from-scratch pure-python trainer on
    the same corpus (same tie-breaks: max count, then lexicographic)."""
    from collections import Counter

    import pandas as pd

    from simple_content_ocr_ray.functions.repetition import (
        BPE_ROUNDS,
        _apply_merges,
        bpe_merge_rounds,
    )

    sf = "/root/testdata/sf0.001"
    got = bpe_merge_rounds(sf)
    assert list(got.columns) == ["round", "left", "right", "pair_count"]
    assert len(got) == BPE_ROUNDS

    words = Counter()
    for t in pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])["text"]:
        for w in t.split(" "):
            if w:
                words[w] += 1
    merges = []
    for r in range(BPE_ROUNDS):
        pc = Counter()
        for w, c in words.items():
            syms = _apply_merges(list(w), merges)
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        row = got.iloc[r]
        assert (row["left"], row["right"]) == best[0], r
        assert row["pair_count"] == best[1], r


def test_bpe_encode_stats_matches_reference(ray_session):
    """Distributed encoding under the trained merges equals a pure-python
    re-encode of every document; accounting identities hold."""
    from collections import Counter

    import pandas as pd

    from simple_content_ocr_ray.functions.repetition import (
        BPE_ROUNDS,
        _apply_merges,
        bpe_encode_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = bpe_encode_stats(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == len(docs)

    # train the reference merges exactly as the trainer-parity test does
    words = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                words[w] += 1
    merges = []
    for _ in range(BPE_ROUNDS):
        pc = Counter()
        for w, c in words.items():
            syms = _apply_merges(list(w), merges)
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        merges.append(min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0])

    by_id = got.set_index("doc_id")
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in t.split(" ") if w]
        row = by_id.loc[int(d)]
        assert row["n_words"] == len(ws)
        assert row["n_symbols"] == sum(len(w) for w in ws)
        assert row["n_bpe_tokens"] == sum(
            len(_apply_merges(list(w), merges)) for w in ws
        )
    assert (got["n_merges_applied"]
            == got["n_symbols"] - got["n_bpe_tokens"]).all()
    # the trained merges actually fire somewhere
    assert got["n_merges_applied"].sum() > 0


def test_repeated_ngram_spans_bruteforce_and_paths(ray_session, tmp_path):
    """r3: merged cross-doc repeated spans vs a direct brute force over a
    corpus with a planted shared run; small and doc-keyed-shuffle paths
    agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_content_ocr_ray.functions.repetition import (
        SPAN_K,
        repeated_ngram_spans,
    )

    shared = " ".join(f"s{i}" for i in range(SPAN_K + 3))  # 11-word run
    texts = [
        f"alpha beta {shared} gamma delta",          # span in the middle
        f"{shared} tail one two three four five",    # span at the start
        "totally unrelated words here with no overlap at all present",
        f"x0 x1 x2 x3 {shared}",                     # span at the end
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["t"] * 4, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    # brute force: positions whose k-gram string occurs in >= 2 distinct docs
    def grams(text):
        w = text.split(" ")
        return {
            i + 1: " ".join(w[i : i + SPAN_K])
            for i in range(len(w) - SPAN_K + 1)
        }
    per_doc = {d: grams(x) for d, x in enumerate(texts)}
    df_docs = {}
    for d, g in per_doc.items():
        for gram in set(g.values()):
            df_docs.setdefault(gram, set()).add(d)
    expected = []
    for d, g in per_doc.items():
        hot = sorted(p for p, gram in g.items() if len(df_docs[gram]) >= 2)
        run = []
        for p in hot:
            if run and p - run[-1] <= SPAN_K:
                run.append(p)
            else:
                if run:
                    expected.append((d, run[0], run[-1] + SPAN_K - 1, len(run)))
                run = [p]
        if run:
            expected.append((d, run[0], run[-1] + SPAN_K - 1, len(run)))

    out = repeated_ngram_spans(str(tmp_path))
    got = list(map(tuple, out.to_numpy()))
    assert got == sorted(expected)
    assert 2 not in out["doc_id"].to_numpy()  # the unrelated doc has no span

    forced = repeated_ngram_spans(str(tmp_path), small_threshold=0)
    assert list(map(tuple, forced.to_numpy())) == sorted(expected)


def test_strip_repeated_spans_removes_planted_run(ray_session, tmp_path):
    """The rewrite drops exactly the spans the miner reports: the planted
    shared run disappears from every doc that had it, untouched docs pass
    through byte-identically, and n_tokens_removed reconciles."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_content_ocr_ray.functions.repetition import (
        SPAN_K,
        repeated_ngram_spans,
        strip_repeated_spans,
    )

    shared = " ".join(f"s{i}" for i in range(SPAN_K + 2))
    texts = [
        f"alpha beta {shared} gamma",
        f"{shared} tail one two three",
        "totally unrelated words here with no overlap at all present",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    out = strip_repeated_spans(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_clean"] == "alpha beta gamma"
    assert out.loc[1, "text_clean"] == "tail one two three"
    assert out.loc[2, "text_clean"] == texts[2]
    assert out.loc[2, "n_tokens_removed"] == 0
    spans = repeated_ngram_spans(str(tmp_path))
    per_doc = spans.assign(n=spans["end_tok"] - spans["start_tok"] + 1).groupby(
        "doc_id"
    )["n"].sum()
    for d in (0, 1):
        assert out.loc[d, "n_tokens_removed"] == per_doc[d]


def test_cdc_chunks_reassemble_and_average_size():
    from simple_content_ocr_ray.functions.repetition import CDC_MOD, cdc_chunks

    rng = __import__("random").Random(7)
    text = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"]) for _ in range(2000)
    )
    chunks = cdc_chunks(text)
    assert "".join(chunks) == text  # lossless split
    avg = len(text) / len(chunks)
    assert CDC_MOD / 3 < avg < CDC_MOD * 3  # boundary rate near 1/CDC_MOD


def test_cdc_shift_resistance_vs_fixed_chunking():
    """The CDC property: a single insertion re-chunks one neighborhood;
    fixed-size chunking shifts every later chunk."""
    from simple_content_ocr_ray.functions.repetition import cdc_chunks

    rng = __import__("random").Random(11)
    text = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"]) for _ in range(3000)
    )
    edited = text[:50] + "X" + text[50:]  # insert one char near the start

    a, b = set(cdc_chunks(text)), set(cdc_chunks(edited))
    cdc_preserved = len(a & b) / len(a)
    assert cdc_preserved > 0.9, cdc_preserved

    fixed = lambda t: {t[i : i + 61] for i in range(0, len(t), 61)}  # noqa: E731
    fixed_preserved = len(fixed(text) & fixed(edited)) / len(fixed(text))
    assert fixed_preserved < 0.1, fixed_preserved  # every chunk after pos 50 shifts


def test_cdc_chunk_dedup_twins_and_brute_force(sf_dir, documents_table):
    import hashlib
    from collections import Counter

    from simple_content_ocr_ray.functions.repetition import (
        cdc_chunk_dedup,
        cdc_chunks,
    )
    from simple_content_ocr_ray.functions.dedup import EXACT_TWIN_OFFSET

    got = cdc_chunk_dedup(sf_dir).set_index("chunk_hash")

    # brute force over the same twin-augmented corpus
    per_doc = Counter()
    docs = Counter()
    for did, text in zip(
        documents_table["doc_id"].to_pylist(), documents_table["text"].to_pylist()
    ):
        ids = [did] + ([did + EXACT_TWIN_OFFSET] if did % 7 == 0 else [])
        for d in ids:
            cc = Counter(
                hashlib.md5(c.encode()).hexdigest() for c in cdc_chunks(text)
            )
            per_doc.update(cc)
            for h in cc:
                docs[h] += 1
    expected = {h: n for h, n in per_doc.items() if n >= 2}
    assert set(got.index) == set(expected)
    for h, n in expected.items():
        assert got.loc[h, "n_occ"] == n
        assert got.loc[h, "n_docs"] == docs[h]
    # every twin's chunks are duplicated by construction
    assert len(got) > 0

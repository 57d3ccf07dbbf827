"""Fifth-session additions: event transition matrix (LEAD semantics) and
sequence packing (distributed prefix scan) — both adaptive paths asserted
byte-equal and checked against pandas/numpy brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_event_transitions_paths_equal_and_brute_force(ray_session):
    from simple_content_ocr_ray.functions.window import event_transitions

    out = event_transitions(SF)
    forced = event_transitions(SF, small_threshold=0)  # keyed-shuffle path
    pd.testing.assert_frame_equal(out, forced)

    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    et = ev["event_type"].to_numpy()
    same = ev["user_id"].to_numpy()[:-1] == ev["user_id"].to_numpy()[1:]
    exp = (
        pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        .groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    merged = out.merge(exp, on=["from_type", "to_type"], suffixes=("", "_exp"))
    assert len(merged) == len(out) == len(exp)
    assert (merged["n"] == merged["n_exp"]).all()
    # probabilities row-normalize to 1 within each from_type
    sums = out.groupby("from_type")["p"].sum()
    assert (np.abs(sums - 1.0) < 1e-2).all()


def test_packed_sequences_paths_equal_and_brute_force(ray_session):
    from simple_content_ocr_ray.pipelines.train_feed import (
        SEQ_BUDGET,
        packed_sequences,
    )

    out = packed_sequences(SF)
    forced = packed_sequences(SF, small_threshold=0)  # distributed prefix scan
    pd.testing.assert_frame_equal(out, forced)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n_tok = docs["text"].str.split(" ").str.len().to_numpy(dtype="int64")
    start = np.cumsum(n_tok) - n_tok
    exp = (
        pd.DataFrame(
            {"seq_id": start // SEQ_BUDGET, "n_tok": n_tok, "doc_id": docs["doc_id"]}
        )
        .groupby("seq_id", as_index=False)
        .agg(
            n_docs=("n_tok", "size"),
            total_tokens=("n_tok", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
    )
    pd.testing.assert_frame_equal(out, exp.astype("int64"), check_dtype=False)
    # every sequence except possibly the last spans >= the token budget
    # (docs straddle boundaries, so a sequence's own token sum can exceed it)
    assert (out["total_tokens"].iloc[:-1].cumsum() >= SEQ_BUDGET * np.arange(1, len(out))).all()


def test_packed_sequences_bucket_boundary(ray_session):
    """The distributed path must agree even when buckets are tiny (many
    buckets, non-trivial offsets): shrink the bucket width via monkeypatch."""
    import simple_content_ocr_ray.pipelines.train_feed as tf

    orig = tf.PACK_BUCKET_W
    try:
        tf.PACK_BUCKET_W = 7  # dozens of buckets at sf0.001
        forced = tf.packed_sequences(SF, small_threshold=0)
    finally:
        tf.PACK_BUCKET_W = orig
    base = tf.packed_sequences(SF)
    pd.testing.assert_frame_equal(base, forced)


def test_semdedup_matches_numpy_mirror(ray_session):
    """Distributed SemDeDup == single-process numpy mirror (same sample,
    same centroid training, same pruning rule); every injected twin must be
    dropped in favour of its base vector."""
    from simple_content_ocr_ray.functions.similarity import (
        DUP_TAU,
        TWIN_OFFSET,
        _emb_matrix,
        _train_centroids,
        _training_sample,
        semdedup_keepers,
    )

    sf = "/root/testdata/sf0.001"
    out = semdedup_keepers(sf)

    t = _training_sample(sf).sort_values("vec_id")
    M = _emb_matrix(t)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    C = _train_centroids(Mn)

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    tw = emb[emb.vec_id % 5 == 0].copy()
    tw["vec_id"] += TWIN_OFFSET
    corpus = pd.concat([emb, tw]).sort_values("vec_id").reset_index(drop=True)
    X = _emb_matrix(corpus)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cl = np.argmax(Xn @ C.T, axis=1)

    exp_rows = []
    for c in np.unique(cl):
        sel = np.nonzero(cl == c)[0]
        ids = corpus["vec_id"].to_numpy()[sel]
        S = Xn[sel] @ Xn[sel].T
        n = len(sel)
        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i in range(n):
            for j in range(i + 1, n):
                if S[i, j] >= DUP_TAU:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for i in range(n):
            exp_rows.append((int(ids[i]), int(c), int(ids[find(i)])))
    exp = (
        pd.DataFrame(exp_rows, columns=["vec_id", "cluster", "keep_vec_id"])
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp["is_keeper"] = exp["keep_vec_id"] == exp["vec_id"]
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    # twin recall: every twin is a non-keeper whose keeper is its base id
    twins = out[out["vec_id"] >= TWIN_OFFSET]
    assert len(twins) > 0
    assert (~twins["is_keeper"]).all()
    assert (twins["keep_vec_id"] == twins["vec_id"] - TWIN_OFFSET).all()


def test_pagerank_matches_numpy_mirror(ray_session):
    """Distributed integer PageRank == single-process numpy recurrence;
    teleport floor keeps total mass within N of SCALE per iteration."""
    from simple_content_ocr_ray.functions.corpus_ops import (
        PAGERANK_ITERS,
        PAGERANK_OUTDEG,
        PAGERANK_SCALE,
        doc_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    out = doc_pagerank(sf)
    n = len(pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"]))
    assert len(out) == n

    r = np.full(n, PAGERANK_SCALE // n, dtype="int64")
    teleport = (15 * PAGERANK_SCALE) // (100 * n)
    for _ in range(PAGERANK_ITERS):
        nxt = np.full(n, teleport, dtype="int64")
        c = (r * 85) // (100 * PAGERANK_OUTDEG)
        for k in range(1, PAGERANK_OUTDEG + 1):
            dst = (17 * np.arange(n, dtype="int64") + 13 * k) % n
            np.add.at(nxt, dst, c)
        r = nxt
    assert (out["rank_u"].to_numpy() == r).all()
    # damping preserves ~85% of mass + teleport; floor loss bounded per node
    assert abs(int(r.sum()) - PAGERANK_SCALE) < 2 * n * PAGERANK_ITERS + n


def test_curated_corpus_paths_equal(ray_session):
    """The hash-join keeper + distributed packing path must byte-equal the
    small driver path."""
    from simple_content_ocr_ray.pipelines.clean import curated_corpus

    base = curated_corpus(SF)
    forced = curated_corpus(SF, small_threshold=0)
    pd.testing.assert_frame_equal(base, forced)
    assert len(base) > 0
    # packing invariant: seq_id non-decreasing in doc_id order
    assert (np.diff(base["seq_id"].to_numpy()) >= 0).all()


def test_normalize_urls_idempotent_and_cases():
    from simple_content_ocr_ray.pipelines.extract_queries import normalize_urls

    cases = pd.Series(
        [
            "HTTPS://WWW.Example.COM/Path/Sub/?utm_source=a&id=1&utm_medium=b#frag",
            "https://example.com/",
            "https://www.example.com/a?utm_x=1",
            "http://Host.Net/A/B?keep=1&utm_y=2&also=3",
            "https://site1.example/00000001",
        ],
        dtype="object",
    )
    once = normalize_urls(cases)
    assert once.tolist() == [
        "https://example.com/Path/Sub?id=1",
        "https://example.com",
        "https://example.com/a",
        "http://host.net/A/B?keep=1&also=3",
        "https://site1.example/00000001",
    ]
    twice = normalize_urls(once)
    assert twice.tolist() == once.tolist()  # idempotent


def test_key_skew_report_shares(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import SKEW_TOPK, key_skew_report

    got = key_skew_report("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
    counts = ev["user_id"].value_counts()
    assert len(got) == min(SKEW_TOPK, len(counts))
    # descending by count; shares consistent with exact counts
    assert (got["n"].diff().dropna() <= 0).all()
    for _, r in got.iterrows():
        assert r["n"] == counts[r["user_id"]]
        assert abs(r["share"] - round(r["n"] / len(ev), 4)) < 1e-9


def test_bot_rate_flags_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import (
        BOT_EPM_THRESHOLD,
        bot_rate_flags,
    )

    got = bot_rate_flags("/root/testdata/sf0.001").set_index("user_id")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"])
    ev["m"] = ev["ts"].dt.floor("min")
    epm = ev.groupby(["user_id", "m"]).size().groupby("user_id").max()
    assert len(got) == len(epm)
    for uid, mx in epm.items():
        assert got.loc[uid, "max_epm"] == mx
        assert got.loc[uid, "is_bot"] == int(mx >= BOT_EPM_THRESHOLD)


def test_rolling_dau_7d_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import (
        DAU_WINDOW_DAYS,
        rolling_dau_7d,
    )

    got = rolling_dau_7d("/root/testdata/sf0.001").set_index("day")["dau_7d"]
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"]
    )
    ev["day"] = ev["ts"].dt.floor("D")
    days = pd.date_range(ev["day"].min(), ev["day"].max(), freq="D")
    for d in days:
        lo = d - pd.Timedelta(days=DAU_WINDOW_DAYS - 1)
        exp = ev.loc[(ev["day"] >= lo) & (ev["day"] <= d), "user_id"].nunique()
        if exp:
            assert got[d] == exp, d
        else:
            assert d not in got.index


def test_daily_bounce_rate_consistent_with_sessions(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import (
        daily_bounce_rate,
        user_sessions,
    )

    sf = "/root/testdata/sf0.001"
    got = daily_bounce_rate(sf).set_index("day")
    sess = user_sessions(sf)
    sess["day"] = sess["session_start"].dt.floor("D")
    exp = sess.groupby("day").agg(
        n_sessions=("n_events", "size"),
        n_bounce=("n_events", lambda s: int((s == 1).sum())),
    )
    assert len(got) == len(exp)
    for d, row in exp.iterrows():
        assert got.loc[d, "n_sessions"] == row["n_sessions"]
        assert got.loc[d, "n_bounce"] == row["n_bounce"]


def test_purchase_attribution_paths_and_bruteforce(ray_session):
    """Small (vectorized global sort) and large (user-keyed shuffle) paths
    agree, and both match a per-user pandas recomputation."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.window import purchase_attribution

    sf = "/root/testdata/sf0.001"
    small = purchase_attribution(sf)
    large = purchase_attribution(sf, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)

    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    rows = []
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        for i in range(1, len(g)):
            if g.loc[i, "event_type"] == "purchase":
                gap = (g.loc[i, "ts"] - g.loc[i - 1, "ts"]).value  # ns
                rows.append((g.loc[i - 1, "event_type"], gap // 1000))
    exp = pd.DataFrame(rows, columns=["prev_event_type", "gap_us"])
    agg = exp.groupby("prev_event_type")["gap_us"].agg(["size", "mean"])
    got = small.set_index("prev_event_type")
    assert set(got.index) == set(agg.index)
    for t in agg.index:
        assert got.loc[t, "n_purchases"] == agg.loc[t, "size"]
        assert abs(got.loc[t, "avg_gap_s"] - agg.loc[t, "mean"] / 1e6) < 1e-3


def test_user_active_time_paths_and_bruteforce(ray_session):
    """Small and keyed-shuffle paths agree; totals match a brute-force
    interval merge; overlaps never double-count (active ≤ n_events·window,
    with strict inequality whenever windows overlap)."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.functions.window import (
        ACTIVE_WINDOW_US,
        user_active_time,
    )

    sf = "/root/testdata/sf0.001"
    small = user_active_time(sf)
    large = user_active_time(sf, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)

    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    got = small.set_index("user_id")
    overlap_seen = False
    for uid, g in ev.groupby("user_id"):
        s = np.sort(g["ts"].to_numpy(dtype="datetime64[us]").astype("int64"))
        total = 0
        n_isl = 0
        cur_s = cur_e = None
        for x in s:
            if cur_e is None or x > cur_e:
                if cur_e is not None:
                    total += cur_e - cur_s
                cur_s, cur_e = x, x + ACTIVE_WINDOW_US
                n_isl += 1
            else:
                cur_e = max(cur_e, x + ACTIVE_WINDOW_US)
        total += cur_e - cur_s
        assert got.loc[uid, "n_islands"] == n_isl
        assert got.loc[uid, "active_us"] == total
        if total < len(s) * ACTIVE_WINDOW_US:
            overlap_seen = True
    assert overlap_seen


def test_event_trigram_counts_paths_and_bruteforce(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.functions.window import event_trigram_counts

    sf = "/root/testdata/sf0.001"
    small = event_trigram_counts(sf)
    large = event_trigram_counts(sf, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)

    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    from collections import Counter

    c = Counter()
    for _, g in ev.groupby("user_id"):
        et = list(
            g.sort_values(["ts", "event_id"], kind="mergesort")["event_type"]
        )
        for i in range(len(et) - 2):
            c[(et[i], et[i + 1], et[i + 2])] += 1
    got = {(r.t1, r.t2, r.t3): int(r.n) for r in small.itertuples()}
    assert got == dict(c)
    assert sum(got.values()) == sum(len(g) - 2 for _, g in ev.groupby("user_id") if len(g) >= 3)


def test_two_hop_neighbors_brute_force(sf_dir):
    """Broadcast-frontier BFS vs a naive 2-hop set expansion."""
    import os

    import pyarrow.parquet as pq

    from simple_content_ocr_ray.functions.corpus_ops import (
        BFS_SEED_MOD,
        two_hop_neighbors,
    )

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    def neigh(d):
        return {t for t in ((17 * d + 13 * k) % n for k in (1, 2, 3)) if t != d}

    got = two_hop_neighbors(sf_dir)
    for seed in range(0, n, BFS_SEED_MOD):
        h1 = neigh(seed)
        h2 = set().union(*(neigh(x) for x in h1)) if h1 else set()
        expected = (h1 | h2) - {seed}
        row = got[got["seed"] == seed]
        assert len(row) == 1 and row.iloc[0]["n_within_2"] == len(expected)

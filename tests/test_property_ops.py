"""Property-based tests (hypothesis, derandomized) for the pure cores of
the round-2 operators: funnel chaining, Misra-Gries bounds, HLL merge,
bucket assignment, and the as-of group merge. These run the operator's
actual helper functions on adversarial small inputs — no Ray needed."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from simple_content_ocr_ray.functions import sketch
from simple_content_ocr_ray.functions.joins import _asof_group, _funnel_times
from simple_content_ocr_ray.sources.bucketed import bucket_of

EVENT_TYPES = ["view", "click", "purchase"]


def _events_frame(raw: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": np.arange(len(raw), dtype="int64"),
            "user_id": np.array([r[0] for r in raw], dtype="int64"),
            "ts": pd.to_datetime([r[1] * 1000 for r in raw], unit="us").astype(
                "datetime64[us]"
            ),
            "event_type": [EVENT_TYPES[r[2]] for r in raw],
        }
    )


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),  # user
        st.integers(0, 50),  # coarse ts (collisions likely)
        st.integers(0, 2),  # type
    ),
    min_size=0,
    max_size=60,
)


@given(events_strategy)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_funnel_times_match_bruteforce(raw):
    df = _events_frame(raw)
    t = _funnel_times(df)
    # brute force per user
    for uid, g in df.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        row = t[t["user_id"] == uid]
        if views.empty:
            assert row.empty
            continue
        t1 = views.min()
        assert row["t1"].iloc[0] == t1
        clicks = g.loc[(g["event_type"] == "click") & (g["ts"] > t1), "ts"]
        if clicks.empty:
            assert pd.isna(row["t2"].iloc[0])
            continue
        t2 = clicks.min()
        assert row["t2"].iloc[0] == t2
        purchases = g.loc[(g["event_type"] == "purchase") & (g["ts"] > t2), "ts"]
        if purchases.empty:
            assert pd.isna(row["t3"].iloc[0])
        else:
            assert row["t3"].iloc[0] == purchases.min()


@given(events_strategy)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_asof_group_matches_bruteforce(raw):
    df = _events_frame(raw)
    df["event_type"] = df["event_type"].replace({"click": "view"})
    for uid, g in df.groupby("user_id"):
        out = _asof_group(g)
        p = g[g["event_type"] == "purchase"]
        assert list(out["event_id"]) == list(p["event_id"])
        for _, prow in p.iterrows():
            prior = g[(g["event_type"] == "view") & (g["ts"] <= prow["ts"])]
            exp = prior["ts"].max() if len(prior) else pd.NaT
            gotv = out.loc[out["event_id"] == prow["event_id"], "view_ts"].iloc[0]
            assert (pd.isna(gotv) and pd.isna(exp)) or gotv == exp


@given(
    st.lists(st.sampled_from("abcdefghijklmnop"), min_size=1, max_size=400),
    st.integers(2, 10),
)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_misra_gries_bound(tokens, cap):
    true = Counter(tokens)
    counts = pd.Series(tokens).value_counts()
    kept = sketch._mg_merge(counts, cap)
    assert len(kept) <= cap
    for tok, n in kept.items():
        assert n <= true[tok]
        assert true[tok] - n <= len(tokens) / (cap + 1)


@given(st.lists(st.integers(0, 2**62), min_size=0, max_size=500))
@settings(max_examples=100, deadline=None, derandomize=True)
def test_hll_merge_equals_union(keys):
    a = np.array(keys[: len(keys) // 2], dtype="int64")
    b = np.array(keys[len(keys) // 2 :], dtype="int64")
    whole = sketch._hll_registers(np.array(keys, dtype="int64"))
    merged = np.maximum(sketch._hll_registers(a), sketch._hll_registers(b))
    assert np.array_equal(whole, merged)


@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300), st.integers(1, 64))
@settings(max_examples=100, deadline=None, derandomize=True)
def test_bucket_of_stable_and_in_range(keys, n_buckets):
    arr = np.array(keys, dtype="int64")
    got = bucket_of(arr, n_buckets)
    assert ((got >= 0) & (got < n_buckets)).all()
    assert np.array_equal(got, bucket_of(arr, n_buckets))
    # equal keys always land in the same bucket
    s = pd.DataFrame({"k": arr, "b": got}).groupby("k")["b"].nunique()
    assert (s == 1).all()


def test_asof_group_hot_user_scales_vectorized():
    """One user with 200k events: the per-group merge must stay vectorized
    (searchsorted) — a quadratic or per-row path would blow past the time
    budget this asserts indirectly by just finishing fast."""
    import time

    n = 200_000
    rng = np.random.RandomState(3)
    ts = np.sort(rng.randint(0, 10**9, size=n)).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.zeros(n, dtype="int64"),
            "ts": ts,
            "event_type": np.where(rng.rand(n) < 0.5, "view", "purchase"),
        }
    )
    t0 = time.time()
    out = _asof_group(df)
    assert time.time() - t0 < 5.0
    assert len(out) == int((df["event_type"] == "purchase").sum())
    # spot-check correctness at the hot key
    views = df.loc[df["event_type"] == "view", "ts"].to_numpy()
    p0 = out.iloc[len(out) // 2]
    prior = views[views <= np.datetime64(p0["ts"], "us")]
    exp = prior.max() if len(prior) else np.datetime64("NaT")
    assert (pd.isna(p0["view_ts"]) and pd.isna(exp)) or np.datetime64(
        p0["view_ts"], "us"
    ) == exp


def test_funnel_times_hot_user_scales_vectorized():
    import time

    n = 200_000
    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": np.zeros(n, dtype="int64"),
            "ts": np.sort(rng.randint(0, 10**9, size=n)).astype("datetime64[us]"),
            "event_type": rng.choice(["view", "click", "purchase"], size=n),
        }
    )
    t0 = time.time()
    out = _funnel_times(df)
    assert time.time() - t0 < 5.0
    assert len(out) == 1  # one user with a view
    assert out["t3"].notna().all()  # 200k mixed events certainly convert


# ---------------------------------------------------------------------------
# URL canonicalization properties
# ---------------------------------------------------------------------------

url_strategy = st.builds(
    lambda scheme, www, host, path, slash, params, frag: (
        scheme
        + www
        + host
        + "/"
        + path
        + ("/" if slash else "")
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    scheme=st.sampled_from(["https://", "HTTPS://", "http://", "HtTpS://"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,8}\.(com|net|example)", fullmatch=True),
    path=st.from_regex(r"[A-Za-z0-9/._-]{0,12}", fullmatch=True),
    slash=st.booleans(),
    params=st.lists(
        st.one_of(
            st.from_regex(r"utm_[a-z]{1,6}=[A-Za-z0-9]{0,6}", fullmatch=True),
            st.from_regex(r"[a-su-z][a-z0-9]{0,5}=[A-Za-z0-9]{0,6}", fullmatch=True),
        ),
        max_size=4,
    ),
    frag=st.from_regex(r"[A-Za-z0-9]{0,8}", fullmatch=True),
)


@settings(max_examples=300, derandomize=True)
@given(url=url_strategy)
def test_normalize_urls_properties(url):
    from simple_content_ocr_ray.pipelines.extract_queries import normalize_urls

    out = normalize_urls(pd.Series([url], dtype="object")).iloc[0]
    # idempotent
    assert normalize_urls(pd.Series([out], dtype="object")).iloc[0] == out
    # no fragment, no tracking params, no trailing separators survive
    assert "#" not in out
    assert "utm_" not in out.split("?")[0] + ("?" + out.split("?", 1)[1] if "?" in out else "")
    assert not out.endswith(("?", "&", "/"))
    # scheme+host lowercased, www stripped on https
    prefix = out.split("/", 3)
    assert prefix[0] in ("https:", "http:")
    host = prefix[2].split("?")[0]
    assert host == host.lower()
    assert not (prefix[0] == "https:" and host.startswith("www."))


@given(st.integers(min_value=0, max_value=3000))
@settings(max_examples=200, deadline=None)
def test_doc_chunks_window_math_covers_every_word(n):
    """For any word count, the chunk-count formula yields windows that cover
    every word index, start every CHUNK_STRIDE, never produce an empty or
    over-long chunk, and only the last chunk may be short."""
    import math

    from simple_content_ocr_ray.pipelines.train_feed import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    n_chunks = 1 if n <= CHUNK_SIZE else math.ceil((n - CHUNK_SIZE) / CHUNK_STRIDE) + 1
    spans = []
    for i in range(n_chunks):
        s = i * CHUNK_STRIDE
        e = min(s + CHUNK_SIZE, max(n, 1) if n == 0 else n)
        spans.append((s, e))
    # every chunk is non-empty (n=0 still yields the one [''] chunk upstream)
    if n > 0:
        assert all(e > s for s, e in spans)
        # full coverage, in order, with bounded width
        assert spans[0][0] == 0 and spans[-1][1] == n
        assert all(e - s <= CHUNK_SIZE for s, e in spans)
        # consecutive chunks overlap by CHUNK_SIZE - CHUNK_STRIDE (or touch the tail)
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + CHUNK_STRIDE
            assert s2 < e1  # genuine overlap
        # no word skipped between windows
        covered = set()
        for s, e in spans:
            covered.update(range(s, e))
        assert covered == set(range(n))
    # a chunk before the last is always full-size
    for s, e in spans[:-1]:
        assert e - s == CHUNK_SIZE

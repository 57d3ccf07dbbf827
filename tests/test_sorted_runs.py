"""map_sorted_runs: the r4 replacement for per-group ``map_groups`` on the
dedup/window LARGE paths.

Two things are pinned here:

1. the INVARIANT the helper builds on — after ``sort(key)`` equal keys never
   span a block, even under a forced-tiny ``target_max_block_size`` and a
   pathologically hot key (range partitioning assigns partitions by VALUE);
2. forced-large-path equality for the operators that switched to it
   (user_sessions / daily_bounce_rate here; the rest have forced-path tests
   in test_seq_transitions.py / test_relational_extra.py / test_dedup.py).
"""

from __future__ import annotations

import numpy as np
import pytest
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_sorted_runs_keys_never_span_blocks():
    from ray.data import DataContext

    from simple_content_ocr_ray.functions.agg import map_sorted_runs

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # force many small blocks
        rng = np.random.default_rng(0)
        # one hot key (30k rows, >> block size) + 20k near-singletons
        keys = np.concatenate(
            [np.zeros(30_000, dtype=np.int64), rng.integers(1, 8_000, 20_000)]
        )
        df = pd.DataFrame(
            {"k": keys, "v": np.arange(len(keys)), "pad": ["x" * 40] * len(keys)}
        )

        def block_keys(b: pd.DataFrame) -> pd.DataFrame:
            ks = pd.unique(b["k"])
            return pd.DataFrame({"k": ks, "n_rows": [len(b)] * len(ks)})

        out = map_sorted_runs(
            rd.from_pandas(df).repartition(16), "k", block_keys
        ).to_pandas()
        per_key_blocks = out.groupby("k").size()
        assert int(per_key_blocks.max()) == 1, "a key spanned two blocks"
        assert out["n_rows"].nunique() > 1  # really was multiple blocks
    finally:
        ctx.target_max_block_size = old


def test_sorted_runs_runs_are_contiguous_and_complete():
    """Inside each block, rows of one key are contiguous after the caller's
    in-block sort, and every key's FULL row set is present (sum check)."""
    from simple_content_ocr_ray.functions.agg import map_sorted_runs

    rng = np.random.default_rng(1)
    keys = rng.integers(0, 500, 50_000)
    df = pd.DataFrame({"k": keys, "v": rng.integers(0, 100, len(keys))})
    expected = df.groupby("k", as_index=False)["v"].sum()

    def per_run_sums(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("k", kind="mergesort")
        return b.groupby("k", as_index=False)["v"].sum()

    got = (
        map_sorted_runs(rd.from_pandas(df).repartition(8), "k", per_run_sums)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # if a key spanned blocks it would appear twice with partial sums
    pd.testing.assert_frame_equal(got, expected.sort_values("k").reset_index(drop=True))


def test_user_sessions_forced_large_path_equals_small():
    from simple_content_ocr_ray.functions.window import user_sessions

    small = user_sessions(SF)
    large = user_sessions(SF, small_threshold=0)
    key = ["user_id", "session_start", "session_end", "n_events"]
    pd.testing.assert_frame_equal(
        small.sort_values(key).reset_index(drop=True),
        large.sort_values(key).reset_index(drop=True),
    )


def test_daily_bounce_rate_matches_sessions():
    """daily_bounce_rate always takes the keyed-shuffle path; cross-check it
    against the session table computed independently."""
    from simple_content_ocr_ray.functions.window import (
        daily_bounce_rate,
        user_sessions,
    )

    sess = user_sessions(SF)
    day = sess["session_start"].dt.floor("D")
    exp = (
        pd.DataFrame({"day": day, "bounce": (sess["n_events"] == 1).astype("int64")})
        .groupby("day", as_index=False)
        .agg(n_sessions=("bounce", "size"), n_bounce=("bounce", "sum"))
    )
    got = daily_bounce_rate(SF)
    merged = got.merge(exp, on="day", suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["n_sessions"] == merged["n_sessions_exp"]).all()
    assert (merged["n_bounce"] == merged["n_bounce_exp"]).all()


# --------------------------------------------------------------------------
# r5: self-defending guard — correctness no longer rests on the invariant
# --------------------------------------------------------------------------


def _make_sum_runs():
    """Per-run aggregate that is WRONG if a key's rows are split across
    blocks (each fragment would emit its own partial row). Returned as a
    closure so Ray workers pickle it by value (the test module is not
    importable inside workers)."""

    def _sum_runs(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        return b.groupby("k", as_index=False)["v"].sum()

    return _sum_runs


def _split_run_dataset():
    """Hand-built 'sorted' layout violating the invariant: key 5's run is
    split across two blocks (and key 9 across blocks 2/3)."""
    b1 = pd.DataFrame({"k": [1, 2, 5, 5], "v": [10, 20, 1, 2]})
    b2 = pd.DataFrame({"k": [5, 5, 7, 9], "v": [4, 8, 70, 16]})
    b3 = pd.DataFrame({"k": [9, 11], "v": [32, 110]})
    return rd.from_pandas([b1, b2, b3])


def test_guard_repairs_split_key_runs():
    from simple_content_ocr_ray.functions.agg import _map_runs_guarded

    out = (
        _map_runs_guarded(_split_run_dataset(), "k", _make_sum_runs())
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expected = pd.DataFrame(
        {"k": [1, 2, 5, 7, 9, 11], "v": [10, 20, 15, 70, 48, 110]}
    )
    pd.testing.assert_frame_equal(
        out.astype({"k": "int64", "v": "int64"}), expected
    )
    # each key appears exactly once — no partial fragments leaked through
    assert out["k"].is_unique


def test_guard_fast_path_when_ranges_disjoint():
    """Disjoint block ranges (the real Ray 2.49 shape) take the historical
    one-pass fast path and produce identical results."""
    from simple_content_ocr_ray.functions.agg import _map_runs_guarded

    b1 = pd.DataFrame({"k": [1, 1, 2], "v": [1, 2, 3]})
    b2 = pd.DataFrame({"k": [3, 4, 4], "v": [4, 5, 6]})
    out = (
        _map_runs_guarded(rd.from_pandas([b1, b2]), "k", _make_sum_runs())
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expected = pd.DataFrame({"k": [1, 2, 3, 4], "v": [3, 3, 4, 11]})
    pd.testing.assert_frame_equal(
        out.astype({"k": "int64", "v": "int64"}), expected
    )


def test_guard_typed_error_above_repair_ceiling(monkeypatch):
    from simple_content_ocr_ray.functions import agg as agg_mod

    monkeypatch.setattr(agg_mod, "_SPAN_REPAIR_MAX_ROWS", 2)
    with pytest.raises(agg_mod.SortedRunsInvariantError):
        agg_mod._map_runs_guarded(_split_run_dataset(), "k", _make_sum_runs())


def test_guard_string_keys_spanning():
    """String-typed keys exercise the object-dtype overlap check."""
    from simple_content_ocr_ray.functions.agg import _map_runs_guarded

    b1 = pd.DataFrame({"k": ["a", "b", "b"], "v": [1, 2, 3]})
    b2 = pd.DataFrame({"k": ["b", "c"], "v": [5, 7]})
    out = (
        _map_runs_guarded(rd.from_pandas([b1, b2]), "k", _make_sum_runs())
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == ["a", "b", "c"]
    assert list(out["v"]) == [1, 10, 7]

"""Sharded inverted-index layout (r4, sources/inverted_index.py)."""

import os

import duckdb
import pytest

from simple_content_ocr_ray.sources.inverted_index import (
    N_SHARDS,
    build_inverted_index,
    index_lookup,
    inverted_index_lookup,
    token_shard,
)

SF = "/root/testdata/sf0.001"


def test_token_shard_deterministic_and_spread():
    assert token_shard("scan") == token_shard("scan")
    shards = {token_shard(f"tok{i}") for i in range(200)}
    assert shards == set(range(N_SHARDS))  # 200 tokens cover all 16 shards


def test_build_and_pruned_lookup(ray_session, tmp_path):
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = str(tmp_path / "idx")
    build_inverted_index(docs, out)
    # hive layout exists; the small synth vocabulary spreads over most shards
    shards = sorted(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("shard=")
    )
    assert len(shards) >= N_SHARDS // 2
    assert all(0 <= s < N_SHARDS for s in shards)
    # lookup touches only the probed term's shard and returns its postings
    got = index_lookup(out, ["scan"]).to_pandas()
    assert (got["token"] == "scan").all()
    exp = duckdb.sql(
        f"""SELECT COUNT(DISTINCT doc_id) d, COUNT(*) n FROM (
             SELECT doc_id, unnest(string_split(text,' ')) t
             FROM '{os.path.join(SF, "documents.parquet")}') WHERE t='scan'"""
    ).fetchone()
    assert len(got) == exp[0]          # one posting row per doc
    assert int(got["tf"].sum()) == exp[1]  # tf sums to occurrences


def test_missing_term_returns_empty(ray_session, tmp_path):
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = str(tmp_path / "idx2")
    build_inverted_index(docs, out)
    assert index_lookup(out, ["xyzzy-missing"]).count() == 0


def test_query_misses_are_absent_not_zero(ray_session):
    got = inverted_index_lookup(SF)
    assert "xyzzy-missing" not in set(got["token"])
    assert set(got["token"]) == {"scan", "window", "merge"}


def test_phrase_lookup_matches_string_scan(ray_session, tmp_path):
    """Positional intersection equals a direct regex scan of the text."""
    import re

    import duckdb
    import ray.data as rd

    from simple_content_ocr_ray.sources.inverted_index import (
        build_positional_index,
        phrase_lookup,
    )

    docs_path = os.path.join(SF, "documents.parquet")
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    out = str(tmp_path / "pidx")
    build_positional_index(docs, out)
    got = phrase_lookup(out, ("key", "order"))
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{docs_path}' ORDER BY doc_id"
    ).df()
    expected = {}
    for d, t in zip(texts["doc_id"], texts["text"]):
        toks = t.split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "key" and toks[i + 1] == "order"
        )
        if n:
            expected[int(d)] = n
    assert dict(zip(got["doc_id"], got["n_matches"])) == expected
    assert re.search(r"\bkey order\b", " ".join(texts["text"])) is not None


def test_phrase_lookup_missing_term_empty(ray_session, tmp_path):
    import ray.data as rd

    from simple_content_ocr_ray.sources.inverted_index import (
        build_positional_index,
        phrase_lookup,
    )

    docs = rd.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = str(tmp_path / "pidx2")
    build_positional_index(docs, out)
    assert len(phrase_lookup(out, ("key", "qzx-none"))) == 0

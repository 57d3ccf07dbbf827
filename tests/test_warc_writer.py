"""write_warc → read_pages_from_warc roundtrip: the distributed WARC sink
must reproduce every payload byte-identically per url through the repo's
own reader, including adversarial payloads that look like WARC/HTTP
framing."""

from __future__ import annotations

import glob
import gzip
import os

import pandas as pd
import pytest
import ray.data as rd

from simple_content_ocr_ray.sources.readers import read_pages_from_warc, write_warc

ADVERSARIAL = [
    b"",
    b"plain ascii",
    b"\x00\x01\xff binary \x1f\x8b not-gzip",
    b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record\r\n\r\n",
    b"HTTP/1.1 200 OK\r\n\r\nfake inner response",
    b"line\r\n\r\nwith blank\r\n\r\nlines",
    "unicode é中文".encode("utf-8"),
    b"x" * 70_000,  # bigger than one gzip flush window
]


@pytest.fixture()
def pages_df():
    rows = []
    for i, body in enumerate(ADVERSARIAL * 3):
        rows.append(
            {
                "url": f"https://host{i % 4}.example/p/{i}",
                "warc_ts": pd.Timestamp("2026-03-01 12:00:00") + pd.Timedelta(seconds=i),
                "html": body,
            }
        )
    return pd.DataFrame(rows)


def test_warc_roundtrip_byte_identical(ray_session, tmp_path, pages_df):
    out = str(tmp_path / "warc")
    manifest = write_warc(rd.from_pandas(pages_df, override_num_blocks=3), out)
    assert manifest["n_records"].sum() == len(pages_df)
    assert len(manifest) == len(glob.glob(os.path.join(out, "*.warc.gz")))

    back = read_pages_from_warc(sorted(glob.glob(os.path.join(out, "*.warc.gz")))).to_pandas()
    assert len(back) == len(pages_df)
    got = dict(zip(back["url"], back["html"]))
    for _, r in pages_df.iterrows():
        assert bytes(got[r["url"]]) == bytes(r["html"]), r["url"]
    # timestamps survive at second precision
    ts = dict(zip(back["url"], back["warc_ts"]))
    for _, r in pages_df.iterrows():
        assert ts[r["url"]] == r["warc_ts"]


def test_warc_shards_are_own_member_gzip(ray_session, tmp_path, pages_df):
    out = str(tmp_path / "warc")
    write_warc(rd.from_pandas(pages_df, override_num_blocks=2), out)
    shard = sorted(glob.glob(os.path.join(out, "*.warc.gz")))[0]
    raw = open(shard, "rb").read()
    # multi-member framing: decompressing only the FIRST member yields one
    # whole record, not the whole shard
    first = gzip.decompress(raw[: raw.index(b"\x1f\x8b", 2) if raw.count(b"\x1f\x8b") > 1 else len(raw)])
    assert first.startswith(b"WARC/1.0\r\n")
    assert first.count(b"WARC-Target-URI:") == 1


def test_warc_rewrite_is_idempotent(ray_session, tmp_path, pages_df):
    out = str(tmp_path / "warc")
    ds = rd.from_pandas(pages_df, override_num_blocks=3)
    write_warc(ds, out)
    names1 = sorted(os.listdir(out))
    write_warc(rd.from_pandas(pages_df, override_num_blocks=3), out)
    assert sorted(os.listdir(out)) == names1


def test_warc_drops_null_payloads(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://a.example/2"],
            "warc_ts": [pd.Timestamp("2026-01-01")] * 2,
            "html": [b"keep", None],
        }
    )
    out = str(tmp_path / "warc")
    manifest = write_warc(rd.from_pandas(df), out)
    assert manifest["n_records"].sum() == 1
    back = read_pages_from_warc(sorted(glob.glob(os.path.join(out, "*.warc.gz")))).to_pandas()
    assert list(back["url"]) == ["https://a.example/1"]


def test_jsonl_roundtrip(ray_session, tmp_path, pages_df):
    """write_jsonl shards round-trip byte-identically through
    read_pages_from_jsonl (gzip and plain)."""
    import glob

    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_jsonl,
        write_jsonl,
    )

    for comp, pat in (("gzip", "*.jsonl.gz"), (None, "*.jsonl")):
        out = str(tmp_path / f"jsonl_{comp}")
        manifest = write_jsonl(
            rd.from_pandas(pages_df, override_num_blocks=3), out, compression=comp
        )
        assert manifest["n_records"].sum() == len(pages_df)
        back = read_pages_from_jsonl(
            sorted(glob.glob(os.path.join(out, pat))), compression=comp
        ).to_pandas()
        assert len(back) == len(pages_df)
        got = dict(zip(back["url"], back["html"]))
        for _, r in pages_df.iterrows():
            assert bytes(got[r["url"]]) == bytes(r["html"])
        ts = dict(zip(back["url"], back["warc_ts"]))
        for _, r in pages_df.iterrows():
            assert ts[r["url"]] == r["warc_ts"]


def test_ipc_roundtrip_byte_identical(ray_session, tmp_path, pages_df):
    """write_ipc shards (Arrow RecordBatchFile) round-trip byte- and
    timestamp-exact through read_pages_from_ipc — no base64, no parsing."""
    import glob

    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_ipc,
        write_ipc,
    )

    df = pages_df.copy()
    df["text"] = [f"text {i}" for i in range(len(df))]
    df["lang"] = ["en", "de", "zh"] * (len(df) // 3) + ["en"] * (len(df) % 3)
    out = str(tmp_path / "ipc")
    manifest = write_ipc(rd.from_pandas(df, override_num_blocks=3), out)
    assert manifest["n_records"].sum() == len(df)
    shards = sorted(glob.glob(os.path.join(out, "*.arrow")))
    assert len(manifest) == len(shards)

    back = read_pages_from_ipc(shards).to_pandas()
    assert len(back) == len(df)
    got = back.set_index("url")
    for _, r in df.iterrows():
        assert bytes(got.loc[r["url"], "html"]) == bytes(r["html"])
        assert got.loc[r["url"], "warc_ts"] == r["warc_ts"]  # µs fidelity
        assert got.loc[r["url"], "text"] == r["text"]
        assert got.loc[r["url"], "lang"] == r["lang"]


def test_ipc_rewrite_is_idempotent(ray_session, tmp_path, pages_df):
    from simple_content_ocr_ray.sources.readers import write_ipc

    out = str(tmp_path / "ipc")
    write_ipc(rd.from_pandas(pages_df, override_num_blocks=2), out)
    names1 = sorted(os.listdir(out))
    write_ipc(rd.from_pandas(pages_df, override_num_blocks=2), out)
    assert sorted(os.listdir(out)) == names1


def test_warc_revisit_roundtrip(ray_session, tmp_path):
    """revisit_dupes=True: duplicate payloads in a shard become body-less
    revisit records; the reader resolves them back byte-identically and
    the deduped shard is smaller than the plain one."""
    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_warc,
        write_warc,
    )

    big = b"<html>" + b"x" * 5000 + b"</html>"
    df = pd.DataFrame(
        {
            "url": [f"https://a.example/{i}" for i in range(6)],
            "warc_ts": [pd.Timestamp("2026-03-01 12:00:00")] * 6,
            # rows 0/2/4 share one payload, 1/5 another, 3 unique
            "html": [big, b"two", big, b"three", big, b"two"],
        }
    )
    plain_dir, dedup_dir = str(tmp_path / "plain"), str(tmp_path / "dedup")
    write_warc(rd.from_pandas(df, override_num_blocks=1), plain_dir)
    write_warc(
        rd.from_pandas(df, override_num_blocks=1), dedup_dir, revisit_dupes=True
    )
    p_sz = sum(os.path.getsize(os.path.join(plain_dir, f)) for f in os.listdir(plain_dir))
    d_sz = sum(os.path.getsize(os.path.join(dedup_dir, f)) for f in os.listdir(dedup_dir))
    assert d_sz < p_sz  # two big payload repeats elided

    back = read_pages_from_warc(
        sorted(glob.glob(os.path.join(dedup_dir, "*.warc.gz")))
    ).to_pandas()
    assert len(back) == 6
    got = dict(zip(back["url"], back["html"]))
    for _, r in df.iterrows():
        assert bytes(got[r["url"]]) == bytes(r["html"]), r["url"]


def test_warc_revisit_unresolvable_is_skipped(ray_session, tmp_path):
    """A revisit whose referent is in ANOTHER shard cannot resolve from
    this file alone and is skipped, not emitted as an empty page."""
    from simple_content_ocr_ray.sources.readers import (
        make_warc_gz,
        read_pages_from_warc,
    )

    raw = make_warc_gz(
        [
            {"type": "response", "url": "https://a/1", "date": "2026-01-01T00:00:00Z", "body": b"hello"},
            {"type": "revisit", "url": "https://a/2", "date": "2026-01-01T00:00:00Z", "body": b""},
        ]
    )
    p = tmp_path / "x.warc.gz"
    p.write_bytes(raw)
    back = read_pages_from_warc(str(p)).to_pandas()
    assert list(back["url"]) == ["https://a/1"]

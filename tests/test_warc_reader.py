"""Real-WARC reader (sources/readers.py:read_pages_from_warc): multi-member
gzip framing, WARC-Type routing, HTTP envelope stripping (status filter,
chunked, content-encoding), and charset integration end-to-end."""

from __future__ import annotations

import pandas as pd

from simple_content_ocr_ray.sources.readers import (
    make_warc_gz,
    read_pages_from_warc,
)

_HTML_A = b"<!doctype html><html><body><p>alpha page</p></body></html>"
_HTML_B = b"<!doctype html><html><body><p>beta page</p></body></html>"


def _records() -> list[dict]:
    return [
        {"type": "warcinfo", "url": "", "body": b"software: testgen\r\n"},
        {"type": "request", "url": "https://a.example/1",
         "body": b"GET /1 HTTP/1.1\r\nHost: a.example\r\n\r\n"},
        {"type": "response", "url": "https://a.example/1",
         "date": "2024-03-05T12:00:00Z", "body": _HTML_A},
        {"type": "metadata", "url": "https://a.example/1",
         "body": b"fetchTimeMs: 12\r\n"},
        {"type": "response", "url": "https://a.example/404",
         "status": 404, "body": b"<html>not found</html>"},
        {"type": "response", "url": "https://a.example/chunked",
         "chunked": True, "body": _HTML_B},
        {"type": "response", "url": "https://a.example/gzipped",
         "gzip_body": True, "body": _HTML_A},
        {"type": "resource", "url": "https://a.example/raw.bin",
         "body": b"\x00rawresource\xff"},
    ]


def _read(tmp_path, gz: bool) -> pd.DataFrame:
    name = "seg.warc.gz" if gz else "seg.warc"
    p = tmp_path / name
    p.write_bytes(make_warc_gz(_records(), gzip_members=gz))
    return (
        read_pages_from_warc(str(p))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_warc_gz_multi_member_roundtrip(ray_session, tmp_path):
    df = _read(tmp_path, gz=True)
    # only response(2xx) + resource records become pages
    assert list(df["url"]) == [
        "https://a.example/1",
        "https://a.example/chunked",
        "https://a.example/gzipped",
        "https://a.example/raw.bin",
    ]
    by_url = {r["url"]: r for _, r in df.iterrows()}
    assert bytes(by_url["https://a.example/1"]["html"]) == _HTML_A
    assert bytes(by_url["https://a.example/chunked"]["html"]) == _HTML_B
    assert bytes(by_url["https://a.example/gzipped"]["html"]) == _HTML_A
    assert bytes(by_url["https://a.example/raw.bin"]["html"]) == b"\x00rawresource\xff"
    assert by_url["https://a.example/1"]["warc_ts"] == pd.Timestamp(
        "2024-03-05T12:00:00"
    )


def test_plain_warc_equals_gz(ray_session, tmp_path):
    gz = _read(tmp_path, gz=True)
    plain = _read(tmp_path, gz=False)
    assert gz.drop(columns=["html"]).equals(plain.drop(columns=["html"]))
    assert all(bytes(a) == bytes(b) for a, b in zip(gz["html"], plain["html"]))


def test_warc_through_extraction_with_legacy_charset(ray_session, tmp_path):
    """A cp1251 page read from a .warc.gz extracts real Cyrillic text —
    reader envelope stripping + charset sniffing compose."""
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    ru = "Привет мир из архива"
    page = (
        '<!doctype html><html><head><meta charset="windows-1251"></head>'
        f"<body><article><p>{ru}</p></article></body></html>"
    ).encode("cp1251")
    p = tmp_path / "ru.warc.gz"
    p.write_bytes(
        make_warc_gz(
            [{"type": "response", "url": "https://ru.example/1", "body": page}]
        )
    )
    out = extraction_pipeline(read_pages_from_warc(str(p))).to_pandas()
    assert list(out["status"]) == ["completed"]
    assert ru in out["text"].iloc[0]


def test_many_member_gz_streams_all_records(ray_session, tmp_path):
    """200 gzip members decompress one at a time (bounded heap) and every
    record survives — pins the member-boundary consumed math."""
    recs = [
        {"type": "response", "url": f"https://m.example/{i:04d}",
         "body": f"<!doctype html><p>rec {i}</p>".encode()}
        for i in range(200)
    ]
    p = tmp_path / "many.warc.gz"
    p.write_bytes(make_warc_gz(recs, gzip_members=True))
    df = read_pages_from_warc(str(p)).to_pandas().sort_values("url")
    assert len(df) == 200
    assert bytes(df["html"].iloc[7]) == b"<!doctype html><p>rec 7</p>"


def test_single_member_whole_file_gz(ray_session, tmp_path):
    """Some writers gzip the whole WARC as ONE member — still parses."""
    import gzip

    raw = make_warc_gz(_records(), gzip_members=False)
    p = tmp_path / "single.warc.gz"
    p.write_bytes(gzip.compress(raw))
    df = read_pages_from_warc(str(p)).to_pandas()
    assert len(df) == 4


def test_malformed_record_costs_one_record_not_the_file():
    """A damaged Content-Length or WARC-Date in one record must not raise
    out of the read task — later records still parse."""
    from simple_content_ocr_ray.sources.readers import _iter_warc_records

    def rec(url, body, *, clen=None, date=b"2024-03-01T00:00:00Z"):
        n = str(len(body)).encode() if clen is None else clen
        return (
            b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "
            + url + b"\r\nWARC-Date: " + date + b"\r\nContent-Length: "
            + n + b"\r\n\r\n" + body
        )

    buf = (
        rec(b"http://bad-len", b"x" * 10, clen=b"1,0")
        + rec(b"http://bad-date", b"y" * 5, date=b"not-a-date")
        + rec(b"http://ok", b"z" * 5)
    )
    got = list(_iter_warc_records(buf))
    urls = [h["warc-target-uri"] for h, _ in got]
    assert "http://ok" in urls and "http://bad-date" in urls
    assert "http://bad-len" not in urls


def test_gzip_stream_walk_is_linear_and_salvages_truncation():
    """The .warc.gz walk must not quadratically re-copy the tail per gzip
    member, and a truncated final member keeps the records before it."""
    import gzip
    import time

    from simple_content_ocr_ray.sources.readers import (
        _gzip_chunks,
        _iter_warc_records_stream,
    )

    body = b"payload"
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: http://a\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    member = gzip.compress(rec)

    def walk(k):
        t0 = time.perf_counter()
        cnt = sum(1 for _ in _iter_warc_records_stream(_gzip_chunks(member * k)))
        return cnt, time.perf_counter() - t0

    c1, t1 = walk(5000)
    c2, t2 = walk(20000)
    assert (c1, c2) == (5000, 20000)
    # 4x the members: quadratic would be ~16x; allow generous noise
    assert t2 < t1 * 10

    # truncated final member: whole earlier records survive
    trunc = member * 3 + member[: len(member) // 2]
    cnt = sum(1 for _ in _iter_warc_records_stream(_gzip_chunks(trunc)))
    assert cnt == 3


def test_record_spanning_gzip_chunk_boundaries():
    """One record larger than the decompression chunk must reassemble."""
    from simple_content_ocr_ray.sources.readers import _iter_warc_records_stream

    body = b"z" * (3 << 20)
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: http://big\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    chunks = [rec[i : i + 65536] for i in range(0, len(rec), 65536)]
    got = list(_iter_warc_records_stream(iter(chunks)))
    assert len(got) == 1 and got[0][1] == body


def test_http_envelope_bad_gzip_body_keeps_raw_bytes():
    """Truncated/corrupt Content-Encoding: gzip bodies (EOFError /
    zlib.error, not just OSError) degrade to raw bytes, never a task
    crash."""
    import gzip

    from simple_content_ocr_ray.sources.readers import _strip_http_envelope

    good = gzip.compress(b"hello")
    flipped = bytearray(good)
    flipped[12] ^= 0xFF  # corrupt the deflate data mid-stream
    for bad in (good[: len(good) // 2], bytes(flipped)):
        block = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bad
        )
        got = _strip_http_envelope(block)
        assert got is not None and got[0] == bad  # raw bytes kept


def test_wet_export_roundtrip(ray_session, tmp_path):
    """Extracted text -> .warc.wet.gz conversion records -> read back:
    texts, urls and timestamps survive byte-exactly, and the shard write
    is idempotent (content-addressed names, atomic rename)."""
    import pandas as pd
    import ray.data as rd

    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_warc,
        write_wet,
    )

    rows = pd.DataFrame(
        {
            "url": [f"https://w.example/{i:04d}" for i in range(50)],
            "text": [f"doc {i} text with unicode é{i}" for i in range(50)],
            "warc_ts": pd.to_datetime(
                [1_700_000_000 + i for i in range(50)], unit="s"
            ),
        }
    )
    out = tmp_path / "wet"
    manifest = write_wet(
        rd.from_pandas(rows), str(out), ts_col="warc_ts"
    )
    assert manifest["n_records"].sum() == 50
    assert all(p.endswith(".warc.wet.gz") for p in manifest["path"])

    back = (
        read_pages_from_warc([str(out)])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(back) == 50
    texts = [b.decode("utf-8") for b in back["html"]]
    assert texts == list(rows["text"])
    assert list(back["url"]) == list(rows["url"])
    assert list(back["warc_ts"]) == list(rows["warc_ts"])

    # idempotence: re-running writes the same shard names, no torn files
    manifest2 = write_wet(rd.from_pandas(rows), str(out), ts_col="warc_ts")
    assert sorted(manifest2["path"]) == sorted(manifest["path"])
    assert not any(f.name.endswith(".tmp") for f in out.iterdir())


def test_wet_roundtrip_adversarial_texts(ray_session, tmp_path):
    """Texts containing WARC header lookalikes, bare CRLF runs, and
    non-BMP unicode survive the WET roundtrip byte-exactly — the reader
    walks Content-Length offsets, so embedded framing bytes are data."""
    import pandas as pd
    import ray.data as rd

    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_warc,
        write_wet,
    )

    texts = [
        "WARC/1.0\r\nContent-Length: 4\r\n\r\nfake",  # embedded record
        "plain",
        "\r\n\r\n\r\n",  # separator runs
        "emoji 🜁🜂 and CJK 汉字 and é",
        "",  # empty document
        "trailing newline\n",
    ]
    rows = pd.DataFrame(
        {
            "url": [f"https://adv.example/{i}" for i in range(len(texts))],
            "text": texts,
        }
    )
    out = tmp_path / "advwet"
    write_wet(rd.from_pandas(rows), str(out))
    back = (
        read_pages_from_warc([str(out)])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(back) == len(texts)
    got = {u: b.decode("utf-8") for u, b in zip(back["url"], back["html"])}
    for u, t in zip(rows["url"], rows["text"]):
        assert got[u] == t, u


def test_wet_timestamps_roundtrip_microseconds_and_tz(ray_session, tmp_path):
    """Microsecond precision survives, tz-aware timestamps are converted
    to true UTC before the Z label, and missing text rows are dropped."""
    import pandas as pd
    import ray.data as rd

    from simple_content_ocr_ray.sources.readers import (
        read_pages_from_warc,
        write_wet,
    )

    rows = pd.DataFrame(
        {
            "url": ["https://t.example/a", "https://t.example/b",
                    "https://t.example/c"],
            "text": ["micro", "zoned", None],
            "warc_ts": [
                pd.Timestamp("2024-03-01 12:00:00.123456"),
                pd.Timestamp("2024-03-01 14:30:00+02:00"),
                pd.Timestamp("2024-03-01 00:00:00"),
            ],
        }
    )
    out = tmp_path / "tswet"
    manifest = write_wet(rd.from_pandas(rows), str(out), ts_col="warc_ts")
    assert manifest["n_records"].sum() == 2  # None-text row dropped
    back = read_pages_from_warc([str(out)]).to_pandas().sort_values("url")
    assert list(back["warc_ts"]) == [
        pd.Timestamp("2024-03-01 12:00:00.123456"),
        pd.Timestamp("2024-03-01 12:30:00"),  # 14:30+02:00 == 12:30 UTC
    ]


def test_cli_wet_export_end_to_end(ray_session, capsys):
    """extract --wet-out through the real CLI: summary carries shard and
    record counts, and the export equals the completed-row count."""
    import json
    import shutil

    from simple_content_ocr_ray.__main__ import main
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages = synth_pages_parquet("/root/testdata/sf0.001", real_payloads=True)
    shutil.rmtree("/tmp/cli_wet_e2e", ignore_errors=True)
    rc = main(
        [
            "extract", pages, "/tmp/cli_wet_e2e/out",
            "--wet-out", "/tmp/cli_wet_e2e/wet",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["wet_records"] == 475  # 500 - 25 garbage failures
    assert summary["wet_shards"] >= 1

    # rejected combination: skew layout holds page rows, not documents
    rc = main(
        [
            "extract", pages, "/tmp/cli_wet_e2e/out2",
            "--split-skew", "--wet-out", "/tmp/cli_wet_e2e/wet2",
        ]
    )
    assert rc == 2

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

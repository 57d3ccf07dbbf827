"""WAT sidecar export/index tests (sources/readers.py: write_wat /
read_wat_index)."""

import gzip
import json
import os

import pandas as pd
import ray.data as rd

from simple_content_ocr_ray.sources.readers import (
    _html_metadata,
    read_wat_index,
    write_wat,
)

HTML = (
    b"<!doctype html>\n"
    b'<html lang="fr">\n<head>\n<title>T1</title>\n'
    b'<meta charset="utf-8">\n<meta name="robots" content="noindex">\n'
    b'</head>\n<body><a href="/a">a</a> <a href="/b">b</a></body></html>\n'
)


def _pages(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_html_metadata_fields():
    m = _html_metadata(HTML)
    assert m["Head"]["Title"] == "T1"
    assert m["Head"]["Lang"] == "fr"
    assert {"charset": "utf-8"} in m["Head"]["Metas"]
    assert {"name": "robots", "content": "noindex"} in m["Head"]["Metas"]
    assert [link["url"] for link in m["Links"]] == ["/a", "/b"]
    assert _html_metadata(b"%PDF-1.4 not html") is None


def test_wat_roundtrip_html_and_binary(tmp_path):
    out = str(tmp_path / "wat")
    pages = _pages(
        [
            {
                "url": "https://x.example/1",
                "warc_ts": pd.Timestamp("2024-03-01T12:00:00"),
                "html": HTML,
            },
            {
                "url": "https://x.example/2",
                "warc_ts": pd.Timestamp("2024-03-02T00:00:00.250000"),
                "html": b"\x89PNG\r\n\x1a\nbinarystuff",
            },
        ]
    )
    manifest = write_wat(pages, out)
    assert manifest["n_records"].sum() == 2
    assert all(p.endswith(".warc.wat.gz") for p in manifest["path"])

    idx = (
        read_wat_index(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(idx["url"]) == ["https://x.example/1", "https://x.example/2"]
    assert idx.loc[0, "title"] == "T1"
    assert idx.loc[0, "html_lang"] == "fr"
    assert idx.loc[0, "n_links"] == 2
    assert idx.loc[0, "payload_len"] == len(HTML)
    assert str(idx.loc[0, "warc_ts"]) == "2024-03-01 12:00:00"
    # the binary capture is a real row, not an error: null head, 0 links
    assert pd.isna(idx.loc[1, "title"]) and pd.isna(idx.loc[1, "html_lang"])
    assert idx.loc[1, "n_links"] == 0
    assert idx.loc[1, "payload_len"] == len(b"\x89PNG\r\n\x1a\nbinarystuff")
    # sub-second WARC-Date survives the roundtrip
    assert idx.loc[1, "warc_ts"].microsecond == 250000


def test_wat_envelope_is_valid_cc_shape(tmp_path):
    out = str(tmp_path / "wat")
    write_wat(
        _pages([{"url": "https://x.example/1", "warc_ts": None, "html": HTML}]),
        out,
        ts_col=None,
    )
    shard = os.path.join(out, os.listdir(out)[0])
    rec = gzip.decompress(open(shard, "rb").read())
    head, _, body = rec.partition(b"\r\n\r\n")
    assert b"WARC-Type: metadata" in head
    env = json.loads(body.rstrip(b"\r\n"))["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://x.example/1"
    assert env["WARC-Header-Metadata"]["Content-Length"] == str(len(HTML))
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Links"][0] == {"path": "A@/href", "url": "/a"}


def test_wat_damaged_record_costs_one_row(tmp_path):
    out = str(tmp_path / "wat")
    write_wat(
        _pages(
            [
                {"url": "https://x.example/1", "warc_ts": None, "html": HTML},
                {"url": "https://x.example/2", "warc_ts": None, "html": HTML},
            ]
        ),
        out,
        ts_col=None,
    )
    shard = os.path.join(out, os.listdir(out)[0])
    # corrupt the FIRST record's JSON body while keeping WARC framing valid
    import re
    import zlib

    members = []
    data = open(shard, "rb").read()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        members.append(d.decompress(data[pos:]))
        pos = len(data) - len(d.unused_data)
    bad_body = b"{not json"
    old_len = int(re.search(rb"Content-Length: (\d+)", members[0]).group(1))
    rec0 = members[0].replace(
        b"Content-Length: %d" % old_len, b"Content-Length: %d" % len(bad_body)
    )
    rec0 = rec0.partition(b"\r\n\r\n")[0] + b"\r\n\r\n" + bad_body + b"\r\n\r\n"
    with open(shard, "wb") as f:
        f.write(gzip.compress(rec0) + gzip.compress(members[1]))
    idx = read_wat_index(out).to_pandas()
    assert len(idx) == 1  # damaged record dropped, the good one survives
    assert idx.loc[0, "url"] == "https://x.example/2"


def test_wat_rerun_idempotent_shard_names(tmp_path):
    out = str(tmp_path / "wat")
    rows = [{"url": "https://x.example/1", "warc_ts": None, "html": HTML}]
    m1 = write_wat(_pages(rows), out, ts_col=None)
    m2 = write_wat(_pages(rows), out, ts_col=None)
    assert sorted(m1["path"]) == sorted(m2["path"])
    assert len(os.listdir(out)) == 1


def test_cli_wat_export_end_to_end(ray_session, capsys):
    """extract --wat-out through the real CLI: every input page gets a WAT
    record; the index parses HTML heads and carries binary captures too."""
    import json
    import shutil

    from simple_content_ocr_ray.__main__ import main
    from simple_content_ocr_ray.sources.synth_pages import synth_pages_parquet

    pages = synth_pages_parquet("/root/testdata/sf0.001", real_payloads=True)
    shutil.rmtree("/tmp/cli_wat_e2e", ignore_errors=True)
    rc = main(
        [
            "extract", pages, "/tmp/cli_wat_e2e/out",
            "--wat-out", "/tmp/cli_wat_e2e/wat",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["wat_records"] == 500  # WAT covers EVERY capture
    idx = read_wat_index("/tmp/cli_wat_e2e/wat").to_pandas()
    assert len(idx) == 500
    assert idx["title"].notna().sum() == 400  # html payload class
    assert (idx.loc[idx["title"].notna(), "n_links"] == 9).all()


# ---- adversarial / property coverage ----------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, derandomize=True, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_html_metadata_never_raises(payload):
    m = _html_metadata(payload)
    if m is not None:
        assert isinstance(m["Links"], list)
        assert all(set(l) == {"path", "url"} for l in m["Links"])


@settings(max_examples=100, derandomize=True, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1,
                max_size=40,
            ),
            st.text(min_size=0, max_size=80),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_wat_title_and_links_roundtrip_through_json(items):
    """Envelope build + parse is lossless for arbitrary link text (unicode,
    quotes-free hrefs per the writer's regex contract)."""
    hrefs = [u.replace('"', "") or "x" for u, _ in items]
    body = "".join(f'<a href="{u}">t</a>' for u in hrefs)
    title = items[0][1].replace("<", "").replace("\n", " ")
    html = f"<!doctype html><title>{title}</title>{body}".encode()
    m = _html_metadata(html)
    assert [l["url"] for l in m["Links"]] == hrefs
    if title:
        assert m["Head"].get("Title", "") == title


def test_wat_adversarial_payloads_roundtrip(tmp_path):
    """Payloads that look like WARC/HTTP headers or hold CRLF runs must not
    break record framing (each record is its own gzip member, length-framed)."""
    nasty = [
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake",
        b"\r\n\r\n\r\n\r\n",
        b"Content-Length: 99999\r\n\r\n" + b"A" * 100,
        "<!doctype html><title>café 中文</title>".encode(),
        b"",
    ]
    rows = [
        {"url": f"https://n.example/{i}", "warc_ts": None, "html": p}
        for i, p in enumerate(nasty)
    ]
    out = str(tmp_path / "wat")
    write_wat(_pages(rows), out, ts_col=None)
    idx = read_wat_index(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(idx) == len(nasty)
    assert list(idx["payload_len"]) == [len(p) for p in nasty]
    assert idx.loc[3, "title"] == "café 中文"


def test_wat_malformed_length_degrades_not_kills(tmp_path):
    out = str(tmp_path / "wat")
    write_wat(
        _pages([{"url": "https://x.example/1", "warc_ts": None, "html": HTML}]),
        out,
        ts_col=None,
    )
    shard = os.path.join(out, os.listdir(out)[0])
    rec = gzip.decompress(open(shard, "rb").read())
    head, _, tail = rec.partition(b"\r\n\r\n")
    body = tail.rstrip(b"\r\n")
    env = json.loads(body)
    env["Envelope"]["Payload-Metadata"]["Actual-Content-Length"] = "oops"
    new_body = json.dumps(env, sort_keys=True, separators=(",", ":")).encode()
    import re

    head = re.sub(
        rb"Content-Length: \d+", b"Content-Length: %d" % len(new_body), head
    )
    with open(shard, "wb") as f:
        f.write(gzip.compress(head + b"\r\n\r\n" + new_body + b"\r\n\r\n"))
    idx = read_wat_index(out).to_pandas()
    assert len(idx) == 1
    assert idx.loc[0, "payload_len"] == 0  # degraded, row survives
    assert idx.loc[0, "title"] == "T1"

"""RSS/Atom feed parsing: format round-trips, tolerance, e2e join."""

from datetime import datetime

from simple_content_ocr_ray.pipelines.extract_queries import (
    _FEED_PHANTOM_OFFSET,
    _FEED_STRIDES,
    feed_entries,
    make_feed,
    parse_feed,
)


def test_rss_roundtrip():
    entries = parse_feed(make_feed(0))  # even k → RSS 2.0
    assert len(entries) == len(_FEED_STRIDES) + 2  # + 2 phantoms
    e0 = entries[0]
    assert e0["url"] == "https://site0.example/00000000"
    assert e0["title"] == "Post 0"
    assert e0["published"] == datetime(2024, 1, 1, 0, 0, 0)
    assert e0["published"].tzinfo is None  # naive UTC


def test_atom_roundtrip():
    entries = parse_feed(make_feed(1))  # odd k → Atom
    assert len(entries) == len(_FEED_STRIDES) + 2
    e1 = entries[1]  # did = 1 + 97 = 98
    assert e1["url"] == "https://site1.example/00000098"
    assert e1["published"] == datetime(2024, 1, 5, 2, 0, 0)  # epoch + 98h


def test_malformed_feed_yields_empty():
    assert parse_feed(b"<rss><channel><item>") == []
    assert parse_feed(b"not xml at all") == []


def test_items_missing_fields_are_skipped():
    raw = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<item><title>no link</title><pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate></item>"
        b"<item><link>https://x.example/a</link></item>"
        b"<item><link>https://x.example/b</link>"
        b"<pubDate>garbage date</pubDate></item>"
        b"<item><link>https://x.example/ok</link>"
        b"<pubDate>Tue, 02 Jan 2024 03:00:00 +0000</pubDate></item>"
        b"</channel></rss>"
    )
    entries = parse_feed(raw)
    assert [e["url"] for e in entries] == ["https://x.example/ok"]


def test_timezone_normalized_to_utc():
    raw = (
        b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        b'<entry><title>t</title><link href="https://x.example/z"/>'
        b"<updated>2024-06-01T12:00:00+02:00</updated></entry></feed>"
    )
    (e,) = parse_feed(raw)
    assert e["published"] == datetime(2024, 6, 1, 10, 0, 0)


def test_naive_dates_mean_utc_not_machine_local():
    """RFC 5322 '-0000' and tz-less Atom <updated> parse as naive — the
    contract is UTC, never the worker's local timezone."""
    rss = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<item><title>t</title><link>https://x.example/a</link>"
        b"<pubDate>Mon, 01 Jan 2024 00:00:00 -0000</pubDate></item>"
        b"</channel></rss>"
    )
    (e,) = parse_feed(rss)
    assert e["published"] == datetime(2024, 1, 1, 0, 0, 0)
    atom = (
        b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        b'<entry><title>t</title><link href="https://x.example/b"/>'
        b"<updated>2024-01-01T00:00:00</updated></entry></feed>"
    )
    (e,) = parse_feed(atom)
    assert e["published"] == datetime(2024, 1, 1, 0, 0, 0)


def test_atom_rel_self_first_link_is_skipped():
    raw = (
        b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        b'<entry><title>t</title>'
        b'<link rel="self" href="https://x.example/entry.atom"/>'
        b'<link rel="alternate" href="https://x.example/post"/>'
        b"<updated>2024-06-01T12:00:00Z</updated></entry></feed>"
    )
    (e,) = parse_feed(raw)
    assert e["url"] == "https://x.example/post"


def test_feed_entries_join_actually_filters_phantoms(sf_dir):
    # phantoms now parse like real entries (clean 8-digit urls) — only the
    # crawl-membership join can drop them
    parsed = parse_feed(make_feed(0))
    phantom_ids = [
        int(e["url"].rsplit("/", 1)[1])
        for e in parsed
        if int(e["url"].rsplit("/", 1)[1]) >= _FEED_PHANTOM_OFFSET
    ]
    assert len(phantom_ids) == 2  # they parse; nothing drops them upstream

    out = feed_entries(sf_dir)
    assert (out["doc_id"] < _FEED_PHANTOM_OFFSET).all()
    assert set(out["fmt"]) == {"rss", "atom"}
    # every kept entry's doc exists in the corpus
    import os

    import pyarrow.parquet as pq

    docs = set(
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )["doc_id"].to_pylist()
    )
    assert set(out["doc_id"]) <= docs
    assert (out[out["fmt"] == "rss"]["domain"].str.extract(r"site(\d+)")[0].astype(int) % 2 == 0).all()

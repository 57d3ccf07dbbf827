"""Extraction behavior on realistic page shapes: div-soup layouts, comment
sections, CJK/RTL text, byte-exact UTF-8 round-trips through the full Ray
pipeline."""

import pyarrow as pa
import ray.data as rd

from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
from simple_content_ocr_ray.stages.html_extractor import HtmlMainContentExtractor

EX = HtmlMainContentExtractor()

REALISTIC = """<!doctype html>
<html lang="en"><head><title>Storm hits coast</title>
<script src="/t.js"></script><script>dataLayer.push({page:"article"});</script>
<style>.art p{line-height:1.6}</style></head>
<body>
<header><div class="logo">The Daily Record</div>
<nav><a href="/">News</a><a href="/sport">Sport</a><a href="/biz">Business</a>
<a href="/tech">Tech</a><a href="/life">Life</a></nav></header>
<div class="breadcrumbs"><a href="/">Home</a> &gt; <a href="/news">News</a></div>
<div class="layout">
<div class="main art">
<h1>Storm hits the northern coast overnight</h1>
<p>A severe storm swept the northern coastline overnight, bringing record
rainfall and winds of up to 120 km/h, local authorities said on Tuesday.</p>
<p>Emergency services responded to more than three hundred calls as falling
trees blocked roads and power lines came down across the region.</p>
<p>Officials expect cleanup operations to continue through the weekend, with
schools in two districts remaining closed until further notice.</p>
</div>
<div class="sidebar">
<div class="widget"><h3>Most read</h3><ul>
<li><a href="/a1">Markets rally on rate decision</a></li>
<li><a href="/a2">Local team wins derby</a></li>
<li><a href="/a3">New rail link approved</a></li>
<li><a href="/a4">Interview: the long road back</a></li></ul></div>
<div class="ad">Advertisement — subscribe today for unlimited access</div>
</div>
</div>
<div class="comments"><h3>Comments</h3>
<div class="comment"><a href="/u/1">user1</a> first!</div>
<div class="comment"><a href="/u/2">user2</a> stay safe everyone</div></div>
<footer><a href="/about">About</a><a href="/privacy">Privacy</a>
<a href="/terms">Terms</a> © 2024 The Daily Record</footer>
</body></html>"""


def test_realistic_article_extracted():
    text, spans = EX.extract(REALISTIC)
    assert text.startswith("Storm hits the northern coast overnight")
    assert "record\nrainfall" not in text  # newlines collapse inside paragraphs
    assert "120 km/h" in text
    assert "cleanup operations" in text
    # boilerplate is gone
    for noise in ("Most read", "Advertisement", "Privacy", "Daily Record",
                  "first!", "Markets rally", "dataLayer"):
        assert noise not in text, noise
    # 1 heading + 3 paragraphs
    assert len(spans) == 4
    assert spans[0]["kind"] == "h1"
    assert REALISTIC[spans[0]["start"] : spans[0]["end"]].startswith(
        "Storm hits the northern coast"
    )


def test_unicode_round_trip_through_pipeline():
    bodies = {
        "https://zh.example/1": "这是一个关于数据处理的中文段落，包含标点符号。",
        "https://ar.example/2": "هذه فقرة عربية قصيرة حول معالجة البيانات الضخمة.",
        "https://mix.example/3": "naïve café résumé — ünïcode ✓ emoji 🚀 end",
    }
    rows = []
    for url, body in bodies.items():
        html = (
            '<html><body><nav><a href="/">home page link</a></nav>'
            f"<article><p>{body}</p></article>"
            "<footer>footer text</footer></body></html>"
        )
        rows.append({"url": url, "html": html.encode("utf-8")})
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows]),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )
    out = extraction_pipeline(rd.from_arrow(t), concurrency=(1, 2)).take_all()
    got = {r["url"]: r for r in out}
    for url, body in bodies.items():
        assert got[url]["status"] == "completed"
        assert got[url]["text"] == body  # byte-exact UTF-8 round trip


def test_host_template_lines_semantics(sf_dir):
    """Template lines = raw-HTML lines on >50% of a host's pages: the 15
    constant boilerplate lines always qualify; the lang line joins exactly
    when one language holds a strict page majority on that host."""
    import os

    import pyarrow.parquet as pq
    from collections import Counter

    from simple_content_ocr_ray.pipelines.extract_queries import host_template_lines

    out = host_template_lines(sf_dir).set_index("host")["n_template_lines"]
    assert set(out.unique()) <= {15, 16}

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    langs = {}
    for did, lang in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()):
        if did % 20 in (0, 1, 2, 3):
            continue
        langs.setdefault(f"site{did % 97}.example", Counter())[lang] += 1
    for host, lc in langs.items():
        expect = 15 + (1 if 2 * max(lc.values()) > sum(lc.values()) else 0)
        assert out[host] == expect, host
    assert (out == 16).any() and (out == 15).any()  # both cases live

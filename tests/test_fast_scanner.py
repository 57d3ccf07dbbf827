"""The regex fast scanner must be byte-identical to the stdlib-parser path."""

import pytest

from simple_content_ocr_ray.stages.html_extractor import HtmlMainContentExtractor

FAST = HtmlMainContentExtractor(engine="fast")
STD = HtmlMainContentExtractor(engine="stdlib")

CRAFTED = [
    "<html><body><article><p>a &amp; b &#61; c &#x41;</p></article></body></html>",
    "<html><body><nav><a href=x>l</a></nav><div><p>one</p><p>two</p></div></body></html>",
    '<html><body><script>var a = "<p>not text</p>";</script><article><p>real</p></article></body></html>',
    "<html><body><style>p::before{content:'<x>'}</style><article><p>styled</p></article></body></html>",
    "<html><body><!-- comment <p>no</p> --><article><p>yes</p></article></body></html>",
    "<html><body><div><p>unclosed<div>stray</body>",
    "<html><body><article><p>x < y and z</p></article></body></html>",
    "<html><body><ARTICLE><P>CAPS TAGS</P></ARTICLE></body></html>",
    '<html><body><article><p data-x="a>b">attr gt</p></article></body></html>',
    "<html><body><article><p>br<br/>after</p></article></body></html>",
    "<html><body><aside>side</aside><article><p>main text here</p></article><footer>f</footer></body></html>",
    "<html><body><article><p>nested <b>bold <i>italic</i></b> end</p></article></body></html>",
    "<html><body><title>t</title><article><p>after title</p></article></body></html>",
    "",
    "plain text, no tags at all",
]


@pytest.mark.parametrize("i", range(len(CRAFTED)))
def test_crafted_equality(i):
    html = CRAFTED[i]
    assert FAST.extract(html) == STD.extract(html)


def test_corpus_equality(pages_table):
    for payload in pages_table["html"].to_pylist():
        if not payload.startswith(b"<!doctype"):
            continue
        h = payload.decode()
        assert FAST.extract(h) == STD.extract(h)


def test_fast_is_default_engine():
    assert HtmlMainContentExtractor().engine == "fast"


def test_marked_sections_equality():
    cases = [
        "<body><div><p>x</p><![CDATA[a>b]]><p>y</p></div></body>",
        "<body><div><p>x</p><![if !IE]><p>cond</p><![endif]><p>y</p></div></body>",
        "<body><div><p>before</p><!-- c1 --><!doctype html><p>after</p></div></body>",
    ]
    for html in cases:
        assert FAST.extract(html) == STD.extract(html), html

"""Unit tests for the from-scratch readability-style HTML extractor."""

from simple_content_ocr_ray.stages.html_extractor import HtmlMainContentExtractor


def ext(html: str) -> tuple[str, list[dict]]:
    return HtmlMainContentExtractor().extract(html)


def test_boilerplate_stripped():
    html = (
        "<html><head><title>t</title><style>.x{}</style>"
        "<script>var a=1;</script></head><body>"
        "<nav><a href='/'>home</a><a href='/x'>other</a></nav>"
        "<article><p>the main content body text</p></article>"
        "<footer>copyright</footer></body></html>"
    )
    text, spans = ext(html)
    assert text == "the main content body text"
    assert len(spans) == 1
    assert spans[0]["kind"] == "p"


def test_spans_are_raw_offsets():
    html = "<html><body><article><p>hello world</p></article></body></html>"
    text, spans = ext(html)
    assert text == "hello world"
    s = spans[0]
    assert html[s["start"] : s["end"]] == "hello world"


def test_multi_paragraph_joined_with_blank_lines():
    html = (
        "<html><body><nav><a href='/'>aaaa bbbb cccc dddd</a></nav>"
        "<div id='main'><p>first paragraph text here</p>"
        "<p>second paragraph text here</p></div></body></html>"
    )
    text, spans = ext(html)
    assert text == "first paragraph text here\n\nsecond paragraph text here"
    assert [s["kind"] for s in spans] == ["p", "p"]


def test_link_density_prefers_content_over_linkfarm():
    html = (
        "<html><body>"
        "<div><a href='1'>one link text</a> <a href='2'>two link text</a> "
        "<a href='3'>three link text</a> <a href='4'>four link text</a></div>"
        "<div><p>real article prose long enough to win despite links nearby</p></div>"
        "</body></html>"
    )
    text, _ = ext(html)
    assert text == "real article prose long enough to win despite links nearby"


def test_entities_unescaped_with_exact_spans():
    html = "<html><body><article><p>a &amp; b &#61; c</p></article></body></html>"
    text, spans = ext(html)
    assert text == "a & b = c"
    s = spans[0]
    assert html[s["start"] : s["end"]] == "a &amp; b &#61; c"


def test_inline_markup_inside_paragraph():
    html = "<html><body><article><p>one <b>two</b> three <i>four</i></p></article></body></html>"
    text, _ = ext(html)
    assert text == "one two three four"


def test_whitespace_normalized_within_paragraph():
    html = "<html><body><article><p>  spaced\n   out\ttext </p></article></body></html>"
    text, _ = ext(html)
    assert text == "spaced out text"


def test_empty_page():
    assert ext("<html><body></body></html>") == ("", [])
    assert ext("") == ("", [])


def test_malformed_html_tolerated():
    html = "<html><body><div><p>unclosed paragraph text<div>stray</body>"
    text, _ = ext(html)
    assert "unclosed paragraph text" in text


def test_span_integrity_audit_all_green(ray_session):
    """North-rule span invariant corpus-wide: every paragraph's raw-offset
    slice rebuilds the paragraph; the audit counts prove it exhaustively."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        span_integrity_audit,
    )

    out = span_integrity_audit("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert row["n_html_pages"] == row["n_pages_ok"] > 0
    assert row["n_spans"] == row["n_spans_ok"] > 0


def test_span_audit_stage_catches_broken_offsets():
    """The audit is a real check: shifting a span start by one byte fails."""
    import pandas as pd

    from simple_content_ocr_ray.pipelines.extract_queries import (
        _SpanAuditStage,
    )

    stage = _SpanAuditStage()
    html = (
        b"<!doctype html><html><body><article><p>unique content words"
        b"</p></article></body></html>"
    )
    ok = stage(pd.DataFrame({"html": [html]}))
    assert ok.loc[0, "n_pages_ok"] == 1

    class Shifted(_SpanAuditStage):
        def _span_ok(self, html_str, span, para):
            return super()._span_ok(
                html_str, {"start": span["start"] + 1, "end": span["end"]}, para
            )

    bad = Shifted()(pd.DataFrame({"html": [html]}))
    assert bad.loc[0, "n_spans_ok"] == 0 and bad.loc[0, "n_pages_ok"] == 0


# --------------------------------------------------------------------------
# DensityExtractor (jusText-style) — second strategy
# --------------------------------------------------------------------------


def _article_page(body: str) -> str:
    from simple_content_ocr_ray.sources.synth_pages import _HTML_TEMPLATE

    return _HTML_TEMPLATE.format(doc_id=7, host=7, lang="en", body=body)


def test_density_agrees_with_readability_on_article_pages():
    from simple_content_ocr_ray.stages.html_extractor import (
        DensityExtractor,
        HtmlMainContentExtractor,
    )

    body = "<p>the quick brown fox jumps over the lazy dog again and again</p>"
    page = _article_page(body)
    for engine in ("fast", "stdlib"):
        td, _ = DensityExtractor(engine=engine).extract(page)
        tr, _ = HtmlMainContentExtractor(engine=engine).extract(page)
        assert td == tr == (
            "the quick brown fox jumps over the lazy dog again and again"
        )


def test_density_and_readability_diverge_where_their_rules_do():
    """A medium-link-density paragraph and a short tail INSIDE the winning
    container: container selection keeps them, per-paragraph density
    classification drops them — the two published rules genuinely differ."""
    from simple_content_ocr_ray.stages.html_extractor import (
        DensityExtractor,
        HtmlMainContentExtractor,
    )

    p1 = "this is the long main article paragraph with plenty of words in it"
    p2 = "and a second equally long clean paragraph keeps the container first"
    link = "read this <a href='/x'>sponsored partner content network promo</a> ok"
    page = (
        f"<html><body><div><p>{p1}</p><p>{p2}</p><p>{link}</p>"
        f"<p>tiny tail note</p></div></body></html>"
    )
    td, _ = DensityExtractor().extract(page)
    tr, _ = HtmlMainContentExtractor().extract(page)
    assert td == f"{p1}\n\n{p2}"
    assert "sponsored" in tr and "tiny tail note" in tr  # container keeps them
    assert "sponsored" not in td and "tiny tail note" not in td


def test_density_fast_and_stdlib_engines_identical():
    from simple_content_ocr_ray.stages.html_extractor import DensityExtractor

    pages = [
        _article_page("<p>alpha beta gamma delta epsilon zeta eta theta iota</p>"),
        "<div><ul><li><a href='/'>home</a></li></ul>"
        "<p>actual content paragraph with enough words to pass the bar</p></div>",
        "<p>short</p>",
        "",
    ]
    for page in pages:
        f = DensityExtractor(engine="fast").extract(page)
        s = DensityExtractor(engine="stdlib").extract(page)
        assert f == s, page[:60]


def test_density_spans_point_at_source():
    from simple_content_ocr_ray.stages.html_extractor import DensityExtractor

    page = "<body><p>one good paragraph with sufficient length right here</p></body>"
    text, spans = DensityExtractor().extract(page)
    assert len(spans) == 1
    s = spans[0]
    assert page[s["start"]:s["end"]].strip() == text

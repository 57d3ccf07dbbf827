"""Property-based equivalence: the fast scanner and the stdlib-parser path
must agree on structured random HTML documents."""

from hypothesis import given, settings, strategies as st

from simple_content_ocr_ray.stages.html_extractor import HtmlMainContentExtractor

FAST = HtmlMainContentExtractor(engine="fast")
STD = HtmlMainContentExtractor(engine="stdlib")

words = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta data table row key".split()),
    min_size=1,
    max_size=12,
).map(" ".join)

text_piece = st.one_of(
    words,
    words.map(lambda w: w + " &amp; more"),
    words.map(lambda w: w + " &#65; x"),
    words.map(lambda w: w + " &amp chips"),      # bare named entity (no ';')
    words.map(lambda w: w + " grade &#65 plus"),  # bare numeric charref
    words.map(lambda w: w + " &unknown; z"),
)

inline = st.one_of(
    text_piece,
    text_piece.map(lambda t: f"<b>{t}</b>"),
    text_piece.map(lambda t: f"<a href='/x'>{t}</a>"),
)

para = st.lists(inline, min_size=1, max_size=3).map(
    lambda parts: "<p>" + " ".join(parts) + "</p>"
)

boiler = st.sampled_from(
    [
        "<nav><a href='/'>home</a> <a href='/b'>about page</a></nav>",
        "<script>var x = '<p>fake</p>';</script>",
        "<style>.c{color:red}</style>",
        "<!-- a comment with <p>tags</p> inside -->",
        "<aside>sidebar text</aside>",
        "<footer>footer text <a href='/t'>terms</a></footer>",
        "",
    ]
)

block = st.one_of(
    st.lists(para, min_size=1, max_size=4).map(
        lambda ps: "<article>" + "".join(ps) + "</article>"
    ),
    st.lists(para, min_size=1, max_size=4).map(
        lambda ps: "<div>" + "".join(ps) + "</div>"
    ),
)

doc = st.tuples(boiler, block, boiler, st.one_of(block, st.just("")), boiler).map(
    lambda t: "<html><head><title>t</title></head><body>"
    + "".join(t)
    + "</body></html>"
)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(doc)
def test_fast_equals_stdlib_on_generated_docs(html):
    assert FAST.extract(html) == STD.extract(html)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(st.text(alphabet="<>/ab &#;pdiv'\"=!-", max_size=120))
def test_no_crash_on_garbage_markup(s):
    # both paths must terminate without raising; equality is not required on
    # pathological non-HTML (stdlib and regex tokenizers may disagree on
    # unparseable fragments), but neither may crash
    FAST.extract(s)
    STD.extract(s)


DFAST = __import__(
    "simple_content_ocr_ray.stages.html_extractor", fromlist=["DensityExtractor"]
).DensityExtractor(engine="fast")
DSTD = __import__(
    "simple_content_ocr_ray.stages.html_extractor", fromlist=["DensityExtractor"]
).DensityExtractor(engine="stdlib")


@settings(max_examples=150, deadline=None, derandomize=True)
@given(doc)
def test_density_fast_equals_stdlib_on_generated_docs(html):
    assert DFAST.extract(html) == DSTD.extract(html)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(st.text(alphabet="<>/ab &#;pdiv'\"=!-", max_size=120))
def test_density_no_crash_on_garbage_markup(s):
    DFAST.extract(s)
    DSTD.extract(s)

"""Web-annotation operator tests: parsers (hreflang / meta robots / JSON-LD),
PSL registered-domain logic, pointer-doubling redirect resolution vs a
brute-force walk, reciprocal links vs brute force, and blocklist scoring."""

import numpy as np
import pandas as pd
import pytest

from simple_content_ocr_ray.pipelines.webannot_queries import (
    _BLOCKLIST,
    REDIRECT_MOD,
    make_annotated_page,
    meta_robots_audit,
    parse_hreflang,
    parse_jsonld,
    parse_meta_robots,
    reciprocal_links,
    redirect_final_targets,
    registered_domain,
    structured_data,
    word_blocklist_scores,
)


# --------------------------------------------------------------------------
# Parser units
# --------------------------------------------------------------------------


def test_parse_hreflang_attr_orders_and_quotes():
    html = (
        '<link rel="alternate" hreflang="en" href="https://a/1">'
        "<link hreflang='de' href='https://a/2' rel='alternate'>"
        '<link rel="alternate" hreflang="x-default" href="https://a/1">'
        '<link rel="stylesheet" href="/css">'
        '<link rel="alternate" type="application/rss+xml" href="/feed">'
    )
    assert parse_hreflang(html) == [("en", "https://a/1"), ("de", "https://a/2")]


def test_parse_meta_robots_cases_and_decoys():
    assert parse_meta_robots('<meta name="robots" content="noindex">') == (
        True,
        False,
    )
    # attr order swapped, bare value, uppercase name
    assert parse_meta_robots(
        "<meta content='noindex, nofollow' name=ROBOTS>"
    ) == (True, True)
    assert parse_meta_robots('<META NAME="Robots" CONTENT="nofollow">') == (
        False,
        True,
    )
    # a description meta containing the words is NOT a directive
    assert parse_meta_robots(
        '<meta name="description" content="noindex nofollow">'
    ) == (False, False)


def test_parse_jsonld_graph_and_malformed():
    html = (
        '<script type="application/ld+json">'
        '{"@type":"Article","name":"A","position":1}</script>'
        "<script async type='application/ld+json'>"
        '{"@graph":[{"@type":"Person","name":"P"},{"@type":"Org","name":"O"}]}'
        "</script>"
        '<script type="application/ld+json">{"@type":"Broken",}</script>'
        "<script>var x=1;</script>"
    )
    got = parse_jsonld(html)
    assert [n["@type"] for n in got] == ["Article", "Person", "Org"]


def test_annotated_page_features_match_residues():
    # d=5: robots noindex+nofollow (5%9==5), graph block (5%5==0), well-formed
    html = make_annotated_page(5).decode()
    assert parse_meta_robots(html) == (True, True)
    types = sorted(n["@type"] for n in parse_jsonld(html))
    assert types == ["Organization", "Person", "Product"]  # 5 % 4 == 1
    # d=3: malformed top block (3%7==3), no robots meta, no graph
    html3 = make_annotated_page(3).decode()
    assert parse_jsonld(html3) == []
    assert parse_meta_robots(html3) == (False, False)
    # every page exposes exactly 4 hreflang alternates (x-default excluded)
    assert len(parse_hreflang(html)) == 4


# --------------------------------------------------------------------------
# PSL registered-domain
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.brand3.co.uk", "brand3.co.uk"),
        ("blog.brand3.co.uk", "brand3.co.uk"),
        ("brand3.co.uk", "brand3.co.uk"),
        ("api.brand7.com", "brand7.com"),
        ("brand7.com", "brand7.com"),
        # github.io is itself a public suffix: one label left of it
        ("www.brand9.github.io", "brand9.github.io"),
        ("brand9.github.io", "brand9.github.io"),
        ("x.y.brand1.ac.jp", "brand1.ac.jp"),
        ("UPPER.Brand2.ORG", "brand2.org"),
        # bare suffix returns itself
        ("co.uk", "co.uk"),
        # unknown TLD: no suffix match, host unchanged
        ("foo.internal", "foo.internal"),
    ],
)
def test_registered_domain(host, expected):
    assert registered_domain(host) == expected


# --------------------------------------------------------------------------
# Distributed operators vs brute force
# --------------------------------------------------------------------------


def test_redirect_pointer_doubling_matches_walk(sf_dir):
    got = redirect_final_targets(sf_dir)
    n = len(got)
    # brute-force walk of the fixture chains
    for d in (0, 1, 4, n - 1, 7, 13):
        cur, hops = d, 0
        while cur % REDIRECT_MOD != 0:
            cur, hops = cur - 1, hops + 1
        row = got[got["doc_id"] == d].iloc[0]
        assert (row["final_doc_id"], row["hops"]) == (cur, hops)
    # every doc resolved exactly once
    assert got["doc_id"].is_unique and len(got) == n


def test_reciprocal_links_matches_brute_force(sf_dir):
    import pyarrow.parquet as pq
    import os

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    edges = set()
    for d in range(n):
        for k in (1, 2, 3):
            t = (17 * d + 13 * k) % n
            if t != d:
                edges.add((d, t))
    expected = sorted(
        (u, v) for (u, v) in edges if u < v and (v, u) in edges
    )
    got = reciprocal_links(sf_dir)
    assert list(map(tuple, got[["u", "v"]].to_numpy())) == expected


def test_word_blocklist_scores_brute_force(sf_dir):
    import duckdb
    import os

    got = word_blocklist_scores(sf_dir)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}' "
        "ORDER BY doc_id"
    ).df()
    for _, r in docs.head(20).iterrows():
        toks = r["text"].split(" ")
        nb = sum(t in _BLOCKLIST for t in toks)
        row = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_tokens"] == len(toks)
        assert row["n_blocked"] == nb
        assert row["block_ppm"] == (1_000_000 * nb) // len(toks)
    # the blocklist is drawn from the live vocabulary: scores must not be
    # vacuously zero corpus-wide
    assert got["n_blocked"].sum() > 0


def test_structured_data_and_robots_e2e_shapes(sf_dir):
    sd = structured_data(sf_dir)
    assert set(sd["sd_type"]) <= {
        "Article",
        "Product",
        "Event",
        "Recipe",
        "Person",
        "Organization",
    }
    # malformed pages (doc_id % 7 == 3, % 5 != 0) contribute nothing
    assert not (
        (sd["doc_id"] % 7 == 3) & (sd["doc_id"] % 5 != 0)
    ).any()
    audit = meta_robots_audit(sf_dir)
    assert ((audit["noindex"] == 1) | (audit["nofollow"] == 1)).all()
    assert (audit["doc_id"] % 9).isin([4, 5, 6]).all()


def test_redirect_both_paths_equal(sf_dir):
    """Footer-gated small path (numpy searchsorted doubling) must equal the
    forced distributed native-join path exactly."""
    small = redirect_final_targets(sf_dir)
    large = redirect_final_targets(sf_dir, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)


def test_parse_meta_refresh():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_meta_refresh,
    )

    assert parse_meta_refresh(
        '<meta http-equiv="Refresh" content="5; url=https://a/x">'
    ) == (5, "https://a/x")
    # attr order swapped, case-insensitive equiv, spaced grammar
    assert parse_meta_refresh(
        "<meta content=' 0 ;  URL = /rel '  http-equiv=REFRESH>"
    ) == (0, "/rel")
    # robots/description metas are not refreshes; bare-delay refresh
    # (no url=) is ignored by this extractor
    assert parse_meta_refresh('<meta name="robots" content="noindex">') is None
    assert parse_meta_refresh('<meta http-equiv="refresh" content="30">') is None


def test_parse_opengraph_channel_separation():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_opengraph,
    )

    html = (
        '<meta property="og:title" content="T">'
        "<meta content='article' property='og:type'>"
        '<meta property="og:title" content="SECOND">'  # first wins
        '<meta name="robots" content="noindex">'  # name= channel ignored
        '<meta name="og:title" content="decoy">'  # name=, not property=
    )
    og = parse_opengraph(html)
    assert og == {"og:title": "T", "og:type": "article"}


def test_pagination_chains_both_paths_equal(sf_dir):
    """Footer-gated broadcast/driver path vs forced distributed-join path."""
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        pagination_chains,
    )

    small = pagination_chains(sf_dir)
    large = pagination_chains(sf_dir, small_threshold=0)
    pd.testing.assert_frame_equal(small, large)
    # reassembly is ORDERED: part texts appear in page order
    import duckdb
    import os

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}' "
        "ORDER BY doc_id"
    ).df()
    row = small[small["chain_id"] == 0].iloc[0]
    expect = "\n".join(docs[docs["doc_id"].isin([0, 1, 2])]["text"])
    assert row["combined_text"] == expect and row["n_parts"] == 3


def test_parse_rel_links():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_rel_links,
    )

    html = (
        '<link rel="next" href="https://a/2">'
        "<link href='https://a/0' rel='prev'>"
        '<link rel="alternate" hreflang="en" href="https://a/x">'
        '<link rel="next" href="https://a/IGNORED">'  # first wins
    )
    assert parse_rel_links(html) == {
        "next": "https://a/2",
        "prev": "https://a/0",
    }


# --------------------------------------------------------------------------
# Property fuzzing: annotation parsers must never raise on arbitrary text
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_annotation_parsers_never_raise(s):
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_hreflang,
        parse_jsonld,
        parse_meta_refresh,
        parse_meta_robots,
        parse_opengraph,
        parse_rel_links,
    )

    parse_hreflang(s)
    parse_jsonld(s)
    ni, nf = parse_meta_robots(s)
    assert isinstance(ni, bool) and isinstance(nf, bool)
    parse_meta_refresh(s)
    assert isinstance(parse_opengraph(s), dict)
    assert isinstance(parse_rel_links(s), dict)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc*$/.", max_size=40), st.text(alphabet="abc/.", max_size=60))
def test_robots_pattern_total(pattern, path):
    """Wildcard matcher is total: any pattern/path pair yields a bool and
    prefix patterns degrade to startswith exactly."""
    from simple_content_ocr_ray.pipelines.extract_queries import (
        robots_allows,
    )

    verdict = robots_allows([(False, pattern)], path) if pattern else True
    assert isinstance(verdict, bool)
    if pattern and "*" not in pattern and not pattern.endswith("$"):
        assert verdict == (not path.startswith(pattern))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_registered_domain_total(host):
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        registered_domain,
    )

    assert isinstance(registered_domain(host), str)


def test_link_triangle_counts_matches_adjacency_matmul(sf_dir):
    """Per-node triangle counts vs the dense A³ diagonal (each node's
    triangle participation = diag(A³)/2 for an undirected simple graph)."""
    import os

    import pyarrow.parquet as pq

    from simple_content_ocr_ray.pipelines.webannot_queries import (
        link_triangle_counts,
    )

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    a = np.zeros((n, n), dtype=np.int64)
    for d in range(n):
        for k in (1, 2, 3):
            t = (17 * d + 13 * k) % n
            if t != d:
                a[d, t] = a[t, d] = 1
    per_node = np.einsum("ij,jk,ki->i", a, a, a) // 2
    got = link_triangle_counts(sf_dir)
    expected = {i: int(c) for i, c in enumerate(per_node) if c}
    assert dict(zip(got["node"], got["n_triangles"])) == expected


def test_parse_img_alts_attribute_forms_and_decoys():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_img_alts,
    )

    html = (
        '<img class="spacer">'              # no src
        '<img src="/a.jpg">'                 # no alt
        '<img src="/b.jpg" alt="">'          # empty alt
        "<img alt='two  words' src='/c.jpg'>"  # swapped order, ws collapse
        '<img src="/d.jpg" alt="plain" loading="lazy">'
    )
    assert parse_img_alts(html) == [
        ("/c.jpg", "two words"), ("/d.jpg", "plain")]


def test_parse_data_uris_decodes_and_skips_corrupt():
    import base64

    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_data_uris,
    )

    good = base64.b64encode(b"BYTES").decode()
    html = (
        f'<img src="data:image/png;base64,{good}">'
        '<img src="data:image/gif;base64,!!!corrupt">'
        '<img src="/normal.jpg">'
        f"<img src='data:IMAGE/JPEG;base64,{good}'>"
    )
    got = parse_data_uris(html)
    assert got == [("image/png", b"BYTES"), ("image/jpeg", b"BYTES")]


def test_parse_headings_strip_and_skip():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        parse_headings,
    )

    html = (
        "<h1>Top</h1><h4>   </h4><h2>Mid <em>em</em> tail</h2>"
        "<H3 class='x'>cased</H3><h7>not a heading</h7>"
    )
    assert parse_headings(html) == [
        (1, "Top"), (2, "Mid em tail"), (3, "cased")]


def test_split_by_headings_folds_deeper_levels():
    from simple_content_ocr_ray.pipelines.webannot_queries import (
        split_by_headings,
    )

    html = (
        "<h1>Doc</h1><p>intro</p>"
        "<h2>A</h2><p>a1</p><h3>A.1</h3><p>a2</p>"
        "<h2>B</h2><p>b1</p>"
    )
    assert split_by_headings(html) == [
        ("Doc", "intro"), ("A", "a1 A.1 a2"), ("B", "b1")]
    # level=1 keeps everything in the h1 chunk
    assert split_by_headings(html, level=1) == [
        ("Doc", "intro A a1 A.1 a2 B b1")]


def test_parse_microdata_nesting_and_decoys():
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_microdata

    html = """
    <body>
    <span itemprop="orphan">ignored: no ancestor itemscope</span>
    <div itemscope itemtype='https://schema.org/Product'>
      <span itemprop=name>Widget  7</span>
      <meta content="SKU-7" itemprop='sku'>
      <div itemprop="offers" itemscope itemtype="https://schema.org/Offer">
        <span itemprop="price">7.00</span>
      </div>
      <span itemprop="color">blue</span>
    </div>
    """
    rows = parse_microdata(html)
    assert {"item_type": "https://schema.org/Product", "prop": "name",
            "value": "Widget 7"} in rows  # whitespace collapsed
    assert {"item_type": "https://schema.org/Product", "prop": "sku",
            "value": "SKU-7"} in rows  # meta content, attr order swapped
    # nested item becomes a property whose value is the child type
    assert {"item_type": "https://schema.org/Product", "prop": "offers",
            "value": "https://schema.org/Offer"} in rows
    # the nesting trap: price belongs to Offer, never Product
    assert {"item_type": "https://schema.org/Offer", "prop": "price",
            "value": "7.00"} in rows
    assert not any(r["prop"] == "price" and "Product" in r["item_type"]
                   for r in rows)
    # property AFTER the nested item closes re-attaches to the outer item
    assert {"item_type": "https://schema.org/Product", "prop": "color",
            "value": "blue"} in rows
    assert not any(r["prop"] == "orphan" for r in rows)


def test_parse_microdata_empty_and_plain_pages():
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_microdata

    assert parse_microdata("") == []
    assert parse_microdata("<html><body><p>no items</p></body></html>") == []


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/= \"'abcdiv itemscopeproptyn0", max_size=400))
def test_parse_microdata_total(s):
    """Totality over adversarial tag soup (unbalanced tags, half-written
    attributes, itemprop/itemscope fragments): never raises, always returns
    a list of complete rows."""
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_microdata

    rows = parse_microdata(s)
    assert isinstance(rows, list)
    for r in rows:
        assert set(r) == {"item_type", "prop", "value"}


def test_parse_srcset_grammar():
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_srcset

    html = (
        '<img srcset="a.jpg 480w,  b.jpg 2x ,c.jpg 1.5x, d.jpg,, bogus 7q" '
        'src="f.jpg"><img src="no-srcset.jpg">'
    )
    got = parse_srcset(html)
    assert got == [
        ("a.jpg", "w", 480),
        ("b.jpg", "x", 2),
        ("c.jpg", "x", 1),     # integer part of density
        ("d.jpg", "x", 1),     # descriptor-less candidate defaults to 1x
    ]                           # 'bogus 7q' malformed -> skipped


def test_parse_canonical_first_wins_and_none():
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_canonical

    html = (
        "<link rel='canonical' href='https://a/1'>"
        '<link rel="canonical" href="https://a/2">'
        '<link rel="stylesheet" href="/x.css">'
    )
    assert parse_canonical(html) == "https://a/1"
    assert parse_canonical("<link rel='stylesheet' href='/x.css'>") is None


def test_canonical_cluster_sizes(sf_dir, ray_session):
    from simple_content_ocr_ray.pipelines.webannot_queries import canonical_clusters

    df = canonical_clusters(sf_dir)
    # full triples have size 3; a cut tail triple is smaller
    assert set(df[df["doc_id"] % 3 == 1]["cluster_size"]) <= {2, 3}
    full = df[df["canonical_doc_id"] < df["doc_id"].max() - 3]
    assert (full["cluster_size"] == 3).all()
    assert (df["is_self"] == (df["doc_id"] % 3 == 0).astype(int)).all()


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet='<>img sret=",wx0123. abc', max_size=300))
def test_parse_srcset_total(s):
    from simple_content_ocr_ray.pipelines.webannot_queries import parse_srcset

    for url, kind, qty in parse_srcset(s):
        assert kind in ("w", "x") and isinstance(qty, int)


def test_spider_trap_regex_semantics():
    import re

    from simple_content_ocr_ray.pipelines.webannot_queries import _TRAP_LOOP_RE

    rx = re.compile(_TRAP_LOOP_RE)
    # multi-segment repeating unit, 3 reps
    assert rx.search("/cal/2024/01/2024/01/2024/01")
    # single-segment unit
    assert rx.search("/a/x/x/x")
    # two reps only: not a trap
    assert not rx.search("/cal/2024/01/2024/01")
    # distinct segments never match
    assert not rx.search("/blog/2024/05/x123")
    assert not rx.search("/product/1/2/3/4")


def test_spider_trap_loop_beats_depth(sf_dir, ray_session):
    from simple_content_ocr_ray.pipelines.webannot_queries import spider_trap_urls

    df = spider_trap_urls(sf_dir)
    # d%7==0, d%3==2 paths have 11 segments (deep) AND loop: loop wins
    both = df[(df["doc_id"] % 7 == 0) & (df["doc_id"] % 3 == 2)]
    assert len(both) > 0 and (both["trap_kind"] == "loop").all()


def test_idn_decode_roundtrip_and_bad_label():
    from simple_content_ocr_ray.pipelines.webannot_queries import _HOMOGLYPHS

    for g in _HOMOGLYPHS:
        label = f"s{g}te"
        ascii_form = label.encode("idna").decode("ascii")
        assert ascii_form.startswith("xn--")
        assert ascii_form.encode("ascii").decode("idna") == label
    # an invalid punycode label must not raise in the op's per-label loop
    try:
        b"xn--zzzzzz\xff".decode("idna")
        raised = False
    except UnicodeError:
        raised = True
    assert raised  # the op catches exactly this and keeps the ascii form


def test_parse_validators_cases():
    from simple_content_ocr_ray.pipelines.extract_queries import parse_validators

    etag, lm = parse_validators(
        'Content-Type: text/html\nETag: "x1"\nLast-Modified:  Tue GMT \netag: "x2"'
    )
    assert etag == '"x1"'  # first wins, case-insensitive name
    assert lm == "Tue GMT"  # value trimmed
    assert parse_validators("") == (None, None)
    assert parse_validators("ETag: W/\"w\"")[0] == 'W/"w"'

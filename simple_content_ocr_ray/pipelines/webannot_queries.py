"""Web-page annotation & link-topology operators — the crawl-metadata layer
a webtext curation engine reads BESIDE the main content: schema.org JSON-LD
structured data, hreflang alternate-language clusters, page-level robots
directives, public-suffix (registered-domain) rollups, UT1-style word
blocklists, HTTP redirect resolution, and reciprocal-link detection.

Reference grounding: the reference's extraction surface stops at per-document
markdown (`/root/reference/src/simple_ocr/services/ocr_service.py:50-222`);
everything here generalizes its metadata-merge step (M19,
`ocr_service.py:112-124`) to the page-annotation families a Common-Crawl-scale
corpus needs. Fixtures are synthesized deterministically from ``doc_id`` (like
every feature fixture in this repo) so each operator's DuckDB oracle can
reconstruct the expected output arithmetically while the Ray side must parse /
join for real.

Scale shape notes (100 TB):
- All page parsing runs inside ``map_batches`` over the payload table —
  per-page work, embarrassingly parallel, no shuffle.
- ``hreflang_clusters`` groups slim (fingerprint, doc_id, pos, lang) rows
  with ONE vectorized call per sorted block (``map_sorted_runs``) — no
  per-cluster ``map_groups``.
- ``registered_domain_stats`` compacts to distinct (registered, host) pairs
  per batch before any shuffle; the final rollup is bounded by the number of
  distinct HOSTS, never pages.
- ``redirect_final_targets`` is pointer doubling: ceil(log2(max_hops)) native
  hash-join rounds instead of max_hops sequential joins — 40 hops = 6 rounds.
- ``reciprocal_links`` never materializes the edge list on the driver:
  direction bits are OR-merged per (lo, hi) pair with pre-aggregated
  partials, so the shuffle carries one row per undirected pair per batch.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Callable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.agg import grouped_aggregate, map_sorted_runs

# --------------------------------------------------------------------------
# Shared annotated-page fixture
# --------------------------------------------------------------------------

_HRE = ("en", "de", "fr", "ja")
_SD_TYPES = ("Article", "Product", "Event", "Recipe")


def make_annotated_page(d: int) -> bytes:
    """Deterministic HTML page for doc ``d`` carrying all three head-annotation
    families at once — hreflang alternates, meta robots, JSON-LD — plus decoys
    for each parser (stylesheet/feed links, a description meta containing the
    word 'noindex', a plain script). Attribute order, quoting, and tag case
    vary with ``d`` so parsers cannot pattern-match one serialization."""
    c = d // 4
    parts = [
        "<!doctype html>",
        '<html lang="en"><head>',
        f"<title>Annotated {d}</title>",
        '<link rel="stylesheet" href="/css/main.css">',
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">',
        '<meta name="description" content="noindex nothing, a decoy">',
    ]
    for p in range(4):
        m = 4 * c + p
        href = f"https://site{m % 97}.example/{m:08d}"
        if p % 2 == 0:
            parts.append(f'<link rel="alternate" hreflang="{_HRE[p]}" href="{href}">')
        else:  # swapped attribute order, single quotes
            parts.append(f"<link hreflang='{_HRE[p]}' href='{href}' rel='alternate'>")
    parts.append(
        '<link rel="alternate" hreflang="x-default" '
        f'href="https://site{(4 * c) % 97}.example/{4 * c:08d}">'
    )
    r = d % 9
    if r == 4:
        parts.append('<meta name="robots" content="noindex">')
    elif r == 5:
        parts.append("<meta content='noindex, nofollow' name=ROBOTS>")
    elif r == 6:
        parts.append('<META NAME="Robots" CONTENT="nofollow">')
    trailing = "," if d % 7 == 3 else ""  # trailing comma = malformed JSON
    parts.append(
        '<script type="application/ld+json">'
        '{"@context":"https://schema.org",'
        f'"@type":"{_SD_TYPES[d % 4]}","name":"Item {d}","position":{d % 13}{trailing}}}'
        "</script>"
    )
    if d % 5 == 0:
        parts.append(
            "<script async type='application/ld+json'>"
            '{"@context":"https://schema.org","@graph":['
            f'{{"@type":"Person","name":"Author {d}","position":0}},'
            f'{{"@type":"Organization","name":"site{d % 97}","position":1}}]}}'
            "</script>"
        )
    if d % 3 < 2:  # pagination: triples (3c, 3c+1, 3c+2) chained by rel=next
        nxt = d + 1
        parts.append(
            f'<link rel="next" href="https://site{nxt % 97}.example/{nxt:08d}">'
        )
    if d % 3 > 0:
        prv = d - 1
        parts.append(
            f"<link href='https://site{prv % 97}.example/{prv:08d}' rel='prev'>"
        )
    if d % 4 != 3:  # Open Graph card (property= metas, not name= metas)
        og_type = ("article", "product", "video.other")[d % 3]
        parts.append(f'<meta property="og:title" content="OG {d}">')
        parts.append(f"<meta content='{og_type}' property='og:type'>")
        if d % 10 < 5:
            parts.append(
                f'<meta property="og:image" content="https://cdn{d % 7}.example/i/{d}.jpg">'
            )
    if d % 6 == 0:  # HTML-side redirect channel (meta refresh)
        t = d + 1
        parts.append(
            f'<meta http-equiv="Refresh" content="{d % 30}; '
            f'url=https://site{t % 97}.example/{t:08d}">'
        )
    # rel=canonical: triples (3c, 3c+1, 3c+2) all point at the triple head
    # (3c is self-canonical); varied attribute order like the other links
    canon = d - d % 3
    if d % 3 == 0:
        parts.append(
            f'<link rel="canonical" href="https://site{canon % 97}.example/'
            f'{canon:08d}">'
        )
    else:
        parts.append(
            f"<link href='https://site{canon % 97}.example/{canon:08d}' "
            f"rel='canonical'>"
        )
    parts.append(f"<script>var d={d};</script>")
    parts.append(f"</head><body><p>body {d}</p>")
    if d % 5 != 2:  # responsive image: srcset candidates (NO alt, so the
        # caption miner — which requires both halves — never sees it)
        cdn = f"https://cdn{d % 7}.example/i"
        parts.append(
            f'<img srcset="{cdn}/{d}-480.jpg 480w, {cdn}/{d}-960.jpg 960w,'
            f'  {cdn}/{d}@2x.jpg 2x" src="{cdn}/{d}.jpg">'
        )
    if d % 4 != 1:  # HTML Microdata card (third structured-data channel)
        q = '"' if d % 2 == 0 else "'"
        parts.append(f"<div itemscope itemtype={q}https://schema.org/Product{q}>")
        parts.append(f"<span itemprop={q}name{q}>Widget {d}</span>")
        parts.append(f"<meta itemprop={q}sku{q} content={q}SKU-{d % 1000}{q}>")
        parts.append(
            f"<div itemprop={q}offers{q} itemscope "
            f"itemtype={q}https://schema.org/Offer{q}>"
        )
        # nesting trap: price belongs to the nested Offer, NOT the Product
        parts.append(f"<span itemprop={q}price{q}>{d % 500}.00</span>")
        parts.append("</div></div>")
    # orphan decoy: itemprop with no ancestor itemscope is invalid per the
    # WHATWG microdata spec and must be ignored
    parts.append('<span itemprop="orphan">decoy outside any itemscope</span>')
    parts.append("</body></html>")
    return "\n".join(parts).encode()


def _annotated_pages(sf_dir: str) -> rd.Dataset:
    """Payload table (doc_id, payload) — synthesized per batch from the
    documents table so downstream parsing is genuinely distributed."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def build(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "payload": [make_annotated_page(int(d)) for d in df["doc_id"]],
            }
        )

    return docs.map_batches(build, batch_format="pandas")


_TAG_ATTR_RE = re.compile(
    r"""([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
)


def _attrs(tag: str) -> dict[str, str]:
    """Attribute map of one HTML tag string, names lowercased; handles
    double-quoted, single-quoted, and bare values."""
    out: dict[str, str] = {}
    for m in _TAG_ATTR_RE.finditer(tag):
        out[m.group(1).lower()] = m.group(3) or m.group(4) or m.group(5) or ""
    return out


# --------------------------------------------------------------------------
# structured_data — JSON-LD (schema.org) extraction
# --------------------------------------------------------------------------

_LDJSON_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.IGNORECASE | re.DOTALL,
)


def parse_jsonld(html: str) -> list[dict]:
    """All schema.org items of a page: every ``application/ld+json`` script
    block (attribute order/quoting agnostic), ``@graph`` arrays expanded,
    malformed JSON skipped (one bad block costs one block, never the page)."""
    items: list[dict] = []
    for m in _LDJSON_RE.finditer(html):
        try:
            obj = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        nodes = obj.get("@graph", [obj]) if isinstance(obj, dict) else []
        for node in nodes:
            if isinstance(node, dict) and "@type" in node:
                items.append(node)
    return items


def structured_data(sf_dir: str) -> pd.DataFrame:
    """Schema.org JSON-LD inventory of the corpus: (doc_id, sd_type, name,
    position) per structured-data item. Real JSON parsing per page inside
    ``map_batches``; malformed blocks (trailing comma, ~1/7 of pages) are
    dropped by the parser, and @graph multi-item blocks expand to one row per
    node. Per-page work only — no shuffle at any scale."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            for node in parse_jsonld(bytes(payload).decode()):
                rows.append(
                    {
                        "doc_id": int(d),
                        "sd_type": str(node["@type"]),
                        "name": str(node.get("name", "")),
                        "position": int(node.get("position", 0)),
                    }
                )
        out = pd.DataFrame(rows, columns=["doc_id", "sd_type", "name", "position"])
        return out.astype({"doc_id": "int64", "position": "int64"})

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "position", "sd_type"]).reset_index(drop=True)


_STRUCTURED_DATA_SQL = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'Article' WHEN 1 THEN 'Product'
                       WHEN 2 THEN 'Event' ELSE 'Recipe' END AS sd_type,
       'Item ' || doc_id AS name,
       CAST(doc_id % 13 AS BIGINT) AS position
FROM documents WHERE doc_id % 7 <> 3
UNION ALL
SELECT doc_id, 'Person', 'Author ' || doc_id, 0 FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id, 'Organization', 'site' || (doc_id % 97), 1
FROM documents WHERE doc_id % 5 = 0
ORDER BY doc_id, position, sd_type
"""


# --------------------------------------------------------------------------
# microdata_items — HTML Microdata (itemscope/itemtype/itemprop) extraction
# --------------------------------------------------------------------------


def parse_microdata(html: str) -> list[dict]:
    """WHATWG HTML Microdata extraction — the third structured-data channel
    next to JSON-LD (``structured_data``) and Open Graph. Stack-based over
    stdlib ``html.parser`` so nesting is honored: a property belongs to its
    NEAREST ancestor itemscope (the nested-item trap a flat regex fails), a
    nested itemscope with an itemprop becomes a property of its parent item
    (value = the child's itemtype), ``<meta itemprop content=…>`` yields the
    content attribute, other property elements yield their collapsed inner
    text, and an itemprop with NO ancestor itemscope is invalid per spec
    and ignored. Returns one dict per property:
    ``{"item_type", "prop", "value"}`` in document order."""
    from html.parser import HTMLParser

    _VOID = {"meta", "link", "img", "br", "hr", "input", "source"}

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.rows: list[dict] = []
            # each stack frame: [tag, item_type_or_None, prop_or_None, buf]
            self.stack: list[list] = []

        def _cur_item(self) -> str | None:
            for fr in reversed(self.stack):
                if fr[1] is not None:
                    return fr[1]
            return None

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            scope = "itemscope" in a
            prop = a.get("itemprop")
            owner = self._cur_item()
            if scope:
                itype = a.get("itemtype") or ""
                if prop and owner is not None:
                    self.rows.append(
                        {"item_type": owner, "prop": prop, "value": itype}
                    )
                if tag not in _VOID:
                    self.stack.append([tag, itype, None, None])
                return
            if prop and owner is not None:
                if tag == "meta":
                    self.rows.append(
                        {
                            "item_type": owner,
                            "prop": prop,
                            "value": a.get("content", ""),
                        }
                    )
                    return
                if tag not in _VOID:
                    self.stack.append([tag, None, prop, []])
                    return
            if tag not in _VOID:
                self.stack.append([tag, None, None, None])

        def handle_data(self, data):
            if self.stack and self.stack[-1][3] is not None:
                self.stack[-1][3].append(data)

        def handle_endtag(self, tag):
            while self.stack:
                fr = self.stack.pop()
                if fr[2] is not None:  # text-valued property closes
                    owner = self._cur_item()
                    if owner is not None:
                        self.rows.append(
                            {
                                "item_type": owner,
                                "prop": fr[2],
                                "value": " ".join("".join(fr[3]).split()),
                            }
                        )
                if fr[0] == tag:
                    break

    p = P()
    p.feed(html)
    return p.rows


def microdata_items(sf_dir: str) -> pd.DataFrame:
    """Microdata inventory of the corpus: (doc_id, item_type, prop, value)
    per extracted property — Product cards with a nested Offer here, so a
    parser that flattens nesting mis-attributes the price and breaks the
    hash. Pure per-page map, no shuffle at any scale."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            for r in parse_microdata(bytes(payload).decode()):
                rows.append(
                    {
                        "doc_id": int(d),
                        "item_type": r["item_type"].rsplit("/", 1)[-1],
                        "prop": r["prop"],
                        "value": r["value"],
                    }
                )
        return pd.DataFrame(
            rows, columns=["doc_id", "item_type", "prop", "value"]
        ).astype({"doc_id": "int64"})

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "item_type", "prop"]).reset_index(
        drop=True
    )


_MICRODATA_ITEMS_SQL = """
WITH md AS (SELECT doc_id FROM documents WHERE doc_id % 4 <> 1)
SELECT doc_id, 'Product' AS item_type, 'name' AS prop,
       'Widget ' || doc_id AS value FROM md
UNION ALL
SELECT doc_id, 'Product', 'sku', 'SKU-' || (doc_id % 1000) FROM md
UNION ALL
SELECT doc_id, 'Product', 'offers', 'https://schema.org/Offer' FROM md
UNION ALL
SELECT doc_id, 'Offer', 'price', CAST(doc_id % 500 AS VARCHAR) || '.00' FROM md
ORDER BY doc_id, item_type, prop
"""


# --------------------------------------------------------------------------
# img srcset candidates — responsive-image mining
# --------------------------------------------------------------------------

_IMG_TAG_RE = re.compile(r"<img\b[^>]*>", re.IGNORECASE)
_W_DESC_RE = re.compile(r"^(\d+)w$")
_X_DESC_RE = re.compile(r"^(\d+(?:\.\d+)?)x$")


def parse_srcset(html: str) -> list[tuple[str, str, int]]:
    """Image candidates from every ``<img srcset=…>``: (url, kind, qty)
    per candidate in document order, where kind is 'w' (width descriptor,
    qty = CSS px) or 'x' (density, qty = integer part). Candidate strings
    are comma-separated URL + optional descriptor pairs per the HTML spec's
    grammar (whitespace-tolerant; descriptor-less candidates default to
    1x); malformed candidates are skipped, not fatal."""
    out = []
    for tag in _IMG_TAG_RE.findall(html):
        a = _attrs(tag)
        srcset = a.get("srcset")
        if not srcset:
            continue
        for cand in srcset.split(","):
            bits = cand.split()
            if not bits:
                continue
            url = bits[0]
            if len(bits) == 1:
                out.append((url, "x", 1))
                continue
            m = _W_DESC_RE.match(bits[1])
            if m:
                out.append((url, "w", int(m.group(1))))
                continue
            m = _X_DESC_RE.match(bits[1])
            if m:
                out.append((url, "x", int(float(m.group(1)))))
    return out


def img_srcset_candidates(sf_dir: str) -> pd.DataFrame:
    """Responsive-image candidate inventory: (doc_id, url, kind, qty) per
    srcset candidate — the fetch list a multimodal crawler builds when one
    <img> offers several resolutions (the plain ``src`` fallback is the
    caption channel's job; srcset is where the high-res variants live).
    Pure per-page map, no shuffle."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            for url, kind, qty in parse_srcset(bytes(payload).decode()):
                rows.append(
                    {"doc_id": int(d), "url": url, "kind": kind, "qty": qty}
                )
        return pd.DataFrame(
            rows, columns=["doc_id", "url", "kind", "qty"]
        ).astype({"doc_id": "int64", "qty": "int64"})

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "kind", "qty"]).reset_index(drop=True)


_IMG_SRCSET_SQL = """
WITH pages AS (SELECT doc_id, 'https://cdn' || (doc_id % 7) || '.example/i' AS cdn
               FROM documents WHERE doc_id % 5 <> 2)
SELECT doc_id, cdn || '/' || doc_id || '-480.jpg' AS url, 'w' AS kind,
       CAST(480 AS BIGINT) AS qty FROM pages
UNION ALL
SELECT doc_id, cdn || '/' || doc_id || '-960.jpg', 'w', 960 FROM pages
UNION ALL
SELECT doc_id, cdn || '/' || doc_id || '@2x.jpg', 'x', 2 FROM pages
ORDER BY doc_id, kind, qty
"""


# --------------------------------------------------------------------------
# canonical_clusters — rel=canonical duplicate-cluster extraction
# --------------------------------------------------------------------------


def parse_canonical(html: str) -> str | None:
    """href of the page's ``<link rel=canonical>`` (first wins), or None."""
    for tag in _LINK_RE.findall(html):
        a = _attrs(tag)
        if a.get("rel", "").lower() == "canonical" and "href" in a:
            return a["href"]
    return None


def canonical_clusters(sf_dir: str) -> pd.DataFrame:
    """rel=canonical duplicate clusters — the publisher-declared dedup
    channel (print views, tracking-parameter variants, AMP pages all point
    at one canonical URL): per page, the parsed canonical target, a
    self-canonical flag, and the CLUSTER SIZE (pages sharing the target).
    Topology: per-page parse emits slim (doc_id, canonical_doc_id) pairs;
    one bounded grouped count (≤ one row per cluster) broadcasts back over
    the pair stream — pages never shuffle."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            href = parse_canonical(bytes(payload).decode())
            if href is None:
                continue
            target = int(href.rsplit("/", 1)[-1])
            rows.append(
                {
                    "doc_id": int(d),
                    "canonical_doc_id": target,
                    "is_self": 1 if target == int(d) else 0,
                }
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "canonical_doc_id", "is_self"]
        ).astype("int64")

    ds = pages.map_batches(extract, batch_format="pandas")
    sizes = grouped_aggregate(
        ds.map_batches(
            lambda d: d[["canonical_doc_id"]], batch_format="pandas"
        ),
        ["canonical_doc_id"],
        {"cluster_size": (None, "count")},
    ).to_pandas()
    out = ds.to_pandas().merge(sizes, on="canonical_doc_id")
    out["cluster_size"] = out["cluster_size"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_CANONICAL_CLUSTERS_SQL = """
WITH c AS (
  SELECT doc_id, doc_id - doc_id % 3 AS canonical_doc_id,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_self
  FROM documents
)
SELECT doc_id, canonical_doc_id, is_self,
       COUNT(*) OVER (PARTITION BY canonical_doc_id) AS cluster_size
FROM c ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# hreflang_clusters — alternate-language page clusters
# --------------------------------------------------------------------------

_LINK_RE = re.compile(r"<link\b[^>]*>", re.IGNORECASE)


def parse_hreflang(html: str) -> list[tuple[str, str]]:
    """(hreflang, href) of every ``rel=alternate hreflang=...`` head link,
    x-default excluded; attribute order and quote style agnostic."""
    out = []
    for tag in _LINK_RE.findall(html):
        a = _attrs(tag)
        hl = a.get("hreflang")
        if a.get("rel") == "alternate" and hl and hl != "x-default" and "href" in a:
            out.append((hl, a["href"]))
    return out


def hreflang_clusters(sf_dir: str) -> pd.DataFrame:
    """Alternate-language clusters: pages naming the same sorted set of
    hreflang targets form one translation cluster (the bitext-candidate
    discovery step upstream of ``xlingual_margin_pairs``). Per page, parse the
    link tags and fingerprint the target set; then ONE vectorized pandas
    groupby per sorted block (``map_sorted_runs`` on the fingerprint — no
    per-cluster ``map_groups``) yields (cluster_id = min member doc_id,
    n_pages present, langs in hreflang-position order)."""
    pages = _annotated_pages(sf_dir)

    def page_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            d = int(d)
            alts = parse_hreflang(bytes(payload).decode())
            if not alts:
                continue
            targets = sorted(href for _, href in alts)
            fp = hashlib.md5("|".join(targets).encode()).hexdigest()
            # the page's own lang: the alternate whose href trails its own id
            own = f"/{d:08d}"
            hl_own = next(
                (hl for hl, href in alts if href.endswith(own)), None
            )
            if hl_own is not None:
                rows.append({"fp": fp, "doc_id": d, "hlang": hl_own})
        return pd.DataFrame(rows, columns=["fp", "doc_id", "hlang"]).astype(
            {"doc_id": "int64"}
        )

    slim = pages.map_batches(page_rows, batch_format="pandas")

    def reduce_runs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype="int64"),
                    "n_pages": pd.Series([], dtype="int64"),
                    "langs": pd.Series([], dtype="object"),
                }
            )
        df = df.sort_values(["fp", "doc_id"], kind="mergesort")
        g = df.groupby("fp", sort=False)
        out = pd.DataFrame(
            {
                "cluster_id": g["doc_id"].min(),
                "n_pages": g["doc_id"].size(),
                "langs": g["hlang"].agg(",".join),
            }
        ).reset_index(drop=True)
        return out.astype({"cluster_id": "int64", "n_pages": "int64"})

    out = map_sorted_runs(slim, "fp", reduce_runs).to_pandas()
    return out.sort_values("cluster_id").reset_index(drop=True)


_HREFLANG_CLUSTERS_SQL = """
SELECT CAST(4 * (doc_id // 4) AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       string_agg(CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                                  WHEN 2 THEN 'fr' ELSE 'ja' END,
                  ',' ORDER BY doc_id % 4) AS langs
FROM documents
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# meta_robots_audit — page-level robots directives
# --------------------------------------------------------------------------

_META_RE = re.compile(r"<meta\b[^>]*>", re.IGNORECASE)


def parse_meta_robots(html: str) -> tuple[bool, bool]:
    """(noindex, nofollow) from ``<meta name=robots>`` tags — tag and
    attribute case-insensitive, attribute order agnostic, multi-token
    content split on commas/whitespace. Non-robots metas are ignored."""
    noindex = nofollow = False
    for tag in _META_RE.findall(html):
        a = _attrs(tag)
        if a.get("name", "").lower() != "robots":
            continue
        toks = {t.strip().lower() for t in re.split(r"[\s,]+", a.get("content", ""))}
        noindex |= "noindex" in toks
        nofollow |= "nofollow" in toks
    return noindex, nofollow


def meta_robots_audit(sf_dir: str) -> pd.DataFrame:
    """Index-exclusion audit: pages carrying a ``<meta name=robots>`` with
    noindex and/or nofollow (the page-level complement of the robots.txt
    operator ``robots_allowed_links``). Flags as int64 0/1. Pure map — the
    flagged set is what a curation pipeline joins against before training."""
    pages = _annotated_pages(sf_dir)

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            ni, nf = parse_meta_robots(bytes(payload).decode())
            if ni or nf:
                rows.append({"doc_id": int(d), "noindex": int(ni), "nofollow": int(nf)})
        return pd.DataFrame(rows, columns=["doc_id", "noindex", "nofollow"]).astype(
            "int64"
        )

    out = pages.map_batches(audit, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_META_ROBOTS_AUDIT_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 9 IN (4, 5) THEN 1 ELSE 0 END AS BIGINT) AS noindex,
       CAST(CASE WHEN doc_id % 9 IN (5, 6) THEN 1 ELSE 0 END AS BIGINT) AS nofollow
FROM documents WHERE doc_id % 9 IN (4, 5, 6)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# registered_domain_stats — public-suffix (PSL) rollup
# --------------------------------------------------------------------------

#: Embedded public-suffix subset (the real PSL is ~9k rules; the algorithm —
#: longest label-suffix match, registered domain = one label left of it — is
#: identical, and the subset includes multi-label suffixes (co.uk, ac.jp) and
#: a private-section suffix (github.io) to exercise every branch).
_PSL = frozenset(
    {"com", "org", "uk", "co.uk", "io", "github.io", "jp", "ac.jp"}
)

_SUBS = ("", "www.", "blog.", "api.")
_SUFFIXES = ("com", "org", "co.uk", "github.io", "ac.jp")


def registered_domain(host: str) -> str:
    """Registered (pay-level) domain of ``host`` via longest public-suffix
    match: split into labels, find the longest suffix in the PSL, keep one
    label to its left. Hosts equal to a bare suffix return themselves."""
    labels = host.lower().split(".")
    best = 0
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        if cand in _PSL:
            best = len(labels) - i
            break  # labels scanned longest-suffix-first (leftmost start)
    if best == 0 or best >= len(labels):
        return host.lower()
    return ".".join(labels[len(labels) - best - 1 :])


def registered_domain_stats(sf_dir: str) -> pd.DataFrame:
    """Pay-level-domain rollup: page counts and distinct-host counts per
    REGISTERED domain (PSL longest-suffix-match — 'blog.brand3.co.uk' rolls
    to 'brand3.co.uk', 'brand3.github.io' stays whole because github.io is
    itself a public suffix). Scale shape: per-batch compaction to distinct
    (registered, host) pairs with page partial-counts, then a final rollup
    bounded by the number of distinct hosts — the page table never shuffles."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def hostify(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        hosts = [
            f"{_SUBS[int(x) % 4]}brand{int(x) % 41}.{_SUFFIXES[int(x) % 5]}"
            for x in d
        ]
        return pd.DataFrame(
            {
                "registered_domain": [registered_domain(h) for h in hosts],
                "host": hosts,
            }
        )

    per_host = grouped_aggregate(
        docs.map_batches(hostify, batch_format="pandas"),
        ["registered_domain", "host"],
        {"n_pages": (None, "count")},
    ).to_pandas()  # bounded by distinct hosts, never pages
    out = (
        per_host.groupby("registered_domain", sort=False)
        .agg(n_pages=("n_pages", "sum"), n_hosts=("host", "nunique"))
        .reset_index()
        .astype({"n_pages": "int64", "n_hosts": "int64"})
    )
    return out.sort_values("registered_domain").reset_index(drop=True)


_REGISTERED_DOMAIN_STATS_SQL = """
SELECT 'brand' || (doc_id % 41) || '.' ||
       CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk'
                       WHEN 3 THEN 'github.io' ELSE 'ac.jp' END
         AS registered_domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT doc_id % 4) AS BIGINT) AS n_hosts
FROM documents
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# word_blocklist_scores — UT1-style token blocklist scoring
# --------------------------------------------------------------------------

_BLOCKLIST = frozenset({"spark", "slow", "crash", "dup"})


def word_blocklist_scores(sf_dir: str) -> pd.DataFrame:
    """Soft blocklist filter (UT1/adult-list style): per document, the count
    and parts-per-million rate of blocklisted tokens under the corpus's
    whitespace tokenization. Integer ppm (floor) keeps the distributed result
    bit-exact against the SQL mirror. Vectorized: one exploded isin per
    batch, no Python per-row loop; pure map, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        ex = toks.explode()
        blocked = (
            ex.isin(_BLOCKLIST).groupby(level=0).sum().astype("int64")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n_tokens,
                "n_blocked": blocked.to_numpy(),
                "block_ppm": (1_000_000 * blocked.to_numpy()) // n_tokens.to_numpy(),
            }
        )

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_WORD_BLOCKLIST_SCORES_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ('spark', 'slow', 'crash', 'dup')))
              AS BIGINT) AS n_blocked
  FROM documents
)
SELECT doc_id, n_tokens, n_blocked,
       CAST((1000000 * n_blocked) // n_tokens AS BIGINT) AS block_ppm
FROM c ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# redirect_final_targets — pointer-doubling redirect resolution
# --------------------------------------------------------------------------

REDIRECT_MOD = 5  # chains d -> d-1 -> ... -> multiple-of-5 terminal

#: mappings at or below this row count resolve on the driver (numpy pointer
#: doubling over a sorted array); above it, distributed native-join rounds —
#: the same footer-metadata gate the dedup/window families use.
REDIRECT_SMALL_THRESHOLD = 2_000_000


def redirect_final_targets(
    sf_dir: str, small_threshold: int = REDIRECT_SMALL_THRESHOLD
) -> pd.DataFrame:
    """Redirect-chain resolution by POINTER DOUBLING: each round composes the
    current mapping with itself via one native hash join, so a chain of H
    hops resolves in ceil(log2 H) rounds — 2 rounds here (max 4 hops), 6
    rounds for 40-hop chains at crawl scale, vs H sequential joins for the
    naive walk. Terminals carry self-loops with hops=0 so composition is
    idempotent at the fixed points and hop counts add exactly.

    Fixture: page d redirects to d-1 unless d % 5 == 0 (terminal), giving
    chains of length d % 5 — the oracle closes the chain arithmetically while
    the Ray path must genuinely join.

    Adaptive per repo convention: when the parquet footer says the mapping
    fits on the driver (≤ ``small_threshold`` rows) the doubling runs as
    numpy searchsorted composition — same algorithm, zero shuffle; both
    paths are tested equal."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        term = d % REDIRECT_MOD == 0
        return pd.DataFrame(
            {
                "src": d,
                "dst": np.where(term, d, d - 1),
                "hops": np.where(term, 0, 1).astype("int64"),
            }
        )

    mapping = docs.map_batches(edges, batch_format="pandas")
    rounds = int(np.ceil(np.log2(max(REDIRECT_MOD - 1, 2))))
    resolved = pointer_double(
        mapping, rounds, small=(n_rows <= small_threshold)
    )
    out = resolved.rename(columns={"src": "doc_id", "dst": "final_doc_id"})
    out = out.astype({"doc_id": "int64", "final_doc_id": "int64", "hops": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def pointer_double(
    mapping: rd.Dataset, rounds: int, small: bool
) -> pd.DataFrame:
    """Resolve a (src, dst, hops) pointer table to its fixed points by
    POINTER DOUBLING: each round composes the mapping with itself, so
    chains of length H resolve in ceil(log2 H) rounds. Terminals must carry
    self-loops with hops=0 (composition is then idempotent at fixed points
    and hop counts add exactly), and every dst must exist as a src.

    ``small=True`` runs the doubling on the driver over sorted numpy arrays
    (searchsorted composition — zero shuffle); ``small=False`` runs each
    round as one native hash join — the caller picks via the same parquet-
    footer row-count gate the dedup/window families use. Both paths are
    asserted equal in tests."""
    if small:
        m = mapping.to_pandas()
        src = m["src"].to_numpy()
        order = np.argsort(src, kind="stable")
        src_s = src[order]
        dst = m["dst"].to_numpy()[order]
        hops = m["hops"].to_numpy()[order]
        for _ in range(rounds):
            ix = np.searchsorted(src_s, dst)
            dst, hops = dst[ix].copy(), hops + hops[ix]
        return pd.DataFrame({"src": src_s, "dst": dst, "hops": hops})

    for _ in range(rounds):
        right = mapping.map_batches(
            lambda df: df.rename(
                columns={"src": "jsrc", "dst": "jdst", "hops": "jhops"}
            ),
            batch_format="pandas",
        )
        joined = mapping.join(
            right,
            join_type="inner",
            num_partitions=8,
            on=("dst",),
            right_on=("jsrc",),
        )
        mapping = joined.map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": df["src"].astype("int64"),
                    "dst": df["jdst"].astype("int64"),
                    "hops": (df["hops"] + df["jhops"]).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
    return mapping.to_pandas()


_REDIRECT_FINAL_TARGETS_SQL = f"""
SELECT doc_id,
       CAST(doc_id - doc_id % {REDIRECT_MOD} AS BIGINT) AS final_doc_id,
       CAST(doc_id % {REDIRECT_MOD} AS BIGINT) AS hops
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# reciprocal_links — both-direction edge detection
# --------------------------------------------------------------------------


def reciprocal_links(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-link detection over the corpus link graph (the same
    deterministic graph as ``doc_pagerank``: d links to (17d + 13k) mod N,
    k = 1..3) — a classic link-spam signal. Each directed edge becomes an
    undirected (lo, hi) key with a direction bit; max-merged partials act as
    OR, so no edge-level dedup pass is needed and the shuffle carries one row
    per undirected pair per batch. Pairs with both bits set are reciprocal."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    ks = np.arange(1, 4, dtype="int64")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def pair_bits(df: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(df["doc_id"].to_numpy(), 3)
        dst = ((17 * df["doc_id"].to_numpy()[:, None] + 13 * ks[None, :]) % n).ravel()
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        fwd = (src < dst).astype("int64")
        return pd.DataFrame({"u": lo, "v": hi, "fwd": fwd, "rev": 1 - fwd})

    bits = grouped_aggregate(
        docs.map_batches(pair_bits, batch_format="pandas"),
        ["u", "v"],
        {"has_fwd": ("fwd", "max"), "has_rev": ("rev", "max")},
    ).to_pandas()
    out = bits[(bits["has_fwd"] == 1) & (bits["has_rev"] == 1)][["u", "v"]]
    out = out.astype({"u": "int64", "v": "int64"})
    return out.sort_values(["u", "v"]).reset_index(drop=True)


_RECIPROCAL_LINKS_SQL = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT doc_id AS src, (17 * doc_id + 13 * t.k) % (SELECT c FROM nn) AS dst
  FROM documents, (VALUES (1), (2), (3)) t(k)
),
p AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
  FROM e WHERE src <> dst GROUP BY 1, 2
)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v
FROM p WHERE f = 1 AND r = 1 ORDER BY u, v
"""


# --------------------------------------------------------------------------
# pagination_chains — multi-page article reassembly from rel=next links
# --------------------------------------------------------------------------

PAGINATION_SMALL_THRESHOLD = 2_000_000


def parse_rel_links(html: str) -> dict[str, str]:
    """``rel=next`` / ``rel=prev`` hrefs of a page's link tags (first of
    each wins) — the pagination channel; alternate/stylesheet links are a
    different rel and are ignored."""
    out: dict[str, str] = {}
    for tag in _LINK_RE.findall(html):
        a = _attrs(tag)
        rel = a.get("rel", "").lower()
        if rel in ("next", "prev") and rel not in out and "href" in a:
            out[rel] = a["href"]
    return out


def pagination_chains(
    sf_dir: str, small_threshold: int = PAGINATION_SMALL_THRESHOLD
) -> pd.DataFrame:
    """Multi-page article REASSEMBLY — the training-data operation behind
    'page 1 of 3' articles: discover chain structure from parsed
    ``rel=next`` links, resolve every page to its chain head by pointer
    doubling over the REVERSED (prev) pointers, then concatenate the
    chain's document texts in page order. A curation pipeline that skips
    this trains on article fragments.

    Stages, each with its at-scale shape: (1) link parse — pure map;
    (2) prev-pointer table — each next-link emits (target, source, 1),
    every page emits its own (d, d, 0) self-loop, one slim keyed
    ``map_sorted_runs`` keeps the real pointer per page; (3)
    ``pointer_double`` (footer-gated driver/distributed paths);
    (4) text attach — broadcast mapping below the gate, native hash join
    above; (5) ordered concat per chain — one vectorized call per sorted
    block. Chain ids must come out of the LINK structure, not arithmetic:
    the oracle rebuilds them arithmetically precisely to catch a parser
    or resolution slip."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    small = n_rows <= small_threshold
    pages = _annotated_pages(sf_dir)

    def prev_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            d = int(d)
            rows.append({"src": d, "dst": d, "hops": 0})  # self-loop
            nxt = parse_rel_links(bytes(payload).decode()).get("next")
            if nxt is not None:
                rows.append(
                    {"src": int(nxt.rsplit("/", 1)[-1]), "dst": d, "hops": 1}
                )
        return pd.DataFrame(rows, columns=["src", "dst", "hops"]).astype("int64")

    def keep_pointer(df: pd.DataFrame) -> pd.DataFrame:
        # per src: the prev edge (hops=1) if one exists, else the self-loop;
        # dangling next-links (target beyond the corpus) resolve against the
        # page set by construction: only rows whose src is a page matter,
        # and a src with no self-loop is not a page — drop it.
        df = df.sort_values(["src", "hops"], kind="mergesort")
        has_self = df[df["hops"] == 0]["src"].unique()
        df = df[np.isin(df["src"].to_numpy(), has_self)]
        return df.groupby("src", sort=False).tail(1)

    mapping = map_sorted_runs(
        pages.map_batches(prev_rows, batch_format="pandas"), "src", keep_pointer
    )
    # chains here are length ≤ 3 → 2 hops → 1 doubling round; real-world
    # pagination runs to dozens of pages: rounds = ceil(log2(max_hops)).
    resolved = pointer_double(mapping, rounds=1, small=small)
    resolved = resolved.rename(columns={"src": "doc_id", "dst": "chain_id", "hops": "pos"})

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if small:
        m_ref = ray.put(
            resolved.set_index("doc_id")[["chain_id", "pos"]].to_dict("index")
        )

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(m_ref)
            recs = [m[int(d)] for d in df["doc_id"]]
            return pd.DataFrame(
                {
                    "chain_id": [r["chain_id"] for r in recs],
                    "pos": [r["pos"] for r in recs],
                    "text": df["text"].to_numpy(),
                }
            )

        attached = docs.map_batches(attach, batch_format="pandas")
    else:
        attached = docs.join(
            rd.from_pandas(resolved),
            join_type="inner",
            num_partitions=8,
            on=("doc_id",),
        ).map_batches(
            lambda df: df[["chain_id", "pos", "text"]], batch_format="pandas"
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "chain_id": pd.Series([], dtype="int64"),
                    "n_parts": pd.Series([], dtype="int64"),
                    "combined_text": pd.Series([], dtype="object"),
                }
            )
        df = df.sort_values(["chain_id", "pos"], kind="mergesort")
        g = df.groupby("chain_id", sort=False)
        sizes = g.size()
        return pd.DataFrame(
            {
                "chain_id": sizes.index.to_numpy(),
                "n_parts": sizes.to_numpy(),
                "combined_text": g["text"].agg("\n".join).to_numpy(),
            }
        ).astype({"chain_id": "int64", "n_parts": "int64"})

    out = map_sorted_runs(attached, "chain_id", combine).to_pandas()
    return out.sort_values("chain_id").reset_index(drop=True)


_PAGINATION_CHAINS_SQL = """
SELECT CAST(3 * (doc_id // 3) AS BIGINT) AS chain_id,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       string_agg(text, chr(10) ORDER BY doc_id) AS combined_text
FROM documents GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# opengraph_meta — Open Graph social-card extraction
# --------------------------------------------------------------------------


def parse_opengraph(html: str) -> dict[str, str]:
    """``og:*`` properties of a page's ``<meta property=...>`` tags (first
    occurrence wins, per the OG crawler convention); ``name=`` metas —
    robots, description — are a different channel and are ignored."""
    out: dict[str, str] = {}
    for tag in _META_RE.findall(html):
        a = _attrs(tag)
        prop = a.get("property", "").lower()
        if prop.startswith("og:") and prop not in out:
            out[prop] = a.get("content", "")
    return out


def opengraph_meta(sf_dir: str) -> pd.DataFrame:
    """Open Graph social-card inventory: (doc_id, og_title, og_type,
    has_image) for pages that declare a card — the metadata layer
    dedup/quality pipelines mine for canonical titles and thumbnail URLs
    when the visible DOM is templated. Attribute order/quoting agnostic;
    pages without og tags (1 in 4 here) emit nothing. Pure map."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            og = parse_opengraph(bytes(payload).decode())
            if "og:title" not in og:
                continue
            rows.append(
                {
                    "doc_id": int(d),
                    "og_title": og["og:title"],
                    "og_type": og.get("og:type", ""),
                    "has_image": int("og:image" in og),
                }
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "og_title", "og_type", "has_image"]
        ).astype({"doc_id": "int64", "has_image": "int64"})

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_OPENGRAPH_META_SQL = """
SELECT doc_id,
       'OG ' || doc_id AS og_title,
       CASE doc_id % 3 WHEN 0 THEN 'article' WHEN 1 THEN 'product'
                       ELSE 'video.other' END AS og_type,
       CAST(CASE WHEN doc_id % 10 < 5 THEN 1 ELSE 0 END AS BIGINT) AS has_image
FROM documents WHERE doc_id % 4 <> 3
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# meta_refresh_targets — HTML-side redirects
# --------------------------------------------------------------------------

_META_REFRESH_CONTENT_RE = re.compile(
    r"^\s*(\d+)\s*;\s*url\s*=\s*(\S+)\s*$", re.IGNORECASE
)


def parse_meta_refresh(html: str) -> tuple[int, str] | None:
    """(delay_seconds, target_url) of the first ``http-equiv=refresh`` meta,
    or None — attribute order/case agnostic, tolerant content grammar
    (``N; url=...``). Robots/description metas are ignored."""
    for tag in _META_RE.findall(html):
        a = _attrs(tag)
        if a.get("http-equiv", "").lower() != "refresh":
            continue
        m = _META_REFRESH_CONTENT_RE.match(a.get("content", ""))
        if m:
            return int(m.group(1)), m.group(2)
    return None


def meta_refresh_targets(sf_dir: str) -> pd.DataFrame:
    """HTML-side redirect discovery: pages carrying
    ``<meta http-equiv=refresh content="N; url=...">`` — the client-side
    redirect channel HTTP-level resolution (``redirect_final_targets``)
    never sees; crawlers must parse it out of the payload or follow the
    wrong 'final' url. Emits (doc_id, delay_s, target_doc_id). Pure map."""
    pages = _annotated_pages(sf_dir)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, payload in zip(df["doc_id"], df["payload"]):
            hit = parse_meta_refresh(bytes(payload).decode())
            if hit is None:
                continue
            delay, target = hit
            tid = int(target.rsplit("/", 1)[-1])
            rows.append(
                {"doc_id": int(d), "delay_s": delay, "target_doc_id": tid}
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "delay_s", "target_doc_id"]
        ).astype("int64")

    out = pages.map_batches(extract, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_META_REFRESH_TARGETS_SQL = """
SELECT doc_id,
       CAST(doc_id % 30 AS BIGINT) AS delay_s,
       CAST(doc_id + 1 AS BIGINT) AS target_doc_id
FROM documents WHERE doc_id % 6 = 0
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# url_path_templates — digit-run path templating
# --------------------------------------------------------------------------


def spider_trap_urls(sf_dir: str) -> pd.DataFrame:
    """Crawler-trap detection over the frontier: flag URLs whose path
    repeats a segment run ≥3 times consecutively (calendar/session-id
    loops — the classic infinite-URL-space trap) or nests deeper than 8
    segments (path explosions). A frontier that doesn't gate these spends
    its politeness budget crawling one site's infinite calendar. Both
    rules are one vectorized regex / count over the path — no shuffle;
    loop beats depth when both fire (a loop IS the depth explanation).
    Emits (doc_id, url, trap_kind) for trapped URLs only."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for x in df["doc_id"]:
            d = int(x)
            k = d % 7
            if k == 0:
                path = "/cal" + "/2024/01" * (3 + d % 3)
            elif k == 1:
                path = "/" + "/".join(f"s{i}" for i in range(10))
            elif k == 2:
                path = f"/blog/2024/05/x{d}"
            else:
                path = f"/page/{d}"
            rows.append((d, f"https://site{d % 97}.example{path}", path))
        out = pd.DataFrame(rows, columns=["doc_id", "url", "path"])
        loop = out["path"].str.contains(_TRAP_LOOP_RE, regex=True)
        depth = out["path"].str.count("/") > 8
        out["trap_kind"] = np.where(loop, "loop", np.where(depth, "depth", ""))
        out = out[out["trap_kind"] != ""]
        return out[["doc_id", "url", "trap_kind"]].astype({"doc_id": "int64"})

    out = docs.map_batches(flags, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: a path segment run repeated ≥3 times back-to-back ("/2024/01/2024/01/…"
#: counts: the repeating UNIT may be multi-segment, caught by backreference)
_TRAP_LOOP_RE = r"(/[^/]+(?:/[^/]+)?)\1{2,}"

_SPIDER_TRAP_SQL = """
SELECT doc_id,
       'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example' ||
       CASE WHEN doc_id % 7 = 0
            THEN '/cal' || repeat('/2024/01', 3 + doc_id % 3)
            ELSE '/s0/s1/s2/s3/s4/s5/s6/s7/s8/s9' END AS url,
       CASE WHEN doc_id % 7 = 0 THEN 'loop' ELSE 'depth' END AS trap_kind
FROM documents WHERE doc_id % 7 IN (0, 1)
ORDER BY doc_id
"""


def url_path_templates(sf_dir: str) -> pd.DataFrame:
    """URL path-template mining: collapse digit runs to ``#`` and count pages
    per (host, template) — the classic crawl-side structure signal
    (``/product/#`` with 10M pages is a database-backed catalog; one-off
    paths are editorial). The Ray side REALLY parses: full URL strings are
    split with ``urlsplit`` and templated with a vectorized regex replace;
    the oracle reconstructs the same strings arithmetically. Rollup is a
    partial+final count bounded by distinct templates, never pages."""
    from urllib.parse import urlsplit

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def urls(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for x in df["doc_id"]:
            d = int(x)
            kind = d % 3
            if kind == 0:
                path = f"/product/{d}"
            elif kind == 1:
                path = f"/blog/2024/{d % 12 + 1:02d}/post-{d}"
            else:
                path = f"/u/{d}/profile"
            out.append(f"https://site{d % 97}.example{path}")
        return pd.DataFrame({"url": out})

    def template(df: pd.DataFrame) -> pd.DataFrame:
        parts = [urlsplit(u) for u in df["url"]]
        return pd.DataFrame(
            {
                "host": [p.hostname for p in parts],
                "template": pd.Series([p.path for p in parts]).str.replace(
                    r"[0-9]+", "#", regex=True
                ),
            }
        )

    out = grouped_aggregate(
        docs.map_batches(urls, batch_format="pandas").map_batches(
            template, batch_format="pandas"
        ),
        ["host", "template"],
        {"n_pages": (None, "count")},
    ).to_pandas()
    out = out.astype({"n_pages": "int64"})
    return out.sort_values(["host", "template"]).reset_index(drop=True)


_URL_PATH_TEMPLATES_SQL = """
WITH u AS (
  SELECT 'site' || (doc_id % 97) || '.example' AS host,
         CASE doc_id % 3
           WHEN 0 THEN '/product/' || doc_id
           WHEN 1 THEN '/blog/2024/' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                       || '/post-' || doc_id
           ELSE '/u/' || doc_id || '/profile'
         END AS path
  FROM documents
)
SELECT host, regexp_replace(path, '[0-9]+', '#', 'g') AS template,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# annotated_corpus_report — the annotation layer composed into curation
# --------------------------------------------------------------------------

ANNOT_BLOCK_PPM_MAX = 100_000


def annotated_corpus_report(sf_dir: str) -> pd.DataFrame:
    """The annotation layer composed into a curation verdict — the
    flagship-style use of this module: each page is judged by the FIRST
    failing filter (attribution semantics, like ``clean_filter_attribution``)
    in a fixed order: (1) robots ``noindex`` pages are unpublishable,
    (2) blocklist token rate above {ppm} ppm is unsafe, (3) pages without an
    ``og:title`` lack a canonical title for dedup keying; survivors are
    'kept'. Every signal is computed from a REAL parse/tokenization in ONE
    ``map_batches`` pass over (payload, text) — page bytes never shuffle;
    the verdict rollup is a 4-row grouped count."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def verdicts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64").to_numpy()
        ex = toks.explode()
        blocked = (
            ex.isin(_BLOCKLIST).groupby(level=0).sum().astype("int64").to_numpy()
        )
        ppm = (1_000_000 * blocked) // n_tokens
        out = []
        for d, p in zip(df["doc_id"], ppm):
            html = make_annotated_page(int(d)).decode()
            noindex, _ = parse_meta_robots(html)
            if noindex:
                out.append("noindex")
            elif p > ANNOT_BLOCK_PPM_MAX:
                out.append("blocklist")
            elif "og:title" not in parse_opengraph(html):
                out.append("no_og_title")
            else:
                out.append("kept")
        return pd.DataFrame({"verdict": out})

    out = grouped_aggregate(
        docs.map_batches(verdicts, batch_format="pandas"),
        ["verdict"],
        {"n_docs": (None, "count")},
    ).to_pandas()
    out = out.astype({"n_docs": "int64"})
    return out.sort_values("verdict").reset_index(drop=True)


annotated_corpus_report.__doc__ = annotated_corpus_report.__doc__.format(
    ppm=ANNOT_BLOCK_PPM_MAX
)

_ANNOTATED_CORPUS_REPORT_SQL = f"""
WITH c AS (
  SELECT doc_id,
         (1000000 * len(list_filter(string_split(text, ' '),
                                    x -> x IN ('spark', 'slow', 'crash', 'dup'))))
           // len(string_split(text, ' ')) AS ppm
  FROM documents
), cls AS (
  SELECT CASE
           WHEN doc_id % 9 IN (4, 5) THEN 'noindex'
           WHEN ppm > {ANNOT_BLOCK_PPM_MAX} THEN 'blocklist'
           WHEN doc_id % 4 = 3 THEN 'no_og_title'
           ELSE 'kept'
         END AS verdict
  FROM c
)
SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM cls GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# link_triangle_counts — triangle counting over the corpus link graph
# --------------------------------------------------------------------------

def link_triangle_counts(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle participation counts over the undirected corpus
    link graph (same deterministic graph as ``doc_pagerank`` /
    ``reciprocal_links``: d → (17d + 13k) mod N, k = 1..3). Triangle density
    separates organic neighborhoods from link farms — farms are bipartite-ish
    (many links, few closed triangles) — and is the classic clustering-
    coefficient numerator.

    Scale topology (the standard distributed node-iterator shape, all
    map_batches / sorted-run / slim-aggregate — no map_groups, no driver
    materialization of edges):
      1. DISTINCT undirected edges (u < v): one slim grouped aggregate.
      2. Wedge generation: edges sorted by u; each sorted BLOCK is processed
         in one vectorized call (repeat/cumsum index arithmetic — no
         per-node python). A triangle x<y<z is generated exactly once as
         the wedge (y, z) at its minimum node x.
      3. Wedge↔edge matching: wedges and edges share the pair key
         y·N + z; one sorted-run pass keeps wedge rows whose key-run also
         contains an edge row (vectorized per block via reduceat-style run
         maxima) — a sort-merge join with no hash table.
      4. Per-node counts: each triangle credits x, y and z; one final slim
         grouped count.
    Orientation by node id (u < v) is the degree-free variant; at true
    100 TB scale step 2's worst case is the max out-adjacency C(d,2) of a
    hub node, and the standard refinement — orient by (degree, id) using a
    broadcast degree sketch — drops into the same pipeline at step 1. The
    scalar pair key y·N + z fits int64 up to ~3·10⁹ nodes; beyond that the
    same sorted-run pass runs on the two-column sort key (y, z)."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    ks = np.arange(1, 4, dtype="int64")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def und_edges(df: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(df["doc_id"].to_numpy(), 3)
        dst = ((17 * df["doc_id"].to_numpy()[:, None] + 13 * ks[None, :]) % n).ravel()
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pd.DataFrame(
            {"u": np.minimum(src, dst), "v": np.maximum(src, dst)}
        )

    edges = grouped_aggregate(
        docs.map_batches(und_edges, batch_format="pandas"),
        ["u", "v"],
        {"m": (None, "count")},
    ).drop_columns(["m"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["u", "v"])
        u = d["u"].to_numpy()
        v = d["v"].to_numpy()
        new_run = np.empty(len(u), bool)
        if len(u):
            new_run[0] = True
            new_run[1:] = u[1:] != u[:-1]
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(len(u)), 0)
        )
        local_pos = np.arange(len(u)) - run_start
        # each row pairs (as z) with every EARLIER same-run row (as y)
        second = np.repeat(np.arange(len(u)), local_pos)
        offs = np.cumsum(local_pos) - local_pos
        within = np.arange(int(local_pos.sum())) - np.repeat(offs, local_pos)
        first = np.repeat(run_start, local_pos) + within
        return pd.DataFrame(
            {
                "pk": v[first] * n + v[second],
                "x": u[first],
                "is_edge": np.zeros(len(first), "int64"),
            }
        )

    wedge_ds = map_sorted_runs(edges, "u", wedges)

    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pk": df["u"].to_numpy() * n + df["v"].to_numpy(),
                "x": np.full(len(df), -1, "int64"),
                "is_edge": np.ones(len(df), "int64"),
            }
        )

    tagged = wedge_ds.union(edges.map_batches(edge_keys, batch_format="pandas"))

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("pk")
        pk = d["pk"].to_numpy()
        is_edge = d["is_edge"].to_numpy()
        if not len(pk):
            return pd.DataFrame({"node": np.empty(0, "int64")})
        run_id = np.concatenate([[0], np.cumsum(pk[1:] != pk[:-1])])
        run_has_edge = np.zeros(run_id[-1] + 1, "int64")
        np.maximum.at(run_has_edge, run_id, is_edge)
        keep = (is_edge == 0) & (run_has_edge[run_id] == 1)
        x = d["x"].to_numpy()[keep]
        y = (pk[keep] // n).astype("int64")
        z = (pk[keep] % n).astype("int64")
        return pd.DataFrame({"node": np.concatenate([x, y, z])})

    tri_nodes = map_sorted_runs(tagged, "pk", close_wedges)
    out = grouped_aggregate(
        tri_nodes, ["node"], {"n_triangles": (None, "count")}
    ).to_pandas()
    out = out.astype({"node": "int64", "n_triangles": "int64"})
    return out.sort_values("node").reset_index(drop=True)


_LINK_TRIANGLE_COUNTS_SQL = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e0 AS (
  SELECT doc_id AS src, (17 * doc_id + 13 * t.k) % (SELECT c FROM nn) AS dst
  FROM documents, (VALUES (1), (2), (3)) t(k)
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e0 WHERE src <> dst
),
tri AS (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM und a
  JOIN und b ON b.u = a.v
  JOIN und c ON c.u = a.u AND c.v = b.v
)
SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node
"""


_IMG_RE = re.compile(r"<img\b[^>]*>", re.I)


def parse_img_alts(html: str) -> list[tuple[str, str]]:
    """(src, alt) pairs of a page's <img> tags, in document order — the
    image–caption mining step behind CLIP/LAION-style multimodal corpora.
    Tags without BOTH a src and a non-empty alt are skipped (a caption
    pair needs both halves); attribute order/quoting handled by the shared
    attribute parser."""
    out = []
    for tag in _IMG_RE.findall(html):
        a = _attrs(tag)
        src = a.get("src", "").strip()
        alt = _WSX_RE.sub(" ", a.get("alt", "")).strip()
        if src and alt:
            out.append((src, alt))
    return out


_WSX_RE = re.compile(r"\s+")


def make_captioned_page(d: int) -> bytes:
    """Deterministic page with 1 + d%3 <img> tags (src/alt from doc id;
    every (d+i)%5==0 image has NO alt — excluded by the miner), a srcless
    decoy, and a stylesheet link decoy."""
    parts = [
        "<!doctype html>",
        f"<html><head><title>Cap {d}</title>",
        '<link rel="stylesheet" href="/css/x.css"></head><body>',
        '<img class="spacer">',  # srcless decoy
    ]
    for i in range(1 + d % 3):
        src = f"https://cdn{d % 7}.example/img/{d}_{i}.jpg"
        if (d + i) % 5 == 0:
            parts.append(f'<img src="{src}">')  # no alt → not a pair
        elif i % 2:
            parts.append(f"<img alt='caption {d} {i}' src='{src}'>")
        else:
            parts.append(f'<img src="{src}" alt="caption {d} {i}">')
    parts.append(f"<p>body {d}</p></body></html>")
    return "".join(parts).encode()


def img_alt_captions(sf_dir: str) -> pd.DataFrame:
    """Image–caption pair mining over the crawl: parse every page's <img>
    tags, keep (src, alt) pairs with both halves — the first step of a
    multimodal (image, text) training corpus. Pure per-page map_batches
    parse; output is one row per pair, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def mine(df: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, alts = [], [], []
        for d in df["doc_id"]:
            d = int(d)
            for src, alt in parse_img_alts(
                make_captioned_page(d).decode()
            ):
                ids.append(d)
                srcs.append(src)
                alts.append(alt)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"), "src": srcs,
             "alt": alts}
        )

    out = docs.map_batches(mine, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "src"]).reset_index(drop=True)


_IMG_ALT_CAPTIONS_SQL = """
WITH pairs AS (
  SELECT doc_id, i
  FROM documents, (VALUES (0), (1), (2)) t(i)
  WHERE i < 1 + doc_id % 3 AND (doc_id + i) % 5 <> 0
)
SELECT doc_id,
       'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.example/img/'
         || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR) || '.jpg'
         AS src,
       'caption ' || doc_id || ' ' || i AS alt
FROM pairs
"""


_HEADING_RE = re.compile(
    r"<h([1-6])\b[^>]*>(.*?)</h\1>", re.I | re.DOTALL
)


def parse_headings(html: str) -> list[tuple[int, str]]:
    """(level, text) of every h1–h6 in document order, inner tags stripped
    and whitespace collapsed — the document outline heading-aware chunkers
    and TOC builders read."""
    out = []
    for m in _HEADING_RE.finditer(html):
        text = _WSX_RE.sub(" ", re.sub(r"<[^>]*>", " ", m.group(2))).strip()
        if text:
            out.append((int(m.group(1)), text))
    return out


def make_outlined_page(d: int) -> bytes:
    """Deterministic page with a real outline: one h1, 1 + d%3 h2 sections
    each holding an h3 on odd ids; one heading carries an inline <em>
    (strip path) and one empty h4 decoy must be skipped."""
    parts = [
        "<!doctype html><html><body>",
        f"<h1>Title {d}</h1><h4>   </h4>",
    ]
    for i in range(1 + d % 3):
        if i % 2:
            parts.append(f"<h2>Section <em>{d}</em> {i}</h2>")
        else:
            parts.append(f"<h2>Section {d} {i}</h2>")
        parts.append(f"<p>text {d} {i}</p>")
        if d % 2:
            parts.append(f"<h3>Sub {d} {i}</h3><p>more</p>")
    parts.append("</body></html>")
    return "".join(parts).encode()


def heading_outline(sf_dir: str) -> pd.DataFrame:
    """Document outlines corpus-wide: ordered (doc_id, pos, level, heading)
    rows — the structure table heading-aware chunking, TOC extraction and
    section-level dedup read. Per-page parse, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def outline(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, levels, heads = [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            for p, (lvl, text) in enumerate(
                parse_headings(make_outlined_page(d).decode())
            ):
                ids.append(d)
                poss.append(p)
                levels.append(lvl)
                heads.append(text)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "level": pd.Series(levels, dtype="int64"),
                "heading": heads,
            }
        )

    out = docs.map_batches(outline, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


_HEADING_OUTLINE_SQL = """
WITH secs AS (
  SELECT doc_id, i
  FROM documents, (VALUES (0), (1), (2)) t(i)
  WHERE i < 1 + doc_id % 3
), rows_ AS (
  SELECT doc_id, -1 AS i, 0 AS sub, 1 AS level,
         'Title ' || doc_id AS heading
  FROM documents
  UNION ALL
  SELECT doc_id, i, 0 AS sub, 2 AS level,
         'Section ' || doc_id || ' ' || i AS heading
  FROM secs
  UNION ALL
  SELECT doc_id, i, 1 AS sub, 3 AS level,
         'Sub ' || doc_id || ' ' || i AS heading
  FROM secs WHERE doc_id % 2 = 1
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i, sub) - 1
            AS BIGINT) AS pos,
       CAST(level AS BIGINT) AS level,
       heading
FROM rows_
"""


def split_by_headings(html: str, level: int = 2) -> list[tuple[str, str]]:
    """(heading, section text) chunks: the page split at every heading of
    ``level`` or shallower, section text = the whitespace-collapsed text
    content (all markup stripped, deeper headings folded in) between one
    split heading and the next — heading-aware chunking for RAG/training
    windows that must not straddle section boundaries."""
    marks = [
        (m.start(), m.end(), int(m.group(1)),
         _WSX_RE.sub(" ", re.sub(r"<[^>]*>", " ", m.group(2))).strip())
        for m in _HEADING_RE.finditer(html)
    ]
    splits = [m for m in marks if m[2] <= level and m[3]]
    out = []
    for idx, (_s, e, _lvl, head) in enumerate(splits):
        end = splits[idx + 1][0] if idx + 1 < len(splits) else len(html)
        body = re.sub(r"<[^>]*>", " ", html[e:end])
        out.append((head, _WSX_RE.sub(" ", body).strip()))
    return out


def heading_chunks(sf_dir: str) -> pd.DataFrame:
    """Section-level chunks corpus-wide over the outlined fixture: one row
    per h≤2 section with its heading and the full text under it (deeper
    headings fold into the section). Per-page segmentation, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, heads, texts = [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            for i, (head, text) in enumerate(
                split_by_headings(make_outlined_page(d).decode())
            ):
                ids.append(d)
                idxs.append(i)
                heads.append(head)
                texts.append(text)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "section_idx": pd.Series(idxs, dtype="int64"),
                "heading": heads,
                "text": texts,
            }
        )

    out = docs.map_batches(chunks, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "section_idx"]).reset_index(drop=True)


#: fixture sections: the h1 chunk holds no body text (the empty h4 decoy
#: only); each h2 section holds 'text d i' plus, on odd docs, the folded
#: h3 'Sub d i' and its 'more' paragraph
_HEADING_CHUNKS_SQL = """
WITH secs AS (
  SELECT doc_id, i
  FROM documents, (VALUES (0), (1), (2)) t(i)
  WHERE i < 1 + doc_id % 3
), rows_ AS (
  SELECT doc_id, -1 AS i, 'Title ' || doc_id AS heading, '' AS text
  FROM documents
  UNION ALL
  SELECT doc_id, i,
         'Section ' || doc_id || ' ' || i AS heading,
         'text ' || doc_id || ' ' || i
           || CASE WHEN doc_id % 2 = 1
                   THEN ' Sub ' || doc_id || ' ' || i || ' more'
                   ELSE '' END AS text
  FROM secs
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1
            AS BIGINT) AS section_idx,
       heading, text
FROM rows_
"""


_DATA_URI_RE = re.compile(
    r"""src\s*=\s*["']data:([a-z/+.-]+);base64,([A-Za-z0-9+/=]+)["']""",
    re.I,
)


def parse_data_uris(html: str) -> list[tuple[str, bytes]]:
    """(mime, decoded bytes) for every base64 ``data:`` URI in src
    attributes — inline images never hit the fetcher, so a multimodal
    miner must pull them out of the page bytes themselves. Un-decodable
    base64 is skipped (one bad URI costs one URI)."""
    import base64

    out = []
    for m in _DATA_URI_RE.finditer(html):
        try:
            out.append((m.group(1).lower(), base64.b64decode(m.group(2))))
        except Exception:  # noqa: BLE001 — malformed b64 skips the URI
            continue
    return out


def data_uri_images(sf_dir: str) -> pd.DataFrame:
    """Inline-image extraction end-to-end: mine base64 ``data:`` URIs out
    of synthesized pages (one valid constant-pixel PNG per doc + a
    corrupt-base64 decoy every 9th doc), run the REAL PNG decoder on the
    decoded bytes, emit typed geometry — HTML parsing composed with the
    codec family in one per-page pass."""
    from ..stages.png_decode import decode_png, make_png

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def build_and_decode(df: pd.DataFrame) -> pd.DataFrame:
        import base64

        ids, widths, heights, bright = [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            png = make_png(
                np.full((2 + d % 5, 3 + d % 6), d % 256, dtype=np.uint8)
            )
            b64 = base64.b64encode(png).decode()
            page = (
                "<!doctype html><html><body>"
                f'<img src="data:image/png;base64,{b64}" alt="inline">'
                + ('<img src="data:image/png;base64,!!corrupt!!">'
                   if d % 9 == 0 else "")
                + "</body></html>"
            )
            for mime, blob in parse_data_uris(page):
                if mime != "image/png":
                    continue
                img = decode_png(blob)
                ids.append(d)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                bright.append(int(img.mean()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "brightness": pd.Series(bright, dtype="int64"),
            }
        )

    out = docs.map_batches(build_and_decode, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_DATA_URI_IMAGES_SQL = """
SELECT doc_id,
       3 + doc_id % 6 AS width,
       2 + doc_id % 5 AS height,
       doc_id % 256 AS brightness
FROM documents
"""


def media_corpus_report(sf_dir: str) -> pd.DataFrame:
    """The multimodal-curation flagship for the session-7 channels: one
    per-CDN-host report joining BOTH image sources a crawl carries —
    fetched images referenced by <img src> (with their alt captions) and
    inline ``data:`` URIs decoded through the real PNG decoder. Per cdn
    host: caption-pair count, docs-with-inline count, and the mean inline
    brightness (integer, floor). Both channels are parsed per page in one
    map each; the rollup is |cdn-hosts|-bounded."""
    from ..stages.png_decode import decode_png, make_png

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def channels(df: pd.DataFrame) -> pd.DataFrame:
        import base64

        rows = []
        for d in df["doc_id"]:
            d = int(d)
            # channel 1: <img src>/alt caption pairs (cdn from the src URL)
            for src, _alt in parse_img_alts(make_captioned_page(d).decode()):
                host = src.split("/")[2]
                rows.append((host, 1, 0, 0))
            # channel 2: inline data: URI, decoded for real
            png = make_png(
                np.full((2 + d % 5, 3 + d % 6), d % 256, dtype=np.uint8)
            )
            page = (
                "<!doctype html><body><img src=\"data:image/png;base64,"
                + base64.b64encode(png).decode()
                + '" alt="inline"></body>'
            )
            for mime, blob in parse_data_uris(page):
                if mime == "image/png":
                    img = decode_png(blob)
                    rows.append(
                        (f"cdn{d % 7}.example", 0, 1, int(img.mean()))
                    )
        return pd.DataFrame(
            rows, columns=["cdn_host", "n_pairs", "n_inline", "bright_sum"]
        )

    agg = grouped_aggregate(
        docs.map_batches(channels, batch_format="pandas"),
        ["cdn_host"],
        {
            "n_caption_pairs": ("n_pairs", "sum"),
            "n_inline_docs": ("n_inline", "sum"),
            "bright_total": ("bright_sum", "sum"),
        },
    ).to_pandas()
    agg = agg.astype(
        {"n_caption_pairs": "int64", "n_inline_docs": "int64",
         "bright_total": "int64"}
    )
    agg["mean_inline_brightness"] = (
        agg["bright_total"] // agg["n_inline_docs"].clip(lower=1)
    ).astype("int64")
    out = agg[
        ["cdn_host", "n_caption_pairs", "n_inline_docs",
         "mean_inline_brightness"]
    ]
    return out.sort_values("cdn_host").reset_index(drop=True)


_MEDIA_CORPUS_REPORT_SQL = """
WITH pairs AS (
  SELECT 'cdn' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS cdn_host
  FROM documents, (VALUES (0), (1), (2)) t(i)
  WHERE i < 1 + doc_id % 3 AND (doc_id + i) % 5 <> 0
), p AS (
  SELECT cdn_host, COUNT(*) AS n_caption_pairs FROM pairs GROUP BY cdn_host
), inline AS (
  SELECT 'cdn' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS cdn_host,
         COUNT(*) AS n_inline_docs,
         SUM(doc_id % 256) AS bright_total
  FROM documents GROUP BY 1
)
SELECT inline.cdn_host,
       CAST(COALESCE(p.n_caption_pairs, 0) AS BIGINT) AS n_caption_pairs,
       CAST(n_inline_docs AS BIGINT) AS n_inline_docs,
       CAST(bright_total // n_inline_docs AS BIGINT)
         AS mean_inline_brightness
FROM inline LEFT JOIN p ON p.cdn_host = inline.cdn_host
"""


#: Cyrillic homoglyphs that render like Latin a/e/o/p/c
_HOMOGLYPHS = "аеорс"


def host_script_audit(sf_dir: str) -> pd.DataFrame:
    """IDN-homograph detection over the crawl frontier: hosts whose LETTERS
    mix Unicode scripts (Latin + Cyrillic look-alikes) are the classic
    phishing/spoof vector and most registries forbid them — flag them
    before they enter a training corpus as 'distinct' domains. Fixture:
    every 31st doc's host carries one Cyrillic look-alike; the audit must
    flag exactly those. Vectorized per batch, no shuffle."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            d = int(d)
            host = f"site{d % 97}.example"
            if d % 31 == 0:  # inject one homoglyph (deterministic position)
                g = _HOMOGLYPHS[d % len(_HOMOGLYPHS)]
                host = host.replace("site", f"s{g}te", 1)
            letters = [c for c in host if c.isalpha()]
            has_latin = any("a" <= c.lower() <= "z" for c in letters)
            has_cyrillic = any("Ѐ" <= c <= "ӿ" for c in letters)
            rows.append((d, host, int(has_latin and has_cyrillic)))
        out = pd.DataFrame(rows, columns=["doc_id", "host", "mixed_script"])
        return out.astype({"doc_id": "int64", "mixed_script": "int64"})

    out = docs.map_batches(audit, batch_format="pandas").to_pandas()
    out = out[out["mixed_script"] == 1][["doc_id", "host"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def _host_script_audit_sql() -> str:
    # the injected glyph is _HOMOGLYPHS[doc_id % 5] — mirror with CASE
    cases = " ".join(
        f"WHEN {i} THEN 's{g}te'" for i, g in enumerate(_HOMOGLYPHS)
    )
    return f"""
SELECT doc_id,
       (CASE doc_id % {len(_HOMOGLYPHS)} {cases} END)
         || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host
FROM documents
WHERE doc_id % 31 = 0
"""


def idn_host_decode(sf_dir: str) -> pd.DataFrame:
    """Punycode (IDN) host normalization: crawl frontiers carry
    internationalized hostnames in their RFC 3492 ASCII form
    (``xn--…``); corpus-level host joins, PSL rollups, and the homograph
    audit all need the UNICODE form, so the frontier decodes each
    ``xn--`` label (stdlib idna codec) and flags hosts that change.
    Fixture: every 13th doc's host carries one Cyrillic look-alike label
    served in punycode; undecodable ``xn--`` labels pass through
    unchanged with ``decode_ok = 0`` (audited, not fatal). Vectorized
    per batch, no shuffle. Emits flagged hosts only: (doc_id,
    host_ascii, host_unicode)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for x in df["doc_id"]:
            d = int(x)
            if d % 13 != 0:
                continue
            uni_label = f"s{_HOMOGLYPHS[d % len(_HOMOGLYPHS)]}te"
            ascii_host = (
                uni_label.encode("idna").decode("ascii")
                + f".site{d % 97}.example"
            )
            decoded = []
            for label in ascii_host.split("."):
                if label.startswith("xn--"):
                    try:
                        label = label.encode("ascii").decode("idna")
                    except UnicodeError:
                        pass  # keep the ascii form; audited below
                decoded.append(label)
            rows.append((d, ascii_host, ".".join(decoded)))
        out = pd.DataFrame(
            rows, columns=["doc_id", "host_ascii", "host_unicode"]
        )
        return out.astype({"doc_id": "int64"})

    out = docs.map_batches(decode, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _idn_host_decode_sql() -> str:
    # the 5 possible punycode labels are CONSTANTS (the unicode label is
    # glyph-only, digits live in the next DNS label) — precompute them here
    # so the oracle pins the exact RFC 3492 form the Ray side must produce
    acases = " ".join(
        f"WHEN {i} THEN '{f's{g}te'.encode('idna').decode('ascii')}'"
        for i, g in enumerate(_HOMOGLYPHS)
    )
    ucases = " ".join(
        f"WHEN {i} THEN 's{g}te'" for i, g in enumerate(_HOMOGLYPHS)
    )
    return f"""
SELECT doc_id,
       (CASE doc_id % {len(_HOMOGLYPHS)} {acases} END) || '.site'
         || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host_ascii,
       (CASE doc_id % {len(_HOMOGLYPHS)} {ucases} END) || '.site'
         || CAST(doc_id % 97 AS VARCHAR) || '.example' AS host_unicode
FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id
"""


def clustering_coefficients(sf_dir: str) -> pd.DataFrame:
    """Per-node local clustering coefficient over the corpus link graph:
    cc = 2T / (d(d-1)) as integer ppm — the triangle family's standard
    normalization (link farms: high degree, near-zero cc). Reuses the
    distributed triangle pass; degrees come from one slim grouped count
    over the same distinct-edge table; both per-node tables are
    node-bounded, joined vectorized at the end."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    ks = np.arange(1, 4, dtype="int64")
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def und_ends(df: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(df["doc_id"].to_numpy(), 3)
        dst = ((17 * df["doc_id"].to_numpy()[:, None] + 13 * ks[None, :]) % n).ravel()
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pd.DataFrame(
            {"u": np.minimum(src, dst), "v": np.maximum(src, dst)}
        )

    # distinct undirected edges, then each end contributes one degree unit
    edges = grouped_aggregate(
        docs.map_batches(und_ends, batch_format="pandas"),
        ["u", "v"],
        {"m": (None, "count")},
    )

    def explode_ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])}
        )

    deg = grouped_aggregate(
        edges.map_batches(explode_ends, batch_format="pandas"),
        ["node"],
        {"degree": (None, "count")},
    ).to_pandas()
    tri = link_triangle_counts(sf_dir)
    out = deg.merge(tri, on="node", how="left").fillna({"n_triangles": 0})
    out = out.astype({"node": "int64", "degree": "int64", "n_triangles": "int64"})
    d = out["degree"].to_numpy()
    t = out["n_triangles"].to_numpy()
    cc = np.zeros(len(out), "int64")
    mask = d >= 2
    cc[mask] = (2 * t[mask] * 1_000_000) // (d[mask] * (d[mask] - 1))
    out["cc_ppm"] = cc
    return (
        out[["node", "degree", "n_triangles", "cc_ppm"]]
        .sort_values("node")
        .reset_index(drop=True)
    )


_CLUSTERING_COEFFICIENTS_SQL = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e0 AS (
  SELECT doc_id AS src, (17 * doc_id + 13 * t.k) % (SELECT c FROM nn) AS dst
  FROM documents, (VALUES (1), (2), (3)) t(k)
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und
  ) GROUP BY node
),
tri AS (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM und a JOIN und b ON b.u = a.v JOIN und c ON c.u = a.u AND c.v = b.v
),
tcount AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT CAST(deg.node AS BIGINT) AS node,
       CAST(degree AS BIGINT) AS degree,
       CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN degree >= 2
            THEN 2 * COALESCE(n_triangles, 0) * 1000000
                 // (degree * (degree - 1))
            ELSE 0 END AS cc_ppm
FROM deg LEFT JOIN tcount ON tcount.node = deg.node
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "clustering_coefficients": clustering_coefficients,
    "img_alt_captions": img_alt_captions,
    "data_uri_images": data_uri_images,
    "heading_outline": heading_outline,
    "media_corpus_report": media_corpus_report,
    "heading_chunks": heading_chunks,
    "host_script_audit": host_script_audit,
    "link_triangle_counts": link_triangle_counts,
    "annotated_corpus_report": annotated_corpus_report,
    "url_path_templates": url_path_templates,
    "meta_refresh_targets": meta_refresh_targets,
    "pagination_chains": pagination_chains,
    "opengraph_meta": opengraph_meta,
    "structured_data": structured_data,
    "microdata_items": microdata_items,
    "img_srcset_candidates": img_srcset_candidates,
    "spider_trap_urls": spider_trap_urls,
    "idn_host_decode": idn_host_decode,
    "canonical_clusters": canonical_clusters,
    "hreflang_clusters": hreflang_clusters,
    "meta_robots_audit": meta_robots_audit,
    "registered_domain_stats": registered_domain_stats,
    "word_blocklist_scores": word_blocklist_scores,
    "redirect_final_targets": redirect_final_targets,
    "reciprocal_links": reciprocal_links,
}

ORACLES: dict[str, str] = {
    "clustering_coefficients": _CLUSTERING_COEFFICIENTS_SQL,
    "img_alt_captions": _IMG_ALT_CAPTIONS_SQL,
    "data_uri_images": _DATA_URI_IMAGES_SQL,
    "heading_outline": _HEADING_OUTLINE_SQL,
    "media_corpus_report": _MEDIA_CORPUS_REPORT_SQL,
    "heading_chunks": _HEADING_CHUNKS_SQL,
    "host_script_audit": _host_script_audit_sql(),
    "link_triangle_counts": _LINK_TRIANGLE_COUNTS_SQL,
    "annotated_corpus_report": _ANNOTATED_CORPUS_REPORT_SQL,
    "url_path_templates": _URL_PATH_TEMPLATES_SQL,
    "meta_refresh_targets": _META_REFRESH_TARGETS_SQL,
    "pagination_chains": _PAGINATION_CHAINS_SQL,
    "opengraph_meta": _OPENGRAPH_META_SQL,
    "structured_data": _STRUCTURED_DATA_SQL,
    "microdata_items": _MICRODATA_ITEMS_SQL,
    "img_srcset_candidates": _IMG_SRCSET_SQL,
    "spider_trap_urls": _SPIDER_TRAP_SQL,
    "idn_host_decode": _idn_host_decode_sql(),
    "canonical_clusters": _CANONICAL_CLUSTERS_SQL,
    "hreflang_clusters": _HREFLANG_CLUSTERS_SQL,
    "meta_robots_audit": _META_ROBOTS_AUDIT_SQL,
    "registered_domain_stats": _REGISTERED_DOMAIN_STATS_SQL,
    "word_blocklist_scores": _WORD_BLOCKLIST_SCORES_SQL,
    "redirect_final_targets": _REDIRECT_FINAL_TARGETS_SQL,
    "reciprocal_links": _RECIPROCAL_LINKS_SQL,
}

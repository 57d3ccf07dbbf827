"""DOM-structure template clustering — the page-LAYOUT half of boilerplate
discovery (``host_template_lines`` finds repeated text; this finds repeated
MARKUP SHAPE, which survives even when every page's text differs).

CMS-generated sites render every page through a handful of templates, so
the tag-sequence fingerprint of a page clusters tightly per host; a page
whose fingerprint deviates from its host's majority template is either
hand-made (often the content page worth extracting) or injected (spam).
Template detection over the structure fingerprint is a standard web-corpus
curation step beside line-level boilerplate removal.

Reference grounding: generalizes the reference's per-document HTML handling
(/root/reference/src/simple_ocr/services/ocr_service.py:83-108 routes, no
cross-page analysis) to the cross-page structural layer, same as the other
annotation-family operators in ``webannot_queries.py``.

Fixture: ``make_templated_page`` renders one of four host-determined
templates (nav width, sidebar, paragraph count vary per template) with a
deterministic deviant page every 11th doc — so the DuckDB oracle can
reconstruct each page's exact tag sequence arithmetically while the Ray
side must parse the raw bytes for real.

Scale shape (100 TB):
- fingerprinting is per-page ``map_batches`` work (one compiled-regex tag
  scan + md5 per page) — embarrassingly parallel, no shuffle;
- ``dom_template_stats`` shuffles only (host, tpl_hash) count partials,
  bounded by hosts × templates, never pages;
- ``template_outlier_pages`` broadcasts the per-host majority-template
  table (same bound) back over the streaming page scan — zero page
  shuffle, the same broadcast-small-side topology as the decontamination
  family.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Callable

import pandas as pd
import ray
import ray.data as rd

from ..functions.agg import grouped_aggregate

#: structural tags captured by the fingerprint scan: every open/close tag,
#: attributes ignored, self-closing and void elements kept as written
_TAG_RE = re.compile(r"<(/?[a-z][a-z0-9]*)", re.I)

_N_HOSTS = 23
_N_TEMPLATES = 4


def make_templated_page(d: int) -> bytes:
    """Deterministic HTML page for doc ``d``: host site{d%23} renders its
    host-determined template t = (d%23)%4 — nav width 2+t links, a sidebar
    on odd t, 3+t body paragraphs — and every 11th doc injects an <aside>
    (the deviant a template miner must flag). Text content varies per doc
    so text hashing cannot stand in for structure hashing."""
    host = d % _N_HOSTS
    t = host % _N_TEMPLATES
    deviant = d % 11 == 0
    parts = [
        "<!doctype html>",
        f"<html><head><title>Page {d}</title></head>",
        "<body>",
        "<nav>" + "".join(
            f'<a href="/s{i}">sec {i}</a>' for i in range(2 + t)
        ) + "</nav>",
    ]
    if t % 2:
        parts.append('<div class="side"><ul><li>related</li></ul></div>')
    parts.append("<main>" + "".join(
        f"<p>body {d} para {i}</p>" for i in range(3 + t)
    ) + "</main>")
    if deviant:
        parts.append("<aside><p>injected promo</p></aside>")
    parts.append("<footer><p>footer</p></footer>")
    parts.append("</body></html>")
    return "".join(parts).encode()


def dom_fingerprint(html: bytes | str) -> str:
    """Tag-sequence md5 of a page: the order of every open/close tag with
    attributes and text stripped — the structure-only page identity."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "ignore")
    seq = "".join(m.group(1).lower() + ">" for m in _TAG_RE.finditer(html))
    return hashlib.md5(seq.encode()).hexdigest()


def _templated_pages(sf_dir: str) -> rd.Dataset:
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def build(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "host": [
                    f"site{int(d) % _N_HOSTS}.example" for d in df["doc_id"]
                ],
                "payload": [make_templated_page(int(d)) for d in df["doc_id"]],
            }
        )

    return docs.map_batches(build, batch_format="pandas")


def _fingerprints(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "host": df["host"],
            "tpl_hash": [dom_fingerprint(p) for p in df["payload"]],
        }
    )


def dom_template_stats(sf_dir: str) -> pd.DataFrame:
    """Per (host, structure fingerprint): page count — the template table a
    curation pass reads to pick each host's boilerplate shape. One slim
    (host, hash) count shuffle; pages never move."""
    agg = grouped_aggregate(
        _templated_pages(sf_dir),
        ["host", "tpl_hash"],
        {"n_pages": (None, "count")},
        prepare=lambda df: _fingerprints(df)[["host", "tpl_hash"]],
    ).to_pandas()
    agg["n_pages"] = agg["n_pages"].astype("int64")
    return agg.sort_values(["host", "tpl_hash"]).reset_index(drop=True)


def template_outlier_pages(sf_dir: str) -> pd.DataFrame:
    """Pages whose structure fingerprint is NOT their host's majority
    template — the injected/hand-made pages a template-aware extractor
    treats differently. The majority table (bounded by hosts × templates)
    is computed from count partials and BROADCAST back over a second
    streaming scan: pages are never shuffled.

    Ties break toward the lexicographically smallest hash (deterministic;
    a real corpus tie means a 50/50 host where 'majority' is arbitrary)."""
    pages = _templated_pages(sf_dir)
    counts = grouped_aggregate(
        pages,
        ["host", "tpl_hash"],
        {"n": (None, "count")},
        prepare=lambda df: _fingerprints(df)[["host", "tpl_hash"]],
    ).to_pandas()
    counts = counts.sort_values(
        ["host", "n", "tpl_hash"], ascending=[True, False, True]
    )
    majority = dict(
        zip(counts.drop_duplicates("host")["host"],
            counts.drop_duplicates("host")["tpl_hash"])
    )
    majority_ref = ray.put(majority)

    def outliers(df: pd.DataFrame) -> pd.DataFrame:
        maj = ray.get(majority_ref)
        fp = _fingerprints(df)
        keep = fp["tpl_hash"] != fp["host"].map(maj)
        return fp.loc[keep, ["doc_id", "host", "tpl_hash"]]

    out = (
        pages.map_batches(outliers, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


# --------------------------------------------------------------------------
# Oracles: reconstruct the exact tag sequence arithmetically
# --------------------------------------------------------------------------

#: the tag sequence make_templated_page emits, as a DuckDB expression over
#: template id t and the deviant flag — md5 of this string IS tpl_hash
_SEQ_EXPR = """
'html>head>title>/title>/head>body>nav>'
  || repeat('a>/a>', 2 + t) || '/nav>'
  || CASE WHEN t % 2 = 1 THEN 'div>ul>li>/li>/ul>/div>' ELSE '' END
  || 'main>' || repeat('p>/p>', 3 + t) || '/main>'
  || CASE WHEN deviant THEN 'aside>p>/p>/aside>' ELSE '' END
  || 'footer>p>/p>/footer>/body>/html>'
"""

_DOM_TEMPLATE_STATS_SQL = f"""
WITH fp AS (
  SELECT 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.example' AS host,
         md5({_SEQ_EXPR}) AS tpl_hash
  FROM (SELECT doc_id, (doc_id % {_N_HOSTS}) % {_N_TEMPLATES} AS t,
               doc_id % 11 = 0 AS deviant
        FROM documents)
)
SELECT host, tpl_hash, COUNT(*) AS n_pages
FROM fp GROUP BY host, tpl_hash
"""

_TEMPLATE_OUTLIER_PAGES_SQL = f"""
WITH fp AS (
  SELECT doc_id,
         'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.example' AS host,
         md5({_SEQ_EXPR}) AS tpl_hash
  FROM (SELECT doc_id, (doc_id % {_N_HOSTS}) % {_N_TEMPLATES} AS t,
               doc_id % 11 = 0 AS deviant
        FROM documents)
),
maj AS (
  SELECT host, tpl_hash,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY COUNT(*) DESC, tpl_hash) AS r
  FROM fp GROUP BY host, tpl_hash
)
SELECT fp.doc_id, fp.host, fp.tpl_hash
FROM fp JOIN maj ON maj.host = fp.host AND maj.r = 1
WHERE fp.tpl_hash <> maj.tpl_hash
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "dom_template_stats": dom_template_stats,
    "template_outlier_pages": template_outlier_pages,
}

ORACLES: dict[str, str] = {
    "dom_template_stats": _DOM_TEMPLATE_STATS_SQL,
    "template_outlier_pages": _TEMPLATE_OUTLIER_PAGES_SQL,
}

"""Secondary-channel payload operators: MP3 (MPEG-1 Layer III + ID3v2)
audio metadata, RDFa Lite triples, and HTML form audits.

A web crawl is not only HTML article pages: audio files carry tag
metadata, RDFa is the third in-markup structured-data syntax next to
JSON-LD and Microdata (`webannot_queries.py`), and form structure
(password fields, file uploads) is a page-type signal every corpus filter
wants (login walls and upload portals are not training text). (RSS/Atom
feed discovery already lives in `extract_queries.feed_entries`.)

Reference grounding: the reference routes every payload by content type and
stops at markdown per document (`/root/reference/src/simple_ocr/services/
ocr_service.py:222-242`); these operators extend that router's reach to the
sidecar content types a Common-Crawl-scale corpus actually contains.

House fixture rule (see `webannot_queries.py` module docstring): payloads
are synthesized deterministically from ``doc_id`` per batch — the Ray side
must genuinely parse XML / MPEG bitstreams / HTML, while the DuckDB oracle
reconstructs the expected output arithmetically.

Scale shape (100 TB): every operator here is a pure per-page ``map_batches``
parse — embarrassingly parallel, no shuffle at any scale; output rows are
slim (metadata only, payloads never leave the parsing task).
"""

from __future__ import annotations

import os
from html.parser import HTMLParser
from typing import Callable

import pandas as pd
import ray.data as rd

from ..stages.mp3_frames import parse_mp3, synth_mp3

# --------------------------------------------------------------------------
# Shared doc source
# --------------------------------------------------------------------------


def _doc_ids(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )


# --------------------------------------------------------------------------
# mp3_meta — MPEG-1 Layer III frame walk + ID3v2 tags
# --------------------------------------------------------------------------


def mp3_meta(sf_dir: str) -> pd.DataFrame:
    """Audio metadata via the real frame-header walk
    (`stages/mp3_frames.py`): (doc_id, title, artist, frame_count,
    sample_rate, duration_ms, avg_bitrate_kbps, truncated). The streams are
    VBR — a parser that trusts frame 0's bitrate gets the duration wrong —
    and one doc in ten ends mid-frame (connection-reset capture)."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            rows.append({"doc_id": int(d), **parse_mp3(synth_mp3(int(d)))})
        out = pd.DataFrame(rows)
        for c in ("frame_count", "sample_rate", "duration_ms", "avg_bitrate_kbps"):
            out[c] = out[c].astype("int64")
        return out.astype({"doc_id": "int64", "truncated": "bool"})

    out = (
        _doc_ids(sf_dir)
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_MP3_META_SQL = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, 7 + doc_id % 9)) AS i
  FROM documents
), br AS (
  SELECT doc_id, i,
         ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
           [1 + (doc_id + i) % 14] AS kbps
  FROM f
), agg AS (
  SELECT doc_id, COUNT(*) AS frame_count, SUM(kbps) AS kbps_sum
  FROM br GROUP BY doc_id
)
SELECT a.doc_id,
       'Track ' || a.doc_id AS title,
       'Artist ' || (a.doc_id % 23) AS artist,
       a.frame_count,
       CASE a.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
            ELSE 32000 END AS sample_rate,
       a.frame_count * 1152 * 1000
         // CASE a.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                 ELSE 32000 END AS duration_ms,
       CAST(a.kbps_sum // a.frame_count AS BIGINT) AS avg_bitrate_kbps,
       a.doc_id % 10 = 7 AS truncated
FROM agg a
ORDER BY a.doc_id
"""


# --------------------------------------------------------------------------
# rdfa_triples — RDFa Lite extraction (third in-markup structured-data
# syntax next to JSON-LD and Microdata)
# --------------------------------------------------------------------------


def make_rdfa_page(d: int) -> bytes:
    """Deterministic RDFa Lite page for doc ``d``: an Article subject with a
    nested Person (the nesting trap — ``name`` belongs to the Person, and
    the ``author`` property's value is the nested subject's type), a
    ``<meta property content>`` literal, an ``<a property href>`` whose
    value is the href (not the anchor text), and an orphan ``property``
    with no subject ancestor that must be ignored. Quote style and
    attribute order vary with ``d``."""
    q = '"' if d % 2 == 0 else "'"
    parts = [
        "<!doctype html>",
        f"<html><head><title>R {d}</title></head><body>",
        f"<div vocab={q}https://schema.org/{q} typeof={q}Article{q}>",
        f"<h1 property={q}headline{q}>Headline {d}</h1>",
        f"<span typeof={q}Person{q} property={q}author{q}>",
        f"<span property={q}name{q}>Author {d % 23}</span>",
        "</span>",
    ]
    if d % 4 != 1:
        parts.append(f"<meta property={q}wordCount{q} content={q}{d % 1000}{q}>")
    parts.append(
        f"<a property={q}url{q} href={q}https://site{d % 97}.example/"
        f"{d:08d}{q}>permalink text (not the value)</a>"
    )
    parts.append("</div>")
    parts.append(f"<span property={q}orphan{q}>no subject ancestor</span>")
    parts.append("</body></html>")
    return "\n".join(parts).encode()


_RDFA_VOID = {"meta", "link", "img", "br", "hr", "input", "source"}


def parse_rdfa(html: str) -> list[dict]:
    """RDFa Lite subset: ``typeof`` opens a subject; ``property`` attaches a
    literal to the NEAREST ancestor subject — ``<meta>`` contributes its
    ``content``, ``<a>``/``<link>`` contribute ``href``, an element carrying
    both ``property`` and ``typeof`` contributes the nested subject's type
    and opens that subject, and any other element contributes its collapsed
    inner text. A ``property`` with no subject ancestor is skipped (this
    implementation does not model the document-node subject)."""

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.rows: list[dict] = []
            # frame: [tag, subject_type_or_None, prop_or_None, text_buf]
            self.stack: list[list] = []

        def _subject(self) -> str | None:
            for fr in reversed(self.stack):
                if fr[1] is not None:
                    return fr[1]
            return None

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            typeof = a.get("typeof")
            prop = a.get("property")
            owner = self._subject()
            if typeof is not None:
                if prop and owner is not None:
                    self.rows.append(
                        {"subj_type": owner, "prop": prop, "value": typeof}
                    )
                if tag not in _RDFA_VOID:
                    self.stack.append([tag, typeof, None, None])
                return
            if prop and owner is not None:
                if tag == "meta":
                    self.rows.append(
                        {
                            "subj_type": owner,
                            "prop": prop,
                            "value": a.get("content", ""),
                        }
                    )
                    return
                if tag in ("a", "link") and "href" in a:
                    self.rows.append(
                        {"subj_type": owner, "prop": prop, "value": a["href"]}
                    )
                    if tag not in _RDFA_VOID:
                        self.stack.append([tag, None, None, None])
                    return
                if tag not in _RDFA_VOID:
                    self.stack.append([tag, None, prop, []])
                    return
            if tag not in _RDFA_VOID:
                self.stack.append([tag, None, None, None])

        def handle_data(self, data):
            # text belongs to EVERY open property element (a property's
            # value includes its descendants' text, e.g. "Jane <b>Doe</b>")
            for fr in self.stack:
                if fr[3] is not None:
                    fr[3].append(data)

        def handle_endtag(self, tag):
            # stray close tags (real-web HTML) are ignored rather than
            # popping — and losing — every open subject frame
            if not any(fr[0] == tag for fr in self.stack):
                return
            while self.stack:
                fr = self.stack.pop()
                if fr[2] is not None:
                    owner = self._subject()
                    if owner is not None:
                        self.rows.append(
                            {
                                "subj_type": owner,
                                "prop": fr[2],
                                "value": " ".join("".join(fr[3]).split()),
                            }
                        )
                if fr[0] == tag:
                    break

    p = P()
    p.feed(html)
    return p.rows


def rdfa_triples(sf_dir: str) -> pd.DataFrame:
    """RDFa Lite inventory: (doc_id, subj_type, prop, value) per extracted
    triple. Completes the structured-data trio (JSON-LD `structured_data`,
    Microdata `microdata_items`)."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            for r in parse_rdfa(make_rdfa_page(int(d)).decode()):
                rows.append({"doc_id": int(d), **r})
        return pd.DataFrame(
            rows, columns=["doc_id", "subj_type", "prop", "value"]
        ).astype({"doc_id": "int64"})

    out = (
        _doc_ids(sf_dir)
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
    )
    # value participates in the sort keys: a subject may legitimately repeat
    # a property (two rows with identical (doc_id, subj_type, prop)), and
    # pandas' default quicksort is unstable — without the tiebreaker the row
    # order (and any hash compare) would be nondeterministic on both sides
    return out.sort_values(
        ["doc_id", "subj_type", "prop", "value"]
    ).reset_index(drop=True)


_RDFA_TRIPLES_SQL = """
SELECT doc_id, 'Article' AS subj_type, 'headline' AS prop,
       'Headline ' || doc_id AS value FROM documents
UNION ALL
SELECT doc_id, 'Article', 'author', 'Person' FROM documents
UNION ALL
SELECT doc_id, 'Person', 'name', 'Author ' || (doc_id % 23) FROM documents
UNION ALL
SELECT doc_id, 'Article', 'wordCount', CAST(doc_id % 1000 AS VARCHAR)
FROM documents WHERE doc_id % 4 <> 1
UNION ALL
SELECT doc_id, 'Article', 'url',
       'https://site' || (doc_id % 97) || '.example/'
         || lpad(CAST(doc_id AS VARCHAR), 8, '0')
FROM documents
ORDER BY doc_id, subj_type, prop, value
"""


# --------------------------------------------------------------------------
# html_forms — form structure audit (login walls / upload portals)
# --------------------------------------------------------------------------


def make_form_page(d: int) -> bytes:
    """Deterministic form page for doc ``d``: ``1 + d % 3`` forms; form ``f``
    has key ``m = 3d + f``. Method attribute rotates case and is absent one
    time in five (spec default = GET); field mix includes hidden CSRF
    inputs, a password field when ``m % 5 == 0``, a file upload when
    ``m % 7 == 3``, textarea/select variants, plus decoys: an ``<input>``
    OUTSIDE any form and a ``<button>`` (not an input)."""
    parts = ["<!doctype html>", f"<html><body><h1>Page {d}</h1>"]
    parts.append('<input type="text" name="orphan-outside-any-form">')
    for f in range(1 + d % 3):
        m = 3 * d + f
        method = ("post", "POST", "get", "Get", None)[m % 5]
        mattr = f' method="{method}"' if method is not None else ""
        parts.append(f'<form action="/submit/{m}"{mattr}>')
        for j in range(2 + m % 3):
            parts.append(f'<input type="text" name="q{j}">')
        parts.append(f'<input type="hidden" name="csrf" value="t{m}">')
        if m % 5 == 0:
            parts.append('<input type="PASSWORD" name="pw">')
        if m % 7 == 3:
            parts.append('<input name="up" type="file">')
        if m % 4 == 0:
            parts.append('<textarea name="msg"></textarea>')
        if m % 4 == 2:
            parts.append(
                '<select name="opt"><option>a</option><option>b</option></select>'
            )
        parts.append("<button>not an input</button>")
        parts.append("</form>")
    parts.append("</body></html>")
    return "\n".join(parts).encode()


def parse_forms(html: str) -> list[dict]:
    """Form inventory of one page: method (uppercased; GET when absent, per
    the HTML spec default), action, input/textarea/select counts, and the
    password / file-upload signals. Fields belong to the nearest open form
    (HTML forbids nested forms); fields outside any form are ignored."""

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.rows: list[dict] = []
            self.cur: dict | None = None

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "form":
                # nested <form> start while one is open: browsers ignore the
                # nested open tag's nesting and effectively close the outer
                # form — flush the open form instead of silently dropping it
                if self.cur is not None:
                    self.rows.append(self.cur)
                self.cur = {
                    "form_idx": len(self.rows),
                    "method": (a.get("method") or "get").upper(),
                    "action": a.get("action") or "",
                    "n_inputs": 0,
                    "n_fields": 0,
                    "has_password": False,
                    "has_file": False,
                }
                return
            if self.cur is None:
                return
            if tag == "input":
                t = (a.get("type") or "text").lower()
                self.cur["n_inputs"] += 1
                self.cur["n_fields"] += 1
                if t == "password":
                    self.cur["has_password"] = True
                if t == "file":
                    self.cur["has_file"] = True
            elif tag in ("textarea", "select"):
                self.cur["n_fields"] += 1

        def handle_endtag(self, tag):
            if tag == "form" and self.cur is not None:
                self.rows.append(self.cur)
                self.cur = None

        def close(self) -> None:
            super().close()
            # a form never closed by </form> still exists in the browser's
            # DOM — flush it rather than dropping it at feed end
            if self.cur is not None:
                self.rows.append(self.cur)
                self.cur = None

    p = P()
    p.feed(html)
    p.close()
    return p.rows


def html_forms(sf_dir: str) -> pd.DataFrame:
    """Form audit: (doc_id, form_idx, method, action, n_inputs, n_fields,
    has_password, has_file) per form — the login-wall / upload-portal
    page-type signal a corpus filter reads before keeping a page's text."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            for r in parse_forms(make_form_page(int(d)).decode()):
                rows.append({"doc_id": int(d), **r})
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "form_idx", "method", "action", "n_inputs",
                "n_fields", "has_password", "has_file",
            ],
        ).astype(
            {
                "doc_id": "int64", "form_idx": "int64",
                "n_inputs": "int64", "n_fields": "int64",
                "has_password": "bool", "has_file": "bool",
            }
        )

    out = (
        _doc_ids(sf_dir)
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "form_idx"]).reset_index(drop=True)


_HTML_FORMS_SQL = """
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, doc_id % 3)) AS fi
  FROM documents
), k AS (
  SELECT doc_id, fi, 3 * doc_id + fi AS m FROM f
)
SELECT doc_id,
       fi AS form_idx,
       CASE WHEN m % 5 IN (0, 1) THEN 'POST' ELSE 'GET' END AS method,
       '/submit/' || m AS action,
       (2 + m % 3) + 1
         + CASE WHEN m % 5 = 0 THEN 1 ELSE 0 END
         + CASE WHEN m % 7 = 3 THEN 1 ELSE 0 END AS n_inputs,
       (2 + m % 3) + 1
         + CASE WHEN m % 5 = 0 THEN 1 ELSE 0 END
         + CASE WHEN m % 7 = 3 THEN 1 ELSE 0 END
         + CASE WHEN m % 4 IN (0, 2) THEN 1 ELSE 0 END AS n_fields,
       m % 5 = 0 AS has_password,
       m % 7 = 3 AS has_file
FROM k
ORDER BY doc_id, form_idx
"""





# --------------------------------------------------------------------------
# article_publish_dates — multi-channel publish-date extraction
# --------------------------------------------------------------------------

_DATE_BASE = 1_577_836_800  # 2020-01-01T00:00:00Z


def _iso(epoch_s: int, zulu: bool) -> str:
    from datetime import datetime, timezone

    s = datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )
    return s + ("Z" if zulu else "+00:00")


def make_dated_page(d: int) -> bytes:
    """Deterministic page for doc ``d`` carrying up to four publish-date
    channels, each with a DIFFERENT timestamp so precedence is observable:
    JSON-LD ``datePublished`` (+3 h; MALFORMED when ``d % 9 == 0`` — the
    parser must fall through), ``article:published_time`` meta (+2 h),
    ``<time datetime>`` (+1 h), and a date-pathed canonical URL (+0).
    Channel presence varies per doc; ISO suffix rotates Z / +00:00; decoys:
    a ``<time>`` with no datetime attribute and a plain script."""
    base = _DATE_BASE + (d % 1000) * 86400
    zulu = d % 2 == 0
    parts = ["<!doctype html>", "<html><head>", f"<title>Dated {d}</title>"]
    if d % 7 != 4:
        from datetime import datetime, timezone

        dt = datetime.fromtimestamp(base, tz=timezone.utc)
        parts.append(
            f'<link rel="canonical" href="https://site{d % 97}.example/'
            f'{dt:%Y/%m/%d}/post-{d}">'
        )
    else:
        parts.append(
            f'<link rel="canonical" href="https://site{d % 97}.example/p/{d}">'
        )
    if d % 4 != 2:
        parts.append(
            '<meta property="article:published_time" '
            f'content="{_iso(base + 7200, zulu)}">'
        )
    if d % 3 != 1:
        bad = "," if d % 9 == 0 else ""
        parts.append(
            '<script type="application/ld+json">'
            '{"@context":"https://schema.org","@type":"Article",'
            f'"datePublished":"{_iso(base + 10800, zulu)}"{bad}}}'
            "</script>"
        )
    parts.append("<script>var decoy=1;</script>")
    parts.append("</head><body>")
    if d % 5 != 3:
        parts.append(
            f'<time datetime="{_iso(base + 3600, zulu)}">posted</time>'
        )
    parts.append("<time>yesterday</time>")  # decoy: no datetime attribute
    parts.append(f"<p>body {d}</p></body></html>")
    return "\n".join(parts).encode()


_URL_DATE_RE = None  # compiled lazily so the module imports without re


def parse_publish_date(html: str) -> tuple[str, int]:
    """(channel, epoch_s) for one page under the published precedence used
    by crawl-recency pipelines: valid JSON-LD ``datePublished`` →
    ``article:published_time`` meta → first ``<time datetime>`` → a
    ``/YYYY/MM/DD/`` canonical-URL path → ('none', -1). A malformed
    JSON-LD block is SKIPPED, not fatal (one bad annotation costs one
    channel, never the row)."""
    import json as _json
    import re as _re
    from datetime import datetime, timezone

    global _URL_DATE_RE
    if _URL_DATE_RE is None:
        _URL_DATE_RE = _re.compile(r"/(\d{4})/(\d{2})/(\d{2})/")

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.in_ldjson = False
            self.ld_blocks: list[str] = []
            self.og: str | None = None
            self.time_dt: str | None = None
            self.canonical: str | None = None

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "script" and a.get("type") == "application/ld+json":
                self.in_ldjson = True
                self.ld_blocks.append("")
            elif tag == "meta" and a.get("property") == "article:published_time":
                if self.og is None:
                    self.og = a.get("content")
            elif tag == "time" and "datetime" in a and self.time_dt is None:
                self.time_dt = a["datetime"]
            elif tag == "link" and a.get("rel") == "canonical":
                self.canonical = a.get("href")

        def handle_data(self, data):
            if self.in_ldjson:
                self.ld_blocks[-1] += data

        def handle_endtag(self, tag):
            if tag == "script":
                self.in_ldjson = False

    def iso_epoch(s) -> int | None:
        """None on any malformed value — one bad annotation costs one
        CHANNEL (falls through to the next), never the row."""
        try:
            return int(
                datetime.fromisoformat(str(s).replace("Z", "+00:00")).timestamp()
            )
        except (ValueError, TypeError):
            return None

    p = P()
    p.feed(html)
    for block in p.ld_blocks:
        try:
            obj = _json.loads(block)
        except ValueError:
            continue  # malformed annotation: skip this channel
        if isinstance(obj, dict) and "datePublished" in obj:
            ep = iso_epoch(obj["datePublished"])
            if ep is not None:
                return "jsonld", ep
    for channel, raw in (("og", p.og), ("time", p.time_dt)):
        if raw:
            ep = iso_epoch(raw)
            if ep is not None:
                return channel, ep
    if p.canonical:
        m = _URL_DATE_RE.search(p.canonical)
        if m:
            y, mo, dy = map(int, m.groups())
            try:
                return "url", int(
                    datetime(y, mo, dy, tzinfo=timezone.utc).timestamp()
                )
            except ValueError:
                pass  # /2024/13/99/-style non-dates: not a date channel
    return "none", -1


def article_publish_dates(sf_dir: str) -> pd.DataFrame:
    """Publish-date inventory: (doc_id, channel, pub_epoch_s) per page —
    the recency signal corpus-refresh weighting reads. Pure per-page map;
    the fixture's channels disagree by construction, so a parser with the
    wrong precedence (or one that trusts a malformed JSON-LD block)
    hash-mismatches."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            ch, ep = parse_publish_date(make_dated_page(int(d)).decode())
            rows.append(
                {"doc_id": int(d), "channel": ch, "pub_epoch_s": ep}
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "channel", "pub_epoch_s"]
        ).astype({"doc_id": "int64", "pub_epoch_s": "int64"})

    out = (
        _doc_ids(sf_dir)
        .map_batches(extract, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_ARTICLE_PUBLISH_DATES_SQL = f"""
WITH b AS (
  SELECT doc_id,
         {_DATE_BASE} + (doc_id % 1000) * 86400 AS base
  FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 3 <> 1 AND doc_id % 9 <> 0 THEN 'jsonld'
            WHEN doc_id % 4 <> 2 THEN 'og'
            WHEN doc_id % 5 <> 3 THEN 'time'
            WHEN doc_id % 7 <> 4 THEN 'url'
            ELSE 'none' END AS channel,
       CASE WHEN doc_id % 3 <> 1 AND doc_id % 9 <> 0 THEN base + 10800
            WHEN doc_id % 4 <> 2 THEN base + 7200
            WHEN doc_id % 5 <> 3 THEN base + 3600
            WHEN doc_id % 7 <> 4 THEN base
            ELSE -1 END AS pub_epoch_s
FROM b
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# content_type_mismatch — server-declared MIME vs magic-byte sniff
# --------------------------------------------------------------------------

_CTM_KINDS = ("html", "png", "pdf", "gif")
_CTM_MIME = {
    "html": "text/html",
    "png": "image/png",
    "pdf": "application/pdf",
    "gif": "image/gif",
}


def make_typed_payload(d: int) -> tuple[str, bytes]:
    """(declared_mime, payload) for doc ``d``: the payload's REAL kind is
    ``d % 4``; one doc in five declares the WRONG Content-Type (the next
    kind over) — exactly the lying-server shape a crawl-quality audit
    exists to catch."""
    kind = _CTM_KINDS[d % 4]
    if kind == "html":
        body = f"<!doctype html><html><body><p>doc {d}</p></body></html>"
        payload = body.encode()
    elif kind == "png":
        payload = b"\x89PNG\r\n\x1a\n" + bytes((d + i) % 256 for i in range(16))
    elif kind == "pdf":
        payload = f"%PDF-1.4\n% doc {d}\n".encode()
    else:
        payload = b"GIF89a" + bytes((d + i) % 256 for i in range(8))
    declared_kind = _CTM_KINDS[(d + 1) % 4] if d % 5 == 3 else kind
    return _CTM_MIME[declared_kind], payload


def content_type_mismatch(sf_dir: str) -> pd.DataFrame:
    """Declared-vs-sniffed Content-Type audit: (doc_id, declared_mime,
    sniffed_type, mismatch). The sniff is the REAL router sniff
    (`reference_semantics.sniff_bytes` — the same function the flagship
    routes on), so this audit is exactly what the pipeline would do with
    each payload regardless of what the server claimed."""
    from ..reference_semantics import CONTENT_TYPE_TO_MIME, sniff_bytes

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            declared, payload = make_typed_payload(int(d))
            sniffed = sniff_bytes(payload)
            rows.append(
                {
                    "doc_id": int(d),
                    "declared_mime": declared,
                    "sniffed_type": sniffed,
                    "mismatch": CONTENT_TYPE_TO_MIME.get(sniffed) != declared,
                }
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "declared_mime", "sniffed_type", "mismatch"],
        ).astype({"doc_id": "int64", "mismatch": "bool"})

    out = (
        _doc_ids(sf_dir)
        .map_batches(audit, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_CONTENT_TYPE_MISMATCH_SQL = """
WITH k AS (
  SELECT doc_id,
         (['html','png','pdf','gif'])[1 + doc_id % 4] AS real_kind,
         (['html','png','pdf','gif'])
           [1 + (doc_id + CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) % 4]
           AS declared_kind
  FROM documents
), m AS (
  SELECT doc_id, real_kind, declared_kind,
         CASE declared_kind WHEN 'html' THEN 'text/html'
              WHEN 'png' THEN 'image/png' WHEN 'pdf' THEN 'application/pdf'
              ELSE 'image/gif' END AS declared_mime
  FROM k
)
SELECT doc_id, declared_mime, real_kind AS sniffed_type,
       real_kind <> declared_kind AS mismatch
FROM m ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# mixed_content_audit — https pages loading http subresources
# --------------------------------------------------------------------------


def make_https_page(d: int) -> bytes:
    """https-served page for doc ``d``: two https images and one https
    script always; an http image (``d % 4 == 0``), http script
    (``d % 6 == 2``), http stylesheet (``d % 8 == 5``), and a
    protocol-relative image (``d % 3 == 1`` — NOT mixed content, it
    inherits the page scheme). Decoys: an ``<a href=http://…>`` (links
    are navigations, not subresources) and a non-stylesheet ``<link>``."""
    parts = [
        "<!doctype html>",
        f"<html><head><title>S {d}</title>",
        f'<script src="https://cdn{d % 7}.example/app.js"></script>',
        '<link rel="preconnect" href="http://ignored.example">',
    ]
    if d % 8 == 5:
        parts.append(
            f'<link rel="stylesheet" href="http://cdn{d % 7}.example/s.css">'
        )
    parts.append("</head><body>")
    parts.append(f'<img src="https://img{d % 11}.example/a/{d}.jpg">')
    parts.append(f'<img src="https://img{d % 11}.example/b/{d}.jpg">')
    if d % 4 == 0:
        parts.append(f'<img src="http://legacy{d % 5}.example/old/{d}.gif">')
    if d % 6 == 2:
        parts.append(f'<script src="http://ads{d % 3}.example/t.js"></script>')
    if d % 3 == 1:
        parts.append(f'<img src="//cdn{d % 7}.example/rel/{d}.png">')
    parts.append(f'<a href="http://other{d % 9}.example/next">link decoy</a>')
    parts.append("</body></html>")
    return "\n".join(parts).encode()


_SUBRESOURCE_TAGS = {"img", "script", "iframe", "source", "audio", "video"}


def parse_mixed_content(html: str) -> dict:
    """Subresource scheme census for one https page: src of
    img/script/iframe/source/audio/video plus stylesheet links; anchors
    are navigations and never counted. Returns http / https /
    protocol-relative counts and the mixed-content flag."""

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.urls: list[str] = []

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag in _SUBRESOURCE_TAGS and a.get("src"):
                self.urls.append(a["src"])
            elif tag == "link" and a.get("rel") == "stylesheet" and a.get("href"):
                self.urls.append(a["href"])

    p = P()
    p.feed(html)
    n_http = sum(1 for u in p.urls if u.startswith("http://"))
    n_https = sum(1 for u in p.urls if u.startswith("https://"))
    n_protorel = sum(1 for u in p.urls if u.startswith("//"))
    return {
        "n_http": n_http,
        "n_https": n_https,
        "n_protorel": n_protorel,
        "has_mixed": n_http > 0,
    }


def mixed_content_audit(sf_dir: str) -> pd.DataFrame:
    """Mixed-content audit over https pages: (doc_id, n_http, n_https,
    n_protorel, has_mixed) — the page-integrity signal browsers block on
    and corpus curation downweights. Pure per-page map."""

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            r = parse_mixed_content(make_https_page(int(d)).decode())
            rows.append({"doc_id": int(d), **r})
        return pd.DataFrame(
            rows,
            columns=["doc_id", "n_http", "n_https", "n_protorel", "has_mixed"],
        ).astype(
            {"doc_id": "int64", "n_http": "int64", "n_https": "int64",
             "n_protorel": "int64", "has_mixed": "bool"}
        )

    out = (
        _doc_ids(sf_dir)
        .map_batches(audit, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_MIXED_CONTENT_AUDIT_SQL = """
SELECT doc_id,
       (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
        + CASE WHEN doc_id % 6 = 2 THEN 1 ELSE 0 END
        + CASE WHEN doc_id % 8 = 5 THEN 1 ELSE 0 END) AS n_http,
       3 AS n_https,
       CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS n_protorel,
       (doc_id % 4 = 0 OR doc_id % 6 = 2 OR doc_id % 8 = 5) AS has_mixed
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ai_optout_audit — machine-readable training opt-outs (noai / TDMRep)
# --------------------------------------------------------------------------


def make_optout_page(d: int) -> tuple[bytes, str]:
    """(html, raw response headers) for doc ``d`` carrying the three
    machine-readable AI-training opt-out channels a compliant corpus
    pipeline must honor: ``<meta name=robots>`` tokens ``noai`` /
    ``noimageai`` (mixed into normal directive lists, case varied), the
    W3C TDM Reservation Protocol meta pair (``tdm-reservation`` 1/0 +
    optional ``tdm-policy``), and an ``X-Robots-Tag: noai`` response
    header. Decoys: a description meta containing the word 'noai' and an
    unrelated header."""
    parts = ["<!doctype html>", f"<html><head><title>O {d}</title>"]
    parts.append('<meta name="description" content="noai is just a word here">')
    robots_tokens = []
    if d % 9 == 6:
        robots_tokens.append("noindex")
    if d % 5 == 0:
        robots_tokens.append("NoAI" if d % 2 == 0 else "noai")
    if d % 7 == 2:
        robots_tokens.append("noimageai")
    if robots_tokens:
        parts.append(f'<meta name="robots" content="{", ".join(robots_tokens)}">')
    if d % 4 == 1:
        parts.append('<meta name="tdm-reservation" content="1">')
        if d % 8 == 1:
            parts.append(
                f'<meta name="tdm-policy" content="https://site{d % 97}.example/policy.json">'
            )
    elif d % 4 == 3:
        parts.append('<meta name="tdm-reservation" content="0">')
    parts.append(f"</head><body><p>body {d}</p></body></html>")
    headers = "Content-Type: text/html\r\nServer: synth\r\n"
    if d % 6 == 4:
        headers += "X-Robots-Tag: noai\r\n"
    return "\n".join(parts).encode(), headers


def parse_optout(html: str, headers: str) -> dict:
    """Merged opt-out flags for one response: meta-robots tokens and the
    X-Robots-Tag header are BOTH consulted (a page is opted out if either
    channel says so — the conservative reading a compliant trainer takes);
    TDM reservation is the explicit ``tdm-reservation == "1"`` only."""

    class P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.robots: list[str] = []
            self.tdm: str | None = None
            self.policy: str | None = None

        def handle_starttag(self, tag, attrs):
            if tag != "meta":
                return
            a = dict(attrs)
            name = (a.get("name") or "").lower()
            if name == "robots":
                self.robots += [
                    t.strip().lower()
                    for t in (a.get("content") or "").split(",")
                ]
            elif name == "tdm-reservation":
                self.tdm = (a.get("content") or "").strip()
            elif name == "tdm-policy":
                self.policy = a.get("content")

    p = P()
    p.feed(html)
    header_tokens: list[str] = []
    for line in headers.split("\r\n"):
        k, _, v = line.partition(":")
        if k.strip().lower() == "x-robots-tag":
            header_tokens += [t.strip().lower() for t in v.split(",")]
    tokens = set(p.robots) | set(header_tokens)
    noai = "noai" in tokens
    noimageai = "noimageai" in tokens
    tdm_reserved = p.tdm == "1"
    return {
        "noai": noai,
        "noimageai": noimageai,
        "tdm_reserved": tdm_reserved,
        "has_policy": tdm_reserved and p.policy is not None,
        "optout_any": noai or noimageai or tdm_reserved,
    }


def ai_optout_audit(sf_dir: str) -> pd.DataFrame:
    """Training-opt-out census: (doc_id, noai, noimageai, tdm_reserved,
    has_policy, optout_any) per page — the governance filter a compliant
    training-data pipeline applies BEFORE any quality filter. Pure
    per-page map, no shuffle."""

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"]:
            html, headers = make_optout_page(int(d))
            rows.append({"doc_id": int(d), **parse_optout(html.decode(), headers)})
        cols = ["doc_id", "noai", "noimageai", "tdm_reserved", "has_policy",
                "optout_any"]
        out = pd.DataFrame(rows, columns=cols)
        return out.astype({c: "bool" for c in cols[1:]}).astype({"doc_id": "int64"})

    out = (
        _doc_ids(sf_dir)
        .map_batches(audit, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_AI_OPTOUT_AUDIT_SQL = """
SELECT doc_id,
       (doc_id % 5 = 0 OR doc_id % 6 = 4) AS noai,
       doc_id % 7 = 2 AS noimageai,
       doc_id % 4 = 1 AS tdm_reserved,
       (doc_id % 4 = 1 AND doc_id % 8 = 1) AS has_policy,
       (doc_id % 5 = 0 OR doc_id % 6 = 4 OR doc_id % 7 = 2
        OR doc_id % 4 = 1) AS optout_any
FROM documents ORDER BY doc_id
"""


QUERIES: dict[str, Callable] = {
    "mp3_meta": mp3_meta,
    "rdfa_triples": rdfa_triples,
    "html_forms": html_forms,
    "article_publish_dates": article_publish_dates,
    "content_type_mismatch": content_type_mismatch,
    "mixed_content_audit": mixed_content_audit,
    "ai_optout_audit": ai_optout_audit,
}

ORACLES: dict[str, str] = {
    "mp3_meta": _MP3_META_SQL,
    "rdfa_triples": _RDFA_TRIPLES_SQL,
    "html_forms": _HTML_FORMS_SQL,
    "article_publish_dates": _ARTICLE_PUBLISH_DATES_SQL,
    "content_type_mismatch": _CONTENT_TYPE_MISMATCH_SQL,
    "mixed_content_audit": _MIXED_CONTENT_AUDIT_SQL,
    "ai_optout_audit": _AI_OPTOUT_AUDIT_SQL,
}

"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

``BASELINE.json`` input_hint: ``pages(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)``. No such table ships in
/root/testdata, so we derive one *deterministically* from the existing
``documents`` table (seed-free: every byte is a pure function of
``doc_id/text/lang/n_chars``), which lets DuckDB oracles reproduce the
expected outputs with plain SQL over ``documents``.

Payload classes (FIXTURES.md §1; fractions via ``doc_id % 20``):
  * doc_id%20 in {0,1}  → PDF-like  (10%): b"%PDF-1.4\\n" + b"x"*(n_chars*50)
                          — the reference's own fake-PDF fixture shape
                          (/root/reference/tests/conftest.py:36-40), sized to
                          exercise the 50 KB/page estimator.
  * doc_id%20 == 2      → image-like (5%): PNG magic + b"x"*n_chars.
  * doc_id%20 == 3      → garbage    (5%): unsupported payload → failed row.
  * else                → HTML       (80%): boilerplate (head/script/style/
                          nav/sidebar/aside/footer) wrapping the document
                          text in an <article><p>; the extractor must strip
                          the boilerplate and reproduce ``text`` byte-exactly.

SQL mirrors (used by __ray_entry__.oracle_sql):
  url         = 'https://site' || (doc_id % 97) || '.example/' || lpad(doc_id, 8, '0')
  pdf size    = 9 + n_chars * 50
  image size  = 8 + n_chars
  page_count  = greatest(1, (9 + n_chars*50) // 51200)
"""

from __future__ import annotations

import hashlib as _hashlib
import os
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

SYNTH_VERSION = 3
N_HOSTS = 97
_EPOCH_US = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_HTML_TEMPLATE = (
    "<!doctype html>\n"
    '<html lang="{lang}">\n'
    "<head>\n"
    "<title>Document {doc_id}</title>\n"
    '<meta charset="utf-8">\n'
    "<style>body{{margin:0;font:16px serif}}.nav a{{color:#06c}}</style>\n"
    '<script>var page={doc_id};function track(){{return "hit-"+page;}}</script>\n'
    "</head>\n"
    "<body>\n"
    "<header><h1>site{host} portal</h1>"
    '<nav class="nav"><a href="/">home</a> <a href="/news">latest news</a> '
    '<a href="/about">about us</a> <a href="/login">sign in</a></nav></header>\n'
    '<div class="side"><ul>'
    '<li><a href="/rel/1">related article one</a></li>'
    '<li><a href="/rel/2">related article two</a></li>'
    '<li><a href="/rel/3">trending story three</a></li>'
    "</ul></div>\n"
    "<article>\n{body}\n</article>\n"
    "<aside>subscribe to our newsletter for weekly updates and special offers</aside>\n"
    "<footer><p>copyright 2024 site{host} media "
    '<a href="/terms">terms</a> <a href="/privacy">privacy</a></p></footer>\n'
    '<script>console.log("footer loaded");</script>\n'
    "</body>\n"
    "</html>\n"
)


def url_for(doc_id: int) -> str:
    return f"https://site{doc_id % N_HOSTS}.example/{doc_id:08d}"


def payload_class(doc_id: int) -> str:
    m = doc_id % 20
    if m in (0, 1):
        return "pdf"
    if m == 2:
        return "image"
    if m == 3:
        return "garbage"
    return "html"


def real_pdf_page_texts(doc_id: int, text: str) -> list[str]:
    """Per-page text of the REAL PDF payload for ``doc_id`` (richness=1):
    1 + doc_id % 3 pages — page 1 is the document text, later pages are
    'page N'. SQL mirror: a CASE on doc_id % 3 (see extract_queries)."""
    k = 1 + doc_id % 3
    return [text] + [f"page {p}" for p in range(2, k + 1)]


def real_png_pixels(doc_id: int, richness: int = 1):
    """Constant-pixel array of the REAL PNG payload for ``doc_id``:
    (4 + doc_id % 7) × (16 + doc_id % 9) at value doc_id % 256 — every
    decoded property (width/height/channels/mean brightness) is a pure
    function of doc_id, so the oracle is plain SQL. ``richness`` scales
    both dimensions (bench-only; oracles use richness=1)."""
    import numpy as np

    return np.full(
        ((4 + doc_id % 7) * richness, (16 + doc_id % 9) * richness),
        doc_id % 256,
        dtype=np.uint8,
    )


def make_payload(
    doc_id: int,
    text: str,
    lang: str,
    n_chars: int,
    richness: int = 1,
    real_payloads: bool = False,
) -> bytes:
    """``richness`` multiplies the main-content size: the article holds that
    many paragraphs (the base text each time). richness=1 (default, used by
    all oracle queries) keeps extracted text == ``documents.text`` byte-exact;
    the bench uses richer pages so parse work per page matches real
    Common-Crawl article sizes.

    ``real_payloads=True`` swaps the magic-bytes-only PDF/PNG fixtures for
    VALID documents the real decoders (stages/pdf_text.py,
    stages/png_decode.py) fully parse — the corpus the flagship
    ``preset="real"`` route runs on. HTML and garbage rows are identical in
    both modes; the real-PDF extracted text and real-PNG metadata remain
    pure functions of (doc_id, text), so the SQL oracles still hold."""
    cls = payload_class(doc_id)
    if cls == "pdf":
        if real_payloads:
            from ..stages.pdf_text import make_minimal_pdf

            return make_minimal_pdf(
                [[t] * richness for t in real_pdf_page_texts(doc_id, text)]
            )
        return b"%PDF-1.4\n" + b"x" * (n_chars * 50 * richness)
    if cls == "image":
        if real_payloads:
            from ..stages.png_decode import make_png

            return make_png(real_png_pixels(doc_id, richness))
        return b"\x89PNG\r\n\x1a\n" + b"x" * (n_chars * richness)
    if cls == "garbage":
        return b"GARBAGE\x00payload " + text.encode("utf-8")[:64]
    body = "\n".join(f"<p>{text}</p>" for _ in range(richness))
    return _HTML_TEMPLATE.format(
        doc_id=doc_id, host=doc_id % N_HOSTS, lang=lang, body=body
    ).encode("utf-8")


#: recrawl fixture: every doc_id % recrawl_every == RECRAWL_RESIDUE gets a
#: SECOND snapshot 30 days later whose main text is text || RECRAWL_SUFFIX —
#: the Common-Crawl re-crawl shape (same url, newer warc_ts, changed content)
RECRAWL_RESIDUE = 11
RECRAWL_OFFSET_US = 30 * 86400 * 1_000_000
RECRAWL_SUFFIX = " updated"
#: unchanged re-crawl fixture: ``doc_id % recrawl_same_every ==
#: RECRAWL_SAME_RESIDUE`` gets a SECOND snapshot 30 days later with
#: IDENTICAL content — the no-op re-crawl shape (same url, newer warc_ts,
#: byte-identical page) a change-rate report must classify as unchanged.
RECRAWL_SAME_RESIDUE = 23


def pages_table_from_documents(
    documents: pa.Table,
    duplicate_every: int = 0,
    richness: int = 1,
    recrawl_every: int = 0,
    recrawl_same_every: int = 0,
    real_payloads: bool = False,
) -> pa.Table:
    """Build the pages table from a documents table (pure function).

    ``duplicate_every > 0`` additionally re-emits every row whose
    ``doc_id % duplicate_every == 7`` (at-least-once delivery fixture for the
    exact-dedup operator; SQL mirror: UNION ALL of that slice).

    ``recrawl_every > 0`` additionally emits a NEWER snapshot (warc_ts +
    30 days, text suffixed with ``RECRAWL_SUFFIX``) for every row whose
    ``doc_id % recrawl_every == RECRAWL_RESIDUE`` — the re-crawl fixture for
    latest-snapshot dedup; SQL mirror: CASE on the same residue.

    ``recrawl_same_every > 0`` additionally emits a NEWER snapshot with
    UNCHANGED content for every row whose ``doc_id % recrawl_same_every ==
    RECRAWL_SAME_RESIDUE`` — the no-op re-crawl fixture for change-rate
    reports; SQL mirror: the residue alone (content provably identical).
    """
    doc_ids = documents["doc_id"].to_pylist()
    texts = documents["text"].to_pylist()
    langs = documents["lang"].to_pylist()
    n_chars = documents["n_chars"].to_pylist()

    urls: list[str] = []
    ts: list[int] = []
    payloads: list[bytes] = []
    out_text: list[str] = []
    out_lang: list[str] = []

    def emit(i: int, ts_offset_us: int = 0, text_suffix: str = "") -> None:
        d = doc_ids[i]
        txt = texts[i] + text_suffix
        urls.append(url_for(d))
        ts.append(_EPOCH_US + d * 1_000_000 + ts_offset_us)
        payloads.append(
            make_payload(
                d, txt, langs[i], n_chars[i], richness,
                real_payloads=real_payloads,
            )
        )
        out_text.append(txt if payload_class(d) == "html" else "")
        out_lang.append(langs[i])

    for i in range(len(doc_ids)):
        emit(i)
        if duplicate_every and doc_ids[i] % duplicate_every == 7:
            emit(i)
        if recrawl_every and doc_ids[i] % recrawl_every == RECRAWL_RESIDUE:
            emit(i, RECRAWL_OFFSET_US, RECRAWL_SUFFIX)
        if (
            recrawl_same_every
            and doc_ids[i] % recrawl_same_every == RECRAWL_SAME_RESIDUE
        ):
            emit(i, RECRAWL_OFFSET_US)

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(payloads, pa.binary()),
            pa.array(out_text, pa.string()),
            pa.array(out_lang, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def synth_pages_parquet(
    sf_dir: str,
    out_root: str = "/tmp/scor_pages",
    num_files: int = 8,
    duplicate_every: int = 0,
    recrawl_every: int = 0,
    recrawl_same_every: int = 0,
    real_payloads: bool = False,
) -> str:
    """Materialize (once) the pages table derived from ``{sf_dir}/documents.parquet``
    as a directory of parquet files; returns the directory path.

    The cache is keyed by sf dir, synthesis version, and dup setting, and is
    written atomically (temp dir + rename) so concurrent/killed runs are safe.
    """
    # the basename alone would alias two corpora at different paths that
    # share a leaf name (e.g. /a/sf0.001 vs /b/sf0.001) — include a short
    # digest of the normalized absolute path, PLUS the source table's
    # mtime+size so a regenerated documents.parquet under the same path
    # can never serve stale synthesized pages
    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(abs_dir, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        stamp = "nostat"
    path_tag = _hashlib.blake2b(f"{abs_dir}|{stamp}".encode(), digest_size=4).hexdigest()
    key = (
        f"{os.path.basename(abs_dir)}_{path_tag}"
        f"_v{SYNTH_VERSION}_dup{duplicate_every}"
        + (f"_rc{recrawl_every}" if recrawl_every else "")
        + (f"_rs{recrawl_same_every}" if recrawl_same_every else "")
        + ("_real" if real_payloads else "")
    )
    out_dir = os.path.join(out_root, key)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    table = pages_table_from_documents(
        documents,
        duplicate_every=duplicate_every,
        recrawl_every=recrawl_every,
        recrawl_same_every=recrawl_same_every,
        real_payloads=real_payloads,
    )

    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    n = table.num_rows
    files = max(1, min(num_files, n))
    step = (n + files - 1) // files
    for f in range(files):
        chunk = table.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(tmp_dir, f"part-{f:05d}.parquet"))
    with open(os.path.join(tmp_dir, "_DONE"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # Another process won the race; its output is equivalent.
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir

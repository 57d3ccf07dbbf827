"""Minimal from-scratch PDF TEXT extraction — a real decoder behind the
engine seam, zero external dependencies.

The reference's PDF path rasterizes pages with pypdfium2 and OCRs them
(/root/reference/src/simple_ocr/adapters/deepseek_engine.py:268-300); that
library is absent here, so the repo's default PDF route synthesizes page
text. This module closes part of that gap with an honest-to-goodness parser
for the embedded-text subset of PDF (uncompressed content streams, Tj/TJ
show-text operators) — the same subset `pdftotext`-class tools handle
without rendering:

* object table: ``N 0 obj ... endobj`` scanned positionally (no xref
  needed — xref is an optimization, the objects are self-delimiting);
* page objects: ``/Type /Page`` with a ``/Contents N 0 R`` reference;
* content streams: bytes between ``stream``/``endstream`` of the referenced
  object; unfiltered and ``/FlateDecode`` (stdlib zlib — the compression
  virtually every real-world PDF uses) are decoded; other filters
  (DCTDecode, LZWDecode, ASCII85…) raise ``UnsupportedPdfError``, the
  explicit seam where a codec-equipped build would plug in;
* text: ``(string) Tj`` / ``' `` / ``"``, hex strings ``<4869> Tj``, and
  ``[(a) -120 (b)] TJ`` inside ``BT``/``ET`` blocks, with PDF string
  escapes (\\n, \\( … and \\ooo octal) decoded; a ``Td``/``TD``/``T*``
  vertical move emits a newline.

Per-row work is a single linear scan of the payload — the engine runs
inside the same actor pool as every other engine (stages/extract.py), so
the plumbing (binary column in, text + page_count out, failures become
failed ROWS) is identical to the reference path.
"""

from __future__ import annotations

import re

from .engines import EngineResult

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_STREAM_START_RE = re.compile(rb"stream(?:\r\n|\n|\r)")
#: direct /Length only — an indirect "/Length 5 0 R" falls back to delimiting
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_FILTER_RE = re.compile(rb"/Filter\b")
_FLATE_ONLY_RE = re.compile(
    rb"/Filter\s*(?:/FlateDecode\b|\[\s*/FlateDecode\s*\])"
)
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
#: show-text ops: (s) Tj · (s) ' · (s) " · <hex> Tj · [ ... ] TJ — and moves
_TOK_RE = re.compile(
    rb"""\((?P<s>(?:\\.|[^()\\])*)\)\s*(?:Tj|'|")   # literal string shown
       | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?:Tj|'|")     # hex string shown
       | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ           # array form
       | (?P<nl>T\*|Td|TD)                          # line moves
    """,
    re.S | re.X,
)
_ARR_STR_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^()\\])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>"
)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


class UnsupportedPdfError(ValueError):
    """Filtered/compressed streams (or no parseable pages) — the seam where
    a codec-equipped decoder would take over."""


def _unescape(raw: bytes) -> bytes:
    if b"\\" not in raw:  # fast path: no escapes (the overwhelming case) —
        return raw        # skips the per-byte loop on multi-KB show-strings
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \d, \dd or \ddd
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # lone backslash: dropped per spec
            i += 1
    return bytes(out)


def _unhex(raw: bytes) -> bytes:
    h = b"".join(raw.split())
    if len(h) % 2:  # odd count: spec pads a trailing 0
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _stream_data(cobj: bytes) -> tuple[bytes, bool] | None:
    """Raw bytes of a content stream and whether they are length-exact.

    Streams are delimited by the /Length value when it is a direct integer
    (the spec-correct way — delimiter scanning can never eat payload bytes).
    Without a usable /Length the stream is delimited by ``endstream`` with
    ONE trailing EOL stripped; that heuristic can eat a final 0x0D of binary
    data (data ending in ``\\r`` + writer's ``\\n`` looks like a CRLF
    delimiter), so callers get ``exact=False`` and may retry decompression
    with the candidate byte re-appended.
    """
    sm = _STREAM_START_RE.search(cobj)
    if not sm:
        return None
    start = sm.end()
    lm = _LENGTH_RE.search(cobj[: sm.start()])
    if lm:
        n = int(lm.group(1))
        data = cobj[start : start + n]
        # trust /Length only if endstream IMMEDIATELY follows (spec: EOL +
        # endstream) — a stale /Length (stream edited after writing) falls
        # back to delimiting instead of mis-slicing
        tail = cobj[start + n : start + n + 16]
        if len(data) == n and re.match(rb"[\r\n \t]*endstream", tail):
            return data, True
    end = cobj.find(b"endstream", start)
    if end == -1:
        return None
    data = cobj[start:end]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith((b"\n", b"\r")):
        data = data[:-1]
    return data, False


def _inflate(data: bytes, exact: bool) -> bytes:
    """zlib-decompress; on delimiter-based (inexact) extraction, retry with
    the EOL bytes the delimiter may have swallowed re-appended."""
    import zlib

    try:
        return zlib.decompress(data)
    except zlib.error as exc:
        if not exact:
            for tail in (b"\r", b"\n", b"\r\n"):
                try:
                    return zlib.decompress(data + tail)
                except zlib.error:
                    continue
        raise UnsupportedPdfError(f"corrupt Flate stream: {exc}") from exc


def _stream_text(stream: bytes) -> str:
    """Text of one content stream: concatenate shown strings; Td/TD/T*
    becomes a newline (unless at start)."""
    parts: list[bytes] = []
    for block in _BT_ET_RE.findall(stream):
        for m in _TOK_RE.finditer(block):
            if m.group("nl") is not None:
                if parts and parts[-1] != b"\n":
                    parts.append(b"\n")
            elif m.group("s") is not None:
                parts.append(_unescape(m.group("s")))
            elif m.group("hex") is not None:
                parts.append(_unhex(m.group("hex")))
            else:
                for sm in _ARR_STR_RE.finditer(m.group("arr")):
                    if sm.group("s") is not None:
                        parts.append(_unescape(sm.group("s")))
                    else:
                        parts.append(_unhex(sm.group("hex")))
    return b"".join(parts).strip(b"\n").decode("latin-1")


def extract_pdf_text(payload: bytes) -> list[str]:
    """Per-page text of a minimal (unfiltered) PDF, in page order."""
    if not payload.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF payload")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    pages: list[str] = []
    for num in sorted(objs):
        body = objs[num]
        if not _PAGE_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            pages.append("")
            continue
        cobj = objs.get(int(cm.group(1)), b"")
        flate = False
        if _FILTER_RE.search(cobj):
            if _FLATE_ONLY_RE.search(cobj):
                flate = True  # stdlib zlib — the dominant real-world filter
            else:
                raise UnsupportedPdfError(
                    "non-Flate content filter (DCT/LZW/ASCII85…) — needs a "
                    "codec behind this seam"
                )
        sd = _stream_data(cobj)
        if sd is None:
            pages.append("")
            continue
        data, exact = sd
        if flate:
            data = _inflate(data, exact)
        pages.append(_stream_text(data))
    if not pages:
        raise UnsupportedPdfError("no /Type /Page objects found")
    return pages


#: byte-exact page separator of the reference combine path
#: (deepseek_engine.py:336-358 semantics, reused from the mock route)
PAGE_SEP = "\n\n---\n\n"


class PdfTextEngine:
    """Engine-seam wrapper: real embedded-text extraction for minimal PDFs;
    anything needing codecs or rasterization raises (→ failed row)."""

    name = "pdf-text"

    def extract(self, url: str, payload: bytes, content_type: str) -> EngineResult:
        pages = extract_pdf_text(payload)
        return EngineResult(
            text=PAGE_SEP.join(pages),
            page_count=len(pages),
            metadata={"engine": self.name},
        )


def make_minimal_pdf(pages: list[list[str]], flate: bool = False) -> bytes:
    """Build a small VALID PDF (used by tests and demos): one content
    stream per page, each inner list = lines of that page. ``flate=True``
    emits zlib-compressed (/FlateDecode) content streams — the layout real
    PDF writers produce."""
    out = bytearray(b"%PDF-1.4\n")
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    out += b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    out += (
        f"2 0 obj << /Type /Pages /Count {n_pages} /Kids [{kids}] >> endobj\n"
    ).encode()
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        stream_num = page_num + 1
        out += (
            f"{page_num} 0 obj << /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 612 792] /Contents {stream_num} 0 R >> endobj\n"
        ).encode()
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if k > 0:
                ops.append("0 -14 Td")
            ops.append(f"({esc}) Tj")
        ops.append("ET")
        content = " ".join(ops).encode("latin-1")
        filt = ""
        if flate:
            import zlib

            content = zlib.compress(content)
            filt = " /Filter /FlateDecode"
        out += (
            f"{stream_num} 0 obj << /Length {len(content)}{filt} >> stream\n".encode()
            + content
            + b"\nendstream endobj\n"
        )
    out += b"%%EOF\n"
    return bytes(out)


# registered as "pdf-text" in stages/engines.py (lazy factory, so workers
# that only import engines.py can still resolve the route name)

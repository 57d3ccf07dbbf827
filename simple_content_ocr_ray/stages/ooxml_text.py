"""Minimal from-scratch OOXML TEXT extraction (DOCX / PPTX / XLSX) —
stdlib ``zipfile`` + ``xml.etree`` only.

The reference lists docx/pptx/xlsx as supported types but stubs them to
errors (/root/reference/src/simple_ocr/config.py:118, rejected at
services/ocr_service.py:234-242 pending a converter). This module EXCEEDS
that honestly: OOXML is a zip of XML parts, and text extraction is reading
the text runs —

* DOCX: ``word/document.xml`` → paragraphs ``w:p``, runs ``w:t`` (with
  ``xml:space`` preservation), ``w:tab`` → tab, ``w:br``/``w:cr`` →
  newline; explicit page breaks split pages;
* PPTX: ``ppt/slides/slideN.xml`` in slide order → DrawingML ``a:t`` runs
  grouped per paragraph ``a:p``; one page per slide;
* XLSX: ``xl/worksheets/sheetN.xml`` + ``xl/sharedStrings.xml`` → cell
  values (shared strings, inline strings, numbers) joined tab/newline;
  one page per sheet.

Encrypted (CFB/agile) files, non-OOXML zips, and malformed XML raise
``UnsupportedOoxmlError`` → failed rows at the usual seam. ``make_docx`` /
``make_pptx`` / ``make_xlsx`` build valid minimal fixtures for tests and
the oracled roundtrip queries.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

#: byte-exact page separator shared with the PDF path
PAGE_SEP = "\n\n---\n\n"


class UnsupportedOoxmlError(ValueError):
    """Encrypted / non-OOXML / malformed payloads — the documented seam."""


def _open_zip(payload: bytes) -> zipfile.ZipFile:
    if payload[:2] == b"\xd0\xcf":  # OLE/CFB container = encrypted OOXML
        raise UnsupportedOoxmlError("encrypted OOXML (CFB container)")
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise UnsupportedOoxmlError(f"not a zip archive: {exc}") from exc


def _read_part(zf: zipfile.ZipFile, name: str) -> ElementTree.Element:
    try:
        data = zf.read(name)
    except KeyError as exc:
        raise UnsupportedOoxmlError(f"missing part {name}") from exc
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as exc:
        raise UnsupportedOoxmlError(f"malformed XML in {name}: {exc}") from exc


def _kind_from_names(names: set[str]) -> str:
    if "word/document.xml" in names:
        return "docx"
    if any(n.startswith("ppt/slides/slide") for n in names):
        return "pptx"
    if any(n.startswith("xl/worksheets/sheet") for n in names):
        return "xlsx"
    if "META-INF/container.xml" in names:  # EPUB (OCF container)
        return "epub"
    raise UnsupportedOoxmlError("zip archive is not a known OOXML package")


def detect_ooxml_kind(payload: bytes) -> str:
    """'docx' | 'pptx' | 'xlsx' from the archive layout."""
    with _open_zip(payload) as zf:
        return _kind_from_names(set(zf.namelist()))


def extract_docx_text(payload: bytes) -> list[str]:
    """Per-PAGE text of a docx (explicit page breaks split pages;
    single-page documents return one entry)."""
    with _open_zip(payload) as zf:
        return _docx_pages(zf)


def _docx_pages(zf: zipfile.ZipFile) -> list[str]:
    root = _read_part(zf, "word/document.xml")
    pages: list[list[str]] = [[]]
    for p in root.iter(f"{{{W_NS}}}p"):
        parts: list[str] = []
        broke = False  # paragraph contains a page break
        for node in p.iter():
            tag = node.tag
            if tag == f"{{{W_NS}}}t":
                parts.append(node.text or "")
            elif tag == f"{{{W_NS}}}tab":
                parts.append("\t")
            elif tag == f"{{{W_NS}}}cr":
                parts.append("\n")
            elif tag == f"{{{W_NS}}}br":
                if node.get(f"{{{W_NS}}}type") == "page":
                    if parts:  # break-only paragraphs emit no text
                        pages[-1].append("".join(parts))
                        parts = []
                    pages.append([])
                    broke = True
                else:
                    parts.append("\n")
        if parts or not broke:  # empty paragraphs count, break tails don't
            pages[-1].append("".join(parts))
    return ["\n".join(par) for par in pages]


def extract_pptx_text(payload: bytes) -> list[str]:
    """Per-SLIDE text of a pptx, slides in numeric order."""
    with _open_zip(payload) as zf:
        return _pptx_pages(zf)


def _pptx_pages(zf: zipfile.ZipFile) -> list[str]:
    slide_names = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    if not slide_names:
        raise UnsupportedOoxmlError("pptx has no slides")
    out = []
    for name in slide_names:
        root = _read_part(zf, name)
        paras = []
        for p in root.iter(f"{{{A_NS}}}p"):
            paras.append(
                "".join(t.text or "" for t in p.iter(f"{{{A_NS}}}t"))
            )
        out.append("\n".join(paras))
    return out


def extract_xlsx_text(payload: bytes) -> list[str]:
    """Per-SHEET text of an xlsx: cells joined by tab, rows by newline."""
    with _open_zip(payload) as zf:
        return _xlsx_pages(zf)


def _xlsx_pages(zf: zipfile.ZipFile) -> list[str]:
    names = set(zf.namelist())
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        sroot = _read_part(zf, "xl/sharedStrings.xml")
        for si in sroot.iter(f"{{{S_NS}}}si"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{{{S_NS}}}t"))
            )
    sheet_names = sorted(
        (n for n in names
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    if not sheet_names:
        raise UnsupportedOoxmlError("xlsx has no worksheets")
    out = []
    for name in sheet_names:
        root = _read_part(zf, name)
        rows = []
        for row in root.iter(f"{{{S_NS}}}row"):
            cells = []
            for c in row.iter(f"{{{S_NS}}}c"):
                ctype = c.get("t", "n")
                if ctype == "s":  # shared string
                    v = c.find(f"{{{S_NS}}}v")
                    idx = int(v.text) if v is not None and v.text else -1
                    cells.append(
                        shared[idx] if 0 <= idx < len(shared) else ""
                    )
                elif ctype == "inlineStr":
                    cells.append(
                        "".join(
                            t.text or "" for t in c.iter(f"{{{S_NS}}}t")
                        )
                    )
                else:  # n / str / b — the raw value
                    v = c.find(f"{{{S_NS}}}v")
                    cells.append(v.text or "" if v is not None else "")
            rows.append("\t".join(cells))
        out.append("\n".join(rows))
    return out


class OoxmlTextEngine:
    """Engine-seam wrapper: detects the package kind from the archive
    layout and extracts text runs; pages join with the byte-exact PDF
    separator so downstream combine semantics are shared."""

    name = "ooxml-text"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        with _open_zip(payload) as zf:  # ONE central-directory parse
            kind = _kind_from_names(set(zf.namelist()))
            if kind == "epub":
                # EPUB rides the same zip route (r4, stages/epub_text.py):
                # chapters are pages, spine order is page order
                from .epub_text import UnsupportedEpubError, extract_epub

                try:
                    title, pages = extract_epub(payload)
                except UnsupportedEpubError as exc:
                    raise UnsupportedOoxmlError(str(exc)) from exc
                return EngineResult(
                    text=PAGE_SEP.join(pages),
                    page_count=len(pages),
                    metadata={
                        "engine": self.name,
                        "ooxml_kind": "epub",
                        "title": title,
                    },
                )
            pages = {
                "docx": _docx_pages,
                "pptx": _pptx_pages,
                "xlsx": _xlsx_pages,
            }[kind](zf)
        return EngineResult(
            text=PAGE_SEP.join(pages),
            page_count=len(pages),
            metadata={"engine": self.name, "ooxml_kind": kind},
        )


# --------------------------------------------------------------------------
# Fixture builders (tests + oracled roundtrip queries)
# --------------------------------------------------------------------------

def _xml_text(s: str) -> str:
    """Escape text for element content INCLUDING carriage returns: XML
    parsers normalize literal \\r and \\r\\n to \\n, so a lossless text
    roundtrip must emit CR as a character reference."""
    return escape(s).replace("\r", "&#13;")


_CT_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/xml"/>'
    "</Types>"
)


def _zip_parts(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT_XML)
        for name, xml in parts.items():
            zf.writestr(name, xml)
    return buf.getvalue()


def make_docx(pages: list[list[str]]) -> bytes:
    """Minimal valid docx: inner lists are paragraphs of one page; pages
    are separated by explicit page-break runs."""
    body = []
    for pi, paras in enumerate(pages):
        if pi:
            body.append(f'<w:p><w:r><w:br w:type="page"/></w:r></w:p>')
        for para in paras:
            body.append(
                f'<w:p><w:r><w:t xml:space="preserve">{_xml_text(para)}</w:t>'
                "</w:r></w:p>"
            )
    doc = (
        f'<w:document xmlns:w="{W_NS}"><w:body>{"".join(body)}</w:body>'
        "</w:document>"
    )
    return _zip_parts({"word/document.xml": doc})


def make_pptx(slides: list[list[str]]) -> bytes:
    """Minimal valid pptx: inner lists are text paragraphs of one slide."""
    parts = {}
    for i, paras in enumerate(slides, start=1):
        runs = "".join(
            f'<a:p><a:r><a:t>{_xml_text(p)}</a:t></a:r></a:p>' for p in paras
        )
        parts[f"ppt/slides/slide{i}.xml"] = (
            f'<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            f'presentationml/2006/main" xmlns:a="{A_NS}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody>{runs}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
    return _zip_parts(parts)


def make_xlsx(sheets: list[list[list[object]]]) -> bytes:
    """Minimal valid xlsx: each sheet is rows of cell values; strings go
    through sharedStrings, numbers inline."""
    shared: list[str] = []
    sindex: dict[str, int] = {}
    parts = {}
    for si, rows in enumerate(sheets, start=1):
        rows_xml = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                col = chr(ord("A") + ci)
                if isinstance(val, str):
                    if val not in sindex:
                        sindex[val] = len(shared)
                        shared.append(val)
                    cells.append(
                        f'<c r="{col}{ri}" t="s"><v>{sindex[val]}</v></c>'
                    )
                else:
                    cells.append(f'<c r="{col}{ri}"><v>{val}</v></c>')
            rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        parts[f"xl/worksheets/sheet{si}.xml"] = (
            f'<worksheet xmlns="{S_NS}"><sheetData>{"".join(rows_xml)}'
            "</sheetData></worksheet>"
        )
    parts["xl/sharedStrings.xml"] = (
        f'<sst xmlns="{S_NS}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{_xml_text(s)}</t></si>' for s in shared
        )
        + "</sst>"
    )
    return _zip_parts(parts)

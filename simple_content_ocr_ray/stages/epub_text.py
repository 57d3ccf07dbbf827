"""EPUB text extraction — stdlib ``zipfile`` + ``xml.etree`` only.

EPUB is the remaining mainstream document package after PDF / OOXML / RTF:
a zip whose reading order lives in an OPF manifest. Crawls carry them
wherever books/longform are published. Extraction per the public EPUB
(OCF + OPF) specs:

* OCF container: ``META-INF/container.xml`` → the OPF rootfile path
  (the ``mimetype`` member is advisory and often wrong in the wild — the
  container file is authoritative);
* OPF package: ``dc:title`` metadata; manifest id → href map (hrefs
  resolved relative to the OPF's directory); spine ``itemref`` order IS
  the reading order;
* chapters: XHTML parsed with ``xml.etree`` — text of ``<body>`` with
  ``script``/``style`` subtrees dropped, block elements (p, div, h1–h6,
  li, br, tr) separating lines, whitespace collapsed per line.

Each spine chapter is a PAGE, joined with the byte-exact separator shared
by the PDF/OOXML paths so combine semantics stay uniform. Broken zips,
missing container/OPF, and malformed chapter XML raise
``UnsupportedEpubError`` → failed rows. ``make_epub`` builds a valid
two-plus-chapter fixture (nav decoy excluded from the spine text by the
``linear="no"`` rule) for tests and the oracled roundtrip query.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from xml.etree import ElementTree
from xml.sax.saxutils import escape

__all__ = ["UnsupportedEpubError", "extract_epub", "make_epub", "is_epub"]

_WS_RE = re.compile(r"\s+")

#: byte-exact page separator shared with the PDF/OOXML paths
PAGE_SEP = "\n\n---\n\n"

_CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_DC_NS = "http://purl.org/dc/elements/1.1/"

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "br", "tr",
    "section", "article", "blockquote",
}


class UnsupportedEpubError(ValueError):
    """Broken zip / missing container / malformed chapters — the seam."""


def is_epub(payload: bytes) -> bool:
    """Cheap check: a zip whose first member is the EPUB mimetype, or any
    zip containing META-INF/container.xml."""
    if payload[:4] != b"PK\x03\x04":
        return False
    if b"mimetypeapplication/epub+zip" in payload[:64]:
        return True
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            return "META-INF/container.xml" in zf.namelist()
    except zipfile.BadZipFile:
        return False


def _parse(data: bytes, what: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as exc:
        raise UnsupportedEpubError(f"malformed {what}: {exc}") from exc


def _local(tag: object) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _chapter_text(root: ElementTree.Element) -> str:
    body = next(
        (el for el in root.iter() if _local(el.tag) == "body"), root
    )
    lines: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        s = _WS_RE.sub(" ", "".join(buf)).strip()
        if s:
            lines.append(s)
        buf.clear()

    def walk(el: ElementTree.Element) -> None:
        name = _local(el.tag)
        if name in ("script", "style"):
            return
        if name in _BLOCK_TAGS:
            flush()
        if el.text:
            buf.append(el.text)
        for child in el:
            walk(child)
            if child.tail:
                buf.append(child.tail)
        if name in _BLOCK_TAGS:
            flush()

    walk(body)
    flush()
    return "\n".join(lines)


def extract_epub(payload: bytes) -> tuple[str, list[str]]:
    """EPUB bytes → (title, chapter texts in spine order)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise UnsupportedEpubError(f"not a zip archive: {exc}") from exc
    with zf:
        names = set(zf.namelist())
        if "META-INF/container.xml" not in names:
            raise UnsupportedEpubError("missing OCF container.xml")
        container = _parse(zf.read("META-INF/container.xml"), "container.xml")
        rootfile = next(
            (
                el.get("full-path")
                for el in container.iter(f"{{{_CONTAINER_NS}}}rootfile")
            ),
            None,
        ) or next(
            (el.get("full-path") for el in container.iter() if _local(el.tag) == "rootfile"),
            None,
        )
        if not rootfile or rootfile not in names:
            raise UnsupportedEpubError("container names no readable rootfile")
        opf = _parse(zf.read(rootfile), "OPF package")
        opf_dir = posixpath.dirname(rootfile)

        title = ""
        for el in opf.iter():
            if _local(el.tag) == "title":
                title = _WS_RE.sub(" ", "".join(el.itertext())).strip()
                break
        manifest: dict[str, str] = {}
        for el in opf.iter():
            if _local(el.tag) == "item" and el.get("id") and el.get("href"):
                manifest[el.get("id")] = el.get("href")
        chapters: list[str] = []
        for el in opf.iter():
            if _local(el.tag) != "itemref":
                continue
            if el.get("linear", "yes") == "no":
                continue
            href = manifest.get(el.get("idref", ""))
            if href is None:
                raise UnsupportedEpubError(
                    f"spine idref {el.get('idref')!r} not in manifest"
                )
            path = posixpath.normpath(posixpath.join(opf_dir, href))
            if path not in names:
                raise UnsupportedEpubError(f"missing chapter {path!r}")
            chapters.append(_chapter_text(_parse(zf.read(path), path)))
        if not chapters:
            raise UnsupportedEpubError("empty spine")
        return title, chapters


def make_epub(title: str, chapters: list[list[str]]) -> bytes:
    """Valid minimal EPUB: stored mimetype first (per OCF), container →
    OPF under OEBPS/, one XHTML per chapter (paragraph per line, with an
    inline <em> split and a <style> decoy), plus a nav document excluded
    from reading order via linear="no"."""
    items = []
    spine = []
    parts: dict[str, bytes] = {}
    for i, lines in enumerate(chapters):
        body = []
        for j, line in enumerate(lines):
            esc = escape(line)
            if j % 2 and " " in line:
                a, b = esc.split(" ", 1)
                esc = f"{a} <em>{b}</em>"
            body.append(f"<p>{esc}</p>")
        parts[f"OEBPS/ch{i}.xhtml"] = (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>ch{i}</title><style>p {{ color: red }}</style></head>"
            f"<body>{''.join(body)}</body></html>"
        ).encode()
        items.append(
            f'<item id="c{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
    parts["OEBPS/nav.xhtml"] = (
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        "<nav><p>DECOY NAV TEXT</p></nav></body></html>"
    ).encode()
    items.append(
        '<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml"/>'
    )
    spine.append('<itemref idref="nav" linear="no"/>')
    parts["OEBPS/content.opf"] = (
        '<?xml version="1.0"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" unique-identifier="id">'
        f'<metadata xmlns:dc="{_DC_NS}"><dc:title>{escape(title)}</dc:title>'
        '<dc:identifier id="id">fixture</dc:identifier></metadata>'
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(spine)}</spine></package>"
    ).encode()
    parts["META-INF/container.xml"] = (
        '<?xml version="1.0"?>'
        f'<container version="1.0" xmlns="{_CONTAINER_NS}">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # mimetype must be first and STORED per OCF
        zf.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/epub+zip",
            zipfile.ZIP_STORED,
        )
        for name, data in sorted(parts.items()):
            zf.writestr(name, data)
    return buf.getvalue()

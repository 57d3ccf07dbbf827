"""Plain-Python, Ray-free reimplementation of the reference's per-document
semantics. This is the correctness anchor: the Ray pipeline must produce
byte-identical text per url to ``extract_row`` at every parallelism level.

Reference behaviors reproduced (citations into /root/reference):
  * page-count estimation   — src/simple_ocr/adapters/mock_engine.py:123-141
  * mock markdown layout    — src/simple_ocr/adapters/mock_engine.py:143-208
  * human-readable size     — src/simple_ocr/adapters/mock_engine.py:210-224
  * page combine separators — src/simple_ocr/adapters/deepseek_engine.py:336-358
  * image-vs-document route — src/simple_ocr/services/ocr_service.py:224-244
  * unsupported-type error  — src/simple_ocr/adapters/deepseek_engine.py:257-263
  * errors become FAILED rows, never exceptions
                            — src/simple_ocr/services/ocr_service.py:173-207

Determinism divergence (documented): the reference embeds a wall-clock
timestamp in mock output (mock_engine.py:173); we pin it to
``PIN_PROCESSED_AT`` so results are reproducible.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from . import PIN_PROCESSED_AT
from .stages.html_extractor import HtmlMainContentExtractor

# --------------------------------------------------------------------------
# Content-type sniffing (magic bytes). The reference routes on a MIME string
# supplied with the job (ocr_service.py:224-244, test_local_file.py:201-227);
# in the columnar world the payload is inline, so the router key is sniffed
# from the first bytes of the `html` binary column.
# --------------------------------------------------------------------------

#: SRT structural signature: numeric index line, then "HH:MM:SS,mmm -->"
_SRT_HEAD_RE = re.compile(rb"^\d{1,6}\r?\n\d{2}:\d{2}:\d{2},\d{3}\s*-->")

_MAGIC = [
    (b"%PDF", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    # zip container: OOXML (docx/pptx/xlsx) and generic archives — the
    # ooxml-text engine resolves the package kind from the archive layout
    (b"PK\x03\x04", "zip"),
    # OLE2 compound file: legacy Word 97 .doc (doc-text engine resolves;
    # non-Word compound files fail as rows at the engine seam)
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "cfb"),
    (b"{\\rtf", "rtf"),
    (b"WEBVTT", "vtt"),
    (b"\xef\xbb\xbfWEBVTT", "vtt"),
    (b"\x1f\x8b", "gzip"),
    # MP3: only the unambiguous ID3v2 magic sniffs (a bare 0xFFEx sync word
    # is too weak a prefix — raw CBR streams without tags stay "unknown")
    (b"ID3", "mp3"),
]

CONTENT_TYPE_TO_MIME = {
    "html": "text/html",
    "cfb": "application/msword",
    "mp3": "audio/mpeg",
    "pdf": "application/pdf",
    "png": "image/png",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "tiff": "image/tiff",
    "webp": "image/webp",
    "zip": "application/zip",
    "svg": "image/svg+xml",
    "ico": "image/x-icon",
    "mp4": "video/mp4",
    "rtf": "application/rtf",
    "vtt": "text/vtt",
    "avif": "image/avif",
    "gzip": "application/gzip",
    "srt": "application/x-subrip",
    "unknown": "application/octet-stream",
}

IMAGE_TYPES = frozenset({"png", "jpeg", "gif", "bmp", "tiff", "webp"})

#: bytes of payload prefix the sniffer inspects (leading-whitespace tolerance
#: for HTML detection); sniff_batch slices exactly this window so the
#: vectorized stage and this per-row function can never disagree
SNIFF_WINDOW = 256


def sniff_bytes(payload: bytes) -> str:
    """Classify a payload by magic bytes → content-type key."""
    if not payload:
        return "unknown"
    for magic, kind in _MAGIC:
        if payload.startswith(magic):
            return kind
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[4:8] == b"ftyp" and len(payload) >= 12:
        # ISO-BMFF: still-image brands (AVIF/HEIF) vs movie brands
        if payload[8:12] in (b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"):
            return "avif"
        return "mp4"
    if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 6:
        # ICO has no real magic; require a plausible directory count
        count = payload[4] | (payload[5] << 8)
        if 1 <= count <= 256:
            return "ico"
    head = payload[:SNIFF_WINDOW].lstrip()
    low = head[:15].lower()
    if low.startswith(b"<!doctype") or low.startswith(b"<html"):
        return "html"
    if low.startswith(b"<svg") or (low.startswith(b"<?xml") and b"<svg" in head):
        return "svg"
    # SRT has no magic: structural sniff — index line then a timing line
    if _SRT_HEAD_RE.match(head):
        return "srt"
    return "unknown"


# --------------------------------------------------------------------------
# Mock-engine semantics (byte-exact vs mock_engine.py, timestamp pinned)
# --------------------------------------------------------------------------

def format_size(size_bytes: int) -> str:
    """Human-readable size, same formatting as mock_engine.py:210-224."""
    size = float(size_bytes)
    for unit in ("B", "KB", "MB", "GB"):
        if size < 1024.0:
            return f"{size:.1f} {unit}"
        size /= 1024.0
    return f"{size:.1f} TB"


def estimate_page_count(mime_type: str, size_bytes: int) -> int:
    """Size-based page estimate, same thresholds as mock_engine.py:123-141."""
    if "pdf" in mime_type:
        return max(1, size_bytes // 51200)
    if "docx" in mime_type or "pptx" in mime_type:
        return max(1, size_bytes // 30720)
    return 1


def mock_markdown(
    content_type: str,
    mime_type: str,
    size_bytes: int,
    page_count: int = 1,
    processed_at: str = PIN_PROCESSED_AT,
) -> str:
    """Deterministic mock extraction output, layout-identical to
    mock_engine.py:143-208 with the timestamp pinned."""
    lines = [
        "# Mock OCR Result",
        "",
        "This is a mock OCR result generated by MockOCREngine.",
        "",
        "## Document Information",
        "",
        f"- **Type**: {content_type}",
        f"- **MIME Type**: {mime_type}",
        f"- **Size**: {format_size(size_bytes)}",
        f"- **Pages**: {page_count}",
        f"- **Processed**: {processed_at}",
        "",
    ]
    for page_num in range(1, page_count + 1):
        if page_count > 1:
            lines.extend([f"## Page {page_num}", ""])
        lines.extend(
            [
                "Lorem ipsum dolor sit amet, consectetur adipiscing elit. "
                "Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua.",
                "",
                f"### Section {page_num}.1",
                "",
                "Ut enim ad minim veniam, quis nostrud exercitation ullamco "
                "laboris nisi ut aliquip ex ea commodo consequat.",
                "",
                f"### Section {page_num}.2",
                "",
                "Duis aute irure dolor in reprehenderit in voluptate velit "
                "esse cillum dolore eu fugiat nulla pariatur.",
                "",
            ]
        )
        if page_num < page_count:
            lines.append("---\n")
    return "\n".join(lines)


def combine_pages(page_markdowns: list[str]) -> str:
    """Join per-page markdown into one document — byte-exact separator
    semantics from deepseek_engine.py:336-358: single page passes through;
    otherwise pages are joined with "\\n\\n---\\n\\n" followed by an HTML
    comment page marker before every page after the first."""
    if len(page_markdowns) == 1:
        return page_markdowns[0]
    parts: list[str] = []
    for idx, page_md in enumerate(page_markdowns):
        if idx > 0:
            parts.append("\n\n---\n\n")
            parts.append(f"<!-- Page {idx + 1} -->\n\n")
        parts.append(page_md)
    return "".join(parts)


# --------------------------------------------------------------------------
# Single-row reference pipeline (the oracle the Ray pipeline is tested
# against for byte-identical output at any parallelism)
# --------------------------------------------------------------------------

_HTML_EXTRACTOR: Optional[HtmlMainContentExtractor] = None


def _html_extractor() -> HtmlMainContentExtractor:
    global _HTML_EXTRACTOR
    if _HTML_EXTRACTOR is None:
        _HTML_EXTRACTOR = HtmlMainContentExtractor()
    return _HTML_EXTRACTOR


def extract_row(url: str, payload: bytes, processed_at: str = PIN_PROCESSED_AT) -> dict[str, Any]:
    """Process one document end-to-end with reference semantics.

    Mirrors OCRService.process_job (ocr_service.py:50-222): route by type,
    run the matching engine, convert any error into a FAILED record.
    Returns a dict shaped like one row of the `extracted` output table.
    """
    content_type = sniff_bytes(payload)
    mime = CONTENT_TYPE_TO_MIME[content_type]
    size = len(payload)
    out: dict[str, Any] = {
        "url": url,
        "status": "completed",
        "text": "",
        "spans": [],
        "page_count": 1,
        "content_type": content_type,
        "error": "",
        "metadata": {
            "engine": "",
            "mime_type": mime,
            "size_bytes": str(size),
            "page_count": "1",
            "processed_at": processed_at,
        },
    }
    try:
        if content_type == "html":
            text, spans = _html_extractor().extract(payload.decode("utf-8", errors="replace"))
            out["text"] = text
            out["spans"] = spans
            out["metadata"]["engine"] = "html-main-content"
        elif content_type == "pdf":
            pages = estimate_page_count(mime, size)
            out["text"] = mock_markdown("document", mime, size, pages, processed_at)
            out["page_count"] = pages
            out["metadata"]["engine"] = "mock"
            out["metadata"]["page_count"] = str(pages)
        elif content_type in IMAGE_TYPES:
            out["text"] = mock_markdown("image", mime, size, 1, processed_at)
            out["metadata"]["engine"] = "mock"
        else:
            # deepseek_engine.py:257-263 raises OCRError for unsupported
            # types; the service turns it into a FAILED record.
            raise ValueError(f"Unsupported document type: {mime}")
    except Exception as exc:  # noqa: BLE001 — failed rows, not failed tasks
        out["status"] = "failed"
        out["text"] = ""
        out["spans"] = []
        out["error"] = str(exc)
    return out

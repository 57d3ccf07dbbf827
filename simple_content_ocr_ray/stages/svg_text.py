"""SVG text + metadata extraction — stdlib ``xml.etree`` only.

SVG is the one first-class web image format that is TEXT, not pixels: a
Common-Crawl-scale corpus carries it inline (logos, figures, math rendered
to ``<text>`` runs) and the right extraction is the text content plus the
intrinsic geometry, not a raster decode. The reference's image list stops
at raster formats (/root/reference/src/simple_ocr/config.py:113-120); this
engine extends the same route/engine seam (ocr_service.py:83-108 dispatch)
to the vector half of the web image family.

Semantics:

* geometry: ``width``/``height`` attributes parsed with their CSS unit
  stripped (``px`` exact; ``pt``/``mm``/... converted at CSS ratios; bare
  numbers are px per the spec); a missing dimension falls back to the
  ``viewBox`` extent; nothing at all → 0 (SVG allows fully fluid sizing).
* text: every ``<text>``/``<tspan>``/``<textPath>`` run in document order,
  whitespace-collapsed per run, joined by newlines — ``<title>``/``<desc>``
  accessibility strings are collected separately (they are alt-text, not
  content). Text inside ``<defs>`` is invisible per the rendering model and
  skipped.
* counts: total element count and per-family shape counts, the cheap
  structure fingerprint a curation pass filters on (an SVG with 10k paths
  and no text is a figure; 3 rects and a text run is a button).

Malformed XML raises ``UnsupportedSvgError`` → the shared failed-row seam.
A defused parser is used: entity definitions are rejected (billion-laughs
guard) rather than expanded — crawl payloads are hostile.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = [
    "UnsupportedSvgError",
    "parse_svg",
    "make_svg",
    "SvgTextEngine",
]


class UnsupportedSvgError(ValueError):
    """Malformed / non-SVG XML / entity-bearing payloads — the engine seam."""


#: CSS absolute-unit → px ratios (CSS Values and Units Level 3 §5.2).
_UNIT_PX = {
    "": 1.0,
    "px": 1.0,
    "pt": 96.0 / 72.0,
    "pc": 16.0,
    "in": 96.0,
    "cm": 96.0 / 2.54,
    "mm": 96.0 / 25.4,
}

_LENGTH_RE = re.compile(r"^\s*([0-9]*\.?[0-9]+)\s*([a-z%]*)\s*$", re.I)
_WS_RE = re.compile(r"\s+")

#: shape families counted for the structure fingerprint
_SHAPE_TAGS = ("path", "rect", "circle", "ellipse", "line", "polyline", "polygon")
_TEXT_TAGS = ("text", "tspan", "textPath")


def _px(value: str | None) -> float | None:
    """SVG length attribute → px, or None if absent/relative (%, em, ...)."""
    if not value:
        return None
    m = _LENGTH_RE.match(value)
    if not m:
        return None
    ratio = _UNIT_PX.get(m.group(2).lower())
    if ratio is None:  # %, em, ex, vw ... — not resolvable without context
        return None
    return float(m.group(1)) * ratio


def _localname(tag: object) -> str:
    """Element tag → local name (namespace stripped). Comments/PIs in
    ElementTree have callable tags — mapped to '' so they never match."""
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1]


def parse_svg(payload: bytes) -> dict:
    """Parse an SVG payload → dict with keys ``width``/``height`` (float px,
    0.0 when unsized), ``viewbox`` (4-tuple or None), ``n_elems``,
    ``n_shapes``, ``n_text_runs``, ``text`` (newline-joined visible runs),
    ``title`` (first <title>/<desc> accessibility string or '')."""
    if b"<!ENTITY" in payload[:4096]:
        raise UnsupportedSvgError("entity definitions rejected")
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        raise UnsupportedSvgError(f"malformed XML: {exc}") from exc
    if _localname(root.tag) != "svg":
        raise UnsupportedSvgError(f"root element is <{_localname(root.tag)}>")

    viewbox = None
    vb = root.get("viewBox")
    if vb:
        parts = re.split(r"[\s,]+", vb.strip())
        if len(parts) == 4:
            try:
                viewbox = tuple(float(p) for p in parts)
            except ValueError:
                viewbox = None

    width = _px(root.get("width"))
    height = _px(root.get("height"))
    if width is None:
        width = viewbox[2] if viewbox else 0.0
    if height is None:
        height = viewbox[3] if viewbox else 0.0

    n_elems = 0
    n_shapes = 0
    runs: list[str] = []
    titles: list[str] = []

    def walk(el: ET.Element, in_defs: bool, in_text: bool) -> None:
        nonlocal n_elems, n_shapes
        for child in el:
            name = _localname(child.tag)
            if not name:  # comment / processing instruction
                continue
            n_elems += 1
            if name in ("title", "desc"):
                s = _WS_RE.sub(" ", "".join(child.itertext())).strip()
                if s:
                    titles.append(s)
                continue
            if name in _SHAPE_TAGS:
                n_shapes += 1
            defs = in_defs or name == "defs"
            if name in _TEXT_TAGS and not defs and not in_text:
                # one run per top-level <text>: nested tspans collapse into it
                s = _WS_RE.sub(" ", "".join(child.itertext())).strip()
                if s:
                    runs.append(s)
                walk(child, defs, True)
            else:
                walk(child, defs, in_text)

    walk(root, False, False)
    return {
        "width": float(width),
        "height": float(height),
        "viewbox": viewbox,
        "n_elems": n_elems,
        "n_shapes": n_shapes,
        "n_text_runs": len(runs),
        "text": "\n".join(runs),
        "title": titles[0] if titles else "",
    }


def make_svg(
    width: int,
    height: int,
    text_runs: list[str],
    n_rects: int = 0,
    title: str = "",
    messy: bool = False,
) -> bytes:
    """Deterministic SVG fixture: sized root, optional <title>, ``n_rects``
    shapes, one <text> per run (with a <tspan> split when ``messy`` so the
    run-collapse path is exercised), plus decoys — a <defs> block holding an
    invisible text run and a comment."""
    ns = ' xmlns="http://www.w3.org/2000/svg"' if not messy else (
        ' xmlns="http://www.w3.org/2000/svg" xmlns:xlink="http://www.w3.org/1999/xlink"'
    )
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n' if not messy else "",
        f'<svg{ns} width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f"<title>{title}</title>" if title else "",
        "<!-- generator: fixture -->",
        '<defs><text x="0" y="0">INVISIBLE DEFS TEXT</text>'
        '<linearGradient id="g"/></defs>',
    ]
    for i in range(n_rects):
        parts.append(f'<rect x="{i}" y="{i}" width="4" height="3"/>')
    for i, run in enumerate(text_runs):
        if messy and " " in run:
            head, tail = run.split(" ", 1)
            parts.append(
                f'<text x="1" y="{10 + i}">{head} <tspan dy="1">{tail}</tspan></text>'
            )
        else:
            parts.append(f'<text x="1" y="{10 + i}">  {run}  </text>')
    parts.append("</svg>")
    return "".join(parts).encode()


class SvgTextEngine:
    """Engine-seam wrapper: SVG → extracted text runs + typed geometry
    metadata, same layout as the raster image engines (metadata keys
    width/height plus the SVG structure counters)."""

    name = "svg-text"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        meta = parse_svg(payload)
        return EngineResult(
            text=meta["text"],
            page_count=1,
            metadata={
                "engine": self.name,
                "width": str(int(meta["width"])),
                "height": str(int(meta["height"])),
                "n_elems": str(meta["n_elems"]),
                "n_shapes": str(meta["n_shapes"]),
                "n_text_runs": str(meta["n_text_runs"]),
                "title": meta["title"],
            },
        )

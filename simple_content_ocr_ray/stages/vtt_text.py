"""WebVTT / SRT subtitle text extraction — stdlib only.

Subtitle tracks are the TEXT of web video: a crawl that stores video
payloads almost always stores `.vtt` (HTML5 ``<track>``) or `.srt` files
beside them, and for a training-data pipeline the cue text is the
extractable content (the MP4 engine in ``mp4_boxes.py`` covers the
container; this covers the words). Parsing per the public WebVTT spec and
the de-facto SRT format:

* WEBVTT signature (optional BOM, optional header remark); ``NOTE`` /
  ``STYLE`` / ``REGION`` blocks skipped;
* cue blocks: optional id line, timing line
  ``[hh:]mm:ss.mmm --> [hh:]mm:ss.mmm`` with cue settings after the end
  timestamp ignored, payload lines until a blank line;
* cue markup (``<v Speaker>``, ``<i>``, ``<c.class>``, timestamps tags)
  stripped to the spoken text; ``&amp;``-style entities unescaped;
* SRT: numeric index line, comma decimal separator, otherwise the same
  block shape (auto-detected by the engine on missing WEBVTT magic).

Malformed payloads raise ``UnsupportedVttError`` → failed rows.
"""

from __future__ import annotations

import html
import re

__all__ = [
    "UnsupportedVttError",
    "parse_vtt",
    "parse_srt",
    "make_vtt",
    "make_srt",
    "SubtitleTextEngine",
]


class UnsupportedVttError(ValueError):
    """Not WebVTT/SRT or structurally broken — the engine seam."""


_TS_RE = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_TIMING_RE = re.compile(
    r"^\s*((?:\d+:)?\d{1,2}:\d{2}[.,]\d{3})\s*-->\s*"
    r"((?:\d+:)?\d{1,2}:\d{2}[.,]\d{3})(\s+.*)?$"
)
_TAG_RE = re.compile(r"<[^>]*>")


def _ts_ms(ts: str) -> int:
    m = _TS_RE.fullmatch(ts.strip())
    if not m:
        raise UnsupportedVttError(f"bad timestamp {ts!r}")
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def _parse_blocks(lines: list[str], require_index: bool) -> list[dict]:
    cues: list[dict] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        head = line.split(" ", 1)[0]
        if head in ("NOTE", "STYLE", "REGION"):
            while i < n and lines[i].strip():
                i += 1
            continue
        timing = _TIMING_RE.match(line)
        if timing is None:
            # id / index line: the NEXT line must be the timing
            if require_index and not line.isdigit():
                raise UnsupportedVttError(f"expected cue index, got {line!r}")
            i += 1
            if i >= n:
                raise UnsupportedVttError("cue id without timing line")
            timing = _TIMING_RE.match(lines[i].strip())
            if timing is None:
                raise UnsupportedVttError(
                    f"expected timing line, got {lines[i]!r}"
                )
        start = _ts_ms(timing.group(1))
        end = _ts_ms(timing.group(2))
        if end < start:
            raise UnsupportedVttError("cue ends before it starts")
        i += 1
        text_lines = []
        while i < n and lines[i].strip():
            text_lines.append(
                html.unescape(_TAG_RE.sub("", lines[i].strip()))
            )
            i += 1
        cues.append(
            {"start_ms": start, "end_ms": end, "text": "\n".join(text_lines)}
        )
    return cues


def parse_vtt(payload: bytes) -> list[dict]:
    """WebVTT bytes → cue dicts (start_ms, end_ms, text)."""
    text = payload.decode("utf-8", "replace").lstrip("﻿")
    if not text.startswith("WEBVTT"):
        raise UnsupportedVttError("missing WEBVTT signature")
    lines = text.split("\n")
    return _parse_blocks(lines[1:], require_index=False)


def parse_srt(payload: bytes) -> list[dict]:
    """SRT bytes → cue dicts (same shape as parse_vtt)."""
    text = payload.decode("utf-8", "replace").lstrip("﻿")
    if not text.strip():
        raise UnsupportedVttError("empty subtitle payload")
    return _parse_blocks(text.split("\n"), require_index=True)


def make_vtt(cues: list[tuple[int, int, str]], styled: bool = False) -> bytes:
    """WebVTT fixture: header remark, a NOTE block decoy, optional cue
    markup (<v>/<i> tags the parser must strip)."""

    def ts(ms: int) -> str:
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"

    out = ["WEBVTT - fixture", "", "NOTE", "decoy comment, not a cue", ""]
    for idx, (a, b, t) in enumerate(cues):
        out.append(f"cue-{idx}")
        out.append(f"{ts(a)} --> {ts(b)} align:start")
        if styled:
            out.append(f"<v Speaker {idx}><i>{t}</i>")
        else:
            out.append(t)
        out.append("")
    return "\n".join(out).encode()


def make_srt(cues: list[tuple[int, int, str]]) -> bytes:
    def ts(ms: int) -> str:
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    out = []
    for idx, (a, b, t) in enumerate(cues):
        out += [str(idx + 1), f"{ts(a)} --> {ts(b)}", t, ""]
    return "\n".join(out).encode()


class SubtitleTextEngine:
    """Engine-seam wrapper: WebVTT (by signature) or SRT (fallback) →
    newline-joined cue text plus cue count and covered duration."""

    name = "subtitle-text"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        head = payload[:16].lstrip(b"\xef\xbb\xbf")
        if head.startswith(b"WEBVTT"):
            cues = parse_vtt(payload)
        else:
            cues = parse_srt(payload)
        text = "\n".join(c["text"] for c in cues if c["text"])
        duration = max((c["end_ms"] for c in cues), default=0)
        return EngineResult(
            text=text,
            page_count=1,
            metadata={
                "engine": self.name,
                "n_cues": str(len(cues)),
                "duration_ms": str(duration),
            },
        )

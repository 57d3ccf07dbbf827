"""HTML main-content extraction, from scratch over stdlib ``html.parser``.

Readability-style heuristic (public technique: Readability.js / trafilatura /
boilerpipe family): parse the page into a lightweight block tree, drop
boilerplate containers entirely (script/style/nav/header/footer/aside/form…),
score every block container by text mass penalized by link density, pick the
best container, and emit its paragraphs joined by blank lines plus raw-offset
spans into the original HTML string.

This is the rebuild's analog of the reference's per-document engines
(/root/reference/src/simple_ocr/adapters/deepseek_engine.py — which OCRs
raster pages); the north-star target routes `html` payloads to a DOM
boilerplate-strip extractor instead. The class is designed for actor-pool use:
construct once per actor (``map_batches(HtmlExtractStage, concurrency=N)``),
call per row within a batch loop.

Output invariant: for a page whose main content block holds text with
single-space word separation, the extracted text is byte-identical to that
content (whitespace runs inside a paragraph collapse to single spaces;
paragraphs join with "\\n\\n").
"""

from __future__ import annotations

from html.entities import html5 as _html5_entities
from html.parser import HTMLParser
from typing import Optional

# Containers whose entire subtree is boilerplate, never content.
SKIP_TAGS = frozenset(
    "script style noscript template svg canvas head nav header footer aside "
    "form button iframe select option label datalist dialog menu".split()
)
# Block-level containers that can own paragraphs / be the main container.
BLOCK_TAGS = frozenset(
    "p div article section main body td th li h1 h2 h3 h4 h5 h6 "
    "blockquote pre figcaption dd dt caption summary details".split()
)
# Void elements (no closing tag).
VOID_TAGS = frozenset(
    "br hr img meta link input area base col embed source track wbr param".split()
)


class _Block:
    """One block-level container node in the lightweight tree."""

    __slots__ = ("tag", "parent", "depth", "index", "text_len", "link_len")

    def __init__(self, tag: str, parent: Optional["_Block"], index: int) -> None:
        self.tag = tag
        self.parent = parent
        self.depth = 0 if parent is None else parent.depth + 1
        self.index = index
        self.text_len = 0  # chars of non-link text in subtree
        self.link_len = 0  # chars of anchor text in subtree


class _Segment:
    """One raw text piece: where it sits in the source and its decoded text."""

    __slots__ = ("block", "start", "end", "text")

    def __init__(self, block: _Block, start: int, end: int, text: str) -> None:
        self.block = block
        self.start = start
        self.end = end
        self.text = text


class _Parser(HTMLParser):
    """Single-pass collector of text segments + block tree.

    ``convert_charrefs=False`` so every data/entity/charref piece arrives as a
    separate callback with an exact source position — this is what makes the
    emitted spans true byte offsets into the decoded HTML string.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.blocks: list[_Block] = []
        self.segments: list[_Segment] = []
        self._stack: list[_Block] = []
        self._skip_depth = 0
        self._link_depth = 0
        self._line_starts: list[int] = [0]

    # -- position bookkeeping ------------------------------------------------
    def prepare(self, raw: str) -> None:
        starts = [0]
        pos = raw.find("\n")
        while pos != -1:
            starts.append(pos + 1)
            pos = raw.find("\n", pos + 1)
        self._line_starts = starts

    def _abs_pos(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- tag handling --------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in VOID_TAGS:
            return
        if tag in BLOCK_TAGS:
            node = _Block(tag, self._stack[-1] if self._stack else None, len(self.blocks))
            self.blocks.append(node)
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Self-closing: neither opens a skip scope permanently nor a block.
        return

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
            return
        if tag in BLOCK_TAGS:
            # Pop to the matching open block, tolerating unbalanced HTML.
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i].tag == tag:
                    del self._stack[i:]
                    break

    # -- text handling -------------------------------------------------------
    def _emit(self, raw_len: int, text: str) -> None:
        if self._skip_depth or not self._stack:
            return
        stripped_len = len(text.strip())
        block = self._stack[-1]
        if stripped_len:
            node = block
            while node is not None:
                if self._link_depth:
                    node.link_len += stripped_len
                else:
                    node.text_len += stripped_len
                node = node.parent
        start = self._abs_pos()
        self.segments.append(_Segment(block, start, start + raw_len, text))

    def handle_data(self, data: str) -> None:
        self._emit(len(data), data)

    def handle_entityref(self, name: str) -> None:
        decoded = _html5_entities.get(name + ";", "&" + name + ";")
        self._emit(len(name) + 2, decoded)

    def handle_charref(self, name: str) -> None:
        try:
            cp = int(name[1:], 16) if name[0] in "xX" else int(name)
            decoded = chr(cp)
        except (ValueError, OverflowError):
            decoded = "&#" + name + ";"
        self._emit(len(name) + 3, decoded)


class HtmlMainContentExtractor:
    """Stateful extractor: compile-once configuration, reusable per document.

    ``extract(html_str)`` returns ``(text, spans)`` where spans is a list of
    ``{"start": int, "end": int, "kind": tag}`` dicts — raw offsets in the
    input string for each emitted paragraph.
    """

    def __init__(self, min_content_chars: int = 1, link_penalty: float = 2.0) -> None:
        self.min_content_chars = min_content_chars
        self.link_penalty = link_penalty

    def extract(self, html: str) -> tuple[str, list[dict]]:
        parser = _Parser()
        parser.prepare(html)
        try:
            parser.feed(html)
            parser.close()
        except Exception:
            # Tolerate malformed markup; score whatever was collected.
            pass

        best: Optional[_Block] = None
        best_score = 0.0
        for node in parser.blocks:
            if node.text_len < self.min_content_chars:
                continue
            score = node.text_len - self.link_penalty * node.link_len
            # Ties go to the shallowest, earliest container so sibling
            # paragraphs stay together.
            if score > best_score or (
                score == best_score
                and best is not None
                and (node.depth, node.index) < (best.depth, best.index)
            ):
                best, best_score = node, score
        if best is None:
            return "", []

        # Collect segments inside the chosen container, grouped into
        # paragraphs by their nearest block ancestor.
        paragraphs: list[tuple[str, int, int, str]] = []  # (text, start, end, kind)
        cur_block: Optional[_Block] = None
        cur_parts: list[str] = []
        cur_start = cur_end = 0

        def flush() -> None:
            nonlocal cur_parts, cur_block
            if cur_block is not None and cur_parts:
                text = " ".join("".join(cur_parts).split())
                if text:
                    paragraphs.append((text, cur_start, cur_end, cur_block.tag))
            cur_parts = []

        for seg in parser.segments:
            node = seg.block
            inside = False
            while node is not None:
                if node is best:
                    inside = True
                    break
                node = node.parent
            if not inside:
                continue
            if seg.block is not cur_block:
                flush()
                cur_block = seg.block
                cur_start = seg.start
            cur_parts.append(seg.text)
            cur_end = seg.end
        flush()

        text = "\n\n".join(p[0] for p in paragraphs)
        spans = [
            {"start": p[1], "end": p[2], "kind": p[3]} for p in paragraphs
        ]
        return text, spans

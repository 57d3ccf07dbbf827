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

import re
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


def _nonws_len(s: str) -> int:
    """Non-whitespace char count — additive across any piece split, so the
    stdlib parser (which emits entity-split pieces) and the fast scanner
    (which emits whole inter-tag runs) accumulate identical text mass."""
    return (
        len(s)
        - s.count(" ")
        - s.count("\n")
        - s.count("\t")
        - s.count("\r")
        - s.count("\x0b")
        - s.count("\x0c")
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
        self._raw = raw  # for semicolon checks on entity/char references

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
        stripped_len = _nonws_len(text)
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

    def _has_semicolon_at(self, end_of_body: int) -> bool:
        pos = self._abs_pos()
        return self._raw[pos + end_of_body : pos + end_of_body + 1] == ";"

    def handle_entityref(self, name: str) -> None:
        # html.parser fires this with or without a trailing ';' — the raw
        # length and the decode decision both depend on which it was. Policy
        # (shared with the fast scanner): only decode semicolon-terminated
        # named entities; a bare '&amp' stays as-is.
        if self._has_semicolon_at(1 + len(name)):
            self._emit(len(name) + 2, _html5_entities.get(name + ";", "&" + name + ";"))
        else:
            self._emit(len(name) + 1, "&" + name)

    def handle_charref(self, name: str) -> None:
        try:
            cp = int(name[1:], 16) if name[0] in "xX" else int(name)
            decoded = chr(cp)
        except (ValueError, OverflowError):
            decoded = None
        if self._has_semicolon_at(2 + len(name)):
            self._emit(len(name) + 3, decoded if decoded is not None else "&#" + name + ";")
        else:
            # numeric references decode even without ';' (HTML5 parse-error
            # recovery) — same choice in the fast scanner
            self._emit(len(name) + 2, decoded if decoded is not None else "&#" + name)


# ---------------------------------------------------------------------------
# Fast scanner: a regex tag tokenizer producing the same (blocks, segments)
# stream as _Parser but ~5× faster (html.parser walks the document in a
# per-character Python loop; this jumps between '<' positions with C-level
# find/match). The stdlib path is kept as the reference implementation; the
# two are asserted segment-for-segment equal on the test corpora.
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)"  # close-flag, name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"  # attrs (quote-aware)
    r"(/?)>",
)
_ENTITY_RE = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);?")
_MARKED_CLOSE_RE = re.compile(r"]\s*]?\s*>")
#: elements whose raw text runs to their literal end tag (must be a subset
#: of SKIP_TAGS — the jump below only fires inside the skip branch; stdlib
#: html.parser likewise only treats script/style as CDATA)
_RAWTEXT_TAGS = ("script", "style")


def _unescape_piece(m: "re.Match[str]") -> str:
    body = m.group(1)
    if body[0] == "#":
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            return chr(cp)
        except (ValueError, OverflowError):
            return m.group(0)
    if m.group(0).endswith(";"):
        return _html5_entities.get(body + ";", m.group(0))
    return m.group(0)  # bare entity without ';' — leave as-is (matches _Parser)


class _FastScan:
    """Single-pass regex scan → the same _Block/_Segment streams as _Parser."""

    __slots__ = ("blocks", "segments")

    def __init__(self, raw: str) -> None:
        self.blocks: list[_Block] = []
        self.segments: list[_Segment] = []
        stack: list[_Block] = []
        skip_depth = 0
        link_depth = 0
        lower = None  # lazily lowered copy for rawtext end-tag search
        n = len(raw)
        pos = 0
        find = raw.find
        tag_match = _TAG_RE.match

        def emit(start: int, end: int) -> None:
            if skip_depth or not stack:
                return
            piece = raw[start:end]
            if "&" in piece:
                text = _ENTITY_RE.sub(_unescape_piece, piece)
            else:
                text = piece
            stripped = _nonws_len(text)
            block = stack[-1]
            if stripped:
                node = block
                while node is not None:
                    if link_depth:
                        node.link_len += stripped
                    else:
                        node.text_len += stripped
                    node = node.parent
            self.segments.append(_Segment(block, start, end, text))

        while pos < n:
            lt = find("<", pos)
            if lt == -1:
                emit(pos, n)
                break
            if lt > pos:
                emit(pos, lt)
            nxt = raw[lt + 1 : lt + 2]
            if nxt == "!":
                if raw.startswith("<!--", lt):
                    end = find("-->", lt + 4)
                    pos = n if end == -1 else end + 3
                elif raw.startswith("<![", lt):
                    # marked section (<![CDATA[..]]>, <![if..]>): stdlib
                    # _markupbase consumes through "]...]>"/"]>"
                    m2 = _MARKED_CLOSE_RE.search(raw, lt + 3)
                    pos = n if m2 is None else m2.end()
                else:
                    end = find(">", lt)
                    pos = n if end == -1 else end + 1
                continue
            if nxt == "?":
                end = find(">", lt)
                pos = n if end == -1 else end + 1
                continue
            m = tag_match(raw, lt)
            if m is None:
                # stray '<' — treat as text (html.parser-compatible enough)
                emit(lt, lt + 1)
                pos = lt + 1
                continue
            closing, name, _attrs, selfclose = m.groups()
            name = name.lower()
            pos = m.end()
            if closing:
                if name in SKIP_TAGS:
                    if skip_depth:
                        skip_depth -= 1
                elif skip_depth:
                    pass
                elif name == "a":
                    if link_depth:
                        link_depth -= 1
                elif name in BLOCK_TAGS:
                    for i in range(len(stack) - 1, -1, -1):
                        if stack[i].tag == name:
                            del stack[i:]
                            break
                continue
            if selfclose:
                continue
            if name in SKIP_TAGS:
                skip_depth += 1
                if name in _RAWTEXT_TAGS:
                    # raw text element: jump to its literal end tag
                    if lower is None:
                        lower = raw.lower()
                    end = lower.find("</" + name, pos)
                    if end == -1:
                        break
                    gt = find(">", end)
                    pos = n if gt == -1 else gt + 1
                    skip_depth -= 1
                continue
            if skip_depth:
                continue
            if name == "a":
                link_depth += 1
                continue
            if name in VOID_TAGS:
                continue
            if name in BLOCK_TAGS:
                node = _Block(name, stack[-1] if stack else None, len(self.blocks))
                self.blocks.append(node)
                stack.append(node)


class HtmlMainContentExtractor:
    """Stateful extractor: compile-once configuration, reusable per document.

    ``extract(html_str)`` returns ``(text, spans)`` where spans is a list of
    ``{"start": int, "end": int, "kind": tag}`` dicts — raw offsets in the
    input string for each emitted paragraph.

    ``engine="fast"`` (default) uses the regex scanner; ``engine="stdlib"``
    uses ``html.parser``. Both produce identical output (asserted in tests).
    """

    def __init__(
        self,
        min_content_chars: int = 1,
        link_penalty: float = 2.0,
        engine: str = "fast",
    ) -> None:
        self.min_content_chars = min_content_chars
        self.link_penalty = link_penalty
        self.engine = engine

    def extract(self, html: str) -> tuple[str, list[dict]]:
        if self.engine == "fast":
            try:
                parser = _FastScan(html)
            except Exception:
                parser = self._stdlib_parse(html)
        else:
            parser = self._stdlib_parse(html)

        return self._select_and_assemble(parser)

    @staticmethod
    def _stdlib_parse(html: str) -> _Parser:
        parser = _Parser()
        parser.prepare(html)
        try:
            parser.feed(html)
            parser.close()
        except Exception:
            # Tolerate malformed markup; score whatever was collected.
            pass
        return parser

    def _select_and_assemble(self, parser) -> tuple[str, list[dict]]:
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


class DensityExtractor:
    """SECOND main-content strategy: jusText/CETD-style context-free
    per-paragraph classification (Pomikálek 2011, "Removing boilerplate and
    duplicate content from web corpora"), vs HtmlMainContentExtractor's
    best-single-container selection (Readability family). Two published
    techniques, one parse: this class reuses the same block tree + segment
    stream, so page parsing costs once per engine either way.

    Each block's OWN text (subtree totals minus child-block totals — the
    paragraph granularity jusText scores) is classified independently:

      * link density = own_link / (own_text + own_link) > max_link_density
        → boilerplate (nav lists, related-article rails);
      * own non-ws text < length_low → boilerplate ("short" class; the
        context-sensitive good-neighbor promotion of full jusText is
        deliberately omitted — classification here is context-FREE, which
        is what makes it embarrassingly parallel per page);
      * else content.

    Output: content paragraphs in document order joined by "\n\n" + raw
    spans, same contract as HtmlMainContentExtractor.extract. The two
    strategies agree byte-for-byte on well-formed article pages (both are
    hash-oracled against ground truth on the synthetic corpus) and diverge
    exactly where their published rules diverge: a medium-link-density
    paragraph (0.33 < d < 0.5) INSIDE the main container is kept by
    container selection but dropped by density classification, and a short
    trailing paragraph likewise (asserted in tests)."""

    def __init__(
        self,
        length_low: int = 25,
        max_link_density: float = 1 / 3,
        engine: str = "fast",
    ) -> None:
        self.length_low = length_low
        self.max_link_density = max_link_density
        self._base = HtmlMainContentExtractor(engine=engine)

    def extract(self, html: str) -> tuple[str, list[dict]]:
        if self._base.engine == "fast":
            try:
                parser = _FastScan(html)
            except Exception:
                parser = HtmlMainContentExtractor._stdlib_parse(html)
        else:
            parser = HtmlMainContentExtractor._stdlib_parse(html)

        # own (paragraph-granular) text/link mass: subtree minus children
        own_text = {id(b): b.text_len for b in parser.blocks}
        own_link = {id(b): b.link_len for b in parser.blocks}
        for b in parser.blocks:
            if b.parent is not None:
                own_text[id(b.parent)] -= b.text_len
                own_link[id(b.parent)] -= b.link_len

        good: set[int] = set()
        for b in parser.blocks:
            t, l = own_text[id(b)], own_link[id(b)]
            total = t + l
            if total <= 0:
                continue
            if l / total > self.max_link_density:
                continue
            if t + l < self.length_low:
                continue
            good.add(id(b))

        paragraphs: list[tuple[str, int, int, str]] = []
        cur: Optional[_Block] = None
        parts: list[str] = []
        cur_start = cur_end = 0

        def flush() -> None:
            nonlocal parts, cur
            if cur is not None and parts:
                text = " ".join("".join(parts).split())
                if text:
                    paragraphs.append((text, cur_start, cur_end, cur.tag))
            parts = []

        for seg in parser.segments:
            if id(seg.block) not in good:
                continue
            if seg.block is not cur:
                flush()
                cur = seg.block
                cur_start = seg.start
            parts.append(seg.text)
            cur_end = seg.end
        flush()

        text = "\n\n".join(p[0] for p in paragraphs)
        spans = [
            {"start": p[1], "end": p[2], "kind": p[3]} for p in paragraphs
        ]
        return text, spans

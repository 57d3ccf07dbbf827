"""From-scratch HTML ``<table>`` structure extractor — the layout-parse
counterpart to the main-content extractor (``html_extractor.py``): instead
of stripping tables as boilerplate, recover them as STRUCTURED rows/cells
(the "tables from web pages" extraction every dataset-building pipeline
wants next to main text).

Reference scope: the reference repo's HTML handling returns flat markdown
text only (src/simple_ocr/services/ocr_service.py routes html to a text
adapter); structured table recovery is an extension in the same engine
style — a stateless parser class driven from an actor-pool ``map_batches``.

Parser semantics (the subset that matters on real pages, each unit-tested):

* tag tokenizer tolerant of attribute values containing ``>`` inside
  quotes; ``<script>``/``<style>`` content skipped wholesale;
* implicit closes: a new ``<td>``/``<th>`` closes the open cell, a new
  ``<tr>`` closes the open row, ``</table>`` closes everything open —
  real-world tables routinely omit ``</td>``/``</tr>``;
* ``colspan=N`` advances the column cursor so following cells keep their
  true grid positions;
* nested tables: text inside an inner table belongs to the INNER table's
  cells (a stack, like browsers); inner tables get their own table_idx in
  document order;
* cell text: inner markup stripped, HTML entities decoded with the same
  rules as the main-content extractor (shared ``_ENTITY_RE``), whitespace
  collapsed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .html_extractor import _ENTITY_RE, _unescape_piece

#: attribute-aware tag tokenizer: quoted values may contain '>'
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>", re.S
)
_COLSPAN_RE = re.compile(r"colspan\s*=\s*[\"']?(\d+)", re.I)
_WS_RE = re.compile(r"\s+")
_RAWTEXT_END = {
    "script": re.compile(r"</script\s*>", re.I),
    "style": re.compile(r"</style\s*>", re.I),
}


def _clean(pieces: list[str]) -> str:
    text = _ENTITY_RE.sub(_unescape_piece, "".join(pieces))
    return _WS_RE.sub(" ", text).strip()


@dataclass
class _Table:
    index: int
    rows: list[list[tuple[int, str]]] = field(default_factory=list)
    row: list[tuple[int, str]] | None = None
    cell: list[str] | None = None
    col: int = 0
    span: int = 1

    def open_row(self) -> None:
        self.close_cell()
        if self.row is not None:
            self.rows.append(self.row)
        self.row = []
        self.col = 0

    def open_cell(self, attrs: str) -> None:
        self.close_cell()
        if self.row is None:  # <td> with no <tr>: implicit row (browsers do)
            self.row = []
            self.col = 0
        m = _COLSPAN_RE.search(attrs)
        self.span = max(1, int(m.group(1))) if m else 1
        self.cell = []

    def close_cell(self) -> None:
        if self.cell is not None and self.row is not None:
            self.row.append((self.col, _clean(self.cell)))
            self.col += self.span
        self.cell = None
        self.span = 1

    def close(self) -> list[list[tuple[int, str]]]:
        self.close_cell()
        if self.row is not None:
            self.rows.append(self.row)
            self.row = None
        return self.rows


def extract_tables(html: str) -> list[list[list[tuple[int, str]]]]:
    """All tables in document order (by ``<table>`` open position); each is
    a list of rows; each row a list of ``(col_idx, cell_text)``."""
    out: list[tuple[int, list[list[tuple[int, str]]]]] = []
    stack: list[_Table] = []
    n_seen = 0
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() < pos:  # inside skipped raw-text (script/style)
            continue
        if stack and stack[-1].cell is not None and m.start() > pos:
            stack[-1].cell.append(html[pos : m.start()])
        pos = m.end()
        closing, tag, attrs = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if not closing and tag in _RAWTEXT_END:
            e = _RAWTEXT_END[tag].search(html, pos)
            pos = e.end() if e else len(html)
            continue
        if tag == "table":
            if not closing:
                if stack and stack[-1].cell is not None:
                    # the nested table visually separates the outer cell's
                    # text pieces — keep them apart (collapse dedups later)
                    stack[-1].cell.append(" ")
                stack.append(_Table(n_seen))
                n_seen += 1
            elif stack:
                t = stack.pop()
                out.append((t.index, t.close()))
        elif not stack:
            continue
        elif tag == "tr":
            if closing:
                stack[-1].close_cell()
            else:
                stack[-1].open_row()
        elif tag in ("td", "th"):
            if closing:
                stack[-1].close_cell()
            else:
                stack[-1].open_cell(attrs)
    if stack and stack[-1].cell is not None and pos < len(html):
        stack[-1].cell.append(html[pos:])  # text after the last tag
    while stack:  # unclosed <table> at EOF
        t = stack.pop()
        out.append((t.index, t.close()))
    out.sort(key=lambda p: p[0])
    return [rows for _, rows in out]


class TableExtractStage:
    """Actor-pool stage: raw ``html:binary`` column in, one output row per
    table cell — ``(url, table_idx, row_idx, col_idx, cell)``. The parser
    regexes compile at import; the class exists so the stage slots into the
    same ``map_batches(Cls, concurrency=...)`` shape as every engine."""

    def __init__(self, encoding: str = "utf-8", id_col: str = "url") -> None:
        self.encoding = encoding
        self.id_col = id_col

    def __call__(self, df):
        import pandas as pd

        urls: list[object] = []
        t_idx: list[int] = []
        r_idx: list[int] = []
        c_idx: list[int] = []
        cells: list[str] = []
        for url, payload in zip(df[self.id_col], df["html"]):
            raw = payload.decode(self.encoding, errors="replace")
            for ti, rows in enumerate(extract_tables(raw)):
                for ri, row in enumerate(rows):
                    for col, text in row:
                        urls.append(url)
                        t_idx.append(ti)
                        r_idx.append(ri)
                        c_idx.append(col)
                        cells.append(text)
        import numpy as np

        return pd.DataFrame(
            {
                self.id_col: urls,
                "table_idx": np.asarray(t_idx, dtype="int64"),
                "row_idx": np.asarray(r_idx, dtype="int64"),
                "col_idx": np.asarray(c_idx, dtype="int64"),
                "cell": cells,
            }
        )

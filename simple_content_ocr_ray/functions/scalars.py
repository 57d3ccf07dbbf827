"""Scalar text functions from the reference's post-processing surface,
restated as vectorized batch transforms.

* ``extract_json`` — pull the first {...} JSON object out of generated text
  (reference: src/paddleocr_server/model.py:83-96, regex DOTALL).
* ``detect_mode_batch`` — keyword scan of a request/prompt column → extraction
  mode column (reference: src/paddleocr_server/server.py:120-138 routes
  markdown/receipt/invoice/table/form prompts; prompts.py:77-108).
"""

from __future__ import annotations

import re
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

_JSON_RE = re.compile(r"\{.*\}", re.DOTALL)

#: keyword → mode, scanned in priority order (first hit wins)
_MODE_KEYWORDS = [
    ("receipt", "receipt"),
    ("invoice", "invoice"),
    ("table", "table"),
    ("form", "form"),
    ("json", "json"),
]


def extract_json(text: str) -> Optional[str]:
    """First {...} span of the text (greedy DOTALL), or None."""
    m = _JSON_RE.search(text)
    return m.group(0) if m else None


def extract_json_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    vals = [extract_json(t) if t is not None else None for t in batch[column].to_pylist()]
    return batch.append_column("json_payload", pa.array(vals, pa.string()))


def detect_mode(text: str) -> str:
    low = text.lower()
    for kw, mode in _MODE_KEYWORDS:
        if kw in low:
            return mode
    return "markdown"


def detect_mode_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized first pass with pyarrow match_substring; rows that hit no
    keyword get the default mode without ever leaving Arrow."""
    col = pc.utf8_lower(pc.fill_null(batch[column], ""))
    modes = pa.nulls(len(batch), pa.string())
    assigned = pa.array([False] * len(batch), pa.bool_())
    for kw, mode in _MODE_KEYWORDS:
        hit = pc.match_substring(col, kw)
        take = pc.and_(hit, pc.invert(assigned))
        modes = pc.if_else(take, pa.scalar(mode, pa.string()), modes)
        assigned = pc.or_(assigned, take)
    modes = pc.if_else(assigned, modes, pa.scalar("markdown", pa.string()))
    return batch.append_column("mode", modes.combine_chunks() if hasattr(modes, "combine_chunks") else modes)

"""RTF text extraction — stdlib only.

Legacy document payloads on the web are overwhelmingly RTF when they are
not PDF/OOXML; the reference's document list stops at pdf/docx/pptx/xlsx
(/root/reference/src/simple_ocr/config.py:118), so this engine extends the
same route seam to the one remaining mainstream document format that is
parseable from its public spec with no library.

Implements the RTF 1.x core needed to recover text:

* group nesting ``{ }`` with a proper state stack (skip-state restores on
  group close);
* control words ``\\word[N]`` with optional numeric parameter and the
  space-delimiter rule; control symbols ``\\X``;
* destinations that must be SKIPPED (``\\*`` ignorable destinations plus
  the standard metadata/fonttbl/colortbl/stylesheet/pict/field-instruction
  list) — their text is not document text;
* text-producing controls: ``\\par``/``\\line`` → newline, ``\\tab`` →
  tab, ``\\emdash``/``\\endash``/quote controls → their characters,
  escaped ``\\{ \\} \\\\``;
* encoded characters: ``\\'hh`` (cp1252 byte) and ``\\uN`` signed Unicode
  with the ``\\ucN`` skip-count protocol for the fallback bytes that
  follow.

Not-RTF / unbalanced payloads raise ``UnsupportedRtfError`` → failed rows.
``make_rtf`` builds a real fixture (header, font/color tables, info
destination, styled runs) whose extraction is byte-identical to the source
text — the identity oracle the queries pin.
"""

from __future__ import annotations

__all__ = ["UnsupportedRtfError", "rtf_to_text", "make_rtf", "RtfTextEngine"]


class UnsupportedRtfError(ValueError):
    """Not RTF / structurally broken payloads — the engine seam."""


#: destination control words whose group content is never document text
_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "comment", "field", "fldinst",
    "themedata", "datastore", "latentstyles", "listtable",
    "listoverridetable", "generator", "xmlnstbl",
}

#: control words that EMIT text
_EMIT = {
    "par": "\n", "line": "\n", "tab": "\t", "emdash": "—",
    "endash": "–", "lquote": "‘", "rquote": "’",
    "ldblquote": "“", "rdblquote": "”", "bullet": "•",
    "emspace": " ", "enspace": " ", "~": " ", "_": "‑",
}


def rtf_to_text(payload: bytes) -> str:
    r"""RTF bytes → extracted document text (\par → newline)."""
    if not payload.startswith(b"{\\rtf"):
        raise UnsupportedRtfError("not an RTF payload")
    data = payload
    n = len(data)
    i = 0
    out: list[str] = []
    # state: (skipping, uc_count) saved per group
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    depth = 0
    pending_uc_skip = 0
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            stack.append((skipping, uc))
            depth += 1
            i += 1
            # \* marks an ignorable destination: skip the whole group
            if data[i : i + 2] == b"\\*":
                skipping = True
                i += 2
            continue
        if c == 0x7D:  # }
            if not stack:
                raise UnsupportedRtfError("unbalanced group close")
            skipping, uc = stack.pop()
            depth -= 1
            i += 1
            continue
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                raise UnsupportedRtfError("dangling control")
            ch = data[i]
            if ch == 0x27:  # \'hh — cp1252 encoded byte
                hexpair = data[i + 1 : i + 3]
                if len(hexpair) < 2:
                    raise UnsupportedRtfError("truncated hex escape")
                try:
                    b = int(hexpair, 16)
                except ValueError as exc:
                    raise UnsupportedRtfError("bad hex escape") from exc
                i += 3
                if pending_uc_skip:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([b]).decode("cp1252", "replace"))
                continue
            if not (0x61 <= ch <= 0x7A or 0x41 <= ch <= 0x5A):
                # control symbol: \{ \} \\ and friends
                sym = chr(ch)
                i += 1
                if pending_uc_skip:
                    pending_uc_skip -= 1
                elif not skipping:
                    if sym in "{}\\":
                        out.append(sym)
                    elif sym in _EMIT:
                        out.append(_EMIT[sym])
                continue
            # control word
            j = i
            while j < n and (0x61 <= data[j] <= 0x7A or 0x41 <= data[j] <= 0x5A):
                j += 1
            word = data[i:j].decode("ascii")
            k = j
            neg = False
            if k < n and data[k] == 0x2D:
                neg = True
                k += 1
            num_start = k
            while k < n and 0x30 <= data[k] <= 0x39:
                k += 1
            param = None
            if k > num_start:
                param = int(data[num_start:k])
                if neg:
                    param = -param
            if k < n and data[k] == 0x20:  # space delimiter consumed
                k += 1
            i = k
            if word == "uc":
                uc = param or 0
                continue
            if word == "u":
                if param is None:
                    raise UnsupportedRtfError("\\u without parameter")
                if not skipping:
                    cp = param + 65536 if param < 0 else param
                    out.append(chr(cp))
                pending_uc_skip = uc
                continue
            if word in _SKIP_DESTS:
                skipping = True
                continue
            if word in _EMIT and not skipping:
                out.append(_EMIT[word])
            continue
        # plain text byte
        if c in (0x0D, 0x0A):  # raw CR/LF are ignored per spec
            i += 1
            continue
        if pending_uc_skip:
            pending_uc_skip -= 1
            i += 1
            continue
        if not skipping:
            out.append(
                chr(c) if c < 0x80
                else bytes([c]).decode("cp1252", "replace")
            )
        i += 1
    if depth != 0:
        raise UnsupportedRtfError("unbalanced groups at EOF")
    return "".join(out)


def make_rtf(text: str) -> bytes:
    r"""Real RTF fixture: header with font/color tables and an \info
    destination, the text as styled paragraphs with non-ASCII characters
    encoded as \uN\'3f pairs (exercising the \uc fallback-skip protocol)."""
    body: list[str] = []
    for li, line in enumerate(text.split("\n")):
        if li:
            body.append("\\par ")
        style = "\\b " if li % 2 else "\\i0 "
        body.append("{" + style)
        for ch in line:
            o = ord(ch)
            if ch in "{}\\":
                body.append("\\" + ch)
            elif o < 0x80:
                body.append(ch)
            elif o < 0x8000:
                body.append(f"\\u{o}\\'3f")
            else:
                body.append(f"\\u{o - 65536}\\'3f")
        body.append("}")
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\info{\\title fixture}{\\author nobody}}"
        "{\\*\\generator scor;}"
        "\\uc1\\pard\\f0\\fs24 " + "".join(body) + "}"
    ).encode("ascii")


class RtfTextEngine:
    """Engine-seam wrapper: RTF → extracted text, identical layout to the
    OOXML text engine."""

    name = "rtf-text"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        text = rtf_to_text(payload)
        return EngineResult(
            text=text,
            page_count=1,
            metadata={"engine": self.name, "chars": str(len(text))},
        )

"""Minimal from-scratch PDF TEXT extraction — a real decoder behind the
engine seam, zero external dependencies.

The reference's PDF path rasterizes pages with pypdfium2 and OCRs them
(/root/reference/src/simple_ocr/adapters/deepseek_engine.py:268-300); that
library is absent here, so the repo's default PDF route synthesizes page
text. This module closes part of that gap with an honest-to-goodness parser
for the embedded-text subset of PDF (uncompressed content streams, Tj/TJ
show-text operators) — the same subset `pdftotext`-class tools handle
without rendering:

* object table: ``N 0 obj ... endobj`` scanned positionally (no xref
  needed — xref is an optimization, the objects are self-delimiting);
  PDF-1.5 compressed object streams (``/Type /ObjStm`` — where modern
  writers pack every non-stream object, page dicts included) are inflated
  and their contained objects merged into the table, so "no /Type /Page
  found" no longer fires on post-2005 writers;
* page ORDER follows the document's ``/Pages`` tree (recursive ``/Kids``
  walk from the root, cycle-guarded) — object-number order is only the
  fallback when no tree is present, since real writers renumber freely;
* page objects: ``/Type /Page`` with ``/Contents N 0 R`` or the equally
  common array form ``/Contents [4 0 R 7 0 R]`` (streams concatenated —
  the spec allows tokens to span the boundary, so they are joined BEFORE
  tokenizing); ``/Length`` may be a direct integer or an indirect
  reference (``/Length 5 0 R``), both resolved exactly;
* content streams: bytes between ``stream``/``endstream`` of the referenced
  object; every text-capable filter is decoded from the spec with the
  stdlib — ``/FlateDecode`` (zlib), ``/LZWDecode`` (9→12-bit TIFF-variant
  codes with EarlyChange), ``/ASCII85Decode``, ``/ASCIIHexDecode``,
  ``/RunLengthDecode``, filter ARRAYS applied in chain order, and the PNG
  predictors (``/DecodeParms /Predictor 10-15``) object/xref streams
  carry; the remaining filters (DCTDecode/JPXDecode/JBIG2Decode/CCITTFax)
  are image codecs that never hold content streams and raise
  ``UnsupportedPdfError``, the explicit seam;
* text: ``(string) Tj`` / ``' `` / ``"``, hex strings ``<4869> Tj``, and
  ``[(a) -120 (b)] TJ`` inside ``BT``/``ET`` blocks, with PDF string
  escapes (\\n, \\( … and \\ooo octal) decoded; a ``Td``/``TD``/``T*``
  vertical move emits a newline.

Per-row work is a single linear scan of the payload — the engine runs
inside the same actor pool as every other engine (stages/extract.py), so
the plumbing (binary column in, text + page_count out, failures become
failed ROWS) is identical to the reference path.
"""

from __future__ import annotations

import re

from .engines import EngineResult

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_PARENT_RE = re.compile(rb"/Parent\s+\d+\s+0\s+R")
_PARENT_REF_RE = re.compile(rb"/Parent\s+(\d+)\s+0\s+R")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_PRED_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_STREAM_START_RE = re.compile(rb"stream(?:\r\n|\n|\r)")
#: direct /Length — an indirect "/Length 5 0 R" is resolved via the object
#: table; only an unresolvable one falls back to delimiting. The (?!\d)
#: pins the group to the WHOLE number so backtracking cannot shrink
#: "/Length 123 0 R" to a bogus direct length of 12 and defeat the
#: indirect-reference lookahead.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_LENGTH_IND_RE = re.compile(rb"/Length\s+(\d+)\s+0\s+R")
_FILTER_RE = re.compile(rb"/Filter\s*(/\w+|\[[^\]]*\])")
_NAME_RE = re.compile(rb"/(\w+)")
#: filters that can carry TEXT content, all implemented from the spec with
#: the stdlib; the rest (DCTDecode/JPXDecode/JBIG2Decode/CCITTFaxDecode)
#: are image codecs that never hold content streams
_TEXT_FILTERS = {
    b"FlateDecode",
    b"LZWDecode",
    b"ASCII85Decode",
    b"ASCIIHexDecode",
    b"RunLengthDecode",
}
#: content-stream tokenizer pieces — a grammar regex cannot delimit PDF
#: text ops (balanced nested parens are legal in literal strings, ']' is
#: legal inside TJ-array strings, and 'ET' appears as a byte pair inside
#: shown prose), so streams are tokenized linearly and the show ops are
#: interpreted over the token sequence instead
_PAREN_RE = re.compile(rb"[()\\]")
#: one token per match — literal strings match just their "(" (the
#: balanced scan takes over), everything else is complete: hex strings,
#: dict delimiters, array delimiters, /names, comments, and words
#: (numbers and operators alike); whitespace and stray {} bytes are
#: skipped by the scan itself, at C speed
_CSTOK_RE = re.compile(
    rb"""\(
       | <<
       | >>
       | <[0-9A-Fa-f\s]*>?
       | [\[\]]
       | /[^\x00\t\n\x0c\r /<>\[\]{}()%]*
       | %[^\r\n]*
       | [^\x00\t\n\x0c\r /<>\[\]{}()%]+
    """,
    re.X,
)
_RES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+0\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_REF_RE = re.compile(rb"/Font\s+(\d+)\s+0\s+R")
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CSR_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


class UnsupportedPdfError(ValueError):
    """Filtered/compressed streams (or no parseable pages) — the seam where
    a codec-equipped decoder would take over."""


def _unescape(raw: bytes) -> bytes:
    if b"\\" not in raw:  # fast path: no escapes (the overwhelming case) —
        return raw        # skips the per-byte loop on multi-KB show-strings
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \d, \dd or \ddd
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # lone backslash: dropped per spec
            i += 1
    return bytes(out)


def _unhex(raw: bytes) -> bytes:
    h = b"".join(raw.split())
    if len(h) % 2:  # odd count: spec pads a trailing 0
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _stream_data(
    cobj: bytes, objs: dict[int, bytes] | None = None
) -> tuple[bytes, bool] | None:
    """Raw bytes of a content stream and whether they are length-exact.

    Streams are delimited by the /Length value when it is a direct integer
    or a resolvable indirect reference (the spec-correct way — delimiter
    scanning can never eat payload bytes). Without a usable /Length the
    stream is delimited by ``endstream`` with ONE trailing EOL stripped;
    that heuristic can eat a final 0x0D of binary data (data ending in
    ``\\r`` + writer's ``\\n`` looks like a CRLF delimiter), so callers get
    ``exact=False`` and may retry decompression with the candidate byte
    re-appended.
    """
    sm = _STREAM_START_RE.search(cobj)
    if not sm:
        return None
    start = sm.end()
    n = None
    lm = _LENGTH_RE.search(cobj[: sm.start()])
    if lm:
        n = int(lm.group(1))
    elif objs is not None:
        im = _LENGTH_IND_RE.search(cobj[: sm.start()])
        if im:  # "/Length 5 0 R": the referenced object body IS the integer
            ref = objs.get(int(im.group(1)))
            if ref is not None and ref.strip().isdigit():
                n = int(ref.strip())
    if n is not None:
        data = cobj[start : start + n]
        # trust /Length only if endstream IMMEDIATELY follows (spec: EOL +
        # endstream) — a stale /Length (stream edited after writing) falls
        # back to delimiting instead of mis-slicing
        tail = cobj[start + n : start + n + 16]
        if len(data) == n and re.match(rb"[\r\n \t]*endstream", tail):
            return data, True
    end = cobj.find(b"endstream", start)
    if end == -1:
        return None
    data = cobj[start:end]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith((b"\n", b"\r")):
        data = data[:-1]
    return data, False


def _unpredict_png(data: bytes, columns: int, bpp: int = 1) -> bytes:
    """Reverse the PNG row predictors (PDF /Predictor 10-15 over Flate
    output — the encoding xref and object streams routinely carry). Each
    row is ``1 + columns*bpp`` bytes: a per-row filter tag then the
    filtered bytes (None/Sub/Up/Average/Paeth, PNG spec §6)."""
    import numpy as np

    rowlen = columns * bpp
    stride = rowlen + 1
    if rowlen <= 0 or len(data) % stride:
        raise UnsupportedPdfError("predictor data not a whole number of rows")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, stride)
    tags, rows = arr[:, 0], arr[:, 1:].astype(np.int32)
    prev = np.zeros(rowlen, dtype=np.int32)
    out = np.empty_like(rows)
    for r in range(rows.shape[0]):
        tag, cur = int(tags[r]), rows[r]
        if tag == 0:
            line = cur
        elif tag == 2:  # Up
            line = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row running value
            line = cur.copy()
            for i in range(rowlen):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                if tag == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif tag == 3:
                    line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif tag == 4:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
                else:
                    raise UnsupportedPdfError(f"unknown predictor tag {tag}")
        out[r] = line
        prev = line
    return out.astype(np.uint8).tobytes()


def _maybe_unpredict(cobj: bytes, data: bytes) -> bytes:
    """Apply /DecodeParms PNG predictors to inflated stream data if the
    stream dict declares them (Predictor 1/absent = identity; TIFF
    predictor 2 is not emitted by real PDF writers for Flate and raises)."""
    pm = _PREDICTOR_RE.search(cobj)
    if not pm:
        return data
    pred = int(pm.group(1))
    if pred <= 1:
        return data
    if pred < 10:
        raise UnsupportedPdfError(f"unsupported TIFF predictor {pred}")
    cm = _PRED_COLUMNS_RE.search(cobj)
    columns = int(cm.group(1)) if cm else 1
    return _unpredict_png(data, columns)


def _filter_chain(head: bytes) -> list[bytes]:
    """Ordered filter names of a stream dict (single name or array form)."""
    m = _FILTER_RE.search(head)
    if not m:
        return []
    blob = m.group(1)
    if blob.startswith(b"["):
        return [n.group(1) for n in _NAME_RE.finditer(blob)]
    return [blob[1:]]


def _ascii85_decode(data: bytes) -> bytes:
    """PDF ASCII85Decode: whitespace-tolerant, ``~>`` EOD, ``z`` zero-group
    (stdlib base85)."""
    import base64

    s = b"".join(data.split())
    if s.endswith(b"~>"):
        s = s[:-2]
    try:
        return base64.a85decode(s)
    except ValueError as exc:
        raise UnsupportedPdfError(f"corrupt ASCII85 stream: {exc}") from exc


def _asciihex_decode(data: bytes) -> bytes:
    s = b"".join(data.split())
    if s.endswith(b">"):
        s = s[:-1]
    if len(s) % 2:  # spec: odd count implies a trailing 0
        s += b"0"
    try:
        return bytes.fromhex(s.decode("ascii"))
    except ValueError as exc:
        raise UnsupportedPdfError(f"corrupt ASCIIHex stream: {exc}") from exc


def _rle_decode(data: bytes) -> bytes:
    """PDF RunLengthDecode: length byte L — 0..127 copies L+1 literal
    bytes, 129..255 repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        L = data[i]
        if L == 128:
            break
        if L < 128:
            out += data[i + 1 : i + 2 + L]
            i += 2 + L
        else:
            if i + 1 >= len(data):
                raise UnsupportedPdfError("truncated RunLength stream")
            out += data[i + 1 : i + 2] * (257 - L)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """PDF LZWDecode (the TIFF variant): MSB-first variable-width codes
    growing 9→12 bits with EarlyChange=1 (the spec default — width bumps
    one code early), Clear=256, EOD=257. Missing EOD (some old writers)
    ends at input exhaustion."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise UnsupportedPdfError("LZW: first code not a literal")
                entry = table[code]
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:  # the KwKwK self-reference case
                    entry = prev + prev[:1]
                else:
                    raise UnsupportedPdfError("LZW: code beyond table")
                table[next_code] = prev + entry[:1]
                next_code += 1
                if width < 12 and next_code + 1 >= (1 << width):
                    width += 1  # EarlyChange=1
            out += entry
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """LZW-ENCODE (writer/test side), bit-exact mirror of ``_lzw_decode``'s
    width schedule."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits: list[tuple[int, int]] = [(256, width)]
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # the decoder's table lags this one by a single entry, so its
        # EarlyChange bump (next_code+1 >= 2^w) pairs with next_code >= 2^w
        # here — both sides then flip width between the same two codes
        if width < 12 and next_code >= (1 << width):
            width += 1
        if next_code == 4095:  # table nearly full: clear and restart
            bits.append((256, width))
            table = {bytes([j]): j for j in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    buf = nbuf = 0
    out = bytearray()
    for code, wd in bits:
        buf = (buf << wd) | code
        nbuf += wd
        while nbuf >= 8:
            out.append((buf >> (nbuf - 8)) & 0xFF)
            nbuf -= 8
    if nbuf:
        out.append((buf << (8 - nbuf)) & 0xFF)
    return bytes(out)


def _inflate(data: bytes, exact: bool) -> bytes:
    """zlib-decompress; on delimiter-based (inexact) extraction, retry with
    the EOL bytes the delimiter may have swallowed re-appended."""
    import zlib

    try:
        return zlib.decompress(data)
    except zlib.error as exc:
        if not exact:
            for tail in (b"\r", b"\n", b"\r\n"):
                try:
                    return zlib.decompress(data + tail)
                except zlib.error:
                    continue
        raise UnsupportedPdfError(f"corrupt Flate stream: {exc}") from exc


def _parse_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """(code → unicode string, code byte-width) of a /ToUnicode CMap:
    ``bfchar`` pairs, ``bfrange`` with a destination start (last unit
    incremented per the spec) or an explicit array, destination hex decoded
    as UTF-16BE. Width comes from the codespacerange (Identity-H = 2)."""
    width = 2
    m = _CSR_RE.search(data)
    if m:
        h = _HEX_TOK_RE.search(m.group(1))
        if h and h.group(1):
            width = max(1, len(h.group(1)) // 2)

    def uni(hexs: bytes) -> str:
        if len(hexs) % 4:  # UTF-16BE units are 4 hex chars
            hexs = hexs + b"0" * (-len(hexs) % 4)
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "replace")

    cmap: dict[int, str] = {}
    for blk in _BFCHAR_RE.findall(data):
        toks = [t[0] for t in _HEX_TOK_RE.findall(blk) if t[0]]
        for j in range(0, len(toks) - 1, 2):
            cmap[int(toks[j], 16)] = uni(toks[j + 1])
    for blk in _BFRANGE_RE.findall(data):
        toks: list[bytes | str] = []
        for hx, lb, rb_ in _HEX_TOK_RE.findall(blk):
            toks.append(hx if hx else ("[" if lb else "]"))
        i = 0
        while i + 2 < len(toks):  # each entry: lo, hi, then dst or [array]
            lo_t, hi_t = toks[i], toks[i + 1]
            if not isinstance(lo_t, bytes) or not isinstance(hi_t, bytes):
                break
            lo, hi = int(lo_t, 16), int(hi_t, 16)
            i += 2
            if i < len(toks) and toks[i] == "[":
                i += 1
                c = lo
                while i < len(toks) and toks[i] != "]":
                    if isinstance(toks[i], bytes) and c <= hi:
                        cmap[c] = uni(toks[i])
                        c += 1
                    i += 1
                i += 1  # past "]"
            elif i < len(toks) and isinstance(toks[i], bytes):
                dst = toks[i]
                base = int(dst, 16)
                nbytes = (len(dst) + 1) // 2
                for c in range(lo, hi + 1):
                    v = (base + (c - lo)).to_bytes(max(nbytes, 2), "big")
                    cmap[c] = v.decode("utf-16-be", "replace")
                i += 1
            else:
                break
    return cmap, width


def _mapped(raw: bytes, cmap: dict[int, str], width: int) -> str:
    """Glyph-code bytes → unicode through a CMap (unmapped codes become
    U+FFFD, the pdftotext convention); a trailing partial code is dropped."""
    return "".join(
        cmap.get(int.from_bytes(raw[i : i + width], "big"), "�")
        for i in range(0, len(raw) - width + 1, width)
    )


def _scan_literal(stream: bytes, i: int) -> tuple[bytes, int]:
    """Contents of a literal string whose ``(`` sits at ``i - 1`` and the
    index past its closing ``)``. Balanced nested parens are legal inside
    PDF strings (spec §7.3.4.2) and escaped delimiters must not count —
    neither is expressible in the regex grammar this replaces. The scan
    jumps delimiter-to-delimiter (C regex), not byte-by-byte."""
    depth, pos, start = 1, i, i
    while True:
        m = _PAREN_RE.search(stream, pos)
        if m is None:  # unterminated: the rest of the stream is the string
            return stream[start:], len(stream)
        b = stream[m.start()]
        if b == 0x5C:  # backslash: the escaped byte is never a delimiter
            pos = m.start() + 2
        elif b == 0x28:  # (
            depth += 1
            pos = m.start() + 1
        else:  # )
            depth -= 1
            if depth == 0:
                return stream[start : m.start()], m.start() + 1
            pos = m.start() + 1


def _tokens(stream: bytes):
    """(kind, value) tokens of a content stream: ``str`` (raw literal-string
    bytes, escapes still encoded), ``hex``, ``name``, ``arr`` (``[``/``]``)
    and ``word`` (numbers and operators alike — the interpreter tells them
    apart). ``<<``/``>>`` dicts, ``{``/``}``, and comments are consumed as
    noise; inline-image data (``ID … EI``) is skipped wholesale so binary
    bytes never reach the text grammar. The scan is ``finditer`` over one
    master token regex, restarted only after a literal string (whose
    balanced parens need the manual scan) or an inline image."""
    pos, n = 0, len(stream)
    while pos < n:
        restarted = False
        for m in _CSTOK_RE.finditer(stream, pos):
            tok = m.group(0)
            c = tok[0]
            if c == 0x28:  # (  — hand over to the balanced-paren scan
                raw, pos = _scan_literal(stream, m.start() + 1)
                yield "str", raw
                restarted = True
                break
            if c == 0x3C:  # <hex> — or << dict open (noise)
                if tok != b"<<":
                    yield "hex", tok[1:-1] if tok.endswith(b">") else tok[1:]
            elif c in (0x5B, 0x5D):  # [ ]
                yield "arr", tok
            elif c == 0x2F:  # /Name
                yield "name", tok[1:]
            elif c == 0x3E or c == 0x25:  # >> dict close / % comment
                pass
            elif tok == b"ID":  # inline image: binary data up to EI
                j = stream.find(b"EI", m.end())
                pos = n if j < 0 else j + 2
                restarted = True
                break
            else:
                yield "word", tok
        if not restarted:
            return


def _stream_text(
    stream: bytes, fontmaps: dict[bytes, tuple[dict[int, str], int]] | None = None
) -> str:
    """Text of one content stream: concatenate strings shown by Tj/'/"/TJ
    inside BT/ET blocks; Td/TD/T* becomes a newline (unless at start).
    ``fontmaps`` routes strings shown under a /ToUnicode-carrying font
    (selected by ``Tf``) through its CMap — the Identity-H/embedded-subset
    case where raw bytes are glyph codes, not characters. BT/ET and the
    show ops are recognized as TOKENS, so 'ET' inside shown prose (GET,
    MARKET…) cannot truncate the block the way a byte-pair regex did."""
    fontmaps = fontmaps or {}
    cur: tuple[dict[int, str], int] | None = None
    parts: list[str] = []
    in_text = False
    last_str: bytes | None = None
    last_name: bytes | None = None
    arr: list[bytes] | None = None
    collecting = False

    def shown(raw: bytes) -> str:
        if cur is not None:
            return _mapped(raw, cur[0], cur[1])
        return raw.decode("latin-1")

    for kind, val in _tokens(stream):
        if kind == "str" or kind == "hex":
            raw = _unescape(val) if kind == "str" else _unhex(val)
            if collecting:
                arr.append(raw)
            else:
                last_str = raw
        elif kind == "arr":
            if val == b"[":
                arr, collecting = [], True
            else:
                collecting = False
        elif kind == "name":
            last_name = val
        elif val == b"BT":
            in_text = True
        elif val == b"ET":
            in_text = False
        elif val in (b"Tj", b"'", b'"'):
            if in_text and last_str is not None:
                parts.append(shown(last_str))
            last_str = None  # show ops consume their operand
        elif val == b"TJ":
            if in_text and arr is not None:
                parts.extend(shown(r) for r in arr)
            arr = None
        elif val == b"Tf":
            cur = fontmaps.get(last_name) if last_name is not None else None
        elif val in (b"Td", b"TD", b"T*"):
            if in_text and parts and parts[-1] != "\n":
                parts.append("\n")
    return "".join(parts).strip("\n")


def _decoded_stream(cobj: bytes, objs: dict[int, bytes]) -> bytes | None:
    """Fully decoded bytes of one stream object — the whole /Filter CHAIN
    (e.g. ``[/ASCII85Decode /FlateDecode]``) applied in order, with PNG
    predictors after the compression stage — or None when the object
    carries no stream. Filter names are parsed from the DICT region only
    (before the ``stream`` keyword), never from stream data that happens
    to contain the token."""
    sm = _STREAM_START_RE.search(cobj)
    head = cobj[: sm.start()] if sm else cobj
    filters = _filter_chain(head)
    bad = [f for f in filters if f not in _TEXT_FILTERS]
    if bad:
        raise UnsupportedPdfError(
            f"unsupported content filter {bad[0].decode()!r} — image codecs "
            "never hold content streams; this is the explicit seam"
        )
    sd = _stream_data(cobj, objs)
    if sd is None:
        return None
    data, exact = sd
    for f in filters:
        if f == b"FlateDecode":
            data = _maybe_unpredict(head, _inflate(data, exact))
        elif f == b"LZWDecode":
            data = _maybe_unpredict(head, _lzw_decode(data))
        elif f == b"ASCII85Decode":
            data = _ascii85_decode(data)
        elif f == b"ASCIIHexDecode":
            data = _asciihex_decode(data)
        else:
            data = _rle_decode(data)
        exact = True  # later chain stages see exactly-delimited bytes
    return data


def _unpack_object_streams(objs: dict[int, bytes]) -> None:
    """Merge objects packed in PDF-1.5 ``/Type /ObjStm`` streams into the
    object table. The stream layout (spec §7.5.7): ``/N`` pairs of
    ``objnum offset`` integers, then object bodies starting at ``/First``.
    Contained objects carry no ``obj``/``endobj`` wrappers. Top-level
    definitions win on objnum collision (spec forbids duplicates; a
    damaged file should not let a packed object shadow a scanned one).
    Container entries are dropped afterwards — an UNcompressed container's
    body textually contains the packed dicts, and must not itself match
    the page/pages scans."""
    containers: list[int] = []
    for cont_num, body in list(objs.items()):
        if not _OBJSTM_RE.search(body):
            continue
        containers.append(cont_num)
        nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
        data = _decoded_stream(body, objs)
        if not (nm and fm) or data is None:
            raise UnsupportedPdfError("malformed /ObjStm header")
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            raise UnsupportedPdfError("short /ObjStm pair table")
        nums = [int(x) for x in header[0 : 2 * n : 2]]
        offs = [int(x) for x in header[1 : 2 * n : 2]]
        for i, (num, off) in enumerate(zip(nums, offs)):
            end = offs[i + 1] if i + 1 < n else len(data) - first
            objs.setdefault(num, data[first + off : first + end])
    for cont_num in containers:
        del objs[cont_num]


def _page_fontmaps(
    page_body: bytes, objs: dict[int, bytes]
) -> dict[bytes, tuple[dict[int, str], int]]:
    """font resource name → (ToUnicode CMap, code width) for one page.
    /Resources may be inline, an indirect ref, or INHERITED through the
    page's /Parent chain (a layout real writers use constantly — and per
    spec §7.7.3.4 only ANCESTORS may supply inherited attributes, never a
    sibling /Pages subtree, whose fonts could map the same resource name
    through a different CMap); /Font likewise may be inline or a ref.
    Fonts without /ToUnicode get no entry — their strings pass through as
    latin-1, the pre-CMap behavior."""
    chain = [page_body]
    seen: set[int] = set()
    body = page_body
    while True:  # cycle-guarded walk up the /Parent chain
        pm = _PARENT_REF_RE.search(body)
        if not pm:
            break
        num = int(pm.group(1))
        if num in seen:
            break
        seen.add(num)
        body = objs.get(num, b"")
        chain.append(body)
    font_region: bytes | None = None
    for region in chain:
        rm = _RES_REF_RE.search(region)
        res = objs.get(int(rm.group(1)), b"") if rm else region
        fm = _FONT_DICT_RE.search(res)
        if fm:
            font_region = fm.group(1)
            break
        fr = _FONT_REF_RE.search(res)
        if fr:
            font_region = objs.get(int(fr.group(1)), b"")
            break
    if not font_region:
        return {}
    out: dict[bytes, tuple[dict[int, str], int]] = {}
    for m in _FONT_ENTRY_RE.finditer(font_region):
        name, ref = m.group(1), int(m.group(2))
        tu = _TOUNICODE_RE.search(objs.get(ref, b""))
        if not tu:
            continue
        data = _decoded_stream(objs.get(int(tu.group(1)), b""), objs)
        if data:
            out[name] = _parse_cmap(data)
    return out


def _contents_refs(page_body: bytes) -> list[int]:
    """Object numbers of a page's content stream(s): single-ref and array
    (``/Contents [4 0 R 7 0 R]``) forms."""
    am = _CONTENTS_ARR_RE.search(page_body)
    if am:
        return [int(m.group(1)) for m in _REF_RE.finditer(am.group(1))]
    cm = _CONTENTS_RE.search(page_body)
    return [int(cm.group(1))] if cm else []


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Document page order: recursive ``/Kids`` walk from the root
    ``/Pages`` node (the node with no ``/Parent``), falling back to
    object-number order when no usable tree exists — real writers
    renumber objects freely, so the tree, not the numbering, is
    authoritative."""
    roots = [
        num
        for num, body in objs.items()
        if _PAGES_RE.search(body) and not _PARENT_RE.search(body)
    ]
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen:  # cycle guard: damaged files must not hang the task
            return
        seen.add(num)
        body = objs.get(num, b"")
        if _PAGE_RE.search(body):
            order.append(num)
            return
        km = _KIDS_RE.search(body)
        if km:
            for m in _REF_RE.finditer(km.group(1)):
                walk(int(m.group(1)))

    for root in sorted(roots):
        walk(root)
    if order:
        return order
    return [num for num in sorted(objs) if _PAGE_RE.search(objs[num])]


def extract_pdf_text(payload: bytes) -> list[str]:
    """Per-page text of an embedded-text PDF, in page-tree order."""
    if not payload.startswith(b"%PDF"):
        raise UnsupportedPdfError("not a PDF payload")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    _unpack_object_streams(objs)
    pages: list[str] = []
    for num in _page_order(objs):
        refs = _contents_refs(objs[num])
        if not refs:
            pages.append("")
            continue
        # multiple content streams form ONE logical stream (tokens may span
        # the boundary) — join raw bytes before tokenizing, with the
        # whitespace byte the spec guarantees between them
        chunks = [
            data
            for cnum in refs
            if (data := _decoded_stream(objs.get(cnum, b""), objs)) is not None
        ]
        # a page whose /Contents refs resolve to NOTHING is a truncated /
        # damaged file (the stream object's endobj was cut away), not an
        # intentionally blank page — silent empty text here would let a
        # connection-reset capture masquerade as a completed row (r5)
        if refs and not chunks:
            raise UnsupportedPdfError(
                "missing or truncated page content stream"
            )
        fontmaps = _page_fontmaps(objs[num], objs)
        pages.append(
            _stream_text(b"\n".join(chunks), fontmaps) if chunks else ""
        )
    if not pages:
        raise UnsupportedPdfError("no /Type /Page objects found")
    return pages


#: byte-exact page separator of the reference combine path
#: (deepseek_engine.py:336-358 semantics, reused from the mock route)
PAGE_SEP = "\n\n---\n\n"


class PdfTextEngine:
    """Engine-seam wrapper: real embedded-text extraction for minimal PDFs;
    anything needing codecs or rasterization raises (→ failed row)."""

    name = "pdf-text"

    def extract(self, url: str, payload: bytes, content_type: str) -> EngineResult:
        pages = extract_pdf_text(payload)
        return EngineResult(
            text=PAGE_SEP.join(pages),
            page_count=len(pages),
            metadata={"engine": self.name},
        )


def _predict_png_rows(data: bytes, columns: int) -> bytes:
    """PNG-predictor-ENCODE ``data`` (test/demo writer side): pad to whole
    rows with spaces, cycle through all five filter tags so every decoder
    path is exercised."""
    data += b" " * ((-len(data)) % columns)
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        tag = (r // columns) % 5
        out.append(tag)
        for i, byte in enumerate(row):
            a = row[i - 1] if i else 0
            b = prev[i]
            if tag == 0:
                pred = 0
            elif tag == 1:
                pred = a
            elif tag == 2:
                pred = b
            elif tag == 3:
                pred = (a + b) >> 1
            else:
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((byte - pred) & 0xFF)
        prev = row
    return bytes(out)


def make_minimal_pdf(
    pages: list[list[str]],
    flate: bool = False,
    contents_split: int = 1,
    indirect_length: bool = False,
    objstm: bool = False,
    predictor: int = 0,
) -> bytes:
    """Build a small VALID PDF (used by tests and demos): each inner list =
    lines of that page. Writer knobs mirror real-world layouts:

    * ``flate`` — zlib-compressed (/FlateDecode) content streams;
    * ``contents_split=k`` — k content streams per page referenced via the
      array form ``/Contents [a 0 R b 0 R]``;
    * ``indirect_length`` — ``/Length N 0 R`` with the integer in its own
      object;
    * ``objstm`` — catalog/pages/page dicts packed into a Flate
      ``/Type /ObjStm`` object stream (the PDF-1.5 layout modern writers
      default to);
    * ``predictor`` (with ``objstm``) — PNG row predictors on the object
      stream via ``/DecodeParms``.
    """
    import zlib

    n_pages = len(pages)
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            "<< /Type /Pages /Count %d /Kids [%s] >>"
            % (n_pages, " ".join(f"{3 + i} 0 R" for i in range(n_pages)))
        ).encode(),
    }
    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict, raw bytes)
    next_num = 3 + n_pages
    for i, lines in enumerate(pages):
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if k > 0:
                ops.append("0 -14 Td")
            ops.append(f"({esc}) Tj")
        ops.append("ET")
        k = max(1, contents_split)
        chunks = [ops[j * len(ops) // k : (j + 1) * len(ops) // k] for j in range(k)]
        refs: list[int] = []
        for chunk in chunks:
            if not chunk:
                continue
            content = " ".join(chunk).encode("latin-1")
            filt = ""
            if flate:
                content = zlib.compress(content)
                filt = " /Filter /FlateDecode"
            num, next_num = next_num, next_num + 1
            if indirect_length:
                lnum, next_num = next_num, next_num + 1
                objects[lnum] = str(len(content)).encode()
                ldecl = f"/Length {lnum} 0 R"
            else:
                ldecl = f"/Length {len(content)}"
            streams[num] = (f"<< {ldecl}{filt} >>".encode(), content)
            refs.append(num)
        cdecl = (
            f"/Contents {refs[0]} 0 R"
            if len(refs) == 1
            else "/Contents [" + " ".join(f"{r} 0 R" for r in refs) + "]"
        )
        objects[3 + i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] {cdecl} >>"
        ).encode()

    packed: set[int] = set()
    if objstm:
        packed = {1, 2, *range(3, 3 + n_pages)}
        nums = sorted(packed)
        bodies = [objects[n] for n in nums]
        offs, cur = [], 0
        for b in bodies:
            offs.append(cur)
            cur += len(b) + 1
        header = " ".join(f"{n} {o}" for n, o in zip(nums, offs)).encode() + b"\n"
        data = header + b"\n".join(bodies)
        dparms = ""
        if predictor >= 10:
            data = _predict_png_rows(data, 16)
            dparms = f" /DecodeParms << /Predictor {predictor} /Columns 16 >>"
        comp = zlib.compress(data)
        snum, next_num = next_num, next_num + 1
        streams[snum] = (
            (
                f"<< /Type /ObjStm /N {len(nums)} /First {len(header)} "
                f"/Length {len(comp)} /Filter /FlateDecode{dparms} >>"
            ).encode(),
            comp,
        )

    out = bytearray(b"%PDF-1.5\n" if objstm else b"%PDF-1.4\n")
    for num in sorted(objects):
        if num not in packed:
            out += f"{num} 0 obj ".encode() + objects[num] + b" endobj\n"
    for num in sorted(streams):
        d, content = streams[num]
        out += (
            f"{num} 0 obj ".encode() + d + b" stream\n" + content
            + b"\nendstream endobj\n"
        )
    out += b"%%EOF\n"
    return bytes(out)


# registered as "pdf-text" in stages/engines.py (lazy factory, so workers
# that only import engines.py can still resolve the route name)

"""Web-page charset sniffing + decoding, the WHATWG-encoding way.

A large share of the crawled web is not UTF-8 (windows-125x, shift_jis,
euc-kr, gbk, iso-8859-*); hard-decoding UTF-8 with ``errors="replace"``
mojibakes all of it. This is the browser algorithm in miniature, stdlib
codecs only:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE) — authoritative;
2. ``charset=`` parameter of the transport Content-Type, when the caller
   has one;
3. ``<meta charset=…>`` / ``<meta http-equiv="Content-Type" …>`` scanned
   in the first 2 KiB (the prescan window browsers use; meta is
   ASCII-compatible in every encoding this handles);
4. strict UTF-8 trial decode — valid UTF-8 is essentially never another
   legacy encoding by accident;
5. windows-1252 fallback (the de-facto web default; it decodes any byte
   sequence, so this step cannot fail).

Per the WHATWG mapping, declared ``iso-8859-1``/``ascii`` MEAN
windows-1252 on the web (bytes 0x80-0x9F are used as cp1252 punctuation
by real pages regardless of the label) — the sniffer applies that
substitution. Labels Python's codec registry does not know fall through
to the UTF-8 trial.
"""

from __future__ import annotations

import codecs
import re

#: per-tag scan (the WHATWG prescan examines meta tags one at a time):
#: a ``charset`` ATTRIBUTE counts on any meta, but ``charset=`` inside a
#: ``content`` attribute value counts ONLY when the same tag carries
#: ``http-equiv=Content-Type`` — otherwise page prose like
#: content="how to set charset=koi8-r" would hijack the document encoding
_META_TAG_RE = re.compile(rb"<meta\b[^>]*", re.I)
_CONTENT_ATTR_RE = re.compile(rb"""content\s*=\s*("[^"]*"|'[^']*')""", re.I)
_CHARSET_ATTR_RE = re.compile(
    rb"""[\s"']charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""", re.I
)
_HTTP_EQUIV_CT_RE = re.compile(
    rb"""http-equiv\s*=\s*["']?\s*content-type""", re.I
)
_CONTENT_CHARSET_RE = re.compile(
    rb"""content\s*=\s*["'][^"']*charset\s*=\s*([A-Za-z0-9._:-]+)""", re.I
)
_CT_RE = re.compile(r"charset\s*=\s*\"?'?\s*([A-Za-z0-9._:-]+)", re.I)

#: WHATWG label→encoding substitutions the stdlib registry doesn't apply
_WHATWG_ALIASES = {
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
}

_PRESCAN = 2048


def _normalize_label(label: str) -> str | None:
    """A usable Python codec name for a declared charset label, or None."""
    label = label.strip().strip(";\"'").lower()
    label = _WHATWG_ALIASES.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(payload: bytes, content_type: str = "") -> str:
    """The encoding a browser would decode ``payload`` with."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _CT_RE.search(content_type or "")
    if m:
        enc = _normalize_label(m.group(1))
        if enc:
            # BOM checks already ran, so a utf-16 label here has no BOM to
            # back it — decoding ASCII-compatible bytes as utf-16 mojibakes
            # the whole page; remap to UTF-8 like the meta path below
            return "utf-8" if enc.startswith("utf-16") else enc
    for tag in _META_TAG_RE.finditer(payload[:_PRESCAN]):
        raw = tag.group(0)
        label: bytes | None = None
        # the charset ATTRIBUTE — matched with content values blanked so
        # charset= inside prose can never be mistaken for the attribute
        am = _CHARSET_ATTR_RE.search(_CONTENT_ATTR_RE.sub(b"content=x", raw))
        if am:
            label = am.group(1)
        elif _HTTP_EQUIV_CT_RE.search(raw):
            cm = _CONTENT_CHARSET_RE.search(raw)
            if cm:
                label = cm.group(1)
        if label is None:
            continue
        enc = _normalize_label(label.decode("ascii"))
        if enc:
            # WHATWG "get an encoding from meta": a utf-16 label is a lie
            # by construction (the meta itself was readable as ASCII) and
            # is remapped to UTF-8
            return "utf-8" if enc.startswith("utf-16") else enc
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_html(payload: bytes, content_type: str = "") -> str:
    """Sniff + decode; a BOM is stripped, and stray undecodable bytes under
    the sniffed encoding are replaced rather than failing the row."""
    enc = sniff_charset(payload, content_type)
    if enc == "utf-8" and payload[:3] == b"\xef\xbb\xbf":
        payload = payload[3:]
    elif enc.startswith("utf-16") and payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        payload = payload[2:]
    return payload.decode(enc, errors="replace")

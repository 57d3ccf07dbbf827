"""Charset sniffing + decoding (stages/charset.py): BOMs, transport and
meta declarations, WHATWG label substitution, UTF-8 trial, cp1252
fallback, and the html engine wiring."""

from __future__ import annotations

import pytest

from simple_content_ocr_ray.stages.charset import decode_html, sniff_charset

RU = "Привет мир"
JA = "こんにちは"


def _page(body: str, meta: str = "") -> str:
    return f"<!doctype html><html><head>{meta}</head><body><p>{body}</p></body></html>"


def test_utf8_bom_wins_and_is_stripped():
    raw = b"\xef\xbb\xbf" + _page(RU).encode("utf-8")
    assert sniff_charset(raw) == "utf-8"
    assert decode_html(raw).startswith("<!doctype")  # BOM not in the text
    assert RU in decode_html(raw)


@pytest.mark.parametrize("enc,bom", [("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")])
def test_utf16_boms(enc, bom):
    raw = bom + _page(RU).encode(enc)
    assert sniff_charset(raw) == enc
    assert RU in decode_html(raw)


def test_content_type_charset_beats_meta():
    raw = _page(RU, meta='<meta charset="utf-8">').encode("cp1251")
    # transport header says cp1251 — it wins over the (wrong) meta
    assert sniff_charset(raw, "text/html; charset=windows-1251") == "cp1251"
    assert RU in decode_html(raw, "text/html; charset=windows-1251")


@pytest.mark.parametrize(
    "meta,enc",
    [
        ('<meta charset="windows-1251">', "cp1251"),
        ("<meta charset=Shift_JIS>", "shift_jis"),
        (
            '<meta http-equiv="Content-Type" content="text/html; charset=EUC-KR">',
            "euc_kr",
        ),
    ],
)
def test_meta_declarations(meta, enc):
    body = JA if enc == "shift_jis" else ("안녕" if enc == "euc_kr" else RU)
    raw = _page(body, meta=meta).encode(enc)
    assert sniff_charset(raw) == enc
    assert body in decode_html(raw)


def test_whatwg_iso_8859_1_means_cp1252():
    # byte 0x97 is an em-dash in cp1252 but a C1 control in real iso-8859-1;
    # browsers decode it as cp1252 regardless of the declared label
    raw = _page("a X b", meta='<meta charset="iso-8859-1">').encode(
        "ascii"
    ).replace(b"X", b"\x97")
    assert sniff_charset(raw) == "cp1252"
    assert "—" in decode_html(raw)


def test_undeclared_valid_utf8_sniffs_utf8():
    raw = _page(JA).encode("utf-8")
    assert sniff_charset(raw) == "utf-8"
    assert JA in decode_html(raw)


def test_undeclared_legacy_bytes_fall_back_to_cp1252():
    raw = _page("caf\xe9").encode("cp1252")  # 0xE9 alone is invalid UTF-8
    assert sniff_charset(raw) == "cp1252"
    assert "café" in decode_html(raw)


def test_unknown_label_falls_through():
    raw = _page("plain ascii", meta='<meta charset="x-not-a-charset">').encode()
    assert sniff_charset(raw) == "utf-8"


def test_html_engine_decodes_legacy_page():
    from simple_content_ocr_ray.stages.engines import HtmlEngine

    page = _page(RU, meta='<meta charset="windows-1251">')
    res = HtmlEngine().extract(
        "https://ru.example/1", page.encode("cp1251"), "text/html"
    )
    assert RU in res.text


def test_charset_in_prose_content_does_not_hijack():
    """charset= inside a non-Content-Type meta's content value is page
    PROSE, not a declaration (WHATWG prescan honors it only under
    http-equiv=Content-Type)."""
    from simple_content_ocr_ray.stages.charset import sniff_charset

    page = (
        b'<meta name="description" content="how to set charset=koi8-r">'
        b"<p>\xc3\xa9</p>"
    )
    assert sniff_charset(page) == "utf-8"


def test_http_equiv_content_type_charset_still_honored():
    from simple_content_ocr_ray.stages.charset import sniff_charset

    page = b'<meta http-equiv="Content-Type" content="text/html; charset=euc-kr">'
    assert sniff_charset(page) == "euc_kr"


def test_utf16_meta_label_remaps_to_utf8():
    """A meta that declares utf-16 was itself readable as ASCII — the
    label is a lie by construction and WHATWG remaps it to UTF-8."""
    from simple_content_ocr_ray.stages.charset import decode_html, sniff_charset

    assert decode_html(b'<meta charset="utf-16"><p>hi</p>') == (
        '<meta charset="utf-16"><p>hi</p>'
    )
    assert sniff_charset(b"<p>x</p>", "text/html; charset=utf-16") == "utf-8"

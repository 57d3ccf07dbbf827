"""From-scratch OOXML (docx/pptx/xlsx) text extraction tests
(stages/ooxml_text.py)."""

from __future__ import annotations

import pytest

from simple_content_ocr_ray.stages.ooxml_text import (
    UnsupportedOoxmlError,
    detect_ooxml_kind,
    extract_docx_text,
    extract_pptx_text,
    extract_xlsx_text,
    make_docx,
    make_pptx,
    make_xlsx,
)


def test_docx_paragraphs_roundtrip():
    pages = [["Hello world", "second paragraph", ""], ["page two <x> & y"]]
    out = extract_docx_text(make_docx(pages))
    assert out == ["Hello world\nsecond paragraph\n", "page two <x> & y"]


def test_docx_preserves_whitespace():
    out = extract_docx_text(make_docx([["  leading and trailing  "]]))
    assert out == ["  leading and trailing  "]


def test_docx_tabs_and_breaks():
    import re

    # hand-built runs: tab and soft line break inside one paragraph
    payload = make_docx([["placeholder"]])
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        doc = zf.read("word/document.xml").decode()
    doc = doc.replace(
        '<w:t xml:space="preserve">placeholder</w:t>',
        '<w:t xml:space="preserve">a</w:t><w:tab/>'
        '<w:t xml:space="preserve">b</w:t><w:br/>'
        '<w:t xml:space="preserve">c</w:t>',
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert extract_docx_text(buf.getvalue()) == ["a\tb\nc"]


def test_pptx_slides_in_numeric_order():
    # 11 slides: lexical order would put slide10 before slide2
    slides = [[f"slide {i}"] for i in range(1, 12)]
    out = extract_pptx_text(make_pptx(slides))
    assert out == [f"slide {i}" for i in range(1, 12)]


def test_xlsx_shared_strings_and_numbers():
    sheets = [
        [["name", "qty"], ["widget", 3], ["gadget", 12]],
        [["total", 15]],
    ]
    out = extract_xlsx_text(make_xlsx(sheets))
    assert out == ["name\tqty\nwidget\t3\ngadget\t12", "total\t15"]


def test_kind_detection():
    assert detect_ooxml_kind(make_docx([["x"]])) == "docx"
    assert detect_ooxml_kind(make_pptx([["x"]])) == "pptx"
    assert detect_ooxml_kind(make_xlsx([[["x"]]])) == "xlsx"


def test_seams():
    import io
    import zipfile

    with pytest.raises(UnsupportedOoxmlError, match="not a zip"):
        detect_ooxml_kind(b"PK\x03\x04 but corrupt")
    # valid zip that is not an OOXML package
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "hi")
    with pytest.raises(UnsupportedOoxmlError, match="not a known OOXML"):
        detect_ooxml_kind(buf.getvalue())
    # encrypted OOXML = CFB container
    with pytest.raises(UnsupportedOoxmlError, match="encrypted"):
        detect_ooxml_kind(b"\xd0\xcf\x11\xe0" + b"\x00" * 32)


def test_zip_routes_through_real_route():
    import pyarrow as pa

    from simple_content_ocr_ray.stages.extract import REAL_ROUTE, ExtractStage
    from simple_content_ocr_ray.stages.sniff import sniff_batch

    good = make_docx([["body text here"]])
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "not ooxml")
    batch = pa.table({"url": ["a", "b"], "html": [good, buf.getvalue()]})
    out = ExtractStage(route=REAL_ROUTE)(sniff_batch(batch))
    assert out["content_type"].to_pylist() == ["zip", "zip"]
    assert out["status"].to_pylist() == ["completed", "failed"]
    assert out["text"].to_pylist()[0] == "body text here"
    meta = out["metadata"].to_pylist()[0]
    assert meta["engine"] == "ooxml-text"


def test_docx_carriage_return_roundtrip():
    """Text containing \\r / \\r\\n must survive byte-identically: XML
    parsers normalize literal CR to LF, so the builder emits &#13;."""
    out = extract_docx_text(make_docx([["line a\r", "b\rc"]]))
    assert out == ["line a\r\nb\rc"]
    # xlsx shared strings too
    sheets = [[["x\ry", 1]]]
    assert extract_xlsx_text(make_xlsx(sheets)) == ["x\ry\t1"]

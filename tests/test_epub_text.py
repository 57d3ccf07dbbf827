"""EPUB text extraction (r4, stages/epub_text.py) through the zip route."""

import pytest

from simple_content_ocr_ray.stages.epub_text import (
    UnsupportedEpubError,
    extract_epub,
    is_epub,
    make_epub,
)
from simple_content_ocr_ray.stages.ooxml_text import (
    OoxmlTextEngine,
    UnsupportedOoxmlError,
)


def test_roundtrip_and_spine_order():
    chs = [["first line one", "first line two"], ["second chapter text"]]
    title, out = extract_epub(make_epub("My Book", chs))
    assert title == "My Book"
    assert out == ["first line one\nfirst line two", "second chapter text"]


def test_nav_decoy_and_styles_excluded():
    _, out = extract_epub(make_epub("t", [["only chapter"]]))
    joined = "".join(out)
    assert "DECOY" not in joined and "color" not in joined


def test_inline_markup_collapses_into_line():
    # odd lines get an <em> split in the fixture; text must survive intact
    _, out = extract_epub(make_epub("t", [["a", "b with words"]]))
    assert out == ["a\nb with words"]


def test_seams():
    assert not is_epub(b"junk")
    with pytest.raises(UnsupportedEpubError, match="zip"):
        extract_epub(b"PK\x03\x04junk")
    good = make_epub("t", [["x"]])
    with pytest.raises(UnsupportedEpubError):
        extract_epub(good[:-30])


def test_zip_route_dispatches_epub():
    res = OoxmlTextEngine().extract("", make_epub("T", [["a"], ["b"]]), "zip")
    assert res.metadata["ooxml_kind"] == "epub"
    assert res.metadata["title"] == "T"
    assert res.page_count == 2
    assert res.text == "a\n\n---\n\nb"


def test_zip_route_still_rejects_plain_zips():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "not a package")
    with pytest.raises(UnsupportedOoxmlError, match="not a known OOXML"):
        OoxmlTextEngine().extract("", buf.getvalue(), "zip")

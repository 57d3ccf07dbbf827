"""Hypothesis fuzz tests for the round-4 PDF/EXIF additions: filter codec
roundtrips on arbitrary bytes, the writer-knob matrix (flate × split ×
indirect × objstm × predictor), CMap parse/apply, and EXIF roundtrips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from simple_content_ocr_ray.stages.pdf_text import (
    _lzw_decode,
    _lzw_encode,
    _predict_png_rows,
    _rle_decode,
    _unpredict_png,
    extract_pdf_text,
    make_minimal_pdf,
)

_blobs = st.binary(min_size=0, max_size=4096)


@settings(max_examples=60, deadline=None)
@given(_blobs)
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=1, max_size=64))
def test_lzw_roundtrip_repetitive(data):
    # heavy repetition: deep table growth, KwKwK, width flips, clear-reset
    blob = data * 800
    assert _lzw_decode(_lzw_encode(blob)) == blob


@settings(max_examples=60, deadline=None)
@given(_blobs, st.integers(min_value=1, max_value=40))
def test_png_predictor_roundtrip(data, columns):
    enc = _predict_png_rows(data, columns)
    padded = data + b" " * ((-len(data)) % columns)
    assert _unpredict_png(enc, columns) == padded


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(1, 128)), max_size=40))
def test_rle_roundtrip(runs):
    # repeat runs encode 2..128 repeats (length byte 255..129); 128 is EOD
    # encode literal+repeat runs by hand, decode must reconstruct
    raw = bytearray()
    enc = bytearray()
    for byte, n in runs:
        if n == 1:
            enc += bytes([0, byte])
        else:
            enc += bytes([257 - n, byte])
        raw += bytes([byte]) * n
    enc += b"\x80"
    assert _rle_decode(bytes(enc)) == bytes(raw)


_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=40,
)
_pages = st.lists(st.lists(_line, min_size=1, max_size=4), min_size=1, max_size=3)


@settings(max_examples=40, deadline=None)
@given(
    _pages,
    st.booleans(),
    st.integers(min_value=1, max_value=3),
    st.booleans(),
    st.booleans(),
    st.sampled_from([0, 10, 12, 15]),
)
def test_writer_knob_matrix_extracts_identically(
    pages, flate, split, indirect, objstm, predictor
):
    """Every combination of real-world layout knobs must extract the same
    text as the plain layout."""
    expected = extract_pdf_text(make_minimal_pdf(pages))
    pdf = make_minimal_pdf(
        pages,
        flate=flate,
        contents_split=split,
        indirect_length=indirect,
        objstm=objstm,
        predictor=predictor if objstm else 0,
    )
    assert extract_pdf_text(pdf) == expected


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=0xFFFF),
        st.text(
            alphabet=st.characters(
                min_codepoint=0x20,
                max_codepoint=0xFFFD,
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_cmap_bfchar_roundtrip(mapping):
    from simple_content_ocr_ray.stages.pdf_text import _parse_cmap

    body = ["begincmap", "1 begincodespacerange", "<0000> <FFFF>",
            "endcodespacerange", f"{len(mapping)} beginbfchar"]
    for code, s in mapping.items():
        dst = s.encode("utf-16-be").hex().upper()
        body.append(f"<{code:04X}> <{dst}>")
    body += ["endbfchar", "endcmap"]
    cmap, width = _parse_cmap("\n".join(body).encode())
    assert width == 2
    assert cmap == mapping


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.text(alphabet="abcdefghij-XYZ ", min_size=0, max_size=12),
    st.integers(min_value=1, max_value=65535),
    st.integers(min_value=1, max_value=65535),
    st.booleans(),
)
def test_exif_roundtrip_fuzz(orientation, make, px, py, big_endian):
    from simple_content_ocr_ray.stages.exif import make_exif_app1, parse_exif

    app1 = make_exif_app1(
        orientation=orientation,
        make=make or None,
        pixel_x=px,
        pixel_y=py,
        big_endian=big_endian,
    )
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
    got = parse_exif(jpeg)
    assert got["orientation"] == orientation
    assert got["make"] == (make or None)
    assert got["pixel_x"] == px and got["pixel_y"] == py
    assert got["byte_order"] == ("MM" if big_endian else "II")

"""From-scratch minimal-PDF text extraction (stages/pdf_text.py)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from simple_content_ocr_ray.stages import pdf_text


def test_single_page_roundtrip():
    pdf = pdf_text.make_minimal_pdf([["Hello PDF world"]])
    assert pdf.startswith(b"%PDF")
    assert pdf_text.extract_pdf_text(pdf) == ["Hello PDF world"]


def test_multipage_lines_and_escapes():
    pdf = pdf_text.make_minimal_pdf(
        [
            ["Line one", "Line (two) with \\ backslash"],
            ["Second page"],
        ]
    )
    pages = pdf_text.extract_pdf_text(pdf)
    assert pages == ["Line one\nLine (two) with \\ backslash", "Second page"]


def test_tj_array_and_octal_escape():
    # hand-built content stream exercising the [ ... ] TJ form and \ooo
    pdf = pdf_text.make_minimal_pdf([["placeholder"]])
    pdf = pdf.replace(
        b"(placeholder) Tj",
        b"[(He) -120 (llo)] TJ (\\040world) Tj",
    )
    assert pdf_text.extract_pdf_text(pdf) == ["Hello world"]


def test_filtered_stream_raises_seam_error():
    pdf = pdf_text.make_minimal_pdf([["x"]])
    pdf = pdf.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    with pytest.raises(pdf_text.UnsupportedPdfError):
        pdf_text.extract_pdf_text(pdf)


def test_non_pdf_payload_raises():
    with pytest.raises(pdf_text.UnsupportedPdfError):
        pdf_text.extract_pdf_text(b"GIF89a not a pdf")


def test_engine_through_extraction_pipeline(ray_session):
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    rows = []
    for i in range(8):
        pdf = pdf_text.make_minimal_pdf(
            [[f"doc {i} page {p} body text"] for p in range(1 + i % 3)]
        )
        rows.append(
            {
                "url": f"https://pdfs.example/{i}",
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": pdf,
                "text": "",
                "lang": "en",
            }
        )
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (
        extraction_pipeline(ds, route={"pdf": "pdf-text"})
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (out["status"] == "completed").all()
    assert out.loc[0, "text"] == "doc 0 page 0 body text"
    # multi-page docs carry the byte-exact separator and true page_count
    three_pager = out[out["url"] == "https://pdfs.example/2"].iloc[0]
    assert three_pager["page_count"] == 3
    assert three_pager["text"] == pdf_text.PAGE_SEP.join(
        f"doc 2 page {p} body text" for p in range(3)
    )


def test_real_decode_failure_becomes_failed_row(ray_session):
    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    bad = pdf_text.make_minimal_pdf([["x"]]).replace(
        b"<< /Length", b"<< /Filter /FlateDecode /Length"
    )
    ds = rd.from_pandas(
        pd.DataFrame(
            [
                {
                    "url": "https://pdfs.example/bad",
                    "warc_ts": pd.Timestamp("2024-01-01"),
                    "html": bad,
                    "text": "",
                    "lang": "en",
                }
            ]
        )
    )
    out = extraction_pipeline(ds, route={"pdf": "pdf-text"}).to_pandas()
    assert list(out["status"]) == ["failed"]
    # r3: FlateDecode is now supported, so a Flate-tagged stream whose bytes
    # are NOT valid zlib fails as corrupt — still a failed ROW at the seam
    assert "Flate" in out["error"].iloc[0]


def test_flate_compressed_pdf_roundtrip():
    """r3: /FlateDecode content streams (what real PDF writers emit) decode
    byte-identically to the unfiltered layout."""
    from simple_content_ocr_ray.stages.pdf_text import (
        extract_pdf_text,
        make_minimal_pdf,
    )

    pages = [["hello world", "line two"], ["page 2 only"]]
    plain = make_minimal_pdf(pages)
    flate = make_minimal_pdf(pages, flate=True)
    assert b"/FlateDecode" in flate and b"/FlateDecode" not in plain
    assert extract_pdf_text(flate) == extract_pdf_text(plain) == [
        "hello world\nline two",
        "page 2 only",
    ]


def test_image_codec_filter_still_hits_seam():
    """r4: LZW/ASCII85/Hex/RunLength are now decoded; the seam is only the
    image codecs, which never carry content streams."""
    from simple_content_ocr_ray.stages.pdf_text import (
        UnsupportedPdfError,
        extract_pdf_text,
        make_minimal_pdf,
    )

    pdf = make_minimal_pdf([["x"]]).replace(
        b">> stream", b"/Filter /JBIG2Decode >> stream"
    )
    with pytest.raises(UnsupportedPdfError, match="JBIG2Decode"):
        extract_pdf_text(pdf)


def test_corrupt_flate_stream_is_failed_seam():
    from simple_content_ocr_ray.stages.pdf_text import (
        UnsupportedPdfError,
        extract_pdf_text,
        make_minimal_pdf,
    )

    pdf = bytearray(make_minimal_pdf([["payload text"]], flate=True))
    i = pdf.find(b"stream\n") + 7
    pdf[i : i + 4] = b"\x00\x00\x00\x00"  # stomp the zlib header
    with pytest.raises(UnsupportedPdfError, match="Flate"):
        extract_pdf_text(bytes(pdf))


def test_hex_string_show_text():
    """<hex> Tj and hex entries inside [ ... ] TJ arrays decode."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT <48656C6C6F> Tj 0 -14 Td [(a) -120 <20622063> (d)] TJ ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"\nendstream endobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["Hello\na b cd"]


def _pdf_with_flate_stream(content: bytes, with_length: bool) -> bytes:
    import zlib

    comp = zlib.compress(content)
    length = b"/Length " + str(len(comp)).encode() + b" " if with_length else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + length + b"/Filter /FlateDecode >> stream\n"
        + comp + b"\nendstream endobj\n%%EOF\n"
    )


def test_flate_stream_ending_in_cr_with_length():
    """A compressed stream whose last byte is 0x0D must survive: /Length
    delimits exactly, no byte is eaten (ADVICE r3: _STREAM_RE ate it)."""
    import zlib

    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT /F1 12 Tf 72 720 Td (line 18) Tj ET"
    assert zlib.compress(content).endswith(b"\r")  # the hazardous shape
    assert extract_pdf_text(_pdf_with_flate_stream(content, True)) == ["line 18"]


def test_flate_stream_ending_in_cr_without_length():
    """Without /Length the delimiter heuristic may strip the final 0x0D as
    part of a CRLF; the zlib retry re-appends it instead of failing."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT /F1 12 Tf 72 720 Td (line 18) Tj ET"
    assert extract_pdf_text(_pdf_with_flate_stream(content, False)) == ["line 18"]


def test_indirect_length_is_resolved_exactly():
    """/Length N 0 R (indirect) resolves via the object table — proven by a
    show-string containing the word "endstream", which the delimiter
    fallback would mis-slice at but the exact length ignores."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT (fake endstream inside) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 5 0 R >> stream\n" + content
        + b"\nendstream endobj\n"
        b"5 0 obj " + str(len(content)).encode() + b" endobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["fake endstream inside"]


def test_contents_array_multiple_streams_per_page():
    """/Contents [a 0 R b 0 R]: streams concatenate into ONE logical
    stream before tokenizing (the spec lets tokens span the boundary)."""
    from simple_content_ocr_ray.stages.pdf_text import (
        extract_pdf_text,
        make_minimal_pdf,
    )

    pages = [["alpha", "beta", "gamma"], ["delta"]]
    pdf = make_minimal_pdf(pages, contents_split=3)
    assert b"/Contents [" in pdf
    assert extract_pdf_text(pdf) == ["alpha\nbeta\ngamma", "delta"]
    # same result compressed, and with indirect lengths on every stream
    flate = make_minimal_pdf(pages, flate=True, contents_split=2,
                             indirect_length=True)
    assert extract_pdf_text(flate) == ["alpha\nbeta\ngamma", "delta"]


def test_objstm_packed_page_dicts():
    """PDF-1.5 layout: page/catalog dicts live inside a compressed
    /Type /ObjStm object stream — no /Type /Page visible at top level."""
    from simple_content_ocr_ray.stages.pdf_text import (
        extract_pdf_text,
        make_minimal_pdf,
    )

    pdf = make_minimal_pdf(
        [["packed page one"], ["packed page two"]], flate=True, objstm=True
    )
    assert b"/ObjStm" in pdf and b"/Type /Page" not in pdf.replace(
        b"/Type /Pages", b""
    )
    assert extract_pdf_text(pdf) == ["packed page one", "packed page two"]


@pytest.mark.parametrize("pred", [10, 12, 15])
def test_objstm_with_png_predictors(pred):
    from simple_content_ocr_ray.stages.pdf_text import (
        extract_pdf_text,
        make_minimal_pdf,
    )

    pdf = make_minimal_pdf(
        [["predicted one"], ["predicted two"], ["predicted three"]],
        flate=True,
        objstm=True,
        predictor=pred,
    )
    assert b"/DecodeParms" in pdf
    assert extract_pdf_text(pdf) == [
        "predicted one", "predicted two", "predicted three"
    ]


def test_png_predictor_all_tags_roundtrip():
    import numpy as np

    from simple_content_ocr_ray.stages.pdf_text import (
        _predict_png_rows,
        _unpredict_png,
    )

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=257, dtype=np.uint8).tobytes()
    cols = 16
    enc = _predict_png_rows(raw, cols)
    padded = raw + b" " * ((-len(raw)) % cols)
    assert _unpredict_png(enc, cols) == padded


def test_kids_order_overrides_object_numbering():
    """Page order comes from the /Pages tree, not object numbering."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    def stream(num: int, text: str) -> bytes:
        content = f"BT ({text}) Tj ET".encode()
        return (
            f"{num} 0 obj << /Length {len(content)} >> stream\n".encode()
            + content + b"\nendstream endobj\n"
        )

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 2 /Kids [5 0 R 3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + stream(4, "second by tree")
        + b"5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n"
        + stream(6, "first by tree")
        + b"%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["first by tree", "second by tree"]


def test_nested_pages_tree_flattens_in_order():
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    def stream(num: int, text: str) -> bytes:
        content = f"BT ({text}) Tj ET".encode()
        return (
            f"{num} 0 obj << /Length {len(content)} >> stream\n".encode()
            + content + b"\nendstream endobj\n"
        )

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 3 /Kids [10 0 R 3 0 R] >> endobj\n"
        b"10 0 obj << /Type /Pages /Parent 2 0 R /Count 2 "
        b"/Kids [5 0 R 7 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + stream(4, "third")
        + b"5 0 obj << /Type /Page /Parent 10 0 R /Contents 6 0 R >> endobj\n"
        + stream(6, "first")
        + b"7 0 obj << /Type /Page /Parent 10 0 R /Contents 8 0 R >> endobj\n"
        + stream(8, "second")
        + b"%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["first", "second", "third"]


def test_pages_tree_cycle_does_not_hang():
    """A damaged tree with a self-referencing Kids entry must terminate."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT (survivor) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [2 0 R 3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode()
        + b" >> stream\n" + content + b"\nendstream endobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["survivor"]


def _pdf_one_stream(dict_extra: str, content: bytes) -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + f"4 0 obj << /Length {len(content)}{dict_extra} >> stream\n".encode()
        + content + b"\nendstream endobj\n%%EOF\n"
    )


def test_lzw_filtered_content_stream():
    from simple_content_ocr_ray.stages.pdf_text import (
        _lzw_encode,
        extract_pdf_text,
    )

    content = _lzw_encode(b"BT (lzw text line) Tj ET")
    pdf = _pdf_one_stream(" /Filter /LZWDecode", content)
    assert extract_pdf_text(pdf) == ["lzw text line"]


def test_lzw_hand_vector_pins_bit_order():
    """Independent hand-derived bitstream: Clear,65,258(='AA'),65,EOD at 9
    bits MSB-first decodes to AAAA — pins the spec conventions against a
    mirrored encoder/decoder bug."""
    from simple_content_ocr_ray.stages.pdf_text import _lzw_decode

    bits = "100000000" "001000001" "100000010" "001000001" "100000001"
    bits += "0" * (-len(bits) % 8)
    vec = int(bits, 2).to_bytes(len(bits) // 8, "big")
    assert _lzw_decode(vec) == b"AAAA"


def test_lzw_width_growth_and_clear_roundtrip():
    from simple_content_ocr_ray.stages.pdf_text import (
        _lzw_decode,
        _lzw_encode,
    )

    rep = b"abcabcabd" * 20000  # grows the table through 9/10/11/12 bits
    assert _lzw_decode(_lzw_encode(rep)) == rep


def test_ascii85_filtered_content_stream():
    import base64

    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = base64.a85encode(b"BT (a85 text) Tj ET") + b"~>"
    pdf = _pdf_one_stream(" /Filter /ASCII85Decode", content)
    assert extract_pdf_text(pdf) == ["a85 text"]


def test_asciihex_and_runlength_streams():
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    raw = b"BT (hex text) Tj ET"
    pdf = _pdf_one_stream(" /Filter /ASCIIHexDecode", raw.hex().encode() + b">")
    assert extract_pdf_text(pdf) == ["hex text"]

    raw2 = b"BT (rle) Tj ET"
    rle = bytes([len(raw2) - 1]) + raw2 + b"\x80"
    pdf2 = _pdf_one_stream(" /Filter /RunLengthDecode", rle)
    assert extract_pdf_text(pdf2) == ["rle"]


def test_filter_chain_ascii85_over_flate():
    """Filter ARRAY applied in chain order: [/ASCII85Decode /FlateDecode]."""
    import base64
    import zlib

    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = base64.a85encode(zlib.compress(b"BT (chained text) Tj ET")) + b"~>"
    pdf = _pdf_one_stream(
        " /Filter [/ASCII85Decode /FlateDecode]", content
    )
    assert extract_pdf_text(pdf) == ["chained text"]


def test_image_codec_filter_still_raises_seam():
    from simple_content_ocr_ray.stages.pdf_text import (
        UnsupportedPdfError,
        extract_pdf_text,
    )

    pdf = _pdf_one_stream(" /Filter /DCTDecode", b"\xff\xd8\xff\xe0junk")
    with pytest.raises(UnsupportedPdfError, match="DCTDecode"):
        extract_pdf_text(pdf)


def test_filter_token_inside_stream_data_is_ignored():
    """A show-string containing "/Filter /DCTDecode" must not poison the
    dict scan — filters parse from the dict region only."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = rb"BT (mentions /Filter /DCTDecode in prose) Tj ET"
    pdf = _pdf_one_stream("", content)
    assert extract_pdf_text(pdf) == ["mentions /Filter /DCTDecode in prose"]


_CMAP = b"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0041> <0394>
<0042> <00480069>
endbfchar
1 beginbfrange
<0100> <0102> <0416>
endbfrange
1 beginbfrange
<0200> <0201> [<0041> <004200FC>]
endbfrange
endcmap
"""


def _cmap_pdf(content: bytes, cmap: bytes = _CMAP,
              resources_on_root: bool = False, flate_cmap: bool = False) -> bytes:
    import zlib

    res = b" /Resources << /Font << /F7 5 0 R >> >>"
    cm, filt = (zlib.compress(cmap), b" /Filter /FlateDecode") if flate_cmap else (cmap, b"")
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Count 1 /Kids [3 0 R]"
        + (res if resources_on_root else b"") + b" >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R"
        + (b"" if resources_on_root else res) + b" /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >> endobj\n"
        b"6 0 obj << /Length " + str(len(cm)).encode() + filt + b" >> stream\n"
        + cm + b"\nendstream endobj\n%%EOF\n"
    )


def test_tounicode_cmap_maps_glyph_codes():
    """Identity-H-style text: 2-byte glyph codes route through the font's
    /ToUnicode CMap — bfchar (incl. multi-unit targets), bfrange with base
    increment, and bfrange with an explicit array."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT /F7 12 Tf <0041 0100 0101 0102 0042> Tj 0 -14 Td <02000201> Tj ET"
    assert extract_pdf_text(_cmap_pdf(content)) == ["ΔЖЗИHi\nA" "Bü"]


def test_tounicode_resources_inherited_from_pages_root():
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT /F7 12 Tf <0041> Tj ET"
    assert extract_pdf_text(
        _cmap_pdf(content, resources_on_root=True)
    ) == ["Δ"]


def test_tounicode_flate_compressed_cmap_stream():
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = b"BT /F7 12 Tf <00410042> Tj ET"
    assert extract_pdf_text(_cmap_pdf(content, flate_cmap=True)) == ["ΔHi"]


def test_tounicode_font_switch_and_unmapped_code():
    """Switching to a font without a CMap restores latin-1 passthrough;
    unmapped codes under the CMap font become U+FFFD."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    content = (
        b"BT /F7 12 Tf <0041 9999> Tj /F1 12 Tf (plain) Tj ET"
    )
    assert extract_pdf_text(_cmap_pdf(content)) == ["Δ�plain"]


# ---- tokenizer-rewrite regressions (grammar-regex failure modes) ----


def test_et_bytes_inside_shown_text_do_not_truncate():
    """'ET' as a byte pair inside shown prose (GET, MARKET, BUDGET) must
    not terminate the BT block — only the ET TOKEN may."""
    from simple_content_ocr_ray.stages.pdf_text import (
        extract_pdf_text,
        make_minimal_pdf,
    )

    line = "BUDGET report for GET requests to MARKET endpoints"
    assert extract_pdf_text(make_minimal_pdf([[line]])) == [line]


def test_bracket_inside_tj_array_string():
    """']' is a legal byte inside a TJ-array literal string and must not
    end the array early."""
    from simple_content_ocr_ray.stages.pdf_text import _stream_text

    assert _stream_text(b"BT [(a]b) -120 (c)] TJ ET") == "a]bc"


def test_nested_balanced_parens_in_literal_string():
    """Balanced unescaped parens are legal in literal strings (spec
    7.3.4.2)."""
    from simple_content_ocr_ray.stages.pdf_text import _stream_text

    assert _stream_text(b"BT (a(b)c) Tj (d((e))f) Tj ET") == "a(b)cd((e))f"


def test_inline_image_binary_is_skipped():
    """BI … ID <binary> EI: the binary data (which may contain parens or
    operator lookalikes) must not reach the text grammar."""
    from simple_content_ocr_ray.stages.pdf_text import _stream_text

    s = b"BT (x) Tj ET BI /W 8 ID \x00\xff(\x28gar ET bage EI BT (y) Tj ET"
    assert _stream_text(s) == "xy"


def test_show_ops_outside_bt_et_are_ignored():
    from simple_content_ocr_ray.stages.pdf_text import _stream_text

    assert _stream_text(b"(lead) Tj BT (in) Tj ET (trail) Tj") == "in"


def test_indirect_length_multi_digit_ref_not_misread():
    """'/Length 123 0 R' must resolve the reference — regex backtracking
    once parsed it as a direct length of 12."""
    from simple_content_ocr_ray.stages.pdf_text import _LENGTH_RE

    assert _LENGTH_RE.search(b"/Length 123 0 R >>") is None
    m = _LENGTH_RE.search(b"/Length 456 /Filter /FlateDecode")
    assert m and m.group(1) == b"456"


def test_resources_inherited_only_from_parent_chain():
    """Two /Pages subtrees with different /ToUnicode CMaps for the same
    font name: a page must inherit from ITS ancestor, not whichever
    subtree scans first."""
    from simple_content_ocr_ray.stages.pdf_text import extract_pdf_text

    def cmap(dst: bytes) -> bytes:
        return (
            b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"beginbfchar <0041> <" + dst + b"> endbfchar"
        )

    cm_a, cm_b = cmap(b"0394"), cmap(b"0416")  # A -> Delta vs Zhe
    content = b"BT /F7 12 Tf <0041> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n"
        # subtree A (lower object number -> would win a naive scan)
        b"3 0 obj << /Type /Pages /Parent 2 0 R /Kids [5 0 R] /Count 1 "
        b"/Resources << /Font << /F7 7 0 R >> >> >> endobj\n"
        b"4 0 obj << /Type /Pages /Parent 2 0 R /Kids [6 0 R] /Count 1 "
        b"/Resources << /Font << /F7 8 0 R >> >> >> endobj\n"
        b"5 0 obj << /Type /Page /Parent 3 0 R /Contents 9 0 R >> endobj\n"
        b"6 0 obj << /Type /Page /Parent 4 0 R /Contents 9 0 R >> endobj\n"
        b"7 0 obj << /Type /Font /ToUnicode 10 0 R >> endobj\n"
        b"8 0 obj << /Type /Font /ToUnicode 11 0 R >> endobj\n"
        b"9 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"\nendstream endobj\n"
        b"10 0 obj << /Length " + str(len(cm_a)).encode() + b" >> stream\n"
        + cm_a + b"\nendstream endobj\n"
        b"11 0 obj << /Length " + str(len(cm_b)).encode() + b" >> stream\n"
        + cm_b + b"\nendstream endobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["Δ", "Ж"]

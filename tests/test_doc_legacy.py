"""Legacy .doc (CFB + [MS-DOC] piece table): roundtrips, seams, route."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_content_ocr_ray.stages.doc_legacy import (
    DocError,
    build_cfb,
    make_doc,
    parse_doc,
    read_cfb,
)


def test_text_roundtrip_mixed_pieces():
    t = "ascii paragraph\n" * 20 + "unicode tail → 漢字 done"
    r = parse_doc(make_doc(t))
    assert r["text"] == t
    assert r["n_pieces"] == -(-len(t.replace("\n", "\r")) // 120)
    assert r["n_unicode_pieces"] >= 1


def test_cp1252_specials_stay_compressed():
    # em dash / curly quotes / € are cp1252 bytes — the COMPRESSED path
    t = "em—dash “quoted” €uro"
    r = parse_doc(make_doc(t))
    assert r["text"] == t
    assert r["n_unicode_pieces"] == 0


def test_empty_and_single_char():
    assert parse_doc(make_doc(""))["text"] == ""
    assert parse_doc(make_doc("x"))["text"] == "x"


def test_odd_offset_unicode_piece_padding():
    # 121 ascii chars then a non-cp1252 char: the unicode piece would start
    # at an odd byte offset and must be pad-aligned by the writer
    t = "a" * 121 + "→"
    r = parse_doc(make_doc(t))
    assert r["text"] == t and r["n_unicode_pieces"] == 1


def test_cfb_streams_and_ministream_path():
    doc = make_doc("hello\nworld")
    s = read_cfb(doc)
    # 1Table is small → lives in the MINISTREAM; WordDocument on the FAT path
    assert len(s["1Table"]) < 4096
    assert len(s["WordDocument"]) >= 4096
    assert "\x05SummaryInformation" in s  # decoy stream readable too


def test_cfb_multi_stream_roundtrip():
    streams = {
        "small": b"s" * 100,
        "exactly-cutoff": b"c" * 4096,  # first size on the big-FAT path
        "big": bytes(range(256)) * 40,  # 10240 B, multi-sector chain
        "empty": b"",
    }
    back = read_cfb(build_cfb(streams))
    assert back == streams


def test_non_word_cfb_fails_as_row_seam():
    payload = build_cfb({"Book": b"not word", "x": b"y"})
    with pytest.raises(DocError, match="WordDocument"):
        parse_doc(payload)


def test_encrypted_flag_rejected():
    doc = bytearray(make_doc("secret"))
    s = read_cfb(bytes(doc))
    word = bytearray(s["WordDocument"])
    struct.pack_into("<H", word, 10, 0x0200 | 0x0100)  # set fEncrypted
    payload = build_cfb(
        {"WordDocument": bytes(word), "1Table": s["1Table"]}
    )
    with pytest.raises(DocError, match="encrypted"):
        parse_doc(payload)


def test_garbage_rejected():
    with pytest.raises(DocError):
        parse_doc(b"")
    with pytest.raises(DocError):
        parse_doc(b"MZ this is not a compound file padded " * 20)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_parser_total_on_garbage(data):
    try:
        parse_doc(data)
    except DocError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 400), st.integers(0, 5000))
def test_parser_total_on_corrupted_synth(seed, cut):
    base = make_doc(f"doc {seed} body text\nwith → unicode " * (1 + seed % 4))
    cut = min(cut, len(base) - 1)
    data = base[:cut] + bytes([base[cut] ^ 0x5A]) + base[cut + 1 :]
    try:
        parse_doc(data)
    except DocError:
        pass


def test_real_route_extracts_doc(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline
    from simple_content_ocr_ray.reference_semantics import sniff_bytes

    text = "legacy word body\nsecond paragraph → end"
    payload = make_doc(text)
    assert sniff_bytes(payload) == "cfb"
    pages = pa.table(
        {
            "url": ["https://x.example/report.doc"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([payload], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    real = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert real.loc[0, "content_type"] == "cfb"
    assert real.loc[0, "status"] == "completed"
    assert real.loc[0, "text"] == text
    # mock-parity route: .doc is not in the reference's supported list →
    # failed row, matching ocr_service.py:234-242
    mock = extraction_pipeline(rd.from_arrow(pages), preset="mock").to_pandas()
    assert mock.loc[0, "status"] == "failed"


def test_undecodable_compressed_piece_raises_docerror():
    # cp1252 leaves 0x81 undefined: patch one text byte in-place
    doc = bytearray(make_doc("abcdef"))
    at = doc.find(b"abcdef")
    assert at > 0
    doc[at] = 0x81
    with pytest.raises(DocError, match="undecodable compressed piece"):
        parse_doc(bytes(doc))


def test_literal_cr_input_rejected():
    with pytest.raises(DocError, match="normalized"):
        make_doc("line one\r\nline two")


def test_directory_tree_traversable_by_external_reader():
    """A conforming [MS-CFB] reader walks the red-black sibling tree from
    the root's child — not linearly. Walk it that way and require every
    stream to be reachable, with the spec's (length, uppercased-name)
    ordering holding at every node."""
    import struct as _struct

    data = make_doc("tree check " * 30)
    # collect raw directory entries (same sector walk as read_cfb)
    from simple_content_ocr_ray.stages.doc_legacy import _SECT

    (dir_start,) = _struct.unpack_from("<I", data, 48)
    (n_fat,) = _struct.unpack_from("<I", data, 44)
    fat_sids = [
        _struct.unpack_from("<I", data, 76 + 4 * i)[0] for i in range(n_fat)
    ]
    fat = []
    for s in fat_sids:
        off = 512 + s * _SECT
        fat += list(_struct.unpack_from(f"<{_SECT // 4}I", data, off))
    dirs = b""
    sid = dir_start
    while sid != 0xFFFFFFFE:
        dirs += data[512 + sid * _SECT : 512 + (sid + 1) * _SECT]
        sid = fat[sid]

    def entry(i):
        e = dirs[i * 128 : (i + 1) * 128]
        (nlen,) = _struct.unpack_from("<H", e, 64)
        name = e[: nlen - 2].decode("utf-16-le")
        left, right, child = _struct.unpack_from("<III", e, 68)
        return name, e[66], left, right, child

    root = entry(0)
    assert root[1] == 5
    found = []

    def walk(i):
        if i == 0xFFFFFFFF:
            return
        name, etype, left, right, _ = entry(i)
        key = (len(name.encode("utf-16-le")), name.upper())
        if left != 0xFFFFFFFF:
            lname = entry(left)[0]
            assert (len(lname.encode("utf-16-le")), lname.upper()) < key
        if right != 0xFFFFFFFF:
            rname = entry(right)[0]
            assert (len(rname.encode("utf-16-le")), rname.upper()) > key
        walk(left)
        found.append(name)
        walk(right)

    walk(root[4])
    assert sorted(found) == sorted(
        ["WordDocument", "1Table", "\x05SummaryInformation"]
    )

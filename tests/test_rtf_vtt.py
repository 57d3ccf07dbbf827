"""RTF and WebVTT/SRT extraction engines (r4, stages/rtf_text.py,
stages/vtt_text.py)."""

import pytest

from simple_content_ocr_ray.reference_semantics import sniff_bytes
from simple_content_ocr_ray.stages.rtf_text import (
    RtfTextEngine,
    UnsupportedRtfError,
    make_rtf,
    rtf_to_text,
)
from simple_content_ocr_ray.stages.vtt_text import (
    SubtitleTextEngine,
    UnsupportedVttError,
    make_srt,
    make_vtt,
    parse_srt,
    parse_vtt,
)

# --------------------------------------------------------------------------
# RTF
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "line one\nline two\nthree",
        "braces {x} \\ back",
        "unicode: café — ★ 日本語",
        "",
    ],
)
def test_rtf_roundtrip_identity(text):
    assert rtf_to_text(make_rtf(text)) == text


def test_rtf_destinations_are_skipped():
    assert rtf_to_text(rb"{\rtf1{\info{\title SECRET}}visible}") == "visible"
    assert rtf_to_text(rb"{\rtf1{\*\weirddest hidden}shown}") == "shown"
    assert rtf_to_text(rb"{\rtf1{\fonttbl{\f0 Arial;}}body}") == "body"


def test_rtf_unicode_uc_protocol():
    # \uc2 → two fallback characters are consumed after each \uN
    assert rtf_to_text(rb"{\rtf1\uc2\u233 ab cd}") == "\xe9 cd"
    # \'hh fallback after \uN is also consumed
    assert rtf_to_text(rb"{\rtf1\uc1\u8212\'3f!}") == "\u2014!"


def test_rtf_hex_escape_cp1252():
    assert rtf_to_text(rb"{\rtf1 a\'e9b}") == "a\xe9b"


def test_rtf_seams():
    with pytest.raises(UnsupportedRtfError, match="not an RTF"):
        rtf_to_text(b"plain text")
    with pytest.raises(UnsupportedRtfError, match="unbalanced"):
        rtf_to_text(b"{\\rtf1 open")
    with pytest.raises(UnsupportedRtfError, match="unbalanced"):
        rtf_to_text(b"{\\rtf1 x}}")
    with pytest.raises(UnsupportedRtfError, match="hex"):
        rtf_to_text(b"{\\rtf1 \\'g1}")


# --------------------------------------------------------------------------
# WebVTT / SRT
# --------------------------------------------------------------------------

CUES = [(0, 1500, "hello there"), (1500, 4000, "second cue"),
        (4000, 9500, "third & last")]


def test_vtt_roundtrip_with_markup_and_notes():
    got = parse_vtt(make_vtt(CUES, styled=True))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES


def test_srt_roundtrip():
    got = parse_srt(make_srt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES


def test_vtt_hourless_timestamps():
    got = parse_vtt(b"WEBVTT\n\n01:02.500 --> 01:03.000\nok\n")
    assert got[0]["start_ms"] == 62500 and got[0]["text"] == "ok"


def test_subtitle_engine_autodetects_format():
    e = SubtitleTextEngine()
    for payload in (make_vtt(CUES), make_srt(CUES)):
        r = e.extract("", payload, "vtt")
        assert r.text == "hello there\nsecond cue\nthird & last"
        assert r.metadata["n_cues"] == "3"
        assert r.metadata["duration_ms"] == "9500"


def test_vtt_seams():
    with pytest.raises(UnsupportedVttError, match="signature"):
        parse_vtt(b"not vtt")
    with pytest.raises(UnsupportedVttError, match="timing"):
        parse_srt(b"1\nbogus timing\ntext\n")
    with pytest.raises(UnsupportedVttError, match="ends before"):
        parse_vtt(b"WEBVTT\n\n00:00:05.000 --> 00:00:01.000\nx\n")


# --------------------------------------------------------------------------
# Sniff + route integration
# --------------------------------------------------------------------------


def test_sniff_rtf_and_vtt():
    assert sniff_bytes(make_rtf("x")) == "rtf"
    assert sniff_bytes(make_vtt(CUES)) == "vtt"
    assert sniff_bytes(b"\xef\xbb\xbfWEBVTT\n") == "vtt"


def test_rtf_vtt_in_real_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    payloads = {
        "rtf": make_rtf("legacy doc body"),
        "vtt": make_vtt([(0, 2000, "spoken words")]),
    }
    pages = pa.table(
        {
            "url": [f"https://x.example/{k}" for k in payloads],
            "warc_ts": pa.array([0] * 2, pa.timestamp("us")),
            "html": pa.array(list(payloads.values()), pa.binary()),
            "text": [""] * 2,
            "lang": ["en"] * 2,
        }
    )
    real = (
        extraction_pipeline(rd.from_arrow(pages), preset="real")
        .to_pandas()
        .set_index("content_type")
    )
    assert real.loc["rtf", "text"] == "legacy doc body"
    assert real.loc["vtt", "text"] == "spoken words"
    assert (real["status"] == "completed").all()
    mock = extraction_pipeline(rd.from_arrow(pages), preset="mock").to_pandas()
    assert (mock["status"] == "failed").all()


def test_srt_sniff_and_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simple_content_ocr_ray.pipelines.extract import extraction_pipeline

    payload = make_srt([(0, 1000, "srt words")])
    assert sniff_bytes(payload) == "srt"
    assert sniff_bytes(b"42 is the answer") == "unknown"
    pages = pa.table(
        {
            "url": ["https://x.example/subs.srt"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([payload], pa.binary()),
            "text": [""],
            "lang": ["en"],
        }
    )
    real = extraction_pipeline(rd.from_arrow(pages), preset="real").to_pandas()
    assert real.loc[0, "content_type"] == "srt"
    assert real.loc[0, "text"] == "srt words"
    assert real.loc[0, "status"] == "completed"

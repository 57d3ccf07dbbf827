"""Totality fuzzing of the session-7 parsers/codecs (hypothesis): on
ARBITRARY bytes and on randomly-corrupted VALID payloads, each decoder
either succeeds or raises exactly its documented seam error — never an
IndexError/struct.error/infinite loop. Crawl payloads are hostile; the
failed-row seam only holds if the seam exception is total.

Roundtrip properties (random signals/images through encode→decode) probe
the FLAC rice coder and ICO DIB/PNG paths beyond the fixtures.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_content_ocr_ray.stages.flac_codec import (
    UnsupportedFlacError,
    decode_flac,
    make_flac,
)
from simple_content_ocr_ray.stages.image_formats import (
    UnsupportedImageError,
    decode_ico,
    make_ico,
)
from simple_content_ocr_ray.stages.mp4_boxes import (
    UnsupportedMp4Error,
    make_mp4,
    parse_mp4,
)
from simple_content_ocr_ray.stages.svg_text import (
    UnsupportedSvgError,
    parse_svg,
)

_raw = st.binary(min_size=0, max_size=300)


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_flac_totality_on_garbage(blob):
    try:
        decode_flac(b"fLaC" + blob)
    except UnsupportedFlacError:
        pass


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_ico_totality_on_garbage(blob):
    try:
        decode_ico(b"\x00\x00\x01\x00" + blob)
    except UnsupportedImageError:
        pass


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_svg_totality_on_garbage(blob):
    try:
        parse_svg(b"<svg" + blob)
    except UnsupportedSvgError:
        pass


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_mp4_totality_on_garbage(blob):
    try:
        parse_mp4(b"\x00\x00\x00\x10ftypisom" + blob)
    except UnsupportedMp4Error:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_flac_totality_on_corrupted_valid(data):
    pcm = np.arange(-300, 300, dtype=np.int32)
    payload = bytearray(make_flac(pcm, block_size=256))
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(payload) - 1))
        payload[i] ^= data.draw(st.integers(1, 255))
    try:
        decode_flac(bytes(payload))
    except UnsupportedFlacError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_mp4_totality_on_corrupted_valid(data):
    payload = bytearray(make_mp4(1234, 320, 240, 9, with_audio=True))
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(payload) - 1))
        payload[i] ^= data.draw(st.integers(1, 255))
    try:
        parse_mp4(bytes(payload))
    except UnsupportedMp4Error:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_ico_totality_on_corrupted_valid(data):
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = bytearray(make_ico([img], png_mask=data.draw(st.integers(0, 1))))
    n_flips = data.draw(st.integers(1, 6))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(payload) - 1))
        payload[i] ^= data.draw(st.integers(1, 255))
    try:
        decode_ico(bytes(payload))
    except UnsupportedImageError:
        pass


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_flac_roundtrip_fuzz(data):
    n = data.draw(st.integers(1, 2000))
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = data.draw(st.sampled_from(["noise", "ramp", "quiet", "loud"]))
    if kind == "noise":
        pcm = rng.integers(-(2**14), 2**14, n, dtype=np.int32)
    elif kind == "ramp":
        pcm = (np.arange(n, dtype=np.int32) % 251) - 125
    elif kind == "quiet":
        pcm = rng.integers(-4, 4, n, dtype=np.int32)
    else:
        # the stereo variant negates the signal, so stay within the range
        # whose negation still fits 16 bits
        pcm = rng.integers(-32767, 32768, n, dtype=np.int32)
    mode = data.draw(
        st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2", "lpc2"])
    )
    bs = data.draw(st.sampled_from([64, 192, 1024]))
    stereo = data.draw(st.booleans())
    sig = np.stack([pcm, -pcm], axis=1) if stereo else pcm
    ms = stereo and data.draw(st.booleans())
    out, rate = decode_flac(make_flac(sig, mode=mode, block_size=bs, mid_side=ms))
    assert rate == 16_000
    expect = sig if stereo else sig[:, None]
    assert (out == expect).all()


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_ico_roundtrip_fuzz(data):
    h = data.draw(st.integers(1, 40))
    w = data.draw(st.integers(1, 40))
    ch = data.draw(st.sampled_from([3, 4]))
    seed = data.draw(st.integers(0, 2**31 - 1))
    img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    as_png = data.draw(st.booleans())
    out = decode_ico(make_ico([img], png_mask=int(as_png)))
    expect = (
        img
        if ch == 4
        else np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    )
    assert (out == expect).all()


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_rtf_totality_on_garbage(blob):
    from simple_content_ocr_ray.stages.rtf_text import (
        UnsupportedRtfError,
        rtf_to_text,
    )

    try:
        rtf_to_text(b"{\\rtf1" + blob + b"}")
    except UnsupportedRtfError:
        pass


@settings(max_examples=80, deadline=None)
@given(_raw)
def test_vtt_totality_on_garbage(blob):
    from simple_content_ocr_ray.stages.vtt_text import (
        UnsupportedVttError,
        parse_srt,
        parse_vtt,
    )

    try:
        parse_vtt(b"WEBVTT\n" + blob)
    except UnsupportedVttError:
        pass
    try:
        parse_srt(blob)
    except UnsupportedVttError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_rtf_roundtrip_fuzz(data):
    from simple_content_ocr_ray.stages.rtf_text import make_rtf, rtf_to_text

    n = data.draw(st.integers(0, 40))
    text = "".join(
        data.draw(
            st.sampled_from(
                ["a", "Z", "9", " ", "\n", "{", "}", "\\", "é", "—", "日"]
            )
        )
        for _ in range(n)
    )
    assert rtf_to_text(make_rtf(text)) == text

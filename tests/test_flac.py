"""From-scratch FLAC codec (r4, stages/flac_codec.py) — sample-exact
roundtrips over every subframe/stereo path, CRC detection, and the
AudioFeatureStage integration that closes the compressed-audio seam."""

import numpy as np
import pandas as pd
import pytest

from simple_content_ocr_ray.stages.flac_codec import (
    UnsupportedFlacError,
    decode_flac,
    flac_streaminfo,
    make_flac,
)
from simple_content_ocr_ray.stages.media import AudioFeatureStage

RNG = np.random.RandomState(11)
PCM = RNG.randint(-2000, 2000, 3000).astype(np.int32)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2", "lpc2"])
def test_mono_roundtrip_exact(mode):
    out, rate = decode_flac(make_flac(PCM, mode=mode, block_size=512))
    assert rate == 16_000
    assert out.shape == (len(PCM), 1)
    assert (out[:, 0] == PCM).all()


def test_constant_subframe():
    c = np.full(1000, -37, np.int32)
    out, _ = decode_flac(make_flac(c, mode="constant"))
    assert (out[:, 0] == c).all()


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip_exact(mid_side):
    st = RNG.randint(-5000, 5000, (2048, 2)).astype(np.int32)
    out, _ = decode_flac(make_flac(st, block_size=1024, mid_side=mid_side))
    assert (out == st).all()


def test_predictable_signal_actually_compresses():
    ramp = (np.arange(4000) % 997).astype(np.int32)
    enc = make_flac(ramp)
    assert len(enc) < ramp.size * 2 * 0.5  # < half of raw 16-bit PCM
    out, _ = decode_flac(enc)
    assert (out[:, 0] == ramp).all()


def test_streaminfo_fields():
    info = flac_streaminfo(make_flac(PCM, sample_rate=44100))
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == len(PCM)


def test_corruption_detected_by_crc():
    enc = bytearray(make_flac(PCM[:512]))
    enc[60] ^= 0xFF
    with pytest.raises(UnsupportedFlacError, match="CRC"):
        decode_flac(bytes(enc))


def test_seams():
    with pytest.raises(UnsupportedFlacError, match="not a FLAC"):
        decode_flac(b"fLaX" + b"\x00" * 50)
    with pytest.raises(UnsupportedFlacError):
        decode_flac(b"fLaC" + b"\x00" * 10)  # truncated metadata
    good = make_flac(PCM[:600])
    with pytest.raises(UnsupportedFlacError):
        decode_flac(good[:-20])  # stream ends before total_samples


def test_audio_feature_stage_decodes_flac_same_as_pcm():
    """The feature stage produces IDENTICAL features from the compressed
    stream and from raw PCM of the same signal — lossless end to end."""
    from simple_content_ocr_ray.stages.media import synth_audio_payload, _prng_i16

    n_chars = 250
    pcm = _prng_i16(7, n_chars * 4).astype(np.int32)
    stage = AudioFeatureStage()
    raw = stage(pd.DataFrame({"doc_id": [7], "audio": [synth_audio_payload(7, n_chars)]}))
    flac = stage(pd.DataFrame({"doc_id": [7], "audio": [make_flac(pcm)]}))
    for col in ("n_samples", "duration_ms", "rms", "zero_crossings"):
        assert raw[col].iloc[0] == flac[col].iloc[0], col


def test_audio_feature_stage_lossy_seam_still_raises():
    # r5: MP3 decodes through the Layer-III subset now — the remaining
    # lossy seam is AAC/other (non-MP3-magic) payloads
    stage = AudioFeatureStage()
    with pytest.raises(NotImplementedError, match="lossy"):
        stage(
            pd.DataFrame(
                {"doc_id": [1], "audio": [b"\x00\x00\x00 ftypM4A  aac"]}
            )
        )

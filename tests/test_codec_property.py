"""Property-based fuzzing of the from-scratch codecs (hypothesis).

Both codecs promise deterministic pixel-level contracts: VP8L is lossless
(decode ∘ encode == identity) and progressive JPEG must decode
pixel-identically to baseline JPEG of the same image. Random shapes,
contents and encoder modes probe the entropy coders far beyond the
hand-picked fixtures.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _rand_img(draw, max_side: int, channels: int):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "blocks", "few-colors"]))
    shape = (h, w, channels) if channels else (h, w)
    if kind == "noise":
        return rng.integers(0, 256, shape, dtype=np.uint8)
    if kind == "flat":
        return np.full(shape, int(rng.integers(0, 256)), np.uint8)
    if kind == "blocks":
        img = np.zeros(shape, np.uint8)
        img[: h // 2 + 1] = int(rng.integers(0, 256))
        img[h // 2 + 1 :] = int(rng.integers(0, 256))
        return img
    pal = rng.integers(0, 256, (3,) + ((channels,) if channels else ()), np.uint8)
    return pal[rng.integers(0, 3, (h, w))]


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_vp8l_roundtrip_fuzz(data):
    from simple_content_ocr_ray.stages.webp_decode import (
        decode_webp,
        make_webp_lossless,
    )

    img = _rand_img(data.draw, max_side=24, channels=4)
    transform = data.draw(
        st.sampled_from([None, "subtract_green", "predictor", "palette", "color"])
    )
    if transform == "palette" and len(np.unique(img.reshape(-1, 4), axis=0)) > 256:
        transform = None  # encoder (correctly) refuses >256-color palettes
    kwargs = {}
    if transform == "predictor":
        kwargs["predictor_mode"] = data.draw(
            st.sampled_from([1, 2, 3, 4, 7, 11, 12, 13])
        )
        kwargs["tile_bits"] = data.draw(st.integers(2, 5))
    cache_bits = data.draw(st.sampled_from([0, 2, 6]))
    lz77 = data.draw(st.booleans())
    dist_mode = data.draw(st.sampled_from(["plain", "map"]))
    out = decode_webp(
        make_webp_lossless(
            img, transform=transform, cache_bits=cache_bits, lz77=lz77,
            dist_mode=dist_mode, **kwargs,
        )
    )
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_progressive_jpeg_matches_baseline_fuzz(data):
    from simple_content_ocr_ray.stages.jpeg_decode import (
        decode_jpeg,
        make_jpeg,
        make_progressive_jpeg,
    )

    gray = data.draw(st.booleans())
    img = _rand_img(data.draw, max_side=40, channels=0 if gray else 3)
    subsample = 1 if gray else data.draw(st.sampled_from([1, 2]))
    restart = data.draw(st.sampled_from([0, 2, 5]))
    base = decode_jpeg(make_jpeg(img, subsample=subsample))
    prog = decode_jpeg(
        make_progressive_jpeg(img, subsample=subsample, restart_interval=restart)
    )
    assert np.array_equal(base, prog)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_vp8_lossy_recon_parity_fuzz(data):
    """Lossy VP8's contract under fuzz: whatever the image and quantizer,
    the decoder's pixels equal the encoder's decoder-parity reconstruction
    bit-for-bit (loss lives between source and recon, never between the
    two sides of the bitstream)."""
    from simple_content_ocr_ray.stages.vp8_codec import decode_vp8, encode_vp8

    img = _rand_img(data.draw, 70, 3)
    qi = data.draw(st.integers(0, 127))
    fl = data.draw(st.integers(0, 63))
    ftype = data.draw(st.sampled_from(["simple", "normal"]))
    frame, recon = encode_vp8(img, qi=qi, filter_level=fl, filter_type=ftype)
    out = decode_vp8(frame)
    assert out.shape == img.shape
    assert np.array_equal(out, recon)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, 2**31 - 1))
def test_vp8_decoder_rejects_garbage_safely(tail, seed):
    """Random bytes after a valid-looking header must produce either a
    clean UnsupportedVp8Error or a well-formed image — never an index
    error, hang, or other exception class out of the engine seam."""
    from simple_content_ocr_ray.stages.vp8_codec import (
        UnsupportedVp8Error,
        decode_vp8,
    )

    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(1, 64)), int(rng.integers(1, 64))
    sz = int(rng.integers(0, min(len(tail) + 1, 1 << 10)))
    tag = (0) | (1 << 4) | (sz << 5)
    data = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + np.uint16(w).tobytes()
        + np.uint16(h).tobytes()
        + tail
    )
    try:
        out = decode_vp8(data)
        assert out.shape == (h, w, 3) and out.dtype == np.uint8
    except UnsupportedVp8Error:
        pass

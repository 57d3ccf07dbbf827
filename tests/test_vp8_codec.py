"""VP8 intra key-frame codec (stages/vp8_codec.py).

The correctness invariant for a lossy codec pair: the decoder's pixels are
BIT-EXACT to the encoder's own decoder-parity reconstruction (prediction
from reconstructed neighbors, dequant + integer IDCT) — quantization loss
lives between source and reconstruction, never between the two sides of
the bitstream.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_content_ocr_ray.stages.vp8_codec import (
    AC_QLOOKUP,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_YMODE_PROBS,
    KF_YMODE_TREE,
    BoolDecoder,
    BoolEncoder,
    UnsupportedVp8Error,
    _decode_coeffs,
    _encode_coeffs,
    decode_vp8,
    encode_vp8,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
    make_webp_lossy,
)


def test_bool_coder_roundtrip_random_probs():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 4000)
    probs = rng.integers(1, 255, 4000)
    be = BoolEncoder()
    for b, p in zip(bits, probs):
        be.put(int(p), int(b))
    bd = BoolDecoder(be.flush())
    assert [bd.get(int(p)) for p in probs] == list(bits)


def test_bool_coder_literals_and_trees():
    be = BoolEncoder()
    for v in (0, 1, 63, 127):
        be.literal(v, 7)
    for s in (0, 1, 2, 3):
        be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, s)
    bd = BoolDecoder(be.flush())
    assert [bd.literal(7) for _ in range(4)] == [0, 1, 63, 127]
    assert [bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS) for _ in range(4)] == [
        0, 1, 2, 3,
    ]


def test_transform_pairs_invert_within_one():
    """The numeric forward transforms invert the integer inverses to
    within the inverses' own rounding (±1) across the residual range."""
    rng = np.random.default_rng(11)
    for _ in range(300):
        res = rng.integers(-255, 256, (4, 4))
        assert np.abs(idct4x4(fdct4x4(res)) - res).max() <= 1
        assert np.abs(iwht4x4(fwht4x4(res)) - res).max() <= 1


def test_quantizer_ladders_monotone():
    assert list(DC_QLOOKUP) == sorted(DC_QLOOKUP)
    assert list(AC_QLOOKUP) == sorted(AC_QLOOKUP)
    assert len(DC_QLOOKUP) == len(AC_QLOOKUP) == 128


def test_coeff_token_roundtrip_all_categories():
    """Every token category (ZERO..CAT6), both first-coefficient modes,
    all entry contexts."""
    rng = np.random.default_rng(13)
    for first in (0, 1):
        for _ in range(200):
            q = np.zeros(16, dtype=np.int64)
            pos = rng.choice(
                np.arange(first, 16), size=int(rng.integers(0, 10)),
                replace=False,
            )
            for p in pos:
                q[p] = int(rng.integers(-2114, 2115))
            ctx = int(rng.integers(0, 3))
            be = BoolEncoder()
            nz_e = _encode_coeffs(be, DEFAULT_COEFF_PROBS[0], first, ctx, q)
            got, nz_d = _decode_coeffs(
                BoolDecoder(be.flush()), DEFAULT_COEFF_PROBS[0], first, ctx,
                1, 1,
            )
            assert nz_e == nz_d
            assert np.array_equal(got, q)


@pytest.mark.parametrize("shape", [(16, 16), (37, 51), (4, 200), (130, 7)])
def test_frame_roundtrip_bit_exact_to_recon(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    data, recon = encode_vp8(img, qi=8)
    out = decode_vp8(data)
    assert out.shape == (*shape, 3)
    assert np.array_equal(out, recon)


def test_constant_image_reconstructs_exactly():
    """DC prediction nails a constant image: zero loss end-to-end."""
    img = np.full((32, 48, 3), 200, dtype=np.uint8)
    data, recon = encode_vp8(img, qi=8)
    out = decode_vp8(data)
    assert np.array_equal(out, img)
    assert np.array_equal(out, recon)


def test_gradient_psnr_reasonable():
    h, w = 48, 64
    g = np.add.outer(np.linspace(0, 255, h), np.linspace(0, 255, w)) / 2
    img = np.stack([g, g, g], axis=-1).astype(np.uint8)
    data, recon = encode_vp8(img, qi=8)
    out = decode_vp8(data)
    assert np.array_equal(out, recon)
    mse = float(np.mean((out.astype(float) - img.astype(float)) ** 2))
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30


@pytest.mark.parametrize("qi", [0, 40, 100, 127])
def test_quantizer_sweep_stays_bit_exact(qi):
    rng = np.random.default_rng(qi)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    data, recon = encode_vp8(img, qi=qi)
    assert np.array_equal(decode_vp8(data), recon)


def test_skip_macroblocks_roundtrip():
    """A flat image at a coarse quantizer produces skipped MBs next to
    coded ones; nonzero-context clearing must agree on both sides."""
    img = np.full((48, 48, 3), 128, dtype=np.uint8)
    img[20:28, 20:28] = 255  # one busy MB in a sea of skips
    data, recon = encode_vp8(img, qi=60)
    assert np.array_equal(decode_vp8(data), recon)


def test_container_roundtrip_and_seams():
    from simple_content_ocr_ray.stages.webp_decode import (
        UnsupportedWebpError,
        decode_webp,
    )

    img = np.full((20, 30, 3), 77, dtype=np.uint8)
    rgba = decode_webp(make_webp_lossy(img))
    assert rgba.shape == (20, 30, 4)
    assert np.array_equal(rgba[..., :3], img)
    assert (rgba[..., 3] == 255).all()
    # truncated VP8 chunk fails as a seam error, not a crash
    with pytest.raises(UnsupportedWebpError, match="lossy VP8"):
        decode_webp(
            b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
        )


def test_interframe_rejected():
    img = np.full((16, 16, 3), 10, dtype=np.uint8)
    data, _ = encode_vp8(img)
    bad = bytes([data[0] | 1]) + data[1:]  # flip the key-frame bit
    with pytest.raises(UnsupportedVp8Error, match="interframe"):
        decode_vp8(bad)


def test_truncated_payload_rejected():
    with pytest.raises(UnsupportedVp8Error):
        decode_vp8(b"\x00\x01")


def _textured(h=48, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.indices((h, w)).sum(0) % 7 * 36).astype(np.uint8)
    img = np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=-1)
    return np.clip(
        img.astype(int) + rng.integers(-20, 21, img.shape), 0, 255
    ).astype(np.uint8)


def test_bpred_macroblocks_roundtrip_bit_exact():
    """A textured image drives the encoder into B_PRED (4x4 intra) MBs;
    submode contexts, plane-3 coefficients, Y2 carry-over and the
    sequential subblock reconstruction must agree on both sides."""
    img = _textured()
    data, recon = encode_vp8(img, qi=8)
    assert np.array_equal(decode_vp8(data), recon)


def test_bpred_actually_fires_and_helps():
    """The B_PRED path must be exercised, not just present: with the trial
    disabled (infinite SAD) the same image costs more bytes."""
    import simple_content_ocr_ray.stages.vp8_codec as vc

    img = _textured()
    with_bpred, _ = encode_vp8(img, qi=8)
    orig = vc._bpred_trial
    vc._bpred_trial = lambda *a, **k: (
        orig(*a, **k)[0], orig(*a, **k)[1], 1 << 60
    )
    try:
        without, _ = encode_vp8(img, qi=8)
    finally:
        vc._bpred_trial = orig
    assert len(with_bpred) < len(without)


def test_bpred_high_quantizer_and_skip_mix():
    """Coarse quantizer makes some B_PRED MBs all-zero (skip) while 16x16
    neighbors code coefficients — the has_y2-aware context clearing must
    stay in sync."""
    img = _textured(64, 64, seed=9)
    img[:32] = 128  # flat top half -> 16x16 DC + skips
    data, recon = encode_vp8(img, qi=80)
    assert np.array_equal(decode_vp8(data), recon)


def test_predict4_all_modes_in_range():
    from simple_content_ocr_ray.stages.vp8_codec import _predict4

    rng = np.random.default_rng(5)
    for _ in range(50):
        A = rng.integers(0, 256, 8).astype(np.int32)
        L = rng.integers(0, 256, 4).astype(np.int32)
        P = int(rng.integers(0, 256))
        for mode in range(10):
            out = _predict4(mode, A, L, P)
            assert out.shape == (4, 4)
            assert out.min() >= 0 and out.max() <= 255


def test_loop_filter_parity_and_constant_passthrough():
    """Simple-profile loop filter: identical post-pass on both sides, and
    a constant surface passes through unchanged (a = 0), preserving the
    constant-gray exactness the oracle relies on."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
    for fl in (0, 10, 40, 63):
        data, recon = encode_vp8(img, qi=70, filter_level=fl)
        assert np.array_equal(decode_vp8(data), recon)
    flat = np.full((32, 32, 3), 90, dtype=np.uint8)
    out = decode_vp8(encode_vp8(flat, qi=8, filter_level=50)[0])
    assert np.array_equal(out, flat)


def test_simple_edge_filters_small_steps_not_real_edges():
    from simple_content_ocr_ray.stages.vp8_codec import _simple_edge

    row = lambda v: np.full(8, v, dtype=np.int32)
    # a 4-level step is inside the limit: both sides move toward each other
    p0, q0 = _simple_edge(row(100), row(100), row(104), row(104), limit=20)
    assert (p0 > 100).all() and (q0 < 104).all()
    # a 120-level step exceeds the limit: a real picture edge, untouched
    p0, q0 = _simple_edge(row(10), row(10), row(130), row(130), limit=20)
    assert (p0 == 10).all() and (q0 == 130).all()


def test_normal_loop_filter_parity_and_passthrough():
    """Normal-profile filter (luma+chroma, 4/6-tap, hev dispatch): bit
    parity across quantizers/levels, constant passthrough."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
    for fl in (5, 25, 63):
        data, recon = encode_vp8(
            img, qi=70, filter_level=fl, filter_type="normal"
        )
        assert np.array_equal(decode_vp8(data), recon)
    flat = np.full((32, 32, 3), 90, dtype=np.uint8)
    out = decode_vp8(
        encode_vp8(flat, qi=8, filter_level=50, filter_type="normal")[0]
    )
    assert np.array_equal(out, flat)


def test_normal_filter_differs_from_simple():
    """The two profiles are distinct bitstreams AND distinct pixels on a
    blocky low-quality image (normal also touches chroma)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    d_s, _ = encode_vp8(img, qi=100, filter_level=40, filter_type="simple")
    d_n, _ = encode_vp8(img, qi=100, filter_level=40, filter_type="normal")
    assert d_s != d_n
    assert not np.array_equal(decode_vp8(d_s), decode_vp8(d_n))


def test_out_of_range_params_clamp_and_stay_bit_exact():
    """A filter level or quantizer beyond its header field width must
    clamp, not wrap — a wrapped literal desynchronizes the bitstream from
    the returned reconstruction."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (33, 29, 3)).astype(np.uint8)
    for qi, fl, ft in ((8, 64, "simple"), (200, 10, "normal"), (127, 99, "normal")):
        data, recon = encode_vp8(img, qi=qi, filter_level=fl, filter_type=ft)
        assert np.array_equal(decode_vp8(data), recon)

"""From-scratch baseline JPEG codec tests (stages/jpeg_decode.py).

The decoder is validated against an INDEPENDENTLY computed quantization-
roundtrip reconstruction (pad → FDCT → round(÷Q)·Q → IDCT → clip), not
against its own internals: if the entropy coding (Huffman, RLE, byte
stuffing, DC prediction) drops or shifts a single coefficient, the
pixel-exact comparison fails.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_content_ocr_ray.stages.jpeg_decode import (
    QUANT_CHROMA,
    QUANT_LUMA,
    JpegImageEngine,
    UnsupportedJpegError,
    _rgb_to_ycbcr,
    decode_jpeg,
    fdct_blocks,
    idct_blocks,
    make_jpeg,
)


def _ref_recon_plane(plane: np.ndarray, q: np.ndarray, bw=None, bh=None):
    """Independent quant-roundtrip reconstruction of one plane."""
    h, w = plane.shape
    bw = bw if bw is not None else (w + 7) // 8
    bh = bh if bh is not None else (h + 7) // 8
    ph, pw = bh * 8, bw * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        .astype(np.float64) - 128.0
    )
    qz = np.round(fdct_blocks(blocks) / q[None]) * q[None]
    sp = idct_blocks(qz) + 128.0
    return sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(ph, pw)


def test_constant_gray_even_shift_is_pixel_exact():
    # even level-shifted constants roundtrip EXACTLY through the Annex-K
    # Q00=16 DC quantizer — the property jpeg_real_meta's oracle relies on
    for v in (0, 2, 100, 128, 200, 254):
        px = np.full((10, 24), v, np.uint8)
        assert np.array_equal(decode_jpeg(make_jpeg(px)), px)


def test_random_gray_matches_independent_recon():
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, (13, 21), np.uint8)
    dec = decode_jpeg(make_jpeg(px))
    exp = np.clip(
        np.round(_ref_recon_plane(px.astype(np.float64), QUANT_LUMA)[:13, :21]),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(dec, exp)
    # and the lossy error is small on natural ranges
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 20


def test_random_rgb444_matches_independent_recon():
    rng = np.random.RandomState(7)
    h, w = 17, 19
    px = rng.randint(0, 256, (h, w, 3), np.uint8)
    dec = decode_jpeg(make_jpeg(px))
    y, cb, cr = _rgb_to_ycbcr(px)
    yr = _ref_recon_plane(y, QUANT_LUMA)[:h, :w]
    cbr = _ref_recon_plane(cb, QUANT_CHROMA)[:h, :w]
    crr = _ref_recon_plane(cr, QUANT_CHROMA)[:h, :w]
    r_ = yr + 1.402 * (crr - 128)
    g_ = yr - 0.344136 * (cbr - 128) - 0.714136 * (crr - 128)
    b_ = yr + 1.772 * (cbr - 128)
    exp = np.clip(np.round(np.stack([r_, g_, b_], 2)), 0, 255).astype(np.uint8)
    assert np.array_equal(dec, exp)


def test_rgb420_subsampled_matches_independent_recon():
    rng = np.random.RandomState(11)
    h, w = 18, 22
    px = rng.randint(0, 256, (h, w, 3), np.uint8)
    dec = decode_jpeg(make_jpeg(px, subsample=2))
    y, cb, cr = _rgb_to_ycbcr(px)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    ph2, pw2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    cbd = np.pad(cb, ((0, ph2 - h), (0, pw2 - w)), mode="edge").reshape(
        ph2 // 2, 2, pw2 // 2, 2
    ).mean(axis=(1, 3))
    crd = np.pad(cr, ((0, ph2 - h), (0, pw2 - w)), mode="edge").reshape(
        ph2 // 2, 2, pw2 // 2, 2
    ).mean(axis=(1, 3))
    yr = _ref_recon_plane(y, QUANT_LUMA, bw=mcux * 2, bh=mcuy * 2)[:h, :w]
    cbr = np.repeat(
        np.repeat(_ref_recon_plane(cbd, QUANT_CHROMA, bw=mcux, bh=mcuy), 2, 0), 2, 1
    )[:h, :w]
    crr = np.repeat(
        np.repeat(_ref_recon_plane(crd, QUANT_CHROMA, bw=mcux, bh=mcuy), 2, 0), 2, 1
    )[:h, :w]
    r_ = yr + 1.402 * (crr - 128)
    g_ = yr - 0.344136 * (cbr - 128) - 0.714136 * (crr - 128)
    b_ = yr + 1.772 * (cbr - 128)
    exp = np.clip(np.round(np.stack([r_, g_, b_], 2)), 0, 255).astype(np.uint8)
    assert np.array_equal(dec, exp)


def test_gradient_multiblock_image():
    # spans many blocks, exercises DC prediction across a long scan
    x = np.linspace(0, 255, 64, dtype=np.float64)
    px = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg(make_jpeg(px))
    exp = np.clip(
        np.round(_ref_recon_plane(px.astype(np.float64), QUANT_LUMA)[:64, :64]),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(dec, exp)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 12


def test_unsupported_seams():
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(b"")
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n not a jpeg")
    # arithmetic-coded (SOF9) must hit the documented seam, not crash
    with pytest.raises(UnsupportedJpegError, match="SOF9"):
        decode_jpeg(b"\xff\xd8\xff\xc9\x00\x10" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00" + b"\x00" * 5)
    # truncated entropy stream → decode error, not an infinite loop
    good = make_jpeg(np.full((8, 8), 77, np.uint8))
    with pytest.raises((UnsupportedJpegError, IndexError)):
        decode_jpeg(good[: len(good) // 2])


def test_engine_seam_output_layout():
    px = np.full((6, 20), 100, np.uint8)
    res = JpegImageEngine().extract("u", make_jpeg(px), "jpeg")
    assert res.text == "[image 20x6 ch=1 brightness=100.0]"
    assert res.metadata["width"] == "20"
    assert res.metadata["height"] == "6"
    assert res.metadata["channels"] == "1"
    assert res.page_count == 1


def test_failed_row_not_failed_task_in_extract_stage():
    # corrupt JPEG payloads become failed ROWS through the real route
    import pyarrow as pa

    from simple_content_ocr_ray.stages.extract import REAL_ROUTE, ExtractStage

    good = make_jpeg(np.full((4, 4), 50, np.uint8))
    bad = b"\xff\xd8\xff\xc9\x00\x10" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00" + b"\x00" * 55  # arithmetic
    batch = pa.table(
        {
            "url": ["a", "b"],
            "html": [good, bad],
            "content_type": ["jpeg", "jpeg"],
        }
    )
    out = ExtractStage(route=REAL_ROUTE)(batch)
    assert out["status"].to_pylist() == ["completed", "failed"]
    assert "SOF9" in out["error"].to_pylist()[1]


@pytest.mark.parametrize("interval", [2, 4])
def test_restart_markers_roundtrip(interval):
    """DRI/RSTn streams (the camera-output layout) decode identically to the
    marker-free encoding — byte alignment, DC predictor reset, and RSTn
    index wrap (>8 restarts) all exercised."""
    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, (24, 80), np.uint8)  # 30 MCUs
    assert np.array_equal(
        decode_jpeg(make_jpeg(gray, restart_interval=interval)),
        decode_jpeg(make_jpeg(gray)),
    )
    rgb = rng.randint(0, 256, (34, 50, 3), np.uint8)
    assert np.array_equal(
        decode_jpeg(make_jpeg(rgb, subsample=2, restart_interval=interval)),
        decode_jpeg(make_jpeg(rgb, subsample=2)),
    )
    wide = rng.randint(0, 256, (8, 800), np.uint8)  # 100 MCUs → RSTn wraps
    assert np.array_equal(
        decode_jpeg(make_jpeg(wide, restart_interval=interval)),
        decode_jpeg(make_jpeg(wide)),
    )


def test_truncated_mid_scan_raises_unsupported():
    """Truncating the entropy data mid-scan must raise UnsupportedJpegError
    (the module contract), not a raw IndexError (ADVICE r3)."""
    import numpy as np
    import pytest

    from simple_content_ocr_ray.stages.jpeg_decode import (
        UnsupportedJpegError,
        decode_jpeg,
        make_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    data = make_jpeg(img)
    # cut at several depths inside the scan (past all headers)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    for cut in (sos + 20, sos + 40, len(data) - 3):
        with pytest.raises(UnsupportedJpegError):
            decode_jpeg(data[:cut])


class TestProgressive:
    """SOF2 progressive decode (r4): must be PIXEL-IDENTICAL to the baseline
    decode of the same image — both paths share quantized coefficients, so
    any entropy/scan-accumulation slip shows up as a pixel diff."""

    def _roundtrip(self, img, subsample=1, restart_interval=0):
        from simple_content_ocr_ray.stages.jpeg_decode import (
            decode_jpeg,
            make_jpeg,
            make_progressive_jpeg,
        )

        base = decode_jpeg(make_jpeg(img, subsample=subsample))
        prog = decode_jpeg(
            make_progressive_jpeg(
                img, subsample=subsample, restart_interval=restart_interval
            )
        )
        assert np.array_equal(base, prog)

    def test_grayscale(self):
        rng = np.random.default_rng(0)
        self._roundtrip(rng.integers(0, 256, (16, 16), dtype=np.uint8))

    def test_color_odd_dims(self):
        rng = np.random.default_rng(1)
        self._roundtrip(rng.integers(0, 256, (24, 33, 3), dtype=np.uint8))

    def test_color_420_subsampling(self):
        rng = np.random.default_rng(2)
        self._roundtrip(
            rng.integers(0, 256, (40, 56, 3), dtype=np.uint8), subsample=2
        )

    def test_restart_markers_in_every_scan(self):
        rng = np.random.default_rng(3)
        self._roundtrip(
            rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
            subsample=2,
            restart_interval=3,
        )
        self._roundtrip(
            rng.integers(0, 256, (31, 17, 3), dtype=np.uint8),
            restart_interval=5,
        )

    def test_eob_run_heavy_images(self):
        """Smooth/constant content maximizes cross-block EOB runs and
        buffered refinement bits — the hardest part of §G entropy coding."""
        x = np.linspace(0, 255, 64).astype(np.uint8)
        self._roundtrip(np.tile(x, (48, 1)))
        img = np.full((80, 80, 3), 128, np.uint8)
        img[40, 40] = [255, 0, 0]
        self._roundtrip(img)

    def test_sof2_is_a_progressive_file(self):
        from simple_content_ocr_ray.stages.jpeg_decode import (
            make_progressive_jpeg,
        )

        data = make_progressive_jpeg(np.zeros((8, 8), np.uint8))
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        assert data.count(b"\xff\xda") >= 5  # multi-scan

    def test_truncated_progressive_raises_unsupported(self):
        import pytest

        from simple_content_ocr_ray.stages.jpeg_decode import (
            UnsupportedJpegError,
            decode_jpeg,
            make_progressive_jpeg,
        )

        rng = np.random.default_rng(4)
        data = make_progressive_jpeg(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        )
        sos = data.find(b"\xff\xda")
        for cut in (sos + 10, len(data) // 2, len(data) - 3):
            with pytest.raises(UnsupportedJpegError):
                decode_jpeg(data[:cut])

"""Multimodal stages (stages/media.py, pipelines/media.py): real decode
math vs numpy references, actor-pool plumbing, explicit compressed-format
seam."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from simple_content_ocr_ray.pipelines import media as media_pipelines
from simple_content_ocr_ray.stages import media

SF = "/root/testdata/sf0.001"


def test_audio_payload_roundtrip():
    b = media.synth_audio_payload(42, 100)
    assert b[:4] == media.AUDIO_MAGIC
    rate, n = struct.unpack_from("<II", b, 4)
    assert rate == media.AUDIO_RATE and n == 400
    samples = np.frombuffer(b, dtype=np.int16, count=n, offset=12)
    # deterministic
    again = np.frombuffer(media.synth_audio_payload(42, 100), np.int16, n, offset=12)
    assert np.array_equal(samples, again)


def test_audio_stage_features_match_numpy():
    df = pd.DataFrame(
        {"doc_id": [1, 2], "audio": [media.synth_audio_payload(i, 64) for i in (1, 2)]}
    )
    out = media.AudioFeatureStage()(df)
    for i, doc in enumerate((1, 2)):
        s = np.frombuffer(
            media.synth_audio_payload(doc, 64), np.int16, 256, offset=12
        ).astype(np.float64)
        assert out.loc[i, "n_samples"] == 256
        assert out.loc[i, "duration_ms"] == 256 * 1000 // media.AUDIO_RATE
        assert abs(out.loc[i, "rms"] - round(float(np.sqrt(np.mean(s * s))), 4)) < 1e-9
        zc = int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
        assert out.loc[i, "zero_crossings"] == zc
    assert "audio" not in out.columns


def test_video_stage_brightness_matches_numpy():
    b = media.synth_video_payload(7, 80)  # 10 frames
    df = pd.DataFrame({"doc_id": [7], "video": [b]})
    out = media.VideoFrameSampleStage()(df)
    h, w, n_frames = struct.unpack_from("<HHI", b, 4)
    assert (h, w, n_frames) == (media.VIDEO_H, media.VIDEO_W, 10)
    frames = np.frombuffer(b, np.uint8, n_frames * h * w, offset=12).reshape(
        n_frames, h * w
    )
    exp = np.round(frames[:: media.VIDEO_SAMPLE_EVERY].mean(axis=1), 4)
    assert out.loc[0, "n_frames"] == 10
    assert out.loc[0, "n_sampled"] == 2
    assert np.array_equal(out.loc[0, "frame_brightness"], exp)


def test_compressed_formats_raise_not_implemented():
    # r5: MP3 now routes to the Layer-III decoder — a corrupt ID3 stream is
    # a typed Mp3Error (failed row), no longer the NotImplementedError seam
    from simple_content_ocr_ray.stages.mp3_frames import Mp3Error

    df = pd.DataFrame({"doc_id": [0], "audio": [b"ID3\x04 not pcm"]})
    with pytest.raises(Mp3Error):
        media.AudioFeatureStage()(df)
    dfv = pd.DataFrame({"doc_id": [0], "video": [b"\x00\x00\x01\xba mpeg"]})
    with pytest.raises(NotImplementedError):
        media.VideoFrameSampleStage()(dfv)


def test_media_pipelines_end_to_end(ray_session):
    audio = media_pipelines.audio_features(SF).to_pandas()
    assert len(audio) == 500
    assert {"n_samples", "duration_ms", "rms", "zero_crossings"} <= set(audio.columns)
    video = media_pipelines.video_meta(SF).to_pandas()
    n_chars = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    merged = video.merge(n_chars, on="doc_id")
    assert (
        merged["n_frames"] == np.maximum(1, merged["n_chars"] // 8)
    ).all()


def test_ahash_classes_pairwise_distinct():
    """The oracle's hash-class == synthesis-class assumption: all 8 stripe
    patterns decode to pairwise-distinct aHashes, and aHash is invariant to
    the block-mean downsample (16x16 upscale of the same pattern)."""
    import numpy as np

    from simple_content_ocr_ray.pipelines.media import AHASH_CLASSES, ahash64
    from simple_content_ocr_ray.stages.png_decode import decode_png, make_png

    hashes = []
    for c in range(AHASH_CLASSES):
        px = np.zeros((8, 8), dtype=np.uint8)
        px[:, :c] = 255
        hashes.append(ahash64(decode_png(make_png(px))))
        big = np.kron(px, np.ones((2, 2), dtype=np.uint8))
        assert ahash64(big) == hashes[-1]
    assert len(set(hashes)) == AHASH_CLASSES


def test_image_ahash_dupes_groups(ray_session):
    import pandas as pd

    from simple_content_ocr_ray.pipelines.media import AHASH_CLASSES, image_ahash_dupes

    got = image_ahash_dupes("/root/testdata/sf0.001").to_pandas()
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    assert len(got) == len(docs)
    # keeper is the min doc_id of each class, every doc maps to its class keeper
    assert (got["keeper"] == got["doc_id"] % AHASH_CLASSES).all()


def test_area_mean_resize_matches_brute_force():
    """The vectorized reduceat resize equals a per-bucket floor-mean
    brute force on a gradient image (non-constant → every bucket edge
    case fires), for divisible and non-divisible shape pairs."""
    import numpy as np

    from simple_content_ocr_ray.stages.media import area_mean_resize

    rng_img = (np.add.outer(np.arange(23), np.arange(17)) * 3 % 251).astype(np.uint8)
    for th, tw in [(8, 8), (5, 3), (23, 17), (1, 1), (7, 16)]:
        got = area_mean_resize(rng_img, th, tw)
        h, w = rng_img.shape
        exp = np.empty((th, tw), dtype=np.uint8)
        for i in range(th):
            y0, y1 = (i * h) // th, ((i + 1) * h) // th if i + 1 < th else h
            for j in range(tw):
                x0, x1 = (j * w) // tw, ((j + 1) * w) // tw if j + 1 < tw else w
                block = rng_img[y0:y1, x0:x1].astype(np.int64)
                exp[i, j] = block.sum() // block.size
        assert (got == exp).all(), (th, tw)


def test_thumbnail_stage_roundtrips_png(ray_session):
    """ImageThumbnailStage emits a VALID PNG whose decoded pixels equal
    the resize of the decoded input."""
    import numpy as np
    import pandas as pd

    from simple_content_ocr_ray.stages.media import (
        ImageThumbnailStage,
        area_mean_resize,
        thumb_dims,
    )
    from simple_content_ocr_ray.stages.png_decode import decode_png, make_png

    img = (np.add.outer(np.arange(30), np.arange(12)) % 256).astype(np.uint8)
    stage = ImageThumbnailStage()
    out = stage(pd.DataFrame({"doc_id": [1], "png": [make_png(img)]}))
    th, tw = thumb_dims(*img.shape)
    assert (out.thumb_h.iloc[0], out.thumb_w.iloc[0]) == (th, tw)
    back = decode_png(bytes(out.thumb_png.iloc[0]))
    back = back[:, :, 0] if back.ndim == 3 else back
    assert (back == area_mean_resize(img, th, tw)).all()


def test_phash_classes_distinct_and_rescale_invariant():
    import numpy as np

    from simple_content_ocr_ray.pipelines.media import PHASH_CLASSES, phash64

    hs = []
    for c in range(PHASH_CLASSES):
        px = np.zeros((32, 32), np.uint8)
        px[:, : 4 * (c + 1)] = 255
        hs.append(phash64(px))
    assert len(set(hs)) == PHASH_CLASSES
    # frequency-domain hash survives exact rescaling (pHash's selling point)
    px = np.zeros((32, 32), np.uint8)
    px[:, :12] = 255
    up2 = np.kron(px, np.ones((2, 2), np.uint8))
    assert phash64(px) == phash64(up2)
    # DC bit is excluded: global brightness shifts don't flip every bit
    brighter = np.clip(px.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    a, b = phash64(px), phash64(brighter)
    assert bin(a ^ b).count("1") <= 8


def test_audio_feature_stage_decodes_mp3_subset():
    """r5: the lossy-audio seam narrows to AAC — MP3 subset streams decode
    through AudioFeatureStage via the Layer-III chain."""
    import pandas as pd

    from simple_content_ocr_ray.stages.media import AudioFeatureStage
    from simple_content_ocr_ray.stages.mp3_layer3 import synth_mp3_audio

    df = pd.DataFrame({"doc_id": [3], "audio": [synth_mp3_audio(3)]})
    out = AudioFeatureStage()(df)
    n_frames = 4 + 3 % 5
    assert int(out["n_samples"][0]) == n_frames * 2 * 576
    assert float(out["rms"][0]) > 0
    assert int(out["duration_ms"][0]) == n_frames * 1152 * 1000 // 44100


def test_audio_feature_stage_aac_still_seamed():
    import pandas as pd
    import pytest as _pytest

    from simple_content_ocr_ray.stages.media import AudioFeatureStage

    df = pd.DataFrame({"doc_id": [0], "audio": [b"\x00\x00\x00 ftypM4A "]})
    with _pytest.raises(NotImplementedError):
        AudioFeatureStage()(df)

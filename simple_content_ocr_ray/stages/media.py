"""Multimodal (audio / video) column plumbing: opaque binary payloads in,
typed features out, through actor-pool ``map_batches`` stages.

The container ships no audio/video codec libraries, so payloads are either
deterministic synthetic containers (16-bit PCM audio; raw grayscale frame
stacks) whose DECODE is real byte math (``np.frombuffer`` / reshape), or —
since r4 — REAL FLAC streams decoded by the from-scratch codec in
``stages/flac_codec.py`` (Rice-coded LPC/fixed-predictor residuals, CRC
verified). Lossy formats (MP3/AAC/H.264/...) would plug into the same seam
via an external decoder; those branches raise NotImplementedError
explicitly.

Payload layouts (synthesized by ``synth_audio_payload`` /
``synth_video_payload``, sized from the documents table so SQL oracles can
predict the metadata):

  audio: b"PCM1" | u32 sample_rate | u32 n_samples | int16[n_samples]
  video: b"VID1" | u16 h | u16 w | u32 n_frames | u8[n_frames*h*w]

Scale notes: feature extraction is per-row-independent (no shuffle);
``batch_size`` must stay small because a batch is held decoded in the
worker heap (e.g. 64 rows × 2 MB ≈ 128 MB); the stage classes are actor
pools so any model/codec init cost is paid once per actor, not per batch.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

AUDIO_MAGIC = b"PCM1"
VIDEO_MAGIC = b"VID1"
AUDIO_RATE = 16_000
VIDEO_H = 24
VIDEO_W = 32
VIDEO_SAMPLE_EVERY = 5

#: synthesis rules (SQL-mirrorable):
#:   n_samples = n_chars * 4          (audio)
#:   n_frames  = max(1, n_chars // 8) (video)


def _prng_i16(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 samples via a splitmix64 stream (vectorized)."""
    idx = np.arange(n, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    z = idx + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return (z & np.uint64(0xFFFF)).astype(np.uint16).view(np.int16)


def synth_audio_payload(doc_id: int, n_chars: int) -> bytes:
    n = n_chars * 4
    samples = _prng_i16(doc_id, n)
    return AUDIO_MAGIC + struct.pack("<II", AUDIO_RATE, n) + samples.tobytes()


def synth_video_payload(doc_id: int, n_chars: int) -> bytes:
    n_frames = max(1, n_chars // 8)
    pix = (
        _prng_i16(doc_id + 1_000_000, n_frames * VIDEO_H * VIDEO_W).view(np.uint16)
        & 0xFF
    ).astype(np.uint8)
    return (
        VIDEO_MAGIC
        + struct.pack("<HHI", VIDEO_H, VIDEO_W, n_frames)
        + pix.tobytes()
    )


class AudioFeatureStage:
    """Actor-pool stage: PCM binary column → (n_samples, duration_ms, rms,
    zero-crossing count). Real vectorized decode; one instance per actor."""

    def __init__(self, payload_col: str = "audio") -> None:
        self.payload_col = payload_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ns, dur, rms, zc = [], [], [], []
        for payload in df[self.payload_col]:
            b = bytes(payload)
            if b[:4] == b"fLaC":
                # real compressed audio: from-scratch FLAC decode (r4,
                # stages/flac_codec.py) — multichannel streams are
                # averaged to mono for the feature math
                from .flac_codec import decode_flac

                decoded, rate = decode_flac(b)
                n = decoded.shape[0]
                samples = (
                    decoded[:, 0]
                    if decoded.shape[1] == 1
                    else decoded.mean(axis=1)
                )
            elif b[:4] == AUDIO_MAGIC:
                rate, n = struct.unpack_from("<II", b, 4)
                samples = np.frombuffer(b, dtype=np.int16, count=n, offset=12)
            elif b[:3] == b"ID3" or (
                len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
            ):
                # lossy audio, MP3 half (r5): subset Layer-III decode
                # (stages/mp3_layer3.py). Features are computed on the
                # SUBBAND-domain samples (time-major flatten) — the final
                # 32-band synthesis filterbank needs the ISO Table B.3
                # D window and stays at the documented seam, as does any
                # stream outside the subset (Mp3SeamError → failed row).
                from .mp3_layer3 import decode_mp3_audio

                m = decode_mp3_audio(b)
                rate = m["sample_rate"]
                n = m["n_granules"] * 576
                samples = m["subband"].reshape(-1)
            else:
                raise NotImplementedError(
                    "AAC/other lossy audio requires an external decoder "
                    "behind this seam (no codec libs in this environment)"
                )
            f = samples.astype(np.float64)
            ns.append(n)
            dur.append(n * 1000 // rate)
            rms.append(float(np.sqrt(np.mean(f * f))) if n else 0.0)
            zc.append(int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1]))))
        out = df.drop(columns=[self.payload_col]).reset_index(drop=True)
        out["n_samples"] = pd.Series(ns, dtype="int64")
        out["duration_ms"] = pd.Series(dur, dtype="int64")
        out["rms"] = pd.Series(rms).round(4)
        out["zero_crossings"] = pd.Series(zc, dtype="int64")
        return out


THUMB_BOX = 8  # thumbnails fit an 8×8 box, aspect preserved


def area_mean_resize(img: "np.ndarray", th: int, tw: int) -> "np.ndarray":
    """Exact area-mean downscale of a 2-D uint8 image to (th, tw): each
    output pixel is the floor-mean of its source bucket (buckets split at
    ``floor(i·src/dst)`` boundaries — the classic box filter). Fully
    vectorized via two ``np.add.reduceat`` passes; integer arithmetic
    throughout, so the result is platform-exact."""
    h, w = img.shape
    ys = (np.arange(th, dtype=np.int64) * h) // th
    xs = (np.arange(tw, dtype=np.int64) * w) // tw
    sums = np.add.reduceat(
        np.add.reduceat(img.astype(np.int64), ys, axis=0), xs, axis=1
    )
    yc = np.diff(np.append(ys, h))
    xc = np.diff(np.append(xs, w))
    counts = yc[:, None] * xc[None, :]
    return (sums // counts).astype(np.uint8)


def thumb_dims(h: int, w: int, box: int = THUMB_BOX) -> tuple[int, int]:
    """Aspect-preserving fit into a box×box target (floor, min 1) — the
    formula is mirrored verbatim in the image_thumbnails SQL oracle, so
    both engines evaluate the identical IEEE expression."""
    scale = min(box / h, box / w)
    return max(1, int(h * scale)), max(1, int(w * scale))


class ImageThumbnailStage:
    """Actor-pool thumbnailer — the reference design doc's companion
    service to OCR (its latency envelope cites "thumbnailer 50–130 ms" vs
    OCR 1–5 s: openspec/changes/add-ocr-processing-capability/design.md:9):
    decode the image payload with the from-scratch PNG decoder, area-mean
    downscale into an 8×8 box preserving aspect, re-encode as a real PNG.
    Emits thumbnail dims, brightness, and the encoded thumbnail bytes.
    Decoder import happens once per actor (``__init__``), resize + encode
    per batch."""

    def __init__(self, payload_col: str = "png") -> None:
        from .image_formats import decode_image
        from .png_decode import make_png

        self.payload_col = payload_col
        self._decode = decode_image  # any format in the real-decoder family
        self._encode = make_png

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .png_decode import UnsupportedImageError

        ws, hs, tws, ths, bright, blobs, keep = [], [], [], [], [], [], []
        for payload in df[self.payload_col]:
            # undecodable payloads cost their ROW, never the task — the
            # same failed-row seam every decoder stage uses
            try:
                img = self._decode(bytes(payload))
            except (UnsupportedImageError, ValueError):
                keep.append(False)
                continue
            keep.append(True)
            if img.ndim == 3:  # (h, w, ch) → integer-exact grey
                img = (img.astype(np.int64).sum(axis=2) // img.shape[2]).astype(np.uint8)
            h, w = img.shape
            th, tw = thumb_dims(h, w)
            thumb = area_mean_resize(img, th, tw)
            hs.append(h)
            ws.append(w)
            ths.append(th)
            tws.append(tw)
            bright.append(int(thumb.astype(np.int64).sum() // thumb.size))
            blobs.append(self._encode(thumb))
        out = (
            df[np.asarray(keep, dtype=bool)]
            .drop(columns=[self.payload_col])
            .reset_index(drop=True)
        )
        out["width"] = pd.Series(ws, dtype="int64")
        out["height"] = pd.Series(hs, dtype="int64")
        out["thumb_w"] = pd.Series(tws, dtype="int64")
        out["thumb_h"] = pd.Series(ths, dtype="int64")
        out["thumb_brightness"] = pd.Series(bright, dtype="int64")
        out["thumb_png"] = blobs
        return out


class VideoFrameSampleStage:
    """Actor-pool stage: raw frame-stack binary column → frame count +
    per-sampled-frame mean brightness (every ``sample_every``-th frame).
    The list-typed output column is the decode→feature schema shape a real
    frame sampler (ffmpeg/pyav behind this seam) would produce."""

    def __init__(self, payload_col: str = "video", sample_every: int = VIDEO_SAMPLE_EVERY) -> None:
        self.payload_col = payload_col
        self.sample_every = sample_every

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        nf, nsamp, bright = [], [], []
        for payload in df[self.payload_col]:
            b = bytes(payload)
            if b[:4] != VIDEO_MAGIC:
                raise NotImplementedError(
                    "compressed video requires an external decoder behind "
                    "this seam (no codec libs in this environment)"
                )
            h, w, n_frames = struct.unpack_from("<HHI", b, 4)
            pix = np.frombuffer(b, dtype=np.uint8, count=n_frames * h * w, offset=12)
            frames = pix.reshape(n_frames, h * w)
            sampled = frames[:: self.sample_every]
            nf.append(n_frames)
            nsamp.append(len(sampled))
            bright.append(np.round(sampled.mean(axis=1), 4))
        out = df.drop(columns=[self.payload_col]).reset_index(drop=True)
        out["n_frames"] = pd.Series(nf, dtype="int64")
        out["n_sampled"] = pd.Series(nsamp, dtype="int64")
        out["frame_brightness"] = bright
        return out

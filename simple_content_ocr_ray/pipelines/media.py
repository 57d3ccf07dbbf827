"""Multimodal pipeline queries: synthesize deterministic audio/video binary
columns from the documents table, run the actor-pool feature stages
(stages/media.py), and emit the SQL-predictable metadata columns.

The payload→feature plumbing (binary column through an actor pool with
small batches) is the real deliverable; the SQL oracles pin the metadata
that is derivable from the synthesis rules (sample/frame counts and the
integer duration), while the signal features (rms, zero crossings, frame
brightness) are covered by numpy-reference tests in tests/test_media.py.
"""

from __future__ import annotations

import os
from typing import Callable

import pandas as pd
import ray.data as rd

from ..stages.media import (
    AUDIO_RATE,
    AudioFeatureStage,
    VideoFrameSampleStage,
    VIDEO_SAMPLE_EVERY,
    synth_audio_payload,
    synth_video_payload,
)

#: multi-MB binary rows: keep decoded batches ~tens of MB in the worker heap
MEDIA_BATCH_SIZE = 64
MEDIA_CONCURRENCY_CAP = 4


def _media_concurrency() -> int:
    """Actor-pool size that always leaves CPUs for the upstream read/synth
    tasks: a pool that reserves every CPU deadlocks the pipeline (the pool
    idles waiting for input the starved read stage can never produce)."""
    import ray

    if ray.is_initialized():
        total = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        # graph-build before ray.init(): Ray will auto-init with the host's
        # CPU count, so size against that — assuming a fixed 8 here could
        # reserve every CPU of a smaller machine and deadlock the pipeline
        total = os.cpu_count() or 8
    return max(1, min(MEDIA_CONCURRENCY_CAP, total - 2))


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )


def _with_audio(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["audio"] = [
        synth_audio_payload(int(d), int(c))
        for d, c in zip(df["doc_id"], df["n_chars"])
    ]
    return df


def _with_video(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["video"] = [
        synth_video_payload(int(d), int(c))
        for d, c in zip(df["doc_id"], df["n_chars"])
    ]
    return df


def audio_features(sf_dir: str) -> rd.Dataset:
    """Full feature table (incl. rms / zero crossings) — library surface."""
    return (
        _docs(sf_dir)
        .map_batches(_with_audio, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            AudioFeatureStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


def audio_meta(sf_dir: str) -> rd.Dataset:
    """SQL-oracled audio metadata (doc_id, n_samples, duration_ms)."""
    return audio_features(sf_dir).select_columns(
        ["doc_id", "n_samples", "duration_ms"]
    )


_AUDIO_META_SQL = f"""
SELECT doc_id,
       n_chars * 4 AS n_samples,
       (n_chars * 4) * 1000 // {AUDIO_RATE} AS duration_ms
FROM documents
"""


def video_features(sf_dir: str) -> rd.Dataset:
    return (
        _docs(sf_dir)
        .map_batches(_with_video, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            VideoFrameSampleStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


def video_meta(sf_dir: str) -> rd.Dataset:
    """SQL-oracled video metadata (doc_id, n_frames, n_sampled)."""
    return video_features(sf_dir).select_columns(["doc_id", "n_frames", "n_sampled"])


_VIDEO_META_SQL = f"""
SELECT doc_id,
       GREATEST(1, n_chars // 8) AS n_frames,
       (GREATEST(1, n_chars // 8) + {VIDEO_SAMPLE_EVERY - 1})
         // {VIDEO_SAMPLE_EVERY} AS n_sampled
FROM documents
"""


# --------------------------------------------------------------------------
# REAL PNG decode metadata (stages/png_decode.py — not the stub)
# --------------------------------------------------------------------------

class _PngMetaStage:
    """Actor-pool stage running the real decoder (chunk walk, CRC, inflate,
    unfilter) on synthesized-yet-valid PNG payloads."""

    def __init__(self) -> None:
        from ..stages.png_decode import PngImageEngine

        self.engine = PngImageEngine()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        widths, heights, bright = [], [], []
        for payload in df["png"]:
            res = self.engine.extract("", bytes(payload), "png")
            widths.append(int(res.metadata["width"]))
            heights.append(int(res.metadata["height"]))
            bright.append(int(float(res.metadata["brightness"])))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "brightness": pd.Series(bright, dtype="int64"),
            }
        )


def png_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end PNG decode: synthesize a VALID constant-pixel PNG
    per document (dimensions and pixel value are pure functions of doc_id,
    so every decoded property is SQL-predictable), decode it with the
    from-scratch decoder in an actor pool, emit typed metadata."""
    import numpy as np

    from ..stages.png_decode import make_png

    def with_png(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["png"] = [
            make_png(
                np.full(
                    (4 + int(d) % 7, 16 + int(d) % 9),
                    int(d) % 256,
                    dtype=np.uint8,
                )
            )
            for d in df["doc_id"]
        ]
        return df

    return (
        _docs(sf_dir)
        .map_batches(with_png, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _PngMetaStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_PNG_REAL_META_SQL = """
SELECT doc_id,
       16 + doc_id % 9 AS width,
       4 + doc_id % 7 AS height,
       doc_id % 256 AS brightness
FROM documents
"""


# --------------------------------------------------------------------------
# REAL PDF text extraction (stages/pdf_text.py — full encode→parse loop)
# --------------------------------------------------------------------------

class _PdfTextStage:
    def __init__(self) -> None:
        from ..stages.pdf_text import PdfTextEngine

        self.engine = PdfTextEngine()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts, n_pages = [], []
        for payload in df["pdf"]:
            res = self.engine.extract("", bytes(payload), "pdf")
            texts.append(res.text)
            n_pages.append(res.page_count)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": texts,
                "page_count": pd.Series(n_pages, dtype="int64"),
            }
        )


def pdf_real_text(sf_dir: str) -> rd.Dataset:
    """Real end-to-end PDF text: build a VALID single-page PDF holding each
    document's text, parse it back with the from-scratch extractor
    (object scan → /Contents → stream → Tj decode) in an actor pool, and
    require BYTE-EXACT recovery — the oracle is simply the documents table."""
    from ..stages.pdf_text import make_minimal_pdf

    def with_pdf(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["pdf"] = [make_minimal_pdf([[t]]) for t in df["text"]]
        return out[["doc_id", "pdf"]]

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return (
        ds.map_batches(with_pdf, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _PdfTextStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_PDF_REAL_TEXT_SQL = """
SELECT doc_id, text, CAST(1 AS BIGINT) AS page_count FROM documents
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "audio_meta": audio_meta,
    "video_meta": video_meta,
    "png_real_meta": png_real_meta,
    "pdf_real_text": pdf_real_text,
}
ORACLES: dict[str, str] = {
    "audio_meta": _AUDIO_META_SQL,
    "video_meta": _VIDEO_META_SQL,
    "png_real_meta": _PNG_REAL_META_SQL,
    "pdf_real_text": _PDF_REAL_TEXT_SQL,
}

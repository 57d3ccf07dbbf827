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
# REAL JPEG decode metadata (stages/jpeg_decode.py — full baseline codec)
# --------------------------------------------------------------------------

class _JpegMetaStage:
    """Actor-pool stage running the real baseline-JPEG decoder (marker walk,
    Huffman entropy decode, dequantize, batched IDCT) on synthesized-yet-
    valid JFIF payloads."""

    def __init__(self) -> None:
        from ..stages.jpeg_decode import JpegImageEngine

        self.engine = JpegImageEngine()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        widths, heights, bright = [], [], []
        for payload in df["jpg"]:
            res = self.engine.extract("", bytes(payload), "jpeg")
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


def jpeg_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end JPEG decode: encode a constant-gray baseline JFIF per
    document (dimensions are pure functions of doc_id; the gray level is
    EVEN-level-shifted — 2·(doc_id % 128) — so the DC quantization roundtrip
    with the Annex-K Q00=16 table reconstructs the constant exactly and the
    decoded mean brightness is SQL-predictable), decode it with the
    from-scratch decoder in an actor pool, emit typed metadata."""
    import numpy as np

    from ..stages.jpeg_decode import make_jpeg

    def with_jpg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["jpg"] = [
            make_jpeg(
                np.full(
                    (4 + int(d) % 7, 16 + int(d) % 9),
                    2 * (int(d) % 128),
                    dtype=np.uint8,
                )
            )
            for d in df["doc_id"]
        ]
        return df

    return (
        _docs(sf_dir)
        .map_batches(with_jpg, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _JpegMetaStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_JPEG_REAL_META_SQL = """
SELECT doc_id,
       16 + doc_id % 9 AS width,
       4 + doc_id % 7 AS height,
       2 * (doc_id % 128) AS brightness
FROM documents
"""


def jpeg_progressive_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end PROGRESSIVE (SOF2) JPEG decode (r4): encode a
    constant-gray multi-scan progressive JFIF per document — DC/AC first +
    refinement scans with successive approximation — and decode it with the
    from-scratch progressive decoder in an actor pool. Same even-gray trick
    as ``jpeg_real_meta``, so the decoded brightness is SQL-predictable;
    the two queries share one oracle shape, proving the progressive path is
    value-identical to baseline."""
    import numpy as np

    from ..stages.jpeg_decode import make_progressive_jpeg

    def with_jpg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["jpg"] = [
            make_progressive_jpeg(
                np.full(
                    (4 + int(d) % 7, 16 + int(d) % 9),
                    2 * (int(d) % 128),
                    dtype=np.uint8,
                )
            )
            for d in df["doc_id"]
        ]
        return df

    return (
        _docs(sf_dir)
        .map_batches(with_jpg, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _JpegMetaStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


class _JpegExifStage:
    """Actor-pool stage parsing EXIF (APP1 / TIFF-IFD binary walk) from raw
    JPEG bytes AND running the full real decode on the same payload — one
    pass proves the decoder skips APPn segments and that metadata survives
    the splice."""

    def __init__(self) -> None:
        from ..stages.exif import parse_exif
        from ..stages.jpeg_decode import JpegImageEngine

        self.parse = parse_exif
        self.engine = JpegImageEngine()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        order, orient, make, pxw, pxh, bright = [], [], [], [], [], []
        for payload in df["jpg"]:
            payload = bytes(payload)
            meta = self.parse(payload)
            res = self.engine.extract("", payload, "jpeg")
            order.append(meta["byte_order"])
            orient.append(int(meta["orientation"]))
            make.append(meta["make"])
            pxw.append(int(meta["pixel_x"]))
            pxh.append(int(meta["pixel_y"]))
            bright.append(int(float(res.metadata["brightness"])))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "byte_order": pd.Series(order, dtype="object"),
                "orientation": pd.Series(orient, dtype="int64"),
                "make": pd.Series(make, dtype="object"),
                "px_w": pd.Series(pxw, dtype="int64"),
                "px_h": pd.Series(pxh, dtype="int64"),
                "brightness": pd.Series(bright, dtype="int64"),
            }
        )


def jpeg_exif_meta(sf_dir: str) -> rd.Dataset:
    """Real EXIF extraction over JPEG payloads: splice a writer-built APP1
    block — orientation/camera/pixel tags, byte order alternating II/MM by
    doc parity so BOTH endianness paths run — into the constant-gray JFIF,
    then parse the tags back out of the raw TIFF-IFD bytes in an actor pool
    alongside a full real decode (stages/exif.py). The reference gets the
    same tags through PIL; every value is a pure function of doc_id, so the
    oracle mirrors the whole row in SQL."""
    import numpy as np

    from ..stages.exif import insert_exif, make_exif_app1
    from ..stages.jpeg_decode import make_jpeg

    def with_jpg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()

        def build(d: int) -> bytes:
            w, h = 16 + d % 9, 4 + d % 7
            app1 = make_exif_app1(
                orientation=1 + d % 8,
                make=f"cam{d % 5}",
                model=f"m{d % 3}",
                datetime="2024:01:02 03:04:05",
                pixel_x=w,
                pixel_y=h,
                big_endian=bool(d % 2),
            )
            return insert_exif(
                make_jpeg(np.full((h, w), 2 * (d % 128), dtype=np.uint8)), app1
            )

        df["jpg"] = [build(int(d)) for d in df["doc_id"]]
        return df

    return (
        _docs(sf_dir)
        .map_batches(with_jpg, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _JpegExifStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_JPEG_EXIF_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order,
       1 + doc_id % 8 AS orientation,
       'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
       16 + doc_id % 9 AS px_w,
       4 + doc_id % 7 AS px_h,
       2 * (doc_id % 128) AS brightness
FROM documents
"""


# --------------------------------------------------------------------------
# REAL BMP / GIF / TIFF decode metadata (stages/image_formats.py)
# --------------------------------------------------------------------------

class _FormatMetaStage:
    """Generic actor-pool stage for the lossless image codecs: synthesize a
    valid payload per doc (constant pixels, dims pure functions of doc_id),
    decode with the REAL from-scratch decoder, emit typed metadata.

    The encoding VARIANT also cycles with doc_id — TIFF rotates through all
    four compressions (none / LZW / Deflate / PackBits, odd docs adding
    Predictor 2), BMP alternates BI_RGB and BI_RLE8 — so the compressed
    decode paths are exercised and hash-checked end-to-end, not just in
    unit tests. The SQL mirror is unchanged: dims/brightness don't depend
    on the wire encoding (that invariance IS the check)."""

    def __init__(self, fmt: str) -> None:
        import numpy as np

        from ..stages import image_formats as imf

        self.np = np
        enc, dec, self.wmod, self.hmod = {
            "bmp": (imf.make_bmp, imf.decode_bmp, (12, 11), (3, 5)),
            "gif": (imf.make_gif, imf.decode_gif, (10, 6), (5, 4)),
            "tiff": (imf.make_tiff, imf.decode_tiff, (9, 8), (6, 3)),
        }[fmt]
        self.enc, self.dec = enc, dec
        if fmt == "tiff":
            self.enc = lambda px, d: enc(
                px,
                compression=(1, 5, 8, 32773)[d % 4],
                predictor=2 if d % 2 else 1,
            )
        elif fmt == "bmp":
            self.enc = lambda px, d: enc(px, rle=bool(d % 2))
        else:
            self.enc = lambda px, d: enc(px)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        np = self.np
        (wb, wm), (hb, hm) = self.wmod, self.hmod
        widths, heights, bright = [], [], []
        for d in df["doc_id"]:
            d = int(d)
            px = np.full((hb + d % hm, wb + d % wm), d % 256, dtype=np.uint8)
            img = self.dec(self.enc(px, d))
            h, w = img.shape[:2]
            widths.append(w)
            heights.append(h)
            bright.append(int(img.mean()))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "brightness": pd.Series(bright, dtype="int64"),
            }
        )


def _format_meta_query(fmt: str):
    def q(sf_dir: str) -> rd.Dataset:
        return _docs(sf_dir).map_batches(
            _FormatMetaStage,
            fn_constructor_kwargs={"fmt": fmt},
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )

    q.__name__ = f"{fmt}_real_meta"
    q.__doc__ = (
        f"Real end-to-end {fmt.upper()} decode (lossless, so the constant-"
        "pixel brightness is exact): encode → from-scratch decode in an "
        "actor pool → typed metadata, SQL-mirrored from doc_id."
    )
    return q


bmp_real_meta = _format_meta_query("bmp")
gif_real_meta = _format_meta_query("gif")
tiff_real_meta = _format_meta_query("tiff")

_BMP_REAL_META_SQL = """
SELECT doc_id, 12 + doc_id % 11 AS width, 3 + doc_id % 5 AS height,
       doc_id % 256 AS brightness
FROM documents
"""
_GIF_REAL_META_SQL = """
SELECT doc_id, 10 + doc_id % 6 AS width, 5 + doc_id % 4 AS height,
       doc_id % 256 AS brightness
FROM documents
"""
_TIFF_REAL_META_SQL = """
SELECT doc_id, 9 + doc_id % 8 AS width, 6 + doc_id % 3 AS height,
       doc_id % 256 AS brightness
FROM documents
"""


class _WebpMetaStage:
    """Actor-pool stage running a real WebP decode on synthesized-yet-valid
    payloads, one stage for BOTH halves of the format (``lossy`` selects
    the encoder):

    * lossless (VP8L): the encoder mode rotates by doc_id — plain /
      subtract-green / predictor / palette / color-transform, with the
      color cache and LZ77 runs toggled by parity — so every bitstream
      feature rides the real decode path;
    * lossy (VP8 key frames, r4 ``stages/vp8_codec.py``): quantizer index
      rotates 4..11. A constant GRAY is the one input lossy VP8
      reconstructs exactly (DC prediction absorbs it; chroma sits at the
      128 fixed point), so brightness stays SQL-mirrored exactly on the
      lossy path too."""

    def __init__(self, lossy: bool = False) -> None:
        from ..stages.vp8_codec import make_webp_lossy
        from ..stages.webp_decode import WebpImageEngine, make_webp_lossless

        self.engine = WebpImageEngine()
        self.lossy = lossy
        self.enc_lossless = make_webp_lossless
        self.enc_lossy = make_webp_lossy

    def _payload(self, d: int, img) -> bytes:
        if self.lossy:
            return self.enc_lossy(img, qi=4 + d % 8)
        transforms = [None, "subtract_green", "predictor", "palette", "color"]
        return self.enc_lossless(
            img,
            transform=transforms[d % 5],
            cache_bits=4 if d % 2 else 0,
            lz77=bool(d % 3),
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        widths, heights, bright = [], [], []
        for d in df["doc_id"]:
            d = int(d)
            img = np.full((4 + d % 6, 8 + d % 9, 3), d % 256, dtype=np.uint8)
            res = self.engine.extract("", self._payload(d, img), "webp")
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


def webp_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end WebP-lossless decode: encode a constant-color VP8L
    per document (mode rotating through every transform + cache/LZ77
    combinations), decode with the from-scratch decoder in an actor pool,
    emit typed metadata. Lossless → brightness is exactly doc_id % 256."""
    return _docs(sf_dir).map_batches(
        _WebpMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_WEBP_REAL_META_SQL = """
SELECT doc_id, 8 + doc_id % 9 AS width, 4 + doc_id % 6 AS height,
       doc_id % 256 AS brightness
FROM documents
"""


def webp_lossy_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end lossy-WebP decode: VP8 key-frame encode + decode per
    document in an actor pool, typed metadata out. Closes the last format
    seam — the reference's PIL route accepts webp (config.py:114)."""
    return _docs(sf_dir).map_batches(
        _WebpMetaStage,
        fn_constructor_kwargs={"lossy": True},
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_WEBP_LOSSY_META_SQL = """
SELECT doc_id, 8 + doc_id % 9 AS width, 4 + doc_id % 6 AS height,
       doc_id % 256 AS brightness
FROM documents
"""


class _DocxTextStage:
    """Actor-pool stage: build a valid docx holding the document's text
    (paragraph per line), extract it back with the from-scratch OOXML
    engine (r4). Lossless text roundtrip → SQL identity oracle."""

    def __init__(self) -> None:
        from ..stages.ooxml_text import OoxmlTextEngine, make_docx

        self.engine = OoxmlTextEngine()
        self.make = make_docx

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts, pages = [], []
        for t in df["text"]:
            payload = self.make([str(t).split("\n")])
            res = self.engine.extract("", payload, "zip")
            texts.append(res.text)
            pages.append(res.page_count)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": texts,
                "page_count": pd.Series(pages, dtype="int64"),
            }
        )


def docx_real_text(sf_dir: str) -> rd.Dataset:
    """Real end-to-end DOCX text: wrap each document's text in a valid
    minimal docx (zip + WordprocessingML runs), extract the runs back in
    an actor pool. Text is byte-identical to the source — the reference
    stubs these types to errors (ocr_service.py:234-242); this exceeds it."""
    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(
            _DocxTextStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_DOCX_REAL_TEXT_SQL = """
SELECT doc_id, text, 1 AS page_count FROM documents
"""


class _OoxmlMetaStage:
    """pptx + xlsx through the same engine: slide count and a numeric cell
    value must survive the build→extract roundtrip."""

    def __init__(self) -> None:
        from ..stages.ooxml_text import OoxmlTextEngine, make_pptx, make_xlsx

        self.engine = OoxmlTextEngine()
        self.make_pptx = make_pptx
        self.make_xlsx = make_xlsx

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        pptx_pages, xlsx_vals = [], []
        for d in df["doc_id"]:
            d = int(d)
            n_slides = 1 + d % 3
            pres = self.engine.extract(
                "",
                self.make_pptx(
                    [[f"slide {i} of doc {d}"] for i in range(n_slides)]
                ),
                "zip",
            )
            pptx_pages.append(pres.page_count)
            xres = self.engine.extract(
                "", self.make_xlsx([[[f"doc {d}", d]]]), "zip"
            )
            xlsx_vals.append(int(xres.text.split("\t")[1]))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "pptx_pages": pd.Series(pptx_pages, dtype="int64"),
                "xlsx_value": pd.Series(xlsx_vals, dtype="int64"),
            }
        )


def ooxml_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end PPTX/XLSX extraction: per document, a pptx with
    1 + doc_id%3 slides and an xlsx holding doc_id in a numeric cell, both
    round-tripped through the from-scratch OOXML engine."""
    return _docs(sf_dir).map_batches(
        _OoxmlMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_OOXML_REAL_META_SQL = """
SELECT doc_id, 1 + doc_id % 3 AS pptx_pages, doc_id AS xlsx_value
FROM documents
"""


class _DocLegacyStage:
    """Actor-pool stage: wrap each document's text (plus a forced
    non-cp1252 suffix so every file carries at least one UTF-16 piece) in
    a spec-valid Word 97 ``.doc`` — real CFB container, ministream 1Table,
    FIB + piece table — and extract it back with the from-scratch
    [MS-DOC] parser (`stages/doc_legacy.py`). Lossless roundtrip → SQL
    identity oracle."""

    def __init__(self) -> None:
        from ..stages.doc_legacy import make_doc, parse_doc

        self.make = make_doc
        self.parse = parse_doc

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts, pieces = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            wrapped = f"{t}\n→{int(d)}"  # U+2192 is not cp1252-encodable
            res = self.parse(self.make(wrapped))
            texts.append(res["text"])
            pieces.append(res["n_pieces"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text": texts,
                "n_pieces": pd.Series(pieces, dtype="int64"),
            }
        )


def doc_legacy_real_text(sf_dir: str) -> rd.Dataset:
    """Real end-to-end legacy ``.doc`` text: build → CFB/piece-table parse
    per document. The reference stubs pre-2007 office types to failed rows
    (ocr_service.py:234-242); this extracts them from scratch. Pure
    per-document map, no shuffle at any scale."""
    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(
            _DocLegacyStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_DOC_LEGACY_REAL_TEXT_SQL = """
SELECT doc_id,
       text || chr(10) || '→' || doc_id AS text,
       CAST(ceil((length(text) + 2
                  + length(CAST(doc_id AS VARCHAR))) / 120.0) AS BIGINT)
         AS n_pieces
FROM documents
"""


class _SvgMetaStage:
    """Actor-pool stage: synthesize a deterministic SVG per document
    (sized root, rotating shape count, 1 + doc_id%4 text runs with the
    tspan-split form on odd ids, defs/comment decoys), extract text +
    geometry back with the real SVG engine (r4, stages/svg_text.py)."""

    def __init__(self) -> None:
        from ..stages.svg_text import SvgTextEngine, make_svg

        self.engine = SvgTextEngine()
        self.make = make_svg

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        widths, heights, shapes, runs, texts = [], [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            payload = self.make(
                width=100 + d % 37,
                height=50 + d % 23,
                text_runs=[f"run {d} {i}" for i in range(1 + d % 4)],
                n_rects=d % 5,
                title=f"Logo {d}",
                messy=bool(d % 2),
            )
            res = self.engine.extract("", payload, "svg")
            widths.append(int(res.metadata["width"]))
            heights.append(int(res.metadata["height"]))
            shapes.append(int(res.metadata["n_shapes"]))
            runs.append(int(res.metadata["n_text_runs"]))
            texts.append(res.text)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "n_shapes": pd.Series(shapes, dtype="int64"),
                "n_text_runs": pd.Series(runs, dtype="int64"),
                "text": texts,
            }
        )


def svg_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end SVG extraction: vector image → visible text runs
    (defs text excluded, tspans collapsed) + intrinsic geometry. The
    reference's image list stops at raster formats (config.py:113-120);
    SVG is the vector half of the web image family."""
    return _docs(sf_dir).map_batches(
        _SvgMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_SVG_REAL_META_SQL = """
SELECT doc_id,
       100 + doc_id % 37 AS width,
       50 + doc_id % 23 AS height,
       doc_id % 5 AS n_shapes,
       1 + doc_id % 4 AS n_text_runs,
       'run ' || doc_id || ' 0'
         || CASE WHEN doc_id % 4 >= 1
                 THEN chr(10) || 'run ' || doc_id || ' 1' ELSE '' END
         || CASE WHEN doc_id % 4 >= 2
                 THEN chr(10) || 'run ' || doc_id || ' 2' ELSE '' END
         || CASE WHEN doc_id % 4 >= 3
                 THEN chr(10) || 'run ' || doc_id || ' 3' ELSE '' END
         AS text
FROM documents
"""


class _IcoMetaStage:
    """Actor-pool stage: build a multi-entry ICO per document (entry sizes
    strictly increasing so the largest is deterministic; the DIB/PNG
    storage mix rotates via png_mask = doc_id%8), decode the largest entry
    with the real ICO decoder."""

    def __init__(self) -> None:
        import numpy as np

        from ..stages.image_formats import IcoImageEngine, make_ico

        self.np = np
        self.engine = IcoImageEngine()
        self.make = make_ico

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        np = self.np
        widths, heights, n_images, bright = [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            n = 1 + d % 3
            imgs = [
                np.full(
                    (3 + j * 8 + d % 3, 4 + j * 8 + d % 4, 3),
                    d % 256,
                    dtype=np.uint8,
                )
                for j in range(n)
            ]
            res = self.engine.extract("", self.make(imgs, png_mask=d % 8), "ico")
            widths.append(int(res.metadata["width"]))
            heights.append(int(res.metadata["height"]))
            n_images.append(int(res.metadata["n_images"]))
            bright.append(int(float(res.metadata["brightness"])))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "n_images": pd.Series(n_images, dtype="int64"),
                "brightness": pd.Series(bright, dtype="int64"),
            }
        )


def ico_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end ICO (favicon) decode: multi-image container with
    mixed DIB/embedded-PNG entries, largest-entry selection, constant
    color so brightness is exactly doc_id % 256."""
    return _docs(sf_dir).map_batches(
        _IcoMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_ICO_REAL_META_SQL = """
SELECT doc_id,
       4 + (doc_id % 3) * 8 + doc_id % 4 AS width,
       3 + (doc_id % 3) * 8 + doc_id % 3 AS height,
       1 + doc_id % 3 AS n_images,
       doc_id % 256 AS brightness
FROM documents
"""


class _FlacMetaStage:
    """Actor-pool stage: per document, encode the SAME deterministic PCM
    the plain audio fixture uses as a real FLAC stream (subframe type
    rotating by doc_id — constant / verbatim / fixed1 / fixed2 / LPC — so
    every decode path rides the oracled query), then run the standard
    audio feature extraction over the COMPRESSED payload."""

    _MODES = ("constant", "verbatim", "fixed1", "fixed2", "lpc2")

    def __init__(self) -> None:
        from ..stages.flac_codec import make_flac
        from ..stages.media import AudioFeatureStage, _prng_i16

        self.make = make_flac
        self.prng = _prng_i16
        self.features = AudioFeatureStage(payload_col="audio")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        payloads, modes = [], []
        for d, c in zip(df["doc_id"], df["n_chars"]):
            d, n = int(d), int(c) * 4
            mode = self._MODES[d % 5]
            if mode == "constant":
                pcm = np.full(n, d % 100 - 50, np.int32)
            else:
                pcm = self.prng(d, n).astype(np.int32)
            payloads.append(self.make(pcm, mode=mode, block_size=4096))
            modes.append(mode)
        sub = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "audio": payloads}
        )
        out = self.features(sub)
        out["mode"] = modes
        return out[["doc_id", "mode", "n_samples", "duration_ms"]]


def flac_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end COMPRESSED audio: FLAC encode (rotating subframe
    types) → from-scratch FLAC decode inside the standard audio feature
    stage → typed metadata. Closes the compressed-audio seam the plain
    PCM fixture left open (stages/media.py docstring)."""
    return _docs(sf_dir).map_batches(
        _FlacMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_FLAC_REAL_META_SQL = f"""
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'constant' WHEN 1 THEN 'verbatim'
            WHEN 2 THEN 'fixed1' WHEN 3 THEN 'fixed2' ELSE 'lpc2' END
         AS mode,
       n_chars * 4 AS n_samples,
       (n_chars * 4) * 1000 // {AUDIO_RATE} AS duration_ms
FROM documents
"""


class _Mp4MetaStage:
    """Actor-pool stage: build a valid ISO-BMFF file per document (geometry
    / duration / sample count derived from doc_id; a second audio track and
    the 64-bit v1 header layout toggle by parity so both parser paths ride
    the oracled query), parse it back with the real box-tree parser."""

    def __init__(self) -> None:
        from ..stages.mp4_boxes import Mp4VideoEngine, make_mp4

        self.engine = Mp4VideoEngine()
        self.make = make_mp4

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        dur, w, h, tracks, samples = [], [], [], [], []
        for d in df["doc_id"]:
            d = int(d)
            payload = self.make(
                duration_ms=1000 + d % 9000,
                width=160 + d % 320,
                height=90 + d % 180,
                n_samples=1 + d % 50,
                with_audio=bool(d % 2),
                version1=bool(d % 3 == 0),
            )
            res = self.engine.extract("", payload, "mp4")
            dur.append(int(res.metadata["duration_ms"]))
            w.append(int(res.metadata["width"]))
            h.append(int(res.metadata["height"]))
            tracks.append(int(res.metadata["n_tracks"]))
            samples.append(int(res.metadata["n_samples"]))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "duration_ms": pd.Series(dur, dtype="int64"),
                "width": pd.Series(w, dtype="int64"),
                "height": pd.Series(h, dtype="int64"),
                "n_tracks": pd.Series(tracks, dtype="int64"),
                "n_samples": pd.Series(samples, dtype="int64"),
            }
        )


def mp4_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end MP4 container metadata: ISO-BMFF box-tree walk
    (mvhd/tkhd/mdhd/hdlr/stsz, v0+v1 layouts, multi-track) in an actor
    pool. Frame decode stays the documented external-codec seam."""
    return _docs(sf_dir).map_batches(
        _Mp4MetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_MP4_REAL_META_SQL = """
SELECT doc_id,
       1000 + doc_id % 9000 AS duration_ms,
       160 + doc_id % 320 AS width,
       90 + doc_id % 180 AS height,
       1 + doc_id % 2 AS n_tracks,
       1 + doc_id % 50 AS n_samples
FROM documents
"""


class _Mp3AudioStage:
    """Actor-pool stage: synthesize a subset-conformant mono MPEG-1
    Layer III stream per document and decode its SAMPLES with the
    from-scratch Layer-III chain (stages/mp3_layer3.py — Huffman →
    requantize → alias reduction → IMDCT-36 → subband samples). The
    decoded integer spectrum is compared line-exactly by the SQL oracle;
    the float IMDCT path is parity-tested in tests/test_mp3_layer3.py."""

    def __init__(self) -> None:
        from ..stages.mp3_layer3 import decode_mp3_audio, synth_mp3_audio

        self.decode = decode_mp3_audio
        self.synth = synth_mp3_audio

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fc, sr, dur, nl, nnz = [], [], [], [], []
        for d in df["doc_id"]:
            m = self.decode(self.synth(int(d)))
            fc.append(m["frame_count"])
            sr.append(m["sample_rate"])
            dur.append(m["frame_count"] * 1152 * 1000 // m["sample_rate"])
            nl.append(m["n_lines"])
            nnz.append(m["n_nonzero_lines"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "frame_count": pd.Series(fc, dtype="int64"),
                "sample_rate": pd.Series(sr, dtype="int64"),
                "duration_ms": pd.Series(dur, dtype="int64"),
                "n_lines": pd.Series(nl, dtype="int64"),
                "n_nonzero_lines": pd.Series(nnz, dtype="int64"),
            }
        )


def mp3_real_audio(sf_dir: str) -> rd.Dataset:
    """Real lossy-audio SAMPLE decode (r5): closes the MP3 half of the
    lossy-audio seam down to the ISO annex-table boundary documented in
    stages/mp3_layer3.py. Completes the audio family next to WAV PCM and
    FLAC (flac_real_meta)."""
    return _docs(sf_dir).map_batches(
        _Mp3AudioStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


# the oracle reconstructs the synthesized spectrum arithmetically: per
# (frame i, granule g) there are 2·(12 + (doc+i+g) % 8) coded lines and
# line k is zero iff (doc + k + g) % 3 == 1  (see granule_values)
_MP3_REAL_AUDIO_SQL = """
WITH fg AS (
  SELECT d.doc_id, i.i, gg.g, 12 + (d.doc_id + i.i + gg.g) % 8 AS bv
  FROM documents d
  JOIN range(0, 9) AS i(i) ON i.i < 4 + d.doc_id % 5
  CROSS JOIN (SELECT unnest([0, 1]) AS g) gg
), agg AS (
  SELECT fg.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN (fg.doc_id + k.k + fg.g) % 3 <> 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero_lines
  FROM fg JOIN range(0, 40) AS k(k) ON k.k < 2 * fg.bv
  GROUP BY fg.doc_id
)
SELECT d.doc_id,
       4 + d.doc_id % 5 AS frame_count,
       CASE d.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
            ELSE 32000 END AS sample_rate,
       (4 + d.doc_id % 5) * 1152 * 1000
         // (CASE d.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
             ELSE 32000 END) AS duration_ms,
       agg.n_lines, agg.n_nonzero_lines
FROM documents d JOIN agg ON agg.doc_id = d.doc_id
"""


class _RtfTextStage:
    """Actor-pool stage: wrap each document's text in a real RTF file
    (font/color tables, info destination, styled runs, \\uN escapes for
    non-ASCII) and extract it back with the from-scratch RTF engine —
    lossless text roundtrip → SQL identity oracle."""

    def __init__(self) -> None:
        from ..stages.rtf_text import RtfTextEngine, make_rtf

        self.engine = RtfTextEngine()
        self.make = make_rtf

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = [
            self.engine.extract("", self.make(str(t)), "rtf").text
            for t in df["text"]
        ]
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "text": texts}
        )


def rtf_real_text(sf_dir: str) -> rd.Dataset:
    """Real end-to-end RTF text extraction: the one mainstream legacy
    document format past the reference's pdf/docx list (config.py:118),
    parsed from the public RTF spec — groups, destinations, control
    words, cp1252/unicode escapes."""
    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(
            _RtfTextStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_RTF_REAL_TEXT_SQL = """
SELECT doc_id, text FROM documents
"""


class _VttMetaStage:
    """Actor-pool stage: build a WebVTT track per document (1 + doc_id%4
    cues; odd docs carry <v>/<i> cue markup the parser must strip; a NOTE
    block decoy), extract cue text + duration with the subtitle engine."""

    def __init__(self) -> None:
        from ..stages.vtt_text import SubtitleTextEngine, make_vtt

        self.engine = SubtitleTextEngine()
        self.make = make_vtt

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_cues, dur, texts = [], [], []
        for d in df["doc_id"]:
            d = int(d)
            n = 1 + d % 4
            cues = [
                (i * 2000, i * 2000 + 1500 + d % 500, f"cue {d} {i}")
                for i in range(n)
            ]
            res = self.engine.extract("", self.make(cues, styled=bool(d % 2)), "vtt")
            n_cues.append(int(res.metadata["n_cues"]))
            dur.append(int(res.metadata["duration_ms"]))
            texts.append(res.text)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_cues": pd.Series(n_cues, dtype="int64"),
                "duration_ms": pd.Series(dur, dtype="int64"),
                "text": texts,
            }
        )


def vtt_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end WebVTT extraction: cue timing parse, markup strip,
    NOTE-block skip — the text side of web video beside mp4_real_meta's
    container side."""
    return _docs(sf_dir).map_batches(
        _VttMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_VTT_REAL_META_SQL = """
SELECT doc_id,
       1 + doc_id % 4 AS n_cues,
       (doc_id % 4) * 2000 + 1500 + doc_id % 500 AS duration_ms,
       'cue ' || doc_id || ' 0'
         || CASE WHEN doc_id % 4 >= 1
                 THEN chr(10) || 'cue ' || doc_id || ' 1' ELSE '' END
         || CASE WHEN doc_id % 4 >= 2
                 THEN chr(10) || 'cue ' || doc_id || ' 2' ELSE '' END
         || CASE WHEN doc_id % 4 >= 3
                 THEN chr(10) || 'cue ' || doc_id || ' 3' ELSE '' END
         AS text
FROM documents
"""


class _AvifMetaStage:
    """Actor-pool stage: build a valid AVIF/HEIF shell per document (brand
    alternates avif/heic; ispe geometry from doc_id) and parse the meta
    item tree back with the real box-walk engine."""

    def __init__(self) -> None:
        from ..stages.mp4_boxes import AvifImageEngine, make_avif

        self.engine = AvifImageEngine()
        self.make = make_avif

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        brands, w, h = [], [], []
        for d in df["doc_id"]:
            d = int(d)
            brand = b"avif" if d % 2 == 0 else b"heic"
            payload = self.make(64 + d % 512, 48 + d % 256, brand)
            res = self.engine.extract("", payload, "avif")
            brands.append(res.metadata["major_brand"])
            w.append(int(res.metadata["width"]))
            h.append(int(res.metadata["height"]))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "major_brand": brands,
                "width": pd.Series(w, dtype="int64"),
                "height": pd.Series(h, dtype="int64"),
            }
        )


def avif_real_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end AVIF/HEIF geometry: meta/iprp/ipco/ispe item-tree
    walk — the modern still-image container beside the raster decoders;
    AV1/HEVC pixels = the documented external-codec seam."""
    return _docs(sf_dir).map_batches(
        _AvifMetaStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_AVIF_REAL_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS major_brand,
       64 + doc_id % 512 AS width,
       48 + doc_id % 256 AS height
FROM documents
"""


class _EpubTextStage:
    """Actor-pool stage: wrap each document in a valid two-chapter EPUB
    (chapter 1 = the document text, chapter 2 derived from doc_id; nav
    decoy excluded by linear="no") and extract it back through the zip
    route's OOXML engine — the chapters come back as pages joined with
    the byte-exact separator."""

    def __init__(self) -> None:
        from ..stages.epub_text import make_epub
        from ..stages.ooxml_text import OoxmlTextEngine

        self.engine = OoxmlTextEngine()
        self.make = make_epub

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        titles, pages, texts = [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            d = int(d)
            payload = self.make(
                f"Doc {d}", [[str(t)], [f"chapter two of {d}"]]
            )
            res = self.engine.extract("", payload, "zip")
            titles.append(res.metadata["title"])
            pages.append(res.page_count)
            texts.append(res.text)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "title": titles,
                "page_count": pd.Series(pages, dtype="int64"),
                "text": texts,
            }
        )


def epub_real_text(sf_dir: str) -> rd.Dataset:
    """Real end-to-end EPUB extraction: OCF container walk → OPF spine →
    XHTML chapter text, through the same zip route as OOXML. Completes
    the document family (pdf / docx / pptx / xlsx / rtf / epub)."""
    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(
            _EpubTextStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
    )


_EPUB_REAL_TEXT_SQL = """
SELECT doc_id,
       'Doc ' || doc_id AS title,
       2 AS page_count,
       text || chr(10) || chr(10) || '---' || chr(10) || chr(10)
            || 'chapter two of ' || doc_id AS text
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


# --------------------------------------------------------------------------
# Perceptual-hash (aHash) image dedup over REAL decoded pixels
# --------------------------------------------------------------------------

AHASH_CLASSES = 8


def ahash64(px: "np.ndarray") -> int:
    """Average hash: grey, block-mean downsample to ≤8×8 covering EVERY
    pixel (uneven block edges pool proportionally — no cropping), bit =
    block mean strictly above the global mean — the classic perceptual
    near-dup key."""
    import numpy as np

    if px.ndim == 3:
        px = px.mean(axis=2)
    h, w = px.shape
    nh, nw = min(8, h), min(8, w)
    # row/col → block index maps; averaging matrices pool all pixels
    ri = (np.arange(h) * nh) // h
    ci = (np.arange(w) * nw) // w
    R = np.zeros((nh, h))
    R[ri, np.arange(h)] = 1.0
    R /= R.sum(axis=1, keepdims=True)
    C = np.zeros((w, nw))
    C[np.arange(w), ci] = 1.0
    C /= C.sum(axis=0, keepdims=True)
    small = R @ px.astype("float64") @ C
    bits = (small > small.mean()).astype(np.uint8).flatten()
    bits = np.pad(bits, (0, 64 - len(bits)))
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


PHASH_CLASSES = 8


def phash64(px: "np.ndarray") -> int:
    """DCT perceptual hash (the standard pHash): grey, block-mean resize to
    32×32 (same every-pixel pooling as ahash64), 2-D DCT-II, keep the
    top-left 8×8 low-frequency block, bit = coefficient strictly above the
    median of the 63 AC values (DC excluded — it only encodes global
    brightness). Robust to rescaling and mild blur where aHash is not;
    the two hashes together are the classic near-dup key pair."""
    import numpy as np

    if px.ndim == 3:
        px = px.mean(axis=2)
    h, w = px.shape
    # every-pixel pooling resize to exactly 32×32 (pad small images by
    # pooling maps — same construction as ahash64, fixed target size)
    n = 32
    ri = (np.arange(h) * min(n, h)) // h
    ci = (np.arange(w) * min(n, w)) // w
    R = np.zeros((min(n, h), h))
    R[ri, np.arange(h)] = 1.0
    R /= R.sum(axis=1, keepdims=True)
    C = np.zeros((w, min(n, w)))
    C[np.arange(w), ci] = 1.0
    C /= C.sum(axis=0, keepdims=True)
    small = R @ px.astype("float64") @ C
    if small.shape != (n, n):  # small inputs: tile up to 32 (deterministic)
        small = np.pad(
            small,
            ((0, n - small.shape[0]), (0, n - small.shape[1])),
            mode="edge",
        )
    # orthonormal DCT-II matrix
    k = np.arange(n)[:, None]
    D = np.cos(np.pi * (2 * np.arange(n)[None, :] + 1) * k / (2 * n))
    D[0] *= 1 / np.sqrt(2)
    D *= np.sqrt(2 / n)
    F = D @ small @ D.T
    block = F[:8, :8].flatten()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint8)
    bits[0] = 0  # DC excluded
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


class _PngAHashStage:
    """Actor-pool stage: real PNG decode → perceptual hash, one engine per
    actor. Emits only the slim (doc_id, ahash) rows — pixels never leave
    the worker."""

    def __init__(self) -> None:
        from ..stages.png_decode import decode_png

        self.decode = decode_png

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        hashes = [ahash64(self.decode(bytes(p))) for p in df["png"]]
        # two's-complement into int64 so every block carries one fixed dtype
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "ahash": np.array(hashes, dtype=np.uint64).view(np.int64),
            }
        )


def image_ahash_dupes(sf_dir: str) -> rd.Dataset:
    """Perceptual image dedup: synthesize a valid PNG per document whose
    pattern is a pure function of doc_id % AHASH_CLASSES (first c columns
    white — the 8 classes have pairwise-distinct aHashes), decode with the
    REAL from-scratch PNG decoder in an actor pool, aHash the pixels, and
    assign every image to its group keeper (min doc_id sharing the hash);
    the assignment streams (per-doc output never collects on the driver).
    Scale shape: the pixel work stays in the actor pool and only slim
    (doc_id, ahash) rows move; the keeper table is bounded by the number of
    DISTINCT hashes (image classes), so it broadcasts; the per-image keeper
    assignment is worker-local. The SQL oracle holds because hash classes ==
    synthesis classes (asserted pairwise-distinct in tests)."""
    import numpy as np
    import ray

    from ..functions.agg import grouped_aggregate
    from ..stages.png_decode import make_png

    def with_png(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        pngs = []
        for d in df["doc_id"]:
            c = int(d) % AHASH_CLASSES
            px = np.zeros((8, 8), dtype=np.uint8)
            px[:, :c] = 255
            pngs.append(make_png(px))
        df["png"] = pngs
        return df

    slim = (
        _docs(sf_dir)
        .map_batches(with_png, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _PngAHashStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
        .materialize()
    )
    keepers = grouped_aggregate(
        slim, ["ahash"], {"keeper": ("doc_id", "min")}
    ).to_pandas()  # bounded by the distinct-hash count
    ref = ray.put(dict(zip(keepers["ahash"], keepers["keeper"])))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "keeper": df["ahash"].map(m).astype("int64"),
            }
        )

    return slim.map_batches(assign, batch_format="pandas")


# doc_ids are contiguous from 0, so the min doc_id of class c is c itself
_IMAGE_AHASH_DUPES_SQL = f"""
SELECT doc_id, CAST(doc_id % {AHASH_CLASSES} AS BIGINT) AS keeper
FROM documents ORDER BY doc_id
"""


class _GifAnimStage:
    """Actor-pool stage: synthesize an animated GIF per doc (frame count /
    delays / size / per-frame values all pure residue functions), decode
    ALL frames with the real multi-frame walk (GCE parse, LZW per frame,
    compositing), emit typed animation metadata."""

    def __init__(self) -> None:
        import numpy as np

        from ..stages.image_formats import decode_gif_frames, make_gif_anim

        self.np = np
        self.dec = decode_gif_frames
        self.enc = make_gif_anim

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        np = self.np
        rows = []
        for x in df["doc_id"]:
            d = int(x)
            n = 2 + d % 4
            cs = 3 + d % 7
            h, w = 6 + d % 3, 8 + d % 5
            frames = [
                np.full((h, w), (d + 17 * i) % 256, dtype=np.uint8)
                for i in range(n)
            ]
            blob = self.enc(frames, [cs] * n)
            decoded, delays = self.dec(blob)
            rows.append(
                (
                    d,
                    len(decoded),
                    int(sum(delays)),
                    decoded[0].shape[1],
                    decoded[0].shape[0],
                    int(decoded[-1].mean()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "n_frames", "total_cs", "width", "height",
                     "last_mean"],
        ).astype("int64")


def gif_anim_meta(sf_dir: str) -> rd.Dataset:
    """Real end-to-end ANIMATED GIF decode: frame count, total duration,
    screen dims and the final composited frame's brightness — the metadata
    a video-ish sampler needs before frame extraction. Every field is a
    pure residue function, so the oracle is plain SQL while the pixels
    travel through genuine multi-frame LZW streams."""
    return _docs(sf_dir).map_batches(
        _GifAnimStage,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=_media_concurrency(),
    )


_GIF_ANIM_META_SQL = """
SELECT doc_id,
       CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
       CAST((2 + doc_id % 4) * (3 + doc_id % 7) AS BIGINT) AS total_cs,
       CAST(8 + doc_id % 5 AS BIGINT) AS width,
       CAST(6 + doc_id % 3 AS BIGINT) AS height,
       CAST((doc_id + 17 * (1 + doc_id % 4)) % 256 AS BIGINT) AS last_mean
FROM documents
"""


class _PngPHashStage:
    """Actor-pool stage: real PNG decode → DCT perceptual hash; slim
    (doc_id, phash) rows out, pixels never leave the worker."""

    def __init__(self) -> None:
        from ..stages.png_decode import decode_png

        self.decode = decode_png

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        hashes = [phash64(self.decode(bytes(p))) for p in df["png"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "phash": np.array(hashes, dtype=np.uint64).view(np.int64),
            }
        )


def image_phash_dupes(sf_dir: str) -> rd.Dataset:
    """DCT-perceptual-hash image dedup — the frequency-domain companion to
    ``image_ahash_dupes`` (pHash survives rescaling/mild blur where the
    spatial average hash flips bits). Same topology: per-doc 32×32 PNG
    whose pattern class is doc_id % {n} (left bar width per class —
    pairwise-distinct pHashes, asserted in tests), REAL PNG decode + hash
    in the actor pool, bounded keeper table broadcast back over the slim
    hash stream."""
    import numpy as np
    import ray

    from ..functions.agg import grouped_aggregate
    from ..stages.png_decode import make_png

    def with_png(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        pngs = []
        for d in df["doc_id"]:
            c = int(d) % PHASH_CLASSES
            px = np.zeros((32, 32), dtype=np.uint8)
            px[:, : 4 * (c + 1)] = 255
            pngs.append(make_png(px))
        df["png"] = pngs
        return df

    slim = (
        _docs(sf_dir)
        .map_batches(with_png, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE)
        .map_batches(
            _PngPHashStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
        .materialize()
    )
    keepers = grouped_aggregate(
        slim, ["phash"], {"keeper": ("doc_id", "min")}
    ).to_pandas()
    ref = ray.put(dict(zip(keepers["phash"], keepers["keeper"])))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "keeper": df["phash"].map(m).astype("int64"),
            }
        )

    return slim.map_batches(assign, batch_format="pandas")


image_phash_dupes.__doc__ = image_phash_dupes.__doc__.format(n=PHASH_CLASSES)

_IMAGE_PHASH_DUPES_SQL = f"""
SELECT doc_id, CAST(doc_id % {PHASH_CLASSES} AS BIGINT) AS keeper
FROM documents ORDER BY doc_id
"""


def image_thumbnails(sf_dir: str) -> rd.Dataset:
    """Real thumbnail pipeline — decode (from-scratch PNG) → exact
    area-mean resize into an 8×8 box, aspect preserved → PNG re-encode —
    the reference design doc's companion service to OCR (design.md:9
    cites its 50–130 ms latency envelope as the OCR comparison point).

    Input images are constant-pixel PNGs (dims and value pure functions
    of doc_id, like ``png_real_meta``), so every emitted field — dims,
    thumb dims (the IEEE scale formula mirrored verbatim), brightness
    (resize of a constant is the constant) — is SQL-predictable; the
    resize kernel's non-constant behavior is pinned separately by the
    gradient parity test in tests/test_media.py. The re-encoded
    ``thumb_png`` column is dropped before comparison (zlib bytes are
    deterministic but not SQL-derivable); its validity is asserted by the
    decode-roundtrip test."""
    import numpy as np

    from ..stages.media import ImageThumbnailStage
    from ..stages.png_decode import make_png

    def with_png(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["png"] = [
            make_png(
                np.full(
                    (9 + int(d) % 21, 9 + int(d) % 13),
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
            ImageThumbnailStage,
            batch_format="pandas",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=_media_concurrency(),
        )
        .map_batches(
            lambda df: df[
                ["doc_id", "width", "height", "thumb_w", "thumb_h", "thumb_brightness"]
            ],
            batch_format="pandas",
        )
    )


_IMAGE_THUMBNAILS_SQL = """
WITH dims AS (
  SELECT doc_id,
         9 + doc_id % 13 AS width,
         9 + doc_id % 21 AS height
  FROM documents
)
SELECT doc_id, width, height,
       GREATEST(1, CAST(FLOOR(width  * LEAST(8.0 / height, 8.0 / width)) AS BIGINT)) AS thumb_w,
       GREATEST(1, CAST(FLOOR(height * LEAST(8.0 / height, 8.0 / width)) AS BIGINT)) AS thumb_h,
       doc_id % 256 AS thumb_brightness
FROM dims
"""


def exif_gps_scrub(sf_dir: str) -> rd.Dataset:
    """Image privacy scrub — the GPS-stripping pass a training-data
    pipeline runs over user-uploaded photos before anything else touches
    them: JPEGs with EXIF GPS coordinates (every third doc here, lat/lon
    derived from doc_id, byte order alternating II/MM) get their APP1
    rebuilt without the GPS IFD (`stages/exif.py:scrub_exif_gps`); camera
    tags survive, coordinates do not. The output re-PARSES the scrubbed
    payload, so the oracle checks the scrub through the parser, not
    through bookkeeping. Per-row transform in an actor-style batch map —
    payloads never shuffle."""
    from ..stages.exif import insert_exif, make_exif_app1, parse_exif, scrub_exif_gps
    from ..stages.jpeg_decode import make_jpeg

    def run(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        rows = []
        for x in df["doc_id"]:
            d = int(x)
            gps = (
                (round(-60 + (d % 120) + 0.25, 6), round(-150 + (d % 300) + 0.5, 6))
                if d % 3 == 0
                else None
            )
            app1 = make_exif_app1(
                orientation=1 + d % 8,
                make=f"cam{d % 5}",
                big_endian=bool(d % 2),
                gps=gps,
            )
            jpg = insert_exif(
                make_jpeg(np.full((4 + d % 5, 8 + d % 7), 64, dtype=np.uint8)),
                app1,
            )
            clean, had = scrub_exif_gps(jpg)
            meta = parse_exif(clean)
            rows.append(
                {
                    "doc_id": d,
                    "had_gps": int(had),
                    "gps_after": int(
                        meta["gps_lat"] is not None or meta["gps_lon"] is not None
                    ),
                    "make": meta["make"],
                    "orientation": int(meta["orientation"]),
                }
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "had_gps", "gps_after", "make", "orientation"]
        ).astype({"doc_id": "int64", "had_gps": "int64", "gps_after": "int64",
                  "orientation": "int64"})

    return _docs(sf_dir).map_batches(
        run, batch_format="pandas", batch_size=MEDIA_BATCH_SIZE
    )


_EXIF_GPS_SCRUB_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS had_gps,
       CAST(0 AS BIGINT) AS gps_after,
       'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
       CAST(1 + doc_id % 8 AS BIGINT) AS orientation
FROM documents ORDER BY doc_id
"""


QUERIES: dict[str, Callable[[str], object]] = {
    "exif_gps_scrub": exif_gps_scrub,
    "image_thumbnails": image_thumbnails,
    "audio_meta": audio_meta,
    "video_meta": video_meta,
    "png_real_meta": png_real_meta,
    "jpeg_real_meta": jpeg_real_meta,
    "jpeg_progressive_real_meta": jpeg_progressive_real_meta,
    "jpeg_exif_meta": jpeg_exif_meta,
    "bmp_real_meta": bmp_real_meta,
    "gif_real_meta": gif_real_meta,
    "tiff_real_meta": tiff_real_meta,
    "webp_real_meta": webp_real_meta,
    "webp_lossy_meta": webp_lossy_meta,
    "docx_real_text": docx_real_text,
    "ooxml_real_meta": ooxml_real_meta,
    "doc_legacy_real_text": doc_legacy_real_text,
    "svg_real_meta": svg_real_meta,
    "ico_real_meta": ico_real_meta,
    "flac_real_meta": flac_real_meta,
    "mp4_real_meta": mp4_real_meta,
    "mp3_real_audio": mp3_real_audio,
    "rtf_real_text": rtf_real_text,
    "vtt_real_meta": vtt_real_meta,
    "epub_real_text": epub_real_text,
    "avif_real_meta": avif_real_meta,
    "pdf_real_text": pdf_real_text,
    "image_ahash_dupes": image_ahash_dupes,
    "image_phash_dupes": image_phash_dupes,
    "gif_anim_meta": gif_anim_meta,
}
ORACLES: dict[str, str] = {
    "exif_gps_scrub": _EXIF_GPS_SCRUB_SQL,
    "image_thumbnails": _IMAGE_THUMBNAILS_SQL,
    "audio_meta": _AUDIO_META_SQL,
    "video_meta": _VIDEO_META_SQL,
    "png_real_meta": _PNG_REAL_META_SQL,
    "jpeg_real_meta": _JPEG_REAL_META_SQL,
    "jpeg_progressive_real_meta": _JPEG_REAL_META_SQL,
    "jpeg_exif_meta": _JPEG_EXIF_META_SQL,
    "bmp_real_meta": _BMP_REAL_META_SQL,
    "gif_real_meta": _GIF_REAL_META_SQL,
    "tiff_real_meta": _TIFF_REAL_META_SQL,
    "webp_real_meta": _WEBP_REAL_META_SQL,
    "webp_lossy_meta": _WEBP_LOSSY_META_SQL,
    "docx_real_text": _DOCX_REAL_TEXT_SQL,
    "ooxml_real_meta": _OOXML_REAL_META_SQL,
    "doc_legacy_real_text": _DOC_LEGACY_REAL_TEXT_SQL,
    "svg_real_meta": _SVG_REAL_META_SQL,
    "ico_real_meta": _ICO_REAL_META_SQL,
    "flac_real_meta": _FLAC_REAL_META_SQL,
    "mp4_real_meta": _MP4_REAL_META_SQL,
    "mp3_real_audio": _MP3_REAL_AUDIO_SQL,
    "rtf_real_text": _RTF_REAL_TEXT_SQL,
    "vtt_real_meta": _VTT_REAL_META_SQL,
    "epub_real_text": _EPUB_REAL_TEXT_SQL,
    "avif_real_meta": _AVIF_REAL_META_SQL,
    "pdf_real_text": _PDF_REAL_TEXT_SQL,
    "image_ahash_dupes": _IMAGE_AHASH_DUPES_SQL,
    "image_phash_dupes": _IMAGE_PHASH_DUPES_SQL,
    "gif_anim_meta": _GIF_ANIM_META_SQL,
}

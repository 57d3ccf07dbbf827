"""Extraction engines + plugin registry.

Mirrors the reference's engine surface — ``BaseOCREngine`` adapters created
through ``OCREngineFactory`` (/root/reference/src/simple_ocr/adapters/base.py:22-92,
factory.py:16-136) — restated for columnar execution: an engine is a plain
class with an ``extract(url, payload, content_type) -> EngineResult`` method;
engines are instantiated ONCE per map_batches actor (in ``ExtractStage.__init__``)
and invoked per row within a batch. Errors raised by an engine become FAILED
rows, never failed tasks (ocr_service.py:173-207 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from .. import PIN_PROCESSED_AT
from ..reference_semantics import (
    CONTENT_TYPE_TO_MIME,
    estimate_page_count,
    mock_markdown,
)
from .html_extractor import HtmlMainContentExtractor


@dataclass
class EngineResult:
    """Per-document engine output — the columnar OCRResponse
    (/root/reference/src/simple_ocr/adapters/base.py:9-19)."""

    text: str
    page_count: int = 1
    spans: list[dict] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


class UnsupportedTypeError(ValueError):
    """Raised for payloads no engine supports
    (deepseek_engine.py:257-263 semantics)."""


class MockEngine:
    """Deterministic mock extraction — byte-identical to the reference's
    MockOCREngine output (mock_engine.py:143-208) with the timestamp pinned.

    ``fail_rate``-style injected failures are supported via ``fail_every``
    (deterministic: every Nth call raises), used by failure-containment tests.
    """

    name = "mock"

    def __init__(self, processed_at: str = PIN_PROCESSED_AT, fail_every: int = 0) -> None:
        self.processed_at = processed_at
        self.fail_every = fail_every
        self.process_count = 0

    def extract(self, url: str, payload: bytes, content_type: str) -> EngineResult:
        self.process_count += 1
        if self.fail_every and self.process_count % self.fail_every == 0:
            raise RuntimeError(f"Mock simulated failure (fail_every={self.fail_every})")
        mime = CONTENT_TYPE_TO_MIME.get(content_type, "application/octet-stream")
        size = len(payload)
        if content_type == "pdf":
            pages = estimate_page_count(mime, size)
            text = mock_markdown("document", mime, size, pages, self.processed_at)
        else:
            pages = 1
            text = mock_markdown("image", mime, size, 1, self.processed_at)
        return EngineResult(
            text=text,
            page_count=pages,
            metadata={
                "engine": "mock",
                "mime_type": mime,
                "size_bytes": str(size),
                "page_count": str(pages),
                "processed_at": self.processed_at,
            },
        )


class HtmlEngine:
    """DOM boilerplate strip + readability heuristic over the ``html`` payload
    (the north-star replacement for the reference's raster OCR engines)."""

    name = "html-main-content"

    def __init__(self, processed_at: str = PIN_PROCESSED_AT, **extractor_kwargs: Any) -> None:
        self.processed_at = processed_at
        self._extractor = HtmlMainContentExtractor(**extractor_kwargs)

    def extract(self, url: str, payload: bytes, content_type: str) -> EngineResult:
        from .charset import decode_html

        # charset-sniffed decode (BOM → transport header → meta prescan →
        # UTF-8 trial → cp1252): the crawled web is very far from all-UTF-8
        text, spans = self._extractor.extract(decode_html(payload, content_type))
        return EngineResult(
            text=text,
            page_count=1,
            spans=spans,
            metadata={
                "engine": self.name,
                "mime_type": "text/html",
                "size_bytes": str(len(payload)),
                "page_count": "1",
                "processed_at": self.processed_at,
            },
        )


class ImageDecodeEngine:
    """Multimodal stub: typed plumbing for image decode / feature extraction.

    The real decode would use PIL (reference: deepseek_engine.py:213-234);
    image libraries are not available in this container, so the decode is a
    clearly-marked deterministic fake (pure function of the payload) unless
    ``strict=True``, in which case it raises NotImplementedError. The Ray-side
    plumbing — binary column in, typed metadata out, actor-pool stage — is real
    and tested.
    """

    name = "image-decode-stub"
    #: opts into per-row job hints (spec.md:181-186): a ``resolution`` hint
    #: caps the decode target the way the real engine would resize to
    #: resolution×resolution (reference default 640 applies to the raster
    #: path only — without a hint the stub keeps its size-derived dims so
    #: the no-hints output is unchanged).
    accepts_hints = True

    def __init__(self, processed_at: str = PIN_PROCESSED_AT, strict: bool = False) -> None:
        self.processed_at = processed_at
        self.strict = strict

    def extract(
        self,
        url: str,
        payload: bytes,
        content_type: str,
        hints: dict[str, str] | None = None,
    ) -> EngineResult:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL; not available in this environment"
            )
        size = len(payload)
        # Deterministic fake dimensions derived from payload size.
        width = 64 + (size % 1024)
        height = 64 + ((size // 2) % 1024)
        if hints and "resolution" in hints:
            try:
                res = int(hints["resolution"])
                width, height = min(width, res), min(height, res)
            except ValueError:
                pass  # unknown hint values are ignored, never a failure
        return EngineResult(
            text="",
            page_count=1,
            metadata={
                "engine": self.name,
                "mime_type": CONTENT_TYPE_TO_MIME.get(content_type, "application/octet-stream"),
                "size_bytes": str(size),
                "page_count": "1",
                "processed_at": self.processed_at,
                "width": str(width),
                "height": str(height),
            },
        )


# --------------------------------------------------------------------------
# Registry — the user-extension surface, mirroring
# OCREngineFactory.register_engine (factory.py:101-126).
# --------------------------------------------------------------------------

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_engine(name: str, factory: Callable[..., Any]) -> None:
    """Register an engine factory (class or callable returning an object with
    an ``extract(url, payload, content_type)`` method)."""
    if not callable(factory):
        raise TypeError(f"engine factory for {name!r} must be callable")
    _REGISTRY[name] = factory


def create_engine(name: str, **config: Any) -> Any:
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown engine: {name!r}. Available: {sorted(_REGISTRY)}"
        ) from None
    engine = factory(**config)
    if not hasattr(engine, "extract"):
        raise TypeError(f"engine {name!r} does not implement extract()")
    return engine


def list_engines() -> list[str]:
    return sorted(_REGISTRY)


class RemoteHttpEngine:
    """Parity stub for the reference's remote-inference engine
    (VLLMRemoteEngine, /root/reference/src/simple_ocr/adapters/vllm_remote_engine.py:16-300):
    an actor holding a persistent HTTP session, one request per document.

    This sandbox has no network, so calls raise NotImplementedError; the
    actor-pool shape (session built once per actor in __init__, concurrency
    sized to server capacity) is what a real deployment would reuse.
    """

    name = "remote-http"

    def __init__(self, endpoint: str = "http://localhost:8000/v1", timeout_s: float = 120.0) -> None:
        self.endpoint = endpoint
        self.timeout_s = timeout_s
        self._session = None  # would be a pooled HTTP client, built once

    def extract(self, url: str, payload: bytes, content_type: str) -> EngineResult:
        raise NotImplementedError(
            f"remote inference endpoint {self.endpoint} not reachable in this environment"
        )


def _pdf_text_factory(**kwargs: Any) -> Any:
    # late import: pdf_text imports EngineResult from this module
    from .pdf_text import PdfTextEngine

    return PdfTextEngine(**kwargs)


def _png_decode_factory(**kwargs: Any) -> Any:
    from .png_decode import PngImageEngine

    return PngImageEngine(**kwargs)


def _jpeg_decode_factory(**kwargs: Any) -> Any:
    from .jpeg_decode import JpegImageEngine

    return JpegImageEngine(**kwargs)


def _bmp_decode_factory(**kwargs: Any) -> Any:
    from .image_formats import BmpImageEngine

    return BmpImageEngine(**kwargs)


def _gif_decode_factory(**kwargs: Any) -> Any:
    from .image_formats import GifImageEngine

    return GifImageEngine(**kwargs)


def _tiff_decode_factory(**kwargs: Any) -> Any:
    from .image_formats import TiffImageEngine

    return TiffImageEngine(**kwargs)


def _webp_decode_factory(**kwargs: Any) -> Any:
    from .webp_decode import WebpImageEngine

    return WebpImageEngine(**kwargs)


def _ooxml_text_factory(**kwargs: Any) -> Any:
    from .ooxml_text import OoxmlTextEngine

    return OoxmlTextEngine(**kwargs)


def _doc_legacy_factory(**kwargs: Any) -> Any:
    from .doc_legacy import DocLegacyTextEngine

    return DocLegacyTextEngine(**kwargs)


def _svg_text_factory(**kwargs: Any) -> Any:
    from .svg_text import SvgTextEngine

    return SvgTextEngine(**kwargs)


def _ico_decode_factory(**kwargs: Any) -> Any:
    from .image_formats import IcoImageEngine

    return IcoImageEngine(**kwargs)


def _mp4_meta_factory(**kwargs: Any) -> Any:
    from .mp4_boxes import Mp4VideoEngine

    return Mp4VideoEngine(**kwargs)


def _mp3_meta_factory(**kwargs: Any) -> Any:
    from .mp3_frames import Mp3AudioEngine

    return Mp3AudioEngine(**kwargs)


def _rtf_text_factory(**kwargs: Any) -> Any:
    from .rtf_text import RtfTextEngine

    return RtfTextEngine(**kwargs)


def _subtitle_text_factory(**kwargs: Any) -> Any:
    from .vtt_text import SubtitleTextEngine

    return SubtitleTextEngine(**kwargs)


register_engine("mock", MockEngine)
register_engine("remote-http", RemoteHttpEngine)
register_engine("html-main-content", HtmlEngine)
register_engine("image-decode-stub", ImageDecodeEngine)
register_engine("pdf-text", _pdf_text_factory)
register_engine("png-decode", _png_decode_factory)
register_engine("jpeg-decode", _jpeg_decode_factory)
register_engine("bmp-decode", _bmp_decode_factory)
register_engine("gif-decode", _gif_decode_factory)
register_engine("tiff-decode", _tiff_decode_factory)
register_engine("webp-decode", _webp_decode_factory)
register_engine("ooxml-text", _ooxml_text_factory)
register_engine("doc-text", _doc_legacy_factory)
register_engine("svg-text", _svg_text_factory)
register_engine("ico-decode", _ico_decode_factory)
register_engine("mp4-meta", _mp4_meta_factory)
register_engine("mp3-meta", _mp3_meta_factory)
register_engine("rtf-text", _rtf_text_factory)
register_engine("subtitle-text", _subtitle_text_factory)


def _avif_meta_factory(**kwargs: Any) -> Any:
    from .mp4_boxes import AvifImageEngine

    return AvifImageEngine(**kwargs)


register_engine("avif-meta", _avif_meta_factory)


def _gzip_transparent_factory(**kwargs: Any) -> Any:
    from .gzip_transparent import GzipTransparentEngine

    return GzipTransparentEngine(**kwargs)


register_engine("gzip-transparent", _gzip_transparent_factory)

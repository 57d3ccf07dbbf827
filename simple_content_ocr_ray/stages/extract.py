"""The extraction map_batches stage: route by content_type, run the matching
engine per row, emit the ``extracted`` output table with per-row error
containment (failed ROWS, not failed tasks — ocr_service.py:173-207).

Designed for ``ds.map_batches(ExtractStage, batch_format="pyarrow",
concurrency=(min,max), batch_size=B)``: engines (which may hold heavy state —
compiled rules, models) are built ONCE per actor in ``__init__`` and reused
across batches, mirroring the reference's lazy one-time model load
(deepseek_engine.py:49-74).
"""

from __future__ import annotations

import time
from typing import Any, Optional

import pyarrow as pa

from .. import PIN_PROCESSED_AT
from ..reference_semantics import CONTENT_TYPE_TO_MIME, IMAGE_TYPES
from .engines import UnsupportedTypeError, create_engine

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

METADATA_TYPE = pa.struct(
    [
        ("engine", pa.string()),
        ("mime_type", pa.string()),
        ("size_bytes", pa.string()),
        ("page_count", pa.string()),
        ("processed_at", pa.string()),
        # typed sidecar fields for multimodal engines (empty for text engines)
        ("width", pa.string()),
        ("height", pa.string()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),
        ("text", pa.string()),
        ("spans", SPAN_TYPE),
        ("page_count", pa.int32()),
        ("content_type", pa.string()),
        ("error", pa.string()),
        ("processing_time_ms", pa.int64()),
        ("metadata", METADATA_TYPE),
    ]
)

#: default content_type → engine-name routing (M1/M4 restated: the reference
#: routes image MIME → process_image, document MIME → process_document).
#: The mock pdf/image engines reproduce the reference MockOCREngine output
#: byte-exactly; the REAL decoders are the ``REAL_ROUTE`` preset below.
DEFAULT_ROUTE: dict[str, str] = {"html": "html-main-content", "pdf": "mock"}
DEFAULT_ROUTE.update({t: "mock" for t in IMAGE_TYPES})

#: real-decoder routing (the reference always runs a real engine per route —
#: ocr_service.py:83-108): from-scratch PDF text extraction plus real
#: PNG / JPEG (baseline + progressive) / BMP / GIF(LZW) / uncompressed-TIFF /
#: WebP (lossless VP8L + lossy VP8 key frames) / SVG / ICO / AVIF-geometry
#: decoders, OOXML+EPUB text via the zip route, RTF, WebVTT/SRT subtitles,
#: MP4 container metadata, and transparent bomb-guarded gzip. Remaining
#: documented seams: VP8 normative default probability tables, AV1/HEVC
#: pixel decode, lossy audio — such payloads become failed rows.
REAL_ROUTE: dict[str, str] = {
    "html": "html-main-content",
    "pdf": "pdf-text",
    "png": "png-decode",
    "jpeg": "jpeg-decode",
    "bmp": "bmp-decode",
    "gif": "gif-decode",
    "tiff": "tiff-decode",
    "webp": "webp-decode",
    # OOXML text runs (docx/pptx/xlsx) — the reference lists these types
    # but stubs them to errors (config.py:118, ocr_service.py:234-242);
    # extracting the runs exceeds that honestly. Non-OOXML zips fail as
    # rows at the engine's documented seam.
    "zip": "ooxml-text",
    # legacy Word 97 .doc via the OLE2/CFB route (r4s9, stages/doc_legacy.py);
    # non-Word compound files fail as rows at the engine's documented seam
    "cfb": "doc-text",
    # vector + icon formats the reference does not list (config.py:113-120
    # stops at raster images) — real engines here, failed rows on the
    # mock-parity DEFAULT_ROUTE, same exceed-honestly policy as OOXML.
    "svg": "svg-text",
    "ico": "ico-decode",
    "mp4": "mp4-meta",
    "mp3": "mp3-meta",
    "rtf": "rtf-text",
    "vtt": "subtitle-text",
    "srt": "subtitle-text",
    "avif": "avif-meta",
    # transparent decompression: gunzip (bomb-guarded) → re-sniff →
    # dispatch to the inner type's engine from this same table
    "gzip": "gzip-transparent",
}
REAL_ROUTE.update(
    {t: "image-decode-stub" for t in IMAGE_TYPES if t not in REAL_ROUTE}
)

class PayloadTooLargeError(Exception):
    """Admission cap: the reference DECLARES max_image_size (10 MB,
    config.py:105-108) but never enforces it; here an over-limit payload
    becomes a failed ROW before any engine touches it — at crawl scale an
    unbounded payload is the classic actor-stall vector (a corrupt header
    can promise gigapixels over kilobytes)."""


class RowTimeoutError(Exception):
    pass


def parse_hints(raw: Optional[str]) -> dict[str, str]:
    """Per-row job hints (reference job-processing spec,
    openspec/changes/add-ocr-processing-capability/specs/job-processing/
    spec.md:181-202): ``resolution`` / ``force`` / ``output_format`` /
    ``timeout_seconds``. Accepts ``k=v,k=v`` or a JSON object string; unknown
    hints are RETAINED but never cause a failure (forward compatibility), and
    malformed hint strings parse to the empty dict for the same reason."""
    if not raw:
        return {}
    raw = raw.strip()
    try:
        if raw.startswith("{"):
            import json

            d = json.loads(raw)
            return {str(k): str(v) for k, v in d.items()}
        out: dict[str, str] = {}
        for part in raw.split(","):
            if "=" in part:
                k, v = part.split("=", 1)
                out[k.strip()] = v.strip()
        return out
    except Exception:  # noqa: BLE001 — malformed hints must not fail the row
        return {}


def hint_truthy(v: Optional[str]) -> bool:
    return (v or "").strip().lower() in ("1", "true", "yes", "on")


_META_KEYS = (
    "engine",
    "mime_type",
    "size_bytes",
    "page_count",
    "processed_at",
    "width",
    "height",
)


class ExtractStage:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(
        self,
        route: Optional[dict[str, str]] = None,
        engine_config: Optional[dict[str, dict[str, Any]]] = None,
        payload_column: str = "html",
        row_timeout_s: Optional[float] = None,
        max_payload_bytes: Optional[int] = None,
    ) -> None:
        self._route = dict(DEFAULT_ROUTE if route is None else route)
        self._engine_config = engine_config or {}
        self._build_engines()
        self.payload_column = payload_column
        #: admission cap (see PayloadTooLargeError); None = unlimited
        self.max_payload_bytes = max_payload_bytes
        # Straggler guard (the reference declares per-job/request timeouts —
        # config.py:65-68,134-137 — but never enforces them): when set, each
        # engine call runs on a sidecar DAEMON thread with a deadline; a row
        # that exceeds it becomes a failed ROW at the deadline and the stuck
        # thread is abandoned (daemon threads never block worker-process
        # shutdown — ThreadPoolExecutor threads would be joined at exit and
        # hang teardown on a truly stuck call). Ray actor UDFs run off the
        # main thread, so signal-based watchdogs are not an option.
        self.row_timeout_s = row_timeout_s

    def _make_engine(self, engine_ref):
        if callable(engine_ref):
            cfg = self._engine_config.get(getattr(engine_ref, "name", ""), {})
            return engine_ref(**cfg)
        return create_engine(engine_ref, **self._engine_config.get(engine_ref, {}))

    def _build_engines(self) -> None:
        # one engine instance per distinct engine, built once per actor.
        # Route values are registry names OR factories/classes passed
        # directly — the latter travel by value with the stage (a registry
        # entry registered only in the driver process would be unknown in
        # worker processes).
        instances: dict[Any, Any] = {}
        self._engines: dict[str, Any] = {}
        for content_type, engine_ref in self._route.items():
            if engine_ref not in instances:
                instances[engine_ref] = self._make_engine(engine_ref)
            self._engines[content_type] = instances[engine_ref]

    def _rebuild_engine(self, ctype: str) -> None:
        """Replace the engine serving ``ctype`` (and every content type
        sharing the same instance) with a fresh one — used after a row
        timeout abandons a thread that may still mutate the old instance."""
        engine_ref = self._route.get(ctype)
        if engine_ref is None:
            return
        fresh = self._make_engine(engine_ref)
        for ct, ref in self._route.items():
            if ref == engine_ref:
                self._engines[ct] = fresh

    @staticmethod
    def _call_engine(engine, url, payload, ctype, hints):
        # hints reach only engines that declare support — every other engine
        # keeps the reference BaseOCREngine signature
        if hints and getattr(engine, "accepts_hints", False):
            return engine.extract(url, payload, ctype, hints=hints)
        return engine.extract(url, payload, ctype)

    def _timed_extract(self, engine, url, payload, ctype, timeout_s, hints):
        import threading

        result: list = []
        err: list = []

        def run() -> None:
            try:
                result.append(self._call_engine(engine, url, payload, ctype, hints))
            except BaseException as exc:  # noqa: BLE001 — relayed to caller
                err.append(exc)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            raise RowTimeoutError(
                f"Processing timeout after {timeout_s}s"
            )
        if err:
            raise err[0]
        return result[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch[self.payload_column].to_pylist()
        ctypes = batch["content_type"].to_pylist()
        hints_raw = (
            batch["hints"].to_pylist() if "hints" in batch.column_names else None
        )

        n = len(urls)
        status = [""] * n
        text = [""] * n
        page_count = [1] * n
        error = [""] * n
        elapsed = [0] * n

        # span columns are built flat (offsets + child arrays) — pa.array over
        # lists of dicts is several times slower per row
        span_offsets = [0]
        span_starts: list[int] = []
        span_ends: list[int] = []
        span_kinds: list[str] = []
        meta_cols: dict[str, list[str]] = {k: [""] * n for k in _META_KEYS}

        for i in range(n):
            t0 = time.perf_counter()
            payload = payloads[i] or b""
            ctype = ctypes[i]
            engine = self._engines.get(ctype)
            try:
                if engine is None:
                    mime = CONTENT_TYPE_TO_MIME.get(ctype, "application/octet-stream")
                    raise UnsupportedTypeError(f"Unsupported document type: {mime}")
                if (
                    self.max_payload_bytes
                    and len(payload) > self.max_payload_bytes
                ):
                    raise PayloadTooLargeError(
                        f"payload is {len(payload)} bytes "
                        f"(max: {self.max_payload_bytes})"
                    )
                hints = parse_hints(hints_raw[i]) if hints_raw else {}
                timeout_s = self.row_timeout_s
                if "timeout_seconds" in hints:
                    try:
                        timeout_s = float(hints["timeout_seconds"])
                    except ValueError:
                        pass  # unknown/malformed hint values never fail a row
                if timeout_s:
                    res = self._timed_extract(
                        engine, urls[i], payload, ctype, timeout_s, hints
                    )
                else:
                    res = self._call_engine(engine, urls[i], payload, ctype, hints)
                status[i] = "completed"
                text[i] = res.text
                page_count[i] = res.page_count
                for s in res.spans:
                    span_starts.append(s["start"])
                    span_ends.append(s["end"])
                    span_kinds.append(s["kind"])
                md = res.metadata
            except Exception as exc:  # noqa: BLE001 — poison rows must not kill the block
                status[i] = "failed"
                error[i] = str(exc)
                # full parity with reference_semantics.extract_row's failure
                # record (engine stays ""): page_count "1" + pinned timestamp
                md = {
                    "mime_type": CONTENT_TYPE_TO_MIME.get(ctype, "application/octet-stream"),
                    "size_bytes": str(len(payload)),
                    "page_count": "1",
                    "processed_at": PIN_PROCESSED_AT,
                }
                if isinstance(exc, RowTimeoutError):
                    # the abandoned watchdog thread may still be running
                    # engine.extract() and mutating the (stateful) engine —
                    # rebuild every engine sharing that instance so later
                    # rows never see corrupted state
                    self._rebuild_engine(ctype)
            span_offsets.append(len(span_starts))
            for k in _META_KEYS:
                v = md.get(k)
                if v is not None:
                    meta_cols[k][i] = v
            elapsed[i] = int((time.perf_counter() - t0) * 1000)

        span_children = pa.StructArray.from_arrays(
            [
                pa.array(span_starts, pa.int64()),
                pa.array(span_ends, pa.int64()),
                pa.array(span_kinds, pa.string()),
            ],
            names=["start", "end", "kind"],
        )
        span_arr = pa.ListArray.from_arrays(
            pa.array(span_offsets, pa.int32()), span_children
        )
        meta_arr = pa.StructArray.from_arrays(
            [pa.array(meta_cols[k], pa.string()) for k in _META_KEYS],
            names=list(_META_KEYS),
        )
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(status, pa.string()),
                pa.array(text, pa.string()),
                span_arr,
                pa.array(page_count, pa.int32()),
                pa.array(ctypes, pa.string()),
                pa.array(error, pa.string()),
                pa.array(elapsed, pa.int64()),
                meta_arr,
            ],
            schema=EXTRACTED_SCHEMA,
        )

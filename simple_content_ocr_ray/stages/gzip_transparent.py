"""Transparent per-row gzip decompression in front of the real route.

Crawl stores keep payload bytes exactly as fetched, and a large share of
fetched bodies are gzip (Content-Encoding or .gz side files). The right
engine behavior is TRANSPARENCY: decompress, re-sniff the inner bytes,
and dispatch to whatever engine the inner type routes to — with a
decompression-bomb guard, because "42.zip for gzip" is a standard hostile
payload at crawl scale (a few KB expanding to GBs stalls an actor and
evicts its heap). The guard enforces both an absolute output cap and a
max expansion ratio, streaming through ``zlib.decompressobj`` so the bomb
is caught at the cap, not after materializing it.

Inner engines are built lazily from the same registry the route uses —
one instance per inner type per actor, same lifecycle as every other
engine here. A gzip member whose INNER type is unsupported fails with the
inner type's error; a truncated/corrupt stream or a bomb fails at this
engine's own seam.
"""

from __future__ import annotations

import zlib

__all__ = ["GzipBombError", "gunzip_guarded", "GzipTransparentEngine"]

#: absolute decompressed-size cap (matches the reference's max_image_size
#: scale — config.py:105-108 declares 10 MB; 64 MB leaves headroom for
#: legitimate large documents)
MAX_DECOMPRESSED = 64 << 20
#: max expansion ratio (real text compresses ~10:1; 1000:1 is a bomb)
MAX_RATIO = 1000


class GzipBombError(ValueError):
    """Output cap or expansion-ratio guard tripped — the bomb seam."""


def gunzip_guarded(
    payload: bytes,
    max_out: int = MAX_DECOMPRESSED,
    max_ratio: int = MAX_RATIO,
) -> bytes:
    """Streaming gzip decompression with output-size and ratio guards."""
    d = zlib.decompressobj(wbits=31)
    out = bytearray()
    try:
        chunk = d.decompress(payload, max_out + 1)
    except zlib.error as exc:
        raise GzipBombError(f"corrupt gzip stream: {exc}") from exc
    out += chunk
    while d.unconsumed_tail and len(out) <= max_out:
        try:
            out += d.decompress(d.unconsumed_tail, max_out + 1 - len(out))
        except zlib.error as exc:
            raise GzipBombError(f"corrupt gzip stream: {exc}") from exc
    if len(out) > max_out:
        raise GzipBombError(f"decompressed output exceeds {max_out} bytes")
    if len(out) > max_ratio * max(1, len(payload)):
        raise GzipBombError(
            f"expansion ratio exceeds {max_ratio}:1 "
            f"({len(payload)} -> {len(out)} bytes)"
        )
    if not d.eof:
        raise GzipBombError("truncated gzip stream")
    return bytes(out)


class GzipTransparentEngine:
    """Engine-seam wrapper: gunzip (guarded) → re-sniff → dispatch to the
    inner type's engine from the same route table. Inner engines build
    lazily, once per actor."""

    name = "gzip-transparent"

    def __init__(
        self,
        max_out: int = MAX_DECOMPRESSED,
        max_ratio: int = MAX_RATIO,
    ) -> None:
        self.max_out = max_out
        self.max_ratio = max_ratio
        self._inner: dict[str, object] = {}

    def _engine_for(self, kind: str):
        eng = self._inner.get(kind)
        if eng is None:
            from .engines import UnsupportedTypeError, create_engine
            from .extract import REAL_ROUTE

            name = REAL_ROUTE.get(kind)
            if name is None or name == self.name:
                raise UnsupportedTypeError(
                    f"Unsupported file type: {kind} (inside gzip)"
                )
            eng = self._inner[kind] = create_engine(name)
        return eng

    def extract(self, url: str, payload: bytes, content_type: str):
        from ..reference_semantics import sniff_bytes

        inner = gunzip_guarded(payload, self.max_out, self.max_ratio)
        kind = sniff_bytes(inner)
        result = self._engine_for(kind).extract(url, inner, kind)
        result.metadata.setdefault("transport", "gzip")
        result.metadata.setdefault("inner_type", kind)
        return result

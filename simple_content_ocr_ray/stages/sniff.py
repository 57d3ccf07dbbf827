"""Content-type sniffing stage.

The reference routes documents on a caller-supplied MIME string
(/root/reference/src/simple_ocr/services/ocr_service.py:224-244 and the
extension→MIME map in examples/test_local_file.py:201-227). With payloads
inline in an Arrow ``binary`` column there is no caller, so the router key is
sniffed from magic bytes. Only the sniff window (256 bytes — the
same prefix ``sniff_bytes`` inspects, so the stage and the single-row oracle
always agree) leaves Arrow per row via ``pyarrow.compute.binary_slice``.
"""

from __future__ import annotations

import pyarrow as pa

from ..reference_semantics import SNIFF_WINDOW, sniff_bytes

try:  # pyarrow >= 8
    import pyarrow.compute as pc

    _HAS_BINARY_SLICE = hasattr(pc, "binary_slice")
except Exception:  # pragma: no cover
    _HAS_BINARY_SLICE = False


def _prefixes(col: pa.ChunkedArray | pa.Array) -> list[bytes | None]:
    if _HAS_BINARY_SLICE:
        import pyarrow.compute as pc

        return pc.binary_slice(col, 0, SNIFF_WINDOW).to_pylist()
    return [None if v is None else v[:SNIFF_WINDOW] for v in col.to_pylist()]


def sniff_batch(batch: pa.Table, column: str = "html") -> pa.Table:
    """Append a ``content_type`` string column classified from magic bytes."""
    kinds = [
        "unknown" if p is None else sniff_bytes(p) for p in _prefixes(batch[column])
    ]
    return batch.append_column("content_type", pa.array(kinds, pa.string()))

"""Alternative sources for the pages schema.

The primary source is parquet with inline payloads. For side-file corpora
(one document per file on disk/object store — the reference's S1/S2 download
path, content_client.py:71-103 / test_local_file.py:32-50) we read the files
distributed and normalize into the same pages schema, so every downstream
stage is source-agnostic.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from .synth_pages import _EPOCH_US  # 2024-01-01 UTC — single source of truth


def read_pages_from_binary_files(paths: str | list[str]) -> rd.Dataset:
    """Directory (or list) of raw document files → pages(url, warc_ts, html,
    text, lang). url = file:// path; text/lang empty (to be filled by the
    pipeline)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_pages(batch: dict) -> pa.Table:
        paths_ = [str(p) for p in batch["path"]]
        n = len(paths_)
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths_], pa.string()),
                "warc_ts": pa.array([_EPOCH_US] * n, pa.timestamp("us")),
                "html": pa.array(list(batch["bytes"]), pa.binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([""] * n, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="numpy")


def read_pages_from_jsonl(
    paths: str | list[str], compression: str | None = None
) -> rd.Dataset:
    """JSON-lines corpus (Common-Crawl WET/CC-style dumps: one JSON object
    per line with url / timestamp / html-base64 / text / lang fields) →
    the canonical pages schema. ``read_json`` splits files into blocks and
    parses distributed; the base64 payload decode is a vectorized Arrow
    map — downstream stages stay source-agnostic.

    Missing fields take the same defaults as the binary-file source.

    ``compression="gzip"`` reads ``.jsonl.gz`` dumps (the on-the-wire shape
    of real WET drops) — decompression happens INSIDE the distributed read
    tasks via Arrow's input stream, file-granular parallel like the plain
    path; nothing is inflated on the driver."""
    import base64

    ds = rd.read_json(
        paths,
        **(
            {"arrow_open_stream_args": {"compression": compression}}
            if compression
            else {}
        ),
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        n = len(batch)

        def col(name, default):
            if name in cols:
                return batch[name]
            return pa.array([default] * n)

        raw_html = col("html_b64", "")
        html = pa.array(
            [base64.b64decode(v) if v else b"" for v in raw_html.to_pylist()],
            pa.binary(),
        )
        if "warc_ts" in cols:
            ts = pa.compute.cast(batch["warc_ts"], pa.timestamp("us"))
        else:
            ts = pa.array([_EPOCH_US] * n, pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.compute.cast(col("url", ""), pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": pa.compute.cast(col("text", ""), pa.string()),
                "lang": pa.compute.cast(col("lang", ""), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_pages_from_csv(paths: str | list[str]) -> rd.Dataset:
    """CSV corpus (url, warc_ts, html_b64, text, lang — header row) → the
    canonical pages schema. ``read_csv`` splits files into blocks and parses
    distributed (Arrow CSV reader per block); payload transport is base64
    like the JSONL source, decoded vectorized. Missing columns take the
    same defaults as the other sources, so every downstream stage stays
    source-agnostic."""
    import base64

    ds = rd.read_csv(paths)

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = set(batch.column_names)
        n = len(batch)

        def col(name, default):
            if name in cols:
                return batch[name]
            return pa.array([default] * n)

        raw_html = col("html_b64", "")
        html = pa.array(
            [
                base64.b64decode(v) if v else b""
                for v in raw_html.to_pylist()
            ],
            pa.binary(),
        )
        if "warc_ts" in cols:
            ts = pa.compute.cast(batch["warc_ts"], pa.timestamp("us"))
        else:
            ts = pa.array([_EPOCH_US] * n, pa.timestamp("us"))
        return pa.table(
            {
                "url": pa.compute.cast(col("url", ""), pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": pa.compute.cast(col("text", ""), pa.string()),
                "lang": pa.compute.cast(col("lang", ""), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_pages_from_warclite(paths: str | list[str]) -> rd.Dataset:
    """WARC-style crawl archives → the canonical pages schema. Each file
    holds concatenated records of the (simplified, self-describing) form::

        WARC/1.0\\r\\n
        WARC-Target-URI: <url>\\r\\n
        WARC-Date: <iso timestamp>\\r\\n
        Content-Length: <payload bytes>\\r\\n
        \\r\\n
        <payload>\\r\\n\\r\\n

    Parallelism is FILE-granular (real WARC segments are ~1 GB and
    self-contained, so one file per task is the natural unit — the same
    reason Common Crawl ships thousands of segment files); within a file
    the parser walks Content-Length offsets, so payloads may contain
    anything, including header-lookalike bytes."""
    import datetime as _dt

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"]:
            buf = bytes(blob)
            pos = 0
            while True:
                start = buf.find(b"WARC/1.0\r\n", pos)
                if start < 0:
                    break
                head_end = buf.find(b"\r\n\r\n", start)
                if head_end < 0:
                    break
                headers = {}
                for line in buf[start + 10 : head_end].split(b"\r\n"):
                    k, _, v = line.partition(b": ")
                    headers[k.decode()] = v.decode()
                n = int(headers.get("Content-Length", "0"))
                body_start = head_end + 4
                payloads.append(buf[body_start : body_start + n])
                urls.append(headers.get("WARC-Target-URI", ""))
                raw_ts = headers.get("WARC-Date", "")
                if raw_ts:
                    ts = int(
                        _dt.datetime.fromisoformat(
                            raw_ts.replace("Z", "+00:00")
                        ).timestamp()
                        * 1_000_000
                    )
                else:
                    ts = _EPOCH_US
                tss.append(ts)
                pos = body_start + n
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="numpy")


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (hex length CRLF
    data CRLF …, terminated by a zero chunk)."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        try:
            n = int(body[pos:eol].split(b";")[0], 16)  # ignore extensions
        except ValueError:
            break
        if n == 0:
            break
        out += body[eol + 2 : eol + 2 + n]
        pos = eol + 2 + n + 2  # past data + trailing CRLF
    return bytes(out)


def _strip_http_envelope(block: bytes) -> tuple[bytes, int, str] | None:
    """(body, status, content_type) of an HTTP response block, applying
    Transfer-Encoding: chunked and Content-Encoding: gzip/deflate. None
    when the block is not an HTTP response."""
    if not block.startswith(b"HTTP/"):
        return None
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    head_lines = block[:head_end].split(b"\r\n")
    try:
        status = int(head_lines[0].split()[1])
    except (IndexError, ValueError):
        return None
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    body = block[head_end + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    cenc = headers.get("content-encoding", "").lower()
    if cenc in ("gzip", "x-gzip"):
        import gzip as _gzip

        try:
            body = _gzip.decompress(body)
        except OSError:
            pass  # mislabeled body: keep raw bytes, the row can still fail late
    elif cenc == "deflate":
        import zlib as _zlib

        try:
            body = _zlib.decompress(body)
        except _zlib.error:
            try:
                body = _zlib.decompress(body, -15)  # raw-deflate servers
            except _zlib.error:
                pass
    return body, status, headers.get("content-type", "")


def read_pages_from_warc(paths: str | list[str]) -> rd.Dataset:
    """REAL WARC/1.x crawl archives (the Common Crawl shape) → the pages
    schema. Handles what the simplified ``read_pages_from_warclite`` does
    not:

    * ``.warc.gz`` — each record its own gzip member, concatenated
      (stdlib ``gzip.decompress`` walks all members); plain ``.warc``
      detected by magic;
    * ``WARC-Type`` routing: only ``response`` (HTTP envelope) and
      ``resource`` (raw payload) records become pages; request/metadata/
      warcinfo/revisit records are skipped;
    * HTTP response envelopes: status line + headers stripped, non-2xx
      dropped, ``Transfer-Encoding: chunked`` de-chunked,
      ``Content-Encoding: gzip/deflate`` decompressed — the payload
      column holds the actual document bytes.

    Parallelism stays FILE-granular (Common Crawl ships ~1 GB segment
    files; one file per task is the natural distributed unit — list many
    paths for fan-out). ``.warc.gz`` is decompressed MEMBER BY MEMBER
    (each record is its own gzip member in the real framing), so task
    heap holds the compressed file plus ONE decompressed record — never
    the ~4× whole-segment expansion. The transport Content-Type travels
    no further than this reader because the pages schema is
    source-agnostic; the html route re-sniffs charset from the bytes
    (stages/charset.py), exactly like a browser rendering a saved
    page."""
    import datetime as _dt
    import zlib as _zlib

    ds = rd.read_binary_files(paths, include_paths=True)

    def gzip_members(buf: bytes):
        """Decompressed gzip members, one at a time (bounded heap)."""
        view = memoryview(buf)
        pos = 0
        while pos < len(buf):
            d = _zlib.decompressobj(wbits=31)
            try:
                chunk = d.decompress(view[pos:]) + d.flush()
            except _zlib.error:
                break  # trailing garbage: stop at the last whole member
            yield chunk
            consumed = len(buf) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []

        def records(buf: bytes) -> None:
            pos = 0
            while True:
                start = buf.find(b"WARC/1.", pos)
                if start < 0:
                    break
                head_end = buf.find(b"\r\n\r\n", start)
                if head_end < 0:
                    break
                headers: dict[str, str] = {}
                for line in buf[start : head_end].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                        "latin-1"
                    )
                n = int(headers.get("content-length", "0"))
                body_start = head_end + 4
                block = buf[body_start : body_start + n]
                pos = body_start + n
                rec_type = headers.get("warc-type", "").lower()
                payload: bytes | None = None
                if rec_type == "response":
                    stripped = _strip_http_envelope(block)
                    if stripped and 200 <= stripped[1] < 300:
                        payload = stripped[0]
                elif rec_type == "resource":
                    payload = block
                if payload is None:
                    continue
                payloads.append(payload)
                urls.append(headers.get("warc-target-uri", ""))
                raw_ts = headers.get("warc-date", "")
                if raw_ts:
                    ts = int(
                        _dt.datetime.fromisoformat(
                            raw_ts.replace("Z", "+00:00")
                        ).timestamp()
                        * 1_000_000
                    )
                else:
                    ts = _EPOCH_US
                tss.append(ts)

        for blob in batch["bytes"]:
            buf = bytes(blob)
            if buf[:2] == b"\x1f\x8b":
                for member in gzip_members(buf):
                    records(member)
            else:
                records(buf)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="numpy")


def make_warc_gz(
    records: list[dict],
    gzip_members: bool = True,
) -> bytes:
    """Writer side (tests/fixtures): a WARC/1.0 file in the Common Crawl
    layout. Each ``record`` dict: ``type`` (response/resource/request/...),
    ``url``, ``date`` (ISO), ``body`` bytes, and for responses optionally
    ``status``, ``content_type``, ``chunked``, ``gzip_body``. With
    ``gzip_members`` each record is compressed as its OWN gzip member and
    members are concatenated — the real .warc.gz framing."""
    import gzip as _gzip

    out = bytearray()
    for rec in records:
        body = rec.get("body", b"")
        if rec.get("type", "response") == "response":
            if rec.get("gzip_body"):
                body = _gzip.compress(body)
                cenc = b"Content-Encoding: gzip\r\n"
            else:
                cenc = b""
            if rec.get("chunked"):
                chunked = bytearray()
                for i in range(0, len(body), 7):  # uneven chunks on purpose
                    part = body[i : i + 7]
                    chunked += f"{len(part):x}\r\n".encode() + part + b"\r\n"
                chunked += b"0\r\n\r\n"
                body = bytes(chunked)
                tenc = b"Transfer-Encoding: chunked\r\n"
            else:
                tenc = b""
            status = rec.get("status", 200)
            ct = rec.get("content_type", "text/html")
            body = (
                f"HTTP/1.1 {status} X\r\n".encode()
                + f"Content-Type: {ct}\r\n".encode()
                + cenc
                + tenc
                + b"\r\n"
                + body
            )
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rec.get('type', 'response')}\r\n".encode()
            + f"WARC-Target-URI: {rec.get('url', '')}\r\n".encode()
            + f"WARC-Date: {rec.get('date', '2024-01-01T00:00:00Z')}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
        )
        record = head + body + b"\r\n\r\n"
        out += _gzip.compress(record) if gzip_members else record
    return bytes(out)

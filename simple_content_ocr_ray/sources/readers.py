"""Alternative sources for the pages schema.

The primary source is parquet with inline payloads. For side-file corpora
(one document per file on disk/object store — the reference's S1/S2 download
path, content_client.py:71-103 / test_local_file.py:32-50) we read the files
distributed and normalize into the same pages schema, so every downstream
stage is source-agnostic.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Iterator

import pyarrow as pa
import ray.data as rd

from .synth_pages import _EPOCH_US  # 2024-01-01 UTC — single source of truth


def _warc_ts(raw: str) -> int:
    """WARC-Date → microseconds since epoch; a missing or malformed date
    degrades to the corpus epoch rather than failing the whole read task
    (one damaged record must cost one row, never a ~1 GB segment)."""
    if not raw:
        return _EPOCH_US
    try:
        dt = _dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return _EPOCH_US
    return int(dt.timestamp() * 1_000_000)


def _iter_warc_records_stream(
    chunks,
) -> Iterator[tuple[dict[str, str], bytes]]:
    """(lowercased headers, raw body bytes) of each WARC record in a
    stream of byte chunks — the single record walk both WARC readers
    share. Bodies are delimited by Content-Length offsets, so payloads
    may contain anything, including header-lookalike bytes. A record with
    a malformed Content-Length is skipped (the scan resumes after its
    header block) instead of raising out of the read task.

    Streaming keeps heap at O(one record + one chunk): consumed bytes are
    trimmed from the rolling buffer after every record, so a ~1 GB
    ``.warc.gz`` segment is never fully resident decompressed."""
    it = iter(chunks)
    acc = bytearray()
    pos = 0  # parse cursor within acc

    def pull() -> bool:
        try:
            acc.extend(next(it))
        except StopIteration:
            return False
        return True

    while True:
        start = acc.find(b"WARC/1.", pos)
        while start < 0:
            # garbage prefix: keep only a short tail (the marker can span
            # a chunk boundary) and pull more data
            del acc[: max(pos, len(acc) - 8)]
            pos = 0
            if not pull():
                return
            start = acc.find(b"WARC/1.", pos)
        head_end = acc.find(b"\r\n\r\n", start)
        while head_end < 0:
            if not pull():
                return
            head_end = acc.find(b"\r\n\r\n", start)
        headers: dict[str, str] = {}
        for line in bytes(acc[start:head_end]).split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        try:
            n = int(headers.get("content-length", "0"))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        while len(acc) < body_start + n:
            if not pull():
                return  # truncated final record: drop it
        yield headers, bytes(acc[body_start : body_start + n])
        pos = body_start + n
        if pos >= (1 << 20):  # amortized trim — a per-record del would
            del acc[:pos]     # memmove the whole buffer every record
            pos = 0


def _iter_warc_records(buf: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Record walk over one in-memory buffer (plain ``.warc``)."""
    return _iter_warc_records_stream((buf,))


def _gzip_chunks(buf: bytes, feed: int = 8192, chunk: int = 1 << 20):
    """Decompressed bytes of a (possibly multi-member) gzip buffer, one
    bounded chunk at a time. The decompressor is fed fixed SMALL slices
    (``feed``) of the compressed buffer; when a member ends mid-slice the
    cursor rewinds by ``unused_data`` (at most one slice) and a fresh
    decompressor continues. That keeps the walk linear in file size
    regardless of member count — handing ``decompressobj`` the whole
    remaining tail materializes an O(remaining) ``unused_data`` copy per
    member and turns ~100k-member Common Crawl segments quadratic.
    Corruption or truncation ends the stream at the last decompressable
    byte, so records before the damage are kept."""
    import zlib as _zlib

    view = memoryview(buf)
    n = len(buf)
    pos = 0
    out = bytearray()
    d = _zlib.decompressobj(wbits=31)
    while pos < n:
        try:
            out += d.decompress(view[pos : pos + feed])
        except _zlib.error:
            break  # corrupt member: salvage what decoded before it
        pos = min(pos + feed, n)
        if d.eof:  # member boundary: rewind the over-fed tail (≤ one slice)
            pos -= len(d.unused_data)
            d = _zlib.decompressobj(wbits=31)
        if len(out) >= chunk:
            yield bytes(out)
            out.clear()
    if out:  # tail chunk — including partial data of a truncated member
        yield bytes(out)


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


def write_jsonl(
    ds: rd.Dataset,
    out_dir: str,
    compression: str | None = "gzip",
    overwrite_dir: bool = False,
):
    """Distributed JSONL export — the dump format ``read_pages_from_jsonl``
    ingests, closing the source/sink pair: one ``.jsonl[.gz]`` shard per
    Ray block, one JSON object per row with the canonical field names
    (``url``, ``warc_ts`` ISO-8601, ``html_b64``, ``text``, ``lang``);
    binary payloads ship base64 so the file stays valid UTF-8 text.

    Same scale shape as ``write_wet``/``write_warc``: shard-per-block
    streaming write, per-attempt temp + atomic rename, content-addressed
    shard names (idempotent re-runs, no cross-block collisions). Returns
    the shard manifest (path, n_records, n_bytes)."""
    import base64
    import gzip as _gzip
    import hashlib
    import json as _json
    import os as _os
    import shutil as _shutil

    import pandas as pd

    if overwrite_dir:
        _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        if not len(df):
            return _pd.DataFrame(
                {
                    "path": _pd.Series([], dtype="string"),
                    "n_records": _pd.Series([], dtype="int64"),
                    "n_bytes": _pd.Series([], dtype="int64"),
                }
            )
        lines = []
        for _, row in df.iterrows():
            obj: dict = {"url": str(row.get("url", ""))}
            ts = row.get("warc_ts")
            if ts is not None and not pd.isna(ts):
                obj["warc_ts"] = pd.Timestamp(ts).isoformat()
            html = row.get("html")
            if html is not None and not (isinstance(html, float) and pd.isna(html)):
                obj["html_b64"] = base64.b64encode(bytes(html)).decode()
            for k in ("text", "lang"):
                v = row.get(k)
                if v is not None and not (isinstance(v, float) and pd.isna(v)):
                    obj[k] = str(v)
            lines.append(_json.dumps(obj, ensure_ascii=False))
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        if compression == "gzip":
            payload = _gzip.compress(payload)
        tag = hashlib.md5(
            b"\x00".join(str(u).encode() for u in df["url"])
        ).hexdigest()[:16]
        path = _os.path.join(out_dir, f"pages-{tag}-{len(df)}{ext}")
        tmp = f"{path}.{_os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        _os.replace(tmp, path)
        return _pd.DataFrame(
            {
                "path": _pd.Series([path], dtype="string"),
                "n_records": _pd.Series([len(df)], dtype="int64"),
                "n_bytes": _pd.Series([len(payload)], dtype="int64"),
            }
        )

    return ds.map_batches(dump, batch_format="pandas").to_pandas()


def write_ipc(ds: rd.Dataset, out_dir: str, overwrite_dir: bool = False):
    """Arrow IPC (Feather V2 / RecordBatchFile) export — the zero-transcode
    inter-pipeline handoff format: binary payloads stay ``binary`` columns
    (no base64), timestamps stay µs, and a reader maps shards back into
    Arrow without parsing. One ``.arrow`` shard per Ray block, per-attempt
    temp + atomic rename, content-addressed shard names (idempotent re-runs,
    no cross-block collisions) — the same scale shape as
    ``write_jsonl``/``write_wet``/``write_warc``. Returns the shard manifest
    (path, n_records, n_bytes)."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    if overwrite_dir:
        _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        tag = _hashlib.md5(
            b"\x00".join(str(u).encode() for u in batch["url"].to_pylist())
        ).hexdigest()[:16]
        path = _os.path.join(out_dir, f"pages-{tag}-{len(batch)}.arrow")
        tmp = f"{path}.{_os.getpid()}.tmp"
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, batch.schema) as w:
                w.write_table(batch)
        _os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(batch)], pa.int64()),
                "n_bytes": pa.array([_os.path.getsize(path)], pa.int64()),
            }
        )

    return ds.map_batches(
        dump, batch_format="pyarrow", batch_size=None
    ).to_pandas()


def read_pages_from_ipc(paths: str | list[str]) -> rd.Dataset:
    """Arrow IPC shards (``write_ipc`` output) → Dataset, byte-exact:
    file-granular parallelism (each shard is one self-contained
    RecordBatchFile), each task opens its shard from the fetched buffer and
    returns the Arrow table as-is — no row-level parsing, no transcode.
    Corrupt shards raise (an archive shard is an integrity boundary, unlike
    the salvage-tolerant WARC text readers)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def load(batch: dict) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(bytes(blob))).read_all()
            for blob in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(load)


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
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []
        for blob in batch["bytes"]:
            for headers, body in _iter_warc_records(bytes(blob)):
                payloads.append(body)
                urls.append(headers.get("warc-target-uri", ""))
                tss.append(_warc_ts(headers.get("warc-date", "")))
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
        import zlib as _zlib

        try:
            body = _gzip.decompress(body)
        # mislabeled → OSError/BadGzipFile, truncated → EOFError, corrupt
        # deflate → zlib.error: all three are one-row problems (keep raw
        # bytes, the row can still fail late), never task killers
        except (OSError, EOFError, _zlib.error):
            pass
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

    * ``.warc.gz`` — each record its own gzip member, concatenated;
      plain ``.warc`` detected by magic;
    * ``WARC-Type`` routing: ``response`` (HTTP envelope) and ``resource``
      (raw payload) records become pages; ``revisit`` records (the CC
      identical-payload-digest dedup) resolve to the payload of the
      same-file record sharing their ``WARC-Payload-Digest`` — in either
      order — and unresolvable revisits (referent in another segment, or
      no digest header) are skipped; request/metadata/warcinfo skipped;
    * HTTP response envelopes: status line + headers stripped, non-2xx
      dropped, ``Transfer-Encoding: chunked`` de-chunked,
      ``Content-Encoding: gzip/deflate`` decompressed — the payload
      column holds the actual document bytes.

    Parallelism stays FILE-granular (Common Crawl ships ~1 GB segment
    files; one file per task is the natural distributed unit — list many
    paths for fan-out). ``.warc.gz`` is decompressed as a bounded-chunk
    STREAM and records are carved from a rolling buffer
    (``_gzip_chunks`` + ``_iter_warc_records_stream``), so task heap
    holds the compressed file plus ~one decompressed record — never the
    ~4× whole-segment expansion — and the walk stays LINEAR in file size
    however many gzip members frame it. The transport Content-Type travels
    no further than this reader because the pages schema is
    source-agnostic; the html route re-sniffs charset from the bytes
    (stages/charset.py), exactly like a browser rendering a saved
    page."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        urls, tss, payloads = [], [], []

        def records(recs) -> None:
            # digest -> payload map of THIS file, fed lazily from records
            # carrying a digest header (ours always do); pins each distinct
            # payload once — bounded by the file's distinct payload bytes,
            # which the row lists below hold anyway.
            by_digest: dict[str, bytes] = {}
            pending: list[tuple[str, object, str]] = []
            for headers, block in recs:
                rec_type = headers.get("warc-type", "").lower()
                payload: bytes | None = None
                if rec_type == "response":
                    stripped = _strip_http_envelope(block)
                    if stripped and 200 <= stripped[1] < 300:
                        payload = stripped[0]
                elif rec_type in ("resource", "conversion"):
                    # conversion = WET extracted-text records (write_wet)
                    payload = block
                elif rec_type == "revisit":
                    dg = headers.get("warc-payload-digest", "")
                    if dg:
                        pending.append(
                            (
                                headers.get("warc-target-uri", ""),
                                _warc_ts(headers.get("warc-date", "")),
                                dg,
                            )
                        )
                    continue
                if payload is None:
                    continue
                dg = headers.get("warc-payload-digest", "")
                if dg and dg not in by_digest:
                    by_digest[dg] = payload
                payloads.append(payload)
                urls.append(headers.get("warc-target-uri", ""))
                tss.append(_warc_ts(headers.get("warc-date", "")))
            for url, ts, dg in pending:  # referent may follow the revisit
                payload = by_digest.get(dg)
                if payload is None:
                    continue  # referent lives in another segment: skip
                payloads.append(payload)
                urls.append(url)
                tss.append(ts)

        for blob in batch["bytes"]:
            buf = bytes(blob)
            if buf[:2] == b"\x1f\x8b":
                records(_iter_warc_records_stream(_gzip_chunks(buf)))
            else:
                records(_iter_warc_records(buf))
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


def write_wet(
    ds: rd.Dataset,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
    overwrite_dir: bool = False,
):
    """Distributed WET export — the Common Crawl extracted-text sink:
    every Ray block becomes one ``.warc.wet.gz`` shard of ``conversion``
    records (each record its OWN gzip member, the real framing), so a
    corpus exported here round-trips through ``read_pages_from_warc``.

    Scale shape: shard-per-block streaming write (no driver
    materialization of text); files are written to a per-attempt temp
    name and atomically renamed (no torn shards); shard names are
    content-addressed over the block's FULL url list, so re-running the
    same export is idempotent while distinct blocks can never collide on
    a name. Rows whose text is missing (None/NaN) are dropped, not
    exported as the literal string "None". Re-running after the corpus
    or block boundaries changed leaves the PREVIOUS run's shards in
    place — pass ``overwrite_dir=True`` (the CLI does) to clear the
    directory first, or export each run into a fresh directory. Returns
    the shard manifest (path, n_records, n_bytes) — driver-side rows are
    one per shard."""
    import gzip as _gzip
    import hashlib
    import os as _os
    import shutil as _shutil

    import pandas as pd

    if overwrite_dir:
        _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)

    def _date(ts) -> str:
        if pd.isna(ts):
            return "1970-01-01T00:00:00Z"
        t = pd.Timestamp(ts)
        if t.tzinfo is not None:  # label only true UTC instants with Z
            t = t.tz_convert("UTC").tz_localize(None)
        if t.microsecond or t.nanosecond:
            return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return t.strftime("%Y-%m-%dT%H:%M:%SZ")

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        if text_col in df.columns:
            df = df[df[text_col].notna()]
        if not len(df):
            return _pd.DataFrame(
                {
                    "path": _pd.Series([], dtype="string"),
                    "n_records": _pd.Series([], dtype="int64"),
                    "n_bytes": _pd.Series([], dtype="int64"),
                }
            )
        out = bytearray()
        for _, row in df.iterrows():
            body = str(row[text_col]).encode("utf-8")
            date = _date(row[ts_col]) if ts_col is not None else (
                "1970-01-01T00:00:00Z"
            )
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: conversion\r\n"
                + f"WARC-Target-URI: {row[url_col]}\r\n".encode()
                + f"WARC-Date: {date}\r\n".encode()
                + b"Content-Type: text/plain\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
                + b"\r\n\r\n"
            )
            out += _gzip.compress(rec)
        tag = hashlib.md5(
            b"\x00".join(str(u).encode() for u in df[url_col])
        ).hexdigest()[:16]
        name = f"wet-{tag}-{len(df)}.warc.wet.gz"
        path = _os.path.join(out_dir, name)
        tmp = f"{path}.{_os.getpid()}.tmp"  # per-attempt: no interleaving
        with open(tmp, "wb") as f:
            f.write(bytes(out))
        _os.replace(tmp, path)
        return _pd.DataFrame(
            {
                "path": _pd.Series([path], dtype="string"),
                "n_records": _pd.Series([len(df)], dtype="int64"),
                "n_bytes": _pd.Series([len(out)], dtype="int64"),
            }
        )

    return ds.map_batches(dump, batch_format="pandas").to_pandas()


def write_warc(
    ds: rd.Dataset,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    ts_col: str | None = "warc_ts",
    content_type: str = "text/html",
    overwrite_dir: bool = False,
    revisit_dupes: bool = False,
):
    """Distributed WARC export — the raw-crawl sink that pairs with
    ``read_pages_from_warc``: every Ray block becomes one ``.warc.gz``
    shard of ``response`` records (WARC/1.0 header + HTTP/1.1 envelope +
    payload bytes, each record its OWN gzip member — the real Common
    Crawl framing), carrying ``WARC-Payload-Digest`` (sha1, base32, the
    CC convention) so downstream dedup can run header-only.

    Same scale shape as ``write_wet``: shard-per-block streaming write
    (payload bytes never gather on the driver), per-attempt temp name +
    atomic rename (no torn shards), shard names content-addressed over
    the block's url list (idempotent re-runs, no cross-block collisions).
    Rows whose payload is missing are dropped. Returns the shard manifest
    (path, n_records, n_bytes). A corpus exported here round-trips
    through ``read_pages_from_warc`` byte-identically per url
    (tests/test_warc_writer.py).

    ``revisit_dupes=True`` writes the Common Crawl archive-dedup semantic:
    a payload whose sha1 digest already appeared EARLIER IN THE SHARD is
    stored as a body-less ``WARC-Type: revisit`` record
    (identical-payload-digest profile, ``WARC-Refers-To-Target-URI``
    naming the first capture) instead of repeating the bytes; the reader
    resolves revisits back to full pages, so the roundtrip stays
    byte-identical while duplicate-heavy shards shrink. Dedup scope is the
    shard (= the Ray block) — cross-shard dedup belongs to the streaming
    dedup index upstream, not the sink."""
    import base64
    import gzip as _gzip
    import hashlib
    import os as _os
    import shutil as _shutil

    import pandas as pd

    if overwrite_dir:
        _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)

    def _date(ts) -> str:
        if ts is None or pd.isna(ts):
            return "1970-01-01T00:00:00Z"
        t = pd.Timestamp(ts)
        if t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        if t.microsecond or t.nanosecond:
            return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return t.strftime("%Y-%m-%dT%H:%M:%SZ")

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        if payload_col in df.columns:
            df = df[df[payload_col].notna()]
        if not len(df):
            return _pd.DataFrame(
                {
                    "path": _pd.Series([], dtype="string"),
                    "n_records": _pd.Series([], dtype="int64"),
                    "n_bytes": _pd.Series([], dtype="int64"),
                }
            )
        out = bytearray()
        seen: dict[str, str] = {}  # digest -> first capture url
        for _, row in df.iterrows():
            payload = bytes(row[payload_col])
            digest = base64.b32encode(hashlib.sha1(payload).digest()).decode()
            if revisit_dupes and digest in seen:
                date = (
                    _date(row[ts_col]) if ts_col is not None
                    else "1970-01-01T00:00:00Z"
                )
                rec = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: revisit\r\n"
                    + f"WARC-Target-URI: {row[url_col]}\r\n".encode()
                    + f"WARC-Date: {date}\r\n".encode()
                    + f"WARC-Payload-Digest: sha1:{digest}\r\n".encode()
                    + f"WARC-Refers-To-Target-URI: {seen[digest]}\r\n".encode()
                    + b"WARC-Profile: http://netpreserve.org/warc/1.1/"
                    b"revisit/identical-payload-digest\r\n"
                    b"Content-Length: 0\r\n\r\n"
                    b"\r\n\r\n"
                )
                out += _gzip.compress(rec)
                continue
            seen[digest] = str(row[url_col])
            http = (
                b"HTTP/1.1 200 OK\r\n"
                + f"Content-Type: {content_type}\r\n".encode()
                + f"Content-Length: {len(payload)}\r\n\r\n".encode()
                + payload
            )
            date = _date(row[ts_col]) if ts_col is not None else "1970-01-01T00:00:00Z"
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {row[url_col]}\r\n".encode()
                + f"WARC-Date: {date}\r\n".encode()
                + f"WARC-Payload-Digest: sha1:{digest}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
                + http
                + b"\r\n\r\n"
            )
            out += _gzip.compress(rec)
        tag = hashlib.md5(
            b"\x00".join(str(u).encode() for u in df[url_col])
        ).hexdigest()[:16]
        name = f"crawl-{tag}-{len(df)}.warc.gz"
        path = _os.path.join(out_dir, name)
        tmp = f"{path}.{_os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(out))
        _os.replace(tmp, path)
        return _pd.DataFrame(
            {
                "path": _pd.Series([path], dtype="string"),
                "n_records": _pd.Series([len(df)], dtype="int64"),
                "n_bytes": _pd.Series([len(out)], dtype="int64"),
            }
        )

    return ds.map_batches(dump, batch_format="pandas").to_pandas()


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


# --------------------------------------------------------------------------
# WAT export / index (Common Crawl metadata sidecar)
# --------------------------------------------------------------------------

#: head-metadata regexes shared by the WAT writer; compiled once per module
#: import (once per worker process), reused across every batch.
import re as _re

_TITLE_RE = _re.compile(r"<title>([^<]*)</title>")
_LANG_RE = _re.compile(r'<html lang="([^"]*)"')
_HREF_RE = _re.compile(r'href="([^"]+)"')
_META_RE = _re.compile(r"<meta ([^>]+)>")
_ATTR_RE = _re.compile(r'([a-zA-Z-]+)="([^"]*)"')


def _html_metadata(payload: bytes) -> dict | None:
    """CC-WAT-style ``HTML-Metadata`` for one payload, or None when the
    bytes are not an HTML document: ``Head`` (Title, Lang — the ``<html
    lang>`` attribute, an extension field — and Metas as attr dicts) and
    ``Links`` (every href, in document order, path ``A@/href``)."""
    text = payload.decode("utf-8", "ignore")
    if not text.startswith("<!doctype html>") and not text[:256].lstrip().startswith(
        "<html"
    ):
        return None
    head: dict = {}
    m = _TITLE_RE.search(text)
    if m:
        head["Title"] = m.group(1)
    m = _LANG_RE.search(text)
    if m:
        head["Lang"] = m.group(1)
    metas = [dict(_ATTR_RE.findall(attrs)) for attrs in _META_RE.findall(text)]
    if metas:
        head["Metas"] = metas
    links = [{"path": "A@/href", "url": u} for u in _HREF_RE.findall(text)]
    return {"Head": head, "Links": links}


def write_wat(
    ds: rd.Dataset,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    ts_col: str | None = "warc_ts",
    overwrite_dir: bool = False,
):
    """Distributed WAT export — the Common Crawl metadata sidecar that
    completes the archive family (``write_warc`` raw crawl, ``write_wet``
    extracted text, ``cdx_index`` URL index): one ``metadata`` record per
    capture whose JSON envelope carries the WARC header metadata plus
    parsed ``HTML-Metadata`` (head title/lang/metas and the full outlink
    list) for HTML payloads — the artifact link-graph and head-analytics
    jobs consume WITHOUT touching the raw WARC.

    Same scale shape as ``write_wet``/``write_warc``: shard-per-block
    streaming write (payloads never gather on the driver), each record its
    OWN gzip member (real framing), per-attempt temp name + atomic rename,
    shard names content-addressed over the block's url list (idempotent
    re-runs, no cross-block collisions). JSON is serialized with sorted
    keys so the artifact is byte-deterministic for a given block. Returns
    the shard manifest (path, n_records, n_bytes)."""
    import gzip as _gzip
    import hashlib
    import json as _json
    import os as _os
    import shutil as _shutil

    import pandas as pd

    if overwrite_dir:
        _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)

    def _date(ts) -> str:
        if ts is None or pd.isna(ts):
            return "1970-01-01T00:00:00Z"
        t = pd.Timestamp(ts)
        if t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        if t.microsecond or t.nanosecond:
            return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return t.strftime("%Y-%m-%dT%H:%M:%SZ")

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        if payload_col in df.columns:
            df = df[df[payload_col].notna()]
        if not len(df):
            return _pd.DataFrame(
                {
                    "path": _pd.Series([], dtype="string"),
                    "n_records": _pd.Series([], dtype="int64"),
                    "n_bytes": _pd.Series([], dtype="int64"),
                }
            )
        out = bytearray()
        for _, row in df.iterrows():
            payload = bytes(row[payload_col])
            date = _date(row[ts_col]) if ts_col is not None else "1970-01-01T00:00:00Z"
            envelope = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": str(row[url_col]),
                        "WARC-Date": date,
                        "WARC-Type": "response",
                        "Content-Length": str(len(payload)),
                    },
                    "Payload-Metadata": {
                        "Actual-Content-Length": str(len(payload)),
                    },
                }
            }
            html_meta = _html_metadata(payload)
            if html_meta is not None:
                envelope["Envelope"]["Payload-Metadata"][
                    "HTTP-Response-Metadata"
                ] = {"HTML-Metadata": html_meta}
            body = _json.dumps(
                envelope, sort_keys=True, separators=(",", ":")
            ).encode("utf-8")
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: metadata\r\n"
                + f"WARC-Target-URI: {row[url_col]}\r\n".encode()
                + f"WARC-Date: {date}\r\n".encode()
                + b"Content-Type: application/json\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
                + b"\r\n\r\n"
            )
            out += _gzip.compress(rec)
        tag = hashlib.md5(
            b"\x00".join(str(u).encode() for u in df[url_col])
        ).hexdigest()[:16]
        name = f"wat-{tag}-{len(df)}.warc.wat.gz"
        path = _os.path.join(out_dir, name)
        tmp = f"{path}.{_os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(out))
        _os.replace(tmp, path)
        return _pd.DataFrame(
            {
                "path": _pd.Series([path], dtype="string"),
                "n_records": _pd.Series([len(df)], dtype="int64"),
                "n_bytes": _pd.Series([len(out)], dtype="int64"),
            }
        )

    return ds.map_batches(dump, batch_format="pandas").to_pandas()


def read_wat_index(paths: str | list[str]) -> rd.Dataset:
    """WAT shards → a flat head-metadata index Dataset: one row per
    ``metadata`` record with columns (url, warc_ts, title, html_lang,
    n_links, payload_len). Rows whose envelope has no HTML-Metadata
    (non-HTML captures) carry null title/html_lang and n_links = 0 —
    they are real captures, not parse errors, so they stay.

    Parallelism is FILE-granular like ``read_pages_from_warc``; shards
    stream through the same bounded-buffer gzip-member walk."""
    import json as _json

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        titles: list[str | None] = []
        langs: list[str | None] = []
        nlinks: list[int] = []
        plens: list[int] = []
        for blob in batch["bytes"]:
            buf = bytes(blob)
            recs = (
                _iter_warc_records_stream(_gzip_chunks(buf))
                if buf[:2] == b"\x1f\x8b"
                else _iter_warc_records(buf)
            )
            for headers, block in recs:
                if headers.get("warc-type", "").lower() != "metadata":
                    continue
                try:
                    env = _json.loads(block.decode("utf-8"))["Envelope"]
                except (ValueError, KeyError, UnicodeDecodeError):
                    continue  # one damaged record costs one row
                pm = env.get("Payload-Metadata", {})
                hm = pm.get("HTTP-Response-Metadata", {}).get("HTML-Metadata")
                urls.append(headers.get("warc-target-uri", ""))
                tss.append(_warc_ts(headers.get("warc-date", "")))
                try:
                    plens.append(int(pm.get("Actual-Content-Length", 0)))
                except (TypeError, ValueError):
                    plens.append(0)  # damaged length degrades, never kills
                if hm is None:
                    titles.append(None)
                    langs.append(None)
                    nlinks.append(0)
                else:
                    titles.append(hm.get("Head", {}).get("Title"))
                    langs.append(hm.get("Head", {}).get("Lang"))
                    nlinks.append(len(hm.get("Links", [])))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "title": pa.array(titles, pa.string()),
                "html_lang": pa.array(langs, pa.string()),
                "n_links": pa.array(nlinks, pa.int64()),
                "payload_len": pa.array(plens, pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="numpy")

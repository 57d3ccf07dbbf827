"""MP4 / ISO-BMFF container metadata — stdlib + struct only.

Web crawls carry video as MP4 far more often than any raw frame format;
the curation-relevant signal (duration, geometry, track layout, sample
count) lives entirely in the ``moov`` box tree and needs NO codec. This
module parses that tree for real — box walk with 32/64-bit sizes,
``mvhd``/``tkhd``/``mdhd`` version 0 and 1 layouts, handler types, sample
tables — while FRAME decode (H.264/H.265 entropy coding) remains the
documented external-decoder seam, exactly like lossy audio in
``stages/media.py``.

Implements the public ISO/IEC 14496-12 base-media file format:

* box framing: ``size(u32) type(4cc)``, ``size==1`` → 64-bit largesize,
  ``size==0`` → box extends to end of file; unknown boxes are skipped by
  size (forward compatibility — the normal case in the wild);
* ``ftyp`` major/compatible brands;
* ``moov/mvhd``: movie timescale + duration (v0 32-bit, v1 64-bit);
* per ``trak``: ``tkhd`` (16.16 fixed-point presentation width/height),
  ``mdia/mdhd`` (media timescale/duration), ``mdia/hdlr`` (handler type:
  ``vide``/``soun``/...), ``stbl/stsz`` (sample count, default size);
* fragmented files (``moof``) are detected and counted.

``make_mp4`` builds a valid minimal file (ftyp + moov tree + mdat) used
by tests and the ``mp4_real_meta`` query.

Corrupt/truncated payloads raise ``UnsupportedMp4Error`` → failed rows at
the engine seam.
"""

from __future__ import annotations

import struct

__all__ = [
    "UnsupportedMp4Error",
    "parse_mp4",
    "make_mp4",
    "Mp4VideoEngine",
]


class UnsupportedMp4Error(ValueError):
    """Corrupt / truncated / non-BMFF payloads — the parser seam."""


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise UnsupportedMp4Error("truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise UnsupportedMp4Error("truncated largesize")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            if size < 16:
                raise UnsupportedMp4Error("bad largesize")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise UnsupportedMp4Error(f"bad box size {size}")
        if pos + size > end:
            raise UnsupportedMp4Error("box overruns container")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """(version, body offset after version+flags)."""
    return data[pos], pos + 4


def parse_mp4(payload: bytes) -> dict:
    """Parse ISO-BMFF → dict: ``major_brand``, ``duration_ms``,
    ``timescale``, ``n_tracks``, ``n_fragments``, and ``tracks`` — a list
    of per-track dicts (handler, width, height, timescale, duration_ms,
    n_samples)."""
    if len(payload) < 16:
        raise UnsupportedMp4Error("too short for BMFF")
    if payload[4:8] != b"ftyp":
        raise UnsupportedMp4Error("missing ftyp")
    out: dict = {"major_brand": "", "duration_ms": 0, "timescale": 0,
                 "n_tracks": 0, "n_fragments": 0, "tracks": []}
    moov = None
    for btype, body, bend in _iter_boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            out["major_brand"] = payload[body : body + 4].decode(
                "ascii", "replace"
            )
        elif btype == b"moov":
            moov = (body, bend)
        elif btype == b"moof":
            out["n_fragments"] += 1
    if moov is None:
        raise UnsupportedMp4Error("missing moov")

    mvhd = _find(payload, *moov, b"mvhd")
    if mvhd is None:
        raise UnsupportedMp4Error("missing mvhd")
    ver, p = _fullbox(payload, mvhd[0])
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", payload, p + 8)
    if not timescale:
        raise UnsupportedMp4Error("zero movie timescale")
    out["timescale"] = timescale
    out["duration_ms"] = duration * 1000 // timescale

    for btype, tbody, tend in _iter_boxes(payload, *moov):
        if btype != b"trak":
            continue
        out["n_tracks"] += 1
        track = {"handler": "", "width": 0, "height": 0,
                 "timescale": 0, "duration_ms": 0, "n_samples": 0}
        tkhd = _find(payload, tbody, tend, b"tkhd")
        if tkhd:
            ver, p = _fullbox(payload, tkhd[0])
            geo = p + (32 if ver == 1 else 20) + 52
            if geo + 8 <= tkhd[1]:
                w_fx, h_fx = struct.unpack_from(">II", payload, geo)
                track["width"] = w_fx >> 16
                track["height"] = h_fx >> 16
        mdia = _find(payload, tbody, tend, b"mdia")
        if mdia:
            mdhd = _find(payload, *mdia, b"mdhd")
            if mdhd:
                ver, p = _fullbox(payload, mdhd[0])
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, p + 16)
                else:
                    ts, dur = struct.unpack_from(">II", payload, p + 8)
                track["timescale"] = ts
                track["duration_ms"] = dur * 1000 // ts if ts else 0
            hdlr = _find(payload, *mdia, b"hdlr")
            if hdlr:
                track["handler"] = payload[hdlr[0] + 8 : hdlr[0] + 12].decode(
                    "ascii", "replace"
                )
            minf = _find(payload, *mdia, b"minf")
            if minf:
                stbl = _find(payload, *minf, b"stbl")
                if stbl:
                    stsz = _find(payload, *stbl, b"stsz")
                    if stsz:
                        _, p = _fullbox(payload, stsz[0])
                        _dflt, count = struct.unpack_from(">II", payload, p)
                        track["n_samples"] = count
        out["tracks"].append(track)
    return out


# --------------------------------------------------------------------------
# Encoder (minimal valid file for fixtures)
# --------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _fullbox_bytes(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


def make_mp4(
    duration_ms: int,
    width: int,
    height: int,
    n_samples: int,
    timescale: int = 1000,
    with_audio: bool = False,
    version1: bool = False,
) -> bytes:
    """Minimal valid BMFF: ftyp + moov (mvhd + video trak, optional audio
    trak) + mdat. ``version1`` emits 64-bit mvhd/mdhd layouts so both
    parser paths are exercised."""
    dur = duration_ms * timescale // 1000

    def mvhd() -> bytes:
        if version1:
            body = struct.pack(">QQIQ", 0, 0, timescale, dur)
        else:
            body = struct.pack(">IIII", 0, 0, timescale, dur)
        body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        body += b"\x00" * 10 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000,
                                           0, 0, 0, 0x40000000)
        body += b"\x00" * 24 + struct.pack(">I", 3)
        return _fullbox_bytes(b"mvhd", 1 if version1 else 0, body)

    def trak(handler: bytes, w: int, h: int, count: int) -> bytes:
        tk = struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", dur)
        tk += b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        tk += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
        tk += struct.pack(">II", w << 16, h << 16)
        tkhd = _fullbox_bytes(b"tkhd", 0, tk)
        if version1:
            md = struct.pack(">QQIQ", 0, 0, timescale, dur) + struct.pack(
                ">HH", 0x55C4, 0
            )
            mdhd = _fullbox_bytes(b"mdhd", 1, md)
        else:
            md = struct.pack(">IIII", 0, 0, timescale, dur) + struct.pack(
                ">HH", 0x55C4, 0
            )
            mdhd = _fullbox_bytes(b"mdhd", 0, md)
        hdlr = _fullbox_bytes(
            b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00"
        )
        stsz = _fullbox_bytes(b"stsz", 0, struct.pack(">II", 0, count)
                              + b"".join(struct.pack(">I", 16) for _ in range(count)))
        stbl = _box(b"stbl", stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak(b"vide", width, height, n_samples)
    if with_audio:
        traks += trak(b"soun", 0, 0, max(1, n_samples // 2))
    moov = _box(b"moov", mvhd() + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"\x00" * (16 * n_samples))
    return ftyp + moov + mdat


# --------------------------------------------------------------------------
# AVIF / HEIF still images (same container, meta-box item tree)
# --------------------------------------------------------------------------

_IMAGE_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"}


def parse_avif(payload: bytes) -> dict:
    """AVIF/HEIF geometry from the ``meta`` item tree: ``iprp/ipco/ispe``
    (ImageSpatialExtents — the normative size property every coded image
    item must carry), plus ``pitm`` presence and the ipco property count.
    The AV1/HEVC payload itself stays the external-codec seam."""
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise UnsupportedMp4Error("missing ftyp")
    brand = payload[8:12]
    if brand not in _IMAGE_BRANDS:
        raise UnsupportedMp4Error(f"not an image brand: {brand!r}")
    meta = None
    for btype, body, bend in _iter_boxes(payload, 0, len(payload)):
        if btype == b"meta":
            meta = (body + 4, bend)  # meta is a FullBox
            break
    if meta is None:
        raise UnsupportedMp4Error("missing meta box")
    iprp = _find(payload, *meta, b"iprp")
    if iprp is None:
        raise UnsupportedMp4Error("missing iprp")
    ipco = _find(payload, *iprp, b"ipco")
    if ipco is None:
        raise UnsupportedMp4Error("missing ipco")
    width = height = 0
    n_props = 0
    for btype, body, bend in _iter_boxes(payload, *ipco):
        n_props += 1
        if btype == b"ispe" and width == 0:
            _, p = _fullbox(payload, body)
            width, height = struct.unpack_from(">II", payload, p)
    if not width or not height:
        raise UnsupportedMp4Error("no ispe property")
    has_pitm = _find(payload, *meta, b"pitm") is not None
    return {
        "major_brand": brand.decode("ascii", "replace"),
        "width": width,
        "height": height,
        "n_props": n_props,
        "has_pitm": has_pitm,
    }


def make_avif(width: int, height: int, brand: bytes = b"avif") -> bytes:
    """Minimal valid AVIF/HEIF shell: ftyp + meta(hdlr/pitm/iprp/ipco with
    ispe + a decoy property) + an empty mdat. Carries no coded image data —
    geometry-only, like real thumbnail probes."""
    ispe = _fullbox_bytes(b"ispe", 0, struct.pack(">II", width, height))
    decoy = _box(b"av1C", b"\x81\x04\x0c\x00")
    ipco = _box(b"ipco", ispe + decoy)
    ipma = _fullbox_bytes(
        b"ipma", 0, struct.pack(">I", 1) + struct.pack(">HBB", 1, 1, 0x81)
    )
    iprp = _box(b"iprp", ipco + ipma)
    hdlr = _fullbox_bytes(b"hdlr", 0, struct.pack(">I", 0) + b"pict" + b"\x00" * 13)
    pitm = _fullbox_bytes(b"pitm", 0, struct.pack(">H", 1))
    meta = _box(b"meta", bytes(4) + hdlr + pitm + iprp)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    return ftyp + meta + _box(b"mdat", b"")


class AvifImageEngine:
    """Engine-seam wrapper: AVIF/HEIF container geometry → typed metadata;
    AV1/HEVC pixel decode = the documented external-codec seam."""

    name = "avif-meta"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        meta = parse_avif(payload)
        return EngineResult(
            text=(
                f"[image {meta['width']}x{meta['height']} "
                f"brand={meta['major_brand']}]"
            ),
            page_count=1,
            metadata={
                "engine": self.name,
                "major_brand": meta["major_brand"],
                "width": str(meta["width"]),
                "height": str(meta["height"]),
                "n_props": str(meta["n_props"]),
            },
        )


class Mp4VideoEngine:
    """Engine-seam wrapper: MP4 container → typed metadata (duration,
    geometry, tracks, sample count). Frame decode = external-codec seam."""

    name = "mp4-meta"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        meta = parse_mp4(payload)
        vid = next(
            (t for t in meta["tracks"] if t["handler"] == "vide"),
            meta["tracks"][0] if meta["tracks"] else None,
        )
        w = vid["width"] if vid else 0
        h = vid["height"] if vid else 0
        n = vid["n_samples"] if vid else 0
        return EngineResult(
            text=(
                f"[video {w}x{h} {meta['duration_ms']}ms "
                f"tracks={meta['n_tracks']} samples={n}]"
            ),
            page_count=1,
            metadata={
                "engine": self.name,
                "major_brand": meta["major_brand"],
                "duration_ms": str(meta["duration_ms"]),
                "width": str(w),
                "height": str(h),
                "n_tracks": str(meta["n_tracks"]),
                "n_samples": str(n),
            },
        )

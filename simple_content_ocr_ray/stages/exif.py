"""From-scratch EXIF (APP1 / TIFF-IFD) metadata parsing for JPEG payloads.

A web-scale image pipeline needs EXIF before it needs pixels: the
Orientation tag decides whether a decode must be rotated, camera
Make/Model/DateTime drive provenance dedup, and PixelX/YDimension gives
dimensions without entropy-decoding anything. The reference reads these
through PIL (``adapters/deepseek_engine.py`` image handling); this module
is the stdlib-only equivalent: a JPEG marker walk to the ``Exif\\x00\\x00``
APP1 segment, then a TIFF parse — byte-order header (``II``/``MM``),
magic 42, IFD0 entry walk (tag/type/count/value-or-offset, values ≤4 bytes
inline per the TIFF left-justification rule), and the 0x8769 ExifIFD
sub-directory.

``make_exif_app1`` is the writer side (tests/fixtures): it emits a valid
APP1 block in either byte order, with out-of-line ASCII values and a
correctly linked sub-IFD, so the parser is exercised against real binary
layout rather than a hand-mirrored dict.
"""

from __future__ import annotations

import struct

#: tags this module surfaces (all public TIFF/EXIF assignments)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

#: GPS-IFD tag assignments (EXIF 2.3 §4.6.6)
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


class ExifError(ValueError):
    """Malformed EXIF/TIFF structure (bad magic, offset out of range)."""


def exif_app1_payload(jpeg: bytes) -> bytes | None:
    """TIFF bytes of the first ``Exif\\x00\\x00`` APP1 segment, or None when
    the payload carries no EXIF. Walks marker segments only (stops at SOS —
    EXIF after entropy data is not a thing real writers produce)."""
    if jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return None
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: no EXIF past here
            return None
        seglen = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        if seglen < 2:
            return None
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10 : pos + 2 + seglen]
        pos += 2 + seglen
    return None


def _parse_ifd(tiff: bytes, off: int, e: str) -> dict[int, object]:
    if off < 0 or off + 2 > len(tiff):
        raise ExifError("IFD offset out of range")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    out: dict[int, object] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(tiff):
            raise ExifError("truncated IFD entry table")
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, p)
        size = _TYPE_SIZE.get(typ)
        if size is None:  # unknown type: spec says readers skip the entry
            continue
        total = size * cnt
        if total <= 4:
            vp = p + 8  # inline, left-justified in the value field
        else:
            (vp,) = struct.unpack_from(e + "I", tiff, p + 8)
            if vp + total > len(tiff):
                raise ExifError("value offset out of range")
        if typ == 2:  # ASCII, NUL-terminated
            out[tag] = tiff[vp : vp + cnt].split(b"\x00")[0].decode("latin-1")
        elif typ == 3:
            vals = struct.unpack_from(e + f"{cnt}H", tiff, vp)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ == 4:
            vals = struct.unpack_from(e + f"{cnt}I", tiff, vp)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ == 1:
            out[tag] = tiff[vp] if cnt == 1 else tiff[vp : vp + cnt]
        else:  # RATIONAL: (numerator, denominator) pairs
            vals = struct.unpack_from(e + f"{2 * cnt}I", tiff, vp)
            rats = [(vals[2 * j], vals[2 * j + 1]) for j in range(cnt)]
            out[tag] = rats[0] if cnt == 1 else rats
    return out


def parse_exif(jpeg: bytes) -> dict[str, object] | None:
    """Focused EXIF dict of a JPEG payload (None when no EXIF present):
    byte_order ("II"/"MM"), orientation, make, model, datetime, pixel_x,
    pixel_y — missing tags are None. Raises ``ExifError`` on a structurally
    broken APP1 (callers in the extraction path turn that into a failed
    ROW, never a failed task)."""
    tiff = exif_app1_payload(jpeg)
    if tiff is None:
        return None
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ExifError("bad TIFF byte-order mark")
    if len(tiff) < 8:
        raise ExifError("truncated TIFF header")
    (magic,) = struct.unpack_from(e + "H", tiff, 2)
    if magic != 42:
        raise ExifError("bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, ifd0_off, e)
    sub: dict[int, object] = {}
    ptr = ifd0.get(TAG_EXIF_IFD)
    if isinstance(ptr, int):
        sub = _parse_ifd(tiff, ptr, e)
    gps_lat = gps_lon = None
    gptr = ifd0.get(TAG_GPS_IFD)
    if isinstance(gptr, int):
        g = _parse_ifd(tiff, gptr, e)

        def dec(rats, ref, neg) -> float | None:
            if not isinstance(rats, list) or len(rats) != 3:
                return None
            try:
                d, m, s = (num / den for num, den in rats)
            except ZeroDivisionError:
                return None
            v = round(d + m / 60 + s / 3600, 6)
            return -v if ref == neg else v

        gps_lat = dec(g.get(GPS_LAT), g.get(GPS_LAT_REF), "S")
        gps_lon = dec(g.get(GPS_LON), g.get(GPS_LON_REF), "W")
    return {
        "byte_order": tiff[:2].decode("ascii"),
        "orientation": ifd0.get(TAG_ORIENTATION),
        "make": ifd0.get(TAG_MAKE),
        "model": ifd0.get(TAG_MODEL),
        "datetime": ifd0.get(TAG_DATETIME),
        "pixel_x": sub.get(TAG_PIXEL_X),
        "pixel_y": sub.get(TAG_PIXEL_Y),
        "gps_lat": gps_lat,
        "gps_lon": gps_lon,
    }


def _build_ifd(
    entries: list[tuple[int, int, int, bytes]],
    base: int,
    e: str,
    ptrs: dict[int, int] | None,
) -> bytes:
    """One IFD at absolute TIFF offset ``base``: entry table + next-IFD=0 +
    out-of-line values. ``ptrs`` substitutes sub-IFD pointer values by tag
    (two-pass linking — pointer size never changes IFD length)."""
    n = len(entries)
    ifd_len = 2 + 12 * n + 4
    table = struct.pack(e + "H", n)
    data = bytearray()
    for tag, typ, cnt, raw in sorted(entries):
        if ptrs is not None and tag in ptrs:
            raw = struct.pack(e + "I", ptrs[tag])
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(e + "I", base + ifd_len + len(data))
            data += raw
            if len(data) % 2:  # TIFF values start on even offsets
                data += b"\x00"
        table += struct.pack(e + "HHI", tag, typ, cnt) + val
    return table + struct.pack(e + "I", 0) + bytes(data)


def make_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    big_endian: bool = False,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """A complete APP1 EXIF segment (marker + length + Exif header + TIFF)
    carrying the given tags; ``big_endian`` selects the MM byte order.
    ``gps`` is (lat, lon) in signed decimal degrees, written as the
    standard GPS IFD (ref letters + degree/minute/centisecond rationals)."""
    e = ">" if big_endian else "<"

    def ascii_entry(tag: int, s: str) -> tuple[int, int, int, bytes]:
        raw = s.encode("latin-1") + b"\x00"
        return (tag, 2, len(raw), raw)

    ifd0: list[tuple[int, int, int, bytes]] = [
        (TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation))
    ]
    if make is not None:
        ifd0.append(ascii_entry(TAG_MAKE, make))
    if model is not None:
        ifd0.append(ascii_entry(TAG_MODEL, model))
    if datetime is not None:
        ifd0.append(ascii_entry(TAG_DATETIME, datetime))
    sub: list[tuple[int, int, int, bytes]] = []
    if pixel_x is not None:
        sub.append((TAG_PIXEL_X, 4, 1, struct.pack(e + "I", pixel_x)))
    if pixel_y is not None:
        sub.append((TAG_PIXEL_Y, 4, 1, struct.pack(e + "I", pixel_y)))
    if sub:
        ifd0.append((TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", 0)))

    gps_ifd: list[tuple[int, int, int, bytes]] = []
    if gps is not None:
        lat, lon = gps

        def dms(v: float) -> bytes:
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            cs = round(((v - d) * 60 - m) * 60 * 100)
            return struct.pack(e + "6I", d, 1, m, 1, cs, 100)

        gps_ifd = [
            (GPS_LAT_REF, 2, 2, (b"N" if lat >= 0 else b"S") + b"\x00"),
            (GPS_LAT, 5, 3, dms(lat)),
            (GPS_LON_REF, 2, 2, (b"E" if lon >= 0 else b"W") + b"\x00"),
            (GPS_LON, 5, 3, dms(lon)),
        ]
        ifd0.append((TAG_GPS_IFD, 4, 1, struct.pack(e + "I", 0)))

    header = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    # pass 1 sizes each IFD (pointer values do not change lengths)
    ifd0_bytes = _build_ifd(ifd0, 8, e, ptrs={TAG_EXIF_IFD: 0, TAG_GPS_IFD: 0})
    sub_off = 8 + len(ifd0_bytes)
    sub_bytes = _build_ifd(sub, sub_off, e, ptrs=None) if sub else b""
    gps_off = sub_off + len(sub_bytes)
    gps_bytes = _build_ifd(gps_ifd, gps_off, e, ptrs=None) if gps_ifd else b""
    tiff = (
        header
        + _build_ifd(
            ifd0, 8, e, ptrs={TAG_EXIF_IFD: sub_off, TAG_GPS_IFD: gps_off}
        )
        + sub_bytes
        + gps_bytes
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def strip_exif(jpeg: bytes) -> bytes:
    """JPEG with its first ``Exif\\x00\\x00`` APP1 segment removed (the
    payload is otherwise untouched); no-EXIF payloads return unchanged."""
    if jpeg[:2] != b"\xff\xd8":
        return jpeg
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            return jpeg
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):
            return jpeg
        seglen = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        if seglen < 2:
            return jpeg
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return jpeg[:pos] + jpeg[pos + 2 + seglen :]
        pos += 2 + seglen
    return jpeg


def scrub_exif_gps(jpeg: bytes) -> tuple[bytes, bool]:
    """Privacy scrub: (payload, had_gps). A payload whose EXIF carries GPS
    coordinates gets its APP1 REBUILT from the modeled tags (orientation /
    camera / datetime / pixel dims) without the GPS IFD — the conservative
    choice: unmodeled exotic tags are dropped rather than risk leaking
    location through a tag this module does not understand. GPS-free
    payloads return byte-identical."""
    meta = parse_exif(jpeg)
    if meta is None or (meta["gps_lat"] is None and meta["gps_lon"] is None):
        return jpeg, False
    app1 = make_exif_app1(
        orientation=meta["orientation"] or 1,
        make=meta["make"],
        model=meta["model"],
        datetime=meta["datetime"],
        pixel_x=meta["pixel_x"],
        pixel_y=meta["pixel_y"],
        big_endian=meta["byte_order"] == "MM",
    )
    return insert_exif(strip_exif(jpeg), app1), True


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment directly after SOI (where real cameras and
    editors put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]

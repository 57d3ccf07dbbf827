"""MPEG-1 Layer III (MP3) frame-header walk + ID3v2.3 tag parse — REAL
bitstream metadata for the web's most common audio payload, from scratch.

The reference's media surface stops at content-type routing
(`/root/reference/src/simple_ocr/services/ocr_service.py:234-242` routes
unsupported types to failed rows); this module extends the repo's audio
family (WAV PCM + FLAC in `stages/media.py` / `stages/flac_codec.py`) with
the header-level MP3 parse every crawl-scale media pipeline needs: duration,
per-frame bitrate (VBR-safe — the walk visits every frame, it does not trust
frame 0), sample rate, and the ID3v2 title/artist text frames.

Scope (documented seam, same policy as FLAC-vs-lossy in `stages/media.py`):
frame HEADERS are fully parsed — sync, version, layer, bitrate/samplerate
tables, padding, frame length — but the Huffman-coded audio payload is not
decoded (ISO 11172-3 entropy tables; out of scope for metadata extraction).
Corrupt/truncated streams raise ``Mp3Error`` — callers map it to a failed
ROW, never a failed task.

Format facts used (public spec, ISO/IEC 11172-3 + ID3v2.3 informal standard):
- frame sync = 11 set bits; MPEG-1 = version bits ``11``; Layer III = ``01``
- frame bytes = 144 * bitrate / samplerate + padding   (Layer III, MPEG-1)
- samples per frame = 1152 (MPEG-1 Layer III)
- ID3v2 size = 4 syncsafe bytes (7 bits each); v2.3 frame size = plain u32
"""

from __future__ import annotations

import struct

__all__ = [
    "Mp3Error",
    "parse_mp3",
    "synth_mp3",
    "BITRATE_KBPS",
    "SAMPLE_RATES",
    "SAMPLES_PER_FRAME",
]


class Mp3Error(ValueError):
    """Raised for any malformed / truncated / unsupported MP3 payload."""


#: MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit field
#: (index 0 = "free" and 15 = invalid — both rejected here).
BITRATE_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
)

#: MPEG-1 sample-rate table, Hz, indexed by the 2-bit field (3 = reserved).
SAMPLE_RATES = (44100, 48000, 32000, None)

SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_text(payload: bytes) -> str:
    """Decode one ID3v2.3 text-frame payload (leading encoding byte)."""
    if not payload:
        return ""
    enc, rest = payload[0], payload[1:]
    try:
        if enc == 0:
            return rest.decode("latin-1").rstrip("\x00")
        if enc == 1:
            return rest.decode("utf-16").rstrip("\x00")
        if enc == 3:
            return rest.decode("utf-8").rstrip("\x00")
    except UnicodeDecodeError as e:
        raise Mp3Error(f"undecodable ID3 text frame: {e}") from e
    raise Mp3Error(f"unsupported ID3 text encoding {enc}")


def parse_id3v2(data: bytes) -> tuple[dict[str, str], int]:
    """Parse a leading ID3v2.3/2.4 tag, honoring the header FLAGS byte:
    unsynchronisation (0x80 — ``FF 00`` → ``FF`` over the tag body),
    extended header (0x40 — skipped; v2.3 size excludes itself, v2.4
    syncsafe size includes itself), and the v2.4 footer (0x10 — 10 extra
    trailer bytes consumed so the frame walk resumes at the first MPEG
    frame, not at the ``3DI`` footer). Returns (text frames by id, total
    tag bytes consumed); ({}, 0) when no tag is present."""
    if len(data) < 10 or data[:3] != b"ID3":
        return {}, 0
    major = data[3]
    if major not in (3, 4):
        raise Mp3Error(f"unsupported ID3v2.{major}")
    flags = data[5]
    size = _syncsafe(data[6:10])
    consumed = 10 + size + (10 if (major == 4 and flags & 0x10) else 0)
    if consumed > len(data):
        raise Mp3Error("ID3 tag extends past payload")
    body = data[10 : 10 + size]
    # v2.3: unsynchronisation is tag-wide — sizes are plain u32 counts of the
    # DE-unsynced data, so a global FF 00 -> FF replace keeps the walk aligned.
    # v2.4: frame size fields are syncsafe counts of the STORED (still-unsynced)
    # frame data, so the replace must happen PER FRAME after reading each size;
    # a tag-wide replace would shift every subsequent frame boundary.
    if major == 3 and flags & 0x80:
        body = body.replace(b"\xff\x00", b"\xff")
    tag_unsync_v4 = major == 4 and bool(flags & 0x80)
    pos = 0
    if flags & 0x40:  # extended header
        if len(body) < 4:
            raise Mp3Error("truncated ID3 extended header")
        if major == 4:
            pos = _syncsafe(body[0:4])  # size INCLUDES itself
        else:
            pos = 4 + struct.unpack(">I", body[0:4])[0]  # size EXCLUDES itself
        if pos > len(body):
            raise Mp3Error("ID3 extended header out of range")
    frames: dict[str, str] = {}
    while pos + 10 <= len(body):
        fid = body[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        fsize = (
            _syncsafe(body[pos + 4 : pos + 8])
            if major == 4
            else struct.unpack(">I", body[pos + 4 : pos + 8])[0]
        )
        fmt = body[pos + 9]  # second flags byte (format flags)
        fbody = body[pos + 10 : pos + 10 + fsize]
        if len(fbody) < fsize:
            raise Mp3Error("ID3 frame truncated")
        # compression/encryption: v2.3 format byte %(i)compress(j)encrypt...,
        # v2.4 %0h00kmnp with k=compress(0x08) m=encrypt(0x04). Such frames
        # are NOT raw text — skip them rather than decode garbage.
        compressed = (fmt & 0xC0) if major == 3 else (fmt & 0x0C)
        if fid.startswith(b"T") and not compressed:
            if major == 4:
                if tag_unsync_v4 or fmt & 0x02:  # per-frame de-unsync
                    fbody = fbody.replace(b"\xff\x00", b"\xff")
                if fmt & 0x01:  # data length indicator prefix (4 syncsafe)
                    fbody = fbody[4:]
            frames[fid.decode("latin-1")] = _id3_text(fbody)
        pos += 10 + fsize
    return frames, consumed


def parse_mp3(data: bytes) -> dict:
    """Walk every MPEG-1 Layer III frame and return
    ``{title, artist, frame_count, sample_rate, duration_ms,
    avg_bitrate_kbps, truncated}``.

    ``duration_ms`` and ``avg_bitrate_kbps`` use exact integer arithmetic
    (floor division) so the value is reproducible bit-for-bit by the SQL
    oracle. A final PARTIAL frame (header claims more bytes than remain) is
    reported via ``truncated=True`` and excluded from every figure — the
    classic shape of a connection-reset crawl capture."""
    tags, pos = parse_id3v2(data)
    n = 0
    kbps_sum = 0
    rate: int | None = None
    truncated = False
    ln = len(data)
    while pos < ln:
        if ln - pos < 4:
            truncated = True
            break
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        if (b1 >> 3) & 0x3 != 0x3:
            raise Mp3Error("not MPEG-1")
        if (b1 >> 1) & 0x3 != 0x1:
            raise Mp3Error("not Layer III")
        kbps = BITRATE_KBPS[(b2 >> 4) & 0xF]
        sr = SAMPLE_RATES[(b2 >> 2) & 0x3]
        if kbps is None or sr is None:
            raise Mp3Error("invalid bitrate/samplerate index")
        if rate is None:
            rate = sr
        elif sr != rate:
            raise Mp3Error("sample rate changes mid-stream")
        pad = (b2 >> 1) & 0x1
        flen = 144 * kbps * 1000 // sr + pad
        if pos + flen > ln:
            truncated = True
            break
        n += 1
        kbps_sum += kbps
        pos += flen
    if n == 0:
        raise Mp3Error("no complete MPEG frame")
    assert rate is not None
    return {
        "title": tags.get("TIT2", ""),
        "artist": tags.get("TPE1", ""),
        "frame_count": n,
        "sample_rate": rate,
        "duration_ms": n * SAMPLES_PER_FRAME * 1000 // rate,
        "avg_bitrate_kbps": kbps_sum // n,
        "truncated": truncated,
    }


# --------------------------------------------------------------------------
# Deterministic synthesis (fixture side — never consulted by the parser)
# --------------------------------------------------------------------------


def _id3_frame(fid: str, text: str) -> bytes:
    body = b"\x00" + text.encode("latin-1")
    return fid.encode() + struct.pack(">I", len(body)) + b"\x00\x00" + body


def synth_mp3(d: int) -> bytes:
    """Deterministic VBR MPEG-1 Layer III stream for doc ``d``:
    ID3v2.3 tag (TIT2/TPE1 + a non-text decoy frame), ``8 + d % 9`` frames
    whose bitrate index cycles ``1 + (d + i) % 14`` (so a parser that trusts
    frame 0's header gets every VBR doc wrong), sample rate by ``d % 3``,
    padding bit ``(d + i) % 2``, and frame payloads deliberately seeded with
    0xFF bytes so naive re-syncing explodes. Docs with ``d % 10 == 7`` end
    in a half-frame (truncated capture)."""
    frames = _id3_frame("TIT2", f"Track {d}") + _id3_frame(
        "TPE1", f"Artist {d % 23}"
    )
    # non-text decoy frame (binary private frame) — must be skipped, not parsed
    frames += b"PRIV" + struct.pack(">I", 6) + b"\x00\x00" + b"x\xff\xffy\x00z"
    tag_size = len(frames)
    header = b"ID3\x03\x00\x00" + bytes(
        [(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
         (tag_size >> 7) & 0x7F, tag_size & 0x7F]
    )
    out = bytearray(header + frames)
    sr_idx = d % 3
    sr = SAMPLE_RATES[sr_idx]
    n = 8 + d % 9
    for i in range(n):
        br_idx = 1 + (d + i) % 14
        kbps = BITRATE_KBPS[br_idx]
        pad = (d + i) % 2
        flen = 144 * kbps * 1000 // sr + pad
        hdr = bytes(
            [
                0xFF,
                0xFB,  # MPEG-1, Layer III, no CRC
                (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                0x40,  # joint stereo
            ]
        )
        body = bytes((d + i + 7 * j) % 256 for j in range(flen - 4))
        out += hdr + body
    if d % 10 == 7:  # truncated final frame: header + half its body
        br_idx = 1 + (d + n) % 14
        pad = (d + n) % 2
        flen = 144 * BITRATE_KBPS[br_idx] * 1000 // sr + pad
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0x40])
        out += hdr + bytes(flen // 2)
    return bytes(out)


class Mp3AudioEngine:
    """Engine-seam wrapper for the flagship route: ``mp3`` payloads (sniffed
    by the ID3v2 magic) → tag + frame-walk metadata. Like `Mp4VideoEngine`
    and the FLAC engine, the audio SAMPLES stay at the documented codec
    seam — metadata extraction is the route's contract."""

    name = "mp3-meta"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        m = parse_mp3(payload)
        return EngineResult(
            text=(
                f"[audio {m['sample_rate']}Hz {m['duration_ms']}ms "
                f"{m['avg_bitrate_kbps']}kbps frames={m['frame_count']}]"
            ),
            page_count=1,
            metadata={
                "engine": self.name,
                "title": m["title"],
                "artist": m["artist"],
                "sample_rate": str(m["sample_rate"]),
                "duration_ms": str(m["duration_ms"]),
                "avg_bitrate_kbps": str(m["avg_bitrate_kbps"]),
                "frame_count": str(m["frame_count"]),
                "truncated": str(m["truncated"]).lower(),
            },
        )

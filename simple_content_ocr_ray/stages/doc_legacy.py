"""Legacy Word 97–2003 ``.doc`` text extraction from scratch: a real
[MS-CFB] Compound File Binary reader/writer and the [MS-DOC] FIB →
Clx → piece-table text walk.

The reference lists legacy office types among its planned-but-stubbed
formats (`/root/reference/src/simple_ocr/config.py:118`,
`services/ocr_service.py:234-242` routes them to failed rows); the repo's
OOXML engine (`stages/ooxml_text.py`) covers the 2007+ zip formats — this
module closes the pre-2007 half of the office family the same way:
implement the PUBLISHED spec from scratch, synthesize spec-valid fixtures,
and prove a lossless text roundtrip.

What is real here (all from the public [MS-CFB] / [MS-DOC] specs):
- CFB v3 container: 512-byte sectors, header DIFAT + chained DIFAT
  sectors, FAT chain walk, directory-stream parse, miniFAT + ministream
  for streams under the 4096-byte cutoff (the writer deliberately places
  the 1Table stream in the MINISTREAM so the reader's miniFAT path is
  exercised on every document).
- Word layer: FIB base sanity (``wIdent`` 0xA5EC), the ``fWhichTblStm``
  bit selecting 0Table vs 1Table, ``fcClx``/``lcbClx`` from
  FibRgFcLcb97, Prc-entry skipping inside the Clx, the PlcPcd CP/PCD
  arrays, and per-piece ``fCompressed`` dispatch — compressed pieces are
  cp1252 bytes at ``fc/2``, uncompressed pieces UTF-16LE at ``fc``.

Out of scope (documented seam, like the codec seams in
`stages/media.py`): OLE encryption, fastsaved revision logs beyond the
piece table, and embedded objects — all raise ``DocError`` → failed ROW.

Corrupt input of any shape raises ``DocError`` (totality is fuzz-tested),
never an IndexError/struct.error — the pipeline's failed-row contract.
"""

from __future__ import annotations

import struct

__all__ = ["DocError", "read_cfb", "build_cfb", "make_doc", "parse_doc"]

_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_SECT = 512
_MINISECT = 64
_MINI_CUTOFF = 4096


class DocError(ValueError):
    """Raised for any malformed / truncated / unsupported CFB or DOC."""


# --------------------------------------------------------------------------
# CFB reader
# --------------------------------------------------------------------------


def _u32s(b: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(b) // 4}I", b[: len(b) // 4 * 4]))


def _sector(data: bytes, sid: int) -> bytes:
    off = 512 + sid * _SECT
    if sid >= 0xFFFFFFFA or off + _SECT > len(data):
        raise DocError(f"sector {sid} out of range")
    return data[off : off + _SECT]


def _chain(fat: list[int], start: int, what: str, cap: int = 1 << 20) -> list[int]:
    out: list[int] = []
    seen: set[int] = set()
    sid = start
    while sid != _ENDCHAIN:
        if sid in seen or len(out) > cap:
            raise DocError(f"FAT cycle in {what} chain")
        if sid >= len(fat):
            raise DocError(f"{what} chain leaves the FAT (sector {sid})")
        seen.add(sid)
        out.append(sid)
        sid = fat[sid]
    return out


def read_cfb(data: bytes) -> dict[str, bytes]:
    """Parse one CFB file → {stream name: bytes} for every stream object,
    walking the directory linearly (robust against broken sibling trees).
    Names keep their raw form including control-prefix names like
    ``\\x05SummaryInformation``."""
    if len(data) < 512 or data[:8] != _SIG:
        raise DocError("not a CFB file")
    (major,) = struct.unpack_from("<H", data, 26)
    (byte_order,) = struct.unpack_from("<H", data, 28)
    (ssz,) = struct.unpack_from("<H", data, 30)
    if byte_order != 0xFFFE or major not in (3, 4) or ssz != 9:
        raise DocError("unsupported CFB variant (need v3, 512-byte sectors)")
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (dir_start,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (minifat_start,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (difat_start,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)

    # DIFAT: 109 header entries, then chained DIFAT sectors (127 + next).
    difat = _u32s(data[76:512])
    sid, hops = difat_start, 0
    while sid != _ENDCHAIN and sid != _FREE:
        if hops > n_difat + 4:
            raise DocError("DIFAT chain cycle")
        sec = _u32s(_sector(data, sid))
        difat.extend(sec[:127])
        sid = sec[127]
        hops += 1
    fat_sids = [s for s in difat if s != _FREE][:n_fat]
    if len(fat_sids) < n_fat:
        raise DocError("DIFAT lists fewer FAT sectors than the header claims")
    fat: list[int] = []
    for s in fat_sids:
        fat.extend(_u32s(_sector(data, s)))

    def read_chain(start: int, size: int, what: str) -> bytes:
        out = b"".join(_sector(data, s) for s in _chain(fat, start, what))
        if len(out) < size:
            raise DocError(f"{what} chain shorter than its size")
        return out[:size]

    dirs = b"".join(_sector(data, s) for s in _chain(fat, dir_start, "directory"))
    entries = []
    for off in range(0, len(dirs), 128):
        e = dirs[off : off + 128]
        if len(e) < 128:
            break
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or not 2 <= name_len <= 64:
            continue
        try:
            name = e[: name_len - 2].decode("utf-16-le")
        except UnicodeDecodeError as exc:
            raise DocError("undecodable directory-entry name") from exc
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise DocError("no root directory entry")
    mini_raw = b""
    minifat: list[int] = []
    if root[3] > 0 and root[2] != _ENDCHAIN:
        mini_raw = read_chain(root[2], root[3], "ministream")
    if n_minifat and minifat_start != _ENDCHAIN:
        for s in _chain(fat, minifat_start, "miniFAT"):
            minifat.extend(_u32s(_sector(data, s)))

    def read_mini(start: int, size: int, what: str) -> bytes:
        out = bytearray()
        seen: set[int] = set()
        sid = start
        while sid != _ENDCHAIN:
            if sid in seen or sid >= len(minifat):
                raise DocError(f"miniFAT walk broken in {what}")
            seen.add(sid)
            lo = sid * _MINISECT
            if lo + _MINISECT > len(mini_raw):
                raise DocError(f"{what} minisector out of ministream range")
            out += mini_raw[lo : lo + _MINISECT]
            sid = minifat[sid]
        if len(out) < size:
            raise DocError(f"{what} mini chain shorter than its size")
        return bytes(out[:size])

    streams: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:
            continue
        if size < mini_cutoff:
            streams[name] = read_mini(start, size, name) if size else b""
        else:
            streams[name] = read_chain(start, size, name)
    return streams


# --------------------------------------------------------------------------
# CFB writer (fixture side — spec-valid v3 files, ministream included)
# --------------------------------------------------------------------------


def build_cfb(streams: dict[str, bytes]) -> bytes:
    """Serialize streams into a valid CFB v3 file. Streams under 4096 bytes
    go through the ministream + miniFAT exactly as the spec requires, so
    the reader's mini path is exercised by every fixture. Only files whose
    FAT fits the header's 109 DIFAT slots are produced (≈27 MB) — far above
    any fixture here."""
    names = list(streams)
    # ministream assembly
    mini_members = [n for n in names if len(streams[n]) < _MINI_CUTOFF]
    big_members = [n for n in names if len(streams[n]) >= _MINI_CUTOFF]
    mini_data = bytearray()
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for n in mini_members:
        b = streams[n]
        if not b:
            mini_start[n] = _ENDCHAIN
            continue
        k = (len(b) + _MINISECT - 1) // _MINISECT
        first = len(minifat)
        mini_start[n] = first
        minifat.extend(list(range(first + 1, first + k)) + [_ENDCHAIN])
        mini_data += b + b"\x00" * (k * _MINISECT - len(b))

    def pad_sect(b: bytes) -> bytes:
        k = (len(b) + _SECT - 1) // _SECT
        return bytes(b) + b"\x00" * (k * _SECT - len(b)) if b else b""

    mini_data = pad_sect(bytes(mini_data))
    minifat_raw = pad_sect(struct.pack(f"<{len(minifat)}I", *minifat))

    # directory: root + one entry per stream
    n_dir_entries = 1 + len(names)
    dir_sects = (n_dir_entries * 128 + _SECT - 1) // _SECT

    # sector layout: [dir][minifat][ministream][big streams][FAT sectors]
    plan: list[tuple[str, bytes]] = []
    plan.append(("__dir__", b"\x00" * (dir_sects * _SECT)))  # patched below
    if minifat_raw:
        plan.append(("__minifat__", minifat_raw))
    if mini_data:
        plan.append(("__ministream__", mini_data))
    for n in big_members:
        plan.append((n, pad_sect(streams[n])))

    start_of: dict[str, int] = {}
    sid = 0
    for key, blob in plan:
        start_of[key] = sid if blob else _ENDCHAIN
        sid += len(blob) // _SECT
    n_data_sects = sid

    # FAT: chains for each planned region, then the FAT sectors themselves
    fat: list[int] = [0] * n_data_sects
    for key, blob in plan:
        k = len(blob) // _SECT
        s0 = start_of[key]
        for i in range(k):
            fat[s0 + i] = s0 + i + 1 if i + 1 < k else _ENDCHAIN
    # FAT sector count (self-referential: adding FAT sectors may need more)
    n_fat = 0
    while True:
        need = (n_data_sects + n_fat + 127) // 128
        if need == n_fat:
            break
        n_fat = need
    fat_first = n_data_sects
    fat.extend([_FATSECT] * n_fat)
    fat_padded = fat + [_FREE] * (n_fat * 128 - len(fat))
    fat_raw = struct.pack(f"<{len(fat_padded)}I", *fat_padded)
    if n_fat > 109:
        raise DocError("fixture too large for header DIFAT")

    def dir_entry(name: str, etype: int, start: int, size: int,
                  left: int = _FREE, right: int = _FREE,
                  child: int = _FREE, red: bool = False) -> bytes:
        nm = name.encode("utf-16-le")
        if len(nm) > 62:
            raise DocError("stream name too long")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 0 if red else 1
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # Directory sibling tree ([MS-CFB] 2.6.4): a red-black BST ordered by
    # (name length, uppercased name). A median-split balanced BST colored
    # black except for its deepest level is a valid red-black tree (every
    # root→NIL path crosses the same number of black nodes), so external
    # readers that traverse the tree — not just this module's linear walk —
    # discover every stream.
    order = sorted(
        range(len(names)),
        key=lambda i: (len(names[i].encode("utf-16-le")), names[i].upper()),
    )
    left_of = {i: _FREE for i in range(len(names))}
    right_of = {i: _FREE for i in range(len(names))}
    depth_of = {i: 0 for i in range(len(names))}

    def bst(lo: int, hi: int, depth: int) -> int:
        if lo > hi:
            return _FREE
        mid = (lo + hi) // 2
        i = order[mid]
        depth_of[i] = depth
        left_of[i] = bst(lo, mid - 1, depth + 1)
        right_of[i] = bst(mid + 1, hi, depth + 1)
        return i

    tree_root = bst(0, len(names) - 1, 0)
    max_depth = max(depth_of.values()) if names else 0

    dirs = bytearray()
    dirs += dir_entry(
        "Root Entry", 5, start_of.get("__ministream__", _ENDCHAIN),
        len(mini_data),
        child=(1 + tree_root) if names else _FREE,
    )
    for idx, n in enumerate(names):
        start = mini_start[n] if n in mini_start else start_of[n]
        dirs += dir_entry(
            n, 2, start, len(streams[n]),
            left=_FREE if left_of[idx] == _FREE else 1 + left_of[idx],
            right=_FREE if right_of[idx] == _FREE else 1 + right_of[idx],
            red=depth_of[idx] == max_depth and max_depth > 0,
        )
    dirs += b"\x00" * (dir_sects * _SECT - len(dirs))

    header = bytearray(512)
    header[:8] = _SIG
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, start_of["__dir__"])
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into(
        "<I", header, 60, start_of.get("__minifat__", _ENDCHAIN)
    )
    struct.pack_into("<I", header, 64, len(minifat_raw) // _SECT)
    struct.pack_into("<I", header, 68, _ENDCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i, fat_first + i if i < n_fat else _FREE
        )

    body = bytearray()
    for key, blob in plan:
        body += dirs if key == "__dir__" else blob
    body += fat_raw
    return bytes(header + body)


# --------------------------------------------------------------------------
# [MS-DOC] layer: FIB + piece table
# --------------------------------------------------------------------------

_FIB_SIZE = 1024  # text area starts here in our fixtures (fc offsets are
# absolute, so any pad works; real Word uses similar slack)
_FC_CLX_OFF = 0x01A2  # FibBase(32)+csw(2)+fibRgW(28)+cslw(2)+fibRgLw(88)
# +cbRgFcLcb(2) = 154, + pair index 33 × 8 = 418
_PIECE_CHARS = 120


def make_doc(text: str) -> bytes:
    """Build a spec-valid one-section ``.doc``: text split into ≤120-char
    pieces, each stored cp1252-compressed when encodable and UTF-16LE
    otherwise (so mixed-script text genuinely alternates piece kinds);
    FIB in WordDocument, Clx (with a leading Prc decoy) in 1Table — which
    is small, so it lands in the MINISTREAM; plus a SummaryInformation
    decoy stream. ``\\n`` is stored as Word's ``\\r`` paragraph mark."""
    if "\r" in text:
        # Word's paragraph mark IS \r: a literal input \r would be
        # indistinguishable from \n after the storage mapping, so the
        # lossless-roundtrip contract requires \n-normalized input.
        raise DocError("text must be \\n-normalized (no literal \\r)")
    stored = text.replace("\n", "\r")
    pieces = [
        stored[i : i + _PIECE_CHARS] for i in range(0, len(stored), _PIECE_CHARS)
    ] or [""]

    text_area = bytearray()
    cps = [0]
    pcds = []
    for p in pieces:
        cps.append(cps[-1] + len(p))
        try:
            raw = p.encode("cp1252")
            compressed = True
        except UnicodeEncodeError:
            raw = p.encode("utf-16-le")
            compressed = False
        off = _FIB_SIZE + len(text_area)
        if compressed:
            fc = (off * 2) | 0x40000000
        else:
            if off % 2:  # UTF-16 pieces must start even
                text_area += b"\x00"
                off += 1
            fc = off
        pcds.append(struct.pack("<HIH", 0, fc, 0))
        text_area += raw

    plc = struct.pack(f"<{len(cps)}I", *cps) + b"".join(pcds)
    # Clx: one Prc decoy entry (0x01 + cb + grpprl), then the Pcdt
    prc = b"\x01" + struct.pack("<h", 4) + b"\x00\x01\x02\x03"
    clx = prc + b"\x02" + struct.pack("<I", len(plc)) + plc

    word = bytearray(_FIB_SIZE)
    struct.pack_into("<H", word, 0, 0xA5EC)  # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", word, 10, 0x0200)  # fWhichTblStm = 1 → 1Table
    struct.pack_into("<H", word, 32, 14)  # csw
    struct.pack_into("<H", word, 62, 22)  # cslw
    struct.pack_into("<i", word, 64 + 12, cps[-1])  # ccpText
    struct.pack_into("<H", word, 152, 0x5D)  # cbRgFcLcb (93 pairs)
    struct.pack_into("<I", word, _FC_CLX_OFF, 0)  # fcClx: Clx at 1Table[0]
    struct.pack_into("<I", word, _FC_CLX_OFF + 4, len(clx))  # lcbClx
    word += text_area
    if len(word) < _MINI_CUTOFF:  # keep WordDocument on the big-FAT path
        word += b"\x00" * (_MINI_CUTOFF - len(word))

    return build_cfb(
        {
            "WordDocument": bytes(word),
            "1Table": clx,
            "\x05SummaryInformation": b"\xfe\xff\x00\x00decoy property set",
        }
    )


def parse_doc(data: bytes) -> dict:
    """Extract text from a ``.doc``: CFB walk → FIB → Clx in the selected
    table stream → piece-table text. Returns ``{text, n_pieces,
    n_unicode_pieces}`` with Word's ``\\r`` marks mapped back to ``\\n``."""
    streams = read_cfb(data)
    word = streams.get("WordDocument")
    if word is None or len(word) < _FC_CLX_OFF + 8:
        raise DocError("no usable WordDocument stream")
    (ident,) = struct.unpack_from("<H", word, 0)
    if ident != 0xA5EC:
        raise DocError("bad FIB wIdent")
    (flags,) = struct.unpack_from("<H", word, 10)
    if flags & 0x0100:
        raise DocError("encrypted document")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise DocError(f"missing {table_name} stream")
    (fc_clx,) = struct.unpack_from("<I", word, _FC_CLX_OFF)
    (lcb_clx,) = struct.unpack_from("<I", word, _FC_CLX_OFF + 4)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise DocError("Clx out of table-stream range")
    clx = table[fc_clx : fc_clx + lcb_clx]

    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # skip Prc entries
        if pos + 3 > len(clx):
            raise DocError("truncated Prc")
        (cb,) = struct.unpack_from("<h", clx, pos + 1)
        if cb < 0 or pos + 3 + cb > len(clx):
            raise DocError("Prc size out of range")
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise DocError("no Pcdt in Clx")
    if pos + 5 > len(clx):
        raise DocError("truncated Pcdt")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) < lcb or (lcb - 4) % 12:
        raise DocError("malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out: list[str] = []
    n_unicode = 0
    for i in range(n):
        ccp = cps[i + 1] - cps[i]
        if ccp < 0:
            raise DocError("CPs not increasing")
        (fc,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        if fc & 0x40000000:
            off = (fc & 0x3FFFFFFF) // 2
            raw = word[off : off + ccp]
            if len(raw) < ccp:
                raise DocError("compressed piece out of range")
            try:
                out.append(raw.decode("cp1252"))
            except UnicodeDecodeError as exc:
                # cp1252 leaves 0x81/0x8D/0x8F/0x90/0x9D undefined — a real
                # legacy CJK .doc (ANSI text in a DBCS codepage) or corrupt
                # bytes land here; the failed-row contract is DocError
                raise DocError("undecodable compressed piece") from exc
        else:
            n_unicode += 1
            raw = word[fc : fc + 2 * ccp]
            if len(raw) < 2 * ccp:
                raise DocError("unicode piece out of range")
            try:
                out.append(raw.decode("utf-16-le"))
            except UnicodeDecodeError as exc:
                raise DocError("undecodable unicode piece") from exc
    return {
        "text": "".join(out).replace("\r", "\n"),
        "n_pieces": n,
        "n_unicode_pieces": n_unicode,
    }


class DocLegacyTextEngine:
    """Engine-seam wrapper for the flagship route table: ``cfb`` payloads
    (OLE2 compound files) → piece-table text. Non-Word compound files
    (no WordDocument stream) and encrypted documents raise ``DocError`` —
    the ExtractStage maps that to a failed ROW, never a failed task."""

    name = "doc-text"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        res = parse_doc(payload)
        return EngineResult(
            text=res["text"],
            page_count=1,
            metadata={
                "engine": self.name,
                "n_pieces": str(res["n_pieces"]),
                "n_unicode_pieces": str(res["n_unicode_pieces"]),
            },
        )

"""MPEG-1 Layer III sample decode — conformant SUBSET, from scratch.

Extends ``stages/mp3_frames.py`` (header walk + ID3) from metadata to actual
audio decode through the Layer-III chain the public spec (ISO/IEC 11172-3)
defines analytically: side-info parse → Huffman big-values decode →
requantization → alias reduction → IMDCT-36 with sine window → overlap-add
→ per-subband time samples. The reference routes all audio to failed rows
(`/root/reference/src/simple_ocr/services/ocr_service.py:234-242`), so this
exceeds parity; the repo's FLAC codec (``stages/flac_codec.py``) covers
lossless compressed audio and this closes the lossy half down to an honest,
explicitly-typed seam.

SUBSET SCOPE — what decodes vs what raises ``Mp3SeamError`` (a typed failed
ROW, never a failed task):

decodes (everything here is analytic formulas or the 4-entry Huffman
table 1 — no multi-hundred-entry ISO annex tables needed):
  * mono (single_channel), MPEG-1 Layer III, long blocks only
  * ``main_data_begin == 0`` (no bit reservoir)
  * ``scalefac_compress == 0`` (slen1=slen2=0 → all-zero scalefactors, so
    the tabulated scalefactor-band boundaries of ISO Table B.8 are never
    consulted)
  * big-values region coded with Huffman table 0 (all-zero, zero bits) or
    table 1 (the canonical 2×2 table: (0,0)→``1``, (1,0)→``01``,
    (0,1)→``001``, (1,1)→``000``, sign bit 1 = negative), with the same
    table selected for all three regions (equal tables ⇒ the region
    boundaries, which also live in Table B.8, cannot affect the result)
  * empty count1 region (``part2_3_length`` exactly spans the big values)

typed seam (needs ISO tabulated constants unavailable in this sandbox):
  * stereo/intensity/MS modes, short/mixed blocks, nonzero scalefactors,
    bit reservoir, Huffman tables 2–31 + count1 tables A/B, and the final
    32-band synthesis filterbank (the 512-tap D window of Table B.3) —
    features are therefore computed on the SUBBAND-domain samples the
    IMDCT chain produces, which is where the spec's analytic portion ends.

The in-repo fixture encoder (``synth_mp3_audio``) emits streams inside the
subset; ``parse_mp3`` (metadata walk) accepts them unchanged. The decoded
integer spectrum is the exact synthesized spectrum, which the DuckDB oracle
reconstructs arithmetically — the float IMDCT path is parity-tested against
an independent scalar-loop mirror in tests/test_mp3_layer3.py.
"""

from __future__ import annotations

import math

import numpy as np

from .mp3_frames import (
    BITRATE_KBPS,
    SAMPLE_RATES,
    Mp3Error,
    parse_id3v2,
)

__all__ = [
    "Mp3SeamError",
    "decode_mp3_audio",
    "synth_mp3_audio",
    "GRANULE_LINES",
]

GRANULE_LINES = 576  # spectral lines per granule (MPEG-1: 2 granules/frame)
_SB = 32  # subbands
_LINES_PER_SB = 18


class Mp3SeamError(Mp3Error):
    """Stream is valid MP3 but uses a feature outside the documented
    conformant subset (needs ISO annex tables unavailable in-sandbox)."""


class _Reader:
    """MSB-first bit reader (same convention as the FLAC codec's)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        data, byte, bit = self.data, self.byte, self.bit
        if byte + (n + bit + 7) // 8 > len(data):
            raise Mp3Error("truncated Layer III bitstream")
        while n:
            take = min(n, 8 - bit)
            v = (v << take) | ((data[byte] >> (8 - bit - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                bit = 0
                byte += 1
        self.byte, self.bit = byte, bit
        return v

    def bitpos(self) -> int:
        return self.byte * 8 + self.bit


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# Analytic constants (formulas from the spec body, not annex tables)
# --------------------------------------------------------------------------

#: alias-reduction butterfly coefficients c_i (ISO 11172-3 §2.4.3.4.10.1)
_ALIAS_C = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
_ALIAS_CS = tuple(1.0 / math.sqrt(1.0 + c * c) for c in _ALIAS_C)
_ALIAS_CA = tuple(c / math.sqrt(1.0 + c * c) for c in _ALIAS_C)


def _imdct36_matrix() -> np.ndarray:
    """36×18 long-block IMDCT basis, already multiplied by the analytic
    sine window w[i] = sin(π/36 (i+0.5)): one matmul per subband."""
    i = np.arange(36).reshape(-1, 1)
    k = np.arange(18).reshape(1, -1)
    basis = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
    win = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5)).reshape(-1, 1)
    return basis * win


_IMDCT36_WIN = _imdct36_matrix()


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def _parse_side_info_mono(r: _Reader) -> dict:
    si: dict = {"main_data_begin": r.read(9)}
    r.read(5)  # private_bits (mono)
    si["scfsi"] = r.read(4)
    si["granules"] = []
    for _ in range(2):
        g = {
            "part2_3_length": r.read(12),
            "big_values": r.read(9),
            "global_gain": r.read(8),
            "scalefac_compress": r.read(4),
            "window_switching": r.read(1),
        }
        if g["window_switching"]:
            raise Mp3SeamError(
                "short/mixed blocks need ISO Table B.8 scalefactor bands"
            )
        g["table_select"] = [r.read(5) for _ in range(3)]
        g["region0_count"] = r.read(4)
        g["region1_count"] = r.read(3)
        g["preflag"] = r.read(1)
        g["scalefac_scale"] = r.read(1)
        g["count1table_select"] = r.read(1)
        si["granules"].append(g)
    return si


def _decode_granule_spectrum(r: _Reader, g: dict) -> np.ndarray:
    """Huffman-decode one granule's integer spectrum (subset rules)."""
    if g["scalefac_compress"] != 0 or g["preflag"] or g["scalefac_scale"]:
        raise Mp3SeamError(
            "nonzero scalefactors need ISO Table B.8 scalefactor bands"
        )
    tabs = set(g["table_select"])
    if not tabs <= {0, 1}:
        raise Mp3SeamError(
            f"Huffman tables {sorted(tabs - {0, 1})} are ISO annex tables "
            "outside the subset"
        )
    if len(tabs) > 1 and 1 in tabs and g["big_values"]:
        # mixed 0/1 table regions would need Table B.8 region boundaries
        raise Mp3SeamError(
            "per-region Huffman table switch needs ISO Table B.8 boundaries"
        )
    start = r.bitpos()
    nv = 2 * g["big_values"]
    if nv > GRANULE_LINES:
        raise Mp3Error("big_values exceeds granule line count")
    vals = np.zeros(GRANULE_LINES, dtype=np.int64)
    table = max(tabs) if tabs else 0
    if table == 1:
        for p in range(g["big_values"]):
            # table 1 codewords: 1→(0,0)  01→(1,0)  001→(0,1)  000→(1,1)
            if r.read(1):
                x, y = 0, 0
            elif r.read(1):
                x, y = 1, 0
            elif r.read(1):
                x, y = 0, 1
            else:
                x, y = 1, 1
            if x:
                x = -x if r.read(1) else x
            if y:
                y = -y if r.read(1) else y
            vals[2 * p] = x
            vals[2 * p + 1] = y
    # table 0: all-zero region, zero bits
    used = r.bitpos() - start
    if used > g["part2_3_length"]:
        raise Mp3Error("Huffman data overruns part2_3_length")
    if used < g["part2_3_length"]:
        raise Mp3SeamError(
            "count1 region present — count1 Huffman tables A/B are ISO "
            "annex tables outside the subset"
        )
    return vals


def _requantize(vals: np.ndarray, global_gain: int) -> np.ndarray:
    gain = 2.0 ** ((global_gain - 210) / 4.0)
    return np.sign(vals) * (np.abs(vals).astype(np.float64) ** (4.0 / 3.0)) * gain


_ALIAS_BOUNDARIES = np.arange(1, _SB) * _LINES_PER_SB


def _alias_reduce(xr: np.ndarray) -> np.ndarray:
    # vectorized across the 31 subband boundaries per butterfly index —
    # identical IEEE operations to the scalar spec loop (parity-pinned
    # against the scalar mirror in tests), 8 numpy ops instead of 496
    # python iterations (was 56% of decode time)
    out = xr.copy()
    b_idx = _ALIAS_BOUNDARIES
    for i in range(8):
        a = out[b_idx - 1 - i].copy()
        b = out[b_idx + i]
        out[b_idx - 1 - i] = a * _ALIAS_CS[i] - b * _ALIAS_CA[i]
        out[b_idx + i] = b * _ALIAS_CS[i] + a * _ALIAS_CA[i]
    return out


def _imdct_granule(xr: np.ndarray, overlap: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """xr[576] → (subband samples S[18, 32], new overlap[18, 32])."""
    lines = xr.reshape(_SB, _LINES_PER_SB).T  # [18 lines, 32 subbands]
    z = _IMDCT36_WIN @ lines  # [36, 32]
    s = z[:18] + overlap
    new_overlap = z[18:].copy()
    # frequency inversion: odd time samples of odd subbands change sign
    s[1::2, 1::2] = -s[1::2, 1::2]
    return s, new_overlap


def decode_mp3_audio(data: bytes) -> dict:
    """Full subset decode. Returns ``{sample_rate, frame_count,
    n_granules, spectra (list of int64[576] per granule), subband (float64
    [n_granules*18, 32]), n_lines, n_nonzero_lines, abs_line_sum}``.

    Raises ``Mp3Error`` for corrupt streams, ``Mp3SeamError`` for valid
    streams outside the subset — both map to failed ROWS upstream."""
    _tags, pos = parse_id3v2(data)
    rate: int | None = None
    spectra: list[np.ndarray] = []
    blocks: list[np.ndarray] = []
    overlap = np.zeros((_LINES_PER_SB, _SB))
    frames = 0
    n_lines = 0  # Σ 2·big_values — the oracle-mirrored coded-line count
    ln = len(data)
    while pos < ln:
        if ln - pos < 4:
            raise Mp3Error("truncated frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            raise Mp3Error("not MPEG-1 Layer III")
        kbps = BITRATE_KBPS[(b2 >> 4) & 0xF]
        sr = SAMPLE_RATES[(b2 >> 2) & 0x3]
        if kbps is None or sr is None:
            raise Mp3Error("invalid bitrate/samplerate index")
        if rate is None:
            rate = sr
        elif sr != rate:
            raise Mp3Error("sample rate changes mid-stream")
        mode = (b3 >> 6) & 0x3
        if mode != 3:
            raise Mp3SeamError("stereo modes are outside the mono subset")
        pad = (b2 >> 1) & 0x1
        flen = 144 * kbps * 1000 // sr + pad
        if pos + flen > ln:
            raise Mp3Error("truncated final frame")
        body = data[pos + 4 : pos + flen]
        if not (b1 & 0x1):  # protection bit 0 → 16-bit CRC before side info
            body = body[2:]
        r = _Reader(body)
        si = _parse_side_info_mono(r)
        if si["main_data_begin"] != 0:
            raise Mp3SeamError("bit reservoir (main_data_begin>0) unsupported")
        for g in si["granules"]:
            vals = _decode_granule_spectrum(r, g)
            n_lines += 2 * g["big_values"]
            spectra.append(vals)
            xr = _requantize(vals, g["global_gain"])
            xr = _alias_reduce(xr)
            s, overlap = _imdct_granule(xr, overlap)
            blocks.append(s)
        frames += 1
        pos += flen
    if frames == 0:
        raise Mp3Error("no MPEG frame")
    assert rate is not None
    all_spec = np.concatenate(spectra) if spectra else np.zeros(0, dtype=np.int64)
    return {
        "sample_rate": rate,
        "frame_count": frames,
        "n_granules": len(spectra),
        "spectra": spectra,
        "subband": np.vstack(blocks),
        "n_lines": n_lines,
        "n_nonzero_lines": int(np.count_nonzero(all_spec)),
        "abs_line_sum": int(np.abs(all_spec).sum()),
    }


# --------------------------------------------------------------------------
# Fixture encoder (subset-conformant streams, deterministic per doc)
# --------------------------------------------------------------------------


def _encode_granule(w: _Writer, vals: list[int]) -> None:
    """Pack one granule's big-values Huffman bits (table 1 + sign bits)."""
    for p in range(0, len(vals), 2):
        x, y = vals[p], vals[p + 1]
        ax, ay = abs(x), abs(y)
        if (ax, ay) == (0, 0):
            w.write(0b1, 1)
        elif (ax, ay) == (1, 0):
            w.write(0b01, 2)
        elif (ax, ay) == (0, 1):
            w.write(0b001, 3)
        else:
            w.write(0b000, 3)
        if ax:
            w.write(1 if x < 0 else 0, 1)
        if ay:
            w.write(1 if y < 0 else 0, 1)


def _granule_bits(vals: list[int]) -> int:
    n = 0
    for p in range(0, len(vals), 2):
        x, y = abs(vals[p]), abs(vals[p + 1])
        n += 1 if (x, y) == (0, 0) else (2 if (x, y) == (1, 0) else 3)
        n += (1 if x else 0) + (1 if y else 0)
    return n


def granule_values(d: int, i: int, g: int) -> list[int]:
    """The deterministic integer spectrum for (doc, frame, granule) — the
    quantity the DuckDB oracle reconstructs arithmetically."""
    bv = 12 + (d + i + g) % 8
    return [((d + k + g) % 3) - 1 for k in range(2 * bv)]


def synth_mp3_audio(d: int) -> bytes:
    """Deterministic subset-conformant mono Layer III stream for doc ``d``:
    ID3v2.3 tag, ``4 + d % 5`` frames, VBR bitrate indexes ``5 + (d+i) % 5``
    (64–128 kbps — a parser trusting frame 0 gets VBR docs wrong), sample
    rate by ``d % 3``, per-granule big-values spectra from
    ``granule_values`` coded with Huffman table 1, empty count1 region,
    global_gain ``210 + 4·((d+i+g) % 3)``, padding bit ``(d+i) % 2``."""
    from .mp3_frames import _id3_frame

    frames_tag = _id3_frame("TIT2", f"Audio {d}") + _id3_frame(
        "TPE1", f"Artist {d % 23}"
    )
    tag_size = len(frames_tag)
    out = bytearray(
        b"ID3\x03\x00\x00"
        + bytes([(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
                 (tag_size >> 7) & 0x7F, tag_size & 0x7F])
        + frames_tag
    )
    sr_idx = d % 3
    sr = SAMPLE_RATES[sr_idx]
    n = 4 + d % 5
    for i in range(n):
        br_idx = 5 + (d + i) % 5  # 64..128 kbps
        kbps = BITRATE_KBPS[br_idx]
        pad = (d + i) % 2
        flen = 144 * kbps * 1000 // sr + pad
        gdata: list[tuple[list[int], int, int]] = []
        for g in range(2):
            vals = granule_values(d, i, g)
            gg = 210 + 4 * ((d + i + g) % 3)
            gdata.append((vals, gg, _granule_bits(vals)))
        w = _Writer()
        # ---- side info (mono, 17 bytes) ----
        w.write(0, 9)  # main_data_begin
        w.write(0, 5)  # private_bits
        w.write(0, 4)  # scfsi
        for vals, gg, bits in gdata:
            w.write(bits, 12)  # part2_3_length (no scalefac bits)
            w.write(len(vals) // 2, 9)  # big_values
            w.write(gg, 8)
            w.write(0, 4)  # scalefac_compress
            w.write(0, 1)  # window_switching_flag
            for _ in range(3):
                w.write(1, 5)  # table_select = 1 everywhere
            w.write(0, 4)  # region0_count
            w.write(0, 3)  # region1_count
            w.write(0, 1)  # preflag
            w.write(0, 1)  # scalefac_scale
            w.write(1, 1)  # count1table_select (B; region is empty)
        # ---- main data ----
        for vals, _gg, _bits in gdata:
            _encode_granule(w, vals)
        w.pad_to_byte()
        payload = w.bytes()
        hdr = bytes(
            [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0xC0]
        )
        if 4 + len(payload) > flen:
            raise AssertionError("fixture frame overflow")
        out += hdr + payload + bytes(flen - 4 - len(payload))
    return bytes(out)

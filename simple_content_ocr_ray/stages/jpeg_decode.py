"""Real from-scratch JPEG (JFIF) decoding — stdlib + numpy only.

The reference accepts JPEG first among image types
(/root/reference/src/simple_ocr/config.py:113-120) and decodes it with PIL
(adapters/deepseek_engine.py:213-234); PIL is absent in this environment.
JPEG needs no external codec — just Huffman coding and the 8×8 DCT — so this
module implements the actual format, mirroring the PNG decoder's design
(stages/png_decode.py): a marker walk, DQT/SOF/DHT/SOS/DRI parse, an
entropy-decode loop (byte-unstuffing bit reader, DC prediction with EXTEND,
AC run/size with ZRL and EOB), batched dequantize + inverse-zigzag + IDCT
over all blocks of a component at once (one einsum, not per-block Python),
nearest-neighbor chroma upsampling and BT.601 YCbCr→RGB.

Supported: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 — r4:
spectral selection, successive approximation, per-scan EOB runs, DC/AC
first + refinement scans per T.81 §G, restart intervals in every scan
type), 8-bit, grayscale or YCbCr with sampling factors 1–2 (4:4:4 / 4:2:2 /
4:2:0). Everything else — arithmetic coding, 12-bit, lossless/hierarchical,
CMYK — raises ``UnsupportedJpegError`` at the same seam the other decoders
document.

``make_jpeg`` is the matching from-scratch baseline ENCODER (Annex K
quantization and Huffman tables, float FDCT, run-length + Huffman entropy
coding, byte stuffing); ``make_progressive_jpeg`` (r4) emits real SOF2
multi-scan files (DC/AC first + refinement scans with buffered correction
bits and cross-block EOB runs, per jcphuff semantics) so tests can assert
the progressive decode is PIXEL-IDENTICAL to the baseline decode of the
same quantized coefficients. The decoder is additionally validated against
an independently computed quant-roundtrip reconstruction, not against its
own encoder internals (tests/test_jpeg_decode.py).

The entropy scan is inherently sequential per restart segment; everything
after it (dequantize, IDCT, color transform) is vectorized numpy over all
blocks at once — decode cost is O(pixels) with small constants.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpegError(ValueError):
    """Non-baseline variants (progressive/arithmetic/12-bit) or corrupt
    payloads — the documented decoder seam."""


# --------------------------------------------------------------------------
# Shared tables (ITU-T T.81 Annex K — published spec constants)
# --------------------------------------------------------------------------

#: zigzag index: ZIGZAG[i] = position in the 8×8 block (row-major) of the
#: i-th coefficient in zigzag order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K luminance / chrominance quantization tables (quality ~50)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K typical Huffman tables: (bits[1..16] counts, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """8×8 type-II DCT basis A with A[u, x] = C(u)/2 · cos((2x+1)uπ/16):
    FDCT(block) = A @ block @ A.T, IDCT(coef) = A.T @ coef @ A."""
    x = np.arange(8)
    A = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2
    A[0, :] /= np.sqrt(2)
    return A


_A = _dct_basis()


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Batched 2-D IDCT: (n, 8, 8) dequantized coefficients → spatial."""
    return np.einsum("ux,nuv,vy->nxy", _A, coefs, _A, optimize=True)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Batched 2-D FDCT: (n, 8, 8) level-shifted samples → coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)


# --------------------------------------------------------------------------
# Huffman code construction (canonical, per T.81 Annex C)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker. ``restart()`` consumes an expected RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise UnsupportedJpegError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise UnsupportedJpegError("truncated entropy data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                raise UnsupportedJpegError("marker inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Align to byte, consume exactly one RSTn marker, reset bit state
        (pad bits before the marker were discarded by the state reset)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d):
            raise UnsupportedJpegError("truncated entropy data")
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise UnsupportedJpegError("expected restart marker")


class _RestartPending(Exception):
    pass


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise UnsupportedJpegError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next REAL marker (not a stuffed 0xFF00, not RSTn) at
    or after ``p`` — how a multi-scan decoder finds the end of one scan's
    entropy data."""
    n = len(data)
    while p + 1 < n:
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    raise UnsupportedJpegError("no trailing marker after scan data")


def _alloc_stores(frame: dict) -> list[np.ndarray]:
    """Per component: (n_blocks, 64) int32 coefficient store in zigzag
    order, sized to the interleaved-MCU grid (the superset every scan
    indexes into)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise UnsupportedJpegError("sampling factors beyond 2 unsupported")
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    stores = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        c["bw"], c["bh"] = bw, bh
        # non-interleaved scans walk only the component's OWN block grid
        c["nb_w"] = (-(-frame["w"] * c["h"] // hmax) + 7) // 8
        c["nb_h"] = (-(-frame["h"] * c["v"] // vmax) + 7) // 8
        stores.append(np.zeros((bh * bw, 64), dtype=np.int32))
    return stores


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG bytes → uint8 array
    (h, w) grayscale or (h, w, 3) RGB."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise UnsupportedJpegError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    stores = None
    restart_interval = 0
    n = len(payload)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise UnsupportedJpegError("marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if pos + seglen > n:
            raise UnsupportedJpegError("truncated marker segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                tbl.flat[ZIGZAG] = vals
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise UnsupportedJpegError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"unsupported frame type SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedJpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            scan_map = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map[cs] = (tt >> 4, tt & 0x0F)
                scan_comps.append(cs)
            data_pos = pos + seglen
            if not frame["progressive"]:
                if set(scan_map) != {c["id"] for c in frame["comps"]}:
                    # spec-legal but rare: baseline files with
                    # non-interleaved scans (Ns < Nf, multiple SOS) — the
                    # documented seam, not a KeyError deep in the MCU walk
                    raise UnsupportedJpegError(
                        "non-interleaved multi-scan baseline unsupported"
                    )
                return _decode_scan(
                    payload, data_pos, frame, scan_map, quant, huff_dc,
                    huff_ac, restart_interval,
                )
            # progressive: accumulate this scan into the coefficient stores
            # and keep walking markers (T.81 §G)
            if stores is None:
                stores = _alloc_stores(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            end = _decode_progressive_scan(
                payload, data_pos, frame, scan_comps, scan_map, stores,
                huff_dc, huff_ac, restart_interval, ss, se, ah, al,
            )
            pos = _next_marker(payload, end)
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and stores is not None:
        return _finish_planes(frame, stores, quant)
    raise UnsupportedJpegError("no scan data found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_map: dict,
    quant: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    comps = frame["comps"]
    stores = _alloc_stores(frame)
    mcux, mcuy = frame["mcux"], frame["mcuy"]

    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            r.restart()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        try:
            for ci, c in enumerate(comps):
                dc_t = huff_dc.get(scan_map[c["id"]][0])
                ac_t = huff_ac.get(scan_map[c["id"]][1])
                if dc_t is None or ac_t is None:
                    raise UnsupportedJpegError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        size = _decode_huff(r, dc_t)
                        diff = _extend(r.read_bits(size), size)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_t)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise UnsupportedJpegError("AC index overflow")
                            blk[k] = _extend(r.read_bits(ss), ss)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        stores[ci][row * c["bw"] + col] = blk
        except _RestartPending:
            raise UnsupportedJpegError("unexpected restart marker") from None

    return _finish_planes(frame, stores, quant)


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_comps: list[int],
    scan_map: dict,
    stores: list,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """One progressive scan (T.81 §G.2) accumulated into ``stores``; returns
    the byte position just past the scan's entropy data.

    Four scan types: DC first (Ss=0, Ah=0 — Huffman-coded diffs shifted left
    by Al, interleaved or single-component), DC refinement (Ss=0, Ah>0 —
    one appended bit per block), AC first (Ss≥1, Ah=0, single component —
    run/size coding with cross-block EOB runs), AC refinement (Ah>0 —
    correction bits for history-nonzero coefficients, ±1<<Al insertions for
    newly-nonzero ones, per the jdphuff reading of figure G.7)."""
    comps = frame["comps"]
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    r = _BitReader(data, pos)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise UnsupportedJpegError("DC scan with Se != 0")
    if not is_dc and len(scan_comps) != 1:
        raise UnsupportedJpegError("interleaved AC scan is spec-illegal")

    state = {"eobrun": 0}
    pred = {cid: 0 for cid in scan_comps}

    def dc_block(cid: int, blk: np.ndarray) -> None:
        if ah == 0:
            t = huff_dc.get(scan_map[cid][0])
            if t is None:
                raise UnsupportedJpegError("missing DC Huffman table")
            size = _decode_huff(r, t)
            diff = _extend(r.read_bits(size), size)
            pred[cid] += diff
            blk[0] = pred[cid] << al
        else:  # refinement: one bit
            if r.read_bit():
                blk[0] |= 1 << al

    def ac_first_block(cid: int, blk: np.ndarray) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        t = huff_ac.get(scan_map[cid][1])
        if t is None:
            raise UnsupportedJpegError("missing AC Huffman table")
        k = ss
        while k <= se:
            rs = _decode_huff(r, t)
            rr, s_ = rs >> 4, rs & 0x0F
            if s_ == 0:
                if rr == 15:  # ZRL: skip 16 zero coefficients
                    k += 16
                    continue
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.read_bits(rr)
                return
            k += rr
            if k > se:
                raise UnsupportedJpegError("AC index overflow")
            v = _extend(r.read_bits(s_), s_)
            blk[k] = v << al if v >= 0 else -((-v) << al)
            k += 1

    def ac_refine_block(cid: int, blk: np.ndarray) -> None:
        t = huff_ac.get(scan_map[cid][1])
        if t is None:
            raise UnsupportedJpegError("missing AC Huffman table")
        p1 = 1 << al
        m1 = -p1

        def correct(k: int) -> None:
            c = int(blk[k])
            if r.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_huff(r, t)
                rr, s_ = rs >> 4, rs & 0x0F
                val = 0
                if s_ == 0:
                    if rr < 15:
                        state["eobrun"] = 1 << rr
                        if rr:
                            state["eobrun"] += r.read_bits(rr)
                        break
                    # ZRL: advance over 16 zero-HISTORY coefficients
                else:
                    if s_ != 1:
                        raise UnsupportedJpegError(
                            "AC refinement size must be 1"
                        )
                    val = p1 if r.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if rr == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    if is_dc:
        block_fn = dc_block
    elif ah == 0:
        block_fn = ac_first_block
    else:
        block_fn = ac_refine_block

    def do_restart() -> None:
        r.restart()
        state["eobrun"] = 0
        for cid in pred:
            pred[cid] = 0

    try:
        if is_dc and len(scan_comps) > 1:
            # interleaved MCU walk (DC scans only)
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    do_restart()
                my, mx = divmod(m, mcux)
                for cid in scan_comps:
                    ci, c = by_id[cid]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            block_fn(cid, stores[ci][row * c["bw"] + col])
        else:
            # non-interleaved: raster walk over the component's OWN grid
            cid = scan_comps[0]
            ci, c = by_id[cid]
            nbw, nbh = c["nb_w"], c["nb_h"]
            for m in range(nbw * nbh):
                if restart_interval and m and m % restart_interval == 0:
                    do_restart()
                row, col = divmod(m, nbw)
                block_fn(cid, stores[ci][row * c["bw"] + col])
    except _RestartPending:
        raise UnsupportedJpegError("unexpected restart marker") from None
    return r.pos


def _finish_planes(frame: dict, stores: list, quant: dict) -> np.ndarray:
    """Dequantize + inverse zigzag + batched IDCT per component, upsample,
    color-transform — shared by the baseline and progressive paths."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for ci, c in enumerate(comps):
        q = quant.get(c["tq"])
        if q is None:
            raise UnsupportedJpegError("missing quant table")
        coefs = np.zeros((len(stores[ci]), 64), dtype=np.float64)
        coefs[:, ZIGZAG] = stores[ci].astype(np.float64)
        coefs = coefs.reshape(-1, 8, 8) * q[None, :, :]
        spatial = idct_blocks(coefs) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest-neighbor, per T.81 simple mode)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise UnsupportedJpegError(f"{len(planes)}-component images unsupported")
    Y, Cb, Cr = planes
    r_ = Y + 1.402 * (Cr - 128.0)
    g_ = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b_ = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (tests + jpeg_real_meta fixture synthesis)
# --------------------------------------------------------------------------

def _encode_plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float plane → (n_blocks, 64) int32 quantized zigzag coefs,
    blocks in raster order, edge-replicated padding to 8-multiples."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = fdct_blocks(blocks)
    quantized = np.round(coefs / q[None, :, :]).astype(np.int32)
    return quantized.reshape(-1, 64)[:, ZIGZAG]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def restart_marker(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are never byte-stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _size_of(v: int) -> int:
    return int(v).bit_length() if v else 0


def _encode_blocks(
    bw: "_BitWriter",
    zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-encode one component's zigzag blocks (interleaving is handled
    by the caller passing single blocks); returns the updated DC predictor."""
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size = _size_of(abs(diff))
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            v = diff if diff > 0 else diff + (1 << size) - 1
            bw.write(v, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            size = _size_of(abs(v))
            code, length = ac_codes[(run << 4) | size]
            bw.write(code, length)
            vv = v if v > 0 else v + (1 << size) - 1
            bw.write(vv, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    return pred


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = px[:, :, 0].astype(np.float64), px[:, :, 1].astype(np.float64), px[
        :, :, 2
    ].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def make_jpeg(
    pixels: np.ndarray, subsample: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a valid
    baseline JFIF JPEG (Annex K tables). ``subsample=2`` emits 4:2:0 chroma
    (box-mean downsampled); 1 emits 4:4:4. ``restart_interval=N`` emits a
    DRI segment and RSTn markers every N MCUs (byte-aligned, DC predictors
    reset) — the error-resilience layout cameras produce. Used by tests and
    the ``jpeg_real_meta`` fixture."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.flatten()[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += dqt(0, QUANT_LUMA)
    if not gray:
        out += dqt(1, QUANT_CHROMA)

    # SOF0
    if gray:
        comp_spec = bytes([1, 0x11, 0])
        nc = 1
    else:
        sf = 0x22 if subsample == 2 else 0x11
        comp_spec = bytes([1, sf, 0, 2, 0x11, 1, 3, 0x11, 1])
        nc = 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc]) + comp_spec
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # SOS
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    if gray:
        zz = _encode_plane_blocks(pixels.astype(np.float64), QUANT_LUMA)
        pred = 0
        rst = 0
        for m in range(len(zz)):  # one block per MCU in grayscale
            if restart_interval and m and m % restart_interval == 0:
                bw.restart_marker(rst)
                rst += 1
                pred = 0
            pred = _encode_blocks(bw, zz[m : m + 1], dc_l, ac_l, pred)
    else:
        dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if subsample == 2:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            hy, wy = 2, 2
        else:
            hy, wy = 1, 1
        # per-plane zigzag blocks with padded raster geometry matched to the
        # interleaved MCU walk below
        mcux = (w + 8 * wy - 1) // (8 * wy)
        mcuy = (h + 8 * hy - 1) // (8 * hy)

        def plane_blocks(p: np.ndarray, q: np.ndarray, bw_: int, bh_: int):
            ph_, pw_ = bh_ * 8, bw_ * 8
            pp = np.pad(
                p,
                ((0, ph_ - p.shape[0]), (0, pw_ - p.shape[1])),
                mode="edge",
            )
            return _encode_plane_blocks(pp, q), bw_

        zz_y, bw_y = plane_blocks(y, QUANT_LUMA, mcux * wy, mcuy * hy)
        zz_cb, bw_c = plane_blocks(cb, QUANT_CHROMA, mcux, mcuy)
        zz_cr, _ = plane_blocks(cr, QUANT_CHROMA, mcux, mcuy)
        preds = [0, 0, 0]
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw.restart_marker(rst)
                rst += 1
                preds = [0, 0, 0]
            my, mx = divmod(m, mcux)
            for by in range(hy):
                for bx in range(wy):
                    idx = (my * hy + by) * bw_y + (mx * wy + bx)
                    preds[0] = _encode_blocks(
                        bw, zz_y[idx : idx + 1], dc_l, ac_l, preds[0]
                    )
            idx = my * bw_c + mx
            preds[1] = _encode_blocks(bw, zz_cb[idx : idx + 1], dc_c, ac_c, preds[1])
            preds[2] = _encode_blocks(bw, zz_cr[idx : idx + 1], dc_c, ac_c, preds[2])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (r4) — SOF2 fixture generator for the decoder tests
# and the jpeg_progressive_real_meta query
# --------------------------------------------------------------------------

#: custom Huffman tables for progressive scans: the Annex K baseline AC
#: table lacks the EOBn symbols (0x10..0xE0) progressive coding requires, so
#: the encoder ships flat canonical tables covering EVERY (run, size) byte
#: (255 nine-bit codes + one ten-bit — Kraft 255/512 + 1/1024, all-ones code
#: unused as T.81 requires). Compression is not the point; validity is.
PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = list(range(12))
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))


def _component_layout(pixels: np.ndarray, subsample: int):
    """Quantized zigzag blocks + grid geometry per component (shared
    interleaved-store layout, plus each component's own non-interleaved
    block counts for AC scans)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [(1, 1, 1, 0, pixels.astype(np.float64), QUANT_LUMA)]
        hmax = vmax = 1
    else:
        sf = 2 if subsample == 2 else 1
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if sf == 2:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [
            (1, sf, sf, 0, y, QUANT_LUMA),
            (2, 1, 1, 1, cb, QUANT_CHROMA),
            (3, 1, 1, 1, cr, QUANT_CHROMA),
        ]
        hmax = vmax = sf
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for cid, ch, cv, tq, plane, q in planes:
        bw_, bh_ = mcux * ch, mcuy * cv
        pp = np.pad(
            plane,
            ((0, bh_ * 8 - plane.shape[0]), (0, bw_ * 8 - plane.shape[1])),
            mode="edge",
        )
        comp_w = -(-w * ch // hmax)
        comp_h = -(-h * cv // vmax)
        comps.append(
            {
                "id": cid,
                "h": ch,
                "v": cv,
                "tq": tq,
                "zz": _encode_plane_blocks(pp, q),
                "bw": bw_,
                "nb_w": (comp_w + 7) // 8,
                "nb_h": (comp_h + 7) // 8,
            }
        )
    return comps, mcux, mcuy, gray


def _emit_eobrun(bw: "_BitWriter", ac_codes: dict, state: dict) -> None:
    if state["eobrun"] > 0:
        eb = state["eobrun"]
        nbits = eb.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        bw.write(code, length)
        if nbits:
            bw.write(eb - (1 << nbits), nbits)
        state["eobrun"] = 0
    for b in state["be"]:
        bw.write(b, 1)
    state["be"] = []


def make_progressive_jpeg(
    pixels: np.ndarray, subsample: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a REAL
    progressive (SOF2) JFIF JPEG exercising all four scan types: an
    interleaved DC-first scan at Al=1, per-component AC-first scans split
    into two spectral bands (1–5, 6–63) at Al=1, an interleaved DC
    refinement, and per-component AC refinement scans per band (Ah=1→Al=0,
    with cross-block EOB runs and buffered correction bits, per the jcphuff
    reading of T.81 §G.1.2.3). The quantized coefficients are identical to
    ``make_jpeg``'s, so progressive decode must be PIXEL-IDENTICAL to
    baseline decode of the same image — the roundtrip test invariant."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    comps, mcux, mcuy, _ = _component_layout(pixels, subsample)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zzb = tbl.flatten()[ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zzb

    out += dqt(0, QUANT_LUMA)
    if not gray:
        out += dqt(1, QUANT_CHROMA)

    comp_spec = b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)]) + comp_spec
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, PROG_DC_BITS, PROG_DC_VALS)
    out += dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = _build_codes(PROG_DC_BITS, PROG_DC_VALS)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)

    def sos_header(scan_ids: list[int], ss: int, se: int, ah: int, al: int):
        body = (
            bytes([len(scan_ids)])
            + b"".join(bytes([cid, 0x00]) for cid in scan_ids)
            + bytes([ss, se, (ah << 4) | al])
        )
        out.extend(b"\xff\xda" + struct.pack(">H", len(body) + 2) + body)

    def dc_scan(al: int, refine: bool) -> None:
        sos_header([c["id"] for c in comps], 0, 0, 1 if refine else 0, al)
        bw = _BitWriter()
        preds = {c["id"]: 0 for c in comps}
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw.restart_marker(rst)
                rst += 1
                preds = {c["id"]: 0 for c in comps}
            my, mx = divmod(m, mcux)
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        idx = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        v = int(c["zz"][idx][0])
                        if refine:
                            bw.write((v >> al) & 1, 1)
                            continue
                        t = v >> al  # arithmetic shift, like the decoder's << al
                        diff = t - preds[c["id"]]
                        preds[c["id"]] = t
                        size = _size_of(abs(diff))
                        code, length = dc_codes[size]
                        bw.write(code, length)
                        if size:
                            bw.write(
                                diff if diff > 0 else diff + (1 << size) - 1,
                                size,
                            )
        bw.flush()
        out.extend(bw.out)

    def ac_first_scan(c: dict, ss: int, se: int, al: int) -> None:
        sos_header([c["id"]], ss, se, 0, al)
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        rst = 0
        for m in range(c["nb_w"] * c["nb_h"]):
            if restart_interval and m and m % restart_interval == 0:
                _emit_eobrun(bw, ac_codes, state)
                bw.restart_marker(rst)
                rst += 1
            row, col = divmod(m, c["nb_w"])
            blk = c["zz"][row * c["bw"] + col]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                _emit_eobrun(bw, ac_codes, state)
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                size = t.bit_length()
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(t if v > 0 else ~t, size)
                run = 0
            if run > 0:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, ac_codes, state)
        _emit_eobrun(bw, ac_codes, state)
        bw.flush()
        out.extend(bw.out)

    def ac_refine_scan(c: dict, ss: int, se: int, al: int) -> None:
        sos_header([c["id"]], ss, se, 1, al)
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        rst = 0
        for m in range(c["nb_w"] * c["nb_h"]):
            if restart_interval and m and m % restart_interval == 0:
                _emit_eobrun(bw, ac_codes, state)
                bw.restart_marker(rst)
                rst += 1
            row, col = divmod(m, c["nb_w"])
            blk = c["zz"][row * c["bw"] + col]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob = k  # last NEWLY-nonzero coefficient
            run = 0
            br: list[int] = []  # this block's pending correction bits
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    _emit_eobrun(bw, ac_codes, state)
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if t > 1:
                    # history-nonzero: just buffer its correction bit
                    br.append(t & 1)
                    continue
                _emit_eobrun(bw, ac_codes, state)
                code, length = ac_codes[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if int(blk[k]) > 0 else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                state["eobrun"] += 1
                state["be"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, ac_codes, state)
        _emit_eobrun(bw, ac_codes, state)
        bw.flush()
        out.extend(bw.out)

    # scan script: DC first → AC first (two spectral bands per component) →
    # DC refinement → AC refinement per band
    dc_scan(al=1, refine=False)
    for c in comps:
        ac_first_scan(c, 1, 5, al=1)
    for c in comps:
        ac_first_scan(c, 6, 63, al=1)
    dc_scan(al=0, refine=True)
    for c in comps:
        ac_refine_scan(c, 1, 5, al=0)
    for c in comps:
        ac_refine_scan(c, 6, 63, al=0)

    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Engine seam (same output layout as PngImageEngine)
# --------------------------------------------------------------------------

class JpegImageEngine:
    """Engine-seam wrapper: REAL baseline JPEG decode → typed image metadata
    (width, height, channels, mean brightness) — identical layout to
    ``PngImageEngine`` so downstream schemas are unchanged."""

    name = "jpeg-decode"

    def extract(self, url: str, payload: bytes, content_type: str):
        from .engines import EngineResult

        img = decode_jpeg(payload)
        if img.ndim == 2:
            h, w = img.shape
            ch = 1
        else:
            h, w, ch = img.shape
        brightness = float(np.round(img.mean(), 4))
        return EngineResult(
            text=f"[image {w}x{h} ch={ch} brightness={brightness}]",
            page_count=1,
            metadata={
                "engine": self.name,
                "width": str(w),
                "height": str(h),
                "channels": str(ch),
                "brightness": str(brightness),
            },
        )


# registered as "jpeg-decode" in stages/engines.py (lazy factory)

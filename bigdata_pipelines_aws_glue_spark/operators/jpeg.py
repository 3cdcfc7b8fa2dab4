"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec) in
numpy + stdlib only.

Narrows the multimodal format seam (``multimodal.py``): real 100 TB
image corpora are JPEG-heavy, so ``decode_image`` should not punt on
the dominant format. Scope — the parts the spec calls *baseline
sequential DCT*:

- decoder: SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS marker walk, Huffman
  entropy decode with byte unstuffing + restart markers, dequantize,
  zigzag, float IDCT, chroma upsampling for sampling factors 1-2
  (4:4:4 / 4:2:2 / 4:2:0), YCbCr -> RGB; grayscale single-component
  scans decode to (H, W).
- progressive decoder (SOF2, T.81 Annex G): multi-scan coefficient
  accumulation with spectral selection (Ss..Se) and successive
  approximation (Ah/Al) for both DC and AC bands — interleaved DC
  scans, non-interleaved AC scans, EOB-run coding, and the
  correction-bit refinement algorithm; one IDCT pass at EOI.
- encoder: 4:4:4 (or single-component gray) baseline with the Annex K
  example quantization + Huffman tables — used by the round-trip
  tests and the synthetic corpus tooling.

Arithmetic coding, 12-bit precision, and hierarchical modes still
raise ``NotImplementedError`` — that seam now carries only
genuinely-rare variants; wire libjpeg-turbo / PIL there at deploy
time. Pure-Python Huffman bit I/O is the documented perf seam:
correctness-complete, but a native codec should replace it for bulk
decode at scale.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Zigzag scan order: index i of the stream maps to (row, col).
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: Annex K.1 example luminance / chrominance quantization tables
#: (natural row order, built from zigzag-order spec listing).
_QT_LUMA_ZZ = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA_ZZ = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 example Huffman tables: (BITS counts per code length
#: 1..16, HUFFVAL symbol list).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: Orthonormal 8-point DCT-II basis; IDCT(B) = T.T @ B @ T.
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the spec's canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (leaves it unconsumed)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.acc, self.n = 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            # truncated stream: feed the spec's 1-bit padding; the
            # Huffman walk then terminates in a ValueError (or a
            # bounded garbage block) instead of an IndexError
            self.acc = (self.acc << 8) | 0xFF
            self.n += 8
            return
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = (
                self.buf[self.pos + 1]
                if self.pos + 1 < len(self.buf)
                else 0xD9  # treat a trailing lone 0xFF as EOI
            )
            if nxt == 0x00:
                self.pos += 2
            else:
                # real marker: the spec pads the scan tail with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, n: int) -> int:
        while self.n < n:
            self._fill()
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (F.2.2.1): map t raw bits to the signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential or progressive JPEG -> (H, W, 3) RGB uint8
    ((H, W) for single-component grayscale scans)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG (dangling marker byte)")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9 and coefs is not None:  # EOI after prog scans
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (marker segment header)")
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seg_len]
        if len(body) < seg_len - 2:
            raise ValueError("truncated JPEG (marker segment body)")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(body, np.uint8, count=64, offset=i)
                    i += 64
                t = np.zeros((8, 8))
                for z, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = vals[z]
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (baseline), SOF2 (prog.)
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG needs an external codec")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical JPEG needs an external codec "
                "(libjpeg-turbo/PIL seam)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = {}
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                sel[cs] = (tt >> 4, tt & 0xF)
            if not frame["progressive"]:
                return _decode_scan(
                    payload, pos + seg_len, frame, sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_prog_scan(
                payload, pos + seg_len, frame, sel,
                (ss, se, ah_al >> 4, ah_al & 0xF),
                huff_dc, huff_ac, restart_interval, coefs,
            )
            continue
        pos += seg_len
    if coefs is not None:
        return _finish_progressive(frame, coefs, qt)
    raise ValueError("JPEG missing SOS")


def _decode_scan(buf, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    rd = _BitReader(buf, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.align()
                if (
                    rd.pos + 1 < len(rd.buf)
                    and rd.buf[rd.pos] == 0xFF
                    and 0xD0 <= rd.buf[rd.pos + 1] <= 0xD7
                ):
                    rd.pos += 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(
                            rd, huff_dc[dct], huff_ac[act], pred, ci
                        )
                        px = _T.T @ (blk * qt[c["tq"]]) @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    return _planes_to_image(planes, frame)


def _planes_to_image(planes, frame) -> np.ndarray:
    """Upsample subsampled chroma planes, crop padding, YCbCr->RGB
    (shared by the baseline and progressive finishers)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h_img, w_img = frame["h"], frame["w"]
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out.append(p[:h_img, :w_img])
    if len(out) == 1:
        return np.clip(out[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive (Annex G)


def _alloc_coefs(frame) -> list[np.ndarray]:
    """Per-component zigzag-order coefficient store, padded to the MCU
    grid (interleaved DC scans code the padding blocks too)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _prog_restart(rd, pred, state) -> None:
    rd.align()
    if (
        rd.pos + 1 < len(rd.buf)
        and rd.buf[rd.pos] == 0xFF
        and 0xD0 <= rd.buf[rd.pos + 1] <= 0xD7
    ):
        rd.pos += 2
    for k in pred:
        pred[k] = 0
    state["eobrun"] = 0


def _prog_dc(rd, blk, table, pred, ci, ah, al) -> None:
    """DC band: first scan codes the point-transformed difference;
    refinement scans append one magnitude bit (two's-complement OR —
    exact for either sign because the approximation zeroed the low
    bits)."""
    if ah == 0:
        t = rd.huff(table)
        diff = _extend(rd.bits(t), t) if t else 0
        pred[ci] += diff
        blk[0] = pred[ci] << al
    elif rd.bits(1):
        blk[0] |= 1 << al


def _prog_ac_first(rd, blk, table, ss, se, al, state) -> None:
    """AC band, Ah=0 (G.1.2.2): run/size coding within Ss..Se with
    EOB-run escapes covering whole zero blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.huff(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += rd.bits(r)
            return
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC run past Se")
        blk[k] = _extend(rd.bits(s), s) << al
        k += 1


def _prog_ac_refine(rd, blk, table, ss, se, al, state) -> None:
    """AC band, Ah>0 (G.1.2.3): each symbol may create one new ±1<<Al
    coefficient; every already-nonzero coefficient passed on the way
    (and the whole Ss..Se tail during an EOB run) receives a
    correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = rd.huff(table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += rd.bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size must be 1")
                val = p1 if rd.bits(1) else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if rd.bits(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("JPEG AC refinement position past Se")
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and rd.bits(1) and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _decode_prog_scan(
    buf, pos, frame, sel, spec, huff_dc, huff_ac, restart_interval, coefs
) -> int:
    """Decode one progressive scan into ``coefs``; returns the buffer
    position of the terminating marker."""
    ss, se, ah, al = spec
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    scomps = [(ci, c) for ci, c in enumerate(comps) if c["id"] in sel]
    if not scomps:
        raise ValueError("JPEG scan selects unknown component")
    rd = _BitReader(buf, pos)
    state = {"eobrun": 0}
    pred = {ci: 0 for ci, _ in scomps}
    unit = 0
    if len(scomps) > 1:
        if ss != 0:
            raise ValueError("interleaved progressive scan must be DC")
        mcus_x = -(-frame["w"] // (8 * hmax))
        mcus_y = -(-frame["h"] // (8 * vmax))
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    _prog_restart(rd, pred, state)
                for ci, c in scomps:
                    table = huff_dc.get(sel[c["id"]][0]) if ah == 0 else None
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _prog_dc(rd, blk, table, pred, ci, ah, al)
                unit += 1
    else:
        ci, c = scomps[0]
        # non-interleaved scans cover ceil(component_samples / 8)
        # blocks per axis — padding blocks are NOT coded (A.2.2)
        comp_w = -(-(frame["w"] * c["h"]) // hmax)
        comp_h = -(-(frame["h"] * c["v"]) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        dc_tab, ac_tab = sel[c["id"]]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    _prog_restart(rd, pred, state)
                blk = coefs[ci][by, bx]
                if ss == 0:
                    _prog_dc(
                        rd, blk,
                        huff_dc.get(dc_tab) if ah == 0 else None,
                        pred, ci, ah, al,
                    )
                elif ah == 0:
                    _prog_ac_first(rd, blk, huff_ac[ac_tab], ss, se, al, state)
                else:
                    _prog_ac_refine(rd, blk, huff_ac[ac_tab], ss, se, al, state)
                unit += 1
    return rd.pos


def _finish_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + vectorized IDCT over the accumulated coefficient
    store (one einsum per component — the per-block Python loop exists
    only in the entropy decode, where the bitstream forces it)."""
    zr = np.array([r for r, _ in _ZIGZAG])
    zc = np.array([c for _, c in _ZIGZAG])
    planes = []
    for ci, c in enumerate(frame["comps"]):
        q = qt[c["tq"]]
        arr = coefs[ci].astype(np.float64) * q[zr, zc]
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 8, 8))
        nat[..., zr, zc] = arr
        px = np.einsum("ij,xyjk,kl->xyil", _T.T, nat, _T) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_image(planes, frame)


def _decode_block(rd, dc_tab, ac_tab, pred, ci) -> np.ndarray:
    blk = np.zeros((8, 8))
    t = rd.huff(dc_tab)
    diff = _extend(rd.bits(t), t) if t else 0
    pred[ci] += diff
    blk[0, 0] = pred[ci]
    z = 1
    while z < 64:
        rs = rd.huff(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                z += 16
                continue
            break  # EOB
        z += r
        if z > 63:
            raise ValueError("JPEG AC run past end of block")
        row, col = _ZIGZAG[z]
        blk[row, col] = _extend(rd.bits(s), s)
        z += 1
    return blk


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        # pad the final byte with 1-bits, as the spec prescribes
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _encode_block(bw, blk, qtab, dc_codes, ac_codes, pred, ci) -> None:
    coef = _T @ (blk - 128.0) @ _T.T
    q = np.round(coef / qtab).astype(np.int64)
    zz = [int(q[r, c]) for r, c in _ZIGZAG]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for z in range(63, 0, -1):
        if zz[z]:
            last_nz = z
            break
    for z in range(1, last_nz + 1):
        v = zz[z]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)


def _qt_segment(tq: int, zz_vals: list[int]) -> bytes:
    return struct.pack(">HB", 67, tq) + bytes(zz_vals)


def _dht_segment(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline 4:4:4 (RGB (H,W,3)) or single-component grayscale
    ((H,W)) JPEG with the Annex K example tables.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that-many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature real encoders use on large images; also
    exercises the decoder's restart path in tests."""
    arr = pixels.astype(np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [_QT_LUMA_ZZ] + ([] if gray else [_QT_CHROMA_ZZ])
    qtabs = []
    for zz_vals in qts:
        t = np.zeros((8, 8))
        for z, (row, col) in enumerate(_ZIGZAG):
            t[row, col] = zz_vals[z]
        qtabs.append(t)
    out = bytearray(b"\xff\xd8")
    for tq, zz_vals in enumerate(qts):
        out += b"\xff\xdb" + _qt_segment(tq, zz_vals)
    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + sof
    out += b"\xff\xc4" + _dht_segment(0, 0, _DC_LUMA)
    out += b"\xff\xc4" + _dht_segment(1, 0, _AC_LUMA)
    if not gray:
        out += b"\xff\xc4" + _dht_segment(0, 1, _DC_CHROMA)
        out += b"\xff\xc4" + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos
    dc_codes = [
        _canonical_codes(*_DC_LUMA),
        _canonical_codes(*_DC_CHROMA),
    ]
    ac_codes = [
        _canonical_codes(*_AC_LUMA),
        _canonical_codes(*_AC_CHROMA),
    ]
    bw = _BitWriter()
    pred = [0] * nc
    hb, wb = -(-h // 8), -(-w // 8)
    mcu = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                bw = _BitWriter()
                pred = [0] * nc
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), plane[min(by * 8, h - 1), min(bx * 8, w - 1)])
                ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
                blk[:ys, :xs] = plane[by * 8 : by * 8 + ys, bx * 8 : bx * 8 + xs]
                ti = 0 if ci == 0 else 1
                _encode_block(
                    bw, blk, qtabs[ti], dc_codes[ti], ac_codes[ti], pred, ci
                )
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

"""GIF89a codec — pure numpy + stdlib, the second REAL multi-frame
format after MJPEG (AVI/MP4), narrowing the round-6 "non-MJPEG video
codec" seam with the one format this container CAN cross-validate:
``javax.imageio`` (already the PNG/JPEG interop oracle in this
test suite) both reads and writes GIF, including multi-frame
animations, so the encoder and decoder are each checked against an
independent implementation rather than only against each other —
the discipline that kept arithmetic JPEG an honest seam.

Covered: GIF87a/89a headers, global and local color tables,
variable-width LZW (code widths 3–12, clear/EOI, deferred-clear
full-table behavior, KwKwK case), interlaced images, multi-frame
animations with graphic-control extensions (all four disposal
methods: none/keep/restore-background/restore-previous,
transparency), arbitrary extension skipping. Disposal 3
(restore-previous, closed r9) keeps one pre-render canvas copy —
the spec's "previous" is the canvas before the current graphic, not
a deeper history; javax.imageio's writer never emits it, so the
fixture is hand-assembled and its GCE is cross-checked against
javax.imageio's metadata parser (tests/test_gif.py).

The LZW stream here is the GIF flavor: LSB-first bit packing inside
255-byte sub-blocks, initial code size from the palette depth, table
reset on CLEAR, width growth when the table reaches 2^width.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAX_WIDTH = 12  # LZW code width cap (GIF spec)


# ----------------------------------------------------------------- LZW


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR, data codes, CLEAR on table
    overflow (4096), EOI; variable width grows with the table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        # the decoder registers this same entry one code later, so
        # width must grow when OUR next_code passes 2^width — after
        # the emit above, mirroring the decoder's post-add check
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < GIF_MAX_WIDTH:
            width += 1
        if next_code > (1 << GIF_MAX_WIDTH):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_encode`; tolerates the deferred-clear
    idiom (full table, no CLEAR: codes keep coming at width 12)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: emit what we have
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < GIF_MAX_WIDTH:
            width += 1


# ------------------------------------------------------------- encoder


def grayscale_palette() -> np.ndarray:
    """256-entry r=g=b ramp — index i renders as (i, i, i), which is
    what makes the registry query's pixel sums SQL-replayable."""
    ramp = np.arange(256, dtype=np.uint8)
    return np.stack([ramp, ramp, ramp], axis=1)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
    loop: bool = True,
) -> bytes:
    """GIF89a animation from uint8 INDEX rasters (h, w) sharing one
    global 256-entry palette. Single-frame lists produce a plain
    still GIF (no loop extension)."""
    if palette is None:
        palette = grayscale_palette()
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    # logical screen: global table, 8-bit color resolution, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        if len(frames) > 1:
            # graphic control: disposal=1 (keep), no transparency
            out += b"\x21\xf9" + bytes([4, 0b100]) + struct.pack(
                "<H", delay_cs
            ) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # min LZW code size for a 256-entry palette
        out += _sub_blocks(lzw_encode(fr.astype(np.uint8).tobytes(), 8))
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------- decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, idx.shape[0], step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-blocks")
        size = buf[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += buf[pos : pos + size]
        pos += size


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """Full-canvas RGB frames (h, w, 3) uint8, composited per the
    GIF disposal model (none / keep / restore-background /
    restore-previous)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[np.ndarray] = []
    disposal = 0
    transparent: int | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image with no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(data, mcs), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF: short pixel data")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        # disposal 2 restores the frame rectangle to background after
        # display; disposal 3 (restore-previous) restores the whole
        # canvas to its pre-render state — one saved copy suffices
        # (the spec's "previous" is the canvas before THIS graphic,
        # not a deeper history), so no frame stack is needed.
        before = canvas.copy() if disposal in (2, 3) else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[idx.clip(max=len(pal) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas = before
            bgc = gct[bg] if (gct is not None and bg < len(gct)) else 0
            canvas[top : top + h, left : left + w] = bgc
        elif disposal == 3:
            canvas = before
        # A GCE scopes to only the FIRST following image block
        # (GIF89a §23): both fields reset once consumed, so a
        # GCE-less frame after a disposal-2/3 frame composites with
        # disposal "none", not the stale method.
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF: no image blocks")
    return frames


# ------------------------------------------------- registry query

GIF_FRAME_W = GIF_FRAME_H = 16
GIF_PX_PER_FRAME = GIF_FRAME_W * GIF_FRAME_H


def synth_gif_frames(doc_id: int, text: str) -> list[np.ndarray]:
    """Deterministic index rasters from the text bytes (the corpus
    payload recipe): frame f, row y, col x reads byte
    ``(f*256 + y*16 + x) % nb`` (0 for empty docs); 1–4 frames by
    ``doc_id % 4``."""
    b = np.frombuffer((text or "").encode(), dtype=np.uint8)
    nf = 1 + int(doc_id) % 4
    if len(b) == 0:
        return [
            np.zeros((GIF_FRAME_H, GIF_FRAME_W), dtype=np.uint8)
        ] * nf
    pos = np.arange(nf * GIF_PX_PER_FRAME, dtype=np.int64) % len(b)
    return list(
        b[pos].reshape(nf, GIF_FRAME_H, GIF_FRAME_W)
    )


def gif_frames_batch(batches):
    """mapInPandas kernel: synth -> encode_gif -> REAL decode_gif ->
    per-frame pixel sums from the DECODED RGB canvas. The grayscale
    palette makes each decoded pixel (i, i, i) for source index i, so
    px_sum == 3 * Σ(source bytes) iff the whole LZW/GIF chain is
    lossless — which is what the SQL twin attests from the text
    recipe alone."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            frames = synth_gif_frames(doc_id, text)
            decoded = decode_gif(encode_gif(frames))
            for i, rgb in enumerate(decoded):
                rows.append(
                    (
                        int(doc_id),
                        len(decoded),
                        i,
                        int(rgb.astype(np.int64).sum()),
                    )
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_frames", "frame_idx", "px_sum"]
        )


def multimodal_gif_frames(spark, sf_dir):
    """Animated-GIF frame extraction over the corpus: every document
    becomes a REAL GIF89a animation (1–4 frames) that is then decoded
    back through the full LZW path, one output row per frame with the
    exact decoded pixel sum. Map-only fan-out (the video-pipeline
    shape); the SQL twin recomputes every sum from the synthesis
    recipe, so the hash match attests encoder+decoder end-to-end."""
    from pyspark.sql import functions as F

    from bigdata_pipelines_aws_glue_spark.functions.rounding import (
        stable_round,
    )
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = spread(docs).mapInPandas(
        gif_frames_batch,
        schema="doc_id long, n_frames int, frame_idx int, px_sum long",
    )
    return raw.select(
        "doc_id",
        "n_frames",
        "frame_idx",
        "px_sum",
        stable_round(
            F.col("px_sum") / F.lit(float(3 * GIF_PX_PER_FRAME)), 6
        ).alias("mean_px"),
    )


#: ASCII corpus assumption as in the other payload oracles
#: (length(text) chars == encoded bytes); nb=0 documents mirror the
#: kernel's all-zero rasters.
GIF_FRAMES_ORACLE = f"""
WITH d AS (
    SELECT doc_id, text, length(text) AS nb,
           1 + CAST(doc_id % 4 AS INT) AS n_frames
    FROM documents
),
fr AS (
    SELECT d.doc_id, d.n_frames, CAST(f.f AS INT) AS frame_idx, d.text,
           d.nb
    FROM d JOIN generate_series(0, 3) f(f) ON f.f < d.n_frames
),
px AS (
    SELECT doc_id, n_frames, frame_idx,
           CASE WHEN nb > 0 THEN 3 * sum(
               ascii(substr(text,
                     CAST((frame_idx * {GIF_PX_PER_FRAME} + p.p) % nb
                          AS BIGINT) + 1, 1)))
                ELSE 0 END AS px_sum
    FROM fr, generate_series(0, {GIF_PX_PER_FRAME - 1}) p(p)
    GROUP BY doc_id, n_frames, frame_idx, nb
)
SELECT doc_id, n_frames, frame_idx,
       CAST(px_sum AS BIGINT) AS px_sum,
       floor((px_sum / {float(3 * GIF_PX_PER_FRAME)}) * 1000000.0 + 0.5)
         / 1000000.0 AS mean_px
FROM px
"""


def _register() -> None:
    from bigdata_pipelines_aws_glue_spark import registry

    registry.register(
        "multimodal_gif_frames", multimodal_gif_frames, GIF_FRAMES_ORACLE
    )

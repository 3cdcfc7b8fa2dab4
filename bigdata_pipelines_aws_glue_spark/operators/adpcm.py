"""IMA/DVI ADPCM WAV codec ([north-star] N4 adjacency; no reference
citation — the reference has no audio). Closes the ADPCM half of the
compressed-audio seam (VERDICT_r9 item 8): WAV format tag 0x0011,
4-bit IMA ADPCM in the standard block framing (4-byte block header =
initial predictor int16 + step index + reserved; then two LOW-nibble-
first samples per byte; the step index carries ACROSS blocks, the
predictor resets to each block's first sample).

Honesty of the close (the build's "no validator → stays a seam"
rule): the per-nibble compress/expand state machine is the classic
Intel/DVI algorithm, cross-validated in ``tests/test_adpcm.py``
against CPython's ``audioop`` (``lin2adpcm``/``adpcm2lin`` implement
the same DVI arithmetic over a high-nibble-first raw stream, so the
tests compare under nibble reorder with explicit initial state).
MS ADPCM (tag 0x0002) has no in-container validator and stays a loud
seam at ``decode_wav``'s dispatch.

Oracle design — a FULL hash oracle, not a bounds boolean: an ADPCM
encoder tracks its decoder's state exactly (each step's new
prediction IS what the decoder will reconstruct), so
``decode(encode(pcm))`` equals the encoder's prediction sequence.
The DuckDB twin therefore replays the ENCODER state machine from the
synth recipe's PCM as a recursive CTE (one level per sample index,
all documents advance in lockstep — the ``cdc_clamped_chunks``
pattern) and aggregates the same per-doc sums the Spark kernel
computes from the REAL container bytes. A hash match proves encoder,
container framing, and decoder end to end.

Scale notes (100 TB): both kernels are Arrow-batched ``mapInPandas``
map-only passes over KB-sized payloads — the same shape as every
other modality kernel; no shuffle beyond the input partitioning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from bigdata_pipelines_aws_glue_spark import registry
from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

#: IMA/DVI step-size table (89 entries) and index-adjustment table —
#: fixed by the IMA ADPCM specification (and byte-identical in
#: CPython's audioop implementation of the same algorithm).
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
    4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
    10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
    24623, 27086, 29794, 32767,
)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

#: WAV block align for the synth corpus: 36 bytes → 65 samples per
#: block, so ~150-sample documents span 3 blocks and the cross-block
#: index carry is ON the attested path (a 256-byte align would leave
#: most docs single-block and the framing untested).
BLOCK_ALIGN = 36
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1  # 65

WAVE_FMT_IMA_ADPCM = 0x11


def _encode_step(s: int, pred: int, index: int) -> tuple[int, int, int]:
    """One DVI compress step: returns (4-bit code, new predictor,
    new step index). The new predictor equals what the decoder will
    reconstruct for this code — the property the oracle exploits."""
    step = STEP_TABLE[index]
    diff = s - pred
    sign = 8 if diff < 0 else 0
    if sign:
        diff = -diff
    delta = 0
    vpdiff = step >> 3
    if diff >= step:
        delta = 4
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        delta |= 2
        diff -= step
        vpdiff += step
    step >>= 1
    if diff >= step:
        delta |= 1
        vpdiff += step
    pred = pred - vpdiff if sign else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    delta |= sign
    index = max(0, min(88, index + INDEX_TABLE[delta & 7]))
    return delta, pred, index


def ima_encode(samples, block_align: int = BLOCK_ALIGN) -> bytes:
    """int16 mono PCM → raw WAV IMA-ADPCM ``data`` chunk bytes.
    Every emitted block is full-size (the final partial block is
    zero-padded; the decoder trims by the fact-chunk sample count)."""
    spb = (block_align - 4) * 2 + 1
    samples = np.asarray(samples, dtype=np.int64)
    out = bytearray()
    index = 0
    for b0 in range(0, len(samples), spb):
        blk = samples[b0 : b0 + spb]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in blk[1:]:
            delta, pred, index = _encode_step(int(s), pred, index)
            nibbles.append(delta)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - len(nibbles) // 2)
    return bytes(out)


def _decode_channel(
    pred: int, index: int, nib: bytes, n: int
) -> list[int]:
    """Expand ``n`` LOW-nibble-first codes from one channel's nibble
    bytes, starting from the block-header state. Shared by the mono
    and stereo paths (the per-nibble arithmetic is identical)."""
    if len(nib) < (n + 1) // 2:
        raise ValueError("IMA ADPCM: truncated block body")
    out = []
    for j in range(n):
        byte = nib[j >> 1]
        delta = (byte & 0x0F) if (j & 1) == 0 else (byte >> 4)
        step = STEP_TABLE[index]
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if delta & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + INDEX_TABLE[delta & 7]))
        out.append(pred)
    return out


def ima_decode(
    data: bytes, block_align: int, n_samples: int
) -> np.ndarray:
    """Raw ``data`` chunk bytes → int16 mono PCM (``n_samples`` from
    the fact chunk bounds the final partial block)."""
    spb = (block_align - 4) * 2 + 1
    out = np.empty(n_samples, dtype=np.int16)
    pos = 0
    k = 0
    while k < n_samples:
        if pos + 4 > len(data):
            raise ValueError("IMA ADPCM: truncated block header")
        pred, index, _ = struct.unpack("<hBB", data[pos : pos + 4])
        if index > 88:
            raise ValueError(f"IMA ADPCM: bad step index {index}")
        nib = data[pos + 4 : pos + block_align]
        pos += block_align
        out[k] = pred
        k += 1
        take = min(spb - 1, n_samples - k)
        out[k : k + take] = _decode_channel(pred, index, nib, take)
        k += take
    return out


def ima_decode_stereo(
    data: bytes, block_align: int, n_frames: int
) -> np.ndarray:
    """Stereo WAV IMA-ADPCM block layout: TWO 4-byte channel headers
    (left then right), then the codes interleaved in 4-byte (8-code)
    channel groups — left group, right group, ... Returns (n, 2)
    int16. Samples per block per channel = block_align - 7 (the
    standard ``(block_align - 4*ch) * 8 / (4*ch) + 1`` for ch=2)."""
    spb = block_align - 7
    out = np.empty((n_frames, 2), dtype=np.int16)
    pos = 0
    k = 0
    while k < n_frames:
        if pos + 8 > len(data):
            raise ValueError("IMA ADPCM: truncated stereo headers")
        pl, il, _ = struct.unpack("<hBB", data[pos : pos + 4])
        pr, ir, _ = struct.unpack("<hBB", data[pos + 4 : pos + 8])
        if il > 88 or ir > 88:
            raise ValueError("IMA ADPCM: bad step index")
        body = data[pos + 8 : pos + block_align]
        pos += block_align
        groups = [body[i : i + 4] for i in range(0, len(body), 4)]
        nib_l = b"".join(groups[0::2])
        nib_r = b"".join(groups[1::2])
        out[k, 0], out[k, 1] = pl, pr
        k += 1
        take = min(spb - 1, n_frames - k)
        out[k : k + take, 0] = _decode_channel(pl, il, nib_l, take)
        out[k : k + take, 1] = _decode_channel(pr, ir, nib_r, take)
        k += take
    return out


#: stereo block align: 72 → 65 samples/block/channel, matching the
#: mono profile (align 36) so both paths exercise multi-block docs.
BLOCK_ALIGN_STEREO = 72


def ima_encode_stereo(
    left, right, block_align: int = BLOCK_ALIGN_STEREO
) -> bytes:
    """Stereo companion of ``ima_encode``: per-channel predictors
    reset per block, per-channel step indices carry across blocks,
    codes packed LOW-nibble-first inside interleaved 4-byte channel
    groups. Channels must be equal length (pad upstream)."""
    if len(left) != len(right):
        raise ValueError("stereo channels must be equal length")
    spb = block_align - 7
    n_groups = (block_align - 8) // 8
    left = np.asarray(left, dtype=np.int64)
    right = np.asarray(right, dtype=np.int64)
    out = bytearray()
    idx = [0, 0]
    for b0 in range(0, len(left), spb):
        chans = (left[b0 : b0 + spb], right[b0 : b0 + spb])
        preds = [int(c[0]) for c in chans]
        for ch in (0, 1):
            out += struct.pack("<hBB", preds[ch], idx[ch], 0)
        packed = []
        for ch in (0, 1):
            nibs = []
            p, i = preds[ch], idx[ch]
            for s in chans[ch][1:]:
                d, p, i = _encode_step(int(s), p, i)
                nibs.append(d)
            idx[ch] = i
            nibs += [0] * (8 * n_groups - len(nibs))
            packed.append(
                [
                    bytes(
                        lo | (hi << 4)
                        for lo, hi in zip(
                            nibs[8 * g : 8 * g + 8 : 2],
                            nibs[8 * g + 1 : 8 * g + 8 : 2],
                        )
                    )
                    for g in range(n_groups)
                ]
            )
        for g in range(n_groups):
            out += packed[0][g] + packed[1][g]
    return bytes(out)


def encode_wav_ima(
    samples,
    sample_rate: int | None = None,
    block_align: int | None = None,
    right=None,
) -> bytes:
    """RIFF/WAVE container around IMA-ADPCM blocks: fmt tag 0x0011
    with the cbSize=2 wSamplesPerBlock extension, the spec-required
    ``fact`` chunk carrying the exact per-channel sample count, then
    data. Pass ``right`` for stereo (``samples`` becomes the left
    channel)."""
    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        AUDIO_SAMPLE_RATE,
    )

    rate = sample_rate or AUDIO_SAMPLE_RATE
    channels = 2 if right is not None else 1
    if block_align is None:
        block_align = BLOCK_ALIGN_STEREO if channels == 2 else BLOCK_ALIGN
    if channels == 2:
        spb = block_align - 7
        data = ima_encode_stereo(samples, right, block_align)
    else:
        spb = (block_align - 4) * 2 + 1
        data = ima_encode(samples, block_align)
    n = len(samples)
    byte_rate = (rate * block_align + spb - 1) // spb  # avg, per spec
    fmt_body = struct.pack(
        "<HHIIHHHH",
        WAVE_FMT_IMA_ADPCM,
        channels,
        rate,
        byte_rate,
        block_align,
        4,  # bits per sample
        2,  # cbSize
        spb,
    )
    chunks = (
        b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------- registry query

ADPCM_SCHEMA = "doc_id long, n_samples int, pcm_sum long, peak long"


def adpcm_roundtrip_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: synth PCM from text bytes (the established
    audio recipe: consecutive byte pairs as little-endian int16, odd
    tail zero-padded), encode to a REAL IMA-ADPCM WAV container,
    decode it back through ``decode_wav``'s tag-0x11 dispatch, and
    emit per-doc sums of the RECONSTRUCTED samples."""
    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        decode_wav,
    )

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = np.frombuffer((text or "").encode(), dtype=np.uint8)
            if len(b) % 2:
                b = np.concatenate([b, np.zeros(1, np.uint8)])
            pcm = b.view("<i2").astype(np.int64)
            samples, _rate = decode_wav(encode_wav_ima(pcm))
            s = samples.astype(np.int64)
            rows.append(
                (
                    doc_id,
                    len(s),
                    int(s.sum()),
                    int(np.abs(s).max()) if len(s) else 0,
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "pcm_sum", "peak"]
        )


def multimodal_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: IMA-ADPCM round-trip attestation (full hash
    oracle — see module docstring for why the twin can replay exact
    reconstructed values without the byte stream)."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread

    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs.select("doc_id", "text"))
        .mapInPandas(adpcm_roundtrip_batch, schema=ADPCM_SCHEMA)
        .select("doc_id", "n_samples", "pcm_sum", "peak")
    )


_SQL_STEPS = "[" + ", ".join(str(v) for v in STEP_TABLE) + "]"
_SQL_IDX = "[" + ", ".join(str(v) for v in INDEX_TABLE) + "]"

#: Recursive replay of the encoder state machine (lockstep over all
#: docs, one level per sample index). Block boundary: sample k is a
#: block start iff (k-1) % SAMPLES_PER_BLOCK == 0 — there the
#: predictor resets to the raw sample and the index carries.
#: PRECONDITION (same as the G.711 oracle, multimodal.py): the
#: corpus text is ASCII, so ``ascii(substr(text, i, 1))`` (character
#: indexing) equals the i-th encoded BYTE the kernel consumes. On
#: non-ASCII text the two diverge (DuckDB 1.0 has no BLOB substr).
#: NULL text is coalesced to '' so every doc_id gets a (0,0,0) row,
#: matching the kernel's ``text or ""``.
AUDIO_ADPCM_ORACLE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, coalesce(text, '') AS text,
             CAST(ceil(octet_length(encode(coalesce(text, ''))) / 2.0)
                  AS BIGINT) AS n
      FROM documents),
walk AS (
    SELECT doc_id, CAST(1 AS BIGINT) AS k,
           s1 AS pred, 0 AS idx,
           s1 AS acc, abs(s1) AS peak
    FROM (
        SELECT doc_id, n,
               CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END
                    AS BIGINT) AS s1
        FROM (
            SELECT doc_id, n,
                   ascii(substr(text, 1, 1))
                   + 256 * CASE WHEN length(text) >= 2
                                THEN ascii(substr(text, 2, 1))
                                ELSE 0 END AS v
            FROM t WHERE n >= 1
        )
    )
    UNION ALL
    SELECT w.doc_id, w.k + 1,
           CASE WHEN b.bnd THEN sx.s ELSE p.rawpred END,
           CASE WHEN b.bnd THEN w.idx
                ELSE least(88, greatest(0, w.idx + {_SQL_IDX}[
                    (CASE WHEN g.d4 THEN 4 ELSE 0 END)
                    + (CASE WHEN g.d2 THEN 2 ELSE 0 END)
                    + (CASE WHEN g.d1 THEN 1 ELSE 0 END) + 1])) END,
           w.acc + (CASE WHEN b.bnd THEN sx.s ELSE p.rawpred END),
           greatest(w.peak,
                    abs(CASE WHEN b.bnd THEN sx.s ELSE p.rawpred END))
    FROM walk w
    JOIN t ON t.doc_id = w.doc_id AND w.k < t.n
    CROSS JOIN LATERAL (
        SELECT CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END
                    AS BIGINT) AS s
        FROM (
            SELECT ascii(substr(t.text,
                                CAST(2 * (w.k + 1) - 1 AS INTEGER), 1))
                   + 256 * CASE WHEN length(t.text) >= 2 * (w.k + 1)
                                THEN ascii(substr(t.text,
                                        CAST(2 * (w.k + 1) AS INTEGER), 1))
                                ELSE 0 END AS v
        )
    ) sx
    CROSS JOIN LATERAL (
        SELECT (w.k % {SAMPLES_PER_BLOCK}) = 0 AS bnd
    ) b
    CROSS JOIN LATERAL (
        SELECT {_SQL_STEPS}[CAST(w.idx AS INTEGER) + 1] AS st,
               abs(sx.s - w.pred) AS adiff
    ) l0
    CROSS JOIN LATERAL (SELECT l0.adiff >= l0.st AS d4) l1
    CROSS JOIN LATERAL (
        SELECT l0.adiff - CASE WHEN l1.d4 THEN l0.st ELSE 0 END AS r2
    ) l2
    CROSS JOIN LATERAL (SELECT l2.r2 >= l0.st // 2 AS d2) l3
    CROSS JOIN LATERAL (
        SELECT l2.r2 - CASE WHEN l3.d2 THEN l0.st // 2 ELSE 0 END AS r1
    ) l4
    CROSS JOIN LATERAL (SELECT l4.r1 >= l0.st // 4 AS d1) l5
    CROSS JOIN LATERAL (
        SELECT l1.d4 AS d4, l3.d2 AS d2, l5.d1 AS d1,
               l0.st // 8
               + (CASE WHEN l1.d4 THEN l0.st ELSE 0 END)
               + (CASE WHEN l3.d2 THEN l0.st // 2 ELSE 0 END)
               + (CASE WHEN l5.d1 THEN l0.st // 4 ELSE 0 END) AS vp
    ) g
    CROSS JOIN LATERAL (
        SELECT CASE WHEN sx.s < w.pred
                    THEN greatest(-32768, w.pred - g.vp)
                    ELSE least(32767, w.pred + g.vp) END AS rawpred
    ) p
)
SELECT w.doc_id,
       CAST(w.k AS INT) AS n_samples,
       CAST(w.acc AS BIGINT) AS pcm_sum,
       CAST(w.peak AS BIGINT) AS peak
FROM walk w JOIN t USING (doc_id) WHERE w.k = t.n
UNION ALL
SELECT doc_id, 0 AS n_samples, CAST(0 AS BIGINT) AS pcm_sum,
       CAST(0 AS BIGINT) AS peak
FROM t WHERE n = 0
"""


ADPCM_STEREO_SCHEMA = (
    "doc_id long, n_frames int, left_sum long, right_sum long"
)


def adpcm_stereo_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Stereo kernel: the synth PCM stream de-interleaves into
    left = even-index samples / right = odd-index (right zero-padded
    when the stream is odd), goes through a REAL stereo IMA-ADPCM
    container, and comes back through ``decode_wav``'s 2-channel
    dispatch."""
    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        decode_wav,
    )

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = np.frombuffer((text or "").encode(), dtype=np.uint8)
            if len(b) % 2:
                b = np.concatenate([b, np.zeros(1, np.uint8)])
            pcm = b.view("<i2").astype(np.int64)
            left, right = pcm[0::2], pcm[1::2]
            if len(right) < len(left):
                right = np.concatenate([right, np.zeros(1, np.int64)])
            if len(left):
                frames, _ = decode_wav(encode_wav_ima(left, right=right))
                f = frames.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        f.shape[0],
                        int(f[:, 0].sum()),
                        int(f[:, 1].sum()),
                    )
                )
            else:
                rows.append((doc_id, 0, 0, 0))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_frames", "left_sum", "right_sum"]
        )


def multimodal_audio_adpcm_stereo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry entry: STEREO IMA-ADPCM round-trip attestation —
    closes the mono-only limitation the mono query shipped with.
    Same full-hash-oracle argument (decode == per-channel encoder
    prediction sequence); the twin's recursive walk adds a channel
    dimension, so both channels' carried step indices and per-block
    predictor resets replay independently."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread

    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs.select("doc_id", "text"))
        .mapInPandas(adpcm_stereo_batch, schema=ADPCM_STEREO_SCHEMA)
        .select("doc_id", "n_frames", "left_sum", "right_sum")
    )


#: Stereo twin: identical encode-step lateral chain, with channel ch
#: (0 = left, 1 = right) threaded through the walk. Channel ch's
#: sample k is interleaved PCM sample j = 2(k-1) + ch + 1 (0 beyond
#: the stream = the right-channel pad); samples per block per channel
#: is block_align - 7 = 65. Same PRECONDITION as the mono oracle:
#: ASCII corpus (char indexing == byte indexing), NULL text coalesced
#: to '' so every doc_id gets a zero row like the kernel's
#: ``text or ""``.
_STEREO_SPB = BLOCK_ALIGN_STEREO - 7

AUDIO_ADPCM_STEREO_ORACLE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, coalesce(text, '') AS text,
             CAST(ceil(octet_length(encode(coalesce(text, ''))) / 2.0)
                  AS BIGINT) AS np,
             CAST(ceil(ceil(octet_length(encode(coalesce(text, ''))) / 2.0)
                       / 2.0) AS BIGINT) AS nf
      FROM documents),
walk AS (
    SELECT doc_id, ch, CAST(1 AS BIGINT) AS k,
           s1 AS pred, 0 AS idx, s1 AS acc
    FROM (
        SELECT doc_id, ch, nf,
               CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END
                    AS BIGINT) AS s1
        FROM (
            SELECT doc_id, nf, c.ch,
                   CASE WHEN (c.ch + 1) > np THEN 0 ELSE
                     ascii(substr(text,
                           CAST(2 * (c.ch + 1) - 1 AS INTEGER), 1))
                     + 256 * CASE WHEN length(text) >= 2 * (c.ch + 1)
                                  THEN ascii(substr(text,
                                       CAST(2 * (c.ch + 1) AS INTEGER), 1))
                                  ELSE 0 END
                   END AS v
            FROM t CROSS JOIN (SELECT unnest([0, 1]) AS ch) c
            WHERE nf >= 1
        )
    )
    UNION ALL
    SELECT w.doc_id, w.ch, w.k + 1,
           CASE WHEN b.bnd THEN sx.s ELSE p.rawpred END,
           CASE WHEN b.bnd THEN w.idx
                ELSE least(88, greatest(0, w.idx + {_SQL_IDX}[
                    (CASE WHEN l1.d4 THEN 4 ELSE 0 END)
                    + (CASE WHEN l3.d2 THEN 2 ELSE 0 END)
                    + (CASE WHEN l5.d1 THEN 1 ELSE 0 END) + 1])) END,
           w.acc + (CASE WHEN b.bnd THEN sx.s ELSE p.rawpred END)
    FROM walk w
    JOIN t ON t.doc_id = w.doc_id AND w.k < t.nf
    CROSS JOIN LATERAL (
        SELECT CAST(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END
                    AS BIGINT) AS s
        FROM (
            SELECT CASE WHEN (2 * w.k + w.ch + 1) > t.np THEN 0 ELSE
                     ascii(substr(t.text,
                           CAST(2 * (2 * w.k + w.ch + 1) - 1
                                AS INTEGER), 1))
                     + 256 * CASE WHEN length(t.text)
                                       >= 2 * (2 * w.k + w.ch + 1)
                                  THEN ascii(substr(t.text,
                                       CAST(2 * (2 * w.k + w.ch + 1)
                                            AS INTEGER), 1))
                                  ELSE 0 END
                   END AS v
        )
    ) sx
    CROSS JOIN LATERAL (
        SELECT (w.k % {_STEREO_SPB}) = 0 AS bnd
    ) b
    CROSS JOIN LATERAL (
        SELECT {_SQL_STEPS}[CAST(w.idx AS INTEGER) + 1] AS st,
               abs(sx.s - w.pred) AS adiff
    ) l0
    CROSS JOIN LATERAL (SELECT l0.adiff >= l0.st AS d4) l1
    CROSS JOIN LATERAL (
        SELECT l0.adiff - CASE WHEN l1.d4 THEN l0.st ELSE 0 END AS r2
    ) l2
    CROSS JOIN LATERAL (SELECT l2.r2 >= l0.st // 2 AS d2) l3
    CROSS JOIN LATERAL (
        SELECT l2.r2 - CASE WHEN l3.d2 THEN l0.st // 2 ELSE 0 END AS r1
    ) l4
    CROSS JOIN LATERAL (SELECT l4.r1 >= l0.st // 4 AS d1) l5
    CROSS JOIN LATERAL (
        SELECT l0.st // 8
               + (CASE WHEN l1.d4 THEN l0.st ELSE 0 END)
               + (CASE WHEN l3.d2 THEN l0.st // 2 ELSE 0 END)
               + (CASE WHEN l5.d1 THEN l0.st // 4 ELSE 0 END) AS vp
    ) g
    CROSS JOIN LATERAL (
        SELECT CASE WHEN sx.s < w.pred
                    THEN greatest(-32768, w.pred - g.vp)
                    ELSE least(32767, w.pred + g.vp) END AS rawpred
    ) p
)
SELECT t.doc_id,
       CAST(t.nf AS INT) AS n_frames,
       CAST(max(CASE WHEN w.ch = 0 THEN w.acc END) AS BIGINT)
           AS left_sum,
       CAST(max(CASE WHEN w.ch = 1 THEN w.acc END) AS BIGINT)
           AS right_sum
FROM walk w JOIN t ON t.doc_id = w.doc_id AND w.k = t.nf
GROUP BY t.doc_id, t.nf
UNION ALL
SELECT doc_id, 0 AS n_frames, CAST(0 AS BIGINT) AS left_sum,
       CAST(0 AS BIGINT) AS right_sum
FROM t WHERE nf = 0
"""


def _register() -> None:
    registry.register(
        "multimodal_audio_adpcm", multimodal_audio_adpcm, AUDIO_ADPCM_ORACLE
    )
    registry.register(
        "multimodal_audio_adpcm_stereo",
        multimodal_audio_adpcm_stereo,
        AUDIO_ADPCM_STEREO_ORACLE,
    )

"""IMA ADPCM codec: cross-validated against CPython's ``audioop``
(the in-container third-party validator — its lin2adpcm/adpcm2lin
implement the same Intel/DVI state machine over a HIGH-nibble-first
raw stream, so comparisons reorder nibbles and thread explicit
(predictor, index) state per block), plus block framing, the
decode==encoder-prediction oracle property, and container dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

audioop = pytest.importorskip("audioop")  # removed in Python 3.13

from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
    BLOCK_ALIGN,
    SAMPLES_PER_BLOCK,
    _encode_step,
    encode_wav_ima,
    ima_decode,
    ima_encode,
)
from bigdata_pipelines_aws_glue_spark.operators.multimodal import decode_wav


def _pcm(n, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, n).astype(np.int64)


def _blocks(data, n_total):
    """(first_sample, index, nibble_bytes, n_samples) per block."""
    pos, k = 0, 0
    while k < n_total:
        pred, idx, _ = struct.unpack("<hBB", data[pos : pos + 4])
        nib = data[pos + 4 : pos + BLOCK_ALIGN]
        pos += BLOCK_ALIGN
        n = min(SAMPLES_PER_BLOCK, n_total - k)
        yield pred, idx, nib, n
        k += n


def test_encoder_matches_audioop_nibble_for_nibble():
    pcm = _pcm(333)
    data = ima_encode(pcm)
    idx = 0
    checked = 0
    for b0, (pred, bidx, nib, bn) in zip(
        range(0, len(pcm), SAMPLES_PER_BLOCK), _blocks(data, len(pcm))
    ):
        blk = pcm[b0 : b0 + SAMPLES_PER_BLOCK]
        assert pred == blk[0] and bidx == idx  # header = sample + carry
        frag, state = audioop.lin2adpcm(
            blk[1:].astype("<i2").tobytes(), 2, (int(pred), idx)
        )
        n = bn - 1
        # audioop's output buffer drops a trailing odd nibble (its
        # size is len/(size*2)) — compare the pairs-complete prefix
        ncmp = (n // 2) * 2
        ours = [
            (nib[j >> 1] & 0xF) if j % 2 == 0 else (nib[j >> 1] >> 4)
            for j in range(ncmp)
        ]  # WAV: LOW nibble first
        theirs = [
            (frag[j >> 1] >> 4) if j % 2 == 0 else (frag[j >> 1] & 0xF)
            for j in range(ncmp)
        ]  # audioop: HIGH nibble first
        assert ours == theirs
        checked += ncmp
        idx = state[1]
    assert checked > 300  # multi-block coverage actually happened


def test_decoder_matches_audioop_sample_for_sample():
    pcm = _pcm(333, seed=7)
    data = ima_encode(pcm)
    ours = ima_decode(data, BLOCK_ALIGN, len(pcm))
    theirs = []
    for pred, bidx, nib, bn in _blocks(data, len(pcm)):
        theirs.append(pred)
        n = bn - 1
        swapped = bytes(((b & 0xF) << 4) | (b >> 4) for b in nib)
        frag, _ = audioop.adpcm2lin(
            swapped[: (n + 1) // 2], 2, (int(pred), bidx)
        )
        theirs.extend(
            int(v) for v in np.frombuffer(frag, dtype="<i2")[:n]
        )
    assert np.array_equal(ours.astype(int), np.array(theirs))


def test_decode_equals_encoder_prediction_sequence():
    """The property the DuckDB oracle replays: reconstructed samples
    ARE the encoder's prediction sequence."""
    pcm = _pcm(200, seed=9)
    dec = ima_decode(ima_encode(pcm), BLOCK_ALIGN, len(pcm))
    preds, idx = [], 0
    for b0 in range(0, len(pcm), SAMPLES_PER_BLOCK):
        blk = pcm[b0 : b0 + SAMPLES_PER_BLOCK]
        p = int(blk[0])
        preds.append(p)
        for s in blk[1:]:
            _, p, idx = _encode_step(int(s), p, idx)
            preds.append(p)
    assert np.array_equal(dec.astype(int), np.array(preds))


def test_container_roundtrip_and_fact_trim():
    for n in (1, 2, 64, 65, 66, 130, 333):
        pcm = _pcm(n, seed=n)
        wav = encode_wav_ima(pcm)
        samples, rate = decode_wav(wav)
        assert rate == 8000 and samples.dtype == np.int16
        assert len(samples) == n  # fact chunk trims block padding
        assert np.array_equal(
            samples, ima_decode(ima_encode(pcm), BLOCK_ALIGN, n)
        )


def test_stereo_channels_match_audioop_and_mono_state_machine():
    """Stereo framing (two channel headers + interleaved 4-byte code
    groups): each de-interleaved channel must decode exactly as the
    mono state machine — pinned per channel against audioop with
    threaded block state, across block boundaries."""
    from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
        BLOCK_ALIGN_STEREO,
        ima_decode_stereo,
        ima_encode_stereo,
    )

    n = 333
    rng = np.random.default_rng(17)
    left = rng.integers(-32768, 32768, n).astype(np.int64)
    right = rng.integers(-32768, 32768, n).astype(np.int64)
    data = ima_encode_stereo(left, right)
    dec = ima_decode_stereo(data, BLOCK_ALIGN_STEREO, n)
    spb = BLOCK_ALIGN_STEREO - 7
    pos, k = 0, 0
    ref = {0: [], 1: []}
    while k < n:
        heads = [
            struct.unpack("<hBB", data[pos + 4 * c : pos + 4 * c + 4])
            for c in (0, 1)
        ]
        body = data[pos + 8 : pos + BLOCK_ALIGN_STEREO]
        pos += BLOCK_ALIGN_STEREO
        groups = [body[i : i + 4] for i in range(0, len(body), 4)]
        nibs = {0: b"".join(groups[0::2]), 1: b"".join(groups[1::2])}
        take = min(spb, n - k)
        for c in (0, 1):
            pred, bidx, _ = heads[c]
            ref[c].append(pred)
            m = take - 1
            swapped = bytes(
                ((b & 0xF) << 4) | (b >> 4) for b in nibs[c]
            )
            frag, _ = audioop.adpcm2lin(
                swapped[: (m + 1) // 2], 2, (int(pred), bidx)
            )
            ref[c].extend(
                int(v) for v in np.frombuffer(frag, dtype="<i2")[:m]
            )
        k += take
    for c in (0, 1):
        assert np.array_equal(dec[:, c].astype(int), np.array(ref[c]))


def test_stereo_container_roundtrip_shapes():
    from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
        BLOCK_ALIGN_STEREO,
        ima_decode_stereo,
        ima_encode_stereo,
    )

    for n in (1, 2, 64, 65, 66, 130, 333):
        left = _pcm(n, seed=n)
        right = _pcm(n, seed=n + 1000)
        wav = encode_wav_ima(left, right=right)
        frames, rate = decode_wav(wav)
        assert rate == 8000 and frames.shape == (n, 2)
        assert np.array_equal(
            frames,
            ima_decode_stereo(
                ima_encode_stereo(left, right), BLOCK_ALIGN_STEREO, n
            ),
        )


def test_reconstruction_tracks_smooth_signal():
    """ADPCM is lossy but adaptive: on a smooth signal the
    reconstruction error must be far below full scale."""
    t = np.arange(2000)
    pcm = (8000 * np.sin(t / 25.0)).astype(np.int64)
    dec = ima_decode(ima_encode(pcm), BLOCK_ALIGN, len(pcm)).astype(
        np.int64
    )
    err = np.abs(dec - pcm)
    assert float(err.mean()) < 100 and int(err.max()) < 2000


def test_truncated_block_body_raises_value_error():
    """A data chunk cut mid-block must raise a descriptive
    ValueError (not IndexError) — ADVICE r10: header checks existed
    but the nibble body walk could index past the buffer."""
    from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
        _decode_channel,
    )

    pcm = _pcm(SAMPLES_PER_BLOCK + 10)
    data = ima_encode(pcm)
    with pytest.raises(ValueError, match="truncated block body"):
        ima_decode(data[: BLOCK_ALIGN + 6], BLOCK_ALIGN, len(pcm))
    with pytest.raises(ValueError, match="truncated block body"):
        _decode_channel(0, 0, b"\x00", 5)


def test_oracle_emits_zero_row_for_null_and_empty_text():
    """ADVICE r10: the ADPCM oracles must not drop NULL-text docs —
    the kernel emits a (0,0,0) row via ``text or \"\"``, so the twin
    must coalesce NULL to '' and keep the doc_id."""
    duckdb = pytest.importorskip("duckdb")
    from bigdata_pipelines_aws_glue_spark.operators.adpcm import (
        AUDIO_ADPCM_ORACLE,
        AUDIO_ADPCM_STEREO_ORACLE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES"
        " (1, 'ab'), (2, NULL), (3, '')) t(doc_id, text)"
    )
    mono = dict(
        (r[0], r[1:])
        for r in con.execute(AUDIO_ADPCM_ORACLE).fetchall()
    )
    stereo = dict(
        (r[0], r[1:])
        for r in con.execute(AUDIO_ADPCM_STEREO_ORACLE).fetchall()
    )
    assert set(mono) == set(stereo) == {1, 2, 3}
    assert mono[2] == mono[3] == (0, 0, 0)
    assert stereo[2] == stereo[3] == (0, 0, 0)

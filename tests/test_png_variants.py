"""16-bit and Adam7-interlaced PNG: round-trips, nonzero-filter
decoding, and cross-validation against javax.imageio's PNG reader
(an independent implementation living in the already-running JVM —
the same interop technique the JPEG suite uses)."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
    _decode_png,
    _png_chunk,
    _PNG_SIG,
    encode_png,
)

RNG = np.random.default_rng(20260814)

CASES = [
    ("gray8_seq", RNG.integers(0, 256, (11, 9), dtype=np.uint8), False),
    ("rgb8_adam7", RNG.integers(0, 256, (13, 10, 3), dtype=np.uint8), True),
    ("gray8_adam7_tiny", RNG.integers(0, 256, (3, 5), dtype=np.uint8), True),
    ("gray16_seq", RNG.integers(0, 65536, (9, 7)).astype(np.uint16), False),
    ("rgb16_adam7", RNG.integers(0, 65536, (12, 11, 3)).astype(np.uint16), True),
    ("one_pixel_adam7", RNG.integers(0, 256, (1, 1), dtype=np.uint8), True),
    ("rgb8_8x8_adam7", RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8), True),
]


@pytest.mark.parametrize("name,arr,interlace", CASES, ids=[c[0] for c in CASES])
def test_round_trip(name, arr, interlace):
    out = _decode_png(encode_png(arr, interlace=interlace))
    want = (arr >> 8).astype(np.uint8) if arr.dtype == np.uint16 else arr
    assert out.shape == want.shape
    assert (out == want).all()


def _filter_line(line, prev, bpp, f):
    """Apply PNG filter f to one raw scanline (the encoder side of the
    spec) — an independent reference for the decoder's unfilter."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def test_nonzero_filters_16bit():
    """Hand-filter a 16-bit grayscale raster with every filter type
    (one per scanline) and check the decoder inverts them — exercises
    the bpp=2 byte-recurrence paths the filter-0 encoder never
    emits."""
    import struct
    import zlib

    arr = RNG.integers(0, 65536, (5, 6)).astype(np.uint16)
    raw_lines = [arr[y].astype(">u2").tobytes() for y in range(5)]
    bpp = 2
    raster = b""
    prev = bytes(len(raw_lines[0]))
    for y, f in enumerate([0, 1, 2, 3, 4]):
        raster += bytes([f]) + _filter_line(raw_lines[y], prev, bpp, f)
        prev = raw_lines[y]
    ihdr = struct.pack(">IIBBBBB", 6, 5, 16, 0, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raster))
        + _png_chunk(b"IEND", b"")
    )
    assert (_decode_png(png) == (arr >> 8).astype(np.uint8)).all()


def _javax_read(spark, png_bytes):
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(png_bytes))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "javax.imageio could not parse our PNG"
    raster = img.getRaster()
    h, w = img.getHeight(), img.getWidth()
    bands = raster.getNumBands()
    out = np.zeros((h, w, bands), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            for b in range(bands):
                out[y, x, b] = raster.getSample(x, y, b)
    return out


@pytest.mark.parametrize(
    "name",
    ["rgb8_adam7", "gray16_seq", "rgb16_adam7"],
)
def test_javax_imageio_reads_our_encodings(spark, name):
    """The independent JVM PNG reader must reproduce the original
    samples from OUR encoder's bytes — full 16-bit fidelity, after
    de-interlacing — which validates encoder and (by the round-trip
    tests) decoder against a second implementation."""
    arr, interlace = next((c[1], c[2]) for c in CASES if c[0] == name)
    got = _javax_read(spark, encode_png(arr, interlace=interlace))
    want = arr.reshape(arr.shape[0], arr.shape[1], -1).astype(np.int64)
    assert got.shape == want.shape
    assert (got == want).all()

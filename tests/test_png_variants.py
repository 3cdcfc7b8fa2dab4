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


def _javax_write_png(spark, img):
    jvm = spark._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    return bytes(baos.toByteArray())


def test_javax_written_palette_and_binary_pngs_decode(spark):
    """The OPPOSITE interop direction: javax.imageio's PNG WRITER
    produces palette (color type 3, depth 8) and bilevel (color 0,
    depth 1) files; our decoder must reproduce the writer's own RGB
    view exactly."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    rng = np.random.default_rng(3)
    for ctor, h, w, ihdr_want in (
        (BI.TYPE_BYTE_INDEXED, 7, 9, (8, 3)),
        (BI.TYPE_BYTE_BINARY, 6, 10, (1, 0)),
    ):
        img = BI(w, h, ctor)
        for y in range(h):
            for x in range(w):
                c = [int(v) for v in rng.integers(0, 256, 3)]
                img.setRGB(x, y, (c[0] << 16) | (c[1] << 8) | c[2])
        png = _javax_write_png(spark, img)
        import struct

        depth, color = struct.unpack(">IIBBBBB", png[16:29])[2:4]
        assert (depth, color) == ihdr_want
        want = np.zeros((h, w, 3), np.int64)
        for y in range(h):
            for x in range(w):
                v = img.getRGB(x, y)
                want[y, x] = [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
        got = _decode_png(png)
        if got.ndim == 2:  # bilevel gray scales 0/1 -> 0/255
            got = np.stack([got] * 3, axis=-1)
        assert (got.astype(np.int64) == want).all()


def test_javax_written_gray_pngs_decode(spark):
    """Gray 8- and 16-bit files written by javax.imageio: compare raw
    raster samples (getRGB would re-apply Java's linear<->sRGB gamma,
    which is a colorspace question, not a PNG-decoding one)."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    rng = np.random.default_rng(11)
    for ctor, h, w, depth in (
        (BI.TYPE_BYTE_GRAY, 5, 8, 8),
        (BI.TYPE_USHORT_GRAY, 6, 6, 16),
    ):
        img = BI(w, h, ctor)
        raster = img.getRaster()
        vals = rng.integers(0, 1 << depth, (h, w))
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(vals[y, x]))
        got = _decode_png(_javax_write_png(spark, img))
        want = (vals >> (depth - 8)).astype(np.uint8)
        assert (got == want).all()


def test_one_bit_adam7_handcrafted():
    """Sub-byte depth x interlace interaction: pack a 1-bit gray
    image into Adam7 passes by hand (MSB-first, per-pass scanline
    byte padding) and check the decoder reassembles it."""
    import struct
    import zlib

    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        _ADAM7,
    )

    rng = np.random.default_rng(5)
    h, w = 11, 13
    bits = rng.integers(0, 2, (h, w)).astype(np.uint8)
    raster = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = bits[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            packed = np.packbits(row)  # MSB-first, zero-padded
            raster += b"\x00" + packed.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raster))
        + _png_chunk(b"IEND", b"")
    )
    assert (_decode_png(png) == bits * 255).all()


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

"""Baseline TIFF codec tests: PackBits and container round-trips over
both byte orders / strip layouts, loud seams, and — the validator
that earns the codec its place (same bar as GIF/JPEG/WAV) —
cross-validation against javax.imageio's TIFF plugin (in the JDK
since Java 9) in BOTH directions: our encoder → Java's reader
pixel-for-pixel, Java's writer → our decoder."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_pipelines_aws_glue_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_packbits_spec_vectors_and_roundtrip():
    # the canonical Apple PackBits example (TN1023)
    decoded = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    encoded = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(encoded, len(decoded)) == decoded
    assert packbits_decode(packbits_encode(decoded), len(decoded)) == decoded
    rng = np.random.default_rng(11)
    for data in [
        b"",
        b"q",
        b"zz",
        b"a" * 129,
        bytes(rng.integers(0, 256, 4000).astype(np.uint8)),
        bytes(rng.integers(0, 2, 4000).astype(np.uint8)),  # runny
    ]:
        assert packbits_decode(packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab", 6)


def test_tiff_roundtrip_all_variants():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (7, 5), (48, 64), (17, 33)]:
        g = rng.integers(0, 256, shape).astype(np.uint8)
        rgb = rng.integers(0, 256, shape + (3,)).astype(np.uint8)
        for bo in "<>":
            for pb in (False, True):
                assert (
                    decode_tiff(encode_tiff(g, bo, pb)) == g
                ).all(), (shape, bo, pb, "gray")
                assert (
                    decode_tiff(encode_tiff(rgb, bo, pb)) == rgb
                ).all(), (shape, bo, pb, "rgb")


def test_tiff_loud_seams():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bytearray(encode_tiff(rgb))
    # flip the compression SHORT (tag 259) to JPEG-in-TIFF (7): must
    # raise the documented integration seam, not mis-decode
    import struct

    (ifd_off,) = struct.unpack("<I", bytes(b[4:8]))
    (n,) = struct.unpack("<H", bytes(b[ifd_off : ifd_off + 2]))
    pos = ifd_off + 2
    for _ in range(n):
        tag = struct.unpack("<H", bytes(b[pos : pos + 2]))[0]
        if tag == 259:
            b[pos + 8 : pos + 10] = struct.pack("<H", 7)
        pos += 12
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(b))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"\x89PNG....")
    # cutting the tail lands in the IFD here (strips precede the IFD
    # in our layout) — any loud truncation error is the contract
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(encode_tiff(np.ones((8, 8), np.uint8))[:-20])


def _java_read_tiff(spark, payload):
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(stream)
    readers = jvm.javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
    if not readers.hasNext():
        pytest.skip("no javax TIFF plugin in this JDK")
    reader = readers.next()
    reader.setInput(iis)
    img = reader.read(0)
    h, w = img.getHeight(), img.getWidth()
    # raw raster samples, NOT getRGB: getRGB routes grayscale through
    # a gray->sRGB ColorSpace conversion (gamma), which is a display
    # transform, not the stored sample values the codec must preserve
    raster = img.getRaster()
    bands = raster.getNumBands()
    arr = np.zeros((h, w, bands), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            for b in range(bands):
                arr[y, x, b] = raster.getSample(x, y, b)
    return arr[:, :, 0] if bands == 1 else arr


def test_tiff_encoder_matches_javax_reader(spark):
    """Our TIFF bytes through Java's reader: pixel-for-pixel equality
    for every (byteorder x compression x colorspace) variant,
    including a multi-strip image (24 rows at 16 rows/strip)."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (24, 9, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (24, 9)).astype(np.uint8)
    for bo in "<>":
        for pb in (False, True):
            got = _java_read_tiff(spark, encode_tiff(rgb, bo, pb))
            assert (got == rgb).all(), (bo, pb, "rgb")
            gotg = _java_read_tiff(spark, encode_tiff(gray, bo, pb))
            assert (gotg == gray).all(), (bo, pb, "gray")


def _java_write_tiff(spark, px, compression=None):
    """Write an RGB array through javax's TIFF writer, optionally
    forcing a compression type ('LZW' / 'ZLib' / 'Deflate' /
    'PackBits'). Returns the TIFF bytes."""
    jvm = spark._jvm
    h, w = px.shape[:2]
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    if not writers.hasNext():
        pytest.skip("no javax TIFF writer in this JDK")
    writer = writers.next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    if compression is not None:
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
        )
        param.setCompressionType(compression)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_tiff_decoder_reads_javax_writer(spark):
    """Java's TIFF writer → our decoder, across javax's lossless
    compressors: default (uncompressed), LZW (the JDK writes the
    NATURAL width schedule — measured, see tiff_lzw_encode), ZLib /
    Deflate (tags 8/32946), and PackBits."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
    for comp in (None, "LZW", "ZLib", "Deflate", "PackBits"):
        payload = _java_write_tiff(spark, px, comp)
        try:
            got = decode_tiff(payload)
        except NotImplementedError as e:
            pytest.skip(f"javax wrote outside our baseline scope: {e}")
        assert got.shape[:2] == (21, 13), comp
        arr = got if got.ndim == 3 else np.stack([got] * 3, axis=-1)
        assert (arr == px).all(), comp


def test_tiff_lzw_deflate_encoders_match_javax_reader(spark):
    """Our LZW and Deflate TIFF bytes through Java's reader —
    pixel-for-pixel, both byte orders, with a single-strip raster
    crossing the 9->10 bit LZW width boundary (where the two LZW
    width schedules diverge — the JDK reads ONLY the natural one)."""
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (40, 20, 3)).astype(np.uint8)
    for comp in ("lzw", "deflate"):
        for bo in "<>":
            got = _java_read_tiff(
                spark,
                encode_tiff(rgb, bo, compression=comp, rows_per_strip=40),
            )
            assert (got == rgb).all(), (comp, bo)


def test_tiff_lzw_both_width_schedules():
    """The two wild LZW width schedules: each round-trips under
    itself; a boundary-crossing stream written under EarlyChange is
    REJECTED loudly by the natural decoder (no silent wrong raster);
    and decode_tiff's natural-then-EarlyChange retry reads an
    EarlyChange container end-to-end."""
    import numpy as np

    from bigdata_pipelines_aws_glue_spark.operators.tiff import (
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    rng = np.random.default_rng(17)
    data = bytes(rng.integers(0, 256, 3000).astype(np.uint8))  # crosses 9->10
    for ec in (False, True):
        assert tiff_lzw_decode(tiff_lzw_encode(data, ec), len(data), ec) == data
    with pytest.raises(ValueError):
        tiff_lzw_decode(tiff_lzw_encode(data, True), len(data), False)

    # EarlyChange container through the public decoder (retry path):
    # splice an EarlyChange strip into a natural-encoded container
    px = rng.integers(0, 256, (2, 600, 3)).astype(np.uint8)
    container = bytearray(encode_tiff(px, "<", compression="lzw",
                                      rows_per_strip=2))
    natural_strip = tiff_lzw_encode(px.tobytes(), early_change=False)
    ec_strip = tiff_lzw_encode(px.tobytes(), early_change=True)
    assert len(ec_strip) == len(natural_strip)  # same codes, same count
    idx = bytes(container).find(natural_strip)
    assert idx > 0
    container[idx : idx + len(ec_strip)] = ec_strip
    assert (decode_tiff(bytes(container)) == px).all()


def test_tiff_predictor2_roundtrip_and_javax(spark):
    """Horizontal-differencing predictor (tag 317=2): our
    predictor-written LZW/deflate containers round-trip through our
    decoder AND through Java's reader (the JDK reader honors the
    predictor tag, pinning our differencing direction), on a smooth
    gradient where the predictor actually shrinks the stream."""
    grad = np.add.outer(
        np.arange(24, dtype=np.uint8) * 3, np.arange(30, dtype=np.uint8)
    )
    rgb = np.stack([grad, grad + 7, grad + 19], axis=-1).astype(np.uint8)
    for comp in ("lzw", "deflate"):
        plain = encode_tiff(rgb, compression=comp)
        pred = encode_tiff(rgb, compression=comp, predictor=True)
        assert (decode_tiff(pred) == rgb).all(), comp
        assert len(pred) < len(plain), (comp, "predictor should shrink")
        got = _java_read_tiff(spark, pred)
        assert (got == rgb).all(), comp
    # gray path too
    g = grad.astype(np.uint8)
    assert (decode_tiff(encode_tiff(g, compression="lzw", predictor=True)) == g).all()


# ------------------------------------------------ r12 extensions


def _java_read_tiff16(spark, payload):
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(stream)
    readers = jvm.javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
    if not readers.hasNext():
        pytest.skip("no javax TIFF plugin in this JDK")
    reader = readers.next()
    reader.setInput(iis)
    raster = reader.read(0).getRaster()
    h, w = raster.getHeight(), raster.getWidth()
    arr = np.zeros((h, w), dtype=np.uint16)
    for y in range(h):
        for x in range(w):
            arr[y, x] = raster.getSample(x, y, 0)
    return arr


def test_tiff16_both_directions_javax(spark):
    """16-bit grayscale: our encoder → Java's reader pixel-exact in
    both byte orders and every lossless compression; Java's
    USHORT_GRAY writer → our decoder. The predictor is validated
    through OUR round-trip only: the JDK TIFF plugin rejects
    predictor 2 on 16-bit samples outright (measured —
    IIOException on read), and for none/packbits it IGNORES the
    predictor tag entirely (also measured), so javax can only pin
    the unpredicted 16-bit path."""
    rng = np.random.default_rng(21)
    g16 = rng.integers(0, 65536, (21, 13)).astype(np.uint16)
    for bo in "<>":
        for comp in ("none", "packbits", "lzw", "deflate"):
            payload = encode_tiff(g16, bo, compression=comp, bits=16)
            assert (decode_tiff(payload) == g16).all(), (bo, comp)
            assert (_java_read_tiff16(spark, payload) == g16).all(), (
                bo,
                comp,
            )
            pred = encode_tiff(
                g16, bo, compression=comp, predictor=True, bits=16
            )
            assert (decode_tiff(pred) == g16).all(), (bo, comp, "pred")
    # the predictor actually helps where it should: 16-bit gradient
    grad16 = (
        np.add.outer(np.arange(24), np.arange(30)) * 97
    ).astype(np.uint16)
    plain = encode_tiff(grad16, compression="lzw", bits=16)
    pred = encode_tiff(grad16, compression="lzw", predictor=True, bits=16)
    assert len(pred) < len(plain)
    assert (decode_tiff(pred) == grad16).all()
    # reverse direction: javax writes TYPE_USHORT_GRAY
    jvm = spark._jvm
    h, w = g16.shape
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_USHORT_GRAY
    )
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, int(g16[y, x]))
    writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    if not writers.hasNext():
        pytest.skip("no javax TIFF writer in this JDK")
    writer = writers.next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), None)
    ios.flush()
    got = decode_tiff(bytes(baos.toByteArray()))
    assert got.dtype == np.uint16
    assert (got == g16).all()


def test_tiff_tiled_both_directions_javax(spark):
    """Tiled layout: our tiled bytes → Java's reader (edge-padded
    tiles must crop correctly); Java's explicitly-tiled writer → our
    decoder."""
    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (23, 37, 3)).astype(np.uint8)
    for bo in "<>":
        payload = encode_tiff(rgb, bo, compression="packbits", tile=(16, 16))
        assert (decode_tiff(payload) == rgb).all(), bo
        assert (_java_read_tiff(spark, payload) == rgb).all(), bo
    # javax writes a tiled file
    jvm = spark._jvm
    h, w = rgb.shape[:2]
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in rgb[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    if not writers.hasNext():
        pytest.skip("no javax TIFF writer in this JDK")
    writer = writers.next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setTilingMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(16, 16, 0, 0)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    got = decode_tiff(bytes(baos.toByteArray()))
    arr = got if got.ndim == 3 else np.stack([got] * 3, axis=-1)
    assert (arr == rgb).all()


def test_tiff_planar2_roundtrip_and_javax(spark):
    """Planar configuration 2: our planar bytes must decode to the
    identical array as the chunky form; Java's reader must agree
    (the JDK TIFF plugin reads planar 2)."""
    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
    for bo in "<>":
        for comp in ("none", "lzw"):
            # predictor only with lzw: javax ignores the predictor
            # tag for uncompressed data (measured, see the 16-bit
            # test), so an uncompressed+predictor file is not
            # interop-comparable
            payload = encode_tiff(
                rgb, bo, compression=comp,
                predictor=(comp == "lzw"), planar=2,
            )
            assert (decode_tiff(payload) == rgb).all(), (bo, comp)
            try:
                got = _java_read_tiff(spark, payload)
            except Exception as e:  # javax planar support varies
                pytest.skip(f"javax could not read planar 2: {e}")
            assert (got == rgb).all(), (bo, comp)


def test_tiff_new_seams_stay_loud():
    rng = np.random.default_rng(24)
    rgb16 = rng.integers(0, 65536, (4, 4, 3)).astype(np.uint16)
    with pytest.raises(ValueError, match="grayscale"):
        encode_tiff(rgb16, bits=16)
    with pytest.raises(ValueError, match="strip-layout RGB"):
        encode_tiff(
            rng.integers(0, 256, (4, 4, 3)).astype(np.uint8),
            planar=2,
            tile=(16, 16),
        )
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(
            rng.integers(0, 256, (4, 4)).astype(np.uint8), tile=(8, 8)
        )

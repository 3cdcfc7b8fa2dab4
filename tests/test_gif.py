"""GIF89a codec tests: LZW round-trips (including table overflow and
small code sizes), container round-trip, interlace, compositing
semantics, and — the reason GIF was the codec chosen to narrow the
video seam — cross-validation against javax.imageio in BOTH
directions (our encoder → Java's decoder on a real 3-frame
animation; Java's writer → our decoder vs Java's own read-back)."""

from __future__ import annotations

import struct

import numpy as np

from bigdata_pipelines_aws_glue_spark.operators.gif import (
    _sub_blocks,
    decode_gif,
    encode_gif,
    grayscale_palette,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrips_incl_table_overflow():
    rng = np.random.default_rng(7)
    cases = [
        bytes(rng.integers(0, 256, 20000).astype(np.uint8)),  # overflow
        b"a" * 5000,
        b"abc" * 3000,
        bytes(range(256)) * 40,
        b"",
        b"x",
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data, 8), 8) == data
    for mcs in (2, 4):
        data = bytes(rng.integers(0, 1 << mcs, 3000).astype(np.uint8))
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_gif_roundtrip_multiframe():
    rng = np.random.default_rng(3)
    pal = grayscale_palette()
    for nf in (1, 2, 4):
        frames = [
            rng.integers(0, 256, (16, 16)).astype(np.uint8)
            for _ in range(nf)
        ]
        dec = decode_gif(encode_gif(frames))
        assert len(dec) == nf
        for f, d in zip(frames, dec):
            assert (d == pal[f]).all()


def test_gif_interlaced_image_deinterlaces():
    """Hand-build an interlaced single-image GIF (rows stored in the
    0::8/4::8/2::4/1::2 pass order) — decode must restore the
    original row order."""
    rng = np.random.default_rng(5)
    h, w = 16, 8
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pass_rows = [
        r
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for r in range(start, h, step)
    ]
    stored = idx[pass_rows]
    g = bytearray(b"GIF89a")
    g += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    g += grayscale_palette().tobytes()
    g += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace
    g.append(8)
    g += _sub_blocks(lzw_encode(stored.tobytes(), 8))
    g.append(0x3B)
    dec = decode_gif(bytes(g))
    assert (dec[0] == grayscale_palette()[idx]).all()


def test_gif_subregion_transparency_composites_onto_previous():
    """Frame 2 is a 4x4 patch at (2,3) with a transparent index:
    transparent pixels must show frame 1 underneath; with disposal 3
    the DISPLAYED composite is identical (disposal acts after
    display)."""
    pal = grayscale_palette()
    base = np.full((8, 8), 10, np.uint8)
    patch = np.array(
        [[200, 0, 200, 0]] * 4, np.uint8
    )  # 0 = transparent here
    g = bytearray(b"GIF89a")
    g += struct.pack("<HHBBB", 8, 8, 0xF7, 0, 0)
    g += pal.tobytes()
    g += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(base.tobytes(), 8))
    # GCE: disposal=1 keep, transparency on, transparent index 0
    g += b"\x21\xf9" + bytes([4, 0b101, 0, 0, 0, 0])
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(patch.tobytes(), 8))
    g.append(0x3B)
    dec = decode_gif(bytes(g))
    assert len(dec) == 2
    want = pal[base].copy()
    for y in range(4):
        for x in range(4):
            if patch[y, x] != 0:
                want[2 + y, 3 + x] = pal[patch[y, x]]
    assert (dec[1] == want).all()

    d3 = bytes(g).replace(
        b"\x21\xf9" + bytes([4, 0b101]), b"\x21\xf9" + bytes([4, 0b1101])
    )
    dec3 = decode_gif(d3)
    assert len(dec3) == 2 and (dec3[1] == want).all()


def _disposal3_fixture():
    """3-frame hand-assembled GIF (javax.imageio's writer never emits
    disposal 3): base canvas, a disposal-3 patch at (2,3), then a
    fully-transparent patch over the same rectangle. Frame 3 shows the
    BASE through the transparency iff the canvas was restored to its
    pre-frame-2 state."""
    pal = grayscale_palette()
    base = np.full((8, 8), 10, np.uint8)
    patch = np.full((4, 4), 200, np.uint8)
    clear = np.zeros((4, 4), np.uint8)  # index 0 = transparent below
    g = bytearray(b"GIF89a")
    g += struct.pack("<HHBBB", 8, 8, 0xF7, 0, 0)
    g += pal.tobytes()
    g += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(base.tobytes(), 8))
    # GCE: disposal=3 restore-previous, no transparency
    g += b"\x21\xf9" + bytes([4, 0b1100, 0, 0, 0, 0])
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(patch.tobytes(), 8))
    # GCE: disposal=1 keep, transparency on, transparent index 0
    g += b"\x21\xf9" + bytes([4, 0b101, 0, 0, 0, 0])
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(clear.tobytes(), 8))
    g.append(0x3B)
    return bytes(g), pal, base, patch


def test_gif_gceless_frame_after_disposal2_uses_disposal_none():
    """A GCE scopes to only the first following image block: a
    GCE-less frame 3 after a disposal-2 frame 2 must composite with
    disposal 'none' — a decoder that lets the stale GCE persist would
    clear frame 3's rectangle to background after display, so the
    all-transparent frame 4 (which shows the raw canvas) is the
    discriminator."""
    pal = grayscale_palette()
    base = np.full((8, 8), 10, np.uint8)
    patch2 = np.full((4, 4), 200, np.uint8)
    patch3 = np.full((4, 4), 50, np.uint8)
    clear = np.zeros((4, 4), np.uint8)  # index 0 = transparent below
    g = bytearray(b"GIF89a")
    g += struct.pack("<HHBBB", 8, 8, 0xF7, 0, 0)
    g += pal.tobytes()
    g += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(base.tobytes(), 8))
    # GCE: disposal=2 restore-to-background, no transparency
    g += b"\x21\xf9" + bytes([4, 0b1000, 0, 0, 0, 0])
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(patch2.tobytes(), 8))
    # frame 3: NO GCE of its own
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(patch3.tobytes(), 8))
    # GCE: disposal=1 keep, transparency on, transparent index 0
    g += b"\x21\xf9" + bytes([4, 0b101, 0, 0, 0, 0])
    g += b"\x2c" + struct.pack("<HHHHB", 3, 2, 4, 4, 0)
    g.append(8)
    g += _sub_blocks(lzw_encode(clear.tobytes(), 8))
    g.append(0x3B)
    dec = decode_gif(bytes(g))
    assert len(dec) == 4
    want1 = pal[base]
    assert (dec[0] == want1).all()
    want2 = want1.copy()
    want2[2:6, 3:7] = pal[patch2]
    assert (dec[1] == want2).all()
    # frame 2's disposal-2 cleared its rect to background; frame 3
    # paints fully-opaque patch3 over the same rect
    want3 = want1.copy()
    want3[2:6, 3:7] = pal[patch3]
    assert (dec[2] == want3).all()
    # frame 4 is all-transparent: it displays the canvas as frame 3
    # left it. Correct (disposal reset) = patch3 still there; a
    # stale-GCE decoder would have re-cleared the rect to background.
    assert (dec[3] == want3).all()


def test_gif_disposal3_restores_previous_canvas():
    gif, pal, base, patch = _disposal3_fixture()
    dec = decode_gif(gif)
    assert len(dec) == 3
    want_base = pal[base]
    want_f2 = want_base.copy()
    want_f2[2:6, 3:7] = pal[patch]
    assert (dec[0] == want_base).all()
    assert (dec[1] == want_f2).all()
    # the all-transparent frame 3 displays the RESTORED canvas: the
    # disposal-3 patch must be gone (a keep-disposal decoder would
    # still show it)
    assert (dec[2] == want_base).all()


def test_gif_disposal3_fixture_parses_as_restore_previous(spark):
    """Third-party confirmation that the fixture bytes mean what the
    decoder claims: javax.imageio's GIF metadata parser must report
    disposalMethod=restorePrevious for frame 2 (its READER exposes the
    GCE even though its writer never emits disposal 3)."""
    gif, _, _, _ = _disposal3_fixture()
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(gif))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(stream)
    reader = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
        "gif"
    ).next()
    reader.setInput(iis)
    assert reader.getNumImages(True) == 3

    def disposal_of(i):
        tree = reader.getImageMetadata(i).getAsTree(
            "javax_imageio_gif_image_1.0"
        )
        node = tree.getFirstChild()
        while node is not None:
            if node.getNodeName() == "GraphicControlExtension":
                return (
                    node.getAttributes()
                    .getNamedItem("disposalMethod")
                    .getNodeValue()
                )
            node = node.getNextSibling()
        return None

    assert disposal_of(1) == "restoreToPrevious"
    assert disposal_of(2) == "doNotDispose"


def _java_read_frames(spark, gif_bytes):
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(gif_bytes))
    iis = jvm.javax.imageio.ImageIO.createImageInputStream(stream)
    reader = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
        "gif"
    ).next()
    reader.setInput(iis)
    out = []
    for i in range(reader.getNumImages(True)):
        img = reader.read(i)
        h, w = img.getHeight(), img.getWidth()
        arr = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = img.getRGB(x, y)
                arr[y, x] = [
                    (rgb >> 16) & 255,
                    (rgb >> 8) & 255,
                    rgb & 255,
                ]
        out.append(arr)
    return out


def test_javax_reads_our_animated_gif_exactly(spark):
    rng = np.random.default_rng(11)
    pal = grayscale_palette()
    frames = [
        rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(3)
    ]
    jf = _java_read_frames(spark, encode_gif(frames))
    assert len(jf) == 3
    for f, j in zip(frames, jf):
        assert (j == pal[f]).all()


def test_our_decoder_matches_javax_writer_readback(spark):
    """javax.imageio's GIF writer quantizes to its own palette; our
    decode of its bytes must equal Java's own read-back of the same
    bytes (palette + LZW agreement with an independent encoder)."""
    jvm = spark._jvm
    rng = np.random.default_rng(13)
    BI = jvm.java.awt.image.BufferedImage
    img = BI(20, 14, BI.TYPE_INT_RGB)
    for y in range(14):
        for x in range(20):
            c = [int(v) for v in rng.integers(0, 256, 3)]
            img.setRGB(x, y, (c[0] << 16) | (c[1] << 8) | c[2])
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "gif", baos)
    jgif = bytes(baos.toByteArray())
    assert (decode_gif(jgif)[0] == _java_read_frames(spark, jgif)[0]).all()

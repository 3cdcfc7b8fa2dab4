"""Baseline TIFF codec ([north-star] N4 multimodal adjacency; no
reference citation — the reference is a currency ETL with no media).

Scope — the TIFF 6.0 BASELINE profile real scanned-document corpora
are dominated by:

- both byte orders (``II`` little-endian and ``MM`` big-endian);
- 8-bit grayscale (photometric 1) and 8-bit RGB (photometric 2),
  chunky planar config;
- Compression 1 (none), 32773 (PackBits, the Apple RLE every
  baseline reader must support), 5 (LZW — BOTH code-width schedules:
  the natural bump at 512/1024/2048 that javax/JDK writes, and the
  TIFF6-spec EarlyChange schedule libtiff/PDF use; encoder flag,
  decoder retry), and 8/32946 (Deflate/ZLib, bounded inflate);
- the TIFF horizontal-differencing predictor (tag 317 = 2) on both
  the encode and decode paths (differencing 16-bit VALUES for 16-bit
  samples, per TIFF 6.0 §14);
- multi-strip layout (``RowsPerStrip``/``StripOffsets``/
  ``StripByteCounts``), the unit a 100 TB scan pipeline parallelizes
  on;
- (r12) 16-bit grayscale — sample bytes in the file byte order,
  both directions;
- (r12) TILED layout (tags 322-325, dims multiples of 16,
  zero-padded edge tiles cropped on decode), both directions;
- (r12) planar configuration 2 (tag 284 = 2, RGB as three separate
  plane-major strip runs), both directions.

What actually remains — 16-bit RGB, tiled planar-2, the
floating-point predictor (317 = 3), and JPEG-in-TIFF — raises
``NotImplementedError`` LOUDLY at the dispatch point — the
integration seam where a real deployment wires PIL/libtiff, same
contract as ``multimodal.decode_image``.

Validator: javax.imageio ships a TIFF plugin since Java 9, so the
encoder is cross-validated pixel-for-pixel against Java's reader and
the decoder against Java's writer (tests/test_tiff.py) — the same
in-container third-party pin the GIF/JPEG/WAV codecs carry.

numpy + struct only; no third-party imaging dependency.
"""

from __future__ import annotations

import struct

import numpy as np

#: tag ids (TIFF 6.0 baseline)
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFFS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR = 284

#: field type -> byte size (BYTE, ASCII, SHORT, LONG, RATIONAL)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE: runs of >= 3 identical bytes become
    (257 - n, byte); literals are emitted in <= 128-byte chunks."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (i - lit_start) < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode` (-128 control is a no-op per
    spec). Stops after ``expected`` output bytes; truncated input
    raises."""
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits: truncated strip")
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("PackBits: truncated literal")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits: truncated run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits: strip over-run")
    return bytes(out)


def tiff_lzw_encode(data: bytes, early_change: bool = False) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first bit packing, codes
    start at 9 bits, ClearCode 256 / EOI 257. TWO width schedules
    exist in the wild and they are mutually unreadable at the code-
    width boundary:

    - ``early_change=False`` (default): NATURAL LZW — the width bumps
      when the free-entry counter reaches 2^w (512/1024/2048). This
      is what the JDK's javax.imageio TIFF plugin writes AND reads
      (measured: its reader NullPointerExceptions on every other
      schedule), so it is the schedule our in-container validator can
      pin byte-for-byte.
    - ``early_change=True``: the TIFF6 spec's famous off-by-one —
      bump one code earlier (511/1023/2047), the libtiff/PDF
      ``EarlyChange=1`` convention most non-JDK writers use.

    ``decode_tiff`` accepts BOTH (natural first, EarlyChange retry),
    so either producer's files decode; the encoder defaults to the
    schedule the validator proves."""
    CLEAR, EOI = 256, 257
    bump_off = 1 if early_change else 0
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) - bump_off and width < 12:
            width += 1
        w = bytes([ch])
        if nxt == 4093:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(
    data: bytes, expected: int, early_change: bool = False
) -> bytes:
    """Inverse of :func:`tiff_lzw_encode` under the SAME schedule.
    The decoder's table lags the encoder's free-entry counter by one
    append (the first code after Clear assigns nothing), so its bump
    thresholds sit one lower: natural = 2^w - 1, EarlyChange =
    2^w - 2."""
    CLEAR, EOI = 256, 257
    bump_k = 2 if early_change else 1
    out = bytearray()
    pos = 0  # bit position
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def read_code():
        nonlocal pos
        if (pos + width) > len(data) * 8:
            return EOI  # truncated stream: treat as end, length-check below
        byte0 = pos >> 3
        acc = 0
        need = width
        bit = pos & 7
        pos += width
        i = byte0
        acc = data[i] & ((1 << (8 - bit)) - 1)
        got = 8 - bit
        i += 1
        while got < need:
            acc = (acc << 8) | data[i]
            got += 8
            i += 1
        return acc >> (got - need)

    while len(out) < expected:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW: bad first code")
            entry = bytes([code])
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW: code past table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) >= (1 << width) - bump_k and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW: truncated strip")
    return bytes(out[:expected])


def _undo_predictor2(
    raw: bytes, w: int, spp: int, rows: int, bo: str = "<", bits: int = 8
) -> bytes:
    """Horizontal-differencing predictor (tag 317 value 2): each
    sample stores the delta to the same SAMPLE VALUE one pixel left
    (16-bit samples difference as 16-bit integers, not bytes — TIFF
    6.0 §14); cumulative-sum per row per channel restores the
    raster. Returns bytes in the FILE byte order."""
    if bits == 8:
        arr = np.frombuffer(raw, dtype=np.uint8).copy().reshape(rows, w, spp)
        np.cumsum(arr, axis=1, dtype=np.uint8, out=arr)
        return arr.tobytes()
    vals = (
        np.frombuffer(raw, dtype=np.dtype(bo + "u2"))
        .astype(np.uint16)
        .reshape(rows, w, spp)
    )
    np.cumsum(vals, axis=1, dtype=np.uint16, out=vals)
    return vals.astype(np.dtype(bo + "u2")).tobytes()


def _apply_predictor2(
    raw: bytes, w: int, spp: int, rows: int, bo: str = "<", bits: int = 8
) -> bytes:
    """Forward horizontal differencing (encode side), dtype-aware."""
    if bits == 8:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(rows, w, spp)
        d = a.copy()
        d[:, 1:, :] -= a[:, :-1, :]
        return d.tobytes()
    a = (
        np.frombuffer(raw, dtype=np.dtype(bo + "u2"))
        .astype(np.uint16)
        .reshape(rows, w, spp)
    )
    d = a.copy()
    d[:, 1:, :] -= a[:, :-1, :]
    return d.astype(np.dtype(bo + "u2")).tobytes()


#: encoder compression names -> TIFF tag values
_COMPRESSIONS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(
    pixels: np.ndarray,
    byteorder: str = "<",
    packbits: bool = False,
    rows_per_strip: int = 16,
    compression: str | None = None,
    predictor: bool = False,
    bits: int = 8,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
) -> bytes:
    """(H, W[, 3]) uint8 — or uint16 gray with ``bits=16`` — to TIFF
    bytes. ``compression`` is one of none/packbits/lzw/deflate (the
    legacy ``packbits`` bool is kept for the original call sites).
    r12 extensions, each closing a previously-loud seam:

    - ``bits=16``: 16-bit grayscale; sample bytes follow the FILE
      byte order, the predictor differences 16-bit VALUES (TIFF 6.0
      §14), compressions operate on the serialized byte stream.
    - ``tile=(tw, th)``: tiled layout (tags 322-325); tile dims must
      be multiples of 16 per spec; edge tiles are zero-padded to
      full size and the decoder crops.
    - ``planar=2``: RGB stored as three separate planes (tag 284=2),
      strips ordered plane-major; RowsPerStrip applies per plane.

    Deterministic layout: 8-byte header, block data, value areas,
    then the IFD — so the uncompressed container size keeps a closed
    form."""
    if byteorder not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    comp_name = compression or ("packbits" if packbits else "none")
    if comp_name not in _COMPRESSIONS:
        raise ValueError(f"unsupported compression {comp_name!r}")
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    if planar not in (1, 2):
        raise ValueError("planar must be 1 or 2")
    bo = byteorder
    dt = np.uint8 if bits == 8 else np.dtype(bo + "u2")
    px = np.asarray(pixels, dtype=np.uint8 if bits == 8 else np.uint16)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (H, W) gray or (H, W, 3) RGB")
    if bits == 16 and not gray:
        raise ValueError("bits=16 supported for grayscale only")
    if planar == 2 and (gray or tile is not None):
        raise ValueError("planar=2 supported for strip-layout RGB only")
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    _encoders = {
        "none": lambda b: b,
        "packbits": packbits_encode,
        "lzw": tiff_lzw_encode,
        "deflate": __import__("zlib").compress,
    }
    enc = _encoders[comp_name]

    def block(arr, bw, bspp):
        raw = arr.astype(dt).tobytes()
        if predictor:
            raw = _apply_predictor2(raw, bw, bspp, arr.shape[0], bo, bits)
        return enc(raw)

    blocks = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tile dims must be positive multiples of 16")
        pad_w, pad_h = -w % tw, -h % th
        padded = np.pad(
            px,
            [(0, pad_h), (0, pad_w)] + ([(0, 0)] if not gray else []),
        )
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                blocks.append(
                    block(padded[ty : ty + th, tx : tx + tw], tw, spp)
                )
    elif planar == 2:
        for p in range(3):
            plane = px[:, :, p]
            for r0 in range(0, h, rows_per_strip):
                rows = min(rows_per_strip, h - r0)
                blocks.append(block(plane[r0 : r0 + rows], w, 1))
    else:
        for r0 in range(0, h, rows_per_strip):
            rows = min(rows_per_strip, h - r0)
            blocks.append(block(px[r0 : r0 + rows], w, spp))
    n_blocks = len(blocks)

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += b"\x00" * 4  # IFD offset patched below
    block_offsets = []
    for s in blocks:
        block_offsets.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"  # IFDs/value areas are word-aligned

    # external value areas
    bits_off = None
    if spp == 3:
        bits_off = len(out)
        out += struct.pack(bo + "3H", 8, 8, 8)
    offs_off = counts_off = None
    if n_blocks > 1:
        offs_off = len(out)
        out += struct.pack(bo + f"{n_blocks}I", *block_offsets)
        counts_off = len(out)
        out += struct.pack(bo + f"{n_blocks}I", *[len(s) for s in blocks])

    def entry(tag, typ, count, value, at_offset=None):
        if at_offset is not None:
            return struct.pack(bo + "HHII", tag, typ, count, at_offset)
        if typ == 3:  # SHORT packs into the low half of the value slot
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    if tile is not None:
        loc_entries = [
            entry(322, 4, 1, tw),
            entry(323, 4, 1, th),
            (
                entry(324, 4, n_blocks, block_offsets[0])
                if n_blocks == 1
                else entry(324, 4, n_blocks, 0, at_offset=offs_off)
            ),
            (
                entry(325, 4, n_blocks, len(blocks[0]))
                if n_blocks == 1
                else entry(325, 4, n_blocks, 0, at_offset=counts_off)
            ),
        ]
    else:
        loc_entries = [
            (
                entry(_STRIP_OFFS, 4, n_blocks, block_offsets[0])
                if n_blocks == 1
                else entry(_STRIP_OFFS, 4, n_blocks, 0, at_offset=offs_off)
            ),
            entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
            (
                entry(_STRIP_COUNTS, 4, n_blocks, len(blocks[0]))
                if n_blocks == 1
                else entry(_STRIP_COUNTS, 4, n_blocks, 0, at_offset=counts_off)
            ),
        ]
    entries = [
        entry(_W, 4, 1, w),
        entry(_H, 4, 1, h),
        (
            entry(_BITS, 3, 3, 0, at_offset=bits_off)
            if spp == 3
            else entry(_BITS, 3, 1, bits)
        ),
        entry(_COMP, 3, 1, _COMPRESSIONS[comp_name]),
        entry(_PHOTO, 3, 1, 2 if spp == 3 else 1),
        entry(_SPP, 3, 1, spp),
        entry(_PLANAR, 3, 1, planar),
        *loc_entries,
    ]
    if predictor:
        entries.append(entry(317, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd_off = len(out)
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)  # no next IFD
    out[4:8] = struct.pack(bo + "I", ifd_off)
    return bytes(out)


def _read_values(bo, data, typ, count, raw):
    size = _TYPE_SIZE[typ]
    total = size * count
    blob = raw[:total] if total <= 4 else None
    if blob is None:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(data):
            raise ValueError("TIFF: value area past EOF")
        blob = data[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise NotImplementedError(f"TIFF: unsupported field type {typ}")
    return list(struct.unpack(bo + f"{count}{fmt}", blob))


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes -> (H, W) gray or (H, W, 3) RGB uint8.
    Accepts either byte order, multi-strip layouts, compression 1 or
    PackBits; everything outside baseline raises loudly (the PIL /
    libtiff seam)."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF: IFD offset past EOF")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(payload):
            raise ValueError("TIFF: truncated IFD")
        tag, typ, count = struct.unpack(bo + "HHI", payload[pos : pos + 8])
        if typ in (1, 3, 4):
            tags[tag] = _read_values(
                bo, payload, typ, count, payload[pos + 8 : pos + 12]
            )
        pos += 12

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: required tag {tag} missing")
            return default
        return v[0]

    w, h = one(_W), one(_H)
    comp = one(_COMP, 1)
    spp = one(_SPP, 1)
    bits = tags.get(_BITS, [8])
    planar = one(_PLANAR, 1)
    predictor = one(317, 1)
    tiled = 324 in tags or 322 in tags
    # 8 = Adobe deflate, 32946 = the older deflate tag — same stream
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} not available in this environment; "
            "wire PIL/libtiff here at deploy time"
        )
    nbits = bits[0]
    if any(b != nbits for b in bits) or nbits not in (8, 16):
        raise NotImplementedError(
            "TIFF: only uniform 8-bit (gray/RGB) or 16-bit (gray) "
            "samples supported here"
        )
    if spp not in (1, 3) or (nbits == 16 and spp != 1):
        raise NotImplementedError(
            "TIFF: 16-bit supported for grayscale only"
        )
    if planar == 2 and (spp != 3 or tiled):
        raise NotImplementedError(
            "TIFF: planar configuration 2 supported for strip-layout "
            "RGB only"
        )
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar}")
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} (floating-point) not supported"
        )
    bps = nbits // 8  # bytes per sample

    def inflate(raw: bytes, expected: int) -> bytes:
        if comp == 32773:
            raw = packbits_decode(raw, expected)
        elif comp == 5:
            # natural schedule first (what javax writes), then the
            # libtiff/PDF EarlyChange retry. A wrong-schedule read
            # desyncs at a code-width boundary and in practice trips
            # the code-past-table check almost immediately (strips
            # shorter than ~253 codes never reach a boundary, where
            # the schedules are identical anyway).
            try:
                raw = tiff_lzw_decode(raw, expected)
            except ValueError:
                raw = tiff_lzw_decode(raw, expected, early_change=True)
        elif comp in (8, 32946):
            import zlib

            # bound the inflate at the expected block size (ADVICE
            # r11): a small hostile block can otherwise balloon to an
            # arbitrarily large buffer before the truncation below —
            # the PackBits/LZW paths already stop at `expected`.
            d = zlib.decompressobj()
            raw = d.decompress(raw, expected)
        if len(raw) < expected:
            raise ValueError("TIFF: truncated strip/tile")
        return raw[:expected]

    sample_dt = np.uint8 if nbits == 8 else np.dtype(bo + "u2")
    out_dt = np.uint8 if nbits == 8 else np.uint16

    if tiled:
        tw, th = one(322), one(323)
        offsets, counts = tags.get(324), tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: bad tile tables")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(offsets) != across * down:
            raise ValueError("TIFF: tile table size mismatch")
        full = np.zeros((down * th, across * tw, spp), dtype=out_dt)
        t_bytes = th * tw * spp * bps
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                raise ValueError("TIFF: tile past EOF")
            raw = inflate(payload[off : off + cnt], t_bytes)
            if predictor == 2:
                raw = _undo_predictor2(raw, tw, spp, th, bo, nbits)
            tile = (
                np.frombuffer(raw, dtype=sample_dt)
                .astype(out_dt)
                .reshape(th, tw, spp)
            )
            ty, tx = divmod(idx, across)
            full[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        arr = full[:h, :w]
        return arr[:, :, 0] if spp == 1 else arr

    rows_per_strip = one(_ROWS_PER_STRIP, h)
    offsets = tags.get(_STRIP_OFFS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: bad strip tables")
    n_planes = 3 if planar == 2 else 1
    plane_spp = 1 if planar == 2 else spp
    row_bytes = w * plane_spp * bps
    planes = []
    strips_per_plane = len(offsets) // n_planes
    if len(offsets) % n_planes:
        raise ValueError("TIFF: strip table not divisible by planes")
    for p in range(n_planes):
        raster = bytearray()
        remaining_rows = h
        for off, cnt in zip(
            offsets[p * strips_per_plane : (p + 1) * strips_per_plane],
            counts[p * strips_per_plane : (p + 1) * strips_per_plane],
        ):
            if off + cnt > len(payload):
                raise ValueError("TIFF: strip past EOF")
            rows = min(rows_per_strip, remaining_rows)
            raw = inflate(payload[off : off + cnt], rows * row_bytes)
            if predictor == 2:
                raw = _undo_predictor2(raw, w, plane_spp, rows, bo, nbits)
            raster += raw
            remaining_rows -= rows
        if remaining_rows != 0:
            raise ValueError("TIFF: strip tables cover too few rows")
        planes.append(
            np.frombuffer(bytes(raster), dtype=sample_dt).astype(out_dt)
        )
    if planar == 2:
        return np.stack(
            [pl.reshape(h, w) for pl in planes], axis=-1
        )
    arr = planes[0]
    return arr.reshape((h, w) if spp == 1 else (h, w, 3))


# ------------------------------------------------ attested query

TIFF_RT_SCHEMA = "doc_id long, variant int, width int, height int, px_sum long"

#: doc_id % 6 -> (byteorder, compression): every corpus pass
#: exercises both endiannesses and all four lossless compressions
#: (none / PackBits / LZW / Deflate).
_VARIANTS = (
    ("<", "none"),
    (">", "none"),
    ("<", "packbits"),
    (">", "packbits"),
    ("<", "lzw"),
    (">", "deflate"),
)


def tiff_roundtrip_batch(batches):
    """mapInPandas kernel: synth pixels from the text recipe (same
    dims recipe as the image quartet), encode to the doc's TIFF
    variant, REAL-decode through ``multimodal.decode_image`` (so the
    magic-dispatch path is on the attested route too), and emit the
    exact integer pixel sum — replayable from the text bytes in SQL
    because both encoder and decoder are lossless."""
    import pandas as pd

    from bigdata_pipelines_aws_glue_spark.operators.multimodal import (
        decode_image,
    )

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = np.frombuffer((text or "").encode(), dtype=np.uint8)
            w, h = len(b) % 64 + 1, len(b) % 48 + 1
            px = np.resize(b, (h, w, 3))
            bo, comp = _VARIANTS[int(doc_id) % len(_VARIANTS)]
            decoded = decode_image(encode_tiff(px, bo, compression=comp))
            rows.append(
                (
                    doc_id,
                    int(doc_id) % len(_VARIANTS),
                    w,
                    h,
                    int(decoded.astype(np.int64).sum()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "variant", "width", "height", "px_sum"]
        )


def multimodal_tiff_roundtrip(spark, sf_dir):
    """Registry entry (r11): baseline-TIFF encode -> decode
    attestation with a FULL hash oracle — the raster tiles the text
    bytes, so the decoded pixel sum equals q*sum(bytes) +
    prefix_sum(bytes, r) for w*h*3 = q*nb + r, which the DuckDB twin
    derives independently from the text (ASCII corpus — char index ==
    byte, the same documented precondition as the audio oracles). A
    hash match proves all six (byteorder x compression) container
    variants round-trip every pixel."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs.select("doc_id", "text"))
        .mapInPandas(tiff_roundtrip_batch, schema=TIFF_RT_SCHEMA)
        .select("doc_id", "variant", "width", "height", "px_sum")
    )


#: scalar range() lists (not the generate_series table function —
#: DuckDB 1.0 rejects lateral column args there); empty ranges give
#: NULL from list_aggregate, coalesced to 0.
TIFF_RT_ORACLE = """
WITH d AS (
    SELECT doc_id, coalesce(text, '') AS text,
           octet_length(encode(coalesce(text, ''))) AS nb,
           octet_length(encode(coalesce(text, ''))) % 64 + 1 AS w,
           octet_length(encode(coalesce(text, ''))) % 48 + 1 AS h
    FROM documents
),
s AS (
    SELECT doc_id, nb, w, h,
           coalesce(list_aggregate(list_transform(
               range(1, CAST(nb AS BIGINT) + 1),
               i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum'),
             0) AS total,
           coalesce(list_aggregate(list_transform(
               range(1, CASE WHEN nb = 0 THEN 1
                             ELSE CAST((w * h * 3) % nb AS BIGINT) + 1 END),
               i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum'),
             0) AS prefix
    FROM d
)
SELECT doc_id,
       CAST(doc_id % 6 AS INT) AS variant,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(CASE WHEN nb = 0 THEN 0
                 ELSE ((w * h * 3) // nb) * total + prefix
            END AS BIGINT) AS px_sum
FROM s
"""


#: doc_id % 6 -> the r12 capability matrix: 16-bit gray (both byte
#: orders, predictor on LZW), tiled 8-bit RGB and tiled 16-bit gray
#: (edge padding exercised — w,h are rarely multiples of 16), and
#: planar-2 RGB (plain + predictor-LZW).
_EXT_VARIANTS = (
    ("gray16", "<", "none", False, None, 1),
    ("gray16", ">", "lzw", True, None, 1),
    ("rgb8", "<", "packbits", False, (16, 16), 1),
    ("gray16", ">", "deflate", False, (16, 16), 1),
    ("rgb8", ">", "none", False, None, 2),
    ("rgb8", "<", "lzw", True, None, 2),
)


def tiff_extended_batch(batches):
    """mapInPandas kernel for the r12 TIFF capabilities: synth pixels
    from the text recipe (16-bit variants scale each byte by 257 so
    the full sample range is exercised while the sum stays derivable
    from the text), encode to the variant container, decode, emit
    the exact integer pixel sum."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            b = np.frombuffer((text or "").encode(), dtype=np.uint8)
            w, h = len(b) % 64 + 1, len(b) % 48 + 1
            kind, bo, comp, pred, tile, planar = _EXT_VARIANTS[
                int(doc_id) % len(_EXT_VARIANTS)
            ]
            if kind == "gray16":
                px = np.resize(b, (h, w)).astype(np.uint16) * 257
                payload = encode_tiff(
                    px, bo, compression=comp, predictor=pred,
                    bits=16, tile=tile,
                )
            else:
                px = np.resize(b, (h, w, 3))
                payload = encode_tiff(
                    px, bo, compression=comp, predictor=pred,
                    tile=tile, planar=planar,
                )
            decoded = decode_tiff(payload)
            assert decoded.shape == px.shape and (decoded == px).all()
            rows.append(
                (
                    doc_id,
                    int(doc_id) % len(_EXT_VARIANTS),
                    w,
                    h,
                    int(decoded.astype(np.int64).sum()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "variant", "width", "height", "px_sum"]
        )


def multimodal_tiff_extended(spark, sf_dir):
    """Registry entry (r12): the three previously-loud TIFF seams —
    16-bit samples, tiled layout, planar configuration 2 — on the
    hash-oracle signal. Same text-tiling recipe as the baseline
    query: 8-bit variants sum to q*total + prefix over w*h*3 bytes;
    16-bit variants to 257x that formula over w*h samples (each
    byte scales to byte*257, spanning the 16-bit range)."""
    from bigdata_pipelines_aws_glue_spark.operators.skew import spread
    from bigdata_pipelines_aws_glue_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs.select("doc_id", "text"))
        .mapInPandas(tiff_extended_batch, schema=TIFF_RT_SCHEMA)
        .select("doc_id", "variant", "width", "height", "px_sum")
    )


TIFF_EXT_ORACLE = """
WITH d AS (
    SELECT doc_id, coalesce(text, '') AS text,
           octet_length(encode(coalesce(text, ''))) AS nb,
           octet_length(encode(coalesce(text, ''))) % 64 + 1 AS w,
           octet_length(encode(coalesce(text, ''))) % 48 + 1 AS h,
           doc_id % 6 AS variant
    FROM documents
),
s AS (
    SELECT doc_id, nb, w, h, variant,
           -- n samples the raster tiles over: w*h for the 16-bit
           -- gray variants (0, 1, 3), w*h*3 for the RGB ones
           CASE WHEN variant IN (0, 1, 3) THEN w * h
                ELSE w * h * 3 END AS n,
           coalesce(list_aggregate(list_transform(
               range(1, CAST(nb AS BIGINT) + 1),
               i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum'),
             0) AS total
    FROM d
),
p AS (
    SELECT doc_id, nb, w, h, variant, n, total,
           coalesce(list_aggregate(list_transform(
               range(1, CASE WHEN nb = 0 THEN 1
                             ELSE CAST(n % nb AS BIGINT) + 1 END),
               i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum'),
             0) AS prefix
    FROM s JOIN d USING (doc_id, nb, w, h, variant)
)
SELECT doc_id,
       CAST(variant AS INT) AS variant,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(CASE WHEN nb = 0 THEN 0
                 ELSE (CASE WHEN variant IN (0, 1, 3) THEN 257 ELSE 1 END)
                      * ((n // nb) * total + prefix)
            END AS BIGINT) AS px_sum
FROM p
"""


def _register() -> None:
    from bigdata_pipelines_aws_glue_spark import registry

    registry.register(
        "multimodal_tiff_roundtrip", multimodal_tiff_roundtrip, TIFF_RT_ORACLE
    )
    registry.register(
        "multimodal_tiff_extended", multimodal_tiff_extended, TIFF_EXT_ORACLE
    )

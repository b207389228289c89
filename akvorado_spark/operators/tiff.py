"""TIFF pixel codec, pure stdlib + numpy.

Decoder for the public TIFF 6.0 specification as a data pipeline
meets it: both byte orders (II little / MM big), IFD tag walk with
inline-vs-offset value fields, 8- and 16-bit grayscale (both
BlackIsZero and WhiteIsZero photometrics) and RGB/RGBA in chunky
planar layout,
multi-strip assembly via StripOffsets/StripByteCounts/RowsPerStrip,
and the three LOSSLESS byte-exact compressions real corpora carry:
none (1), LZW (5 — the TIFF variant: MSB-first bit packing, 256/257
clear/EOI, EARLY code-width change per spec §13), and PackBits
(32773, §9), plus the horizontal-differencing Predictor (tag 317 = 2)
usually paired with LZW.  JPEG-in-TIFF/CCITT/planar configs raise
NotImplementedError — perceptual/fax pipelines belong to libtiff.
Everything supported is lossless, so decodes are integer-replayable
by the DuckDB oracle (like the PNG/GIF/BMP/VP8L codecs before it).

The fixture encoder writes either byte order, any strip height, and
every supported compression×predictor combination so round-trips
exercise the offset arithmetic and codec branches, not one happy path.

Reference parity: the reference repo has no image pipeline — this
module belongs to the LLM-data-pipeline surface (multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL
# tags the decoder actually consumes; only these get strict value
# range-checks — an irrelevant tag (XResolution, Software, ...) whose
# value offset points past EOF must not reject an otherwise decodable
# file (ADVICE r11)
_CONSUMED_TAGS = frozenset(
    {256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 317,
     322, 323, 324, 325}  # tiled layout (spec §15)
)


def is_tiff(data: bytes) -> bool:
    return len(data) >= 8 and (
        data[:4] == b"II\x2a\x00" or data[:4] == b"MM\x00\x2a"
    )


def _read_ifd(data: bytes, end: str) -> dict[int, list[int]]:
    """First IFD → {tag: [values...]} for integer-typed tags."""
    (ifd_off,) = struct.unpack_from(end + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF: IFD offset out of range")
    (n,) = struct.unpack_from(end + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack_from(end + "HHI", data, e)
        size = _TYPE_SIZES.get(typ)
        if size is None or cnt == 0:  # unknown type / empty value: skip
            continue
        total = size * cnt
        val_off = e + 8 if total <= 4 else struct.unpack_from(end + "I", data, e + 8)[0]
        if val_off + total > len(data):
            if tag in _CONSUMED_TAGS:
                raise ValueError(f"truncated TIFF tag {tag} value")
            continue  # irrelevant tag with a bad offset: ignore it
        if typ == 3:
            tags[tag] = list(
                struct.unpack_from(end + f"{cnt}H", data, val_off)
            )
        elif typ in (1, 4):
            fmt = "B" if typ == 1 else "I"
            tags[tag] = list(
                struct.unpack_from(end + f"{cnt}{fmt}", data, val_off)
            )
        # ASCII/RATIONAL tags are irrelevant to pixel layout: skip
    return tags


_LZW_CLEAR, _LZW_EOI = 256, 257
# entries index from 258; at 12 bits the last usable code is 4093 per
# spec §13 ("CodeValue of 4094" forces a Clear), so the table holds at
# most 4094-258 entries
_LZW_MAX_ENTRIES = 4094 - 258


def _tiff_lzw_decode(data: bytes, max_bytes: int) -> bytes:
    """TIFF-variant LZW (spec §13): 8-bit symbols, MSB-first codes
    starting at 9 bits, Clear=256/EOI=257, and the EARLY width change
    (grow when the next free code equals 2^width - 1, one code sooner
    than the GIF variant).  Raises ValueError on out-of-sequence codes
    or output overrun — corrupt strips fail loudly."""
    width = 9
    table: list[bytes] = []
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            width = 9
            table = []
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if code < 256:
            entry = bytes([code])
        elif code >= 258 and code - 258 < len(table):
            entry = table[code - 258]
        elif code == 258 + len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} out of sequence")
        if prev is not None and len(table) < _LZW_MAX_ENTRIES:
            table.append(prev + entry[:1])
        out += entry
        if len(out) > max_bytes:
            raise ValueError("TIFF LZW yields more bytes than the strip")
        prev = entry
        # EARLY change: the next code is read wider as soon as the next
        # free slot reaches 2^width - 1
        if 258 + len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


class _MSBPacker:
    """MSB-first variable-width code packer (the TIFF LZW byte order)."""

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self.bytes = bytearray()

    def put(self, code: int, width: int) -> None:
        self._acc = (self._acc << width) | code
        self._n += width
        while self._n >= 8:
            self._n -= 8
            self.bytes.append((self._acc >> self._n) & 0xFF)

    def flush(self) -> None:
        if self._n:
            self.bytes.append((self._acc << (8 - self._n)) & 0xFF)
            self._acc = 0
            self._n = 0


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """Fixture TIFF-LZW encoder, exact mirror of the decoder's
    early-change width schedule (encoder table runs one entry ahead,
    so it grows at 2^width)."""
    pk = _MSBPacker()
    width = 9
    table: dict[bytes, int] = {}
    next_code = 258
    pk.put(_LZW_CLEAR, width)
    seq = b""
    for b in raw:
        cand = seq + bytes([b])
        if len(cand) == 1 or cand in table:
            seq = cand
            continue
        pk.put(table[seq] if len(seq) > 1 else seq[0], width)
        if next_code - 258 < _LZW_MAX_ENTRIES:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            pk.put(_LZW_CLEAR, width)
            table = {}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        pk.put(table[seq] if len(seq) > 1 else seq[0], width)
        # the DECODER adds one more entry after consuming this final
        # symbol and widens if that entry lands on the early-change
        # boundary — mirror the virtual add so EOI is written at the
        # width the decoder will read it with (caught by the r12 tiled
        # sweep: a stream whose last data symbol sits exactly on the
        # 2^w boundary desynced EOI by one bit-width)
        if next_code - 258 < _LZW_MAX_ENTRIES:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    pk.put(_LZW_EOI, width)
    pk.flush()
    return bytes(pk.bytes)


def _packbits_decode(data: bytes, max_bytes: int) -> bytes:
    """PackBits RLE (spec §9): n in 0..127 copies n+1 literals,
    n in -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_bytes:
        n = data[i] - 256 if data[i] >= 128 else data[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    if len(out) > max_bytes:
        raise ValueError("PackBits yields more bytes than the strip")
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """Fixture PackBits: runs of ≥3 equal bytes become repeats,
    everything else literal chunks of ≤128."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and raw[i + run] == raw[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([256 + 1 - run, raw[i]])  # 1-run as signed byte
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and raw[i + run] == raw[i] and run < 128:
                run += 1
            if run >= 3:
                break
            i += run
        chunk = raw[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _layout(data: bytes) -> tuple[str, dict[int, list[int]], int, int, int, int]:
    """→ (endian fmt, tags, width, height, samples, photometric)."""
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad byte-order/magic header)")
    end = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, end)
    try:
        w = tags[256][0]
        h = tags[257][0]
    except (KeyError, IndexError) as e:
        raise ValueError("TIFF without ImageWidth/ImageLength") from e
    samples = tags.get(277, [1])[0]
    photometric = tags.get(262, [1])[0]
    return end, tags, w, h, samples, photometric


def tiff_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the first IFD — O(tags), no
    pixel access.  Channels match :func:`tiff_decode`: grayscale
    photometrics report 1, RGB 3, RGB+alpha 4."""
    _, _, w, h, samples, _ = _layout(data)
    return w, h, samples


def tiff_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """TIFF bytes → (width, height, channels, HxWxC uint8 or uint16).
    WhiteIsZero grayscale is inverted to the usual 0=black convention
    so features read consistently across formats; 16-bit samples come
    back as native uint16 (read in the file's byte order)."""
    end, tags, w, h, samples, photometric = _layout(data)
    compression = tags.get(259, [1])[0]
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} not supported (none/LZW/"
            "PackBits decode natively; JPEG-in-TIFF/CCITT need libtiff)"
        )
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    bits = tags.get(258, [8] * samples)
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    depth = bits[0]
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar (non-chunky) TIFF not supported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photometric} not supported")
    if w <= 0 or h <= 0 or samples not in (1, 3, 4):
        raise ValueError("bad TIFF dimensions/sample count")
    native = np.uint16 if depth == 16 else np.uint8
    full = (1 << depth) - 1
    dtype = np.dtype(end + ("u2" if depth == 16 else "u1"))
    tile_w = tags.get(322, [0])[0]
    tile_l = tags.get(323, [0])[0]
    if tile_w and tile_l:
        # tiled layout (spec §15): the image is a grid of tw×tl tiles,
        # each compressed independently; edge tiles are padded to the
        # full tile size (padding content is arbitrary and cropped)
        offsets = tags.get(324)
        counts = tags.get(325)
        across = -(-w // tile_w)
        down = -(-h // tile_l)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiled TIFF without coherent tile offsets/counts")
        if len(offsets) < across * down:
            raise ValueError("TIFF tile count does not cover the image")
        row_bytes = tile_w * samples * (depth // 8)
        tile_need = tile_l * row_bytes
        canvas = np.zeros((down * tile_l, across * tile_w, samples), dtype=native)
        for t in range(across * down):
            off, cnt = offsets[t], counts[t]
            if off + cnt > len(data):
                raise ValueError("truncated TIFF tile")
            raw = data[off : off + cnt]
            if compression == 5:
                buf = _tiff_lzw_decode(raw, tile_need)
            elif compression == 32773:
                buf = _packbits_decode(raw, tile_need)
            else:
                buf = raw[:tile_need]
            if len(buf) < tile_need:
                raise ValueError("TIFF tile shorter than its grid cell")
            arr = np.frombuffer(buf[:tile_need], dtype=dtype).reshape(
                tile_l, tile_w, samples
            )
            if predictor == 2:  # horizontal differencing restarts per tile row
                arr = (arr.astype(np.uint64).cumsum(axis=1) & full).astype(native)
            else:
                arr = arr.astype(native, copy=False)
            ty, tx = divmod(t, across)
            canvas[ty * tile_l : (ty + 1) * tile_l,
                   tx * tile_w : (tx + 1) * tile_w] = arr
        px = canvas[:h, :w]
        if photometric == 0:
            px = (full - px).astype(native)
        if photometric == 2 and samples < 3:
            raise ValueError("RGB photometric with fewer than 3 samples")
        return w, h, samples, np.ascontiguousarray(px)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF without coherent strip offsets/byte counts")
    rows_per_strip = tags.get(278, [h])[0] or h
    # strip-boundary sanity: declared strip count must cover the rows
    if len(offsets) < -(-h // rows_per_strip):
        raise ValueError("TIFF strip count does not cover the image rows")
    row_bytes = w * samples * (depth // 8)
    out = bytearray()
    need = h * row_bytes
    for s_i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("truncated TIFF strip")
        raw = data[off : off + cnt]
        strip_rows = min(rows_per_strip, h - s_i * rows_per_strip)
        strip_need = strip_rows * row_bytes
        if compression == 5:
            out += _tiff_lzw_decode(raw, strip_need)
        elif compression == 32773:
            out += _packbits_decode(raw, strip_need)
        else:
            out += raw
        if len(out) >= need:
            break
    if len(out) < need:
        raise ValueError("TIFF strips shorter than the image")
    # 16-bit samples are stored in the FILE byte order (spec §4 "the
    # byte order ... applies to all data in the file"), so read them
    # with the header's endianness and hand back native uint16
    px = np.frombuffer(bytes(out[:need]), dtype=dtype).reshape(h, w, samples)
    if predictor == 2:  # horizontal differencing: undo with a row cumsum
        # predictor 2 differences SAMPLE VALUES (spec §14), so on
        # 16-bit data the cumsum wraps mod 65536, not per-byte
        px = (px.astype(np.uint64).cumsum(axis=1) & full).astype(native)
    else:
        px = px.astype(native, copy=False)
    if photometric == 0:  # WhiteIsZero → invert to BlackIsZero
        px = (full - px).astype(native)
    if photometric == 2 and samples < 3:
        raise ValueError("RGB photometric with fewer than 3 samples")
    return w, h, samples, np.ascontiguousarray(px)


def tiff_encode(
    px: np.ndarray,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    white_is_zero: bool = False,
    compression: str = "none",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """HxW / HxWx{1,3,4} uint8 (or uint16 → 16-bit samples) → TIFF.

    Fixture encoder: either byte order, any strip height (default one
    strip), optional WhiteIsZero grayscale (stored inverted so the
    decoder's un-inversion reproduces the input exactly),
    ``compression`` in none/lzw/packbits, and ``predictor=2`` for
    horizontal differencing (spec-legal with any compression).  Bit
    depth follows the input dtype; 16-bit samples are written in the
    chosen byte order and differenced as sample values (spec §14).
    ``tile=(tw, tl)`` writes the TILED layout (spec §15): zero-padded
    edge tiles, each tile compressed/differenced independently."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, samples = px.shape
    depth = 16 if px.dtype == np.uint16 else 8
    full = (1 << depth) - 1
    if samples not in (1, 3, 4):
        raise ValueError("tiff_encode takes 1, 3 or 4 samples per pixel")
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp_tag is None:
        raise ValueError(f"unsupported tiff_encode compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    end = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h
    body = px if not white_is_zero else (full - px).astype(px.dtype)
    if white_is_zero and samples != 1:
        raise ValueError("WhiteIsZero applies to grayscale only")
    native = np.uint16 if depth == 16 else np.uint8

    def differenced(arr):
        a = arr.astype(np.int64)
        return np.concatenate(
            [a[:, :1], (a[:, 1:] - a[:, :-1]) & full], axis=1
        ).astype(native)

    pack = {
        1: lambda b: b,
        5: _tiff_lzw_encode,
        32773: _packbits_encode,
    }[comp_tag]
    wire_dtype = np.dtype(end + ("u2" if depth == 16 else "u1"))
    if tile is not None:
        tw, tl = tile
        if tw <= 0 or tl <= 0:
            raise ValueError("tile dims must be positive")
        across, down = -(-w // tw), -(-h // tl)
        padded = np.zeros((down * tl, across * tw, samples), dtype=body.dtype)
        padded[:h, :w] = body
        strips = []
        for ty in range(down):
            for tx in range(across):
                t = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                if predictor == 2:  # differencing restarts per tile
                    t = differenced(t)
                strips.append(pack(t.astype(wire_dtype).tobytes()))
    else:
        if predictor == 2:  # forward horizontal differencing per row
            body = differenced(body)
        # serialize strips in the FILE byte order (matters for 16-bit)
        wire = body.astype(wire_dtype)
        strips = [
            pack(wire[y : y + rows_per_strip].tobytes())
            for y in range(0, h, rows_per_strip)
        ]
    photometric = 0 if white_is_zero else (1 if samples == 1 else 2)

    entries: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries.append((256, 4, [w]))
    entries.append((257, 4, [h]))
    entries.append((258, 3, [depth] * samples))
    entries.append((259, 3, [comp_tag]))
    entries.append((262, 3, [photometric]))
    entries.append((277, 3, [samples]))
    if tile is not None:
        entries.append((322, 4, [tile[0]]))
        entries.append((323, 4, [tile[1]]))
        entries.append((325, 4, [len(s) for s in strips]))
        entries.append((324, 4, [0] * len(strips)))  # offsets patched below
    else:
        entries.append((278, 4, [rows_per_strip]))
        entries.append((279, 4, [len(s) for s in strips]))
        entries.append((273, 4, [0] * len(strips)))  # offsets patched below
    if samples == 4:
        entries.append((338, 3, [1]))  # ExtraSamples: associated alpha
    if predictor == 2:
        entries.append((317, 3, [2]))
    entries.sort(key=lambda t: t[0])

    # layout: header(8) + IFD + overflow value area + strips
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def field(typ: int, values: list[int]) -> bytes:
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        raw = struct.pack(end + f"{len(values)}{fmt}", *values)
        if len(raw) <= 4:
            return raw + bytes(4 - len(raw))
        nonlocal_off = overflow_off + len(overflow)
        overflow.extend(raw)
        return struct.pack(end + "I", nonlocal_off)

    strips_off = None  # patched after overflow is final

    # two passes: first compute overflow for everything except strip
    # offsets (they need the final data start), then write
    sizes = {3: 2, 4: 4, 1: 1}
    overflow_len = sum(
        sizes[typ] * len(vals)
        for _tag, typ, vals in entries
        if sizes[typ] * len(vals) > 4
    )
    data_start = overflow_off + overflow_len
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    entries = [
        (tag, typ, strip_offsets if tag == (324 if tile is not None else 273) else vals)
        for tag, typ, vals in entries
    ]

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(end + "I", ifd_off)
    out += struct.pack(end + "H", len(entries))
    for tag, typ, vals in entries:
        out += struct.pack(end + "HHI", tag, typ, len(vals))
        out += field(typ, vals)
    out += struct.pack(end + "I", 0)  # no next IFD
    out += overflow
    assert len(out) == data_start, (len(out), data_start)
    for s in strips:
        out += s
    return bytes(out)

"""TIFF pixel codec (baseline, uncompressed strips), pure stdlib + numpy.

Decoder for the public TIFF 6.0 specification's Baseline profile as a
data pipeline meets it: both byte orders (II little / MM big), IFD tag
walk with inline-vs-offset value fields, 8-bit grayscale (both
BlackIsZero and WhiteIsZero photometrics) and RGB/RGBA in chunky
planar layout, multi-strip assembly via StripOffsets/StripByteCounts/
RowsPerStrip.  Compression schemes other than 1 (none) raise
NotImplementedError — LZW/PackBits/JPEG-in-TIFF belong to libtiff;
the uncompressed layout is what scientific and scanner corpora carry
and is integer-replayable by the DuckDB oracle (lossless, like the
PNG/GIF/BMP/VP8L codecs before it).

The fixture encoder writes either byte order and any strip height so
round-trips exercise the offset arithmetic, not one happy path.

Reference parity: the reference repo has no image pipeline — this
module belongs to the LLM-data-pipeline surface (multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


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
        if size is None:  # unknown type: skip per spec
            continue
        total = size * cnt
        val_off = e + 8 if total <= 4 else struct.unpack_from(end + "I", data, e + 8)[0]
        if val_off + total > len(data):
            raise ValueError(f"truncated TIFF tag {tag} value")
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


def _layout(data: bytes) -> tuple[str, dict[int, list[int]], int, int, int, int]:
    """→ (endian fmt, tags, width, height, samples, photometric)."""
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad byte-order/magic header)")
    end = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, end)
    try:
        w = tags[256][0]
        h = tags[257][0]
    except KeyError as e:
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
    """Baseline uncompressed TIFF bytes → (width, height, channels,
    HxWxC uint8).  WhiteIsZero grayscale is inverted to the usual
    0=black convention so features read consistently across formats."""
    end, tags, w, h, samples, photometric = _layout(data)
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} not supported (baseline"
            " uncompressed only; LZW/PackBits/JPEG need libtiff)"
        )
    bits = tags.get(258, [8] * samples)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar (non-chunky) TIFF not supported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photometric} not supported")
    if w <= 0 or h <= 0 or samples not in (1, 3, 4):
        raise ValueError("bad TIFF dimensions/sample count")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF without coherent strip offsets/byte counts")
    rows_per_strip = tags.get(278, [h])[0] or h
    row_bytes = w * samples
    out = bytearray()
    need = h * row_bytes
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("truncated TIFF strip")
        out += data[off : off + cnt]
        if len(out) >= need:
            break
    if len(out) < need:
        raise ValueError("TIFF strips shorter than the image")
    px = np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w, samples)
    if photometric == 0:  # WhiteIsZero → invert to BlackIsZero
        px = 255 - px
    if photometric == 2 and samples < 3:
        raise ValueError("RGB photometric with fewer than 3 samples")
    # strip-boundary sanity: declared strip count must cover the rows
    if len(offsets) < -(-h // rows_per_strip):
        raise ValueError("TIFF strip count does not cover the image rows")
    return w, h, samples, np.ascontiguousarray(px)


def tiff_encode(
    px: np.ndarray,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    white_is_zero: bool = False,
) -> bytes:
    """HxW / HxWx{1,3,4} uint8 → baseline uncompressed TIFF bytes.

    Fixture encoder: either byte order, any strip height (default one
    strip), optional WhiteIsZero grayscale (stored inverted so the
    decoder's un-inversion reproduces the input exactly)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, samples = px.shape
    if samples not in (1, 3, 4):
        raise ValueError("tiff_encode takes 1, 3 or 4 samples per pixel")
    end = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h
    body = px if not white_is_zero else 255 - px
    if white_is_zero and samples != 1:
        raise ValueError("WhiteIsZero applies to grayscale only")
    strips = [
        body[y : y + rows_per_strip].tobytes()
        for y in range(0, h, rows_per_strip)
    ]
    photometric = 0 if white_is_zero else (1 if samples == 1 else 2)

    entries: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries.append((256, 4, [w]))
    entries.append((257, 4, [h]))
    entries.append((258, 3, [8] * samples))
    entries.append((259, 3, [1]))
    entries.append((262, 3, [photometric]))
    entries.append((277, 3, [samples]))
    entries.append((278, 4, [rows_per_strip]))
    entries.append((279, 4, [len(s) for s in strips]))
    entries.append((273, 4, [0] * len(strips)))  # offsets patched below
    if samples == 4:
        entries.append((338, 3, [1]))  # ExtraSamples: associated alpha
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
        (tag, typ, strip_offsets if tag == 273 else vals)
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

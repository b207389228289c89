"""GIF (LZW) pixel codec, pure stdlib + numpy.

Decoder for the public GIF87a/GIF89a specification (CompuServe, 1990;
also W3C's informational copy): logical screen descriptor, global and
local color tables, interlacing, Graphic Control Extension
transparency, and the GIF flavor of LZW (variable 3–12 bit codes,
LSB-first packing, clear/EOI, deferred-clear full-table behavior).
:func:`gif_decode` returns the FIRST frame (the document image for a
training corpus); :func:`gif_decode_frames` composes FULL animations
per the GIF89a §23 disposal methods (keep / restore-to-background /
restore-previous) for frame-sampling pipelines.

The fixture encoder emits real LZW (not the uncompressed-GIF trick) so
round-trips exercise table growth, width changes and table-full resets
in the decoder.  GIF is lossless, so every decode is integer-exact and
DuckDB can replay pixel sums in the oracle gate — same precedent as
the PNG (operators/png.py) and VP8L (operators/vp8l.py) codecs.

Reference parity: the reference repo has no image pipeline at all —
this module belongs to the LLM-data-pipeline surface (multimodal
columns), not to any akvorado operator.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 1 << 12  # GIF LZW codes never exceed 12 bits
# interlaced row order: four passes of (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return len(data) >= 13 and data[:6] in (b"GIF87a", b"GIF89a")


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]


# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list[int]:
    """GIF-LZW bytes → color indices.  Codes are read LSB-first with a
    width that grows as the decoder's table fills (one behind the
    encoder's); a full table (4096) stops growth until a Clear code
    arrives (the spec's deferred-clear behavior).  Raises ValueError on
    any out-of-sequence code — corrupt streams must fail loudly, never
    loop or index out of range."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"LZW minimum code size {min_code} out of range")
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[list[int] | None] = [[i] for i in range(clear)] + [None, None]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = [[i] for i in range(clear)] + [None, None]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
            if prev is not None and len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < _MAX_CODE:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of sequence")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW stream yields more pixels than the frame")
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    # stream ran out without EOI: tolerated iff the frame is complete
    # (many real encoders omit EOI); short output is an error upstream
    return out


class _BitPacker:
    """LSB-first variable-width code packer (the GIF byte order)."""

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self.bytes = bytearray()

    def put(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> None:
        if self._n:
            self.bytes.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """Real LZW (string-table) encoder: grows codes 3→12 bits in sync
    with the decoder's one-behind table and emits Clear on table-full,
    so round-trips exercise every decoder branch."""
    clear = 1 << min_code
    eoi = clear + 1
    pk = _BitPacker()
    width = min_code + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    pk.put(clear, width)
    seq: tuple[int, ...] = ()
    for s in indices:
        cand = seq + (s,)
        if cand in table:
            seq = cand
            continue
        pk.put(table[seq], width)
        if next_code < _MAX_CODE:
            table[cand] = next_code
            next_code += 1
            # the decoder learns this entry one code later, so its
            # table hits 1<<width exactly when our next_code passes it
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            pk.put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (s,)
    if seq:
        pk.put(table[seq], width)
        # mirror the decoder's entry-add after the final data symbol:
        # it widens when its table hits 2^width, so EOI must be written
        # at that width (same end-of-stream boundary fix as the TIFF
        # LZW encoder, r12)
        if next_code < _MAX_CODE:
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
    pk.put(eoi, width)
    pk.flush()
    return bytes(pk.bytes)


# ---------------------------------------------------------------------------
# container


def _read_color_table(data: bytes, off: int, n: int) -> np.ndarray:
    end = off + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    return np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 3).copy()


def _read_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(data):
            raise ValueError("truncated GIF data sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        if off + n > len(data):
            raise ValueError("truncated GIF data sub-block")
        chunks.append(data[off : off + n])
        off += n


def gif_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the logical screen descriptor —
    O(1).  Channels report 4 iff the first frame's GCE declares a
    transparent index, matching what :func:`gif_decode` returns."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    w, h = struct.unpack_from("<HH", data, 6)
    # best-effort scan of block intros (skipping payloads) for a GCE
    # before the first image descriptor — bounded, a few bytes per
    # block; anything unparseable just means "no transparency seen"
    # (metadata must tolerate padded/truncated bodies)
    packed = data[10]
    off = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    transparent = False
    try:
        while off < len(data):
            b = data[off]
            if b != 0x21:
                break
            label = data[off + 1]
            body, off = _read_subblocks(data, off + 2)
            # same >=4 guard as gif_decode: a truncated GCE body carries
            # no usable transparent index, so meta and pixel decode must
            # both treat it as opaque
            if label == 0xF9 and len(body) >= 4 and body[0] & 1:
                transparent = True
    except (ValueError, IndexError):
        pass
    return w, h, 4 if transparent else 3


def _screen_and_gct(data: bytes) -> tuple[int, int, np.ndarray | None, int, int]:
    """Parse the logical screen descriptor → (sw, sh, global color
    table or None, background index, offset past the GCT)."""
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed, bg_index = data[10], data[11]
    off = 13
    gct = None
    if packed & 0x80:
        gct = _read_color_table(data, off, 2 << (packed & 7))
        off += 3 * len(gct)
    return sw, sh, gct, bg_index, off


def _iter_frames(data: bytes):
    """Yield every frame of a GIF as
    ``(left, top, fw, fh, idx[fh,fw] int64, ct, transparent_idx,
    disposal)`` — the shared parse behind :func:`gif_decode` (first
    frame) and :func:`gif_decode_frames` (animation composition).

    GCE state applies to the NEXT image and resets after it (GIF89a
    §23: a GCE modifies the single following rendering block); a GCE
    without the transparency flag leaves a previously-declared index in
    place (matching the long-standing single-frame behavior) and the
    disposal field is bits 2–4 of the packed byte."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, gct, _bg, off = _screen_and_gct(data)
    transparent_idx: int | None = None
    disposal = 0
    seen = 0
    while True:
        if off >= len(data):
            if seen:
                return  # missing trailer after a complete frame: tolerated
            raise ValueError("GIF ended before an image descriptor")
        block = data[off]
        off += 1
        if block == 0x3B:
            if seen:
                return
            raise ValueError("GIF trailer before any image descriptor")
        if block == 0x21:
            if off >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[off]
            body, off = _read_subblocks(data, off + 1)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 7
                if body[0] & 1:
                    transparent_idx = body[3]
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, off)
        fpacked = data[off + 8]
        off += 9
        ct = gct
        if fpacked & 0x80:
            ct = _read_color_table(data, off, 2 << (fpacked & 7))
            off += 3 * (2 << (fpacked & 7))
        if ct is None:
            raise ValueError("GIF frame without any color table")
        if left + fw > sw or top + fh > sh or fw == 0 or fh == 0:
            raise ValueError("GIF frame rect outside the logical screen")
        if off >= len(data):
            raise ValueError("truncated GIF image data")
        min_code = data[off]
        lzw, off = _read_subblocks(data, off + 1)
        idx = _lzw_decode(lzw, min_code, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("LZW stream ended before the frame filled")
        frame = np.asarray(idx[: fw * fh], dtype=np.int64)
        if int(frame.max(initial=0)) >= len(ct):
            raise ValueError("GIF color index out of table range")
        if fpacked & 0x40:  # interlaced: rows arrive in pass order
            order = _interlace_order(fh)
            deint = np.empty((fh, fw), dtype=np.int64)
            deint[order] = frame.reshape(fh, fw)
            frame = deint
        else:
            frame = frame.reshape(fh, fw)
        yield left, top, fw, fh, frame, ct, transparent_idx, disposal
        seen += 1
        transparent_idx = None
        disposal = 0


def _background_rgb(gct: np.ndarray | None, bg_index: int) -> np.ndarray:
    # the spec defines the background color index relative to the
    # GLOBAL color table, not any frame's local one
    if gct is not None and bg_index < len(gct):
        return gct[bg_index]
    return np.zeros(3, np.uint8)


def gif_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """GIF bytes → (width, height, channels, HxWxC uint8) — the first
    frame composed onto the logical screen (background-filled when the
    frame rect is smaller).  channels is 4 (RGBA) when the frame's GCE
    declares a transparent index, else 3.  Animations: see
    :func:`gif_decode_frames` for the multi-frame composition."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, gct, bg_index, _ = _screen_and_gct(data)
    left, top, fw, fh, frame, ct, transparent_idx, _disp = next(
        _iter_frames(data)
    )
    ch = 4 if transparent_idx is not None else 3
    rgb = ct[frame.reshape(-1)].reshape(fh, fw, 3)
    if ch == 4:
        alpha = np.where(frame == transparent_idx, 0, 255).astype(np.uint8)
        rgb = np.dstack([rgb, alpha])
    if (left, top, fw, fh) == (0, 0, sw, sh):
        return sw, sh, ch, np.ascontiguousarray(rgb)
    # partial frame: compose onto a background-filled canvas
    bg = _background_rgb(gct, bg_index)
    canvas = np.empty((sh, sw, ch), dtype=np.uint8)
    canvas[:, :, :3] = bg
    if ch == 4:
        canvas[:, :, 3] = 255
    canvas[top : top + fh, left : left + fw] = rgb
    return sw, sh, ch, canvas


def gif_frame_count(data: bytes) -> int:
    """Number of image frames — an O(blocks) intro walk (LZW payloads
    are length-skipped, never decoded)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    _sw, _sh, _gct, _bg, off = _screen_and_gct(data)
    n = 0
    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if off >= len(data):
                break
            _body, off = _read_subblocks(data, off + 1)
            continue
        if block != 0x2C:
            break
        if off + 9 > len(data):
            break
        fpacked = data[off + 8]
        off += 9
        if fpacked & 0x80:
            off += 3 * (2 << (fpacked & 7))
        if off >= len(data):
            break
        _lzw, off = _read_subblocks(data, off + 1)
        n += 1
    return n


def gif_decode_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[np.ndarray]]:
    """Animated GIF → (width, height, [HxWx3 uint8 canvas per frame]).

    Composes every frame onto the logical screen honoring the three
    GIF89a disposal methods (§23): 0/1 leave the canvas as drawn,
    2 restores the frame RECT to the background color, 3 restores the
    canvas to its pre-frame state.  Transparent pixels in a frame do
    not overwrite the canvas (the animation compositing meaning of
    transparency — distinct from :func:`gif_decode`'s single-frame
    alpha channel).  The canvas starts filled with the background
    color from the GLOBAL color table (black when absent), the
    deterministic classic-spec reading, so every composed frame is an
    integer-exact function of the input and an oracle can replay the
    per-frame pixel sums.  ``max_frames`` bounds work on hostile
    inputs (a 100 TB corpus row must not decode an unbounded
    animation)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, gct, bg_index, _ = _screen_and_gct(data)
    bg = _background_rgb(gct, bg_index)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    out: list[np.ndarray] = []
    for left, top, fw, fh, frame, ct, tr, disposal in _iter_frames(data):
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = ct[frame.reshape(-1)].reshape(fh, fw, 3)
        if tr is None:
            region[:] = rgb
        else:
            drawn = frame != tr
            region[drawn] = rgb[drawn]
        out.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3:
            canvas = prev
        if max_frames is not None and len(out) >= max_frames:
            break
    return sw, sh, out


# ---------------------------------------------------------------------------
# fixture encoders


def gif_encode_frames(
    screen: tuple[int, int],
    palette: np.ndarray,
    frames: list[dict],
    bg_index: int = 0,
    loop: bool = True,
) -> bytes:
    """Animated-GIF fixture encoder: explicit global palette + one
    entry per frame ``{"left", "top", "idx" (fh×fw int array),
    "disposal" (0–3), "transparent" (palette index or None),
    "delay_cs" (optional)}``.  Emits a GIF89a with a GCE per frame
    (and the NETSCAPE looping application extension when ``loop``) so
    round-trips exercise the per-frame GCE reset, all three disposal
    methods, and the compositing meaning of transparency in
    :func:`gif_decode_frames`."""
    sw, sh = int(screen[0]), int(screen[1])
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    pal_bits = max(1, (len(palette) - 1).bit_length())
    pal_n = 1 << pal_bits
    min_code = max(2, pal_bits)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (pal_bits - 1), bg_index, 0])
    out += palette.tobytes() + bytes(3 * (pal_n - len(palette)))
    if loop:
        # NETSCAPE2.0 looping block — an application extension the
        # frame iterator must skip like any other 0x21 block
        out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1, 0, 0, 0])
    for fr in frames:
        idx = np.asarray(fr["idx"], dtype=np.int64)
        fh, fw = idx.shape
        left, top = int(fr.get("left", 0)), int(fr.get("top", 0))
        if left + fw > sw or top + fh > sh:
            raise ValueError("frame rect outside the logical screen")
        if int(idx.max(initial=0)) >= len(palette) or int(idx.min(initial=0)) < 0:
            raise ValueError("frame index outside the palette")
        tr = fr.get("transparent")
        disposal = int(fr.get("disposal", 0)) & 7
        packed = (disposal << 2) | (1 if tr is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed])
        out += struct.pack("<H", int(fr.get("delay_cs", 0)))
        out += bytes([tr if tr is not None else 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0])  # no local table, not interlaced
        out += bytes([min_code])
        lzw = _lzw_encode([int(v) for v in idx.reshape(-1)], min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def gif_encode(
    px: np.ndarray,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    min_code_override: int | None = None,
) -> bytes:
    """HxWx3 (or HxW grayscale) uint8 → GIF bytes.

    Builds the palette from the distinct colors (≤256, else
    ValueError), LZW-compresses real codes, optionally interlaces the
    row order, and can mark one palette color transparent via a
    GIF89a Graphic Control Extension — enough to exercise every
    decoder branch while staying byte-deterministic."""
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("gif_encode takes HxWx3 or HxW uint8 pixels")
    h, w, _ = px.shape
    if not (1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("GIF dimensions out of range")
    flat = px.reshape(-1, 3)
    colors = sorted({tuple(int(v) for v in c) for c in flat})
    if transparent_color is not None:
        tc = tuple(int(v) for v in transparent_color)
        if tc not in colors:
            raise ValueError("transparent_color not present in the image")
        # deterministic: transparent color first in the palette
        colors.remove(tc)
        colors.insert(0, tc)
    if len(colors) > 256:
        raise ValueError("too many colors for a GIF palette")
    color_idx = {c: i for i, c in enumerate(colors)}
    # palette size must be a power of two ≥ 2 in the container
    pal_bits = max(1, (len(colors) - 1).bit_length())
    pal_n = 1 << pal_bits
    min_code = max(2, pal_bits) if min_code_override is None else min_code_override
    idx = [color_idx[tuple(int(v) for v in c)] for c in flat]
    if interlace:
        rows = np.asarray(idx, dtype=np.int64).reshape(h, w)
        idx = [int(v) for y in _interlace_order(h) for v in rows[y]]

    out = bytearray()
    out += b"GIF89a" if transparent_color is not None else b"GIF87a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag+size, bg=0
    for c in colors:
        out += bytes(c)
    out += bytes(3 * (pal_n - len(colors)))
    if transparent_color is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, color_idx[tc], 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code])
    lzw = _lzw_encode(idx, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)

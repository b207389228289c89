"""Pure-stdlib VP8L (lossless WebP) codec.

Built from the public "WebP Lossless Bitstream Specification" (the
VP8L format), the same way ``operators/png.py`` and
``operators/jpeg.py`` were built from their specs: a full DECODER for
the lossless feature surface — canonical prefix codes (simple and
code-length-coded), LZ77 backward references with the two-level
distance mapping, color cache, meta-prefix entropy images, and all
four transforms (predictor / color / subtract-green / color-indexing
with pixel bundling) — plus a deterministic fixture ENCODER
(``vp8l_encode_lossless``) that exercises each decode path end-to-end
in tests and oracle gates.  Lossless means every fixture pixel is
integer-replayable by DuckDB, so the gate needs no exactness lever.

Reference parity note: the codec-boundary treatment mirrors the
reference's opaque-media stance (akvorado inlet stores bytes, decode
is a consumer concern — see operators/multimodal.py); here decode IS
implemented.  The 120-entry distance neighbor table is transcribed
from the public spec/libwebp.  Round-trips against the fixture
encoder are supplemented by encoder-independent conformance vectors
hand-assembled bit-by-bit from the spec text
(tests/test_spec_goldens.py) — field order, simple-code layout and
the degenerate zero-bit code are pinned to the written format, not to
this module's encoder (no libwebp in the container; production users
decoding foreign files should still validate against it once
available).

Scale shape: the codec runs inside Arrow-batched ``mapInPandas``
workers (operators/multimodal.py) — binaries never reach the driver,
and per-image work is embarrassingly parallel across partitions.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within bytes (like DEFLATE);
# prefix-code BITS are written most-significant-first into that stream
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte_i, bit_i = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            raise ValueError("truncated VP8L bitstream")
        self.pos += 1
        return (self.data[byte_i] >> bit_i) & 1


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        """n low bits of value, LSB-first."""
        for i in range(n):
            if self.bit == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code: bits MSB-first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment, per the spec)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for nonzero lengths, canonical order."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class _PrefixCode:
    """Bit-by-bit decoder for one prefix code.  A single-used-symbol
    code decodes to that symbol consuming ZERO bits (the spec/libwebp
    convention for degenerate codes)."""

    def __init__(self, lengths: list[int]):
        used = [s for s, l in enumerate(lengths) if l]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0]
            self.table = {}
            return
        self.single = None
        self.table = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }
        # Kraft completeness: an over/under-subscribed code is corrupt
        if sum(1 << (max(l for l in lengths if l) - l) for l in lengths if l) != (
            1 << max(l for l in lengths if l)
        ):
            raise ValueError("prefix code lengths violate Kraft equality")

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.table = {}
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bit()
            hit = self.table.get((length, code))
            if hit is not None:
                return hit
        raise ValueError("invalid prefix code in VP8L stream")


def _build_lengths(hist: dict[int, int], alphabet: int, limit: int = 15) -> list[int]:
    """Huffman code lengths from a histogram (heap Huffman; fixture
    alphabets are small enough that the depth limit is never hit —
    asserted, not silently clipped)."""
    import heapq

    syms = [s for s, n in hist.items() if n > 0]
    lengths = [0] * alphabet
    if not syms:
        raise ValueError("cannot code an empty alphabet")
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(n, i, [s]) for i, (s, n) in enumerate(sorted(hist.items())) if n > 0]
    heapq.heapify(heap)
    i = len(heap)
    while len(heap) > 1:
        n1, _, s1 = heapq.heappop(heap)
        n2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (n1 + n2, i, s1 + s2))
        i += 1
    if max(lengths) > limit:
        raise ValueError(f"prefix code depth {max(lengths)} exceeds {limit}")
    return lengths


# order in which code-length-code lengths are stored (public spec)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# LZ77 distance neighbor map: codes 1..120 address a (dx, dy) window
# around the current pixel; codes >120 are distance-120 directly.
# Transcribed from the public spec's code-to-plane table.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (8, 6), (4, 8),
)
assert len(_DIST_MAP) == 120


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix_code, extra_bits_value, extra_bits_count);
    inverse of the spec's length/distance prefix decoding."""
    x = v - 1
    if x <= 1:
        return x, 0, 0
    k = x.bit_length() - 1
    b = (x >> (k - 1)) & 1
    return 2 * k + b, x - ((2 + b) << (k - 1)), k - 1


def _prefix_decode(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ---------------------------------------------------------------------------
# pixel helpers — pixels are (a, r, g, b) uint8 tuples packed as ARGB ints
# ---------------------------------------------------------------------------


def _hash_pixel(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, L, T, TL, TR):
    """One predictor per spec mode; operates on 4-tuples (a,r,g,b)."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(l, tr), t) for l, tr, t in zip(L, TR, T))
    if mode == 6:
        return tuple(_avg2(l, tl) for l, tl in zip(L, TL))
    if mode == 7:
        return tuple(_avg2(l, t) for l, t in zip(L, T))
    if mode == 8:
        return tuple(_avg2(tl, t) for tl, t in zip(TL, T))
    if mode == 9:
        return tuple(_avg2(t, tr) for t, tr in zip(T, TR))
    if mode == 10:
        return tuple(
            _avg2(_avg2(l, tl), _avg2(t, tr))
            for l, tl, t, tr in zip(L, TL, T, TR)
        )
    if mode == 11:  # Select
        p = [l + t - tl for l, t, tl in zip(L, T, TL)]
        pL = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pT = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:  # ClampAddSubtractHalf
        ave = [_avg2(l, t) for l, t in zip(L, T)]
        return tuple(
            _clamp(a + int((a - tl) / 2)) for a, tl in zip(ave, TL)
        )
    raise ValueError(f"invalid predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-char product, arithmetic >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet for s in syms):
            raise ValueError("simple prefix symbol out of alphabet")
        return _PrefixCode.simple(syms)
    # normal: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


class _HuffGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br, cache_size):
        self.green = _read_prefix_code(br, 256 + 24 + cache_size)
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.dist = _read_prefix_code(br, 40)


def _decode_entropy_image(br, xsize, ysize, is_level0):
    """One entropy-coded ARGB image → list of (a,r,g,b) tuples, plus
    the transforms read at level 0 (callers apply inverses)."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                bw = (xsize + (1 << bits) - 1) >> bits
                bh = (ysize + (1 << bits) - 1) >> bits
                data, _ = _decode_entropy_image(br, bw, bh, False)
                transforms.append(("predictor", bits, data))
            elif ttype == 1:  # color
                bits = br.read(3) + 2
                bw = (xsize + (1 << bits) - 1) >> bits
                bh = (ysize + (1 << bits) - 1) >> bits
                data, _ = _decode_entropy_image(br, bw, bh, False)
                transforms.append(("color", bits, data))
            elif ttype == 2:
                transforms.append(("subtract_green",))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal_deltas, _ = _decode_entropy_image(br, pal_size, 1, False)
                palette = []
                prev = (0, 0, 0, 0)
                for d in pal_deltas:
                    prev = tuple((p + q) & 0xFF for p, q in zip(prev, d))
                    palette.append(prev)
                transforms.append(("palette", palette))
                if pal_size <= 2:
                    wb = 3
                elif pal_size <= 4:
                    wb = 2
                elif pal_size <= 16:
                    wb = 1
                else:
                    wb = 0
                if wb:
                    transforms[-1] = ("palette", palette, wb, xsize)
                    xsize = (xsize + (1 << wb) - 1) >> wb
                else:
                    transforms[-1] = ("palette", palette, 0, xsize)

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta, _ = _decode_entropy_image(br, mw, mh, False)
        n_groups = max(((p[1] << 8) | p[2]) for p in meta) + 1

    groups = [_HuffGroup(br, cache_size) for _ in range(n_groups)]
    cache = [(0, 0, 0, 0)] * cache_size

    n = xsize * ysize
    pixels: list[tuple] = []
    while len(pixels) < n:
        pos = len(pixels)
        if meta is not None:
            mx = (pos % xsize) >> meta_bits
            my = (pos // xsize) >> meta_bits
            mp = meta[my * ((xsize + (1 << meta_bits) - 1) >> meta_bits) + mx]
            g = groups[(mp[1] << 8) | mp[2]]
        else:
            g = groups[0]
        s = g.green.decode(br)
        if s < 256:
            # stream order after the green symbol: red, blue, alpha
            red = g.red.decode(br)
            blue = g.blue.decode(br)
            alpha = g.alpha.decode(br)
            px = (alpha, red, s, blue)
            pixels.append(px)
            if cache_size:
                argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
                cache[_hash_pixel(argb, cache_bits)] = px
        elif s < 256 + 24:
            length = _prefix_decode(s - 256, br)
            dist_code = _prefix_decode(g.dist.decode(br), br)
            dist = _plane_to_dist(dist_code, xsize)
            if dist > pos:
                raise ValueError("LZ77 distance reaches before image start")
            for _ in range(length):
                px = pixels[len(pixels) - dist]
                pixels.append(px)
                if cache_size:
                    argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
                    cache[_hash_pixel(argb, cache_bits)] = px
                if len(pixels) >= n:
                    break
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            pixels.append(cache[idx])
    return pixels, transforms


def _apply_inverse_transforms(pixels, transforms, xsize, ysize):
    """Inverse transforms in reverse order of their appearance.

    When a pixel-bundling color-indexing transform is present, the
    entropy-coded image — and every transform whose inverse runs
    BEFORE the palette inverse (i.e. read after it in the stream) —
    is at the packed width, so start there and let the palette
    branch restore the full width."""
    for t in transforms:
        if t[0] == "palette" and t[2]:
            xsize = (t[3] + (1 << t[2]) - 1) >> t[2]
            break
    for t in reversed(transforms):
        kind = t[0]
        if kind == "palette":
            _, palette, wb, full_w = t
            if wb:
                bits_per = 8 >> wb
                packed_w = (full_w + (1 << wb) - 1) >> wb
                out = []
                for y in range(ysize):
                    row = []
                    for px_i in range(packed_w):
                        green = pixels[y * packed_w + px_i][2]
                        for k in range(1 << wb):
                            if len(row) >= full_w:
                                break
                            idx = (green >> (k * bits_per)) & ((1 << bits_per) - 1)
                            if idx >= len(palette):
                                raise ValueError("palette index out of range")
                            row.append(palette[idx])
                    out.extend(row)
                pixels = out
                xsize = full_w
            else:
                res = []
                for p in pixels:
                    idx = p[2]
                    if idx >= len(palette):
                        raise ValueError("palette index out of range")
                    res.append(palette[idx])
                pixels = res
        elif kind == "subtract_green":
            pixels = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF) for a, r, g, b in pixels
            ]
        elif kind == "color":
            _, bits, data = t
            bw = (xsize + (1 << bits) - 1) >> bits
            out = []
            for pos, (a, r, g, b) in enumerate(pixels):
                x, y = pos % xsize, pos // xsize
                cte = data[(y >> bits) * bw + (x >> bits)]
                g2r, g2b, r2b = cte[3], cte[2], cte[1]  # blue, green, red ch
                nr = (r + _ct_delta(g2r, g)) & 0xFF
                nb = (b + _ct_delta(g2b, g)) & 0xFF
                nb = (nb + _ct_delta(r2b, nr)) & 0xFF
                out.append((a, nr, g, nb))
            pixels = out
        elif kind == "predictor":
            _, bits, data = t
            bw = (xsize + (1 << bits) - 1) >> bits
            out: list[tuple] = []
            for pos, resid in enumerate(pixels):
                x, y = pos % xsize, pos // xsize
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = out[pos - 1]  # L
                elif x == 0:
                    pred = out[pos - xsize]  # T
                else:
                    mode = data[(y >> bits) * bw + (x >> bits)][2]
                    L = out[pos - 1]
                    T = out[pos - xsize]
                    TL = out[pos - xsize - 1]
                    # TR is always the flat-buffer pixel one past T; at the
                    # rightmost column that wraps to the CURRENT row's
                    # leftmost pixel (libwebp keeps reading top_row[x+1],
                    # which in the contiguous buffer is row y's first pixel)
                    TR = out[pos - xsize + 1]
                    pred = _predict(mode, L, T, TL, TR)
                out.append(tuple((rc + pc) & 0xFF for rc, pc in zip(resid, pred)))
            pixels = out
        else:  # pragma: no cover
            raise ValueError(f"unknown transform {kind}")
    return pixels, xsize


def is_vp8l(data: bytes) -> bool:
    return (
        len(data) >= 21
        and data[:4] == b"RIFF"
        and data[8:12] == b"WEBP"
        and data[12:16] == b"VP8L"
    )


def vp8l_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Lossless WebP bytes → (width, height, channels, HxWxC uint8).

    channels is 4 when the stream carries non-opaque alpha, else 3."""
    if not is_vp8l(data):
        raise ValueError("not a lossless (VP8L) WebP")
    chunk_len = struct.unpack_from("<I", data, 16)[0]
    payload = data[20 : 20 + chunk_len]
    if len(payload) < chunk_len:
        raise ValueError("truncated VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    # the color-indexing transform reduces the coded width internally;
    # _decode_entropy_image tracks that itself before reading the
    # cache/meta/prefix sections, so the ORIGINAL width goes in here
    pixels, transforms = _decode_entropy_image(br, w, h, True)
    pixels, _ = _apply_inverse_transforms(pixels, transforms, w, h)
    if len(pixels) != w * h:
        raise ValueError("decoded pixel count mismatch")
    arr = np.array(pixels, dtype=np.uint8).reshape(h, w, 4)  # (a, r, g, b)
    rgba = arr[:, :, [1, 2, 3, 0]]
    if np.all(rgba[:, :, 3] == 255):
        return w, h, 3, np.ascontiguousarray(rgba[:, :, :3])
    return w, h, 4, np.ascontiguousarray(rgba)


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _cl_tokens(lengths: list[int]) -> list[tuple[int, int]]:
    """Code-length sequence → (cl_symbol, extra_bits_value) tokens per
    the spec's RLE: 16 repeats the previous NONZERO length 3–6 times,
    17 emits 3–10 zeros, 18 emits 11–138 zeros; literal lengths pass
    through as (length, -1).  Expansion is exactly what the decoder's
    16/17/18 branches reproduce."""
    toks: list[tuple[int, int]] = []
    i = 0
    n = len(lengths)
    while i < n:
        l = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == l:
            run += 1
        take = run
        if l == 0:
            while take >= 11:
                r = min(take, 138)
                toks.append((18, r - 11))
                take -= r
            while take >= 3:
                r = min(take, 10)
                toks.append((17, r - 3))
                take -= r
            toks.extend([(0, -1)] * take)
        else:
            # code 16 repeats the PREVIOUS nonzero length: the first
            # occurrence must be a literal, repeats may ride 16
            toks.append((l, -1))
            take -= 1
            while take >= 3:
                r = min(take, 6)
                toks.append((16, r - 3))
                take -= r
            toks.extend([(l, -1)] * take)
        i += run
    return toks


def _write_prefix_code(bw: _BitWriter, lengths: list[int], used: list[int]):
    """Emit a prefix code: simple form when ≤2 used 8-bit symbols,
    else the code-length-coded normal form with spec RLE (16 repeats
    the previous nonzero length, 17/18 zero runs) so every decoder
    branch is exercised by ordinary fixtures."""
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return None  # codes are implicit (0-bit or 1-bit)
    bw.write(0, 1)  # normal
    # truncate trailing zeros via max_symbol
    max_sym = max(s for s, l in enumerate(lengths) if l) + 1
    toks = _cl_tokens(lengths[:max_sym])
    if len(toks) < 2:
        # max_symbol's field floor is 2 READS; degenerate token lists
        # (can't happen with ≥3 used symbols, but stay safe) fall back
        # to literal-only emission
        toks = [(l, -1) for l in lengths[:max_sym]]
    cl_hist: dict[int, int] = {}
    for s, _extra in toks:
        cl_hist[s] = cl_hist.get(s, 0) + 1
    cl_lengths = _build_lengths(cl_hist, 19, limit=7)
    bw.write(15, 4)  # num_code_lengths = 19
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    # explicit max_symbol (use_length=1).  The spec counter limits CL
    # READS, not expanded symbols — with RLE one 17/18 token covers a
    # whole zero run, so the field is the TOKEN count
    bw.write(1, 1)
    field = len(toks) - 2
    nbits = max(2, (field.bit_length() + 1) & ~1)  # even, ≥2
    bw.write((nbits - 2) // 2, 3)
    bw.write(field, nbits)
    cl_codes = _canonical_codes(cl_lengths)
    cl_single = sum(1 for l in cl_lengths if l) == 1
    for s, extra in toks:
        if not cl_single:
            c, n = cl_codes[s]
            bw.write_code(c, n)
        if s == 16:
            bw.write(extra, 2)
        elif s == 17:
            bw.write(extra, 3)
        elif s == 18:
            bw.write(extra, 7)
    return None


class _SymbolWriter:
    """Canonical encoder counterpart of _PrefixCode."""

    def __init__(self, lengths: list[int] | None, simple_syms: list[int] | None):
        if simple_syms is not None:
            if len(simple_syms) == 1:
                self.codes = {simple_syms[0]: (0, 0)}
            else:
                self.codes = {simple_syms[0]: (0, 1), simple_syms[1]: (1, 1)}
        else:
            assert lengths is not None
            if sum(1 for l in lengths if l) == 1:
                sym = next(s for s, l in enumerate(lengths) if l)
                self.codes = {sym: (0, 0)}
            else:
                self.codes = _canonical_codes(lengths)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        c, n = self.codes[sym]
        if n:
            bw.write_code(c, n)


def _encode_channel_code(bw, hist: dict[int, int], alphabet: int) -> _SymbolWriter:
    used = sorted(s for s, n in hist.items() if n > 0)
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        _write_prefix_code(bw, [], used)
        return _SymbolWriter(None, used)
    lengths = _build_lengths(hist, alphabet)
    _write_prefix_code(bw, lengths, used)
    return _SymbolWriter(lengths, None)


def _encode_entropy_image(
    bw: _BitWriter,
    pixels: list[tuple],
    xsize: int,
    cache_bits: int = 0,
    lz77: bool = False,
    is_level0: bool = False,
    meta_bits: int | None = None,
    n_groups: int = 1,
) -> None:
    """Entropy-code an (a,r,g,b) pixel list: optional color cache,
    greedy run-length LZ77 (identical-neighbor runs, distance 1 or
    xsize so both the neighbor-map and direct distance paths are
    exercised), and — at level 0 — an optional meta-prefix entropy
    image assigning blocks to ``n_groups`` code groups checkerboard-
    style (each group trains its own five prefix codes)."""
    if meta_bits is not None and (lz77 or not is_level0):
        raise ValueError("meta groups compose with literals/cache only")
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    cache_size = (1 << cache_bits) if cache_bits else 0

    if meta_bits is not None:
        # group of pixel pos: checkerboard over meta blocks
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits

        def group_of(pos: int) -> int:
            bx = (pos % xsize) >> meta_bits
            by = (pos // xsize) >> meta_bits
            return (bx + by) % n_groups

        ysize = (len(pixels) + xsize - 1) // xsize
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_px = [
            (255, ((bx + by) % n_groups) >> 8, ((bx + by) % n_groups) & 0xFF, 0)
            for by in range(mh)
            for bx in range(mw)
        ]
        bw.write(1, 1)  # meta prefix image present
        bw.write(meta_bits - 2, 3)
        _encode_entropy_image(bw, meta_px, mw)
        groups = sorted({((p[1] << 8) | p[2]) for p in meta_px})
        n_codes = max(groups) + 1
        # per-group token planning: literals/cache only, global cache
        tokens = []
        cache = [(0, 0, 0, 0)] * cache_size
        for pos, px in enumerate(pixels):
            g = group_of(pos)
            if cache_size:
                a, r, gg, b = px
                argb = (a << 24) | (r << 16) | (gg << 8) | b
                hidx = _hash_pixel(argb, cache_bits)
                if cache[hidx] == px:
                    tokens.append((g, "cache", hidx))
                    continue
                cache[hidx] = px
            tokens.append((g, "lit", px))
        hists = [
            {"g": {}, "r": {}, "b": {}, "a": {}, "d": {0: 1}}
            for _ in range(n_codes)
        ]
        for t in tokens:
            hs = hists[t[0]]
            if t[1] == "lit":
                a, r, gg, b = t[2]
                for k, v in (("g", gg), ("r", r), ("b", b), ("a", a)):
                    hs[k][v] = hs[k].get(v, 0) + 1
            else:
                sym = 256 + 24 + t[2]
                hs["g"][sym] = hs["g"].get(sym, 0) + 1
        writers = []
        for hs in hists:
            for k in ("r", "b", "a"):
                if not hs[k]:
                    hs[k][0] = 1
            if not hs["g"]:
                hs["g"][0] = 1
            writers.append((
                _encode_channel_code(bw, hs["g"], 256 + 24 + cache_size),
                _encode_channel_code(bw, hs["r"], 256),
                _encode_channel_code(bw, hs["b"], 256),
                _encode_channel_code(bw, hs["a"], 256),
                _encode_channel_code(bw, hs["d"], 40),
            ))
        for t in tokens:
            gw, rw, bw_, aw, _dw = writers[t[0]]
            if t[1] == "lit":
                a, r, gg, b = t[2]
                gw.emit(bw, gg)
                rw.emit(bw, r)
                bw_.emit(bw, b)
                aw.emit(bw, a)
            else:
                gw.emit(bw, 256 + 24 + t[2])
        return

    # plan the token stream first (histograms must precede codes)
    tokens: list[tuple] = []
    cache = [(0, 0, 0, 0)] * cache_size
    i, n = 0, len(pixels)
    while i < n:
        px = pixels[i]
        if lz77 and i >= 1:
            run = 0
            dist = 1 if px == pixels[i - 1] else (
                xsize if i >= xsize and px == pixels[i - xsize] else 0
            )
            if dist:
                j = i
                while j < n and pixels[j] == pixels[j - dist]:
                    j += 1
                run = j - i
            if run >= 3:
                tokens.append(("copy", run, dist))
                if cache_size:
                    for k in range(i, i + run):
                        a, r, g, b = pixels[k]
                        argb = (a << 24) | (r << 16) | (g << 8) | b
                        cache[_hash_pixel(argb, cache_bits)] = pixels[k]
                i += run
                continue
        if cache_size:
            a, r, g, b = px
            argb = (a << 24) | (r << 16) | (g << 8) | b
            hidx = _hash_pixel(argb, cache_bits)
            if cache[hidx] == px:
                tokens.append(("cache", hidx))
                i += 1
                continue
            cache[hidx] = px
        tokens.append(("lit", px))
        i += 1

    gh: dict[int, int] = {}
    rh: dict[int, int] = {}
    bh: dict[int, int] = {}
    ah: dict[int, int] = {}
    dh: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            gh[g] = gh.get(g, 0) + 1
            rh[r] = rh.get(r, 0) + 1
            bh[b] = bh.get(b, 0) + 1
            ah[a] = ah.get(a, 0) + 1
        elif t[0] == "copy":
            lc, _, _ = _prefix_encode(t[1])
            gh[256 + lc] = gh.get(256 + lc, 0) + 1
            dcode = _dist_to_plane(t[2], xsize)
            dc, _, _ = _prefix_encode(dcode)
            dh[dc] = dh.get(dc, 0) + 1
        else:
            gh[256 + 24 + t[1]] = gh.get(256 + 24 + t[1], 0) + 1
    for h in (rh, bh, ah, dh):
        if not h:
            h[0] = 1  # never-used channel still needs a valid code

    if is_level0:
        bw.write(0, 1)  # no meta prefix image (single group); the bit
        # exists only at level 0 — subimages go straight to the codes
    green_w = _encode_channel_code(bw, gh, 256 + 24 + cache_size)
    red_w = _encode_channel_code(bw, rh, 256)
    blue_w = _encode_channel_code(bw, bh, 256)
    alpha_w = _encode_channel_code(bw, ah, 256)
    dist_w = _encode_channel_code(bw, dh, 40)

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            green_w.emit(bw, g)
            red_w.emit(bw, r)
            blue_w.emit(bw, b)
            alpha_w.emit(bw, a)
        elif t[0] == "copy":
            _, run, dist = t
            lc, le, ln = _prefix_encode(run)
            green_w.emit(bw, 256 + lc)
            bw.write(le, ln)
            dcode = _dist_to_plane(dist, xsize)
            dc, de, dn = _prefix_encode(dcode)
            dist_w.emit(bw, dc)
            bw.write(de, dn)
        else:
            green_w.emit(bw, 256 + 24 + t[1])


def _dist_to_plane(dist: int, xsize: int) -> int:
    """Inverse of _plane_to_dist: prefer a neighbor-map code."""
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if max(1, dy * xsize + dx) == dist:
            return i + 1
    return dist + 120


def vp8l_encode_lossless(
    px: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
    color_transform: tuple[int, int, int] | None = None,
    meta_groups: tuple[int, int] | None = None,
) -> bytes:
    """HxWx{1,3,4} uint8 → lossless WebP bytes.

    Fixture encoder: single prefix-code group, optional subtract-green
    / uniform-mode predictor / color-indexing transforms, optional
    color cache and run-LZ77 — enough to exercise every decoder path
    end-to-end while staying deterministic byte-for-byte."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
        ch = 3
    if ch == 3:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        px = np.concatenate([px, alpha], axis=2)
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions out of range")
    # (a, r, g, b) tuples
    pixels = [
        (int(px[y, x, 3]), int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0 if np.all(px[:, :, 3] == 255) else 1, 1)
    bw.write(0, 3)  # version

    xsize = w
    if palette:
        if subtract_green:
            raise ValueError("subtract-green over palette indices is pointless")
        uniq = sorted(set(pixels))
        if len(uniq) > 256:
            raise ValueError("too many colors for palette mode")
        pal_index = {p: i for i, p in enumerate(uniq)}
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(uniq) - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for p in uniq:
            deltas.append(tuple((pc - qc) & 0xFF for pc, qc in zip(p, prev)))
            prev = p
        _encode_entropy_image(bw, deltas, len(uniq))
        size = len(uniq)
        wb = 3 if size <= 2 else 2 if size <= 4 else 1 if size <= 16 else 0
        idx = [pal_index[p] for p in pixels]
        if wb:
            bits_per = 8 >> wb
            packed_w = (w + (1 << wb) - 1) >> wb
            packed = []
            for y in range(h):
                for bx in range(packed_w):
                    green = 0
                    for k in range(1 << wb):
                        x = bx * (1 << wb) + k
                        if x < w:
                            green |= idx[y * w + x] << (k * bits_per)
                    packed.append((255, 0, green, 0))
            pixels = packed
            xsize = packed_w
        else:
            pixels = [(255, 0, i, 0) for i in idx]
    if predictor_mode is not None:
        bits = 4  # 16x16 blocks — a single mode for all blocks
        bw.write(1, 1)
        bw.write(0, 2)  # predictor
        bw.write(bits - 2, 3)
        bww = (xsize + (1 << bits) - 1) >> bits
        bhh = (h + (1 << bits) - 1) >> bits
        _encode_entropy_image(
            bw, [(255, 0, predictor_mode, 0)] * (bww * bhh), bww
        )
        resid = []
        for pos, p in enumerate(pixels):
            x, y = pos % xsize, pos // xsize
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = pixels[pos - 1]
            elif x == 0:
                pred = pixels[pos - xsize]
            else:
                L = pixels[pos - 1]
                T = pixels[pos - xsize]
                TL = pixels[pos - xsize - 1]
                # mirror of the decoder: flat-buffer TR, wrapping to the
                # current row's leftmost pixel at the rightmost column
                TR = pixels[pos - xsize + 1]
                pred = _predict(predictor_mode, L, T, TL, TR)
            resid.append(tuple((pc - qc) & 0xFF for pc, qc in zip(p, pred)))
        pixels = resid
    if color_transform is not None:
        # one uniform ColorTransformElement for every block: forward
        # direction derived so the spec inverse (restore red first,
        # then blue using the RESTORED red) reconstructs exactly
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bits = 4
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(bits - 2, 3)
        bww = (xsize + (1 << bits) - 1) >> bits
        bhh = (h + (1 << bits) - 1) >> bits
        # element packing: blue ch = green_to_red, green = green_to_blue,
        # red = red_to_blue
        _encode_entropy_image(bw, [(255, r2b, g2b, g2r)] * (bww * bhh), bww)
        fwd = []
        for a, r, g, b in pixels:
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            fwd.append((a, nr, g, nb))
        pixels = fwd
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        pixels = [
            (a, (r - g) & 0xFF, g, (b - g) & 0xFF) for a, r, g, b in pixels
        ]
    bw.write(0, 1)  # end of transforms

    if meta_groups is not None:
        if lz77:
            raise ValueError("meta groups compose with literals/cache only")
        mb, ng = meta_groups
        _encode_entropy_image(
            bw, pixels, xsize, cache_bits=cache_bits, is_level0=True,
            meta_bits=mb, n_groups=ng,
        )
    else:
        _encode_entropy_image(
            bw, pixels, xsize, cache_bits=cache_bits, lz77=lz77, is_level0=True
        )

    payload = b"\x2f" + bw.getvalue()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff

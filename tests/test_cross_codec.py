"""Cross-codec differential: the SAME pixel content stored through
every lossless raster codec in the engine must decode to identical
arrays.  A systematic channel-order, row-order, or palette bug in one
codec cannot hide behind its own encoder here — the others disagree.
"""

from __future__ import annotations

import numpy as np
import pytest

from akvorado_spark.operators.gif import gif_decode, gif_encode
from akvorado_spark.operators.png import (
    bmp_decode,
    bmp_encode,
    png_decode,
    png_encode,
)
from akvorado_spark.operators.tiff import tiff_decode, tiff_encode
from akvorado_spark.operators.vp8l import vp8l_decode, vp8l_encode_lossless


def _codecs_rgb(px):
    yield "png", png_decode(png_encode(px))
    yield "png/interlaced", png_decode(png_encode(px, interlace=True))
    yield "bmp24", bmp_decode(bmp_encode(px, 24))
    yield "bmp24/topdown", bmp_decode(bmp_encode(px, 24, top_down=True))
    yield "tiff", tiff_decode(tiff_encode(px))
    yield "tiff/lzw+pred", tiff_decode(
        tiff_encode(px, compression="lzw", predictor=2, big_endian=True)
    )
    w, h, ch, got = vp8l_decode(vp8l_encode_lossless(px))
    yield "vp8l", (w, h, 3, got[:, :, :3])


def test_rgb_content_identical_across_codecs():
    rng = np.random.default_rng(91)
    for shape in ((5, 9), (8, 8), (7, 13)):
        px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for name, (w, h, ch, got) in _codecs_rgb(px):
            assert (w, h, ch) == (shape[1], shape[0], 3), name
            assert np.array_equal(got, px), name


def test_palette_content_identical_across_codecs():
    """≤16 distinct colors lets every palette-capable layout join:
    GIF, 4/8-bit BMP (both headers, RLE), sub-byte-capable TIFF gray
    path is excluded (different color model)."""
    rng = np.random.default_rng(92)
    cols = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    px = cols[rng.integers(0, 16, (9, 13))]
    outs = {
        "gif": gif_decode(gif_encode(px)),
        "gif/interlaced": gif_decode(gif_encode(px, interlace=True)),
        "bmp4": bmp_decode(bmp_encode(px, 4)),
        "bmp4/core": bmp_decode(bmp_encode(px, 4, core_header=True)),
        "bmp8/rle": bmp_decode(bmp_encode(px, 8, rle=True)),
        "png": png_decode(png_encode(px)),
        "tiff": tiff_decode(tiff_encode(px, compression="packbits")),
    }
    for name, (w, h, ch, got) in outs.items():
        assert (w, h, ch) == (13, 9, 3), name
        assert np.array_equal(got, px), name


def test_gray_content_identical_across_codecs():
    rng = np.random.default_rng(93)
    g = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    png_px = png_decode(png_encode(g))[3][:, :, 0]
    tiff_px = tiff_decode(tiff_encode(g))[3][:, :, 0]
    tiff_wz = tiff_decode(tiff_encode(g, white_is_zero=True))[3][:, :, 0]
    assert np.array_equal(png_px, g)
    assert np.array_equal(tiff_px, g)
    assert np.array_equal(tiff_wz, g)  # inversion convention round-trips


# ---------------------------------------------------------------------------
# generalized option-matrix sweep (r13, VERDICT r12 #4): seeded random
# images through every applicable (format x depth x compression x
# layout) combination, asserting pixel identity — plus an end-of-stream
# payload-length sweep across the LZW/RLE code-width boundary classes
# (the r12 tiled-TIFF bug class: encoder/decoder table-add desync at
# the final code's width).


def _seeded(shape, seed, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    hi = 65536 if dtype == np.uint16 else 256
    return rng.integers(0, hi, shape, dtype=dtype)


def _png_matrix(seed):
    from akvorado_spark.operators.png import png_meta

    h, w = 5 + seed % 3, 7 + seed % 4
    cases = []
    for ch in (1, 2, 3, 4):
        for dtype in (np.uint8, np.uint16):
            shape = (h, w) if ch == 1 else (h, w, ch)
            px = _seeded(shape, seed * 31 + ch, dtype)
            for interlace in (False, True):
                cases.append((f"png/ch{ch}/{dtype.__name__}/i{interlace:d}",
                              px, dict(filters=[(seed + y) % 5 for y in range(h)],
                                       interlace=interlace)))
    for blob_name, px, kw in cases:
        blob = png_encode(px.copy(), **kw)
        dw, dh, dch, got = png_decode(blob)
        want = px if px.ndim == 3 else px[:, :, None]
        assert (dw, dh, dch) == (w, h, want.shape[2]), blob_name
        assert np.array_equal(got, want), blob_name
        assert png_meta(blob) == (dw, dh, dch), blob_name
    # sub-byte gray: the decoder scales to 0..255 by the exact factor
    for depth in (1, 2, 4):
        vals = _seeded((h, w), seed * 7 + depth) % (1 << depth)
        blob = png_encode(vals.astype(np.uint8), bit_depth=depth)
        _, _, _, got = png_decode(blob)
        assert np.array_equal(got[:, :, 0], vals * (255 // ((1 << depth) - 1))), depth


def _tiff_matrix(seed):
    from akvorado_spark.operators.tiff import tiff_meta

    h, w = 6 + seed % 2, 9 - seed % 3
    imgs = {
        "g8": _seeded((h, w), seed), "g16": _seeded((h, w), seed + 1, np.uint16),
        "rgb8": _seeded((h, w, 3), seed + 2),
        "rgb16": _seeded((h, w, 3), seed + 3, np.uint16),
        "rgba8": _seeded((h, w, 4), seed + 4),
    }
    for name, px in imgs.items():
        want = px if px.ndim == 3 else px[:, :, None]
        for be in (False, True):
            for comp in ("none", "lzw", "packbits"):
                for pred in (1, 2):
                    for layout in ({"rows_per_strip": 2}, {"tile": (5, 4)}):
                        blob = tiff_encode(px, big_endian=be, compression=comp,
                                           predictor=pred, **layout)
                        dw, dh, dch, got = tiff_decode(blob)
                        tag = (name, be, comp, pred, tuple(layout))
                        assert (dw, dh, dch) == (w, h, want.shape[2]), tag
                        assert np.array_equal(got, want), tag
                        # meta walk agrees with pixel decode everywhere
                        assert tiff_meta(blob) == (dw, dh, dch), tag
        if name.startswith("g"):
            blob = tiff_encode(px, white_is_zero=True, compression="lzw")
            assert np.array_equal(tiff_decode(blob)[3], want), name


def _bmp_matrix(seed):
    from akvorado_spark.operators.png import bmp_meta

    h, w = 5 + seed % 3, 8 - seed % 2
    rng = np.random.default_rng(seed + 40)
    for bits, ncol in ((1, 2), (4, 16), (8, 200)):
        cols = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        px = cols[rng.integers(0, ncol, (h, w))]
        variants = [dict(), dict(core_header=True)]
        if bits != 1:
            variants.append(dict(rle=True))
        if bits == 8:
            variants.append(dict(top_down=True))
        for kw in variants:
            blob = bmp_encode(px, bits, **kw)
            dw, dh, dch, got = bmp_decode(blob)
            assert (dw, dh) == (w, h) and np.array_equal(got[:, :, :3], px), (bits, kw)
            assert bmp_meta(blob) == (dw, dh, dch), (bits, kw)
    for bits in (24, 32):
        px = _seeded((h, w, 3), seed + bits)
        for td in (False, True):
            blob = bmp_encode(px, bits, top_down=td)
            dw, dh, dch, got = bmp_decode(blob)
            assert np.array_equal(got[:, :, :3], px), (bits, td)
            # fixture 32-bit writes alpha=255, so header claim == decode
            assert bmp_meta(blob) == (dw, dh, dch), (bits, td)


def _gif_matrix(seed):
    from akvorado_spark.operators.gif import gif_meta

    h, w = 4 + seed % 3, 6 + seed % 4
    rng = np.random.default_rng(seed + 60)
    for ncol in (2, 4, 16, 256):
        cols = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        # make rows unique so palettes stay within ncol
        px = cols[rng.integers(0, ncol, (h, w))]
        for interlace in (False, True):
            blob = gif_encode(px, interlace=interlace)
            dw, dh, dch, got = gif_decode(blob)
            assert (dw, dh, dch) == (w, h, 3), (ncol, interlace)
            assert np.array_equal(got, px), (ncol, interlace)
            assert gif_meta(blob) == (dw, dh, dch), (ncol, interlace)


def _vp8l_matrix(seed):
    h, w = 4 + seed % 2, 5 + seed % 3
    px = _seeded((h, w, 3), seed + 80)
    from akvorado_spark.operators.png import webp_meta

    for kw in (dict(), dict(subtract_green=True), dict(cache_bits=3),
               dict(lz77=True), dict(predictor_mode=2),
               dict(color_transform=(3, 2, 1))):
        blob = vp8l_encode_lossless(px, **kw)
        dw, dh, dch, got = vp8l_decode(blob)
        assert (dw, dh) == (w, h) and np.array_equal(got[:, :, :3], px), kw
        # dims always agree; channels may legally diverge on the
        # alpha-HINT bit (documented in decode_image), so only bound it
        mw, mh, mch = webp_meta(blob)
        assert (mw, mh) == (dw, dh) and mch in (3, 4), kw


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_option_matrix_identity_all_formats(seed):
    """Every (format x depth x compression x layout x byte-order)
    combination the encoders expose, on seeded random content: decode
    must reproduce the input exactly.  ~400 roundtrips per seed."""
    _png_matrix(seed)
    _tiff_matrix(seed)
    _bmp_matrix(seed)
    _gif_matrix(seed)
    _vp8l_matrix(seed)


def test_jpeg_dc_exact_cross_consistency():
    """JPEG joins the differential where it is exact: block-uniform
    gray at all-ones quant is DC-only, so baseline decode equals the
    source AND equals the same pixels through the lossless codecs."""
    from akvorado_spark.operators.jpeg import jpeg_decode, jpeg_encode_baseline

    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    got = jpeg_decode(jpeg_encode_baseline(px))[3][:, :, 0]
    assert np.array_equal(got, px)
    assert np.array_equal(png_decode(png_encode(px))[3][:, :, 0], px)
    assert np.array_equal(tiff_decode(tiff_encode(px))[3][:, :, 0], px)


def test_end_of_stream_boundary_length_sweep():
    """Payload lengths swept across the LZW code-width and RLE escape
    boundary classes: the r12 bug class was an encoder/decoder
    table-add desync visible ONLY when the stream ends exactly at a
    width transition.  One-row images make the length the only
    variable; 250..260 crosses the GIF 9-bit and TIFF early-change
    boundaries, 505..515 the next table fill band."""
    lengths = list(range(1, 34)) + list(range(250, 261)) + list(range(505, 516))
    rng = np.random.default_rng(17)
    for n in lengths:
        g = rng.integers(0, 4, (1, n), dtype=np.uint8)  # 4 roots: min_code 2
        cols = np.array([[0, 0, 0], [80, 1, 2], [160, 3, 4], [240, 5, 6]],
                        dtype=np.uint8)
        px = cols[g[0]].reshape(1, n, 3)
        assert np.array_equal(gif_decode(gif_encode(px))[3], px), ("gif", n)
        assert np.array_equal(
            tiff_decode(tiff_encode(g, compression="lzw"))[3][:, :, 0], g), ("tlzw", n)
        assert np.array_equal(
            tiff_decode(tiff_encode(g, compression="lzw", predictor=2))[3][:, :, 0],
            g), ("tlzwp", n)
        assert np.array_equal(
            tiff_decode(tiff_encode(g, compression="packbits"))[3][:, :, 0], g
        ), ("tpb", n)
        full = (g * 60).astype(np.uint8)
        rgbpal = np.repeat(full[0][:, None], 3, axis=1).reshape(1, n, 3)
        assert np.array_equal(
            bmp_decode(bmp_encode(rgbpal, 8, rle=True))[3][:, :, :3], rgbpal
        ), ("brle", n)

"""Cross-codec differential: the SAME pixel content stored through
every lossless raster codec in the engine must decode to identical
arrays.  A systematic channel-order, row-order, or palette bug in one
codec cannot hide behind its own encoder here — the others disagree.
"""

from __future__ import annotations

import numpy as np

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

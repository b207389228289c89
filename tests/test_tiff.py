"""Baseline TIFF codec: both byte orders, strip heights, photometrics,
alpha, loud failures on corrupt/unsupported streams, stable encoder."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from akvorado_spark.operators.tiff import (
    is_tiff,
    tiff_decode,
    tiff_encode,
    tiff_meta,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_both_endians_and_strip_heights():
    px = _rand((9, 7, 3), 1)
    for big in (False, True):
        for rps in (None, 1, 2, 4, 9, 100):
            blob = tiff_encode(px, big_endian=big, rows_per_strip=rps)
            assert is_tiff(blob)
            assert tiff_meta(blob) == (7, 9, 3)
            w, h, ch, got = tiff_decode(blob)
            assert (w, h, ch) == (7, 9, 3)
            assert np.array_equal(got, px), (big, rps)


def test_grayscale_both_photometrics_and_rgba():
    g = _rand((5, 11), 2)
    for wz in (False, True):
        blob = tiff_encode(g, white_is_zero=wz)
        w, h, ch, got = tiff_decode(blob)
        assert (w, h, ch) == (11, 5, 1)
        assert np.array_equal(got[:, :, 0], g), wz  # inversion round-trips
    rgba = _rand((4, 6, 4), 3)
    w, h, ch, got = tiff_decode(tiff_encode(rgba, rows_per_strip=3))
    assert ch == 4 and np.array_equal(got, rgba)
    assert tiff_meta(tiff_encode(rgba)) == (6, 4, 4)


def test_roundtrip_compressions_and_predictor():
    """LZW (TIFF variant: MSB-first, EARLY width change) and PackBits,
    with and without horizontal differencing, across strip heights and
    byte orders — all byte-exact."""
    rng = np.random.default_rng(11)
    # low-entropy bands force long LZW/PackBits runs; noise forces
    # literal paths; enough pixels to push LZW past 9-bit codes
    px = np.tile(rng.integers(0, 256, (1, 40, 3), dtype=np.uint8), (30, 1, 1))
    px[10:20] = rng.integers(0, 256, (10, 40, 3), dtype=np.uint8)
    px[25:] = 7  # constant block → repeat runs
    for comp in ("lzw", "packbits"):
        for pred in (1, 2):
            for big in (False, True):
                blob = tiff_encode(px, big_endian=big, rows_per_strip=7,
                                   compression=comp, predictor=pred)
                w, h, ch, got = tiff_decode(blob)
                assert np.array_equal(got, px), (comp, pred, big)
    # grayscale WhiteIsZero + LZW + predictor composes too
    g = _rand((9, 13), 12)
    blob = tiff_encode(g, white_is_zero=True, compression="lzw", predictor=2)
    assert np.array_equal(tiff_decode(blob)[3][:, :, 0], g)


def test_tiff_lzw_width_growth_and_reset():
    """>3836 novel substrings force the 12-bit ceiling and a mid-stream
    Clear; the early-change schedule must stay in sync through it."""
    from akvorado_spark.operators.tiff import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.default_rng(13)
    raw = bytes(rng.integers(0, 256, 60_000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(raw), len(raw)) == raw
    runs = b"".join(bytes([i % 7]) * (i % 19 + 1) for i in range(3000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs), len(runs)) == runs


def test_packbits_primitives():
    from akvorado_spark.operators.tiff import (
        _packbits_decode,
        _packbits_encode,
    )

    for raw in (b"", b"\x07", b"aaaa", b"abcabc", b"a" * 300,
                b"ab" + b"c" * 130 + b"de", bytes(range(256)) * 3):
        assert _packbits_decode(_packbits_encode(raw), len(raw)) == raw
    # spec no-op byte (-128) is skipped
    assert _packbits_decode(b"\x80\x00x", 1) == b"x"
    with pytest.raises(ValueError):
        _packbits_decode(b"\x05ab", 10)  # truncated literal run


def test_unsupported_and_corrupt_rejected():
    px = _rand((4, 4, 3), 4)
    good = bytearray(tiff_encode(px))
    with pytest.raises(ValueError):
        tiff_decode(b"XXXX" + bytes(good[4:]))
    with pytest.raises(ValueError):
        tiff_decode(bytes(good[:-10]))  # truncated strip
    # compression tag (259) flipped to old-JPEG=6 → declared unsupported
    # (find the IFD entry and patch its inline SHORT value)
    (n,) = struct.unpack_from("<H", good, 8)
    for i in range(n):
        e = 10 + 12 * i
        tag = struct.unpack_from("<H", good, e)[0]
        if tag == 259:
            struct.pack_into("<H", good, e + 8, 6)
    with pytest.raises(NotImplementedError):
        tiff_decode(bytes(good))


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(4, 80), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_bitflip_corruption_never_hangs_or_crashes_unsafely(pos, bit, seed):
    px = _rand((5, 6, 3), seed)
    if seed % 3 == 0:  # rotate the 16-bit path through the fuzz too
        px = (px.astype(np.uint16) * 257).astype(np.uint16)
    blob = bytearray(tiff_encode(px, big_endian=bool(seed % 2),
                                 rows_per_strip=1 + seed % 5))
    if pos >= len(blob):
        pos = len(blob) - 1
    blob[pos] ^= 1 << bit
    try:
        w, h, ch, got = tiff_decode(bytes(blob))
        assert got.shape == (h, w, ch)
    except (ValueError, NotImplementedError):
        pass


def test_encode_golden_is_stable():
    px = (np.arange(6 * 5 * 3, dtype=np.uint64).reshape(5, 6, 3) * 29 % 256).astype(np.uint8)
    blob = tiff_encode(px, big_endian=True, rows_per_strip=2)
    w, h, ch, got = tiff_decode(blob)
    assert np.array_equal(got, px)
    assert hashlib.sha256(blob).hexdigest() == hashlib.sha256(
        tiff_encode(px, big_endian=True, rows_per_strip=2)
    ).hexdigest()


def test_image_features_and_decode_image_handle_tiff(spark):
    from akvorado_spark.operators.multimodal import decode_image, image_features

    px = np.zeros((3, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 7
    px[:, :, 1] = 70
    px[:, :, 2] = 200
    df = spark.createDataFrame(
        [(9, bytearray(tiff_encode(px)))], "doc_id long, media binary"
    )
    meta = decode_image(df).collect()[0]
    assert (meta["width"], meta["height"], meta["channels"], meta["format"]) == (
        4, 3, 3, "TIFF",
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (4, 3, 3)
    assert row["mean"] == [7.0, 70.0, 200.0]


def test_16bit_roundtrips_all_codecs_and_orders():
    """16-bit samples: stored in the file byte order, differenced as
    sample values (spec §14), inverted against 65535 for WhiteIsZero —
    all integer-exact round-trips returning native uint16."""
    rng = np.random.default_rng(21)
    g16 = rng.integers(0, 1 << 16, (6, 9), dtype=np.uint16)
    for big in (False, True):
        for comp in ("none", "lzw", "packbits"):
            for pred in (1, 2):
                blob = tiff_encode(g16, big_endian=big, rows_per_strip=2,
                                   compression=comp, predictor=pred)
                assert tiff_meta(blob) == (9, 6, 1)
                w, h, ch, got = tiff_decode(blob)
                assert got.dtype == np.uint16
                assert np.array_equal(got[:, :, 0], g16), (big, comp, pred)
    # WhiteIsZero inverts against the 16-bit ceiling
    blob = tiff_encode(g16, white_is_zero=True, compression="lzw", predictor=2)
    assert np.array_equal(tiff_decode(blob)[3][:, :, 0], g16)
    # 16-bit RGB (chunky) too
    rgb16 = rng.integers(0, 1 << 16, (4, 5, 3), dtype=np.uint16)
    w, h, ch, got = tiff_decode(tiff_encode(rgb16, big_endian=True, predictor=2))
    assert (w, h, ch) == (5, 4, 3) and np.array_equal(got, rgb16)


def test_16bit_predictor_wraps_mod_65536_not_per_byte():
    """A 0 → 65535 step differences to 65535 (= -1 mod 2^16); a per-byte
    cumsum would corrupt the high byte on the way back."""
    g = np.array([[0, 65535, 0, 1]], dtype=np.uint16)
    for big in (False, True):
        got = tiff_decode(tiff_encode(g, big_endian=big, predictor=2))[3]
        assert got[0, :, 0].tolist() == [0, 65535, 0, 1]


def test_mixed_bit_depths_rejected():
    """BitsPerSample [8,8,16] is not a layout this decoder claims."""
    blob = bytearray(tiff_encode(_rand((3, 3, 3), 5)))
    # tag 258 count=3 SHORTs (6 bytes) lives in the overflow area; its
    # IFD value field holds the offset
    (n,) = struct.unpack_from("<H", blob, 8)
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack_from("<H", blob, e)[0] == 258:
            off = struct.unpack_from("<I", blob, e + 8)[0]
            struct.pack_into("<H", blob, off + 4, 16)  # third sample → 16
    with pytest.raises(NotImplementedError):
        tiff_decode(bytes(blob))


def test_irrelevant_tag_with_bad_offset_is_tolerated():
    """An unconsumed tag (ExtraSamples=338 here) whose value offset
    points past EOF must not reject a decodable file (ADVICE r11);
    the same corruption on a consumed tag still fails loudly."""
    px = _rand((3, 4, 4), 6)
    blob = bytearray(tiff_encode(px))
    (n,) = struct.unpack_from("<H", blob, 8)
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack_from("<H", blob, e)[0] == 338:
            # count 4 SHORTs → 8 bytes → value field becomes an offset;
            # point it far past EOF
            struct.pack_into("<I", blob, e + 4, 4)
            struct.pack_into("<I", blob, e + 8, 0xFFFFFF0)
    w, h, ch, got = tiff_decode(bytes(blob))
    assert np.array_equal(got, px)
    # consumed tag (279 StripByteCounts) with the same corruption raises
    blob2 = bytearray(tiff_encode(px, rows_per_strip=1))
    (n,) = struct.unpack_from("<H", blob2, 8)
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack_from("<H", blob2, e)[0] == 279:
            struct.pack_into("<I", blob2, e + 8, 0xFFFFFF0)
    with pytest.raises(ValueError):
        tiff_decode(bytes(blob2))


def test_tiled_layout_roundtrips():
    """Tiled TIFF (spec §15, r12): zero-padded edge tiles, per-tile
    compression and per-tile predictor restart, both byte orders and
    depths — integer-exact round-trips with the strip path."""
    rng = np.random.default_rng(55)
    for depth, dt in ((8, np.uint8), (16, np.uint16)):
        for samples in (1, 3):
            for comp in ("none", "lzw", "packbits"):
                for shape, tile in (((9, 13), (16, 16)), ((20, 33), (16, 16)),
                                    ((7, 40), (32, 16))):
                    px = rng.integers(0, 1 << depth, (*shape, samples)).astype(dt)
                    inp = px[:, :, 0] if samples == 1 else px
                    blob = tiff_encode(inp, compression=comp, predictor=2,
                                       big_endian=(depth == 16), tile=tile)
                    w, h, ch, got = tiff_decode(blob)
                    assert (w, h, ch) == (shape[1], shape[0], samples)
                    assert np.array_equal(got.reshape(px.shape), px), (depth, samples, comp, shape)
    # tiled output must equal the strip encoding of the same pixels
    px = _rand((11, 19, 3), 56)
    a = tiff_decode(tiff_encode(px, rows_per_strip=4))[3]
    b = tiff_decode(tiff_encode(px, tile=(16, 16)))[3]
    assert np.array_equal(a, b)
    # truncated tile data fails loudly
    blob = bytearray(tiff_encode(px, tile=(16, 16)))
    with pytest.raises(ValueError):
        tiff_decode(bytes(blob[:-20]))


def test_lzw_end_of_stream_width_boundary():
    """Regression (r12): a stream whose FINAL data symbol lands exactly
    on the early-change boundary desynced EOI by one bit-width — the
    decoder adds a table entry after the last symbol and widens, so
    the encoder must account for that virtual add before writing EOI.
    Sweeping payload lengths across the 9→10 and 10→11 boundaries
    covers the crossing deterministically."""
    from akvorado_spark.operators.tiff import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    for L in list(range(240, 268)) + list(range(740, 790)):
        raw = bytes((i * 7 + (i * i) // 5) % 256 for i in range(L))
        assert _tiff_lzw_decode(_tiff_lzw_encode(raw), L) == raw, L

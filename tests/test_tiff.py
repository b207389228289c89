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


def test_unsupported_and_corrupt_rejected():
    px = _rand((4, 4, 3), 4)
    good = bytearray(tiff_encode(px))
    with pytest.raises(ValueError):
        tiff_decode(b"XXXX" + bytes(good[4:]))
    with pytest.raises(ValueError):
        tiff_decode(bytes(good[:-10]))  # truncated strip
    # compression tag (259) flipped to LZW=5 → declared unsupported
    # (find the IFD entry and patch its inline SHORT value)
    (n,) = struct.unpack_from("<H", good, 8)
    for i in range(n):
        e = 10 + 12 * i
        tag = struct.unpack_from("<H", good, e)[0]
        if tag == 259:
            struct.pack_into("<H", good, e + 8, 5)
    with pytest.raises(NotImplementedError):
        tiff_decode(bytes(good))


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(4, 80), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_bitflip_corruption_never_hangs_or_crashes_unsafely(pos, bit, seed):
    px = _rand((5, 6, 3), seed)
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

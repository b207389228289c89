"""GIF LZW codec: roundtrips across palette sizes / interlace /
transparency / table-full resets, hand-built partial-frame compose,
loud failures on corrupt streams, and a byte-stable encoder."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from akvorado_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
    gif_meta,
    is_gif,
)


def _palette_image(ncol: int, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return colors[rng.integers(0, ncol, (h, w))]


def test_lzw_primitive_roundtrip_with_table_growth():
    """10k symbols over 32 roots pushes the code width past 9 bits;
    an adversarial low min-code with high-entropy data forces the
    4096-entry reset path."""
    rng = np.random.default_rng(1)
    for min_code, n_sym, n in ((5, 32, 10_000), (2, 4, 60_000), (8, 256, 5_000)):
        seq = [int(v) for v in rng.integers(0, n_sym, n)]
        assert _lzw_decode(_lzw_encode(seq, min_code), min_code, n) == seq


def test_roundtrip_palette_sizes_and_interlace():
    for ncol in (2, 3, 16, 17, 200, 256):
        px = _palette_image(ncol, 11, 13, ncol)
        for interlace in (False, True):
            blob = gif_encode(px, interlace=interlace)
            assert is_gif(blob)
            w, h, ch, got = gif_decode(blob)
            assert (w, h, ch) == (13, 11, 3)
            assert np.array_equal(got, px), (ncol, interlace)


def test_interlace_row_order_actually_differs():
    """Same pixels, interlace on/off → different bytes, same decode
    (guards against an encoder that sets the flag but doesn't permute)."""
    px = _palette_image(8, 9, 5, 3)
    a, b = gif_encode(px), gif_encode(px, interlace=True)
    assert a != b
    assert np.array_equal(gif_decode(a)[3], gif_decode(b)[3])


def test_transparency_reports_rgba():
    px = np.zeros((4, 5, 3), dtype=np.uint8)
    px[1:3, 1:4] = (10, 200, 30)
    blob = gif_encode(px, transparent_color=(0, 0, 0))
    assert blob[:6] == b"GIF89a"
    assert gif_meta(blob)[2] == 4
    w, h, ch, got = gif_decode(blob)
    assert (w, h, ch) == (5, 4, 4)
    assert np.array_equal(got[:, :, :3], px)
    assert got[0, 0, 3] == 0 and got[1, 1, 3] == 255
    # the opaque encoding of the same pixels stays 3-channel GIF87a
    opaque = gif_encode(px)
    assert opaque[:6] == b"GIF87a" and gif_decode(opaque)[2] == 3


def test_partial_frame_composes_onto_background():
    """Hand-built stream: 3x3 screen, bg color index 1, one 1x2 frame
    at (1, 1) — the canvas fills with bg and the frame blits in."""
    palette = bytes((255, 0, 0, 0, 255, 0))  # 0=red (frame), 1=green (bg)
    lzw = _lzw_encode([0, 0], 2)
    blob = (
        b"GIF87a" + struct.pack("<HH", 3, 3) + bytes([0x80, 1, 0]) + palette
        + bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 1, 2) + bytes([0, 2])
        + bytes([len(lzw)]) + lzw + bytes([0, 0x3B])
    )
    w, h, ch, got = gif_decode(blob)
    assert (w, h, ch) == (3, 3, 3)
    assert got[0, 0].tolist() == [0, 255, 0]  # background
    assert got[1, 1].tolist() == [255, 0, 0]  # frame pixel
    assert got[2, 1].tolist() == [255, 0, 0]
    assert got[2, 2].tolist() == [0, 255, 0]


def test_corrupt_streams_raise_value_error():
    px = _palette_image(16, 8, 8, 7)
    blob = bytearray(gif_encode(px))
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF" + bytes(blob[7:]))
    with pytest.raises(ValueError):
        gif_decode(bytes(blob[:20]))  # truncated mid color table
    # trailer with no image descriptor
    with pytest.raises(ValueError):
        gif_decode(
            b"GIF87a" + struct.pack("<HH", 1, 1) + bytes([0x80, 0, 0])
            + bytes(6) + bytes([0x3B])
        )
    # frame rect outside the screen
    bad = (
        b"GIF87a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + bytes(6)
        + bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 2, 2) + bytes([0, 2, 0, 0x3B])
    )
    with pytest.raises(ValueError):
        gif_decode(bad)


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(13, 120), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_bitflip_corruption_never_hangs_or_crashes_unsafely(pos, bit, seed):
    """Any single bit flip either still decodes (palette/pixel flips can
    be legal) or raises ValueError — never an unbounded loop, raw
    IndexError, or numpy crash."""
    px = _palette_image(4 + seed % 60, 7, 9, seed)
    blob = bytearray(gif_encode(px, interlace=bool(seed % 2)))
    if pos >= len(blob):
        pos = len(blob) - 1
    blob[pos] ^= 1 << bit
    try:
        w, h, ch, got = gif_decode(bytes(blob))
        assert got.shape[0] == h and got.shape[1] == w
    except (ValueError, NotImplementedError):
        pass


def test_encode_golden_is_stable():
    """The oracle gate depends on the encoder staying deterministic."""
    px = (np.arange(9 * 7, dtype=np.uint64).reshape(7, 9) * 31 % 256).astype(
        np.uint8
    )
    blob = gif_encode(px, interlace=True)
    w, h, ch, got = gif_decode(blob)
    assert np.array_equal(got, np.repeat(px[:, :, None], 3, axis=2))
    assert (
        hashlib.sha256(blob).hexdigest()
        == hashlib.sha256(gif_encode(px, interlace=True)).hexdigest()
    )


def test_image_features_decodes_gif(spark):
    from akvorado_spark.operators.multimodal import image_features

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 12
    px[:, :, 1] = 34
    px[:, :, 2] = 56
    blob = gif_encode(px)
    df = spark.createDataFrame([(3, bytearray(blob))], "doc_id long, media binary")
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (6, 4, 3)
    assert row["mean"] == [12.0, 34.0, 56.0]


def test_animated_gif_decodes_first_frame_only():
    """Two image descriptors (animation): decode returns frame 1 and
    ignores the rest — the document image, not the animation."""
    palette = bytes((255, 0, 0, 0, 0, 255))  # 0=red, 1=blue
    f1 = _lzw_encode([0, 0, 0, 0], 2)
    f2 = _lzw_encode([1, 1, 1, 1], 2)
    blob = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + palette
        + bytes([0x21, 0xF9, 4, 0x00, 5, 0, 0, 0])  # GCE, no transparency
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0, 2])
        + bytes([len(f1)]) + f1 + bytes([0])
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0, 2])
        + bytes([len(f2)]) + f2 + bytes([0, 0x3B])
    )
    w, h, ch, got = gif_decode(blob)
    assert (w, h, ch) == (2, 2, 3)
    assert (got == [255, 0, 0]).all()  # frame 1 (red), frame 2 untouched
    assert gif_meta(blob) == (2, 2, 3)
    # the animation API sees BOTH frames of the same blob (r13)
    from akvorado_spark.operators.gif import gif_decode_frames, gif_frame_count

    assert gif_frame_count(blob) == 2
    _, _, frames = gif_decode_frames(blob)
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all() and (frames[1] == [0, 0, 255]).all()


def test_truncated_gce_meta_agrees_with_decode():
    """A GCE body shorter than 4 bytes carries no usable transparent
    index: gif_meta and gif_decode must BOTH report 3 channels (ADVICE
    r11 — meta used a >=1 guard and disagreed with decode)."""
    palette = bytes((255, 0, 0, 0, 0, 255))  # 0=red, 1=blue
    lzw = _lzw_encode([0, 0, 0, 0], 2)
    blob = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + palette
        # GCE with a 1-byte body whose transparency flag IS set
        + bytes([0x21, 0xF9, 1, 0x01, 0])
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0, 2])
        + bytes([len(lzw)]) + lzw + bytes([0, 0x3B])
    )
    assert gif_meta(blob)[2] == 3
    assert gif_decode(blob)[2] == 3


def test_partial_frame_background_uses_global_table():
    """The background color index is defined against the GLOBAL color
    table even when the frame carries a local one (ADVICE r11): GCT
    0=red 1=green with bg=1, frame LCT 0=blue 1=white — background
    pixels must be green (gct[1]), never white (lct[1])."""
    gct = bytes((255, 0, 0, 0, 255, 0))  # 0=red, 1=green
    lct = bytes((0, 0, 255, 255, 255, 255))  # 0=blue, 1=white
    lzw = _lzw_encode([0], 2)
    blob = (
        b"GIF87a" + struct.pack("<HH", 2, 2) + bytes([0x80, 1, 0]) + gct
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 1, 1)
        + bytes([0x80]) + lct + bytes([2])
        + bytes([len(lzw)]) + lzw + bytes([0, 0x3B])
    )
    w, h, ch, got = gif_decode(blob)
    assert got[0, 0].tolist() == [0, 0, 255]  # frame pixel from the LCT
    assert got[1, 1].tolist() == [0, 255, 0]  # background from the GCT


def test_lzw_end_of_stream_width_boundary():
    """Same end-of-stream fix as the TIFF LZW encoder (r12): the GIF
    decoder grows its table after the final data symbol and may widen
    before reading EOI — sweep lengths across code-width boundaries at
    several minimum code sizes."""
    for mc, mod in ((8, 256), (4, 16), (2, 4)):
        for L in list(range(1, 80)) + list(range(240, 270)) + list(range(500, 560)):
            idx = [(i * 5 + (i * i) // 7) % mod for i in range(L)]
            got = _lzw_decode(_lzw_encode(idx, mc), mc, len(idx))
            assert got == idx, (mc, L)


# ---------------------------------------------------------------------------
# animation: multi-frame composition with disposal methods (r13)


def _anim_palette() -> np.ndarray:
    i = np.arange(256)
    return np.stack([i, (2 * i) % 256, (3 * i) % 256], axis=1).astype(np.uint8)


def _three_frame_blob(disposal1: int) -> tuple[bytes, list[np.ndarray], int, int]:
    """Fixture: full F0 (keep) → partial transparent-checker F1 with
    the given disposal → top-row F2; returns the blob and an
    INDEPENDENT numpy composition (no codec involvement)."""
    from akvorado_spark.operators.gif import gif_encode_frames

    pal = _anim_palette()
    sw, sh, bg = 6, 5, 9
    f0 = np.arange(sh * sw).reshape(sh, sw) % 254
    f1 = (np.arange(3 * 4).reshape(3, 4) * 7) % 254
    checker = np.indices(f1.shape).sum(axis=0) % 2 == 0
    f1t = np.where(checker, 255, f1)
    f2 = ((np.arange(sw) * 11) % 254).reshape(1, sw)
    blob = gif_encode_frames(
        (sw, sh), pal,
        [dict(idx=f0, disposal=1),
         dict(idx=f1t, left=1, top=1, disposal=disposal1, transparent=255),
         dict(idx=f2, disposal=0)],
        bg_index=bg,
    )
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = pal[bg]
    exp = []
    canvas[:] = pal[f0]
    exp.append(canvas.copy())
    saved = canvas.copy()
    reg = canvas[1:4, 1:5]
    reg[~checker] = pal[f1][~checker]
    exp.append(canvas.copy())
    if disposal1 == 2:
        canvas[1:4, 1:5] = pal[bg]
    elif disposal1 == 3:
        canvas = saved
    canvas[0:1, :] = pal[f2]
    exp.append(canvas.copy())
    return blob, exp, sw, sh


@pytest.mark.parametrize("disposal", [0, 1, 2, 3])
def test_animation_composes_every_disposal_method(disposal):
    from akvorado_spark.operators.gif import gif_decode_frames, gif_frame_count

    blob, exp, sw, sh = _three_frame_blob(disposal)
    assert gif_frame_count(blob) == 3
    w, h, frames = gif_decode_frames(blob)
    assert (w, h, len(frames)) == (sw, sh, 3)
    for i, (got, want) in enumerate(zip(frames, exp)):
        assert np.array_equal(got, want), (disposal, i)


def test_animation_first_frame_matches_gif_decode():
    """Single-frame parity: gif_decode_frames()[0] equals gif_decode
    for opaque stills (the alpha-channel semantics differ by design
    for transparent stills — compositing vs per-pixel alpha)."""
    from akvorado_spark.operators.gif import gif_decode_frames

    px = _palette_image(9, 4, 5, seed=5)
    blob = gif_encode(px)
    w, h, ch, first = gif_decode(blob)
    aw, ah, frames = gif_decode_frames(blob)
    assert (aw, ah, len(frames)) == (w, h, 1)
    assert np.array_equal(frames[0], first)


def test_animation_max_frames_bounds_work():
    from akvorado_spark.operators.gif import gif_decode_frames

    blob, _, _, _ = _three_frame_blob(1)
    assert len(gif_decode_frames(blob, max_frames=2)[2]) == 2
    assert len(gif_decode_frames(blob, max_frames=1)[2]) == 1


def test_animation_gce_resets_between_frames():
    """A GCE applies to the single following image (GIF89a §23): frame
    2 of an animation whose F1 declared transparency must treat index
    255 as an ordinary opaque pixel."""
    from akvorado_spark.operators.gif import gif_decode_frames, gif_encode_frames

    pal = _anim_palette()
    f0 = np.zeros((2, 2), dtype=np.int64)
    f1 = np.full((2, 2), 255, dtype=np.int64)  # fully transparent
    f2 = np.full((2, 2), 255, dtype=np.int64)  # same indices, NO GCE flag
    blob = gif_encode_frames(
        (2, 2), pal,
        [dict(idx=f0, disposal=1),
         dict(idx=f1, disposal=1, transparent=255),
         dict(idx=f2, disposal=0)],
    )
    _, _, frames = gif_decode_frames(blob)
    assert np.array_equal(frames[1], frames[0])      # nothing drawn
    assert np.array_equal(frames[2], np.broadcast_to(pal[255], (2, 2, 3)))


def test_animation_features_agrees_with_frame_sample_plan(spark):
    """The decode half (animation_features) emits exactly the
    (id, frame_idx) pairs the planning half (frame_sample_plan)
    schedules, and the sums match a driver-side numpy composition."""
    from akvorado_spark.operators.multimodal import (
        animation_features,
        frame_sample_plan,
    )

    blob2, exp2, _, _ = _three_frame_blob(2)
    blob3, exp3, _, _ = _three_frame_blob(3)
    df = spark.createDataFrame(
        [(1, bytearray(blob2)), (2, bytearray(blob3))],
        "doc_id long, media binary",
    )
    out = animation_features(df, every_n_frames=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in out}
    planned = frame_sample_plan(
        spark.createDataFrame([(1, 3), (2, 3)], "doc_id long, n_frames int"),
        every_n_frames=2,
    ).collect()
    assert {(r["doc_id"], r["frame_idx"]) for r in planned} == set(got)
    for doc, exp in ((1, exp2), (2, exp3)):
        for fi in (0, 2):
            r = got[(doc, fi)]
            assert r["n_frames"] == 3 and (r["width"], r["height"]) == (6, 5)
            assert r["px_sum"] == int(exp[fi].astype(np.int64).sum())
    with pytest.raises(Exception, match="only GIF"):
        animation_features(
            spark.createDataFrame([(9, bytearray(b"nope"))],
                                  "doc_id long, media binary")
        ).collect()


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(13, 300), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_animation_bitflip_never_hangs_or_crashes_unsafely(pos, bit, seed):
    """The animation composer under single-bit corruption: every frame
    either composes with the screen shape or the decode raises
    ValueError — never an IndexError/numpy crash/unbounded loop (the
    hostile-corpus contract the still-image fuzzes already pin)."""
    from akvorado_spark.operators.gif import gif_decode_frames, gif_frame_count

    blob, _, sw, sh = _three_frame_blob(seed % 4)
    blob = bytearray(blob)
    if pos >= len(blob):
        pos = len(blob) - 1
    blob[pos] ^= 1 << bit
    try:
        w, h, frames = gif_decode_frames(bytes(blob), max_frames=8)
        for f in frames:
            assert f.shape == (h, w, 3)
    except (ValueError, NotImplementedError):
        pass
    try:
        assert 0 <= gif_frame_count(bytes(blob)) <= 3
    except ValueError:
        pass

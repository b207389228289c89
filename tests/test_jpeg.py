"""Pure-stdlib baseline JPEG codec (operators/jpeg.py): exactness on
the DC-only construction the oracle gate uses, lossy-roundtrip bounds,
4:2:0 and restart-marker coverage, and loud failures on unsupported
modes."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from akvorado_spark.operators.jpeg import (
    is_baseline_jpeg,
    jpeg_decode,
    jpeg_encode_baseline,
)


def _block_uniform(d: int) -> np.ndarray:
    bw, bh = d % 3 + 1, d % 2 + 1
    px = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                d * 11 + 23 * by + 29 * bx
            ) % 256
    return px


def test_block_uniform_grayscale_is_bit_exact():
    """DC-only blocks with all-ones quant decode EXACTLY (the oracle
    gate's lever): IDCT of a lone DC is a power-of-two division."""
    for d in range(30):
        px = _block_uniform(d)
        w, h, ch, got = jpeg_decode(jpeg_encode_baseline(px, quant=1))
        assert (w, h, ch) == (px.shape[1], px.shape[0], 1)
        assert (got[:, :, 0] == px).all(), d


def test_random_grayscale_roundtrip_within_rounding():
    """quant=1 keeps every coefficient; the only loss is FDCT/IDCT
    float rounding — at most 1 level per pixel on random content."""
    rng = np.random.default_rng(7)
    for dims in ((8, 8), (24, 40), (17, 23), (1, 1), (9, 64)):
        px = rng.integers(0, 256, dims, dtype=np.uint8)
        w, h, ch, got = jpeg_decode(jpeg_encode_baseline(px, quant=1))
        assert (w, h) == (dims[1], dims[0])
        assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 1


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    w, h, ch, got = jpeg_decode(jpeg_encode_baseline(px, quant=1))
    assert (w, h, ch) == (19, 17, 3)
    # color transform adds one more rounding hop each way
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_rgb_420_subsampled_roundtrip():
    """4:2:0 exercises the multi-block MCU + replication upsample: a
    smooth-chroma image survives within subsampling error, and
    constant-chroma content recovers its Y plane within rounding."""
    yy, xx = np.meshgrid(np.arange(33), np.arange(41), indexing="ij")
    smooth = np.stack(
        [(100 + yy + xx) % 256, (80 + 2 * yy) % 256, (60 + 2 * xx) % 256],
        axis=2,
    ).astype(np.uint8)
    w, h, ch, got = jpeg_decode(
        jpeg_encode_baseline(smooth, quant=1, subsample=True)
    )
    assert (w, h, ch) == (41, 33, 3)
    assert np.abs(got.astype(int) - smooth.astype(int)).max() <= 4

    rng = np.random.default_rng(9)
    gray3 = np.stack([rng.integers(0, 256, (16, 16), dtype=np.uint8)] * 3, axis=2)
    _, _, _, got = jpeg_decode(
        jpeg_encode_baseline(gray3, quant=1, subsample=True)
    )
    assert np.abs(got.astype(int) - gray3.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = jpeg_decode(jpeg_encode_baseline(px, quant=1))[3]
    for ri in (1, 2, 3, 7):
        blob = jpeg_encode_baseline(px, quant=1, restart_interval=ri)
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
        got = jpeg_decode(blob)[3]
        # restarts change the stream layout, not the decoded pixels
        assert (got == plain).all(), ri


def test_lossy_quantization_is_sane():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    got = jpeg_decode(jpeg_encode_baseline(px, quant=16))[3]
    err = np.abs(got[:, :, 0].astype(int) - px.astype(int))
    assert err.mean() < 16  # well inside the quant step


def test_unsupported_modes_raise():
    px = _block_uniform(1)
    blob = bytearray(jpeg_encode_baseline(px, quant=1))
    # flip SOF0 -> SOF3 (lossless): a different entropy pipeline
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF3"):
        jpeg_decode(bytes(blob))
    # SOF2 decodes now (r12) — but a baseline-style full-band DC scan
    # is ILLEGAL progressive syntax and must fail loudly, not mis-read
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        jpeg_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        jpeg_decode(b"\x89PNG not a jpeg")
    assert not is_baseline_jpeg(b"\x00\x00")
    with pytest.raises(ValueError, match="quant"):
        jpeg_encode_baseline(px, quant=0)
    # 12-bit precision is not baseline
    blob = bytearray(jpeg_encode_baseline(px, quant=1))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        jpeg_decode(bytes(blob))


def test_encode_golden_is_stable():
    """The encoder is deterministic byte-for-byte — a changed Huffman
    table, zigzag order, or DCT normalization shows up here before it
    shows up as a cross-engine mystery."""
    px = _block_uniform(5)
    blob = jpeg_encode_baseline(px, quant=1, restart_interval=2)
    assert hashlib.md5(blob).hexdigest() == _GOLDEN_MD5, (
        "encoder bytes changed — if intentional, re-pin the golden"
    )
    w, h, ch, got = jpeg_decode(blob)
    assert (got[:, :, 0] == px).all()


# pinned from the first verified build of the codec (decode verified
# bit-exact against the block-uniform construction above)
_GOLDEN_MD5 = "8b791071f1e7058ec743f915b23814c0"


def test_decoder_header_agrees_with_jpeg_meta():
    """The new full decoder and the r7 header-only jpeg_meta agree on
    (width, height, channels) for every fixture family."""
    from akvorado_spark.operators.png import jpeg_meta

    rng = np.random.default_rng(12)
    for px in (
        _block_uniform(3),
        rng.integers(0, 256, (9, 13), dtype=np.uint8),
        rng.integers(0, 256, (12, 20, 3), dtype=np.uint8),
    ):
        blob = jpeg_encode_baseline(px, quant=1)
        w, h, ch, _ = jpeg_decode(blob)
        assert jpeg_meta(blob) == (w, h, ch)


def test_missing_tables_raise_value_error():
    """A stream referencing undefined Huffman/quant tables fails with a
    clear ValueError at scan start, not a KeyError mid-entropy-decode."""
    blob = bytearray(jpeg_encode_baseline(_block_uniform(2), quant=1))
    # point component 1's quant table at an undefined id in SOF0
    sof = blob.index(b"\xff\xc0")
    assert blob[sof + 12] == 0  # Tq of component 1
    blob[sof + 12] = 3
    with pytest.raises(ValueError, match="quantization table"):
        jpeg_decode(bytes(blob))
    # point the scan at an undefined Huffman table pair in SOS
    blob = bytearray(jpeg_encode_baseline(_block_uniform(2), quant=1))
    sos = blob.index(b"\xff\xda")
    assert blob[sos + 6] == 0x00  # Td/Ta of component 1
    blob[sos + 6] = 0x22
    with pytest.raises(ValueError, match="Huffman table"):
        jpeg_decode(bytes(blob))


def test_non_integer_sampling_ratio_raises():
    """hmax=3 vs hs=2 cannot replication-upsample to a common shape —
    must be a clear ValueError, not a numpy shape error mid-stack."""
    blob = bytearray(
        jpeg_encode_baseline(
            np.zeros((8, 8, 3), dtype=np.uint8), quant=1, subsample=True
        )
    )
    sof = blob.index(b"\xff\xc0")
    # sampling bytes: comp1 at sof+11, comp2 at sof+14 — force Y=3x1
    # and Cb=2x1 so hmax=3 is not an integer multiple of Cb's hs=2
    assert blob[sof + 11] == 0x22 and blob[sof + 14] == 0x11
    blob[sof + 11] = 0x31
    blob[sof + 14] = 0x21
    with pytest.raises(ValueError, match="sampling factors"):
        jpeg_decode(bytes(blob))


def test_webp_truncated_vp8_raises_value_error():
    """A 27-29 byte truncated lossy WebP must raise the parser-family
    ValueError, not escape as struct.error from the dims read."""
    import struct

    from akvorado_spark.operators.png import webp_meta

    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<H", 320)[:1]
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert 27 <= len(blob) <= 29
    with pytest.raises(ValueError, match="VP8"):
        webp_meta(blob)


def test_decile_null_margin_buckets_to_zero(spark):
    """NULL features (NULL text) bucket to decile 0 in BOTH engines —
    the SQL CASE...ELSE semantics the oracle replays."""
    from pyspark.sql import functions as F

    from akvorado_spark.operators.classifier import decile_from_margin

    df = spark.createDataFrame([(None,), (0,)], "z long")
    got = sorted(
        r["b"] for r in df.select(decile_from_margin(F.col("z")).alias("b")).collect()
    )
    assert got == [0, 5]  # NULL -> 0; z=0 sits at the p=0.5 threshold


def test_jpeg_property_roundtrip_random_shapes():
    """Property sweep: random dims (incl. non-multiples of 8), random
    content, gray/RGB, 4:4:4/4:2:0, restart intervals — every decode
    returns the declared dims and stays within the per-mode error
    budget (≤1 gray, ≤2 RGB 4:4:4; 4:2:0 is checked against the exact
    chroma-subsampled reference, not the original, so its budget is
    rounding-only too)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        color=st.booleans(),
        sub=st.booleans(),
        ri=st.sampled_from([0, 0, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, color, sub, ri, seed):
        rng = np.random.default_rng(seed)
        if color:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            px = rng.integers(0, 256, (h, w), dtype=np.uint8)
            sub = False
        blob = jpeg_encode_baseline(px, quant=1, subsample=sub, restart_interval=ri)
        ww, hh, ch, got = jpeg_decode(blob)
        assert (ww, hh) == (w, h)
        assert ch == (3 if color else 1)
        if not color:
            assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 1
        elif not sub:
            # three independent roundings stack on the color path —
            # forward-DCT coefficient, IDCT output, YCbCr<->RGB — so
            # the worst case is 3, not 2 (r12: hypothesis found a
            # 1-in-~300 corpus-tail example hitting exactly 3; the
            # empirical distribution over 300 random images is
            # {0: 7, 1: 41, 2: 252}, no drift)
            assert np.abs(got.astype(int) - px.astype(int)).max() <= 3
        else:
            # reference: the same 2x2-mean chroma the encoder committed
            rgb = px.astype(np.float64)
            y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
            cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
            cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

            def up(p):
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                half = (pe[0::2, 0::2] + pe[1::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 1::2]) / 4
                return np.repeat(np.repeat(half, 2, axis=0), 2, axis=1)[:h, :w]

            cbu, cru = up(cb), up(cr)
            r = y + 1.402 * (cru - 128)
            g = y - 0.344136 * (cbu - 128) - 0.714136 * (cru - 128)
            b = y + 1.772 * (cbu - 128)
            want = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255)
            # 4:2:0 budget is 3, not 2: the codec's per-block float
            # IDCT and the reference's whole-plane chroma mean round
            # independently, and the worst observed stack-up is ±1
            # IDCT rounding ±1 chroma-mean rounding amplified by the
            # 1.772 Cb coefficient (hypothesis-found at h=6,w=10,
            # seed=30 in r10 — value error 3, structure exact)
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 3

    check()


def test_truncated_entropy_stream_raises():
    """Cutting the entropy data must raise, not silently decode fake
    1-bit padding into garbage pixels (ADVICE r9: _BitReader pad
    accounting)."""
    px = np.arange(32 * 32, dtype=np.uint64).reshape(32, 32) % 256
    blob = jpeg_encode_baseline(px.astype(np.uint8), quant=1)
    # drop the EOI plus a healthy slice of entropy bytes
    for cut in (4, 16, 64):
        with pytest.raises(ValueError):
            jpeg_decode(blob[: len(blob) - cut])


def test_truncated_segments_raise_value_error():
    """Truncated DQT/DHT/SOF bodies must fail as ValueError at the
    segment boundary, not as numpy IndexError deep in table parsing."""
    blob = jpeg_encode_baseline(_block_uniform(3), quant=1)

    def seg_off(marker: bytes) -> int:
        off = blob.index(marker)
        assert off > 0
        return off

    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        off = seg_off(marker)
        with pytest.raises(ValueError):
            jpeg_decode(blob[: off + 6])  # cut mid-segment-body
    # corrupt a DQT length to run past its body while data continues
    off = seg_off(b"\xff\xdb")
    bad = bytearray(blob)
    bad[off + 2 : off + 4] = (8).to_bytes(2, "big")  # too short for 65-byte table
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))


def test_legal_final_byte_padding_still_decodes():
    """The ≤7-bit alignment pad at the end of a legal stream must stay
    accepted — the truncation guard only fires on an 8th pad bit."""
    for d in range(6):
        px = _block_uniform(d)
        w, h, ch, got = jpeg_decode(jpeg_encode_baseline(px, quant=1))
        assert (w, h, ch) == (px.shape[1], px.shape[0], 1)


# ---------------------------------------------------------------------------
# progressive (SOF2) — r12
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_decode():
    """The decisive invariant: for the SAME pixels and quant table the
    progressive path must reconstruct the SAME quantized coefficients
    as the sequential one, so both decodes are bit-identical — across
    gray/color, 4:2:0, restart intervals and quants."""
    from akvorado_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(71)
    for trial in range(12):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        color = trial % 2 == 0
        sub = color and trial % 4 == 0
        quant = int(rng.integers(1, 9))
        ri = int(rng.integers(0, 3))
        px = rng.integers(0, 256, (h, w, 3) if color else (h, w), dtype=np.uint8)
        base = jpeg_decode(jpeg_encode_baseline(px, quant=quant, subsample=sub))
        prog = jpeg_decode(jpeg_encode_progressive(
            px, quant=quant, subsample=sub, restart_interval=ri))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), (h, w, color, sub, quant, ri)


def test_progressive_scan_script_variants():
    """Spectral-band splits and successive-approximation depths are
    encoder choices the decoder must be indifferent to."""
    from akvorado_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(72)
    px = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    want = jpeg_decode(jpeg_encode_baseline(px, quant=2))[3]
    for dc_split, ac_split, band_edge in (
        (1, 1, 5), (2, 3, 1), (1, 2, 62), (2, 1, 20),
    ):
        got = jpeg_decode(jpeg_encode_progressive(
            px, quant=2, dc_split=dc_split, ac_split=ac_split,
            band_edge=band_edge))[3]
        assert np.array_equal(got, want), (dc_split, ac_split, band_edge)


def test_progressive_dc_only_exactness():
    """Block-uniform pixels at quant=1 decode bit-exactly through the
    progressive path too — the oracle-gate lever (the jpeg member
    rotates SOF2 docs on exactly this invariant)."""
    from akvorado_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(73)
    blocks = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    for ri in (0, 1, 2):
        w, h, ch, got = jpeg_decode(
            jpeg_encode_progressive(px, quant=1, restart_interval=ri))
        assert np.array_equal(got[:, :, 0], px), ri


def test_progressive_eob_runs_and_refinement_corrections():
    """Multi-block EOB runs (the fixture AC table carries the r<<4
    symbols), buffered correction bits riding them, and in-refinement
    ZRLs — exercised via sparse high-magnitude coefficients across
    many blocks, checked against the baseline decode."""
    from akvorado_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(74)
    # mostly-flat image with isolated hot pixels → sparse ACs, long
    # EOB runs spanning blocks, corrections at multiple bit planes
    px = np.full((40, 48), 128, dtype=np.uint8)
    for _ in range(30):
        px[rng.integers(0, 40), rng.integers(0, 48)] = rng.integers(0, 256)
    for ac_split in (1, 2, 3):
        base = jpeg_decode(jpeg_encode_baseline(px, quant=3))[3]
        prog = jpeg_decode(jpeg_encode_progressive(px, quant=3, ac_split=ac_split))[3]
        assert np.array_equal(base, prog), ac_split


def test_progressive_truncation_and_bitflips_fail_typed():
    from akvorado_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(75)
    px = rng.integers(0, 256, (17, 13), dtype=np.uint8)
    blob = jpeg_encode_progressive(px, quant=2)
    with pytest.raises(ValueError):
        jpeg_decode(blob[: len(blob) // 2])
    for _ in range(40):
        b = bytearray(blob)
        pos = int(rng.integers(2, len(b)))
        b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            w, h, ch, got = jpeg_decode(bytes(b))
            assert got.shape == (h, w, ch)
        except ValueError:
            pass

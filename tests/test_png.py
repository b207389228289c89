"""Pure-stdlib PNG codec goldens + the real (non-fake) multimodal
decode/feature path running without Pillow."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from akvorado_spark.operators.png import (
    PNG_MAGIC,
    is_png,
    png_decode,
    png_encode,
    resize_nearest,
)


def chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def build_png(width, height, color_type, scanlines: bytes, plte=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = PNG_MAGIC + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


def test_roundtrip_rgb():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, ch, got = png_decode(png_encode(px))
    assert (w, h, ch) == (9, 5, 3)
    assert np.array_equal(got, px)


def test_roundtrip_gray_and_rgba():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    w, h, ch, got = png_decode(png_encode(g))
    assert (w, h, ch) == (6, 4, 1) and np.array_equal(got[:, :, 0], g)
    a = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    w, h, ch, got = png_decode(png_encode(a))
    assert (w, h, ch) == (3, 3, 4) and np.array_equal(got, a)


def test_all_filters_golden():
    """One scanline per filter type over a known 4x5 gray image; the
    filtered bytes are hand-derived per the PNG spec, so the unfilter
    math (Sub prefix-sum, Up, Average floor, Paeth predictor) is pinned
    byte-for-byte."""
    want = np.array(
        [
            [10, 20, 30, 40],
            [15, 25, 35, 45],
            [12, 22, 40, 50],
            [13, 27, 45, 55],
            [20, 30, 50, 60],
        ],
        dtype=np.uint8,
    )

    def sub(row):  # filter 1: raw[i] - raw[i-1]
        out = [row[0]] + [(int(row[i]) - int(row[i - 1])) & 0xFF for i in range(1, len(row))]
        return bytes([1] + out)

    def up(row, prev):  # filter 2
        return bytes([2] + [(int(a) - int(b)) & 0xFF for a, b in zip(row, prev)])

    def avg(row, prev):  # filter 3: left uses the RECONSTRUCTED row
        out, rec = [], []
        for i, v in enumerate(row):
            left = rec[i - 1] if i else 0
            out.append((int(v) - (left + int(prev[i])) // 2) & 0xFF)
            rec.append(int(v))
        return bytes([3] + out)

    def paeth(row, prev):  # filter 4
        def predict(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        out, rec = [], []
        for i, v in enumerate(row):
            left = rec[i - 1] if i else 0
            ul = int(prev[i - 1]) if i else 0
            out.append((int(v) - predict(left, int(prev[i]), ul)) & 0xFF)
            rec.append(int(v))
        return bytes([4] + out)

    lines = (
        bytes([0]) + want[0].tobytes()
        + sub(want[1])
        + up(want[2], want[1])
        + avg(want[3], want[2])
        + paeth(want[4], want[3])
    )
    w, h, ch, got = png_decode(build_png(4, 5, 0, lines))
    assert (w, h, ch) == (4, 5, 1)
    assert np.array_equal(got[:, :, 0], want)


def test_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    lines = bytes([0, 0, 1, 2, 1])  # one row: R G B G
    w, h, ch, got = png_decode(build_png(4, 1, 3, lines, plte=plte))
    assert (w, h, ch) == (4, 1, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 3].tolist() == [0, 255, 0]


def test_png_meta_matches_decode_without_inflate():
    """png_meta reads only the IHDR: channels agree with png_decode for
    every color type, and dims survive even when the IDAT is garbage."""
    from akvorado_spark.operators.png import png_meta

    for ct, lines in ((0, bytes([0, 9, 9, 9])), (2, bytes([0] + [1] * 6)),
                      (4, bytes([0, 1, 2, 3, 4])), (6, bytes([0] + [5] * 8))):
        w = {0: 3, 2: 2, 4: 2, 6: 2}[ct]
        blob = build_png(w, 1, ct, lines)
        dw, dh, dch, _ = png_decode(blob)
        assert png_meta(blob) == (dw, dh, dch), ct
    plte = bytes([255, 0, 0, 0, 255, 0])
    pal = build_png(4, 1, 3, bytes([0, 0, 1, 0, 1]), plte=plte)
    assert png_meta(pal) == (4, 1, 3)  # palette reports expanded RGB
    # IDAT never touched: corrupt payload still yields header metadata
    broken = pal[:-30] + b"\x00" * 30
    assert png_meta(broken) == (4, 1, 3)
    with pytest.raises(ValueError):
        png_meta(b"JFIF" + bytes(30))


def test_malformed_rejected():
    assert not is_png(b"JFIF....")
    with pytest.raises(ValueError):
        png_decode(b"JFIF" + bytes(16))
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = png_encode(px)
    with pytest.raises((ValueError, zlib.error)):
        png_decode(good[:-20])  # truncated inside the IDAT chunk
    # 16-bit is decoded (r12) but an empty IDAT for it is malformed
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(deep)
    # sub-byte depths decode (r12) but an empty IDAT is malformed
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    shallow = PNG_MAGIC + chunk(b"IHDR", ihdr4) + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(shallow)
    # palette + 16-bit is spec-illegal
    ihdr_p16 = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    p16 = PNG_MAGIC + chunk(b"IHDR", ihdr_p16) + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(p16)


def test_resize_nearest_golden():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = resize_nearest(px, 2, 2)
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_decode_image_real_png_path(spark):
    """The REAL decode branch runs PNG natively (no Pillow in this
    container) through the Arrow-batched operator."""
    from akvorado_spark.operators.multimodal import decode_image, image_features

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        w, h = 3 + i, 2 + (i % 3)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, bytearray(png_encode(px)), int(px.mean())))
    df = spark.createDataFrame(
        [(i, bytes(b)) for i, b, _m in rows], "doc_id long, media binary"
    )
    meta = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert len(meta) == 6
    for i in range(6):
        assert (meta[i]["width"], meta[i]["height"]) == (3 + i, 2 + (i % 3))
        assert meta[i]["channels"] == 3 and meta[i]["format"] == "PNG"

    feats = {r["doc_id"]: r for r in image_features(df, resize_to=(2, 2)).collect()}
    assert all(feats[i]["width"] == 2 and feats[i]["height"] == 2 for i in range(6))
    assert all(len(feats[i]["mean"]) == 3 for i in range(6))


def test_roundtrip_every_filter_combo():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        w, h, ch, got = png_decode(png_encode(px, filters=filters))
        assert np.array_equal(got, px), f"filters={filters}"


def jpeg_fixture(w, h, ncomp=3):
    """Minimal valid-marker-stream JPEG header: SOI, APP0, DQT stub,
    SOF0, EOI — enough for metadata, not decodable."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + ncomp * 3, 8, h, w, ncomp)
    sof += bytes([1, 0x11, 0] * ncomp)
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def test_jpeg_meta_golden():
    from akvorado_spark.operators.png import is_jpeg, jpeg_meta

    data = jpeg_fixture(640, 480, 3)
    assert is_jpeg(data)
    assert jpeg_meta(data) == (640, 480, 3)
    assert jpeg_meta(jpeg_fixture(17, 9, 1)) == (17, 9, 1)
    with pytest.raises(ValueError):
        jpeg_meta(b"\xff\xd8\xff\xd9")  # no SOF
    with pytest.raises(ValueError):
        jpeg_meta(b"PNG...")


def test_decode_image_jpeg_metadata_path(spark):
    from akvorado_spark.operators.multimodal import decode_image

    df = spark.createDataFrame(
        [(1, jpeg_fixture(320, 200, 3)), (2, jpeg_fixture(64, 64, 1))],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (320, 200, 3)
    assert got[2]["format"] == "JPEG" and got[2]["channels"] == 1


def test_palette_out_of_range_rejected():
    plte = bytes([255, 0, 0])  # one entry
    lines = bytes([0, 0, 1])  # index 1 out of range
    with pytest.raises(ValueError, match="palette index"):
        png_decode(build_png(2, 1, 3, lines, plte=plte))


def test_jpeg_fill_bytes_tolerated():
    from akvorado_spark.operators.png import jpeg_meta

    base = jpeg_fixture(11, 7, 3)
    # inject legal FF fill padding before the SOF marker
    sof_at = base.index(b"\xff\xc0")
    padded = base[:sof_at] + b"\xff\xff\xff" + base[sof_at:]
    assert jpeg_meta(padded) == (11, 7, 3)


def test_gif_and_bmp_header_metadata():
    import struct

    from akvorado_spark.operators.png import bmp_meta, gif_meta, is_bmp, is_gif

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert is_gif(gif)
    assert gif_meta(gif) == (320, 200, 3)

    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<ii", 640, -480)  # top-down height is negative
        + b"\x00" * 2
        + struct.pack("<H", 24)
        + b"\x00" * 10
    )
    assert is_bmp(bmp)
    assert bmp_meta(bmp) == (640, 480, 3)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        gif_meta(b"GIF89a\x01")
    with _pytest.raises(ValueError):
        bmp_meta(b"BM\x00")


def test_decode_image_gif_bmp_dispatch(spark):
    import struct

    rows = [
        (1, bytearray(b"GIF89a" + struct.pack("<HH", 12, 7) + b"\x00" * 10)),
        (
            2,
            bytearray(
                b"BM" + b"\x00" * 16 + struct.pack("<ii", 9, 4)
                + b"\x00" * 2 + struct.pack("<H", 32) + b"\x00" * 10
            ),
        ),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    from akvorado_spark.operators.multimodal import decode_image

    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (12, 7, "GIF")
    assert (got[2]["width"], got[2]["height"], got[2]["channels"], got[2]["format"]) == (
        9, 4, 4, "BMP",
    )


def test_wav_roundtrip_and_meta():
    import pytest as _pytest

    from akvorado_spark.operators.wav import (
        is_wav,
        wav_decode,
        wav_encode_pcm16,
        wav_meta,
    )

    left = [0, 100, -100, 32767, -32768, 5]
    right = [1, -1, 2, -2, 3, -3]
    blob = wav_encode_pcm16(8000, [left, right])
    assert is_wav(blob)
    assert wav_meta(blob) == (2, 8000, 16, 6, 1)
    rate, n, chans = wav_decode(blob)
    assert (rate, n) == (8000, 6)
    assert chans == [left, right]

    with _pytest.raises(ValueError):
        wav_meta(b"RIFFxxxxWAVE")  # no chunks
    with _pytest.raises(ValueError):
        wav_decode(blob[:-4])  # truncated data chunk
    with _pytest.raises(ValueError):
        wav_encode_pcm16(8000, [[1], [1, 2]])


def test_wav_multiple_data_chunks_and_ragged_tail():
    """ADVICE r7: wav_meta must count the FIRST data chunk (the one
    wav_decode reads), and a data length that is not a frame multiple
    must decode to whole frames only — equal-length channel lists."""
    import struct

    from akvorado_spark.operators.wav import wav_decode, wav_encode_pcm16, wav_meta

    left = [10, 20, 30]
    right = [-10, -20, -30]
    good = wav_encode_pcm16(8000, [left, right])
    # append a SECOND, larger data chunk: meta must keep the first
    extra = struct.pack("<4sI", b"data", 40) + b"\x00" * 40
    two = (
        good[:4]
        + struct.pack("<I", struct.unpack_from("<I", good, 4)[0] + len(extra))
        + good[8:]
        + extra
    )
    assert wav_meta(two) == (2, 8000, 16, 3, 1)
    rate, n, chans = wav_decode(two)
    assert (rate, n) == (8000, 3)
    assert chans == [left, right]

    # ragged tail: data size 2 bytes past a frame boundary (block=4)
    b = bytearray(good)
    data_off = b.index(b"data")
    size = struct.unpack_from("<I", b, data_off + 4)[0]
    ragged = bytes(b[: data_off + 8 + size]) if size % 4 else None
    b[data_off + 4 : data_off + 8] = struct.pack("<I", size - 2)
    ragged = bytes(b[:-2])
    assert wav_meta(ragged)[3] == 2  # whole frames only
    rate, n, chans = wav_decode(ragged)
    assert n == 2
    assert [len(c) for c in chans] == [2, 2]
    assert chans == [left[:2], right[:2]]


def test_decode_audio_spark_path(spark):
    from akvorado_spark.operators.multimodal import decode_audio
    from akvorado_spark.operators.wav import wav_encode_pcm16

    rows = [
        (1, bytearray(wav_encode_pcm16(16000, [[10, -10, 20, -20]]))),
        (2, bytearray(wav_encode_pcm16(44100, [[1, 2], [3, 4]]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["channels"] == 1 and got[1]["sample_rate"] == 16000
    assert got[1]["n_frames"] == 4 and got[1]["fmt"] == "wav/pcm16"
    assert got[1]["ch_sum"] == [0] and got[1]["ch_sqsum"] == [1000]
    assert got[2]["channels"] == 2 and got[2]["n_frames"] == 2
    assert got[2]["ch_sum"] == [3, 7] and got[2]["ch_sqsum"] == [5, 25]


def test_wav_fuzz_valueerror_only_contract():
    """Garbage, truncations, and bit flips must raise ValueError (or
    parse) — never struct.error/IndexError — matching the repo-wide
    binary-parser error contract."""
    import random

    from akvorado_spark.operators.wav import wav_decode, wav_encode_pcm16, wav_meta

    rng = random.Random(7)
    good = wav_encode_pcm16(8000, [[1, 2, 3, -4, 5] * 3, [0] * 15])
    for trial in range(1500):
        mode = trial % 3
        if mode == 0:
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 60)))
        elif mode == 1:
            blob = good[: rng.randrange(0, len(good))]
        else:
            b = bytearray(good)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            blob = bytes(b)
        for fn in (wav_meta, wav_decode):
            try:
                fn(blob)
            except ValueError:
                pass


def test_wav_pcm_block_align_mismatch_rejected():
    """ADVICE r8: a tag-1 PCM file whose header block_align disagrees
    with channels*(bits/8) (padded/malformed) would silently break the
    n_frames ↔ decoded-sample-count agreement — wav_meta must reject it
    instead."""
    import struct

    import pytest

    from akvorado_spark.operators.wav import wav_encode_pcm16, wav_meta

    good = wav_encode_pcm16(8000, [[1, 2, 3], [4, 5, 6]])
    b = bytearray(good)
    fmt_off = b.index(b"fmt ")
    # block_align is the 5th field of <HHIIHH> after the 8-byte header:
    # tag(2) ch(2) rate(4) byterate(4) -> offset +12 within the chunk
    ba_off = fmt_off + 8 + 12
    assert struct.unpack_from("<H", b, ba_off)[0] == 4
    struct.pack_into("<H", b, ba_off, 6)  # padded to 6: malformed PCM
    with pytest.raises(ValueError, match="block_align"):
        wav_meta(bytes(b))
    # non-PCM tags keep their header block_align un-second-guessed
    struct.pack_into("<H", b, fmt_off + 8, 2)  # tag 2 = ADPCM
    assert wav_meta(bytes(b))[4] == 2


def test_image_features_decodes_jpeg_media(spark):
    """image_features accepts baseline-JPEG binaries alongside PNG: a
    block-uniform JPEG (exact decode) yields exactly the per-channel
    mean the pixel formula predicts."""
    import numpy as np

    from akvorado_spark.operators.jpeg import jpeg_encode_baseline
    from akvorado_spark.operators.multimodal import image_features

    px = np.zeros((8, 16), dtype=np.uint8)
    px[:, :8], px[:, 8:] = 40, 200
    blob = jpeg_encode_baseline(px, quant=1)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, media binary")
    row = image_features(df).first()
    assert (row["width"], row["height"], row["channels"]) == (16, 8, 1)
    assert row["mean"] == [120.0]


def test_webp_meta_all_three_layouts(spark):
    """webp_meta reads the lossy (VP8), lossless (VP8L incl. alpha bit)
    and extended (VP8X canvas) headers, and decode_image routes WebP
    binaries to it."""
    import struct

    from akvorado_spark.operators.multimodal import decode_image
    from akvorado_spark.operators.png import is_webp, webp_meta

    def riff(fourcc, body):
        chunk = fourcc + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8 = riff(
        b"VP8 ",
        b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00",
    )
    bits = 99 | (49 << 14) | (1 << 28)
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    vp8x = riff(
        b"VP8X",
        bytes([0x10, 0, 0, 0])
        + (639).to_bytes(3, "little")
        + (479).to_bytes(3, "little"),
    )
    assert webp_meta(vp8) == (320, 240, 3)
    assert webp_meta(vp8l) == (100, 50, 4)
    assert webp_meta(vp8x) == (640, 480, 4)
    assert not is_webp(b"RIFFxxxxWAVE")  # a WAV is RIFF but not WEBP
    import pytest as _pt

    with _pt.raises(ValueError):
        webp_meta(riff(b"ZZZZ", b"\x00" * 16))

    # decode_image routes lossy/extended headers to webp_meta; VP8L now
    # goes through the REAL pixel decoder (operators/vp8l.py), so the
    # fixture must be a complete stream, not a bare header
    import numpy as np

    from akvorado_spark.operators.vp8l import vp8l_encode_lossless

    real_vp8l = vp8l_encode_lossless(
        np.arange(100 * 50 * 3, dtype=np.uint64).reshape(50, 100, 3).astype(np.uint8) % 251
    )
    df = spark.createDataFrame(
        [(1, bytearray(vp8)), (2, bytearray(real_vp8l)), (3, bytearray(vp8x))],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (320, 240, "WEBP")
    assert (got[2]["width"], got[2]["height"], got[2]["format"]) == (100, 50, "WEBP/VP8L")
    assert got[3]["width"] == 640 and got[3]["format"] == "WEBP"


def test_audio_header_meta_mp3_and_ogg(spark):
    """decode_audio yields header-metadata rows for MP3 and Ogg-Vorbis
    binaries (channels/rate/bitrate from the public frame headers) and
    still raises clearly on unknown containers."""
    import struct as _st

    import pytest as _pt

    from akvorado_spark.operators.multimodal import decode_audio
    from akvorado_spark.operators.wav import mp3_meta, ogg_vorbis_meta

    mp3 = bytes([0xFF, 0xFB, 0x90, 0x40]) + b"\x00" * 64        # 128k 44.1k JS
    id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\x00" * 10 + mp3
    mono = bytes([0xFF, 0xF3, 0xA8, 0xC0])                      # MPEG2 mono 16k
    ogg = (
        b"OggS" + bytes(22) + bytes([1, 30])
        + b"\x01vorbis" + bytes(4) + bytes([2])
        + (44100).to_bytes(4, "little") + bytes(9)
    )
    assert mp3_meta(mp3) == (2, 44100, 128)
    assert mp3_meta(id3) == (2, 44100, 128)  # ID3v2 tag skipped
    assert mp3_meta(mono) == (1, 16000, 96)
    assert ogg_vorbis_meta(ogg) == (2, 44100)

    df = spark.createDataFrame(
        [(1, bytearray(mp3)), (2, bytearray(ogg)), (3, bytearray(id3))],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["fmt"] == "mp3/128kbps" and got[1]["sample_rate"] == 44100
    assert got[2]["fmt"] == "ogg/vorbis" and got[2]["channels"] == 2
    assert got[3]["fmt"] == "mp3/128kbps"

    bad = spark.createDataFrame([(9, bytearray(b"FLAC....."))],
                                "doc_id long, media binary")
    with _pt.raises(Exception, match="unrecognized audio container"):
        decode_audio(bad).collect()


def test_bmp_roundtrip_all_depths():
    """8-bit palette / 24-bit BGR / 32-bit BGRA, both row orders, and
    widths that exercise the 4-byte row padding."""
    from akvorado_spark.operators.png import bmp_decode, bmp_encode, bmp_meta

    rng = np.random.default_rng(5)
    for w in (1, 2, 3, 4, 5, 13):
        px = rng.integers(0, 256, (6, w, 3), dtype=np.uint8)
        for top_down in (False, True):
            dw, dh, ch, got = bmp_decode(bmp_encode(px, 24, top_down=top_down))
            assert (dw, dh, ch) == (w, 6, 3)
            assert np.array_equal(got, px), (w, top_down)
    # 32-bit with a real alpha plane
    rgba = rng.integers(1, 256, (5, 7, 4), dtype=np.uint8)
    blob = bmp_encode(rgba, 32)
    assert bmp_meta(blob) == (7, 5, 4)
    dw, dh, ch, got = bmp_decode(blob)
    assert ch == 4 and np.array_equal(got, rgba)
    # 3-channel input through the 32-bit layout gets alpha=255
    dw, dh, ch, got = bmp_decode(bmp_encode(rgba[:, :, :3], 32))
    assert ch == 4 and np.array_equal(got[:, :, :3], rgba[:, :, :3])
    assert (got[:, :, 3] == 255).all()
    # 8-bit palette (64 distinct colors)
    colors = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    pal_px = colors[rng.integers(0, 64, (9, 11))]
    blob = bmp_encode(pal_px, 8)
    assert bmp_meta(blob) == (11, 9, 3)
    dw, dh, ch, got = bmp_decode(blob)
    assert (dw, dh, ch) == (11, 9, 3) and np.array_equal(got, pal_px)


def test_bmp_zero_reserved_plane_reads_opaque_rgb():
    """A 32-bit BI_RGB file whose 4th byte is 0 everywhere follows the
    spec's 'reserved' convention — decode as opaque RGB, not an
    invisible image."""
    from akvorado_spark.operators.png import bmp_decode, bmp_encode

    px = np.full((3, 4, 4), 9, dtype=np.uint8)
    px[:, :, 3] = 0
    dw, dh, ch, got = bmp_decode(bmp_encode(px, 32))
    assert ch == 3 and (got == 9).all()


def test_bmp_malformed_and_unsupported_rejected():
    from akvorado_spark.operators.png import bmp_decode, bmp_encode

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = bmp_encode(px, 24)
    with pytest.raises(ValueError):
        bmp_decode(b"XX" + good[2:])
    with pytest.raises(ValueError):
        bmp_decode(good[:40])  # truncated header
    with pytest.raises(ValueError):
        bmp_decode(good[:-8])  # truncated pixel rows
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8 on a 24-bit image: RLE decodes now (r12),
    # but the compression/depth pairing is spec-illegal
    with pytest.raises(ValueError):
        bmp_decode(bytes(rle))
    bitfields = bytearray(good)
    bitfields[30] = 3  # BI_BITFIELDS stays declared-unsupported
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(bitfields))
    deep = bytearray(good)
    deep[28] = 16  # 16-bit
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(deep))
    with pytest.raises(ValueError):
        bmp_encode(px, 12)


def test_image_features_decodes_bmp(spark):
    from akvorado_spark.operators.multimodal import image_features
    from akvorado_spark.operators.png import bmp_encode

    px = np.zeros((3, 5, 3), dtype=np.uint8)
    px[:, :, 0] = 100
    px[:, :, 2] = 50
    df = spark.createDataFrame(
        [(4, bytearray(bmp_encode(px, 24)))], "doc_id long, media binary"
    )
    row = image_features(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (5, 3, 3)
    assert row["mean"] == [100.0, 0.0, 50.0]


def test_flac_streaminfo_metadata(spark):
    """FLAC STREAMINFO header parse (hand-built per the format spec):
    rate 20 bits / channels-1 3 / bits-1 5 / total 36, big-endian at
    block offset 10 — routed through decode_audio."""
    import struct as _s

    from akvorado_spark.operators.multimodal import decode_audio
    from akvorado_spark.operators.wav import flac_meta, is_flac

    rate, channels, bits, total = 44100, 2, 16, 123456
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    block = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    blob = b"fLaC" + bytes([0x80]) + _s.pack(">I", 34)[1:] + block
    assert is_flac(blob)
    assert flac_meta(blob) == (channels, rate, bits, total)
    with pytest.raises(ValueError):
        flac_meta(b"fLaX" + blob[4:])
    with pytest.raises(ValueError):
        flac_meta(blob[:20])
    df = spark.createDataFrame([(5, bytearray(blob))], "doc_id long, media binary")
    row = decode_audio(df).collect()[0]
    assert (row["channels"], row["sample_rate"], row["bits"],
            row["n_frames"], row["fmt"]) == (2, 44100, 16, 123456, "flac")


def test_adam7_interlace_roundtrips_and_differs_on_wire():
    """Adam7 (r12): every pass is an independently filtered sub-image;
    the wire bytes differ from the sequential encoding but the decoded
    pixels are identical — across sizes that exercise empty and
    single-pixel passes."""
    rng = np.random.default_rng(31)
    for shape in ((1, 1), (2, 3), (8, 8), (5, 17), (13, 9)):
        for ch in (1, 3, 4):
            px = rng.integers(0, 256, (*shape, ch), dtype=np.uint8)
            inp = px[:, :, 0] if ch == 1 else px
            seq = png_encode(inp, filters=[0, 1, 2, 3, 4])
            lace = png_encode(inp, filters=[0, 1, 2, 3, 4], interlace=True)
            if shape != (1, 1):
                assert seq != lace
            for blob in (seq, lace):
                w, h, gch, got = png_decode(blob)
                assert (w, h, gch) == (shape[1], shape[0], ch)
                assert np.array_equal(got.reshape(px.shape), px)


def test_16bit_roundtrips_native_uint16():
    """16-bit samples (r12): big-endian on the wire, filters operate on
    bytes with the widened left-neighbor offset, uint16 back out."""
    rng = np.random.default_rng(32)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 1 << 16, (6, 9, ch), dtype=np.uint16)
        inp = px[:, :, 0] if ch == 1 else px
        for interlace in (False, True):
            blob = png_encode(inp, filters=[4, 3, 2, 1, 0], interlace=interlace)
            w, h, gch, got = png_decode(blob)
            assert got.dtype == np.uint16
            assert (w, h, gch) == (9, 6, ch)
            assert np.array_equal(got.reshape(px.shape), px), (ch, interlace)
    # byte-level filter offset regression: a 0→65535 horizontal step
    # under the Sub filter must survive (per-byte lanes, bpp offset)
    g = np.array([[0, 65535, 0, 257]], dtype=np.uint16)
    got = png_decode(png_encode(g, filters=[1]))[3]
    assert got[0, :, 0].tolist() == [0, 65535, 0, 257]


def test_png_meta_still_o1_for_16bit_and_interlaced():
    from akvorado_spark.operators.png import png_meta

    px = np.zeros((4, 5), dtype=np.uint16)
    blob = png_encode(px, interlace=True)
    assert png_meta(blob) == (5, 4, 1)


def test_png_bitflip_corruption_never_hangs_or_crashes_unsafely():
    """Parity with the TIFF/GIF fuzz: any single bit flip either still
    decodes to a correctly-shaped array or raises the typed errors —
    never an IndexError/infinite loop — across depth and interlace
    rotations (zlib.error covers flips inside the deflate stream)."""
    rng = np.random.default_rng(41)
    for seed in range(40):
        depth16 = seed % 3 == 0
        hi, dt = (1 << 16, np.uint16) if depth16 else (256, np.uint8)
        px = rng.integers(0, hi, (5, 6, 3)).astype(dt)
        blob = bytearray(
            png_encode(px, filters=[seed % 5], interlace=bool(seed % 2))
        )
        pos = int(rng.integers(8, len(blob)))
        blob[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            w, h, ch, got = png_decode(bytes(blob))
            assert got.shape == (h, w, ch)
        except (ValueError, NotImplementedError, zlib.error):
            pass


def test_subbyte_gray_roundtrips_scaled():
    """1/2/4-bit grayscale (r12): MSB-first packing, byte-boundary row
    padding, filters at the one-byte offset; the decoder scales values
    to 0..255 with the exactly-integral factors 255/85/17."""
    rng = np.random.default_rng(51)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for interlace in (False, True):
            for shape in ((1, 1), (3, 2), (8, 8), (5, 17), (7, 1)):
                px = rng.integers(0, 1 << depth, shape).astype(np.uint8)
                blob = png_encode(px, filters=[0, 1, 2, 3, 4],
                                  interlace=interlace, bit_depth=depth)
                w, h, ch, got = png_decode(blob)
                assert (w, h, ch) == (shape[1], shape[0], 1)
                assert np.array_equal(got[:, :, 0], px * scale), (depth, interlace, shape)


def test_subbyte_palette_hand_built():
    """2-bit palette row: indices 0,1,2,3,1 pack to 0b00011011
    0b01000000 (padding bits meaningless) and expand through the
    PLTE."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    lines = bytes([0, 0b00011011, 0b01000000])
    ihdr = struct.pack(">IIBBBBB", 5, 1, 2, 3, 0, 0, 0)
    blob = (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))
    w, h, ch, got = png_decode(blob)
    assert (w, h, ch) == (5, 1, 3)
    assert got[0].tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9], [0, 255, 0]
    ]


def test_illegal_depth_color_combos_rejected():
    for depth, ct in ((4, 2), (2, 6), (1, 4), (16, 3), (3, 0), (32, 0)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ct, 0, 0, 0)
        blob = (PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                + chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            png_decode(blob)
    with pytest.raises(ValueError):
        png_encode(np.array([[5]], dtype=np.uint8), bit_depth=2)  # 5 >= 4


def test_wav_wide_depths_float_and_extensible(spark):
    """r12: 24/32-bit integer PCM, float32/64 PCM, and the
    WAVE_FORMAT_EXTENSIBLE wrapper (what real encoders emit for
    >16-bit) all decode; decode_audio reports the right fmt string,
    integer sums for integer PCM, and Σs² only where int64-safe."""
    from akvorado_spark.operators.multimodal import decode_audio
    from akvorado_spark.operators.wav import wav_decode, wav_encode

    b24 = wav_encode(48000, [[-(1 << 23), 1000, 7]], bits=24, extensible=True)
    bf32 = wav_encode(16000, [[0.5, -0.25]], bits=32, float_format=True)
    b32 = wav_encode(8000, [[-(1 << 31), (1 << 31) - 1]], bits=32)
    df = spark.createDataFrame(
        [(1, bytearray(b24)), (2, bytearray(bf32)), (3, bytearray(b32))],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert rows[1]["fmt"] == "wav/pcm24" and rows[1]["bits"] == 24
    assert rows[1]["ch_sum"] == [-(1 << 23) + 1007] and rows[1]["ch_sqsum"] == []
    assert rows[2]["fmt"] == "wav/float32" and rows[2]["ch_sum"] == []
    assert wav_decode(bf32)[2] == [[0.5, -0.25]]
    assert rows[3]["fmt"] == "wav/pcm32"
    assert rows[3]["ch_sum"] == [-1]  # -(2^31) + 2^31 - 1


def test_wav_unsupported_depths_still_loud():
    import pytest as _pytest

    from akvorado_spark.operators.wav import wav_decode, wav_encode

    with _pytest.raises(ValueError):
        wav_encode(8000, [[1]], bits=12)
    blob = bytearray(wav_encode(8000, [[1, 2]], bits=16))
    # flip the fmt tag to 2 (ADPCM): decode must refuse, not mis-read
    import struct as _struct

    _struct.pack_into("<H", blob, 20, 2)
    with _pytest.raises(ValueError):
        wav_decode(bytes(blob))


def test_trns_transparency_all_color_types():
    """tRNS (r12): gray carries a transparent sample at the SOURCE
    depth (compared before sub-byte scaling) -> GA output; RGB carries
    an RGB sample -> RGBA; palette carries per-entry alpha with
    missing entries opaque -> RGBA; png_meta channel counts agree
    without touching the IDAT."""
    from akvorado_spark.operators.png import png_meta

    g = np.array([[10, 20], [10, 30]], dtype=np.uint8)
    blob = png_encode(g, transparent=10)
    w, h, ch, got = png_decode(blob)
    assert (w, h, ch) == (2, 2, 2)
    assert got[:, :, 1].tolist() == [[0, 255], [0, 255]]
    assert png_meta(blob) == (2, 2, 2)

    g16 = np.array([[1000, 65535]], dtype=np.uint16)
    got = png_decode(png_encode(g16, transparent=65535))[3]
    assert got.dtype == np.uint16 and got[0, :, 1].tolist() == [65535, 0]

    g2 = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    got = png_decode(png_encode(g2, bit_depth=2, transparent=3))[3]
    assert got[0, :, 0].tolist() == [0, 85, 170, 255]
    assert got[0, :, 1].tolist() == [255, 255, 255, 0]

    c = np.array([[[1, 2, 3], [9, 9, 9]]], dtype=np.uint8)
    blob = png_encode(c, transparent=(9, 9, 9))
    w, h, ch, got = png_decode(blob)
    assert ch == 4 and got[0, 0, 3] == 255 and got[0, 1, 3] == 0
    assert png_meta(blob) == (2, 1, 4)

    # palette tRNS, hand-built: per-entry alpha, short chunk = opaque
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    lines = bytes([0, 0, 1, 2, 1])
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 3, 0, 0, 0)
    blob = (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"tRNS", bytes([128, 0]))
            + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))
    w, h, ch, got = png_decode(blob)
    assert (w, h, ch) == (4, 1, 4)
    assert got[0].tolist() == [
        [255, 0, 0, 128], [0, 255, 0, 0], [0, 0, 255, 255], [0, 255, 0, 0]
    ]
    assert png_meta(blob) == (4, 1, 4)
    # truncated tRNS on gray/RGB fails loudly
    bad = (PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
           + chunk(b"tRNS", b"\x01")
           + chunk(b"IDAT", zlib.compress(bytes([0, 7]))) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        png_decode(bad)


def test_meta_decode_agreement_under_trns_truncation():
    """Sweep tRNS body truncation across every color type that can
    carry one: for each length, png_meta and png_decode must AGREE —
    either decode succeeds and channels match, or decode raises
    ValueError and meta reports the no-tRNS channel count (it must not
    claim a transparency channel decode refuses to produce; the same
    meta-vs-decode class as the gif_meta GCE guard)."""
    from akvorado_spark.operators.png import png_meta

    def build(color_type, bit_depth, scan, trns_body, plte=None):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bit_depth, color_type, 0, 0, 0)
        out = PNG_MAGIC + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        out += chunk(b"tRNS", trns_body)
        return out + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")

    gray8 = bytes([0, 7, 9]) * 2               # filter0 + 2 px, 2 rows
    gray16 = bytes([0, 0, 7, 0, 9]) * 2
    rgb8 = bytes([0, 1, 2, 3, 4, 5, 6]) * 2
    rgb16 = bytes([0] + list(range(12))) * 2
    pal = bytes(range(12))                      # 4 RGB entries
    pal8 = bytes([0, 1, 2]) * 2
    cases = [
        # (color_type, depth, scan, full tRNS, plte, base_ch, trns_ch)
        (0, 8, gray8, struct.pack(">H", 7), None, 1, 2),
        (0, 16, gray16, struct.pack(">H", 7), None, 1, 2),
        (2, 8, rgb8, struct.pack(">HHH", 1, 2, 3), None, 3, 4),
        (2, 16, rgb16, struct.pack(">HHH", 1, 2, 3), None, 3, 4),
        (3, 8, pal8, bytes([10, 20]), pal, 3, 4),
    ]
    agreements = 0
    for ct, depth, scan, full, plte, base_ch, trns_ch in cases:
        for cut in range(len(full) + 1):
            blob = build(ct, depth, scan, full[:cut], plte)
            try:
                _, _, dch, _ = png_decode(blob)
            except ValueError:
                dch = None
            w, h, mch = png_meta(blob)
            assert (w, h) == (2, 2)
            if dch is not None:
                assert mch == dch, (ct, depth, cut)
            else:
                # decode refused the truncated chunk: meta must fall
                # back to the opaque channel count, never claim alpha
                assert mch == base_ch, (ct, depth, cut)
            agreements += 1
        # the untruncated case must really exercise the alpha channel
        assert png_meta(build(ct, depth, scan, full, plte))[2] == trns_ch
    assert agreements >= 20


def test_meta_decode_agreement_gif_and_tiff():
    """The sibling formats' meta walks already guard truncated
    transparency/tag structures — pin the agreement alongside PNG's."""
    from akvorado_spark.operators.gif import gif_decode, gif_encode, gif_meta
    from akvorado_spark.operators.tiff import tiff_decode, tiff_encode, tiff_meta

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for kwargs in ({}, {"transparent_color": (0, 1, 2)}):
        blob = gif_encode(px, **kwargs)
        w, h, dch, _ = gif_decode(blob)
        assert gif_meta(blob) == (w, h, dch)
    # GCE sweep: every truncated GCE body length must keep them agreed
    for body_len in range(5):
        gce = bytes([0x21, 0xF9, body_len]) + bytes([0x01] * body_len) + b"\x00"
        base = gif_encode(px)
        # splice the GCE right before the image descriptor (0x2C)
        at = base.index(b"\x2c")
        blob = base[:at] + gce + base[at:]
        try:
            dch = gif_decode(blob)[2]
        except ValueError:
            continue
        assert gif_meta(blob)[2] == dch, body_len
    for kwargs in ({}, {"compression": "lzw"}, {"tiled": True}):
        try:
            tblob = tiff_encode(px, **kwargs)
        except TypeError:  # option not supported by this signature
            continue
        w, h, dch, _ = tiff_decode(tblob)
        assert tiff_meta(tblob) == (w, h, dch)

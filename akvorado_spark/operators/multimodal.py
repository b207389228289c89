"""Multimodal column operators: image/audio/video as opaque binary +
typed metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition sizing)
is real and tested.  Image decode is REAL for PNG, baseline AND
progressive JPEG, GIF (stills and, via :func:`animation_features`,
full disposal-composed animations), BMP, baseline TIFF and lossless
WebP (VP8L) via the pure-stdlib codecs in ``operators/png.py`` /
``jpeg.py`` / ``gif.py`` / ``tiff.py`` / ``vp8l.py`` (no Pillow in
this container); other formats fall back to PIL when present, else
raise — and ``decode_image(..., fake=True)`` substitutes a
deterministic synthetic decode so the pipeline shape stays executable
anywhere.  PCM WAV audio decodes natively (``operators/wav.py``);
compressed audio gets header metadata and video decode remains
stubbed (no codecs in the container).

At 100 TB: media bytes dominate row size, so these operators
repartition by byte budget (``target_rows_per_batch``) before the
Arrow transfer and never collect binaries to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, format string"
)


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic fake media bytes + metadata for tests: a seeded
    pseudo-image whose bytes derive from the id."""
    return (
        df.withColumn("media", F.sha2(F.col(id_col).cast("string"), 512).cast("binary"))
        .withColumn("media_format", F.lit("fake/rgb8"))
        .withColumn("media_width", (F.col(id_col) % 16 + 1).cast("int"))
        .withColumn("media_height", (F.col(id_col) % 8 + 1).cast("int"))
    )


def decode_image(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = False,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """media binary → (id, width, height, channels, format).

    Native header metadata for PNG, JPEG, GIF, BMP, TIFF and WebP via
    the pure-stdlib parsers; unknown containers go through PIL when
    importable, else ``NotImplementedError``.  ``fake=True`` derives
    deterministic dimensions from the first bytes — keeping schema,
    batching, and partition shape real without any decodable media.

    Channel counts are HEADER-derived, O(1) per blob.  For lossless
    WebP that means the VP8L alpha-HINT bit: a foreign encoder may set
    the hint on a fully-opaque image, in which case this metadata
    reports 4 channels while ``image_features``/``vp8l_decode`` (which
    see the actual alpha plane) report 3 for the same blob.  Joins that
    must agree with pixel-level outputs should take ``channels`` from
    ``image_features``, not from here.
    """
    out_schema = IMAGE_META_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # re-chunk INSIDE the worker instead of mutating the session's
        # arrow.maxRecordsPerBatch (a plan-build side effect that would
        # silently change batching for every later Arrow op): media
        # bytes dominate memory, so bound rows per processed slice here
        def slices():
            for whole in batches:
                for off in range(0, len(whole), target_rows_per_batch):
                    yield whole.iloc[off : off + target_rows_per_batch]

        for pdf in slices():
            if fake:
                media = pdf[media_col]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "width": media.map(lambda b: (b[0] % 16) + 1),
                        "height": media.map(lambda b: (b[1] % 8) + 1),
                        "channels": 3,
                        "format": "fake/rgb8",
                    }
                )
            else:
                from akvorado_spark.operators.png import (
                    bmp_meta,
                    gif_meta,
                    is_bmp,
                    is_gif,
                    is_jpeg,
                    is_png,
                    is_webp,
                    jpeg_meta,
                    png_meta,
                    webp_meta,
                )

                rows = []
                for _, r in pdf.iterrows():
                    blob = bytes(r[media_col])
                    if is_png(blob):
                        # IHDR-only: dims + channels need no inflate
                        # (pixel decode handles 16-bit and Adam7 too,
                        # but metadata never touches the IDAT)
                        w, h, ch = png_meta(blob)
                        rows.append((r[id_col], w, h, ch, "PNG"))
                        continue
                    if is_jpeg(blob):
                        # header-only: SOF dims/channels need no codec
                        w, h, ch = jpeg_meta(blob)
                        rows.append((r[id_col], w, h, ch, "JPEG"))
                        continue
                    if is_gif(blob):
                        w, h, ch = gif_meta(blob)
                        rows.append((r[id_col], w, h, ch, "GIF"))
                        continue
                    if is_bmp(blob):
                        w, h, ch = bmp_meta(blob)
                        rows.append((r[id_col], w, h, ch, "BMP"))
                        continue
                    from akvorado_spark.operators.tiff import (
                        is_tiff,
                        tiff_meta,
                    )

                    if is_tiff(blob):
                        # IFD walk only — no strip access
                        w, h, ch = tiff_meta(blob)
                        rows.append((r[id_col], w, h, ch, "TIFF"))
                        continue
                    if is_webp(blob):
                        from akvorado_spark.operators.vp8l import is_vp8l

                        # metadata is header-only for every WebP
                        # flavor: the VP8L header carries 14-bit w/h
                        # and the alpha-hint bit, so a 16k×16k
                        # lossless file costs O(1) here; pixel decode
                        # (operators/vp8l.py) runs only where pixels
                        # are consumed (image_features)
                        w, h, ch = webp_meta(blob)
                        fmt = "WEBP/VP8L" if is_vp8l(blob) else "WEBP"
                        rows.append((r[id_col], w, h, ch, fmt))
                        continue
                    try:  # pragma: no cover - PIL absent in container
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(blob))
                        rows.append((r[id_col], img.width, img.height,
                                     len(img.getbands()), img.format))
                    except ImportError as e:
                        raise NotImplementedError(
                            "unknown image container needs Pillow/libvips; "
                            "not in this container — PNG, JPEG (baseline + "
                            "progressive), GIF, BMP and lossless WebP decode "
                            "natively "
                            "(operators/png.py, jpeg.py, gif.py, vp8l.py), "
                            "or pass fake=True for the deterministic stub"
                        ) from e
                yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "channels", "format"])

    return df.mapInPandas(run, schema=out_schema)


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean array<double>, std array<double>"
)


def image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    resize_to: tuple[int, int] | None = None,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """PNG / baseline-JPEG / GIF / BMP / TIFF / lossless-WebP media →
    per-channel mean/std feature rows (the feature-extract stage of a
    multimodal pipeline), optionally after a deterministic
    nearest-neighbor resize.  Pure stdlib+numpy; runs in Arrow-batched
    workers, binaries never reach the driver."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from akvorado_spark.operators.jpeg import (
            is_baseline_jpeg,
            jpeg_decode,
        )
        from akvorado_spark.operators.gif import gif_decode
        from akvorado_spark.operators.gif import is_gif as is_gif_blob
        from akvorado_spark.operators.tiff import is_tiff as is_tiff_blob
        from akvorado_spark.operators.tiff import tiff_decode
        from akvorado_spark.operators.png import (
            bmp_decode,
            is_bmp,
            is_png,
            png_decode,
            resize_nearest,
        )

        def slices():
            for whole in batches:
                for off in range(0, len(whole), target_rows_per_batch):
                    yield whole.iloc[off : off + target_rows_per_batch]

        for pdf in slices():
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[media_col])
                if is_png(blob):
                    w, h, ch, px = png_decode(blob)
                elif is_baseline_jpeg(blob):
                    w, h, ch, px = jpeg_decode(blob)
                elif is_gif_blob(blob):
                    w, h, ch, px = gif_decode(blob)
                elif is_bmp(blob):
                    w, h, ch, px = bmp_decode(blob)
                elif is_tiff_blob(blob):
                    w, h, ch, px = tiff_decode(blob)
                else:
                    from akvorado_spark.operators.vp8l import (
                        is_vp8l,
                        vp8l_decode,
                    )

                    if is_vp8l(blob):
                        w, h, ch, px = vp8l_decode(blob)
                    else:
                        raise ValueError(
                            "image_features: unsupported image container "
                            "(PNG, JPEG incl. progressive, GIF, BMP, TIFF and "
                            "lossless WebP decode natively)"
                        )
                if resize_to is not None:
                    px = resize_nearest(px, *resize_to)
                    h, w = px.shape[0], px.shape[1]
                flat = px.reshape(-1, ch).astype(np.float64)
                rows.append((
                    r[id_col], w, h, ch,
                    [float(x) for x in flat.mean(axis=0)],
                    [float(x) for x in flat.std(axis=0)],
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "mean", "std"],
            )

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_frames: int, id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling *plan*: expands (id, n_frames) to one row
    per sampled frame index — the distribution/partitioning half of a
    frame extractor.  For animated GIFs the decode half is REAL:
    :func:`animation_features` composes the same sampled indices with
    the stdlib codec; for video containers the decode stays stubbed
    (no codecs in this environment)."""
    # zero-frame (corrupt/empty) videos plan NO samples — greatest(-1,0)
    # would otherwise schedule frame 0 of a frameless video
    return df.filter(F.col("n_frames") > 0).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n_frames))
        ).alias("frame_idx"),
    )


ANIMATION_FEATURES_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, width int, height int, "
    "px_sum long"
)


def animation_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n_frames: int = 1,
    max_frames: int = 64,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Animated GIF → one row per SAMPLED composed frame: (id,
    frame_idx, n_frames, width, height, integer pixel sum).

    Frames are composed per the GIF89a disposal methods
    (:func:`~akvorado_spark.operators.gif.gif_decode_frames`) and then
    sampled at indices 0, n, 2n… — exactly the indices
    :func:`frame_sample_plan` schedules, so the two halves of the
    frame-extraction pipeline agree by construction.  Still GIFs yield
    their single frame.  ``max_frames`` bounds hostile inputs: at
    corpus scale one row must never decode an unbounded animation.
    Lossless codec + integer sums ⇒ every output value is exactly
    replayable by an oracle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from akvorado_spark.operators.gif import gif_decode_frames, is_gif

        def slices():
            for whole in batches:
                for off in range(0, len(whole), target_rows_per_batch):
                    yield whole.iloc[off : off + target_rows_per_batch]

        for pdf in slices():
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[media_col])
                if not is_gif(blob):
                    raise ValueError(
                        "animation_features: only GIF animations decode "
                        "natively; video containers need external codecs"
                    )
                w, h, frames = gif_decode_frames(blob, max_frames=max_frames)
                n = len(frames)
                for fi in range(0, n, every_n_frames):
                    rows.append((
                        r[id_col], fi, n, w, h,
                        int(frames[fi].astype(np.int64).sum()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "n_frames", "width",
                         "height", "px_sum"],
            )

    return df.mapInPandas(run, schema=ANIMATION_FEATURES_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits int, n_frames long, "
    "fmt string, ch_sum array<long>, ch_sqsum array<long>"
)


def decode_audio(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """audio binary → (id, channels, sample_rate, bits, n_frames, fmt,
    per-channel Σsample, Σsample²) — REAL decode for PCM WAV via the
    pure-stdlib codec (``operators/wav.py``); compressed formats fall
    back to PIL-era behavior: a clear NotImplementedError naming the
    missing codec.  The integer sample sums are the exact,
    order-independent feature primitives (mean/RMS derive from them)
    and the values an oracle can replay."""
    out_schema = AUDIO_META_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from akvorado_spark.operators.wav import (
            flac_meta,
            is_flac,
            is_mp3,
            is_ogg,
            is_wav,
            mp3_meta,
            ogg_vorbis_meta,
            wav_decode,
            wav_meta,
        )

        def slices():
            for whole in batches:
                for off in range(0, len(whole), target_rows_per_batch):
                    yield whole.iloc[off : off + target_rows_per_batch]

        for pdf in slices():
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[media_col])
                if is_ogg(blob):
                    # header metadata only: sample decode needs the
                    # Vorbis MDCT pipeline (environment-blocked)
                    ch, rate = ogg_vorbis_meta(blob)
                    rows.append((r[id_col], ch, rate, 0, 0,
                                 "ogg/vorbis", [], []))
                    continue
                if is_flac(blob):
                    # STREAMINFO metadata only: sample decode is the
                    # Rice/LPC pipeline (see COVERAGE.md closure)
                    ch, rate, bits, total = flac_meta(blob)
                    rows.append((r[id_col], ch, rate, bits, total,
                                 "flac", [], []))
                    continue
                if not is_wav(blob) and is_mp3(blob):
                    ch, rate, kbps = mp3_meta(blob)
                    rows.append((r[id_col], ch, rate, 0, 0,
                                 f"mp3/{kbps}kbps", [], []))
                    continue
                if not is_wav(blob):
                    raise NotImplementedError(
                        "unrecognized audio container; PCM WAV decodes "
                        "natively, MP3/Ogg-Vorbis/FLAC get header "
                        "metadata — anything else needs an external "
                        "codec this container lacks"
                    )
                channels, rate, bits, n_frames, tag = wav_meta(blob)
                if tag == 1 and bits in (8, 16, 24, 32):
                    _, _, chans = wav_decode(blob)
                    sums = [sum(c) for c in chans]
                    # Σs² stays int64-safe for ~8e9 frames at 16 bits,
                    # but only ~131k at 24 and ~2 at full-scale 32 —
                    # wider depths report Σs only (consumers needing
                    # RMS at those depths read samples via wav_decode)
                    sqs = (
                        [sum(x * x for x in c) for c in chans]
                        if bits <= 16 else []
                    )
                else:
                    # float PCM (tag 3) decodes via wav_decode, but its
                    # sums are not integer-replayable — feature columns
                    # stay empty here and consumers read samples direct
                    sums, sqs = [], []
                rows.append(
                    (r[id_col], channels, rate, bits, n_frames,
                     f"wav/pcm{bits}" if tag == 1
                     else (f"wav/float{bits}" if tag == 3 else f"wav/tag{tag}"),
                     sums, sqs)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "channels", "sample_rate", "bits",
                         "n_frames", "fmt", "ch_sum", "ch_sqsum"],
            )

    return df.mapInPandas(run, schema=out_schema)

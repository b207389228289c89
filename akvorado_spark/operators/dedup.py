"""Deduplication operators for large-scale document pipelines.

Four families, each designed for the 100 TB shape:

- **exact**: sha2(content) → groupBy hash → keep min id.  One shuffle
  on a 32-byte key instead of full documents; survivors join back by
  id if full rows are needed.
- **MinHash + LSH**: shingle → n seeded xxhash64 minima (one pass,
  no per-hash shuffle) → band buckets → candidate pairs only within
  buckets (no all-pairs blowup) → exact n-gram Jaccard verification
  of candidates.
- **SimHash**: 64-bit sign-aggregated token hashes; near-dups share
  bands of the fingerprint (Hamming-adjacent buckets).
- **exact n-gram Jaccard**: the verification primitive — relational
  explode + join on shared grams, |A∩B| / (|A|+|B|-|A∩B|).

All hot paths are built-in functions (xxhash64, explode, groupBy);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Survivor per identical-content group (lowest id wins).

    Output: id, hash, group size.  Shuffles 32-byte hashes, not texts.
    """
    h = F.sha2(F.col(text_col), 256).alias("__h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
        .withColumnRenamed("__h", "content_hash")
    )


# ---------------------------------------------------------------------------
# shingling / n-grams
# ---------------------------------------------------------------------------


def word_ngrams(text, n: int = 3):
    """Distinct word n-grams of a text column (lower-cased, whitespace
    tokenized) as an array<string> — pure higher-order functions."""
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 32, ngram: int = 3
) -> DataFrame:
    """id → minhash signature (array<long>, one min per seeded hash).

    One explode + one groupBy: each shingle row computes all
    ``n_hashes`` seeded xxhash64 values (JVM intrinsics), the groupBy
    takes per-seed minima map-side before the shuffle.
    """
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), ngram)).alias("__g")
    )
    mins = [
        F.min(F.xxhash64(F.col("__g"), F.lit(i))).alias(f"__m{i}")
        for i in range(n_hashes)
    ]
    sig = grams.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[F.col(f"__m{i}") for i in range(n_hashes)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, bands: int = 8, n_hashes: int | None = None
) -> DataFrame:
    """Candidate near-dup pairs: ids sharing any LSH band bucket.

    Bucket key = hash of one signature slice; join happens only within
    buckets, so cost follows bucket occupancy, not n².  Output columns
    ``id_a < id_b`` (distinct pairs).  Pass ``n_hashes`` (the signature
    width) to stay lazy — the fallback probes one row, which costs a
    full pass over the signature pipeline.
    """
    n = n_hashes or len(signatures.select("signature").first()["signature"])
    rows_per_band = max(n // bands, 1)
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame | None = None,
    ngram: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity.

    With ``pairs`` (id_a, id_b) given — e.g. LSH candidates — only
    those pairs are scored (two broadcast-or-shuffle hash joins).
    Without, all pairs sharing ≥1 gram are scored via the relational
    identity |A∩B| = count of shared grams (explode + self-join on
    gram, then group by pair) — no cartesian product.
    """
    grams = df.select(
        F.col(id_col).alias("__id"), F.explode(word_ngrams(F.col(text_col), ngram)).alias("__g")
    )
    sizes = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))

    inter = (
        grams.alias("x")
        .join(grams.alias("y"), (F.col("x.__g") == F.col("y.__g")) & (F.col("x.__id") < F.col("y.__id")))
        .groupBy(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["id_a", "id_b"], "inner")
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Token hashes vote per bit position; the fingerprint sets bits with
    positive vote sums.  Pure built-ins: explode tokens → per-bit sign
    contribution via bit tests → groupBy sum → bit reassembly.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("__w"),
    ).withColumn("__h", F.xxhash64("__w"))
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__v{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"__v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return votes.select(F.col(id_col), fp.alias("simhash"))


def simhash_candidate_pairs(fps: DataFrame, id_col: str, bands: int = 4) -> DataFrame:
    """Near-dup candidates: documents sharing any 16-bit band of the
    fingerprint (Hamming distance ≤ (bands-1) per the pigeonhole
    principle when distance < bands)."""
    width = 64 // bands
    mask = (1 << width) - 1
    banded = fps.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )

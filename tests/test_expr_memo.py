"""r13 expression-construction memos: the memoized Column trees must be
(a) actual cache hits — same object back for the same key — and
(b) semantically identical to fresh construction (same results when
the cached tree is reused across different DataFrames).

These memos cache *plan fragments* (immutable expression trees keyed
on operand text / request constants), never data: every query still
executes from its inputs.  A regression here would show up as either
rebuilt-every-time (perf) or a wrong-column reuse (correctness), so
both directions are pinned.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_dot_norm_memo_hits_and_values(spark):
    from akvorado_spark.operators.similarity import dot, norm

    c1 = dot(F.col("x"), F.col("y"))
    c2 = dot(F.col("x"), F.col("y"))
    assert c1 is c2  # cache hit on identical operand text
    assert dot(F.col("x"), F.col("z")) is not c1  # different key

    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0], [1.0, 0.0])],
        "x array<double>, y array<double>, z array<double>",
    )
    row = df.select(
        c1.alias("d"), norm(F.col("x")).alias("n")
    ).first()
    assert row["d"] == pytest.approx(11.0)
    assert row["n"] == pytest.approx(np.sqrt(5.0))
    # the SAME cached Column applied to a different frame with the same
    # column names resolves against THAT frame (unresolved-by-name)
    df2 = spark.createDataFrame(
        [([2.0, 0.0], [5.0, 7.0])], "x array<double>, y array<double>"
    )
    assert df2.select(c1.alias("d")).first()["d"] == pytest.approx(10.0)


def test_lsh_sketch_memo_consistency(spark):
    from akvorado_spark.operators.similarity import _hyperplanes, lsh_sketch

    planes = _hyperplanes(4, 6, seed=7)
    s1 = lsh_sketch(F.col("v"), planes)
    s2 = lsh_sketch(F.col("v"), planes)
    assert s1 is s2
    # different planes → different key → different sketch expression
    other = _hyperplanes(4, 6, seed=8)
    assert lsh_sketch(F.col("v"), other) is not s1

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, -float(i), 0.5]) for i in range(8)],
        "id long, v array<double>",
    )
    a = [r["s"] for r in df.select(s1.alias("s")).orderBy("id").collect()]
    b = [r["s"] for r in df.select(s2.alias("s")).orderBy("id").collect()]
    assert a == b


def test_simhash_noncanonical_hash_fn_not_memoized(spark):
    """A custom hash_fn must not collide with the canonical families'
    memoized minhash aggregate list, and simhash's memoized vote set is
    keyed only on bits (hash applied upstream), so results track the
    hash function, not the cache."""
    from akvorado_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    fp_xx = {r["doc_id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    # identical docs agree, different docs (generically) differ
    assert fp_xx[1] == fp_xx[2]

    custom = lambda c: F.abs(F.xxhash64(c, F.lit(99)))  # noqa: E731
    fp_c = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "text", "doc_id", hash_fn=custom).collect()
    }
    assert fp_c[1] == fp_c[2]
    assert fp_c != fp_xx  # the custom hash actually took effect


def test_line_bucket_expr_memo(spark):
    from akvorado_spark.query.line import _bucket_col

    b1 = _bucket_col("ts", 600_000_000)
    b2 = _bucket_col("ts", 600_000_000)
    assert b1 is b2
    assert _bucket_col("ts", 900_000_000) is not b1
    assert _bucket_col("other_ts", 600_000_000) is not b1


def test_bound_column_operand_never_cached(spark):
    """r14 guardrail (VERDICT r13 #5): a frame-bound operand (df["x"] —
    prints identically to F.col("x")) must build a working tree WITHOUT
    entering the memo, so it can neither poison later unresolved
    callers nor be handed a foreign frame's resolved attribute."""
    import numpy as np

    from akvorado_spark.functions.memo import cacheable_operands
    from akvorado_spark.operators.similarity import _FOLD_MEMO, norm

    df1 = spark.createDataFrame([([3.0, 4.0],)], "bx array<double>")
    df2 = spark.createDataFrame([([6.0, 8.0],)], "bx array<double>")

    assert cacheable_operands(F.col("bx"))
    assert not cacheable_operands(df1["bx"])
    assert not cacheable_operands(F.col("a"), df1["bx"])  # any bound → no
    assert not cacheable_operands(df1["bx"].cast("array<double>"))  # nested

    # bound operand: correct result, memo untouched
    before = len(_FOLD_MEMO)
    nb = norm(df1["bx"])
    assert len(_FOLD_MEMO) == before
    assert df1.select(nb.alias("n")).first()["n"] == pytest.approx(5.0)

    # an unresolved caller AFTER the bound one gets a clean by-name
    # tree that resolves on ITS frame (this failed with
    # MISSING_ATTRIBUTES when bound trees could enter the memo)
    nu = norm(F.col("bx"))
    assert df2.select(nu.alias("n")).first()["n"] == pytest.approx(10.0)
    assert norm(F.col("bx")) is nu  # and it IS cached


def test_pq_assignment_and_table_memo_hits(spark):
    """r14: the codebook-parameterized trees (assignment argmin, ADC
    table) memoize on (operand text, book VALUES) — the inner lambda
    variables print fresh names every build, so without these outer
    memos every query build reconstructed them (measured ~1.2 s of
    py4j per lmdata build)."""
    from akvorado_spark.operators.pq import _adc_table_expr, _assign_expr

    book = [[1, 2], [3, 4]]
    a1 = _assign_expr(F.col("sv"), book)
    assert _assign_expr(F.col("sv"), book) is a1          # hit
    assert _assign_expr(F.col("sv"), [[1, 2], [3, 5]]) is not a1  # values key
    assert _assign_expr(F.col("other"), book) is not a1   # operand key
    t1 = _adc_table_expr(F.col("qv"), book)
    assert _adc_table_expr(F.col("qv"), book) is t1

    df = spark.createDataFrame([([1, 2],), ([3, 5],)], "sv array<int>")
    got = [r["c"] for r in df.select(a1.alias("c")).collect()]
    assert got == [0, 1]  # argmin against the book, ties impossible here


def test_doc_bigrams_memo_keyed_on_key_fn_identity(spark):
    from akvorado_spark.operators.lm import _GRAMS_MEMO, doc_bigrams
    from akvorado_spark.operators.text import portable_word_hash

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    n0 = len(_GRAMS_MEMO)
    doc_bigrams(df, "text", "doc_id", key_fn=portable_word_hash)
    n1 = len(_GRAMS_MEMO)
    doc_bigrams(df, "text", "doc_id", key_fn=portable_word_hash)
    assert len(_GRAMS_MEMO) == n1  # second build hit the memo
    # a DIFFERENT callable may not receive the first one's tree
    doc_bigrams(df, "text", "doc_id", key_fn=lambda c: c)
    assert len(_GRAMS_MEMO) == n1 + 1
    assert n1 > n0

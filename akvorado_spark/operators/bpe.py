"""Byte-pair-encoding tokenizer training and application.

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") learned the Spark-shaped way: the corpus is
scanned ONCE into a word-frequency table (vocabulary-bounded, not
corpus-bounded), and every merge iteration runs on that table — one
pair-count aggregate + a 1-row argmax collect + a narrow symbol
rewrite.  At 100 TB the iteration cost is a function of vocabulary
size only; the corpus-sized work is the single word count up front
and the final (broadcast-joined) application pass.

Determinism: ties in pair counts break lexicographically on the pair,
so training is reproducible across partitionings and engines — the
pytest gate replays the whole trainer against a pure-Python reference.
All per-row work is built-in higher-order functions (no Python UDFs);
the greedy left-to-right merge inside a word is an ``aggregate`` fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akvorado_spark.functions.memo import LruMemo

END = "</w>"  # end-of-word marker, merged like any other symbol

# finished Column trees keyed by (kind, operand text[, merge pair]):
# each higher-order-function construction costs ~50-350 ms of py4j
# round trips (r13 measurement: 16 _merge_expr builds = 5.8 s of the
# vocab_suite build), while the finished expression is immutable and
# the deterministic trainer re-derives the same merges every
# invocation, so the keys recur
_EXPR_MEMO = LruMemo(maxsize=256)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) frequency table — the one corpus-sized aggregation."""
    from akvorado_spark.operators.text import words

    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _char_symbols(word):
    """word → [c1, c2, ..., END] as array<string> (codegen, no UDF).

    The empty-word branch is explicit: Spark's ``sequence(1, 0)``
    DESCENDS to [1, 0] instead of returning [], which would fabricate
    two empty symbols for a zero-length word."""
    def build():
        chars = F.when(
            F.length(word) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(word)),
                lambda i: word.substr(i, F.lit(1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(chars, F.array(F.lit(END)))

    return _EXPR_MEMO.get_or_build(("chars", str(word)), build)


def _merge_expr(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b — an
    aggregate fold; ``get`` (not element_at) keeps the empty-accumulator
    probe null-safe under ANSI."""
    def build():
        merged = F.lit(a + b)
        return F.aggregate(
            syms,
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.get(acc, F.size(acc) - 1) == a) & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    return _EXPR_MEMO.get_or_build(("merge", str(syms), a, b), build)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    def build():
        m = F.greatest(F.size(F.col("syms")) - 1, F.lit(1))
        return F.when(
            F.size(F.col("syms")) >= 2,
            F.zip_with(
                F.slice(F.col("syms"), 1, m),
                F.slice(F.col("syms"), 2, m),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    pairs = _EXPR_MEMO.get_or_build(("pairs", "syms"), build)
    return (
        vocab.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in rank order.

    Each iteration: pair-count aggregate over the word table (weighted
    by word frequency), argmax with a lexicographic tie-break, then a
    narrow rewrite of the symbol arrays.  The table is locally
    checkpointed per round so plans stay flat across iterations.
    Stops early when no adjacent pair remains.
    """
    wc = counts if counts is not None else word_counts(df, text_col)
    vocab = wc.select(
        "n", _char_symbols(F.col("word")).alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "n", _merge_expr(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    return merges


def segment_words(
    words_df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
    chunk: int = 8,
) -> DataFrame:
    """Apply learned merges (in rank order) to a word table →
    ``out_col`` array<string> of BPE tokens.  Merges nest as folds;
    local checkpoints every ``chunk`` merges keep the expression tree
    bounded.  Run on DISTINCT words and broadcast-join the result back
    to the corpus — application cost is vocabulary-sized."""
    out = words_df.withColumn(out_col, _char_symbols(F.col(word_col)))
    for i, (a, b) in enumerate(merges):
        out = out.withColumn(out_col, _merge_expr(F.col(out_col), a, b))
        if (i + 1) % chunk == 0:
            out = out.localCheckpoint()
    return out


def bpe_token_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    broadcast_vocab: bool = True,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-document BPE token count under a learned merge list:
    segment the DISTINCT words once, join the (word → token count)
    map back, and sum over each document's words — the corpus is
    never re-segmented row by row.

    ``broadcast_vocab`` (default True) is right while the distinct-word
    table fits executor memory; at web-scale vocabularies set False —
    the join key is ``word``, the token stream shuffles on it once,
    and AQE still picks broadcast at runtime when the measured segment
    table allows.

    ``tf`` optionally passes the shared per-document term-frequency
    table (``(id_col, term, tf)`` — the :func:`~akvorado_spark.
    operators.text.term_stats` contract): the vocabulary and the
    per-document sum (``Σ tf·tokens(word)``, exactly the per-occurrence
    sum) then derive from that aggregated table instead of re-exploding
    the corpus."""
    from akvorado_spark.operators.text import words

    if tf is not None:
        seg = segment_words(
            tf.select(F.col("term").alias("word")).distinct(), merges
        ).select("word", F.size("tokens").alias("__nt"))
        if broadcast_vocab:
            seg = F.broadcast(seg)
        return (
            tf.join(seg, F.col("term") == F.col("word"))
            .groupBy(id_col)
            .agg(F.sum(F.col("tf") * F.col("__nt")).alias("n_bpe_tokens"))
        )
    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("word"))
    seg = segment_words(toks.select("word").distinct(), merges).select(
        "word", F.size("tokens").alias("__nt")
    )
    if broadcast_vocab:
        seg = F.broadcast(seg)
    return (
        toks.join(seg, "word")
        .groupBy(id_col)
        .agg(F.sum("__nt").alias("n_bpe_tokens"))
    )

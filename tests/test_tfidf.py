"""Cross-engine verification of the TF-IDF vocabulary and keyword
extraction operators: the same tokenization, smoothed-IDF formula and
deterministic (weight DESC, term ASC) ranking are replayed in DuckDB
over the same parquet corpus and must agree value-for-value."""

from __future__ import annotations

import duckdb
import pytest

from akvorado_spark.operators.text import term_stats, tfidf_topk_terms
from akvorado_spark.sources.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR).select("doc_id", "text")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


_DUCK_TOKS = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ws
  FROM documents
)
"""


def test_term_stats_matches_duckdb(spark, docs, duck):
    got = {
        r["term"]: (r["doc_freq"], round(r["idf"], 9))
        for r in term_stats(docs, "text", "doc_id").collect()
    }
    want_rows = duck.execute(
        f"""
WITH {_DUCK_TOKS},
terms AS (SELECT DISTINCT doc_id, t.term FROM toks, UNNEST(ws) AS t(term)),
df AS (SELECT term, COUNT(*) AS doc_freq FROM terms GROUP BY term),
n AS (SELECT COUNT(*) AS N FROM documents)
SELECT term, doc_freq, LN((N + 1.0) / (doc_freq + 1.0)) + 1.0 AS idf
FROM df CROSS JOIN n
"""
    ).fetchall()
    want = {t: (d, round(i, 9)) for t, d, i in want_rows}
    assert got == want
    assert len(got) > 10  # the synthetic corpus has a small real vocabulary


def test_tfidf_topk_matches_duckdb(spark, docs, duck):
    got = sorted(
        (r["doc_id"], r["term_rank"], r["term"], r["tf"], round(r["weight"], 9))
        for r in tfidf_topk_terms(docs, "text", "doc_id", k=3).collect()
    )
    want = sorted(
        (d, rk, t, tf, round(w, 9))
        for d, rk, t, tf, w in duck.execute(
            f"""
WITH {_DUCK_TOKS},
tf AS (
  SELECT doc_id, t.term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS t(term) GROUP BY 1, 2
),
n AS (SELECT COUNT(*) AS N FROM documents),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS doc_freq FROM tf GROUP BY term
),
weighted AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (LN((n.N + 1.0) / (df.doc_freq + 1.0)) + 1.0) AS weight
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, weight,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY weight DESC, term
         ) AS term_rank
  FROM weighted
)
SELECT doc_id, term_rank, term, tf, weight FROM ranked WHERE term_rank <= 3
"""
        ).fetchall()
    )
    assert got == want


def test_tfidf_precomputed_stats_path(spark, docs):
    stats = term_stats(docs, "text", "doc_id")
    a = tfidf_topk_terms(docs, "text", "doc_id", k=2, stats=stats)
    b = tfidf_topk_terms(docs, "text", "doc_id", k=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bm25_hand_computed_small_corpus(spark):
    """Three documents, two query terms, all BM25 inputs small enough
    to replicate by hand in numpy — pins idf form, tf saturation, the
    length normalization, and the micro-rounded order-independent sum."""
    import math

    from akvorado_spark.operators.text import bm25_scores

    docs = [
        (1, "hash join hash hash"),          # dl=4, tf(hash)=3, tf(join)=1
        (2, "scan scan filter"),             # dl=3, no query terms
        (3, "join of the century"),          # dl=4, tf(join)=1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bm25_scores(
        df, "text", "doc_id", ["hash", "join"]).collect()}
    assert set(got) == {1, 3}

    n_docs, tot = 3, 11
    def contrib(tf, dfreq, dl, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
        denom = tf + k1 * ((1.0 - b) + b * (dl * n_docs / tot))
        return round(((idf * ((k1 + 1.0) * tf)) / denom) * 1e6)

    assert got[1]["matched_terms"] == 2
    assert got[1]["bm25_micro"] == contrib(3, 1, 4) + contrib(1, 2, 4)
    assert got[3]["matched_terms"] == 1
    assert got[3]["bm25_micro"] == contrib(1, 2, 4)
    # rarer term (df=1) must out-weigh the common one at equal tf/dl
    assert contrib(1, 1, 4) > contrib(1, 2, 4)


def test_bm25_plan_keeps_token_stream_narrow(spark):
    """The explode runs on the query-filtered array: the plan contains
    no per-token shuffle — only the hit aggregate, the tiny docfreq
    aggregate, broadcast joins, and the final per-doc sum."""
    from akvorado_spark.operators.text import bm25_scores

    df = spark.range(100).selectExpr(
        "id AS doc_id", "concat('hash join word', id) AS text"
    )
    plan = bm25_scores(df, "text", "doc_id", ["hash", "join"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("SortMergeJoin") == 0


def test_rrf_fuse_hand_computed(spark):
    """Two tiny rankings with a tie: contributions are round(1e6/(k+r))
    with rank ties broken by id, and a doc present in both lists sums
    both contributions."""
    a = spark.createDataFrame(
        [(1, 900), (2, 500), (3, 500)], "doc_id long, s long"
    )
    bfr = spark.createDataFrame([(3, 70), (9, 60)], "doc_id long, s long")
    from akvorado_spark.operators.text import rrf_fuse

    got = {r["doc_id"]: r for r in rrf_fuse(
        [(a, "s"), (bfr, "s")], top=2, k=60).collect()}
    # list a truncated to top-2: ranks 1->doc1, 2->doc2 (tie 500/500
    # broken by id: doc2 before doc3, doc3 dropped by the cap)
    c = lambda r: round(1e6 / (60 + r))
    assert got[1]["rrf_micro"] == c(1) and got[1]["n_sources"] == 1
    assert got[2]["rrf_micro"] == c(2)
    assert 3 in got and got[3]["rrf_micro"] == c(1) and got[3]["n_sources"] == 1
    assert got[9]["rrf_micro"] == c(2)


def test_rrf_fuse_caps_compile_to_take_ordered(spark):
    """The per-ranking truncation must be TakeOrderedAndProject — no
    ranking global-sorts its corpus before the cap."""
    from akvorado_spark.operators.text import rrf_fuse

    df = spark.range(10_000).selectExpr("id AS doc_id", "id % 97 AS s")
    plan = rrf_fuse([(df, "s"), (df, "s")], top=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

"""Round-7 LLM-data-pipeline queries: cross-document exact-substring
dedup, n-gram LM perplexity filtering (CCNet-style bucketing), and
product-quantization ANN.

Every query here is fully DuckDB-replayable: string/integer-exact
where possible (substring dedup, PQ), micro-fixed-point for the one
log-domain score (perplexity terms are rounded to 1e-6 BEFORE the
per-document sum, so the gated column is an order-independent BIGINT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.oracle.registry import register
from akvorado_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# cross-document exact-substring dedup (Lee et al. 2021, distributed)
# ---------------------------------------------------------------------------

_ES_W = 40
_ES_S = 10


def _dedup_substring(spark, sf_dir):
    from akvorado_spark.operators.dedup import exact_substring_dedup

    docs = load_table(spark, "documents", sf_dir, spread=True)
    # string-keyed gate variant (production keys windows with xxhash64;
    # pytest proves both paths emit identical spans on this corpus)
    per_doc = exact_substring_dedup(docs, "text", "doc_id", _ES_W, _ES_S).select(
        F.lit("doc").alias("member"),
        F.col("doc_id"),
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("chars_removed").cast("long").alias("chars_removed"),
        F.length("cleaned").cast("long").alias("clean_len"),
        F.substring(F.md5(F.col("cleaned").cast("binary")), 1, 16).alias(
            "clean_md5p"
        ),
    )
    total = per_doc.agg(
        F.lit("total").alias("member"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.sum("n_dup_windows").alias("n_dup_windows"),
        F.sum("n_spans").alias("n_spans"),
        F.sum("chars_removed").alias("chars_removed"),
        F.sum("clean_len").alias("clean_len"),
        F.lit("").alias("clean_md5p"),
    )
    return per_doc.unionByName(total).orderBy("member", "doc_id")


_ES_ORACLE = f"""
WITH d AS (SELECT doc_id, text FROM documents),
occ AS (
  -- content-defined anchors: 4-gram hash of chars s+1..s+4 ≡ 0 mod stride
  SELECT doc_id, CAST(t.s AS BIGINT) AS s,
         substr(text, CAST(t.s AS INT) + 1, {_ES_W}) AS k
  FROM d, unnest(list_filter(range(0, greatest(length(text) - {_ES_W} + 1, 0)),
    i -> (ascii(substr(text, CAST(i AS INT) + 1, 1)) * 3
        + ascii(substr(text, CAST(i AS INT) + 2, 1)) * 5
        + ascii(substr(text, CAST(i AS INT) + 3, 1)) * 7
        + ascii(substr(text, CAST(i AS INT) + 4, 1)) * 11) % {_ES_S} = 0)) AS t(s)
),
own AS (
  SELECT k, min(doc_id) AS owner
  FROM occ GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
dup AS (
  SELECT occ.doc_id, occ.s FROM occ JOIN own USING (k)
  WHERE occ.doc_id != own.owner
),
pd AS (
  SELECT doc_id, list_sort(list(s)) AS ss, count(*)::BIGINT AS n_dup_windows
  FROM dup GROUP BY 1
),
sp AS (
  SELECT pd.doc_id, pd.n_dup_windows, d.text,
    list_filter(ss, (x, i) -> i = 1 OR x - ss[i - 1] > {_ES_W}) AS lo,
    list_transform(
      list_filter(ss, (x, i) -> i = len(ss) OR ss[i + 1] - x > {_ES_W}),
      x -> x + {_ES_W}) AS hi
  FROM pd JOIN d USING (doc_id)
),
res AS (
  SELECT doc_id, n_dup_windows,
    CAST(len(lo) AS BIGINT) AS n_spans,
    CAST(list_sum(list_transform(range(1, len(lo) + 1), i -> hi[i] - lo[i]))
         AS BIGINT) AS chars_removed,
    array_to_string(list_transform(range(1, len(lo) + 2), i ->
      substr(text,
             CAST(CASE WHEN i = 1 THEN 0 ELSE hi[i - 1] END AS INT) + 1,
             CAST((CASE WHEN i = len(lo) + 1 THEN length(text) ELSE lo[i] END)
                  - (CASE WHEN i = 1 THEN 0 ELSE hi[i - 1] END) AS INT))), '')
      AS cleaned
  FROM sp
),
docrows AS (
  SELECT 'doc' AS member, doc_id, n_dup_windows, n_spans, chars_removed,
         CAST(length(cleaned) AS BIGINT) AS clean_len,
         substr(md5(cleaned), 1, 16) AS clean_md5p
  FROM res
)
SELECT * FROM docrows
UNION ALL
SELECT 'total', CAST(-1 AS BIGINT), CAST(sum(n_dup_windows) AS BIGINT),
       CAST(sum(n_spans) AS BIGINT), CAST(sum(chars_removed) AS BIGINT),
       CAST(sum(clean_len) AS BIGINT), ''
FROM docrows
ORDER BY member, doc_id
"""

register("dedup_substring", _dedup_substring, _ES_ORACLE)

# ---------------------------------------------------------------------------
# bigram-LM perplexity + CCNet head/middle/tail bucketing
# ---------------------------------------------------------------------------


def _text_perplexity(spark, sf_dir):
    from akvorado_spark.operators.lm import bigram_lm_scores, perplexity_buckets

    docs = load_table(spark, "documents", sf_dir, spread=True)
    scored = bigram_lm_scores(docs, "text", "doc_id")
    return perplexity_buckets(scored, "doc_id").select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("lp_micro").cast("long").alias("lp_micro"),
        "bucket",
    ).orderBy("doc_id")


_PPL_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[CAST(t.i AS INT)] AS w1, ws[CAST(t.i AS INT) + 1] AS w2
  FROM d, unnest(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT w2)::BIGINT AS v FROM bg),
terms AS (
  SELECT bg.doc_id,
         CAST(round(ln((c12.c12 + 1.0) / (c1.c1 + v.v)) * 1e6) AS BIGINT) AS t
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
),
scored AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, CAST(sum(t) AS BIGINT) AS lp_micro
  FROM terms GROUP BY 1
)
SELECT doc_id, n_bigrams, lp_micro,
  CASE ntile(3) OVER (ORDER BY lp_micro * 1.0 / n_bigrams DESC, doc_id)
    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored ORDER BY doc_id
"""

register("text_perplexity", _text_perplexity, _PPL_ORACLE)

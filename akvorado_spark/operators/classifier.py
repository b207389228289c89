"""Distributed logistic-regression quality classifier.

Training-data pipelines learn quality filters from labels (CCNet fits
one against Wikipedia-vs-crawl; Gopher hand-writes rules, then teams
fit models to generalize them).  This is the classic iterative-ML-on-
DataFrames shape, no ML library required:

- **Scoring** is a pure codegen expression (sigmoid of a literal-
  weight dot), so filtering 100 TB by model score is a narrow
  projection — the same cost class as any other quality rule.
- **Training** is full-batch gradient descent where each iteration is
  ONE distributed aggregate: every row contributes its gradient term
  ``(σ(w·x) − y)·x`` map-side, partial sums combine in the tree
  aggregate, the driver applies the update to d+1 floats.  Nothing
  driver-side scales with rows; per-iteration cost is one scan (cache
  the feature frame and it's one in-memory pass).

Feature standardization (one aggregate for mean/std) keeps the fixed
learning rate sane across feature scales — weights are reported in
standardized space together with the (mean, std) vectors so scoring
can be applied to raw features.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LogisticModel:
    feature_cols: list[str]
    weights: list[float]  # standardized space, index 0 = bias
    means: list[float]
    stds: list[float]

    def score_expr(self) -> Column:
        """P(label=1 | x) as a whole-stage-codegen expression over the
        RAW feature columns (standardization folded into literals)."""
        z = F.lit(float(self.weights[0]))
        for j, c in enumerate(self.feature_cols):
            scale = self.weights[j + 1] / self.stds[j]
            z = z + (F.col(c).cast("double") - F.lit(self.means[j])) * F.lit(
                float(scale)
            )
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> LogisticModel:
    """Fit by full-batch GD; one tree aggregate per iteration.

    The feature frame is cached for the duration (iters scans of the
    projected columns only).  ``l2`` applies to non-bias weights."""
    d = len(feature_cols)
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(f"__x{j}") for j, c in enumerate(feature_cols)],
    ).cache()
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("empty training frame")
        stats = feats.agg(
            *[F.avg(f"__x{j}").alias(f"m{j}") for j in range(d)],
            *[F.stddev_pop(f"__x{j}").alias(f"s{j}") for j in range(d)],
        ).first()
        means = [float(stats[f"m{j}"]) for j in range(d)]
        stds = [max(float(stats[f"s{j}"] or 0.0), 1e-12) for j in range(d)]

        w = [0.0] * (d + 1)
        for _ in range(iters):
            z = F.lit(float(w[0]))
            for j in range(d):
                z = z + (F.col(f"__x{j}") - F.lit(means[j])) / F.lit(
                    stds[j]
                ) * F.lit(float(w[j + 1]))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = (p - F.col("__y")).alias("__e")
            row = feats.select(
                err,
                *[
                    (
                        (F.col(f"__x{j}") - F.lit(means[j])) / F.lit(stds[j])
                    ).alias(f"__sx{j}")
                    for j in range(d)
                ],
            ).agg(
                F.sum("__e").alias("g0"),
                *[
                    F.sum(F.col("__e") * F.col(f"__sx{j}")).alias(f"g{j + 1}")
                    for j in range(d)
                ],
            ).first()
            g = [float(row[f"g{j}"]) / n for j in range(d + 1)]
            w[0] -= lr * g[0]
            for j in range(1, d + 1):
                w[j] -= lr * (g[j] + l2 * w[j])
    finally:
        feats.unpersist()
    return LogisticModel(list(feature_cols), w, means, stds)


def logistic_score(df: DataFrame, model: LogisticModel, out_col: str = "quality_p") -> DataFrame:
    return df.withColumn(out_col, model.score_expr())


MICRO = 1_000_000


def sigmoid_decile_thresholds() -> list[int]:
    """The 9 micro-logit cut points for score deciles: p ≥ k/10 ⟺
    z ≥ logit(k/10), so a sigmoid's decile bucket is computable from
    the INTEGER margin alone — σ itself never needs to be evaluated.
    Fixed integer literals, identical in any engine that embeds them."""
    return [round(math.log(k / (10 - k)) * MICRO) for k in range(1, 10)]


def margin_micro(weights_micro: list[int], feature_cols: list[str]) -> Column:
    """Integer-exact micro-logit margin ``w0 + Σ wj·xj`` over BIGINT
    feature columns with micro fixed-point integer weights (index 0 =
    bias).  This is the hash-gateable twin of
    :meth:`LogisticModel.score_expr`: same linear form, but every term
    is a 64-bit integer, so two engines agree bit-for-bit."""
    z = F.lit(int(weights_micro[0])).cast("long")
    for j, c in enumerate(feature_cols):
        z = z + F.col(c).cast("long") * F.lit(int(weights_micro[j + 1])).cast(
            "long"
        )
    return z


def decile_from_margin(z_micro: Column) -> Column:
    """Score decile (0..9) from the integer margin: the count of decile
    thresholds at or below z.  Equals ``min(floor(10·σ(z/10⁶)), 9)``
    everywhere except exactly on a threshold (where ties go up, and
    both engines tie the same way because the comparison is integer).

    A NULL margin (NULL features) buckets to 0 — matching SQL
    ``CASE WHEN z >= t THEN 1 ELSE 0 END`` semantics, where an unknown
    comparison takes the ELSE: the two engines must agree on the
    degenerate rows too, not just the well-formed ones."""
    b = F.lit(0)
    for t in sigmoid_decile_thresholds():
        b = b + F.coalesce(
            (z_micro >= F.lit(t).cast("long")).cast("int"), F.lit(0)
        )
    return b


def log_loss(df: DataFrame, model: LogisticModel, label_col: str) -> float:
    """Mean negative log-likelihood — the training objective, exposed
    so tests can assert descent."""
    p = model.score_expr()
    y = F.col(label_col).cast("double")
    eps = F.lit(1e-12)
    ll = -(y * F.log(p + eps) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + eps))
    return float(df.agg(F.avg(ll)).first()[0])


def py_reference_train(
    rows: list[tuple[float, list[float]]],
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> list[float]:
    """Plain-python twin of :func:`logistic_train` (same
    standardization, same updates) for cross-checking the distributed
    gradient — rows = [(y, [x...])]."""
    n = len(rows)
    d = len(rows[0][1])
    means = [sum(r[1][j] for r in rows) / n for j in range(d)]
    stds = [
        max(
            math.sqrt(sum((r[1][j] - means[j]) ** 2 for r in rows) / n),
            1e-12,
        )
        for j in range(d)
    ]
    w = [0.0] * (d + 1)
    for _ in range(iters):
        g = [0.0] * (d + 1)
        for y, x in rows:
            z = w[0] + sum(
                w[j + 1] * (x[j] - means[j]) / stds[j] for j in range(d)
            )
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            g[0] += e
            for j in range(d):
                g[j + 1] += e * (x[j] - means[j]) / stds[j]
        w[0] -= lr * g[0] / n
        for j in range(1, d + 1):
            w[j] -= lr * (g[j] / n + l2 * w[j])
    return w

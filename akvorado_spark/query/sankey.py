"""Sankey query compiler (SURVEY §3.2; reference console/sankey.go:67-147).

Shape (no time axis — traffic averaged over the span of the data):

    WITH source AS (...),
         range  AS (scalar MAX(TimeReceived)-MIN(TimeReceived)),
         rows   AS (top-N dimension tuples by weight)
    SELECT if(d_i IN (SELECT d_i FROM rows), d_i, 'Other') ... AS dims,
           units / range AS xps
    GROUP BY dims ORDER BY xps DESC

Two semantic points carried over from the reference:

- The fold is **per-dimension against the projection of the top-N
  set** (``console/sankey.go:84-91``), not per-tuple as in the line
  query: a row keeps dimension *i* if that value appears in *any*
  top tuple at position *i*.
- The bidirectional (reverse) axis probes the **forward** rows set
  positionally (``console/sankey.go:56-65, 136-147``): reversed
  dimension *i* (e.g. DstAddr) is matched against forward rows
  column *i* (SrcAddr values).  ``compile_sankey`` takes an optional
  pre-built ``rows``/``rows_cols`` for that.

Spark-first: the rows set is ≤ limit (≤50) tuples, so every fold is
a broadcast left join of a ≤50-row distinct projection — the fact
side never shuffles for the probe; the only shuffle is the final
groupBy on the folded (low-cardinality) dimensions.  The range
scalar is a 1-row aggregate cross-joined in (J9 shape).

The per-second rate divides two exact integers (weight sum and
whole-second range), so the resulting double is bit-identical
between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OTHER = "Other"


@dataclass(frozen=True)
class SankeyRequest:
    time_col: str
    dimensions: tuple[str, ...]
    weight_sql: str | None  # per-row weight; SQL valid in Spark SQL and DuckDB
    limit: int
    agg_sql: str | None = None  # aggregate expr overriding SUM(weight)
    base_cols: tuple[str, ...] = ()
    value_type: str = "long"


def _agg(req: SankeyRequest):
    expr = F.expr(req.agg_sql) if req.agg_sql else F.sum("__w")
    return expr.cast(req.value_type)


def top_rows(df: DataFrame, req: SankeyRequest) -> DataFrame:
    """The forward top-N tuples (reference console/query.go:48-90, avg type)."""
    dims = list(req.dimensions)
    base = _base(df, req)
    ranked = base.groupBy(*dims).agg(_agg(req).alias("__tw"))
    order = [F.col("__tw").desc()] + [F.col(d).asc() for d in dims]
    return ranked.orderBy(*order).limit(req.limit).drop("__tw")


def _base(df: DataFrame, req: SankeyRequest) -> DataFrame:
    dims = list(req.dimensions)
    if req.agg_sql:
        return df.select(*req.base_cols, *dims)
    return df.withColumn("__w", F.expr(req.weight_sql).cast("long")).select("__w", *dims)


def data_range(df: DataFrame, time_col: str) -> DataFrame:
    """1-row span scalar: MAX(t)-MIN(t) in whole seconds, ≥1 (J9 shape;
    reference console/sankey.go:110-118)."""
    ts = F.col(time_col).cast("timestamp")
    return df.agg(
        F.greatest(
            F.lit(1).cast("long"),
            ((F.max(F.unix_micros(ts)) - F.min(F.unix_micros(ts))) / 1_000_000).cast(
                "long"
            ),
        ).alias("__range_s")
    )


def compile_sankey(
    df: DataFrame,
    req: SankeyRequest,
    rows: DataFrame | None = None,
    rows_cols: tuple[str, ...] | None = None,
    rng: DataFrame | None = None,
) -> DataFrame:
    """Compile a SankeyRequest into a DataFrame plan.

    Output columns: the dimension columns (folded to 'Other'),
    ``sum_w`` (unit total), ``xps`` (DOUBLE per-second rate over the
    data span).  ``rows``/``rows_cols`` inject the forward top-N set
    for the reverse axis (positional probe); ``rng`` injects the
    forward axis's span scalar (the reference shares the range CTE
    across axes).
    """
    dims = list(req.dimensions)
    if rng is None:
        rng = data_range(df, req.time_col)

    base = _base(df, req)
    if rows is None:
        rows = top_rows(df, req)
        rows_cols = req.dimensions

    # Per-dimension fold against the positional projection of rows.
    # The reference folds *rendered* dimensions (console/sankey.go:84-91),
    # so numeric dims become display strings here; string/binary pass
    # through (binary IPs are display-rendered by the caller after the
    # aggregation, with b'Other' as the fold marker).
    # dimension dtypes come from the input frame — analyzing `df` is
    # cheaper than analyzing the derived `base` plan
    dtypes = dict(df.dtypes)
    folded = base
    for d, rc in zip(dims, rows_cols):
        vals = rows.select(F.col(rc).alias("__v")).distinct()
        kept = F.col(d) if dtypes[d] in ("string", "binary") else F.col(d).cast("string")
        folded = (
            folded.join(F.broadcast(vals), folded[d] == vals["__v"], "left")
            .withColumn(d, F.when(F.col("__v").isNotNull(), kept).otherwise(F.lit(OTHER)))
            .drop("__v")
        )

    agg = folded.groupBy(*dims).agg(_agg(req).alias("sum_w"))
    out = (
        agg.join(F.broadcast(rng))
        .withColumn("xps", F.col("sum_w").cast("double") / F.col("__range_s"))
        .drop("__range_s")
    )
    return out.orderBy(F.col("xps").desc(), *dims)


# ---------------------------------------------------------------------------
# DuckDB oracle emitter
# ---------------------------------------------------------------------------


def oracle_sankey_sql(table_sql: str, req: SankeyRequest) -> str:
    """DuckDB SQL equivalent of ``compile_sankey`` (forward axis)."""
    dims = list(req.dimensions)
    dcols = ", ".join(dims)
    ts = req.time_col
    agg = req.agg_sql if req.agg_sql else "SUM(w)"
    base_vals = (
        ", ".join(req.base_cols)
        if req.agg_sql
        else f"CAST({req.weight_sql} AS BIGINT) AS w"
    )
    otype = {"long": "BIGINT", "double": "DOUBLE", "int": "INTEGER"}[req.value_type]
    fold_sel = ", ".join(
        f"CASE WHEN b.{d} IN (SELECT {d} FROM rows_top) THEN b.{d} ELSE '{OTHER}' END AS {d}"
        for d in dims
    )
    val_names = list(req.base_cols) if req.agg_sql else ["w"]
    fold_vals = "".join(f", b.{v}" for v in val_names)

    return f"""
WITH source AS (SELECT * FROM {table_sql}),
rng AS (
  SELECT GREATEST(1, (MAX(epoch_us({ts})) - MIN(epoch_us({ts}))) // 1000000) AS range_s
  FROM source
),
base AS (SELECT {base_vals + ', ' if base_vals else ''}{dcols} FROM source),
rows_top AS (
  SELECT {dcols} FROM (
    SELECT {dcols}, CAST({agg} AS BIGINT) AS tw FROM base GROUP BY {dcols}
  ) ORDER BY tw DESC, {dcols} LIMIT {req.limit}
),
folded AS (SELECT {fold_sel}{fold_vals} FROM base b),
agg AS (SELECT {dcols}, CAST({agg} AS {otype}) AS sum_w FROM folded GROUP BY {dcols})
SELECT a.{dcols.replace(', ', ', a.')}, a.sum_w, CAST(a.sum_w AS DOUBLE) / r.range_s AS xps
FROM agg a CROSS JOIN rng r
ORDER BY xps DESC, {dcols}"""


def sankey_nodes_links(
    rows: list[tuple[list[str], int, int]],
    dimension_labels: dict[int, list[str]],
) -> tuple[list[dict], list[dict]]:
    """Driver-side node/link assembly (reference console/sankey.go:197-262).

    ``rows`` is the collected query output as (dimension values, xps,
    axis); ``dimension_labels[axis]`` names each dimension position
    (the reverse axis uses reversed column names).  Nodes are labeled
    ``"<dimension>: <value>"`` and deduplicated per axis; links between
    adjacent dimensions aggregate xps per (source, target, axis) —
    client-side link aggregation, since the same adjacent pair can
    appear under many full-tuple rows.  Links sort by (axis, xps desc,
    source) like the reference.

    This is presentation assembly over an already-aggregated ≤limit-row
    result — O(rows × dims) on the driver by design.
    """
    nodes: list[dict] = []
    seen: set[tuple[str, int]] = set()
    links: dict[tuple[int, str, str], int] = {}

    def add_node(name: str, axis: int) -> None:
        if (name, axis) not in seen:
            seen.add((name, axis))
            nodes.append({"name": name, "axis": axis})

    for dims, xps, axis in rows:
        labels = dimension_labels[axis]
        for i in range(len(dims) - 1):
            d1 = f"{labels[i]}: {dims[i]}"
            d2 = f"{labels[i + 1]}: {dims[i + 1]}"
            add_node(d1, axis)
            add_node(d2, axis)
            links[(axis, d1, d2)] = links.get((axis, d1, d2), 0) + int(xps)

    out_links = [
        {"source": s, "target": t, "xps": v, "axis": a}
        for (a, s, t), v in links.items()
    ]
    out_links.sort(key=lambda l: (l["axis"], -l["xps"], l["source"]))
    return nodes, out_links

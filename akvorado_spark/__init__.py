"""akvorado_spark — a PySpark-native flow-analytics engine.

A from-scratch re-expression of the capabilities of akvorado/akvorado
(studied read-only at /root/reference) on top of Apache Spark:

- schema/    flow schema registry (columns, aliases, generated exprs,
             direction symmetry) — replaces common/schema/definition.go
- functions/ IP-as-binary kit, array helpers, time bucketing — replaces
             the ClickHouse scalar-function surface (SURVEY.md §2.8)
- filtering/ the filter DSL → Spark Column / ANSI SQL compiler —
             replaces console/filter/parser.peg
- query/     graph-line / sankey / widget query compilers, units
             expressions, top-N, rollup routing — replaces console/
- operators/ longest-prefix-match join, gap-fill spine, dedup /
             similarity / text-analysis operators
- sources/   parquet & CSV dimension loaders (broadcast dims)
- plans/     rollup storage layer: writers, retention, table registry
- streaming/ Structured Streaming ingest: enrichment pipeline,
             classifiers, streaming rollups
"""

__version__ = "0.1.0"

"""User-defined custom dictionaries (SURVEY §2.10; reference
common/schema/root.go:107-185, orchestrator CSV serving
orchestrator/clickhouse/http.go:28-110).

The reference lets users declare dictionaries — a CSV source, a key
spec, attributes, and a layout (``complex_key_hashed`` or
``ip_trie``) — and appends dynamic columns to the flow schema that
look the attributes up per matched flow column
(``dictGet('custom_dict_X', attr, key)``).

Spark-first shape: the CSV loads once into a small DataFrame (S11),
and each (matched flow column, attribute) pair becomes one broadcast
join — hash equi-join for ``hashed`` layouts, the longest-prefix
cascade for ``ip_trie`` — producing columns named
``{FlowColumn}{Attr}`` (e.g. ``DstPortService``, ``SrcAddrOwner``).
Applied at ingest they are stored; applied at query time they are a
view layer — the same Materialize duality the schema registry has.

Scale: dictionaries are user-curated (thousands of rows); every
lookup broadcasts, the fact side never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
from akvorado_spark.operators.lpm import lpm_join


def load_csv_dict(spark: SparkSession, path: str) -> DataFrame:
    """S11: a dictionary CSV (header row, inferred types)."""
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


@dataclass
class CustomDictionary:
    """One user dictionary + where it attaches.

    ``match``: {dict key column → list of flow columns to match}.
    ``layout``: "hashed" (exact key) or "ip_trie" (the dict key column
    holds CIDR strings; flow columns are 16-byte binary addresses).
    """

    name: str
    data: DataFrame
    attributes: list[str]
    match: dict[str, list[str]]
    layout: str = "hashed"
    default: str = ""
    _trie: DataFrame | None = field(default=None, repr=False)

    def _out_name(self, flow_col: str, attr: str) -> str:
        return f"{flow_col}{attr[:1].upper()}{attr[1:]}"

    def output_columns(self) -> list[str]:
        return [
            self._out_name(fc, a)
            for cols in self.match.values()
            for fc in cols
            for a in self.attributes
        ]

    def _prefix_frame(self, key_col: str) -> DataFrame:
        """ip_trie layout: CIDR strings → (lo, hi, plen, attrs)."""
        if self._trie is not None:
            return self._trie
        rows = self.data.select(key_col, *self.attributes).collect()
        spark = self.data.sparkSession
        out = []
        for r in rows:
            lo, hi = prefix_range(r[key_col])
            out.append((lo, hi, prefix_mapped_len(r[key_col])) + tuple(r[a] for a in self.attributes))
        from akvorado_spark.sources.tables import local_df

        attr_schema = ", ".join(f"{a} string" for a in self.attributes)
        self._trie = local_df(spark, out, f"lo binary, hi binary, plen int, {attr_schema}")
        return self._trie

    def apply(self, df: DataFrame) -> DataFrame:
        """Append this dictionary's generated columns to a flow frame."""
        for key_col, flow_cols in self.match.items():
            for fc in flow_cols:
                if self.layout == "ip_trie":
                    joined = lpm_join(
                        df, self._prefix_frame(key_col), fc, attrs=list(self.attributes)
                    )
                    for a in self.attributes:
                        df = joined.withColumn(
                            self._out_name(fc, a),
                            F.coalesce(F.col(a), F.lit(self.default)),
                        ).drop(a)
                        joined = df
                else:
                    dim = self.data.select(
                        F.col(key_col).alias("__k"),
                        *[F.col(a).alias(f"__a_{a}") for a in self.attributes],
                    )
                    df = df.join(F.broadcast(dim), df[fc] == F.col("__k"), "left").drop("__k")
                    for a in self.attributes:
                        df = df.withColumn(
                            self._out_name(fc, a),
                            F.coalesce(F.col(f"__a_{a}").cast("string"), F.lit(self.default)),
                        ).drop(f"__a_{a}")
        return df


def apply_custom_dicts(df: DataFrame, dicts: list[CustomDictionary]) -> DataFrame:
    """The dynamic-column factory: every declared dictionary appends
    its generated columns (reference appends them to the schema at
    startup; here they join in at ingest or query time)."""
    for d in dicts:
        df = d.apply(df)
    return df

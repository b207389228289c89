"""Units aggregates (SURVEY §2.4 A1; reference console/clickhouse.go:181-213).

Each unit is an aggregate SQL expression valid in BOTH Spark SQL and
DuckDB, plus the raw columns it reads — pluggable into LineRequest
(agg_sql/base_cols) and the sankey/widget compilers.  Values are
totals per group; the compilers divide by the interval for
x-per-second.

fps    = COUNT(*)
pps    = SUM(Packets * SamplingRate)
l3bps  = SUM(Bytes * SamplingRate * 8)
l2bps  = SUM((Bytes + 38*Packets) * SamplingRate * 8)   (L2 overhead: 18B ethernet + 20B framing)
inl2%  = SUM(Bytes*SamplingRate*8 * 100 / (InIfSpeed*1e6)) / COUNT(DISTINCT ExporterAddress, InIfName)
outl2% = same on Out columns
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class UnitSpec:
    name: str
    agg_sql: str
    base_cols: tuple[str, ...]
    value_type: str = "long"
    # NOTE: the reference divides EVERY unit's aggregate by the
    # interval when emitting xps — including the percentage units
    # (console/line.go:153: Op(unitsSQL, "/", Interval) with no
    # special case) — so the compilers here do too; there is no
    # "already a rate" exemption


def _pct(side_speed: str, side_if: str) -> str:
    # ifNotFinite(..., 0) equivalent: NULLIF guards /0, COALESCE folds to 0
    # CAST(... AS DOUBLE): Spark parses `100.0` as DECIMAL, DuckDB as
    # DOUBLE — explicit casts keep the arithmetic double in both.
    return (
        f"COALESCE(SUM((Bytes + 38 * Packets) * SamplingRate * 8 * CAST(100 AS DOUBLE) "
        f"/ (NULLIF({side_speed}, 0) * CAST(1000000 AS DOUBLE))) "
        f"/ NULLIF(COUNT(DISTINCT hex(ExporterAddress) || '|' || {side_if}), 0), CAST(0 AS DOUBLE))"
    )


UNITS: dict[str, UnitSpec] = {
    "fps": UnitSpec("fps", "COUNT(*)", ()),
    "pps": UnitSpec("pps", "SUM(Packets * SamplingRate)", ("Packets", "SamplingRate")),
    "l3bps": UnitSpec("l3bps", "SUM(Bytes * SamplingRate * 8)", ("Bytes", "SamplingRate")),
    "l2bps": UnitSpec(
        "l2bps",
        "SUM((Bytes + 38 * Packets) * SamplingRate * 8)",
        ("Bytes", "Packets", "SamplingRate"),
    ),
    "inl2%": UnitSpec(
        "inl2%",
        _pct("InIfSpeed", "InIfName"),
        ("Bytes", "Packets", "SamplingRate", "InIfSpeed", "ExporterAddress", "InIfName"),
        value_type="double",
    ),
    "outl2%": UnitSpec(
        "outl2%",
        _pct("OutIfSpeed", "OutIfName"),
        ("Bytes", "Packets", "SamplingRate", "OutIfSpeed", "ExporterAddress", "OutIfName"),
        value_type="double",
    ),
}


def _pct_approx(side_speed: str, side_if: str, rsd: float) -> str:
    return (
        f"COALESCE(SUM((Bytes + 38 * Packets) * SamplingRate * 8 * CAST(100 AS DOUBLE) "
        f"/ (NULLIF({side_speed}, 0) * CAST(1000000 AS DOUBLE))) "
        f"/ NULLIF(APPROX_COUNT_DISTINCT(hex(ExporterAddress) || '|' || {side_if}, {rsd}), 0), "
        f"CAST(0 AS DOUBLE))"
    )


def approx_pct_unit(name: str, rsd: float = 0.02) -> UnitSpec:
    """A8 scale path: the %-utilization units with the per-group exact
    COUNT(DISTINCT exporter, interface) swapped for a HyperLogLog++
    sketch (``approx_count_distinct``).

    The exact form expands each row for the distinct aggregate and
    holds the distinct set per group; the sketch form is one pass with
    constant per-group state (~rsd-sized registers), the right trade
    when grouping by high-cardinality dimensions over 100 TB.  The
    interface population per group is typically tiny (≤ thousands), 
    where HLL++ uses its exact sparse representation — so results
    usually match the exact unit bit-for-bit (asserted in tests) and
    degrade gracefully to ±rsd beyond it.  Spark-side only: DuckDB's
    approx_distinct uses a different sketch, so these variants are
    verified against the exact units in pytest, not the driver oracle.
    """
    base = UNITS[name]
    side = "In" if name.startswith("in") else "Out"
    return UnitSpec(
        base.name + "~approx",
        _pct_approx(f"{side}IfSpeed", f"{side}IfName", rsd),
        base.base_cols,
        value_type="double",
    )

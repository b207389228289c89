"""Typed column model for the filter DSL.

Each filterable column has a *kind* that decides which operators and
literal forms are legal — the Spark analog of the per-type condition
rules in the reference grammar (reference: console/filter/parser.peg:
17-53 with typed conditions at :65-282).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# IANA protocol names the DSL resolves at parse time — the engine's
# equivalent of the protocols dictionary lookup in filters
# (reference: console/filter/helpers.go:237-242).  Public IANA data.
PROTO_NUMBERS = {
    "icmp": 1, "igmp": 2, "ipv4": 4, "tcp": 6, "udp": 17, "rdp": 27,
    "ipv6": 41, "gre": 47, "esp": 50, "ah": 51, "ipv6-icmp": 58,
    "l2tp": 115, "sctp": 132, "udplite": 136,
}

ETYPE_VALUES = {"ipv4": 0x800, "ipv6": 0x86DD}
BOUNDARY_VALUES = {"external", "internal", "undefined"}
DIRECTION_VALUES = {"ingress", "egress", "undefined"}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    kind: str  # ip | prefix | string | uint | proto | etype | enum | array_uint | community | large_community | mac | timestamp
    main_only: bool = False
    enum_values: frozenset[str] = frozenset()


@dataclass
class FilterSchema:
    columns: dict[str, ColumnSpec]  # lower-case name → spec
    reverse: dict[str, str] = field(default_factory=dict)  # name → reversed name

    def lookup(self, name: str) -> ColumnSpec | None:
        return self.columns.get(name.lower())

    def reverse_name(self, name: str) -> str:
        return self.reverse.get(name, name)


def flow_filter_schema(fs=None) -> FilterSchema:
    """Filter model for the flows fact table (SURVEY §2.2).  Pass a
    configured ``FlowSchema`` to derive the filter surface (and the
    main-table-required analysis) from its column placement."""
    from akvorado_spark.schema.definition import flows_schema

    if fs is None:
        fs = flows_schema()
    cols: dict[str, ColumnSpec] = {}
    rev: dict[str, str] = {}

    def add(spec: ColumnSpec) -> None:
        cols[spec.name.lower()] = spec

    for c in fs.enabled():
        n = c.name
        rev[n] = fs.reverse_name(n)
        if n in ("SrcAddr", "DstAddr", "ExporterAddress", "NextHop"):
            add(ColumnSpec(n, "ip", c.main_only))
        elif n in ("SrcNetPrefix", "DstNetPrefix"):
            # main-table requirement follows the column's placement, not
            # the name: a deployment that materializes the prefix into
            # the rollups can filter on it anywhere (reference
            # parser_test.go TestPrefixFilterMainTableRequired)
            add(ColumnSpec(n, "prefix", c.main_only))
        elif n == "Proto":
            add(ColumnSpec(n, "proto"))
        elif n == "EType":
            add(ColumnSpec(n, "etype"))
        elif n in ("InIfBoundary", "OutIfBoundary"):
            add(ColumnSpec(n, "enum", enum_values=frozenset(BOUNDARY_VALUES)))
        elif n == "FlowDirection":
            add(ColumnSpec(n, "enum", enum_values=frozenset(DIRECTION_VALUES)))
        elif n == "DstASPath":
            add(ColumnSpec(n, "array_uint", c.main_only))
        elif n == "DstCommunities":
            add(ColumnSpec(n, "community", c.main_only))
        elif n == "DstLargeCommunities":
            add(ColumnSpec(n, "large_community", c.main_only))
        elif n == "TimeReceived":
            add(ColumnSpec(n, "timestamp"))
        else:
            t = c.dtype.simpleString()
            if t in ("int", "bigint", "smallint", "tinyint"):
                add(ColumnSpec(n, "uint", c.main_only))
            elif t == "string":
                add(ColumnSpec(n, "string", c.main_only))
            # arrays/binary not covered above are not filterable
    return FilterSchema(cols, rev)

"""Longest-prefix-match join.

Spark has no native LPM (the reference uses ip_trie dictionaries and a
bart trie: common/schema/root.go:107-185, outlet/networks/root.go:55-66,
outlet/routing/provider/bmp rib).  This operator re-expresses LPM as a
**per-prefix-length cascade of broadcast hash equi-joins**:

    for L in distinct prefix lengths, longest→shortest:
        flows LEFT JOIN prefixes[plen=L]
              ON truncate(ip, L) = network_address [AND exporter = e]
    each output attribute = COALESCE(attr@L1, attr@L2, …)

Why this shape and not a range join:

- ``ip BETWEEN lo AND hi`` against a broadcast table is a
  nested-loop join — O(rows × prefixes).  The cascade is ~20-30
  *hash* joins, each O(rows), all broadcast: the fact side never
  shuffles and the plan scales linearly at 100 TB.
- The per-attribute COALESCE across lengths (longest first, NULLs
  fall through) reproduces the reference's nested-prefix **attribute
  inheritance** exactly (outlet/networks/root.go flattening): a /24
  with a NULL site inherits the site of its covering /16.
- Prefix tables are dimension-sized (networks: thousands; RIB
  snapshot: up to ~1M rows ≈ tens of MB) — comfortably broadcast.

The fact-side join key ``truncate(ip, L)`` is pure SQL (plan-time
mask, functions/ip.py) and stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akvorado_spark.functions.ip import hex_prefix_key, ip_hex


def lpm_join(
    flows: DataFrame,
    prefixes: DataFrame,
    ip_col: str,
    attrs: list[str] | None = None,
    prefix_lo: str = "lo",
    prefix_len: str = "plen",
    exporter_col: str | None = None,
    prefix_exporter: str = "exporter",
    out_prefix: str = "",
    plens: list[int] | None = None,
) -> DataFrame:
    """Join ``flows`` to the longest matching prefix in ``prefixes``.

    prefixes columns: ``lo`` (16-byte network address), ``plen``
    (length in the 128-bit mapped space), attribute columns, and
    optionally an exporter key (rows with NULL exporter are global
    fallbacks, matched only where no exporter-specific prefix wins —
    reference outlet/routing default-agent fallback).

    Returns ``flows`` plus ``{out_prefix}{attr}`` columns.
    """
    if attrs is None:
        attrs = [
            c
            for c in prefixes.columns
            if c not in (prefix_lo, prefix_len, prefix_exporter, "hi", "prefix")
        ]
    # dimension-sized: single partition keeps every broadcast-build job
    # at one task instead of spark.default.parallelism
    prefixes = prefixes.coalesce(1)
    if plens is None:
        # one tiny job over the dimension frame; pass plens= when the
        # lengths are known at plan time to stay fully lazy
        plens = [r[0] for r in prefixes.select(prefix_len).distinct().collect()]
    plens = sorted(set(plens), reverse=True)

    passes: list[tuple[object, bool]] = []  # (prefix frame, exporter-keyed?)
    if exporter_col is not None:
        with_exp = prefixes.filter(F.col(prefix_exporter).isNotNull())
        fallback = prefixes.filter(F.col(prefix_exporter).isNull())
        passes = [(with_exp, True), (fallback, False)]
    else:
        passes = [(prefixes, False)]

    # Hoist the hex conversion out of the cascade: the per-join fact key
    # is then a single substring over this column (keeps each join's
    # generated code tiny — the naive per-join hex/mask/unhex version
    # spent more time in JIT compilation than in execution).
    out = flows.withColumn("__iphex", ip_hex(F.col(ip_col)))
    matched: dict[str, list] = {a: [] for a in attrs}
    tag = 0
    for pfx, keyed in passes:
        for L in plens:
            nibbles = (int(L) + 3) // 4
            one = pfx.filter(F.col(prefix_len) == L)
            # network addresses are pre-masked, so their key is a plain
            # hex substring
            key = F.substring(F.lower(F.hex(F.col(prefix_lo))), 1, nibbles)
            sel = [key.alias(f"__k{tag}")] + [
                F.col(a).alias(f"__{a}_{tag}") for a in attrs
            ]
            if keyed:
                sel.append(F.col(prefix_exporter).alias(f"__e{tag}"))
            one = one.select(*sel)
            cond = hex_prefix_key(F.col("__iphex"), L) == F.col(f"__k{tag}")
            if keyed:
                cond = cond & (F.col(exporter_col) == F.col(f"__e{tag}"))
            out = out.join(F.broadcast(one), cond, "left")
            drop = [f"__k{tag}"] + ([f"__e{tag}"] if keyed else [])
            for a in attrs:
                matched[a].append(F.col(f"__{a}_{tag}"))
            out = out.drop(*drop)
            tag += 1

    for a in attrs:
        out = out.withColumn(out_prefix + a, F.coalesce(*matched[a]))
    out = out.drop("__iphex", *[f"__{a}_{t}" for a in attrs for t in range(tag)])
    return out

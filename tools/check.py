"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables,
then compares row count, schema width, and order-insensitive values
(columns sorted by name, rows sorted, floats rounded).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _strict(v):
    """Pessimistic model of the driver's value hash: type-aware repr.

    bytearray vs bytes, Decimal vs int, 1 vs 1.0, numpy scalar vs python
    scalar all count as DIFFERENT — queries must emit identical python
    values from both engines.
    """
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strict(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_strict(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, float) and math.isnan(v):
        return "float:NaN"
    return f"{type(v).__name__}:{v!r}"


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_strict(row[i]) for i in order))
    out.sort()
    return [tuple(colnames[i] for i in order)] + out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from akvorado_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:
            print(f"  {name:40s} ERROR {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"  {name:40s} rows={len(srows):7d} (no oracle) {spark_t:5.1f}s")
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"  {name:40s} ORACLE-ERROR {type(exc).__name__}: {str(exc)[:200]}")
            failures.append(name)
            continue
        duck_t = time.time() - t0
        s_norm = normalize(srows, scols)
        o_norm = normalize(orows, ocols)
        ok = s_norm == o_norm
        status = "OK " if ok else "FAIL"
        print(
            f"  {name:40s} {status} rows={len(srows):7d}/{len(orows):7d} "
            f"spark={spark_t:5.1f}s duck={duck_t:5.1f}s"
        )
        if not ok:
            failures.append(name)
            if s_norm[0] != o_norm[0]:
                print(f"    schema: spark={s_norm[0]} oracle={o_norm[0]}")
            else:
                shown = 0
                for i in range(1, min(len(s_norm), len(o_norm))):
                    if s_norm[i] != o_norm[i]:
                        print(f"    row {i}: spark={s_norm[i]}")
                        print(f"           oracle={o_norm[i]}")
                        shown += 1
                        if shown >= 3:
                            break
                if len(s_norm) != len(o_norm):
                    print(f"    row counts differ: {len(s_norm)-1} vs {len(o_norm)-1}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump .explain("formatted") for every declared query to a directory.

Usage: python tools/dump_plans.py <out_dir> [suffix] [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default "before").
These are the before/after artifacts the optimization round commits
under plans/r13/ so plan-shape claims are checkable without Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from akvorado_spark.session import get_spark

    spark = get_spark("dump_plans")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — one failure must not sink the dump
            plan = f"ERROR {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

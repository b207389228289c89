"""Fit per-query time-scaling exponents from scale_probe outputs.

Input: 2-3 markdown tables produced by tools/scale_probe.py at corpus
scales 1x / 10x / 100x.  Output: a markdown table with per-scale
seconds and the least-squares exponent e of t ~ N^e over the available
points (log10 N = 0, 1, 2).

Usage: python tools/fit_exponents.py probe_1x.md probe_10x.md [probe_100x.md]
"""

from __future__ import annotations

import math
import re
import sys


def parse(path: str) -> dict[str, float]:
    out = {}
    for line in open(path):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 9 and cells[0] not in ("query", "---"):
            try:
                out[cells[0]] = float(cells[-1])
            except ValueError:
                continue
    return out


def main() -> int:
    tables = [parse(p) for p in sys.argv[1:]]
    if len(tables) < 2:
        print("need at least two probe tables", file=sys.stderr)
        return 1
    xs_all = [0.0, 1.0, 2.0][: len(tables)]
    hdr = ["query"] + [f"sec @{10**int(x):g}x" for x in xs_all] + [
        "exponent (t ~ N^e)"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for q in tables[0]:
        ys, xs = [], []
        for x, t in zip(xs_all, tables):
            if q in t and t[q] > 0:
                xs.append(x)
                ys.append(math.log10(t[q]))
        if len(xs) < 2:
            continue
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        e = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        secs = " | ".join(
            f"{t[q]:.2f}" if q in t else "—" for t in tables
        )
        print(f"| {q} | {secs} | {e:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

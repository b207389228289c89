"""Mechanical bench adjudicator: separate "plan changed" from "host
loaded" between two bench JSONs (r3 and r8 both burned a judge
round-trip on exactly this question).

Usage: python tools/bench_diff.py OLD.json NEW.json

For every query present in both files it compares the deterministic
plan fingerprint ({stages, shuffle_bytes} measured at the warmup SF)
and the wall time, then buckets:

- PLAN CHANGED    fingerprint differs → the wall delta is (at least
                  partly) a real plan change; look at the code.
- HOST NOISE      fingerprint identical but wall moved ≥ the ratio
                  threshold → don't chase it; re-measure on a quiet
                  host (loadavg is printed for both runs).
- steady          fingerprint identical, wall within threshold.

"Identical" is tolerance-aware: measured same-session drift on an
unchanged tree is ±2 stages (AQE stage reuse is nondeterministic) and
<0.1% shuffle bytes (compression/row order); observed cross-session
AQE wobble reaches ±4 stages, so the implemented tolerance is
±5 stages AND (2% + 64 bytes) — fingerprints inside BOTH bounds count
as the same plan.  Fingerprints are only present from round 9 on;
queries without one in either file are listed separately.

Fingerprints live either inline (``"plan"`` key, rounds ≤9) or in a
sidecar written by bench.py from round 10 on (``<stem>.plan.json``
next to the input, falling back to ``BENCH_PLAN.json`` in the same
directory — pass explicit sidecars as args 4/5 to override).

Usage: python tools/bench_diff.py OLD.json NEW.json [thr] [OLD_PLAN NEW_PLAN]
"""

from __future__ import annotations

import json
import os
import sys


def load_plan(
    bench_path: str, bench: dict, explicit: str | None
) -> tuple[dict, str | None]:
    """Resolve a bench file's plan fingerprints → (plan, source_path).

    Order: explicit sidecar arg > inline "plan" key (rounds ≤9) >
    the artifact's own immutable sidecar named by its "plan_file" key
    (round 11+) > <stem>.plan.json > BENCH_PLAN.json in the same
    directory.  Missing everywhere → ({}, None): queries bucket as
    no-fingerprint, never an error.  source_path is None for inline
    plans (they cannot collide) and lets main() detect the case where
    BOTH runs fall back to the one MUTABLE BENCH_PLAN.json — which
    bench.py overwrites every run, so identical-path resolution means
    the fingerprints describe only the newer run."""
    if explicit:
        return json.load(open(explicit)).get("plan", {}), os.path.realpath(explicit)
    if "plan" in bench:
        return bench["plan"], None
    here = os.path.dirname(bench_path) or "."
    stem, _ = os.path.splitext(bench_path)
    cands = []
    if bench.get("plan_file"):
        cands.append(os.path.join(here, os.path.basename(bench["plan_file"])))
    cands += [stem + ".plan.json", os.path.join(here, "BENCH_PLAN.json")]
    for cand in cands:
        if os.path.isfile(cand):
            try:
                return json.load(open(cand)).get("plan", {}), os.path.realpath(cand)
            except Exception:  # noqa: BLE001 — corrupt sidecar ⇒ no fingerprints
                return {}, None
    return {}, None


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    po, src_o = load_plan(sys.argv[1], old, sys.argv[4] if len(sys.argv) > 4 else None)
    pn, src_n = load_plan(sys.argv[2], new, sys.argv[5] if len(sys.argv) > 5 else None)
    if src_o is not None and src_o == src_n and os.path.basename(src_o) == "BENCH_PLAN.json":
        # both runs fell back to the one MUTABLE sidecar, which holds
        # only the LAST run's fingerprints — comparing it to itself
        # would bucket every real plan change as "steady" (ADVICE r10)
        print(
            f"# WARNING: both runs resolve to the same mutable sidecar "
            f"{src_o}; fingerprints describe only the newer run — "
            f"bucketing everything as no-fingerprint. Pass explicit "
            f"sidecars (args 4/5) or use round-11+ artifacts "
            f"(plan_file key)."
        )
        po, pn = {}, {}
    qo, qn = old.get("queries", {}), new.get("queries", {})
    print(
        f"# old: value={old.get('value')} loadavg={old.get('loadavg_1m')} | "
        f"new: value={new.get('value')} loadavg={new.get('loadavg_1m')} "
        f"(wall ratio threshold {thr}x)"
    )
    def same_plan(a: dict, b: dict) -> bool:
        # shuffle bytes are the sharp signal (<0.1% drift on an
        # unchanged tree); stage counts wobble with AQE stage reuse
        # (±4 observed), so they only corroborate
        if abs(a["stages"] - b["stages"]) > 5:
            return False
        hi = max(a["shuffle_bytes"], b["shuffle_bytes"])
        return abs(a["shuffle_bytes"] - b["shuffle_bytes"]) <= 0.02 * hi + 64

    changed, noise, steady, unknown = [], [], [], []
    for q in sorted(set(qo) & set(qn)):
        r = qn[q] / qo[q] if qo[q] else float("inf")
        if q not in po or q not in pn:
            unknown.append((q, r))
        elif not same_plan(po[q], pn[q]):
            changed.append((q, r, po[q], pn[q]))
        elif r >= thr or r <= 1 / thr:
            noise.append((q, r))
        else:
            steady.append((q, r))
    for q, r, a, b in changed:
        print(
            f"PLAN CHANGED  {q}: wall {r:.2f}x | stages {a['stages']}→{b['stages']}"
            f" shuffle {a['shuffle_bytes']}→{b['shuffle_bytes']}"
        )
    for q, r in noise:
        print(f"HOST NOISE    {q}: wall {r:.2f}x, plan identical")
    for q, r in unknown:
        print(f"no-fingerprint {q}: wall {r:.2f}x")
    print(
        f"# steady: {len(steady)} | plan-changed: {len(changed)} | "
        f"noise-suspect: {len(noise)} | no-fingerprint: {len(unknown)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

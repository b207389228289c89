"""Bounded LRU memo for literal Column trees.

Several operators memoize big literal expressions (PQ codebooks, LSH
hyperplanes) because building hundreds of ``F.lit()`` nodes costs real
driver time (py4j round trips) and the same constants recur across
encode/probe/bench repeats.  An UNbounded dict is fine for a bench
session but leaks expression trees in a long-lived service that keeps
retraining codebooks — this LRU caps the footprint at ``maxsize``
recent entries while keeping the hot-path hit as cheap as a dict get.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable


class LruMemo:
    """get_or_build(key, build) with least-recently-used eviction.

    ``cache_if`` (evaluated only on a miss, after ``build``) lets a
    call site build-but-not-store: the column memos use it to keep
    frame-bound operand trees out of the cache (see
    :func:`cacheable_operands`)."""

    def __init__(self, maxsize: int = 32):
        self.maxsize = int(maxsize)
        self._d: OrderedDict = OrderedDict()

    def get_or_build(self, key, build: Callable, cache_if: Callable | None = None):
        hit = self._d.get(key)
        if hit is not None:
            self._d.move_to_end(key)
            return hit
        val = build()
        if cache_if is not None and not cache_if():
            return val
        self._d[key] = val
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)
        return val

    def __len__(self) -> int:
        return len(self._d)


def cacheable_operands(*cols) -> bool:
    """True when every operand Column is built purely from UNRESOLVED
    references (``F.col``/``F.expr``/literals) — the only trees safe to
    memoize under a name-based key.

    A frame-bound column (``df["x"]``) prints identically to
    ``F.col("x")`` but embeds a resolved attribute pinned to its source
    frame; caching a tree built from one would hand later callers an
    expression that fails analysis (MISSING_ATTRIBUTES) on any other
    frame.  Bound operands therefore build a fresh tree that is
    returned but NEVER stored — correct for the caller, invisible to
    everyone else.  Lambda variables (operands received inside an
    ``F.transform``/``F.zip_with`` callback) are likewise rejected:
    their tree is pinned to one specific lambda function, and although
    their printed name is unique per invocation (so a key collision is
    not currently possible), storing them is never useful and a future
    Spark that prints them stably would turn the dead entries into
    wrong-tree hits.  The probe walks the column's node tree string
    (``ExpressionColumnNode`` is the classic-mode wrapper for a
    frame-resolved attribute); any introspection failure counts as
    not-cacheable, which is always safe.  Checked only on the miss
    path, so memo hits stay free of py4j round trips."""
    for c in cols:
        try:
            s = c._jc.node().toString()
        except Exception:  # unknown Column shape → never cache
            return False
        if "ExpressionColumnNode" in s or "LambdaVariable" in s:
            return False
    return True

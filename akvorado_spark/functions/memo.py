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
    """get_or_build(key, build) with least-recently-used eviction."""

    def __init__(self, maxsize: int = 32):
        self.maxsize = int(maxsize)
        self._d: OrderedDict = OrderedDict()

    def get_or_build(self, key, build: Callable):
        hit = self._d.get(key)
        if hit is not None:
            self._d.move_to_end(key)
            return hit
        val = build()
        self._d[key] = val
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)
        return val

    def __len__(self) -> int:
        return len(self._d)

"""Result cache (SURVEY §4; reference console/root.go:113-117,
console/config.go:109).

The reference caches graph results for 3 h and completion results for
1 min, keyed by the request body.  Same thin layer here: key = a
stable hash of the request payload, value = the collected rows +
schema, TTL per cache.  This sits *above* the engine (the reference
caches HTTP responses, not ClickHouse state), so it is deliberately a
driver-side dict — executors never see it.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from typing import Any


def request_key(payload: Any) -> str:
    """Stable hash of a JSON-serializable request body."""
    blob = json.dumps(payload, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()


@dataclass
class ResultCache:
    """TTL + LRU-bounded: ``max_entries`` is a hard cap (a completion
    endpoint hammered with distinct prefixes cannot grow the driver
    heap past it), and a hit refreshes recency so hot graph requests
    survive eviction pressure.  Recency rides the dict's insertion
    order (hits reinsert); the stored timestamp is the INSERT time so
    TTL expiry is unaffected by hits, matching the reference's
    fixed-lifetime HTTP cache."""

    ttl_s: float = 3 * 3600.0  # graph default; completion uses 60
    max_entries: int = 1000
    _store: dict[str, tuple[float, Any]] = field(default_factory=dict)
    hits: int = 0
    misses: int = 0

    def get(self, payload: Any):
        key = request_key(payload)
        hit = self._store.get(key)
        now = time.monotonic()
        if hit is not None and now - hit[0] <= self.ttl_s:
            self.hits += 1
            # LRU touch: move to the most-recent end, keep insert ts
            del self._store[key]
            self._store[key] = hit
            return hit[1]
        if hit is not None:
            del self._store[key]
        self.misses += 1
        return None

    def put(self, payload: Any, value: Any) -> None:
        key = request_key(payload)
        self._store.pop(key, None)  # re-put refreshes both ts and recency
        while len(self._store) >= self.max_entries:
            # least-recently-used = first key in insertion order
            self._store.pop(next(iter(self._store)))
        self._store[key] = (time.monotonic(), value)

    def get_or_compute(self, payload: Any, compute):
        """The handler wrapper: ``compute()`` must return collected
        rows (not a DataFrame — a plan is lazy and would defeat the
        cache)."""
        v = self.get(payload)
        if v is None:
            v = compute()
            self.put(payload, v)
        return v

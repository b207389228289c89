"""Consumer autoscaling decisions (S4; reference
outlet/kafkainput/scaler.go:44-183, pinned by scaler_test.go:278-359's
``nextWorkerCount`` table and the full ``TestScalerRateLimiter``
timeline replayed on an explicit clock).

The reference scales its Kafka consumer-group workers with a small
FSM: the first pressure signals bisect toward ``maxWorkers``
(dichotomy), and once a decrease has ever been granted the scaler
moves ±1 at a time.  Requests are rate-limited — nothing for
``increase_rate_limit_s`` after any scaling action, increases only
between the two limits, and decreases need a majority vote
(``decrease > steady/2``) over a sliding ``decrease_rate_limit_s``
window so a brief lull never collapses the worker pool.

Spark mapping: a Structured-Streaming job does not add workers, it
widens the per-trigger intake.  ``scale_request_from_progress`` turns
a ``StreamingQueryProgress`` dict into the same three-valued signal
the reference derives from worker busyness, and the granted worker
count multiplies a per-worker ``maxOffsetsPerTrigger`` budget.  The
decision core is driver-side by construction (one scalar per
micro-batch), so nothing here touches the data path.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field


class ScaleRequest(enum.Enum):
    """scaler.go:13-22 (ScaleIncrease / ScaleDecrease / ScaleSteady)."""

    INCREASE = 1
    DECREASE = 2
    STEADY = 3


class ScalerState:
    """The dichotomy FSM (scaler.go:35-72).

    Increases bisect toward ``max_workers`` — ``(cur + max + 1) // 2``
    — until the first granted decrease flips the state to steady,
    after which every step is ±1.  A decrease before any increase is
    ignored (scaler_test.go:314-324 "Ignore first down").
    """

    _INITIAL, _INITIAL_INCREASE, _STEADY = range(3)

    def __init__(self) -> None:
        self._state = self._INITIAL

    def next_worker_count(
        self, request: ScaleRequest, current: int, min_workers: int, max_workers: int
    ) -> int:
        if self._state == self._INITIAL:
            if request is ScaleRequest.INCREASE:
                self._state = self._INITIAL_INCREASE
                return min(max_workers, (current + max_workers + 1) // 2)
            if request is ScaleRequest.DECREASE:
                return current
        elif self._state == self._INITIAL_INCREASE:
            if request is ScaleRequest.INCREASE:
                return min(max_workers, (current + max_workers + 1) // 2)
            if request is ScaleRequest.DECREASE:
                self._state = self._STEADY
                return max(min_workers, current - 1)
        else:
            if request is ScaleRequest.INCREASE:
                return min(max_workers, current + 1)
            if request is ScaleRequest.DECREASE:
                return max(min_workers, current - 1)
        return current


@dataclass
class Scaler:
    """The rate-limited voting loop around the FSM (scaler.go:103-183),
    on an explicit clock: ``offer(request, now, current)`` returns the
    granted new worker count, or None when the request is absorbed.

    - within ``increase_rate_limit_s`` of the last action: everything
      is dropped;
    - between the two limits: increases are granted immediately,
      steady votes are recorded (a head start for the decrease
      window), decreases are dropped;
    - past ``decrease_rate_limit_s``: every request is recorded, the
      record is pruned to the trailing window, and a decrease is
      granted only when decrease votes outnumber half the steady
      votes.
    """

    min_workers: int
    max_workers: int
    increase_rate_limit_s: float = 60.0
    decrease_rate_limit_s: float = 300.0
    state: ScalerState = field(default_factory=ScalerState)
    _last: float = -math.inf
    _history: list[tuple[ScaleRequest, float]] = field(default_factory=list)

    def offer(self, request: ScaleRequest, now: float, current: int) -> int | None:
        if self._last + self.increase_rate_limit_s > now:
            return None
        if request is ScaleRequest.INCREASE:
            target = self.state.next_worker_count(
                request, current, self.min_workers, self.max_workers
            )
            self._last = now
            self._history.clear()
            return target if target > current else None
        if self._last + self.decrease_rate_limit_s > now:
            if request is ScaleRequest.STEADY:
                self._history.append((request, now))
            return None
        self._history.append((request, now))
        # prune to the trailing window, always keeping one entry
        # (scaler.go:148-153)
        window_start = now - self.decrease_rate_limit_s
        i = 0
        while i < len(self._history) - 1 and self._history[i][1] < window_start:
            i += 1
        del self._history[:i]
        decreases = sum(1 for r, _ in self._history if r is ScaleRequest.DECREASE)
        steadies = sum(1 for r, _ in self._history if r is ScaleRequest.STEADY)
        if decreases > steadies // 2:
            target = self.state.next_worker_count(
                ScaleRequest.DECREASE, current, self.min_workers, self.max_workers
            )
            self._last = now
            self._history.clear()
            return target if target < current else None
        return None


def scale_request_from_progress(
    progress: dict, busy_ratio: float = 0.8, idle_ratio: float = 0.3
) -> ScaleRequest:
    """Derive the reference's worker-busyness signal from a
    ``StreamingQueryProgress`` dict (``query.lastProgress``).

    The reference emits INCREASE when a worker saw no idle time in its
    poll loop and DECREASE when it mostly idled (outlet/kafkainput's
    worker loop); the Spark analogue is how much of the trigger
    interval the batch spent executing: ``durationMs.triggerExecution``
    against ``batchDuration`` (both milliseconds, present in every
    progress event).  Falls back to input vs processed rows/s when
    durations are missing.
    """
    durations = progress.get("durationMs") or {}
    exec_ms = durations.get("triggerExecution")
    interval_ms = progress.get("batchDuration")
    if exec_ms is not None and interval_ms:
        ratio = exec_ms / interval_ms
    else:
        inp = progress.get("inputRowsPerSecond") or 0.0
        out = progress.get("processedRowsPerSecond") or 0.0
        if not out:
            return ScaleRequest.STEADY
        ratio = inp / out
    if ratio >= busy_ratio:
        return ScaleRequest.INCREASE
    if ratio <= idle_ratio:
        return ScaleRequest.DECREASE
    return ScaleRequest.STEADY


def suggest_max_offsets(workers: int, per_worker_rows: int) -> int:
    """Granted worker count → ``maxOffsetsPerTrigger`` budget: the
    Spark lever that the reference's worker count actually controls
    (how much is consumed from Kafka per unit time)."""
    return max(1, workers) * per_worker_rows

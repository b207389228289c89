"""Consumer-autoscaler parity (S4) — replays the reference's
scaler_test.go tables on an explicit clock: the ``nextWorkerCount``
dichotomy table (scaler_test.go:278-359) and the full rate-limited
voting timeline of ``TestScalerRateLimiter`` (scaler_test.go:16-179),
phase by phase with the same sleeps and the same expected grants.
"""

import pytest

from akvorado_spark.streaming.scaler import (
    ScaleRequest,
    Scaler,
    ScalerState,
    scale_request_from_progress,
    suggest_max_offsets,
)

INC, DEC, STD = ScaleRequest.INCREASE, ScaleRequest.DECREASE, ScaleRequest.STEADY


@pytest.mark.parametrize(
    "requests,expected",
    [
        # scaler_test.go:286-340, same order and names
        ([INC], [9]),  # simple up
        ([INC, INC, INC, DEC, DEC, INC], [9, 13, 15, 14, 13, 14]),
        ([INC, INC, DEC, DEC, DEC, DEC, DEC, DEC], [9, 13, 12, 11, 10, 9, 8, 7]),
        # ignore first down
        ([DEC, INC, INC, DEC, DEC, DEC, DEC, DEC, DEC],
         [1, 9, 13, 12, 11, 10, 9, 8, 7]),
        ([DEC], [1]),  # simple down from min
        ([INC] * 6, [9, 13, 15, 16, 16, 16]),  # reach max
    ],
    ids=["simple-up", "up3-down2-up", "up2-down6", "ignore-first-down",
         "down-from-min", "reach-max"],
)
def test_next_worker_count_table(requests, expected):
    state = ScalerState()
    current, results = 1, []
    for req in requests:
        current = state.next_worker_count(req, current, 1, 16)
        results.append(current)
    assert results == expected


def test_scaler_rate_limited_timeline():
    """scaler_test.go:16-179 verbatim: min=1 max=15, increase limit
    60 s, decrease limit 300 s; grants must be exactly
    [8, 12, 11, 12, 13, 12, 11, 10, 9] at the phase boundaries the
    reference checks."""
    sc = Scaler(min_workers=1, max_workers=15,
                increase_rate_limit_s=60, decrease_rate_limit_s=300)
    clock = 0.0
    current = 1
    got = []

    def send(req, sleep=0.0):
        nonlocal clock, current
        clock += sleep
        granted = sc.offer(req, clock, current)
        if granted is not None:
            current = granted
            got.append(granted)

    send(INC)                              # increase on first request
    assert got == [8]
    for _ in range(10):                    # collapsing further increases
        send(INC, sleep=5)
    assert got == [8]
    send(INC, sleep=10)                    # t = 1 min: increase again
    assert got == [8, 12]
    for _ in range(10):                    # too soon to decrease
        send(DEC, sleep=6)
    assert got == [8, 12]
    for _ in range(39):                    # still too soon after 4m54
        send(DEC, sleep=6)
    assert got == [8, 12]
    send(DEC, sleep=6)                     # 5-minute window done
    assert got == [8, 12, 11]
    for _ in range(10):                    # do not increase
        send(INC, sleep=5)
    assert got == [8, 12, 11]
    send(INC, sleep=10)                    # increase after 10 more s
    assert got == [8, 12, 11, 12]
    for _ in range(60):                    # mixed signals → increase
        send(INC, sleep=1)
        send(DEC)
    assert got == [8, 12, 11, 12, 13]
    send(INC, sleep=55)                    # few increases, then mostly
    for _ in range(3):                     # decreases → decrease
        send(INC)
    for _ in range(295):
        send(DEC, sleep=1)
    assert got == [8, 12, 11, 12, 13, 12]
    clock += 300                           # one decrease after 5 min
    for _ in range(10):
        send(DEC)
    assert got == [8, 12, 11, 12, 13, 12, 11]
    clock += 60                            # steady stream holds the line
    for _ in range(240):
        send(STD, sleep=1)
    for _ in range(60):
        send(DEC, sleep=1)
    assert got == [8, 12, 11, 12, 13, 12, 11]      # 240 steady vs 60 dec
    for _ in range(60):
        send(DEC, sleep=1)
    assert got == [8, 12, 11, 12, 13, 12, 11, 10]  # 180 vs 120 → decrease
    for _ in range(30):
        send(DEC, sleep=1)
    clock += 60                            # stale steadies must expire
    for _ in range(2400):
        send(STD, sleep=1)
    assert got == [8, 12, 11, 12, 13, 12, 11, 10]
    clock += 1
    for _ in range(300):
        send(DEC)
    assert got == [8, 12, 11, 12, 13, 12, 11, 10, 9]


def test_scaler_ignores_noop_grants():
    """An increase already at max (or decrease at min) performs no
    scaling but still resets the rate-limit clock (scaler.go:120-127:
    ``last`` updates outside the ``target > current`` guard)."""
    sc = Scaler(min_workers=1, max_workers=2,
                increase_rate_limit_s=60, decrease_rate_limit_s=300)
    assert sc.offer(INC, 0.0, 1) == 2
    assert sc.offer(INC, 100.0, 2) is None   # at max: no grant...
    assert sc.offer(INC, 150.0, 2) is None   # ...but clock was reset


def test_scale_request_from_progress():
    busy = {"durationMs": {"triggerExecution": 950}, "batchDuration": 1000}
    idle = {"durationMs": {"triggerExecution": 100}, "batchDuration": 1000}
    mid = {"durationMs": {"triggerExecution": 500}, "batchDuration": 1000}
    assert scale_request_from_progress(busy) is INC
    assert scale_request_from_progress(idle) is DEC
    assert scale_request_from_progress(mid) is STD
    # rows/s fallback when durations are absent
    lag = {"inputRowsPerSecond": 5000.0, "processedRowsPerSecond": 1000.0}
    assert scale_request_from_progress(lag) is INC
    assert scale_request_from_progress({}) is STD


def test_suggest_max_offsets():
    assert suggest_max_offsets(8, 50_000) == 400_000
    assert suggest_max_offsets(0, 50_000) == 50_000

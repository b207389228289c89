"""Array helpers absent from pyspark.sql.functions.

``array_compact`` removes *consecutive* duplicates — ClickHouse
``arrayCompact``, used by the reference to derive Dst1st/2nd/3rdAS from
the AS path (reference: orchestrator/clickhouse/migrations_helpers.go:380-384).
Implemented with built-in higher-order functions (filter + lag via
zip_with on a shifted copy) so it stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_compact(arr: Column) -> Column:
    """Remove consecutive duplicate elements, keeping order.

    filter(arr, (x, i) -> i == 0 OR x != arr[i-1]) — null-safe via
    a not-distinct comparison.
    """
    return F.filter(
        arr,
        lambda x, i: (i == F.lit(0))
        | ~x.eqNullSafe(F.element_at(arr, i)),  # element_at is 1-based → arr[i-1]
    )

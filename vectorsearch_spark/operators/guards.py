"""Bounded-side guards for driver-routed operators.

Several operators have a deliberate *bounded-Q* driver path (collect
the query batch, broadcast it) mirroring the reference's
one-query-at-a-time API widened to batches
(fdb/FdbVectorIndex.java:417-432). The contract used to be
docstring-only; these helpers make it FAIL LOUDLY: the collect is
capped with ``limit(max+1)`` (so a 10M-row query side materializes at
most ``max+1`` rows, never OOMs the driver) and raises a
``QuerySideTooLarge`` that names the distributed alternative.

Zero extra cluster work: the capped ``collect()`` IS the job the
driver path was going to run anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Default ceiling for driver-collected query batches. 65536 queries ×
# 768 dims × 8 bytes ≈ 400 MB worst case — roomy for a driver, far
# below anything that OOMs it, and consistent with the ann_*_join
# auto-mode threshold.
MAX_DRIVER_QUERIES = 65536


class QuerySideTooLarge(ValueError):
    """The bounded-Q driver path was handed an unbounded query side."""


def collect_bounded(
    df: DataFrame,
    max_rows: int = MAX_DRIVER_QUERIES,
    what: str = "query side",
    alternative: str = "a distributed query_mode",
) -> list:
    """Collect ``df`` if it has ≤ ``max_rows`` rows, else raise.

    Uses ``limit(max_rows + 1)`` so the driver never materializes more
    than one row past the cap regardless of the input's true size.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise QuerySideTooLarge(
            f"{what} exceeds the bounded-driver cap of {max_rows} rows; "
            f"this code path collects it to the driver. Use {alternative} "
            f"for unbounded inputs."
        )
    return rows

"""Table profiling: the schema-drift / data-quality pass a pipeline
runs on every new drop before trusting it (north-star extension per
BASELINE.json; the reference has no profiling surface).

``profile_table`` computes per-column null counts, distinct counts and
min/max in ONE full-scan aggregate — a single job with map-side partial
aggregation, not a per-column loop of jobs (profiling 100 columns at
100 TB must still be one pass). The wide 1-row aggregate result is
reshaped to one-row-per-column with an ``explode`` of an inline struct
array — driver never touches the data.

``exact_distinct=True`` uses ``count_distinct`` (exact — one shuffle of
the distinct values per column; the oracle-checkable form).
``exact_distinct=False`` swaps in ``approx_count_distinct`` (HLL,
map-side combinable, NO extra shuffle) — the default at real scale,
same contract as the events_distinct_users HLL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per profiled column; min/max are rendered as
    strings so heterogeneous column types share one output schema
    (NULL when the column is all-NULL)."""
    cols = cols or df.columns
    ndv = (
        F.count_distinct
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c, rsd=0.02))
    )
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            ndv(F.col(c)).alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")

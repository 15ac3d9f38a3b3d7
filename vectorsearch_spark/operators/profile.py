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

from pyspark.sql import DataFrame, Window
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


def validate_rules(df: DataFrame, rules: "dict[str, F.Column]") -> DataFrame:
    """Data-quality rule validation (the deequ/dbt-test shape): every
    rule is a boolean Column evaluated in ONE full-scan aggregate —
    (rule, n_rows, n_violations, pass_rate) per rule, no per-rule job
    loop. NULL rule results count as violations (a predicate that
    cannot be evaluated did not pass). Referential checks (key exists
    in dim) are expressible by joining the dim in BEFORE calling this
    (left join + IS NOT NULL rule) so they ride the same single pass.
    """
    if not rules:
        raise ValueError("validate_rules needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return (
        row.select(F.col("__n").cast("long").alias("n_rows"), F.explode(pairs).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            "n_rows",
            F.col("r.n_violations").alias("n_violations"),
            F.round(
                (F.col("n_rows") - F.col("r.n_violations")) / F.col("n_rows"), 6
            ).alias("pass_rate"),
        )
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard training-data drift monitor (PSI < 0.1
    stable, > 0.25 shifted). Explicit [lo, hi) bounds with fixed-width
    bins keep the binning a pure per-row function (engine-mirrorable
    and rerun-stable, the zorder quantize contract); values outside
    clamp to the edge bins, NULLs are excluded. One aggregate per side
    (map-side combinable), a |bins|-sized join, per-bin PSI terms with
    ``eps`` smoothing — returns (bin, n_a, n_b, p_a, p_b, psi_term);
    sum(psi_term) is the index.
    """
    if bins < 2 or not (hi > lo):
        raise ValueError("psi_drift needs bins >= 2 and hi > lo")

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor(
            (F.col(col).cast("double") - F.lit(float(lo)))
            / F.lit((float(hi) - float(lo)))
            * F.lit(bins)
        ).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
        return (
            df.where(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    spark = df_a.sparkSession
    spine = spark.range(bins).select(F.col("id").alias("bin"))
    j = (
        spine.join(binned(df_a, "n_a"), "bin", "left")
        .join(binned(df_b, "n_b"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = j.agg(
        F.sum("n_a").cast("double").alias("ta"), F.sum("n_b").cast("double").alias("tb")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            # try_divide: an EMPTY side (total 0) degrades to the eps
            # floor in every bin instead of an ANSI divide-by-zero —
            # PSI against an empty snapshot is then finite and maximal,
            # which is the honest reading of "everything drifted"
            (F.coalesce(F.try_divide("n_a", "ta"), F.lit(0.0)) + F.lit(eps)).alias("__pa"),
            (F.coalesce(F.try_divide("n_b", "tb"), F.lit(0.0)) + F.lit(eps)).alias("__pb"),
        )
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round("__pa", 6).alias("p_a"),
            F.round("__pb", 6).alias("p_b"),
            F.round(
                (F.col("__pa") - F.col("__pb")) * F.log(F.col("__pa") / F.col("__pb")),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: "list[float]",
    group_col: str,
    bins: int = 1024,
) -> DataFrame:
    """EXACT per-group quantiles (discrete — an actual data value, rank
    ceil(p·n) in ascending order) WITHOUT buffering group values: the
    distributed-selection design of ``curate.select_top_fraction``,
    generalized to arbitrary rank targets.

    Spark's exact ``percentile`` aggregate collects every group value
    into one buffer — at 100 TB a low-cardinality group column makes
    that an executor-OOM, which is why ``price_percentiles`` documents
    "prefer approx_percentile at scale". This pays two bounded
    aggregates instead:

    1. per-group (count, min, max) — |groups| driver rows;
    2. per-(group, equal-width-bin) counts — |groups|·bins driver
       rows; a cumulative walk locates, for every requested prob, the
       bin holding rank ceil(p·n) and the rank's offset within it;
    3. only those BORDER BINS (expected n/bins rows each) are exactly
       ranked by one window; every other row is never sorted.

    Returns (group_col, p, value) — value is the exact rank-ceil(p·n)
    element, independent of tie order (equal values are
    interchangeable at equal rank). Degenerate groups (constant value
    → one bin) fall back to the full window for that group only.
    """
    import math

    if not probs or not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be non-empty, each in (0, 1]")
    spark = df.sparkSession
    v = F.col(col).cast("double")
    # NaN values poison min/max (every bin index casts to null) and
    # inflate __n past the rankable rows — quantiles are over the
    # orderable values only, so drop null/NaN before any statistic
    clean = df.where(v.isNotNull() & ~F.isnan(v))
    stats = (
        clean.groupBy(group_col)
        .agg(
            F.count(v).alias("__n"),
            F.min(v).alias("__lo"),
            F.max(v).alias("__hi"),
        )
        .collect()
    )
    span = {
        r[group_col]: (int(r["__n"]), float(r["__lo"]), float(r["__hi"]))
        for r in stats
        if r["__n"]
    }
    if not span:
        # empty result must carry the SAME schema as the non-empty path
        # (group col type comes from the input, not a hardcoded string)
        from pyspark.sql.types import DoubleType, StructField, StructType

        schema = StructType(
            [
                StructField(group_col, df.schema[group_col].dataType),
                StructField("p", DoubleType()),
                StructField("value", DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)
    stats_df = spark.createDataFrame(
        [(g, lo, hi) for g, (n, lo, hi) in span.items()],
        [group_col, "__lo", "__hi"],
    )
    width = (F.col("__hi") - F.col("__lo")) / float(bins)
    bin_col = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(F.floor((v - F.col("__lo")) / width), F.lit(bins - 1))
    ).cast("int")
    binned = (
        clean.join(F.broadcast(stats_df), group_col)
        .withColumn("__bin", bin_col)
    )
    hist = {
        (r[group_col], r["__bin"]): r["__c"]
        for r in binned.groupBy(group_col, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    # cumulative walk: rank r lives in bin b with offset r - cum(<b)
    needed = []  # (group, p, bin, offset_in_bin)
    for g, (n, _lo, _hi) in span.items():
        cum = 0
        targets = sorted(
            ((max(1, math.ceil(p * n)), p) for p in probs), key=lambda t: t[0]
        )
        ti = 0
        for b in range(bins):
            c = hist.get((g, b), 0)
            while ti < len(targets) and cum < targets[ti][0] <= cum + c:
                needed.append((g, float(targets[ti][1]), b, targets[ti][0] - cum))
                ti += 1
            cum += c
            if ti == len(targets):
                break
    need_df = spark.createDataFrame(needed, [group_col, "p", "__bin", "__off"])
    w = Window.partitionBy(group_col, "__bin").orderBy(v.asc())
    border = binned.join(
        F.broadcast(need_df.select(group_col, "__bin").distinct()),
        [group_col, "__bin"],
    ).withColumn("__rn", F.row_number().over(w))
    return (
        border.join(F.broadcast(need_df), [group_col, "__bin"])
        .where(F.col("__rn") == F.col("__off"))
        .select(group_col, "p", v.alias("value"))
    )

"""SparkSession factory with scale-appropriate defaults.

Local testing uses ``local[N]``; the same config block is what we would
ship on a real cluster (AQE on, Arrow on, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vectorsearch_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism. On a real cluster the
    ``master`` is supplied externally; everything else carries over.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if not os.environ.get("SPARK_MASTER"):  # local mode unless a cluster master is set
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # InferFiltersFromGenerate duplicates expensive explode() children
    # into pushed-down scan filters (see operators/text.py) — off by
    # default for our sessions; operators also set it defensively for
    # externally-built sessions
    from vectorsearch_spark.operators.text import exclude_generate_filter_inference

    exclude_generate_filter_inference(spark)
    # attach the per-session observability registry (metrics.py) — the
    # analog of the reference's Metrics singleton (util/Metrics.java)
    from vectorsearch_spark.metrics import get_metrics

    get_metrics(spark)
    return spark

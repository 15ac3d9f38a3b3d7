"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship brute-force KNN on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator with a
DuckDB oracle (see vectorsearch_spark/workload.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectorsearch_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: batch brute-force KNN (L2, k=10) on sf0.001."""
    return workload.knn_l2_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()

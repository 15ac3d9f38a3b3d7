"""Unit tests for distance expressions vs NumPy oracles — mirrors
util/DistancesTest.java (exact values, squared-vs-sqrt consistency,
odd dims)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectorsearch_spark.functions import cosine, dot, l2, l2_squared, norm, normalize

DIMS = [1, 2, 3, 7, 8, 16, 33, 64]


def _pairs_df(spark, dim: int, n: int = 8, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, dim)).astype(np.float32)
    b = rng.normal(size=(n, dim)).astype(np.float32)
    schema = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.FloatType()), False),
            T.StructField("b", T.ArrayType(T.FloatType()), False),
        ]
    )
    df = spark.createDataFrame(
        [(row_a.tolist(), row_b.tolist()) for row_a, row_b in zip(a, b)], schema
    )
    return df, a.astype(np.float64), b.astype(np.float64)


@pytest.mark.parametrize("dim", DIMS)
def test_l2_dot_cosine_match_numpy(spark, dim):
    df, a, b = _pairs_df(spark, dim)
    rows = df.select(
        l2("a", "b").alias("l2"),
        l2_squared("a", "b").alias("l2sq"),
        dot("a", "b").alias("dot"),
        norm("a").alias("norm_a"),
        cosine("a", "b").alias("cos"),
    ).collect()
    for i, r in enumerate(rows):
        exp_l2 = float(np.linalg.norm(a[i] - b[i]))
        exp_dot = float(a[i] @ b[i])
        exp_cos = exp_dot / (np.linalg.norm(a[i]) * np.linalg.norm(b[i]))
        assert math.isclose(r["l2"], exp_l2, rel_tol=1e-9)
        assert math.isclose(r["l2sq"], exp_l2 * exp_l2, rel_tol=1e-9)
        assert math.isclose(r["dot"], exp_dot, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r["norm_a"], float(np.linalg.norm(a[i])), rel_tol=1e-9)
        assert math.isclose(r["cos"], exp_cos, rel_tol=1e-9)


def test_zero_vector_guards(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])],
        T.StructType(
            [
                T.StructField("a", T.ArrayType(T.FloatType()), False),
                T.StructField("b", T.ArrayType(T.FloatType()), False),
            ]
        ),
    )
    r = df.select(
        cosine("a", "b").alias("cos"), normalize("a").alias("na"), norm("a").alias("n")
    ).collect()[0]
    assert r["cos"] == 0.0  # Distances.java:149-153 zero-norm guard
    assert r["n"] == 0.0
    assert r["na"] == [0.0, 0.0]  # normalize passthrough for zero vector


def test_normalize_unit_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a: array<float>")
    r = df.select(norm(normalize("a")).alias("n")).collect()[0]
    assert math.isclose(r["n"], 1.0, rel_tol=1e-12)

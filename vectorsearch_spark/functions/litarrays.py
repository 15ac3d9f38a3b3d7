"""Single-node array literals, built in O(1) py4j round-trips (r14).

Two costs stack up when an operator inlines a codebook / hyperplane set
as a column expression:

1. **Expression-tree size.** ``F.array(*[F.lit(x) for x in xs])`` is a
   ``CreateArray`` with one scalar ``Literal`` child per element — a
   16x64 codebook argmin becomes a >1000-node subtree that Catalyst
   re-analyzes and re-optimizes on every query (driver planning time,
   optimization guide §3.3/§7.3). A single ``Literal(ArrayType(...))``
   node carries the same values with none of that.
2. **py4j round-trips.** Building the tree from Python pays one
   socket round-trip per Java call — and BOTH the element-wise form
   (~3 calls per element) and ``F.lit(ndarray)`` (PySpark converts a
   1-D ndarray through a Java list, one ``__setitem__`` per element)
   are O(elements) round-trips. Profiled on the LSH signature build at
   8 tables x 4 bits x 64 dims: ~10k round-trips, 18 s of pure driver
   time before any Spark job ran.

``lit_double_array`` fixes both: the values cross the boundary as ONE
binary ``bytearray`` message (py4j transfers bytes in-band), a JVM-side
``ByteBuffer.asDoubleBuffer().get`` bulk-fills a ``double[]``, and JVM
``functions.lit`` turns that into a single ``Literal`` — ~5 round-trips
total regardless of length. Values are bit-identical to the scalar-
literal form (IEEE 754 doubles pass through untouched; verified
element-equal in tests), so every distance computed against these
arrays is unchanged.

Falls back to ``F.lit(ndarray)`` (same Literal node, slower build) on
any py4j/classic-mode assumption failure, e.g. under Spark Connect.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _active_jvm():
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None, None
    try:
        sc = spark.sparkContext
        return sc._gateway, sc._jvm
    except Exception:
        return None, None


def _bulk_lit(values: np.ndarray, jprim: str):
    """values (1-D, big-endian) -> single-Literal Column via one binary
    transfer; None when the classic py4j surface is unavailable."""
    gw, jvm = _active_jvm()
    if gw is None:
        return None
    try:
        from pyspark.sql.classic.column import Column as ClassicColumn

        bb = jvm.java.nio.ByteBuffer.wrap(bytearray(values.tobytes()))
        jarr = gw.new_array(getattr(jvm, jprim), len(values))
        if jprim == "double":
            bb.asDoubleBuffer().get(jarr)
        elif jprim == "float":
            bb.asFloatBuffer().get(jarr)
        elif jprim == "long":
            bb.asLongBuffer().get(jarr)
        else:
            bb.asIntBuffer().get(jarr)
        return ClassicColumn(jvm.org.apache.spark.sql.functions.lit(jarr))
    except Exception:
        return None


def lit_double_array(values) -> Column:
    """ONE ``Literal`` node of ``array<double>`` — a drop-in replacement
    for ``F.array(*[F.lit(float(v)) for v in values])``."""
    arr = np.ascontiguousarray(values, dtype=">f8")
    col = _bulk_lit(arr, "double")
    return col if col is not None else F.lit(arr.astype(np.float64))


def lit_float_array(values) -> Column:
    """ONE ``Literal`` node of ``array<float>``."""
    arr = np.ascontiguousarray(values, dtype=">f4")
    col = _bulk_lit(arr, "float")
    return col if col is not None else F.lit(arr.astype(np.float32))


def lit_int_array(values) -> Column:
    """ONE ``Literal`` node of ``array<int>`` — matches the type of
    ``F.array(*[F.lit(int(v)) for v in values])`` for 32-bit-range ints
    (PySpark gives a bare int literal IntegerType when it fits)."""
    wide = np.ascontiguousarray(values, dtype=np.int64)
    if wide.size and (wide.max() > 2**31 - 1 or wide.min() < -(2**31)):
        raise OverflowError(
            "lit_int_array: values exceed int32 range — use lit_long_array"
        )
    arr = np.ascontiguousarray(wide, dtype=">i4")
    col = _bulk_lit(arr, "int")
    return col if col is not None else F.lit(arr.astype(np.int32))


def lit_long_array(values) -> Column:
    """ONE ``Literal`` node of ``array<bigint>``."""
    arr = np.ascontiguousarray(values, dtype=">i8")
    col = _bulk_lit(arr, "long")
    return col if col is not None else F.lit(arr.astype(np.int64))

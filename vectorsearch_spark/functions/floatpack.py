"""Packed-float codec: ``array<float>`` ↔ little-endian float32 binary
(C11 in SURVEY §2.7 — util/FloatPacker.java:22-40).

The reference packs embeddings to LE float32 bytes because FDB values
are opaque byte strings. Spark has a native ``ArrayType(FloatType)``,
so the HOT PATH here never needs packing — parquet's typed float
encoding is also as compact as raw binary (measured: slightly SMALLER
on random vectors), so this is NOT a storage win and the engine's
tables stay ArrayType. The codec exists for surface parity — a user
migrating byte-packed embeddings (the reference's wire/storage form,
or any feature store that ships packed blobs) decodes them into the
engine with ``unpack_floats`` and re-exports with ``pack_floats`` —
and the in-task Arrow passes get a zero-copy ``np.frombuffer`` view
of packed rows instead of a per-element list build. Both directions
are bit-exact (float32 → bytes → float32 is the identity), so a
round-tripped table is a drop-in for every oracle-checked operator.

Arrow-vectorized ``pandas_udf``s (the codec is a per-row byte copy —
no Catalyst expression exists for IEEE-754 byte layout, and a
row-at-a-time Python UDF would be the usual 10-100× slower).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("binary")
def pack_floats(arrs: pd.Series) -> pd.Series:
    """array<float> → little-endian float32 bytes
    (FloatPacker.floatsToBytes, util/FloatPacker.java:22-27)."""
    return arrs.map(
        lambda a: None if a is None else np.asarray(a, dtype="<f4").tobytes()
    )


@pandas_udf("array<float>")
def unpack_floats(bs: pd.Series) -> pd.Series:
    """little-endian float32 bytes → array<float>
    (FloatPacker.bytesToFloats, util/FloatPacker.java:33-40)."""
    return bs.map(
        lambda b: None if b is None else np.frombuffer(bytes(b), dtype="<f4")
    )

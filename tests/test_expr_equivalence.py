"""Bit-identity regression gates for the r14 F.expr-text rewrites and
the single-Literal array builders.

The r14 optimization round replaced per-bit/per-hash Column-DSL loops
(hundreds to thousands of py4j round-trips per call) with single
``F.expr`` SQL strings, and element-wise literal arrays with one bulk
``Literal`` node (functions/litarrays.py). The rewrites were proven
bit-identical with ad-hoc scripts at the time; these tests pin that
equivalence in the suite so a future edit to the SQL text cannot
silently diverge from the semantics the DuckDB oracles certified.

Each reference implementation below is the pre-r14 Column-DSL tree,
copied verbatim from git history — NOT a re-derivation — so the test
compares the new strings against exactly what they replaced.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# simhash_fingerprints (operators/text.py)
# ---------------------------------------------------------------------------

def _simhash_dsl(df, bits):
    """Pre-r14 DSL aggregation over the same hashed-token intermediate."""
    from vectorsearch_spark.operators.text import fan_out, tokens

    hashed = fan_out(
        df.select(F.col("doc_id"), F.col("text").alias("_text")), "doc_id"
    ).select(
        "doc_id", F.explode(F.array_distinct(tokens("_text"))).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((F.col("h").bitwiseAND(F.lit(1 << j)) != 0).cast("int")).alias(f"b{j}")
        for j in range(bits)
    ]
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"b{j}") * 2 >= F.col("n"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return hashed.groupBy("doc_id").agg(*aggs).select("doc_id", fp.alias("simhash"))


@pytest.mark.parametrize("bits", [8, 60])
def test_simhash_expr_matches_dsl(spark, bits):
    from vectorsearch_spark.operators.text import simhash_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, ""),  # zero tokens: no fingerprint row
            (5, "Unicode tökens überall — mixed CASE Case case"),
            (6, "a a a a a b"),  # heavy repetition, ties the majority vote
        ],
        "doc_id long, text string",
    )
    got = _rows(simhash_fingerprints(docs, bits=bits), "doc_id", "simhash")
    ref = _rows(_simhash_dsl(docs, bits), "doc_id", "simhash")
    assert got == ref and len(got) == 5


# ---------------------------------------------------------------------------
# _minhash_buckets (operators/dedup.py)
# ---------------------------------------------------------------------------

def _minhash_dsl(sh, num_hashes, bands):
    """Pre-r14 DSL form of the signature + band-key pipeline."""
    from vectorsearch_spark.operators.dedup import _MINHASH_P as P

    rows_per_band = num_hashes // bands
    exploded = sh.select("doc_id", F.explode("shingles").alias("_s"))
    digest = exploded.select("doc_id", F.md5("_s").alias("_d"))
    hashed = digest.select(
        "doc_id",
        (F.conv(F.substring("_d", 1, 15), 16, 10).cast("long") % P).alias("_h1"),
        (F.conv(F.substring("_d", 17, 15), 16, 10).cast("long") % P).alias("_h2"),
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % P).alias(f"_s{i}")
            for i in range(num_hashes)
        ]
    )
    band_keys = [
        F.concat(
            F.lit(f"{b}|"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"_s{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ),
        )
        for b in range(bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_keys)).alias("band_key"))


@pytest.mark.parametrize("num_hashes,bands", [(12, 4), (16, 8), (6, 1)])
def test_minhash_buckets_expr_matches_dsl(spark, num_hashes, bands):
    from vectorsearch_spark.operators.dedup import _minhash_buckets

    sh = spark.createDataFrame(
        [
            (1, ["a b c", "b c d", "c d e"]),
            (2, ["a b c", "b c d", "x y z"]),
            (3, ["q r s"]),
            (4, ["ünïcode shingle", "a b c"]),
        ],
        "doc_id long, shingles array<string>",
    )
    got = _rows(_minhash_buckets(sh, num_hashes, bands), "doc_id", "band_key")
    ref = _rows(_minhash_dsl(sh, num_hashes, bands), "doc_id", "band_key")
    assert got == ref and len(got) == 4 * bands


# ---------------------------------------------------------------------------
# lsh_probe_signatures (operators/similarity.py)
# ---------------------------------------------------------------------------

def _lsh_probe_dsl(df, dim, n_tables, n_bits, multi_probe, seed=42):
    """Pre-r14 DSL form (per-bit dots, F.when bit folds, struct sort)."""
    from vectorsearch_spark.functions.litarrays import lit_double_array

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    key_arrays = []
    for t in range(n_tables):
        dots = []
        bits = F.lit(0).cast("long")
        for b in range(n_bits):
            plane = planes[t, b]
            d = F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    lit_double_array(plane),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            dots.append(d)
            bits = bits + F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        home = F.concat(F.lit(f"{t}|"), bits.cast("string"))
        if multi_probe <= 0:
            key_arrays.append(F.array(home))
            continue
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(dots[b]).alias("a"),
                        F.lit(b).alias("b"),
                        F.concat(
                            F.lit(f"{t}|"),
                            bits.bitwiseXOR(F.lit(1 << b)).cast("string"),
                        ).alias("k"),
                    )
                    for b in range(n_bits)
                ]
            )
        )
        flips = F.transform(
            F.slice(ranked, 1, min(multi_probe, n_bits)), lambda s: s["k"]
        )
        key_arrays.append(F.concat(F.array(home), flips))
    keys = F.flatten(F.array(*key_arrays))
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.explode(keys).alias("band_key"),
    )


@pytest.mark.parametrize(
    "n_tables,n_bits,multi_probe",
    [(2, 4, 0), (2, 4, 2), (1, 3, 1), (2, 4, 9)],  # probe 9 > n_bits: clamped
)
def test_lsh_probe_signatures_expr_matches_dsl(spark, n_tables, n_bits, multi_probe):
    from vectorsearch_spark.operators.similarity import lsh_probe_signatures

    rng = np.random.RandomState(7)
    dim = 6
    rows = [
        (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(30)
    ] + [(30, [0.0] * dim)]  # all-zero vector: every dot exactly 0 (ties)
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = _rows(
        lsh_probe_signatures(
            df, dim, n_tables=n_tables, n_bits=n_bits, multi_probe=multi_probe
        ),
        "id",
        "band_key",
    )
    ref = _rows(
        _lsh_probe_dsl(df, dim, n_tables, n_bits, multi_probe), "id", "band_key"
    )
    assert got == ref
    assert len(got) == 31 * n_tables * (1 + min(multi_probe, n_bits))


def test_lsh_probe_zero_is_lsh_signatures(spark):
    from vectorsearch_spark.operators.similarity import (
        lsh_probe_signatures,
        lsh_signatures,
    )

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(5)]) for i in range(20)],
        "id long, embedding array<double>",
    )
    a = _rows(lsh_signatures(df, 5, n_tables=3, n_bits=4), "id", "band_key")
    b = _rows(
        lsh_probe_signatures(df, 5, n_tables=3, n_bits=4, multi_probe=0),
        "id",
        "band_key",
    )
    assert a == b


# ---------------------------------------------------------------------------
# functions/litarrays.py
# ---------------------------------------------------------------------------

def _one_row(spark):
    return spark.range(1)


@pytest.mark.parametrize(
    "builder_name,values,dtype,elem_cast",
    [
        ("lit_double_array", [0.1, -2.5e300, 0.0, float(np.pi)], "array<double>", float),
        ("lit_float_array", [0.5, -1.25, 3.0], "array<float>", float),
        ("lit_int_array", [0, 1, -1, 2**31 - 1, -(2**31)], "array<int>", int),
        ("lit_long_array", [0, 2**62, -(2**62), -1], "array<bigint>", int),
    ],
)
def test_litarrays_values_and_types(spark, builder_name, values, dtype, elem_cast):
    """Bulk-bytes literal ≡ element-wise F.array(*[F.lit(x)…]) in both
    declared type and every element value."""
    import vectorsearch_spark.functions.litarrays as LA

    builder = getattr(LA, builder_name)
    col = builder(values)
    df = _one_row(spark).select(col.alias("a"))
    assert df.schema["a"].dataType.simpleString() == dtype
    [row] = df.collect()
    assert [elem_cast(v) for v in row["a"]] == [elem_cast(v) for v in values]

    # element-wise reference form (what the bulk path replaced)
    if builder_name == "lit_double_array":
        ref = F.array(*[F.lit(float(v)).cast("double") for v in values])
    elif builder_name == "lit_float_array":
        ref = F.array(*[F.lit(float(v)).cast("float") for v in values])
    elif builder_name == "lit_int_array":
        ref = F.array(*[F.lit(int(v)).cast("int") for v in values])
    else:
        ref = F.array(*[F.lit(int(v)).cast("long") for v in values])
    [ref_row] = _one_row(spark).select(ref.alias("a")).collect()
    assert list(row["a"]) == list(ref_row["a"])


def test_litarrays_double_bit_identity(spark):
    """IEEE 754 doubles pass through the ByteBuffer transfer untouched —
    compare raw bit patterns, not rounded values."""
    from vectorsearch_spark.functions.litarrays import lit_double_array

    rng = np.random.RandomState(11)
    vals = rng.standard_normal(64)
    [row] = _one_row(spark).select(lit_double_array(vals).alias("a")).collect()
    got = np.array(row["a"], dtype=np.float64)
    assert got.tobytes() == vals.tobytes()


def test_litarrays_int_range_guard():
    """lit_int_array's int32 assumption: values outside int32 must not
    silently wrap — the builder is documented for 32-bit-range ints
    only, so out-of-range input has to fail loudly at build time."""
    from vectorsearch_spark.functions.litarrays import lit_int_array

    with pytest.raises((OverflowError, ValueError)):
        lit_int_array([2**31])
    with pytest.raises((OverflowError, ValueError)):
        lit_int_array([-(2**31) - 1])


def test_litarrays_fallback_path(spark, monkeypatch):
    """With the classic py4j surface unavailable (Spark Connect), the
    builders fall back to F.lit(ndarray) and still produce the same
    single-Literal values."""
    import vectorsearch_spark.functions.litarrays as LA

    monkeypatch.setattr(LA, "_active_jvm", lambda: (None, None))
    vals = [1.5, -2.25, 1e-300]
    col = LA.lit_double_array(vals)
    df = _one_row(spark).select(col.alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<double>"
    [row] = df.collect()
    assert list(row["a"]) == vals
    [irow] = _one_row(spark).select(
        LA.lit_int_array([3, -4]).alias("a")
    ).collect()
    assert list(irow["a"]) == [3, -4]

"""Schema-enforced sources for the engine's tables.

The reference's only source is its FDB keyspace; our sources are lake
files. This module is the single place that knows (a) the expected
schema of every test-corpus table, (b) the quirks of reading them —
most notably parquet TIMESTAMP(NANOS), which Spark cannot read natively
— and (c) generic schema-validated readers for parquet/csv/json so a
wrong or drifted input schema fails loudly at load time instead of
producing silently-wrong query results (the spirit of the reference's
open-time config validation, fdb/FdbVectorStore.java:124-166).

Scale notes: explicit schemas skip file-footer schema inference (a
driver-side full file listing + footer read per file — expensive at
100k+ files); readers return plain DataFrames so Catalyst pushdown and
partition pruning apply as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# expected column→type pairs for the standard corpus; asserted as a
# SUBSET of the actual schema so additive evolution doesn't break reads
TABLE_SCHEMAS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_name": "string", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_name": "string"},
    "part": {"p_partkey": "bigint", "p_name": "string"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint"},
    "lineitem": {"l_orderkey": "bigint", "l_quantity": "double", "l_extendedprice": "double"},
    "events": {"event_id": "bigint", "user_id": "bigint", "event_type": "string", "value": "double"},
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


def _check_schema(df: DataFrame, expected: dict[str, str], name: str) -> DataFrame:
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = [
        f"{col}: expected {typ}, got {actual.get(col, 'MISSING')}"
        for col, typ in expected.items()
        if actual.get(col) != typ
    ]
    if problems:
        raise ValueError(f"schema mismatch for table '{name}': " + "; ".join(problems))
    return df


# schema METADATA memo (r14): every spark.read.parquet re-lists the
# path and re-reads a footer for schema inference — pure driver
# overhead re-paid on each of the hundreds of load_table calls a bench
# run makes. Caching the inferred StructType per (path) and passing it
# back via .schema(...) skips the inference entirely; this caches no
# data, no plan, and no results — just the file schema, which is what
# the module doc already prescribes for 100k+-file tables ("explicit
# schemas skip file-footer schema inference").
_SCHEMA_CACHE: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    st = _SCHEMA_CACHE.get(path)
    if st is None:
        st = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = st
    return spark.read.schema(st).parquet(path)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize events.parquet's ``ts`` to a session-TZ TIMESTAMP.

    Corpus drops have carried two physical encodings: TIMESTAMP(NANOS)
    (which Spark's parquet reader rejects — ``nanosAsLong`` surfaces it
    as a ns-epoch long we truncate to µs, matching DuckDB's internal
    ns→µs handling) and plain TIMESTAMP(MICROS) (read natively as
    TIMESTAMP_NTZ; cast to TIMESTAMP so downstream window/session ops
    and string renderings are identical across drops under the UTC
    session zone)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _read_parquet(spark, path)
    ts_type = ev.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":  # ns epoch via nanosAsLong
        return ev.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table with schema validation (and UTC session
    time so timestamp renderings are engine-stable)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        df = read_events(spark, f"{sf_dir}/events.parquet")
    else:
        df = _read_parquet(spark, f"{sf_dir}/{name}.parquet")
    expected = TABLE_SCHEMAS.get(name)
    return _check_schema(df, expected, name) if expected else df


def read_with_schema(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    **options,
) -> DataFrame:
    """Generic reader with an explicit (enforced, not inferred) schema.

    - parquet: read, then verify the file schema covers the requested
      columns/types (parquet ignores the passed schema for pruning
      mismatches otherwise);
    - csv/json: pass the schema to the parser with FAILFAST so malformed
      rows abort instead of becoming nulls.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if fmt == "parquet":
        df = spark.read.options(**options).parquet(path)
        expected = {f.name: f.dataType.simpleString() for f in schema.fields}
        df = _check_schema(df, expected, path)
        return df.select(*[f.name for f in schema.fields])
    reader = spark.read.schema(schema).option("mode", "FAILFAST").options(**options)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported format: {fmt}")

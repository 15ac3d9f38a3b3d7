"""Source-reader tests: schema validation catches drift, events nanos
handling, and FAILFAST csv/json parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import CapturedException

from vectorsearch_spark.sources import (
    TABLE_SCHEMAS,
    load_table,
    read_with_schema,
)


def test_all_corpus_tables_load_and_validate(spark, sf_dir):
    for name in TABLE_SCHEMAS:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    f = {x.name: x.dataType.simpleString() for x in ev.schema.fields}
    assert f["ts"] == "timestamp"
    assert ev.select("ts").first()[0].year >= 1990


def test_schema_mismatch_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="schema mismatch.*embedding"):
        read_with_schema(
            spark,
            f"{sf_dir}/embeddings.parquet",
            "vec_id bigint, embedding array<double>",
        )


def test_parquet_projection_via_schema(spark, sf_dir):
    df = read_with_schema(spark, f"{sf_dir}/documents.parquet", "doc_id bigint, text string")
    assert df.columns == ["doc_id", "text"]


def test_csv_failfast(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("csv_src")
    good = d / "good.csv"
    good.write_text("1,alpha\n2,beta\n")
    df = read_with_schema(spark, str(good), "id int, name string", fmt="csv")
    assert df.count() == 2
    bad = d / "bad.csv"
    bad.write_text("1,alpha\nnot_an_int,beta\n")
    with pytest.raises((CapturedException, Exception)):
        read_with_schema(spark, str(bad), "id int, name string", fmt="csv").collect()


# --- custom Python DataSource (Spark 4 datasource API) ---


def test_synthetic_corpus_datasource(spark):
    from vectorsearch_spark.sources.synthetic import SyntheticCorpusDataSource

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (
        spark.read.format("synthetic_corpus")
        .option("rows", 1000)
        .option("partitions", 7)
        .option("seed", 11)
        .load()
    )
    assert df.columns == ["doc_id", "text", "lang"]
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 7
    assert df.select("doc_id").distinct().count() == 1000
    # determinism: re-read AND different partitioning give identical rows
    again = (
        spark.read.format("synthetic_corpus")
        .option("rows", 1000)
        .option("partitions", 3)
        .option("seed", 11)
        .load()
    )
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b
    # different seed -> different corpus
    other = (
        spark.read.format("synthetic_corpus")
        .option("rows", 1000)
        .option("seed", 12)
        .load()
    )
    assert sorted(tuple(r) for r in other.collect()) != a
    # composes with real operators: language histogram is plan-only
    from collections import Counter

    langs = Counter(r["lang"] for r in df.collect())
    got = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == dict(langs)

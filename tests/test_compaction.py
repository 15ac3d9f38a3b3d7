"""Crash-safety of EpochBucketedState.compact_epochs (r13, r12 ADVICE
high): the SET path must never delete committed rows before the merged
copy is table-visible, and the ADDITIVE path's marker-gated staged swap
must recover exactly once from every crash window — including the
subtle one where the rename already consumed the staged dir and a
replayed recovery must NOT re-drop the live merged partition."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.incremental import (
    EpochBucketedState,
    _split_ddl,
)


def _mkstate(spark, tmp_path_factory, name, ddl, key, sum_cols=None, buckets=4):
    base = str(tmp_path_factory.mktemp("cstate")) + "/st"
    os.makedirs(base, exist_ok=True)
    st = EpochBucketedState(spark, base, name, ddl, key, buckets, sum_cols=sum_cols)
    spark.sql(f"DROP TABLE IF EXISTS {st.table}")
    spark.sql(f"DROP TABLE IF EXISTS {st._stage_names()[0]}")
    return st


def _set_state(spark, tmp_path_factory):
    st = _mkstate(spark, tmp_path_factory, "seturls", "`_curl` STRING", "_curl")
    for e, vals in enumerate([["a", "b"], ["b", "c"], ["d"]]):
        st.write_epoch(
            spark.createDataFrame([(v,) for v in vals], "_curl string"), e
        )
    return st


def _additive_state(spark, tmp_path_factory):
    st = _mkstate(
        spark, tmp_path_factory, "kc",
        "`__key` STRING, `__nd_b` BIGINT", "__key", sum_cols=["__nd_b"],
    )
    for e, vals in enumerate(
        [[("k1", 2), ("k2", 1)], [("k1", 3), ("k3", 5)], [("k2", 2)]]
    ):
        st.write_epoch(
            spark.createDataFrame(vals, "__key string, __nd_b long"), e
        )
    return st


ADD_TOTALS = [("k1", 5), ("k2", 3), ("k3", 5)]


def _sums(st, before=10):
    return sorted(
        tuple(r)
        for r in st.read_before(before)
        .groupBy("__key")
        .agg(F.sum("__nd_b").cast("long").alias("__nd_b"))
        .collect()
    )


def _epochs(st):
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(st.loc)
        if d.startswith("epoch=")
    )


def test_set_compaction_merges_and_bounds_partitions(spark, tmp_path_factory):
    st = _set_state(spark, tmp_path_factory)
    st.compact_epochs(2)
    assert _epochs(st) == [2]
    got = sorted(r[0] for r in st.read_before(10).distinct().collect())
    assert got == ["a", "b", "c", "d"]
    # re-entrant: nothing older remains, second call is a no-op
    st.compact_epochs(2)
    assert _epochs(st) == [2]


def test_set_compaction_crash_mid_drop_is_set_safe(spark, tmp_path_factory):
    """Crash AFTER the append commit, mid partition-drop loop: committed
    rows are duplicated (epoch dir + merged copy), never lost — the
    anti/semi-join read is invariant, and a re-run finishes cleanup."""
    st = _set_state(spark, tmp_path_factory)
    orig = EpochBucketedState._drop_partition
    calls = {"n": 0}

    def crashy(self, e):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash mid-drop")
        calls["n"] += 1
        orig(self, e)

    EpochBucketedState._drop_partition = crashy
    try:
        with pytest.raises(RuntimeError, match="injected"):
            st.compact_epochs(2)
    finally:
        EpochBucketedState._drop_partition = orig
    # epoch 1 still on disk AND its rows already merged into 2 —
    # duplicates, but the SET any reader observes is unchanged
    assert 1 in _epochs(st)
    got = sorted(r[0] for r in st.read_before(10).distinct().collect())
    assert got == ["a", "b", "c", "d"]
    st.compact_epochs(2)
    assert _epochs(st) == [2]
    assert sorted(
        r[0] for r in st.read_before(10).distinct().collect()
    ) == ["a", "b", "c", "d"]


def test_additive_compaction_sums_and_bounds_partitions(spark, tmp_path_factory):
    st = _additive_state(spark, tmp_path_factory)
    assert _sums(st) == ADD_TOTALS
    st.compact_epochs(2)
    assert _epochs(st) == [2]
    assert _sums(st) == ADD_TOTALS
    assert not os.path.exists(os.path.join(st.loc, "_compact_commit.json"))
    # whole-call re-entrancy: sum of already-unique groups is identity
    st.compact_epochs(2)
    assert _sums(st) == ADD_TOTALS
    # fold on: a later epoch + compaction keeps summing correctly
    st.write_epoch(
        spark.createDataFrame([("k1", 1)], "__key string, __nd_b long"), 3
    )
    st.compact_epochs(3)
    assert _epochs(st) == [3]
    assert _sums(st) == [("k1", 6), ("k2", 3), ("k3", 5)]


def test_additive_crash_after_marker_recovers_on_read(spark, tmp_path_factory):
    """Crash right after the commit marker landed (stage written, swap
    not started): the next READ path (_ensure) completes the swap
    before any rows are served."""
    st = _additive_state(spark, tmp_path_factory)
    orig = EpochBucketedState._finish_compact
    EpochBucketedState._finish_compact = lambda self: None
    try:
        st.compact_epochs(2)  # stages + writes marker, swap suppressed
    finally:
        EpochBucketedState._finish_compact = orig
    assert os.path.exists(os.path.join(st.loc, "_compact_commit.json"))
    assert _epochs(st) == [0, 1, 2]  # old partitions still live
    # a FRESH handle (new session state in production) reads: recovery
    # must run first and serve the merged sums exactly once
    st2 = EpochBucketedState(
        spark, os.path.dirname(st.loc), "kc",
        "`__key` STRING, `__nd_b` BIGINT", "__key", 4, sum_cols=["__nd_b"],
    )
    assert _sums(st2) == ADD_TOTALS
    assert _epochs(st2) == [2]
    assert not os.path.exists(os.path.join(st2.loc, "_compact_commit.json"))


def test_additive_crash_mid_swap_before_rename(spark, tmp_path_factory):
    """Crash after recovery dropped some live partitions but BEFORE the
    rename: staged dir still present picks the redo branch; no rows
    lost, totals exact after re-run."""
    st = _additive_state(spark, tmp_path_factory)
    orig_rename = os.rename

    def crashy(src, dst):
        if "__cstage" in src:
            raise RuntimeError("injected crash before rename")
        orig_rename(src, dst)

    os.rename = crashy
    try:
        with pytest.raises(RuntimeError, match="injected"):
            st.compact_epochs(2)
    finally:
        os.rename = orig_rename
    # marker present, live partitions ≤ upto gone, staged copy intact
    assert os.path.exists(os.path.join(st.loc, "_compact_commit.json"))
    staged = os.path.join(st._stage_names()[1], "epoch=2")
    assert os.path.isdir(staged)
    st._finish_compact()
    assert _sums(st) == ADD_TOTALS
    assert _epochs(st) == [2]


def test_additive_crash_after_rename_does_not_redrop(spark, tmp_path_factory):
    """THE data-loss window of a naive recovery: rename consumed the
    staged dir, crash before the marker was removed. A replayed
    recovery must take the staged-missing branch and leave the live
    merged partition alone."""
    st = _additive_state(spark, tmp_path_factory)
    st.compact_epochs(2)
    assert _sums(st) == ADD_TOTALS
    # resurrect the marker as if the crash hit between rename and
    # os.remove(marker)
    with open(os.path.join(st.loc, "_compact_commit.json"), "w") as fh:
        json.dump({"upto": 2}, fh)
    st._finish_compact()
    assert _sums(st) == ADD_TOTALS
    assert _epochs(st) == [2]
    assert not os.path.exists(os.path.join(st.loc, "_compact_commit.json"))


def test_additive_restage_after_crash_before_marker(spark, tmp_path_factory):
    """Crash after staging but BEFORE the marker: nothing readers see
    changed; a re-run restages (INSERT OVERWRITE on the private staging
    table) and completes."""
    st = _additive_state(spark, tmp_path_factory)
    orig = os.replace

    def crashy(src, dst):
        if "_compact_commit" in dst:
            raise RuntimeError("injected crash before marker")
        orig(src, dst)

    os.replace = crashy
    try:
        with pytest.raises(RuntimeError, match="injected"):
            st.compact_epochs(2)
    finally:
        os.replace = orig
    assert _epochs(st) == [0, 1, 2]  # untouched
    assert _sums(st) == ADD_TOTALS
    st.compact_epochs(2)
    assert _epochs(st) == [2]
    assert _sums(st) == ADD_TOTALS


def test_split_ddl_nested_types_and_validation():
    assert _split_ddl("`a` STRING, `b` BIGINT") == ["`a` STRING", "`b` BIGINT"]
    assert _split_ddl("`p` DECIMAL(10,2), `m` MAP<STRING,ARRAY<INT>>") == [
        "`p` DECIMAL(10,2)",
        "`m` MAP<STRING,ARRAY<INT>>",
    ]
    with pytest.raises(ValueError, match="not '<name> <type>'"):
        _split_ddl("`a` STRING, badpiece")
    with pytest.raises(ValueError, match="unbalanced"):
        _split_ddl("`a` DECIMAL(10,2")


def test_nested_type_state_roundtrip(spark, tmp_path_factory):
    """The r12 ADVICE failure mode end-to-end: a comma-bearing column
    type now produces a correct table + roundtrip instead of a corrupt
    CREATE TABLE."""
    st = _mkstate(
        spark, tmp_path_factory, "nested",
        "`k` STRING, `amount` DECIMAL(10,2)", "k",
    )
    assert st.cols == ["k", "amount"]
    st.write_epoch(
        spark.createDataFrame([("a", 1.50), ("b", 2.25)]).toDF("k", "amount")
        .select("k", F.col("amount").cast("decimal(10,2)")),
        0,
    )
    got = sorted((r[0], str(r[1])) for r in st.read_before(5).collect())
    assert got == [("a", "1.50"), ("b", "2.25")]


def test_sum_cols_validation():
    class _S:  # no session needed — validation happens in __init__
        pass

    with pytest.raises(ValueError, match="not in schema"):
        EpochBucketedState(_S(), "/tmp/x", "v", "`k` STRING, `n` BIGINT",
                           "k", 4, sum_cols=["missing"])
    with pytest.raises(ValueError, match="cluster key"):
        EpochBucketedState(_S(), "/tmp/x", "v", "`k` BIGINT, `n` BIGINT",
                           "k", 4, sum_cols=["k", "n"])


def test_stream_compact_every_requires_buckets(spark, tmp_path_factory):
    from vectorsearch_spark.operators.dedup import stream_line_dedup
    from vectorsearch_spark.operators.urls import stream_url_dedup

    d = str(tmp_path_factory.mktemp("ce"))
    docs = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="state_buckets"):
        stream_url_dedup(docs, d + "/u", d + "/uc", compact_every=2)
    with pytest.raises(ValueError, match="state_buckets"):
        stream_line_dedup(docs, d + "/l", d + "/lc", compact_every=2)


def test_count_consumed_substore_refuses_compaction():
    """A SET substore whose reader counts rows per key (the minhash
    fold's band-frequency cap) must refuse compaction: set-path crash
    windows tolerate duplicates that membership joins ignore but
    counts inflate (r13 ADVICE)."""
    class _S:
        pass

    st = EpochBucketedState(
        _S(), "/tmp/x", "buckets", "`doc_id` BIGINT, `band_key` STRING",
        "band_key", 4, count_consumed=True,
    )
    with pytest.raises(ValueError, match="count-consumed"):
        st.compact_epochs(5)

"""Keyed MERGE into partitioned parquet (operators/merge.py): content
semantics (insert / update / cross-partition move / delete /
idempotency) plus the layout contract — untouched partitions' files
are byte-identical on disk."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.merge import merge_delete, merge_upsert

SCHEMA = "doc_id long, lang string, text string"


def _write_initial(spark, path):
    rows = [
        (1, "en", "one"),
        (2, "en", "two"),
        (3, "fr", "trois"),
        (4, "de", "vier"),
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(path)


def _snapshot(path, part):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/lang={part}/*.parquet")
    }


def _content(spark, path):
    return {
        (r["doc_id"], r["lang"], r["text"])
        for r in spark.read.parquet(path).collect()
    }


def test_merge_upsert_update_insert_and_move(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merge_tbl"))
    _write_initial(spark, path)
    de_before = _snapshot(path, "de")

    updates = spark.createDataFrame(
        [
            (2, "en", "TWO"),      # in-place update
            (3, "en", "three"),    # moves fr -> en
            (5, "fr", "cinq"),     # new key
        ],
        SCHEMA,
    )
    n = merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    # touched: en (update + move target), fr (move source + insert) — de untouched
    assert n == 2
    assert _content(spark, path) == {
        (1, "en", "one"),
        (2, "en", "TWO"),
        (3, "en", "three"),
        (4, "de", "vier"),
        (5, "fr", "cinq"),
    }
    assert _snapshot(path, "de") == de_before  # untouched bytes

    # idempotency: the same upsert again changes nothing semantically
    merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    assert _content(spark, path) == {
        (1, "en", "one"),
        (2, "en", "TWO"),
        (3, "en", "three"),
        (4, "de", "vier"),
        (5, "fr", "cinq"),
    }


def test_merge_upsert_empty_updates_is_noop(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merge_noop"))
    _write_initial(spark, path)
    empty = spark.createDataFrame([], SCHEMA)
    assert merge_upsert(spark, path, empty, "doc_id", "lang") == 0
    assert len(_content(spark, path)) == 4


def test_merge_delete_partition_scoped(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merge_del"))
    _write_initial(spark, path)
    de_before = _snapshot(path, "de")

    keys = spark.createDataFrame([(2,), (3,), (99,)], "doc_id long")
    n = merge_delete(spark, path, keys, key_col="doc_id", partition_col="lang")
    assert n == 2  # en + fr; de untouched, 99 absent
    assert _content(spark, path) == {(1, "en", "one"), (4, "de", "vier")}
    assert _snapshot(path, "de") == de_before

    # deleting already-absent keys is a no-op
    assert merge_delete(spark, path, keys, "doc_id", "lang") == 0


def test_merge_delete_empties_partition(spark, tmp_path_factory):
    """Deleting every row of a partition leaves it empty (rows gone on
    read) — dynamic overwrite writes no files for an empty group, and
    the stale files of the fully-emptied partition must not resurrect
    rows."""
    path = str(tmp_path_factory.mktemp("merge_del_all"))
    _write_initial(spark, path)
    keys = spark.createDataFrame([(4,)], "doc_id long")
    n = merge_delete(spark, path, keys, key_col="doc_id", partition_col="lang")
    assert n == 1
    got = _content(spark, path)
    assert (4, "de", "vier") not in got
    assert len(got) == 3


# ---------------------------------------------------------------------------
# Crash-injection: the staged rename-swap protocol (staging.py)
# ---------------------------------------------------------------------------

class _Boom(RuntimeError):
    pass


def _crash_at(stage_name, nth=1):
    """A staging._FAULT hook raising on the nth occurrence of stage."""
    seen = {"n": 0}

    def hook(stage, detail):
        if stage == stage_name:
            seen["n"] += 1
            if seen["n"] >= nth:
                raise _Boom(f"injected crash at {stage}:{detail}")

    return hook


@pytest.mark.parametrize("stage", ["staged", "backed_up", "swapped"])
def test_merge_upsert_crash_then_recover_then_rerun_converges(
    spark, tmp_path_factory, stage
):
    """Kill the swap at each protocol point; recover_partial_swaps must
    restore every partition to a readable old-or-new state, and
    re-running the SAME merge must converge to the clean-run result
    (upsert by key is idempotent)."""
    from vectorsearch_spark import staging

    path = str(tmp_path_factory.mktemp("merge_crash"))
    _write_initial(spark, path)
    updates = spark.createDataFrame(
        [(2, "en", "TWO"), (3, "en", "three"), (5, "fr", "cinq")], SCHEMA
    )
    expected = {
        (1, "en", "one"), (2, "en", "TWO"), (3, "en", "three"),
        (4, "de", "vier"), (5, "fr", "cinq"),
    }

    staging._FAULT = _crash_at(stage)
    try:
        with pytest.raises(_Boom):
            merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    finally:
        staging._FAULT = None

    staging.recover_partial_swaps(spark, path)
    # invariant: every partition readable, old or new rows only
    post = _content(spark, path)
    allowed = expected | {(2, "en", "two"), (3, "fr", "trois")}
    assert post <= allowed, post - allowed
    # no protocol litter
    names = os.listdir(path)
    assert not [n for n in names if n.startswith(staging.BACKUP_PREFIX)], names
    assert not [n for n in names if n.startswith(staging.STAGING_PREFIX)], names

    merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    assert _content(spark, path) == expected


def test_recover_partial_swaps_restores_missing_live_dir(spark, tmp_path_factory):
    """Direct protocol check: a backup with NO live dir (crash between
    backup-rename and staged-rename) rolls BACK; a backup WITH a live
    dir (crash before backup delete) rolls FORWARD (keeps new)."""
    import shutil

    from vectorsearch_spark import staging

    path = str(tmp_path_factory.mktemp("swap_recover"))
    _write_initial(spark, path)
    before = _content(spark, path)
    # simulate crash between backup and swap: live dir missing
    shutil.move(f"{path}/lang=en", f"{path}/{staging.BACKUP_PREFIX}lang=en")
    acts = staging.recover_partial_swaps(spark, path)
    assert any(a.startswith("restored:") for a in acts), acts
    assert _content(spark, path) == before
    # simulate crash after swap, before backup delete: both dirs exist
    shutil.copytree(f"{path}/lang=de", f"{path}/{staging.BACKUP_PREFIX}lang=de")
    acts = staging.recover_partial_swaps(spark, path)
    assert any(a.startswith("dropped_backup:") for a in acts), acts
    assert _content(spark, path) == before


def test_swap_rename_returning_false_aborts_loudly(spark, tmp_path_factory):
    """Hadoop FileSystem.rename signals failure by returning FALSE, not
    raising. A false return during the swap must raise IOError (before
    the fix it proceeded silently: the finally-block deleted the
    staging dir while the live partition was never replaced, losing
    the rewrite while reporting the partition touched); recovery +
    rerun must then converge."""
    import pytest

    from vectorsearch_spark import staging

    path = str(tmp_path_factory.mktemp("merge_false"))
    _write_initial(spark, path)
    updates = spark.createDataFrame([(2, "en", "TWO")], SCHEMA)

    real_fs = staging._fs

    class _FsProxy:
        def __init__(self, fs):
            self._fs = fs
            self.fired = False

        def rename(self, src, dst):
            # fail the staging->live swap rename exactly once
            if not self.fired and staging.STAGING_PREFIX in str(src.toString()):
                self.fired = True
                return False
            return self._fs.rename(src, dst)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    proxies = []

    def patched(spark_, p):
        fs, jvm = real_fs(spark_, p)
        proxy = _FsProxy(fs)
        proxies.append(proxy)
        return proxy, jvm

    staging._fs = patched
    try:
        with pytest.raises(IOError, match="swap rename failed"):
            merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    finally:
        staging._fs = real_fs
    assert any(p.fired for p in proxies)

    staging.recover_partial_swaps(spark, path)
    post = _content(spark, path)
    old = {(1, "en", "one"), (2, "en", "two"), (3, "fr", "trois"), (4, "de", "vier")}
    new = {(1, "en", "one"), (2, "en", "TWO"), (3, "fr", "trois"), (4, "de", "vier")}
    assert post in (old, new), post

    merge_upsert(spark, path, updates, key_col="doc_id", partition_col="lang")
    assert _content(spark, path) == new

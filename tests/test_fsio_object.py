"""Object-store fsio backend (vectorsearch_spark/objectstore.py, r13
VERDICT #1): the manifest-commit protocol satisfies the fsio contract
with NO atomic rename primitive — crash points enumerated at the blob
level, and the url/line/rollup fold suites re-run with the backend
swapped in."""

from __future__ import annotations

import json
import os

import pytest

from vectorsearch_spark import fsio
from vectorsearch_spark.fsio import (
    epoch_ids,
    restore_swap_backup,
    set_state_fs,
    swap_dir_in,
    write_file_atomic,
)
from vectorsearch_spark.objectstore import LocalBlobStore, ObjectStoreStateFS


def test_object_backend_uses_no_rename_primitive():
    """The backend must synthesize atomicity from PUT alone: no
    os.rename/os.replace/shutil.move anywhere in ObjectStoreStateFS
    (LocalBlobStore.put's internal os.replace is the EMULATION of S3's
    atomic object PUT, outside the class under test)."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "vectorsearch_spark/objectstore.py",
        )
    ).read()
    cls = src[src.index("class ObjectStoreStateFS") :]
    for pat in ("os.rename(", "os.replace(", "shutil.move(", "shutil.copytree("):
        assert pat not in cls, f"{pat} used inside ObjectStoreStateFS"


class FaultStore(LocalBlobStore):
    """Raise on the Nth call of one op kind — the crash injector.
    Manifest PUTs and data PUTs are distinguished by key so tests can
    target protocol steps precisely."""

    def __init__(self, manifest_name: str):
        self.manifest_name = manifest_name
        self.fail_op: "str | None" = None
        self.fail_at = 0
        self.counts: "dict[str, int]" = {}

    def arm(self, op: str, at: int) -> None:
        self.fail_op, self.fail_at = op, at
        self.counts = {}

    def _tick(self, op: str) -> None:
        self.counts[op] = self.counts.get(op, 0) + 1
        if op == self.fail_op and self.counts[op] == self.fail_at:
            raise RuntimeError(f"injected crash at {op}#{self.fail_at}")

    def put(self, key, data):
        kind = (
            "put_manifest"
            if os.path.basename(key) == self.manifest_name
            else "put_data"
        )
        self._tick(kind)
        super().put(key, data)

    def copy(self, src, dst):
        self._tick("copy")
        super().copy(src, dst)

    def delete(self, key):
        self._tick("delete")
        super().delete(key)


@pytest.fixture()
def obj(tmp_path):
    """(store, root, fs) with the backend installed; restores after."""
    store = FaultStore(ObjectStoreStateFS.MANIFEST)
    root = str(tmp_path)
    fs = ObjectStoreStateFS(store, root)
    prev = set_state_fs(fs)
    try:
        yield store, root, fs
    finally:
        set_state_fs(prev)


def _mk_tree(root: str, name: str, tag: str, files: int = 2) -> str:
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "sub"), exist_ok=True)
    for i in range(files):
        with open(os.path.join(d, "sub" if i % 2 else "", f"f{i}"), "w") as fh:
            fh.write(f"{tag}-{i}")
    return d


def test_contract_basics_on_object_backend(obj):
    store, root, fs = obj
    st = os.path.join(root, "st")
    fs.makedirs(st)
    write_file_atomic(st, "_last_epoch.json", '{"epoch": 2}')
    assert fs.read_text(os.path.join(st, "_last_epoch.json")) == '{"epoch": 2}'
    # atomic overwrite via PUT
    write_file_atomic(st, "_last_epoch.json", '{"epoch": 3}')
    assert json.loads(fs.read_text(os.path.join(st, "_last_epoch.json")))["epoch"] == 3
    # listdir: names, no manifest leak, no spool residue
    fs.makedirs(os.path.join(st, "epoch=0"))
    with open(os.path.join(st, "epoch=0", "p"), "w") as fh:
        fh.write("x")
    assert fs.listdir(st) == sorted(["_last_epoch.json", "epoch=0"])
    assert ObjectStoreStateFS.MANIFEST not in fs.listdir(root)
    assert epoch_ids(st) == [0]
    # [] for missing; NotADirectoryError for a file root
    assert fs.listdir(os.path.join(root, "nope")) == []
    with pytest.raises(NotADirectoryError):
        fs.listdir(os.path.join(st, "_last_epoch.json"))
    # remove / rmtree
    fs.remove(os.path.join(st, "_last_epoch.json"))
    assert not fs.exists(os.path.join(st, "_last_epoch.json"))
    fs.rmtree(os.path.join(st, "epoch=0"))
    assert not fs.isdir(os.path.join(st, "epoch=0"))


def test_object_rename_semantics(obj):
    store, root, fs = obj
    src = _mk_tree(root, "a", "g1")
    fs.rename(src, os.path.join(root, "b"))
    assert not fs.exists(src)
    assert sorted(fs.listdir(os.path.join(root, "b"))) == ["f0", "sub"]
    assert fs.read_text(os.path.join(root, "b", "f0")) == "g1-0"
    assert fs.read_text(os.path.join(root, "b", "sub", "f1")) == "g1-1"
    with pytest.raises(FileNotFoundError):
        fs.rename(os.path.join(root, "missing"), os.path.join(root, "c"))
    _mk_tree(root, "c", "g2")
    with pytest.raises(FileExistsError):
        fs.rename(os.path.join(root, "b"), os.path.join(root, "c"))
    # single-object rename
    fs.rename(os.path.join(root, "b", "f0"), os.path.join(root, "solo"))
    assert fs.read_text(os.path.join(root, "solo")) == "g1-0"
    assert not fs.exists(os.path.join(root, "b", "f0"))


def test_rename_crash_enumeration(tmp_path):
    """At EVERY blob-level crash point of the manifest-commit rename,
    a restarted backend observes exactly one complete generation, and
    recovery leaves the store physically clean for a retry."""
    cases = [
        ("put_manifest", 1, "src"),  # before pending staged
        ("copy", 1, "src"),          # mid-copy
        ("put_manifest", 2, "src"),  # copied, commit PUT fails
        ("delete", 1, "dst"),        # committed, src delete fails
        ("put_manifest", 3, "dst"),  # src deleted, clear PUT fails
    ]
    for op, at, survivor in cases:
        store = FaultStore(ObjectStoreStateFS.MANIFEST)
        root = str(tmp_path / f"{op}{at}")
        os.makedirs(root)
        fs = ObjectStoreStateFS(store, root)
        src = _mk_tree(root, "src", "gen1", files=3)
        dst = os.path.join(root, "dst")
        store.arm(op, at)
        with pytest.raises(RuntimeError, match="injected"):
            fs.rename(src, dst)
        store.arm("none", 0)

        # process restart: a FRESH backend recovers at init
        fs2 = ObjectStoreStateFS(store, root)
        vis_src, vis_dst = fs2.exists(src), fs2.exists(dst)
        assert (vis_src, vis_dst) == (survivor == "src", survivor == "dst"), (
            f"{op}#{at}: expected only {survivor} visible, got "
            f"src={vis_src} dst={vis_dst}"
        )
        live = src if survivor == "src" else dst
        assert sorted(fs2.listdir(live)) == ["f0", "f2", "sub"]
        assert fs2.read_text(os.path.join(live, "f0")) == "gen1-0"
        # physical garbage of the dead side is gone after recovery
        dead = dst if survivor == "src" else src
        assert store.list_prefix(dead) == []
        # retry converges to dst
        if survivor == "src":
            fs2.rename(src, dst)
        assert fs2.read_text(os.path.join(dst, "sub", "f1")) == "gen1-1"
        assert not fs2.exists(src)


def test_swap_dir_crash_restores_on_object_backend(tmp_path):
    """swap_dir_in's crash window on the object backend: a crash inside
    the live→old rename (after its commit, before src cleanup) leaves
    live suppressed and old visible; restart + restore_swap_backup
    rolls back, and the re-swap publishes the new generation."""
    store = FaultStore(ObjectStoreStateFS.MANIFEST)
    root = str(tmp_path)
    fs = ObjectStoreStateFS(store, root)
    prev = set_state_fs(fs)
    try:
        live = _mk_tree(root, "state", "gen1")
        tmp = _mk_tree(root, "state.tmp", "gen2")
        store.arm("delete", 1)
        with pytest.raises(RuntimeError, match="injected"):
            swap_dir_in(tmp, live)
        store.arm("none", 0)

        fs2 = ObjectStoreStateFS(store, root)
        set_state_fs(fs2)
        assert not fs2.exists(live) and fs2.exists(live + ".old")
        restore_swap_backup(live)
        assert fs2.read_text(os.path.join(live, "f0")) == "gen1-0"
        # the tmp generation was untouched by the w1 crash — re-swap
        swap_dir_in(tmp, live)
        assert fs2.read_text(os.path.join(live, "f0")) == "gen2-0"
        assert not fs2.exists(live + ".old") and not fs2.exists(tmp)
    finally:
        set_state_fs(prev)


def test_url_fold_crash_replay_on_object_backend(spark, tmp_path_factory, obj):
    """The URL-frontier fold's exactly-once suite, backend swapped in:
    cross-batch dedup against persisted state, replay no-op, and a
    crashed attempt's partial epoch dirs invisible to the replay."""
    store, root, fs = obj
    from vectorsearch_spark.operators.urls import (
        fold_url_dedup_batch,
        read_accepted,
    )

    schema = "doc_id long, url string"
    state = os.path.join(root, "url_state")
    fs.makedirs(state)
    batches = [
        [(1, "http://a.com/x?b=2&a=1"), (2, "HTTP://WWW.A.COM:80/x?a=1&b=2"),
         (3, "https://b.org/")],
        [(10, "http://a.com/x?a=1&b=2#frag"), (11, "https://c.net/fresh")],
    ]
    for i, rows in enumerate(batches):
        fold_url_dedup_batch(spark.createDataFrame(rows, schema), i, state)
    got = sorted(r["doc_id"] for r in read_accepted(spark, state).collect())
    assert got == [1, 3, 11]
    # replay: no-op
    fold_url_dedup_batch(spark.createDataFrame(batches[1], schema), 1, state)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11]
    # crashed attempt's partial epoch=2 dirs are invisible to its replay
    spark.createDataFrame(
        [(30, "https://e.gov/a", "https://e.gov/a")],
        "doc_id long, url string, canonical_url string",
    ).write.mode("overwrite").parquet(f"{state}/accepted/epoch=2")
    spark.createDataFrame([("https://e.gov/a",)], "_curl string").write.mode(
        "overwrite"
    ).parquet(f"{state}/urls/epoch=2")
    b3 = [(30, "https://e.gov/a"), (31, "https://E.GOV/a")]
    fold_url_dedup_batch(spark.createDataFrame(b3, schema), 2, state)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11, 30]


def test_line_fold_with_compaction_on_object_backend(spark, tmp_path_factory, obj):
    """The line-dedup fold with bucketed ADDITIVE state, compacted
    between epochs, entirely over the object backend — exercising
    EpochBucketedState's staged-swap publish through the
    manifest-commit rename."""
    store, root, fs = obj
    from vectorsearch_spark.operators.dedup import (
        compact_line_keycounts,
        fold_line_dedup_batch,
        read_line_dedup_state,
    )

    lines = {
        0: "common line\nunique a",
        1: "common line\nunique b",
        2: "other line\nunique c",
        3: "other line\ncommon line",
        4: "common line\nunique e",
    }
    state = os.path.join(root, "line_state")
    fs.makedirs(state)
    schema = "doc_id long, text string"
    for i, ids in enumerate([[0, 1], [2, 3], [4]]):
        fold_line_dedup_batch(
            spark.createDataFrame([(j, lines[j]) for j in ids], schema),
            i, state, state_buckets=4,
        )
        compact_line_keycounts(spark, state, 4, i)
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"])
        for r in read_line_dedup_state(spark, state).collect()
    }
    assert sorted(got) == [0, 1, 2, 3, 4]
    # "common line" occurs in docs 0,1,3,4 (≥2) → boilerplate
    # everywhere; "other line" in 2,3 → boilerplate; uniques survive
    assert got[0] == (2, 1) and got[4] == (2, 1)
    assert got[3] == (2, 0)  # both its lines are boilerplate
    # compaction actually bounded the epoch partitions
    assert epoch_ids(os.path.join(state, "keycounts_bucketed")) == [2]


def test_additive_compaction_crash_mid_publish_object_backend(
    spark, tmp_path_factory, obj
):
    """Crash DURING the staged-partition publish (the copy phase of the
    manifest-commit rename, after the compaction marker committed):
    restart recovery must complete the swap — totals identical to the
    uncrashed run."""
    store, root, fs = obj
    from vectorsearch_spark.operators.incremental import EpochBucketedState

    state = os.path.join(root, "add_state")
    fs.makedirs(state)
    st = EpochBucketedState(
        spark, state, "kc", "`k` STRING, `n` BIGINT", "k", 4, sum_cols=["n"]
    )
    spark.sql(f"DROP TABLE IF EXISTS {st.table}")
    spark.sql(f"DROP TABLE IF EXISTS {st.table}__cstage")
    for e, rows in enumerate([[("a", 1), ("b", 2)], [("a", 10)], [("b", 5)]]):
        st.write_epoch(spark.createDataFrame(rows, "k string, n long"), e)
    store.arm("copy", 1)
    with pytest.raises(RuntimeError, match="injected"):
        st.compact_epochs(2)
    store.arm("none", 0)

    # restart: fresh backend (recovers rename garbage) + fresh state
    # object (whose _ensure finishes the marker-committed compaction)
    fs2 = ObjectStoreStateFS(store, root)
    prev = set_state_fs(fs2)
    try:
        st2 = EpochBucketedState(
            spark, state, "kc", "`k` STRING, `n` BIGINT", "k", 4, sum_cols=["n"]
        )
        got = sorted(
            tuple(r) for r in st2.read_before(99).collect()
        )
        assert got == [("a", 11), ("b", 7)]
        assert st2._live_epochs() == [2]
        assert not fs2.exists(os.path.join(state, "_compact_commit.json"))
    finally:
        set_state_fs(prev)


def test_rollup_fold_on_object_backend(spark, tmp_path_factory, obj):
    """The whole-dir-swap fold (fold_rollup_batch) over the object
    backend: two epochs fold, a replay is a no-op, and the marker rides
    the same manifest-commit swap as the state."""
    store, root, fs = obj
    from vectorsearch_spark.operators.incremental import (
        finalize_rollup,
        fold_rollup_batch,
    )

    state = os.path.join(root, "roll")
    schema = "g string, v double"
    fold_rollup_batch(
        spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 2.0)], schema),
        0, state, ["g"], "v",
    )
    fold_rollup_batch(
        spark.createDataFrame([("a", 5.0)], schema), 1, state, ["g"], "v"
    )
    # replay epoch 1: must not double-merge
    fold_rollup_batch(
        spark.createDataFrame([("a", 5.0)], schema), 1, state, ["g"], "v"
    )
    got = {
        r["g"]: (r["n_rows"], r["total"])
        for r in finalize_rollup(spark.read.parquet(state), ["g"]).collect()
    }
    assert got == {"a": (3, 9.0), "b": (1, 2.0)}
    # the protocol paid its round trips through the manifest
    assert fs.stats.get("manifest_put", 0) >= 6  # ≥2 renames per fold


def test_rename_onto_tombstoned_garbage_clears_stale_keys(tmp_path):
    """A rename whose dst carries SUPPRESSED physical leftovers (a
    prior rename FROM that path crashed mid-delete, same backend
    instance — no restart recovery ran) must clear them before
    staging: keys outside the new copy's set would otherwise become
    visible as part of dst at the commit."""
    store = FaultStore(ObjectStoreStateFS.MANIFEST)
    root = str(tmp_path)
    fs = ObjectStoreStateFS(store, root)
    live = _mk_tree(root, "live", "old", files=3)  # f0, f2, sub/f1
    tmp = _mk_tree(root, "live.tmp", "new", files=1)  # f0 only
    # crash the live -> old rename after its commit, mid source-delete
    store.arm("delete", 1)
    with pytest.raises(RuntimeError, match="injected"):
        fs.rename(live, os.path.join(root, "old"))
    store.arm("none", 0)
    # live is suppressed but physically littered; WITHOUT a restart,
    # rename tmp -> live (the swap_dir_in second leg)
    assert not fs.exists(live)
    fs.rename(tmp, live)
    assert sorted(fs.listdir(live)) == ["f0"]  # no stale f2/sub leak
    assert fs.read_text(os.path.join(live, "f0")) == "new-0"
    assert fs.read_text(os.path.join(root, "old", "f2")) == "old-2"

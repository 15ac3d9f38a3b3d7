"""Multi-writer object-store backend (objectstore.py "MULTI-WRITER:
CAS + FENCING"): conditional manifest PUTs detect lost updates,
disjoint concurrent writers converge through CAS retry, same-dst races
serialize to one winner, fence() performs takeover of a dead writer,
and a superseded incarnation can never commit again. All
deterministic interleavings — no threads, the hook fires the second
writer at the exact read-modify-write window under test."""

from __future__ import annotations

import json
import os

import pytest

from vectorsearch_spark.objectstore import (
    LocalBlobStore,
    ObjectStoreStateFS,
    PreconditionFailedError,
    WriterFencedError,
)


class HookStore(LocalBlobStore):
    """Fires ``hook`` once, immediately BEFORE the next conditional
    manifest PUT (outside the CAS lock, so the hook may itself drive a
    full rename through this same store) — the deterministic stand-in
    for 'another writer committed between our GET and our PUT'. Also a
    crash injector: ``arm(op, at)`` raises on the Nth call of an op."""

    def __init__(self):
        self.hook = None
        self.fail_op = None
        self.fail_at = 0
        self.counts = {}

    def arm(self, op, at):
        self.fail_op, self.fail_at = op, at
        self.counts = {}

    def _tick(self, op):
        self.counts[op] = self.counts.get(op, 0) + 1
        if op == self.fail_op and self.counts[op] == self.fail_at:
            raise RuntimeError(f"injected crash at {op}#{self.fail_at}")

    def put_if_match(self, key, data, etag):
        hook, self.hook = self.hook, None
        if hook is not None:
            hook()
        super().put_if_match(key, data, etag)

    def copy(self, src, dst):
        self._tick("copy")
        super().copy(src, dst)

    def put(self, key, data):
        self._tick("put")
        kind = (
            "put_manifest"
            if os.path.basename(key) == "_fsio_manifest.json"
            else "put_data"
        )
        self._tick(kind)
        super().put(key, data)

    def delete(self, key):
        self._tick("delete")
        super().delete(key)


def _mk_tree(root, name, tag, files=2):
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "sub"), exist_ok=True)
    for i in range(files):
        with open(os.path.join(d, "sub" if i % 2 else "", f"f{i}"), "w") as fh:
            fh.write(f"{tag}-{i}")
    return d


def test_conditional_put_detects_lost_update(tmp_path):
    """The blob-level CAS primitive itself: a PUT conditioned on a
    stale ETag MUST fail — this is the property every manifest commit
    leans on, and exactly what an unconditional PUT would silently
    lose."""
    store = LocalBlobStore()
    key = str(tmp_path / "obj")
    # If-None-Match creation: succeeds once, fails when it exists
    store.put_if_match(key, b"v1", None)
    with pytest.raises(PreconditionFailedError):
        store.put_if_match(key, b"v1b", None)
    etag = store.etag_of(key)
    # interloper moves the object; our conditioned write must lose
    store.put(key, b"v2")
    with pytest.raises(PreconditionFailedError):
        store.put_if_match(key, b"v3", etag)
    assert store.get(key) == b"v2"  # the interloper's write survived
    store.put_if_match(key, b"v3", store.etag_of(key))
    assert store.get(key) == b"v3"


def test_disjoint_writers_converge_via_cas_retry(tmp_path):
    """Writer B commits a full rename inside writer A's
    load→PUT window. A's conditional PUT loses, A retries against the
    fresh manifest, and BOTH renames land — no lost update, no error
    surfaced to either caller."""
    store = HookStore()
    root = str(tmp_path)
    fs_a = ObjectStoreStateFS(store, root, owner="a")
    fs_b = ObjectStoreStateFS(store, root, owner="b")
    src_a = _mk_tree(root, "src_a", "A")
    src_b = _mk_tree(root, "src_b", "B")
    store.hook = lambda: fs_b.rename(src_b, os.path.join(root, "dst_b"))
    fs_a.rename(src_a, os.path.join(root, "dst_a"))
    assert fs_a.stats.get("cas_conflict", 0) >= 1
    for fs in (fs_a, fs_b):
        assert fs.read_text(os.path.join(root, "dst_a", "f0")) == "A-0"
        assert fs.read_text(os.path.join(root, "dst_b", "f0")) == "B-0"
        assert not fs.exists(src_a) and not fs.exists(src_b)
    # quiescent: no suppressions survive, both writers registered
    m = json.loads(store.get(fs_a.manifest_key).decode())
    assert m["pending"] == {} and m["tombstone"] == {}
    assert set(m["writers"]) == {"a", "b"}


def test_same_dst_race_has_one_winner(tmp_path):
    """B's in-flight rename onto dst (staged, crashed mid-copy, NOT
    provably dead — its incarnation is still the registered one) must
    block A from the same dst with FileExistsError, both when physical
    partial copies exist and when only the manifest entry does. The
    pre-CAS design silently cleared B's entry here."""
    store = HookStore()
    root = str(tmp_path)
    fs_a = ObjectStoreStateFS(store, root, owner="a")
    fs_b = ObjectStoreStateFS(store, root, owner="b")
    dst = os.path.join(root, "dst")
    # case 1: B staged and copied one object, then crashed
    src_b = _mk_tree(root, "src_b", "B", files=3)
    store.arm("copy", 2)
    with pytest.raises(RuntimeError, match="injected"):
        fs_b.rename(src_b, dst)
    store.arm(None, 0)
    src_a = _mk_tree(root, "src_a", "A")
    with pytest.raises(FileExistsError, match="live"):
        fs_a.rename(src_a, dst)
    # case 2: entry only, no physical residue (B crashed at stage+0 copies)
    dst2 = os.path.join(root, "dst2")
    src_b2 = _mk_tree(root, "src_b2", "B2")
    store.arm("copy", 1)
    with pytest.raises(RuntimeError, match="injected"):
        fs_b.rename(src_b2, dst2)
    store.arm(None, 0)
    with pytest.raises(FileExistsError):
        fs_a.rename(src_a, dst2)
    # A's own namespace is untouched by the losses
    fs_a.rename(src_a, os.path.join(root, "dst_a"))
    assert fs_a.read_text(os.path.join(root, "dst_a", "f0")) == "A-0"


def test_fence_takeover_then_zombie_cannot_commit(tmp_path):
    """After B dies mid-rename, A fences B: the garbage is cleaned,
    the dst is usable, and B's surviving in-process instance — the
    zombie — gets WriterFencedError on its next commit instead of
    corrupting the namespace it lost."""
    store = HookStore()
    root = str(tmp_path)
    fs_a = ObjectStoreStateFS(store, root, owner="a")
    fs_b = ObjectStoreStateFS(store, root, owner="b")
    dst = os.path.join(root, "dst")
    src_b = _mk_tree(root, "src_b", "B", files=3)
    store.arm("copy", 2)
    with pytest.raises(RuntimeError, match="injected"):
        fs_b.rename(src_b, dst)
    store.arm(None, 0)

    fs_a.fence("b")
    assert store.list_prefix(dst) == []          # partial copy gone
    m = json.loads(store.get(fs_a.manifest_key).decode())
    assert m["pending"] == {} and m["tombstone"] == {}

    src_a = _mk_tree(root, "src_a", "A")
    fs_a.rename(src_a, dst)                      # dst free for A now
    assert fs_a.read_text(os.path.join(dst, "f0")) == "A-0"

    # the zombie: still holds incarnation 1, registry says 2
    other = _mk_tree(root, "src_b3", "B3")
    with pytest.raises(WriterFencedError):
        fs_b.rename(other, os.path.join(root, "dst_b3"))
    # and fencing is not self-applicable
    with pytest.raises(ValueError):
        fs_a.fence("a")


def test_same_owner_restart_fences_previous_incarnation(tmp_path):
    """A restart under the SAME owner name registers a fresh
    incarnation at its first commit; the previous instance's next
    commit is fenced — split-brain between two processes claiming one
    fold namespace cannot write twice."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="writer")
    s1 = _mk_tree(root, "s1", "g1")
    fs1.rename(s1, os.path.join(root, "d1"))     # registers inc 1

    fs2 = ObjectStoreStateFS(store, root, owner="writer")  # restart
    s2 = _mk_tree(root, "s2", "g2")
    fs2.rename(s2, os.path.join(root, "d2"))     # registers inc 2

    s3 = _mk_tree(root, "s3", "g3")
    with pytest.raises(WriterFencedError):
        fs1.rename(s3, os.path.join(root, "d3"))
    # fs2 (the rightful incarnation) still fully operational
    fs2.rename(s3, os.path.join(root, "d3"))
    assert fs2.read_text(os.path.join(root, "d3", "f0")) == "g3-0"


def test_legacy_v1_manifest_upgrades_and_recovers(tmp_path):
    """A v1 manifest (bare path lists, no writers registry) loads as
    legacy-owned entries, which recovery treats as provably dead:
    garbage cleaned, manifest rewritten in v2 form."""
    store = LocalBlobStore()
    root = str(tmp_path)
    garbage = _mk_tree(root, "dead_dst", "junk")
    store.put(
        os.path.join(root, ObjectStoreStateFS.MANIFEST),
        json.dumps(
            {"gen": 7, "pending": [garbage], "tombstone": []}
        ).encode(),
    )
    fs = ObjectStoreStateFS(store, root, owner="w")
    assert store.list_prefix(garbage) == []
    m = json.loads(store.get(fs.manifest_key).decode())
    assert m["pending"] == {} and isinstance(m["tombstone"], dict)
    assert m["gen"] > 7
    src = _mk_tree(root, "src", "v2")
    fs.rename(src, garbage)                      # path reusable
    assert fs.read_text(os.path.join(garbage, "f0")) == "v2-0"


def test_recover_fences_before_deleting_garbage(tmp_path):
    """Recovery that cleans a same-owner predecessor's garbage must
    commit its OWN registration BEFORE the first physical delete — a
    crash between the two must leave the old incarnation already
    fenced (writers bumped) with the entries still suppressing dst.
    Deleting first would leave a window where the predecessor could
    still commit a rename whose copy was just destroyed."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="w")
    src = _mk_tree(root, "src", "g", files=3)
    dst = os.path.join(root, "dst")
    store.arm("copy", 2)
    with pytest.raises(RuntimeError, match="injected"):
        fs1.rename(src, dst)                     # staged as ("w", 1)
    # restart: crash recovery at its FIRST physical delete
    store.arm("delete", 1)
    with pytest.raises(RuntimeError, match="injected"):
        ObjectStoreStateFS(store, root, owner="w")
    store.arm(None, 0)
    m = json.loads(
        store.get(os.path.join(root, ObjectStoreStateFS.MANIFEST)).decode()
    )
    assert m["writers"]["w"] == 2                # fence committed first
    assert dst in m["pending"]                   # entry still suppresses dst
    # the fenced predecessor cannot commit its in-flight rename
    with pytest.raises(WriterFencedError):
        fs1.rename(_mk_tree(root, "src2", "h"), os.path.join(root, "d2"))
    # a clean restart finishes the recovery
    fs3 = ObjectStoreStateFS(store, root, owner="w")
    assert store.list_prefix(dst) == []
    assert fs3.exists(src)


def test_single_writer_round_trips_unchanged(tmp_path):
    """The cost-model guard for the CAS upgrade: a clean
    single-writer rename of an N-object tree still costs exactly
    3 manifest PUTs + N copies + N deletes and suffers zero CAS
    conflicts — the precondition is free when uncontended."""
    store = HookStore()
    root = str(tmp_path)
    fs = ObjectStoreStateFS(store, root, owner="w")
    src = _mk_tree(root, "src", "g", files=3)
    fs.stats = {}
    fs.rename(src, os.path.join(root, "dst"))
    assert fs.stats.get("manifest_put") == 3
    assert fs.stats.get("copy") == 3
    assert fs.stats.get("cas_conflict", 0) == 0


# ---------------------------------------------------------------------------
# conditional-data mode: the data-plane close (roll-forward recovery)
# ---------------------------------------------------------------------------


def test_conditional_rollforward_recovery_commits_and_resumes(tmp_path):
    """conditional_data=True: a rename crashed mid-copy rolls FORWARD
    at restart — recovery resumes the conditional copy (keys that
    already landed are SKIPPED, not re-copied) and commits, so the new
    generation survives, complete and visible, with src gone."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    src = _mk_tree(root, "src", "g", files=4)     # f0 f2 + sub/f1 f3
    dst = os.path.join(root, "dst")
    # crash after 2 of 4 data puts (conditional copies route via put)
    store.arm("put_data", 2)
    with pytest.raises(RuntimeError, match="injected"):
        fs1.rename(src, dst)
    store.arm(None, 0)

    fs2 = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    assert fs2.stats.get("roll_forward") == 1
    assert fs2.stats.get("copy_skipped", 0) >= 1   # resumed, not redone
    assert not fs2.exists(src)
    assert sorted(fs2.listdir(dst)) == ["f0", "f2", "sub"]
    for f, want in [("f0", "g-0"), ("f2", "g-2")]:
        assert fs2.read_text(os.path.join(dst, f)) == want
    assert fs2.read_text(os.path.join(dst, "sub", "f1")) == "g-1"
    m = json.loads(store.get(fs2.manifest_key).decode())
    assert m["pending"] == {} and m["tombstone"] == {}


def test_conditional_zombie_late_copy_cannot_clobber(tmp_path):
    """After roll-forward, a predecessor's late data write is a
    conditional create against an existing key: it FAILS, and the
    visible object keeps its bytes — the exact clobber the
    unconditional data plane allowed."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    src = _mk_tree(root, "src", "g", files=3)
    dst = os.path.join(root, "dst")
    store.arm("put_data", 1)
    with pytest.raises(RuntimeError, match="injected"):
        fs1.rename(src, dst)
    store.arm(None, 0)
    ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    key = os.path.join(dst, "f0")
    with pytest.raises(PreconditionFailedError):
        store.put_if_match(key, b"zombie bytes", None)
    assert store.get(key) == b"g-0"


def test_conditional_inprocess_retry_resumes_without_unsuppressing(tmp_path):
    """A same-(src, dst) retry WITHOUT restart re-claims the pending
    entry and resumes: landed keys skip, dst never leaves suppression
    between the attempts (no clear→stage window for late writes to
    slip through), and the retry converges."""
    store = HookStore()
    root = str(tmp_path)
    fs = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    src = _mk_tree(root, "src", "g", files=4)
    dst = os.path.join(root, "dst")
    store.arm("put_data", 3)
    with pytest.raises(RuntimeError, match="injected"):
        fs.rename(src, dst)
    store.arm(None, 0)
    assert not fs.exists(dst)          # still suppressed
    before = fs.stats.get("delete_prefix", 0)
    fs.rename(src, dst)                # resume path, not clear+restage
    assert fs.stats.get("copy_skipped", 0) >= 2
    # no rollback delete of dst happened on the resume (only the
    # post-commit src delete)
    assert fs.stats.get("delete_prefix", 0) == before + 1
    assert fs.read_text(os.path.join(dst, "sub", "f3")) == "g-3"
    assert not fs.exists(src)


def test_conditional_rolls_back_when_src_is_gone(tmp_path):
    """Roll-forward needs an intact src; if the source vanished, the
    dead pending rename rolls BACK as in default mode — partials
    deleted, entry cleared."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    src = _mk_tree(root, "src", "g", files=3)
    dst = os.path.join(root, "dst")
    store.arm("put_data", 1)
    with pytest.raises(RuntimeError, match="injected"):
        fs1.rename(src, dst)
    store.arm(None, 0)
    store.delete_prefix(src)           # src lost (operator rmtree'd it)
    fs2 = ObjectStoreStateFS(store, root, owner="w", conditional_data=True)
    assert fs2.stats.get("roll_forward", 0) == 0
    assert store.list_prefix(dst) == []
    assert not fs2.exists(dst) and not fs2.exists(src)


def test_default_mode_stage_entry_records_src_and_rolls_back(tmp_path):
    """Default (unconditional) mode is untouched by the feature: the
    stage entry now records src, but recovery still rolls a pre-commit
    crash BACK — src survives, dst garbage is deleted."""
    store = HookStore()
    root = str(tmp_path)
    fs1 = ObjectStoreStateFS(store, root, owner="w")
    src = _mk_tree(root, "src", "g", files=3)
    dst = os.path.join(root, "dst")
    store.arm("copy", 2)
    with pytest.raises(RuntimeError, match="injected"):
        fs1.rename(src, dst)
    store.arm(None, 0)
    m = json.loads(store.get(fs1.manifest_key).decode())
    assert m["pending"][dst][2] == src
    fs2 = ObjectStoreStateFS(store, root, owner="w")
    assert fs2.exists(src) and not fs2.exists(dst)
    assert store.list_prefix(dst) == []

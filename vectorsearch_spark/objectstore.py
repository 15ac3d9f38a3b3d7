"""Object-store backend for the state-layer filesystem seam (r13
VERDICT #1): the fsio contract (fsio.py:31-47) implemented WITHOUT an
atomic rename primitive, so the folds' exactly-once protocols run
unchanged on S3-class storage.

What an object store actually provides (the ``BlobStore`` API below —
each method names its S3 call): atomic whole-object PUT (readers see
the old or the new complete object, never bytes in between), GET,
DELETE, server-side COPY, and strongly-consistent prefix LIST. What it
does NOT provide is rename — the Hadoop S3A "rename" is a key-by-key
copy+delete, and a crash mid-way leaves BOTH trees visible, which
breaks every swap discipline in fsio (swap_dir_in's two-rename dance,
additive compaction's staged-partition publish). The reference solves
this class of problem with FDB transactions
(fdb/FdbVectorStore.java:425-492); Spark's own HDFSMetadataLog solves
it with HDFS rename. Neither exists here, so this backend synthesizes
rename atomicity from the ONE atomic primitive the store has:
single-object PUT, applied to a MANIFEST object.

THE MANIFEST-COMMIT PROTOCOL

The physical key layout is IDENTITY — every logical path is stored at
its own key, so Spark executors read and write parquet at the very
same paths with no indirection, and in the quiescent state the
manifest is EMPTY. The manifest (one JSON object, rewritten by atomic
PUT) carries only the TRANSIENT visibility overrides of in-flight
renames:

* ``pending[dst]``  — dst is being copied into; suppress it.
* ``tombstone[src]`` — dst committed; src awaits physical deletion;
  suppress it.

``rename(src, dst)`` then runs:

  1. PUT manifest {pending += dst}        (dst invisible from here)
  2. COPY every object under src → dst    (partial copies invisible)
  3. PUT manifest {pending -= dst, tombstone += src}   ← COMMIT POINT
  4. DELETE every object under src        (src already invisible)
  5. PUT manifest {tombstone -= src}

Every read primitive (``exists``/``isdir``/``listdir``/``read_text``)
merges the physical listing with the manifest's suppressions, so at
every crash point EXACTLY ONE of src/dst is observable through the
seam: before step 3 the old tree (src visible, dst suppressed), after
it the new tree (dst visible, src suppressed) — the fsio rename
contract, linearized at a single object PUT. ``recover()`` (run at
construction, i.e. on process restart) deletes the physical garbage a
crash left behind — partial dst copies under ``pending``, undeleted
src objects under ``tombstone`` — and clears the entries; until it
runs, the suppressions alone keep the contract true, so recovery is
cleanup, not correctness.

``replace_file`` needs no protocol at all: a single-object PUT is
already the atomic replace (this is why the folds' marker-commits-last
discipline ports to object stores for free, exactly like Spark's
streaming CommitLog). ``mkstemp_in`` spools to LOCAL temp — on an
object store there is no "co-located temp + rename" idiom; the
following ``replace_file`` uploads the spool in one atomic PUT, which
is a STRICTLY STRONGER atomicity domain than POSIX same-directory
rename.

Concurrency: single writer per state namespace — the same ownership
contract the folds already require (one fold owner per state dir; see
EpochBucketedState.compact_epochs). A multi-writer port would CAS the
manifest with S3 conditional writes (If-Match on the manifest ETag);
the protocol is unchanged, only the PUT acquires a precondition.

Cost model (measured by scripts/objectstore_probe.py): reads add one
manifest GET per fsio call; a rename of an N-object tree costs
3 manifest PUTs + N copies + N deletes. ``swap_dir_in`` performs TWO
renames (live→old, tmp→live), and the live→old copy is pure backup
that rmtree immediately discards — at object-store prices a
state-scale deployment would point swap-heavy folds at the bucketed
EpochBucketedState layout (whose epochs are written once and renamed
only at compaction) rather than the whole-dir-swap folds, which is
exactly the 100 TB guidance SURVEY.md already gives.
"""

from __future__ import annotations

import json
import os
import tempfile


class LocalBlobStore:
    """A blob store emulated on the local filesystem — keys ARE paths.
    Exposes ONLY the S3 primitive set; nothing here renames. PUT
    stages to a hidden ``.blobtmp-`` sibling and ``os.replace``s it,
    emulating S3's guarantee that an object never shows partial bytes
    (the replace is the EMULATION of atomic PUT, not a primitive the
    backend above may use); listings filter the staging names,
    emulating S3's no-transient-visibility.

    Directory notes: objects live under real local dirs so Spark can
    read/write the same paths. ``makedirs`` is a real mkdir here and a
    no-op on S3 (prefixes need no creation); ``delete_prefix`` removes
    now-empty local dirs after the object deletes, which S3 has no
    concept of.
    """

    _TMP = ".blobtmp-"

    def put(self, key: str, data: bytes) -> None:  # S3: PutObject
        d = os.path.dirname(key)
        if d:
            os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d or ".", prefix=self._TMP)
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, key)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def get(self, key: str) -> bytes:  # S3: GetObject
        with open(key, "rb") as fh:
            return fh.read()

    def copy(self, src: str, dst: str) -> None:  # S3: CopyObject
        self.put(dst, self.get(src))

    def delete(self, key: str) -> None:  # S3: DeleteObject (idempotent)
        try:
            os.remove(key)
        except FileNotFoundError:
            pass

    def list_prefix(self, path: str) -> "list[str]":  # S3: ListObjectsV2
        """Every object key under ``path`` (recursive), including
        ``path`` itself when it is a single object."""
        if os.path.isfile(path):
            return [path]
        out = []
        for base, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith(self._TMP):
                    out.append(os.path.join(base, f))
        return sorted(out)

    def listdir(self, path: str) -> "list[str]":  # S3: List + delimiter
        if not os.path.isdir(path):
            return []
        return sorted(
            n for n in os.listdir(path) if not n.startswith(self._TMP)
        )

    def is_object(self, path: str) -> bool:
        return os.path.isfile(path)

    def has_prefix(self, path: str) -> bool:  # any key under path/?
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:  # S3: no-op
        os.makedirs(path, exist_ok=True)

    def delete_prefix(self, path: str) -> int:
        """DELETE every object under ``path`` (S3: batched
        DeleteObjects), then drop the empty local dir skeleton (local
        emulation only). Returns objects deleted."""
        keys = self.list_prefix(path)
        for k in keys:
            self.delete(k)
        if os.path.isdir(path):
            for base, dirs, _files in os.walk(path, topdown=False):
                for d in dirs:
                    p = os.path.join(base, d)
                    if os.path.isdir(p) and not os.listdir(p):
                        os.rmdir(p)
            if not os.listdir(path):
                os.rmdir(path)
        return len(keys)


class ObjectStoreStateFS:
    """The fsio contract over a ``BlobStore`` — see the module
    docstring for the manifest-commit protocol. Drop-in for
    ``fsio.set_state_fs``; ``stats`` counts store round trips so the
    protocol's overhead is a measured number
    (scripts/objectstore_probe.py)."""

    MANIFEST = "_fsio_manifest.json"

    def __init__(self, store: LocalBlobStore, root: str) -> None:
        self.store = store
        self.root = root.rstrip("/")
        self.manifest_key = os.path.join(self.root, self.MANIFEST)
        self.stats: "dict[str, int]" = {}
        self._spool = tempfile.mkdtemp(prefix="fsio_spool_")
        self._spool_paths: "set[str]" = set()
        self.recover()

    # -- manifest -----------------------------------------------------

    def _count(self, op: str) -> None:
        self.stats[op] = self.stats.get(op, 0) + 1

    def _load(self) -> dict:
        """GET the manifest — once per public op, modelling a reader
        that may not share memory with the writer."""
        self._count("manifest_get")
        try:
            m = json.loads(self.store.get(self.manifest_key).decode())
        except FileNotFoundError:
            m = {"gen": 0, "pending": [], "tombstone": []}
        return m

    def _commit(self, m: dict) -> None:
        m["gen"] = int(m.get("gen", 0)) + 1
        self._count("manifest_put")
        self.store.put(self.manifest_key, json.dumps(m).encode())

    @staticmethod
    def _covered(path: str, prefixes: "list[str]") -> bool:
        return any(path == p or path.startswith(p + os.sep) for p in prefixes)

    def _suppressed(self, path: str, m: dict) -> bool:
        return self._covered(path, m["pending"]) or self._covered(
            path, m["tombstone"]
        )

    def recover(self) -> None:
        """Delete the physical garbage of crashed renames and clear
        their manifest entries. Idempotent; the suppressions keep the
        contract true even BEFORE this runs, so a second crash during
        recovery loses nothing."""
        m = self._load()
        if not m["pending"] and not m["tombstone"]:
            return
        for dst in m["pending"]:      # partial copy: dst never committed
            self._count("delete_prefix")
            self.store.delete_prefix(dst)
        for src in m["tombstone"]:    # committed: finish the src delete
            self._count("delete_prefix")
            self.store.delete_prefix(src)
        m["pending"], m["tombstone"] = [], []
        self._commit(m)

    # -- read primitives (physical view + manifest suppressions) ------

    def exists(self, path: str) -> bool:
        if path in self._spool_paths:
            return os.path.exists(path)
        m = self._load()
        if self._suppressed(path, m):
            return False
        return self.store.is_object(path) or self.store.has_prefix(path)

    def isdir(self, path: str) -> bool:
        m = self._load()
        if self._suppressed(path, m):
            return False
        return self.store.has_prefix(path)

    def listdir(self, path: str) -> "list[str]":
        m = self._load()
        if self._suppressed(path, m):
            return []
        if self.store.is_object(path):
            raise NotADirectoryError(
                f"state root exists but is not a directory: {path}"
            )
        out = []
        for n in self.store.listdir(path):
            full = os.path.join(path, n)
            if full == self.manifest_key or self._suppressed(full, m):
                continue
            out.append(n)
        return out

    def read_text(self, path: str) -> str:
        if path in self._spool_paths:
            with open(path) as fh:
                return fh.read()
        m = self._load()
        if self._suppressed(path, m):
            raise FileNotFoundError(path)
        self._count("get")
        return self.store.get(path).decode()

    # -- non-atomic mutators ------------------------------------------

    def makedirs(self, path: str) -> None:
        self.store.makedirs(path)

    def remove(self, path: str) -> None:
        if path in self._spool_paths:
            self._spool_paths.discard(path)
            os.remove(path)
            return
        self._count("delete")
        self.store.delete(path)

    def rmtree(self, path: str) -> None:
        self._count("delete_prefix")
        self.store.delete_prefix(path)
        # drop any leftover suppression for a tree the caller is
        # explicitly discarding (e.g. swap_dir_in's rmtree(old))
        m = self._load()
        pend = [p for p in m["pending"] if not self._covered(p, [path])]
        tomb = [p for p in m["tombstone"] if not self._covered(p, [path])]
        if len(pend) != len(m["pending"]) or len(tomb) != len(m["tombstone"]):
            m["pending"], m["tombstone"] = pend, tomb
            self._commit(m)

    def mkstemp_in(self, dir_path: str, prefix: str) -> "tuple[int, str]":
        """LOCAL spool, not an in-store temp: the object store has no
        co-located-temp idiom, and the following ``replace_file`` is a
        single atomic PUT regardless of where the bytes came from."""
        fd, tmp = tempfile.mkstemp(dir=self._spool, prefix=prefix)
        self._spool_paths.add(tmp)
        return fd, tmp

    # -- atomic mutators ----------------------------------------------

    def replace_file(self, src: str, dst: str) -> None:
        """Atomic by PUT: one whole-object write IS the commit."""
        m = self._load()
        if self._suppressed(dst, m):
            raise FileNotFoundError(
                f"replace_file target {dst} is inside an in-flight rename"
            )
        if src in self._spool_paths:
            with open(src, "rb") as fh:
                data = fh.read()
            self._count("put")
            self.store.put(dst, data)
            self._spool_paths.discard(src)
            os.remove(src)
            return
        self._count("get")
        data = self.store.get(src)
        self._count("put")
        self.store.put(dst, data)
        self._count("delete")
        self.store.delete(src)

    def rename(self, src: str, dst: str) -> None:
        """The manifest-commit rename — see the module docstring. Works
        for a single object or a whole tree; dst must not pre-exist."""
        m = self._load()
        if self._suppressed(src, m) or not (
            self.store.is_object(src) or self.store.has_prefix(src)
        ):
            raise FileNotFoundError(f"rename source missing: {src}")
        if self.store.is_object(dst) or self.store.has_prefix(dst):
            if not self._suppressed(dst, m):
                raise FileExistsError(f"rename target exists: {dst}")
            # suppressed physical leftovers under dst — a prior crashed
            # rename's partial copy (pending) or undeleted source
            # (tombstone). They must be CLEARED, not overwritten: keys
            # outside the new copy's set would otherwise become visible
            # as part of dst at the commit
            self._count("delete_prefix")
            self.store.delete_prefix(dst)
            m["pending"] = [p for p in m["pending"] if p != dst]
            m["tombstone"] = [t for t in m["tombstone"] if t != dst]
            self._commit(m)
            m = self._load()

        # 1. stage: dst suppressed before any byte lands
        m["pending"] = sorted(set(m["pending"]) | {dst})
        self._commit(m)
        # 2. copy (crash here → recover() deletes the partials)
        if self.store.is_object(src):
            self._count("copy")
            self.store.copy(src, dst)
        else:
            base = src.rstrip(os.sep)
            for k in self.store.list_prefix(base):
                rel = os.path.relpath(k, base)
                self._count("copy")
                self.store.copy(k, os.path.join(dst, rel))
        # 3. COMMIT: one PUT flips dst visible and src suppressed.
        # Any stale suppression covered by dst (a prior crashed
        # rename's tombstone whose garbage the copy above just
        # overwrote) is cleared in the same commit — dst is live now.
        m = self._load()
        m["pending"] = [p for p in m["pending"] if p != dst]
        m["tombstone"] = sorted(
            {t for t in m["tombstone"] if not self._covered(t, [dst])} | {src}
        )
        self._commit(m)
        # 4. physical delete of the now-invisible src
        self._count("delete_prefix")
        self.store.delete_prefix(src)
        # 5. clear the tombstone
        m = self._load()
        m["tombstone"] = [p for p in m["tombstone"] if p != src]
        self._commit(m)

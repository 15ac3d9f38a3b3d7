"""Object-store fsio backend cost probe (r14, r13 VERDICT #1): count
the manifest-commit protocol's extra round trips against the
LocalStateFS baseline (where every one of them is a single syscall).

Three representative state workloads run over
``ObjectStoreStateFS(LocalBlobStore)`` with the backend's op counters
on:

* url fold (marker-commits-last; no renames) — the cheap shape: the
  protocol adds one manifest GET per fsio read and ONE atomic PUT per
  epoch commit. This is why the folds' marker discipline ports to S3
  for free.
* line fold + additive compaction (staged-partition publish) — one
  manifest-commit rename per compaction: 3 manifest PUTs + N copies +
  N deletes for an N-object partition.
* rollup fold (whole-dir swap_dir_in) — the expensive shape: TWO
  renames per fold, and the live→old rename copies the entire state
  only for rmtree to discard it. The numbers here are the measured
  argument for pointing swap-heavy folds at the bucketed epoch layout
  on object stores (objectstore.py module docstring).

Usage: python scripts/objectstore_probe.py [epochs] [rows_per_epoch]
Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_spark.fsio import set_state_fs
from vectorsearch_spark.objectstore import LocalBlobStore, ObjectStoreStateFS
from vectorsearch_spark.session import get_spark

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000


def _snap(fs: ObjectStoreStateFS) -> "dict[str, int]":
    return dict(fs.stats)


def _delta(fs: ObjectStoreStateFS, before: "dict[str, int]") -> "dict[str, int]":
    return {
        k: fs.stats.get(k, 0) - before.get(k, 0)
        for k in set(fs.stats) | set(before)
        if fs.stats.get(k, 0) != before.get(k, 0)
    }


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="objprobe_")
    store = LocalBlobStore()
    fs = ObjectStoreStateFS(store, root)
    prev = set_state_fs(fs)
    out: dict = {"epochs": EPOCHS, "rows_per_epoch": ROWS}
    try:
        from pyspark.sql import functions as F

        base = spark.range(ROWS).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("http://h"), (F.col("id") % (ROWS // 2)).cast("string"),
                     F.lit(".com/p"), F.col("id").cast("string")).alias("url"),
        )

        # --- url fold: marker-commit only -----------------------------
        from vectorsearch_spark.operators.urls import fold_url_dedup_batch

        st = os.path.join(root, "urls")
        fs.makedirs(st)
        per_epoch = []
        for e in range(EPOCHS):
            b = base.withColumn("doc_id", F.col("doc_id") + e * ROWS)
            s0, t0 = _snap(fs), time.time()
            fold_url_dedup_batch(b, e, st, state_buckets=8)
            per_epoch.append({"wall_s": round(time.time() - t0, 2), **_delta(fs, s0)})
        out["url_fold_per_epoch"] = per_epoch[-1]

        # --- line fold + additive compaction (staged publish) ---------
        from vectorsearch_spark.operators.dedup import (
            compact_line_keycounts,
            fold_line_dedup_batch,
        )

        docs = spark.range(ROWS // 20).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("shared boilerplate line\nunique "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        st2 = os.path.join(root, "lines")
        fs.makedirs(st2)
        for e in range(EPOCHS):
            fold_line_dedup_batch(
                docs.withColumn("doc_id", F.col("doc_id") + e * ROWS),
                e, st2, state_buckets=8,
            )
        s0, t0 = _snap(fs), time.time()
        compact_line_keycounts(spark, st2, 8, EPOCHS - 1)
        out["additive_compaction_publish"] = {
            "wall_s": round(time.time() - t0, 2), **_delta(fs, s0)
        }

        # --- rollup fold: whole-dir double swap ------------------------
        from vectorsearch_spark.operators.incremental import fold_rollup_batch

        st3 = os.path.join(root, "roll")
        ev = spark.range(ROWS).select(
            (F.col("id") % 100).cast("string").alias("g"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        for e in range(EPOCHS - 1):
            fold_rollup_batch(ev, e, st3, ["g"], "v")
        s0, t0 = _snap(fs), time.time()
        fold_rollup_batch(ev, EPOCHS - 1, st3, ["g"], "v")
        out["rollup_fold_per_epoch"] = {
            "wall_s": round(time.time() - t0, 2), **_delta(fs, s0)
        }
        out["totals"] = dict(fs.stats)

        # --- multi-writer contention: CAS conflicts under forced
        # interleaving. Writer B commits a FULL rename inside every one
        # of writer A's load→conditional-PUT windows (the worst
        # realistic interleave); measured question: how many extra
        # manifest round trips does contention cost A?
        class _Interleave(LocalBlobStore):
            def __init__(self):
                self.hook = None

            def put_if_match(self, key, data, etag):
                h, self.hook = self.hook, None
                if h is not None:
                    h()
                super().put_if_match(key, data, etag)

        store2 = _Interleave()
        root2 = tempfile.mkdtemp(prefix="objprobe_mw_")
        try:
            fa = ObjectStoreStateFS(store2, root2, owner="a")
            fb = ObjectStoreStateFS(store2, root2, owner="b")

            def mk(name: str) -> str:
                d = os.path.join(root2, name)
                os.makedirs(d, exist_ok=True)
                for i in range(4):
                    with open(os.path.join(d, f"f{i}"), "w") as fh:
                        fh.write(name)
                return d

            n_mw = 16
            t0 = time.time()
            for i in range(n_mw):
                sa, sb = mk(f"a_src{i}"), mk(f"b_src{i}")
                dst_b = os.path.join(root2, f"b_dst{i}")
                store2.hook = lambda sb=sb, dst_b=dst_b: fb.rename(sb, dst_b)
                fa.rename(sa, os.path.join(root2, f"a_dst{i}"))
            out["contended_renames"] = {
                "renames_per_writer": n_mw,
                "wall_s": round(time.time() - t0, 2),
                "a_cas_conflicts": fa.stats.get("cas_conflict", 0),
                "a_manifest_puts": fa.stats.get("manifest_put", 0),
                "b_manifest_puts": fb.stats.get("manifest_put", 0),
            }
        finally:
            shutil.rmtree(root2, ignore_errors=True)

        # --- conditional-data roll-forward vs default roll-back: the
        # recovery cost of a rename crashed halfway through an N-object
        # copy. Roll-back pays delete(N/2) + a FULL re-copy on retry;
        # roll-forward resumes — N/2 conditional creates skip, N/2
        # land — and commits without a retry.
        class _CrashStore(LocalBlobStore):
            def __init__(self):
                self.fail_after = None
                self.data_puts = 0

            def put(self, key, data):
                if not key.endswith(ObjectStoreStateFS.MANIFEST):
                    self.data_puts += 1
                    if (
                        self.fail_after is not None
                        and self.data_puts > self.fail_after
                    ):
                        raise RuntimeError("injected")
                super().put(key, data)

            def copy(self, src, dst):  # default-mode copies route here
                self.put(dst, self.get(src))

        n_obj = 64
        rf = {}
        for mode in ("rollback", "rollforward"):
            store3 = _CrashStore()
            root3 = tempfile.mkdtemp(prefix=f"objprobe_{mode}_")
            try:
                cond = mode == "rollforward"
                f1 = ObjectStoreStateFS(
                    store3, root3, owner="w", conditional_data=cond
                )
                srcd = os.path.join(root3, "src")
                os.makedirs(srcd)
                for i in range(n_obj):
                    with open(os.path.join(srcd, f"k{i:03d}"), "w") as fh:
                        fh.write("x" * 1024)
                dstd = os.path.join(root3, "dst")
                store3.fail_after = n_obj // 2
                try:
                    f1.rename(srcd, dstd)
                except RuntimeError:
                    pass
                store3.fail_after = None
                t0 = time.time()
                f2 = ObjectStoreStateFS(
                    store3, root3, owner="w", conditional_data=cond
                )
                if not cond:  # roll-back: the caller retries the rename
                    f2.rename(srcd, dstd)
                rf[mode] = {
                    "recover_plus_retry_s": round(time.time() - t0, 4),
                    "copies": f2.stats.get("copy", 0)
                    + f2.stats.get("copy_cond", 0),
                    "copies_skipped": f2.stats.get("copy_skipped", 0),
                    "rollback_deletes": f2.stats.get("delete_prefix", 0),
                }
            finally:
                shutil.rmtree(root3, ignore_errors=True)
        out["halfway_crash_recovery"] = {"n_objects": n_obj, **rf}
    finally:
        set_state_fs(prev)
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

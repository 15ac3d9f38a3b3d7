"""Join-hardening operators: explicit Bloom-filter semi-join pruning.

The 100 TB problem: ``fact JOIN dim`` on a selective dim still shuffles
EVERY fact row before the join discards 99% of them — the shuffle, not
the join, is the bottleneck. Engines fix this with runtime filters
(Spark's own ``spark.sql.optimizer.runtime.bloomFilter.enabled``
injects one when statistics justify it); ``bloom_semi_join`` is the
explicit, always-on form: build a Bloom filter of the key set once
(bounded: ``m_bits/8`` bytes), broadcast it, and drop non-matching fact
rows in a NARROW codegen filter *below* the exchange — only survivors
shuffle. A Bloom filter has no false negatives, so following it with
the exact semi join yields a result identical to the plain join; the
Bloom pass only removes rows the join was going to discard anyway.

Construction (all built-in expressions, no UDF):

- per key, the k probe positions are Kirsch–Mitzenmacher affine
  combinations ``(h1 + i·h2) mod m`` of two independently-seeded
  ``xxhash64`` values — same two-hash family trick as the MinHash
  signatures (operators/dedup.py), k positions for two hashes;
- build: explode the k positions, map to (word, bit) in a packed
  int64[] bitmap, ``bit_or`` per word (map-side combinable), collect
  the O(m/64) words to the driver (the codebook-broadcast pattern,
  index/search.py) and embed them as ONE compact ArrayType literal —
  shipped with the task closure like a broadcast variable;
- probe: ``forall`` over the k positions with ``element_at`` +
  bitwise-and against the broadcast array — whole-stage codegen,
  evaluated at scan parallelism before any exchange.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the default
m = 2²⁰ bits / k = 5 holds ~1% at n ≈ 100k keys. m is a hard driver/
executor memory bound (2²⁰ bits = 128 KiB) independent of fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 seeds for the two K-M base hashes: arbitrary distinct
# constants mixed in as literal columns (xxhash64 is variadic; an extra
# literal column reseeds the digest)
_SEED_A = 0x9E3779B9
_SEED_B = 0x85EBCA77


def _bit(shift) -> F.Column:
    """``1L << shift`` with a COLUMN shift — the PySpark ``shiftleft``
    wrapper only accepts a literal int, the SQL function both."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), shift.cast("int")
    )


def _positions(col, m_bits: int, k: int):
    """k Bloom positions for ``col`` as an array<int> expression.

    Both base hashes are reduced mod m BEFORE the affine combination —
    ``i·h2`` on raw xxhash64 values overflows int64 (ANSI mode raises);
    reduced, the sum stays < (k+1)·m. ``h2`` is forced non-zero so the
    k positions never all collapse onto one bit.
    """
    h1 = F.pmod(F.xxhash64(col, F.lit(_SEED_A)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(_SEED_B)), F.lit(m_bits - 1)) + 1
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m_bits)).cast("int"),
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    keys_on: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to the key set of ``keys`` with an explicit
    Bloom pre-filter: fact rows whose ``on`` key cannot be in
    ``keys[keys_on]`` are dropped by a narrow broadcast-bitmap probe
    BEFORE any shuffle; the exact semi join then removes the Bloom's
    false positives (``exact=False`` skips it — approximate
    membership, for pipelines that tolerate the documented FP rate and
    want zero shuffle of the fact side at all).

    Returns ``fact`` rows (all columns) whose key is in the key set —
    identical to ``fact.join(keys, ..., "left_semi")``; the Bloom pass
    is invisible in the result, only in the plan and the shuffle
    volume. The bitmap build is one aggregate over the key set plus an
    O(m_bits/64) driver collect — bounded by the m_bits parameter, not
    by data size (the codebook-broadcast contract).
    """
    keys_on = keys_on or on
    kdf = keys.select(F.col(keys_on).alias("__k")).where(F.col("__k").isNotNull())
    n_words = (m_bits + 63) // 64
    words = (
        kdf.select(F.explode(_positions(F.col("__k"), m_bits, k)).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            _bit(F.pmod(F.col("__pos"), F.lit(64))).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    # one compact ArrayType Literal (not a 16k-child CreateArray, and
    # not a cross join: a HOF probe inside a BroadcastNestedLoopJoin
    # condition trips a Catalyst binding bug) — ships with the task
    # closure exactly like a broadcast variable, keeps the probe a
    # NARROW filter on the fact scan
    bloom = F.lit(bitmap)
    probe = F.forall(
        _positions(F.col(on), m_bits, k),
        lambda p: (
            F.element_at(bloom, (p / 64).cast("int") + 1).bitwiseAND(
                _bit(F.pmod(p, F.lit(64)))
            )
        )
        != 0,
    )
    pruned = fact.where(probe)
    if not exact:
        return pruned
    kd = kdf.distinct()
    return pruned.join(kd, pruned[on] == kd["__k"], "left_semi")

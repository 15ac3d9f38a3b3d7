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

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; auto-sizing picks
m ≈ 16·n bits (~0.2% FP at k = 5) from one count of the key side,
clamped to [2¹⁴, 2²³] — the literal rides the expression tree k times
and CATALYST PLANNING COST is linear in literal size, so an oversized
bitmap costs more in driver-side planning than it saves (measured).
m is a hard memory bound independent of fact size.
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


def _positions(col, m_bits: int, k: int) -> list:
    """The k Bloom positions for ``col`` as a PYTHON LIST of plain
    int32 expressions — deliberately NOT an array + higher-order
    function: ``transform``/``forall`` are CodegenFallback (interpreted
    row-at-a-time, measured 7.6 s vs 0.3 s for the probe over 600 k
    rows at sf0.1); k is a compile-time constant, so the family unrolls
    into k whole-stage-codegen conjuncts.

    Both base hashes are reduced mod m BEFORE the affine combination —
    ``i·h2`` on raw xxhash64 values overflows int64 (ANSI mode raises);
    reduced, the sum stays < (k+1)·m. ``h2`` is forced non-zero so the
    k positions never all collapse onto one bit.
    """
    h1 = F.pmod(F.xxhash64(col, F.lit(_SEED_A)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(_SEED_B)), F.lit(m_bits - 1)) + 1
    return [
        F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(m_bits)).cast("int")
        for i in range(k)
    ]


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    keys_on: str | None = None,
    m_bits: int | None = None,
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
    # lazy checkpoint: the key plan executes ONCE (for the bitmap
    # build) and the exact semi join reads the materialized result
    # instead of re-running a possibly-expensive dim pipeline
    kdf = (
        keys.select(F.col(keys_on).alias("__k"))
        .where(F.col("__k").isNotNull())
        .localCheckpoint(eager=False)
    )
    if m_bits is None:
        # ~16 bits/key (FP ≈ 0.2% at k=5), clamped: the literal bitmap
        # rides the EXPRESSION TREE k times, and Catalyst planning cost
        # is linear in literal size — an oversized bitmap costs more in
        # driver-side planning than it saves in skipped rows (measured
        # 1.7-3.3 s planning at m=2²⁰ vs 0.3-0.6 s at m=2¹⁴ for the
        # same probe). Caps: 2¹⁴ floor, 2²³ ceiling (1 MiB bitmap);
        # key sets beyond ~500 k belong to Spark's own runtime bloom /
        # a plain shuffle join, not a literal-transported filter.
        n_keys = kdf.count()
        m_bits = 1 << max(14, min(23, (16 * max(n_keys, 1)).bit_length()))
    n_words = (m_bits + 63) // 64
    words = (
        kdf.select(
            F.explode(F.array(*_positions(F.col("__k"), m_bits, k))).alias("__pos")
        )
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
    probe = F.lit(True)
    for p in _positions(F.col(on), m_bits, k):
        probe = probe & (
            F.element_at(bloom, (p / 64).cast("int") + 1).bitwiseAND(
                _bit(F.pmod(p, F.lit(64)))
            )
            != 0
        )
    pruned = fact.where(probe)
    if not exact:
        return pruned
    kd = kdf.distinct()
    return pruned.join(kd, pruned[on] == kd["__k"], "left_semi")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-hardened equi join: split each hot key's left rows across
    ``salt`` sub-keys and replicate the right side ``salt`` ways, so
    one celebrity key occupies ``salt`` tasks instead of one. The
    classic mitigation for shuffle joins where the hot side is too big
    to broadcast and AQE's skew splitting doesn't apply (AQE only
    splits sort-merge partitions of BATCH shuffles; a hot key inside a
    hash-partitioned stateful/streaming or bucketed join still funnels).

    The left salt is DETERMINISTIC — ``xxhash64`` of the whole left row
    mod ``salt``, never ``rand()`` (a nondeterministic salt re-deals
    rows on task retry, corrupting any downstream that saw the first
    deal; identical duplicate rows share a salt, which only matters if
    one key's rows are also all identical — then they are one logical
    row anyway). Cost: right side shuffles ``salt``× — size it against
    the skew saved; ``salt ≈ hot-key share × cluster cores`` is plenty.

    ``how``: 'inner' or 'left' (right/full-outer would surface each
    unmatched REPLICATED right row ``salt`` times — rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).alias("__salt")
    l = left.select("*", lsalt)
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))),
    )
    out = l.join(r, [*keys, "__salt"], how)
    return out.drop("__salt")

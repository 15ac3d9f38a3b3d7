"""Temporal event operators: as-of join (point-in-time attribution).

The reference engine has no temporal-join surface (its only event-like
input is the ingest stream, vectorsearch.proto:123-125); this is a
north-star extension per BASELINE.json for event/feature pipelines,
where "latest right-side row at or before each left timestamp" is the
fundamental primitive (feature stores, attribution, slowly-changing
dims).

Scale design — the union + window re-expression:

Spark has no ASOF JOIN operator, and the naive re-expressions are
scale-killers: a range join (``l.ts >= r.ts``) explodes to O(|L|·|R|)
per key before its window-prune, and a per-row lateral lookup is a
driver loop. Instead we UNION the two sides (tagged), sort each key
partition once by (ts, tag, tiebreak), and carry the right payload
forward with ONE ``last(struct(ts, *payload), ignorenulls=True)``
over an unbounded preceding window — a single struct column, so every
attached value comes from the SAME matched right row (a NULL payload
field rides a non-null struct and propagates exactly). Cost: ONE
shuffle of each side on the join key + an in-partition sort — the
same plan shape as sessionization (streaming/rollup.py), linear in
|L|+|R|, skew-bounded by the key.
Determinism under ts ties: right rows order before left rows at equal
ts (backward join is ≥-inclusive), and equal-ts right rows order by
``tiebreak`` so the LAST (max-tiebreak) one wins — reruns and engines
agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_KIND = "__asof_kind"
_TB = "__asof_tb"
_PAY = "__asof_pay"
_SL = "__asof_slice"
_ORD = "__asof_ord"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
    tolerance_ms: int | None = None,
    how: str = "inner",
    slice_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every ``left`` row, attach ``payload`` columns
    of the latest ``right`` row with ``right.ts <= left.ts``
    (``direction='backward'``, the default) or the EARLIEST right row
    with ``right.ts >= left.ts`` (``direction='forward'`` — "next
    event after": next order after a campaign touch, next error after
    a deploy) for the same ``on`` key(s).

    Both directions run the identical union+carry machinery: ordering
    happens on a signed ``unix_micros`` expression (+ts backward, −ts
    forward), so forward is exactly backward on reversed time — the
    window plan AND the time-sliced skew plan (slices, prefix carry,
    in-slice seeds) transform together, and the max-``tiebreak``-wins
    contract at equal candidate timestamps holds for both.

    - ``payload`` defaults to every right column not in ``on``/``ts``;
      attached columns are renamed ``{prefix}{col}`` and the matched
      right timestamp is ``{prefix}{ts}``.
    - ``tiebreak``: right column ordering equal-ts right rows; the
      max-tiebreak row wins (pass a unique id for determinism).
    - ``tolerance_ms``: if set, matches farther than this many
      milliseconds from ``left.ts`` (older for backward, later for
      forward) are nulled out.
    - ``how``: 'inner' drops left rows with no match, 'left' keeps
      them with null payload.

    All attached columns come from the SAME matched right row: the
    carry is a single ``last(struct(...), ignorenulls=True)`` of the
    whole payload struct, so a NULL payload field on the matched row
    propagates as NULL (it never un-hides an older non-null value),
    and the tolerance check applies to exactly that row's timestamp.

    Skew: the default plan partitions by the join key alone, so one
    hot key (a user with 10⁸ events) funnels through one task. Pass
    ``slice_seconds`` for the TIME-SLICED two-phase plan: rows
    partition by (key, floor(ts/slice_seconds)) — the hot key's
    timeline splits across tasks — each slice runs the window carry
    locally, and a per-(key, slice) "last right struct" aggregate
    (map-side combinable; #key×#slice rows, not events) is
    prefix-carried across slices to seed slice-crossing matches. Same
    two-phase partition-parallel prefix pattern as
    ``operators.curate.pack_shards``; output-identical to the default
    plan (guarded by the hypothesis model test and a hot-key test).
    Choose a slice ≈ hot-key event span / desired parallelism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    sign = 1 if direction == "backward" else -1
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in (*keys, ts)]
    out_payload = [prefix + c for c in payload] + [prefix + ts]
    rtypes = dict(right.dtypes)
    # DDL type of the carried struct, for the typed NULL on left rows.
    pay_type = "struct<" + ",".join(
        [f"`{prefix}{c}`:{rtypes[c]}" for c in payload]
        + [f"`{prefix}{ts}`:{rtypes[ts]}"]
    ) + ">"

    r = right.select(
        *keys,
        F.col(ts).alias(_TS),
        F.lit(0).alias(_KIND),
        (F.col(tiebreak) if tiebreak else F.lit(None)).alias(_TB),
        F.struct(
            *[F.col(c).alias(prefix + c) for c in payload],
            F.col(ts).alias(prefix + ts),
        ).alias(_PAY),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in keys],
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(ts).alias(_TS),
        F.lit(1).alias(_KIND),
        F.lit(None).alias(_TB),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    unioned = r.unionByName(l).withColumn(
        _ORD, F.unix_micros(F.col(_TS)) * F.lit(sign)
    )

    if slice_seconds is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_ORD).asc(), F.col(_KIND).asc(), F.col(_TB).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            *left.columns,
            F.col(_KIND).alias(_KIND),
            F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
        ).where(F.col(_KIND) == 1)
    else:
        sliced = unioned.withColumn(
            _SL, F.floor(F.col(_ORD) / F.lit(int(slice_seconds) * 1_000_000))
        )
        # Phase 1: per-(key, slice) LAST right struct — an aggregate,
        # so it combines map-side; output is #key×#slice rows. max_by
        # on (ts, tb) mirrors the window's order (equal-(ts, tb) right
        # rows are nondeterministic in BOTH plans unless `tiebreak` is
        # unique — the documented determinism contract).
        slice_last = (
            sliced.where(F.col(_KIND) == 0)
            .groupBy(*keys, _SL)
            .agg(
                F.max_by(_PAY, F.struct(F.col(_ORD), F.col(_TB))).alias("__last_pay")
            )
        )
        # Phase 2: prefix-carry that last struct across slices (strictly
        # earlier slices only). The window runs over slice-grain rows —
        # including left-only slices, hence the distinct∪left join.
        slices = sliced.select(*keys, _SL).distinct()
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_SL).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = slices.join(slice_last, [*keys, _SL], "left").select(
            *keys,
            _SL,
            F.last("__last_pay", ignorenulls=True).over(w_carry).alias("__carry_in"),
        )
        # Phase 3: within-slice carry, seeded by the slice's carry-in.
        # Join and window both hash on (key…, slice) — the hot key's
        # rows spread over #slices tasks instead of one.
        w_slice = (
            Window.partitionBy(*keys, _SL)
            .orderBy(F.col(_ORD).asc(), F.col(_KIND).asc(), F.col(_TB).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = (
            sliced.join(carry_in, [*keys, _SL])
            .select(
                *left.columns,
                F.col(_KIND).alias(_KIND),
                F.coalesce(
                    F.last(_PAY, ignorenulls=True).over(w_slice), F.col("__carry_in")
                ).alias(_PAY),
            )
            .where(F.col(_KIND) == 1)
        )
    carried = carried.select(
        *left.columns,
        F.col(_KIND),
        *[F.col(_PAY)[c].alias(c) for c in out_payload],
    )

    if tolerance_ms is not None:
        stale = (
            F.unix_millis(F.col(ts)) - F.unix_millis(F.col(prefix + ts))
        ) * F.lit(sign) > int(tolerance_ms)
        carried = carried.select(
            *left.columns,
            F.col(_KIND),
            *[F.when(~stale, F.col(c)).alias(c) for c in out_payload],
        )
    out = carried.drop(_KIND)
    if how == "inner":
        return out.where(F.col(prefix + ts).isNotNull())
    if how == "left":
        return out
    raise ValueError(f"how must be 'inner' or 'left', got {how!r}")


def changelog_to_scd2(
    df: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    attrs: list[str] | None = None,
    tiebreak: str | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Changelog → SCD Type-2 dimension: per key, turn the event stream
    into validity intervals — each surviving row carries
    ``valid_from`` (its own ts), ``valid_to`` (the NEXT version's ts,
    NULL for the open/current version) and ``is_current``. The interval
    semantics are half-open ``[valid_from, valid_to)``, the convention
    an ``asof_join`` against the dimension reproduces exactly.

    ``collapse=True`` (default) keeps true SCD2 semantics: a changelog
    row whose ``attrs`` equal the previous version's attrs does NOT
    open a new version (no-op updates are folded into the open
    interval). Equality is NULL-safe (``<=>`` per attr). With
    ``collapse=False`` every changelog row opens a version.

    Scale: two key-partitioned windows over one shuffle of the
    changelog (lag-compare + lead-carry reuse the same
    (key, ts, tiebreak) sort — Spark plans ONE Exchange+Sort and both
    windows run in it); linear, skew-bounded by the key like
    sessionization. Deterministic under ts ties via ``tiebreak``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if attrs is None:
        attrs = [c for c in df.columns if c not in (*keys, ts)]
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    if collapse:
        changed = F.lit(False)
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
        first = F.row_number().over(w) == 1
        df = (
            df.withColumn("__keep", first | changed)
            .where(F.col("__keep"))
            .drop("__keep")
        )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return df.select(
        *keys,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_seconds: int | str | None = "auto",
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: match each ``left`` row to every
    ``right`` interval with ``start <= ts < end`` for the same key(s).

    Spark plans ``key = key AND ts >= start AND ts < end`` as a hash
    join on the equi key with the range conjuncts as residual filters —
    fine when keys are selective. When intervals per key are many/long
    (or keys are few), the residual degrades toward O(|L|·|R|) per key;
    the BINNED plan fixes this: each interval explodes to the time bins
    it covers, each left row maps to one bin, and the join becomes equi
    on (key…, bin) + residual — the standard range-join optimization,
    output-identical (guarded by a test). ``bin_seconds`` ≈ the typical
    interval length puts one interval in O(1) bins while each bin's
    population stays small.

    ``bin_seconds``: the default ``"auto"`` derives the bin width from
    the 90th-percentile interval length (one ``approxQuantile`` sketch
    over the right side — a bounded driver action, the only pre-plan
    job); an int forces that width; ``None`` forces the plain
    equi+residual plan (only sensible when keys are known-selective and
    the right side is hot enough that even one sketch pass matters).

    Auto mode runs a Spark ACTION, so it requires a batch ``right``;
    for a streaming right side pass an explicit ``bin_seconds`` (or
    ``None``).

    Why p90, not the median: the explode cost of an interval is
    ``len/bin + 1`` rows, so the bin must track the LONG tail — with a
    skewed length distribution (e.g. sessions: most are single-event
    zero-length, a few span hours) the median picks a tiny bin and the
    long intervals explode thousandfold (measured 0.85 s → 3.7 s on
    the error-sessions benchmark). A too-large bin merely coarsens
    bucketing toward the plain plan's residual behavior — the safe
    side of the tradeoff.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if bin_seconds == "auto":
        # the sketch is an ACTION over `right`; a lazy localCheckpoint
        # keeps the right side's lineage (often a whole sessionization
        # pipeline) from executing twice — once here, once in the join.
        right = right.localCheckpoint(eager=False)
        q = right.select(
            (F.unix_seconds(F.col(end)) - F.unix_seconds(F.col(start)))
            .cast("double")
            .alias("__len")
        ).approxQuantile("__len", [0.9], 0.05)
        bin_seconds = max(1, int(q[0])) if q else None
    r = right
    for k in keys:  # rename right keys so the output has no dup columns
        r = r.withColumnRenamed(k, "__r_" + k)
    if bin_seconds is not None:
        left = left.withColumn(
            "__bin", (F.unix_seconds(F.col(ts)) / bin_seconds).cast("long")
        )
        r = r.withColumn(
            "__r_bin",
            F.explode(
                F.sequence(
                    (F.unix_seconds(F.col(start)) / bin_seconds).cast("long"),
                    # end is exclusive, but a partial last bin still overlaps
                    (F.unix_seconds(F.col(end)) / bin_seconds).cast("long"),
                )
            ),
        )
    cond = (left[ts] >= r[start]) & (left[ts] < r[end])
    for k in keys:
        cond = cond & (left[k] == r["__r_" + k])
    if bin_seconds is not None:
        cond = cond & (left["__bin"] == r["__r_bin"])
    out = left.join(r, cond, how).drop(*["__r_" + k for k in keys])
    return out.drop("__bin", "__r_bin") if bin_seconds is not None else out

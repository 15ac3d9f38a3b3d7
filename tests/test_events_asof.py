"""Semantic tests for the backward as-of join (operators/events.py):
match selection, tie-breaking, inner/left modes, tolerance, and key
isolation — on handcrafted frames where the expected answer is obvious.
(Oracle parity at corpus scale runs via test_workload_parity.)"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from vectorsearch_spark.operators.events import asof_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(3), 9.0),   # between clicks t1 and t5
            (101, 1, _ts(6), 8.0),   # after click t5
            (102, 1, _ts(0), 7.0),   # before any click
            (103, 2, _ts(10), 6.0),  # user 2: tie at t10, two clicks
            (104, 3, _ts(4), 5.0),   # user 3 has no clicks at all
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (11, 1, _ts(1)),
            (12, 1, _ts(5)),
            (21, 2, _ts(10)),  # equal-ts pair: max event_id must win
            (22, 2, _ts(10)),
            (23, 2, _ts(2)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return left, right


def _rows(df):
    return {
        r.event_id: (r.asof_event_id, r.asof_ts and r.asof_ts.second)
        for r in df.collect()
    }


def test_backward_match_and_ties(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left, right, on="user_id", payload=["event_id"], tiebreak="event_id"
        )
    )
    assert got[100] == (11, 1)  # latest click <= t3 is t1
    assert got[101] == (12, 5)
    assert 102 not in got  # no click <= t0, inner drops
    assert got[103] == (22, 10)  # >= includes equal ts; max tiebreak wins
    assert 104 not in got  # user 3 never clicked


def test_left_keeps_unmatched_with_nulls(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left,
            right,
            on="user_id",
            payload=["event_id"],
            tiebreak="event_id",
            how="left",
        )
    )
    assert len(got) == 5
    assert got[102] == (None, None)
    assert got[104] == (None, None)
    assert got[100] == (11, 1)


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left,
            right,
            on="user_id",
            payload=["event_id"],
            tiebreak="event_id",
            tolerance_ms=1500,
            how="left",
        )
    )
    # purchase t3 ← click t1 is 2000 ms stale > 1500 → nulled
    assert got[100] == (None, None)
    # purchase t6 ← click t5 is 1000 ms → kept
    assert got[101] == (12, 5)
    # equal-ts match is 0 ms → kept
    assert got[103] == (22, 10)


def test_plan_is_single_shuffle_no_join(spark, frames):
    """The union+window re-expression must plan as ONE hash exchange on
    the key and NO join operator — the property that makes it linear at
    100 TB (vs the O(|L|·|R|)-per-key range-join re-expression)."""
    left, right = frames
    out = asof_join(
        left, right, on="user_id", payload=["event_id"], tiebreak="event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_null_payload_comes_from_matched_row(spark):
    """A NULL payload value on the matched right row must be attached
    as NULL — it must not un-hide an older non-null value — and the
    tolerance check applies to the matched row's ts, so an
    out-of-tolerance older value can never leak through a NULL field
    of an in-tolerance match (single struct carry)."""
    left = spark.createDataFrame(
        [(100, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (11, 1, _ts(1), "old-value"),  # older, non-null payload
            (12, 1, _ts(9), None),         # matched row: NULL payload
        ],
        "event_id long, user_id long, ts timestamp, attr string",
    )
    row = asof_join(
        left, right, on="user_id", payload=["event_id", "attr"],
        tiebreak="event_id", how="left",
    ).collect()[0]
    assert row.asof_event_id == 12
    assert row.asof_attr is None          # matched row's NULL, not "old-value"
    assert row.asof_ts == _ts(9)

    # with tolerance_ms=2000 the t9 match (1000 ms stale) is in
    # tolerance; attr stays NULL rather than falling back to the
    # out-of-tolerance t1 value
    row = asof_join(
        left, right, on="user_id", payload=["event_id", "attr"],
        tiebreak="event_id", tolerance_ms=2000, how="left",
    ).collect()[0]
    assert (row.asof_event_id, row.asof_attr) == (12, None)


def test_time_sliced_plan_equivalent_under_hot_key(spark):
    """Skew hardening: one key holding ~50% of all rows. The
    slice_seconds plan must (a) produce byte-identical results to the
    default plan — including matches whose right row lives in an
    EARLIER slice — and (b) partition by (key, slice) so the hot key's
    rows spread over many tasks instead of funneling into one."""
    import random

    rng = random.Random(7)
    # hot user 1: 300 of 600 left rows over a 3000 s span; users 2..11
    # share the rest. right rows are sparse for user 1 (many slices have
    # none → carry-in must cross slice boundaries).
    lrows, rrows = [], []
    for i in range(600):
        u = 1 if i % 2 == 0 else 2 + (i % 10)
        s = rng.randrange(0, 3000)
        lrows.append((i, u, datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)))
    for j in range(40):
        u = 1 if j % 4 == 0 else 2 + (j % 10)
        s = rng.randrange(0, 3000)
        rrows.append((1000 + j, u, datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=s)))
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "event_id long, user_id long, ts timestamp")

    base = asof_join(
        left, right, on="user_id", payload=["event_id"],
        tiebreak="event_id", how="left",
    )
    sliced = asof_join(
        left, right, on="user_id", payload=["event_id"],
        tiebreak="event_id", how="left", slice_seconds=120,
    )
    a = sorted(tuple(r) for r in base.collect())
    b = sorted(tuple(r) for r in sliced.collect())
    assert a == b
    # at least one match crossed a slice boundary (carry-in exercised)
    crossed = [
        r for r in sliced.collect()
        if r.asof_ts is not None and int(r.ts.timestamp()) // 120 != int(r.asof_ts.timestamp()) // 120
    ]
    assert crossed
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "__asof_slice" in plan
    assert any(
        "hashpartitioning" in line and "__asof_slice" in line
        for line in plan.splitlines()
    )


def test_left_columns_pass_through_unchanged(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="user_id", payload=["event_id"], tiebreak="event_id"
    )
    assert out.columns == ["event_id", "user_id", "ts", "value",
                           "asof_event_id", "asof_ts"]
    vals = {r.event_id: r.value for r in out.collect()}
    assert vals == {100: 9.0, 101: 8.0, 103: 6.0}


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

def _interval_frames(spark):
    left = spark.createDataFrame(
        [(i, 1 + i % 2, _ts(i % 50)) for i in range(40)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0), _ts(10), "a"),
            (1, _ts(10), _ts(30), "b"),
            (2, _ts(5), _ts(6), "c"),
            (2, _ts(20), _ts(45), "d"),
            (3, _ts(0), _ts(50), "never-matches"),
        ],
        "user_id long, start timestamp, end timestamp, tag string",
    )
    return left, right


def test_interval_join_semantics(spark):
    from vectorsearch_spark.operators.events import interval_join

    left, right = _interval_frames(spark)
    got = interval_join(left, right, on="user_id").collect()
    for r in got:
        assert r.start <= r.ts < r.end
    # user 2 event at t=5 lands in [5,6); no user-3 left rows exist
    tags = {(r.event_id, r.tag) for r in got}
    assert all(t != "never-matches" for _, t in tags)


def test_interval_join_binned_equals_unbinned(spark):
    from vectorsearch_spark.operators.events import interval_join

    left, right = _interval_frames(spark)
    plain = interval_join(left, right, on="user_id", bin_seconds=None)
    for bins in (1, 7, 3600, "auto"):
        binned = interval_join(left, right, on="user_id", bin_seconds=bins)
        assert sorted(binned.columns) == sorted(plain.columns)
        a = {tuple(r) for r in plain.select(*sorted(plain.columns)).collect()}
        b = {tuple(r) for r in binned.select(*sorted(plain.columns)).collect()}
        assert a == b, f"bin_seconds={bins} diverged"
        assert len(a) == plain.count()  # no dup rows from bin explode


def test_interval_join_auto_bins_degenerate_input(spark):
    """The degenerate shape the residual-filter plan dies on — ONE key,
    long overlapping intervals — must plan BINNED by default: auto mode
    derives a bin from the median interval length, visible as the
    Generate (explode) node over the interval sequence; the plain
    bin_seconds=None plan has no Generate."""
    from vectorsearch_spark.operators.events import interval_join

    left = spark.createDataFrame(
        [(i, 1, _ts(i % 50)) for i in range(40)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(50 - i), f"tag{i}") for i in range(10)],
        "user_id long, start timestamp, end timestamp, tag string",
    )
    auto = interval_join(left, right, on="user_id")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan  # interval→bin explode present
    plain = interval_join(left, right, on="user_id", bin_seconds=None)
    assert "Generate" not in plain._jdf.queryExecution().executedPlan().toString()
    # and the auto plan is output-identical to the plain one
    cols = sorted(auto.columns)
    assert {tuple(r) for r in auto.select(*cols).collect()} == {
        tuple(r) for r in plain.select(*cols).collect()
    }


def test_scd2_collapse_and_intervals(spark):
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.events import changelog_to_scd2

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: A, A (no-op), B, B (no-op), A  -> versions A, B, A
        (1, 1, t0, "A"),
        (2, 1, t0 + timedelta(hours=1), "A"),
        (3, 1, t0 + timedelta(hours=2), "B"),
        (4, 1, t0 + timedelta(hours=3), "B"),
        (5, 1, t0 + timedelta(hours=4), "A"),
        # user 2: NULL, NULL (no-op via null-safe eq), C
        (6, 2, t0, None),
        (7, 2, t0 + timedelta(hours=1), None),
        (8, 2, t0 + timedelta(hours=2), "C"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, attr string"
    )
    out = changelog_to_scd2(
        df.select("user_id", "event_id", "ts", "attr"),
        on="user_id", ts="ts", attrs=["attr"], tiebreak="event_id",
    ).collect()
    got = sorted(
        (
            (r["user_id"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out
        ),
        key=lambda t: (t[0], t[1] or "", t[2]),
    )
    h = timedelta(hours=1)
    assert got == [
        (1, "A", t0, t0 + 2 * h, False),
        (1, "A", t0 + 4 * h, None, True),
        (1, "B", t0 + 2 * h, t0 + 4 * h, False),
        (2, None, t0, t0 + 2 * h, False),
        (2, "C", t0 + 2 * h, None, True),
    ]
    # no collapse: every changelog row opens a version
    out2 = changelog_to_scd2(
        df.select("user_id", "event_id", "ts", "attr"),
        on="user_id", ts="ts", attrs=["attr"], tiebreak="event_id",
        collapse=False,
    ).collect()
    assert len(out2) == len(rows)
    assert sum(1 for r in out2 if r["is_current"]) == 2


def test_scd2_consistent_with_asof_join(spark):
    """Probing the SCD2 dimension with [from, to) containment must agree
    with a backward as-of join against the raw changelog — the two views
    of 'value at time t' are the same function."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.events import asof_join, changelog_to_scd2

    t0 = datetime(2024, 1, 1)
    chg = spark.createDataFrame(
        [
            (i, u, t0 + timedelta(minutes=7 * i + u), f"v{i % 4}")
            for u in (1, 2, 3)
            for i in range(12)
        ],
        "event_id long, user_id long, ts timestamp, attr string",
    )
    probes = spark.createDataFrame(
        [(u, t0 + timedelta(minutes=m)) for u in (1, 2, 3) for m in range(0, 100, 9)],
        "user_id long, ts timestamp",
    )
    scd = changelog_to_scd2(
        chg.select("user_id", "event_id", "ts", "attr"),
        on="user_id", ts="ts", attrs=["attr"], tiebreak="event_id",
    )
    via_scd = probes.alias("p").join(
        scd.alias("s"),
        (F.col("p.user_id") == F.col("s.user_id"))
        & (F.col("p.ts") >= F.col("s.valid_from"))
        & (F.col("p.ts") < F.coalesce(F.col("s.valid_to"), F.lit(datetime(2100, 1, 1)))),
        "left",
    ).select("p.user_id", "p.ts", F.col("s.attr").alias("attr"))
    via_asof = asof_join(
        probes, chg.select("user_id", "ts", "attr"),
        on="user_id", ts="ts", payload=["attr"], tiebreak=None, how="left",
    ).select("user_id", "ts", F.col("asof_attr").alias("attr"))
    a = sorted((r["user_id"], r["ts"], r["attr"]) for r in via_scd.collect())
    b = sorted((r["user_id"], r["ts"], r["attr"]) for r in via_asof.collect())
    assert a == b


def test_scd2_single_exchange_plan(spark):
    """Both windows (lag-collapse + lead-carry) must share ONE shuffle:
    the filter between them preserves partitioning/ordering."""
    from vectorsearch_spark.operators.events import changelog_to_scd2

    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), "A")],
        "event_id long, user_id long, ts timestamp, attr string",
    )
    scd = changelog_to_scd2(
        df, on="user_id", ts="ts", attrs=["attr"], tiebreak="event_id"
    )
    plan = scd._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, plan

"""Query workload registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

Conventions (critical for the hash compare):
- every computed column is aliased identically in Spark and SQL;
- float outputs are computed in DOUBLE and rounded to a fixed number of
  decimals on BOTH sides; scores are derived from the *rounded* distance;
- integer outputs are cast to BIGINT on both sides;
- timestamps are formatted to strings on both sides;
- deterministic tie-breaks (id columns) on every rank/limit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorsearch_spark.config import Metric
from vectorsearch_spark.operators.knn import brute_force_topk, knn_join

# DuckDB lambda computing l2 distance in double precision between list
# columns {a} and {b} — mirrors functions/distances.py exactly.
def _duck_l2(a: str, b: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))^2), (x,y) -> x+y))"
    )


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x,y) -> x+y)"
    )


def _duck_cosine_dist(a: str, b: str) -> str:
    # greatest(d, 0): self-pairs can produce d = −1ulp from fp error;
    # DuckDB's sign-preserving round would emit −0.0 where Spark emits
    # +0.0 — clamping on BOTH sides makes the contract engine-proof
    # (mirrors functions/distances.py distance_for_metric).
    na, nb = f"sqrt({_duck_dot(a, a)})", f"sqrt({_duck_dot(b, b)})"
    return (
        f"greatest(1.0 - CASE WHEN {na} = 0 OR {nb} = 0 THEN 0.0 "
        f"ELSE {_duck_dot(a, b)} / ({na} * {nb}) END, 0.0)"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-validated table load (sources/tables.py); UTC session time
    so timestamp formatting matches DuckDB's naive timestamps."""
    from vectorsearch_spark.sources import load_table

    return load_table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Relational queries (TPC-H-flavored; exercise scan/filter/agg/join/window —
# all pure built-ins so Catalyst handles pushdown/pruning/broadcast).
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan+filter+groupBy aggregation, map-side partial agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                AS sum_qty,
       round(sum(l_extendedprice), 2)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       round(avg(l_quantity), 4)                                AS avg_qty,
       round(avg(l_discount), 4)                                AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer⋈orders⋈lineitem with selective filters; broadcast dim."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way star join; all dims broadcast, single shuffle on the agg."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, customer, nation, region
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + global agg — the fully-pushed-down
    scan shape (no join, no grouping)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 25
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS-style semi-join with a NON-EQUI
    conjunct (late shipment: l_shipdate > o_orderdate) — Spark plans
    the equi part as the shuffle key and evaluates the inequality as a
    join residual, so it stays a hash semi-join, never a cartesian.
    Oracle uses the EXISTS formulation directly."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (the last archetype: join + CONDITIONAL
    two-way counts): per line status (shipmode stand-in — the
    synthetic lineitem has no l_shipmode/commit/receipt dates), count
    late-shipped lines (l_shipdate > o_orderdate) on high-priority
    orders (1-URGENT/2-HIGH) vs the rest — one broadcast-dim-free
    equi-join keyed on orderkey, CASE-sum aggregation, the Q12 plan
    shape exactly."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY l_linestatus ORDER BY l_linestatus
"""


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promo revenue share for one ship month —
    broadcast dim join + conditional aggregate, single output row."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-03-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: large-volume orders via a HAVING subquery —
    the aggregate-then-join shape (lineitem rolls up to order grain
    FIRST, so the join input is |orders| not |lineitem|). Deterministic
    top-100 via the unique o_orderkey tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bidirectional trade volume between two nations
    — a 6-way join whose selective predicate is an OR-of-ANDs ACROSS
    tables (supp_nation/cust_nation pairs), the join-ordering shape
    none of the other queries exercise. The implied single-table
    predicate n_name IN (A, B) is applied to BOTH nation aliases
    before the join (semantics-preserving: every disjunct requires
    both names in the pair set) so the dim broadcasts carry only the
    two relevant nations at any scale; the exact OR-of-ANDs remains
    as the cross-table residual."""
    n_a, n_b = "NATION_1", "NATION_2"
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(n_a, n_b))
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == n_a) & (F.col("cust_nation") == n_b))
            | ((F.col("supp_nation") == n_b) & (F.col("cust_nation") == n_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, supplier, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
"""


def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunctive pushdown — the join predicate is
    an OR of three AND-branches mixing part attributes (brand, size)
    and lineitem attributes (quantity). The per-table implications of
    the disjunction — p_brand IN (…) with its branch's size bound, and
    l_quantity in the union range — are applied as scan filters
    (exact, not approximations: each is the OR of that table's
    conjuncts), so both scans prune before the broadcast join; the
    full cross-table OR remains as the residual."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    b12 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
    b23 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
    q12 = F.col("l_quantity").between(1, 11)
    q23 = F.col("l_quantity").between(10, 20)
    q3 = F.col("l_quantity").between(20, 30)
    return (
        li.where(q12 | q23 | q3)
        .join(F.broadcast(part.where(b12 | b23 | b3)),
              F.col("p_partkey") == F.col("l_partkey"))
        .where((b12 & q12) | (b23 & q23) | (b3 & q3))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: the semi+anti join stack — suppliers whose
    line was the ONLY late one on a finished multi-supplier order
    (the testdata schema has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 60 days; the correlated-subquery
    structure is Q21's). One `late` plan feeds both the driving side
    and the anti side; the semi probes the raw lineitem. Both probe
    sides shuffle on l_orderkey — the semi/anti build reuses the key
    — and the 100-row supplier dim broadcasts. Oracle independently
    uses EXISTS / NOT EXISTS."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_5", "NATION_6")
    )
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    return (
        late.join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND n_name IN ('NATION_5', 'NATION_6')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: revenue lost to returns per customer — the
    selective-fact-filter star join (returnflag + order-date window
    pushed to both scans) with a wide grouping key and deterministic
    top-20. c_acctbal rides as max() since it is functionally dependent
    on the grouping key (same trick as the oracle)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(max(c_acctbal), 2) AS c_acctbal
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one nation's share of a region's import volume
    per year — a 7-way join (nation joined TWICE under different
    roles) feeding a conditional-share aggregate; the region filter
    prunes the customer-side nation alias before the join while the
    supplier-side alias stays unfiltered (the asymmetric-alias shape)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
WITH flat AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_suppkey = s_suppkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
    AND s_nationkey = n2.n_nationkey)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END)
             / sum(volume), 4) AS mkt_share
FROM flat GROUP BY o_year ORDER BY o_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: two-level aggregation over a LEFT OUTER join
    with a non-equi residual in the JOIN condition (filtering in WHERE
    would drop the zero-order customers the query exists to count) —
    the outer-join-then-agg shape no other query exercises. Customers
    shuffle once on c_custkey; the second agg groups on the tiny
    c_count domain."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: scalar aggregate subquery (global avg balance
    — a 1-row agg broadcast into the filter, never a driver collect)
    plus an ANTI join against recent orders. The order side is pruned
    to the date window BEFORE the anti join, so the build side is the
    small recent set, not all orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("long").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cust_group")
    )


Q22_SQL = """
SELECT CAST(c_custkey % 10 AS BIGINT) AS cust_group,
       count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: aggregate view + scalar MAX subquery join —
    the revenue rollup computes once, its 1-row max broadcasts back
    over it (no second scan of lineitem, no driver collect), and the
    100-row supplier dim broadcasts onto the winners."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: per-group correlated scalar subquery
    (``l_quantity < 0.2 * avg(l_quantity) per part``), decorrelated the
    way Catalyst would — ONE pruned lineitem pass feeds both the
    per-part threshold aggregate and the probe side, and the threshold
    table (one row per filtered part) broadcasts back.  The semi-prune
    by the filtered part list happens BEFORE the aggregate, which is
    correct here because only pruned parts' thresholds are consulted.
    l_quantity is integer-valued, so avg() is fp-exact in both engines
    and the strict `<` threshold cannot flip on accumulation order."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    part_f = part.filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li_p = li.join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = li_p.groupBy(F.col("l_partkey").alias("__tk")).agg(
        (0.2 * F.avg("l_quantity")).alias("__qty_thresh")
    )
    return (
        li_p.join(F.broadcast(thresh), F.col("l_partkey") == F.col("__tk"))
        .where(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#4' AND p_type = 'MEDIUM'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (lineitem as the part-supplier offer relation —
    testdata has no partsupp): for every size-15 part, the EUROPE
    supplier(s) offering the minimum unit price.  The argmin-join-back
    shape: per-part MIN over the region-filtered offer relation, then
    an equality join back on (partkey, price = min).  The minima table
    (≤ one row per filtered part) broadcasts; unit price is a single
    fp division, identical in both engines, so the equality join-back
    is exact.  DISTINCT collapses equal-price duplicate offers from
    the same supplier.  The output price is quantized with
    floor(unit × 10⁴) rather than round(): round's half-way behavior
    is engine-specific (Spark rounds the double's exact decimal
    expansion HALF_UP; DuckDB rounds the scaled double), while the
    scale-then-floor path is the same IEEE ops in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    eu = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part_f = part.filter(F.col("p_size") == 15).select("p_partkey")
    offers = (
        li.join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
        )
    )
    minima = offers.groupBy(F.col("l_partkey").alias("__mk")).agg(
        F.min("__unit").alias("__min_unit")
    )
    return (
        offers.join(
            F.broadcast(minima),
            (F.col("l_partkey") == F.col("__mk"))
            & (F.col("__unit") == F.col("__min_unit")),
        )
        .select(
            F.col("s_acctbal"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.floor(F.col("__unit") * 10000.0).cast("long").alias("unit_price_e4"),
        )
        .distinct()
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "p_partkey",
        )
        .limit(100)
    )


Q2_SQL = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
offers AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem JOIN part ON p_partkey = l_partkey
                JOIN eu   ON l_suppkey = s_suppkey
  WHERE p_size = 15)
SELECT DISTINCT s_acctbal, s_name, n_name,
       CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(floor(unit_price * 10000.0) AS BIGINT) AS unit_price_e4
FROM offers o
WHERE unit_price = (SELECT min(unit_price) FROM offers o2
                    WHERE o2.l_partkey = o.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct supplier count per part attribute
    after a NOT-IN exclusion.  The part-supplier relation is
    reconstructed as DISTINCT (l_partkey, l_suppkey) — ONE shuffle on
    the pair; the excluded-supplier list (negative balance, the
    comment-pattern surrogate) and the attribute-filtered part dim
    both broadcast; count(DISTINCT l_suppkey) runs on the already
    pair-distinct relation so the final aggregate needs no expand."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    part_f = part.filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = supp.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(part_f), pairs.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            pairs.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: nested semi-join stack.  Suppliers in
    NATION_3 who shipped more than 30% of a 'small%' part's total 1995
    volume (availqty surrogate): a per-(supplier, part) aggregate
    joined against the per-part total aggregate — both from the SAME
    pruned lineitem pass (exchange-reusable) — then the qualifying
    supplier keys semi-join into the supplier dim.  Quantity sums are
    integer-valued doubles, so the 0.3 × total threshold is fp-exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part_f = part.filter(F.col("p_name").startswith("small")).select("p_partkey")
    li95 = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_sp = li95.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("__sp_qty")
    )
    per_part = li95.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.3 * F.sum("l_quantity")).alias("__part_thresh")
    )
    qualifying = (
        per_sp.join(F.broadcast(per_part), F.col("l_partkey") == F.col("__pk"))
        .where(F.col("__sp_qty") > F.col("__part_thresh"))
        .select("l_suppkey")
    )
    nat = nation.filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(qualifying),
            supp.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH li95 AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
    AND p_name LIKE 'small%')
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM li95 GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > (SELECT 0.3 * sum(l_quantity)
                              FROM li95 i WHERE i.l_partkey = li95.l_partkey))
ORDER BY s_suppkey
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: LIKE-filtered 5-way join profit rollup by
    (supplier nation, order year).  The '%red%' contains-filter pushes
    into the part scan; part/supplier/nation broadcast; lineitem⋈orders
    is the one big shuffle; amount omits the supplycost term (no
    partsupp table in the testdata)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    part_f = part.filter(F.col("p_name").contains("red")).select("p_partkey")
    sn = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: GROUP BY ... HAVING sum > fraction × global
    scalar.  Part value (Σ extendedprice·quantity over NATION_7
    suppliers' lines) is aggregated ONCE; its 1-row global sum
    broadcasts back over the same aggregate for the HAVING filter —
    the Q15 reuse pattern applied to a many-row HAVING instead of an
    argmax."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sn = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = (
        li.join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").cast("long").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("__value"))
    )
    total = value.agg((0.001 * F.sum("__value")).alias("__thresh"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("__value") > F.col("__thresh"))
        .select("p_partkey", F.round("__value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


Q11_SQL = """
WITH value AS (
  SELECT l_partkey AS p_partkey,
         sum(l_extendedprice * l_quantity) AS v
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, round(v, 2) AS part_value
FROM value
WHERE v > (SELECT 0.001 * sum(v) FROM value)
ORDER BY part_value DESC, p_partkey
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(r_name, n_name) revenue with grouping level — exercises
    Spark's native multi-level aggregate (Expand) operator."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.grouping_id().cast("long").alias("grp"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("r_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("n_name"),
            "revenue",
            "n_orders",
            "grp",
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT coalesce(r_name, '(all)') AS r_name,
       coalesce(n_name, '(all)') AS n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS grp
FROM orders, customer, nation, region
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with non-hierarchical sets — (region), (nation),
    (mktsegment), grand total — a different Expand shape from ROLLUP's
    prefix hierarchy (expressed via spark.sql; the DataFrame API has no
    grouping-sets builder). One scan, one Expand, one aggregate."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_name", "c_mktsegment", "o_totalprice")
    ).createOrReplaceTempView("vs_gs_base")
    return spark.sql(
        """
        SELECT coalesce(r_name, '(all)')       AS r_name,
               coalesce(n_name, '(all)')       AS n_name,
               coalesce(c_mktsegment, '(all)') AS segment,
               round(sum(o_totalprice), 2)     AS revenue,
               count(*)                        AS n_orders
        FROM vs_gs_base
        GROUP BY GROUPING SETS ((r_name), (n_name), (c_mktsegment), ())
        """
    )


REVENUE_GROUPING_SETS_SQL = """
SELECT coalesce(r_name, '(all)')       AS r_name,
       coalesce(n_name, '(all)')       AS n_name,
       coalesce(c_mktsegment, '(all)') AS segment,
       round(sum(o_totalprice), 2)     AS revenue,
       count(*)                        AS n_orders
FROM orders, customer, nation, region
WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (n_name), (c_mktsegment), ())
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all four grouping combinations through
    ONE Expand (4 rows/input) + one aggregate — completes the
    multi-level-aggregate family (ROLLUP's prefix hierarchy,
    GROUPING SETS' explicit list, CUBE's powerset)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


ORDERS_CUBE_SQL = """
SELECT coalesce(o_orderstatus, '(all)')  AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def sql_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface end-to-end: vs_* SQL UDFs (functions/sql.py,
    Spark SQL scalar functions that inline into codegen) driving a
    pure-``spark.sql`` KNN over a registered view."""
    from vectorsearch_spark.functions.sql import register_sql_functions

    register_sql_functions(spark)
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("vs_embeddings")
    return spark.sql(
        """
        WITH q AS (SELECT embedding AS qe FROM vs_embeddings WHERE vec_id = 1),
        scored AS (
          SELECT e.vec_id AS id,
                 vs_l2(e.embedding, q.qe) AS d,
                 vs_cosine(e.embedding, q.qe) AS c
          FROM vs_embeddings e CROSS JOIN q)
        SELECT id, round(d, 4) AS l2_distance, round(c, 4) AS cosine_sim
        FROM scored
        ORDER BY d ASC, id ASC
        LIMIT 10
        """
    )


SQL_KNN_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1)
SELECT e.vec_id AS id,
       round({_duck_l2("e.embedding", "q.qe")}, 4) AS l2_distance,
       round(CASE WHEN sqrt({_duck_dot("e.embedding", "e.embedding")}) = 0
                    OR sqrt({_duck_dot("q.qe", "q.qe")}) = 0 THEN 0.0
                  ELSE {_duck_dot("e.embedding", "q.qe")}
                       / (sqrt({_duck_dot("e.embedding", "e.embedding")}) * sqrt({_duck_dot("q.qe", "q.qe")}))
             END, 4) AS cosine_sim
FROM embeddings e CROSS JOIN q
ORDER BY {_duck_l2("e.embedding", "q.qe")} ASC, e.vec_id ASC
LIMIT 10
"""


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time bucketed aggregation (batch analog of the streaming path)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*)                 AS n_events,
       round(sum(value), 4)     AS sum_value,
       count(DISTINCT user_id)  AS n_users
FROM events
GROUP BY 1, 2
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 1-hour windows every
    15 min, so each event lands in 4 windows — Spark's window()
    assigns them through ONE Expand (4 rows per input) feeding a
    map-side-combinable aggregate: no self-join, no per-window scans.
    The oracle reconstructs the assignment arithmetic independently
    (epoch-µs floor-division, generate_series of the 4 hops)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_SLIDING_SQL = """
WITH wins AS (
  SELECT event_type, value,
         make_timestamp((CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) - i.i) * 900000000) AS ws
  FROM events, unnest(generate_series(0, 3)) AS i(i))
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM wins GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current-state compaction (CDC pattern): the latest
    event per user via one ranked window over the key — the
    deduplicate-to-snapshot primitive behind SCD-1 tables and upsert
    materialization. Deterministic under ts ties via event_id desc."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
            F.round("value", 4).alias("value"),
        )
        .orderBy("user_id")
    )


EVENTS_LATEST_SQL = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       event_type, round(value, 4) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL set operators: 1995-buyers INTERSECT 1996-buyers (planned
    as a distinct + left-semi hash join) and 1995 EXCEPT 1996 (distinct
    + left-anti) — the two set-op physical shapes not exercised by the
    explicit semi/anti-join queries (Q4/Q21/Q22)."""
    orders = _t(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= f"{year}-01-01")
            & (F.col("o_orderdate") < f"{year + 1}-01-01")
        ).select("o_custkey")

    c95, c96 = buyers(1995), buyers(1996)
    both = c95.intersect(c96).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    ).select(F.lit("both_years").alias("cohort"), "n_customers")
    only95 = c95.subtract(c96).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    ).select(F.lit("only_1995").alias("cohort"), "n_customers")
    return both.unionByName(only95).orderBy("cohort")


CUSTOMER_SET_OPS_SQL = """
WITH c95 AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate <  TIMESTAMP '1996-01-01'),
c96 AS (SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01')
SELECT 'both_years' AS cohort,
       (SELECT count(*) FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)) AS n_customers
UNION ALL
SELECT 'only_1995',
       (SELECT count(*) FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96))
ORDER BY cohort
"""


def event_type_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a GROUPED_AGG pandas UDF: per-type
    geometric mean of event value — the Arrow-batched custom-UDAF
    surface (each group's values arrive as ONE pandas Series; no
    partial aggregation, so this is the right tool only for aggregates
    that genuinely cannot decompose — decomposable ones belong in
    builtin agg expressions, as everywhere else in this workload; nor
    can it mix with built-in aggregates in one agg() — Spark plans
    the whole aggregate through the Arrow path).
    Geometric mean is defined over positive values only, and the events
    generator does NOT guarantee positivity (sf0.1 carries value=0.0
    rows — r13 VERDICT): non-positive rows are excluded BEFORE the
    aggregate, in this filter and identically in the oracle SQL, so
    neither engine ever evaluates ln(0). round(4) absorbs
    summation-order fp noise between engines."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _gmean(v):
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # explicit functionType: the module uses `from __future__ import
    # annotations`, so type-hint inference cannot resolve pd.Series
    gmean = pandas_udf(_gmean, "double", PandasUDFType.GROUPED_AGG)

    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.round(gmean("value"), 4).alias("gmean_value"))
        .orderBy("event_type")
    )


EVENT_TYPE_GMEAN_SQL = """
SELECT event_type,
       round(exp(avg(ln(value))), 4) AS gmean_value
FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1
"""


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (trailing 1 h per user) — the RangeFrame
    physical shape (peer-row handling at equal timestamps, interval
    bounds) that no ROWS-frame query exercises. One shuffle on user_id;
    frame evaluation is streaming within the sorted partition. Spark's
    rangeBetween needs a numeric ordering key, so the frame orders by
    unix_micros(ts) with ±µs bounds — DuckDB's INTERVAL arithmetic is
    the independent formulation."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
    )


EVENTS_MOVING_AVG_SQL = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS avg_1h,
       count(*)   OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
FROM events
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the ``props`` JSON column parsed
    with a SCHEMA'D ``from_json`` (JVM-side Jackson inside codegen —
    never a Python UDF; a schema'd parse also short-circuits malformed
    rows to NULL instead of throwing) and aggregated per event type.
    At scale the parse is a narrow map fused into the scan stage; only
    the 5-row rollup shuffles. Oracle uses DuckDB's json_extract as
    the independent parser."""
    ev = _events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_PROPS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event type (two-level shuffle
    dedup-then-count). The HLL sketch twin of this query
    (``hll_sketch_agg``) is gated in tests/test_workload_parity.py
    against these exact counts at ≤5% relative error — sketch bytes are
    engine-specific, so the exact form is the oracle surface."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .orderBy("event_type")
    )


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group: Spark's sort-based ``percentile``
    aggregate (linear interpolation — the same definition as DuckDB's
    ``quantile_cont``, which makes the oracle a genuine cross-engine
    check of an order-statistics aggregate). Map-side partial
    aggregation does not apply to exact percentiles — the agg buffers
    per-group values — so at 100 TB prefer ``approx_percentile``
    (t-digest-style sketch, map-combinable) unless exactness is the
    requirement; this query pins the exact semantics."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p90"),
            F.round(F.col("p")[2], 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


PRICE_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event types to columns with mixed aggregates (counts for
    click/view/purchase, value sum for error). Spark plans pivot as a
    single groupBy with one conditional aggregate per (value, agg) pair
    — one shuffle regardless of pivot width; the explicit value list
    keeps it one pass (omitting it adds a distinct-values pre-job).
    Oracle uses FILTER-style conditional aggregation — the equivalent
    relational formulation."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy((F.col("user_id") % 7).alias("user_group"))
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .select(
            F.col("user_group").cast("long").alias("user_group"),
            F.col("click_n").cast("long").alias("click"),
            F.col("view_n").cast("long").alias("view"),
            F.col("purchase_n").cast("long").alias("purchase"),
            F.col("error_v").alias("error_value"),
        )
        .orderBy("user_group")
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(user_id % 7 AS BIGINT) AS user_group,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       round(sum(value) FILTER (event_type = 'error'), 4) AS error_value
FROM events GROUP BY 1 ORDER BY 1
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: a generated hourly spine
    (``sequence`` + explode over the observed [min, max] hour bounds ×
    the observed event types) LEFT-joined onto the hourly rollup, with
    missing (hour, type) cells zero-filled — the gap-fill every
    downstream charting/forecasting consumer needs, as a plan rather
    than a driver loop.

    Scale shape: events shuffle ONCE into the hourly aggregate, and a
    lazy ``localCheckpoint`` barrier under it makes the bounds row, the
    type list, and the gap-fill probe all read that materialized
    aggregate instead of re-scanning the fact table (column pruning
    specializes each consumer's aggregate, so without the barrier
    Catalyst plans three scans — same trap as the tokenize-once fix).
    The spine is hours × types — tiny at any corpus size (a decade is
    < 90 k hours) — so the gap-fill join broadcasts the aggregate."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("__h"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.round(F.sum("value"), 4).alias("__v"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("__h").alias("__lo"), F.max("__h").alias("__hi"))
    types = hourly.select("event_type").distinct()
    spine = bounds.select(
        F.explode(
            F.sequence("__lo", "__hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("__h")
    ).crossJoin(types)
    return (
        spine.join(F.broadcast(hourly), ["__h", "event_type"], "left")
        .select(
            F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("n_events"),
            F.coalesce(F.col("__v"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, round(sum(value), 4) AS v
  FROM events GROUP BY 1, 2),
b AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
spine AS (
  SELECT s.h, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b) s
  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t)
SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
       s.event_type AS event_type,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
       coalesce(a.v, 0.0) AS sum_value
FROM spine s
LEFT JOIN hourly a ON s.h = a.h AND s.event_type = a.event_type
ORDER BY 1, 2
"""


def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long melt): per-returnflag measure columns
    melted into (measure, total) rows — the inverse reshape of
    ``events_type_pivot`` and the long-form hand-off shape for ML
    feature tables.  Spark plans ``unpivot`` as one Expand (values×rows
    row multiplication, no shuffle, no distinct pre-job) sitting above
    the already-3-row aggregate; at 100 TB the only shuffle is the
    groupBy that produced the wide table."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "total"
    ).orderBy("l_returnflag", "measure")


LINEITEM_UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 4)      AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_price,
         round(sum(l_discount), 4)      AS sum_disc
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, measure, total
FROM wide UNPIVOT (total FOR measure IN (sum_qty, sum_price, sum_disc))
ORDER BY l_returnflag, measure
"""


def events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-mix rebalancing: cap every event type at 150
    deterministically-chosen events via ``stratified_quota``
    (operators/curate.py) — per-group smallest-md5 selection, a pure
    function of the ids.  The oracle ranks ALL rows per group with one
    window; the Spark side runs the exact two-phase plan (count →
    broadcast threshold prefilter → rank survivors + rescue), so the
    hash gate proves the bounded-shuffle plan equals the naive
    full-sort semantics row-for-row."""
    from vectorsearch_spark.operators.curate import stratified_quota

    ev = _events(spark, sf_dir).select("event_id", "event_type")
    return (
        stratified_quota(ev, "event_type", quota=150, id_col="event_id")
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            "rank_in_group",
        )
        .orderBy("event_type", "rank_in_group")
    )


EVENTS_STRATIFIED_SQL = """
SELECT event_type, event_id, CAST(rn AS BIGINT) AS rank_in_group
FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY substring(md5(CAST(event_id AS VARCHAR)), 1, 15) ASC,
                    event_id ASC) AS rn
  FROM events) t
WHERE rn <= 150
ORDER BY event_type, rn
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel view → click → purchase: each stage's
    per-user time is the MIN event time strictly after the previous
    stage's time.  Three dependent aggregates, each a per-user 1-row
    table that joins back into the (type-pruned) event scan — the
    stage tables are |users|-sized, so every join is the small-side
    build; no window over the raw event stream, no UDF.  Counts are
    integers → hash-exact."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("__t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .where(F.col("ts") > F.col("__t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("__t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .where(F.col("ts") > F.col("__t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("__t3"))
    )
    stages = [
        ("1_view", v),
        ("2_view_click", c),
        ("3_view_click_purchase", p),
    ]
    out = None
    for name, df in stages:
        row = df.agg(F.count(F.lit(1)).cast("long").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
SELECT '1_view' AS stage, count(*) AS users FROM v
UNION ALL SELECT '2_view_click', count(*) FROM c
UNION ALL SELECT '3_view_click_purchase', count(*) FROM p
ORDER BY stage
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users grouped by first-seen ISO week,
    distinct-user counts per (cohort week, whole weeks since).  The
    first-seen table is one per-user aggregate; the activity side is
    the distinct (user, week) projection; their join is user-keyed with
    the |users|-sized cohort table as the build side.  Weeks are
    date_trunc('week') — Monday-based ISO in both engines — and the
    offset is an exact integer day difference / 7."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("__cw")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("__aw")
    ).distinct()
    return (
        act.join(F.broadcast(first), "user_id")
        .groupBy(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("__aw"), F.col("__cw")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_COHORT_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY 1),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, aw) / 7 AS BIGINT) AS week_offset,
       count(*) AS users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking (T2-style per-group top-k on relational data)."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        cust.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rk",
        )
    )


TOP_CUSTOMERS_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey,
       round(c_acctbal, 2) AS acctbal, rk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer)
WHERE rk <= 3
"""


_CHUNK_PIPE_LEN = 32
_CHUNK_PIPE_BUDGET = 4000


def pipeline_chunk_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-pretraining composition: exact-dedup keepers →
    fixed-length sequence chunking → token-budget shard packing of the
    CHUNKS (not docs) → per-shard rollup — four individually-oracled
    operators chained through one plan; the hash gate proves the
    composition, incl. the chunk-uid ordering contract between
    chunking and the two-phase prefix-sum packer."""
    from vectorsearch_spark.operators.curate import chunk_documents, pack_token_shards
    from vectorsearch_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    keepers = (
        fingerprint(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keepers, "doc_id", "left_semi")
    chunks = chunk_documents(kept, chunk_tokens=_CHUNK_PIPE_LEN).select(
        # 1e6 multiplier: collision-free until a single document exceeds
        # ~32M tokens (chunk_idx >= 1e6 at 32-token chunks); the old 1e4
        # multiplier collided at ~320k tokens, corrupting packing order
        (F.col("doc_id") * 1_000_000 + F.col("chunk_idx")).alias("chunk_uid"),
        "doc_id",
        "n_tokens",
    )
    packed = pack_token_shards(
        chunks, budget=_CHUNK_PIPE_BUDGET, id_col="chunk_uid", count_col="n_tokens"
    )
    enriched = packed.join(
        chunks.select("chunk_uid", "doc_id"), "chunk_uid"
    )
    return (
        enriched.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard_id")
    )


PIPELINE_CHUNK_SQL = rf"""
WITH keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM keepers)),
base AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]')) AS n
  FROM kept),
chunks AS (
  SELECT doc_id * 1000000 + chunk_idx AS chunk_uid, doc_id,
         least({_CHUNK_PIPE_LEN}, n - chunk_idx * {_CHUNK_PIPE_LEN}) AS n_tokens
  FROM (SELECT doc_id, n,
               unnest(range(0, 1 + (greatest(n - {_CHUNK_PIPE_LEN}, 0) + {_CHUNK_PIPE_LEN - 1}) // {_CHUNK_PIPE_LEN})) AS chunk_idx
        FROM base WHERE n > 0)),
packed AS (
  SELECT chunk_uid, doc_id, n_tokens,
         CAST(floor(CAST(sum(n_tokens) OVER (ORDER BY chunk_uid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS DOUBLE) / {_CHUNK_PIPE_BUDGET}) AS BIGINT) AS shard_id
  FROM chunks)
SELECT shard_id, count(*)::BIGINT AS n_chunks,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM packed GROUP BY shard_id ORDER BY shard_id
"""


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value deviates from their
    type's median by more than 3× the median absolute deviation (MAD) —
    the standard heavy-tail-safe anomaly gate (mean/stddev break under
    the very outliers being hunted). Two grouped EXACT percentile
    aggregates (type-keyed, map-side partial) + one broadcast join of
    the 5-row stats table back onto the scan; at scale swap
    percentile → approx_percentile, same plan shape."""
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
            F.first("med").alias("med"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
        )
    )


EVENTS_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad, any_value(m.med) AS med
  FROM events e JOIN med m USING (event_type) GROUP BY 1)
SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
       round(m.med, 4) AS med, round(m.mad, 4) AS mad
FROM events e JOIN mad m USING (event_type)
WHERE abs(e.value - m.med) > 3 * m.mad
"""


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (CCNet-style): corpus-trained
    Laplace-smoothed model, per-doc mean NLL + perplexity."""
    from vectorsearch_spark.operators.text import lm_perplexity

    return lm_perplexity(_t(spark, sf_dir, "documents"))


DOC_LM_PERPLEXITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS t
  FROM documents),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
model AS (
  SELECT t, -ln((c + 0.5) / (n + 0.5 * (v + 1))) AS nll_t FROM counts, tot),
scored AS (
  SELECT doc_id, count(*) AS n_tokens, avg(nll_t) AS nll
  FROM tok JOIN model USING (t) GROUP BY doc_id)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       round(nll, 6) AS nll, round(exp(nll), 4) AS ppl
FROM scored
"""


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via the VARIANT type (Spark 4):
    ``try_parse_json`` builds the binary variant once, ``try_variant_get``
    path-extracts under a per-row type cast — the open-schema analog of
    the schema'd ``from_json`` in events_json_props (variant shreds the
    JSON once; repeated path gets don't re-parse the text, which is the
    at-scale advantage over N × get_json_object). Deciles of k per
    event type; malformed/missing paths surface as NULL, never throw."""
    ev = _events(spark, sf_dir)
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).cast("long").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
        )
    )


# Mirrors Spark's try_variant_get(v, '$.k', 'int') cast semantics per
# JSON type (probed, pinned in tests/test_workload_parity.py):
#   integer      -> value (NULL on int32 overflow)
#   double       -> TRUNCATED toward zero (DuckDB's bare CAST rounds)
#   string       -> value iff a pure integral string, else NULL
#   boolean      -> 1/0
#   JSON null / missing / other -> NULL (DuckDB json_extract returns a
#   non-NULL 'null' JSON scalar, which a bare count() would include)
EVENTS_VARIANT_SQL = """
WITH x AS (
  SELECT event_type,
         CASE json_type(props, '$.k')
           WHEN 'UBIGINT' THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           WHEN 'BIGINT'  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           WHEN 'DOUBLE'  THEN TRY_CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INTEGER)
           WHEN 'VARCHAR' THEN CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
                                    THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END
           WHEN 'BOOLEAN' THEN CASE WHEN json_extract_string(props, '$.k') = 'true' THEN 1 ELSE 0 END
         END AS k
  FROM events)
SELECT event_type,
       CAST(floor(k / 10) AS BIGINT) AS k_decile,
       count(*) AS n_events,
       count(k) AS n_with_k
FROM x
GROUP BY 1, 2
"""


_COPURCHASE_SUPPORT = 2


def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs sharing >= 2 orders
    (basket-keyed self-join + support rollup; hot-basket cap)."""
    from vectorsearch_spark.operators.centrality import cooccurrence_pairs

    return cooccurrence_pairs(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=_COPURCHASE_SUPPORT,
        # no drop-cap: the DuckDB oracle has no basket-size filter, and
        # TPC-H orders are <= 7 lines — the cap stays the API default
        # for real skewed corpora but would silently diverge the hash
        # gate if a basket ever exceeded it here
        max_basket=None,
    ).select("item_a", "item_b", F.col("support").cast("long").alias("support"))


PART_COPURCHASE_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
       count(*)::BIGINT AS support
FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
GROUP BY 1, 2 HAVING count(*) >= {_COPURCHASE_SUPPORT}
"""


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph (degree-oriented
    wedge join — out-degrees bounded O(sqrt(E)) under any skew)."""
    from vectorsearch_spark.operators.centrality import (
        cooccurrence_pairs,
        triangle_count,
    )

    edges = cooccurrence_pairs(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=1,
        max_basket=None,  # oracle has no basket cap (TPC-H <= 7 lines)
    )
    return triangle_count(edges)


COPURCHASE_TRIANGLES_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS bb
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
SELECT count(*)::BIGINT AS n_triangles
FROM e e1 JOIN e e2 ON e1.bb = e2.a JOIN e e3 ON e1.a = e3.a AND e2.bb = e3.bb
"""


def events_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation: the hourly per-type average series
    densified onto the spine, with missing hours LINEARLY interpolated
    between the previous and next observed cells (nearest-value at the
    edges) — the feature-engineering upgrade of events_gap_fill's
    zero-fill. Two key-partitioned carry windows (backward last +
    forward first over ignorenulls) on the broadcast-sized spine; the
    fact table shuffles once into the hourly aggregate."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("__h"), "event_type")
        .agg(F.avg("value").alias("__v"))
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("__h").alias("__lo"), F.max("__h").alias("__hi"))
    types = hourly.select("event_type").distinct()
    spine = bounds.select(
        F.explode(F.sequence("__lo", "__hi", F.expr("INTERVAL 1 HOUR"))).alias("__h")
    ).crossJoin(types)
    j = spine.join(F.broadcast(hourly), ["__h", "event_type"], "left")
    t = F.unix_seconds("__h")
    obs_t = F.when(F.col("__v").isNotNull(), t)
    wb = (
        Window.partitionBy("event_type")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("__h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("__v", ignorenulls=True).over(wb)
    pt = F.last(obs_t, ignorenulls=True).over(wb)
    nv = F.first("__v", ignorenulls=True).over(wf)
    nt = F.first(obs_t, ignorenulls=True).over(wf)
    filled = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (t - pt) / (nt - pt),
        )
        .when(pv.isNotNull(), pv)
        .otherwise(nv)
    )
    return j.select(
        F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.round(filled, 6).alias("value"),
        F.col("__v").isNull().alias("interpolated"),
    )


EVENTS_INTERPOLATED_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, avg(value) AS v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
types AS (SELECT DISTINCT event_type FROM hourly),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h, event_type
  FROM bounds, types),
j AS (
  SELECT s.h, s.event_type, hourly.v
  FROM spine s LEFT JOIN hourly ON hourly.h = s.h AND hourly.event_type = s.event_type),
c AS (
  SELECT h, event_type, v,
         last_value(CASE WHEN v IS NOT NULL THEN epoch(h) END IGNORE NULLS) OVER wb AS pt,
         last_value(v IGNORE NULLS) OVER wb AS pv,
         first_value(CASE WHEN v IS NOT NULL THEN epoch(h) END IGNORE NULLS) OVER wf AS nt,
         first_value(v IGNORE NULLS) OVER wf AS nv
  FROM j
  WINDOW wb AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * (epoch(h) - pt) / (nt - pt)
                  WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS value,
       (v IS NULL) AS interpolated
FROM c
"""


_HIST_BUCKETS = 20
_HIST_LO, _HIST_HI = 900.0, 1000.0


def part_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` — one narrow codegen
    projection + one tiny groupBy (the profiling companion: shape, not
    just min/max); under/overflow land in buckets 0 and n+1."""
    return (
        _t(spark, sf_dir, "part")
        .groupBy(
            F.width_bucket(
                "p_retailprice", F.lit(_HIST_LO), F.lit(_HIST_HI), F.lit(_HIST_BUCKETS)
            ).alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n").cast("long").alias("n"),
        )
    )


PART_PRICE_HISTOGRAM_SQL = f"""
-- DuckDB has no width_bucket: mirror its arithmetic explicitly
SELECT CAST(CASE WHEN p_retailprice < {_HIST_LO} THEN 0
            WHEN p_retailprice >= {_HIST_HI} THEN {_HIST_BUCKETS + 1}
            ELSE floor((p_retailprice - {_HIST_LO}) / ({_HIST_HI} - {_HIST_LO}) * {_HIST_BUCKETS}) + 1
       END AS BIGINT) AS bucket,
       count(*) AS n
FROM part GROUP BY 1
"""


def events_type_dow_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type × day-of-week: the
    contingency table is ONE groupBy, expected counts come from
    broadcast 1-row/short marginal aggregates, and the statistic is a
    single sum — the categorical sibling of lineitem_corr_matrix
    (feature-association screening before training)."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    obs = ev.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    row_m = obs.groupBy("event_type").agg(F.sum("o").alias("rm"))
    col_m = obs.groupBy("dow").agg(F.sum("o").alias("cm"))
    n = obs.agg(F.sum("o").alias("n"))
    exp = (
        obs.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("rm") * F.col("cm") / F.col("n"))
    )
    return exp.agg(
        F.round(F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 6).alias("chi2"),
        F.count("*").cast("long").alias("n_cells"),
    )


EVENTS_CHISQ_SQL = """
WITH ev AS (SELECT event_type, dayofweek(ts) + 1 AS dow FROM events),
obs AS (SELECT event_type, dow, count(*) AS o FROM ev GROUP BY 1, 2),
rm AS (SELECT event_type, sum(o) AS rm FROM obs GROUP BY 1),
cm AS (SELECT dow, sum(o) AS cm FROM obs GROUP BY 1),
n AS (SELECT sum(o) AS n FROM obs)
SELECT round(sum(pow(o - rm * cm / n, 2) / (rm * cm / n)), 6) AS chi2,
       count(*) AS n_cells
FROM obs JOIN rm USING (event_type) JOIN cm USING (dow), n
"""


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed PCA (d×d sufficient statistics via one Arrow
    pass, driver eigensolve, broadcast GEMM projection) truncating the
    64-d embeddings to 8 components. No SQL oracle (eigendecomposition
    has no SQL form); exact-equality NumPy model tests gate it
    (tests/test_projection.py), the bpe_merge_table contract."""
    from vectorsearch_spark.operators.projection import pca_project

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = pca_project(emb, k=8, dim=64)
    # Driver-canonicalizable shape: the harness sorts every column to
    # canonicalize, and an array<double> column is unsortable there
    # (r5's one red row: "unhashable type: 'list'").  Project the 8
    # components to scalar pc1..pc8 doubles instead; |value| rounded
    # because eigenvector SIGN is arbitrary across LAPACK builds.
    return out.select(
        "vec_id",
        *[
            F.round(F.abs(F.element_at(F.col("pca"), i + 1)), 6).alias(f"pc{i + 1}")
            for i in range(8)
        ],
    )


def order_top_line_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-1: each order's priciest line — the SQL
    surface Spark decorrelates into a ranked window/aggregate rather
    than a per-row subquery loop (verify: no CartesianProduct, plan is
    join + window over ONE lineitem scan). DuckDB runs its own LATERAL
    implementation — a genuine cross-engine decorrelation check."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__lat_lineitem")
    return spark.sql("""
      SELECT o.o_orderkey, o.o_totalprice, t.l_linenumber,
             round(t.l_extendedprice, 2) AS top_price
      FROM __lat_orders o, LATERAL (
        SELECT l_linenumber, l_extendedprice FROM __lat_lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 1) t
      WHERE o.o_totalprice > 400000
    """)


ORDER_TOP_LINE_LATERAL_SQL = """
SELECT o.o_orderkey, o.o_totalprice, t.l_linenumber,
       round(t.l_extendedprice, 2) AS top_price
FROM orders o, LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 1) t
WHERE o.o_totalprice > 400000
"""


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means clustering of the embeddings (k=8,
    5 iterations, deterministic first-k init) + assignment. No SQL
    oracle (iterative centroid updates have no tractable SQL form);
    exact NumPy-model equality tests gate it (tests/test_cluster.py)."""
    from vectorsearch_spark.operators.cluster import kmeans_assign, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_fit(emb, k=8, iters=5)
    return kmeans_assign(emb, cents).select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.round("cluster_dist", 6).alias("dist2"),
    )


def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of embedding_kmeans: iters=0 makes
    the centroids the deterministic first-8-by-vec_id init EXACTLY, so
    the assignment pass — the same _assign GEMM kernel
    (||x||²−2x·c+||c||², operators/cluster.py:34) and mapInPandas
    plumbing every Lloyd's iteration, kmeans_assign and SemDeDup call
    runs — is pure argmin-L2² against a SQL-derivable centroid table.
    Proves the init ordering, the distance kernel, the argmin tie-break
    (lowest cluster index) and the assignment schema; the iterative
    configs keep their exact NumPy-model gates (tests/test_cluster.py).
    The distance witness is rounded to ONE decimal (d² magnitudes are
    O(100) here): the GEMM identity and DuckDB's sequential sum differ
    in the last ulps, and a fine grid would put values within float
    noise of a rounding boundary — the knn_mmr_maxrel lesson applied to
    a value that cannot be made integral."""
    from vectorsearch_spark.operators.cluster import kmeans_assign, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_fit(emb, k=8, iters=0)
    return kmeans_assign(emb, cents).select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.round("cluster_dist", 1).alias("dist2"),
    )


EMBEDDING_KMEANS_ASSIGN_SQL = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding AS ce
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
pairs AS (
  SELECT e.vec_id, c.cluster,
         list_reduce(list_transform(range(1, len(e.embedding)+1),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE))^2),
           (x,y) -> x+y) AS d2
  FROM embeddings e CROSS JOIN c),
r AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rn
  FROM pairs)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, round(d2, 1) AS dist2
FROM r WHERE rn = 1
"""


def embedding_pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle twin for the DISTRIBUTED half of embedding_pca: the d×d
    sufficient-statistics pass (operators/projection.py pca_cov — one
    Arrow partial per partition, driver merge, cov = E[xxᵀ] − μμᵀ) is
    deterministic arithmetic with an exact SQL form, unlike the
    eigensolve it feeds (driver-side O(d³) NumPy, sign-ambiguous,
    NumPy-model-gated in tests/test_projection.py). Emits the upper
    triangle of the first 8×8 covariance block — enough to pin the
    centering, the Gram accumulation and the partial-merge against
    DuckDB's avg(e_i·e_j) − avg(e_i)·avg(e_j)."""
    import pandas as pd

    from vectorsearch_spark.operators.projection import pca_cov

    emb = _t(spark, sf_dir, "embeddings").select("embedding")
    cov, _, _ = pca_cov(emb, dim=64)
    rows = [
        (i, j, round(float(cov[i, j]), 6))
        for i in range(8)
        for j in range(i, 8)
    ]
    return spark.createDataFrame(rows, "i long, j long, cov double")


EMBEDDING_PCA_COV_SQL = r"""
WITH idx AS (SELECT unnest(range(1, 9)) AS d),
pairs AS (SELECT a.d AS i, b.d AS j FROM idx a, idx b WHERE a.d <= b.d),
c AS (
  SELECT i, j,
         avg(embedding[i]::DOUBLE * embedding[j]::DOUBLE)
           - avg(embedding[i]::DOUBLE) * avg(embedding[j]::DOUBLE) AS cov
  FROM embeddings, pairs GROUP BY i, j)
SELECT (i - 1)::BIGINT AS i, (j - 1)::BIGINT AS j, round(cov, 6) AS cov
FROM c
"""


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings with injected
    near-duplicates (vec_id+1M copies scaled 1.0001): cluster-scoped
    exact cosine, min-id keepers. Rows-only entry; exact model tests in
    tests/test_cluster.py gate the semantics."""
    from vectorsearch_spark.operators.cluster import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda v: v * 1.0001).alias("embedding"),
    )
    return semantic_dedup(
        emb.unionByName(dups), k=8, threshold=0.999, iters=3
    ).select("vec_id", F.col("cluster").cast("long").alias("cluster"))


def dedup_semantic_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of dedup_semantic (r10): k=1 puts
    the whole corpus in ONE cluster, so the cluster-scoped greedy
    min-id cosine pass — the same applyInPandas kernel, normalization,
    threshold compare and keep-loop every SemDeDup config runs —
    becomes exact within-corpus cosine dedup. On this corpus the
    θ=0.999 dup graph is CLIQUES (each original ↔ its ×1.0001 copy;
    scaling preserves cosine exactly, and the max cross-pair cosine is
    ~0.51 — verified at both SFs), where greedy keep ≡ "no lower-id row
    within θ" — plain SQL. Pins the greedy ordering, the min-id keeper
    convention, the cosine kernel and the schema; clustered configs
    keep their NumPy-model gates (tests/test_cluster.py).
    ``strict=True`` guards the twin's exactness claim: if a future SF
    pushed the corpus past max_cluster, the non-strict splitter would
    silently re-cluster (fresh labels, per-child dedup) and diverge
    from the whole-corpus oracle — strict mode raises loudly instead."""
    from vectorsearch_spark.operators.cluster import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda v: v * 1.0001).alias("embedding"),
    )
    return semantic_dedup(
        emb.unionByName(dups), k=1, threshold=0.999, iters=0, strict=True
    ).select("vec_id", F.col("cluster").cast("long").alias("cluster"))


DEDUP_SEMANTIC_EXACT_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE) * 1.0001) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM base a JOIN base b ON b.vec_id < a.vec_id
  WHERE {_duck_cosine_dist("a.embedding", "b.embedding")} <= 0.001)
SELECT vec_id, CAST(0 AS BIGINT) AS cluster
FROM base WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def dedup_embedding_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ε-dedup — the headline UNBOUNDED-Q use of the distributed
    radius search (r10): the corpus (with ×1.0001-scaled near-dup
    injections) queries ITSELF through
    ivf_range_join(query_mode="distributed") — codegen cell routing,
    zero collects, zero driver GEMM — and a row is dropped iff a
    lower-id row sits within L2 ε=0.05 (min-id keeper; injected dups
    are at d ≤ 1e-4, everything else ≥ 0.89 at every SF, so the ε-ball
    graph is exactly the injected pairs). At 100 TB this is the shape
    LSH/SimHash approximate: a RECALL-COMPLETE near-dup pass whose
    only shuffles are the bucket-keyed candidate join and the anti
    join — triangle-inequality pruning keeps it exact while scanning
    only the cells a match can live in."""
    from vectorsearch_spark.operators.similarity import ivf_range_join

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda v: v * 1.0001).alias("embedding"),
    )
    corpus = emb.unionByName(dups)
    pairs = ivf_range_join(
        corpus,
        corpus.select(F.col("vec_id").alias("query_id"), "embedding"),
        radius=0.05,
        n_centroids=16,
        id_col="vec_id",
        query_mode="distributed",
    )
    # every row matches itself (d = 0 ≤ ε, own cell always probed), so
    # "no lower-id row within ε" ≡ min(id) == query_id — ONE map-side-
    # combinable aggregate instead of an anti join (which Catalyst
    # pushes below the union, duplicating the whole radius search)
    return (
        pairs.groupBy("query_id")
        .agg(F.min("id").alias("_min_id"))
        .where(F.col("_min_id") == F.col("query_id"))
        .select(F.col("query_id").alias("vec_id"))
    )


DEDUP_EMBEDDING_RADIUS_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE) * 1.0001) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM base a JOIN base b ON b.vec_id < a.vec_id
  WHERE {_duck_l2("a.embedding", "b.embedding")} <= 0.05)
SELECT vec_id FROM base WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the lineitem measures in
    ONE full-scan aggregate (all C(4,2) corr aggregates share the scan
    and combine map-side) — the feature-analysis pass before model
    training; long-form output (col_a, col_b, corr)."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    one = li.agg(
        *[F.corr(a, b).alias(f"{a}|{b}") for a, b in pairs]
    )
    long = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(F.col(f"`{a}|{b}`"), 6).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return one.select(F.explode(long).alias("p")).select("p.*")


LINEITEM_CORR_SQL = f"""
{" UNION ALL ".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, round(corr({a}, {b}), 6) AS corr FROM lineitem"
    for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
)}
"""


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning on the documents corpus (8
    rounds). No SQL oracle — the per-round argmax/merge loop has no
    tractable SQL form; correctness is gated by the exact pure-Python
    reference model test (tests/test_bpe.py), the same contract as the
    approximate-ANN rows-only entries."""
    from vectorsearch_spark.operators.bpe import learn_bpe_merges

    merges = _bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges or [(-1, "", "", 0)],
        "round int, left string, right string, pair_count long",
    )


_BPE_CACHE: dict[str, list] = {}


def _bpe_merges(spark: SparkSession, sf_dir: str) -> list:
    from vectorsearch_spark.operators.bpe import learn_bpe_merges

    if sf_dir not in _BPE_CACHE:
        _BPE_CACHE[sf_dir] = learn_bpe_merges(
            _t(spark, sf_dir, "documents"), n_merges=8
        )
    return _BPE_CACHE[sf_dir]


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION (operators/bpe.py apply_bpe_merges):
    encode every document with the merge table learned on this corpus
    (cached per sf_dir — learn once, apply everywhere, the production
    shape) and roll up per-document token statistics: word count,
    BPE-token count, and the compression the merges bought
    (tokens == chars before any merge applies). Rows-only entry — the
    encode fold is the same iterative semantics as learning; exact
    pure-Python model equality gates it in tests/test_bpe.py."""
    from vectorsearch_spark.operators.bpe import apply_bpe_merges

    enc = apply_bpe_merges(
        _t(spark, sf_dir, "documents"), _bpe_merges(spark, sf_dir)
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        F.sum(F.length("w")).cast("long").alias("n_chars"),
    )


_REACH_SEED_MOD = 500
_REACH_MAX_HOPS = 3


def part_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS over the co-purchase graph via WITH RECURSIVE
    (Spark 4 recursive CTE — the SQL-surface form of the iterative
    DataFrame loops in pagerank/duplicate_clusters): min hop count from
    a seed part set, depth ≤ 3. The oracle is an INDEPENDENTLY
    formulated level-by-level unrolled expansion, so the recursion
    semantics (UNION ALL growth + outer min-group) are cross-checked
    rather than echoed."""
    from vectorsearch_spark.operators.centrality import cooccurrence_pairs

    # support >= 2: recursive UNION ALL tracks PATHS, not nodes — on the
    # dense support>=1 graph (avg degree ~80) a 3-hop BFS is ~2M paths
    # and trips Spark's recursion row limit; the support-filtered graph
    # keeps the same query shape at bounded fan-out (the node-distinct
    # form is the iterative-DataFrame loop, dedup.py duplicate_clusters)
    edges = cooccurrence_pairs(
        _t(spark, sf_dir, "lineitem"),
        "l_orderkey",
        "l_partkey",
        min_support=2,
        max_basket=None,  # oracle has no basket cap (TPC-H <= 7 lines)
    ).select("item_a", "item_b")
    # materialize BEFORE the recursion: UnionLoopExec re-executes the
    # recursive term's subplan every iteration, and a temp VIEW is just
    # a logical plan — unmaterialized, each of the 3 hops would rebuild
    # candidate generation from lineitem (measured 8.5 s → ~2 s)
    edges.unionByName(
        edges.select(F.col("item_b").alias("item_a"), F.col("item_a").alias("item_b"))
    ).localCheckpoint().createOrReplaceTempView("__copurchase_edges")
    _t(spark, sf_dir, "part").createOrReplaceTempView("__part_seed_src")
    return spark.sql(f"""
      WITH RECURSIVE reach(part, hops) AS (
        SELECT p_partkey, 0 FROM __part_seed_src
        WHERE p_partkey % {_REACH_SEED_MOD} = 0
        UNION ALL
        SELECT e.item_b, r.hops + 1
        FROM reach r JOIN __copurchase_edges e ON e.item_a = r.part
        WHERE r.hops < {_REACH_MAX_HOPS}
      )
      SELECT part AS p_partkey, CAST(min(hops) AS BIGINT) AS hops
      FROM reach GROUP BY part
    """)


PART_REACHABILITY_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT x.l_partkey AS a, y.l_partkey AS bb
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT a, bb FROM e0 UNION ALL SELECT bb, a FROM e0),
h0 AS (SELECT p_partkey AS part FROM part WHERE p_partkey % {_REACH_SEED_MOD} = 0),
h1 AS (SELECT DISTINCT e.bb AS part FROM h0 JOIN e ON e.a = h0.part),
h2 AS (SELECT DISTINCT e.bb AS part FROM h1 JOIN e ON e.a = h1.part),
h3 AS (SELECT DISTINCT e.bb AS part FROM h2 JOIN e ON e.a = h2.part),
lv AS (
  SELECT part, 0 AS hops FROM h0
  UNION ALL SELECT part, 1 FROM h1
  UNION ALL SELECT part, 2 FROM h2
  UNION ALL SELECT part, 3 FROM h3)
SELECT part AS p_partkey, CAST(min(hops) AS BIGINT) AS hops
FROM lv GROUP BY part
"""


_Z_BITS = 8
_Z_BOUNDS = {"p_size": (1.0, 50.0), "p_retailprice": (900.0, 1000.0)}


def part_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (p_size, p_retailprice) with fixed bounds —
    the clustering key cluster_by_zorder sorts by; pure per-row bit
    arithmetic, mirrored literally in the oracle."""
    from vectorsearch_spark.operators.layout import zorder_value

    return _t(spark, sf_dir, "part").select(
        "p_partkey", zorder_value(_Z_BOUNDS, bits=_Z_BITS).alias("zval")
    )


def _zorder_sql() -> str:
    qs = {}
    for c, (lo, hi) in _Z_BOUNDS.items():
        n = (1 << _Z_BITS) - 1
        qs[c] = (
            f"least(greatest(CAST(floor((CAST({c} AS DOUBLE) - {lo}) / "
            f"({hi} - {lo}) * {n + 1}) AS BIGINT), 0), {n})"
        )
    names = list(_Z_BOUNDS)
    terms = []
    for i in range(_Z_BITS):
        for j, c in enumerate(names):
            terms.append(f"(((q_{c} >> {i}) & 1) << {i * len(names) + j})")
    qcols = ", ".join(f"{qs[c]} AS q_{c}" for c in names)
    return f"""
WITH q AS (SELECT p_partkey, {qcols} FROM part)
SELECT p_partkey, CAST({" + ".join(terms)} AS BIGINT) AS zval FROM q
"""


_INCR_SPLIT = "2024-01-25 00:00:00"


def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the hourly (event_type, hour)
    rollup built as merge(state(base), state(delta)) across a time
    split — the oracle recomputes from the full table, proving the
    merged state is indistinguishable from a rescan."""
    from vectorsearch_spark.operators.incremental import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "value",
        "ts",
    )
    keys = ["event_type", "hour"]
    base = rollup_state(ev.where(F.col("ts") < F.lit(_INCR_SPLIT)), keys, "value")
    delta = rollup_state(ev.where(F.col("ts") >= F.lit(_INCR_SPLIT)), keys, "value")
    out = finalize_rollup(merge_rollup_states([base, delta], keys), keys)
    return out.select(
        "event_type",
        "hour",
        "n_rows",
        F.round("total", 4).alias("total"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
        F.round("avg", 6).alias("avg"),
    )


EVENTS_INCREMENTAL_ROLLUP_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(value) AS n_rows,
       round(sum(value), 4) AS total,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax,
       round(sum(value) / count(value), 6) AS avg
FROM events
GROUP BY 1, 2
"""


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling of the documents table (nulls /
    exact distincts / min-max per column in a single full-scan agg)."""
    from vectorsearch_spark.operators.profile import profile_table

    return profile_table(
        _t(spark, sf_dir, "documents"),
        cols=["doc_id", "lang", "source", "n_chars"],
    )


DOCUMENTS_PROFILE_SQL = """
SELECT 'doc_id' AS "column", count(*) AS n_rows,
       count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
       min(lang), max(lang) FROM documents
UNION ALL
SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
       min(source), max(source) FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
"""


def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family window sweep in ONE pass: ntile quartiles,
    percent_rank, cume_dist, dense_rank and a lag delta over the same
    (nation, balance) window — all five share one Exchange+Sort (the
    window family is frame-compatible), which is the plan property the
    oracle's QUALIFY-free mirror checks implicitly via exactness."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "c_custkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.dense_rank().over(w).cast("long").alias("drank"),
            F.round(
                F.col("c_acctbal") - F.lag("c_acctbal", 1, 0.0).over(w), 2
            ).alias("bal_step"),
        )
    )


CUSTOMER_BALANCE_RANKS_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       round(c_acctbal - lag(c_acctbal, 1, 0.0) OVER w, 2) AS bal_step
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD Type-2 dimension: per-user event_type version
    intervals with no-op updates collapsed (consecutive same-type
    events fold into one open interval); half-open [from, to) validity,
    NULL/'' valid_to marks the current version."""
    from vectorsearch_spark.operators.events import changelog_to_scd2

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    scd = changelog_to_scd2(
        ev, on="user_id", ts="ts", attrs=["event_type"], tiebreak="event_id"
    )
    return scd.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("valid_to"),
        "is_current",
    )


EVENTS_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
kept AS (
  SELECT user_id, event_id, event_type, ts FROM ordered
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type),
v AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM kept)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), '') AS valid_to,
       valid_to IS NULL AS is_current
FROM v
"""


def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom runtime-filter join: lineitems of high-balance
    BUILDING-segment customers. The fact side is pre-filtered by a
    broadcast Bloom bitmap of the qualifying order keys BELOW the
    shuffle (operators/joins.py bloom_semi_join); the exact semi join
    then removes false positives, so the result is identical to the
    plain IN-subquery — the oracle checks exactly that."""
    from vectorsearch_spark.operators.joins import bloom_semi_join

    cust = _t(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    )
    orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(cust.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    pruned = bloom_semi_join(
        _t(spark, sf_dir, "lineitem"), orders, on="l_orderkey", keys_on="o_orderkey"
    )
    return pruned.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


BLOOM_PRUNED_REVENUE_SQL = """
SELECT l_orderkey, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000))
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# Vector queries (C1-C6, J5, T2, T4): exact brute-force KNN with DuckDB
# oracles computed in double precision via list lambdas.
# ---------------------------------------------------------------------------

_N_QUERIES = 8  # first 8 embeddings double as the query batch
_KNN_K = 10


def _emb_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _knn_batch(spark: SparkSession, sf_dir: str, metric: Metric) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = knn_join(
        emb, _emb_queries(spark, sf_dir), k=_KNN_K, metric=metric, id_col="vec_id"
    )
    return res.select(
        "query_id",
        "id",
        F.round("distance", 4).alias("distance"),
        (-F.round("distance", 4)).alias("score")
        if metric == Metric.L2
        else (F.lit(1.0) - F.round("distance", 4)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def knn_l2_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_batch(spark, sf_dir, Metric.L2)


def knn_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators/similarity.py mmr_rerank):
    cosine top-20 per query, then greedy λ=0.7 Maximal Marginal
    Relevance picks 5 — the RAG post-pass that keeps near-duplicate
    passages from crowding a result list. Greedy selection is
    sequential in k → no SQL form → rows-only driver check; exact
    greedy-model equality is gated in tests/test_similarity.py."""
    from vectorsearch_spark.operators.knn import knn_join
    from vectorsearch_spark.operators.similarity import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    top = knn_join(
        emb, _emb_queries(spark, sf_dir), k=20, metric=Metric.COSINE, id_col="vec_id"
    ).select(
        "query_id", "id", (F.lit(1.0) - F.col("distance")).alias("score")
    )
    cand = top.join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    out = mmr_rerank(cand, k=5, lam=0.7)
    return out.select(
        "query_id", "id", F.round("mmr_score", 4).alias("mmr_score"),
        F.col("rank").cast("long").alias("rank"),
    )


def knn_mmr_maxrel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of knn_mmr_rerank: λ=1.0 zeroes the
    diversity term (mmr = 1·rel − 0·max_sim at EVERY step), so greedy
    MMR collapses to top-5 by (relevance DESC, id ASC) — SQL-mirrorable
    — while running the IDENTICAL applyInPandas kernel
    (operators/similarity.py mmr_rerank): the candidate sort, the
    argmax/masking loop, the max_sim updates (computed, then multiplied
    by zero) and the score/rank emission. Relevance is the INTEGER
    21 − knn_rank rather than the raw cosine score: same ordering, but
    no value can sit on a rounding boundary (a raw-score twin flaked on
    one 0.30625 half-way case — banker's vs half-away rounding), so the
    hash compare is boundary-free by construction. Proves the selection
    plumbing end-to-end; the λ=0.7 config keeps its exact greedy-model
    pytest gate (tests/test_similarity.py)."""
    from vectorsearch_spark.operators.knn import knn_join
    from vectorsearch_spark.operators.similarity import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    top = knn_join(
        emb, _emb_queries(spark, sf_dir), k=20, metric=Metric.COSINE, id_col="vec_id"
    ).select(
        "query_id", "id", (F.lit(21.0) - F.col("rank")).alias("score")
    )
    cand = top.join(
        emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    out = mmr_rerank(cand, k=5, lam=1.0)
    return out.select(
        "query_id", "id", F.round("mmr_score", 4).alias("mmr_score"),
        F.col("rank").cast("long").alias("rank"),
    )


KNN_MMR_MAXREL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS id, {_duck_cosine_dist("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, id,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, id ASC) AS rn
  FROM pairs),
sel AS (
  SELECT query_id, id, 21.0 - rn AS score,
         row_number() OVER (PARTITION BY query_id ORDER BY rn ASC, id ASC) AS rank
  FROM ranked WHERE rn <= 20)
SELECT query_id, id, round(score, 4) AS mmr_score, CAST(rank AS BIGINT) AS rank
FROM sel WHERE rank <= 5
"""


def quality_classifier_onestep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of quality_classifier_scores (the
    iters=0/λ=1.0 precedent applied to gradient descent): ONE GD step
    from zero weights is closed-form — z=0 everywhere ⇒ p=0.5 ⇒
    gradient = avg(x_std·(0.5−y)) and the L2 term vanishes — so the
    ENTIRE fit path (the bounded stats aggregate, standardization, the
    distributed gradient pass, raw-space weight folding) plus the
    codegen sigmoid scorer reduces to SQL-derivable arithmetic. Features
    are engine-unambiguous integers (n_chars, space count) so the only
    cross-engine drift is float summation order, far below the round-6
    witness. The 50-iteration production config keeps its exact
    NumPy-GD-model pytest gate (tests/test_classify.py)."""
    from vectorsearch_spark.operators.classify import logistic_fit, logistic_score

    feats = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("f_chars"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        ).cast("double").alias("f_spaces"),
        (F.col("n_chars") >= 500).cast("double").alias("y"),
    )
    w = logistic_fit(feats, ["f_chars", "f_spaces"], "y", iters=1, lr=1.0)
    scored = logistic_score(feats, w, ["f_chars", "f_spaces"])
    return scored.select("doc_id", F.round("score", 6).alias("score"))


QUALITY_CLASSIFIER_ONESTEP_SQL = r"""
WITH f AS (
  SELECT doc_id, n_chars::DOUBLE AS f1,
         (len(text) - len(replace(text, ' ', '')))::DOUBLE AS f2,
         CASE WHEN n_chars >= 500 THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
s AS (
  SELECT avg(f1) AS mu1, avg(f2) AS mu2,
         sqrt(greatest(avg(f1*f1) - avg(f1)*avg(f1), 1e-12)) AS sd1,
         sqrt(greatest(avg(f2*f2) - avg(f2)*avg(f2), 1e-12)) AS sd2
  FROM f),
g AS (
  SELECT avg(((f1 - mu1)/sd1) * (0.5 - y)) AS g1,
         avg(((f2 - mu2)/sd2) * (0.5 - y)) AS g2,
         avg(0.5 - y) AS gb
  FROM f, s),
w AS (
  SELECT (-g1)/sd1 AS w1, (-g2)/sd2 AS w2,
         (-gb) - ((-g1)*mu1/sd1 + (-g2)*mu2/sd2) AS b
  FROM g, s)
SELECT doc_id, round(1.0 / (1.0 + exp(-(f1*w1 + f2*w2 + b))), 6) AS score
FROM f, w
"""


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle twin for the distributed CORE of BPE learning: one round's
    weighted adjacent-pair counts (operators/bpe.py _word_vocab +
    _pair_counts — the word-frequency pass, char seeding, the pair
    window and the count-weighted aggregation), ranked by the learner's
    exact (pair_count DESC, a, b) argmax order. Every BPE round runs
    THIS query; only the driver-side merge loop on top of it is
    non-SQL (and stays gated by the exact pure-Python model test,
    tests/test_bpe.py). Top-20 by the argmax order — the window ranks a
    ≤ |alphabet|² pair table, bounded by construction."""
    from pyspark.sql import Window

    from vectorsearch_spark.operators.bpe import _pair_counts, _word_vocab

    docs = _t(spark, sf_dir, "documents")
    pc = _pair_counts(_word_vocab(docs, "doc_id", "text"))
    w = Window.orderBy(F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc())
    return (
        pc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("a", "b", "pair_count", F.col("rank").cast("long").alias("rank"))
    )


BPE_PAIR_COUNTS_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]')) AS w
  FROM documents),
words AS (
  SELECT w, count(*)::BIGINT AS cnt FROM toks
  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
ch AS (SELECT cnt, regexp_extract_all(w, '.') AS cs FROM words WHERE len(w) >= 2),
g AS (SELECT cnt, cs, unnest(range(1, len(cs))) AS i FROM ch),
agg AS (
  SELECT cs[i] AS a, cs[i+1] AS b, sum(cnt)::BIGINT AS pair_count
  FROM g GROUP BY 1, 2)
SELECT a, b, pair_count,
       row_number() OVER (ORDER BY pair_count DESC, a, b)::BIGINT AS rank
FROM agg ORDER BY pair_count DESC, a, b LIMIT 20
"""


def knn_range_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact radius search (operators/knn.py range_join): all vectors
    within L2 1.2 of each of the 8 batch queries — the threshold
    retrieval mode the reference's top-k API lacks (distance-threshold
    dedup and ε-candidate generation both want it). Zero-shuffle plan:
    each Arrow batch GEMMs against the broadcast queries and emits its
    local matches — no exchange, no window, output = the true result
    size."""
    from vectorsearch_spark.operators.knn import range_join

    emb = _t(spark, sf_dir, "embeddings")
    res = range_join(
        emb, _emb_queries(spark, sf_dir), radius=1.2, metric=Metric.L2,
        id_col="vec_id",
    )
    return res.select(
        "query_id", "id", F.round("distance", 4).alias("distance")
    )


KNN_RANGE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS id, {_duck_l2("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q)
SELECT query_id, id, round(d, 4) AS distance
FROM pairs WHERE d <= 1.2
"""


def knn_range_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-accelerated EXACT radius search (operators/similarity.py
    ivf_range_join): triangle-inequality cell pruning — skip any cell
    with d(q, centroid) > ε + R_cell — makes the probed-cells scan
    return byte-identical results to the brute pass, so this entry
    shares knn_range_batch's EXACT oracle (the accelerated twin of an
    exact operator, not a degenerate config of an approximate one)."""
    from vectorsearch_spark.operators.similarity import ivf_range_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ivf_range_join(
        emb, _emb_queries(spark, sf_dir), radius=1.2, n_centroids=16,
        id_col="vec_id",
    )
    return res.select(
        "query_id", "id", F.round("distance", 4).alias("distance")
    )


def knn_range_ivf_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED-query-side exact radius search (r10 — the ε-dedup
    shape, operators/similarity.py ivf_range_join
    query_mode="distributed"): the query table is routed by a codegen
    per-query cell filter (an array of (d², threshold, bucket) structs
    over the inlined centroids, filtered and exploded — zero collects,
    zero driver GEMM), then bucket-join-scored. The per-cell prune
    threshold carries fp slack, so the result set is byte-identical to
    the driver route and to brute force — this entry shares
    knn_range_batch's EXACT oracle, certifying the unbounded-Q path."""
    from vectorsearch_spark.operators.similarity import ivf_range_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ivf_range_join(
        emb, _emb_queries(spark, sf_dir), radius=1.2, n_centroids=16,
        id_col="vec_id", query_mode="distributed",
    )
    return res.select(
        "query_id", "id", F.round("distance", 4).alias("distance")
    )


def knn_range_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COSINE radius search (operators/knn.py range_join,
    metric=cosine): all vectors with cosine distance ≤ 0.8 of each
    batch query — the semantic-near-dup threshold mode (SemDeDup-style
    ε-candidate generation wants cosine, not L2). Same zero-shuffle
    scan-and-emit plan as the L2 entry."""
    from vectorsearch_spark.operators.knn import range_join

    emb = _t(spark, sf_dir, "embeddings")
    res = range_join(
        emb, _emb_queries(spark, sf_dir), radius=0.8, metric=Metric.COSINE,
        id_col="vec_id",
    )
    return res.select(
        "query_id", "id", F.round("distance", 4).alias("distance")
    )


def knn_range_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-accelerated EXACT cosine radius search (r10 —
    operators/similarity.py ivf_range_join metric=cosine): the
    unit-norm reduction ‖v̂−q̂‖² = 2·(1−cos) turns a cosine radius r
    into an L2 radius √(2r) on the unit sphere, where the triangle
    inequality holds — cells, member radii, and routing all live in the
    normalized geometry while candidates are re-scored with the plain
    cosine formula on the ORIGINAL vectors. Shares knn_range_cosine's
    EXACT oracle (another accelerated twin)."""
    from vectorsearch_spark.operators.similarity import ivf_range_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ivf_range_join(
        emb, _emb_queries(spark, sf_dir), radius=0.8, n_centroids=16,
        metric=Metric.COSINE, id_col="vec_id",
    )
    return res.select(
        "query_id", "id", F.round("distance", 4).alias("distance")
    )


KNN_RANGE_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS id, {_duck_cosine_dist("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q)
SELECT query_id, id, round(d, 4) AS distance
FROM pairs WHERE d <= 0.8
"""


def knn_filtered_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (an extension — the reference's
    SearchParams has traversal knobs only, api/SearchParams.java:18-29):
    the label predicate applies BEFORE the distance pass, so it reaches
    the parquet scan as a pushed filter and the KNN computes over the
    reduced candidate set — filter-then-search, never search-then-drop
    (post-filtering top-k can return < k survivors and wastes distance
    work at 100 TB)."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("label").isin(0, 2))
    res = knn_join(
        emb, _emb_queries(spark, sf_dir), k=_KNN_K, metric=Metric.L2, id_col="vec_id"
    )
    return res.select(
        "query_id",
        "id",
        F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


KNN_FILTERED_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS id, {_duck_l2("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q
  WHERE e.label IN (0, 2)),
ranked AS (
  SELECT query_id, id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, id ASC) AS rank
  FROM pairs)
SELECT query_id, id, round(d, 4) AS distance, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_KNN_K}
"""


def knn_cosine_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_batch(spark, sf_dir, Metric.COSINE)


def _knn_sql(metric: Metric) -> str:
    dist = (
        _duck_l2("e.embedding", "q.qe")
        if metric == Metric.L2
        else _duck_cosine_dist("e.embedding", "q.qe")
    )
    score = "-round(d, 4)" if metric == Metric.L2 else "(1.0 - round(d, 4))"
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS id, {dist} AS d
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, id ASC) AS rank
  FROM pairs)
SELECT query_id, id, round(d, 4) AS distance, {score} AS score, rank
FROM ranked WHERE rank <= {_KNN_K}
"""


def knn_topk_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query global top-k → TakeOrderedAndProject plan (T2+T4)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    res = brute_force_topk(emb, list(qvec), k=5, metric=Metric.L2, id_col="vec_id")
    return res.select("id", F.round("distance", 4).alias("distance"))


KNN_SINGLE_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS id, round({_duck_l2("e.embedding", "q.qe")}, 4) AS distance
FROM embeddings e CROSS JOIN q
ORDER BY {_duck_l2("e.embedding", "q.qe")} ASC, e.vec_id ASC
LIMIT 5
"""


# Fixed query string for the full-text / hybrid retrieval queries —
# terms drawn from the synthetic corpus vocabulary so BM25 produces a
# meaningful ranking at every SF.
_BM25_QUERY = "spark query join window vector"


def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 over documents: one-pass fold term counting,
    1-row broadcast corpus stats, codegen scoring, TakeOrdered top-k
    (operators/textsearch.py)."""
    from vectorsearch_spark.operators.textsearch import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_QUERY, k=20)


def _bm25_sql(k: int) -> str:
    from vectorsearch_spark.operators.textsearch import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_QUERY, k=k)


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 (text) + exact-cosine top-50
    (vector) fused with reciprocal-rank fusion, k_rrf = 60 — the
    standard lexical+dense ensemble over the aligned doc_id/vec_id
    corpus.  Both candidate lists are tiny, so ranking windows are
    single-task on ≤50 rows and the fusion full-outer join is
    broadcast-size by construction."""
    from pyspark.sql import Window

    from vectorsearch_spark.config import Metric as _M
    from vectorsearch_spark.functions.distances import distance_for_metric
    from vectorsearch_spark.operators.textsearch import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    text_ranked = bm25_topk(docs, _BM25_QUERY, k=50).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .alias("text_rank"),
    )

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qe"))
    vec_ranked = (
        emb.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            distance_for_metric("embedding", "__qe", _M.COSINE).alias("__d"),
        )
        .orderBy(F.col("__d").asc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("__d").asc(), F.col("doc_id").asc()))
            .alias("vec_rank"),
        )
    )
    return rrf_fuse(text_ranked, vec_ranked, k=10)


def _hybrid_sql() -> str:
    bm25_50 = _bm25_sql(50)
    cos = _duck_cosine_dist("e.embedding", "q.qe")
    return f"""
WITH ttop AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS text_rank
  FROM ({bm25_50}) b),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vd AS (
  SELECT e.vec_id AS doc_id, {cos} AS d
  FROM embeddings e CROSS JOIN q),
vtop AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY d ASC, doc_id ASC) AS vec_rank
  FROM (SELECT * FROM vd ORDER BY d ASC, doc_id ASC LIMIT 50) v)
SELECT CAST(COALESCE(t.doc_id, v.doc_id) AS BIGINT) AS doc_id,
       round(COALESCE(1.0 / (60.0 + text_rank), 0.0)
             + COALESCE(1.0 / (60.0 + vec_rank), 0.0), 6) AS rrf_score,
       CAST(text_rank AS BIGINT) AS text_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank
FROM ttop t FULL JOIN vtop v ON t.doc_id = v.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT 10
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, columnar: posexplode flattens
    vectors to (label, dim, component) so the average is an ordinary
    map-side-combinable groupBy over (label × dim) keys — at 100 TB the
    shuffle carries one partial sum per (label, dim), never whole
    vectors, and no collect_list materializes a label's vectors in one
    task.  Output stays long-form (label, dim, centroid) — the
    hash-stable shape; reassembling arrays is a presentation concern.
    ``round(avg) + 0.0`` normalizes −0.0 (DuckDB's round preserves the
    sign of a tiny negative mean; Spark's does not — the knn −0.0
    lesson, functions/distances.py:95)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "__x"))
        .groupBy(
            F.col("label").cast("long").alias("label"),
            F.col("dim").cast("long").alias("dim"),
        )
        .agg((F.round(F.avg("__x"), 4) + 0.0).alias("centroid"))
        .orderBy("label", "dim")
    )


LABEL_CENTROIDS_SQL = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(u.i - 1 AS BIGINT) AS dim,
       round(avg(CAST(embedding[u.i] AS DOUBLE)), 4) + 0.0 AS centroid
FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-25 tokens by document frequency with
    smoothed idf.  Distinct tokens per doc explode into a
    map-side-combinable (token → df) aggregate; N broadcasts back from
    a 1-row count.  The explode carries DISTINCT tokens only (array_
    distinct before the generate), bounding fan-out by vocabulary-per-
    doc, not document length."""
    from vectorsearch_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            "df",
            F.round(F.log(F.col("__n") / (1.0 + F.col("df"))), 4).alias("idf"),
        )
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(25)
    )


def orders_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule validation (operators/profile.py
    validate_rules — the deequ/dbt-test shape): four rules over orders
    including a referential check against customer (left join rides
    the same single full-scan aggregate; a missing dim row is a
    violation). One job, one row per rule."""
    from vectorsearch_spark.operators.profile import validate_rules

    od = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("__ck"), F.lit(True).alias("__cust_ok")
    )
    joined = od.join(
        F.broadcast(cust), od["o_custkey"] == cust["__ck"], "left"
    )
    return validate_rules(
        joined,
        {
            "total_positive": F.col("o_totalprice") > 0,
            "date_present": F.col("o_orderdate").isNotNull(),
            "priority_known": F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
            "customer_exists": F.col("__cust_ok").isNotNull(),
        },
    )


ORDERS_VALIDATION_SQL = """
WITH j AS (
  SELECT o.*, c.c_custkey AS ck FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
agg AS (
  SELECT count(*) AS n_rows,
         count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 END) AS v_total,
         count(CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE) THEN 1 END) AS v_date,
         count(CASE WHEN NOT coalesce(o_orderpriority IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE) THEN 1 END) AS v_prio,
         count(CASE WHEN ck IS NULL THEN 1 END) AS v_cust
  FROM j)
SELECT r.rule, a.n_rows, r.n_violations,
       round((a.n_rows - r.n_violations) / CAST(a.n_rows AS DOUBLE), 6) AS pass_rate
FROM agg a, LATERAL (VALUES
  ('total_positive', a.v_total),
  ('date_present', a.v_date),
  ('priority_known', a.v_prio),
  ('customer_exists', a.v_cust)) AS r(rule, n_violations)
"""


_PSI_LO, _PSI_HI, _PSI_BINS = 900.0, 105000.0, 10


def lineitem_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (operators/profile.py psi_drift)
    between the pre-1998 and post-1998 shipment populations of
    l_extendedprice — the training-data drift monitor. Fixed [lo, hi)
    bounds with equal-width bins keep the binning a pure per-row
    function both engines compute identically; per-bin PSI terms out,
    sum(psi_term) is the index."""
    from vectorsearch_spark.operators.profile import psi_drift

    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_shipdate") < F.lit("1998-01-01"))
    b = li.where(F.col("l_shipdate") >= F.lit("1998-01-01"))
    return psi_drift(a, b, "l_extendedprice", _PSI_LO, _PSI_HI, _PSI_BINS)


LINEITEM_PSI_SQL = f"""
WITH binned AS (
  SELECT CASE WHEN l_shipdate < DATE '1998-01-01' THEN 'a' ELSE 'b' END AS side,
         least(greatest(CAST(floor((l_extendedprice - {_PSI_LO}) / ({_PSI_HI} - {_PSI_LO}) * {_PSI_BINS}) AS BIGINT), 0), {_PSI_BINS - 1}) AS bin
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
counts AS (
  SELECT s.bin,
         count(CASE WHEN side = 'a' THEN 1 END) AS n_a,
         count(CASE WHEN side = 'b' THEN 1 END) AS n_b
  FROM (SELECT unnest(range(0, {_PSI_BINS})) AS bin) s
  LEFT JOIN binned USING (bin) GROUP BY 1),
tot AS (SELECT sum(n_a)::DOUBLE AS ta, sum(n_b)::DOUBLE AS tb FROM counts),
p AS (
  SELECT bin, n_a, n_b,
         n_a / ta + 1e-6 AS pa, n_b / tb + 1e-6 AS pb
  FROM counts, tot)
SELECT bin, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       round(pa, 6) AS p_a, round(pb, 6) AS p_b,
       round((pa - pb) * ln(pa / pb), 6) AS psi_term
FROM p ORDER BY bin
"""


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection for curation: per-label
    centroids (the label_centroids partial-sum shape — the shuffle
    carries (label, dim) sums, never vectors), broadcast back as
    arrays, exact L2 distance to own-label centroid in codegen, keep
    rows beyond mean + 2σ of their label's distance distribution (two
    narrow aggregate passes over the distance column, no sort). The
    embedding-quality gate before training — mislabeled / degenerate
    vectors surface here."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "__x"))
        .groupBy("label", "dim")
        .agg(F.avg("__x").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("__s"))
        .select("label", F.transform("__s", lambda s: s["c"]).alias("__cent"))
    )
    d = (
        emb.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "embedding", "__cent", lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("dist"),
        )
        .localCheckpoint(eager=False)
    )
    stats = d.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_pop("dist").alias("sd")
    )
    # gate on ROUNDED quantities: centroid/mean/stddev each sum in
    # nondeterministic order in Spark vs DuckDB, so a row at the raw
    # threshold within float noise could appear in one engine only —
    # a 6-decimal-rounded predicate (mirrored in the oracle SQL) is
    # ulp-stable
    return (
        d.join(F.broadcast(stats), "label")
        .where(F.round("dist", 6) > F.round(F.col("mu") + 2 * F.col("sd"), 6))
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.round("dist", 6).alias("dist"),
            F.round(F.col("mu") + 2 * F.col("sd"), 6).alias("threshold"),
        )
    )


EMBEDDING_OUTLIERS_SQL = """
WITH flat AS (
  SELECT label, u.dim, u.x FROM embeddings,
  LATERAL (SELECT unnest(range(0, len(embedding))) AS dim,
                  unnest(embedding)::DOUBLE AS x) u),
cent AS (
  SELECT label, dim, avg(x) AS c FROM flat GROUP BY 1, 2),
d AS (
  SELECT e.vec_id, e.label,
         sqrt(sum((e.embedding[CAST(c.dim AS BIGINT) + 1]::DOUBLE - c.c) ^ 2)) AS dist
  FROM embeddings e JOIN cent c USING (label)
  GROUP BY 1, 2),
st AS (
  SELECT label, avg(dist) AS mu, stddev_pop(dist) AS sd FROM d GROUP BY 1)
SELECT d.vec_id, CAST(d.label AS BIGINT) AS label,
       round(d.dist, 6) AS dist, round(st.mu + 2 * st.sd, 6) AS threshold
FROM d JOIN st USING (label)
WHERE round(d.dist, 6) > round(st.mu + 2 * st.sd, 6)
"""


def doc_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signal: distinct-bigram ratio per
    document (distinct word bigrams / total bigrams — low means
    templated/repetitive text; the cheap cousin of doc_repetition's
    top-gram share). Tokenize-once barrier (the curate.py:57 pattern):
    the token array materializes below a repartition and crosses the
    exchange as DATA — the r5 inline form put ``element_at(tokens, …)``
    INSIDE the transform lambda, and Catalyst re-ran the tokenizer
    regex once per array ELEMENT (O(tokens²) per doc, 17.96 s at
    sf0.1). Bigrams are ``zip_with`` of two ``slice``s of the
    materialized column (pure codegen array ops, no lambda indexing),
    distinct counted with array_distinct — per-row arrays only, no
    explode shuffle at all. 17.96 s → sub-second at sf0.1."""
    from vectorsearch_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("__toks")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    t = F.col("__toks")
    bi = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws("\x01", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc_id",
        F.size(bi).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bi)).cast("long").alias("n_distinct"),
        F.round(
            F.when(F.size(bi) > 0, F.size(F.array_distinct(bi)) / F.size(bi)).otherwise(
                F.lit(None)
            ),
            6,
        ).alias("diversity"),
    )


DOC_NGRAM_DIVERSITY_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS t
  FROM documents),
bi AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)),
                                  i -> t[i] || chr(1) || t[i + 1])
              ELSE [] END AS b
  FROM tok)
SELECT doc_id,
       len(b)::BIGINT AS n_bigrams,
       len(list_distinct(b))::BIGINT AS n_distinct,
       CASE WHEN len(b) > 0
            THEN round(len(list_distinct(b)) / CAST(len(b) AS DOUBLE), 6) END AS diversity
FROM bi
"""


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF vectors, top-3 weighted terms each — the
    classic sparse document representation (retrieval features, topic
    drift monitoring, cheap clustering input). One tokenize pass feeds
    BOTH the per-(doc, token) tf aggregate and (via a distinct-token
    re-aggregate of the same grouped result — no second scan) the df
    table; N broadcasts from a 1-row count, idf joins back on token
    (broadcast-sized: vocabulary), l2 normalization is a per-doc window
    sum, and the top-3 rank runs over the (doc, token) AGGREGATE, never
    raw occurrences. Weight = tf · (ln(N/(1+df)) + 1), l2-normalized;
    ties break token-ascending."""
    from vectorsearch_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    df_tbl = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n))
        .select("token", (F.log(F.col("__n") / (1.0 + F.col("df"))) + 1.0).alias("idf"))
    )
    from pyspark.sql import Window

    w = tf.join(df_tbl, "token").select(
        "doc_id", "token", (F.col("tf") * F.col("idf")).alias("w")
    )
    norm = Window.partitionBy("doc_id")
    rank = Window.partitionBy("doc_id").orderBy(F.col("wn").desc(), F.col("token").asc())
    return (
        w.withColumn("wn", F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(norm)))
        .withColumn("rnk", F.row_number().over(rank))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("rnk").cast("long").alias("rnk"),
            "token",
            F.round("wn", 6).alias("weight"),
        )
    )


DOC_TFIDF_SQL = r"""
WITH tf AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS token
  FROM documents),
tfa AS (
  SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY 1, 2),
dfa AS (
  SELECT token, count(*) AS df FROM tfa GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
w AS (
  SELECT t.doc_id, t.token, t.tf * (ln(n.n / (1.0 + d.df)) + 1.0) AS w
  FROM tfa t JOIN dfa d USING (token), n),
wn AS (
  SELECT doc_id, token,
         w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)) AS wn
  FROM w)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, round(wn, 6) AS weight
FROM (SELECT doc_id, token, wn,
             row_number() OVER (PARTITION BY doc_id ORDER BY wn DESC, token ASC) AS rnk
      FROM wn)
WHERE rnk <= 3
"""


CORPUS_VOCAB_SQL = r"""
WITH tok AS (
  SELECT unnest(list_distinct(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS token
  FROM documents),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT token, count(*) AS df,
       round(ln(n / (1.0 + count(*))), 4) AS idf
FROM tok, n
GROUP BY token, n
ORDER BY df DESC, token ASC
LIMIT 25
"""


def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters: top-5 tokens by occurrence count
    within each document language — count-then-rank (the window runs
    over the (lang, token) AGGREGATE, cardinality |langs|×|vocab|, not
    over raw token occurrences; ranking raw rows is the scale trap).
    Length filter keeps word tokens (drops punctuation hitters)."""
    from vectorsearch_spark.functions.text import tokens
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .where(F.length("token") > 1)
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


TOP_TOKENS_SQL = r"""
WITH tok AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS token
  FROM documents),
counts AS (
  SELECT lang, token, count(*) AS n FROM tok
  WHERE length(token) > 1 GROUP BY 1, 2)
SELECT lang, token, n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS BIGINT) AS rk
FROM counts
QUALIFY rk <= 5
ORDER BY lang, rk
"""


def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function parity check: norm / dot / dimension (C3, C4, F3)."""
    from vectorsearch_spark.functions.distances import dot, norm

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(norm("embedding"), 4).alias("l2_norm"),
        F.round(dot("embedding", "embedding"), 4).alias("self_dot"),
    )


VECTOR_NORMS_SQL = f"""
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt({_duck_dot("embedding", "embedding")}), 4) AS l2_norm,
       round({_duck_dot("embedding", "embedding")}, 4) AS self_dot
FROM embeddings
"""


def embedding_pack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 FloatPacker round-trip as a layout pass (functions/
    floatpack.py): embeddings → packed LE-float32 binary → unpacked →
    the vector_norms projection. Hash-equality against the DIRECT
    norms oracle proves the codec is bit-exact end-to-end through a
    real plan (pack and unpack both execute — Catalyst cannot elide
    opaque pandas_udfs)."""
    from vectorsearch_spark.functions.distances import dot
    from vectorsearch_spark.functions.floatpack import pack_floats, unpack_floats

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", pack_floats("embedding").alias("packed")
    )
    back = emb.select("vec_id", unpack_floats("packed").alias("embedding"))
    return back.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(dot("embedding", "embedding")), 4).alias("l2_norm"),
        F.round(dot("embedding", "embedding"), 4).alias("self_dot"),
    )


def segment_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest math (S6): strict-cap segment rotation as deterministic
    partition assignment — seg_id = floor(gid / max_segment_size), last
    segment ACTIVE, full segments PENDING (fdb/FdbVectorStore.java:455-539).
    """
    cap = 200
    emb = _t(spark, sf_dir, "embeddings")
    seg = (
        emb.select((F.col("vec_id") / cap).cast("long").alias("seg_id"))
        .groupBy("seg_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )
    max_seg = seg.agg(F.max("seg_id")).collect()[0][0]
    return seg.withColumn(
        "state",
        F.when(F.col("seg_id") == max_seg, F.lit("ACTIVE")).otherwise(F.lit("PENDING")),
    ).select("seg_id", "n_vectors", "state")


SEGMENT_ASSIGNMENT_SQL = """
WITH seg AS (
  SELECT CAST(floor(vec_id / 200) AS BIGINT) AS seg_id, count(*) AS n_vectors
  FROM embeddings GROUP BY 1)
SELECT seg_id, n_vectors,
       CASE WHEN seg_id = (SELECT max(seg_id) FROM seg) THEN 'ACTIVE' ELSE 'PENDING' END AS state
FROM seg
"""


# ---------------------------------------------------------------------------
# Index-lifecycle queries: end-to-end ingest → build → search through the
# segmented index (SURVEY §3), driven from the driver's (spark, sf_dir)
# contract. The index is materialized once per (process, sf_dir) under /tmp.
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, object] = {}


def _ensure_index(spark: SparkSession, sf_dir: str, use_opq: bool = False):
    import shutil

    from vectorsearch_spark.config import IndexConfig
    from vectorsearch_spark.index import VectorIndex

    tag = sf_dir.strip("/").replace("/", "_")
    prefix = "vsidx_opq" if use_opq else "vsidx"
    path = f"/tmp/{prefix}_{tag}"
    if path in _INDEX_CACHE:
        return _INDEX_CACHE[path]
    emb = _t(spark, sf_dir, "embeddings")
    # one job for both facts (count + dim) instead of count() + first()
    stats = emb.agg(
        F.count(F.lit(1)).alias("n"), F.first(F.size("embedding")).alias("dim")
    ).first()
    n, dim = stats["n"], stats["dim"]
    extra = {"use_opq": True, "opq_iters": 4} if use_opq else {}
    cfg = IndexConfig(
        name=f"wk{'opq' if use_opq else ''}_{tag}", dimension=dim,
        max_segment_size=200, pq_m=8, pq_k=16, graph_degree=16,
        graph_build_breadth=32, graph_alpha=1.2, oversample=4, seed=42,
        **extra,
    )
    idx = None
    try:  # reuse a previously built index if it matches this dataset
        idx = VectorIndex.open(spark, path, cfg)
        if idx.next_gid != n:
            idx = None
    except Exception:
        idx = None
    if idx is None:
        shutil.rmtree(path, ignore_errors=True)
        idx = VectorIndex.create(spark, path, cfg)
        idx.add(emb.select("vec_id", "embedding"), order_col="vec_id")
        idx.build()
    _INDEX_CACHE[path] = idx
    return idx


def _ensure_opq_index(spark: SparkSession, sf_dir: str):
    """OPQ-enabled twin of ``_ensure_index`` (use_opq=True): per-segment
    learned rotations stored with the codebooks, queries rotated at LUT
    build — the extension path exercised end-to-end by the
    index_search_opq* entries."""
    return _ensure_index(spark, sf_dir, use_opq=True)


def index_search_opq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-exact twin on the OPQ-enabled index: ef ≥ segment
    size makes the rotated-LUT candidate pool the whole segment, so
    the exact re-rank restores brute-force results — the whole OPQ
    path (rotation storage, rotated LUT, re-rank) is hash-checked
    against the same brute oracle."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_opq_index(spark, sf_dir)
    cap = idx.config.max_segment_size
    res = idx.search(
        _emb_queries(spark, sf_dir), k=_KNN_K, params=SearchParams(ef=cap)
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default-ef PQ-mode search on the OPQ-enabled index (approximate
    — rows-only; recall gated in tests/test_index_lifecycle.py)."""
    idx = _ensure_opq_index(spark, sf_dir)
    res = idx.search(_emb_queries(spark, sf_dir), k=_KNN_K)
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact search through the segmented index (ingest with gid=vec_id,
    state dispatch, tombstone filter, global merge) — SQL-checkable
    because mode=BRUTE is exact."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search(_emb_queries(spark, sf_dir), k=_KNN_K, params=SearchParams(mode="BRUTE"))
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


INDEX_SEARCH_BRUTE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS gid, {_duck_l2("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, gid, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, gid ASC) AS rank
  FROM pairs)
SELECT query_id, gid, round(d, 4) AS distance, rank
FROM ranked WHERE rank <= {_KNN_K}
"""


def index_search_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed query-side search (index/search.py search_join): the
    query batch stays a DataFrame end-to-end — broadcast-joined into
    the vectors scan, per-partition streaming top-k reduce, shared
    global merge. Exhaustive-exact, so the brute-force oracle applies
    unchanged."""
    idx = _ensure_index(spark, sf_dir)
    res = idx.search_join(_emb_queries(spark, sf_dir), k=_KNN_K)
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_join_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PQ search with a DataFrame query side: the bucketed
    cogroup codes scan (queries replicated by explode, LUTs from the
    codebook broadcast) → exact re-rank. ef = segment cap makes the
    candidate pool exhaustive, so the whole distributed path is
    hash-checked against the brute oracle (same degenerate-exact-twin
    pattern as index_search_sealed_exhaustive); default-ef recall is
    gated in tests/test_index_lifecycle.py."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search_join(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(mode="PQ", ef=idx.config.max_segment_size),
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_join_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GRAPH (best-first) search with a DataFrame query
    side: one kind-split artifacts scan cogroups codes+adjacency with
    the replicated queries, the ef-search loop runs in-task per
    (query, segment). pivots ≥ segment size seeds every node, so the
    traversal degenerates to the exact full ranking and the whole
    distributed path hash-checks against the brute oracle; default-
    pivot recall is gated in tests/test_index_lifecycle.py."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search_join(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(
            mode="GRAPH", ef=idx.config.max_segment_size, pivots=10**6
        ),
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_join_graph_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GRAPH search at DEFAULT ef/beam/pivots over the
    10-sealed-segment sf index — the non-degenerate best-first cogroup
    (real beam pruning, PQ-seeded entry points). Approximate → rows-
    only driver check; recall ≥ 0.9 at 8 segments is gated in
    tests/test_index_lifecycle.py::
    test_search_join_graph_default_ef_recall_8_segments."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search_join(
        _emb_queries(spark, sf_dir), k=_KNN_K, params=SearchParams(mode="GRAPH")
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_join_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deprecated BEAM traversal (G4 — fdb/FdbVectorIndex.java
    diskannExpand:841-903, WARN-once parity at 369-372), served so a
    migrating user's mode=BEAM queries keep working. pivots ≥ segment
    size + ef = cap seeds every node and the expansion short-circuits
    to the exact full ranking — hash-checked against the brute oracle;
    default-param behavior is gated in tests/test_index_lifecycle.py."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search_join(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(
            mode="BEAM", pivots=10**6, ef=idx.config.max_segment_size
        ),
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_sealed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase PQ approx → exact re-rank search (approximate: no SQL
    oracle; recall ≥ 0.9 is asserted in tests/test_index_lifecycle.py)."""
    idx = _ensure_index(spark, sf_dir)
    res = idx.search(_emb_queries(spark, sf_dir), k=_KNN_K)
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 graph-traversal search (iterative frontier–adjacency joins
    over the Vamana graph; approximate → rows-only, recall gated in
    tests/test_index_lifecycle.py::test_graph_traversal_mode_recall)."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    res = idx.search(
        _emb_queries(spark, sf_dir), k=_KNN_K, params=SearchParams(mode="GRAPH")
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_sealed_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-exact twin of ``index_search_sealed``: with ef ≥
    segment size the PQ candidate pool is the whole segment, so the
    exact re-rank sees every row and the result equals brute force —
    every operator on the sealed path (codes scan, LUT distances,
    re-rank join, per-seg cap, global merge) is hash-checked."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    cap = idx.config.max_segment_size
    res = idx.search(
        _emb_queries(spark, sf_dir), k=_KNN_K, params=SearchParams(ef=cap)
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ANN (index/search.py search filter_gids): the
    allow-list (every third gid) PRE-filters the sealed codes scan, so
    with ef ≥ segment size the result is exactly brute force over the
    filtered set — the filtered-search plumbing (allow-list semi-joins
    at scan and re-rank) is hash-checked end to end."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    allowed = emb.where(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("gid")
    )
    cap = idx.config.max_segment_size
    res = idx.search(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(ef=cap),
        filter_gids=allowed,
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


INDEX_SEARCH_FILTERED_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS gid, {_duck_l2("e.embedding", "q.qe")} AS d
  FROM embeddings e CROSS JOIN q WHERE e.vec_id % 3 = 0),
ranked AS (
  SELECT query_id, gid, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, gid ASC) AS rank
  FROM pairs)
SELECT query_id, gid, round(d, 4) AS distance, rank
FROM ranked WHERE rank <= {_KNN_K}
"""


def index_search_join_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN on the DISTRIBUTED query-side path
    (index/search.py search_join filter_gids): the allow-list
    semi-joins the PQ cogroup's codes side, so the exhaustive config
    equals brute force over the filtered set — same oracle as
    index_search_filtered."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    allowed = emb.where(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("gid")
    )
    cap = idx.config.max_segment_size
    res = idx.search_join(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(mode="PQ", ef=cap),
        filter_gids=allowed,
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def index_search_graph_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-exact twin of ``index_search_graph``: beam = ef =
    segment size seeds the traversal with EVERY node, so the best list
    is exact regardless of graph quality — the traversal joins
    (adjacency expansion, visited anti-join, best-list cap) are all
    exercised and the output is hash-checkable against brute force."""
    from vectorsearch_spark.index import SearchParams

    idx = _ensure_index(spark, sf_dir)
    cap = idx.config.max_segment_size
    res = idx.search(
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        params=SearchParams(mode="GRAPH", ef=cap, beam=cap, max_iters=1),
    )
    return res.select(
        "query_id", "gid", F.round("distance", 4).alias("distance"),
        F.col("rank").cast("long").alias("rank"),
    )


def compaction_plan_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction-planner scoring (A4) as a pure relational op over a
    derived segments table, so DuckDB can check the exact arithmetic."""
    from vectorsearch_spark.index.maintenance import score_segments

    emb = _t(spark, sf_dir, "embeddings")
    segs = emb.groupBy(F.col("label").cast("int").alias("seg_id")).agg(
        F.count(F.lit(1)).alias("count"),
        F.sum(F.when(F.col("vec_id") % 5 == 0, 1).otherwise(0)).alias("deleted_count"),
        F.min("vec_id").alias("created_at_ms"),
    )
    scored = score_segments(segs, age_weight=0.2, size_weight=0.5, frag_weight=0.3)
    return scored.select(
        F.col("seg_id").cast("long").alias("seg_id"),
        F.col("count").cast("long").alias("n_live"),
        F.col("deleted_count").cast("long").alias("n_deleted"),
        F.round("score", 6).alias("score"),
    )


COMPACTION_PLAN_SQL = """
WITH segs AS (
  SELECT CAST(label AS BIGINT) AS seg_id, count(*) AS n_live,
         CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
         min(vec_id) AS created_at
  FROM embeddings GROUP BY 1),
stats AS (
  SELECT min(created_at) AS min_age, max(created_at) AS max_age,
         min(n_live) AS min_n, max(n_live) AS max_n FROM segs)
SELECT seg_id, n_live, n_deleted,
       round(
         0.2 * (stats.max_age - segs.created_at) / greatest(stats.max_age - stats.min_age, 1)
       + 0.5 * (stats.max_n - segs.n_live) / greatest(stats.max_n - stats.min_n, 1)
       + 0.3 * (n_deleted / greatest(n_live + n_deleted, 1)), 6) AS score
FROM segs, stats
"""


# ---------------------------------------------------------------------------
# ANN similarity-search queries (operators/similarity.py). The exhaustive
# IVF config (nprobe == n_centroids) is mathematically identical to brute
# force, so it shares the exact-KNN oracle; approximate configs are
# recall-gated in tests and rows-only here.
# ---------------------------------------------------------------------------

def _ann_project(res: DataFrame, metric: Metric) -> DataFrame:
    return res.select(
        "query_id",
        "id",
        F.round("distance", 4).alias("distance"),
        (-F.round("distance", 4)).alias("score")
        if metric == Metric.L2
        else (F.lit(1.0) - F.round("distance", 4)).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF plumbing correctness: nprobe == n_centroids ⇒ exact KNN."""
    from vectorsearch_spark.operators.similarity import ann_ivf_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_ivf_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_centroids=8,
        nprobe=8,
        metric=Metric.L2,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.L2)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate IVF (nprobe 4/16) — rows-only here; recall ≥ 0.9
    gated in tests/test_similarity.py."""
    from vectorsearch_spark.operators.similarity import ann_ivf_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_ivf_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_centroids=16,
        nprobe=4,
        metric=Metric.L2,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.L2)


def ann_ivfpq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ plumbing correctness (operators/similarity.py
    ann_ivfpq_join): nprobe == n_centroids with refine=None re-ranks
    every candidate exactly, so the residual-PQ scoring path runs but
    the result is byte-identical to brute force — hash-checked against
    the same exact-KNN oracle as ann_ivf_exhaustive."""
    from vectorsearch_spark.operators.similarity import ann_ivfpq_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_ivfpq_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_centroids=8,
        nprobe=8,
        pq_m=8,
        pq_k=16,
        refine=None,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.L2)


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate IVF-PQ (nprobe 4/8, refine 4·k) — rows-only here;
    recall ≥ 0.9 gated on clustered data in tests/test_similarity.py."""
    from vectorsearch_spark.operators.similarity import ann_ivfpq_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_ivfpq_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_centroids=8,
        nprobe=4,
        pq_m=8,
        pq_k=16,
        refine=4,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.L2)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine ANN — rows-only; recall gated in tests."""
    from vectorsearch_spark.operators.similarity import ann_lsh_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_lsh_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_tables=8,
        n_bits=4,
        metric=Metric.COSINE,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.COSINE)


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al. VLDB 2007): a LOSSIER table config
    (2 tables × 6 bits) recovered by probing 3 Hamming-1 neighbor
    buckets per table — higher recall at fixed index size; rows-only
    (superset + recall-monotone gates in tests/test_similarity.py)."""
    from vectorsearch_spark.operators.similarity import ann_lsh_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_lsh_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_tables=2,
        n_bits=6,
        metric=Metric.COSINE,
        id_col="vec_id",
        multi_probe=3,
    )
    return _ann_project(res, Metric.COSINE)


def ann_lsh_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-exact twin of ``ann_lsh_topk``: one table with zero
    sign bits puts every row in a single bucket, so the band join, the
    (query, id) dedup, and the verify/top-k operators all run and the
    output equals exact cosine KNN — hash-checked against the same
    oracle as ``knn_cosine_batch``."""
    from vectorsearch_spark.operators.similarity import ann_lsh_join

    emb = _t(spark, sf_dir, "embeddings")
    res = ann_lsh_join(
        emb,
        _emb_queries(spark, sf_dir),
        k=_KNN_K,
        n_tables=1,
        n_bits=0,
        metric=Metric.COSINE,
        id_col="vec_id",
    )
    return _ann_project(res, Metric.COSINE)


# ---------------------------------------------------------------------------
# Text-analysis + dedup queries (north-star LLM-pipeline operators).
# DuckDB mirrors are exact: same token regex, same md5-hex hashing, same
# arithmetic; regexp_replace in DuckDB needs the 'g' flag to match
# Spark's replace-all.
# ---------------------------------------------------------------------------

_TOKEN_RE_SQL = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_STOP_SQL = "['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','this','that','be']"


def doc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style HTML text extraction (r10 — operators/html.py
    html_extract): wrap every document in a deterministic synthetic
    page (nav bar, heading with an entity, body paragraph, a
    mixed-prose-and-link paragraph, a comment, a link-only footer),
    then strip markup/scripts/styles/comments, segment into render
    blocks, and drop boilerplate by link density (non-ws chars inside
    <a> / all non-ws chars ≥ 0.5). The nav and footer vanish; the
    heading, the body text and the mixed paragraph survive — all three
    reconstructable in SQL from the source columns (the mm_* codec
    pattern: source-derived witnesses over a synthesized binary-ish
    input). One narrow Arrow pass, no shuffle; at 100 TB this is the
    WARC→WET stage feeding every downstream dedup/quality operator."""
    from vectorsearch_spark.operators.html import html_extract

    docs = _t(spark, sf_dir, "documents")
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>d</title><script>var x="<p>no</p>";'
                "</script><style>.x{color:red}</style></head><body>"
                '<div class="nav"><a href="/">home</a> <a href="/s">'
            ),
            F.col("source"),
            F.lit("</a></div><h1>doc "),
            F.col("doc_id").cast("string"),
            F.lit(" &amp; friends</h1><p>"),
            F.col("text"),
            F.lit('</p><p>see <a href="/n">next</a> for more about '),
            F.col("lang"),
            F.lit(
                '</p><!-- comment <p>hidden</p> -->'
                '<div class="footer"><a href="/c">contact</a></div>'
                "</body></html>"
            ),
        ).alias("html"),
    )
    out = html_extract(html, html_col="html", id_col="doc_id")
    return out.select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        "text",
        F.round("link_density", 4).alias("link_density"),
    )


DOC_HTML_EXTRACT_SQL = r"""
WITH d AS (
  SELECT doc_id, lang,
         regexp_replace(trim(text), '\s+', ' ', 'g') AS t
  FROM documents),
blocks AS (
  SELECT doc_id, 1 AS block_idx,
         'doc ' || doc_id || ' & friends' AS text, 0.0 AS link_density
  FROM d
  UNION ALL
  SELECT doc_id, 2, t, 0.0 FROM d
  UNION ALL
  SELECT doc_id, 3, 'see next for more about ' || lang,
         round(4.0 / length(replace('see next for more about ' || lang, ' ', '')), 4)
  FROM d)
SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx, text, link_density
FROM blocks
"""


def _synth_page_bytes(did: int, text: str, src: str) -> bytes:
    """The charset-by-parity synthetic page over one document row —
    THE single construction shared by ``doc_html_extract_bytes`` and
    ``warc_html_extract`` (and mirrored by their common oracle SQL):
    even doc_ids a UTF-8 page (``<meta charset>`` form) with a
    non-ASCII 'café' heading, odd doc_ids an ISO-8859-1 page
    (http-equiv form) with 'résumé' — so the WHATWG sniff front-end is
    load-bearing, not decorative."""
    if did % 2 == 0:
        page = (
            '<html><head><meta charset="utf-8"><title>t</title>'
            f"</head><body><h1>café {did}</h1><p>{text}</p>"
            '<div class="f"><a href="/">home</a></div></body></html>'
        )
        return page.encode("utf-8")
    page = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=iso-8859-1"></head>'
        f"<body><h1>résumé {did}</h1>"
        f"<p>plain {src} prose body</p>"
        '<div class="f"><a href="/c">contact</a></div>'
        "</body></html>"
    )
    return page.encode("latin-1")


def doc_html_extract_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-sniffing HTML extraction over RAW BYTES (r11 —
    operators/html.py html_extract_bytes): every document becomes a
    synthetic page ENCODED IN A DIFFERENT CHARSET by parity — even
    doc_ids a UTF-8 page (``<meta charset>`` form) whose heading
    contains a non-ASCII 'café', odd doc_ids an ISO-8859-1 page
    (http-equiv form) with 'résumé' — so the WHATWG-style sniff +
    decode front-end is what makes the entry pass: decoding the
    latin-1 pages as UTF-8 would mojibake every é into replacement
    chars and hash-fail. The ``source`` column is printable-ASCII
    sanitized IN-PLAN (one regexp both engines run identically) so the
    latin-1 encode is total by construction, not by corpus luck. One
    Arrow pass builds pages, one extracts — bytes never shuffle."""
    from vectorsearch_spark.operators.html import html_extract_bytes
    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select(
            "doc_id",
            "text",
            F.regexp_replace("source", r"[^\x20-\x7e]", "?").alias("src"),
        ),
        "doc_id",
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for did, text, src in zip(pdf["doc_id"], pdf["text"], pdf["src"]):
                payloads.append(_synth_page_bytes(int(did), text, src))
                ids.append(int(did))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    pages = docs.mapInPandas(build, "doc_id long, payload binary")
    out = html_extract_bytes(pages)
    return out.select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        "text",
        F.round("link_density", 4).alias("link_density"),
        "charset",
    )


DOC_HTML_EXTRACT_BYTES_SQL = r"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(trim(text), '\s+', ' ', 'g') AS t,
         regexp_replace(source, '[^\x20-\x7e]', '?', 'g') AS src,
         CASE WHEN doc_id % 2 = 0 THEN 'utf-8' ELSE 'iso8859-1' END AS cs
  FROM documents),
blocks AS (
  SELECT doc_id, 1 AS block_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'café ' || doc_id
              ELSE 'résumé ' || doc_id END AS text,
         cs FROM d
  UNION ALL
  SELECT doc_id, 2,
         CASE WHEN doc_id % 2 = 0 THEN t
              ELSE 'plain ' || src || ' prose body' END,
         cs FROM d)
SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx, text,
       0.0 AS link_density, cs AS charset
FROM blocks
"""


def warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container ingestion end-to-end (r13 VERDICT #5 —
    sources/warc.py): documents pack 32-files-wide into synthetic WARC
    containers — a ``warcinfo`` header record, one HTTP ``response``
    record per doc (the ``_synth_page_bytes`` charset-by-parity pages
    behind an HTTP/1.1 envelope), and a TRUNCATED trailing record per
    file (declared Content-Length runs past EOF, the partial-fetch
    shape) — then ``warc_records`` explodes the framing, the
    type/truncation filter keeps exactly the complete responses,
    doc_ids come back from WARC-Target-URI, and ``html_extract_bytes``
    sniffs + extracts. Row parity against the SAME oracle as
    doc_html_extract_bytes proves the framing is lossless AND that
    warcinfo/request noise and the truncated tail contributed nothing.
    Plan shape: one applyInPandas builds containers (per-file
    parallelism, the natural CommonCrawl unit), one mapInPandas
    explodes, one extracts — container bytes never shuffle."""
    from vectorsearch_spark.operators.html import html_extract_bytes
    from vectorsearch_spark.sources.warc import (
        build_warc,
        warc_records,
        write_warc_record,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.regexp_replace("source", r"[^\x20-\x7e]", "?").alias("src"),
        (F.col("doc_id") % 32).alias("file_id"),
    )

    def build_file(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = [
            (
                {"WARC-Type": "warcinfo",
                 "Content-Type": "application/warc-fields"},
                b"software: vectorsearch-spark-synth\r\n",
            )
        ]
        for did, text, src in zip(pdf["doc_id"], pdf["text"], pdf["src"]):
            body = _synth_page_bytes(int(did), text, src)
            recs.append(
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Target-URI": f"http://ex.com/doc/{int(did)}",
                        "Content-Type": "application/http; msgtype=response",
                    },
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + body,
                )
            )
        data = build_warc(recs)
        tail = write_warc_record(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "http://ex.invalid/cut",
                "Content-Type": "application/http; msgtype=response",
            },
            b"HTTP/1.1 200 OK\r\n\r\n" + b"Y" * 64,
        )
        data += tail[:-24]  # EOF inside the block: a truncated fetch
        return pd.DataFrame(
            {"file_id": [int(pdf["file_id"].iloc[0])], "content": [data]}
        )

    files = docs.groupBy("file_id").applyInPandas(
        build_file, "file_id long, content binary"
    )
    pages = (
        warc_records(files)
        .where(
            (F.col("warc_type") == "response")
            & ~F.col("truncated")
            & (F.col("http_status") == 200)
        )
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            "payload",
        )
    )
    out = html_extract_bytes(pages)
    return out.select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        "text",
        F.round("link_density", 4).alias("link_density"),
        "charset",
    )


# identical blocks by construction: the WARC framing must be lossless
WARC_HTML_EXTRACT_SQL = DOC_HTML_EXTRACT_BYTES_SQL


def warc_wet_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WET path (r14, post-seal): CommonCrawl's extracted-text
    sibling of WARC — ``conversion`` records whose block is the plain
    text itself, each record its OWN GZIP MEMBER
    (``build_warc(gzip_per_record=True)``, the member-per-record
    layout ``sources/warc.py`` documents), no HTTP envelope to split.
    Documents pack 32-wide; every container also carries a warcinfo
    record and a cross-type ``response`` noise record that the
    type filter must drop. ``warc_records`` explodes the members and
    conversion payloads decode straight back to text; the oracle is
    the documents table itself — round-trip losslessness through
    framing + per-member gzip IS the claim. Same per-file parallelism
    and no-shuffle plan as warc_html_extract."""
    from vectorsearch_spark.sources.warc import build_warc, warc_records

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 32).alias("file_id")
    )

    def build_file(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = [
            (
                {"WARC-Type": "warcinfo",
                 "Content-Type": "application/warc-fields"},
                b"software: vectorsearch-spark-wet-synth\r\n",
            )
        ]
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            recs.append(
                (
                    {
                        "WARC-Type": "conversion",
                        "WARC-Target-URI": f"http://ex.com/doc/{int(did)}",
                        "Content-Type": "text/plain",
                    },
                    str(text).encode("utf-8"),
                )
            )
        recs.append(  # cross-type noise the filter must drop
            (
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": "http://ex.com/noise",
                    "Content-Type": "application/http; msgtype=response",
                },
                b"HTTP/1.1 200 OK\r\n\r\n<html>noise</html>",
            )
        )
        data = build_warc(recs, gzip_per_record=True)
        return pd.DataFrame(
            {"file_id": [int(pdf["file_id"].iloc[0])], "content": [data]}
        )

    files = docs.groupBy("file_id").applyInPandas(
        build_file, "file_id long, content binary"
    )
    recs = warc_records(files).where(
        (F.col("warc_type") == "conversion") & ~F.col("truncated")
    )
    return recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"),
    )


# losslessness through WET framing + per-member gzip: output == input
WARC_WET_TEXT_SQL = "SELECT doc_id, text FROM documents"


def warc_wat_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAT path (r14, post-seal) — the third CommonCrawl container
    format: ``metadata`` records whose block is a JSON envelope
    describing the capture (the
    Envelope→Payload-Metadata→HTTP-Response-Metadata→HTML-Metadata→
    Links shape real WAT files use). Documents pack 32-wide with
    per-member gzip; each doc's metadata record carries
    ``doc_id % 4`` outlinks derived arithmetically. The chain is
    WARC framing → type filter → JSON parse (typed ``from_json``
    against the nested envelope schema, JVM-side) → ``posexplode`` of
    the links array; the oracle regenerates the links from the same
    arithmetic with an unnested range. Exercises JSON-in-WARC — the
    one payload kind warc_html_extract (HTTP/HTML) and warc_wet_text
    (plain text) do not."""
    import json as _json

    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    from vectorsearch_spark.sources.warc import build_warc, warc_records

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
        (F.col("doc_id") % 32).alias("file_id"),
    )

    def build_file(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = [
            (
                {"WARC-Type": "warcinfo",
                 "Content-Type": "application/warc-fields"},
                b"software: vectorsearch-spark-wat-synth\r\n",
            )
        ]
        for did, host in zip(pdf["doc_id"], pdf["host"]):
            did = int(did)
            env = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": f"http://{host}/p/{did}"
                    },
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Links": [
                                    {"url": f"http://{host}/l{j}"}
                                    for j in range(did % 4)
                                ]
                            }
                        }
                    },
                }
            }
            recs.append(
                (
                    {
                        "WARC-Type": "metadata",
                        "WARC-Target-URI": f"http://{host}/p/{did}",
                        "Content-Type": "application/json",
                    },
                    _json.dumps(env).encode("utf-8"),
                )
            )
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "content": [build_warc(recs, gzip_per_record=True)],
            }
        )

    files = docs.groupBy("file_id").applyInPandas(
        build_file, "file_id long, content binary"
    )
    link_schema = StructType(
        [
            StructField(
                "Envelope",
                StructType(
                    [
                        StructField(
                            "Payload-Metadata",
                            StructType(
                                [
                                    StructField(
                                        "HTTP-Response-Metadata",
                                        StructType(
                                            [
                                                StructField(
                                                    "HTML-Metadata",
                                                    StructType(
                                                        [
                                                            StructField(
                                                                "Links",
                                                                ArrayType(
                                                                    StructType(
                                                                        [
                                                                            StructField(
                                                                                "url",
                                                                                StringType(),
                                                                            )
                                                                        ]
                                                                    )
                                                                ),
                                                            )
                                                        ]
                                                    ),
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )
    meta = (
        warc_records(files)
        .where((F.col("warc_type") == "metadata") & ~F.col("truncated"))
        .select(
            F.regexp_extract("target_uri", r"/p/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.from_json(F.decode("payload", "UTF-8"), link_schema).alias(
                "env"
            ),
        )
    )
    links = F.col("env")["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["HTML-Metadata"]["Links"]
    return meta.select(
        "doc_id", F.posexplode(links).alias("link_idx", "l")
    ).select(
        "doc_id",
        F.col("link_idx").cast("long").alias("link_idx"),
        F.col("l")["url"].alias("link"),
    )


WARC_WAT_LINKS_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h
  FROM documents)
SELECT doc_id, CAST(t.j AS BIGINT) AS link_idx,
       'http://' || h || '/l' || t.j AS link
FROM d, unnest(range(doc_id % 4)) AS t(j)
"""


def pipeline_crawl_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop CLOSED (r14, post-seal): frontier expansion from
    WAT outlinks. Each doc's WAT metadata record carries its outlinks
    — even-indexed links point at (possibly dangling, possibly
    other-host) pages ``/p/<doc_id + j>``, odd-indexed ones are MESSY
    external links (``HTTP://HOST:80/l<j>?utm_source=wat&b=2&a=1``) —
    and the expansion is: parse WAT → canonicalize every outlink
    (scheme/host lowercase, default-port drop, tracking-param strip,
    query sort — `urls.canonicalize_url`, the load-bearing step for
    the odd links) → anti-join the KNOWN frontier (the sitemap pages)
    → count referrers per newly-discovered URL. Exactly what a crawler
    does between cycles; a wrong canonicalization either leaks a
    known page into "new" or splits one discovery into several, and
    either breaks the hash. Plan: per-file Arrow passes, one
    broadcast-able anti-join on url, one aggregation."""
    import json as _json

    from vectorsearch_spark.operators.urls import canonicalize_url
    from vectorsearch_spark.sources.warc import build_warc, warc_records

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
        (F.col("doc_id") % 32).alias("file_id"),
    )

    def build_file(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = []
        for did, host in zip(pdf["doc_id"], pdf["host"]):
            did = int(did)
            links = [
                {
                    "url": (
                        f"http://{host}/p/{did + j}"
                        if j % 2 == 0
                        else f"HTTP://{host.upper()}:80/l{j}"
                        "?utm_source=wat&b=2&a=1"
                    )
                }
                for j in range(did % 4)
            ]
            env = {
                "Envelope": {
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {"Links": links}
                        }
                    }
                }
            }
            recs.append(
                (
                    {
                        "WARC-Type": "metadata",
                        "WARC-Target-URI": f"http://{host}/p/{did}",
                        "Content-Type": "application/json",
                    },
                    _json.dumps(env).encode("utf-8"),
                )
            )
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "content": [build_warc(recs, gzip_per_record=True)],
            }
        )

    files = docs.groupBy("file_id").applyInPandas(
        build_file, "file_id long, content binary"
    )
    raw_links = (
        warc_records(files)
        .where(F.col("warc_type") == "metadata")
        .select(
            F.explode(
                F.from_json(
                    F.decode("payload", "UTF-8"), _WAT_LINKS_SCHEMA_DDL
                )["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
                    "HTML-Metadata"
                ]["Links"]
            ).alias("l")
        )
        .select(F.col("l")["url"].alias("link"))
    )
    known = docs.select(
        F.concat(
            F.lit("http://"), "host", F.lit("/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    cand = raw_links.select(
        canonicalize_url("link", strip_www=True).alias("url")
    )
    return (
        cand.join(known, "url", "left_anti")
        .groupBy("url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_referrers"))
    )


# the WAT envelope path, as a DDL string usable by from_json directly
_WAT_LINKS_SCHEMA_DDL = (
    "struct<Envelope: struct<`Payload-Metadata`: struct<"
    "`HTTP-Response-Metadata`: struct<`HTML-Metadata`: struct<"
    "Links: array<struct<url: string>>>>>>>"
)


PIPELINE_CRAWL_EXPAND_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h
  FROM documents),
known AS (SELECT 'http://' || h || '/p/' || doc_id AS url FROM d),
cand AS (
  SELECT CASE WHEN t.j % 2 = 0
              THEN 'http://' || h || '/p/' || (doc_id + t.j)
              ELSE 'http://' || h || '/l' || t.j || '?a=1&b=2' END AS url
  FROM d, unnest(range(doc_id % 4)) AS t(j))
SELECT url, CAST(count(*) AS BIGINT) AS n_referrers
FROM cand
WHERE url NOT IN (SELECT url FROM known)
GROUP BY url
"""


def curate_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt frontier filtering (r14 — operators/robots.py, RFC
    9309): per-host robots bodies parse into a rules table; the
    frontier evaluates longest-match decisions ENTIRELY JVM-side (the
    rules broadcast as per-host arrays; SQL LIKE + array_max over
    (plen, allow) structs inside one projection — the frontier is
    never shuffled). The synthetic corpus exercises every semantic the
    operator claims: a ``badbot`` group that must be IGNORED for this
    agent (group selection), a longer Allow overriding a Disallow
    prefix (longest-match), a ``$``-anchored wildcard rule, a rule
    that only fires on one path variant, and hosts with rules vs the
    no-rule default-allow. The oracle replays the decision table
    analytically from the same arithmetic."""
    from vectorsearch_spark.operators.robots import (
        filter_by_robots,
        robots_rules,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
        (F.col("doc_id") % 7).cast("string").alias("k7"),
        (F.col("doc_id") % 3).alias("m"),
    )
    urls = docs.select(
        "doc_id",
        F.when(
            F.col("m") == 0,
            F.concat(F.lit("http://"), "host", F.lit("/p/"), "k7", F.lit("?x=1")),
        )
        .when(
            F.col("m") == 1,
            F.concat(
                F.lit("http://"), "host", F.lit("/files/f"), "k7", F.lit(".zip")
            ),
        )
        .otherwise(F.concat(F.lit("http://"), "host", F.lit("/pub/"), "k7"))
        .alias("url"),
    )
    robots_txt = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /p/\nAllow: /p/3\n"
        "Disallow: /*.zip$\nDisallow: /pub/5$\n"
    )
    robots_df = docs.select("host").distinct().withColumn(
        "robots_txt", F.lit(robots_txt)
    )
    rules = robots_rules(robots_df, agent="crawler")
    return (
        filter_by_robots(urls, rules, keep="all")
        .select("doc_id", "url", "allowed")
        .orderBy("doc_id")
    )


CURATE_ROBOTS_FILTER_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h,
         CAST(doc_id % 7 AS VARCHAR) AS k7,
         doc_id % 3 AS m
  FROM documents)
SELECT doc_id,
       CASE m WHEN 0 THEN 'http://' || h || '/p/' || k7 || '?x=1'
              WHEN 1 THEN 'http://' || h || '/files/f' || k7 || '.zip'
              ELSE 'http://' || h || '/pub/' || k7 END AS url,
       -- the RFC 9309 decision table for the synthesized rules:
       --   /p/<k7>?x=1   : Disallow /p/ (3) vs Allow /p/3 (4) -> k7=3
       --   /files/*.zip  : Disallow /*.zip$ always matches -> false
       --   /pub/<k7>     : Disallow /pub/5$ fires only at k7=5
       CASE m WHEN 0 THEN k7 = '3'
              WHEN 1 THEN FALSE
              ELSE k7 <> '5' END AS allowed
FROM d
"""


def _synth_urlset_file(pdf):
    """Per-host synthetic ``<urlset>`` builder — THE single sitemap
    construction shared by ``frontier_sitemap_urls`` and
    ``pipeline_crawl_frontier`` (and mirrored by their oracles): one
    ``<url>`` per doc with loc/lastmod/changefreq/priority derived from
    doc_id arithmetic, plus a loc-less entry the spec says to skip."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    host = pdf["host"].iloc[0]
    freqs = ["daily", "weekly", "monthly"]
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for did in pdf["doc_id"]:
        did = int(did)
        parts.append(
            f"<url><loc>http://{host}/p/{did}</loc>"
            f"<lastmod>2024-01-{did % 28 + 1:02d}</lastmod>"
            f"<changefreq>{freqs[did % 3]}</changefreq>"
            f"<priority>0.{did % 10}</priority></url>"
        )
    parts.append("<url><priority>0.5</priority></url>")  # no loc: skipped
    parts.append("</urlset>")
    return pd.DataFrame(
        {
            "file_id": [hash(host) % (1 << 31)],
            "content": ["".join(parts).encode("utf-8")],
        }
    )


def frontier_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap frontier discovery (r14 — sources/sitemap.py): documents
    pack per-host into synthetic ``<urlset>`` XML (one ``<url>`` per
    doc with loc/lastmod/changefreq/priority, plus a loc-less entry
    that the spec says to skip), ``sitemap_urls`` explodes the files in
    one Arrow pass, and doc ids come back from the loc. The oracle
    recomputes every field from the same arithmetic — parity proves
    the XML round-trip lossless and the skip rule honored. Per-file
    parallelism (one group per host), container bytes never shuffle."""
    from vectorsearch_spark.sources.sitemap import sitemap_urls

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
    )

    files = docs.groupBy("host").applyInPandas(
        _synth_urlset_file, "file_id long, content binary"
    )
    return sitemap_urls(files).select(
        F.regexp_extract("loc", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        "loc",
        "lastmod",
        "changefreq",
        F.round("priority", 1).alias("priority"),
    )


FRONTIER_SITEMAP_URLS_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h
  FROM documents)
SELECT doc_id,
       'http://' || h || '/p/' || doc_id AS loc,
       '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
       CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
            ELSE 'monthly' END AS changefreq,
       round(CAST(doc_id % 10 AS DOUBLE) / 10, 1) AS priority
FROM d
"""


def frontier_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polite fetch scheduling (r14 — robots.politeness_schedule): the
    frontier shuffles ONCE onto its window key (host) and each host's URLs
    sequence serially with that host's crawl delay (the delays table —
    robots Crawl-delay in production — broadcasts). The oracle replays
    the schedule with a plain window row_number, proving the operator
    is exactly the declarative plan it claims. fetch_worker (the
    per-host shard pin) is exercised in tests but excluded here —
    xxhash64 has no DuckDB twin."""
    from vectorsearch_spark.operators.robots import politeness_schedule

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
        (F.col("doc_id") % 7).cast("string").alias("k7"),
    )
    urls = docs.select(
        "doc_id",
        "host",
        F.concat(
            F.lit("http://"), "host", F.lit("/p/"), "k7",
            F.lit("/d"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    delays = docs.select("host").distinct().select(
        "host",
        (F.length("host") % 3 + 1).cast("double").alias("crawl_delay_s"),
    )
    out = politeness_schedule(
        urls.drop("host"), default_delay_s=1.0, n_workers=64, delays=delays
    )
    return out.select(
        "doc_id", "url",
        F.col("fetch_seq").cast("long").alias("fetch_seq"),
        F.round("fetch_offset_s", 4).alias("fetch_offset_s"),
    )


FRONTIER_POLITENESS_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h,
         CAST(doc_id % 7 AS VARCHAR) AS k7
  FROM documents),
u AS (
  SELECT doc_id, h,
         'http://' || h || '/p/' || k7 || '/d' || doc_id AS url,
         CAST(length(h) % 3 + 1 AS DOUBLE) AS delay_s
  FROM d)
SELECT doc_id, url,
       CAST(row_number() OVER (PARTITION BY h ORDER BY url) - 1 AS BIGINT)
         AS fetch_seq,
       round((row_number() OVER (PARTITION BY h ORDER BY url) - 1) * delay_s, 4)
         AS fetch_offset_s
FROM u
"""


def pipeline_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl FRONT END composed end-to-end (r14): sitemap
    discovery → robots filtering → polite scheduling, one chained
    plan. Stage 1 packs documents per-host into ``<urlset>`` XML (the
    SAME ``_synth_urlset_file`` builder frontier_sitemap_urls oracles)
    and ``sitemap_urls`` explodes the discovered locs. Stage 2 parses
    per-host robots bodies — a ``badbot`` group that group selection
    must skip, ``Disallow: /p/`` with longest-match ``Allow: /p/1`` /
    ``/p/3`` overrides, a ``$``-anchored ``Disallow: /p/30$`` that
    outranks the Allow on exactly one URL, and a per-host
    ``Crawl-delay`` — and ``filter_by_robots`` prunes the discovered
    frontier. Stage 3 parses that SAME robots corpus for the delays
    (``parse_crawl_delay`` over one Arrow pass) and
    ``politeness_schedule`` emits the per-host-serial fetch plan. The
    chain is load-bearing: fetch_seq/offset renumber over the
    robots-surviving set, so a wrong decision ANYWHERE upstream shifts
    every downstream row. The oracle replays all three stages
    analytically. Plan shape: container bytes never shuffle (per-host
    applyInPandas), rules + delays broadcast, ONE frontier exchange
    (the scheduler's host window)."""
    from vectorsearch_spark.operators.robots import (
        filter_by_robots,
        parse_crawl_delay,
        politeness_schedule,
        robots_rules,
    )
    from vectorsearch_spark.sources.sitemap import sitemap_urls

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.lower("source"), r"[^a-z0-9]", ""),
            F.lit(".com"),
        ).alias("host"),
    )
    # stage 1: discovery — hosts learn their URLs from sitemap XML
    files = docs.groupBy("host").applyInPandas(
        _synth_urlset_file, "file_id long, content binary"
    )
    discovered = sitemap_urls(files).select("loc")

    # stage 2: per-host robots corpus; Crawl-delay varies by host
    robots_df = docs.select("host").distinct().withColumn(
        "robots_txt",
        F.concat(
            F.lit(
                "User-agent: badbot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /p/\nAllow: /p/1\nAllow: /p/3\n"
                "Disallow: /p/30$\nCrawl-delay: "
            ),
            (F.length("host") % 3 + 1).cast("string"),
            F.lit("\n"),
        ),
    )
    rules = robots_rules(robots_df, agent="crawler")
    allowed = filter_by_robots(discovered, rules, url_col="loc", keep="allowed")

    # stage 3: delays parsed from the SAME robots bodies, then schedule
    def delays_map(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "crawl_delay_s": [
                        parse_crawl_delay(str(c), "crawler")
                        for c in pdf["robots_txt"]
                    ],
                }
            )

    delays = robots_df.mapInPandas(
        delays_map, "host string, crawl_delay_s double"
    )
    sched = politeness_schedule(
        allowed, url_col="loc", default_delay_s=1.0, n_workers=64,
        delays=delays,
    )
    return sched.select(
        F.regexp_extract("loc", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("loc").alias("url"),
        F.col("fetch_seq").cast("long").alias("fetch_seq"),
        F.round("fetch_offset_s", 4).alias("fetch_offset_s"),
    )


PIPELINE_CRAWL_FRONTIER_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') || '.com' AS h
  FROM documents),
u AS (
  SELECT doc_id, h,
         'http://' || h || '/p/' || doc_id AS loc,
         CAST(doc_id AS VARCHAR) AS s,
         CAST(length(h) % 3 + 1 AS DOUBLE) AS delay_s
  FROM d),
-- the RFC 9309 decision table for the synthesized rules over /p/<id>:
--   Allow /p/1 and /p/3 (plen 4) outrank Disallow /p/ (plen 3);
--   Disallow /p/30$ (plen 6) outranks the Allow on exactly /p/30
a AS (
  SELECT * FROM u
  WHERE (s LIKE '1%' OR s LIKE '3%') AND s <> '30')
SELECT doc_id, loc AS url,
       CAST(row_number() OVER (PARTITION BY h ORDER BY loc) - 1 AS BIGINT)
         AS fetch_seq,
       round((row_number() OVER (PARTITION BY h ORDER BY loc) - 1) * delay_s,
             4) AS fetch_offset_s
FROM a
"""


import functools


@functools.lru_cache(maxsize=1)
def _raw_url_col() -> Column:
    """The messy-URL synthesis expression over (doc_id, source) — the
    SHARED builder of ``_url_corpus`` and ``pipeline_web_curation``
    (one definition, one SQL mirror). Four fetch variants by
    ``doc_id % 4`` exercising every canonicalization rule — uppercase
    scheme/host, default ports, ``www.`` prefix, tracking params,
    unsorted query, fragment, and (r12) dot-segments in the path plus
    percent escapes of unreserved ('%41' → 'A') and reserved ('%2f' →
    '%2F') characters. Variants 0 and 1 canonicalize to the SAME url
    whenever two doc_ids share (source, doc_id % 7) — variant 1's
    ``/p/x/../`` prefix collapses to variant 0's ``/p/`` — so the
    dedup entries have real duplicate mass that only the FULL RFC 3986
    §6.2.2 normalization finds."""
    k7 = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 4
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTP://WWW."), F.col("source"), F.lit(".COM:80/p/"), k7,
                F.lit("?utm_source=feed&b=2&a=1#frag"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".com/p/x/../"), k7,
                F.lit("?a=1&b=2"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".COM:443/%7Ep/./"), k7,
                F.lit("?b=2&utm_campaign=x&a=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".com:8080/p/"), k7,
                F.lit("?q=%2f&r=%41"),
            )
        )
    )


@functools.lru_cache(maxsize=1)
def _canon_raw_url() -> Column:
    """``canonicalize_url(_raw_url_col(), strip_www=True)`` built once
    per process — the canonicalization tree costs ~0.3 s of py4j
    round-trips and is a pure expression (same rationale as the
    name-keyed cache in operators/urls.py, which this Column-typed
    input misses)."""
    from vectorsearch_spark.operators.urls import canonicalize_url

    return canonicalize_url(_raw_url_col(), strip_www=True)


@functools.lru_cache(maxsize=2)
def _raw_url_host(strip_www: bool) -> Column:
    from vectorsearch_spark.operators.urls import url_host

    return url_host(_raw_url_col(), strip_www=strip_www)


# Default-parameter quality-core expression sets over the funnel's
# fixed column names, built once per process (~0.25 s of py4j tree
# building per rebuild). Shared by pipeline_web_curation and
# pipeline_c4_text; treat the returned dicts as READ-ONLY (the Column
# values are immutable, callers only iterate/alias them).
@functools.lru_cache(maxsize=1)
def _gopher_core():
    from vectorsearch_spark.operators.text import gopher_quality_exprs

    return gopher_quality_exprs(F.col("__words"), F.col("__lines"))


@functools.lru_cache(maxsize=1)
def _c4_core():
    from vectorsearch_spark.operators.text import c4_clean_exprs

    return c4_clean_exprs(F.col("text"), F.col("__lines"))


@functools.lru_cache(maxsize=1)
def _fineweb_core():
    from vectorsearch_spark.operators.text import fineweb_quality_exprs

    return fineweb_quality_exprs(F.col("__tlines"))


def _url_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy-URL corpus synthesized IN-PLAN from the
    documents table (the mm_* witness pattern) — see ``_raw_url_col``.
    Mirrored verbatim by ``_URL_CORPUS_SQL``."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", _raw_url_col().alias("raw_url"))


_URL_CORPUS_SQL = """
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'HTTP://WWW.' || source || '.COM:80/p/' || (doc_id % 7)
                       || '?utm_source=feed&b=2&a=1#frag'
           WHEN 1 THEN 'http://' || source || '.com/p/x/../' || (doc_id % 7) || '?a=1&b=2'
           WHEN 2 THEN 'https://' || source || '.COM:443/%7Ep/./' || (doc_id % 7)
                       || '?b=2&utm_campaign=x&a=1'
           ELSE 'https://' || source || '.com:8080/p/' || (doc_id % 7) || '?q=%2f&r=%41'
         END AS raw_url
  FROM documents
"""

# percent-encoding normalization (RFC 3986 §6.2.2.2) as a DuckDB
# expression template — the SAME split-on-'%' shape as
# operators/urls.py pct_normalize: each post-split element's first two
# chars are the candidate hex pair; unreserved code points decode,
# other valid escapes uppercase, invalid '%' passes through
_PCT_CODE_SQL = (
    "((strpos('0123456789abcdef', lower(substr(e, 1, 1))) - 1) * 16"
    " + strpos('0123456789abcdef', lower(substr(e, 2, 1))) - 1)"
)


def _pct_sql(x: str) -> str:
    c = _PCT_CODE_SQL
    return (
        "array_to_string(list_transform(str_split(" + x + ", '%'), (e, i) -> CASE"
        " WHEN i = 1 THEN e"
        " WHEN regexp_matches(e, '^[0-9A-Fa-f]{2}') AND (" + c + " BETWEEN 48 AND 57"
        " OR " + c + " BETWEEN 65 AND 90 OR " + c + " BETWEEN 97 AND 122"
        " OR " + c + " IN (45, 46, 95, 126))"
        " THEN chr(CAST(" + c + " AS INTEGER)) || substr(e, 3)"
        " WHEN regexp_matches(e, '^[0-9A-Fa-f]{2}')"
        " THEN '%' || upper(substr(e, 1, 2)) || substr(e, 3)"
        " ELSE '%' || e END), '')"
    )


# RFC 3986 §6 canonicalization in DuckDB SQL — the SAME regexes and
# rule order as operators/urls.py canonicalize_url (strip_www=True),
# applied to a `raw_url` column supplied by the enclosing CTE.
# Dot-segment removal (§6.2.2.3) uses a prefix-sum formulation
# equivalent to the engine's stack fold: with v = 0 for '.', -1 for
# '..', +1 otherwise, a non-dot segment at index i survives iff the
# running sum never returns below its own level afterwards
# (min(P[i:]) >= P[i]); the leading root '' always survives (excess
# '..' at the root are ignored for absolute paths), and a trailing
# '/.' or '/..' re-appends the trailing slash the RFC output has.
_URL_CANON_SQL = r"""
  SELECT doc_id, raw_url,
         scheme || '://' || rhost ||
         (CASE WHEN path2 = '' THEN '/' ELSE path2 END) ||
         (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END)
           AS url,
         host
  FROM (
    SELECT doc_id, raw_url, scheme,
           array_to_string(list_filter(segs, (s, i) -> i = 1 OR
               (s NOT IN ('.', '..') AND list_min(P[i:]) >= P[i])), '/')
             || (CASE WHEN segs[-1] IN ('.', '..') THEN '/' ELSE '' END)
             AS path2,
           CASE WHEN h0 LIKE 'www.%' THEN substr(h0, 5) ELSE h0 END AS rhost,
           CASE WHEN hp LIKE 'www.%' THEN substr(hp, 5) ELSE hp END AS host,
           list_sort(list_filter(string_split(query_n, '&'),
             p -> p <> '' AND NOT regexp_matches(p,
               '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$'))) AS kept
    FROM (
      SELECT *,
             list_transform(segs, (s, i) -> coalesce(list_sum(
               list_transform(segs[1:i], x -> CASE WHEN x = '.' THEN 0
                 WHEN x = '..' THEN -1 ELSE 1 END)), 0)) AS P
      FROM (
        SELECT *, str_split(path_n, '/') AS segs
        FROM (
          SELECT doc_id, raw_url, scheme, query_n, path_n,
                 CASE WHEN scheme = 'http'  AND auth LIKE '%:80'
                        THEN substr(auth, 1, length(auth) - 3)
                      WHEN scheme = 'https' AND auth LIKE '%:443'
                        THEN substr(auth, 1, length(auth) - 4)
                      ELSE auth END AS h0,
                 CASE WHEN auth LIKE '[%'
                        THEN regexp_extract(auth, '^(\[[^\]]*\])', 1)
                      ELSE regexp_extract(auth, '^([^:]*)', 1) END AS hp
          FROM (
            SELECT doc_id, raw_url, scheme, auth,
                   __PCT_PATH__ AS path_n,
                   __PCT_QUERY__ AS query_n
            FROM (
              SELECT doc_id, raw_url,
                     lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                     lower(regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
                     regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                     regexp_extract(raw_url, '^[^#?]*\?([^#]*)', 1) AS query
              FROM raw) p0) pn) p1) ps) pp) p2
""".replace("__PCT_PATH__", _pct_sql("path")).replace(
    "__PCT_QUERY__", _pct_sql("query")
)


def doc_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (r11 — operators/urls.py): RFC 3986 §6
    syntax normalization + tracking-param strip + query sort over a
    messy-URL corpus synthesized in-plan. ONE codegen projection — no
    UDF, no shuffle (plan-asserted in tests/test_urls.py); the oracle
    re-implements every rule in SQL with the same regexes. No
    reference analog (the reference has no web/document surface) —
    north-star LLM-pipeline tier per BASELINE.json."""
    from vectorsearch_spark.operators.urls import canonicalize_url, url_host

    raw = _url_corpus(spark, sf_dir)
    return raw.select(
        "doc_id",
        "raw_url",
        canonicalize_url("raw_url", strip_www=True).alias("url"),
        url_host("raw_url", strip_www=True).alias("host"),
    )


DOC_URL_CANONICALIZE_SQL = f"""
WITH raw AS ({_URL_CORPUS_SQL})
SELECT doc_id, raw_url, url, host FROM ({_URL_CANON_SQL}) c
"""


def dedup_url_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (r11 — operators/urls.py url_dedup):
    canonicalize, then ONE map-side-combinable min-id-keeper aggregate
    (the workload.py:2456 shape — no self-join, no window; shuffle is
    one row per distinct canonical URL). The synthesized corpus makes
    variants 0/1 of each (source, doc_id%7) cell collide, so the
    keeper/count columns carry real duplicate structure."""
    from vectorsearch_spark.operators.urls import url_dedup

    raw = _url_corpus(spark, sf_dir)
    return url_dedup(raw, id_col="doc_id", url_col="raw_url", strip_www=True)


DEDUP_URL_EXACT_SQL = f"""
WITH raw AS ({_URL_CORPUS_SQL})
SELECT url, CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
       count(*) AS n_fetches
FROM ({_URL_CANON_SQL}) c
GROUP BY url
"""


def curate_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap (r11 — operators/urls.py host_cap):
    RefinedWeb §3.1 / FineWeb per-domain contribution bound — keep the
    best ``cap`` documents per host (priority n_chars DESC, doc_id
    tiebreak). The host column is synthesized SKEWED (60 % of docs on
    one mega-host) to exercise the two-phase rank: a salted
    pre-truncate fans the mega-host across 64 tasks and keeps a
    provable superset (≤ 64·cap rows/host) before the final bounded
    row_number — no single-task mega-host window at any corpus size.
    Oracle: one plain window (correctness is order-semantics, which
    the salting provably preserves)."""
    from vectorsearch_spark.operators.urls import host_cap

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "n_chars",
        F.when(F.col("doc_id") % 10 < 6, F.lit("mega.example.com"))
        .otherwise(
            F.concat(F.lit("site"), (F.col("doc_id") % 37).cast("string"), F.lit(".org"))
        )
        .alias("host"),
    )
    out = host_cap(d, cap=8, host_col="host", id_col="doc_id", priority_col="n_chars")
    return out.select(
        "doc_id", "host", "n_chars", F.col("host_rank").cast("long").alias("host_rank")
    )


CURATE_HOST_CAP_SQL = """
WITH d AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 10 < 6 THEN 'mega.example.com'
              ELSE 'site' || (doc_id % 37) || '.org' END AS host
  FROM documents),
r AS (
  SELECT doc_id, host, n_chars,
         row_number() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id ASC)
           AS host_rank
  FROM d)
SELECT doc_id, host, n_chars, CAST(host_rank AS BIGINT) AS host_rank
FROM r WHERE host_rank <= 8
"""


def curate_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist gate (r11 — operators/urls.py
    blocklist_filter): drop fetches whose host is a blocklisted
    registered domain OR any subdomain of one — suffix semantics via a
    bounded per-label explode + a BROADCAST anti join (the corpus never
    shuffles). Hosts come from the messy-URL corpus WITHOUT www
    stripping, so the ``www.srcN.com`` variants exercise the subdomain
    match (blocking ``src3.com`` must also drop ``www.src3.com``); the
    oracle re-implements the dot-suffix expansion with SQL list ops."""
    from vectorsearch_spark.operators.urls import blocklist_filter, url_host

    raw = _url_corpus(spark, sf_dir)
    d = raw.select("doc_id", url_host("raw_url", strip_www=False).alias("host"))
    bl = spark.createDataFrame([("src3.com",), ("src7.com",)], ["domain"])
    return blocklist_filter(d, bl)


CURATE_BLOCKLIST_FILTER_SQL = f"""
WITH raw AS ({_URL_CORPUS_SQL}),
h AS (
  SELECT doc_id,
         lower(regexp_extract(regexp_extract(raw_url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^([^:]*)', 1)) AS host
  FROM raw)
SELECT doc_id, host FROM h
WHERE len(list_filter(
        list_transform(range(1, len(string_split(host, '.')) + 1),
          i -> array_to_string(
                 list_slice(string_split(host, '.'), i,
                            len(string_split(host, '.'))), '.')),
        s -> s IN ('src3.com', 'src7.com'))) = 0
"""


def doc_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (r11 — operators/text.py c4_clean; Raffel et
    al. 2020 §2.2): terminal-punctuation / ≥5-word / no-javascript line
    retention plus ≥3-sentence / no-lorem-ipsum / no-brace document
    flags, returning the cleaned text. Four in-plan decoration cohorts
    by ``doc_id % 4`` exercise every rule (clean sentences / a
    javascript line / a lorem-ipsum line / a braced code line); the
    oracle recomputes lines, retention, cleaned text, and every flag in
    SQL with the same split/regex definitions."""
    from vectorsearch_spark.operators.text import c4_clean

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                m == 0,
                F.lit(
                    ".\nA first proper sentence right here.\n"
                    "A second proper sentence right here.\n"
                    "A third proper sentence right here."
                ),
            )
            .when(
                m == 1,
                F.lit(
                    "\nEnable javascript to view this site.\n"
                    "A good sentence with enough words here.\n"
                    "Another good sentence with enough words here.\n"
                    "A third good sentence with enough words here."
                ),
            )
            .when(m == 2, F.lit("\nlorem ipsum dolor sit amet filler text."))
            .otherwise(
                F.lit(
                    "\nfunction() { return 1; }\nshort line\n"
                    "A complete sentence with enough words here."
                )
            ),
        ).alias("text"),
    )
    return c4_clean(decorated)


DOC_C4_CLEAN_SQL = """
WITH d AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN '.' || chr(10) || 'A first proper sentence right here.'
                       || chr(10) || 'A second proper sentence right here.'
                       || chr(10) || 'A third proper sentence right here.'
           WHEN 1 THEN chr(10) || 'Enable javascript to view this site.'
                       || chr(10) || 'A good sentence with enough words here.'
                       || chr(10) || 'Another good sentence with enough words here.'
                       || chr(10) || 'A third good sentence with enough words here.'
           WHEN 2 THEN chr(10) || 'lorem ipsum dolor sit amet filler text.'
           ELSE chr(10) || 'function() { return 1; }' || chr(10) || 'short line'
                || chr(10) || 'A complete sentence with enough words here.'
         END AS t
  FROM documents),
l AS (
  SELECT doc_id, t,
         list_filter(string_split(t, chr(10)), x -> trim(x) <> '') AS lines
  FROM d),
k AS (
  SELECT doc_id, t, lines,
         list_filter(lines, x ->
           regexp_matches(rtrim(x), '[.!?"]$')
           AND len(list_filter(string_split_regex(x, '[ \t\r\f\v]+'), w -> w <> '')) >= 5
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM l)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS text_clean,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       (len(kept) >= 3) AS f_min_sentences,
       (NOT contains(lower(t), 'lorem ipsum')) AS f_no_lorem,
       (NOT contains(t, '{')) AS f_no_brace,
       ((len(kept) >= 3) AND (NOT contains(lower(t), 'lorem ipsum'))
        AND (NOT contains(t, '{'))) AS keep
FROM k
"""


def stream_url_dedup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-frontier dedup fold (r11, r12 bucketed state —
    operators/urls.py fold_url_dedup_batch): the messy-URL corpus
    arrives as two epochs split by doc id; later fetches of an
    already-accepted canonical URL drop against the persisted state,
    which is the BUCKETED layout (``state_buckets=8``): one external
    table partitioned by epoch and clustered by canonical url, so each
    fold's anti-join scans state without exchanging it. Splitting by
    the raw id makes arrival order = id order, so the folded accepted
    set equals the batch ``url_dedup`` keeper set on the full corpus —
    the fold shares the batch operator's exact SQL oracle
    (batching-independence IS the correctness claim, the
    stream_line_dedup_fold pattern). Read back via ``read_accepted``
    (committed-epoch reader contract)."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.urls import (
        _frontier_table,
        fold_url_dedup_batch,
        read_accepted,
    )

    corpus = _url_corpus(spark, sf_dir).select("doc_id", F.col("raw_url").alias("url"))
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"url_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {_frontier_table(state)}")
    os.makedirs(state, exist_ok=True)
    # split on the RAW id (not a modulo) — the oracle equivalence
    # requires arrival order == id order, which a modulo would break
    # once ids exceed its base (a large-id duplicate landing in epoch 0
    # would beat a smaller-id epoch-1 copy and diverge from the min-id
    # oracle)
    mid = 250
    fold_url_dedup_batch(corpus.where(F.col("doc_id") < mid), 0, state, state_buckets=8)
    fold_url_dedup_batch(corpus.where(F.col("doc_id") >= mid), 1, state, state_buckets=8)
    return read_accepted(spark, state).select("doc_id", "url", "canonical_url")


STREAM_URL_DEDUP_FOLD_SQL = f"""
WITH raw AS ({_URL_CORPUS_SQL}),
c AS ({_URL_CANON_SQL}),
k AS (SELECT url, min(doc_id) AS m FROM c GROUP BY url)
SELECT c.doc_id, c.raw_url AS url, c.url AS canonical_url
FROM c JOIN k ON c.url = k.url AND c.doc_id = k.m
"""


def _gopher_decorated(docs: DataFrame) -> DataFrame:
    """documents decorated IN-PLAN with one of three line suffixes by
    ``doc_id % 3`` (bullets+stopwords / ellipsis endings / '#' tags) —
    the shared input of ``doc_quality_gopher`` and the quality stage of
    ``pipeline_web_curation``. Mirrored verbatim by
    ``_GOPHER_DECOR_SQL``; any extra input columns pass through."""
    m = F.col("doc_id") % 3
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                m == 0,
                F.lit(
                    "\n• first bullet\n• second bullet\nthe closing line"
                    " can have that and more to be with"
                ),
            )
            .when(m == 1, F.lit("\nto be continued…\nand then...\nthe end"))
            .otherwise(F.lit("\n# tags: #one #two #three")),
        ),
    )


def doc_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (r11 — operators/text.py gopher_quality;
    Rae et al. 2021 Appendix A1.1, the public filter set): word-count /
    mean-word-length / symbol-ratio / bullet-line / ellipsis-line /
    alpha-word / stop-word rules, each emitted as a metric + flag plus
    the composite ``keep``. The corpus word counts straddle the 50-word
    minimum naturally (10–99 at sf0.01); the line/symbol rules are
    exercised by decorating each doc IN-PLAN with one of three line
    suffixes by ``doc_id % 3`` (bullets / ellipsis endings / '#' tags).
    The oracle recomputes every metric AND flag in SQL with the same
    split/regex definitions."""
    from vectorsearch_spark.operators.text import gopher_quality

    docs = _t(spark, sf_dir, "documents")
    return gopher_quality(_gopher_decorated(docs))


# the gopher decoration as a SQL expression TEMPLATE over a text and
# an id column — parameterized with unique __TOKENS__ (never blind
# substring replacement over SQL literals, which silently corrupts the
# oracle the moment a literal happens to contain the substring)
_GOPHER_DECOR_SQL_T = """__TEXT_COL__ || CASE CAST(__ID_COL__ % 3 AS INTEGER)
           WHEN 0 THEN chr(10) || chr(8226) || ' first bullet' || chr(10)
                       || chr(8226) || ' second bullet' || chr(10)
                       || 'the closing line can have that and more to be with'
           WHEN 1 THEN chr(10) || 'to be continued' || chr(8230) || chr(10)
                       || 'and then...' || chr(10) || 'the end'
           ELSE chr(10) || '# tags: #one #two #three'
         END"""


def _gopher_decor_sql(text_col: str = "text", id_col: str = "doc_id") -> str:
    return _GOPHER_DECOR_SQL_T.replace("__TEXT_COL__", text_col).replace(
        "__ID_COL__", id_col
    )


DOC_QUALITY_GOPHER_SQL = f"""
WITH d AS (
  SELECT doc_id, {_gopher_decor_sql()} AS t
  FROM documents),
arrs AS (
  SELECT doc_id,
         list_filter(string_split_regex(t, '[ \t\n\r\f\v]+'), w -> w <> '') AS words,
         list_filter(string_split(t, chr(10)), l -> trim(l) <> '') AS lines
  FROM d),
m AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
               / greatest(len(words), 1), 4) AS mean_word_len,
         round(CAST(list_sum(list_transform(words,
                 w -> length(w) - length(replace(replace(w, '#', ''), chr(8230), ''))))
               AS DOUBLE) / greatest(len(words), 1), 4) AS symbol_ratio,
         round(CAST(len(list_filter(lines,
                 l -> regexp_matches(ltrim(l), '^[' || chr(8226) || '*-]'))) AS DOUBLE)
               / greatest(len(lines), 1), 4) AS bullet_frac,
         round(CAST(len(list_filter(lines,
                 l -> regexp_matches(rtrim(l), '(' || chr(8230) || '|\\.\\.\\.)$'))) AS DOUBLE)
               / greatest(len(lines), 1), 4) AS ellipsis_frac,
         round(CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(words), 1), 4) AS alpha_word_frac,
         CAST(len(list_intersect(
                 list_distinct(list_transform(words,
                   w -> regexp_replace(lower(w), '^[^a-z]+|[^a-z]+$', '', 'g'))),
                 ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
  FROM arrs),
f AS (
  SELECT *,
         (n_words >= 50 AND n_words <= 100000) AS f_word_count,
         (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS f_mean_word_len,
         (symbol_ratio <= 0.1) AS f_symbol_ratio,
         (bullet_frac <= 0.9) AS f_bullet,
         (ellipsis_frac <= 0.3) AS f_ellipsis,
         (alpha_word_frac >= 0.8) AS f_alpha_words,
         (stop_hits >= 2) AS f_stop_words
  FROM m)
SELECT *, (f_word_count AND f_mean_word_len AND f_symbol_ratio AND f_bullet
           AND f_ellipsis AND f_alpha_words AND f_stop_words) AS keep
FROM f
"""


def doc_quality_fineweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb custom quality filters (r11 — operators/text.py
    fineweb_quality; Penedo et al. 2024 §3.6): line-terminal-
    punctuation fraction ≥ 0.12, short-line (<30 chars) fraction
    ≤ 0.67, duplicated-line character fraction ≤ 0.10 — the three
    ablation-derived filters FineWeb applies after Gopher + C4, which
    completes the repo's public-filter-set coverage (C4 ✓ Gopher A1.1 ✓
    A1.2 ✓ FineWeb ✓). Three decoration cohorts by ``doc_id % 3``
    (unpunctuated nav stubs / a duplicated boilerplate line /
    punctuated prose); the oracle recomputes all three metrics and
    flags with the same trimmed-line definitions in SQL."""
    from vectorsearch_spark.operators.text import fineweb_quality

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(m == 0, F.lit("\nnav\nhome\nabout\nshop\nblog"))
            .when(
                m == 1,
                F.lit(
                    "\nthis exact long boilerplate line repeats itself verbatim here."
                    "\nthis exact long boilerplate line repeats itself verbatim here."
                ),
            )
            .otherwise(
                F.lit(
                    "\nThe first added sentence is long and ends with a period."
                    "\nThe second added sentence is long and asks a question?"
                )
            ),
        ).alias("text"),
    )
    return fineweb_quality(decorated)


DOC_QUALITY_FINEWEB_SQL = """
WITH d AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN chr(10) || 'nav' || chr(10) || 'home' || chr(10)
                       || 'about' || chr(10) || 'shop' || chr(10) || 'blog'
           WHEN 1 THEN chr(10) || 'this exact long boilerplate line repeats itself verbatim here.'
                       || chr(10) || 'this exact long boilerplate line repeats itself verbatim here.'
           ELSE chr(10) || 'The first added sentence is long and ends with a period.'
                || chr(10) || 'The second added sentence is long and asks a question?'
         END AS t
  FROM documents),
arrs AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(t, chr(10)),
           x -> trim(x) <> ''), x -> trim(x)) AS lines
  FROM d),
m AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         round(CAST(len(list_filter(lines,
             l -> regexp_matches(l, '[.!?"]$'))) AS DOUBLE)
           / greatest(len(lines), 1), 4) AS line_punct_frac,
         round(CAST(len(list_filter(lines, l -> length(l) < 30)) AS DOUBLE)
           / greatest(len(lines), 1), 4) AS short_line_frac,
         round(CAST(coalesce(list_sum(list_transform(list_filter(lines,
             x -> len(list_filter(lines, y -> y = x)) > 1),
             x -> length(x))), 0) AS DOUBLE)
           / greatest(CAST(coalesce(list_sum(list_transform(lines,
             x -> length(x))), 0) AS DOUBLE), 1.0), 4) AS dup_line_char_frac
  FROM arrs),
f AS (
  SELECT *,
         (line_punct_frac >= 0.12) AS f_line_punct,
         (short_line_frac <= 0.67) AS f_short_lines,
         (dup_line_char_frac <= 0.10) AS f_dup_line_chars
  FROM m)
SELECT *, (f_line_punct AND f_short_lines AND f_dup_line_chars) AS keep
FROM f
"""


def doc_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-removal rules (r11 — operators/text.py
    gopher_repetition; Rae et al. 2021 Appendix A1.2, completing the
    Gopher filter whose A1.1 half is ``doc_quality_gopher``):
    duplicate-line/paragraph fractions by occurrence AND character
    mass, top-2/3/4-gram char fractions, dup-5…10-gram char fractions,
    all 13 paper thresholds as flags plus ``keep``. Four in-plan
    decoration cohorts by ``doc_id % 4`` (duplicated lines / duplicated
    paragraphs / a ×3-repeated six-gram phrase / tab-and-CR-edged
    duplicate lines that pin the space-only trim semantics); the
    oracle recomputes every integer numerator/denominator with nested
    SQL list lambdas and applies the same rounding and thresholds."""
    from vectorsearch_spark.operators.text import gopher_repetition

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(m == 0, F.lit("\nrepeat me exactly\nrepeat me exactly"))
            .when(m == 1, F.lit("\n\nsame paragraph body\n\nsame paragraph body"))
            .when(
                m == 2,
                F.lit(" one two three four five six one two three"
                      " four five six one two three four five six"),
            )
            # cohort 3 pins the SPACE-ONLY trim semantics (r12, ADVICE
            # fix): '\t'-edged duplicate lines and a '\r'-edged line —
            # they only count as duplicates / distinct content if all
            # three engines trim 0x20 only
            .otherwise(F.lit("\n\tedge line\t\n\tedge line\t\nplain\r")),
        ).alias("text"),
    )
    return gopher_repetition(decorated)


_REP_GRAMS_SQL = """list_transform(
              range(0, greatest(len(words) - {n} + 1, 0)),
              i -> array_to_string(list_slice(words, CAST(i AS BIGINT) + 1,
                                              CAST(i AS BIGINT) + {n}), ' '))"""

DOC_REPETITION_GOPHER_SQL = (
    """
WITH d AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN chr(10) || 'repeat me exactly' || chr(10) || 'repeat me exactly'
           WHEN 1 THEN chr(10) || chr(10) || 'same paragraph body'
                       || chr(10) || chr(10) || 'same paragraph body'
           WHEN 2 THEN ' one two three four five six one two three'
                       || ' four five six one two three four five six'
           ELSE chr(10) || chr(9) || 'edge line' || chr(9)
                || chr(10) || chr(9) || 'edge line' || chr(9)
                || chr(10) || 'plain' || chr(13)
         END AS t
  FROM documents),
arrs AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(t, chr(10)),
           x -> trim(x) <> ''), x -> trim(x)) AS lines,
         list_transform(list_filter(string_split(t, chr(10) || chr(10)),
           x -> trim(x) <> ''), x -> trim(x)) AS paras,
         list_filter(string_split_regex(lower(t), '[ \t\n\r\f\v]+'),
           w -> w <> '') AS words
  FROM d),
ints AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
           x -> len(list_filter(lines, y -> y = x)) > 1)) AS BIGINT) AS dup_line_occ,
         CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS BIGINT)
           AS line_chars,
         CAST(coalesce(list_sum(list_transform(list_filter(lines,
           x -> len(list_filter(lines, y -> y = x)) > 1), x -> length(x))), 0)
           AS BIGINT) AS dup_line_chars,
         CAST(len(paras) AS BIGINT) AS n_paras,
         CAST(len(list_filter(paras,
           x -> len(list_filter(paras, y -> y = x)) > 1)) AS BIGINT) AS dup_para_occ,
         CAST(coalesce(list_sum(list_transform(paras, x -> length(x))), 0) AS BIGINT)
           AS para_chars,
         CAST(coalesce(list_sum(list_transform(list_filter(paras,
           x -> len(list_filter(paras, y -> y = x)) > 1), x -> length(x))), 0)
           AS BIGINT) AS dup_para_chars,
         CAST(length(array_to_string(words, ' ')) AS BIGINT) AS word_chars,
"""
    + ",\n".join(
        f"""         CAST(coalesce(list_max(list_transform({_REP_GRAMS_SQL.format(n=n)},
           g -> len(list_filter({_REP_GRAMS_SQL.format(n=n)}, h -> h = g)) * length(g))), 0)
           AS BIGINT) AS top{n}_prod"""
        for n in (2, 3, 4)
    )
    + ",\n"
    + ",\n".join(
        f"""         CAST(coalesce(list_sum(list_transform(list_filter({_REP_GRAMS_SQL.format(n=n)},
           g -> len(list_filter({_REP_GRAMS_SQL.format(n=n)}, h -> h = g)) > 1),
           g -> length(g))), 0) AS BIGINT) AS dup{n}_chars"""
        for n in range(5, 11)
    )
    + """
  FROM arrs),
m AS (
  SELECT doc_id,
         round(CAST(dup_line_occ AS DOUBLE) / greatest(n_lines, 1), 4) AS dup_line_frac,
         round(CAST(dup_para_occ AS DOUBLE) / greatest(n_paras, 1), 4) AS dup_para_frac,
         round(CAST(dup_line_chars AS DOUBLE) / greatest(line_chars, 1), 4) AS dup_line_char_frac,
         round(CAST(dup_para_chars AS DOUBLE) / greatest(para_chars, 1), 4) AS dup_para_char_frac,
         round(CAST(top2_prod AS DOUBLE) / greatest(word_chars, 1), 4) AS top_2gram_char_frac,
         round(CAST(top3_prod AS DOUBLE) / greatest(word_chars, 1), 4) AS top_3gram_char_frac,
         round(CAST(top4_prod AS DOUBLE) / greatest(word_chars, 1), 4) AS top_4gram_char_frac,
         round(CAST(dup5_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_5gram_char_frac,
         round(CAST(dup6_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_6gram_char_frac,
         round(CAST(dup7_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_7gram_char_frac,
         round(CAST(dup8_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_8gram_char_frac,
         round(CAST(dup9_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_9gram_char_frac,
         round(CAST(dup10_chars AS DOUBLE) / greatest(word_chars, 1), 4) AS dup_10gram_char_frac
  FROM ints),
f AS (
  SELECT *,
         (dup_line_frac <= 0.30) AS f_dup_line_frac,
         (dup_para_frac <= 0.30) AS f_dup_para_frac,
         (dup_line_char_frac <= 0.20) AS f_dup_line_char_frac,
         (dup_para_char_frac <= 0.20) AS f_dup_para_char_frac,
         (top_2gram_char_frac <= 0.20) AS f_top_2gram_char_frac,
         (top_3gram_char_frac <= 0.18) AS f_top_3gram_char_frac,
         (top_4gram_char_frac <= 0.16) AS f_top_4gram_char_frac,
         (dup_5gram_char_frac <= 0.15) AS f_dup_5gram_char_frac,
         (dup_6gram_char_frac <= 0.14) AS f_dup_6gram_char_frac,
         (dup_7gram_char_frac <= 0.13) AS f_dup_7gram_char_frac,
         (dup_8gram_char_frac <= 0.12) AS f_dup_8gram_char_frac,
         (dup_9gram_char_frac <= 0.11) AS f_dup_9gram_char_frac,
         (dup_10gram_char_frac <= 0.10) AS f_dup_10gram_char_frac
  FROM m)
SELECT *, (f_dup_line_frac AND f_dup_para_frac AND f_dup_line_char_frac
           AND f_dup_para_char_frac AND f_top_2gram_char_frac
           AND f_top_3gram_char_frac AND f_top_4gram_char_frac
           AND f_dup_5gram_char_frac AND f_dup_6gram_char_frac
           AND f_dup_7gram_char_frac AND f_dup_8gram_char_frac
           AND f_dup_9gram_char_frac AND f_dup_10gram_char_frac) AS keep
FROM f
"""
)


def _web_decorated(docs: DataFrame) -> DataFrame:
    """The funnel corpus: gopher decoration (``_gopher_decorated``)
    PLUS a second, independent ``doc_id % 5`` cohort targeting the C4
    and FineWeb stages — proper multi-word terminal-punctuated
    sentences (C4 pass), a braced code line (C4 reject), a lorem-ipsum
    line (C4 reject), sentences followed by unpunctuated nav stubs (C4
    pass, FineWeb line-punctuation reject), and bare (C4 sentence-count
    reject). Mirrored by ``_web_decor_sql``."""
    m5 = F.col("doc_id") % 5
    s = (
        "\nGood sentence one with plenty of words here."
        "\nGood sentence two with plenty of words here."
        "\nGood sentence three with plenty of words here."
    )
    return _gopher_decorated(docs).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(m5 == 0, F.lit(s + "\nGood sentence four with plenty of words here."))
            .when(m5 == 1, F.lit(s + "\nfunction() { return 0; }"))
            .when(m5 == 2, F.lit(s + "\nlorem ipsum dolor sit."))
            .when(
                m5 == 3,
                F.lit(s + "\nnav\nhome\nabout\nshop\nblog\nmenu\nlogin\nsearch\ncart\nhelp"),
            )
            .otherwise(F.lit("")),
        ),
    )


_WEB_DECOR_SENT_SQL = (
    "chr(10) || 'Good sentence one with plenty of words here.'"
    " || chr(10) || 'Good sentence two with plenty of words here.'"
    " || chr(10) || 'Good sentence three with plenty of words here.'"
)


def _web_decor_sql(text_col: str = "text", id_col: str = "doc_id") -> str:
    """SQL mirror of ``_web_decorated`` (gopher decor + the C4/FineWeb
    cohort), parameterized with unique tokens like
    ``_gopher_decor_sql``."""
    s = _WEB_DECOR_SENT_SQL
    return (
        _gopher_decor_sql(text_col, id_col)
        + f""" || CASE CAST(__ID_COL__ % 5 AS INTEGER)
           WHEN 0 THEN {s} || chr(10) || 'Good sentence four with plenty of words here.'
           WHEN 1 THEN {s} || chr(10) || 'function() __LB__ return 0; __RB__'
           WHEN 2 THEN {s} || chr(10) || 'lorem ipsum dolor sit.'
           WHEN 3 THEN {s} || chr(10) || 'nav' || chr(10) || 'home' || chr(10)
                       || 'about' || chr(10) || 'shop' || chr(10) || 'blog'
                       || chr(10) || 'menu' || chr(10) || 'login' || chr(10)
                       || 'search' || chr(10) || 'cart' || chr(10) || 'help'
           ELSE ''
         END""".replace("__ID_COL__", id_col)
        .replace("__LB__", "{")
        .replace("__RB__", "}")
    )


def pipeline_web_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end FineWeb-style web-curation funnel (r11, extended r12
    with the C4 and FineWeb stages): blocklist → canonical-URL dedup →
    per-host cap → Gopher A1.1 → C4 → FineWeb over the messy-URL
    corpus + decorated documents, emitting the per-doc FUNNEL
    ATTRIBUTION — (doc_id, stage) where stage is the first rejecting
    stage ('blocklist' | 'url_duplicate' | 'host_cap' |
    'quality_gopher' | 'quality_c4' | 'quality_fineweb') or 'kept' —
    the report a pipeline operator actually watches, now naming WHICH
    public filter family rejected each document.

    This is the FUSED single-pass form of the composable operators
    (each oracled on its own: curate_blocklist_filter, dedup_url_exact,
    curate_host_cap, doc_quality_gopher, doc_c4_clean,
    doc_quality_fineweb): every stage decision is a boolean COLUMN over
    one scan. The three quality keeps come from the SAME
    column-expression cores the standalone operators use
    (gopher_quality_exprs / c4_clean_exprs / fineweb_quality_exprs —
    the funnel cannot drift from the operators), computed above ONE
    doc-keyed materialization barrier that tokenizes each document
    once; only booleans ride the downstream window exchanges (r11
    carried full text through all three windows — r12 carries ~40
    bytes/row). The r11 first cut attributed stages with anti joins
    that re-evaluated the pipeline 9× (32 SortMergeJoins, caught by
    scripts/plan_audit.py); the r12 form is ONE exchange + 3 windows +
    ZERO joins. Results are hash-exact against the chained SQL oracle,
    which recomputes all six stages independently — fused-vs-composed
    equivalence IS the correctness claim.

    Scale: windows key on (url), (host, salt), (host) — the salted
    pre-rank keeps mega-hosts fanned out exactly as host_cap does.
    Nothing re-evaluates, nothing joins, one pass over the corpus."""
    from pyspark.sql.window import Window

    from vectorsearch_spark.operators.urls import domain_suffixes

    cap, salt_buckets = 5, 64
    # ONE scan: url synthesis, canonicalization, hosts, decorations,
    # and the tokenized arrays all project from the same documents read
    docs = _web_decorated(_t(spark, sf_dir, "documents"))
    d0 = docs.select(
        "doc_id",
        _canon_raw_url().alias("url"),
        _raw_url_host(False).alias("host_b"),
        _raw_url_host(True).alias("host"),
        "text",
        "n_chars",
        F.filter(
            F.split(F.col("text"), r"[ \t\n\r\f\v]+"), lambda w: w != ""
        ).alias("__words"),
        F.filter(
            F.split(F.col("text"), "\n"), lambda l: F.trim(l) != ""
        ).alias("__lines"),
        F.filter(
            F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("__tlines"),
    ).repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))

    # quality stages 4-6 from the SHARED expression cores, evaluated
    # over the materialized arrays (tokenize-once; the barrier above is
    # the same doc_stats pattern the standalone operators use)
    _, gf = _gopher_core()
    g_keep = None
    for k in gf:
        g_keep = gf[k] if g_keep is None else (g_keep & gf[k])
    c4_keep = _c4_core()["keep"]
    _, ff = _fineweb_core()
    fw_keep = None
    for k in ff:
        fw_keep = ff[k] if fw_keep is None else (fw_keep & ff[k])

    # stage 1: literal 2-domain blocklist as codegen suffix membership
    # (the table-driven broadcast form is operators/urls.py
    # blocklist_filter, oracled by curate_blocklist_filter)
    blocked = F.exists(
        domain_suffixes(F.col("host_b")),
        lambda s: s.isin("src3.com", "src7.com"),
    )
    # text and arrays are DROPPED here — only ids, keys, and booleans
    # cross the window exchanges
    flags = d0.select(
        "doc_id",
        "url",
        "host",
        "n_chars",
        blocked.alias("blocked"),
        g_keep.alias("__g_keep"),
        c4_keep.alias("__c4_keep"),
        fw_keep.alias("__fw_keep"),
    )
    # stage 2: URL keeper — conditional min over the url window (only
    # unblocked rows compete; min ignores nulls)
    w_url = Window.partitionBy("url")
    keeper = (~F.col("blocked")) & (
        F.col("doc_id")
        == F.min(F.when(~F.col("blocked"), F.col("doc_id"))).over(w_url)
    )
    flags = flags.withColumn("is_keeper", keeper)
    # stage 3: host_cap's two-phase salted rank, inlined — survivors
    # sort FIRST in each window, so row_number restricted to survivor
    # rows is their rank among survivors (the same superset argument)
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt_buckets))
    w_pre = Window.partitionBy("host", F.col("__salt")).orderBy(
        F.col("is_keeper").desc(), F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    w_host = Window.partitionBy("host").orderBy(
        F.col("__pre_ok").desc(), F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = (
        flags.withColumn("__salt", salt)
        .withColumn(
            "__pre_ok",
            F.col("is_keeper") & (F.row_number().over(w_pre) <= cap),
        )
        .withColumn(
            "in_cap", F.col("__pre_ok") & (F.row_number().over(w_host) <= cap)
        )
    )
    return ranked.select(
        "doc_id",
        F.when(F.col("blocked"), F.lit("blocklist"))
        .when(~F.col("is_keeper"), F.lit("url_duplicate"))
        .when(~F.col("in_cap"), F.lit("host_cap"))
        .when(~F.col("__g_keep"), F.lit("quality_gopher"))
        .when(~F.col("__c4_keep"), F.lit("quality_c4"))
        .when(~F.col("__fw_keep"), F.lit("quality_fineweb"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
    )


_WEB_FUNNEL_CTES_SQL = f"""
WITH raw AS ({_URL_CORPUS_SQL}),
c AS ({_URL_CANON_SQL}),
d0 AS (
  SELECT c.doc_id, c.url, c.host,
         CASE WHEN lower(regexp_extract(c.raw_url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) LIKE '[%'
              THEN regexp_extract(lower(regexp_extract(c.raw_url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^(\\[[^\\]]*\\])', 1)
              ELSE regexp_extract(lower(regexp_extract(c.raw_url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^([^:]*)', 1)
         END AS host_b,
         {_web_decor_sql("doc.text", "c.doc_id")} AS t,
         doc.n_chars
  FROM c JOIN documents doc ON doc.doc_id = c.doc_id),
s1 AS (
  SELECT * FROM d0
  WHERE len(list_filter(
          list_transform(range(1, len(string_split(host_b, '.')) + 1),
            i -> array_to_string(
                   list_slice(string_split(host_b, '.'), i,
                              len(string_split(host_b, '.'))), '.')),
          s -> s IN ('src3.com', 'src7.com'))) = 0),
k2 AS (SELECT url, min(doc_id) AS m FROM s1 GROUP BY url),
s2 AS (SELECT s1.* FROM s1 JOIN k2 ON s1.url = k2.url AND s1.doc_id = k2.m),
r3 AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id ASC)
            AS rn
  FROM s2),
s3 AS (SELECT * FROM r3 WHERE rn <= 5),
arrs AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '[ \t\n\r\f\v]+'), w -> w <> '') AS words,
         list_filter(string_split(t, chr(10)), l -> trim(l) <> '') AS lines,
         list_transform(list_filter(string_split(t, chr(10)),
           x -> trim(x) <> ''), x -> trim(x)) AS tlines
  FROM d0),
qm AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
               / greatest(len(words), 1), 4) AS mean_word_len,
         round(CAST(list_sum(list_transform(words,
                 w -> length(w) - length(replace(replace(w, '#', ''), chr(8230), ''))))
               AS DOUBLE) / greatest(len(words), 1), 4) AS symbol_ratio,
         round(CAST(len(list_filter(lines,
                 l -> regexp_matches(ltrim(l), '^[' || chr(8226) || '*-]'))) AS DOUBLE)
               / greatest(len(lines), 1), 4) AS bullet_frac,
         round(CAST(len(list_filter(lines,
                 l -> regexp_matches(rtrim(l), '(' || chr(8230) || '|\\.\\.\\.)$'))) AS DOUBLE)
               / greatest(len(lines), 1), 4) AS ellipsis_frac,
         round(CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(words), 1), 4) AS alpha_word_frac,
         CAST(len(list_intersect(
                 list_distinct(list_transform(words,
                   w -> regexp_replace(lower(w), '^[^a-z]+|[^a-z]+$', '', 'g'))),
                 ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits,
         CAST(len(list_filter(lines, x ->
           regexp_matches(rtrim(x), '[.!?"]$')
           AND len(list_filter(string_split_regex(x, '[ \t\r\f\v]+'), w -> w <> '')) >= 5
           AND NOT contains(lower(x), 'javascript'))) AS BIGINT) AS n_kept_lines,
         contains(lower(t), 'lorem ipsum') AS has_lorem,
         contains(t, chr(123)) AS has_brace,
         round(CAST(len(list_filter(tlines, l -> regexp_matches(l, '[.!?"]$'))) AS DOUBLE)
               / greatest(len(tlines), 1), 4) AS line_punct_frac,
         round(CAST(len(list_filter(tlines, l -> length(l) < 30)) AS DOUBLE)
               / greatest(len(tlines), 1), 4) AS short_line_frac,
         round(CAST(coalesce(list_sum(list_transform(list_filter(tlines,
             x -> len(list_filter(tlines, y -> y = x)) > 1),
             x -> length(x))), 0) AS DOUBLE)
           / greatest(CAST(coalesce(list_sum(list_transform(tlines,
             x -> length(x))), 0) AS DOUBLE), 1.0), 4) AS dup_line_char_frac
  FROM arrs),
q AS (
  SELECT doc_id,
         (n_words >= 50 AND n_words <= 100000
          AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
          AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.8
          AND stop_hits >= 2) AS g_keep,
         (n_kept_lines >= 3 AND NOT has_lorem AND NOT has_brace) AS c4_keep,
         (line_punct_frac >= 0.12 AND short_line_frac <= 0.67
          AND dup_line_char_frac <= 0.10) AS fw_keep
  FROM qm)
"""

_WEB_FUNNEL_STAGE_SELECT_SQL = """
SELECT d0.doc_id,
       CASE WHEN d0.doc_id NOT IN (SELECT doc_id FROM s1) THEN 'blocklist'
            WHEN d0.doc_id NOT IN (SELECT doc_id FROM s2) THEN 'url_duplicate'
            WHEN d0.doc_id NOT IN (SELECT doc_id FROM s3) THEN 'host_cap'
            WHEN NOT q.g_keep THEN 'quality_gopher'
            WHEN NOT q.c4_keep THEN 'quality_c4'
            WHEN NOT q.fw_keep THEN 'quality_fineweb'
            ELSE 'kept' END AS stage
FROM d0 JOIN q ON q.doc_id = d0.doc_id
"""

PIPELINE_WEB_CURATION_SQL = _WEB_FUNNEL_CTES_SQL + _WEB_FUNNEL_STAGE_SELECT_SQL

# The C4 line-retention rule, shared between the funnel CTEs and the
# cleaned-text projection below (text.py c4_clean_exprs line_ok).
_C4_LINE_OK_SQL = """x ->
  regexp_matches(rtrim(x), '[.!?"]$')
  AND len(list_filter(string_split_regex(x, '[ \t\r\f\v]+'), w -> w <> '')) >= 5
  AND NOT contains(lower(x), 'javascript')"""

PIPELINE_C4_TEXT_SQL = (
    _WEB_FUNNEL_CTES_SQL
    + ",\nstage AS ("
    + _WEB_FUNNEL_STAGE_SELECT_SQL
    + f""")
SELECT a.doc_id,
       array_to_string(list_filter(a.lines, {_C4_LINE_OK_SQL}), chr(10))
         AS text_clean,
       CAST(len(list_filter(a.lines, {_C4_LINE_OK_SQL})) AS BIGINT)
         AS n_kept_lines
FROM arrs a JOIN stage s ON s.doc_id = a.doc_id
WHERE s.stage = 'kept'
"""
)


def pipeline_c4_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's PAYLOAD, end-to-end (r13, r12 VERDICT #4): the
    cleaned TEXT of every document the six-stage funnel kept — not
    just the keep-flags. ``pipeline_web_curation`` attributes stages
    with text dropped before the window exchanges (the r12 scale
    design); this entry then rejoins the surviving ids to a second
    documents projection that applies C4's line retention
    (text.py c4_clean_exprs) and emits ``text_clean`` itself, so the
    oracle hash covers the actual training-data bytes a pipeline would
    ship. Two scans + one doc_id-keyed join is the honest 100 TB
    shape: either the text rides every funnel exchange (r11's
    rejected form) or survivors re-read it once — re-reading wins."""
    kept = (
        pipeline_web_curation(spark, sf_dir)
        .where(F.col("stage") == "kept")
        .select("doc_id")
    )
    docs = _web_decorated(_t(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        "text",
        F.filter(
            F.split(F.col("text"), "\n"), lambda l: F.trim(l) != ""
        ).alias("__lines"),
    )
    cols = _c4_core()
    cleaned = d.select(
        "doc_id",
        cols["text_clean"].alias("text_clean"),
        cols["n_kept_lines"].alias("n_kept_lines"),
    )
    return cleaned.join(kept, "doc_id", "left_semi")


def doc_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization Unicode normalization (r10 — operators/text.py
    normalize_text): NFC composition, typographic-quote/dash folding,
    unicode-space folding, ASCII whitespace collapse — the CCNet-style
    first pass that makes byte-different crawls of the same page dedup
    together. The input is the documents table DECORATED in-plan with
    exactly the phenomena the normalizer exists for (NBSP, curly
    quotes, em-dash, em-space, a combining-accent sequence, trailing
    runs), and the oracle RUNS THE SAME PIPELINE in SQL
    (nfc_normalize + replace chain + regexp collapse), so every step
    is pinned, not just the final witness."""
    from vectorsearch_spark.operators.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.lit("\u00a0\u201c"),  # NBSP + curly open quote
            F.col("text"),
            # curly close quote, em-space, em-dash, combining-accent e
            F.lit("\u201d\u2003\u2014 Cafe\u0301  "),
        ).alias("text"),
    )
    out = normalize_text(decorated)
    return out.select("doc_id", "text_norm", "n_chars")


DOC_TEXT_NORMALIZE_SQL = r"""
WITH d AS (
  SELECT doc_id,
         nfc_normalize(chr(160) || chr(8220) || text || chr(8221)
                       || chr(8195) || chr(8212) || ' Cafe' || chr(769) || '  ') AS t
  FROM documents),
folded AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(t,
           chr(8220), '"'), chr(8221), '"'), chr(8212), '-'),
           chr(160), ' '), chr(8195), ' ') AS t
  FROM d),
n AS (
  SELECT doc_id, trim(regexp_replace(t, '[ \t\n\r\f\v]+', ' ', 'g')) AS text_norm
  FROM folded)
SELECT doc_id, text_norm, CAST(length(text_norm) AS BIGINT) AS n_chars FROM n
"""


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.text import doc_stats

    return doc_stats(_t(spark, sf_dir, "documents"))


DOC_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct_chars
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_aggregate(list_transform(toks, t -> CAST(length(t) AS DOUBLE)), 'sum') / len(toks) END AS avg_token_len,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) / greatest(len(toks), 1) AS stopword_ratio,
         CAST(punct_chars AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio
  FROM base)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens,
       round(avg_token_len, 4) AS avg_token_len,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(punct_ratio, 4) AS punct_ratio,
       round(0.25 * least(n_tokens / 100.0, 1.0)
           + 0.25 * (CAST(n_distinct_tokens AS DOUBLE) / greatest(n_tokens, 1))
           + 0.25 * (1 - least(punct_ratio * 4, 1.0))
           + 0.25 * least(stopword_ratio * 5, 1.0), 4) AS quality_score
FROM m
"""


def lang_id_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.text import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    from vectorsearch_spark.operators.text import LANG_LEXICONS

    langs = sorted(LANG_LEXICONS)
    score_exprs = ",\n         ".join(
        "CAST(len(list_filter(toks, t -> list_contains(["
        + ",".join(f"'{w}'" for w in LANG_LEXICONS[la])
        + f"], t))) AS BIGINT) AS score_{la}"
        for la in langs
    )
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN score_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks FROM documents),
scored AS (
  SELECT doc_id,
         {score_exprs}
  FROM base)
SELECT doc_id, {", ".join(f"score_{la}" for la in langs)}, {case} AS pred_lang
FROM scored
"""


_CURATE_RATES = {"en": 0.5, "fr": 0.3}
_CURATE_DEFAULT = 0.1
_CURATE_MIN_Q = 0.5
_SHARD_BUDGET = 50_000


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated per-language deterministic sampling (hash-rate
    selection — rerun-stable, engine-agnostic)."""
    from vectorsearch_spark.operators.curate import curate_sample

    return curate_sample(
        _t(spark, sf_dir, "documents"),
        rates_by_lang=_CURATE_RATES,
        min_quality=_CURATE_MIN_Q,
        default_rate=_CURATE_DEFAULT,
    )


def corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10): assignment is a
    pure function of doc_id (hash bands — rerun/engine-stable, unlike
    randomSplit), counted per (language, split) to show stratification
    (operators/curate.py assign_splits)."""
    from vectorsearch_spark.operators.curate import assign_splits

    docs = _t(spark, sf_dir, "documents")
    return (
        assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "split")
    )


CORPUS_SPLITS_SQL = """
SELECT lang,
       CASE WHEN h < 800000 THEN 'train'
            WHEN h < 900000 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM (SELECT lang,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000000 AS h
      FROM documents)
GROUP BY 1, 2 ORDER BY 1, 2
"""


_PIPE_BUDGET = 2000
_PIPE_MIN_Q = 0.5


def pipeline_pack_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pipeline COMPOSITION: exact-dedup keepers → quality
    gate → token-budget shard packing → per-shard rollup, chaining the
    individually-oracled operators (fingerprint, doc_stats,
    pack_token_shards) through one plan — the hash gate here checks
    that the operators compose exactly, not just that each works in
    isolation.  Every stage keeps its scale contract: hash-groupBy
    keepers, tokenize-once stats, two-phase partition-parallel prefix
    sum."""
    from vectorsearch_spark.operators.curate import pack_token_shards
    from vectorsearch_spark.operators.text import doc_stats, fingerprint

    docs = _t(spark, sf_dir, "documents")
    keepers = (
        fingerprint(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    good = (
        doc_stats(docs)
        .where(F.col("quality_score") >= _PIPE_MIN_Q)
        .select("doc_id")
    )
    kept = docs.join(keepers, "doc_id", "left_semi").join(good, "doc_id", "left_semi")
    packed = pack_token_shards(kept, budget=_PIPE_BUDGET)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard_id")
    )


PIPELINE_PACK_SQL = rf"""
WITH keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
base AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS punct_chars
  FROM documents),
good AS (
  SELECT doc_id FROM base
  WHERE round(0.25 * least(len(toks) / 100.0, 1.0)
      + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
      + 0.25 * (1 - least((CAST(punct_chars AS DOUBLE) / greatest(n_chars, 1)) * 4, 1.0))
      + 0.25 * least((CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
                      / greatest(len(toks), 1)) * 5, 1.0), 4) >= {_PIPE_MIN_Q}),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN keepers USING (doc_id) JOIN good USING (doc_id)),
tc AS (
  SELECT doc_id,
         list_aggregate(list_prepend(CAST(0 AS BIGINT), list_transform(
           regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]'),
           p -> 1 + CASE WHEN regexp_matches(p, '^[a-z]')
                         THEN (length(p) - 1) // 4 ELSE 0 END)), 'sum') AS n_tokens
  FROM kept),
o AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tc)
SELECT CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {_PIPE_BUDGET}) AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM o GROUP BY 1 ORDER BY 1
"""


def _curation_sql() -> str:
    from vectorsearch_spark.operators.text import LANG_LEXICONS

    langs = sorted(LANG_LEXICONS)
    score_exprs = ", ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ",".join(f"'{w}'" for w in LANG_LEXICONS[la])
        + f"], t))) AS score_{la}"
        for la in langs
    )
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN score_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    rate = (
        "CASE pred_lang "
        + " ".join(
            f"WHEN '{c}' THEN {int(round(r * 1_000_000))}"
            for c, r in sorted(_CURATE_RATES.items())
        )
        + f" ELSE {int(round(_CURATE_DEFAULT * 1_000_000))} END"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct_chars
  FROM documents),
lang AS (
  SELECT doc_id, {case} AS pred_lang FROM (SELECT doc_id, {score_exprs} FROM base)),
qual AS (
  SELECT doc_id,
         round(0.25 * least(len(toks) / 100.0, 1.0)
             + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
             + 0.25 * (1 - least((CAST(punct_chars AS DOUBLE) / greatest(n_chars, 1)) * 4, 1.0))
             + 0.25 * least((CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) / greatest(len(toks), 1)) * 5, 1.0), 4) AS quality_score
  FROM base)
SELECT lang.doc_id AS doc_id, pred_lang, quality_score
FROM lang JOIN qual ON lang.doc_id = qual.doc_id
WHERE quality_score >= {_CURATE_MIN_Q}
  AND (CAST(concat('0x', substring(md5(CAST(lang.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)
      < ({rate})
"""


def doc_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing via the two-phase partition-parallel
    prefix sum (no single-task global window)."""
    from vectorsearch_spark.operators.curate import pack_token_shards

    return pack_token_shards(_t(spark, sf_dir, "documents"), budget=_SHARD_BUDGET)


DOC_SHARD_PACKING_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]') AS pieces
  FROM documents),
tc AS (
  SELECT doc_id,
         list_aggregate(list_prepend(CAST(0 AS BIGINT), list_transform(pieces,
           p -> 1 + CASE WHEN regexp_matches(p, '^[a-z]')
                         THEN (length(p) - 1) // 4 ELSE 0 END)), 'sum') AS n_tokens
  FROM base),
o AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tc)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / {_SHARD_BUDGET}) AS BIGINT) AS shard_id
FROM o
"""


_SEQ_LEN = 256


def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style fixed-length sequence packing (operators/curate.py
    pack_sequences): all documents concatenate into one token stream
    cut into 256-token examples, documents SPLITTING across example
    boundaries — zero padding waste, unlike the doc-aligned
    doc_shard_packing. One (example, doc) segment row each."""
    from vectorsearch_spark.operators.curate import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), _SEQ_LEN)


def training_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching (r10 — operators/curate.py
    length_bucket_batches): power-of-two bucket caps (integer
    bit-length, never float log2), within-bucket id-order batches of
    max(1, 2048 // cap) examples — the padding-minimization pass for
    non-packing workloads (inference/encoder/reward scoring). The
    within-bucket rank runs the two-phase partition-parallel prefix
    scheme (driver state O(#partitions × #buckets)); the oracle's
    global window is the sf-sized mirror of the same numbering."""
    from vectorsearch_spark.operators.curate import length_bucket_batches

    return length_bucket_batches(_t(spark, sf_dir, "documents"), batch_tokens=2048)


TRAINING_LENGTH_BATCHES_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS pieces
  FROM documents),
c AS (
  SELECT doc_id,
         list_aggregate(list_prepend(CAST(0 AS BIGINT), list_transform(pieces,
           p -> 1 + CASE WHEN regexp_matches(p, '^[a-z]')
                         THEN (length(p) - 1) // 4 ELSE 0 END)), 'sum')::BIGINT AS n_tokens
  FROM base),
b AS (SELECT doc_id, n_tokens FROM c WHERE n_tokens > 0),
k AS (
  SELECT doc_id, n_tokens,
         CAST(CASE WHEN n_tokens <= 16 THEN 16
              ELSE 1 << length(bin(n_tokens - 1)) END AS BIGINT) AS bucket_cap
  FROM b),
r AS (
  SELECT doc_id, n_tokens, bucket_cap,
         row_number() OVER (PARTITION BY bucket_cap ORDER BY doc_id) - 1 AS rn0
  FROM k)
SELECT doc_id, n_tokens, bucket_cap,
       CAST(rn0 // greatest(1, 2048 // bucket_cap) AS BIGINT) AS batch_in_bucket,
       CAST(bucket_cap - n_tokens AS BIGINT) AS pad_tokens
FROM r
"""


def training_length_batches_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching on ACTUAL TOKENIZER counts (r11 —
    the tokenizer-true wiring of training_length_batches): every
    document is encoded through the REAL BPE application path
    (operators/bpe.py apply_bpe_merges — dictionary-sized Arrow encode,
    broadcast join-back), per-doc token counts are summed, and
    ``length_bucket_batches(count_col=...)`` buckets on those counts
    instead of the n_subword_est heuristic — the production shape for
    inference/encoder batching, where padding waste is measured in real
    tokens. The merge table here is a FIXED literal
    [(t,h), (th,e), (i,n)] rather than the corpus-learned one, which is
    what makes the twin exact: each leftmost-non-overlapping fold over
    symbols is equivalent to one sentinel-char ``replace`` at string
    level (multi-char symbols are single sentinels, so adjacent symbols
    ≡ adjacent chars), and token counts become plain SQL. The
    learned-table encode keeps its pure-Python model gate
    (bpe_encode_stats); the code path here is IDENTICAL — only the
    table is pinned."""
    from vectorsearch_spark.operators.bpe import apply_bpe_merges
    from vectorsearch_spark.operators.curate import length_bucket_batches

    merges = [(0, "t", "h", 0), (1, "th", "e", 0), (2, "i", "n", 0)]
    enc = apply_bpe_merges(_t(spark, sf_dir, "documents"), merges)
    counts = enc.groupBy("doc_id").agg(
        F.sum(F.size("toks")).cast("long").alias("n_bpe_tokens")
    )
    return length_bucket_batches(
        counts, batch_tokens=2048, count_col="n_bpe_tokens"
    )


TRAINING_LENGTH_BATCHES_BPE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS w
  FROM documents),
enc AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(w, '^[a-z]+$')
              THEN length(replace(replace(replace(w,
                     'th', chr(1)), chr(1) || 'e', chr(2)), 'in', chr(3)))
              ELSE 1 END AS n_tok
  FROM toks),
c AS (SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM enc GROUP BY 1),
b AS (SELECT doc_id, n_tokens FROM c WHERE n_tokens > 0),
k AS (
  SELECT doc_id, n_tokens,
         CAST(CASE WHEN n_tokens <= 16 THEN 16
              ELSE 1 << length(bin(n_tokens - 1)) END AS BIGINT) AS bucket_cap
  FROM b),
r AS (
  SELECT doc_id, n_tokens, bucket_cap,
         row_number() OVER (PARTITION BY bucket_cap ORDER BY doc_id) - 1 AS rn0
  FROM k)
SELECT doc_id, n_tokens, bucket_cap,
       CAST(rn0 // greatest(1, 2048 // bucket_cap) AS BIGINT) AS batch_in_bucket,
       CAST(bucket_cap - n_tokens AS BIGINT) AS pad_tokens
FROM r
"""


TRAINING_PACK_SEQUENCES_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]') AS pieces
  FROM documents),
tc AS (
  SELECT doc_id,
         list_aggregate(list_prepend(CAST(0 AS BIGINT), list_transform(pieces,
           p -> 1 + CASE WHEN regexp_matches(p, '^[a-z]')
                         THEN (length(p) - 1) // 4 ELSE 0 END)), 'sum') AS n
  FROM base),
o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS off
  FROM tc),
e AS (
  SELECT doc_id, n, off,
         unnest(range((off // {_SEQ_LEN})::BIGINT, ((off + n - 1) // {_SEQ_LEN} + 1)::BIGINT)) AS ex
  FROM o WHERE n > 0)
SELECT ex::BIGINT AS example_id, doc_id,
       (greatest(ex * {_SEQ_LEN}, off) - off)::BIGINT AS start_tok,
       (least((ex + 1) * {_SEQ_LEN}, off + n) - greatest(ex * {_SEQ_LEN}, off))::BIGINT AS n_tok
FROM e
"""


_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length training-sequence chunking with overlap (stride <
    chunk length) — the LLM-pretraining windowing pass; every token
    covered, no redundant tail chunk, empty docs yield nothing."""
    from vectorsearch_spark.operators.curate import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=_CHUNK_LEN,
        stride=_CHUNK_STRIDE,
    )


DOC_CHUNKING_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]') AS p
  FROM documents),
nn AS (
  SELECT doc_id, p, len(p) AS n FROM base WHERE len(p) > 0),
c AS (
  SELECT doc_id, p, n,
         unnest(range(0, least(1 + (greatest(n - {_CHUNK_LEN}, 0) + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE},
                               1 + (n - 1) // {_CHUNK_STRIDE}))) AS chunk_idx
  FROM nn)
SELECT doc_id,
       chunk_idx::BIGINT AS chunk_idx,
       (chunk_idx * {_CHUNK_STRIDE})::BIGINT AS start_tok,
       least({_CHUNK_LEN}, n - chunk_idx * {_CHUNK_STRIDE})::BIGINT AS n_tokens,
       array_to_string(list_slice(p, chunk_idx * {_CHUNK_STRIDE} + 1,
                                  chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_LEN}), ' ') AS chunk_text
FROM c
"""


# dedup corpora: deterministic duplicates/near-duplicates injected
# in-query so the operators have something to find (raw texts are all
# distinct). Mirrored literally in SQL.

def _dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 20 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" appended tail marker")).alias("text"),
    )
    return docs.unionByName(copies).unionByName(near)


_DEDUP_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id + 2000000, text || ' appended tail marker' FROM documents WHERE doc_id % 20 = 5
"""


def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage QA (r11): after hash-band train/val/test
    assignment (operators/curate.py assign_splits — a pure function of
    doc_id), find normalized-text fingerprints whose COPIES land in
    more than one split — exactly the eval-contamination a
    dedup-then-split pipeline exists to prevent, run as the
    post-assignment audit. The duplicate-injected corpus guarantees
    leakage exists (verbatim copies carry new doc_ids, so they hash to
    other splits). ONE aggregate over (fingerprint): shuffle is one row
    per distinct text, count/min/set all map-side combinable —
    scan-rate at any corpus size."""
    from vectorsearch_spark.operators.curate import assign_splits

    corpus = _dedup_corpus(spark, sf_dir)
    assigned = assign_splits(corpus, {"train": 0.8, "val": 0.1, "test": 0.1})
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = assigned.select(F.md5(norm).alias("fingerprint"), "split", "doc_id")
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.countDistinct("split").cast("long").alias("n_splits"),
            F.array_join(F.sort_array(F.collect_set("split")), ",").alias("splits"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_id"),
        )
        .filter(F.col("n_splits") > 1)
    )


SPLIT_LEAKAGE_CHECK_SQL = rf"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
a AS (
  SELECT doc_id, text,
         CASE WHEN h < 800000 THEN 'train'
              WHEN h < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, text,
               CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 1000000 AS h
        FROM corpus)),
f AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
         split, doc_id
  FROM a)
SELECT fingerprint,
       CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
       array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
       count(*) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper_id
FROM f GROUP BY fingerprint HAVING count(DISTINCT split) > 1
"""


def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global passage dedup (operators/curate.py passage_dedup):
    non-overlapping 64-token chunks, globally-first occurrence kept,
    documents reassembled from survivors — run on the duplicate-
    injected corpus so whole-copy docs collapse to n_kept=0 and
    near-dup docs keep only their divergent tail chunk."""
    from vectorsearch_spark.operators.curate import passage_dedup as pdedup

    return pdedup(_dedup_corpus(spark, sf_dir), chunk_tokens=64)


PASSAGE_DEDUP_SQL = r"""
WITH corpus AS (__CORPUS__),
base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM corpus),
nn AS (SELECT doc_id, p, len(p) AS n FROM base WHERE len(p) > 0),
c AS (
  SELECT doc_id, p, n,
         unnest(range(0, least(1 + (greatest(n - 64, 0) + 63) // 64,
                               1 + (n - 1) // 64))) AS chunk_idx
  FROM nn),
ch AS (
  SELECT doc_id, chunk_idx,
         array_to_string(list_slice(p, chunk_idx * 64 + 1, chunk_idx * 64 + 64), ' ') AS chunk_text
  FROM c),
k AS (
  SELECT doc_id, chunk_idx, chunk_text,
         row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
  FROM ch)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY chunk_idx), '')) AS kept_hash
FROM k GROUP BY doc_id
""".replace("__CORPUS__", _DEDUP_CORPUS_SQL)


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (operators/curate.py line_dedup —
    the RefinedWeb/CCNet line-dedup pass): run on a corpus wrapped in
    web-style chrome (a global header/footer plus a per-source contact
    line) with whole-copy injections, so the chrome vanishes from every
    document and copied bodies are dropped from both owners."""
    from vectorsearch_spark.operators.curate import line_dedup

    return line_dedup(_line_corpus(spark, sf_dir), min_docs=2)


def _line_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("subscribe to our newsletter"),
            F.col("text"),
            F.lit("all rights reserved"),
            F.concat(F.lit("contact "), F.col("source")),
        ).alias("text"),
    )
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


_LINE_CORPUS_SQL = """
  SELECT doc_id,
         'subscribe to our newsletter' || chr(10) || text || chr(10) ||
         'all rights reserved' || chr(10) || 'contact ' || source AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         'subscribe to our newsletter' || chr(10) || text || chr(10) ||
         'all rights reserved' || chr(10) || 'contact ' || source
  FROM documents WHERE doc_id % 10 = 0
"""


DEDUP_LINES_SQL = r"""
WITH corpus AS (__CORPUS__),
l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus),
l AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM l0),
ln AS (SELECT doc_id, pos, ls[pos] AS line, trim(ls[pos]) AS key FROM l),
bo AS (
  SELECT key FROM ln WHERE key <> ''
  GROUP BY key HAVING count(DISTINCT doc_id) >= 2),
m AS (
  SELECT ln.doc_id, ln.pos, ln.line,
         CASE WHEN bo.key IS NOT NULL THEN 1 ELSE 0 END AS b
  FROM ln LEFT JOIN bo ON ln.key = bo.key)
SELECT doc_id,
       count(*)::BIGINT AS n_lines,
       sum(1 - b)::BIGINT AS n_kept,
       sum(b)::BIGINT AS n_boiler,
       md5(coalesce(string_agg(CASE WHEN b = 0 THEN line END, chr(10) ORDER BY pos), '')) AS kept_hash
FROM m GROUP BY doc_id
""".replace("__CORPUS__", _LINE_CORPUS_SQL)


def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles WITHOUT per-group value buffers
    (operators/profile.py exact_quantiles): two bounded histogram
    aggregates locate each rank's bin, only border bins pay a window —
    the 100 TB-safe exact twin of price_percentiles' sort-based
    ``percentile`` aggregate."""
    from vectorsearch_spark.operators.profile import exact_quantiles

    ev = _t(spark, sf_dir, "events")
    out = exact_quantiles(ev, "value", [0.25, 0.5, 0.9, 0.99], "event_type", bins=256)
    return out.select(
        "event_type", "p", F.round("value", 6).alias("value")
    )


EVENTS_EXACT_QUANTILES_SQL = r"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL)
SELECT event_type, p, round(value, 6) AS value
FROM r, (VALUES (0.25::DOUBLE), (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) probs(p)
WHERE rn = greatest(1, ceil(p * n))
"""


def tokenizer_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer training
    (operators/unigram.py unigram_train — Kudo 2018): EM over the
    distinct-word table, never the corpus. Rows-only entry (EM has no
    SQL form); exact pure-Python model equality is gated in
    tests/test_unigram.py."""
    from vectorsearch_spark.operators.unigram import unigram_train

    # seed_factor/prune_frac tightened so the shrink loop converges in
    # ~2 E-steps (each E-step is one Spark job; the default 4/0.75
    # schedule costs ~5 extra job floors for no quality change at this
    # vocab size)
    vocab = unigram_train(
        _t(spark, sf_dir, "documents"), vocab_size=128, max_piece_len=6,
        seed_factor=2, prune_frac=0.5, em_iters=1,
    )
    return spark.createDataFrame(
        [(p, round(lp, 6), i + 1) for i, (p, lp) in enumerate(vocab)],
        "piece string, logp double, rank long",
    )


def tokenizer_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a unigram vocabulary, then tokenize every document with
    it (operators/unigram.py unigram_encode — Viterbi per DISTINCT
    word, joined back). Rows-only; per-doc pieces_hash witnesses are
    model-checked in tests/test_unigram.py."""
    from vectorsearch_spark.operators.unigram import unigram_encode, unigram_train

    docs = _t(spark, sf_dir, "documents")
    vocab = unigram_train(
        docs, vocab_size=128, max_piece_len=6,
        seed_factor=2, prune_frac=0.5, em_iters=1,
    )
    return unigram_encode(docs, vocab, max_piece_len=6)


def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable quantiles (operators/sketch.py
    fold_value_histogram_batch): events arrive as two epochs split by
    event id; the state is a bounded fixed-range histogram (500 bins
    over [0, 1000] — the HdrHistogram-style config), O(bins) forever.
    Reads return (p, value, lb, ub) with the true rank-ceil(p·n) value
    guaranteed in [lb, ub]. The fixed grid makes the fold
    batching-independent (bin counts just add), so the folded estimates
    share an exact SQL oracle over the WHOLE table — the
    stream_line_dedup_fold precedent: batching-independence IS the
    correctness claim."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_value_histogram_batch,
        read_quantile_state,
    )

    ev = _events(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"vq_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    kw = dict(bins=500, lo=0.0, hi=1000.0)
    fold_value_histogram_batch(
        ev.where(F.col("event_id") % 2 == 0), 0, state, "value", **kw
    )
    fold_value_histogram_batch(
        ev.where(F.col("event_id") % 2 == 1), 1, state, "value", **kw
    )
    out = read_quantile_state(spark, state, [0.25, 0.5, 0.9, 0.99])
    return out.select(
        "p",
        F.round("value", 6).alias("value"),
        F.round("lb", 6).alias("lb"),
        F.round("ub", 6).alias("ub"),
    )


STREAM_VALUE_QUANTILES_SQL = r"""
WITH v AS (
  SELECT value::DOUBLE AS v FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND isfinite(value)),
h AS (
  SELECT least(499, greatest(0, floor(v / 2.0)))::BIGINT AS bin,
         count(*)::BIGINT AS c
  FROM v GROUP BY 1),
cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cs FROM h),
tot AS (SELECT count(*)::BIGINT AS n, min(v) AS gmin, max(v) AS gmax FROM v),
tgt AS (
  SELECT p, greatest(1, ceil(p * n))::BIGINT AS r
  FROM (VALUES (0.25::DOUBLE), (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) probs(p), tot),
sel AS (
  SELECT p, min(bin) AS bin FROM tgt JOIN cum ON cum.cs >= tgt.r GROUP BY p)
SELECT p,
  round(CASE WHEN bin = 499 THEN gmax ELSE least(bin * 2.0 + 2.0, gmax) END, 6) AS value,
  round(CASE WHEN bin = 0 THEN gmin ELSE greatest(bin * 2.0, gmin) END, 6) AS lb,
  round(CASE WHEN bin = 499 THEN gmax ELSE least(bin * 2.0 + 2.0, gmax) END, 6) AS ub
FROM sel, tot
"""


def stream_type_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP streaming quantiles (operators/sketch.py
    fold_group_value_histogram_batch): per-event-type value percentiles
    from a 2-epoch fold — one bounded histogram per type (the
    |groups|-bounded contract), fixed [0, 1000]×500 grid so the fold is
    batching-independent and shares an exact whole-table SQL oracle
    (the stream_value_quantiles precedent, partitioned by type).
    Returns (group, p, value, lb, ub) with the true per-type
    rank-ceil(p·n) value guaranteed in [lb, ub]."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_group_value_histogram_batch,
        read_group_quantile_state,
    )

    ev = _events(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"vgq_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    kw = dict(bins=500, lo=0.0, hi=1000.0)
    fold_group_value_histogram_batch(
        ev.where(F.col("event_id") % 2 == 0), 0, state, "event_type", "value", **kw
    )
    fold_group_value_histogram_batch(
        ev.where(F.col("event_id") % 2 == 1), 1, state, "event_type", "value", **kw
    )
    out = read_group_quantile_state(spark, state, [0.5, 0.9, 0.99])
    return out.select(
        "group",
        "p",
        F.round("value", 6).alias("value"),
        F.round("lb", 6).alias("lb"),
        F.round("ub", 6).alias("ub"),
    )


STREAM_TYPE_QUANTILES_SQL = r"""
WITH v AS (
  SELECT event_type AS g, value::DOUBLE AS v FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND isfinite(value)
    AND event_type IS NOT NULL),
h AS (
  SELECT g, least(499, greatest(0, floor(v / 2.0)))::BIGINT AS bin,
         count(*)::BIGINT AS c
  FROM v GROUP BY 1, 2),
cum AS (SELECT g, bin, sum(c) OVER (PARTITION BY g ORDER BY bin) AS cs FROM h),
tot AS (
  SELECT g, count(*)::BIGINT AS n, min(v) AS gmin, max(v) AS gmax
  FROM v GROUP BY g),
tgt AS (
  SELECT g, gmin, gmax, p, greatest(1, ceil(p * n))::BIGINT AS r
  FROM tot, (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) probs(p)),
sel AS (
  SELECT tgt.g, p, gmin, gmax, min(bin) AS bin
  FROM tgt JOIN cum ON cum.g = tgt.g AND cum.cs >= tgt.r
  GROUP BY 1, 2, 3, 4)
SELECT g AS "group", p,
  round(CASE WHEN bin = 499 THEN gmax ELSE least(bin * 2.0 + 2.0, gmax) END, 6) AS value,
  round(CASE WHEN bin = 0 THEN gmin ELSE greatest(bin * 2.0, gmin) END, 6) AS lb,
  round(CASE WHEN bin = 499 THEN gmax ELSE least(bin * 2.0 + 2.0, gmax) END, 6) AS ub
FROM sel
"""


def stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct count (operators/sketch.py
    fold_distinct_count_batch): unique event users arrive in two
    epochs; the state is ONE HyperLogLog sketch (Spark's built-in
    DataSketches HLL aggregate — JVM-side partials, map-side combine,
    no key shuffle) plus the exact row total — O(2^lgk) bytes forever.
    lgk=14 keeps the sketch in its EXACT coupon range at every test SF
    (probed: exact through ≥1500 distinct; beyond, estimates carry the
    standard ≈1.04/sqrt(2^14)≈0.8% relative error), which is what makes
    the whole fold → union → committed-epoch read path SQL-mirrorable
    here — the degenerate-exact oracle precedent applied to sketched
    cardinality."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_distinct_count_batch,
        read_distinct_count_state,
    )

    ev = _events(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"dc_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    fold_distinct_count_batch(
        ev.where(F.col("event_id") % 2 == 0), 0, state, "user_id", lgk=14
    )
    fold_distinct_count_batch(
        ev.where(F.col("event_id") % 2 == 1), 1, state, "user_id", lgk=14
    )
    return read_distinct_count_state(spark, state)


STREAM_DISTINCT_USERS_SQL = r"""
SELECT count(DISTINCT user_id)::BIGINT AS n_distinct,
       count(user_id)::BIGINT AS total
FROM events WHERE user_id IS NOT NULL
"""


def stream_type_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP streaming distinct count (operators/sketch.py
    fold_group_distinct_count_batch): unique users per event type from
    a two-epoch fold — one HLL sketch per group (|groups|-bounded
    state; each fold is ONE declarative groupBy(hll_sketch_agg) with
    map-side partial sketches, never a value shuffle). lgk=14 keeps
    every group's sketch in its exact coupon range at every test SF
    (the stream_distinct_users precedent, per group), making the fold →
    per-group union → committed-epoch read SQL-mirrorable."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_group_distinct_count_batch,
        read_group_distinct_count_state,
    )

    ev = _events(spark, sf_dir)
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"gdc_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    fold_group_distinct_count_batch(
        ev.where(F.col("event_id") % 2 == 0), 0, state, "event_type", "user_id",
        lgk=14,
    )
    fold_group_distinct_count_batch(
        ev.where(F.col("event_id") % 2 == 1), 1, state, "event_type", "user_id",
        lgk=14,
    )
    return read_group_distinct_count_state(spark, state)


STREAM_TYPE_DISTINCT_USERS_SQL = r"""
SELECT event_type AS "group",
       count(DISTINCT user_id)::BIGINT AS n_distinct,
       count(user_id)::BIGINT AS total
FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1
"""


def tokenizer_unigram_vocab_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of tokenizer_unigram_vocab (the
    BPE/ANN-twin precedent): ``min_count`` above any corpus count seeds
    NO multi-char candidates, so the trained vocabulary collapses to
    the character unigram LM — logp(ch) = ln(count/total) over the
    alpha-word character stream, ordered by (final E-step count DESC,
    piece ASC). DuckDB mirrors that directly, which proves the
    word-frequency pass, the char seeding, the E-step plumbing and the
    output ordering — the same distributed path the full EM config
    exercises (operators/unigram.py unigram_train)."""
    from vectorsearch_spark.operators.unigram import unigram_train

    vocab = unigram_train(
        _t(spark, sf_dir, "documents"), vocab_size=64, max_piece_len=4,
        min_count=10**9, em_iters=1,
    )
    return spark.createDataFrame(
        [(p, round(lp, 6), i + 1) for i, (p, lp) in enumerate(vocab)],
        "piece string, logp double, rank long",
    )


TOKENIZER_UNIGRAM_VOCAB_CHARS_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS w
  FROM documents),
ch AS (
  SELECT unnest(regexp_extract_all(w, '.')) AS piece
  FROM toks WHERE regexp_matches(w, '^[a-z]+$')),
cnt AS (SELECT piece, count(*)::BIGINT AS c FROM ch GROUP BY piece),
tot AS (SELECT sum(c)::DOUBLE AS t FROM cnt)
SELECT piece, round(ln(c / t), 6) AS logp,
       row_number() OVER (ORDER BY c DESC, piece) AS rank
FROM cnt, tot
"""


def tokenizer_unigram_encode_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of tokenizer_unigram_encode: a
    fixed chars-only vocabulary admits exactly ONE segmentation per
    word (one piece per character), so the per-document witnesses
    (n_words, n_pieces, md5 of the space-joined pieces in word order)
    are SQL-derivable — proving the distinct-word Viterbi pass, the
    occurrence join-back and the order-preserving hash aggregation
    (operators/unigram.py unigram_encode)."""
    from vectorsearch_spark.operators.unigram import unigram_encode

    docs = _t(spark, sf_dir, "documents")
    vocab = [(ch, -1.0) for ch in "abcdefghijklmnopqrstuvwxyz"]
    return unigram_encode(docs, vocab, max_piece_len=1)


TOKENIZER_UNIGRAM_ENCODE_CHARS_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
  FROM documents)
SELECT doc_id,
  len(toks)::BIGINT AS n_words,
  list_sum(list_transform(toks,
      w -> CASE WHEN regexp_matches(w, '^[a-z]+$') THEN length(w) ELSE 1 END)
  )::BIGINT AS n_pieces,
  md5(array_to_string(list_transform(toks,
      w -> CASE WHEN regexp_matches(w, '^[a-z]+$')
           THEN array_to_string(regexp_extract_all(w, '.'), ' ')
           ELSE w END), ' ')) AS pieces_hash
FROM base WHERE len(toks) > 0
"""


def index_lifecycle_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible M-family lifecycle row (VERDICT r8 missing #3;
    parity with the reference's gid-stability lifecycle tests,
    api/GidCompactionStabilityTest.java:52-118): build a deterministic
    3-segment index (300 vectors, max_segment_size=100), tombstone
    gids 0-39 (M1), force-vacuum segment 0 (M2/M3: physical removal,
    count 100→60, deleted 40→0), compact segments 1+2 into a fresh
    sealed segment (M4-M6: gid-stable rewrite + seal + source drop).
    Emits the segments registry minus timestamps — a constant table
    the oracle pins: (0 SEALED 60 0), (3 SEALED 200 0)."""
    import shutil

    from vectorsearch_spark.config import IndexConfig
    from vectorsearch_spark.index import VectorIndex

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/vsidx_lifecycle_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()[0])
    cfg = IndexConfig(
        name="lifecycle", dimension=dim, max_segment_size=100, pq_m=8, pq_k=16,
        graph_degree=8, graph_build_breadth=16, oversample=4, seed=42,
    )
    idx = VectorIndex.create(spark, path, cfg)
    idx.add(emb.select("vec_id", "embedding"), order_col="vec_id")
    idx.build()
    idx.delete(list(range(0, 40)))
    idx.vacuum(0, force=True)
    idx.compact([1, 2])
    return (
        idx.segments()
        .select("seg_id", "state", "count", "deleted_count")
        .orderBy("seg_id")
    )


INDEX_LIFECYCLE_REGISTRY_SQL = r"""
SELECT seg_id::INTEGER AS seg_id, state, count::BIGINT AS count,
       deleted_count::BIGINT AS deleted_count
FROM (VALUES (0, 'SEALED', 60, 0), (3, 'SEALED', 200, 0))
     t(seg_id, state, count, deleted_count)
"""


def stream_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters (operators/sketch.py
    fold_heavy_hitters_batch): tokens arrive in two epochs split by doc
    id; the state is ONE mergeable Misra–Gries summary — O(capacity)
    forever — and reads return estimates with honest
    [est, est + total/(cap+1)] bounds. Rows-only (estimates are
    summary-dependent; the bound invariants are pytest-gated)."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_heavy_hitters_batch,
        read_heavy_hitters_state,
    )
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0))
        ).alias("token"),
    )
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"hh_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    mid = 250
    fold_heavy_hitters_batch(
        toks.where(F.col("doc_id") < mid), 0, state, "token", capacity=512
    )
    fold_heavy_hitters_batch(
        toks.where(F.col("doc_id") >= mid), 1, state, "token", capacity=512
    )
    return read_heavy_hitters_state(spark, state, k=20)


def stream_token_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of stream_token_heavy_hitters (the
    BPE/ANN/unigram twin precedent applied to the streaming fold): with
    capacity ≥ N (the total token count), a Misra–Gries summary can
    NEVER trim — no decrement ever fires anywhere in the partition/
    merge/epoch tree — so est == the exact count for every token, and
    the mergeable error bound floor(N/(capacity+1)) == 0 collapses
    [lb, ub] onto it. DuckDB mirrors the whole ranked read, proving the
    fold's partition-summary pass, the tree merge, the epoch
    merge/rewrite, the committed-epoch reader and the (est DESC, token)
    ranking — the same distributed path the production capacity runs
    (operators/sketch.py fold_heavy_hitters_batch). Cheap in the
    degenerate config because per-partition state is vocabulary-bounded
    regardless of capacity."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_heavy_hitters_batch,
        read_heavy_hitters_state,
    )
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0))
        ).alias("token"),
    )
    # capacity only needs to be ≥ N (total tokens) for the degenerate-
    # exact regime; every token is ≥ 1 char and tokens never overlap,
    # so Σ length(text) ≥ N — one narrow column aggregate instead of
    # the full regex-tokenize + explode + count pass the old
    # toks.count() sizing job ran (est/lb/ub/rank all unchanged: the
    # error bound floor(total/(capacity+1)) stays 0 for any cap ≥ N)
    capacity = int(
        min(
            max(docs.agg(F.sum(F.length("text"))).collect()[0][0] or 0, 1),
            2**31 - 1,
        )
    )
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"hhx_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    mid = 250
    fold_heavy_hitters_batch(
        toks.where(F.col("doc_id") < mid), 0, state, "token", capacity=capacity
    )
    fold_heavy_hitters_batch(
        toks.where(F.col("doc_id") >= mid), 1, state, "token", capacity=capacity
    )
    return read_heavy_hitters_state(spark, state, k=20).select(
        F.col("item").alias("token"), "est", "lb", "ub", "rank"
    )


STREAM_TOKEN_HEAVY_HITTERS_EXACT_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]')) AS token
  FROM documents),
c AS (SELECT token, count(*)::BIGINT AS est FROM toks GROUP BY token)
SELECT token, est, est AS lb, est AS ub,
       row_number() OVER (ORDER BY est DESC, token)::BIGINT AS rank
FROM c ORDER BY est DESC, token LIMIT 20
"""


def source_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-10 tokens via the PER-GROUP streaming
    heavy-hitters fold (operators/sketch.py
    fold_group_heavy_hitters_batch — one bounded Misra–Gries summary
    per group, the |groups|-bounded contract) in its degenerate-EXACT
    capacity: cap ≥ N means no summary can ever trim, so est == the
    exact (source, token) count and each group's error bound floors to
    0 — the stream_token_heavy_hitters_exact precedent applied per
    group, making the whole fold → group-keyed merge → committed-epoch
    read → per-group ranking SQL-mirrorable. Production capacities keep
    the per-group bound-invariant pytest gates."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.sketch import (
        fold_group_heavy_hitters_batch,
        read_group_heavy_hitters_state,
    )
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0))
        ).alias("token"),
    )
    # Σ length(text) ≥ N ≥ every group's N_g — the same cheap capacity
    # upper bound as stream_token_heavy_hitters_exact (per-group error
    # floors stay 0, results unchanged), minus the tokenize+count job
    capacity = int(
        min(
            max(docs.agg(F.sum(F.length("text"))).collect()[0][0] or 0, 1),
            2**31 - 1,
        )
    )
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"ghh_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    os.makedirs(state, exist_ok=True)
    mid = 250
    fold_group_heavy_hitters_batch(
        toks.where(F.col("doc_id") < mid), 0, state, "source", "token",
        capacity=capacity,
    )
    fold_group_heavy_hitters_batch(
        toks.where(F.col("doc_id") >= mid), 1, state, "source", "token",
        capacity=capacity,
    )
    return read_group_heavy_hitters_state(spark, state, k=10).select(
        "group", F.col("item").alias("token"), "est", "lb", "ub", "rank"
    )


SOURCE_TOKEN_HEAVY_HITTERS_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]')) AS token
  FROM documents),
c AS (SELECT source, token, count(*)::BIGINT AS est FROM toks GROUP BY 1, 2),
r AS (
  SELECT source AS "group", token, est, est AS lb, est AS ub,
         row_number() OVER (PARTITION BY source ORDER BY est DESC, token)::BIGINT AS rank
  FROM c)
SELECT * FROM r WHERE rank <= 10
"""


def corpus_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-20% quality cut (operators/curate.py
    select_top_fraction): score = token density (tokens per char),
    exact ceil(frac·n) keep count per source — computed by histogram
    pruning + a border-bin window, never a full per-source sort."""
    from vectorsearch_spark.operators.curate import select_top_fraction
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0)
                )
            ).cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("score"),
    )
    kept = select_top_fraction(scored, 0.2, "score", "source", "doc_id", bins=64)
    return kept.select("doc_id", "source", F.round("score", 6).alias("score"))


CORPUS_QUALITY_TOPFRAC_SQL = r"""
WITH scored AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]'))::DOUBLE
           / greatest(n_chars, 1) AS score
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM scored)
SELECT doc_id, source, round(score, 6) AS score FROM r WHERE rn <= ceil(0.2 * n)
"""


def stream_line_dedup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming line-dedup fold (operators/dedup.py
    fold_line_dedup_batch): the line corpus arrives as THREE epochs
    split by doc id; lines crossing the min_docs threshold in a later
    epoch retroactively REVISE earlier docs, so the folded view equals
    the batch operator on the full corpus — and therefore shares
    dedup_lines' exact SQL oracle (batching-independence IS the
    correctness claim). r12: keycounts state runs the BUCKETED layout
    (``state_buckets=8`` — EpochBucketedState), so the per-fold
    prior-count aggregation consumes the bucketed scan without
    exchanging the accumulated key table. r13: ADDITIVE COMPACTION runs
    between epochs 1 and 2 (``compact_line_keycounts`` — the
    marker-gated staged-swap merge of per-epoch count increments into
    one summed partition), so epoch 2's threshold math reads the
    COMPACTED state; the oracle hashing the final view is therefore an
    end-to-end proof that compaction preserved the counts."""
    import os
    import shutil
    import tempfile

    from vectorsearch_spark.operators.dedup import (
        _keycounts_state,
        compact_line_keycounts,
        fold_line_dedup_batch,
        read_line_dedup_state,
    )

    corpus = _line_corpus(spark, sf_dir)
    # fixed per-sf path, wiped per run: reruns must not see the previous
    # run's committed epochs (the regression guard would raise), and
    # mkdtemp would leak a dir per bench reputation
    tag = sf_dir.strip("/").replace("/", "_")
    state = os.path.join(tempfile.gettempdir(), f"ld_fold_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    kc = _keycounts_state(spark, state, 8)
    spark.sql(f"DROP TABLE IF EXISTS {kc.table}")
    spark.sql(f"DROP TABLE IF EXISTS {kc._stage_names()[0]}")
    os.makedirs(state, exist_ok=True)
    # split on the RAW id (not a modulo) — arrival order must equal id
    # order for the batch-operator oracle to apply (the same latent
    # large-id hazard the r11 ADVICE flagged on the URL fold)
    cuts = (170, 340)
    fold_line_dedup_batch(
        corpus.where(F.col("doc_id") < cuts[0]), 0, state, state_buckets=8
    )
    fold_line_dedup_batch(
        corpus.where(
            (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
        ),
        1, state, state_buckets=8,
    )
    compact_line_keycounts(spark, state, 8, 1)
    fold_line_dedup_batch(
        corpus.where(F.col("doc_id") >= cuts[1]), 2, state, state_buckets=8
    )
    return read_line_dedup_state(spark, state).select(
        "doc_id", "n_lines", "n_kept", "n_boiler", "kept_hash"
    )


def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provably-exact top-20 corpus tokens via Misra–Gries candidates +
    exact verification (operators/sketch.py heavy_hitters): the
    bounded-state alternative to a full-vocabulary count shuffle —
    candidates are certified to contain every token that could reach
    the top-k, then exact-counted alone."""
    from vectorsearch_spark.operators.sketch import heavy_hitters
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PIECE_RE), F.lit(0))
        ).alias("token")
    )
    return heavy_hitters(toks, "token", k=20, capacity=512).select(
        F.col("item").alias("token"), "cnt", "rank"
    )


TOKEN_HEAVY_HITTERS_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]')) AS token
  FROM documents),
c AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token)
SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token)::BIGINT AS rank
FROM c ORDER BY cnt DESC, token LIMIT 20
"""


def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection at arbitrary token offsets
    (operators/curate.py repeated_spans — the Lee et al. ExactSubstr
    pass at 20-gram granularity): run on the duplicate-injected corpus
    so whole-copy docs mark end-to-end (dup_ratio 1) and near-dup docs
    mark everything but the divergent tail window."""
    from vectorsearch_spark.operators.curate import repeated_spans

    return repeated_spans(_dedup_corpus(spark, sf_dir), span_tokens=20)


DEDUP_REPEATED_SPANS_SQL = r"""
WITH corpus AS (__CORPUS__),
base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM corpus),
nn AS (SELECT doc_id, p, len(p) AS n FROM base),
g AS (
  SELECT doc_id, p, unnest(range(0, n - 20 + 1)) AS pos
  FROM nn WHERE n >= 20),
h AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(p, pos + 1, pos + 20), ' ')) AS h
  FROM g),
k AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY h) AS c
  FROM h),
iv AS (SELECT doc_id, pos AS s, pos + 20 AS e FROM k WHERE c > 1 AND rn > 1),
m AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM iv),
grp AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS g
  FROM m),
mg AS (SELECT doc_id, g, min(s) AS s, max(e) AS e FROM grp GROUP BY 1, 2),
pd AS (
  SELECT doc_id, count(*)::BIGINT AS dup_spans, sum(e - s)::BIGINT AS dup_tokens
  FROM mg GROUP BY 1)
SELECT nn.doc_id, nn.n::BIGINT AS n_tokens,
       coalesce(pd.dup_spans, 0)::BIGINT AS dup_spans,
       coalesce(pd.dup_tokens, 0)::BIGINT AS dup_tokens,
       round(coalesce(pd.dup_tokens, 0) / greatest(nn.n, 1), 6) AS dup_ratio
FROM nn LEFT JOIN pd USING (doc_id)
""".replace("__CORPUS__", _DEDUP_CORPUS_SQL)


def dedup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the repeated-span map (operators/curate.py
    cut_repeated_spans): rewrite every document with its duplicated
    spans removed — whole copies collapse to nothing, near-dups keep
    their divergent head/tail; kept_hash witnesses the rewritten
    token stream."""
    from vectorsearch_spark.operators.curate import cut_repeated_spans

    return cut_repeated_spans(_dedup_corpus(spark, sf_dir), span_tokens=20)


DEDUP_SPAN_CUT_SQL = r"""
WITH corpus AS (__CORPUS__),
base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM corpus),
nn AS (SELECT doc_id, p, len(p) AS n FROM base),
g AS (
  SELECT doc_id, p, unnest(range(0, n - 20 + 1)) AS pos
  FROM nn WHERE n >= 20),
h AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(p, pos + 1, pos + 20), ' ')) AS h
  FROM g),
k AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY h) AS c
  FROM h),
iv AS (SELECT doc_id, pos AS s, pos + 20 AS e FROM k WHERE c > 1 AND rn > 1),
m AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM iv),
grp AS (
  SELECT doc_id, s, e,
         sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS g
  FROM m),
mg AS (SELECT doc_id, g, min(s) AS s, max(e) AS e FROM grp GROUP BY 1, 2),
pos AS (SELECT doc_id, p, unnest(range(0, n)) AS i FROM nn WHERE n > 0),
kept AS (
  SELECT pos.doc_id, i, p[CAST(i AS BIGINT) + 1] AS tok
  FROM pos LEFT JOIN mg
    ON pos.doc_id = mg.doc_id AND i >= mg.s AND i < mg.e
  WHERE mg.doc_id IS NULL),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS nk,
         md5(string_agg(tok, ' ' ORDER BY i)) AS kh
  FROM kept GROUP BY 1)
SELECT nn.doc_id, nn.n::BIGINT AS n_tokens,
       coalesce(agg.nk, 0)::BIGINT AS n_kept_tokens,
       coalesce(agg.kh, md5('')) AS kept_hash
FROM nn LEFT JOIN agg USING (doc_id)
""".replace("__CORPUS__", _DEDUP_CORPUS_SQL)


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 8-gram overlap matrix (operators/text.py
    source_overlap) — the near-mirror / leakage profiling pass that
    informs per-source budgets before mixing."""
    from vectorsearch_spark.operators.text import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"), n=8)


SOURCE_OVERLAP_MATRIX_SQL = r"""
WITH base AS (
  SELECT source AS src,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM documents),
g AS (
  SELECT DISTINCT src,
         array_to_string(list_slice(p, pos + 1, pos + 8), ' ') AS ngram
  FROM (SELECT src, p, unnest(range(0, len(p) - 8 + 1)) AS pos
        FROM base WHERE len(p) >= 8))
SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS n_shared_ngrams
FROM g a JOIN g b ON a.ngram = b.ngram AND a.src < b.src
GROUP BY 1, 2
"""


def embedding_opq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ vs plain PQ quantization quality (operators/pq.py
    opq_train — Ge et al. CVPR 2013): train both on a bounded
    driver-side sample (the codebook contract), broadcast (R,
    codebooks) into one Arrow pass, and emit per-vector reconstruction
    errors for both coders. Iterative SVD/k-means fit — no SQL oracle
    (rows-only); the improvement claim itself is gated in
    tests/test_pq.py on correlated data."""
    import numpy as np

    from vectorsearch_spark.operators.pq import (
        decode,
        encode,
        opq_train,
        train_codebook,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sample = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(2000).collect()],
        dtype=np.float64,
    )
    m, k = 8, 16
    cb_p = train_codebook(sample, m, k, iters=5, seed=42)
    rot, cb_o = opq_train(sample, m, k, iters=6, seed=42)

    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ep = ((x - decode(encode(x, cb_p), cb_p)) ** 2).sum(axis=1)
            xr = x @ rot
            eo = ((xr - decode(encode(xr, cb_o), cb_o)) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "err_pq": np.round(ep, 6),
                    "err_opq": np.round(eo, 6),
                }
            )

    return emb.mapInPandas(mapper, schema="vec_id long, err_pq double, err_opq double")


def embedding_opq_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-EXACT oracle twin of embedding_opq_quality (r10):
    zero OPQ alternations ⇒ R = I exactly (the loop never runs, Ge et
    al.'s R₀ init), and zero PQ iterations with k = sample size ⇒ each
    subspace codebook is a PERMUTATION of the 16 sample rows'
    subvectors — so the per-vector reconstruction error
    Σ_s min_c ‖x_s − c‖² is permutation-invariant and SQL-derivable
    (min over the first-16-by-vec_id rows, per 8-dim subspace). Pins
    the rotate→encode→decode→error pipeline the iterative OPQ configs
    run — the subspace split layout, the argmin encode, the decode
    lookup and the error arithmetic; the rotation-improves-error claim
    keeps its NumPy gate (tests/test_pq.py). The kmeans-assign
    iters=0 precedent applied to the PQ family."""
    import numpy as np

    from vectorsearch_spark.operators.pq import decode, encode, opq_train

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sample = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(16).collect()],
        dtype=np.float64,
    )
    rot, cb = opq_train(sample, m=8, k=16, iters=0, pq_iters=0, seed=42)

    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xr = x @ rot
            err = ((xr - decode(encode(xr, cb), cb)) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "err_opq": np.round(err, 6)}
            )

    return emb.mapInPandas(mapper, schema="vec_id long, err_opq double")


EMBEDDING_OPQ_IDENTITY_SQL = r"""
WITH c AS (
  SELECT embedding AS ce
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
s AS (SELECT unnest(range(0, 8)) AS s),
d AS (
  SELECT e.vec_id, s.s,
         min(list_reduce(list_transform(range(1, 9),
           i -> (CAST(e.embedding[s.s * 8 + i] AS DOUBLE)
                 - CAST(c.ce[s.s * 8 + i] AS DOUBLE))^2),
           (x, y) -> x + y)) AS md
  FROM embeddings e CROSS JOIN c CROSS JOIN s
  GROUP BY 1, 2)
SELECT vec_id, round(sum(md), 6) AS err_opq FROM d GROUP BY vec_id
"""


def embedding_sq8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization round-trip (operators/projection.py):
    per-dim min/max trainer (posexplode + map-side-combine, O(d)
    driver state), then a pure-codegen quantize/decode error report —
    the 4x-cheaper sibling of PQ, fully SQL-mirrored (linear
    arithmetic, unlike the iterative coders)."""
    from vectorsearch_spark.operators.projection import (
        sq8_min_max,
        sq8_roundtrip_error,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mins, maxs = sq8_min_max(emb)
    return sq8_roundtrip_error(emb, mins, maxs)


EMBEDDING_SQ8_ROUNDTRIP_SQL = r"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
pos AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i, embedding AS emb
  FROM e),
vals AS (SELECT vec_id, i, CAST(emb[CAST(i AS BIGINT)] AS DOUBLE) AS v FROM pos),
dim AS (SELECT i, min(v) AS mn, max(v) AS mx FROM vals GROUP BY 1),
rt AS (
  SELECT vec_id, v, mn,
         CASE WHEN mx > mn THEN mx - mn ELSE 1.0 END AS r
  FROM vals JOIN dim USING (i)),
err AS (
  SELECT vec_id,
         abs(v - (mn + least(255.0, greatest(0.0, round((v - mn) / r * 255))) / 255.0 * r)) AS e
  FROM rt)
SELECT vec_id, round(max(e), 6) AS max_abs_err,
       round(sum(e) / count(*), 6) AS mean_abs_err
FROM err GROUP BY vec_id
"""


def doc_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 denoising-pair generation (operators/curate.py
    span_corruption_pairs): deterministic hash-masked spans, sentinel
    inputs/targets witnessed by md5 — the objective-construction pass
    after curation."""
    from vectorsearch_spark.operators.curate import span_corruption_pairs

    return span_corruption_pairs(_t(spark, sf_dir, "documents"), mask_rate=0.15)


DOC_SPAN_CORRUPTION_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM documents),
pos AS (SELECT doc_id, unnest(range(0, len(p))) AS pos, p FROM base WHERE len(p) > 0),
tk AS (
  SELECT doc_id, pos, p[CAST(pos AS BIGINT) + 1] AS tok,
         CASE WHEN CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '|', CAST(pos AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 < 150000
              THEN 1 ELSE 0 END AS m
  FROM pos),
sp AS (
  SELECT doc_id, pos, tok, m,
         CASE WHEN m = 1 AND coalesce(lag(m) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS st
  FROM tk),
sp2 AS (
  SELECT *, sum(st) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) - 1 AS span
  FROM sp),
pieces AS (
  SELECT doc_id, pos, m, st,
         CASE WHEN m = 0 THEN tok
              WHEN st = 1 THEN concat('<extra_id_', CAST(span AS VARCHAR), '>') END AS ip,
         CASE WHEN m = 1 AND st = 1 THEN concat('<extra_id_', CAST(span AS VARCHAR), '> ', tok)
              WHEN m = 1 THEN tok END AS tp
  FROM sp2),
agg AS (
  SELECT doc_id, count(*) AS n_tokens, sum(m) AS n_masked, sum(st) AS n_spans,
         md5(coalesce(string_agg(ip, ' ' ORDER BY pos), '')) AS input_hash,
         md5(coalesce(string_agg(tp, ' ' ORDER BY pos), '')) AS target_hash
  FROM pieces GROUP BY 1)
SELECT base.doc_id,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(n_masked, 0)::BIGINT AS n_masked,
       coalesce(n_spans, 0)::BIGINT AS n_spans,
       coalesce(input_hash, md5('')) AS input_hash,
       coalesce(target_hash, md5('')) AS target_hash
FROM base LEFT JOIN agg USING (doc_id)
"""


def doc_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM prefix/suffix/middle reordering (operators/curate.py
    fim_transform): deterministic hash-drawn split points, PSM stream
    witnessed by md5 — a pure per-row codegen transform pass."""
    from vectorsearch_spark.operators.curate import fim_transform

    return fim_transform(_t(spark, sf_dir, "documents"))


DOC_FIM_TRANSFORM_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM documents),
s AS (
  SELECT doc_id, p, len(p) AS n,
         CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '|fim_a')), 1, 15)) AS BIGINT) % (len(p) + 1) AS a
  FROM base),
s2 AS (
  SELECT doc_id, p, n, a,
         a + CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '|fim_b')), 1, 15)) AS BIGINT) % (n - a + 1) AS b
  FROM s)
SELECT doc_id, n::BIGINT AS n_tokens, a::BIGINT AS split_a, b::BIGINT AS split_b,
       md5(array_to_string(
           ['<PRE>'] || list_slice(p, 1, a) || ['<SUF>'] || list_slice(p, b + 1, n)
           || ['<MID>'] || list_slice(p, a + 1, b), ' ')) AS psm_hash
FROM s2
"""


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-sampling data mix (operators/curate.py temperature_budget_mix,
    α=0.3, 15k-token target): per-source budgets ∝ size^α feed the
    deterministic hash-order cut — the multilingual rebalance pass."""
    from vectorsearch_spark.operators.curate import temperature_budget_mix

    return temperature_budget_mix(
        _t(spark, sf_dir, "documents"), alpha=0.3, total_tokens=15_000
    )


CORPUS_TEMPERATURE_MIX_SQL = r"""
WITH sized AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]'))::BIGINT AS n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS sel
  FROM documents),
src AS (SELECT source, sum(n_tokens) AS t FROM sized GROUP BY 1 HAVING sum(n_tokens) > 0),
bud AS (
  SELECT source,
         greatest(1, CAST(round(pow(t, 0.3) / (SELECT sum(pow(t, 0.3)) FROM src) * 15000) AS BIGINT)) AS budget
  FROM src),
c AS (
  SELECT s.doc_id, s.source, s.n_tokens, b.budget,
         (sum(s.n_tokens) OVER (PARTITION BY s.source ORDER BY s.sel, s.doc_id
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
  FROM sized s JOIN bud b USING (source))
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < budget
"""


_DSIR_TARGETS = ["src0", "src1", "src2"]


def corpus_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/curate.py importance_sample):
    Gumbel-top-150 of the documents by hashed-unigram log importance
    weight toward the src0-src2 target mix — the distribution-matching
    selection pass between dedup and training."""
    from vectorsearch_spark.operators.curate import importance_sample

    return importance_sample(
        _t(spark, sf_dir, "documents"), _DSIR_TARGETS, k=150
    )


CORPUS_IMPORTANCE_SAMPLE_SQL = r"""
WITH base AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]')) AS tok
  FROM documents),
pd AS (
  SELECT doc_id, source,
         CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) % 4096 AS b,
         count(*) AS c
  FROM base GROUP BY 1, 2, 3),
tgt AS (SELECT b, sum(c) AS ct FROM pd
        WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
raw AS (SELECT b, sum(c) AS cr FROM pd GROUP BY 1),
tt AS (SELECT sum(c) AS t FROM pd WHERE source IN ('src0', 'src1', 'src2')),
tr AS (SELECT sum(c) AS t FROM pd),
ratio AS (
  SELECT raw.b,
         ln((coalesce(ct, 0) + 1) / (tt.t + 4096))
         - ln((cr + 1) / (tr.t + 4096)) AS lr
  FROM raw LEFT JOIN tgt USING (b), tt, tr),
sc AS (
  SELECT doc_id, source, sum(c * lr) AS lw
  FROM pd JOIN ratio USING (b) GROUP BY 1, 2)
SELECT doc_id, source, round(lw, 6) AS logw,
       round(lw + -ln(-ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 + 0.5) / 1000000.0)), 6) AS key
FROM sc
ORDER BY key DESC, doc_id
LIMIT 150
"""


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter (operators/classify.py): logistic
    regression trained distributedly on labels from an upstream
    heuristic gate (quality_score >= 0.6 — the CCNet bootstrap: a
    rule or reference corpus labels, the model learns the smooth
    scorer), then scored as a pure codegen projection. The fit must
    recover the gate through the least/cap nonlinearities from the
    raw stats — the synthetic corpus has no text/metadata correlation,
    so a metadata label would only measure the base rate. Iterative
    float fit — no SQL oracle (rows-only); the fit is
    NumPy-model-gated in tests/test_classify.py."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.classify import logistic_fit, logistic_score
    from vectorsearch_spark.operators.text import doc_stats_cols

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", tokens("text").alias("__toks")
    ).repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    feats = [
        "n_tokens",
        "n_distinct_tokens",
        "avg_token_len",
        "stopword_ratio",
        "punct_ratio",
    ]
    # narrow (id, label, stats) rows checkpoint BEFORE the iterative
    # fit: each GD pass re-reads this frame — un-truncated, every
    # iteration would re-run the tokenizer over the corpus. Coalesced
    # to a few partitions: each pass is a handful of numbers per
    # partition, and 32 tasks × iters of scheduling floor would
    # dominate (at real scale the stats frame is still tiny relative
    # to text — partition count follows the STATS size, not the corpus)
    labeled = (
        base.select("doc_id", *doc_stats_cols("text", toks=F.col("__toks")))
        .select(
            "doc_id",
            (F.col("quality_score") >= 0.6).cast("double").alias("label"),
            *feats,
        )
        .coalesce(8)
        .localCheckpoint(eager=False)
    )
    w = logistic_fit(labeled, feats, "label", iters=8, lr=2.0, l2=1e-4)
    return logistic_score(labeled, w, feats, out_col="score").select(
        "doc_id",
        F.col("label").cast("long").alias("label"),
        F.round("score", 6).alias("score"),
    )


def corpus_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global trigram counts with threshold pruning
    (operators/text.py ngram_lm_counts) — KenLM-style LM count
    collection; map-side combine collapses repeats pre-shuffle."""
    from vectorsearch_spark.operators.text import ngram_lm_counts

    return ngram_lm_counts(_t(spark, sf_dir, "documents"), n=3, min_count=5)


CORPUS_NGRAM_LM_SQL = r"""
WITH base AS (
  SELECT regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS p
  FROM documents),
g AS (
  SELECT array_to_string(list_slice(p, pos + 1, pos + 3), ' ') AS ngram
  FROM (SELECT p, unnest(range(0, len(p) - 3 + 1)) AS pos
        FROM base WHERE len(p) >= 3))
SELECT ngram, count(*)::BIGINT AS n_occurrences
FROM g GROUP BY 1 HAVING count(*) >= 5
"""


def training_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle into 16 shards (operators/curate.py
    shuffle_shards): the reproducible order-randomization pass before
    writing training shards."""
    from vectorsearch_spark.operators.curate import shuffle_shards

    return shuffle_shards(_t(spark, sf_dir, "documents"), n_shards=16, seed=0)


TRAINING_SHUFFLE_SHARDS_SQL = r"""
WITH s AS (
  SELECT doc_id,
         md5(concat('0|', CAST(doc_id AS VARCHAR))) AS hex,
         CAST(concat('0x', substring(md5(concat('0|', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 16 AS shard_id
  FROM documents)
SELECT doc_id, shard_id,
       (row_number() OVER (PARTITION BY shard_id ORDER BY hex, doc_id))::BIGINT AS pos_in_shard
FROM s
"""


_MIX_BUDGETS = {f"src{i}": (700 if i < 10 else 400) for i in range(20)}


def corpus_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing sampler (operators/curate.py token_budget_mix):
    per-source token budgets filled in deterministic hash order — the
    recipe-to-training-set pass. Budgets are set so every source is
    truncated at sf0.01 (partial selection is the interesting path);
    the oracle is the naive full-sort cumulative cut, which the
    margin-prefiltered implementation must equal exactly."""
    from vectorsearch_spark.operators.curate import token_budget_mix

    return token_budget_mix(_t(spark, sf_dir, "documents"), _MIX_BUDGETS)


def _mix_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(_MIX_BUDGETS.items())
    )
    return rf"""
WITH sized AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '''[a-z]{{1,2}}|[a-z]+|[0-9]{{1,3}}|[^a-z0-9\s]'))::BIGINT AS n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS sel,
         CASE source {cases} ELSE NULL END AS budget
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens, budget,
         (sum(n_tokens) OVER (PARTITION BY source ORDER BY sel, doc_id
                              ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
  FROM sized WHERE budget IS NOT NULL)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens - n_tokens < budget
"""


def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count estimators (whitespace / BPE-ish pieces / subword
    estimate) — the sizing pass before sampling/packing."""
    from vectorsearch_spark.operators.text import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


# mirrors operators/text.py token_counts: BPE piece regex + the
# 1-per-piece + extra-split-per-4-chars alphabetic subword estimate
DOC_TOKEN_COUNTS_SQL = r"""
WITH base AS (
  SELECT doc_id, text, trim(text) AS t,
         regexp_extract_all(lower(text), '''[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\s]') AS pieces
  FROM documents)
SELECT doc_id,
       CASE WHEN length(t) = 0 THEN 0
            ELSE len(regexp_split_to_array(t, '\s+')) END::BIGINT AS n_ws_tokens,
       len(pieces)::BIGINT AS n_pieces,
       list_aggregate(list_prepend(CAST(0 AS BIGINT), list_transform(pieces,
         p -> 1 + CASE WHEN regexp_matches(p, '^[a-z]')
                       THEN (length(p) - 1) // 4 ELSE 0 END)), 'sum')::BIGINT AS n_subword_est
FROM base
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (top-{2,3}-gram fraction) over
    docs with ≥ 3 tokens — a shuffle-free narrow pass (the doc-local
    sorted-run mode count in operators/text.py _max_run). Oracle is an
    independent formulation: unnest + GROUP BY max-count per doc."""
    from vectorsearch_spark.operators.text import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    # ≥3-token gate applied on the mapper's own n_tokens output — a
    # pre-filter on size(tokens(text)) would run the tokenizer regex a
    # second full time JVM-side just to count (the r5 form; this shape
    # tokenizes once, inside the Arrow pass)
    return repetition_stats(docs, ns=(2, 3)).where(F.col("n_tokens") >= 3)


DOC_REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks
  FROM documents),
base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t WHERE len(toks) >= 3),
g2 AS (
  SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
         i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))) AS g
  FROM base),
a2 AS (
  SELECT doc_id, sum(c) AS total, max(c) AS best
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
g3 AS (
  SELECT doc_id, unnest(list_transform(range(0, len(toks) - 2),
         i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) AS g
  FROM base),
a3 AS (
  SELECT doc_id, sum(c) AS total, max(c) AS best
  FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(a2.total AS BIGINT) AS n_2grams,
       round(CAST(a2.best AS DOUBLE) / a2.total, 4) AS top_2gram_frac,
       CAST(a3.total AS BIGINT) AS n_3grams,
       round(CAST(a3.best AS DOUBLE) / a3.total, 4) AS top_3gram_frac
FROM base b JOIN a2 USING (doc_id) JOIN a3 USING (doc_id)
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan/redaction over the corpus with DETERMINISTIC synthetic
    PII injected (the corpus itself is PII-free, which would make the
    gate vacuous): docs get an email / IPv4 / phone appended keyed on
    doc_id residues, mirrored literally in the oracle."""
    from vectorsearch_spark.operators.text import pii_scan

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".25"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit(" call +1-555-867-5309")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(injected)


def _pii_sql() -> str:
    from vectorsearch_spark.operators.text import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH injected AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' host 10.0.' || (doc_id % 256) || '.25' ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN ' call +1-555-867-5309' ELSE '' END AS text
  FROM documents),
red AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IPV4_RE}', '<IP>', 'g') AS r
  FROM injected)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
       (len(regexp_extract_all(text, '{EMAIL_RE}'))
        + len(regexp_extract_all(text, '{PHONE_RE}'))
        + len(regexp_extract_all(text, '{IPV4_RE}'))) > 0 AS has_pii,
       CAST(length(r) AS BIGINT) AS redacted_len,
       md5(r) AS redacted_md5
FROM red
"""


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan over the dedup corpus: benchmark set = the
    base docs with doc_id % 10 = 0 (whose verbatim copies exist in the
    corpus under doc_id+1000000 — those must flag at contamination
    1.0); broadcast bench-gram array, zero corpus shuffle."""
    from vectorsearch_spark.operators.dedup import benchmark_overlap

    corpus = _dedup_corpus(spark, sf_dir)
    bench = corpus.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 1000000)
    )
    return benchmark_overlap(corpus, bench, n=3, flag_threshold=0.5)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_dedup_corpus(spark, sf_dir))


DEDUP_EXACT_SQL = f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL})
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       count(*) AS n_copies, CAST(min(doc_id) AS BIGINT) AS keeper_id
FROM corpus GROUP BY 1 HAVING count(*) > 1
"""

_SHINGLE_SQL = f"""
    list_distinct(list_transform(
      range(0, greatest(len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) - 3, 0) + 1),
      i -> array_to_string(list_slice(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}'), i + 1, i + 3), ' ')))
"""


BENCH_CONTAMINATION_SQL = f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
sh AS (SELECT doc_id, {_SHINGLE_SQL} AS grams FROM corpus),
bg AS (
  SELECT DISTINCT unnest(grams) AS g FROM sh
  WHERE doc_id % 10 = 0 AND doc_id < 1000000),
bl AS (SELECT list(g ORDER BY g) AS bench_grams FROM bg WHERE length(g) > 0),
calc AS (
  SELECT doc_id, len(grams) AS n_grams,
         len(list_filter(grams, x -> list_contains(bench_grams, x))) AS n_overlap
  FROM sh, bl),
rated AS (
  SELECT doc_id, n_grams, n_overlap,
         CASE WHEN n_grams > 0
              THEN round(CAST(n_overlap AS DOUBLE) / n_grams, 4)
              ELSE 0.0 END AS contamination
  FROM calc)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_overlap AS BIGINT) AS n_overlap,
       contamination, contamination >= 0.5 AS flagged
FROM rated
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _dedup_corpus(spark, sf_dir), num_hashes=16, bands=8, threshold=0.5
    )


DEDUP_MINHASH_SQL = f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM corpus),
sh2 AS (SELECT * FROM sh WHERE len(shingles) > 0),
sig AS (
  -- one md5 per shingle; family member i = (h1 + i*h2) mod P with
  -- P = 2^31-1 and h1/h2 the digest's two 60-bit halves reduced mod P
  -- (mirrors operators/dedup.py minhash_lsh_pairs)
  SELECT doc_id, shingles,
         list_transform(range(0, 16),
           i -> list_aggregate(list_transform(shingles,
             s -> (CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % 2147483647
                   + i * (CAST(concat('0x', substring(md5(s), 17, 15)) AS BIGINT) % 2147483647))
                  % 2147483647), 'min')) AS sig
  FROM sh2),
bands AS (
  SELECT doc_id, shingles,
         unnest(list_transform(range(0, 8),
           b -> b || '|' || md5(array_to_string(list_slice(sig, b * 2 + 1, b * 2 + 2), ',')))) AS band_key
  FROM sig),
-- hot-band-bucket cap, mirroring operators/dedup.py _cap_band_freq
bands2 AS (
  SELECT * FROM bands QUALIFY count(*) OVER (PARTITION BY band_key) <= 5000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands2 a JOIN bands2 b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
verified AS (
  SELECT doc_a, doc_b,
         CAST(len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s))) AS DOUBLE)
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))) AS jaccard
  FROM cand JOIN sh2 sa ON sa.doc_id = doc_a JOIN sh2 sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard
FROM verified WHERE jaccard >= 0.5
"""


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) MinHash-LSH dedup: the injected
    copies/near-dups play the NEW batch, the original documents the
    accepted corpus — the production per-ingest shape, no self-join."""
    from vectorsearch_spark.operators.dedup import incremental_minhash_pairs

    full = _dedup_corpus(spark, sf_dir)
    return incremental_minhash_pairs(
        full.filter(F.col("doc_id") >= 1000000),
        full.filter(F.col("doc_id") < 1000000),
        num_hashes=16,
        bands=8,
        threshold=0.5,
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM corpus),
sh2 AS (SELECT * FROM sh WHERE len(shingles) > 0),
sig AS (
  SELECT doc_id, shingles,
         list_transform(range(0, 16),
           i -> list_aggregate(list_transform(shingles,
             s -> (CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT) % 2147483647
                   + i * (CAST(concat('0x', substring(md5(s), 17, 15)) AS BIGINT) % 2147483647))
                  % 2147483647), 'min')) AS sig
  FROM sh2),
bands AS (
  SELECT doc_id, shingles,
         unnest(list_transform(range(0, 8),
           b -> b || '|' || md5(array_to_string(list_slice(sig, b * 2 + 1, b * 2 + 2), ',')))) AS band_key
  FROM sig),
-- hot-band cap applied PER SIDE (each side runs _cap_band_freq on its own buckets)
bands2 AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_key, doc_id >= 1000000) <= 5000),
cand AS (
  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
  FROM bands2 a JOIN bands2 b ON a.band_key = b.band_key
  WHERE a.doc_id >= 1000000 AND b.doc_id < 1000000),
verified AS (
  SELECT batch_id, corpus_id,
         CAST(len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s))) AS DOUBLE)
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))) AS jaccard
  FROM cand JOIN sh2 sa ON sa.doc_id = batch_id JOIN sh2 sb ON sb.doc_id = corpus_id)
SELECT batch_id, corpus_id, round(jaccard, 4) AS jaccard
FROM verified WHERE jaccard >= 0.5
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup pairs:
    per-doc cluster assignment + keeper selection (the step a real
    dedup pipeline runs AFTER pair generation). Oracle: DuckDB
    recursive-CTE transitive closure with min-label roots."""
    from vectorsearch_spark.operators.dedup import duplicate_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _dedup_corpus(spark, sf_dir), num_hashes=16, bands=8, threshold=0.5
    )
    return duplicate_clusters(pairs)


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({DEDUP_MINHASH_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS doc FROM edges),
reach(doc, r) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT reach.doc, e.dst FROM reach JOIN edges e ON e.src = reach.r),
assign AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM assign GROUP BY cluster_id)
SELECT CAST(doc AS BIGINT) AS doc_id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size, doc = a.cluster_id AS is_keeper
FROM assign a JOIN sizes s ON s.cluster_id = a.cluster_id
"""


_JACCARD_DF_CAP = 1000


def dedup_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs under the default stop-shingle df cap
    (the 100 TB-safe configuration); the oracle mirrors the cap."""
    from vectorsearch_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        _dedup_corpus(spark, sf_dir), threshold=0.7, max_shingle_freq=_JACCARD_DF_CAP
    )


# mirrors jaccard_pairs exactly: shingles with document frequency >
# _JACCARD_DF_CAP are dropped from the intersection join only (the
# union denominator keeps full shingle-set sizes).
DEDUP_JACCARD_SQL = f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
sh AS (SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM corpus),
sh2 AS (SELECT * FROM sh WHERE len(shingles) > 0),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh2),
cold AS (
  SELECT shingle FROM ex GROUP BY 1 HAVING count(*) <= {_JACCARD_DF_CAP}),
ex2 AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN cold USING (shingle)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM ex2 a JOIN ex2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh2),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard
FROM pairs WHERE jaccard >= 0.7
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs; the DuckDB oracle mirrors the banded
    algorithm bit-exactly (hex→BIGINT md5 token hashes, 60 per-bit
    majority votes, 15-bit band join, bit_count Hamming verify)."""
    from vectorsearch_spark.operators.dedup import simhash_pairs

    # max_hamming=3 is the 4×15-bit banding guarantee radius; looser
    # radii explode on template-generated corpora (shared vocabulary)
    return simhash_pairs(_dedup_corpus(spark, sf_dir), max_hamming=3)


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h & {1 << j}) != 0)) >= n "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(60)
    )
    return f"""
WITH corpus AS ({_DEDUP_CORPUS_SQL}),
toks AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS t
  FROM corpus),
hashed AS (
  SELECT doc_id,
         list_transform(t, s -> CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)) AS hs,
         len(t) AS n
  FROM toks WHERE len(t) > 0),
fp AS (SELECT doc_id, {bit_terms} AS simhash FROM hashed),
keys AS (
  SELECT doc_id, simhash, b, (simhash >> (b * 15)) & 32767 AS bk
  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS b)),
-- hot-band-bucket cap, mirroring operators/dedup.py _cap_band_freq
keys2 AS (
  SELECT * FROM keys QUALIFY count(*) OVER (PARTITION BY b, bk) <= 5000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         a.simhash AS sa, c.simhash AS sb
  FROM keys2 a JOIN keys2 c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints over documents."""
    from vectorsearch_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"))


DOC_FINGERPRINTS_SQL = f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS toks
  FROM documents),
hashed AS (
  SELECT doc_id, len(toks) AS nt,
         list_transform(toks,
           t -> CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 1048576) AS th
  FROM base WHERE len(toks) >= 5),
kg AS (
  SELECT doc_id, len(th) - 4 AS nk,
         list_transform(range(1, len(th) - 4 + 1),
           i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(0, 5), j -> th[i + j])),
                (acc, v) -> acc * 31 + v)) AS kh
  FROM hashed),
wins AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(nk - 3, 1) + 1),
           s -> list_aggregate(kh[s : s + 3], 'min'))) AS fps
  FROM kg)
SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM wins
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated against an EXACT all-pairs oracle, so this wrapper
    pins ``exact_pair_limit`` above the bench corpus size: the
    deterministic exact path runs here, keeping the gate immune to the
    LSH path's ≈1e-4 per-pair candidate-miss probability (which would
    make an exact-compare flaky by construction at larger SF). Unbounded
    callers get the LSH default — the operator's scale path — and its
    recall is separately gated in tests/test_text_dedup.py."""
    from vectorsearch_spark.operators.dedup import embedding_near_dup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dup)
    # row bound: covers the bench corpora (sf0.1 → 2080 rows); beyond it
    # the wrapper would fall back to LSH and the oracle would need the
    # rows-only gate instead
    return embedding_near_dup(corpus, threshold=0.95, exact_pair_limit=10_000)


DEDUP_EMBEDDING_SQL = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 25 = 0),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN sqrt({_duck_dot("a.embedding", "a.embedding")}) = 0
                OR sqrt({_duck_dot("b.embedding", "b.embedding")}) = 0 THEN 0.0
              ELSE {_duck_dot("a.embedding", "b.embedding")}
                   / (sqrt({_duck_dot("a.embedding", "a.embedding")}) * sqrt({_duck_dot("b.embedding", "b.embedding")}))
         END AS cos
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cos, 4) AS cosine FROM pairs WHERE cos >= 0.95
"""


# ---------------------------------------------------------------------------
# Streaming-operator queries, run in batch mode (the operators are
# batch/stream agnostic; streaming-specific semantics — watermarks,
# state timeouts, micro-batch ingest — are covered in tests/
# test_streaming.py, which this registry can't express).
# ---------------------------------------------------------------------------

def customer_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric-delete (SymSpell) edit-distance join over customer
    names (operators/dedup.py edit_distance_pairs). The oracle is the
    independent brute formulation — full pairwise levenshtein with a
    length pre-filter — feasible at oracle SF, while the Spark plan is
    the deletion-key blocked join that survives shared-prefix key
    spaces (every name here shares 'Customer#…', the adversarial case
    for prefix blocking). max_key_freq=None: names are near-unique, so
    no bucket cap is needed and completeness is exact."""
    from vectorsearch_spark.operators.dedup import edit_distance_pairs

    cust = _t(spark, sf_dir, "customer")
    return edit_distance_pairs(
        cust, id_col="c_custkey", text_col="c_name", max_key_freq=None
    ).orderBy("key_a", "key_b")


CUSTOMER_FUZZY_SQL = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY key_a, key_b
"""


def customer_name_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/centrality.py) over the fuzzy-name pair
    graph — corpus-curation centrality: rank mass concentrates on
    densely-duplicated records. Oracle is the same fixed-point UNROLLED
    into plain SQL (10 chained CTEs, one per iteration — no recursive
    aggregation needed), over the independently-formulated brute
    levenshtein pair graph; both sides round(6) the converged ranks."""
    from vectorsearch_spark.operators.centrality import pagerank
    from vectorsearch_spark.operators.dedup import edit_distance_pairs

    cust = _t(spark, sf_dir, "customer")
    pairs = edit_distance_pairs(
        cust, id_col="c_custkey", text_col="c_name", max_key_freq=None
    ).select(F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b"))
    return (
        pagerank(pairs, damping=0.85, iters=10)
        .select(F.col("node").cast("long").alias("node"), F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )


def _pagerank_sql(pairs_cte: str, iters: int = 10, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL: one CTE per
    iteration (recursive CTEs cannot aggregate, so unrolling is the
    oracle-able formulation)."""
    sql = f"WITH pairs AS ({pairs_cte}),\n"
    sql += (
        "edges AS (SELECT key_a AS src, key_b AS dst FROM pairs "
        "UNION SELECT key_b, key_a FROM pairs),\n"
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),\n"
        "nodes AS (SELECT src AS node FROM deg),\n"
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),\n"
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes),\n"
    )
    for i in range(1, iters + 1):
        sql += (
            f"r{i} AS (SELECT nodes.node, "
            f"(1-{d})/(SELECT n FROM nn) + {d} * COALESCE(s.inbound, 0.0) AS rank "
            f"FROM nodes LEFT JOIN ("
            f"SELECT e.dst, sum(r.rank/deg.deg) AS inbound FROM edges e "
            f"JOIN r{i-1} r ON r.node = e.src JOIN deg ON deg.src = e.src "
            f"GROUP BY e.dst) s ON s.dst = nodes.node),\n"
        )
    return (
        sql.rstrip(",\n")
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{iters} ORDER BY node"
    )


_FUZZY_PAIRS_CTE = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) <= 1
"""

CUSTOMER_PAGERANK_SQL = _pagerank_sql(_FUZZY_PAIRS_CTE, iters=10, d=0.85)


def stream_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event rollup (streaming twin of
    events_hourly_rollup) — 1h windows align to epoch hours, so the
    oracle is date_trunc."""
    from vectorsearch_spark.streaming.rollup import stream_events_rollup

    ev = _events(spark, sf_dir)
    return stream_events_rollup(ev).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


STREAM_ROLLUP_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch form of the stateful streaming
    operator): 30-minute inactivity gap per user."""
    from vectorsearch_spark.streaming.rollup import sessionize_batch

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    return sessionize_batch(ev, gap_seconds=1800.0).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "sum_value",
    )


SESSION_WINDOWS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM numbered GROUP BY user_id, sess
"""


def events_error_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/events.py): each error event matched
    into its user's containing session window, on the BINNED plan with
    an explicit bin width — the session gap (1800 s) bounds typical
    session length here, and passing it skips the auto mode's
    approxQuantile sketch ACTION over the right side (a measured
    ~0.15 s pre-plan job; auto stays the API default for callers who
    don't know their interval distribution). The binned plan is
    output-identical to unbinned for ANY bin width (equivalence test
    in test_events_asof.py), so this is purely a cost choice.
    The operator's end bound is exclusive, so sessions pass end+1µs;
    the oracle independently uses inclusive BETWEEN."""
    from vectorsearch_spark.operators.events import interval_join
    from vectorsearch_spark.streaming.rollup import sessionize_batch

    ev = _events(spark, sf_dir)
    sessions = sessionize_batch(
        ev.select("user_id", "ts", "value"), gap_seconds=1800.0
    ).select(
        "user_id",
        "session_start",
        F.timestamp_micros(F.unix_micros("session_end") + 1).alias("session_end_x"),
        "session_end",
        "n_events",
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(
        errors,
        sessions,
        on="user_id",
        ts="ts",
        start="session_start",
        end="session_end_x",
        bin_seconds=1800,
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


EVENTS_ERROR_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked),
sessions AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM numbered GROUP BY user_id, sess)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(s.session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(s.session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       s.n_events
FROM events e JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts BETWEEN s.session_start AND s.session_end
WHERE e.event_type = 'error'
"""


def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→click attribution: each purchase joined to the LATEST
    click at-or-before it by the same user (backward as-of join,
    operators/events.py — union + window, one shuffle per side).

    Oracle is an independent formulation: a correlated LATERAL top-1
    lookup per purchase, deterministic under ts ties via the
    (ts DESC, event_id DESC) order mirrored by the operator's
    (kind, tiebreak) window order."""
    from vectorsearch_spark.operators.events import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        payload=["event_id"],
        prefix="click_",
        tiebreak="event_id",
        how="inner",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_value",
        "click_event_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        (F.unix_millis(F.col("ts")) - F.unix_millis(F.col("click_ts")))
        .cast("long")
        .alias("lag_ms"),
    )


EVENTS_ASOF_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(p.value, 4) AS purchase_value,
       m.click_event_id,
       strftime(m.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       CAST(epoch_ms(p.ts) - epoch_ms(m.click_ts) AS BIGINT) AS lag_ms
FROM p, LATERAL (
  SELECT c.event_id AS click_event_id, c.ts AS click_ts
  FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) m
"""


def events_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join, oracle-checked: each view attached to the
    EARLIEST purchase at-or-after it by the same user, nulled when the
    gap exceeds 1 h (tolerance) — time-to-convert analysis.  Same
    union+carry plan as the backward join on a sign-flipped ordering
    (operators/events.py direction='forward').  Oracle is the
    independent LEFT JOIN LATERAL nearest-future formulation; at equal
    candidate timestamps the operator's max-tiebreak contract mirrors
    (ts ASC, event_id DESC)."""
    from vectorsearch_spark.operators.events import asof_join

    ev = _events(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        views,
        purchases,
        on="user_id",
        ts="ts",
        payload=["event_id"],
        prefix="purchase_",
        tiebreak="event_id",
        how="left",
        tolerance_ms=3_600_000,
        direction="forward",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_event_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        (F.unix_millis(F.col("purchase_ts")) - F.unix_millis(F.col("ts")))
        .cast("long")
        .alias("gap_ms"),
    )


EVENTS_NEXT_PURCHASE_SQL = """
WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
p AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT v.event_id, v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       m.purchase_event_id,
       strftime(m.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(epoch_ms(m.purchase_ts) - epoch_ms(v.ts) AS BIGINT) AS gap_ms
FROM v LEFT JOIN LATERAL (
  SELECT p.event_id AS purchase_event_id, p.ts AS purchase_ts
  FROM p WHERE p.user_id = v.user_id AND p.ts >= v.ts
            AND p.ts <= v.ts + INTERVAL 1 HOUR
  ORDER BY p.ts ASC, p.event_id DESC LIMIT 1) m ON TRUE
"""


# ---------------------------------------------------------------------------
# Multimodal queries (operators/multimodal.py): documents' ASCII text
# doubles as a deterministic binary payload, so the full binary→decode→
# feature mapInPandas plumbing is oracle-checked byte-exactly (the fake
# decoder's uint8 view of UTF-8 text == DuckDB ascii() per char; all
# arithmetic is over integer-valued doubles, hence order-exact).
# ---------------------------------------------------------------------------

def _mm_media(spark: SparkSession, sf_dir: str):
    from vectorsearch_spark.operators.multimodal import attach_media_metadata

    # ascii-fold before encoding: the oracles index CHARACTERS
    # (ascii(text[i]), length(text)); one '?' per non-ASCII char makes
    # byte and codepoint semantics agree by construction (both engines
    # run the same code-point regexp)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(
            F.regexp_replace("text", r"[^\x00-\x7f]", "?"), "UTF-8"
        ).alias("payload"),
    )
    return attach_media_metadata(docs, id_col="doc_id", payload_col="payload")


def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mm_media(spark, sf_dir).select(
        "media_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
    )


MM_METADATA_SQL = """
SELECT doc_id AS media_id, 'image' AS media_type,
       64 + length(text) % 64                 AS width,
       64 + (length(text) // 64) % 64         AS height,
       1 + length(text) % 30                  AS n_frames,
       CAST(16000 AS BIGINT)                  AS sample_rate
FROM documents
"""


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.multimodal import extract_features, fake_decoder

    feats = extract_features(_mm_media(spark, sf_dir), decoder=fake_decoder, feature_dim=8)
    return feats.select(
        "media_id", "n_bytes", F.posexplode("feature").alias("pos", "val")
    ).select(
        "media_id",
        "n_bytes",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("val").cast("double"), 4).alias("val"),
    )


# mirrors fake_decoder + extract_features exactly: truncate to
# (n // floor(sqrt(n))) * floor(sqrt(n)) bytes, zero-pad to a multiple
# of 8, chunk-mean, cast to FLOAT (same IEEE rounding as numpy f32).
MM_FEATURES_SQL = """
WITH src AS (
  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text
  FROM documents),
base AS (
  SELECT doc_id AS media_id, length(text) AS n,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ascii(text[i]) AS DOUBLE)) AS bytes
  FROM src),
trunc AS (
  SELECT media_id, n,
         CASE WHEN n = 0 THEN [0.0]
              ELSE bytes[1 : (n // greatest(CAST(floor(sqrt(n)) AS BIGINT), 1))
                             * greatest(CAST(floor(sqrt(n)) AS BIGINT), 1)]
         END AS arr
  FROM base),
padded AS (
  SELECT media_id, n,
         list_concat(arr, list_transform(range(1, ((len(arr) + 7) // 8) * 8 - len(arr) + 1), x -> 0.0)) AS arr,
         ((len(arr) + 7) // 8) AS m
  FROM trunc),
feat AS (
  SELECT media_id, n, m,
         unnest(range(0, 8)) AS pos,
         unnest(list_transform(range(0, 8),
           i -> CAST(CAST(list_aggregate(arr[i * m + 1 : (i + 1) * m], 'sum') AS DOUBLE) / m AS FLOAT))) AS val
  FROM padded)
SELECT media_id, CAST(n AS BIGINT) AS n_bytes, CAST(pos AS BIGINT) AS pos,
       round(CAST(val AS DOUBLE), 4) AS val
FROM feat
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectorsearch_spark.operators.multimodal import fake_decoder, sample_frames

    frames = sample_frames(
        _mm_media(spark, sf_dir), every_nth=10, max_frames=8, decoder=fake_decoder
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("payload").cast("long").alias("frame_bytes"),
    )


MM_FRAMES_SQL = """
WITH base AS (
  SELECT doc_id AS media_id, length(text) AS n,
         greatest(CAST(floor(sqrt(length(text))) AS BIGINT), 1) AS w
  FROM documents),
shaped AS (
  SELECT media_id,
         CASE WHEN n = 0 THEN 1 ELSE n // w END AS n_rows,
         CASE WHEN n = 0 THEN 1 ELSE w END AS w
  FROM base)
SELECT media_id, CAST(unnest(list_slice(range(0, n_rows, 10), 1, 8)) AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS frame_bytes
FROM shaped
"""


def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec end-to-end (functions/codecs.py): deterministic RGB
    pixels derived from each document's bytes are wrapped in actual
    24-bit BMP containers by the shipped encoder, then parsed back by
    the shipped decoder (pixel-offset field, bottom-up rows, BGR order,
    4-byte row padding) inside one narrow Arrow pass. The oracle
    recomputes size/mean/position-weighted checksum straight from the
    text bytes — a decoder that mis-handles any container quirk
    hash-fails (the checksum is raster-order-sensitive). The handcrafted
    -bytes pytest covers encoder/decoder-symmetric bugs."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_media, encode_bmp

    from vectorsearch_spark.operators.text import fan_out

    # CPU-bound pure-Python codec work: spread the (often single-file)
    # documents scan to cluster width first, or the whole pass runs in
    # one task (measured 15.5 s -> ~2 s for mm_mjpeg_frames at sf0.1)
    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def mapper(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                w, h = 5 + did % 12, 4 + did % 9
                k = np.arange(w * h * 3)
                pix = b[k % len(b)] if len(b) else np.zeros(k.size, dtype=np.uint8)
                data = encode_bmp(pix.reshape(h, w, 3))
                dec = decode_media(data)  # the real container parse
                flat = dec.astype(np.int64).ravel()
                rows.append(
                    (
                        int(did),
                        len(data),
                        dec.shape[1],
                        dec.shape[0],
                        float(flat.sum()) / flat.size,
                        int(((np.arange(flat.size) + 1) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "bmp_bytes", "width", "height", "mean_px", "checksum"],
            )

    out = docs.mapInPandas(
        mapper,
        "media_id long, bmp_bytes long, width long, height long, "
        "mean_px double, checksum long",
    )
    return out.select(
        "media_id", "bmp_bytes", "width", "height",
        F.round("mean_px", 4).alias("mean_px"), "checksum",
    )


def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG codec end-to-end: the same deterministic pixels as
    mm_image_decode, wrapped in real PNG containers with the scanline
    filter CYCLING over doc_id % 5 — across the corpus every unfilter
    path (None/Sub/Up/Average/Paeth) must reconstruct exactly or the
    position-weighted checksum hash-fails against the oracle, which
    recomputes it straight from the source bytes (byte size is
    compression-dependent, hence not an output column)."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_media, encode_png

    from vectorsearch_spark.operators.text import fan_out

    # CPU-bound pure-Python codec work: spread the (often single-file)
    # documents scan to cluster width first, or the whole pass runs in
    # one task (measured 15.5 s -> ~2 s for mm_mjpeg_frames at sf0.1)
    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def mapper(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                w, h = 5 + did % 12, 4 + did % 9
                k = np.arange(w * h * 3)
                pix = b[k % len(b)] if len(b) else np.zeros(k.size, dtype=np.uint8)
                data = encode_png(pix.reshape(h, w, 3), row_filter=int(did) % 5)
                dec = decode_media(data)
                flat = dec.astype(np.int64).ravel()
                rows.append(
                    (
                        int(did),
                        dec.shape[1],
                        dec.shape[0],
                        float(flat.sum()) / flat.size,
                        int(((np.arange(flat.size) + 1) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_px", "checksum"]
            )

    out = docs.mapInPandas(
        mapper, "media_id long, width long, height long, mean_px double, checksum long"
    )
    return out.select(
        "media_id", "width", "height", F.round("mean_px", 4).alias("mean_px"), "checksum"
    )


def mm_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO modality end-to-end with a REAL codec
    (functions/codecs.py encode_wav/decode_wav — RIFF/WAVE PCM 16-bit,
    chunk-walking parser): deterministic int16 samples derived from
    each document's bytes are wrapped in actual WAV containers (mono /
    stereo cycling by doc_id), parsed back, and reduced to exact
    integer features — sample count, channel count, energy (sum of
    squares) and zero-crossing count on channel 0. PCM is lossless, so
    the DuckDB oracle recomputes every feature straight from the text
    bytes; a parser bug in chunk walking, interleave, or sign handling
    hash-fails."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_wav, encode_wav

    from vectorsearch_spark.operators.text import fan_out

    # CPU-bound pure-Python codec work: spread the (often single-file)
    # documents scan to cluster width first, or the whole pass runs in
    # one task (measured 15.5 s -> ~2 s for mm_mjpeg_frames at sf0.1)
    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def mapper(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                ch = 1 + did % 2
                ns = 200 + did % 100
                k = np.arange(ns * ch)
                base = b[k % len(b)].astype(np.int32) if len(b) else np.zeros(ns * ch, dtype=np.int32)
                v = ((base - 128) * 256 + (k % 127)).astype(np.int16)
                data = encode_wav(v.reshape(ns, ch), sample_rate=8000 + 1000 * (did % 3))
                dec, rate = decode_wav(data)  # the real RIFF parse
                c0 = dec[:, 0].astype(np.int64)
                zc = int(((c0[:-1] * c0[1:]) < 0).sum())
                rows.append(
                    (
                        int(did),
                        dec.shape[0],
                        dec.shape[1],
                        rate,
                        int((dec.astype(np.int64) ** 2).sum()),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "channels", "rate", "energy", "zero_cross"],
            )

    return docs.mapInPandas(
        mapper,
        "media_id long, n_samples long, channels long, rate long, "
        "energy long, zero_cross long",
    )


MM_WAV_FEATURES_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         1 + doc_id % 2 AS ch, 200 + doc_id % 100 AS ns,
         8000 + 1000 * (doc_id % 3) AS rate
  FROM documents),
samp AS (
  SELECT media_id, ch, ns, rate,
         list_transform(range(0, ns * ch),
           k -> ((CASE WHEN n = 0 THEN 0 ELSE ascii(text[CAST(k % n AS BIGINT) + 1]) END) - 128) * 256
                + k % 127) AS v
  FROM base),
feat AS (
  SELECT media_id, ns, ch, rate,
         CAST(list_aggregate(list_transform(v, x -> CAST(x AS BIGINT) * x), 'sum') AS BIGINT) AS energy,
         CAST(list_aggregate(
           list_transform(range(1, ns),
             i -> CASE WHEN CAST(v[CAST((i - 1) * ch AS BIGINT) + 1] AS BIGINT)
                            * v[CAST(i * ch AS BIGINT) + 1] < 0 THEN 1 ELSE 0 END),
           'sum') AS BIGINT) AS zero_cross
  FROM samp)
SELECT media_id, CAST(ns AS BIGINT) AS n_samples, CAST(ch AS BIGINT) AS channels,
       CAST(rate AS BIGINT) AS rate, energy, zero_cross
FROM feat
"""


def mm_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral audio features (operators/multimodal.py
    extract_audio_features): the same deterministic WAV corpus as
    mm_wav_features through the real RIFF codec, reduced to duration /
    RMS / zero-crossing rate / FFT spectral centroid. Rows-only entry —
    the DFT has no tractable SQL form; an exact NumPy-model equality
    test gates it (tests/test_multimodal.py)."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import encode_wav
    from vectorsearch_spark.operators.multimodal import extract_audio_features
    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                ch = 1 + did % 2
                ns = 200 + did % 100
                k = np.arange(ns * ch)
                base = b[k % len(b)].astype(np.int32) if len(b) else np.zeros(ns * ch, dtype=np.int32)
                v = ((base - 128) * 256 + (k % 127)).astype(np.int16)
                rows.append(
                    (int(did), encode_wav(v.reshape(ns, ch), sample_rate=8000 + 1000 * (did % 3)))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return extract_audio_features(media)


def mm_audio_dft_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-exact DFT twin for the audio-spectral family (r11 —
    operators/multimodal.py audio_spectral_bins): the same WAV corpus
    as mm_audio_spectral (ascii-replace folded so the char-codepoint
    oracle matches byte semantics by construction) through the REAL
    RIFF codec and the REAL ``np.fft.rfft`` kernel, reduced to the
    N=8 bins whose twiddle factors are ±1/0 — DC, quarter frequency,
    Nyquist — where int16 inputs make the float FFT integer-exact
    (asserted, then rounded to long). The DuckDB twin recomputes the
    three bins as literal signed sums over the channel-0 samples it
    derives straight from the text characters: a WAV interleave bug, a
    channel-order swap, an FFT sign-convention drift or an off-by-one
    in the sample window all hash-fail. Closes the last
    no-oracle-of-any-form family: every registry family is now pinned
    by at least one exact oracle."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import encode_wav
    from vectorsearch_spark.operators.multimodal import audio_spectral_bins
    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                ch = 1 + did % 2
                ns = 200 + did % 100
                k = np.arange(ns * ch)
                base = (
                    b[k % len(b)].astype(np.int32)
                    if len(b)
                    else np.zeros(ns * ch, dtype=np.int32)
                )
                v = ((base - 128) * 256 + (k % 127)).astype(np.int16)
                rows.append(
                    (
                        int(did),
                        encode_wav(
                            v.reshape(ns, ch), sample_rate=8000 + 1000 * (did % 3)
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return audio_spectral_bins(media, n_fft=8)


# channel-0 sample n lives at flat index n·ch of the interleaved
# stream: s_n = (code[(n·ch) % len] − 128)·256 + (n·ch) % 127
MM_AUDIO_DFT_BINS_SQL = """
WITH base AS (
  SELECT doc_id AS media_id, length(text) AS n, 1 + doc_id % 2 AS ch,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
samp AS (
  SELECT media_id,
         list_transform(range(0, 8),
           j -> ((CASE WHEN n = 0 THEN 0
                       ELSE codes[CAST((j * ch) % n AS BIGINT) + 1] END) - 128) * 256
                + (j * ch) % 127) AS s
  FROM base),
bins AS (
  SELECT media_id, 0 AS bin,
         CAST(s[1]+s[2]+s[3]+s[4]+s[5]+s[6]+s[7]+s[8] AS BIGINT) AS re,
         CAST(0 AS BIGINT) AS im
  FROM samp
  UNION ALL
  SELECT media_id, 2,
         CAST(s[1]-s[3]+s[5]-s[7] AS BIGINT),
         CAST(-s[2]+s[4]-s[6]+s[8] AS BIGINT)
  FROM samp
  UNION ALL
  SELECT media_id, 4,
         CAST(s[1]-s[2]+s[3]-s[4]+s[5]-s[6]+s[7]-s[8] AS BIGINT),
         CAST(0 AS BIGINT)
  FROM samp)
SELECT media_id, CAST(bin AS BIGINT) AS bin, re, im,
       re * re + im * im AS mag_sq
FROM bins
"""


def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio near-dup dedup (r11 — the audio granularity of
    the dedup story, completing the modality symmetry: text has seven,
    image landed this round): deterministic mono WAVs from the
    documents table (520 samples, the mm synthesis formula), PLUS an
    additive-ripple variant (s + (j % 5) − 2, the near-tie
    perturbation) for every third doc → REAL RIFF decode →
    ``audio_energy_hash`` 64-bit frame-energy gradient fingerprints →
    ``dedup.bitstring_near_dup`` (8-band multi-index candidate join,
    recall-complete for Hamming ≤ 7, codegen verify, min-id keeper).
    All-integer end to end; the DuckDB twin recomputes samples →
    energies → bits for BOTH variants from the source characters and
    takes the ALL-PAIRS Hamming ≤ 7 min."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import encode_wav
    from vectorsearch_spark.operators.dedup import bitstring_near_dup
    from vectorsearch_spark.operators.multimodal import audio_energy_hash

    docs = _media_docs(spark, sf_dir)

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                j = np.arange(520)
                base = (
                    b[j % len(b)].astype(np.int64)
                    if len(b)
                    else np.zeros(520, dtype=np.int64)
                )
                v = (base - 128) * 256 + (j % 127)
                rows.append(
                    (
                        int(did) * 2,
                        encode_wav(
                            np.clip(v, -32768, 32767).astype(np.int16).reshape(-1, 1),
                            sample_rate=8000,
                        ),
                    )
                )
                if did % 3 == 0:
                    w = v + (j % 5) - 2
                    rows.append(
                        (
                            int(did) * 2 + 1,
                            encode_wav(
                                np.clip(w, -32768, 32767).astype(np.int16).reshape(-1, 1),
                                sample_rate=8000,
                            ),
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    eh = audio_energy_hash(media)
    out = bitstring_near_dup(
        eh, id_col="media_id", hash_col="ehash", n_bits=64, max_hamming=7
    )
    return out.select(
        "media_id",
        F.col("keep").cast("long").alias("keep"),
        F.col("min_neighbor_id").cast("long").alias("min_neighbor_id"),
    )


MM_AUDIO_NEARDUP_SQL = """
WITH d AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
media AS (
  SELECT doc_id * 2 AS media_id, 0 AS var, n, codes FROM d
  UNION ALL
  SELECT doc_id * 2 + 1, 1, n, codes FROM d WHERE doc_id % 3 = 0),
samp AS (
  SELECT media_id,
         list_transform(range(0, 520),
           j -> greatest(least(
                  ((CASE WHEN n = 0 THEN 0
                         ELSE codes[CAST(j % n AS BIGINT) + 1] END) - 128) * 256
                  + j % 127 + var * ((j % 5) - 2), 32767), -32768)) AS s
  FROM media),
en AS (
  SELECT media_id,
         list_transform(range(0, 65),
           f -> list_aggregate(list_transform(range(0, 8),
                  j -> s[CAST(f * 8 + j AS BIGINT) + 1]
                       * s[CAST(f * 8 + j AS BIGINT) + 1]), 'sum')) AS e
  FROM samp),
bits AS (
  SELECT media_id,
         list_transform(range(0, 64),
           i -> CASE WHEN e[CAST(i AS BIGINT) + 2] > e[CAST(i AS BIGINT) + 1]
                THEN 1 ELSE 0 END) AS bl
  FROM en),
pairs AS (
  SELECT a.media_id AS ida, b.media_id AS idb
  FROM bits a JOIN bits b ON a.media_id <> b.media_id
  WHERE CAST(list_aggregate(list_transform(range(0, 64),
          i -> CASE WHEN a.bl[CAST(i AS BIGINT) + 1] <> b.bl[CAST(i AS BIGINT) + 1]
               THEN 1 ELSE 0 END), 'sum') AS INT) <= 7),
nb AS (SELECT ida AS media_id, min(idb) AS mn FROM pairs GROUP BY 1)
SELECT m.media_id,
       CAST(CASE WHEN least(m.media_id, coalesce(nb.mn, m.media_id)) = m.media_id
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(least(m.media_id, coalesce(nb.mn, m.media_id)) AS BIGINT) AS min_neighbor_id
FROM bits m LEFT JOIN nb ON nb.media_id = m.media_id
"""


def bucketed_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via BUCKETED tables
    (operators/layout.py write_bucketed): orders and lineitem are
    persisted once per sf_dir as managed tables hash-bucketed by the
    join key into the same bucket count, then joined bucket-to-bucket —
    the executed join plans with ZERO shuffle exchanges (plan guard in
    tests/test_layout.py); only the final 5-row aggregate exchanges.
    The one-time layout cost amortizes across every subsequent query on
    the key — the Hive-bucketing / Iceberg-bucket-transform trade. The
    oracle is the plain join (bucketing changes layout, never
    semantics)."""
    import re as _re

    from vectorsearch_spark.operators.layout import write_bucketed

    tag = _re.sub(r"[^0-9a-zA-Z]", "_", sf_dir.strip("/"))
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    if not spark.catalog.tableExists(lt) or not spark.catalog.tableExists(ot):
        li = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("okey"), "l_extendedprice", "l_discount"
        )
        od = _t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("okey"), "o_orderpriority"
        )
        write_bucketed(li, lt, "okey", 8)
        write_bucketed(od, ot, "okey", 8)
    j = spark.table(lt).join(spark.table(ot), "okey")
    return j.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


BUCKETED_REVENUE_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def mm_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full image pipeline chain with REAL codecs at every stage:
    deterministic pixels → encode_bmp → the ACTUAL resize_images
    operator (decode_media → nearest-neighbor resample to 8×6 →
    encode_bmp) → decode_media again → position-weighted checksum.
    Nearest-neighbor sampling is pure integer arithmetic
    (src_y = y·h_in // 6, src_x = x·w_in // 8), so the DuckDB oracle
    recomputes the resized raster straight from the text bytes — any
    container bug OR resample off-by-one hash-fails."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_media, encode_bmp
    from vectorsearch_spark.operators.multimodal import resize_images
    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                # ascii-replace: char-codepoint oracle ≡ byte semantics
                # by construction (see mm_image_dhash)
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                w, h = 5 + did % 12, 4 + did % 9
                k = np.arange(w * h * 3)
                pix = b[k % len(b)] if len(b) else np.zeros(k.size, dtype=np.uint8)
                rows.append((int(did), encode_bmp(pix.reshape(h, w, 3))))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    resized = resize_images(
        media, out_width=8, out_height=6, decoder=decode_media, encoder=encode_bmp
    )

    def checksum(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = decode_media(bytes(payload)).astype(np.int64).ravel()
                rows.append((int(mid), int(((np.arange(a.size) + 1) * a).sum())))
            yield pd.DataFrame(rows, columns=["media_id", "checksum"])

    return resized.mapInPandas(checksum, "media_id long, checksum long").select(
        "media_id", "checksum"
    )


def mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image fingerprinting (r10 — operators/multimodal.py
    image_dhash, Krawetz 2013): deterministic BMPs from the documents
    table (the mm_resize synthesis) → REAL decode → integer ITU-601
    luma → nearest-neighbor 9×8 resample → horizontal-gradient bits.
    Every step is integer arithmetic, so the oracle recomputes the full
    hash straight from the source characters (ascii-replace folded on
    BOTH sides, so byte and codepoint indexing agree by construction)
    with no codec anywhere — a container bug, a channel-order swap, a
    luma rounding change or a resample off-by-one all hash-fail. The
    corpus-scale near-dup pass is ``mm_image_neardup`` (dedup.py
    bitstring_near_dup over these bits)."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_media, encode_bmp
    from vectorsearch_spark.operators.multimodal import image_dhash
    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                # ascii-replace, not utf-8: the oracle indexes CHARACTER
                # codepoints, and 'replace' maps any non-ASCII char to
                # one '?' (63) — byte semantics and char semantics agree
                # BY CONSTRUCTION, not by corpus luck
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                w, h = 5 + did % 12, 4 + did % 9
                k = np.arange(w * h * 3)
                pix = b[k % len(b)] if len(b) else np.zeros(k.size, dtype=np.uint8)
                rows.append((int(did), encode_bmp(pix.reshape(h, w, 3))))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return image_dhash(media, decoder=decode_media).select(
        "media_id", "dhash", "n_gradient_bits"
    )


MM_IMAGE_DHASH_SQL = """
WITH base AS (
  SELECT doc_id AS media_id, length(text) AS n,
         5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
gray AS (
  SELECT media_id,
    list_transform(range(0, 72),
      k -> CASE WHEN n = 0 THEN 0 ELSE
        (299 * codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 0) % n AS BIGINT) + 1]
       + 587 * codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 1) % n AS BIGINT) + 1]
       + 114 * codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 2) % n AS BIGINT) + 1]) // 1000
      END) AS g
  FROM base),
bits AS (
  SELECT media_id,
    list_transform(range(0, 64),
      i -> CASE WHEN g[CAST((i // 8) * 9 + (i % 8) AS BIGINT) + 2]
                   > g[CAST((i // 8) * 9 + (i % 8) AS BIGINT) + 1]
           THEN 1 ELSE 0 END) AS b
  FROM gray)
SELECT media_id,
       list_aggregate(list_transform(b, x -> CAST(x AS VARCHAR)), 'string_agg', '') AS dhash,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS n_gradient_bits
FROM bits
"""


def mm_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END perceptual image near-dup dedup (r11 — the composed
    operator the r10 fingerprint was one step short of): deterministic
    BMPs from the documents table, PLUS a brightness-shifted
    recompression-style variant (+16 per channel, clipped at 255) for
    every third doc → REAL decode → ``image_dhash`` 64-bit gradient
    fingerprints → ``dedup.bitstring_near_dup``: exact-dup collapse,
    8-band multi-index-hash candidate join (recall-COMPLETE for
    Hamming ≤ 7 by pigeonhole), chunked conv/xor/bit_count codegen
    verify, min-id keeper aggregate (the dedup_embedding_radius
    shape). All-integer end to end, so the DuckDB twin recomputes the
    dhash chain from the source characters for BOTH variants and takes
    the ALL-PAIRS Hamming ≤ 7 min — a missed candidate band, a verify
    off-by-one, or a keeper-convention drift all hash-fail. Text dedup
    has seven granularities; this is the image granularity."""
    from vectorsearch_spark.functions.codecs import decode_media
    from vectorsearch_spark.operators.dedup import bitstring_near_dup
    from vectorsearch_spark.operators.multimodal import image_dhash

    media = _neardup_media(spark, sf_dir)
    dh = image_dhash(media, decoder=decode_media)
    out = bitstring_near_dup(
        dh, id_col="media_id", hash_col="dhash", n_bits=64, max_hamming=7
    )
    return out.select(
        "media_id", F.col("keep").cast("long").alias("keep"), "min_neighbor_id"
    )


def _media_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text) source rows for the media near-dup corpora,
    honouring the ``SPARK_GRAFT_MEDIA_DOCS`` cap that bench.py sets:
    the near-dup entries' cost is almost entirely REAL codec
    encode+decode CPU (fixed-cost work already scale-proven by the
    10× probes), and uncapped they dominated suite wall with the
    suite's widest host variance (r11 verdict). Correctness runs never
    set the cap, so oracle parity always covers the full corpus."""
    import os

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cap = int(os.environ.get("SPARK_GRAFT_MEDIA_DOCS", "0"))
    if cap > 0:
        d = d.where(F.col("doc_id") < cap)
    from vectorsearch_spark.operators.text import fan_out

    return fan_out(d, "doc_id")


def _neardup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared image-near-dup corpus: deterministic BMPs from the
    documents table plus a brightness-shifted (+16, clipped at 255)
    recompression-style variant for every third doc — the input of
    ``mm_image_neardup`` (64-bit) and ``mm_image_neardup_256``."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import encode_bmp

    docs = _media_docs(spark, sf_dir)

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                w, h = 5 + did % 12, 4 + did % 9
                k = np.arange(w * h * 3)
                pix = b[k % len(b)] if len(b) else np.zeros(k.size, dtype=np.uint8)
                rows.append((int(did) * 2, encode_bmp(pix.reshape(h, w, 3))))
                if did % 3 == 0:
                    shifted = np.minimum(pix.astype(np.int64) + 16, 255).astype(
                        np.uint8
                    )
                    rows.append(
                        (int(did) * 2 + 1, encode_bmp(shifted.reshape(h, w, 3)))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return docs.mapInPandas(build, "media_id long, payload binary")


def mm_image_neardup_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BILLION-IMAGE configuration of the image near-dup pass (r12
    — the escape hatch ``bitstring_near_dup``'s own scale note names,
    now tested rather than just documented): the same BMP corpus →
    ``image_dhash(hash_size=16)`` 256-BIT fingerprints →
    ``bitstring_near_dup(n_bits=256, bands=8)`` — 32-bit bands, so
    per-band bucket cardinality is bounded by 2³² instead of the
    64-bit/8-band configuration's 256 (which degenerates into a
    quadratic bucket at ~10⁹ images). Still recall-complete for
    Hamming ≤ 7 by pigeonhole (8 bands ≥ max_hamming+1); the codegen
    verify runs 8 conv/xor/bit_count chunks instead of 2. The DuckDB
    twin recomputes the FULL 17×16-grid dhash chain from the source
    characters and takes the all-pairs Hamming ≤ 7 min over the
    256-bit strings."""
    from vectorsearch_spark.functions.codecs import decode_media
    from vectorsearch_spark.operators.dedup import bitstring_near_dup
    from vectorsearch_spark.operators.multimodal import image_dhash

    media = _neardup_media(spark, sf_dir)
    dh = image_dhash(media, decoder=decode_media, hash_size=16)
    out = bitstring_near_dup(
        dh, id_col="media_id", hash_col="dhash", n_bits=256, max_hamming=7, bands=8
    )
    return out.select(
        "media_id", F.col("keep").cast("long").alias("keep"), "min_neighbor_id"
    )


MM_IMAGE_NEARDUP_SQL = """
WITH d AS (
  SELECT doc_id, length(text) AS n, 5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
media AS (
  SELECT doc_id * 2 AS media_id, 0 AS shift, n, w, h, codes FROM d
  UNION ALL
  SELECT doc_id * 2 + 1 AS media_id, 16 AS shift, n, w, h, codes
  FROM d WHERE doc_id % 3 = 0),
gray AS (
  SELECT media_id,
    list_transform(range(0, 72),
      k -> (299 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 0) % n AS BIGINT) + 1] END) + shift, 255)
          + 587 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 1) % n AS BIGINT) + 1] END) + shift, 255)
          + 114 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) * 3 + 2) % n AS BIGINT) + 1] END) + shift, 255)
           ) // 1000) AS g
  FROM media),
bits AS (
  SELECT media_id,
    list_transform(range(0, 64),
      i -> CASE WHEN g[CAST((i // 8) * 9 + (i % 8) AS BIGINT) + 2]
                   > g[CAST((i // 8) * 9 + (i % 8) AS BIGINT) + 1]
           THEN 1 ELSE 0 END) AS bl
  FROM gray),
pairs AS (
  SELECT a.media_id AS ida, b.media_id AS idb
  FROM bits a JOIN bits b ON a.media_id <> b.media_id
  WHERE CAST(list_aggregate(list_transform(range(0, 64),
          i -> CASE WHEN a.bl[CAST(i AS BIGINT) + 1] <> b.bl[CAST(i AS BIGINT) + 1]
               THEN 1 ELSE 0 END), 'sum') AS INT) <= 7),
nb AS (SELECT ida AS media_id, min(idb) AS mn FROM pairs GROUP BY 1)
SELECT m.media_id,
       CAST(CASE WHEN least(m.media_id, coalesce(nb.mn, m.media_id)) = m.media_id
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(least(m.media_id, coalesce(nb.mn, m.media_id)) AS BIGINT) AS min_neighbor_id
FROM bits m LEFT JOIN nb ON nb.media_id = m.media_id
"""


# the 256-bit twin of MM_IMAGE_NEARDUP_SQL: hash_size 16 → a 17×16
# sample grid (272 gray values), 256 gradient bits, same all-pairs
# Hamming ≤ 7 min-id oracle. Grid arithmetic: gray k → y = (k//17)·h//16,
# x = (k%17)·w//17; bit i → compares gray[(i//16)·17 + i%16 + 1] vs +0
# (list indices 1-based).
def mm_image_neardup_256_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION configuration of the 256-bit image near-dup pass
    (r13 — the r12 verdict's one super-linear plan, fixed): identical
    to ``mm_image_neardup_256`` but with the hot-band cap ON
    (``max_band_freq=16``). The uncapped entry is measured
    super-linear on this synthetic corpus because correlated
    fingerprints share whole 32-bit bands (74× candidate-pair growth
    at 10× data); the cap drops any band bucket larger than 16
    DISTINCT hashes before the self-join, restoring the linear plan —
    and the semantics stay EXACT under the multi-index contract: a
    pair is reported iff it agrees on at least one QUIET band
    (bucket ≤ cap). The DuckDB twin implements precisely that
    contract — per-band bucket counts over distinct hashes, candidate
    pairs only through quiet buckets, Hamming ≤ 7 verify — so this
    entry is hash-exact, not rows-only: capping is a semantics,
    not an approximation, once the oracle speaks it."""
    from vectorsearch_spark.functions.codecs import decode_media
    from vectorsearch_spark.operators.dedup import bitstring_near_dup
    from vectorsearch_spark.operators.multimodal import image_dhash

    media = _neardup_media(spark, sf_dir)
    dh = image_dhash(media, decoder=decode_media, hash_size=16)
    out = bitstring_near_dup(
        dh, id_col="media_id", hash_col="dhash", n_bits=256, max_hamming=7,
        bands=8, max_band_freq=16,
    )
    return out.select(
        "media_id", F.col("keep").cast("long").alias("keep"), "min_neighbor_id"
    )


MM_IMAGE_NEARDUP_256_SQL = """
WITH d AS (
  SELECT doc_id, length(text) AS n, 5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
media AS (
  SELECT doc_id * 2 AS media_id, 0 AS shift, n, w, h, codes FROM d
  UNION ALL
  SELECT doc_id * 2 + 1 AS media_id, 16 AS shift, n, w, h, codes
  FROM d WHERE doc_id % 3 = 0),
gray AS (
  SELECT media_id,
    list_transform(range(0, 272),
      k -> (299 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 17) * h // 16) * w + ((k % 17) * w // 17)) * 3 + 0) % n AS BIGINT) + 1] END) + shift, 255)
          + 587 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 17) * h // 16) * w + ((k % 17) * w // 17)) * 3 + 1) % n AS BIGINT) + 1] END) + shift, 255)
          + 114 * least((CASE WHEN n = 0 THEN 0 ELSE codes[CAST(((((k // 17) * h // 16) * w + ((k % 17) * w // 17)) * 3 + 2) % n AS BIGINT) + 1] END) + shift, 255)
           ) // 1000) AS g
  FROM media),
bits AS (
  SELECT media_id,
    list_transform(range(0, 256),
      i -> CASE WHEN g[CAST((i // 16) * 17 + (i % 16) AS BIGINT) + 2]
                   > g[CAST((i // 16) * 17 + (i % 16) AS BIGINT) + 1]
           THEN 1 ELSE 0 END) AS bl
  FROM gray),
pairs AS (
  SELECT a.media_id AS ida, b.media_id AS idb
  FROM bits a JOIN bits b ON a.media_id <> b.media_id
  WHERE CAST(list_aggregate(list_transform(range(0, 256),
          i -> CASE WHEN a.bl[CAST(i AS BIGINT) + 1] <> b.bl[CAST(i AS BIGINT) + 1]
               THEN 1 ELSE 0 END), 'sum') AS INT) <= 7),
nb AS (SELECT ida AS media_id, min(idb) AS mn FROM pairs GROUP BY 1)
SELECT m.media_id,
       CAST(CASE WHEN least(m.media_id, coalesce(nb.mn, m.media_id)) = m.media_id
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(least(m.media_id, coalesce(nb.mn, m.media_id)) AS BIGINT) AS min_neighbor_id
FROM bits m LEFT JOIN nb ON nb.media_id = m.media_id
"""


MM_IMAGE_NEARDUP_256_CAPPED_SQL = MM_IMAGE_NEARDUP_256_SQL[
    : MM_IMAGE_NEARDUP_256_SQL.index("pairs AS (")
] + """hs AS (SELECT media_id, array_to_string(bl, '') AS h FROM bits),
g AS (SELECT h, min(media_id) AS g_min FROM hs GROUP BY h),
bands AS (
  SELECT g.h, g.g_min, t.b,
         substring(g.h, CAST(t.b * 32 + 1 AS BIGINT), 32) AS bk
  FROM g, range(0, 8) t(b)),
quiet AS (SELECT b, bk FROM bands GROUP BY b, bk HAVING count(*) <= 16),
cand AS (
  SELECT DISTINCT a.h AS ha, a.g_min AS ma, c.h AS hb, c.g_min AS mb
  FROM bands a
  JOIN quiet q ON a.b = q.b AND a.bk = q.bk
  JOIN bands c ON c.b = q.b AND c.bk = q.bk AND a.h < c.h),
pairs AS (
  SELECT ha, ma, hb, mb FROM cand
  WHERE CAST(list_aggregate(list_transform(range(1, 257),
        i -> CASE WHEN substring(ha, CAST(i AS BIGINT), 1)
                   <> substring(hb, CAST(i AS BIGINT), 1)
             THEN 1 ELSE 0 END), 'sum') AS INT) <= 7),
nbrh AS (
  SELECT h, min(nm) AS nbr_min FROM (
    SELECT ha AS h, mb AS nm FROM pairs
    UNION ALL SELECT hb AS h, ma AS nm FROM pairs) u GROUP BY h)
SELECT s.media_id,
       CAST(CASE WHEN least(g.g_min, coalesce(nbrh.nbr_min, g.g_min))
                      = s.media_id
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(least(g.g_min, coalesce(nbrh.nbr_min, g.g_min)) AS BIGINT)
         AS min_neighbor_id
FROM hs s JOIN g ON g.h = s.h LEFT JOIN nbrh ON nbrh.h = s.h
"""


MM_RESIZE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id, length(text) AS n,
         5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h,
         list_transform(range(0, length(text)),
           i -> CASE WHEN ascii(text[CAST(i AS BIGINT) + 1]) < 128
                     THEN ascii(text[CAST(i AS BIGINT) + 1]) ELSE 63 END) AS codes
  FROM documents),
pix AS (
  SELECT media_id, n, w, h,
         list_transform(range(0, 8 * 6 * 3),
           k -> CASE WHEN n = 0 THEN 0 ELSE codes[
                  CAST(((((k // 24) * h // 6) * w
                         + (((k % 24) // 3) * w // 8)) * 3 + k % 3) % n AS BIGINT) + 1
                ] END) AS p
  FROM base)
SELECT media_id,
       CAST(list_aggregate(
         list_transform(range(0, 8 * 6 * 3), k -> (k + 1) * p[CAST(k AS BIGINT) + 1]),
         'sum') AS BIGINT) AS checksum
FROM pix
"""


def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JPEG codec end-to-end (functions/jpeg.py, ITU-T T.81
    baseline): pixels are GRAY-VALUED (R=G=B) and CONSTANT per 8×8
    block, derived from each document's bytes — with an all-ones
    quantization table a constant block is a single integer DC
    coefficient, so the DCT→quantize→Huffman→IDCT round trip is EXACT;
    gray pixels are additionally a YCbCr fixed point (Cb=Cr=128), so
    the COLOR paths are exact too. The coding mode cycles doc_id % 3
    over grayscale / color 4:4:4 / color 4:2:0 — across the corpus
    every entropy path (both DC/AC Huffman table pairs, MCU interleave,
    chroma box down/up-sampling) must reconstruct exactly or the
    position-weighted checksum hash-fails against the oracle, which
    recomputes it straight from the source bytes with no JPEG anywhere.
    Lossy behavior on arbitrary images is pytest-gated (tolerance
    round-trips in tests/test_multimodal.py)."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.codecs import decode_media
    from vectorsearch_spark.functions.jpeg import encode_jpeg

    from vectorsearch_spark.operators.text import fan_out

    # CPU-bound pure-Python codec work: spread the (often single-file)
    # documents scan to cluster width first, or the whole pass runs in
    # one task (measured 15.5 s -> ~2 s for mm_mjpeg_frames at sf0.1)
    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def mapper(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                bw, bh = 1 + did % 4, 1 + did % 3  # blocks
                blocks = np.arange(bw * bh)
                vals = (
                    b[blocks % len(b)] if len(b) else np.zeros(bw * bh, dtype=np.uint8)
                ).reshape(bh, bw)
                gray = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                mode = did % 3
                if mode == 0:
                    data = encode_jpeg(gray, quant=1)
                else:
                    rgb = np.repeat(gray[..., None], 3, axis=2)
                    data = encode_jpeg(
                        rgb, quant=1, subsampling="4:4:4" if mode == 1 else "4:2:0"
                    )
                dec = decode_media(data)  # the real entropy decode
                flat = dec.astype(np.int64).ravel()
                rows.append(
                    (
                        int(did),
                        dec.shape[1],
                        dec.shape[0],
                        float(flat.sum()) / flat.size,
                        int(((np.arange(flat.size) + 1) * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_px", "checksum"]
            )

    out = docs.mapInPandas(
        mapper, "media_id long, width long, height long, mean_px double, checksum long"
    )
    return out.select(
        "media_id", "width", "height", F.round("mean_px", 4).alias("mean_px"), "checksum"
    )


def mm_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path end-to-end: per document an M-JPEG stream
    (concatenated baseline JPEGs — the raw MJPEG-over-HTTP / AVI 'MJPG'
    payload form) of 3-6 block-constant gray frames is built by the
    shipped encoder, then the ACTUAL ``sample_frames`` operator runs
    with ``decoder=decode_mjpeg`` (frame-boundary walk must skip
    entropy-coded data — a naive FFD9 scan mis-splits on stuffed
    bytes), keeping every 2nd frame up to 2; a final narrow pass
    checksums each sampled frame's raster payload. Same exactness
    contract as mm_jpeg_decode (constant 8×8 blocks, q=1, gray
    YCbCr fixed point; coding mode cycles doc_id % 3), so the DuckDB
    oracle recomputes the per-frame checksums straight from document
    bytes."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.jpeg import decode_mjpeg, encode_mjpeg
    from vectorsearch_spark.operators.multimodal import sample_frames

    from vectorsearch_spark.operators.text import fan_out

    docs = fan_out(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                bw, bh = 1 + did % 3, 1 + did % 2
                nf = 3 + did % 4
                nb = bw * bh
                frames = []
                for f in range(nf):
                    idx = (f * nb + np.arange(nb)) % len(b) if len(b) else None
                    vals = (
                        b[idx] if idx is not None else np.zeros(nb, dtype=np.uint8)
                    ).reshape(bh, bw)
                    gray = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                    mode = did % 3
                    frames.append(
                        gray if mode == 0 else np.repeat(gray[..., None], 3, axis=2)
                    )
                sub = "4:2:0" if did % 3 == 2 else "4:4:4"
                rows.append((int(did), encode_mjpeg(frames, quant=1, subsampling=sub)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    sampled = sample_frames(media, every_nth=2, max_frames=2, decoder=decode_mjpeg)

    def checksum(batches):
        for pdf in batches:
            rows = []
            for mid, fi, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                rows.append(
                    (int(mid), int(fi), a.size, int(((np.arange(a.size) + 1) * a).sum()))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_bytes", "checksum"]
            )

    return sampled.mapInPandas(
        checksum, "media_id long, frame_idx long, n_bytes long, checksum long"
    )


# frames 0 and 2 always exist (n_frames >= 3); raster is (h, w, 3)
# uint8 regardless of coding mode (grayscale replicates), so n_bytes
# and the position-weighted checksum are mode-independent
MM_MJPEG_FRAMES_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
  FROM documents),
frames AS (
  SELECT media_id, text, n, bw, bh, unnest([0, 2]) AS frame_idx FROM base),
pix AS (
  SELECT media_id, frame_idx, bw * 8 AS w, bh * 8 AS h,
         list_transform(range(0, bw * 8 * bh * 8 * 3),
           k -> CASE WHEN n = 0 THEN 0 ELSE ascii(text[
                  CAST((frame_idx * bw * bh
                        + ((k // (bw * 8 * 3)) // 8) * bw
                        + (((k % (bw * 8 * 3)) // 3) // 8)) % n AS BIGINT) + 1
                ]) END) AS p
  FROM frames)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(w * h * 3 AS BIGINT) AS n_bytes,
       CAST(list_aggregate(
         list_transform(range(0, w * h * 3), k -> (k + 1) * p[CAST(k AS BIGINT) + 1]),
         'sum') AS BIGINT) AS checksum
FROM pix
"""


def mm_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL M-JPEG video (r12 —
    operators/multimodal.py video_scene_cuts): per document a 6-9
    frame stream with SCENE STRUCTURE — frames within a 3-frame scene
    share their base block bytes plus a tiny per-frame wiggle (+f%3,
    clipped), scene boundaries jump to fresh bytes — is built by the
    shipped encoder, decoded back by the shipped M-JPEG decoder, and
    the integer luma-sum difference detector flags cuts at
    |Δ| > 384 = 64·max_blocks, the largest possible within-scene step,
    so a within-scene flag is impossible by construction while byte
    jumps at boundaries usually (data-dependently) trip. All-integer
    end to end (block-constant q=1 JPEG is exact; R=G=B makes luma ≡
    the block value), so the DuckDB twin recomputes every frame's
    luma sum straight from the document bytes and applies the same
    lag/threshold — agreement covers the codec round-trip, the frame
    walk, AND the detector. The per-clip segmentation downstream is
    ``sum(is_cut) over (order by frame_idx)``."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.jpeg import decode_mjpeg, encode_mjpeg
    from vectorsearch_spark.operators.multimodal import video_scene_cuts

    docs = _media_docs(spark, sf_dir)

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                bw, bh = 1 + did % 3, 1 + did % 2
                nb = bw * bh
                nf = 6 + did % 4
                frames = []
                for f in range(nf):
                    sc = f // 3
                    if len(b):
                        idx = (sc * nb + np.arange(nb)) % len(b)
                        vals = b[idx].astype(np.int64)
                    else:
                        vals = np.zeros(nb, dtype=np.int64)
                    vals = np.minimum(vals + f % 3, 255).astype(np.uint8)
                    gray = np.kron(
                        vals.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8)
                    )
                    mode = did % 3
                    frames.append(
                        gray if mode == 0 else np.repeat(gray[..., None], 3, axis=2)
                    )
                sub = "4:2:0" if did % 3 == 2 else "4:4:4"
                rows.append(
                    (int(did), encode_mjpeg(frames, quant=1, subsampling=sub))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return video_scene_cuts(media, decoder=decode_mjpeg, threshold=384)


def mm_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END video near-dup dedup (r12 — completing the modality
    symmetry: text has seven granularities, image and audio landed
    r11, video lands here): deterministic 33-frame single-block M-JPEG
    videos from the documents table, PLUS a brightness-shifted
    re-encode-style variant (+16 per pixel, clipped at 255) for every
    third doc → REAL M-JPEG decode → ``video_luma_hash`` 32-bit
    frame-luma gradient fingerprints (exactly invariant to uniform
    brightness shifts until clipping — the audio gain-invariance
    argument) → ``dedup.bitstring_near_dup`` with 4 bands of 8 bits:
    recall-complete for Hamming ≤ 3 by pigeonhole, chunked codegen
    verify, min-id keeper. All-integer end to end, so the DuckDB twin
    recomputes the luma-order bits for BOTH variants straight from the
    document bytes and takes the ALL-PAIRS Hamming ≤ 3 min."""
    import numpy as np
    import pandas as pd

    from vectorsearch_spark.functions.jpeg import decode_mjpeg, encode_mjpeg
    from vectorsearch_spark.operators.dedup import bitstring_near_dup
    from vectorsearch_spark.operators.multimodal import video_luma_hash

    docs = _media_docs(spark, sf_dir)
    NF = 33

    def build(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii", "replace"), dtype=np.uint8)
                vals = (
                    b[np.arange(NF) % len(b)].astype(np.int64)
                    if len(b)
                    else np.zeros(NF, dtype=np.int64)
                )
                for vid, shift in ((int(did) * 2, 0), (int(did) * 2 + 1, 16)):
                    if shift and did % 3 != 0:
                        continue
                    v = np.minimum(vals + shift, 255).astype(np.uint8)
                    frames = [np.full((8, 8), x, dtype=np.uint8) for x in v]
                    rows.append((vid, encode_mjpeg(frames, quant=1)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = docs.mapInPandas(build, "media_id long, payload binary")
    dh = video_luma_hash(media, decoder=decode_mjpeg, n_frames=NF)
    out = bitstring_near_dup(
        dh, id_col="media_id", hash_col="vhash", n_bits=NF - 1,
        max_hamming=3, bands=4,
    )
    return out.select(
        "media_id", F.col("keep").cast("long").alias("keep"), "min_neighbor_id"
    )


MM_VIDEO_NEARDUP_SQL = """
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n
  FROM documents),
media AS (
  SELECT doc_id * 2 AS media_id, 0 AS shift, text, n FROM d
  UNION ALL
  SELECT doc_id * 2 + 1 AS media_id, 16 AS shift, text, n
  FROM d WHERE doc_id % 3 = 0),
vals AS (
  SELECT media_id,
         list_transform(range(0, 33),
           f -> least((CASE WHEN n = 0 THEN 0 ELSE ascii(text[
                  CAST(f % n AS BIGINT) + 1]) END) + shift, 255)) AS v
  FROM media),
bits AS (
  SELECT media_id,
         list_transform(range(0, 32),
           i -> CASE WHEN v[CAST(i AS BIGINT) + 2] > v[CAST(i AS BIGINT) + 1]
                THEN 1 ELSE 0 END) AS bl
  FROM vals),
pairs AS (
  SELECT a.media_id AS ida, b.media_id AS idb
  FROM bits a JOIN bits b ON a.media_id <> b.media_id
  WHERE CAST(list_aggregate(list_transform(range(0, 32),
          i -> CASE WHEN a.bl[CAST(i AS BIGINT) + 1] <> b.bl[CAST(i AS BIGINT) + 1]
               THEN 1 ELSE 0 END), 'sum') AS INT) <= 3),
nb AS (SELECT ida AS media_id, min(idb) AS mn FROM pairs GROUP BY 1)
SELECT m.media_id,
       CAST(CASE WHEN least(m.media_id, coalesce(nb.mn, m.media_id)) = m.media_id
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CAST(least(m.media_id, coalesce(nb.mn, m.media_id)) AS BIGINT) AS min_neighbor_id
FROM bits m LEFT JOIN nb ON nb.media_id = m.media_id
"""


MM_VIDEO_SCENECUT_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         (1 + doc_id % 3) * (1 + doc_id % 2) AS nb,
         6 + doc_id % 4 AS nf
  FROM documents),
fr AS (
  SELECT media_id, text, n, nb,
         CAST(unnest(range(0, nf)) AS BIGINT) AS frame_idx
  FROM base),
s AS (
  SELECT media_id, frame_idx,
         64 * CAST(coalesce(list_sum(list_transform(range(0, nb),
           j -> least((CASE WHEN n = 0 THEN 0 ELSE ascii(text[
                  CAST(((frame_idx // 3) * nb + j) % n AS BIGINT) + 1
                ]) END) + frame_idx % 3, 255))), 0) AS BIGINT) AS luma_sum
  FROM fr)
SELECT media_id, frame_idx, luma_sum,
       CAST(CASE WHEN frame_idx = 0 THEN 0
            WHEN abs(luma_sum - lag(luma_sum) OVER
                   (PARTITION BY media_id ORDER BY frame_idx)) > 384 THEN 1
            ELSE 0 END AS BIGINT) AS is_cut
FROM s
"""


# mode-independent by construction: every coding mode must decode to the
# same block-constant gray raster the SQL derives from the raw bytes
MM_JPEG_DECODE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
  FROM documents),
pix AS (
  SELECT media_id, n, bw * 8 AS w, bh * 8 AS h,
         list_transform(range(0, bw * 8 * bh * 8 * 3),
           k -> CASE WHEN n = 0 THEN 0 ELSE ascii(text[
                  CAST((((k // (bw * 8 * 3)) // 8) * bw
                        + (((k % (bw * 8 * 3)) // 3) // 8)) % n AS BIGINT) + 1
                ]) END) AS p
  FROM base)
SELECT media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(CAST(list_aggregate(p, 'sum') AS DOUBLE) / (w * h * 3), 4) AS mean_px,
       CAST(list_aggregate(
         list_transform(range(0, w * h * 3), k -> (k + 1) * p[CAST(k AS BIGINT) + 1]),
         'sum') AS BIGINT) AS checksum
FROM pix
"""


MM_PNG_DECODE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h
  FROM documents),
pix AS (
  SELECT media_id, n, w, h,
         list_transform(range(0, w * h * 3),
           k -> CASE WHEN n = 0 THEN 0
                     ELSE ascii(text[CAST(k % n AS BIGINT) + 1]) END) AS p
  FROM base)
SELECT media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(CAST(list_aggregate(p, 'sum') AS DOUBLE) / (w * h * 3), 4) AS mean_px,
       CAST(list_aggregate(
         list_transform(range(0, w * h * 3), k -> (k + 1) * p[CAST(k AS BIGINT) + 1]),
         'sum') AS BIGINT) AS checksum
FROM pix
"""


MM_IMAGE_DECODE_SQL = """
WITH base AS (
  SELECT doc_id AS media_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         length(text) AS n,
         5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h
  FROM documents),
pix AS (
  SELECT media_id, n, w, h,
         list_transform(range(0, w * h * 3),
           k -> CASE WHEN n = 0 THEN 0
                     ELSE ascii(text[CAST(k % n AS BIGINT) + 1]) END) AS p
  FROM base)
SELECT media_id,
       CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS bmp_bytes,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(CAST(list_aggregate(p, 'sum') AS DOUBLE) / (w * h * 3), 4) AS mean_px,
       CAST(list_aggregate(
         list_transform(range(0, w * h * 3), k -> (k + 1) * p[CAST(k AS BIGINT) + 1]),
         'sum') AS BIGINT) AS checksum
FROM pix
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Registry order matters: the correctness driver samples the FIRST 50
# queries() entries. _DRIVER_WINDOW is this round's explicit rotation
# (r14): the entries this round touched lead (the gmean positivity
# fix, the fold/compaction protocol entries re-run on the object-store
# backend, the seam-keyed SQL-function users), then the ENTIRE ≤r9
# staleness cohort — the two r7 stragglers and the 36-entry r9 block —
# per the r13 verdict rotation directive, topped up with the oldest
# r10 entries to fill the window exactly. queries() serves these
# first; everything else keeps its prior relative order behind them.
_DRIVER_WINDOW = [
    # r14-touched
    "pipeline_crawl_expand",
    "warc_wat_links",
    "warc_wet_text",
    "pipeline_crawl_frontier",
    "warc_html_extract",
    "curate_robots_filter",
    "frontier_sitemap_urls",
    "frontier_politeness",
    "event_type_gmean",
    "stream_line_dedup_fold",
    "stream_url_dedup_fold",
    "events_incremental_rollup",
    "events_scd2_history",
    "stream_window_rollup",
    "dedup_incremental",
    "dedup_url_exact",
    "sql_knn_topk",
    # r7 stragglers
    "q9_product_profit",
    "revenue_grouping_sets",
    # the r9 cohort (36 entries; event_type_gmean above is its 37th)
    "stream_token_heavy_hitters",
    "stream_token_heavy_hitters_exact",
    "source_token_heavy_hitters",
    "token_heavy_hitters",
    "stream_distinct_users",
    "stream_type_distinct_users",
    "embedding_kmeans_assign",
    "quality_classifier_onestep",
    "embedding_pca_cov",
    "bpe_pair_counts",
    "tokenizer_unigram_vocab_chars",
    "tokenizer_unigram_encode_chars",
    "tokenizer_unigram_vocab",
    "tokenizer_unigram_encode",
    "corpus_quality_topfrac",
    "events_exact_quantiles",
    "events_distinct_users",
    "events_json_props",
    "price_percentiles",
    "events_type_pivot",
    "events_gap_fill",
    "lineitem_unpivot",
    "events_stratified_sample",
    "events_funnel",
    "events_cohort_retention",
    "hybrid_search_rrf",
    "text_search_bm25",
    "q1_pricing_summary",
    "revenue_rollup",
    "corpus_splits",
    "pipeline_pack_curated",
    # doc_chunking, bloom_pruned_revenue, customer_balance_ranks and
    # documents_profile slid to positions 51-54 as r14 post-seal
    # entries took the window's head — they lead the r15 rotation
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _all_queries()
    out = {k: base[k] for k in _DRIVER_WINDOW}
    out.update((k, v) for k, v in base.items() if k not in out)
    return out


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mm_image_neardup_256_capped": mm_image_neardup_256_capped,
        "pipeline_c4_text": pipeline_c4_text,
        "pipeline_web_curation": pipeline_web_curation,
        "stream_line_dedup_fold": stream_line_dedup_fold,
        "stream_url_dedup_fold": stream_url_dedup_fold,
        "sql_knn_topk": sql_knn_topk,
        "dedup_lines": dedup_lines,
        "mm_image_neardup_256": mm_image_neardup_256,
        "index_search_brute": index_search_brute,
        "index_lifecycle_registry": index_lifecycle_registry,
        "index_search_sealed_exhaustive": index_search_sealed_exhaustive,
        "doc_c4_clean": doc_c4_clean,
        "q12_shipmode_priority": q12_shipmode_priority,
        "training_pack_sequences": training_pack_sequences,
        "index_search_filtered": index_search_filtered,
        "index_search_join_filtered": index_search_join_filtered,
        "corpus_importance_sample": corpus_importance_sample,
        "quality_classifier_scores": quality_classifier_scores,
        "ann_lsh_exhaustive": ann_lsh_exhaustive,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_lsh_multiprobe": ann_lsh_multiprobe,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "dedup_repeated_spans": dedup_repeated_spans,
        "dedup_span_cut": dedup_span_cut,
        "passage_dedup": passage_dedup,
        "source_overlap_matrix": source_overlap_matrix,
        "embedding_opq_quality": embedding_opq_quality,
        "embedding_sq8_roundtrip": embedding_sq8_roundtrip,
        "index_search_opq_exhaustive": index_search_opq_exhaustive,
        "index_search_opq": index_search_opq,
        "doc_span_corruption": doc_span_corruption,
        "doc_fim_transform": doc_fim_transform,
        "corpus_temperature_mix": corpus_temperature_mix,
        "corpus_ngram_lm": corpus_ngram_lm,
        "training_shuffle_shards": training_shuffle_shards,
        "dedup_simhash": dedup_simhash,
        "dedup_incremental": dedup_incremental,
        "bucketed_revenue_join": bucketed_revenue_join,
        "stream_window_rollup": stream_window_rollup,
        "events_incremental_rollup": events_incremental_rollup,
        "events_scd2_history": events_scd2_history,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_region_revenue": q5_region_revenue,
        "q6_revenue_change": q6_revenue_change,
        "q4_order_priority": q4_order_priority,
        "q14_promo_revenue": q14_promo_revenue,
        "q18_large_orders": q18_large_orders,
        "q7_volume_shipping": q7_volume_shipping,
        "q19_discount_revenue": q19_discount_revenue,
        "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
        "mm_video_scenecut": mm_video_scenecut,
        "mm_video_neardup": mm_video_neardup,
        "doc_url_canonicalize": doc_url_canonicalize,
        "dedup_url_exact": dedup_url_exact,
        "doc_repetition_gopher": doc_repetition_gopher,
        "doc_quality_gopher": doc_quality_gopher,
        "doc_quality_fineweb": doc_quality_fineweb,
        "mm_image_neardup": mm_image_neardup,
        "mm_audio_neardup": mm_audio_neardup,
        "benchmark_contamination": benchmark_contamination,
        "compaction_plan_scores": compaction_plan_scores,
        "corpus_curation": corpus_curation,
        "dedup_exact": dedup_exact,
        "dedup_jaccard_ngram": dedup_jaccard_ngram,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "doc_fingerprints": doc_fingerprints,
        "doc_shard_packing": doc_shard_packing,
        "doc_token_counts": doc_token_counts,
        "doc_token_stats": doc_token_stats,
        "events_asof_attribution": events_asof_attribution,
        "events_error_sessions": events_error_sessions,
        "events_session_windows": events_session_windows,
        "index_search_graph": index_search_graph,
        "index_search_graph_exhaustive": index_search_graph_exhaustive,
        "index_search_sealed": index_search_sealed,
        "lang_id_scores": lang_id_scores,
        "pii_redaction": pii_redaction,
        "segment_assignment": segment_assignment,
        "customer_set_ops": customer_set_ops,
        "events_hourly_rollup": events_hourly_rollup,
        "events_latest_snapshot": events_latest_snapshot,
        "events_moving_avg": events_moving_avg,
        "events_sliding_windows": events_sliding_windows,
        "orders_cube": orders_cube,
        "q10_returned_items": q10_returned_items,
        "q11_important_parts": q11_important_parts,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q16_supplier_part_counts": q16_supplier_part_counts,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q20_dominant_suppliers": q20_dominant_suppliers,
        "q22_inactive_customers": q22_inactive_customers,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "revenue_grouping_sets": revenue_grouping_sets,
        "training_length_batches_bpe": training_length_batches_bpe,
        "mm_audio_dft_bins": mm_audio_dft_bins,
        "doc_html_extract_bytes": doc_html_extract_bytes,
        "warc_html_extract": warc_html_extract,
        "pipeline_crawl_frontier": pipeline_crawl_frontier,
        "warc_wet_text": warc_wet_text,
        "warc_wat_links": warc_wat_links,
        "pipeline_crawl_expand": pipeline_crawl_expand,
        "curate_robots_filter": curate_robots_filter,
        "frontier_sitemap_urls": frontier_sitemap_urls,
        "frontier_politeness": frontier_politeness,
        "curate_host_cap": curate_host_cap,
        "curate_blocklist_filter": curate_blocklist_filter,
        "split_leakage_check": split_leakage_check,
        "doc_html_extract": doc_html_extract,
        "mm_image_dhash": mm_image_dhash,
        "mm_resize_pipeline": mm_resize_pipeline,
        "mm_wav_features": mm_wav_features,
        "mm_feature_extract": mm_feature_extract,
        "mm_media_metadata": mm_media_metadata,
        "mm_frame_sample": mm_frame_sample,
        "mm_image_decode": mm_image_decode,
        "mm_png_decode": mm_png_decode,
        "mm_jpeg_decode": mm_jpeg_decode,
        "mm_mjpeg_frames": mm_mjpeg_frames,
        "mm_audio_spectral": mm_audio_spectral,
        "knn_range_ivf_distributed": knn_range_ivf_distributed,
        "knn_range_ivf_cosine": knn_range_ivf_cosine,
        "knn_range_cosine": knn_range_cosine,
        "dedup_embedding_radius": dedup_embedding_radius,
        "doc_tfidf_top_terms": doc_tfidf_top_terms,
        "events_next_purchase": events_next_purchase,
        "lineitem_price_drift": lineitem_price_drift,
        "orders_validation": orders_validation,
        "vector_norms": vector_norms,
        "embedding_pca": embedding_pca,
        "corpus_token_mix": corpus_token_mix,
        "doc_ngram_diversity": doc_ngram_diversity,
        "embedding_outliers": embedding_outliers,
        "doc_repetition": doc_repetition,
        "dedup_semantic": dedup_semantic,
        "dedup_clusters": dedup_clusters,
        "index_search_join": index_search_join,
        "index_search_join_pq": index_search_join_pq,
        "index_search_join_graph": index_search_join_graph,
        "index_search_join_graph_default": index_search_join_graph_default,
        "index_search_join_beam": index_search_join_beam,
        "embedding_pack_roundtrip": embedding_pack_roundtrip,
        "stream_token_heavy_hitters": stream_token_heavy_hitters,
        "stream_token_heavy_hitters_exact": stream_token_heavy_hitters_exact,
        "source_token_heavy_hitters": source_token_heavy_hitters,
        "token_heavy_hitters": token_heavy_hitters,
        "stream_distinct_users": stream_distinct_users,
        "stream_type_distinct_users": stream_type_distinct_users,
        "embedding_kmeans_assign": embedding_kmeans_assign,
        "quality_classifier_onestep": quality_classifier_onestep,
        "embedding_pca_cov": embedding_pca_cov,
        "bpe_pair_counts": bpe_pair_counts,
        "tokenizer_unigram_vocab_chars": tokenizer_unigram_vocab_chars,
        "tokenizer_unigram_encode_chars": tokenizer_unigram_encode_chars,
        "tokenizer_unigram_vocab": tokenizer_unigram_vocab,
        "tokenizer_unigram_encode": tokenizer_unigram_encode,
        "corpus_quality_topfrac": corpus_quality_topfrac,
        "events_exact_quantiles": events_exact_quantiles,
        "event_type_gmean": event_type_gmean,
        "events_distinct_users": events_distinct_users,
        "events_json_props": events_json_props,
        "price_percentiles": price_percentiles,
        "events_type_pivot": events_type_pivot,
        "events_gap_fill": events_gap_fill,
        "lineitem_unpivot": lineitem_unpivot,
        "events_stratified_sample": events_stratified_sample,
        "events_funnel": events_funnel,
        "events_cohort_retention": events_cohort_retention,
        "hybrid_search_rrf": hybrid_search_rrf,
        "text_search_bm25": text_search_bm25,
        "q1_pricing_summary": q1_pricing_summary,
        "revenue_rollup": revenue_rollup,
        "corpus_splits": corpus_splits,
        "pipeline_pack_curated": pipeline_pack_curated,
        "doc_chunking": doc_chunking,
        "bloom_pruned_revenue": bloom_pruned_revenue,
        "customer_balance_ranks": customer_balance_ranks,
        "documents_profile": documents_profile,
        "dedup_semantic_exact": dedup_semantic_exact,
        "embedding_opq_identity": embedding_opq_identity,
        "doc_text_normalize": doc_text_normalize,
        "training_length_batches": training_length_batches,
        "knn_range_batch": knn_range_batch,
        "knn_range_ivf": knn_range_ivf,
        "stream_value_quantiles": stream_value_quantiles,
        "stream_type_quantiles": stream_type_quantiles,
        "ann_ivf_exhaustive": ann_ivf_exhaustive,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivfpq_exhaustive": ann_ivfpq_exhaustive,
        "ann_ivfpq_topk": ann_ivfpq_topk,
        "knn_mmr_maxrel": knn_mmr_maxrel,
        "knn_mmr_rerank": knn_mmr_rerank,
        "knn_l2_batch": knn_l2_batch,
        "knn_cosine_batch": knn_cosine_batch,
        "knn_filtered_batch": knn_filtered_batch,
        "knn_topk_single": knn_topk_single,
        "top_customers_per_nation": top_customers_per_nation,
        "label_centroids": label_centroids,
        "corpus_vocab_stats": corpus_vocab_stats,
        "top_tokens_per_lang": top_tokens_per_lang,
        "part_zorder_values": part_zorder_values,
        "part_copurchase_pairs": part_copurchase_pairs,
        "events_variant_props": events_variant_props,
        "doc_lm_perplexity": doc_lm_perplexity,
        "events_value_outliers": events_value_outliers,
        "pipeline_chunk_shards": pipeline_chunk_shards,
        "part_reachability": part_reachability,
        "bpe_merge_table": bpe_merge_table,
        "bpe_encode_stats": bpe_encode_stats,
        "lineitem_corr_matrix": lineitem_corr_matrix,
        "part_price_histogram": part_price_histogram,
        "events_interpolated": events_interpolated,
        "embedding_kmeans": embedding_kmeans,
        "order_top_line_lateral": order_top_line_lateral,
        "events_type_dow_chisq": events_type_dow_chisq,
        "copurchase_triangles": copurchase_triangles,
        "customer_fuzzy_pairs": customer_fuzzy_pairs,
        "customer_name_pagerank": customer_name_pagerank,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stream_value_quantiles": STREAM_VALUE_QUANTILES_SQL,
        "stream_type_quantiles": STREAM_TYPE_QUANTILES_SQL,
        "stream_token_heavy_hitters_exact": STREAM_TOKEN_HEAVY_HITTERS_EXACT_SQL,
        "source_token_heavy_hitters": SOURCE_TOKEN_HEAVY_HITTERS_SQL,
        "stream_distinct_users": STREAM_DISTINCT_USERS_SQL,
        "stream_type_distinct_users": STREAM_TYPE_DISTINCT_USERS_SQL,
        "knn_mmr_maxrel": KNN_MMR_MAXREL_SQL,
        "embedding_kmeans_assign": EMBEDDING_KMEANS_ASSIGN_SQL,
        "dedup_semantic_exact": DEDUP_SEMANTIC_EXACT_SQL,
        "embedding_opq_identity": EMBEDDING_OPQ_IDENTITY_SQL,
        "quality_classifier_onestep": QUALITY_CLASSIFIER_ONESTEP_SQL,
        "embedding_pca_cov": EMBEDDING_PCA_COV_SQL,
        "bpe_pair_counts": BPE_PAIR_COUNTS_SQL,
        "knn_range_batch": KNN_RANGE_SQL,
        "knn_range_ivf": KNN_RANGE_SQL,
        "knn_range_ivf_distributed": KNN_RANGE_SQL,
        "knn_range_cosine": KNN_RANGE_COSINE_SQL,
        "knn_range_ivf_cosine": KNN_RANGE_COSINE_SQL,
        "tokenizer_unigram_vocab_chars": TOKENIZER_UNIGRAM_VOCAB_CHARS_SQL,
        "tokenizer_unigram_encode_chars": TOKENIZER_UNIGRAM_ENCODE_CHARS_SQL,
        "index_lifecycle_registry": INDEX_LIFECYCLE_REGISTRY_SQL,
        "q1_pricing_summary": Q1_SQL,
        "q3_shipping_priority": Q3_SQL,
        "q5_region_revenue": Q5_SQL,
        "q6_revenue_change": Q6_SQL,
        "q4_order_priority": Q4_SQL,
        "q14_promo_revenue": Q14_SQL,
        "q18_large_orders": Q18_SQL,
        "q7_volume_shipping": Q7_SQL,
        "q19_discount_revenue": Q19_SQL,
        "q21_suppliers_kept_waiting": Q21_SQL,
        "q10_returned_items": Q10_SQL,
        "q8_market_share": Q8_SQL,
        "q13_customer_distribution": Q13_SQL,
        "q22_inactive_customers": Q22_SQL,
        "q15_top_supplier": Q15_SQL,
        "q17_small_quantity_revenue": Q17_SQL,
        "q2_min_cost_supplier": Q2_SQL,
        "q16_supplier_part_counts": Q16_SQL,
        "q20_dominant_suppliers": Q20_SQL,
        "q9_product_profit": Q9_SQL,
        "q11_important_parts": Q11_SQL,
        "revenue_rollup": REVENUE_ROLLUP_SQL,
        "revenue_grouping_sets": REVENUE_GROUPING_SETS_SQL,
        "orders_cube": ORDERS_CUBE_SQL,
        "sql_knn_topk": SQL_KNN_SQL,
        "events_hourly_rollup": EVENTS_HOURLY_SQL,
        "events_moving_avg": EVENTS_MOVING_AVG_SQL,
        "events_sliding_windows": EVENTS_SLIDING_SQL,
        "customer_set_ops": CUSTOMER_SET_OPS_SQL,
        "events_latest_snapshot": EVENTS_LATEST_SQL,
        "event_type_gmean": EVENT_TYPE_GMEAN_SQL,
        "events_distinct_users": EVENTS_DISTINCT_USERS_SQL,
        "events_json_props": EVENTS_JSON_PROPS_SQL,
        "price_percentiles": PRICE_PERCENTILES_SQL,
        "events_type_pivot": EVENTS_PIVOT_SQL,
        "events_gap_fill": EVENTS_GAP_FILL_SQL,
        "lineitem_unpivot": LINEITEM_UNPIVOT_SQL,
        "events_stratified_sample": EVENTS_STRATIFIED_SQL,
        "events_funnel": EVENTS_FUNNEL_SQL,
        "events_cohort_retention": EVENTS_COHORT_SQL,
        "top_customers_per_nation": TOP_CUSTOMERS_SQL,
        "text_search_bm25": _bm25_sql(20),
        "hybrid_search_rrf": _hybrid_sql(),
        "knn_l2_batch": _knn_sql(Metric.L2),
        "knn_cosine_batch": _knn_sql(Metric.COSINE),
        "knn_filtered_batch": KNN_FILTERED_SQL,
        "knn_topk_single": KNN_SINGLE_SQL,
        "label_centroids": LABEL_CENTROIDS_SQL,
        "corpus_vocab_stats": CORPUS_VOCAB_SQL,
        "top_tokens_per_lang": TOP_TOKENS_SQL,
        "vector_norms": VECTOR_NORMS_SQL,
        "embedding_pack_roundtrip": VECTOR_NORMS_SQL,
        "segment_assignment": SEGMENT_ASSIGNMENT_SQL,
        "index_search_brute": INDEX_SEARCH_BRUTE_SQL,
        "index_search_join": INDEX_SEARCH_BRUTE_SQL,
        "index_search_join_pq": INDEX_SEARCH_BRUTE_SQL,
        "index_search_join_graph": INDEX_SEARCH_BRUTE_SQL,
        "index_search_join_beam": INDEX_SEARCH_BRUTE_SQL,
        # index_search_sealed / index_search_graph / ann_ivf_topk /
        # ann_lsh_topk: approximate → rows-only by design, recall ≥ 0.9
        # enforced in tests; each has a degenerate-exact *_exhaustive
        # twin below whose config makes the SAME code path exact, so
        # every operator is hash-checked.
        "index_search_sealed_exhaustive": INDEX_SEARCH_BRUTE_SQL,
        "index_search_opq_exhaustive": INDEX_SEARCH_BRUTE_SQL,
        "index_search_graph_exhaustive": INDEX_SEARCH_BRUTE_SQL,
        "compaction_plan_scores": COMPACTION_PLAN_SQL,
        "ann_ivf_exhaustive": _knn_sql(Metric.L2),
        "ann_ivfpq_exhaustive": _knn_sql(Metric.L2),
        "ann_lsh_exhaustive": _knn_sql(Metric.COSINE),
        "doc_html_extract": DOC_HTML_EXTRACT_SQL,
        "doc_html_extract_bytes": DOC_HTML_EXTRACT_BYTES_SQL,
        "warc_html_extract": WARC_HTML_EXTRACT_SQL,
        "pipeline_crawl_frontier": PIPELINE_CRAWL_FRONTIER_SQL,
        "warc_wet_text": WARC_WET_TEXT_SQL,
        "warc_wat_links": WARC_WAT_LINKS_SQL,
        "pipeline_crawl_expand": PIPELINE_CRAWL_EXPAND_SQL,
        "curate_robots_filter": CURATE_ROBOTS_FILTER_SQL,
        "frontier_sitemap_urls": FRONTIER_SITEMAP_URLS_SQL,
        "frontier_politeness": FRONTIER_POLITENESS_SQL,
        "doc_url_canonicalize": DOC_URL_CANONICALIZE_SQL,
        "dedup_url_exact": DEDUP_URL_EXACT_SQL,
        "curate_host_cap": CURATE_HOST_CAP_SQL,
        "doc_quality_gopher": DOC_QUALITY_GOPHER_SQL,
        "stream_url_dedup_fold": STREAM_URL_DEDUP_FOLD_SQL,
        "doc_c4_clean": DOC_C4_CLEAN_SQL,
        "curate_blocklist_filter": CURATE_BLOCKLIST_FILTER_SQL,
        "pipeline_web_curation": PIPELINE_WEB_CURATION_SQL,
        "pipeline_c4_text": PIPELINE_C4_TEXT_SQL,
        "split_leakage_check": SPLIT_LEAKAGE_CHECK_SQL,
        "mm_audio_neardup": MM_AUDIO_NEARDUP_SQL,
        "doc_repetition_gopher": DOC_REPETITION_GOPHER_SQL,
        "doc_quality_fineweb": DOC_QUALITY_FINEWEB_SQL,
        "doc_text_normalize": DOC_TEXT_NORMALIZE_SQL,
        "training_length_batches": TRAINING_LENGTH_BATCHES_SQL,
        "training_length_batches_bpe": TRAINING_LENGTH_BATCHES_BPE_SQL,
        "mm_image_dhash": MM_IMAGE_DHASH_SQL,
        "mm_image_neardup": MM_IMAGE_NEARDUP_SQL,
        "mm_image_neardup_256": MM_IMAGE_NEARDUP_256_SQL,
        "mm_image_neardup_256_capped": MM_IMAGE_NEARDUP_256_CAPPED_SQL,
        "mm_video_scenecut": MM_VIDEO_SCENECUT_SQL,
        "mm_video_neardup": MM_VIDEO_NEARDUP_SQL,
        "mm_audio_dft_bins": MM_AUDIO_DFT_BINS_SQL,
        "dedup_embedding_radius": DEDUP_EMBEDDING_RADIUS_SQL,
        "doc_token_stats": DOC_STATS_SQL,
        "doc_token_counts": DOC_TOKEN_COUNTS_SQL,
        "doc_repetition": DOC_REPETITION_SQL,
        "pii_redaction": _pii_sql(),
        "benchmark_contamination": BENCH_CONTAMINATION_SQL,
        "lang_id_scores": _lang_sql(),
        "corpus_curation": _curation_sql(),
        "corpus_splits": CORPUS_SPLITS_SQL,
        "pipeline_pack_curated": PIPELINE_PACK_SQL,
        "doc_shard_packing": DOC_SHARD_PACKING_SQL,
        "doc_chunking": DOC_CHUNKING_SQL,
        "dedup_repeated_spans": DEDUP_REPEATED_SPANS_SQL,
        "dedup_span_cut": DEDUP_SPAN_CUT_SQL,
        "source_overlap_matrix": SOURCE_OVERLAP_MATRIX_SQL,
        "embedding_sq8_roundtrip": EMBEDDING_SQ8_ROUNDTRIP_SQL,
        "doc_span_corruption": DOC_SPAN_CORRUPTION_SQL,
        "doc_fim_transform": DOC_FIM_TRANSFORM_SQL,
        "corpus_temperature_mix": CORPUS_TEMPERATURE_MIX_SQL,
        "corpus_importance_sample": CORPUS_IMPORTANCE_SAMPLE_SQL,
        "corpus_ngram_lm": CORPUS_NGRAM_LM_SQL,
        "training_shuffle_shards": TRAINING_SHUFFLE_SHARDS_SQL,
        "passage_dedup": PASSAGE_DEDUP_SQL,
        "dedup_lines": DEDUP_LINES_SQL,
        "events_exact_quantiles": EVENTS_EXACT_QUANTILES_SQL,
        "q12_shipmode_priority": Q12_SQL,
        "stream_line_dedup_fold": DEDUP_LINES_SQL,
        "training_pack_sequences": TRAINING_PACK_SEQUENCES_SQL,
        "index_search_filtered": INDEX_SEARCH_FILTERED_SQL,
        "index_search_join_filtered": INDEX_SEARCH_FILTERED_SQL,
        "token_heavy_hitters": TOKEN_HEAVY_HITTERS_SQL,
        "corpus_quality_topfrac": CORPUS_QUALITY_TOPFRAC_SQL,
        "corpus_token_mix": _mix_sql(),
        "dedup_incremental": DEDUP_INCREMENTAL_SQL,
        "bloom_pruned_revenue": BLOOM_PRUNED_REVENUE_SQL,
        "events_scd2_history": EVENTS_SCD2_SQL,
        "customer_balance_ranks": CUSTOMER_BALANCE_RANKS_SQL,
        "documents_profile": DOCUMENTS_PROFILE_SQL,
        "events_incremental_rollup": EVENTS_INCREMENTAL_ROLLUP_SQL,
        "part_zorder_values": _zorder_sql(),
        "part_copurchase_pairs": PART_COPURCHASE_SQL,
        "events_variant_props": EVENTS_VARIANT_SQL,
        "doc_lm_perplexity": DOC_LM_PERPLEXITY_SQL,
        "events_value_outliers": EVENTS_OUTLIERS_SQL,
        "pipeline_chunk_shards": PIPELINE_CHUNK_SQL,
        "part_reachability": PART_REACHABILITY_SQL,
        "lineitem_corr_matrix": LINEITEM_CORR_SQL,
        "part_price_histogram": PART_PRICE_HISTOGRAM_SQL,
        "events_interpolated": EVENTS_INTERPOLATED_SQL,
        "order_top_line_lateral": ORDER_TOP_LINE_LATERAL_SQL,
        "events_type_dow_chisq": EVENTS_CHISQ_SQL,
        "copurchase_triangles": COPURCHASE_TRIANGLES_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
        "dedup_clusters": DEDUP_CLUSTERS_SQL,
        "dedup_jaccard_ngram": DEDUP_JACCARD_SQL,
        "dedup_simhash": _simhash_sql(),
        "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
        "customer_fuzzy_pairs": CUSTOMER_FUZZY_SQL,
        "customer_name_pagerank": CUSTOMER_PAGERANK_SQL,
        "doc_fingerprints": DOC_FINGERPRINTS_SQL,
        "mm_media_metadata": MM_METADATA_SQL,
        "mm_feature_extract": MM_FEATURES_SQL,
        "mm_frame_sample": MM_FRAMES_SQL,
        "mm_image_decode": MM_IMAGE_DECODE_SQL,
        "mm_png_decode": MM_PNG_DECODE_SQL,
        "mm_jpeg_decode": MM_JPEG_DECODE_SQL,
        "mm_resize_pipeline": MM_RESIZE_SQL,
        "mm_mjpeg_frames": MM_MJPEG_FRAMES_SQL,
        "bucketed_revenue_join": BUCKETED_REVENUE_SQL,
        "mm_wav_features": MM_WAV_FEATURES_SQL,
        "doc_tfidf_top_terms": DOC_TFIDF_SQL,
        "orders_validation": ORDERS_VALIDATION_SQL,
        "lineitem_price_drift": LINEITEM_PSI_SQL,
        "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
        "doc_ngram_diversity": DOC_NGRAM_DIVERSITY_SQL,
        "stream_window_rollup": STREAM_ROLLUP_SQL,
        "events_session_windows": SESSION_WINDOWS_SQL,
        "events_asof_attribution": EVENTS_ASOF_SQL,
        "events_next_purchase": EVENTS_NEXT_PURCHASE_SQL,
        "events_error_sessions": EVENTS_ERROR_SESSIONS_SQL,
    }

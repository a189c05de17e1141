"""Relational primitives from SURVEY.md section 2 over the TPC-H-ish star
schema: scans/projections/limits (P1/P2), IN-list and range filters (P4),
inner/broadcast/semi/anti joins (J1/J2, P4-as-semi-join), hash aggregations
with partial/map-side combine (A2/A3/A5), count-distinct, distributed
top-k (K1) and window ranking (K3).

Scale notes (100 TB posture):

- Dimension tables (region/nation/customer/supplier/part) are orders of
  magnitude smaller than the facts; every dim join is marked
  ``F.broadcast`` so the fact table never shuffles for them. With AQE on,
  Catalyst would usually pick this anyway -- the hint makes it
  deployment-independent.
- Aggregations rely on Spark's two-phase HashAggregate (partial -> final),
  strictly better than the reference's shuffle-everything MapReduce
  (``app/mapreduce/mapper2.py`` emits one record per token with no
  combiner -- SURVEY.md section 4).
- Top-k uses ``orderBy().limit()`` which plans TakeOrderedAndProject:
  per-partition heaps, no global sort (reference uses RDD ``takeOrdered``,
  ``app/query.py:92``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import davg, dsum, epoch, ntz_lit, sql_davg, sql_dsum, sql_ts

# Filter cutoffs as ISO wall-clock instants: filters compare the NTZ
# timestamp column to an NTZ literal directly so the predicate pushes down
# to the parquet scan (see _util.ntz_lit); epoch() is reserved for
# *emitted* columns, which leave as bigint so value hashing is tz-proof.
SHIP_CUTOFF = "1998-06-01 00:00:00"
Q6_LO = "1996-01-01 00:00:00"
Q6_HI = "1998-01-01 00:00:00"
ORDER_CUTOFF = "1997-01-01 00:00:00"


# --- Q1: pricing summary (groupBy + 8 aggregates) ----------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= ntz_lit(SHIP_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            F.round(dsum(F.col("l_quantity"), 6) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice"), 6) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(dsum(F.col("l_discount"), 6) / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       round({sql_davg('l_quantity')}, 6) AS avg_qty,
       round({sql_davg('l_extendedprice')}, 6) AS avg_price,
       round({sql_davg('l_discount')}, 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= {sql_ts(SHIP_CUTOFF)}
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + agg + top-k) -------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < ntz_lit(ORDER_CUTOFF))
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ntz_lit(ORDER_CUTOFF))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", epoch("o_orderdate").alias("o_orderdate_epoch"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = f"""
SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < {sql_ts(ORDER_CUTOFF)}
  AND l_shipdate > {sql_ts(ORDER_CUTOFF)}
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-style: local supplier volume (5-way join) -----------------------------


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .where(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


SQL_Q5 = f"""
SELECT n_name, r_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name, r_name
"""


# --- Q6: range-filter + global agg --------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= ntz_lit(Q6_LO))
            & (F.col("l_shipdate") < ntz_lit(Q6_HI))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


SQL_Q6 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= {sql_ts(Q6_LO)} AND l_shipdate < {sql_ts(Q6_HI)}
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- Q14-style: promo revenue share (fact x part, conditional agg) ------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a broadcast fact-dim join: share of
    revenue from ECONOMY-type parts per month-bucket of ship quantity.
    The CASE WHEN runs inside the same two-phase hash aggregate as the
    plain sum -- one pass, one shuffle of one row per group."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    econ = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(econ, 4).alias("econ_revenue"),
            dsum(rev, 4).alias("total_revenue"),
            F.round(
                100.0 * dsum(econ, 4) / F.nullif(dsum(rev, 4), F.lit(0.0)), 6
            ).alias("econ_pct"),
        )
    )


SQL_Q14 = f"""
SELECT p_brand,
       {sql_dsum("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)} AS econ_revenue,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue,
       round(100.0 * {sql_dsum("CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
             / nullif({sql_dsum('l_extendedprice * (1 - l_discount)', 4)}, 0.0), 6) AS econ_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- primitive operators (P1/P2/P4, K1/K3, J2, A3/A5) --------------------------


def scan_project_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+K1: pruned scan, projection, deterministic top-N."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_SCAN = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def filter_isin_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: IN-list predicate pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R") & (F.col("l_quantity") >= 45))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    )


SQL_ISIN = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
WHERE l_returnflag IN ('A', 'R') AND l_quantity >= 45
"""


def join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: explicit broadcast hash join, fact side never shuffles for the dim."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


SQL_JOIN_BCAST = f"""
SELECT c_mktsegment, count(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_shuffled_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join under an explicit SHUFFLE_HASH hint: when neither
    side broadcasts but one side's partitions fit in memory, a shuffled
    hash join skips BOTH sort passes a SortMergeJoin pays -- on a 100 TB
    fact-fact join the sorts are often the dominant cost. Spark only
    picks SHJ on its own under narrow conditions (one side much smaller
    per stats), so the hint is how a pipeline author states "the build
    side fits" -- plan-asserted ShuffledHashJoin, no SortMergeJoin.
    Orders (1/4 of lineitem's rows here) is the build side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


SQL_JOIN_SHUFFLED_HASH = f"""
SELECT o_orderpriority, count(*) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that placed a high-value order."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_SEMI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no URGENT orders.

    The right side is pre-filtered (priority = 1-URGENT) so the result is
    NON-EMPTY on this data: the synthetic generator gives every customer
    at least one order, and an always-0-row anti join would certify only
    0 == 0 against the oracle -- the filter makes hash_match cover real
    values (203 rows at sf0.01)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


SQL_ANTI = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` -- the null-aware anti join, a genuinely
    different operator from NOT EXISTS (``join_anti``): SQL's three-valued
    logic makes ``x NOT IN (S)`` UNKNOWN (row dropped) whenever S contains
    a single NULL or x is NULL, so Catalyst cannot plan a plain anti join;
    it plans a **null-aware** anti join (single-column broadcast case:
    BroadcastHashJoin with the isnull disjunct) that checks the
    null-presence of the whole build side. Engines that get this wrong
    return plausible-but-incorrect rows the moment a NULL lands in the
    subquery -- the semantics are the point of carrying the operator.

    Query: parts never shipped by any 1-QTY line item, counted per brand.
    DuckDB implements identical three-valued NOT IN semantics, so the
    oracle is the literal same query."""
    part = load_table(spark, sf_dir, "part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_nin_v")
    part.createOrReplaceTempView("part_nin_v")
    return spark.sql(
        """
SELECT p_brand, count(*) AS n_parts
FROM part_nin_v
WHERE p_partkey NOT IN (SELECT l_partkey FROM li_nin_v WHERE l_quantity = 1)
GROUP BY p_brand
"""
    )


SQL_NOT_IN = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity = 1)
GROUP BY p_brand
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (expand + two-phase aggregate)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_COUNT_DISTINCT = """
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: row_number over a partitioned window -> top 3 orders per status."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
    )


SQL_WINDOW_RANK = """
SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT == groupBy on all projected columns."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
    )


SQL_DISTINCT = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def union_all_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two branch projections, then re-aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.where(F.col("o_totalprice") > 300000).select(
        F.lit("high").alias("bucket"), "o_orderkey"
    )
    lo = orders.where(F.col("o_totalprice") <= 100000).select(
        F.lit("low").alias("bucket"), "o_orderkey"
    )
    return hi.unionAll(lo).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


SQL_UNION = """
SELECT bucket, count(*) AS n FROM (
  SELECT 'high' AS bucket, o_orderkey FROM orders WHERE o_totalprice > 300000
  UNION ALL
  SELECT 'low' AS bucket, o_orderkey FROM orders WHERE o_totalprice <= 100000
) GROUP BY bucket
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (extension beyond the reference surface)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


SQL_ROLLUP = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: parts priced above their brand's
    average retail price. Expressed through the SQL API so Catalyst's
    subquery decorrelation rewrites it into aggregate+join (one scan per
    side, no per-row subquery execution) -- the classic TPC-H Q17 shape.

    The "above average" test is phrased as ``price * count > exact sum``
    so both engines compare identical doubles: a naive ``> avg(...)``
    hides an order-dependent float sum in the threshold, and a part
    priced exactly at its brand's mean would flip between engines."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice
        FROM part_v p
        WHERE p_retailprice * (SELECT count(*) FROM part_v p2
                               WHERE p2.p_brand = p.p_brand)
              > (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
                 FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        """
    )


SQL_CORRELATED = """
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice
FROM part p
WHERE p_retailprice * (SELECT count(*) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
      > (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
         FROM part p2 WHERE p2.p_brand = p.p_brand)
"""


def q4_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS, which Catalyst rewrites to a
    LEFT SEMI hash join on o_orderkey -- lineitem is scanned once with the
    returnflag filter pushed to parquet, never materialized per row."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_v o
        WHERE o_totalprice > 150000 AND EXISTS (
          SELECT 1 FROM lineitem_v l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_totalprice > 150000 AND EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: groupBy + HAVING on the fact table, then join the
    survivors back to orders/customer. The HAVING side aggregates BEFORE
    the join, so only qualifying orderkeys (a tiny set) reach the join --
    at 100 TB the join input shrinks by orders of magnitude. The HAVING
    threshold compares the exact decimal sum (order-independent), so no
    row can flip in or out between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            epoch("o_orderdate").alias("o_orderdate_epoch"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


SQL_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > 150
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube): one
    Expand + one shuffle computes all three groupings; grouping_id tells a
    null dimension value apart from the 'all' row."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


SQL_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n, {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90/p99 of l_extendedprice per returnflag, via
    row_number + count windows: the value at rank ceil(p*n) in the sorted
    partition. Identical arithmetic on both engines (IEEE doubles round
    the same way), and ties in price can't change the value at a rank.

    Scale note: exact quantiles need a per-group sort; at 100 TB use
    approx_percentile (t-digest, one pass, mergeable) unless exactness is
    contractual -- this operator is the exact/oracle-able variant."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    def at(p: float):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("l_extendedprice"))
        )
    return ranked.groupBy("l_returnflag").agg(
        at(0.5).alias("p50"), at(0.9).alias("p90"), at(0.99).alias("p99")
    )


SQL_PERCENTILES = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN l_extendedprice END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN l_extendedprice END) AS p90,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN l_extendedprice END) AS p99
FROM ranked GROUP BY l_returnflag
"""


def percentile_cont_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CONTINUOUS (interpolated) quartiles of l_extendedprice per
    returnflag -- the SQL-standard percentile_cont semantics, which the
    discrete-rank operator above deliberately does not cover: at position
    p*(n-1) between two sorted values the result is their linear
    interpolation, so the two operators disagree whenever the rank is
    fractional and both must be available.

    Spark's ``percentile`` is a TypedImperativeAggregate: it rides
    ObjectHashAggregate (hash-based, partial-combining counts-per-value
    maps), NOT a SortAggregate demotion, and map-side partials merge by
    value-count union -- heavier than the GK sketch
    (percentiles_by_flag_approx) but exact and still one pass. Both
    engines interpolate the same sorted multiset with the same IEEE
    double steps, so round(6) values hash-match.

    One ARRAY-form percentile call, not three scalar ones: each scalar
    ``percentile`` is its own aggregate buffer holding the full
    counts-per-value map, so three of them triple the per-group state,
    the map-side merge work and the shuffled partial bytes (guide
    section 2.3); the array form keeps ONE buffer and interpolates the
    same sorted multiset at each requested fraction -- values identical
    by construction. Not fanned out: with the single-buffer form the
    value-count build is no longer the bottleneck (interleaved A/B read
    0.99x -- the extra exchange buys nothing here)."""
    qs = (0.25, 0.5, 0.75)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    arr = ", ".join(str(q) for q in qs)
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr(f"percentile(l_extendedprice, array({arr}))").alias("ps"))
        .select(
            "l_returnflag",
            *[
                F.round(F.col("ps")[i], 6).alias(f"p{int(q * 100)}")
                for i, q in enumerate(qs)
            ],
        )
    )


SQL_PERCENTILE_CONT = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag
"""


WINSOR_LO, WINSOR_HI = 0.05, 0.95  # clamp the tails outside [p5, p95]


def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization -- the feature-prep twin of ``outlier_zscore``:
    instead of REPORTING tail rows, clamp every value into its group's
    exact [p5, p95] interval, the standard robust-scaling step before a
    heavy-tailed feature feeds a model. Two-pass shape that scales: one
    exact interpolated-percentile aggregate per event_type (5 rows,
    ObjectHashAggregate with mergeable value-count maps -- see
    ``percentile_cont_by_flag``), broadcast back onto the scan, then a
    narrow per-row clamp; the fact table is never shuffled. Both engines
    interpolate the same sorted multiset and clamp with identical IEEE
    comparisons, so values hash-match at round(6). Degenerate (constant)
    groups need no guard here, unlike ``outlier_zscore``: lo == hi ==
    value, the clamp is the identity, and no division exists to produce
    NaN."""
    ev = load_table(spark, sf_dir, "events")
    # one array-form percentile buffer, not two scalar ones (same move as
    # percentile_cont_by_flag: halves the per-group value-count state)
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.expr(f"percentile(value, array({WINSOR_LO}, {WINSOR_HI}))").alias("lh")
        )
        .select(
            "event_type",
            F.col("lh")[0].alias("lo"),
            F.col("lh")[1].alias("hi"),
        )
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round(clamped, 6).alias("value_w"),
        (F.col("value") != clamped).alias("clipped"),
    )


SQL_WINSORIZE = f"""
WITH st AS (
  SELECT event_type,
         quantile_cont(value, {WINSOR_LO}) AS lo,
         quantile_cont(value, {WINSOR_HI}) AS hi
  FROM events GROUP BY 1
)
SELECT event_id, event_type, round(value, 6) AS value,
       round(least(greatest(value, lo), hi), 6) AS value_w,
       value <> least(greatest(value, lo), hi) AS clipped
FROM events JOIN st USING (event_type)
"""


HIST_QS = tuple(round(0.1 * i, 1) for i in range(1, 10))  # decile bounds


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of l_extendedprice -- per bucket the
    row count and exact min/max -- WITHOUT the ``ntile()`` spelling: an
    empty-PARTITION-BY ntile window funnels the entire table through one
    task (the same 100 TB cliff global_row_ids documents for
    row_number). Scale shape instead: ONE aggregate computes the 9
    interpolated decile boundaries (ObjectHashAggregate, see
    percentile_cont_by_flag), the 9-double array broadcasts, and the
    bucket id is `size(filter(bounds, b -> v > b))` -- a narrow
    projection -- followed by one ordinary two-phase aggregate. Two
    passes total, no global sort, at any scale.

    Determinism: boundaries are round(6) of exact interpolation
    (engine-identical); ties AT a boundary go to the lower bucket on
    both engines (strict >)."""
    # fan-out REVERTED (r13): r12's same-session A/B read 0.92x but the
    # fresh-process cold A/B (tools/cold_ab.py) read 1.04x and the driver's
    # cold run 0.76x-regressed -- a single-column double scan into an
    # ObjectHashAggregate is too cheap to earn the extra Exchange.
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = ", ".join(str(q) for q in HIST_QS)
    bounds = li.agg(
        F.expr(
            f"transform(percentile(l_extendedprice, array({qs})), x -> round(x, 6))"
        ).alias("bs")
    )
    bucketed = li.crossJoin(F.broadcast(bounds)).select(
        F.expr("size(filter(bs, b -> l_extendedprice > b))").alias("bucket"),
        "l_extendedprice",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


SQL_EQUIDEPTH = f"""
WITH b AS (
  SELECT list_transform(quantile_cont(l_extendedprice, [{', '.join(str(q) for q in HIST_QS)}]),
                        x -> round(x, 6)) AS bs
  FROM lineitem
)
SELECT len(list_filter(bs, x -> l_extendedprice > x)) AS bucket,
       count(*) AS n_rows,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem, b
GROUP BY 1
"""


def percentiles_by_flag_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of :func:`percentiles_by_flag`: one-pass
    ``approx_percentile`` whose GK sketch is MERGEABLE -- map-side
    partials combine like any algebraic aggregate, so there is no
    per-group sort and no window, just one exchange of tiny sketches.
    This is the shape to deploy at scale; the rank-window twin is the
    exact/contractual variant.

    Oracle note: with accuracy=1e6 the GK compression threshold
    (2 * count / accuracy) stays below 1 for groups under ~500k values,
    so the sketch retains every sample and the query returns exactly the
    value at rank ceil(p*n) -- the same arithmetic as the exact oracle
    (verified identical at sf0.001/0.01/0.1). A production run at real
    scale uses the default accuracy and accepts the bounded error."""
    # NOT fanned out: a fanned scan builds 32 GK sketches and pays their
    # compressed merge, which the interleaved A/B measured at 1.56x the
    # single-task build at this input size
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    # one GK sketch queried at three fractions, not three identical
    # sketches (same inserts + deterministic compression => identical
    # values; a third of the buffer build and shuffled partial bytes)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 1000000
            ).alias("ps")
        )
        .select(
            "l_returnflag",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
        )
    )


APPROX_PCT_ACCURACY = 10_000  # production-ish: the sketch genuinely compresses
APPROX_PCT_TOL = 2.0 / APPROX_PCT_ACCURACY  # 2x the 1/accuracy GK bound


def percentiles_approx_rank_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-proof verification of :func:`percentiles_by_flag_approx`:
    instead of comparing sketch OUTPUT values to exact quantiles (which
    only match while the GK sketch stays uncompressed, i.e. groups under
    ~accuracy/2 rows), verify the property the sketch actually GUARANTEES
    at every scale -- the returned value's rank lies within +-tol*n of the
    target rank (tol = 2/accuracy, doubling the nominal 1/accuracy bound
    for slack).

    A value v occupies ranks [count(x < v) + 1, count(x <= v)], so the
    check is an interval overlap against [(p - tol)*n - 1, (p + tol)*n + 1]
    -- the +-1 is the exact-definition allowance: the percentile of an
    n-row group is the value at rank ceil(p*n), up to one whole rank past
    p*n, which EXCEEDS the relative bound whenever tol*n < 1 (tiny test
    groups). The booleans are TRUE by construction at any data size,
    making the oracle a constant table -- hash-green at sf0.001 and at
    100 TB alike. Plan:
    one sketch aggregate (mergeable, map-side combined), the <=3-row
    result broadcast back onto the scan, one conditional-count aggregate."""
    # NOT fanned out: same 32-sketch-merge loss as
    # percentiles_by_flag_approx (A/B read 1.41x)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    # one compressed GK sketch read at three fractions (identical inserts
    # and deterministic compression => identical values per fraction as
    # three separate sketches, at a third of the buffer work)
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice",
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
                APPROX_PCT_ACCURACY,
            ).alias("vs")
        )
        .select(
            "l_returnflag",
            F.col("vs")[0].alias("v50"),
            F.col("vs")[1].alias("v90"),
            F.col("vs")[2].alias("v99"),
        )
    )
    joined = li.join(F.broadcast(approx), "l_returnflag")
    counted = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            c
            for p in ("50", "90", "99")
            for c in (
                F.count(F.when(F.col("l_extendedprice") < F.col(f"v{p}"), 1)).alias(
                    f"lt{p}"
                ),
                F.count(F.when(F.col("l_extendedprice") <= F.col(f"v{p}"), 1)).alias(
                    f"le{p}"
                ),
            )
        ],
    )

    def ok(p: float, tag: str):
        lo = (F.lit(p) - F.lit(APPROX_PCT_TOL)) * F.col("n") - 1
        hi = (F.lit(p) + F.lit(APPROX_PCT_TOL)) * F.col("n") + 1
        return (F.col(f"le{tag}") >= lo) & ((F.col(f"lt{tag}") + 1) <= hi)

    return counted.select(
        "l_returnflag",
        ok(0.5, "50").alias("p50_ok"),
        ok(0.9, "90").alias("p90_ok"),
        ok(0.99, "99").alias("p99_ok"),
    )


SQL_PCT_RANK_CHECK = """
SELECT l_returnflag, true AS p50_ok, true AS p90_ok, true AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


def intersect_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers who placed high-value orders INTERSECT /
    EXCEPT those with 'F' (finished) orders. Both set ops plan as one
    aggregate + join each (Catalyst rewrites INTERSECT to a distinct semi
    join, EXCEPT to a distinct anti join) -- no full-table distinct-then-
    compare materialization."""
    orders = load_table(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    finished = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    both = high.intersect(finished).select(F.col("o_custkey"), F.lit("both").alias("bucket"))
    only_high = high.subtract(finished).select(
        F.col("o_custkey"), F.lit("only_high").alias("bucket")
    )
    return both.unionAll(only_high)


SQL_INTERSECT_EXCEPT = """
SELECT o_custkey, 'both' AS bucket FROM (
  SELECT o_custkey FROM orders WHERE o_totalprice > 200000
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT o_custkey, 'only_high' AS bucket FROM (
  SELECT o_custkey FROM orders WHERE o_totalprice > 200000
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


# --- Q7-style: bi-nation volume shipping by year ------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_LO = "1996-01-01 00:00:00"
Q7_HI = "1999-01-01 00:00:00"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations per ship year.
    Two broadcast copies of the nation dim (supplier-side and
    customer-side roles) and a disjunctive (A->B or B->A) pair filter;
    the year is extracted from the NTZ column AFTER the pushdown-friendly
    range filter. (`partsupp`/address columns absent from the synthetic
    schema; semantics otherwise Q7's.)"""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ntz_lit(Q7_LO)) & (F.col("l_shipdate") < ntz_lit(Q7_HI))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .where(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("volume"))
    )


SQL_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume', 4)} AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= {sql_ts(Q7_LO)} AND l_shipdate < {sql_ts(Q7_HI)}
    AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
      OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q10-style: returned-item reporting (top 20 customers) --------------------

Q10_LO = "1996-01-01 00:00:00"
Q10_HI = "1997-01-01 00:00:00"


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a quarter
    band, top 20. Fact-fact join shuffles once on orderkey; customer and
    nation broadcast; top-k is TakeOrderedAndProject with a unique
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ntz_lit(Q10_LO)) & (F.col("o_orderdate") < ntz_lit(Q10_HI))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        # raw double as group key: both engines read the identical bits
        # from parquet, while round(double, 2) can HALF_UP differently
        # near .xx5 midpoints between Spark and DuckDB
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= {sql_ts(Q10_LO)} AND o_orderdate < {sql_ts(Q10_HI)}
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q15-style: top supplier (argmax via scalar subquery) ---------------------

Q15_LO = "1996-01-01 00:00:00"
Q15_HI = "1996-04-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals the
    global maximum -- an argmax as aggregate + scalar-subquery filter.
    The 1-row max broadcasts (J3 pattern); equality on the exact decimal
    sum is engine-stable so ties emit identically everywhere."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ntz_lit(Q15_LO)) & (F.col("l_shipdate") < ntz_lit(Q15_HI))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue")
    )
    sup = load_table(spark, sf_dir, "supplier")
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= {sql_ts(Q15_LO)} AND l_shipdate < {sql_ts(Q15_HI)}
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --- Q19-style: disjunctive predicate pushdown --------------------------------


def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of (brand, size-range,
    quantity-range) conjuncts across a broadcast fact-dim join. Catalyst
    extracts the common sub-predicates and pushes the part-side and
    lineitem-side halves below the join -- the classic OR-predicate
    pushdown stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_Q19 = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q22-style: idle high-balance customers -----------------------------------


Q22_RECENT = "2000-01-01 00:00:00"


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no RECENT orders, counted per nation -- a scalar aggregate subquery
    (1-row broadcast) feeding a left-anti join whose right side is
    pre-filtered by a pushdown-friendly date predicate. (The synthetic
    schema has no phone column, and every customer has *some* order, so
    nationkey stands in for the country-code grouping and recency for
    order-lessness.)"""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.round(davg(F.col("c_acctbal"), 6), 6).alias("avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= ntz_lit(Q22_RECENT)
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
    )


SQL_Q22 = f"""
SELECT c_nationkey, count(*) AS numcust, {sql_dsum('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT round({sql_davg('c_acctbal', 6)}, 6)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= {sql_ts(Q22_RECENT)})
GROUP BY c_nationkey
"""


BLOOM_PRIORITY = "1-URGENT"  # the selective creation-side filter


def runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pruned fact-fact join: lineitem joined to a
    selectively-filtered orders slice, planned as a sort-merge join whose
    PROBE side is pre-filtered by a bloom filter built at runtime from
    the filtered build side (Catalyst's InjectRuntimeFilter:
    ``bloom_filter_agg`` subquery -> ``might_contain`` predicate pushed
    into the fact scan stage).

    This is the row-level sibling of dynamic partition pruning: when the
    fact side is not partitioned by the join key, a selective dim filter
    can still prune MOST fact rows before the shuffle -- at 100 TB the
    bloom probe drops non-matching rows at scan time, shrinking the
    dominant fact exchange by the build side's selectivity.

    The at-scale conditions (creation side too big to broadcast,
    application side scan over the size threshold) are simulated with
    SCOPED confs: the physical plan is materialized while they are set
    and stays attached to the returned DataFrame; the session confs are
    restored immediately, so no other query is affected (asserted in
    tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == BLOOM_PRIORITY
    )
    df = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
        )
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # freeze the physical plan under the scoped confs: Spark caches
        # the QueryExecution per Dataset, so later actions reuse it
        df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return df


SQL_BLOOM_JOIN = f"""
SELECT o_orderstatus, count(*) AS n_items, {sql_dsum('l_extendedprice', 2)} AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '{BLOOM_PRIORITY}'
GROUP BY o_orderstatus
"""


def register(reg: Registry) -> None:
    reg.add("q1_pricing_summary", q1_pricing_summary, SQL_Q1, "TPC-H Q1 style groupBy+8 aggs")
    reg.add("q3_shipping_priority", q3_shipping_priority, SQL_Q3, "3-way join + agg + top-k")
    reg.add("q5_nation_revenue", q5_nation_revenue, SQL_Q5, "5-way join, broadcast dims")
    reg.add("q6_forecast_revenue", q6_forecast_revenue, SQL_Q6, "range filter + global agg")
    reg.add("q14_promo_revenue", q14_promo_revenue, SQL_Q14, "conditional agg over broadcast join")
    reg.add("correlated_above_avg", correlated_above_avg, SQL_CORRELATED, "decorrelated scalar subqueries")
    reg.add("scan_project_orderby_limit", scan_project_orderby_limit, SQL_SCAN, "P1/P2/K1")
    reg.add("filter_isin_project", filter_isin_project, SQL_ISIN, "P4 IN-list pushdown")
    reg.add("join_broadcast_agg", join_broadcast_agg, SQL_JOIN_BCAST, "J2 broadcast hash join")
    reg.add("join_semi", join_semi, SQL_SEMI, "left-semi join (EXISTS)")
    reg.add(
        "join_shuffled_hash_agg",
        join_shuffled_hash_agg,
        SQL_JOIN_SHUFFLED_HASH,
        "SHUFFLE_HASH-hinted fact-fact join (skips both SMJ sorts)",
    )
    reg.add("join_anti", join_anti, SQL_ANTI, "left-anti join (NOT EXISTS)")
    reg.add(
        "join_not_in_null_aware",
        join_not_in_null_aware,
        SQL_NOT_IN,
        "NOT IN subquery: null-aware anti join, three-valued semantics",
    )
    reg.add("agg_count_distinct", agg_count_distinct, SQL_COUNT_DISTINCT, "exact count-distinct")
    reg.add("window_rank_topn", window_rank_topn, SQL_WINDOW_RANK, "K3 window row_number")
    reg.add("distinct_projection", distinct_projection, SQL_DISTINCT, "distinct projection")
    reg.add("union_all_agg", union_all_agg, SQL_UNION, "union all + re-aggregate")
    reg.add("rollup_agg", rollup_agg, SQL_ROLLUP, "rollup hierarchy totals")
    reg.add("q4_exists_semi", q4_exists_semi, SQL_Q4, "correlated EXISTS -> semi join")
    reg.add("q18_large_orders", q18_large_orders, SQL_Q18, "having-before-join Q18 shape")
    reg.add("grouping_sets_agg", grouping_sets_agg, SQL_GROUPING_SETS, "explicit grouping sets + gid")
    reg.add("percentiles_by_flag", percentiles_by_flag, SQL_PERCENTILES, "exact discrete quantiles")
    reg.add(
        "percentile_cont_by_flag",
        percentile_cont_by_flag,
        SQL_PERCENTILE_CONT,
        "exact interpolated (percentile_cont) quartiles via ObjectHashAggregate",
    )
    reg.add(
        "winsorize_values",
        winsorize_values,
        SQL_WINSORIZE,
        "per-group [p5, p95] winsorization: broadcast stats + narrow clamp",
    )
    reg.add(
        "equidepth_histogram",
        equidepth_histogram,
        SQL_EQUIDEPTH,
        "decile equi-depth histogram without a global ntile sort",
    )
    # rows-only BY DESIGN: the sketch's values equal the exact-quantile SQL
    # only while each group stays under ~accuracy/2 rows (sf < ~0.17) -- a
    # value oracle would spuriously fail on bigger runs. The value check is
    # percentiles_approx_rank_check (scale-proof, hash-green) plus the
    # error-bound property test.
    reg.add(
        "percentiles_by_flag_approx",
        percentiles_by_flag_approx,
        None,
        "mergeable-sketch quantiles (the 100 TB path; values rows-only, "
        "verified by percentiles_approx_rank_check)",
    )
    reg.add(
        "percentiles_approx_rank_check",
        percentiles_approx_rank_check,
        SQL_PCT_RANK_CHECK,
        "GK-sketch rank-error bound verified per group, scale-proof oracle",
    )
    reg.add("intersect_except_keys", intersect_except_keys, SQL_INTERSECT_EXCEPT, "INTERSECT / EXCEPT set ops")
    reg.add("q7_volume_shipping", q7_volume_shipping, SQL_Q7, "bi-nation volume by year, dual nation roles")
    reg.add("q10_returned_items", q10_returned_items, SQL_Q10, "returned-item revenue top-20")
    reg.add("q15_top_supplier", q15_top_supplier, SQL_Q15, "argmax supplier via scalar subquery")
    reg.add("q19_disjunctive_filter", q19_disjunctive_filter, SQL_Q19, "disjunctive predicate pushdown")
    reg.add("q22_idle_customers", q22_idle_customers, SQL_Q22, "scalar avg subquery + anti join")
    reg.add(
        "runtime_bloom_join",
        runtime_bloom_join,
        SQL_BLOOM_JOIN,
        "runtime bloom-filter pruned sort-merge join (InjectRuntimeFilter)",
    )

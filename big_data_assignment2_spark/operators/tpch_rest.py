"""The ten TPC-H query shapes not yet covered by ``relational.py``
(Q2/Q8/Q9/Q11/Q12/Q13/Q16/Q17/Q20/Q21), adapted to the synthetic star
schema, completing the full 22-query suite.

Adaptation notes (the synthetic schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns):

- part-supplier facts (supply cost, available qty) are derived from
  ``lineitem`` itself -- e.g. Q2's supply cost becomes the minimum
  observed unit price ``l_extendedprice / l_quantity`` per (part,
  supplier); Q11's stock value becomes shipped ``l_extendedprice`` per
  part; Q20's availqty threshold becomes a supplier's share of a part's
  shipped quantity;
- lateness (Q12/Q21) is ``l_shipdate > o_orderdate + N days`` instead of
  receipt-vs-commit dates;
- Q13's comment anti-filter becomes an ``o_orderpriority`` exclusion
  INSIDE the left-join condition (the point of the shape: customers whose
  only orders are excluded still appear with count 0).

Each query keeps the ORIGINAL plan shape the TPC-H query exists to
exercise -- correlated min (Q2), share-of-market ratio agg (Q8),
profit expression over a 5-way join (Q9), scalar-subquery threshold
(Q11), CASE count agg (Q12), left-join histogram (Q13), anti-join +
count-distinct (Q16), correlated per-group avg threshold (Q17), nested
semi-join chain (Q20), and the multi-exists "waiting supplier" rewrite
(Q21, expressed as two co-partitioned aggregations instead of the naive
double self-join -- one shuffle of (order, supplier) rows, which is the
form that survives 100 TB).

Scale posture matches ``relational.py``: every dimension join is
``F.broadcast``; fact-fact joins shuffle once on the join key; aggregates
are two-phase hash aggregates; all double sums go through the exact
decimal accumulation in ``_util.dsum`` so results are order-independent.
Reference parity anchor: the reference engine has no relational suite at
all (SURVEY.md section 2: its queries are BM25 search only), so this whole
module is "beyond-reference" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import davg, dsum, ntz_lit, sql_davg, sql_dsum, sql_ts

# --- Q2: minimum-cost supplier (correlated MIN subquery) ----------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 15


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the minimum supply cost within a region. Supply cost is adapted to
    the min observed unit price per (part, supplier) from lineitem.

    The correlated ``cost = (SELECT min(cost) ...)`` is decorrelated into
    a window MIN over the already-filtered join result: one pass, no
    re-join against a subquery. Dimension sides (part, supplier, nation,
    region) all broadcast; the only shuffle is the (part, supplier)
    aggregation of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") >= Q2_SIZE_LO)
        & (F.col("p_size") <= Q2_SIZE_HI)
        & (F.col("p_type") == Q2_TYPE)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias("cost"))
    )
    joined = (
        cost.join(F.broadcast(part), cost.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), cost.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "cost")
    )


SQL_Q2 = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(round(l_extendedprice / l_quantity, 6)) AS cost
  FROM lineitem GROUP BY 1, 2
), joined AS (
  SELECT p_partkey, p_brand, s_name, n_name, cost,
         min(cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM cost
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND p_type = '{Q2_TYPE}' AND r_name = '{Q2_REGION}'
)
SELECT p_partkey, p_brand, s_name, n_name, cost
FROM joined WHERE cost = min_cost
"""


# --- Q8: national market share -------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_3"
Q8_TYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of a region's market for one part
    type, per order year. Numerator and denominator are computed in ONE
    two-phase aggregate (conditional sum + total sum share the shuffle);
    the supplier-side nation dim is joined a second time under a
    different role name, like Q7."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(n_supp), sup.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(nat_rev, 4).alias("nation_revenue"),
            dsum(rev, 4).alias("total_revenue"),
            F.round(dsum(nat_rev, 4) / dsum(rev, 4), 6).alias("mkt_share"),
        )
    )


SQL_Q8 = f"""
SELECT year(o_orderdate) AS o_year,
       {sql_dsum(f"CASE WHEN ns.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)} AS nation_revenue,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue,
       round({sql_dsum(f"CASE WHEN ns.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
             / {sql_dsum('l_extendedprice * (1 - l_discount)', 4)}, 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
GROUP BY 1
"""


# --- Q9: product-type profit ----------------------------------------------------

Q9_NAME_FRAGMENT = "gear"
Q9_COST_FACTOR = 0.5  # stands in for ps_supplycost: half the retail price


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year for parts
    matching a name fragment. Supply cost is adapted to
    ``0.5 * p_retailprice * l_quantity`` (no partsupp table). The profit
    expression evaluates row-wise inside the scan-side projection; only
    (nation, year) group rows shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        Q9_COST_FACTOR
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, 4).alias("sum_profit"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_dsum(f'l_extendedprice * (1 - l_discount) - {Q9_COST_FACTOR} * p_retailprice * l_quantity', 4)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
GROUP BY 1, 2
"""


# --- Q11: important parts (scalar-subquery threshold) ---------------------------

Q11_NATION = "NATION_7"
Q11_MULTIPLE = 2.0


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (adapted: shipped
    ``l_extendedprice`` through suppliers of one nation) exceeds a
    threshold scalar subquery. The original's fixed fraction-of-total
    threshold must shrink as 1/SF to stay meaningful (TPC-H specifies
    exactly that), so this adaptation uses a scale-free multiple of the
    AVERAGE per-part value instead -- the selected set stays
    non-degenerate at every scale factor. The 1-row scalar is an
    aggregate of the per-part values, broadcast back as a cross join --
    the per-part table is aggregated ONCE and reused for both sides (no
    second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    per_part = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice"), 2).alias("part_value"))
    )
    threshold = per_part.agg(
        F.round(davg(F.col("part_value"), 2), 6).alias("avg_value")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("part_value") > Q11_MULTIPLE * F.col("avg_value"))
        .select("l_partkey", "part_value")
    )


SQL_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice', 2)} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey, part_value FROM per_part
WHERE part_value > {Q11_MULTIPLE} * (
  SELECT round({sql_davg('part_value', 2)}, 6) FROM per_part)
"""


# --- Q12: late shipments by priority class (CASE count agg) ---------------------

Q12_LATE_DAYS = 90


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per shipping class.
    Lateness is adapted to ship-vs-order date (no receipt/commit dates).
    Both CASE counts evaluate inside one two-phase aggregate; the
    fact-fact join shuffles once on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.when(late, "LATE").otherwise("ONTIME").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_Q12 = f"""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --- Q13: customer order-count distribution (left-join histogram) ---------------

Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer INCLUDING
    zero-order customers. The exclusion predicate lives in the join
    condition, not a WHERE (a WHERE would silently drop the c_count=0
    customers -- the entire point of the left join). Two aggregations:
    per-customer count (shuffle on custkey), then the tiny histogram."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_Q13 = f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
"""


# --- Q16: supplier counts by part attributes (anti join + count distinct) -------

Q16_EXCLUDED_BRAND = "Brand#4"
Q16_EXCLUDED_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 24, 30, 36)


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size),
    excluding a brand/type and a NOT-IN supplier set (adapted: suppliers
    with negative account balance; the original excludes complaint
    suppliers by comment). The NOT IN becomes a broadcast left-anti
    join -- null-safe and shuffle-free, unlike a naive NOT IN subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & (F.col("p_type") != Q16_EXCLUDED_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}' AND p_type <> '{Q16_EXCLUDED_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --- Q17: small-quantity-order revenue (correlated per-group avg) ----------------

Q17_BRAND = "Brand#2"
Q17_QTY_FACTOR = 0.2


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders were not taken. The correlated ``l_quantity < 0.2 * avg(...)``
    per part is decorrelated into a per-part aggregate joined back --
    both sides hash-partition on partkey, so the join-back is
    co-partitioned with the aggregation that produced it. The threshold
    goes through round(.,6) on the decimal-exact average so the double
    comparison is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == Q17_BRAND)
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.round(Q17_QTY_FACTOR * davg(F.col("l_quantity")), 6).alias("qty_thr"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(dsum(F.col("l_extendedprice"), 2) / 7.0, 6).alias("avg_yearly")
        )
    )


SQL_Q17 = f"""
WITH thresholds AS (
  SELECT l_partkey AS t_partkey,
         round({Q17_QTY_FACTOR} * {sql_davg('l_quantity')}, 6) AS qty_thr
  FROM lineitem GROUP BY 1
)
SELECT round({sql_dsum('l_extendedprice', 2)} / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thresholds ON l_partkey = t_partkey
WHERE p_brand = '{Q17_BRAND}' AND l_quantity < qty_thr
"""


# --- Q20: promotable suppliers (nested semi-join chain) --------------------------

Q20_TYPE = "PROMO"
Q20_LO = "1997-01-01 00:00:00"
Q20_HI = "1998-01-01 00:00:00"
Q20_SHARE = 0.5


def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of some part's
    flow (adapted: shipped > half a part's yearly quantity of one part
    type; the original compares availqty to shipped qty). The qualifying
    (part, supplier) pairs reduce to a supplier key set that SEMI-joins
    the supplier dim -- suppliers qualify once no matter how many parts
    they dominate, and the big side never carries supplier payload
    columns."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ntz_lit(Q20_LO)) & (F.col("l_shipdate") < ntz_lit(Q20_HI))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q20_TYPE)
    sup = load_table(spark, sf_dir, "supplier")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("supp_qty"))
    )
    part_total = ps.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        dsum(F.col("supp_qty"), 2).alias("part_qty")
    )
    dominant = (
        ps.join(part_total, ps.l_partkey == F.col("pt_partkey"))
        .where(F.col("supp_qty") > Q20_SHARE * F.col("part_qty"))
        .select("l_suppkey")
    )
    return sup.join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


SQL_Q20 = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity', 2)} AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q20_TYPE}'
    AND l_shipdate >= {sql_ts(Q20_LO)} AND l_shipdate < {sql_ts(Q20_HI)}
  GROUP BY 1, 2
), part_total AS (
  SELECT l_partkey AS pt_partkey, {sql_dsum('supp_qty', 2)} AS part_qty
  FROM ps GROUP BY 1
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM ps JOIN part_total ON l_partkey = pt_partkey
  WHERE supp_qty > {Q20_SHARE} * part_qty)
"""


# --- Q21: suppliers who kept orders waiting (multi-exists rewrite) ----------------

Q21_LATE_DAYS = 60
Q21_STATUS = "F"
Q21_TOP = 20


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order. The classic form is a double
    correlated EXISTS / NOT EXISTS self-join of lineitem; that plan
    scans the fact three times and shuffles twice. Rewritten as one
    (order, supplier) aggregation + one per-order aggregation over a
    SINGLE explicit hash partitioning on orderkey: HashPartitioning(ok)
    satisfies the clustered-by-(ok, suppkey) requirement of the first
    groupBy (subset rule), the ok-only requirement of the second, and
    both sides of the join-back -- one fact shuffle total,
    plan-asserted. Lateness adapted to ship-vs-order date."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == Q21_STATUS
    )
    sup = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("any_late"))
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("any_late").alias("n_late"),
    )
    waiting = (
        per_supp.join(per_order, per_supp.l_orderkey == F.col("o_key"))
        .where((F.col("any_late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


SQL_Q21 = f"""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS any_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = '{Q21_STATUS}'
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey AS o_key, count(*) AS n_supps, sum(any_late) AS n_late
  FROM per_supp GROUP BY 1
)
SELECT s_name, count(*) AS numwait
FROM per_supp
JOIN per_order ON l_orderkey = o_key
JOIN supplier ON l_suppkey = s_suppkey
WHERE any_late = 1 AND n_supps > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_TOP}
"""


def register(reg: Registry) -> None:
    reg.add("q2_min_cost_supplier", q2_min_cost_supplier, SQL_Q2,
            "correlated MIN via window over broadcast dims")
    reg.add("q8_market_share", q8_market_share, SQL_Q8,
            "market-share ratio agg, dual nation roles")
    reg.add("q9_product_profit", q9_product_profit, SQL_Q9,
            "profit expression over 5-way join")
    reg.add("q11_important_parts", q11_important_parts, SQL_Q11,
            "scalar-subquery threshold over reused aggregate")
    reg.add("q12_late_shipments", q12_late_shipments, SQL_Q12,
            "CASE count agg over fact-fact join")
    reg.add("q13_customer_distribution", q13_customer_distribution, SQL_Q13,
            "left-join histogram incl. zero-order customers")
    reg.add("q16_part_supplier_counts", q16_part_supplier_counts, SQL_Q16,
            "anti join + count-distinct by part attrs")
    reg.add("q17_small_qty_revenue", q17_small_qty_revenue, SQL_Q17,
            "correlated per-group avg threshold, co-partitioned join-back")
    reg.add("q20_promotable_suppliers", q20_promotable_suppliers, SQL_Q20,
            "nested semi-join chain over two-level agg")
    reg.add("q21_waiting_suppliers", q21_waiting_suppliers, SQL_Q21,
            "multi-exists rewrite: two co-partitioned aggs, no self-join")

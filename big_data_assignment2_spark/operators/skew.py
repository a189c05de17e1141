"""Skew mitigation for large joins: key salting.

A shuffled join hashes rows to reducers by join key; one hot key (a
celebrity user, a default/null sentinel, a viral document) sends its
entire volume to ONE task, and that straggler sets the stage's wall
clock at 100 TB. Two remedies, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
   ``session.py``): Spark splits oversized shuffle partitions at runtime
   and replicates the matching build side. Zero code changes -- use it
   first.
2. **Explicit salting** (this module), for when AQE can't see the skew
   (e.g. it's inside an aggregation, or the planner must commit before
   runtime stats exist): widen the hot key into ``SALT`` sub-keys on the
   big side, replicate the small side once per sub-key, join on
   ``(key, salt)``, and the hot key's volume spreads over ``SALT`` tasks.

The salt must be DETERMINISTIC here (xxhash64 of the row's identity, not
``rand()``) so results are reproducible and the oracle can't flake; any
per-row value with good dispersion works because the salt never leaves
the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import dsum, sql_dsum

SALT = 8


def salted_join(big: DataFrame, small: DataFrame, big_key: str, small_key: str,
                salt_col: F.Column, n: int = SALT) -> DataFrame:
    """Inner-join ``big`` to ``small`` on the given keys with an n-way
    salt: big rows get ``pmod(xxhash64(salt_col), n)``, small rows are
    exploded into n copies (one per salt value). Equivalent rows out to a
    plain join; the hot key's rows land on n reducers instead of one."""
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(n)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    return big_s.join(
        small_s,
        (F.col(big_key) == F.col(small_key)) & (big_s["_salt"] == small_s["_salt"]),
    ).drop("_salt")


def join_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-orders join executed through :func:`salted_join` (salt on
    the line identity), then re-aggregated by priority. The oracle is the
    UNSALTED join -- proving the technique changes the physical
    distribution and nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey",
                         F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")))
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice")).alias("revenue"),
    )


SQL_SALTED = f"""
SELECT o_orderpriority, count(*) AS n_lines, {sql_dsum('l_extendedprice')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


HOT_MOD = 5  # every MOD-th lineitem FK collapses onto the hot key
HOT_KEY = 0  # an existing o_orderkey (keys are 0..N-1 in this data)


def _skewed_fk():
    """Planted power-law FK: ~1/HOT_MOD of all lineitem rows point at ONE
    order -- the celebrity-key distribution AQE's skew join exists for."""
    return (
        F.when(F.col("l_orderkey") % HOT_MOD == 0, F.lit(HOT_KEY))
        .otherwise(F.col("l_orderkey"))
        .alias("fk")
    )


def skew_join_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AQE-remedy twin of :func:`join_salted_agg` (remedy 1 of this
    module's header): the same fact-dim join with a PLANTED hot key --
    ~20% of lineitem rows collapse onto one order -- left for Spark's
    runtime skew handling instead of explicit salting. The query itself
    is written with ZERO skew awareness: at cluster scale AQE observes
    the oversized shuffle partition at stage boundary, splits it, and
    replicates the matching dim rows (``tests/test_skew.py`` executes
    this join under scoped thresholds and asserts the final adaptive plan
    marks the sort-merge join ``skew=true``). Values are
    skew-handling-independent; the oracle mirrors the FK collapse."""
    li = load_table(spark, sf_dir, "lineitem").select(
        _skewed_fk(), "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(orders, li.fk == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("revenue"),
        )
    )


SQL_SKEW_AQE = f"""
WITH li AS (
  SELECT CASE WHEN l_orderkey % {HOT_MOD} = 0 THEN {HOT_KEY} ELSE l_orderkey END AS fk,
         l_extendedprice
  FROM lineitem
)
SELECT o_orderpriority, count(*) AS n_lines, {sql_dsum('l_extendedprice')} AS revenue
FROM li JOIN orders ON fk = o_orderkey
GROUP BY o_orderpriority
"""


def register(reg: Registry) -> None:
    reg.add("join_salted_agg", join_salted_agg, SQL_SALTED, "salted skew-proof join")
    reg.add(
        "skew_join_aqe",
        skew_join_aqe,
        SQL_SKEW_AQE,
        "planted hot-key join left to AQE runtime skew splitting",
    )

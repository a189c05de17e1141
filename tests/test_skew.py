"""Salted-join equivalence: the salt changes row distribution, never the
result."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment2_spark.operators.skew import join_salted_agg, salted_join
from big_data_assignment2_spark.sources.catalog import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted = salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")),
    ).select("l_orderkey", "l_linenumber", "o_orderpriority")
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed big side ends up joined across multiple salt values."""
    big = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    small = spark.createDataFrame([(1, "hot")], "k2 long, tag string")
    out = salted_join(big, small, "k", "k2", F.col("row_id"), n=8)
    assert out.count() == 1000
    # the salt column is dropped, but distribution is observable pre-drop
    salts = (
        big.withColumn("_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)))
        .select("_salt").distinct().count()
    )
    assert salts == 8


def test_join_salted_agg_runs(spark, sf_dir):
    rows = {r["o_orderpriority"]: r["n_lines"] for r in join_salted_agg(spark, sf_dir).collect()}
    assert sum(rows.values()) == load_table(spark, sf_dir, "lineitem").count()

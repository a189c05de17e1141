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


def test_aqe_splits_planted_skew(spark, sf_dir):
    """The planted hot key of skew_join_aqe must actually trigger AQE's
    runtime skew handling. A skewed reduce partition can only be split at
    MAP-output granularity, and the tiny single-row-group test parquet
    scans as ONE map task -- so the fact side is explicitly repartitioned
    here to stand in for the thousands of scan tasks a real table has;
    the operator itself stays repartition-free. Executed under scoped
    thresholds, the FINAL adaptive plan must mark the sort-merge join
    skew=true; confs must come back untouched."""
    from big_data_assignment2_spark.operators.skew import _skewed_fk
    from big_data_assignment2_spark.sources.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = (
            load_table(spark, sf_dir, "lineitem")
            .repartition(16)  # map-task stand-in (see docstring)
            .select(_skewed_fk(), "l_extendedprice")
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        df = li.join(orders, li.fk == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        df.collect()  # run THIS QueryExecution to its final adaptive plan
        plan = str(df._jdf.queryExecution().executedPlan())  # noqa: SLF001
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert {k: spark.conf.get(k, None) for k in confs} == prev

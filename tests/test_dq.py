"""Data-quality operators: checksum sensitivity/invariance beyond the
DuckDB oracle match (the oracle proves cross-engine agreement; these prove
the checksum actually discriminates content and ignores layout)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from big_data_assignment2_spark.operators import dq


def _sums(df) -> dict[str, str]:
    return {r["table_name"]: r["checksum"] for r in df.collect()}


def test_checksum_layout_invariant_and_mutation_sensitive(spark, sf_dir, tmp_path):
    base = _sums(dq.table_checksum(spark, sf_dir))

    d = tmp_path / "mut"
    d.mkdir()
    # layout change only: rewrite orders into many small files, copy customer
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartition(7)
        .write.mode("overwrite")
        .parquet(str(d / "orders.parquet"))
    )
    shutil.copy(f"{sf_dir}/customer.parquet", str(d / "customer.parquet"))
    relaid = _sums(dq.table_checksum(spark, str(d)))
    assert relaid == base  # file count / row order must not move the checksum

    # content change: bump one order's totalprice by a cent
    d2 = tmp_path / "mut2"
    d2.mkdir()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    key = o.select(F.min("o_orderkey")).first()[0]
    o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == key, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    ).write.mode("overwrite").parquet(str(d2 / "orders.parquet"))
    shutil.copy(f"{sf_dir}/customer.parquet", str(d2 / "customer.parquet"))
    mutated = _sums(dq.table_checksum(spark, str(d2)))
    assert mutated["customer"] == base["customer"]
    assert mutated["orders"] != base["orders"]  # a one-cent edit must show


def test_chi2_nonnegative_and_dof(spark, sf_dir):
    row = dq.chi2_lang_source(spark, sf_dir).first()
    assert row["chi2"] >= 0.0
    assert row["dof"] >= 1
    assert row["n_cells"] >= 1


def test_outlier_zscore_constant_group_reports_nothing(spark, sf_dir, tmp_path):
    """Zero-variance guard (round-6 ADVICE): a constant-valued group has
    sd = 0, where z = 0/0 = NaN and Spark's NaN-is-largest ordering would
    report EVERY row of the group as an outlier. The guard must instead
    report NO rows for that group, while a genuinely skewed group still
    surfaces its planted outlier -- and no NaN ever escapes."""
    import math

    d = tmp_path / "ev"
    d.mkdir()
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = []
    # constant group: 50 identical values
    for i in range(50):
        rows.append((900000 + i, 7000 + i, "constgrp", 5.0))
    # spread group: 50 unit-spaced values + one far outlier
    for i in range(50):
        rows.append((910000 + i, 8000 + i, "spreadgrp", float(i % 5)))
    rows.append((920000, 9000, "spreadgrp", 1000.0))
    extra = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.lit(None).cast(base.schema["ts"].dataType).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit(None).cast(base.schema["props"].dataType).alias("props"),
    )
    extra.select(*base.columns).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    out = dq.outlier_zscore(spark, str(d)).collect()
    assert all(r["event_type"] != "constgrp" for r in out), out
    assert any(r["event_id"] == 920000 for r in out), out
    assert all(not math.isnan(r["z"]) for r in out), out

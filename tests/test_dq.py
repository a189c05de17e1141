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

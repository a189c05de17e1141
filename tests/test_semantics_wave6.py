"""Semantic invariants for the round-6 final-wave operators.

The DuckDB oracle proves CROSS-ENGINE equality; these tests pin the
ALGORITHMS themselves -- a bug both engines share (an argmin flipped to
argmax, a bucket boundary off by one) would hash-match and still be
wrong. Each test asserts a property the algorithm guarantees by
construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmeans_reassignment_is_monotone(spark, sf_dir):
    """Lloyd's assignment step: given the SAME centroids c1, letting
    every point re-pick its nearest centroid (a2) cannot cost more than
    keeping the old assignment (a1). Exact inequality -- both sides are
    decimal distances against identical c1, no rounding slack needed."""
    from pyspark.sql import Window

    from big_data_assignment2_spark.operators.similarity import KM_K, KM_DEC
    from big_data_assignment2_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.posexplode("embedding").alias("dim", "fval")).select(
        "vec_id", "dim", F.col("fval").cast("double").alias("val")
    )
    c0 = e.where(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("val").alias("cval")
    )

    def dists(cents):
        diff = F.col("val") - F.col("cval")
        return (
            e.join(F.broadcast(cents), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum((diff * diff).cast(KM_DEC)).alias("dist"))
        )

    def argmin(d):
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "dist")
        )

    d1 = dists(c0)
    a1 = argmin(d1)
    from big_data_assignment2_spark.operators._util import davg

    c1 = (
        e.join(a1.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(F.round(davg(F.col("val"), 8), 6).alias("cval"))
    )
    d2 = dists(c1)
    a2 = argmin(d2)
    # cost of old labels under c1 vs cost of re-picked labels under c1
    old_cost = (
        d2.join(a1.select("vec_id", F.col("cid").alias("cid_old")), "vec_id")
        .where(F.col("cid") == F.col("cid_old"))
        .agg(F.sum("dist"))
        .collect()[0][0]
    )
    new_cost = a2.agg(F.sum("dist")).collect()[0][0]
    assert new_cost <= old_cost, (new_cost, old_cost)


def test_m4_bucket_invariants(spark, sf_dir):
    """Per bucket: exactly one row of each kind, min.value <= max.value,
    first.ts <= last.ts, and min/max really bound every value in the
    bucket (checked against an independent plain aggregate)."""
    from big_data_assignment2_spark.operators.windows import (
        M4_BUCKET_S,
        minmax_downsample,
    )
    from big_data_assignment2_spark.sources.catalog import load_table

    out = minmax_downsample(spark, sf_dir)
    kinds = (
        out.groupBy("bucket_epoch")
        .pivot("kind", ["min", "max", "first", "last"])
        .count()
    )
    for r in kinds.collect():
        assert [r["min"], r["max"], r["first"], r["last"]] == [1, 1, 1, 1], r

    wide = (
        out.groupBy("bucket_epoch")
        .agg(
            F.min(F.when(F.col("kind") == "min", F.col("value"))).alias("vmin"),
            F.min(F.when(F.col("kind") == "max", F.col("value"))).alias("vmax"),
            F.min(F.when(F.col("kind") == "first", F.col("ts_epoch"))).alias("tfirst"),
            F.min(F.when(F.col("kind") == "last", F.col("ts_epoch"))).alias("tlast"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    truth = (
        ev.select(
            (F.floor(epoch_s / M4_BUCKET_S) * M4_BUCKET_S)
            .cast("long")
            .alias("bucket_epoch"),
            F.round("value", 6).alias("v"),
        )
        .groupBy("bucket_epoch")
        .agg(F.min("v").alias("true_min"), F.max("v").alias("true_max"))
    )
    for r in wide.join(truth, "bucket_epoch").collect():
        assert r["vmin"] == r["true_min"], r
        assert r["vmax"] == r["true_max"], r
        assert r["tfirst"] <= r["tlast"], r


def test_phash_clusters_partition_the_dup_set(spark, sf_dir):
    """Cluster report sanity: every cluster >= 2 docs, representatives
    are cluster members, and total clustered docs == n_docs minus the
    uniquely-hashed ones (cross-checked from the raw hash table)."""
    from big_data_assignment2_spark.operators.multimodal import (
        image_phash,
        image_phash_clusters,
    )

    sig = image_phash(spark, sf_dir).cache()
    clusters = image_phash_clusters(spark, sf_dir)
    joined = clusters.join(sig, "phash").where(
        F.col("keep_doc_id") == F.col("doc_id")
    )
    n_clusters = clusters.count()
    assert joined.count() == n_clusters  # each representative is a member
    total_in_clusters = clusters.agg(F.sum("n_docs")).collect()[0][0]
    by_hash = sig.groupBy("phash").count()
    expect = by_hash.where(F.col("count") >= 2).agg(F.sum("count")).collect()[0][0]
    assert total_in_clusters == expect
    assert n_clusters >= 1  # non-vacuous on this corpus
    sig.unpersist()

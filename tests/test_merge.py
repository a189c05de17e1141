"""MERGE (upsert + delete) over the bucket-partitioned parquet base.

The scale claim under test: a merge touches ONLY the bucket partitions
the change set hashes into -- the read is directory-pruned and the write
(dynamic partition overwrite) replaces exactly those directories, so
every other byte of the table is untouched.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_spark.operators import merge
from big_data_assignment2_spark.plans.audit import explain_formatted
from big_data_assignment2_spark.sources.catalog import load_table


def _file_hashes(base: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(f"{base}/bucket=*/**/*.parquet", recursive=True):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, base)] = hashlib.md5(fh.read()).hexdigest()
    return out


@pytest.fixture()
def base(spark, sf_dir, tmp_path) -> str:
    path = str(tmp_path / "orders_base")
    merge.write_base(load_table(spark, sf_dir, "orders"), path)
    return path


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_merge_touches_only_affected_buckets(spark, sf_dir, base):
    """Change keys hashing into two buckets -> every file of the other
    14 bucket directories is byte-identical after the merge."""
    orders = load_table(spark, sf_dir, "orders")
    k_upd, k_del = [
        int(r[0])
        for r in orders.select("o_orderkey").orderBy("o_orderkey").limit(2).collect()
    ]
    k_ins = k_upd + merge.INSERT_SHIFT  # same bucket as k_upd
    changes = (
        orders.where(F.col("o_orderkey") == k_upd)
        .select(
            F.lit("U").alias("op"),
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        .unionByName(
            orders.where(F.col("o_orderkey") == k_del).select(
                F.lit("D").alias("op"),
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
        .unionByName(
            orders.where(F.col("o_orderkey") == k_upd).select(
                F.lit("I").alias("op"),
                F.lit(k_ins).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        )
    )
    before = _file_hashes(base)
    affected = merge.merge_into(spark, base, changes)
    after = _file_hashes(base)

    want_affected = sorted({k % merge.N_BUCKETS for k in (k_upd, k_del, k_ins)})
    assert affected == want_affected
    untouched_dirs = {f"bucket={b}" for b in range(merge.N_BUCKETS)} - {
        f"bucket={b}" for b in affected
    }
    for rel, digest in before.items():
        if rel.split(os.sep)[0] in untouched_dirs:
            assert after.get(rel) == digest, f"untouched file rewritten: {rel}"

    got = _rows(spark.read.parquet(base).drop("bucket"))
    want = _rows(
        orders.where(~F.col("o_orderkey").isin([k_upd, k_del]))
        .unionByName(changes.where(F.col("op") != "D").drop("op"))
    )
    assert got == want


def test_merge_keys_stay_unique(spark, sf_dir, tmp_path):
    """Upsert of an EXISTING key must replace, not duplicate."""
    path = str(tmp_path / "base")
    merge.write_base(load_table(spark, sf_dir, "orders"), path)
    merge.merge_into(spark, path, merge.change_set(spark, sf_dir))
    merged = spark.read.parquet(path)
    assert merged.count() == merged.select("o_orderkey").distinct().count()


def test_merge_base_read_is_partition_pruned(spark, sf_dir, base):
    """The base read during a merge prunes to the affected bucket
    DIRECTORIES (PartitionFilters), never row-filters the whole table."""
    df = merge.pruned_base(spark, base, [3, 5])
    plan = explain_formatted(df)
    pf = [l.strip() for l in plan.splitlines() if l.strip().startswith("PartitionFilters:")]
    assert pf and "bucket" in pf[0], plan
    assert "in(3,5)" in pf[0].replace(" ", "").lower(), pf[0]


def test_registered_merge_buckets_consistent(spark, sf_dir):
    """The registered roundtrip's bucket column agrees with the key it
    was partitioned under (a row in the wrong directory would break
    future pruned merges)."""
    df = merge.merge_upsert_roundtrip(spark, sf_dir)
    path = merge.merged_orders_path(spark, sf_dir)
    bad = (
        spark.read.parquet(path)
        .where(F.col("bucket") != (F.col("o_orderkey") % merge.N_BUCKETS).cast("int"))
        .count()
    )
    assert bad == 0
    assert df.count() > 0


def test_merge_composes_over_random_change_sets(spark, sf_dir, tmp_path):
    """Soak the merge path: three successive merges with seeded
    pseudo-random update/delete/insert sets (derived from key hashes, so
    deterministic), then verify the final table equals a Python-side
    reconstruction applying the same change log in order. Pins that
    upsert-replace, delete, re-insert-after-delete, and
    update-of-inserted-key all compose."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "soak")
    merge.write_base(orders, path)
    cols = orders.columns
    rows = {r["o_orderkey"]: tuple(r) for r in orders.collect()}
    ki = cols.index("o_orderkey")
    pi = cols.index("o_totalprice")

    def mk_changes(round_no: int):
        """Deterministic per-round ops over the CURRENT expected state."""
        ops = []
        for k in sorted(rows):
            h = (k * 2654435761 + round_no * 97) % 10
            if h == 0:
                t = list(rows[k]); t[pi] = round(t[pi] + 1 + round_no, 2)
                ops.append(("U", tuple(t)))
            elif h == 1:
                ops.append(("D", rows[k]))
        # re-insert one previously deleted key if any, plus a fresh key
        fresh_k = max(rows) + 1_000_000 + round_no
        t = list(next(iter(rows.values()))); t[ki] = fresh_k
        ops.append(("I", tuple(t)))
        return ops

    for rnd in range(3):
        ops = mk_changes(rnd)
        change_rows = [(op, *row) for op, row in ops]
        changes = spark.createDataFrame(
            change_rows, schema=["op", *cols]
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
        merge.merge_into(spark, path, changes)
        for op, row in ops:
            k = row[ki]
            if op == "D":
                rows.pop(k, None)
            else:
                rows[k] = row

    got = {r["o_orderkey"]: tuple(r) for r in spark.read.parquet(path).drop("bucket").select(*cols).collect()}
    assert set(got) == set(rows)
    for k in rows:
        assert got[k] == rows[k], (k, got[k], rows[k])

"""Manifest invariants: footer stats are complete and pruning is real."""

from __future__ import annotations

from big_data_assignment2_spark.sources.manifest import (
    ensure_manifest,
    plan_files,
)
from big_data_assignment2_spark.sources.partitioned_sink import (
    RANGE_FILES,
    RANGE_HI,
    RANGE_LO,
)
from big_data_assignment2_spark.sources.catalog import load_table


def test_manifest_rows_sum_to_table(spark, sf_dir):
    man = ensure_manifest(spark, sf_dir)
    assert len(man) == RANGE_FILES
    assert sum(m["n_rows"] for m in man) == load_table(spark, sf_dir, "lineitem").count()
    for m in man:
        assert m["ship_min_us"] <= m["ship_max_us"]
        assert m["n_row_groups"] >= 1


def test_manifest_intervals_disjoint(spark, sf_dir):
    """Range clustering makes the per-file shipdate intervals disjoint
    (ties at boundaries aside): sorted by min, each file starts at or
    after the previous file's max."""
    man = sorted(ensure_manifest(spark, sf_dir), key=lambda m: m["ship_min_us"])
    for prev, cur in zip(man, man[1:]):
        assert cur["ship_min_us"] >= prev["ship_max_us"]


def test_plan_prunes_strict_subset(spark, sf_dir):
    keep, total = plan_files(spark, sf_dir, RANGE_LO, RANGE_HI)
    assert 1 <= len(keep) < total  # the 1-year range cannot need all 8 files


def test_plan_empty_range_selects_nothing(spark, sf_dir):
    keep, _ = plan_files(spark, sf_dir, "1931-01-01", "1932-01-01")
    assert keep == []

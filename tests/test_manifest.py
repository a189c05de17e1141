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


def test_incremental_append_is_one_file(spark, sf_dir):
    from big_data_assignment2_spark.sources.manifest import ensure_append

    path, rows = ensure_append(spark, sf_dir)
    assert len(rows) == 1
    assert rows[0]["n_rows"] > 0


def test_incremental_plan_selects_only_the_append(spark, sf_dir):
    """The shifted window must plan to exactly the appended file, and
    the BASE window must still plan to base files only -- the append is
    invisible to old readers."""
    from big_data_assignment2_spark.sources.manifest import (
        APPEND_LO,
        _plan,
        _shift_iso,
        ensure_append,
        ensure_manifest,
    )
    from big_data_assignment2_spark.sources.partitioned_sink import RANGE_HI, RANGE_LO

    base = ensure_manifest(spark, sf_dir)
    apath, app = ensure_append(spark, sf_dir)
    lo, hi = _shift_iso(APPEND_LO), _shift_iso("1995-04-01")
    keep = _plan(base + app, lo, hi)
    assert keep == [app[0]["file_path"]]
    base_keep = _plan(base + app, RANGE_LO, RANGE_HI)
    assert app[0]["file_path"] not in base_keep
    assert len(base_keep) >= 1


def test_plan_keeps_unknown_bounds_and_empty_plan_reads_empty(spark, sf_dir):
    """A manifest row with None bounds (footer-only file / absent column
    stats) must be conservatively KEPT -- pruning on unknown stats would
    silently drop rows -- and an empty plan must read as a zero-row
    lineitem-schema frame, not crash spark.read.parquet() with no paths."""
    from big_data_assignment2_spark.sources.manifest import _plan, _read_planned

    man = [
        {"file_path": "a", "ship_min_us": None, "ship_max_us": None},
        {"file_path": "b", "ship_min_us": 0, "ship_max_us": 1},
    ]
    # window far past file b's interval: only the unknown-bounds file stays
    assert _plan(man, "2050-01-01", "2050-02-01") == ["a"]

    empty = _read_planned(spark, sf_dir, [])
    assert empty.count() == 0
    assert "l_shipdate" in empty.columns and "l_returnflag" in empty.columns


def test_compact_table_files_refuses_empty_dir(spark, tmp_path):
    """Compacting a dir with no parquet data must fail at the real cause,
    not with a downstream schema-inference error."""
    import pytest

    from big_data_assignment2_spark.sources.partitioned_sink import (
        compact_table_files,
    )

    d = str(tmp_path / "nothing")
    (tmp_path / "nothing").mkdir()
    with pytest.raises(ValueError, match="no parquet data"):
        compact_table_files(spark, d, 1 << 20)


def test_ingest_split_covers_negative_and_null_ids(spark):
    """The streaming-ingest corpus split must place EVERY doc in exactly
    one half: Spark's % keeps the dividend's sign (so -3 matches neither
    %2==0 nor %2==1) and NULL ids fail both sides of a %-based split."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("-3",), ("-2",), ("0",), ("7",), (None,), ("x",)], "doc_id string"
    )
    even = F.coalesce(
        F.pmod(F.col("doc_id").try_cast("long"), F.lit(2)) == F.lit(0), F.lit(False)
    )
    e = {r["doc_id"] for r in docs.where(even).collect()}
    o = {r["doc_id"] for r in docs.where(~even).collect()}
    assert e | o == {"-3", "-2", "0", "7", None, "x"}
    assert e & o == set()
    assert e == {"-2", "0"}

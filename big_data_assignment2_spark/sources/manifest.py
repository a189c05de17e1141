"""Iceberg-style manifest: scan planning from file METADATA, not data.

The lakehouse table formats (Iceberg manifests, Delta transaction log,
Hudi timeline) all hinge on one idea: keep a tiny table of per-file
statistics (row count, per-column min/max) and plan every scan against
THAT, so a selective predicate selects file paths from kilobytes of
metadata instead of listing/opening the data files. At 100 TB the
manifest is the difference between a planning step that reads a few MB
and one that touches a million footers.

This module reconstructs that mechanism over the range-clustered
lineitem layout (``partitioned_sink.write_lineitem_range_clustered``):

- ``ensure_manifest`` builds the manifest ONCE per (process, sf_dir) by
  reading each file's parquet FOOTER -- row count, row-group count, and
  the ``l_shipdate`` min/max folded across row groups. The footer read
  is distributed (``mapInPandas`` over the file list with pyarrow on the
  executors, metadata only -- no data pages are decoded), which is the
  shape a manifest *build* takes at scale; a real table format would
  instead append these rows transactionally at commit time.
- ``manifest_pruned_scan`` plans a shipdate-range aggregate against the
  manifest: only files whose [min, max] interval overlaps the query
  range are handed to ``spark.read.parquet`` at all. The row-level
  predicate is still applied after the read, so the result is exact
  whatever the file grain -- pruning is a performance contract, not a
  correctness one -- and the DuckDB oracle computes the same aggregate
  over the ORIGINAL table, value-hash-verifying exactly that.

Reference parity note: the reference engine (411-line Hadoop-Streaming
BM25 stack) has no lakehouse layer; this is a beyond-reference operator
motivated by the 100 TB brief. tests/test_manifest.py asserts the
manifest invariants (row counts sum to the table count; the range
clustering makes the selected-file set a strict subset).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._util import dsum, ntz_lit, sql_dsum
from ..registry import Registry
from .partitioned_sink import RANGE_HI, RANGE_LO, write_lineitem_range_clustered

MANIFEST_SCHEMA = (
    "file_path string, n_rows long, n_row_groups long, "
    "ship_min_us long, ship_max_us long"
)

# manifest rows per (sf_dir): tiny -- one row per data file
_MANIFEST: dict[str, list[dict]] = {}


def _iso_us(iso: str) -> int:
    """Epoch microseconds of a wall-clock ISO date (NTZ domain: no
    timezone enters -- footer stats of an NTZ column are naive too)."""
    return int((datetime.fromisoformat(iso) - datetime(1970, 1, 1)).total_seconds()) * 1_000_000


def build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed footer scan -> manifest DataFrame. One input row per
    data file; executors open only the parquet FOOTER (pyarrow reads
    metadata lazily -- ``ParquetFile(...).metadata`` decodes no data
    pages), emit (path, n_rows, n_row_groups, shipdate min/max in epoch
    micros). Defined-inside generator so cloudpickle ships it by value."""
    import os

    path = write_lineitem_range_clustered(spark, sf_dir)
    files = sorted(
        f"{path}/{f}" for f in os.listdir(path) if f.endswith(".parquet")
    )
    paths_df = spark.createDataFrame([(p,) for p in files], "file_path string")

    def _footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["file_path"]:
                md = pq.ParquetFile(p).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                ci = names.index("l_shipdate")
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    mn = pd.Timestamp(st.min).value // 1000
                    mx = pd.Timestamp(st.max).value // 1000
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                rows.append((p, md.num_rows, md.num_row_groups, lo, hi))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_path",
                    "n_rows",
                    "n_row_groups",
                    "ship_min_us",
                    "ship_max_us",
                ],
            )

    # one footer per task: the build parallelizes across files
    return paths_df.repartition(max(len(files), 1)).mapInPandas(
        _footers, schema=MANIFEST_SCHEMA
    )


def ensure_manifest(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Collected manifest rows, memoized per (process, sf_dir). The
    collect is bounded by the FILE count (8 here; a manifest is small by
    construction -- that is its entire point), mirroring how a real scan
    planner holds manifests driver-side."""
    if sf_dir not in _MANIFEST:
        _MANIFEST[sf_dir] = [r.asDict() for r in build_manifest(spark, sf_dir).collect()]
    return _MANIFEST[sf_dir]


def plan_files(spark: SparkSession, sf_dir: str, lo_iso: str, hi_iso: str) -> tuple[list[str], int]:
    """The planning step: overlap-join the query interval against the
    manifest, return (selected file paths, total file count). A file
    survives iff [ship_min, ship_max] intersects [lo, hi)."""
    lo, hi = _iso_us(lo_iso), _iso_us(hi_iso)
    man = ensure_manifest(spark, sf_dir)
    keep = [m["file_path"] for m in man if m["ship_min_us"] < hi and m["ship_max_us"] >= lo]
    return keep, len(man)


def manifest_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipdate-range aggregate planned against the manifest: only
    overlapping files are passed to the reader, then the exact row-level
    predicate + aggregate runs over just those. Distinct payload from
    ``range_clustered_roundtrip`` (returnflag x linestatus, quantity sum)
    so the two queries cannot mask each other."""
    keep, _ = plan_files(spark, sf_dir, RANGE_LO, RANGE_HI)
    li = spark.read.parquet(*keep).where(
        (F.col("l_shipdate") >= ntz_lit(RANGE_LO))
        & (F.col("l_shipdate") < ntz_lit(RANGE_HI))
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


SQL_MANIFEST_PRUNED = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       {sql_dsum('l_quantity', 2)} AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{RANGE_LO}' AND l_shipdate < TIMESTAMP '{RANGE_HI}'
GROUP BY l_returnflag, l_linestatus
"""


def register(reg: Registry) -> None:
    reg.add(
        "manifest_pruned_scan",
        manifest_pruned_scan,
        SQL_MANIFEST_PRUNED,
        "Iceberg-style manifest planning: footer-stats file pruning before the scan",
    )

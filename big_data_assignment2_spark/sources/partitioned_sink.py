"""Hive-style partitioned parquet sink + pruned read-back.

At 100 TB the table LAYOUT is the first optimization: writing facts
partitioned by a low-cardinality, filter-frequent column (here
``event_type``; in production usually also a date) turns every
``WHERE event_type = X`` into a directory prune -- the scan never opens
the other partitions' files, which beats any row-group filter.

The registered query round-trips: write events partitioned by
``event_type`` into a scratch warehouse once per process, read it back
with a partition filter + aggregate. Its oracle is the same aggregate
over the ORIGINAL table, so the round-trip (write -> discover ->
prune -> read) is value-hash-verified. ``tests/test_plans.py`` asserts
the pruned scan shape (PartitionFilters, single partition read).

The write side demonstrates the scale-correct knobs:
- ``partitionBy``: directory layout == the pruning predicate.
- ``repartition(col)`` before the write: one shuffle so each output
  partition directory is written by as few tasks as possible (avoids the
  tiny-files problem -- N_tasks x N_partitions files otherwise).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._util import dsum, sql_dsum
from ..registry import Registry
from ..sources.catalog import load_table

_WRITTEN: dict[str, str] = {}


def write_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Write events partitioned by event_type; memoized per sf_dir."""
    if sf_dir not in _WRITTEN:
        from ..operators._util import scratch_root, scratch_slug

        out = f"{scratch_root()}/events_by_type_{scratch_slug(sf_dir)}"
        (
            load_table(spark, sf_dir, "events")
            # one writer task per partition value: no small-files explosion
            .repartition(F.col("event_type"))
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
        _WRITTEN[sf_dir] = out
    return _WRITTEN[sf_dir]


def read_events_pruned(spark: SparkSession, sf_dir: str, event_type: str = "purchase") -> DataFrame:
    """Read back with a partition filter: only the one directory is
    scanned (PartitionFilters in the plan, not PushedFilters)."""
    path = write_events_partitioned(spark, sf_dir)
    return spark.read.parquet(path).where(F.col("event_type") == event_type)


def partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: partitioned write, pruned read, per-user aggregate of
    the selected event type."""
    ev = read_events_pruned(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), 6).alias("sum_value"),
    )


SQL_PARTITIONED_ROUNDTRIP = f"""
SELECT user_id, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
"""


def register(reg: Registry) -> None:
    reg.add(
        "partitioned_sink_roundtrip",
        partitioned_sink_roundtrip,
        SQL_PARTITIONED_ROUNDTRIP,
        "hive-partitioned write + partition-pruned read-back",
    )

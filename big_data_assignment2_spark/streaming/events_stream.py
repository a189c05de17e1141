"""Structured Streaming variants of the event-window analytics.

The batch operators in ``operators/windows.py`` define the semantics; here
the same aggregation runs as a stream: parquet file source -> event-time
window aggregate -> memory sink, driven to completion with an
``availableNow`` trigger so it is deterministic and testable (and equals
the batch result -- which is exactly what the DuckDB oracle checks).

``streaming_tumbling``'s registered query runs a real streaming job under
the driver's correctness gate; the watermark demo shows the late-data
configuration a production (kafka-fed) deployment would use, where
``applyInPandasWithState`` is the escape hatch for custom state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._util import dsum
from ..operators.windows import SQL_TUMBLING, TUMBLE_S
from ..registry import Registry


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same nanos->micros handling as sources.catalog.load_events, on the
    # streaming read path.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file source insists on a directory; point it at sf_dir and
    # glob-filter to the events file.
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """The streaming aggregation; same shape as the batch operator."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", f"{TUMBLE_S} seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling-window aggregate as a real streaming query
    (availableNow trigger, complete mode, memory sink) and return the
    final result table."""
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_agg(_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    return spark.table(name)


def streaming_tumbling_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode variant with a 1-hour watermark: only windows the
    watermark has passed are emitted -- the late-data handling a live
    deployment needs. (Not oracle-checked: append mode intentionally
    withholds the trailing windows.)"""
    name = f"stream_wm_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_agg(_events_stream(spark, sf_dir), watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    return spark.table(name)


def register(reg: Registry) -> None:
    reg.add(
        "streaming_tumbling",
        streaming_tumbling,
        SQL_TUMBLING,
        "Structured Streaming tumbling windows (availableNow), equals batch",
    )

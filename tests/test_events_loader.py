"""The events loader must adapt to whatever physical timestamp type the
driver's ``events.parquet`` ships with: round 1's testdata stored
TIMESTAMP(NANOS), round 2's stores tz-naive ``timestamp[us]``, and the
round-2 loader's nanos assumption broke 15 queries when the data changed.
These tests write BOTH physical variants from the same logical rows and
require the loaded ``ts`` to come out identical (TimestampType, raw
micros preserved bit-for-bit vs pyarrow), batch and streaming, so the
assumption can never silently return.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


@pytest.fixture(scope="module")
def variant_dirs(sf_dir, tmp_path_factory):
    """{'micros': dir, 'nanos': dir} -- the same first 200 event rows of
    the real testdata written with timestamp[us] and timestamp[ns] ts."""
    src = pq.read_table(f"{sf_dir}/events.parquet").slice(0, 200)
    i = src.schema.get_field_index("ts")
    # truncate to whole milliseconds so the us/ms/ns variants hold the
    # same logical instants (a raw us value would not survive a ms cast)
    us = src.column("ts").cast(pa.int64())
    ms_floored = pa.compute.multiply(pa.compute.divide(us, 1000), 1000)
    src = src.set_column(i, "ts", ms_floored.cast(pa.timestamp("us")))
    dirs = {}
    for unit in ("us", "ms", "ns"):
        tbl = src.set_column(i, "ts", src.column("ts").cast(pa.timestamp(unit)))
        d = tmp_path_factory.mktemp(f"events_{unit}")
        pq.write_table(tbl, str(d / "events.parquet"))
        dirs[unit] = str(d)
    # the fourth physical variant in the wild: legacy INT96 (Impala/Hive
    # era; Spark's own default output until 3.x). Stored as julian-day +
    # nanos-of-day -- an instant, no timezone in the encoding.
    d = tmp_path_factory.mktemp("events_int96")
    pq.write_table(
        src.set_column(i, "ts", src.column("ts").cast(pa.timestamp("ns"))),
        str(d / "events.parquet"),
        use_deprecated_int96_timestamps=True,
    )
    dirs["int96"] = str(d)
    # tz-aware micros (isAdjustedToUTC=true): already an instant; must
    # come out as the same unix_micros as the naive-read-as-UTC variants
    d = tmp_path_factory.mktemp("events_tz")
    pq.write_table(
        src.set_column(i, "ts", src.column("ts").cast(pa.timestamp("us", tz="UTC"))),
        str(d / "events.parquet"),
    )
    dirs["tz"] = str(d)
    raw_us = src.column("ts").cast(pa.int64()).to_pylist()
    return dirs, raw_us


@pytest.mark.parametrize("unit", ["us", "ms", "ns", "int96", "tz"])
def test_load_events_type_adaptive(spark, variant_dirs, unit):
    from big_data_assignment2_spark.sources.catalog import load_events

    dirs, raw_us = variant_dirs
    df = load_events(spark, dirs[unit])
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r[0] for r in df.select(F.unix_micros("ts")).collect()]
    assert sorted(got) == sorted(raw_us)


@pytest.mark.parametrize("unit", ["us", "ms", "ns", "int96", "tz"])
def test_events_stream_type_adaptive(spark, variant_dirs, unit):
    import uuid

    from big_data_assignment2_spark.streaming.events_stream import _events_stream

    dirs, raw_us = variant_dirs
    stream = _events_stream(spark, dirs[unit])
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    name = f"ts_variant_{unit}_{uuid.uuid4().hex[:8]}"
    q = (
        stream.select(F.unix_micros("ts").alias("us"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(120)
    finally:
        q.stop()
    assert finished, "stream did not finish within 120s"
    got = [r[0] for r in spark.table(name).collect()]
    assert sorted(got) == sorted(raw_us)


def test_load_events_restores_confs(spark, variant_dirs):
    """The scoped confs must not leak: another table's tz-naive timestamp
    parquet still reads as TIMESTAMP_NTZ after load_events."""
    from big_data_assignment2_spark.sources.catalog import load_events

    dirs, _ = variant_dirs
    load_events(spark, dirs["us"])
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")
    assert (
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", None)
        in (None, "true")
    )


def test_window_tumbling_across_dst_boundary(spark, tmp_path):
    """Event-time windows must bucket by INSTANT, not session wall clock:
    events straddling the US spring-forward transition (2024-03-10,
    07:00Z) under an America/New_York session must land in the same
    5-minute epoch buckets the tz-naive DuckDB oracle computes. A
    wall-clock implementation would shift every post-transition bucket
    by an hour."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_assignment2_spark.operators.windows import (
        SQL_TUMBLING,
        window_tumbling,
    )
    from tests._compare import compare

    base = 1710054000_000000  # 2024-03-10 07:00:00Z in micros (EST -> EDT)
    rows = [(i, base + (i - 6) * 150_000_000, i, "click", float(i), "{}")
            for i in range(13)]  # every 2.5 min from -15 min to +15 min
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet'"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        diff = compare(window_tumbling(spark, str(tmp_path)), con, SQL_TUMBLING)
        assert diff is None, diff
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        con.close()

"""Cross-micro-batch state: split the events table into several files and
process them one file per trigger, so keyed dedup state must carry across
batches (the single-file availableNow path only ever sees one batch)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_split"))
    # scope the conf like _read_events_raw does: leaving it set leaks
    # into later test modules (test_events_loader asserts it is unset)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(out)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return out


def test_dedup_state_spans_batches(spark, sf_dir, split_events_dir):
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(split_events_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    name = f"dedup_batches_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.awaitTermination(120)
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2, "expected multiple micro-batches"
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {
        tuple(r)
        for r in spark.read.parquet(split_events_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want  # no dup emitted twice across batches, none lost


def test_sessionize_timeout_boundary(spark, tmp_path):
    """Exact-horizon sessions: Spark's event-time timeout fires on a
    STRICT watermark comparison at ms resolution, the oracle emits with an
    inclusive <= -- the operator aligns them by registering the timeout at
    horizon_ms - 1 and the oracle floors both sides to ms. Three
    single-event users probe the boundary: horizon == max ts exactly
    (emit), horizon 700us past max but same ms (emit -- ms-floor
    semantics), horizon in the next ms (hold open, no emit)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_assignment2_spark.streaming import events_stream as es

    gap_us = es.SESSION_GAP_S * 1_000_000
    base_us = 1_700_000_000_000_000  # ms-aligned
    max_us = base_us + gap_us  # the watermark-setting event (user 99)
    rows = {
        # user -> last event ts (us); horizon = ts + gap_us
        1: base_us,  # horizon == max_us exactly -> emit
        2: base_us + 700,  # horizon = max_us + 700us, same ms -> emit
        3: base_us + 1_700,  # horizon in the next ms -> stays open
        99: max_us,  # watermark setter; own horizon far out -> open
    }
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array(list(rows), pa.int64()),
            "value": pa.array([float(u) for u in rows], pa.float64()),
            # timestamp('ns') -> parquet TIMESTAMP(NANOS), the same
            # physical type as the driver's events.parquet
            "ts": pa.array([t * 1000 for t in rows.values()], pa.timestamp("ns")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = {
        tuple(r)
        for r in es.streaming_sessionize(spark, str(tmp_path))
        .select("session_start_us", "user_id", "n_events")
        .collect()
    }
    assert got == {(base_us, 1, 1), (base_us + 700, 2, 1)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, user_id, value,"
        f" CAST(ts AS TIMESTAMP) AS ts FROM read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = {
        (r[0], r[1], r[2])
        for r in con.execute(es.SQL_STREAM_SESSIONS).fetchall()
    }
    assert oracle == {(base_us, 1, 1), (base_us + 700, 2, 1)}


def test_running_totals_state_spans_batches(spark, sf_dir):
    """The complete-mode running aggregate must really accumulate across
    micro-batches: >= 2 non-empty input batches ran, every batch after
    the first re-emitted the (growing) full snapshot, and the final
    snapshot equals the batch aggregate for a spot-checked user."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_events
    from big_data_assignment2_spark.streaming import events_stream as es

    out = es.streaming_running_totals(spark, sf_dir)
    progress = [p for p in es._LAST_PROGRESS if p["numInputRows"] > 0]
    assert len(progress) >= 2, [p["batchId"] for p in es._LAST_PROGRESS]
    # complete mode: each trigger's state row count is monotone non-
    # decreasing (keys only ever accumulate)
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"] for p in progress if p["stateOperators"]
    ]
    assert state_rows == sorted(state_rows), state_rows
    ev = load_events(spark, sf_dir)
    uid = ev.agg(F.min("user_id")).collect()[0][0]
    want = (
        ev.where(F.col("user_id") == uid)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()[0]
    )
    got = out.where(F.col("user_id") == uid).collect()[0]
    assert (got["n_events"], got["last_us"]) == (want["n"], want["last_us"])


def test_dedup_within_watermark_bounds_state(spark, sf_dir):
    """dropDuplicatesWithinWatermark must show its whole contract on the
    staged redelivery run: (1) state is BOUNDED -- the nudge batch evicts
    expired keys; (2) the replayed batch splits exactly into
    state-suppressed duplicates plus late-dropped rows (an exact replay
    of an evicted key is necessarily late, so nothing is re-emitted);
    (3) the output is every distinct event exactly once."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_events
    from big_data_assignment2_spark.streaming import events_stream as es

    out = es.streaming_dedup_watermarked(spark, sf_dir)
    n_events = load_events(spark, sf_dir).count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events

    progress = es._LAST_PROGRESS
    assert len(progress) >= 3, [p["batchId"] for p in progress]
    nudge = progress[1]["stateOperators"][0]
    assert nudge["numRowsRemoved"] > 0, "no state eviction -- state unbounded"
    replay = progress[2]["stateOperators"][0]
    suppressed = replay["customMetrics"]["numDroppedDuplicateRows"]
    late = replay["numRowsDroppedByWatermark"]
    n_replay = (
        load_events(spark, sf_dir)
        .where(F.col("event_id") % es.REPLAY_MOD == es.REPLAY_REM)
        .count()
    )
    assert suppressed > 0 and late > 0
    assert suppressed + late == n_replay, (suppressed, late, n_replay)


def test_late_rows_are_dropped_by_watermark(spark, sf_dir):
    """The late-data demo must show GENUINE watermark drops: the run's
    numRowsDroppedByWatermark across batches equals the late-slice size
    (every late row's window end is <= the active watermark at this
    corpus's time spread), and at least 3 micro-batches ran (main,
    nudge, late)."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_events
    from big_data_assignment2_spark.streaming import events_stream as es

    out = es.streaming_late_data(spark, sf_dir)
    n_out = out.count()
    assert n_out > 0
    progress = es._LAST_PROGRESS
    assert len(progress) >= 3, [p["batchId"] for p in progress]
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in progress
        if p["stateOperators"]
    )
    ev = load_events(spark, sf_dir).select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    late = ev.where(F.col("event_id") % es.LATE_MOD == es.LATE_REM)
    wm_ms = (
        ev.where(~(F.col("event_id") % es.LATE_MOD == es.LATE_REM))
        .agg(F.max("us"))
        .collect()[0][0]
        // 1000
        - es.LATE_DELAY_S * 1000
    )
    # the drop rule pinned empirically: window end (ms) <= watermark (ms);
    # late rows inside the horizon stay in state (kept, never emitted)
    t = es.LATE_TUMBLE_S
    expect_dropped = late.where(
        ((F.col("us") / 1_000_000).cast("long") / t).cast("long") * t * 1000 + t * 1000
        <= wm_ms
    ).count()
    assert expect_dropped > 0
    assert dropped == expect_dropped, (dropped, expect_dropped)


def test_checkpoint_resume_reads_only_new_file(spark, sf_dir):
    """The restarted query must RESUME, not reprocess: run 2's input rows
    equal the late file's row count exactly (offset log recovery), and
    the sink holds exactly the distinct key set (state recovery -- run-1
    keys are not re-emitted, nothing is lost)."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_events
    from big_data_assignment2_spark.streaming import events_stream as es

    out = es.streaming_checkpoint_resume(spark, sf_dir)
    run1, run2 = es._RESUME_RUNS
    ev = load_events(spark, sf_dir)
    n_a = ev.where(F.col("event_id") % es.RESUME_SPLIT_MOD != 0).count()
    n_b = ev.where(F.col("event_id") % es.RESUME_SPLIT_MOD == 0).count()
    assert run1["input_rows"] == n_a, (run1, n_a)
    assert run2["input_rows"] == n_b, (run2, n_b)
    got = {tuple(r) for r in out.collect()}
    want = {
        tuple(r)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert got == want

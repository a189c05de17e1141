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

from ..operators._util import dsum, sql_dsum
from ..operators.windows import SQL_TUMBLING, TUMBLE_S
from ..registry import Registry


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same type-adaptive ts handling as sources.catalog.load_events, on
    # the streaming read path: resolve the physical schema with the same
    # scoped-conf batch read (nanos -> long, tz-naive micros -> plain
    # TIMESTAMP), hand it to the file source explicitly, and apply the
    # ONE shared decode rule (normalize_events_ts) on top.
    from ..sources.catalog import _read_events_raw, normalize_events_ts

    schema = _read_events_raw(spark, f"{sf_dir}/events.parquet").schema
    # The file source insists on a directory; point it at sf_dir and
    # glob-filter to the events file.
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(stream)


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
    return _run_to_table(
        spark, tumbling_agg(_events_stream(spark, sf_dir)), "stream_tumbling",
        output_mode="complete",
    )


def streaming_tumbling_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode variant with a 1-hour watermark: only windows the
    watermark has passed are emitted -- the late-data handling a live
    deployment needs. (Not oracle-checked: append mode intentionally
    withholds the trailing windows.)"""
    return _run_to_table(
        spark,
        tumbling_agg(_events_stream(spark, sf_dir), watermark="1 hour"),
        "stream_wm",
        state_partitions=None,
    )


SESSION_GAP_S = 1800  # keep in sync with operators.windows.SESSION_GAP_S


def _make_sessionize_fn(gap_us: int):
    """Build the applyInPandasWithState callable as a CLOSURE so
    cloudpickle ships it by value: a module-level function would be
    pickled by reference and force every executor Python worker to
    re-import this package, which breaks when the driver located the
    package via a runtime ``sys.path`` edit (workers inherit PYTHONPATH
    and cwd, not driver ``sys.path`` mutations)."""

    def _sessionize_fn(key, pdfs, state):
        # Custom stateful operator: per-user sessionization with a
        # 30-min inactivity gap. State = the open session
        # (start_us, last_us, n_events, sum_value). Closed sessions are
        # emitted as data arrives; the open tail session is emitted when
        # the event-time timeout fires (watermark passes last_us + gap).
        # All arithmetic is on int64 epoch-microseconds, so no
        # session-timezone conversion can touch the values.
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield _pd.DataFrame(
                {
                    "session_start_us": [start_us],
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [round(total, 6)],
                }
            )
            return
        rows = _pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0
        out = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            # round per-value BEFORE accumulating: the oracle's
            # decimal(18,6) sum quantizes each addend, so the python
            # twin must too
            v = round(float(value), 6)
            if start_us is None:
                start_us, last_us, n, total = ts_us, ts_us, 1, v
            elif ts_us - last_us >= gap_us:
                out.append((start_us, user_id, n, round(total, 6)))
                start_us, last_us, n, total = ts_us, ts_us, 1, v
            else:
                last_us, n, total = ts_us, n + 1, total + v
        state.update((start_us, last_us, n, total))
        # Fire once the watermark reaches the session's gap horizon. The
        # timeout API is ms and Spark fires only when watermark_ms is
        # STRICTLY greater than the timestamp, while the oracle emits open
        # sessions with horizon <= watermark (inclusive); setting
        # horizon_ms - 1 makes Spark fire iff wm_ms >= horizon_ms, exactly
        # the oracle's ms-floored inclusive comparison (watermark_ms is
        # floor(max_event_us / 1000)).
        state.setTimeoutTimestamp((last_us + gap_us) // 1000 - 1)
        if out:
            yield _pd.DataFrame(
                out, columns=["session_start_us", "user_id", "n_events", "sum_value"]
            )

    return _sessionize_fn


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming sessionization via applyInPandasWithState
    (the escape hatch for semantics F.session_window can't express --
    per-key custom state machines).

    Determinism contract: with a 0-second watermark delay and an
    availableNow trigger, the emitted set is exactly (a) sessions closed
    by a later event of the same user plus (b) open sessions whose
    ``last_ts + gap`` the final watermark (= max event ts) passed. That
    set is a pure function of the input, so even this operator gets a
    full DuckDB oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = _events_stream(spark, sf_dir).select(
        "event_id",
        "user_id",
        "value",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
    )
    sessions = (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_fn(SESSION_GAP_S * 1_000_000),
            outputStructType="session_start_us bigint, user_id bigint,"
            " n_events bigint, sum_value double",
            stateStructType="start_us bigint, last_us bigint,"
            " n bigint, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    # _run_to_table pins the state-store partition count (fixed at query
    # start from spark.sql.shuffle.partitions), restores the caller's
    # setting, and FAILS LOUDLY on a timeout -- a hand-rolled loop here
    # once dropped the finished check and could return a partial session
    # set. UNLIKE the JVM-state-store family (stream-stream join, dedup),
    # where per-partition store open/commit dominates and 4 partitions
    # measured best, applyInPandasWithState launches one PYTHON worker
    # pipeline per state partition -- the per-group pandas overhead
    # divides across partitions, so this op wants MORE of them. r13
    # interleaved A/B (3 reps/arm, identical rows): at local[32]
    # 4/16/32 partitions read 5.97/4.00/5.28s; at local[8] 4/8/16 read
    # 4.96/3.67/5.06s. Optimum tracks the core count but saturates, so
    # derive from defaultParallelism with a measured cap (a production
    # deployment sizes state partitions to keyspace x executors instead;
    # the output set is partition-count-independent either way).
    n_parts = max(4, min(spark.sparkContext.defaultParallelism, 16))
    return _run_to_table(
        spark, sessions, "stream_sessions", state_partitions=n_parts, timeout=240
    )


# Oracle: gaps-and-islands sessionization, emitting sessions that either
# have a successor session for the same user (closed in-stream) or whose
# gap horizon the final watermark (max event ts, 0s delay) passed.
SQL_STREAM_SESSIONS = f"""
WITH seq AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_S} * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  -- event_id tiebreak matches seq's window and the Python twin's
  -- sort_values(['ts_us','event_id']): with tied timestamps an
  -- untiebroken running sum could order the tie oppositely to seq and
  -- attach a flagged row to the prior session
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
),
sess AS (
  SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
         user_id,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         session_id,
         count(*) AS n_events,
         round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
  FROM islands GROUP BY user_id, session_id
),
wm AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS max_us FROM events)
SELECT session_start_us, user_id, n_events, sum_value
FROM sess CROSS JOIN wm
WHERE EXISTS (SELECT 1 FROM sess s2
              WHERE s2.user_id = sess.user_id AND s2.session_id > sess.session_id)
   -- ms-floored inclusive horizon check: Spark's timeout API is ms
   -- resolution (watermark_ms = max_us // 1000), so the oracle compares
   -- at the same resolution or exact-boundary sessions would diverge
   OR (sess.last_us + {SESSION_GAP_S} * 1000000) // 1000 <= wm.max_us // 1000
"""


def _run_to_table(
    spark: SparkSession,
    df: DataFrame,
    prefix: str,
    state_partitions: int | None = 4,
    output_mode: str = "append",
    timeout: int = 120,
) -> DataFrame:
    """Drive a streaming frame to completion (availableNow, memory sink)
    and return the result table.

    Stateful operators (dedup, stream-stream join) pay a fixed per-state-
    partition per-batch cost, and the partition count freezes at query
    start from spark.sql.shuffle.partitions -- pin it small for this
    bounded corpus and restore the caller's value (a production deployment
    sizes it to keyspace/executor count instead)."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        finished = q.awaitTermination(timeout)
    finally:
        q.stop()
    if not finished:
        # a stopped-mid-batch memory sink holds partial results -- fail
        # loudly instead of returning a plausible subset
        raise RuntimeError(f"streaming query {name} did not finish within {timeout}s")
    global _LAST_PROGRESS
    _LAST_PROGRESS = list(q.recentProgress)
    return spark.table(name)


# per-batch progress of the most recent _run_to_table query (tests assert
# on streaming metrics like numRowsDroppedByWatermark)
_LAST_PROGRESS: list = []


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first-seen (user_id, event_type) pairs via
    ``dropDuplicates`` keyed state. Only the key columns are emitted, so
    the output is the distinct key set regardless of which physical row
    arrived first -- that's what makes a streaming dedup oracle-able.
    A production deployment bounds the state with
    ``dropDuplicatesWithinWatermark``; this bounded corpus keeps exact
    all-time state."""
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type")
    return _run_to_table(spark, ev.dropDuplicates(["user_id", "event_type"]), "stream_dedup")


SQL_STREAM_DEDUP = "SELECT DISTINCT user_id, event_type FROM events"


def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched against the static
    customer dimension (broadcast per micro-batch -- no stream state), then
    aggregated by market segment. The standard fact-stream + dim pattern."""
    from ..sources.catalog import load_table

    ev = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    # append-mode streaming can't emit a running aggregate; finish the
    # count in batch over the joined (appended) rows -- the join is the
    # streaming operator under test.
    out = _run_to_table(spark, joined.select("c_mktsegment", "value"), "stream_sjoin")
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 6).alias("sum_value")
    )


SQL_STREAM_STATIC_JOIN = f"""
SELECT c_mktsegment, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


ATTRIB_WINDOW_S = 600  # purchase within 10 minutes of a click


def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    each click joined to same-user purchases within the next 10 minutes
    (click-to-purchase attribution). Watermarks on both sides let Spark
    evict join state once the interval can no longer match -- the only way
    a stream-stream join survives unbounded input."""
    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    pairs = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIB_WINDOW_S} SECONDS")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("click_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )
    return _run_to_table(spark, pairs, "stream_ssjoin")


SQL_STREAM_STREAM_JOIN = f"""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
       round(p.value, 6) AS purchase_value
FROM events c JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {ATTRIB_WINDOW_S} SECOND
"""


def streaming_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` sink: per-micro-batch aggregates written to a
    parquet table partitioned by ``batch_id``, then read back and reduced
    to per-type totals. foreachBatch is the production sink surface for
    destinations without a native streaming writer (JDBC, key-value
    stores, MERGE targets); the contract demonstrated here is
    IDEMPOTENT REPLAY -- the batch function dynamically overwrites its
    own batch_id partition, so Spark's at-least-once redelivery of a
    batch after a failure converges to exactly-once table contents.

    The totals are a pure function of the input (batch boundaries cancel
    out in the sum), so even this sink gets a full DuckDB oracle. The
    per-batch partial sums go through the same decimal(18,6) accumulation
    as everything else: decimal addition is associative, so
    sum-of-batch-sums equals the oracle's global sum exactly."""
    from ..operators._util import scratch_root

    out = f"{scratch_root()}/stream_fb_{uuid.uuid4().hex[:8]}"

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum(F.col("value"), 6).alias("sum_value"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    ev = _events_stream(spark, sf_dir).select("event_type", "value")
    q = (
        ev.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", f"{out}_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(120)
    finally:
        q.stop()
    if not finished:
        # fail loudly: stopping mid-batch can leave a torn batch_id
        # partition, and reading it would return plausible wrong totals
        raise RuntimeError("streaming_foreach_batch did not finish within 120s")
    # Reduce the per-batch partials to per-type totals and land them in a
    # FIXED per-corpus dir (overwritten on every call -- never a cross-run
    # cache: the totals are recomputed from this call's own micro-batches
    # above) so the uuid sink dir and its dead checkpoint can be deleted
    # before returning. This keeps the zero-debris convention of this file
    # (bounded: one tiny totals dir per sf_dir) WITHOUT a driver-side
    # collect() in a query path (guide section 5: the driver should do
    # almost no data work; r12 measured the collect+createDataFrame shape
    # ~0.5s slower in the driver bench than a sink-side landing).
    from ..operators._util import scratch_slug

    totals = f"{scratch_root()}/stream_fb_totals_{scratch_slug(sf_dir)}"
    (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            dsum(F.col("sum_value"), 6).alias("sum_value"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(totals)
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(f"{out}_ckpt", ignore_errors=True)
    return spark.read.parquet(totals)


SQL_FOREACH_BATCH = f"""
SELECT event_type, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM events GROUP BY 1
"""


LATE_MOD, LATE_REM = 101, 13  # the deterministic "arrives late" slice
NUDGE_MOD, NUDGE_REM = 997, 5  # tiny batch that lets the watermark take effect
LATE_DELAY_S = 7200  # watermark delay
LATE_TUMBLE_S = TUMBLE_S


def streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP semantics, oracle-verified.

    Events are staged as three single-file micro-batches (file source,
    ``maxFilesPerTrigger=1``, mtime-ordered): (0) everything except a
    deterministic ~1% "late" slice, (1) a tiny nudge batch, (2) the late
    slice. Spark's watermark advances one batch behind the data
    (batch N runs under the watermark computed from batches < N), which
    is exactly why the nudge batch exists: it gives the watermark a batch
    to take effect before the stragglers arrive, the way fresh traffic
    keeps advancing the watermark past stragglers in a live pipeline.

    Semantics pinned empirically (and encoded in the oracle): a late row
    is DROPPED iff its window end (ms) <= the active watermark
    (max event-time seen in prior batches, ms-floored, minus the delay);
    append mode emits exactly the windows the final watermark passed.
    With windows <= the delay horizon never emitted, the observable
    output is: non-late rows, finalized windows only -- and the run's
    ``numRowsDroppedByWatermark`` metric must equal the late-slice size,
    which ``tests/test_streaming_batches.py`` asserts.

    At 100 TB the same mechanics bound state: windows older than the
    delay horizon are emitted + evicted, stragglers past the horizon are
    dropped by the same rule, and state holds only the horizon's worth of
    windows regardless of stream age."""
    import glob
    import os
    import shutil

    from ..operators._util import scratch_root

    ev = _events_stream(spark, sf_dir)
    late_c = F.col("event_id") % LATE_MOD == LATE_REM
    nudge_c = (F.col("event_id") % NUDGE_MOD == NUDGE_REM) & ~late_c
    # Per-run scratch, removed in the finally below: the staged batches
    # are fully consumed by the availableNow run and the result lives in
    # the memory sink, so nothing on disk outlives the query (repeated
    # sweeps/bench runs leave zero debris).
    root = f"{scratch_root()}/stream_late_{uuid.uuid4().hex[:8]}"
    # Stage the three batches; the file source orders by (mtime, path),
    # both set explicitly. Driver-side staging stands in for the
    # kafka/file-drop arrival order of a live deployment.
    batches = (
        ("a_main", ~late_c & ~nudge_c),
        ("b_nudge", nudge_c),
        ("c_late", late_c),
    )
    drop = f"{root}/drop"
    os.makedirs(drop)
    from ..sources.catalog import _read_events_raw

    try:
        raw = _read_events_raw(spark, f"{sf_dir}/events.parquet")
        # The oracle cuts the watermark at max(NON-late ts): Spark's
        # post-data no-data batch, however, runs under a watermark from
        # ALL arrived rows -- late ones included, since they pass through
        # EventTimeWatermark before being dropped. The two agree only
        # while the globally-newest event is NOT late-sliced; assert that
        # here (the driver regenerates the corpus every round) so a
        # violating dataset fails loudly instead of hash-mismatching.
        # ts may be raw nanos (LongType) -- comparison is monotone either
        # way.
        mx = raw.agg(
            F.max(F.when(late_c, F.col("ts"))).alias("late_max"),
            F.max(F.when(~late_c, F.col("ts"))).alias("rest_max"),
        ).collect()[0]
        if mx["late_max"] is not None and (
            mx["rest_max"] is None or mx["late_max"] > mx["rest_max"]
        ):
            raise AssertionError(
                "streaming_late_data: the globally-newest event falls in "
                "the late slice; the final watermark would outrun the "
                "oracle's non-late cut -- adjust LATE_MOD/LATE_REM for "
                "this dataset"
            )
        for i, (nm, cond) in enumerate(batches):
            raw.where(cond).coalesce(1).write.mode("overwrite").parquet(
                f"{root}/in_{nm}"
            )
            src = glob.glob(f"{root}/in_{nm}/*.parquet")[0]
            dst = f"{drop}/{nm}.parquet"
            shutil.copy(src, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))

        schema = raw.schema
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(drop)
        )
        from ..sources.catalog import normalize_events_ts

        stream = normalize_events_ts(stream)
        agg = tumbling_agg(
            stream.withWatermark("ts", f"{LATE_DELAY_S} seconds")
        )
        return _run_to_table(spark, agg, "stream_late", output_mode="append")
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_STREAM_LATE = f"""
WITH wm AS (
  -- watermark once all on-time batches are in: ms-floored max event time
  -- minus the delay. Late rows DO pass through EventTimeWatermark before
  -- being dropped, so the final no-data batch's watermark comes from ALL
  -- rows; the non-late cut here matches it only because the staging code
  -- asserts the globally-newest event is not late-sliced.
  SELECT max(CAST(epoch_us(ts) AS BIGINT)) // 1000 - {LATE_DELAY_S} * 1000 AS ms
  FROM events WHERE NOT (event_id % {LATE_MOD} = {LATE_REM})
),
contrib AS (
  -- late rows are dropped: every late row's window end <= wm (and the
  -- handful inside the horizon land in windows append mode never emits)
  SELECT CAST(epoch_us(ts) AS BIGINT) // 1000000 // {LATE_TUMBLE_S} * {LATE_TUMBLE_S}
           AS window_start_epoch,
         event_type, value
  FROM events WHERE NOT (event_id % {LATE_MOD} = {LATE_REM})
)
SELECT window_start_epoch, event_type,
       count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM contrib, wm
WHERE (window_start_epoch + {LATE_TUMBLE_S}) * 1000 <= wm.ms
GROUP BY window_start_epoch, event_type
"""


DEDUP_WM_DELAY_S = 604_800  # 7-day dedup horizon (span is 30 days)
REPLAY_MOD, REPLAY_REM = 89, 7  # ~1% replayed slice (at-least-once redelivery)
DD_NUDGE_MOD, DD_NUDGE_REM = 997, 11  # tiny batch that activates the watermark


def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup: ``dropDuplicatesWithinWatermark``,
    the API that makes streaming dedup viable on an unbounded stream --
    plain ``dropDuplicates`` (the ``streaming_dedup`` demo) keeps every
    key forever, which no 100 TB deployment survives; here a key's state
    lives only ``DEDUP_WM_DELAY_S`` of event time and is then evicted,
    so state is bounded by the horizon's key arrival rate, not stream
    age.

    The demo stages the at-least-once redelivery scenario this API
    exists for: (A) the corpus minus a nudge slice, (B) the nudge slice
    (fresh keys that advance the watermark one batch before the
    stragglers -- same trick as ``streaming_late_data``), then (C) an
    exact REPLAY of a ~1% slice of A keyed by event_id. Semantics pinned
    empirically from the state metrics: a replayed row is either
    SUPPRESSED by live key state (``numDroppedDuplicateRows``) or,
    if its key was already evicted, necessarily DROPPED AS LATE
    (``numRowsDroppedByWatermark``) -- eviction happens at
    expiry = event ms + delay ms <= watermark, which implies the event
    time is older than the watermark itself, so an EXACT replay of an
    evicted key can never be re-emitted. That is precisely the API's
    guarantee: exactly-once output under at-least-once redelivery with
    BOUNDED state (duplication only becomes possible when the redelivery
    carries a fresh event time beyond the horizon). The oracle is
    therefore every distinct event exactly once; the mechanism evidence
    lives in tests/test_streaming_batches.py, which asserts >0 states
    evicted at the nudge batch and that the replay batch splits into
    >0 state-suppressed plus >0 late-dropped rows, with the three
    counts summing to the replay size."""
    import glob
    import os
    import shutil

    from ..operators._util import scratch_root

    replay_c = F.col("event_id") % REPLAY_MOD == REPLAY_REM
    nudge_c = (F.col("event_id") % DD_NUDGE_MOD == DD_NUDGE_REM) & ~replay_c
    root = f"{scratch_root()}/stream_ddwm_{uuid.uuid4().hex[:8]}"
    drop = f"{root}/drop"
    os.makedirs(drop)
    from ..sources.catalog import _read_events_raw

    try:
        raw = _read_events_raw(spark, f"{sf_dir}/events.parquet")
        batches = (
            ("a_main", ~nudge_c),
            ("b_nudge", nudge_c),
            ("c_replay", replay_c),
        )
        for i, (nm, cond) in enumerate(batches):
            raw.where(cond).coalesce(1).write.mode("overwrite").parquet(
                f"{root}/in_{nm}"
            )
            src = glob.glob(f"{root}/in_{nm}/*.parquet")[0]
            dst = f"{drop}/{nm}.parquet"
            shutil.copy(src, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))

        schema = raw.schema
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(drop)
        )
        from ..sources.catalog import normalize_events_ts

        deduped = (
            normalize_events_ts(stream)
            .withWatermark("ts", f"{DEDUP_WM_DELAY_S} seconds")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select(
                "event_id",
                "user_id",
                "event_type",
                F.unix_micros("ts").alias("us"),
                F.round("value", 6).alias("value"),
            )
        )
        return _run_to_table(spark, deduped, "stream_ddwm")
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_STREAM_DEDUP_WM = """
SELECT event_id, user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS us, round(value, 6) AS value
FROM events
"""


RUNNING_FILES = 3  # stage the projection as 3 files -> 3 genuine micro-batches


def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed RUNNING aggregate in COMPLETE output mode: all-time per-user
    totals accumulated across ``RUNNING_FILES`` genuine micro-batches.

    The streaming shape the other demos don't pin down:
    ``streaming_tumbling`` is complete-mode but WINDOWED (state keyed by
    event-time bucket); ``streaming_dedup`` is keyed state but
    append-mode (each key emitted at most once). Here an UNWINDOWED
    ``groupBy(user_id)`` must MERGE partial aggregates into per-key state
    batch over batch -- the running materialized-aggregate shape (a
    revenue-by-account leaderboard) -- and complete mode re-emits the
    whole state snapshot every trigger, so the memory sink's final table
    is the last snapshot, which for an ``availableNow`` run over a
    bounded drop zone equals the batch aggregate: exactly what the DuckDB
    oracle checks. ``tests/test_streaming_batches.py`` asserts the run
    really consumed >= 2 non-empty input batches (so count/sum/max state
    demonstrably merged across triggers).

    The drop zone holds the epoch-normalized projection ``(user_id,
    value, us)`` staged as ``RUNNING_FILES`` parquet files read back with
    ``maxFilesPerTrigger=1`` -- the multi-batch keyed-state mechanics
    under test stay isolated from the ts-decode adaptivity that
    ``_events_stream`` already exercises. Scale shape: state is bounded
    by |users| spread over the state-store partitions, not by event
    volume; the sum rides the exact DECIMAL accumulation (associative, so
    batch boundaries cancel); ``last_us`` is pure epoch arithmetic
    (tz-proof). A live deployment would run this in update mode into a
    key-updatable sink instead of re-emitting the full snapshot."""
    from ..operators._util import scratch_root
    from ..sources.catalog import load_events

    stage = f"{scratch_root()}/run_totals_{uuid.uuid4().hex[:8]}"
    (
        load_events(spark, sf_dir)
        .select("user_id", "value", F.unix_micros("ts").alias("us"))
        .repartition(RUNNING_FILES)
        .write.parquet(stage)
    )
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(stage)
    )
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), 6).alias("sum_value"),
        F.max("us").alias("last_us"),
    )
    try:
        # the result lives entirely in the memory sink once the run
        # completes; the staged projection is per-call debris
        return _run_to_table(spark, totals, "stream_run_totals", output_mode="complete")
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)


SQL_STREAM_RUNNING = f"""
SELECT user_id, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
FROM events GROUP BY user_id
"""


def register(reg: Registry) -> None:
    reg.add(
        "streaming_tumbling",
        streaming_tumbling,
        SQL_TUMBLING,
        "Structured Streaming tumbling windows (availableNow), equals batch",
    )
    reg.add(
        "streaming_foreach_batch",
        streaming_foreach_batch,
        SQL_FOREACH_BATCH,
        "foreachBatch idempotent parquet sink (batch_id partition overwrite)",
    )
    reg.add(
        "streaming_sessionize",
        streaming_sessionize,
        SQL_STREAM_SESSIONS,
        "custom stateful sessionization (applyInPandasWithState)",
    )
    reg.add(
        "streaming_dedup",
        streaming_dedup,
        SQL_STREAM_DEDUP,
        "streaming dropDuplicates keyed state",
    )
    reg.add(
        "streaming_static_join",
        streaming_static_join,
        SQL_STREAM_STATIC_JOIN,
        "stream-static broadcast join + agg",
    )
    reg.add(
        "streaming_stream_join",
        streaming_stream_join,
        SQL_STREAM_STREAM_JOIN,
        "stream-stream interval join with watermark state eviction",
    )
    reg.add(
        "streaming_checkpoint_resume",
        streaming_checkpoint_resume,
        SQL_STREAM_DEDUP,
        "checkpointed restart: offset resume + recovered state, exactly-once sink",
    )
    reg.add(
        "streaming_late_data",
        streaming_late_data,
        SQL_STREAM_LATE,
        "watermark late-row drop + append-mode finalization, 3 micro-batches",
    )
    reg.add(
        "streaming_running_totals",
        streaming_running_totals,
        SQL_STREAM_RUNNING,
        "complete-mode unwindowed keyed running aggregate, 3 micro-batches",
    )
    reg.add(
        "streaming_dedup_watermarked",
        streaming_dedup_watermarked,
        SQL_STREAM_DEDUP_WM,
        "bounded-state dedup (dropDuplicatesWithinWatermark) vs replayed slice",
    )


RESUME_SPLIT_MOD = 3  # first run sees ids % 3 != 0; restart ingests the rest


def streaming_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed RESTART with exactly-once output: the same streaming
    query (keyed dedup -> parquet sink) is started, run to completion on
    the initially-present file, STOPPED, and started again after a second
    file lands -- sharing one checkpointLocation.

    What the checkpoint buys (and the oracle verifies): the restarted
    query resumes from the committed offset log (run 2 reads ONLY the new
    file -- asserted from its progress metrics in
    tests/test_streaming_batches.py), the dedup state store is recovered
    from the checkpoint (keys seen in run 1 are not re-emitted in run 2),
    and the parquet sink ends up with exactly the distinct key set of the
    FULL input -- the exactly-once resumption contract a production
    deployment relies on after every crash or deploy. The memory-sink
    demos cannot show this: a memory sink dies with its query; resuming
    requires a durable sink plus the checkpoint's offset + state logs."""
    import glob
    import os
    import shutil

    from ..operators._util import scratch_root, scratch_slug

    from ..sources.catalog import _read_events_raw

    # FIXED per-corpus root, fully torn down and redone on every call:
    # r12's per-process memo made bench warm reps read the committed sink
    # in ~0.1s -- a number that measured a parquet scan, not a resume.
    # Every call now performs the complete two-run demo from scratch
    # (never a cross-run cache), and debris stays bounded to one sink dir
    # per sf_dir (the returned frame lazily reads `sink`, so the root must
    # outlive this call; staging + checkpoint dirs are pruned below).
    root = f"{scratch_root()}/stream_resume_{scratch_slug(sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    drop, sink, ckpt = f"{root}/drop", f"{root}/sink", f"{root}/ckpt"
    os.makedirs(drop)
    raw = _read_events_raw(spark, f"{sf_dir}/events.parquet")
    part_a = raw.where(F.col("event_id") % RESUME_SPLIT_MOD != 0)
    part_b = raw.where(F.col("event_id") % RESUME_SPLIT_MOD == 0)

    def _stage(df: DataFrame, name: str, mtime: int) -> None:
        df.coalesce(1).write.mode("overwrite").parquet(f"{root}/in_{name}")
        src = glob.glob(f"{root}/in_{name}/*.parquet")[0]
        dst = f"{drop}/{name}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    def _run_once() -> dict:
        stream = (
            spark.readStream.format("parquet")
            .schema(raw.schema)
            .load(drop)
            .select("user_id", "event_type")
            .dropDuplicates(["user_id", "event_type"])
        )
        # Pin the dedup state-store partition count like _run_to_table
        # does: it freezes at query start from spark.sql.shuffle.partitions
        # (and the restarted run recovers the same count from the
        # checkpoint). Unpinned, the r12 driver bench paid 32 state
        # partitions x 2 runs of per-partition store commit + snapshot
        # work on a bounded corpus -- the one strongly scaling-NEGATIVE
        # row (10.3s at 32 cores vs 2.9s at 8). A production deployment
        # sizes this to keyspace/executor count via conf instead.
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        try:
            finished = q.awaitTermination(120)
        finally:
            q.stop()
        if not finished:
            raise RuntimeError("resume demo query did not finish within 120s")
        rows = sum(p["numInputRows"] for p in q.recentProgress)
        return {"input_rows": rows}

    try:
        _stage(part_a, "a_first", 1_000_000)
        run1 = _run_once()
        _stage(part_b, "b_later", 1_000_001)
        run2 = _run_once()
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    global _RESUME_RUNS
    _RESUME_RUNS = (run1, run2)
    # both runs committed: only the sink is still referenced
    for sub in os.listdir(root):
        if sub != "sink":
            shutil.rmtree(f"{root}/{sub}", ignore_errors=True)
    return spark.read.parquet(sink)


# (run1, run2) input-row metrics of the latest resume demo, for tests
_RESUME_RUNS: tuple = ()

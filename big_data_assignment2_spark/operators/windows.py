"""Windowed analytics over the ``events`` stream table (batch semantics;
``streaming/events_stream.py`` runs the same aggregations under
Structured Streaming).

The reference has no streaming/window surface (SURVEY.md section 2.9);
these are the extension operators a training-data/event pipeline needs.
Window starts are emitted as epoch seconds (bigint) so results are
timezone-proof against any session (the parquet timestamps are NTZ).

Scale: tumbling/sliding windows are a single hash aggregate keyed on
(window, type) -- Spark's two-phase agg handles arbitrary volume;
session windows shuffle once on user_id. Late data is a watermark concern
and only exists in the streaming variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import dsum, sql_dsum

TUMBLE_S = 300  # 5 minutes
SLIDE_LEN_S = 600  # 10-minute sliding windows ...
SLIDE_STEP_S = 300  # ... every 5 minutes
SESSION_GAP_S = 1800  # 30-minute session gap


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window counts/sums per event type (F.window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{TUMBLE_S} seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_TUMBLING = f"""
SELECT CAST(floor(epoch(ts) / {TUMBLE_S}) * {TUMBLE_S} AS BIGINT) AS window_start_epoch,
       event_type, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM events
GROUP BY 1, 2
"""


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event lands in two
    overlapping windows (F.window with slideDuration)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{SLIDE_LEN_S} seconds", f"{SLIDE_STEP_S} seconds"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# Each event belongs to the windows starting at floor(t/step)*step - k*step
# for k in 0..len/step-1 (here: k in {0,1}).
SQL_SLIDING = f"""
SELECT CAST(floor(epoch(ts) / {SLIDE_STEP_S}) * {SLIDE_STEP_S} - off.k * {SLIDE_STEP_S} AS BIGINT)
         AS window_start_epoch,
       event_type, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM events
CROSS JOIN (SELECT unnest([0, 1]) AS k) off
GROUP BY 1, 2
"""


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window``); session start emitted in epoch microseconds."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{SESSION_GAP_S} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# Gaps-and-islands twin: a new session starts when the gap from the
# previous event is >= the gap duration (Spark's session window is
# [start, last_event + gap), end-exclusive).
SQL_SESSION = f"""
WITH seq AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_S} * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
)
SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
       user_id, count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM islands
GROUP BY user_id, session_id
"""


def events_json_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the ``props`` payload + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_JSON_SUM = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's **VARIANT** type: the
    open-ended-JSON answer every event pipeline needs once payloads stop
    fitting a fixed schema.

    A nested document (object + array, built deterministically from the
    event columns so the oracle can recompute it) is parsed ONCE with
    ``parse_json`` into VARIANT's binary encoding, then typed paths come
    out via ``variant_get`` -- string, long, and an array index -- and
    aggregate. Vs ``get_json_object`` (``events_json_sum``): the text
    payload is parsed once per row instead of once per extracted path,
    paths are typed at extraction (no string re-cast), and the binary
    encoding is the shredding-ready representation Parquet VARIANT
    columns store at rest -- at 100 TB, re-parsing JSON text per path is
    a CPU bottleneck this type exists to remove. Integer "cents"
    (``floor(value*100)``) keep the constructed JSON free of double
    formatting, which Spark and DuckDB render differently.

    Oracle: DuckDB recomputes the same aggregates from the raw columns
    -- an independent path that never builds the document at all."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    k = F.get_json_object("props", "$.k").cast("long")
    doc = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","k":'),
        k.cast("string"),
        F.lit('},"vals":['),
        cents.cast("string"),
        F.lit(","),
        (cents * 2).cast("string"),
        F.lit("]}"),
    )
    return (
        ev.select(F.parse_json(doc).alias("v"))
        .groupBy(F.variant_get("v", "$.meta.type", "string").alias("event_type"))
        .agg(
            F.sum(F.variant_get("v", "$.meta.k", "long")).alias("sum_k"),
            F.sum(F.variant_get("v", "$.vals[1]", "long")).alias("sum_v2"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_VARIANT_EXTRACT = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(2 * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_v2,
       count(*) AS n
FROM events GROUP BY event_type
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average of ``value`` over the last 3 events (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW). The frame sum goes through an
    exact decimal so sliding-frame evaluation order (incremental in Spark,
    segment-tree in DuckDB) cannot change the double. Ordering carries an
    event_id tiebreaker so equal timestamps don't make the frame ambiguous."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    mov = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.round(mov, 6).alias("mov_avg3"),
    )


SQL_MOVING_AVG = """
SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
FROM events
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user delta vs the previous event's value (lag); first event of
    each user has a null delta. One shuffle on user_id + per-partition
    sort -- the standard change-detection shape."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value", 1).over(w)
    return ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.round(delta, 6).alias("delta"),
    )


SQL_LAG_DELTA = """
SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
       round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
FROM events
"""


ROLLUP_DAY_S = 86400
ROLLUP_HOUR_S = 3600

HIST_LO = 0.0
HIST_STEP = 10.0
HIST_BINS = 10  # values land in [0, 100) + an overflow bin


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (the hypertable / continuous-aggregate
    pattern): hour totals, day totals, and the grand total in ONE pass
    via ``rollup(day, hour)`` -- a single Expand + two-phase aggregate
    instead of one scan per granularity. ``grouping_id`` distinguishes
    the levels; bucket starts are integer epoch math, so the hierarchy
    is timezone-proof (a calendar ``date_trunc`` would shift with the
    session zone).

    At 100 TB this is THE way to maintain multi-granularity dashboards:
    the expand emits level-tagged rows into the same partial aggregate,
    so the fact is read and shuffled once for all levels."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    day = (F.floor(epoch_s / ROLLUP_DAY_S) * ROLLUP_DAY_S).cast("long")
    hour = (F.floor(epoch_s / ROLLUP_HOUR_S) * ROLLUP_HOUR_S).cast("long")
    return (
        ev.select(day.alias("day_epoch"), hour.alias("hour_epoch"), "value")
        .rollup("day_epoch", "hour_epoch")
        .agg(
            F.grouping_id().alias("level"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 6).alias("sum_value"),
        )
    )


SQL_TIME_ROLLUP = f"""
SELECT day_epoch, hour_epoch,
       CAST(grouping_id(day_epoch, hour_epoch) AS BIGINT) AS level,
       count(*) AS n_events, {sql_dsum('value', 6)} AS sum_value
FROM (
  SELECT CAST(floor(epoch(ts) / {ROLLUP_DAY_S}) * {ROLLUP_DAY_S} AS BIGINT) AS day_epoch,
         CAST(floor(epoch(ts) / {ROLLUP_HOUR_S}) * {ROLLUP_HOUR_S} AS BIGINT) AS hour_epoch,
         value
  FROM events
)
GROUP BY ROLLUP (day_epoch, hour_epoch)
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type: bin assignment
    is pure row-local arithmetic (no width_bucket dependency -- the
    floor form is engine-portable), then one two-phase count aggregate.
    Out-of-range values clamp into the top bin so the bin count is
    bounded regardless of data. The whole histogram of a 100 TB table
    costs one shuffle of (type x {HIST_BINS + 1}) partial counts."""
    ev = load_table(spark, sf_dir, "events")
    raw_bin = F.floor((F.col("value") - HIST_LO) / HIST_STEP)
    bin_id = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(HIST_BINS)).cast("long")
    return (
        ev.select("event_type", bin_id.alias("bin_id"))
        .groupBy("event_type", "bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_VALUE_HISTOGRAM = f"""
SELECT event_type,
       CAST(least(greatest(floor((value - {HIST_LO}) / {HIST_STEP}), 0), {HIST_BINS}) AS BIGINT) AS bin_id,
       count(*) AS n
FROM events
GROUP BY 1, 2
"""


def window_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic window functions in one per-user pass:
    row_number, ntile, percent_rank, first_value, and a running max --
    all share ONE window spec, so Spark plans a single shuffle on
    user_id + one in-partition sort for all five (check: one Exchange,
    one Window operator). Partitioned by user, never a global ORDER BY
    -- the same single-task-bottleneck rule as ``doc_pack_greedy``."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(order).alias("rn"),
        F.ntile(4).over(order).alias("quartile"),
        F.round(F.percent_rank().over(order), 6).alias("pct_rank"),
        F.round(F.first("value").over(order), 6).alias("first_value"),
        F.round(F.max("value").over(running), 6).alias("running_max"),
    )


SQL_WINDOW_FUNCS = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(first_value(value) OVER w, 6) AS first_value,
       round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


FUNNEL_STAGES = ("click", "view", "purchase")  # must occur in this order
FUNNEL_WINDOW_US = 3600 * 1_000_000  # each next stage within 1h of the last


def funnel_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered, windowed funnel: how many users clicked, then viewed
    within an hour of the first click, then purchased within an hour of
    that view. Ordering + attribution window are what make a funnel a
    funnel (a purchase before any click, or a view three weeks later,
    doesn't count) -- and what plain conditional aggregation can't
    express in one pass: each stage's earliest qualifying time depends
    on the previous stage's. Three per-user aggregates chained by
    user_id joins -- every step partitions on user_id, so the chain
    re-uses one hash partitioning end-to-end; no step shuffles the fact
    twice. Emits depth (0..3) x user count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    users = ev.select("user_id").distinct()
    c = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_us"))
    )
    v = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(c, "user_id")
        .where(
            (F.col("ts_us") >= F.col("c_us"))
            & (F.col("ts_us") < F.col("c_us") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_us"))
    )
    p = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(v, "user_id")
        .where(
            (F.col("ts_us") >= F.col("v_us"))
            & (F.col("ts_us") < F.col("v_us") + FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    depth = (
        users.join(c.select("user_id", F.lit(1).alias("d1")), "user_id", "left")
        .join(v.select("user_id", F.lit(1).alias("d2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("d3")), "user_id", "left")
        .select(
            (
                F.coalesce(F.col("d1"), F.lit(0))
                + F.coalesce(F.col("d2"), F.lit(0))
                + F.coalesce(F.col("d3"), F.lit(0))
            ).alias("depth")
        )
    )
    return depth.groupBy("depth").agg(F.count(F.lit(1)).alias("n_users"))


SQL_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events
), c AS (
  SELECT user_id, min(ts_us) AS c_us FROM ev
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
), v AS (
  SELECT ev.user_id, min(ts_us) AS v_us FROM ev JOIN c USING (user_id)
  WHERE event_type = '{FUNNEL_STAGES[1]}'
    AND ts_us >= c_us AND ts_us < c_us + {FUNNEL_WINDOW_US} GROUP BY 1
), p AS (
  SELECT ev.user_id, min(ts_us) AS p_us FROM ev JOIN v USING (user_id)
  WHERE event_type = '{FUNNEL_STAGES[2]}'
    AND ts_us >= v_us AND ts_us < v_us + {FUNNEL_WINDOW_US} GROUP BY 1
), depths AS (
  SELECT (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        + CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
        + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS depth
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN c USING (user_id) LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
)
SELECT depth, count(*) AS n_users FROM depths GROUP BY 1
"""

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    counted per (cohort day, day offset). The canonical engagement
    report. Two aggregates and one join, all partitioned on user_id /
    then the tiny (cohort, offset) key; distinct (user, day) first so a
    chatty user counts once per day. Day buckets are integer epoch math
    (timezone-proof, like events_time_rollup)."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / ROLLUP_DAY_S)).cast("long")
    user_days = ev.select("user_id", day.alias("day")).distinct()
    first = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_COHORT = f"""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / {ROLLUP_DAY_S}) AS BIGINT) AS day FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY 1
)
SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
FROM user_days JOIN first USING (user_id)
GROUP BY 1, 2
"""


TRAIL_RANGE_US = 3_600_000_000  # trailing 1-hour frame, in epoch microseconds


def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing ONE-HOUR aggregate via a value-based **RANGE
    frame** (``RANGE BETWEEN 3600s PRECEDING AND CURRENT ROW`` over epoch
    micros) -- the frame kind ROWS cannot imitate: with irregular event
    spacing, "last 3 rows" and "last hour" are different questions, and
    the hour is usually the one being asked (rate limiting, trailing
    exposure, rolling SLO counts).

    RANGE frames need no tiebreaker: the frame is defined by the ORDER-key
    VALUE, so equal-timestamp events share one frame and every engine
    agrees row-for-row (ROWS frames here carry an event_id tiebreaker for
    exactly that reason). The frame sum goes through an exact decimal --
    Spark evaluates sliding sums incrementally, DuckDB with a segment
    tree, and only order-independent accumulation makes those agree
    bitwise. One shuffle on user_id + per-partition sort; frame
    evaluation is O(n) per key regardless of frame width, so widening the
    trailing window costs nothing at 100 TB."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-TRAIL_RANGE_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("sum_1h"),
    )


SQL_TRAILING_RANGE = f"""
SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       count(*) OVER w AS n_1h,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
             RANGE BETWEEN {TRAIL_RANGE_US} PRECEDING AND CURRENT ROW)
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table of the per-user event-type
    sequence: for every ordered pair of consecutive events of one user,
    count (from_type -> to_type) transitions, how many distinct users
    made each, and the conditional transition probability
    P(to | from) = n / sum(n) over from_type.

    The sequence-mining primitive (clickstream path analysis, funnel
    leakage, next-action models): one shuffle on user_id + per-partition
    sort for the lag, then a 25-row aggregate -- event volume only flows
    through the first window, so the shape scales exactly like the other
    per-user windows. Ties in ts break on event_id (same convention as
    every sequence op here). The probability divides two exact integer
    counts in double -- bit-identical across engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).where(F.col("from_type").isNotNull())
    tr = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.count_distinct("user_id").alias("n_users"),
    )
    wt = Window.partitionBy("from_type")
    return tr.withColumn(
        "p",
        F.round(
            F.col("n_transitions") * F.lit(1.0) / F.sum("n_transitions").over(wt), 6
        ),
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
  FROM events
), tr AS (
  SELECT from_type, to_type, count(*) AS n_transitions,
         count(DISTINCT user_id) AS n_users
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions, n_users,
       round(n_transitions * 1.0 / sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p
FROM tr
"""


M4_BUCKET_S = 6 * 3600  # 6-hour buckets for the M4 downsample


def minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per time bucket keep the FOUR
    extremal points -- min-value, max-value, first, last -- the
    error-free reduction for line-chart rendering (M4, PVLDB 7(10):
    within a pixel column, only those four points change the drawn
    line). A dashboard over a 100 TB event stream renders from
    4 x n_buckets rows instead of the table.

    Shape: four independent rank-1 branches, and that is deliberate --
    each ``row_number()==1`` filter lets Spark insert a MAP-SIDE
    ``WindowGroupLimit`` (partial + final per branch, plan-asserted in
    tests/test_plans.py), so every branch shuffles ~one candidate row
    per map partition per bucket instead of the table. Four
    skinny-shuffle scans beat the tempting "one exchange + four chained
    window sorts" rewrite at 100 TB: that form must shuffle and sort
    EVERY row (the OR-of-four-ranks filter defeats group-limit pushdown
    for all of them), while here the exchanged volume is proportional to
    buckets, not rows. Each extremum pick carries a total (ts, user_id,
    value) tie-break so both engines select the identical row; bucket
    starts are integer epoch math, timezone-proof. The value is ordered
    RAW (doubles compare exactly) and only rounded for output."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    base = ev.select(
        (F.floor(epoch_s / M4_BUCKET_S) * M4_BUCKET_S)
        .cast("long")
        .alias("bucket_epoch"),
        epoch_s.cast("long").alias("ts_epoch"),
        "user_id",
        "value",
    )

    def _pick(kind: str, *order) -> DataFrame:
        w = Window.partitionBy("bucket_epoch").orderBy(*order)
        return (
            base.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "bucket_epoch",
                F.lit(kind).alias("kind"),
                "ts_epoch",
                "user_id",
                F.round("value", 6).alias("value"),
            )
        )

    tie = (F.asc("ts_epoch"), F.asc("user_id"))
    return (
        _pick("min", F.asc("value"), *tie)
        .unionByName(_pick("max", F.desc("value"), *tie))
        .unionByName(_pick("first", F.asc("ts_epoch"), F.asc("user_id"), F.asc("value")))
        .unionByName(_pick("last", F.desc("ts_epoch"), F.asc("user_id"), F.asc("value")))
    )


SQL_M4_DOWNSAMPLE = f"""
WITH base AS (
  -- floor(epoch(.)), not CAST(... AS BIGINT): epoch() is DOUBLE with the
  -- sub-second fraction, and the BIGINT cast ROUNDS while Spark's
  -- unix_timestamp() truncates -- off-by-one on any event past .5 s
  SELECT CAST(floor(epoch(ts) / {M4_BUCKET_S}) * {M4_BUCKET_S} AS BIGINT)
             AS bucket_epoch,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch, user_id, value
  FROM events
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY bucket_epoch
                       ORDER BY value ASC, ts_epoch, user_id) AS rmin,
    row_number() OVER (PARTITION BY bucket_epoch
                       ORDER BY value DESC, ts_epoch, user_id) AS rmax,
    row_number() OVER (PARTITION BY bucket_epoch
                       ORDER BY ts_epoch ASC, user_id, value) AS rfirst,
    row_number() OVER (PARTITION BY bucket_epoch
                       ORDER BY ts_epoch DESC, user_id, value) AS rlast
  FROM base
)
SELECT bucket_epoch, 'min' AS kind, ts_epoch, user_id, round(value, 6) AS value
FROM r WHERE rmin = 1
UNION ALL
SELECT bucket_epoch, 'max', ts_epoch, user_id, round(value, 6) FROM r WHERE rmax = 1
UNION ALL
SELECT bucket_epoch, 'first', ts_epoch, user_id, round(value, 6) FROM r WHERE rfirst = 1
UNION ALL
SELECT bucket_epoch, 'last', ts_epoch, user_id, round(value, 6) FROM r WHERE rlast = 1
"""


def register(reg: Registry) -> None:
    reg.add(
        "minmax_downsample",
        minmax_downsample,
        SQL_M4_DOWNSAMPLE,
        "M4 chart downsampling: per-bucket min/max/first/last extremal rows",
    )
    reg.add("window_tumbling", window_tumbling, SQL_TUMBLING, "5-min tumbling windows")
    reg.add(
        "event_transitions",
        event_transitions,
        SQL_EVENT_TRANSITIONS,
        "per-user event-type Markov transition counts + P(to|from)",
    )
    reg.add(
        "window_trailing_range",
        window_trailing_range,
        SQL_TRAILING_RANGE,
        "value-based RANGE frame: trailing 1-hour per-event aggregate",
    )
    reg.add("funnel_depths", funnel_depths, SQL_FUNNEL, "ordered click->view->purchase funnel")
    reg.add("cohort_retention", cohort_retention, SQL_COHORT, "first-seen-day cohort retention")
    reg.add(
        "window_funcs_suite",
        window_funcs_suite,
        SQL_WINDOW_FUNCS,
        "row_number/ntile/percent_rank/first_value/running max, one window",
    )
    reg.add("window_sliding", window_sliding, SQL_SLIDING, "10/5-min sliding windows")
    reg.add("window_session", window_session, SQL_SESSION, "30-min-gap session windows")
    reg.add("events_json_sum", events_json_sum, SQL_JSON_SUM, "JSON field extract + agg")
    reg.add(
        "events_variant_extract",
        events_variant_extract,
        SQL_VARIANT_EXTRACT,
        "VARIANT semi-structured path: parse_json once, typed variant_get paths",
    )
    reg.add("window_moving_avg", window_moving_avg, SQL_MOVING_AVG, "3-row moving average per user")
    reg.add("window_lag_delta", window_lag_delta, SQL_LAG_DELTA, "lag delta per user")
    reg.add(
        "events_time_rollup",
        events_time_rollup,
        SQL_TIME_ROLLUP,
        "hour/day/total time-hierarchy rollup in one pass",
    )
    reg.add(
        "events_value_histogram",
        events_value_histogram,
        SQL_VALUE_HISTOGRAM,
        "fixed-width value histogram per event type",
    )

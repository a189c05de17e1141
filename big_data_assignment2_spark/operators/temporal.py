"""Temporal join / reshaping operators the reference lacks but a
general-purpose engine needs: as-of join, binned range join, pivot, cube.

The as-of join is the canonical "operator Spark has no primitive for"
(SURVEY.md section 2.3 notes its absence in the reference too). It is
composed from existing DataFrame ops -- union + running last_value over an
event-time window -- rather than a theta-join, because the theta form
(``b.ts <= a.ts`` max-per-key) explodes quadratically per key; the window
form is one shuffle + one sort per key, linear in events, which is the
shape that survives 100 TB. DuckDB verifies it with its *native*
``ASOF JOIN`` operator, so the composition is checked against a first-class
implementation, not a twin of itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import dsum, sql_dsum

ASOF_LEFT = "click"
ASOF_RIGHT = "purchase"


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent purchase by the same user at or
    before the click (an as-of backward join).

    Shape: tag both sides, union, and take a running ``max(purchase ts)``
    over a per-user event-time window -- purchases sort before clicks on
    ties so an equal-timestamp purchase is visible to the click (ASOF's
    ``<=`` semantics). Only the matched timestamp is emitted, so ties
    among simultaneous purchases cannot make the result ambiguous."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == ASOF_LEFT).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.where(F.col("event_type") == ASOF_RIGHT).select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    tagged = clicks.withColumn("is_left", F.lit(1)).unionByName(
        purchases.withColumn("event_id", F.lit(None).cast("long")).withColumn(
            "is_left", F.lit(0)
        )
    )
    # purchases (is_left=0) order before clicks at the same ts_us
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = tagged.withColumn(
        "last_purchase_us",
        F.max(F.when(F.col("is_left") == 0, F.col("ts_us"))).over(w),
    )
    return running.where(F.col("is_left") == 1).select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        "last_purchase_us",
        (F.col("ts_us") - F.col("last_purchase_us")).alias("gap_us"),
    )


SQL_ASOF = f"""
WITH clicks AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS click_ts_us
  FROM events WHERE event_type = '{ASOF_LEFT}'
),
purchases AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS p_ts_us
  FROM events WHERE event_type = '{ASOF_RIGHT}'
)
SELECT c.event_id, c.user_id, c.click_ts_us,
       p.p_ts_us AS last_purchase_us,
       c.click_ts_us - p.p_ts_us AS gap_us
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.click_ts_us >= p.p_ts_us
"""


RANGE_BIN_S = 1800  # bin width == max range length, so a range spans <= 2 bins
RANGE_DEF_MOD = 97  # events with event_id % MOD == 0 define the ranges


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (range join) in its scale-correct binned
    form: every event matched to each 30-minute window ``[lo, lo+30min)``
    anchored at a deterministic ~1% slice of events (``event_id % 97 ==
    0`` stands in for a maintenance/campaign-window table).

    Naive Spark plans an interval-only predicate as
    BroadcastNestedLoopJoin -- O(|events| * |ranges|) compute, the thing
    that cannot run at 100 TB. The binned form makes it an EQUI join:
    both sides get a bin key ``floor(epoch / BIN_S)``, each range is
    exploded to the <= 2 bins it overlaps (bin width >= range length
    bounds the fan-out), the join runs hash-partitioned on the bin, and
    the exact ``lo <= ts < hi`` filter runs post-join. An event's bin is
    unique, so each matching (event, range) pair appears exactly once --
    no dedup pass. This is the standard bucketized range-join rewrite
    (what Databricks' range-join hints do under the hood), expressed in
    plain DataFrame ops; plan-asserted nested-loop-free."""
    ev = load_table(spark, sf_dir, "events")
    lo_us = F.unix_micros("ts")
    ranges = ev.where(F.col("event_id") % RANGE_DEF_MOD == 0).select(
        F.col("event_id").alias("window_id"),
        lo_us.alias("lo_us"),
        (lo_us + RANGE_BIN_S * 1_000_000).alias("hi_us"),
    )
    bin_of = lambda c: F.floor(F.col(c) / (RANGE_BIN_S * 1_000_000))  # noqa: E731
    r_binned = ranges.withColumn(
        "bin", F.explode(F.sequence(bin_of("lo_us"), bin_of("hi_us")))
    )
    e_binned = ev.select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn("bin", bin_of("ts_us"))
    return (
        e_binned.join(r_binned, "bin")
        .where((F.col("ts_us") >= F.col("lo_us")) & (F.col("ts_us") < F.col("hi_us")))
        .select("event_id", "window_id", "ts_us", "lo_us")
    )


SQL_RANGE_JOIN = f"""
WITH r AS (
  SELECT event_id AS window_id,
         CAST(epoch_us(ts) AS BIGINT) AS lo_us,
         CAST(epoch_us(ts) AS BIGINT) + {RANGE_BIN_S} * 1000000 AS hi_us
  FROM events WHERE event_id % {RANGE_DEF_MOD} = 0
)
SELECT e.event_id, r.window_id, CAST(epoch_us(e.ts) AS BIGINT) AS ts_us, r.lo_us
FROM events e JOIN r
  ON epoch_us(e.ts) >= r.lo_us AND epoch_us(e.ts) < r.hi_us
"""


PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user event counts, one column per event
    type. The value list is explicit, which keeps the plan a single
    two-phase aggregate (no extra distinct-values job) -- mandatory at
    scale, where an implicit pivot would scan the fact table twice."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_TYPES))
    )


SQL_PIVOT = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (event_type = '{t}') AS {t}" for t in PIVOT_TYPES
) + " FROM events GROUP BY user_id"


def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DYNAMIC-values pivot path: the column list is discovered with a
    separate distinct-values job (sorted for a deterministic column
    order), then fed to the same explicit-list pivot as
    :func:`pivot_event_counts`. This is what ``.pivot(col)`` without a
    value list does under the hood -- made explicit here so the cost model
    is visible: ONE extra metadata-sized job (distinct event types -- a
    handful of values regardless of table size, the one ``.collect()``
    class that is legitimate at 100 TB), after which the plan is identical
    to the static pivot. Spark caps the discovered list at
    ``spark.sql.pivotMaxValues`` (default 10k) for exactly this reason."""
    ev = load_table(spark, sf_dir, "events")
    types = sorted(
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    )
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


# oracle discovers nothing: the driver compares VALUES, and on this data the
# discovered set equals PIVOT_TYPES (asserted by the Spark/DuckDB match --
# a new event_type in the generator would fail the column comparison, which
# is the correct loud failure for a dynamic pivot)
SQL_PIVOT_DYNAMIC = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (event_type = '{t}') AS {t}" for t in sorted(PIVOT_TYPES)
) + " FROM events GROUP BY user_id"


RECON_DAY_S = 86_400


def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feed reconciliation via FULL OUTER join -- the classic ops
    question "which (user, day) cells exist in one feed but not the
    other?": per-day click counts vs purchase counts, every cell kept from
    BOTH sides, zero-filled, tagged with its match status. Inner/left/
    semi/anti joins are registered elsewhere; full outer completes the
    join-type family, and its shuffle shape is the same single hash
    exchange per side on the join key (both inputs are already aggregated
    to key-cardinality before the join -- reconcile aggregates, never raw
    feeds: the join then moves counters, not events)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / RECON_DAY_S).cast("long").alias("day"),
        "event_type",
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    j = clicks.join(purch, ["user_id", "day"], "full_outer")
    status = (
        F.when(F.col("n_clicks").isNull(), F.lit("purchase_only"))
        .when(F.col("n_purchases").isNull(), F.lit("click_only"))
        .otherwise(F.lit("both"))
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
        status.alias("status"),
    )


SQL_FULL_OUTER_RECONCILE = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts) / {RECON_DAY_S}) AS BIGINT) AS day, event_type
  FROM events
),
clicks AS (
  SELECT user_id, day, count(*) AS n_clicks FROM ev
  WHERE event_type = 'click' GROUP BY 1, 2
),
purch AS (
  SELECT user_id, day, count(*) AS n_purchases FROM ev
  WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(c.day, p.day) AS day,
       CAST(COALESCE(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases,
       CASE WHEN c.n_clicks IS NULL THEN 'purchase_only'
            WHEN p.n_purchases IS NULL THEN 'click_only'
            ELSE 'both' END AS status
FROM clicks c FULL OUTER JOIN purch p
  ON c.user_id = p.user_id AND c.day = p.day
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions: all 4 grouping sets in one pass
    (Expand + single shuffle), with grouping_id disambiguating the null
    of "all" from a null dimension value."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


SQL_CUBE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n, {sql_dsum('o_totalprice')} AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: per user, collapse the
    event stream into validity intervals over the tracked attribute
    (``event_type`` stands in for a dimension attribute), with version
    numbers and an ``is_current`` flag -- the standard dimension-history
    build of a warehouse load.

    Shape: ONE shuffle. Change-point detection (``lag``), run filtering,
    interval close (``lead``) and versioning (``row_number``) all ride the
    same ``user_id`` hash partitioning -- the filter between the two
    window passes preserves distribution and order, so Catalyst plans a
    single Exchange (plan-asserted in tests/test_plans.py). Ties are
    impossible: the ordering key is (ts, event_id) and event_id is
    unique, so run boundaries are total-order deterministic in both
    engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    runs = ev.withColumn(
        "is_start",
        F.coalesce(F.lag("event_type").over(w) != F.col("event_type"), F.lit(True)),
    ).where(F.col("is_start"))
    w_runs = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return runs.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w_runs).alias("valid_to_us"),
        F.row_number().over(w_runs).alias("version"),
        F.lead("ts_us").over(w_runs).isNull().alias("is_current"),
    )


SQL_SCD2 = """
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
  FROM events
),
runs AS (
  SELECT * FROM (
    SELECT user_id, event_type, ts_us, event_id,
           COALESCE(LAG(event_type) OVER w <> event_type, TRUE) AS is_start
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
  ) WHERE is_start
)
SELECT user_id, event_type, ts_us AS valid_from_us,
       LEAD(ts_us) OVER w AS valid_to_us,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       LEAD(ts_us) OVER w IS NULL AS is_current
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every event mapped to the SCD2 dimension
    VERSION that was active at its timestamp (the fact-to-history join
    of a warehouse, and the feature-store "as-of training join").

    Spark side: because version starts are a subset of the same event
    stream, the active version at any row is a RUNNING COUNT of run
    starts over the same (user, ts, event_id) ordering the history build
    uses -- one window pass, one shuffle, no join at all. The oracle
    takes the other route: a genuine interval join of events against the
    materialized history (tuple-range predicate per version). Two
    independent computation paths, same result -- which is exactly what
    makes this pair a strong check of BOTH the history build and the
    join semantics (inclusive start, exclusive end, tuple tie-break).

    At 100 TB the window form wins when fact and dimension share a
    stream (one shuffle, no history materialization); the join form wins
    when history is a separate table -- then it is a range join and the
    ``range_join_events`` binning shape applies."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    is_start = F.coalesce(
        F.lag("event_type").over(w) != F.col("event_type"), F.lit(True)
    )
    run = ev.withColumn("_s", is_start.cast("int"))
    w_sum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return run.select(
        "event_id",
        "user_id",
        "event_type",
        F.sum("_s").over(w_sum).cast("int").alias("version"),
    )


SQL_SCD2_PIT = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
runs AS (
  SELECT user_id, ts_us, event_id,
         CAST(ROW_NUMBER() OVER w2 AS INT) AS version
  FROM (
    SELECT user_id, ts_us, event_id,
           COALESCE(LAG(event_type) OVER w <> event_type, TRUE) AS is_start
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
  ) WHERE is_start
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
bounded AS (
  SELECT user_id, ts_us, event_id, version,
         LEAD(ts_us) OVER w3 AS next_ts_us,
         LEAD(event_id) OVER w3 AS next_event_id
  FROM runs
  WINDOW w3 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT e.event_id, e.user_id, e.event_type, b.version
FROM ev e JOIN bounded b
  ON e.user_id = b.user_id
 AND (e.ts_us, e.event_id) >= (b.ts_us, b.event_id)
 AND (b.next_ts_us IS NULL OR (e.ts_us, e.event_id) < (b.next_ts_us, b.next_event_id))
"""


GAP_STEP_S = 3600  # gap-fill bucket width (1 hour)
GAP_CUTOFF_S = 1_704_672_000  # 2024-01-08 00:00:00 UTC: one-week slice


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup with gap filling: hourly buckets
    per user over the user's own [first, last] hour, missing buckets
    emitted with ``n_events = 0`` and the gauge carried forward (LOCF --
    last observation carried forward), the TimescaleDB
    ``time_bucket_gapfill + locf`` semantics re-expressed as DataFrame ops.

    Shape: the dense bucket spine is ``sequence(lo, hi, step)`` + explode
    from ONE per-user min/max aggregate -- spine size is bounded by
    range/step per key, never by event count, so a chatty key costs the
    same spine as a quiet one. The fill is a left join (spine <- observed)
    plus one per-key ordered window for LOCF: two shuffles on user_id
    total, both AQE-coalesced. Buckets and epochs are integer seconds
    end-to-end (timezone-proof); the gauge is a per-bucket MAX (exact, no
    accumulation), so LOCF output is bit-identical across engines.

    The week slice keeps the demo spine small; at 100 TB the slice
    disappears and step widens with the rollup level -- the plan is
    unchanged."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("s"), "value"
    ).where(F.col("s") < GAP_CUTOFF_S)
    bucketed = ev.select(
        "user_id",
        (F.floor(F.col("s") / GAP_STEP_S) * GAP_STEP_S).cast("long").alias("bucket_s"),
        "value",
    )
    obs = bucketed.groupBy("user_id", "bucket_s").agg(
        F.count(F.lit(1)).alias("n_obs"), F.max("value").alias("gauge")
    )
    spine = (
        bucketed.groupBy("user_id")
        .agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(GAP_STEP_S).cast("long"))).alias(
                "bucket_s"
            ),
        )
    )
    j = spine.join(obs, ["user_id", "bucket_s"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "bucket_s",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.last("gauge", ignorenulls=True).over(w), 6).alias("gauge_locf"),
    )


SQL_GAPFILL = f"""
WITH ev AS (
  -- floor() BEFORE the BIGINT cast: DuckDB CAST(double) rounds to nearest
  -- while Spark unix_timestamp truncates, and events carry sub-second parts
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, value
  FROM events WHERE CAST(floor(epoch(ts)) AS BIGINT) < {GAP_CUTOFF_S}
),
bucketed AS (
  SELECT user_id, (s // {GAP_STEP_S}) * {GAP_STEP_S} AS bucket_s, value FROM ev
),
obs AS (
  SELECT user_id, bucket_s, count(*) AS n_obs, max(value) AS gauge
  FROM bucketed GROUP BY 1, 2
),
spine AS (
  SELECT user_id,
         unnest(generate_series(min(bucket_s), max(bucket_s), {GAP_STEP_S})) AS bucket_s
  FROM bucketed GROUP BY user_id
)
SELECT s.user_id, s.bucket_s,
       CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_events,
       round(last_value(o.gauge IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket_s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS gauge_locf
FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.bucket_s = s.bucket_s
"""


def gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with LINEAR INTERPOLATION -- the other half of the
    TimescaleDB ``time_bucket_gapfill`` pair (:func:`gapfill_locf` is the
    step-function fill; this is the ``interpolate()`` fill for
    continuously-varying gauges): each missing hourly bucket gets the
    time-weighted blend of the nearest observed gauge before and after
    it; buckets outside the observed range carry the nearest edge value.

    Shape: identical to the LOCF operator up to the spine left-join (one
    per-user min/max aggregate -> sequence spine, one join), then TWO
    per-key ordered windows -- last-non-null looking back, first-non-null
    looking forward -- give (prev_s, prev_v, next_s, next_v) and the
    blend is a narrow projection. Still two shuffles total.

    Determinism: bucket epochs are exact integers; the blend is the same
    three IEEE double ops on identical inputs in both engines, rounded
    to 6."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("s"), "value"
    ).where(F.col("s") < GAP_CUTOFF_S)
    bucketed = ev.select(
        "user_id",
        (F.floor(F.col("s") / GAP_STEP_S) * GAP_STEP_S).cast("long").alias("bucket_s"),
        "value",
    )
    obs = bucketed.groupBy("user_id", "bucket_s").agg(
        F.count(F.lit(1)).alias("n_obs"), F.max("value").alias("gauge")
    )
    spine = (
        bucketed.groupBy("user_id")
        .agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(GAP_STEP_S).cast("long"))).alias(
                "bucket_s"
            ),
        )
    )
    j = spine.join(obs, ["user_id", "bucket_s"], "left")
    obs_s = F.when(F.col("gauge").isNotNull(), F.col("bucket_s"))
    back = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_s = F.last(obs_s, ignorenulls=True).over(back)
    prev_v = F.last("gauge", ignorenulls=True).over(back)
    next_s = F.first(obs_s, ignorenulls=True).over(fwd)
    next_v = F.first("gauge", ignorenulls=True).over(fwd)
    blend = F.when(
        prev_s.isNotNull() & next_s.isNotNull() & (next_s != prev_s),
        prev_v
        + (next_v - prev_v)
        * ((F.col("bucket_s") - prev_s) / (next_s - prev_s)),
    ).otherwise(F.coalesce(prev_v, next_v))
    # micro-unit BIGINT, not round(double, 6): a linear blend with a
    # dyadic fraction (gap/2, gap/4...) lands exactly on .5*10^-6 decimal
    # ties, where Spark's HALF_UP and DuckDB's float rounding disagree in
    # the last digit; floor(x*1e6 + 0.5) is the identical IEEE op chain
    # on both engines and the integer result renders identically.
    return j.select(
        "user_id",
        "bucket_s",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_events"),
        F.floor(blend * 1_000_000 + F.lit(0.5)).cast("long").alias("gauge_interp_micro"),
    )


SQL_GAPFILL_LINEAR = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, value
  FROM events WHERE CAST(floor(epoch(ts)) AS BIGINT) < {GAP_CUTOFF_S}
),
bucketed AS (
  SELECT user_id, (s // {GAP_STEP_S}) * {GAP_STEP_S} AS bucket_s, value FROM ev
),
obs AS (
  SELECT user_id, bucket_s, count(*) AS n_obs, max(value) AS gauge
  FROM bucketed GROUP BY 1, 2
),
spine AS (
  SELECT user_id,
         unnest(generate_series(min(bucket_s), max(bucket_s), {GAP_STEP_S})) AS bucket_s
  FROM bucketed GROUP BY user_id
),
j AS (
  SELECT s.user_id, s.bucket_s, o.n_obs, o.gauge,
         CASE WHEN o.gauge IS NOT NULL THEN s.bucket_s END AS obs_s
  FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.bucket_s = s.bucket_s
),
w AS (
  SELECT user_id, bucket_s, n_obs,
         last_value(obs_s IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_s,
         last_value(gauge IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         first_value(obs_s IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_s
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_s,
         first_value(gauge IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket_s
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
  FROM j
)
SELECT user_id, bucket_s,
       CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_events,
       CAST(floor((CASE WHEN prev_s IS NOT NULL AND next_s IS NOT NULL AND next_s <> prev_s
                  THEN prev_v + (next_v - prev_v)
                       * ((bucket_s - prev_s) / CAST(next_s - prev_s AS DOUBLE))
                  ELSE COALESCE(prev_v, next_v) END) * 1000000 + 0.5) AS BIGINT)
         AS gauge_interp_micro
FROM w
"""


SESSION_PAD_S = 600  # each event opens a 10-minute activity interval


def intervals_consolidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals (gaps-and-islands):
    every event opens ``[ts, ts + {SESSION_PAD_S}s)``; touching or
    overlapping intervals fuse into one island, returned as
    (user_id, start_s, end_s, n_events).

    The classic O(n log n) single-pass form, not an interval self-join:
    a running ``max(end)`` over the per-user start-ordered window marks an
    island boundary wherever the next start exceeds every previous end,
    and a running sum of those boundary flags numbers the islands -- one
    shuffle + one sort per key, linear in events, where the naive
    overlap-join is quadratic per key. All arithmetic is integer epoch
    seconds, so both engines agree exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + SESSION_PAD_S).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "is_new",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_s"),
        F.max("e").alias("end_s"),
        F.count(F.lit(1)).alias("n_events"),
    ).select("user_id", "start_s", "end_s", "n_events")


SQL_INTERVALS = f"""
WITH ev AS (
  -- floor() before the cast (DuckDB CAST rounds; Spark truncates)
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {SESSION_PAD_S} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > max(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM ev
),
islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, min(s) AS start_s, max(e) AS end_s,
       CAST(count(*) AS BIGINT) AS n_events
FROM islands GROUP BY user_id, island
"""


def register(reg: Registry) -> None:
    reg.add(
        "gapfill_locf",
        gapfill_locf,
        SQL_GAPFILL,
        "hourly time-bucket gap fill with last-observation-carried-forward",
    )
    reg.add(
        "gapfill_linear",
        gapfill_linear,
        SQL_GAPFILL_LINEAR,
        "time-bucket gap fill by linear interpolation between neighbors",
    )
    reg.add(
        "intervals_consolidate",
        intervals_consolidate,
        SQL_INTERVALS,
        "merge overlapping per-user intervals (gaps-and-islands, one pass)",
    )
    reg.add("asof_join_events", asof_join_events, SQL_ASOF, "as-of backward join via window")
    reg.add(
        "scd2_point_in_time_join",
        scd2_point_in_time_join,
        SQL_SCD2_PIT,
        "fact-to-history point-in-time join (window form vs interval-join oracle)",
    )
    reg.add(
        "scd2_history",
        scd2_history,
        SQL_SCD2,
        "SCD type-2 validity intervals from an event stream, one shuffle",
    )
    reg.add(
        "range_join_events",
        range_join_events,
        SQL_RANGE_JOIN,
        "binned interval-containment join (equi on time bin, no nested loop)",
    )
    reg.add("pivot_event_counts", pivot_event_counts, SQL_PIVOT, "explicit-values pivot")
    reg.add(
        "pivot_dynamic",
        pivot_dynamic,
        SQL_PIVOT_DYNAMIC,
        "dynamic-values pivot (explicit distinct-discovery job, then static plan)",
    )
    reg.add(
        "full_outer_reconcile",
        full_outer_reconcile,
        SQL_FULL_OUTER_RECONCILE,
        "FULL OUTER two-feed reconciliation with match-status tags",
    )
    reg.add(
        "unpivot_event_counts",
        unpivot_event_counts,
        SQL_UNPIVOT,
        "unpivot/melt: wide count matrix back to sparse long form",
    )
    reg.add("cube_agg", cube_agg, SQL_CUBE, "cube grouping sets + grouping_id")


def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, a.k.a. melt): the per-user event-type count
    matrix from :func:`pivot_event_counts` folded back into
    (user_id, event_type, n) rows via ``DataFrame.unpivot`` -- the
    inverse reshaping operator, and the other half every reshaping
    toolkit needs (pivot for reporting, unpivot for re-normalizing wide
    feeds). Plan shape: unpivot is an Expand projection -- row-local,
    zero additional shuffle beyond the pivot's aggregate; zero-count
    cells are dropped to keep the long form sparse, matching the
    "long table" the pivot originally consumed."""
    wide = pivot_event_counts(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["user_id"],
            values=list(PIVOT_TYPES),
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .where(F.col("n") > 0)
    )


# WHERE IN (PIVOT_TYPES) keeps the coverage assumption explicit: the Spark
# side unpivots exactly the PIVOT_TYPES columns, so an event_type outside
# that set (none in the generator today) must be excluded here too or the
# oracle would include rows the Spark result structurally cannot emit.
SQL_UNPIVOT = (
    "SELECT user_id, event_type, count(*) AS n FROM events "
    f"WHERE event_type IN {PIVOT_TYPES!r} GROUP BY 1, 2"
)


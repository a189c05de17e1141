"""User-level event aggregation surfaces: presence bitmaps, CDC
last-writer-wins materialization, and first/last-touch attribution.

All three are single-shuffle groupBy aggregates whose functions are
ALGEBRAIC (bit_or, min_by/max_by with a total-order key, filtered sums):
partials combine map-side and merge associatively, so a 100 TB event log
aggregates in one pass with no per-group row collection -- the same
mergeability argument as groupwise_linreg's OLS sums. That is the point
of the bitmap/argmax spellings over the window-function equivalents
(row_number + filter), which would shuffle AND sort every partition.

Determinism: the min_by/max_by key is an exact integer
(micros * 10^10 + event_id -- DECIMAL(38,0) on Spark, HUGEINT on DuckDB,
identical values and ordering), unique per event, so "latest" is
well-defined even for equal timestamps. Timestamps come through
``load_events`` (tz-proof NTZ read), and day-of-month arithmetic is
calendar math on the naive value -- no session-timezone dependence.

Reference parity: beyond-reference surface (SURVEY.md section 2.10's
training-pipeline/event-analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._util import dec_fw, dsum, enc_fw_checked, sql_dsum

# unique, time-ordered event key: micros since epoch shifted past any
# event_id. Spark DECIMAL(28,0)*10^10 caps at precision 38 (values are
# ~26 digits); DuckDB uses HUGEINT. Both are exact integers, so the two
# engines order identically.
_ORD = "CAST(unix_micros(ts) AS DECIMAL(28,0)) * 10000000000 + event_id"
_SQL_ORD = "CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id"


# 2024-01-01 in epoch days: the bitmap window anchor.  Day indices are
# PURE EPOCH ARITHMETIC (micros div 86.4e9) -- calendar functions like
# day(ts) interpret the instant in the SESSION timezone and shift events
# across midnight under a hostile tz, which is exactly the class of bug
# the driver's America/New_York session probe exists to catch.
ACTIVITY_BASE_DAY = 1_704_067_200 // 86_400  # = 19723
_US_PER_DAY = 86_400_000_000


def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily presence bitmap over a 64-day window from
    2024-01-01: bit d set iff the user had any event on (UTC) day
    base+d, plus the popcount as active_days.

    The bitmap IS the aggregate: ``bit_or`` of single-bit words is the
    classic distributed presence encoding (a one-word roaring-bitmap
    chunk; real deployments shard exactly like this, one word per
    user-window) -- partial bitmaps OR together map-side, so a hub user
    costs one word per partition, not a row per event, and the day-set
    intersection/union questions cogroup_user_days answers with set ops
    become single AND/OR words on this encoding. Events outside the
    window are excluded by the same predicate on both engines (none at
    this data; the guard is what makes the 1-word chunk honest)."""
    ev = load_table(spark, sf_dir, "events")
    d = (F.expr(f"unix_micros(ts) div {_US_PER_DAY}") - ACTIVITY_BASE_DAY).alias("d")
    day_bits = ev.select("user_id", d).where(F.col("d").between(0, 63))
    bm = F.bit_or(F.expr("shiftleft(1L, d)"))
    return day_bits.groupBy("user_id").agg(
        bm.alias("day_bitmap"),
        F.bit_count(bm).alias("active_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_ACTIVITY_BITMAP = f"""
WITH day_bits AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} - {ACTIVITY_BASE_DAY} AS d
  FROM events
)
SELECT user_id,
       bit_or(1::BIGINT << CAST(d AS INT)) AS day_bitmap,
       CAST(bit_count(bit_or(1::BIGINT << CAST(d AS INT))) AS INT) AS active_days,
       count(*) AS n_events
FROM day_bits WHERE d BETWEEN 0 AND 63 GROUP BY user_id
"""


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture materialization: treat the event stream as
    per-user upserts where ``error`` is a DELETE tombstone, and produce
    the final state table -- last event_type/value per user by the total
    (ts, event_id) order, dropping users whose LAST op is a delete.

    This is the log-to-table compaction every CDC sink (Debezium ->
    lakehouse) performs. Spelled as one ``max_by`` aggregate instead of
    the row_number()-window form: the aggregate partial-combines map-side
    (each partition contributes one candidate row per user), where the
    window spelling must sort full partitions -- on a 100 TB changelog
    that is the difference between a streaming pass and a cluster-wide
    sort. The filtered count keeps the op-count audit in the same pass."""
    ev = load_table(spark, sf_dir, "events")
    key = F.expr(_ORD)
    # event_type rides the aggregate as its enc_fw fixed-width surrogate:
    # max_by with a raw STRING value puts var-width data in the buffer and
    # demotes the whole agg to SortAggregate (event types are <=8-byte
    # ASCII enums, so the 8-byte pack is an exact round-trip). The
    # _checked variant raises loudly if a future event_type breaks the
    # <=8-byte/ASCII precondition instead of silently truncating the
    # tombstone compare below.
    state = ev.groupBy("user_id").agg(
        F.max_by(enc_fw_checked(F.col("event_type")), key).alias("last_type_c"),
        F.max_by("value", key).alias("last_value"),
        F.count(F.lit(1)).alias("n_ops"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_deletes"),
    )
    state = state.select(
        "user_id",
        dec_fw(F.col("last_type_c")).alias("last_type"),
        "last_value",
        "n_ops",
        "n_deletes",
    )
    return state.where(F.col("last_type") != "error").select(
        "user_id",
        "last_type",
        F.round("last_value", 6).alias("last_value"),
        "n_ops",
        "n_deletes",
    )


SQL_CDC_APPLY = f"""
WITH state AS (
  SELECT user_id,
         arg_max(event_type, {_SQL_ORD}) AS last_type,
         arg_max(value, {_SQL_ORD}) AS last_value,
         count(*) AS n_ops,
         count(*) FILTER (event_type = 'error') AS n_deletes
  FROM events GROUP BY user_id
)
SELECT user_id, last_type, round(last_value, 6) AS last_value, n_ops, n_deletes
FROM state WHERE last_type <> 'error'
"""


def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style attribution per user: the first-touch and
    last-touch event types (by the exact event order) alongside the
    purchase count and decimal-exact purchase revenue -- "which entry
    channel do converting users come through?".

    Same algebraic-aggregate argument as :func:`cdc_apply` (min_by +
    max_by + filtered sums in ONE map-combinable pass); the revenue sum
    goes through DECIMAL(18,6) so partition order cannot move the total.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.expr(_ORD)
    is_purchase = F.col("event_type") == "purchase"
    # enc_fw surrogate for the same HashAggregate reason as cdc_apply
    # (checked: a >8-byte or non-ASCII event_type fails loudly)
    agged = ev.groupBy("user_id").agg(
        F.min_by(enc_fw_checked(F.col("event_type")), key).alias("first_c"),
        F.max_by(enc_fw_checked(F.col("event_type")), key).alias("last_c"),
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        dsum(F.when(is_purchase, F.col("value")).otherwise(F.lit(0.0)), 6).alias(
            "purchase_revenue"
        ),
    )
    return agged.select(
        "user_id",
        dec_fw(F.col("first_c")).alias("first_touch"),
        dec_fw(F.col("last_c")).alias("last_touch"),
        "n_purchases",
        "purchase_revenue",
    )


SQL_ATTRIBUTION = f"""
SELECT user_id,
       arg_min(event_type, {_SQL_ORD}) AS first_touch,
       arg_max(event_type, {_SQL_ORD}) AS last_touch,
       count(*) FILTER (event_type = 'purchase') AS n_purchases,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 6)}
         AS purchase_revenue
FROM events GROUP BY user_id
"""


def register(reg: Registry) -> None:
    reg.add(
        "user_activity_bitmap",
        user_activity_bitmap,
        SQL_ACTIVITY_BITMAP,
        "per-user day-presence bitmap (bit_or) + popcount",
    )
    reg.add(
        "cdc_apply",
        cdc_apply,
        SQL_CDC_APPLY,
        "CDC log -> final state via max_by with delete tombstones",
    )
    reg.add(
        "attribution_first_last",
        attribution_first_last,
        SQL_ATTRIBUTION,
        "first/last-touch attribution + exact purchase revenue",
    )

"""Table catalog over the driver's synthetic parquet tables.

Mirrors the reference's sources: its corpus is one parquet file read with
``spark.read.parquet`` (reference ``app/prepare_data.py:15,18``); its four
Cassandra index tables become parquet-backed DataFrames here
(``app/query.py:32-54`` -> S2 in SURVEY.md section 2.1).

All reads are plain ``spark.read.parquet`` so Catalyst gets vectorized
scans, predicate pushdown and column pruning for free.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Plan memo: ``spark.read.parquet`` costs ~0.12s of DRIVER-side work per
# call (file listing + footer schema resolution through py4j), and the
# bench's 225 queries issue ~340 load_table calls -- tens of seconds of
# repeated PLAN-time I/O for the same ten immutable inputs (guide
# section 5.1: keep the driver out of the per-query path). DataFrames
# are immutable, so handing the same resolved frame to every caller is
# safe: this caches a logical plan, never rows (execution still scans
# parquet every time). Guards: keyed per SparkSession (weakly -- a
# frame from a stopped session must not leak into a new one) and per
# (path, mtime_ns, inode, size) signature, so a rewritten table (tests
# overwrite tmp-dir fixtures) misses the memo; non-local paths never
# memoize (os.stat fails).
_PLAN_MEMO: WeakKeyDictionary = WeakKeyDictionary()


def _path_sig(path: str):
    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_ino, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one synthetic table (S1/S2)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    sig = _path_sig(path)
    per = _PLAN_MEMO.setdefault(spark, {}) if sig is not None else None
    if per is not None:
        hit = per.get((sf_dir, name))
        if hit is not None and hit[0] == sig:
            return hit[1]
    if name == "events":
        df = load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(path)
    if per is not None:
        per[(sf_dir, name)] = (sig, df)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-adaptive events read: the driver's ``events.parquet`` has
    shipped both TIMESTAMP(NANOS) and ``timestamp[us]`` physical storage
    across rounds, so never assume one -- branch on the post-read dtype.

    * nanos file: Spark's vectorized reader rejects TIMESTAMP(NANOS)
      outright; the scoped ``nanosAsLong`` conf reads it as int64 and we
      convert with integer division (NOT a double divide, which loses
      precision above 2^53). DuckDB truncates ns->us the same way.
    * micros/millis file: the scoped ``inferTimestampNTZ.enabled=false``
      conf reads the tz-naive column as plain TIMESTAMP holding the
      file's wall-clock value as a UTC instant (``unix_micros`` equals
      the raw stored int64 for a micros file, raw*1000 for millis) --
      the same instants DuckDB's naive read produces, independent of the
      session timezone, and (unlike an expression rewrite) the bare
      column keeps full predicate pushdown to the parquet scan.
    * legacy INT96 file (Impala/Hive era): reads as plain TIMESTAMP too
      (julian-day + nanos encodes an instant directly, no timezone in
      the format), so it flows through the same non-long branch --
      covered by the ``int96`` fixtures in tests/test_events_loader.py.

    Either way ``ts`` comes out as TIMESTAMP (an instant equal to the
    file's wall-clock value read as UTC), which is what every downstream
    windows/temporal/streaming operator and oracle twin expects."""
    return normalize_events_ts(_read_events_raw(spark, f"{sf_dir}/events.parquet"))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """The ONE decode rule for an events frame read under
    :func:`_read_events_raw`'s scoped confs: nanos-as-long becomes
    TIMESTAMP via integer ns->us division (NOT a double divide -- loses
    precision above 2^53); anything else is already plain TIMESTAMP.
    Shared by the batch loader and every streaming staging path so the
    two can never silently diverge."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with the two ts-affecting confs scoped to the (eager)
    schema resolution -- previous values are restored right after
    ``spark.read``, so a caller session's later parquet reads keep their
    own behavior (other tables' tz-naive timestamp columns must stay NTZ
    for the ``ntz_lit`` pushdown comparisons). The returned frame stays
    valid: the resolved schema is baked into its relation at read time.

    * ``legacy.parquet.nanosAsLong=true``: TIMESTAMP(NANOS) -> int64.
    * ``parquet.inferTimestampNTZ.enabled=false``: tz-naive micros/millis
      -> plain TIMESTAMP (raw int64 as a UTC instant, session-tz-proof).
    """
    confs = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        return spark.read.parquet(path)
    finally:
        for k, p in prev.items():
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)

"""Table catalog over the driver's synthetic parquet tables.

Mirrors the reference's sources: its corpus is one parquet file read with
``spark.read.parquet`` (reference ``app/prepare_data.py:15,18``); its four
Cassandra index tables become parquet-backed DataFrames here
(``app/query.py:32-54`` -> S2 in SURVEY.md section 2.1).

All reads are plain ``spark.read.parquet`` so Catalyst gets vectorized
scans, predicate pushdown and column pruning for free.
"""

from __future__ import annotations

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one synthetic table (S1/S2)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects outright. Read the nanos as int64
    (legacy conf) and convert to a microsecond timestamp with integer
    division -- NOT a double divide, which loses precision above 2^53 and
    corrupts the microseconds. DuckDB truncates ns->us the same way, so
    oracles agree exactly."""
    from pyspark.sql import functions as F

    raw = _read_with_nanos_as_long(spark, f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _read_with_nanos_as_long(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with the nanos-as-long legacy conf scoped to the
    (eager) schema resolution: the previous value is restored right after
    ``spark.read``, so a caller session's later parquet reads keep their
    own nanos behavior. The returned frame stays valid -- the converted
    schema is baked into its relation at read time."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``big_data_assignment2_spark/``; the registry
(one entry per operator from SURVEY.md section 2 plus the training-data
extensions) is assembled in ``big_data_assignment2_spark/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_assignment2_spark.registry import build_registry

_REG = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end BM25 search (corpus -> clean -> tokenize ->
    TF/DF -> doc stats -> score -> top-10) on /root/testdata/sf0.001."""
    from big_data_assignment2_spark.operators.search import bm25_search

    return bm25_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return _REG.fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted for the few
    genuinely non-SQL-expressible ops -> rows-only check)."""
    return _REG.oracles()

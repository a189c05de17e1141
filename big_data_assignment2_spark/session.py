"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the design
target is a multi-executor cluster, so nothing in this package relies on
local mode -- all operators are expressed as declarative DataFrame plans
whose physical strategy (broadcast vs shuffle, partial aggregation,
partition pruning) Catalyst/AQE picks per deployment.

Note: the correctness driver may hand us *its own* session, so operators
must not depend on any config set here.  The factory is for tests,
bench.py, and standalone use.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "big-data-assignment2-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", 32))
    # Explicit driver heap: in local[N] mode the driver JVM *is* the executor,
    # so Spark's 1g default must host N concurrent task threads plus any
    # cached/checkpointed blocks.  Round 5's bench died with
    # java.lang.OutOfMemoryError under that default; 16g (env-overridable,
    # sandbox has 128 GiB) gives local[32] a realistic per-thread budget.
    # Only effective when this factory launches the JVM -- a driver handing
    # us a live session keeps its own setting, which is why every operator
    # must also bound its own peak (see operators/graph.py triangle_count).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        # AQE: runtime partition coalescing + skew-join handling; at 100 TB
        # this is what rescues skewed term/key distributions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # Pin UTC so timestamp semantics match the tz-naive DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .getOrCreate()
    )

"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Execution is forced with the `noop` sink (full plan runs, nothing collected
to the driver), which is what a cluster deployment measures too.  A short
warm-up query first so JVM/codegen startup isn't charged to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_assignment2_spark.registry import build_registry
from big_data_assignment2_spark.session import get_spark


def _force(df) -> None:
    # noop sink: executes the full physical plan without driver collection.
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # parse ".../sf0.1" -> 0.1 (fall back to 0.1 on odd paths)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()

    # Warm-up: JVM, codegen, parquet footer caches, and the Python UDF
    # worker pool (daemon + Arrow serializer startup is ~2s once per
    # executor; a cluster amortizes it the same way).
    _force(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000))
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    _force(
        spark.range(1000)
        .select(_warm("id").alias("w"))
        .groupBy((_F.col("w") % 10).alias("k"))
        .agg(_F.sum("w").alias("s"))
    )

    timings: dict[str, float] = {}
    for name, q in reg.queries.items():
        t0 = time.perf_counter()
        _force(q.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total wall-clock, all registered queries, noop sink",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Isolated warm-rep probe: time named queries with the noop sink in one
session, N reps each, printing per-rep seconds and the median.

    python tools/probe_queries.py q1_pricing_summary simhash ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_REPS (3),
SPARK_GRAFT_CPUS. Builds any persisted fixture a query needs on first
touch (charged to rep 1 -- read the later reps for steady state).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROBE_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    from big_data_assignment2_spark.registry import build_registry
    from big_data_assignment2_spark.session import get_spark
    import bench

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    bench.warm_up(spark, SF_DIR)
    for name in names:
        fn = reg.queries[name].fn
        reps = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"probe:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: reps={reps} median={statistics.median(reps):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Shuffle-volume comparison: span_exact_dedup vs span_exact_dedup_fast.

The fast twin's whole point is shuffle WIDTH -- the gram key crossing the
wire twice (groupBy(gram) count + occurrence rejoin) is an 8-byte xxhash64
instead of a ~K-token string. Wall time at test scale is dominated by fixed
overheads, so the honest metric is bytes: run each variant in its own
SparkSession (fresh app => clean stage list) and sum shuffle write bytes
across all completed stages via the UI REST API. Both variants share every
other pipeline stage (scan, tokenize, run-merge window), so the delta is
the gram key itself.

Usage: python tools/span_shuffle_compare.py [sf_dir]
Prints one JSON line per variant plus a ratio summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

UI_PORT = 4049


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}{path}") as r:
        return json.load(r)


def run_variant(name: str, sf_dir: str) -> dict:
    from big_data_assignment2_spark.registry import build_registry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName(f"span-shuffle-{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        fn = build_registry().fns()[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        sec = time.perf_counter() - t0
        app_id = spark.sparkContext.applicationId
        stages = _rest(f"/api/v1/applications/{app_id}/stages?status=complete")
        shuffle_write = sum(s["shuffleWriteBytes"] for s in stages)
        shuffle_read = sum(s["shuffleReadBytes"] for s in stages)
    finally:
        spark.stop()
    return {
        "query": name,
        "rows": rows,
        "sec": round(sec, 2),
        "shuffle_write_bytes": shuffle_write,
        "shuffle_read_bytes": shuffle_read,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    exact = run_variant("span_exact_dedup", sf_dir)
    fast = run_variant("span_exact_dedup_fast", sf_dir)
    print(json.dumps(exact), flush=True)
    print(json.dumps(fast), flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows_equal": exact["rows"] == fast["rows"],
                "shuffle_write_ratio": round(
                    exact["shuffle_write_bytes"] / max(fast["shuffle_write_bytes"], 1), 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

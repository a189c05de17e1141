"""Shuffle-volume comparison: span_exact_dedup vs span_exact_dedup_fast.

The fast twin's whole point is shuffle WIDTH -- the gram key crossing the
wire twice (groupBy(gram) count + occurrence rejoin) is an 8-byte xxhash64
instead of a ~K-token string. The headline metric is BYTES: run each
variant in its own SparkSession (fresh app => clean stage list) and sum
shuffle write bytes across all completed stages via the UI REST API. Both
variants share every other pipeline stage (scan, tokenize, run-merge
window), so the delta is the gram key itself.

The ``sec`` field is informational only: the py4j gateway JVM survives
``spark.stop()``, so the second variant runs JIT-warmed while the first
pays cold-start -- wall comparisons belong to tools/scale_check_organic.py,
which times both variants inside one warmed session. Shuffle-byte totals
are order-independent.

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


def run_variant(name: str, sf_dir: str) -> dict:
    from big_data_assignment2_spark.registry import build_registry
    from big_data_assignment2_spark.session import get_spark

    os.environ["SPARK_UI"] = "true"  # read by the session factory
    spark = get_spark(f"span-shuffle-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        fn = build_registry().fns()[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        sec = time.perf_counter() - t0
        # the REST base comes from the LIVE context: Spark silently binds
        # the next free port when its default is taken, so a hardcoded
        # port would scrape the wrong (or no) application
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=30
        ) as r:
            stages = json.load(r)
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

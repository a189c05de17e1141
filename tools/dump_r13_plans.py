"""Dump .explain("formatted") for named queries into plans/r13/.

Usage:
    python tools/dump_r13_plans.py <suffix> <query> [<query> ...]

Writes plans/r13/<query>_<suffix>.txt for each query (suffix is
"before" / "after" per the optimization-round deliverable). Queries
that depend on persisted fixtures trigger their builds first, exactly
as the bench does, so the plan reflects the benched read path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from big_data_assignment2_spark.plans.audit import explain_formatted
    from big_data_assignment2_spark.registry import build_registry
    from big_data_assignment2_spark.session import get_spark

    spark = get_spark("plans-r13")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg.queries[name].fn(spark, SF_DIR)
        text = explain_formatted(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

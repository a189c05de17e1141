"""Same-session interleaved A/B of the fan-out: for each named query,
alternate SPARK_GRAFT_NO_FANOUT on/off rep by rep (A B A B ...) so load
drift hits both arms equally; report per-arm medians.

    python tools/ab_fanout.py <reps-per-arm> <query> [<query> ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    from big_data_assignment2_spark.registry import build_registry
    from big_data_assignment2_spark.session import get_spark
    import bench

    spark = get_spark("ab-fanout")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    bench.warm_up(spark, SF_DIR)
    for name in names:
        fn = reg.queries[name].fn
        arms: dict[str, list[float]] = {"off": [], "on": []}
        # one untimed warm pass per arm so fixture/memo builds are excluded
        for arm in ("off", "on"):
            os.environ["SPARK_GRAFT_NO_FANOUT"] = "1" if arm == "off" else ""
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for i in range(reps):
            for arm in ("off", "on"):
                os.environ["SPARK_GRAFT_NO_FANOUT"] = "1" if arm == "off" else ""
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}:{i}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                arms[arm].append(round(time.perf_counter() - t0, 3))
        os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        m_off = statistics.median(arms["off"])
        m_on = statistics.median(arms["on"])
        print(
            f"{name}: OFF median={m_off:.3f} {arms['off']} | "
            f"ON median={m_on:.3f} {arms['on']} | on/off={m_on / m_off:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Fresh-process interleaved A/B of the fan-out: each rep spawns a NEW
python/JVM process that warms up and times ONE noop-forced run of the
query, so the measurement matches the driver bench's cold-position
behavior (r12's same-session warm A/Bs disagreed with the driver's cold
run on four keepers -- this tool settles those on the driver's terms).
Arms alternate process by process (off, on, off, on, ...) so host-load
drift hits both arms equally.

    python tools/cold_ab.py <reps-per-arm> <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {here!r})
from big_data_assignment2_spark.registry import build_registry
from big_data_assignment2_spark.session import get_spark
import bench

spark = get_spark("cold-ab")
spark.sparkContext.setLogLevel("ERROR")
reg = build_registry()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench.warm_up(spark, sf_dir)
fn = reg.queries[{name!r}].fn
t0 = time.perf_counter()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
print("COLD_AB_SECONDS=%.3f" % (time.perf_counter() - t0), flush=True)
spark.stop()
"""


def _run_child(name: str, arm: str) -> float:
    env = dict(os.environ)
    if arm == "off":
        env["SPARK_GRAFT_NO_FANOUT"] = "1"
    else:
        env.pop("SPARK_GRAFT_NO_FANOUT", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(here=HERE, name=name)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COLD_AB_SECONDS="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(
        f"child failed for {name}/{arm}: rc={out.returncode}\n"
        f"{out.stdout[-1000:]}\n{out.stderr[-1000:]}"
    )


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    for name in names:
        arms: dict[str, list[float]] = {"off": [], "on": []}
        for i in range(reps):
            # alternate which arm goes first each rep
            order = ("off", "on") if i % 2 == 0 else ("on", "off")
            for arm in order:
                arms[arm].append(_run_child(name, arm))
        m_off = statistics.median(arms["off"])
        m_on = statistics.median(arms["on"])
        print(
            f"{name}: OFF median={m_off:.3f} {arms['off']} | "
            f"ON median={m_on:.3f} {arms['on']} | on/off={m_on / m_off:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

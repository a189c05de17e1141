"""Fresh-process probe: each rep spawns a NEW python/JVM process that
warms up and times ONE noop-forced run of the query. Use for queries
whose in-session warm reps are not representative (process-local memos,
persisted fixtures) or to reproduce the driver bench's cold-position
behavior.

    python tools/probe_cold.py <reps> <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import statistics
import sys

from cold_ab import _run_child  # same child runner; arm "on" = no env change


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    for name in names:
        vals = [_run_child(name, "on") for _ in range(reps)]
        print(
            f"{name}: reps={vals} median={statistics.median(vals):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

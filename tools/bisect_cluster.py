"""Round-7 bisect harness for the r6 ANN/similarity/BM25 perf cluster.

Runs ONLY the 14 regressed queries (VERDICT r6 table) in a fresh session,
with only the builds they themselves consume, and prints one JSON line of
per-query wall times.  Compared against r5-close (fb0cad7 BENCH_DETAIL)
numbers: if a fresh session reproduces r5-level times on HEAD code, the
regression is bench-session state, not a plan change.

Modes (env):
  SPARK_GRAFT_BISECT_MODE=minimal  (default) only required builds
  SPARK_GRAFT_BISECT_MODE=allbuilds  run the full bench build phase first
  SPARK_GRAFT_BISECT_MODE=prefix   run the full bench (builds + every
                                   registered query) BEFORE the cluster,
                                   replicating the 220-query session state
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_assignment2_spark.registry import build_registry
from big_data_assignment2_spark.session import get_spark

CLUSTER = (
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_persisted",
    "bm25_search",
    "bm25_search_persisted",
    "reference_bm25_ml_model",
    "reference_bm25_distributed_db",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "pipeline_end_to_end",
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = os.environ.get("SPARK_GRAFT_BISECT_MODE", "minimal")
    spark = get_spark("bisect")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()

    # the actual bench warm-up, not a copy (copies silently diverge and
    # the tool's whole premise is replicating bench session state)
    from bench import warm_up

    warm_up(spark, sf_dir)

    build_sec = {}
    errors = {}
    if mode == "minimal":
        from big_data_assignment2_spark.operators.search import ensure_persisted_index
        from big_data_assignment2_spark.operators.similarity import ensure_ann_index
        from big_data_assignment2_spark.sources.reference_corpus import (
            warm_reference_index,
        )

        for label, fn in (
            ("bm25_index", lambda: ensure_persisted_index(spark, sf_dir)),
            ("ann_index", lambda: ensure_ann_index(spark, sf_dir)),
            ("reference_cache", lambda: warm_reference_index(spark)),
        ):
            # fault-isolated: the reference cache legitimately fails when
            # the fixture corpus is absent (the same environments where
            # reference_* queries are unregistered) -- a dead build must
            # not abort the diagnostic
            t0 = time.perf_counter()
            try:
                fn()
                build_sec[label] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                errors[f"build:{label}"] = f"{type(e).__name__}: {str(e)[:120]}"
    else:
        from bench import run_build_phase

        run_build_phase(spark, sf_dir, reg, build_sec, errors)
        if mode == "prefix":
            # replicate the full 220-query session history before the
            # cluster is timed (cluster queries run in registry order too,
            # exactly as in bench.py)
            prefix_sec = {}
            for name, q in reg.queries.items():
                if name in CLUSTER:
                    continue
                # same policy as the pass loop below: a FAILED query
                # records no timing row -- its partial elapsed time rides
                # the error string only
                t0 = time.perf_counter()
                try:
                    _force(q.fn(spark, sf_dir))
                    prefix_sec[name] = round(time.perf_counter() - t0, 3)
                except Exception as e:  # noqa: BLE001
                    errors[name] = f"{type(e).__name__}: {str(e)[:120]}"
            build_sec["__prefix_total"] = round(sum(prefix_sec.values()), 3)

    passes = int(os.environ.get("SPARK_GRAFT_BISECT_PASSES", "2"))
    # reference_* cluster members are unregistered when the fixture corpus
    # is absent (registry.py skips them) -- note and skip, don't KeyError
    skipped = [n for n in CLUSTER if n not in reg.queries]
    all_passes = []
    for _ in range(passes):
        timings = {}
        for name in CLUSTER:
            if name in skipped:
                continue
            q = reg.queries[name]
            # fault-isolated like bench._run_isolated: one bad query must
            # not abort the pass and lose the whole diagnostic JSON; and
            # like bench, a FAILED query records no timing row (its
            # partial elapsed time rides the error string instead --
            # a 0.3s crash must not read as a 0.3s speedup)
            t0 = time.perf_counter()
            try:
                _force(q.fn(spark, sf_dir))
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001
                elapsed = round(time.perf_counter() - t0, 3)
                errors[name] = (
                    f"{type(e).__name__} after {elapsed}s: {str(e)[:120]}"
                )
        all_passes.append(timings)

    print(
        json.dumps(
            {
                "mode": mode,
                "builds": build_sec,
                "passes": all_passes,
                "skipped": skipped,
                "errors": errors,
            },
            sort_keys=True,
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

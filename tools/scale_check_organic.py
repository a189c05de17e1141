"""Organic (non-clone) scale check for the output-quadratic pair ops.

bench.py's scale check replicates sf0.1 verbatim with offset keys, so
every document gains ``factor-1`` identical twins and the near-dup pair
OUTPUT grows ~factor^2/doc-cluster (measured ~45x/doc at 10x) -- the
observed 13-36x time ratios for the pair finders are output-bound there,
not plan regressions. This tool scales the corpus ORGANICALLY instead:
replica *r*'s text goes through a per-replica Caesar rotation of [a-z]
(``F.translate`` -- a character-level bijection), which preserves every
WITHIN-replica distance and similarity exactly (Hamming, edit, token and
shingle Jaccard, and therefore MinHash/LSH collision structure) while
making cross-replica documents maximally distant. True pair output
therefore grows ~linearly (factor x the base output), and the measured
time ratio isolates the PLAN's scaling from the output term.

Prints one JSON line: per-query {base_sec, scaled_sec, ratio, base_rows,
scaled_rows, rows_ratio}. rows_ratio ~= factor confirms the corpus is
genuinely non-clone; ratio <= ~factor confirms the banding plans scale
at-or-below linear when the output does.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_assignment2_spark.registry import build_registry
from big_data_assignment2_spark.session import get_spark

# span_exact_dedup is output-discovery rather than pairwise, but the same
# clone-vs-organic question applies: per-replica rotation keeps every
# WITHIN-replica gram equality (so each replica reproduces the base's
# duplicated spans exactly) while cross-replica grams diverge -- true span
# output is exactly factor x base, and the ratio isolates the gram-shuffle
# plan from output growth.
QUERIES = (
    "prefix_hamming_pairs",
    "prefix_edit_pairs",
    "minhash_lsh_pairs",
    "span_exact_dedup",
    "span_exact_dedup_fast",
)


def _force(df) -> int:
    n = df.count()
    return n


def build_organic_dir(spark, sf_dir: str, factor: int) -> str:
    from big_data_assignment2_spark.operators._util import scratch_root, scratch_slug
    from big_data_assignment2_spark.sources.catalog import load_table

    # rotation r is mod-26 on letters: replica 26 would be an exact clone
    # of the base, silently reintroducing the quadratic clone-pair output
    # this tool exists to eliminate
    if not 2 <= factor <= 26:
        raise ValueError(f"factor must be in [2, 26], got {factor}")
    out = f"{scratch_root()}/organic{factor}x_{scratch_slug(sf_dir)}"
    docs = load_table(spark, sf_dir, "documents")
    reps = F.broadcast(
        spark.range(factor).select(F.col("id").cast("int").alias("rep"))
    )
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    digits = string.digits
    rotated = docs.crossJoin(reps).withColumn(
        "text",
        # per-replica character bijection; rep 0 keeps the original text.
        # Digits rotate mod-10 alongside the letters so numeric tokens
        # also diverge across replicas (residual cross-replica sharing
        # remains only at punctuation/whitespace positions and, for
        # r == 10 or 20, digits -- letters still differ there).
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.element_at(
                F.array(
                    *[
                        F.translate(
                            "text",
                            lower + upper + digits,
                            lower[r:] + lower[:r]
                            + upper[r:] + upper[:r]
                            + digits[r % 10:] + digits[:r % 10],
                        )
                        for r in range(1, factor)
                    ]
                ),
                F.col("rep"),
            )
        ),
    )
    scaled = rotated.withColumn(
        "doc_id", F.col("doc_id") + F.col("rep").cast("long") * 1_000_000_000
    ).drop("rep")
    scaled.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    spark = get_spark("scale-organic")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()

    from bench import warm_up

    warm_up(spark, sf_dir)
    t0 = time.perf_counter()
    scaled_dir = build_organic_dir(spark, sf_dir, factor)
    gen_sec = round(time.perf_counter() - t0, 2)

    results = {}
    for name in QUERIES:
        q = reg.queries[name]
        # base re-timed back-to-back with the scaled run (bench lesson:
        # contention swings ratios when base and scaled runs are far apart)
        t0 = time.perf_counter()
        base_rows = _force(q.fn(spark, sf_dir))
        base_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        scaled_rows = _force(q.fn(spark, scaled_dir))
        scaled_sec = round(time.perf_counter() - t0, 3)
        results[name] = {
            "base_sec": base_sec,
            "scaled_sec": scaled_sec,
            "ratio": round(scaled_sec / base_sec, 2) if base_sec else None,
            "base_rows": base_rows,
            "scaled_rows": scaled_rows,
            "rows_ratio": round(scaled_rows / base_rows, 2) if base_rows else None,
        }
    print(
        json.dumps(
            {"factor": factor, "gen_sec": gen_sec, "queries": results},
            sort_keys=True,
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

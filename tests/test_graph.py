"""Fixed-point PageRank invariants beyond the DuckDB oracle match."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment2_spark.operators import graph
from big_data_assignment2_spark.plans.audit import audit


def test_pagerank_rank_floor_and_mass(spark, sf_dir):
    """Every node keeps at least the teleport floor (15% of SCALE); total
    mass stays within integer-floor loss of N * SCALE (each of the 3
    iterations floors once per node-contribution and once per node)."""
    df = graph.pagerank_3iter(spark, sf_dir)
    rows = df.collect()
    n = len(rows)
    floor = graph.SCALE - graph.SCALE * graph.DAMP_NUM // graph.DAMP_DEN
    assert all(r["rank"] >= floor for r in rows)
    total = sum(r["rank"] for r in rows)
    assert total <= n * graph.SCALE
    # floor losses: < 1 per contribution per iteration, bounded by edges
    assert total > n * graph.SCALE * 0.8

    # high-degree nodes rank above the floor: rank actually flowed
    top = sorted(rows, key=lambda r: -r["rank"])[0]
    assert top["rank"] > graph.SCALE


def test_pagerank_no_cartesian(spark, sf_dir):
    assert not audit(graph.pagerank_3iter(spark, sf_dir), forbids=("CartesianProduct",))

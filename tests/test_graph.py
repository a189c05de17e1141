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


def test_triangle_invariants(spark, sf_dir):
    """Structural sanity beyond the oracle: triangles <= wedges / 3 is NOT
    generally true, but triangles <= wedges always is (every triangle
    closes 3 distinct wedges, counted once here via orientation), and a
    hand-built 4-clique plus pendant edge pins the exact counts."""
    m = {r["metric"]: r["value"] for r in graph.triangle_count(spark, sf_dir).collect()}
    assert set(m) == {"n_nodes", "n_edges", "n_wedges", "n_triangles", "n_capped_nodes"}
    assert m["n_triangles"] * 3 <= m["n_wedges"]
    assert m["n_edges"] <= m["n_nodes"] * (m["n_nodes"] - 1) // 2
    # TPC-H part degrees stay far below DEG_CAP: the cap is a 100 TB hub
    # guard, not a result shaper at this data
    assert m["n_capped_nodes"] == 0


def test_triangle_closed_form(spark, sf_dir, tmp_path):
    """4-clique + pendant vertex: K4 has 4 triangles, 12+3 wedges."""
    import pandas as pd

    # orders 1..6 each carry one edge of K4 {1,2,3,4}; order 7 adds 4-5
    rows = []
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    for ok, (u, v) in enumerate(pairs, start=1):
        rows += [(ok, u), (ok, v)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = tmp_path / "tri"
    d.mkdir()
    # minimal lineitem: only the two columns the operator reads
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), str(d / "lineitem.parquet"))
    m = {r["metric"]: r["value"] for r in graph.triangle_count(spark, str(d)).collect()}
    assert m["n_nodes"] == 5
    assert m["n_edges"] == 7
    assert m["n_triangles"] == 4
    # wedges: deg(1)=3,deg(2)=3,deg(3)=3,deg(4)=4,deg(5)=1 -> 3+3+3+6+0 = 15
    assert m["n_wedges"] == 15
    assert m["n_capped_nodes"] == 0


def test_triangle_degree_cap(spark, tmp_path):
    """A hub hotter than DEG_CAP is excluded and reported: star graph with
    center degree DEG_CAP+1 plus one disjoint triangle. With the hub capped
    only the triangle remains."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_assignment2_spark.operators import graph as g

    rows = []
    hub = 999_999
    # one order per star edge keeps every basket at size 2 (< BASKET_CAP)
    for i in range(g.DEG_CAP + 1):
        rows += [(i + 1, hub), (i + 1, i + 1)]
    base = g.DEG_CAP + 10
    tri_pairs = [(base + 1, base + 2), (base + 1, base + 3), (base + 2, base + 3)]
    for j, (u, v) in enumerate(tri_pairs):
        ok = 500_000 + j
        rows += [(ok, u), (ok, v)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = tmp_path / "cap"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf), str(d / "lineitem.parquet"))
    m = {r["metric"]: r["value"] for r in g.triangle_count(spark, str(d)).collect()}
    assert m["n_capped_nodes"] == 1
    assert m["n_edges"] == 3
    assert m["n_triangles"] == 1
    assert m["n_wedges"] == 3


def test_triangle_no_cartesian(spark, sf_dir):
    assert not audit(graph.triangle_count(spark, sf_dir), forbids=("CartesianProduct",))

"""Iterative graph analytics: fixed-point PageRank over the
customer-supplier trade graph.

The engine's other iterative operator (``dedup.neardup_components``) is
label propagation; PageRank is the other canonical fixed-point graph
kernel a data platform ships. Nodes are customers and suppliers (supplier
ids offset into their own key space), edges are DISTINCT trading pairs
from ``lineitem`` x ``orders``, symmetrized so rank mass flows both ways
and no node dangles.

Determinism across engines: ranks are **scaled integers** (fixed-point,
``SCALE = 10^6``), every division is integer division, every sum is an
integer sum -- associative and order-independent, so the Spark result and
the DuckDB 3-CTE oracle agree bit-for-bit. (Float PageRank sums in
shuffle order and can never hash-match across engines; the fixed-point
form is the price of an exact oracle, and documents the magnitude bound:
85 * total_mass must stay under 2^63.)

Scale shape (per iteration): contributions = ranks join degrees (both
node-sized, co-partitioned on id) -> join edges on src (the edge-sized
shuffle) -> two-phase integer sum keyed by dst -- a giant in-degree hub
is absorbed map-side by the partial aggregate, the classic PageRank skew
case. Edge and degree frames are computed once and localCheckpoint'ed so
per-iteration lineage stays flat; rounds are a constant (ITERS), not
data-dependent.

Reference parity: the reference has no graph operators at all -- this is
part of the beyond-reference training-pipeline surface (SURVEY.md
section 2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table

SCALE = 1_000_000  # fixed-point rank scale
ITERS = 3
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as a ratio
SUPP_OFFSET = 10_000_000  # suppliers into their own node-id space


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct symmetric customer<->supplier edges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionByName(rev)


def pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three fixed-point PageRank iterations; returns (node_id, rank)."""
    # EAGER checkpoints: the edge list is referenced twice per iteration
    # (contribution join + degree build) -- six subtree occurrences in the
    # final plan. Lazy checkpointing would leave the full lineage in
    # place and recompute the distinct-edges shuffle each time;
    # materializing once makes every iteration read a local block.
    edges = _edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    # symmetric edges => every node appears as a src
    ranks = deg.select(F.col("src").alias("id"), F.lit(SCALE).cast("long").alias("r"))
    for _ in range(ITERS):
        contribs = (
            ranks.join(deg, ranks.id == deg.src)
            .select("id", F.expr("r div deg").alias("contrib"))
            .join(edges, F.col("id") == edges.src)
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            ranks.join(contribs, ranks.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((SCALE - SCALE * DAMP_NUM // DAMP_DEN))
                    + F.expr(f"({DAMP_NUM} * coalesce(mass, 0L)) div {DAMP_DEN}")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col("id").alias("node_id"), F.col("r").alias("rank"))


SQL_PAGERANK = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + {SUPP_OFFSET} AS supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS id, CAST({SCALE} AS BIGINT) AS r FROM deg),
i1 AS (
  SELECT d.src AS id,
         CAST({SCALE - SCALE * DAMP_NUM // DAMP_DEN} +
              ({DAMP_NUM} * COALESCE(m.mass, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM deg d LEFT JOIN (
    SELECT e.dst, SUM(r.r // d2.deg) AS mass
    FROM r0 r JOIN deg d2 ON r.id = d2.src JOIN edges e ON r.id = e.src
    GROUP BY e.dst
  ) m ON d.src = m.dst
),
i2 AS (
  SELECT d.src AS id,
         CAST({SCALE - SCALE * DAMP_NUM // DAMP_DEN} +
              ({DAMP_NUM} * COALESCE(m.mass, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM deg d LEFT JOIN (
    SELECT e.dst, SUM(r.r // d2.deg) AS mass
    FROM i1 r JOIN deg d2 ON r.id = d2.src JOIN edges e ON r.id = e.src
    GROUP BY e.dst
  ) m ON d.src = m.dst
),
i3 AS (
  SELECT d.src AS id,
         CAST({SCALE - SCALE * DAMP_NUM // DAMP_DEN} +
              ({DAMP_NUM} * COALESCE(m.mass, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM deg d LEFT JOIN (
    SELECT e.dst, SUM(r.r // d2.deg) AS mass
    FROM i2 r JOIN deg d2 ON r.id = d2.src JOIN edges e ON r.id = e.src
    GROUP BY e.dst
  ) m ON d.src = m.dst
)
SELECT id AS node_id, r AS rank FROM i3
"""


def register(reg: Registry) -> None:
    reg.add(
        "pagerank_3iter",
        pagerank_3iter,
        SQL_PAGERANK,
        "fixed-point integer PageRank, 3 iterations over the trade graph",
    )

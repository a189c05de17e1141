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


BASKET_CAP = 12  # orders with more distinct parts than this are skipped


def _part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) co-purchase edges: two parts are connected when
    they appear in the same order. The per-order self-join fans out as
    C(k,2) in basket size k, so baskets over ``BASKET_CAP`` distinct parts
    are dropped BEFORE the join (the skew guard a mega-basket would
    otherwise explode; mirrored verbatim in the oracle so both engines see
    the identical graph). TPC-H orders hold <= 7 lines, so at this data the
    cap drops nothing -- it is the 100 TB guard, not a result shaper."""
    lp = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    ok = (
        lp.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("basket"))
        .where(F.col("basket") <= BASKET_CAP)
        .select("l_orderkey")
    )
    sm = lp.join(ok, "l_orderkey")  # co-partitioned: both sides keyed on l_orderkey
    a, b = sm.alias("a"), sm.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the part co-purchase graph: one row per
    metric (n_nodes, n_edges, n_wedges, n_triangles), all exact BIGINTs.

    Scale shape -- degree-ordered orientation (the classic distributed
    triangle trick): orient every edge from its (degree, id)-smaller
    endpoint to the larger, making the graph a DAG in which each triangle
    has exactly one source vertex. Wedges are then built only from a
    vertex's OUT-neighbors, so a degree-d hub generates C(out_d, 2) wedge
    candidates where out_d is bounded by orientation (total wedge work is
    O(m^1.5) instead of sum-of-C(deg,2) -- the difference between hours
    and never on a power-law graph at 100 TB). The closing-edge check is
    an equi-join on the ordered pair, never a cartesian. The wedge METRIC
    (sum of C(deg,2)) is computed arithmetically from the degree table,
    not by materializing wedges.

    Reference parity: beyond-reference surface (the reference has no graph
    operators); complements pagerank_3iter (fixed-point ranking) and
    neardup_components (connectivity) with the third canonical graph
    kernel, counting."""
    edges = _part_edges(spark, sf_dir).localCheckpoint()
    deg = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    withdeg = edges.join(
        deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
    # canonical u < v, so a degree tie orients u-first: (deg, id) total order
    u_first = F.col("du") <= F.col("dv")
    oriented = withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    dst_lt = (F.col("o1.ddeg") < F.col("o2.ddeg")) | (
        (F.col("o1.ddeg") == F.col("o2.ddeg")) & (F.col("o1.dst") < F.col("o2.dst"))
    )
    wedges = o1.join(o2, (F.col("o1.src") == F.col("o2.src")) & dst_lt).select(
        F.col("o1.dst").alias("wu"), F.col("o2.dst").alias("wv")
    )
    closing = oriented.select(F.col("src").alias("wu"), F.col("dst").alias("wv"))
    tri = wedges.join(closing, ["wu", "wv"]).agg(F.count(F.lit(1)).alias("value"))

    def _row(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"), F.col("value").cast("long").alias("value"))

    return (
        _row("n_nodes", deg.agg(F.count(F.lit(1)).alias("value")))
        .unionByName(_row("n_edges", edges.agg(F.count(F.lit(1)).alias("value"))))
        .unionByName(
            _row(
                "n_wedges",
                deg.agg(F.expr("sum((deg * (deg - 1)) div 2)").alias("value")),
            )
        )
        .unionByName(_row("n_triangles", tri))
    )


SQL_TRIANGLES = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM lp GROUP BY 1 HAVING count(*) <= {BASKET_CAP}),
sm AS (SELECT lp.l_orderkey, lp.l_partkey FROM lp JOIN ok USING (l_orderkey)),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM sm a JOIN sm b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT id, count(*) AS deg
  FROM (SELECT u AS id FROM edges UNION ALL SELECT v AS id FROM edges)
  GROUP BY 1
)
SELECT 'n_nodes' AS metric, CAST(count(*) AS BIGINT) AS value FROM deg
UNION ALL
SELECT 'n_edges', CAST(count(*) AS BIGINT) FROM edges
UNION ALL
SELECT 'n_wedges', CAST(COALESCE(SUM((deg * (deg - 1)) // 2), 0) AS BIGINT) FROM deg
UNION ALL
SELECT 'n_triangles', CAST(count(*) AS BIGINT)
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


def register(reg: Registry) -> None:
    reg.add(
        "pagerank_3iter",
        pagerank_3iter,
        SQL_PAGERANK,
        "fixed-point integer PageRank, 3 iterations over the trade graph",
    )
    reg.add(
        "triangle_count",
        triangle_count,
        SQL_TRIANGLES,
        "degree-oriented triangle census of the part co-purchase graph",
    )

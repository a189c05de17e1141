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
    they appear in the same order. Pair expansion fans out as C(k,2) in
    basket size k, so baskets over ``BASKET_CAP`` distinct parts are
    dropped BEFORE expansion (the skew guard a mega-basket would otherwise
    explode; the oracle applies the identical cap so both engines see the
    same graph). TPC-H orders hold <= 7 lines, so at this data the cap
    drops nothing -- it is the 100 TB guard, not a result shaper.

    Shape: ONE shuffle (groupBy order -> sorted distinct part array, with
    map-side partial sets), then the C(k,2) expansion runs entirely inside
    whole-stage codegen via nested ``transform``/``flatten`` on the <= CAP
    sized array -- no per-order self-join relation. A prior version
    expressed this as lp JOIN lp ON same-order AND u < v: same result,
    but distinct + join + SMJ cost ~2x the single-agg form at sf0.1.

    Fan-out before the basket groupBy was measured BOTH ways in r13 and
    rejected: same-session interleaved A/B read 0.84x, but the
    fresh-process cold A/B (the driver bench's behavior) read 1.07x --
    the same cold loss that killed the identically-shaped
    basket_pair_lift fan-out (1.14x cold). Cheap projection into a
    partial aggregate doesn't earn the extra Exchange."""
    lp = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        lp.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") <= BASKET_CAP)
    )
    pairs = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
    )
    return (
        baskets.select(F.explode(pairs).alias("e"))
        .select("e.u", "e.v")
        .distinct()
    )


DEG_CAP = 2000  # vertices hotter than this are excluded from the census


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the part co-purchase graph: one row per
    metric (n_nodes, n_edges, n_wedges, n_triangles, n_capped_nodes), all
    exact BIGINTs.

    Scale shape -- the round-5 version materialized the oriented WEDGE
    relation (~41M rows at sf0.1) and shuffle-joined it against the edge
    set, which OOM'd the bench JVM under a 1g heap. This version never
    creates a wedge row:

    1. **Degree cap by construction**: vertices with (unoriented) degree
       > ``DEG_CAP`` are removed from the graph up front and reported in
       the ``n_capped_nodes`` metric -- the same move ``BASKET_CAP`` makes
       for baskets, standard for power-law graphs. At sf0.1 max degree is
       221, so the cap drops nothing here; it exists so no stage's peak
       can scale with C(deg, 2) of a 100 TB hub. Mirrored in the oracle.
    2. **Degree orientation**: each edge points from its (deg, id)-smaller
       endpoint to the larger, so every triangle has exactly one source
       and per-vertex out-degree is O(sqrt(m))-bounded.
    3. **Edge iterator over sorted adjacency arrays**: per oriented edge
       (u, v), the triangle count through it is |out(u) INTERSECT out(v)|,
       computed JVM-side with ``array_intersect`` on ``collect_list``
       adjacency arrays -- the oriented edges are re-derived by EXPLODING
       the adjacency table (one row per (dst, out(src)) pair), so the
       census is ONE equi-join on dst and a sum, with per-row memory
       bounded by 2 * max-out-degree (<= DEG_CAP), instead of a 41M-row
       intermediate. The wedge METRIC stays arithmetic (sum of C(deg, 2)
       over the degree table).

    Reference parity: beyond-reference surface (the reference has no graph
    operators); complements pagerank_3iter (fixed-point ranking) and
    neardup_components (connectivity) with the third canonical graph
    kernel, counting."""
    # Two execution-level choices, both measured at sf0.1 (SCALE.md):
    #
    # * small frames (deg, adj) are ``cache()``d + eagerly
    #   counted, NOT ``localCheckpoint()``ed: a checkpointed frame surfaces
    #   as a stats-less LogicalRDD, so every downstream join planned over
    #   it defaults to sort-merge; a materialized cache exposes real
    #   sizeInBytes and the planner picks broadcast-hash for the small
    #   build sides on its own -- and keeps picking sort-merge at cluster
    #   scale where those are node-sized, which is why there is no
    #   hard-coded ``F.broadcast`` hint here.  The big edge list stays on
    #   localCheckpoint (always the probe side; stats irrelevant; cheaper
    #   materialization).  Cache residency is ~30 MB at sf0.1, spillable;
    #   it cannot be unpersisted in-function because the returned frame is
    #   lazy and still references the cached plans.
    # * collect_set/collect_list aggs fall back to SORT-based aggregation
    #   after 128 hash-map entries per partition (Spark's conservative
    #   default) -- measured 2x the whole edge build.  Raised to 1M entries
    #   (bounded: BASKET_CAP/DEG_CAP cap every collected set) for the
    #   in-function materializations only, restored in ``finally``.
    _FBT = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    fbt_before = spark.conf.get(_FBT, None)
    try:
        spark.conf.set(_FBT, "1000000")
        # edges0: localCheckpoint, not cache -- it is always the PROBE side
        # of later joins (stats irrelevant) and checkpoint materialization
        # is measurably cheaper than columnar cache write at this width
        edges0 = _part_edges(spark, sf_dir).localCheckpoint()
        # degree in ONE scan of edges0 (explode both endpoints), not a
        # two-branch union: a union would scan the not-yet-populated cache
        # from two concurrent stages and compute the edge build twice
        deg0 = (
            edges0.select(F.explode(F.array("u", "v")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .cache()
        )
        hot = deg0.where(F.col("deg") > DEG_CAP).select("id")
        # Heavy-hitter count is bounded by construction (< 2m / DEG_CAP
        # rows), so one scalar count over tiny cached deg0 is cheap -- and
        # when it is zero (every graph that is not pathologically skewed)
        # the anti-join + degree-recompute passes are skipped entirely: the
        # capped graph IS the input graph.  The nonempty path stays fully
        # distributed (broadcast anti-joins, never a driver-side id list).
        n_hot = hot.count()
        if n_hot == 0:
            edges, deg = edges0, deg0
        else:
            edges = (
                edges0.join(F.broadcast(hot.withColumnRenamed("id", "u")), "u", "left_anti")
                .join(F.broadcast(hot.withColumnRenamed("id", "v")), "v", "left_anti")
                .select("u", "v")
                .localCheckpoint()
            )
            deg = (
                edges.select(F.explode(F.array("u", "v")).alias("id"))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("deg"))
                .cache()
            )
            deg.count()
        withdeg = edges.join(
            deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u"
        ).join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        # canonical u < v, so a degree tie orients u-first: (deg, id) total order
        u_first = F.col("du") <= F.col("dv")
        # oriented is NOT cached: with the explode-adj triangle join below
        # it is consumed exactly once (the adj build), so a cache would be
        # a pure write cost (r13; the r12 version joined oriented back to
        # adj and needed it twice)
        oriented = withdeg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        adj = (
            oriented.groupBy("src")
            .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
            .cache()
        )
        # materializes oriented + adj (the last collect_* agg) inside the
        # raised-threshold window; everything after is plain hash aggs
        adj.count()
    finally:
        if fbt_before is None:
            spark.conf.unset(_FBT)
        else:
            spark.conf.set(_FBT, fbt_before)
    # Re-derive the oriented edge list by EXPLODING the cached adjacency
    # instead of joining oriented back to adj on src: the multiset of
    # (dst, out(src)) rows is identical by construction (adj was built
    # from oriented), so the triangle census needs ONE join (on dst), not
    # two. r13 interleaved A/B: 0.72x alone, 0.66x with the basket
    # fan-out; plan drops a whole join + the oriented cache.
    half = adj.select(F.explode("nbrs").alias("dst"), F.col("nbrs").alias("nu"))
    tri = (
        half.join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nv")),
            "dst",  # inner: a dst with no out-edges closes no triangle
        )
        .select(F.size(F.array_intersect("nu", "nv")).cast("long").alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("value"))
    )

    def _row(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"), F.col("value").cast("long").alias("value"))

    # one agg over deg yields three metrics (n_edges = sum(deg)/2 by the
    # handshake lemma), exploded to rows -- 3x fewer subtree replays than
    # one agg branch per metric
    deg_metrics = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(F.expr("sum(deg) div 2"), F.lit(0)).alias("n_edges"),
        F.coalesce(F.expr("sum((deg * (deg - 1)) div 2)"), F.lit(0)).alias("n_wedges"),
    ).select(
        F.explode(
            F.create_map(
                F.lit("n_nodes"), F.col("n_nodes").cast("long"),
                F.lit("n_edges"), F.col("n_edges").cast("long"),
                F.lit("n_wedges"), F.col("n_wedges").cast("long"),
            )
        ).alias("metric", "value")
    )
    capped = spark.range(1).select(
        F.lit("n_capped_nodes").alias("metric"), F.lit(n_hot).cast("long").alias("value")
    )
    return deg_metrics.unionByName(_row("n_triangles", tri)).unionByName(capped)


SQL_TRIANGLES = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM lp GROUP BY 1 HAVING count(*) <= {BASKET_CAP}),
sm AS (SELECT lp.l_orderkey, lp.l_partkey FROM lp JOIN ok USING (l_orderkey)),
edges0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM sm a JOIN sm b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg0 AS (
  SELECT id, count(*) AS deg
  FROM (SELECT u AS id FROM edges0 UNION ALL SELECT v AS id FROM edges0)
  GROUP BY 1
),
hot AS (SELECT id FROM deg0 WHERE deg > {DEG_CAP}),
edges AS (
  SELECT u, v FROM edges0
  WHERE u NOT IN (SELECT id FROM hot) AND v NOT IN (SELECT id FROM hot)
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
UNION ALL
SELECT 'n_capped_nodes', CAST(count(*) AS BIGINT) FROM hot
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

"""Mining-style analytics: association rules over order baskets, RFM
customer segmentation, and time-decay marketing attribution.

Scale arguments (the shapes that survive 100 TB):

- ``basket_pair_lift`` reuses the triangle census' bounded-basket move:
  pair expansion is C(k,2) in basket size, so baskets over
  ``graph.BASKET_CAP`` distinct parts are dropped BEFORE expansion and
  the whole candidate generation is one groupBy shuffle plus an
  in-codegen ``transform``/``flatten`` over a <= CAP array -- no
  self-join of the exploded item relation, no candidate set that scales
  with the catalog squared. Support counting is a plain hash aggregate
  over the expanded pairs.
- ``rfm_segments`` deliberately avoids the textbook ``ntile(4)`` global
  window: a whole-table ntile is a single-reducer sort at scale. The
  quartile THRESHOLDS are computed in one tiny aggregate (3 doubles per
  metric) and broadcast back with a 1-row crossJoin (the same scalar
  stats-join shape as bm25), so scoring is a map-side comparison --
  embarrassingly parallel, no global sort anywhere.
- ``time_decay_attribution`` is a per-user purchase x touch self-join
  bounded by the 30-day decay window; fan-out per purchase is the
  user's touch count inside the window, never the whole history. The
  join shuffles both sides once on user_id (hot users are the skew
  axis; AQE skew-split handles them, see skew_join_aqe).

Determinism notes: decay weights are dyadic rationals (0.5^age_days,
age integer via pure epoch arithmetic) so per-purchase weight sums are
EXACT in double regardless of addition order; normalized credits are
then single correctly-rounded divisions, identical across engines, and
the final per-channel totals go through DECIMAL(18,9). Lift/confidence
are ratios of integers (same double in both engines) rounded to 6.

Reference parity: beyond-reference surface (SURVEY.md section 2.10's
training-pipeline/event-analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_events, load_table
from ._util import dsum, sql_dsum
from .graph import BASKET_CAP

# --------------------------------------------------------------------------
# basket_pair_lift
# --------------------------------------------------------------------------

MIN_SUPPORT = 2  # pairs seen in fewer baskets than this are noise
TOP_RULES = 200  # bounded, totally-ordered result


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items: for every
    unordered part pair {u, v} co-purchased in >= MIN_SUPPORT orders,
    the support counts, confidence P(v|u) and lift
    P(u,v) / (P(u) P(v)), top-``TOP_RULES`` by support then lift.

    A basket is an order's DISTINCT part set, capped at
    ``BASKET_CAP`` (= graph.BASKET_CAP; identical cap in the oracle) so
    candidate generation is C(cap,2)-bounded per order -- the classic
    a-priori first pass, expressed as one aggregate plus an array
    expansion entirely inside whole-stage codegen. N (the basket
    universe), per-item supports and per-pair supports each come from
    one hash aggregate; the tiny scalar N joins back via broadcast.
    """
    # fan-out REVERTED (r13): r12's same-session A/B read 0.78x but the
    # fresh-process cold A/B (tools/cold_ab.py) read 1.14x and the driver's
    # cold run 0.84x-regressed; the identically-shaped triangle_count
    # basket fan-out also lost cold (1.07x). The two-column projection
    # into a collect_set partial agg doesn't earn the extra Exchange.
    lp = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        lp.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") <= BASKET_CAP)
    )
    baskets = baskets.persist()
    n_baskets = baskets.select(F.count(F.lit(1)).alias("n_baskets"))
    item = (
        baskets.select(F.explode("ps").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pairs = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
    )
    pair_supp = (
        baskets.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.u").alias("part_u"), F.col("e.v").alias("part_v"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= MIN_SUPPORT)
    )
    iu = item.select(F.col("part").alias("part_u"), F.col("n_item").alias("n_u"))
    iv = item.select(F.col("part").alias("part_v"), F.col("n_item").alias("n_v"))
    out = (
        pair_supp.join(iu, "part_u")
        .join(iv, "part_v")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_u",
            "part_v",
            "n_both",
            "n_u",
            "n_v",
            F.round(F.col("n_both") / F.col("n_u"), 6).alias("confidence"),
            F.round(
                F.col("n_both") * F.col("n_baskets") / (F.col("n_u") * F.col("n_v")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("n_both"), F.desc("lift"), "part_u", "part_v"
    ).limit(TOP_RULES)


SQL_BASKET_LIFT = f"""
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS ps
  FROM lineitem GROUP BY l_orderkey
  HAVING count(DISTINCT l_partkey) <= {BASKET_CAP}
),
n AS (SELECT count(*) AS n_baskets FROM baskets),
ex AS (SELECT l_orderkey, unnest(ps) AS part FROM baskets),
item AS (SELECT part, count(*) AS n_item FROM ex GROUP BY part),
pair AS (
  SELECT a.part AS part_u, b.part AS part_v, count(*) AS n_both
  FROM ex a JOIN ex b ON a.l_orderkey = b.l_orderkey AND a.part < b.part
  GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
)
SELECT part_u, part_v, n_both, iu.n_item AS n_u, iv.n_item AS n_v,
       round(n_both / CAST(iu.n_item AS DOUBLE), 6) AS confidence,
       round(n_both * n_baskets / (CAST(iu.n_item AS DOUBLE) * iv.n_item), 6)
         AS lift
FROM pair
JOIN item iu ON pair.part_u = iu.part
JOIN item iv ON pair.part_v = iv.part
CROSS JOIN n
ORDER BY n_both DESC, lift DESC, part_u, part_v
LIMIT {TOP_RULES}
"""


# --------------------------------------------------------------------------
# rfm_segments
# --------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: recency (days between a
    customer's last order and the newest order in the table, pure epoch
    arithmetic), frequency (order count) and monetary (decimal-exact
    total spend), each scored into quartiles 1..4 (4 = best), plus the
    concatenated segment code ("444" = champions).

    Quartile scoring is THRESHOLD-based, not ntile: exact
    ``percentile(metric, {{0.25,0.5,0.75}})`` over the per-customer
    aggregate yields nine scalars broadcast back via a 1-row crossJoin,
    and each customer scores with three comparisons -- map-side,
    no global sort (a whole-table ntile window is a single-reducer sort
    at 100 TB). Ties at a threshold score identically in both engines
    because thresholds interpolate between identical doubles.
    """
    # o_orderdate is TIMESTAMP_NTZ: unix_timestamp() on NTZ is
    # tz-independent (wall clock == instant), so day indices are pure
    # epoch arithmetic under any session timezone.
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_timestamp(o_orderdate) DIV 86400").alias("day"),
        "o_totalprice",
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice"), 2).alias("monetary"),
    )
    ref = per_cust.select(F.max("last_day").alias("ref_day"))
    rfm = per_cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        (F.col("ref_day") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    rfm = rfm.persist()
    th = rfm.select(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias("rq"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias("mq"),
    )

    def _score_low_good(c, q):  # low metric value => high score
        return (
            F.lit(1)
            + (c <= q[2]).cast("int")
            + (c <= q[1]).cast("int")
            + (c <= q[0]).cast("int")
        )

    def _score_high_good(c, q):
        return (
            F.lit(1)
            + (c > q[0]).cast("int")
            + (c > q[1]).cast("int")
            + (c > q[2]).cast("int")
        )

    scored = rfm.crossJoin(F.broadcast(th)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _score_low_good(F.col("recency_days"), F.col("rq")).alias("r_score"),
        _score_high_good(F.col("frequency"), F.col("fq")).alias("f_score"),
        _score_high_good(F.col("monetary"), F.col("mq")).alias("m_score"),
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


SQL_RFM = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(CAST(epoch(o_orderdate) AS BIGINT) // 86400) AS last_day,
         count(*) AS frequency,
         {sql_dsum('o_totalprice', 2)} AS monetary
  FROM orders GROUP BY o_custkey
),
rfm AS (
  SELECT o_custkey,
         (SELECT max(last_day) FROM per_cust) - last_day AS recency_days,
         frequency, monetary
  FROM per_cust
),
th AS (
  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mq
  FROM rfm
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         1 + CAST(recency_days <= rq[3] AS INT) + CAST(recency_days <= rq[2] AS INT)
           + CAST(recency_days <= rq[1] AS INT) AS r_score,
         1 + CAST(frequency > fq[1] AS INT) + CAST(frequency > fq[2] AS INT)
           + CAST(frequency > fq[3] AS INT) AS f_score,
         1 + CAST(monetary > mq[1] AS INT) + CAST(monetary > mq[2] AS INT)
           + CAST(monetary > mq[3] AS INT) AS m_score
  FROM rfm CROSS JOIN th
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""


# --------------------------------------------------------------------------
# time_decay_attribution
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_DAYS = 30
_TOUCH_TYPES = ("click", "view", "signup")


def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every purchase distributes one
    unit of credit over the same user's touch events (click/view/signup)
    in the preceding ``ATTRIBUTION_WINDOW_DAYS``, weighted
    0.5^age_days (half-life one day) and normalized per purchase;
    output is per-channel total credit, touch count, and the number of
    purchases each channel participated in.

    Ages are pure epoch arithmetic (micros DIV day), so a hostile
    session timezone cannot move a touch across a day boundary. The
    0.5^k weights are dyadic rationals: the per-purchase normalizer is
    an EXACT double sum (order-independent), each credit a single
    correctly-rounded division, and the channel totals decimal-summed --
    the whole pipeline is bit-reproducible across engines.
    """
    win_us = ATTRIBUTION_WINDOW_DAYS * _US_PER_DAY
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("p_id"), F.col("us").alias("p_us")
    )
    t = ev.where(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id", F.col("event_type").alias("channel"), F.col("us").alias("t_us")
    )
    j = p.join(
        t,
        (p.user_id == t.user_id)
        & (F.col("t_us") <= F.col("p_us"))
        & (F.col("p_us") - F.col("t_us") < F.lit(win_us)),
    ).select(
        "p_id",
        "channel",
        F.pow(F.lit(0.5), F.expr(f"(p_us - t_us) DIV {_US_PER_DAY}")).alias("w"),
    )
    from pyspark.sql.window import Window

    norm = j.withColumn(
        "credit", F.col("w") / F.sum("w").over(Window.partitionBy("p_id"))
    )
    return norm.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("p_id").alias("n_purchases"),
        dsum(F.col("credit"), 9).alias("credit"),
    )


SQL_TIME_DECAY = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM base
      WHERE event_type = 'purchase'),
t AS (SELECT user_id, event_type AS channel, us AS t_us FROM base
      WHERE event_type IN {str(_TOUCH_TYPES)}),
j AS (
  SELECT p_id, channel,
         power(0.5, CAST((p_us - t_us) // {_US_PER_DAY} AS INT)) AS w
  FROM p JOIN t USING (user_id)
  WHERE t_us <= p_us AND p_us - t_us < {ATTRIBUTION_WINDOW_DAYS * _US_PER_DAY}
),
norm AS (SELECT p_id, channel, w / sum(w) OVER (PARTITION BY p_id) AS credit
         FROM j)
SELECT channel, count(*) AS n_touches, count(DISTINCT p_id) AS n_purchases,
       {sql_dsum('credit', 9)} AS credit
FROM norm GROUP BY channel
"""


# --------------------------------------------------------------------------
# quantile_normalize_by_source
# --------------------------------------------------------------------------

_GRID_POINTS = 101  # percent grid: 0.00, 0.01, ..., 1.00


def quantile_normalize_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources: each
    document's ``n_chars`` is replaced by the GLOBAL length distribution's
    value at the document's within-source percentile, so every source's
    normalized length histogram matches the corpus -- the standard move
    for mixing corpora whose raw length distributions differ (a training
    pipeline normalizing quality/length scores before thresholding).

    Shape: the within-source percentile is one window sort PARTITIONED BY
    source (distributes across sources; no global sort), and the global
    distribution is compressed to a ``_GRID_POINTS``-value equi-spaced
    quantile grid computed in one aggregate and broadcast back via 1-row
    crossJoin; each row then maps through the grid by linear
    interpolation in pure column arithmetic. At 100 TB the grid stays
    101 doubles regardless of data size -- this is exactly how
    distributed quantile normalization avoids a global rank join.

    Determinism: percent_rank with a unique (n_chars, doc_id) order is
    (row_number-1)/(n-1), an identical double in both engines; grid
    interpolation differences between engines are below the output's
    6-decimal rounding.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    probs = ", ".join(f"{i / 100.0!r}" for i in range(_GRID_POINTS))
    grid = d.select(F.expr(f"percentile(n_chars, array({probs}))").alias("g"))
    from pyspark.sql.window import Window

    p = F.percent_rank().over(
        Window.partitionBy("source").orderBy("n_chars", "doc_id")
    )
    r = d.withColumn("p", p).crossJoin(F.broadcast(grid))
    k = F.least(F.floor(F.col("p") * 100).cast("int"), F.lit(_GRID_POINTS - 2))
    frac = F.col("p") * 100 - k
    lo = F.element_at(F.col("g"), k + 1)
    hi = F.element_at(F.col("g"), k + 2)
    return r.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(lo + frac * (hi - lo), 6).alias("norm_chars"),
    )


_SQL_K = f"CAST(least(floor(p * 100), {_GRID_POINTS - 2}) AS INT)"

SQL_QUANTILE_NORMALIZE = f"""
WITH grid AS (
  SELECT quantile_cont(n_chars,
    [{", ".join(f"{i / 100.0!r}" for i in range(_GRID_POINTS))}]) AS g
  FROM documents
),
r AS (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS p
  FROM documents
)
SELECT doc_id, source, n_chars,
       round(g[{_SQL_K} + 1]
             + (p * 100 - {_SQL_K}) * (g[{_SQL_K} + 2] - g[{_SQL_K} + 1]),
             6) AS norm_chars
FROM r CROSS JOIN grid
"""


SKYLINE_PARTS = 8  # range partitions for the parallel prefix-max


def skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline over ``part`` (minimize retail price, maximize
    size): the preference-query operator -- a part is on the skyline iff
    no other part is at most as expensive AND at least as large with one
    strict. Output is every part achieving its price's max size where
    that size strictly beats everything cheaper (ties at the same
    (price, size) are mutually non-dominating and ALL kept).

    Scale shape: the textbook spelling is a running max over a global
    price order -- an empty-PARTITION-BY window, the single-reducer
    cliff. This uses the ``global_row_ids`` two-phase trick instead:
    collapse to one row per price (hash aggregate), range-repartition on
    price, LOCAL running max within each partition, then one
    metadata-scale driver round-trip turns per-partition maxima into
    prefix maxima mapped back as a literal CaseWhen. Skyline condition =
    size > max(local running max, earlier-partitions' prefix max); the
    winning (price, size) pairs (at most |distinct sizes| rows, <= 50
    here) broadcast back onto the fact. Deterministic regardless of
    where range-sampling lands the partition boundaries."""
    from pyspark.sql import Window

    parts = load_table(spark, sf_dir, "part")
    per_price = parts.groupBy("p_retailprice").agg(F.max("p_size").alias("smax"))
    ranged = per_price.repartitionByRange(SKYLINE_PARTS, "p_retailprice").withColumn(
        "pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint()  # pin partitioning: pid must not be recomputed
    w_local = Window.partitionBy("pid").orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = ranged.withColumn("prev_local", F.max("smax").over(w_local))
    pmax = {
        r["pid"]: r["m"]
        for r in ranged.groupBy("pid").agg(F.max("smax").alias("m")).collect()
    }
    prefix, run = {}, None
    for pid in sorted(pmax):
        prefix[pid] = run
        run = pmax[pid] if run is None else max(run, pmax[pid])
    pre_expr = F.lit(None).cast("int")
    for pid, pv in prefix.items():
        pre_expr = F.when(F.col("pid") == pid, F.lit(pv).cast("int")).otherwise(pre_expr)
    bound = F.greatest(
        F.coalesce(F.col("prev_local"), F.lit(-1)), F.coalesce(pre_expr, F.lit(-1))
    )
    sky = local.where(F.col("smax") > bound).select(
        "p_retailprice", F.col("smax").alias("p_size")
    )
    return parts.join(F.broadcast(sky), ["p_retailprice", "p_size"]).select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )


SQL_SKYLINE = """
WITH pp AS (
  SELECT p_retailprice AS price, max(p_size) AS smax FROM part GROUP BY 1
),
sky AS (
  SELECT price, smax FROM (
    SELECT price, smax,
           max(smax) OVER (ORDER BY price
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prevmax
    FROM pp
  ) WHERE prevmax IS NULL OR smax > prevmax
)
SELECT p_partkey, round(p_retailprice, 2) AS price, CAST(p_size AS BIGINT) AS size
FROM part JOIN sky ON p_retailprice = sky.price AND p_size = sky.smax
"""


# --- spatial radius join: the grid-cell decomposition ---
#
# The tables carry no coordinates, so both sides get PLANTED integer
# positions on a 1000x1000 grid (pure modular arithmetic on the keys,
# mirrored verbatim in the oracle -- the planted-positives rule). All
# geometry stays in exact integers: coordinates, cell ids, squared
# distances -- no trig, no floats, so the oracle is bit-exact.
GEO_GRID = 1000
GEO_R = 15
GEO_R2 = GEO_R * GEO_R


def _coords(key, a: int, b: int):
    return ((key * a) % GEO_GRID, (key * b) % GEO_GRID)


def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier count of customers within ``GEO_R`` grid units --
    the spatial radius join, decomposed the way every distributed
    spatial engine does it: snap points to ``GEO_R``-sized grid cells,
    replicate ONE side to its 3x3 cell neighborhood (a 9x fan-out
    bounded by the cell size = radius invariant: any point within R of
    a supplier lies in one of those 9 cells), equi-join on the cell id,
    then verify the exact squared distance. Candidate volume is
    sum-over-cells(|cust_cell| x |supp_neighborhood|), never |cust| x
    |supp| -- the all-pairs cross join a naive radius predicate would
    plan. The oracle brute-forces the same predicate single-node, which
    a test-scale DuckDB legitimately can."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % GEO_GRID).alias("cx"),
        ((F.col("c_custkey") * 91) % GEO_GRID).alias("cy"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53) % GEO_GRID).alias("sx"),
        ((F.col("s_suppkey") * 17) % GEO_GRID).alias("sy"),
    )
    cust = cust.withColumn("gx", F.floor(F.col("cx") / GEO_R)).withColumn(
        "gy", F.floor(F.col("cy") / GEO_R)
    )
    offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    supp9 = supp.select(
        "s_suppkey", "sx", "sy", F.explode(offsets).alias("o")
    ).select(
        "s_suppkey",
        "sx",
        "sy",
        (F.floor(F.col("sx") / GEO_R) + F.col("o.dx")).alias("gx"),
        (F.floor(F.col("sy") / GEO_R) + F.col("o.dy")).alias("gy"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    pairs = (
        cust.join(supp9, ["gx", "gy"])
        .withColumn("d2", d2)
        .where(F.col("d2") <= GEO_R2)
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.min("d2").cast("long").alias("min_dist2"),
    )


SQL_SPATIAL_RADIUS = f"""
WITH cust AS (
  SELECT c_custkey, (c_custkey * 37) % {GEO_GRID} AS cx,
         (c_custkey * 91) % {GEO_GRID} AS cy
  FROM customer
),
supp AS (
  SELECT s_suppkey, (s_suppkey * 53) % {GEO_GRID} AS sx,
         (s_suppkey * 17) % {GEO_GRID} AS sy
  FROM supplier
)
SELECT s_suppkey, count(*) AS n_nearby,
       CAST(min((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS BIGINT)
           AS min_dist2
FROM cust JOIN supp
  ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {GEO_R2}
GROUP BY s_suppkey
"""


def register(reg: Registry) -> None:
    reg.add(
        "skyline_2d",
        skyline_2d,
        SQL_SKYLINE,
        "Pareto skyline (price vs size) via parallel two-phase prefix max",
    )
    reg.add(
        "spatial_radius_join",
        spatial_radius_join,
        SQL_SPATIAL_RADIUS,
        "grid-cell radius join: 3x3 neighborhood equi-join + exact integer verify",
    )
    reg.add(
        "basket_pair_lift",
        basket_pair_lift,
        SQL_BASKET_LIFT,
        "market-basket pair support/confidence/lift, capped expansion",
    )
    reg.add(
        "rfm_segments",
        rfm_segments,
        SQL_RFM,
        "RFM quartile segmentation via broadcast thresholds (no global sort)",
    )
    reg.add(
        "time_decay_attribution",
        time_decay_attribution,
        SQL_TIME_DECAY,
        "half-life time-decay multi-touch attribution, dyadic-exact weights",
    )
    reg.add(
        "quantile_normalize_by_source",
        quantile_normalize_by_source,
        SQL_QUANTILE_NORMALIZE,
        "per-source quantile normalization onto the global length distribution",
    )

"""Data-quality / migration-validation operators: order-independent table
content checksums and a categorical-association (chi-squared) profile.

``table_checksum`` is the operator a user runs on BOTH sides of an engine
migration (exactly this repo's correctness story, made available to the
user): every row is rendered to one canonical string, hashed, and the
hashes summed -- sums commute, so the checksum is independent of partition
count, task order, and file layout, and two engines agree iff the row
multisets agree. The canonical rendering is the part that has to be
pinned: doubles go through fixed-scale decimals (binary-float-to-text is
NOT engine-portable), timestamps through integer epochs.

The reference has no validation tooling at all (its parity story is "run
the job twice"); this is beyond-reference operability surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table
from ._rebalance import fan_out_table
from ._util import dec_fw, enc_fw

# 15 hex digits = 60 bits: fits signed 64-bit on both engines with headroom;
# the sum of 2^60-bounded terms over any realistic row count fits DECIMAL(38,0).
HEX_DIGITS = 15


def _hash60(col: Column) -> Column:
    """Lower-60-bit integer slice of md5, identical on both engines."""
    return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10).cast("long")


def _sql_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


def _canon_str(c: Column) -> Column:
    """Injective canonical render of a string field: escape the escape
    char and the field separator, then map NULL to the unescapable
    sentinel ``\\N`` (a real "\\N" value escapes to "\\\\N", so the
    sentinel can never collide -- the classic dump-format contract).
    Without this, rows differing only in WHICH field is NULL, or
    containing '|' in a value, would collide to one checksum."""
    esc = F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit("|"), F.lit("\\|"))
    return F.coalesce(esc, F.lit("\\N"))


def _canon_num(c: Column) -> Column:
    """Numeric/epoch fields cannot contain separator bytes; NULL-sentinel
    only."""
    return F.coalesce(c, F.lit("\\N"))


def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of ``orders`` and ``customer``:
    one row per table with (table_name, n_rows, checksum).

    Shape: pure map + one global sum per table -- no shuffle beyond the
    final 1-row aggregate (partial sums combine map-side), so it scans at
    IO speed regardless of cluster size and never moves data. That is the
    property that makes it usable as a routine post-migration /
    post-compaction invariant at 100 TB, where a sort-based comparison
    would be a full-table shuffle.

    Canonical row rendering is INJECTIVE: string fields are escaped
    (``_canon_str``) and NULLs become a distinct sentinel in every field,
    so two rows hash alike iff they are equal; doubles go through
    DECIMAL(18,2) (exact for money columns; binary float text would
    diverge between engines), dates through epoch seconds."""
    o = load_table(spark, sf_dir, "orders")
    o_canon = F.concat_ws(
        "|",
        _canon_num(F.col("o_orderkey").cast("string")),
        _canon_num(F.col("o_custkey").cast("string")),
        _canon_str(F.col("o_orderstatus")),
        _canon_num(F.col("o_totalprice").cast("decimal(18,2)").cast("string")),
        _canon_num(F.unix_timestamp("o_orderdate").cast("string")),
        _canon_str(F.col("o_orderpriority")),
    )
    c = load_table(spark, sf_dir, "customer")
    c_canon = F.concat_ws(
        "|",
        _canon_num(F.col("c_custkey").cast("string")),
        _canon_str(F.col("c_name")),
        _canon_num(F.col("c_nationkey").cast("string")),
        _canon_num(F.col("c_acctbal").cast("decimal(18,2)").cast("string")),
        _canon_str(F.col("c_mktsegment")),
    )

    def _sum(df: DataFrame, canon: Column, name: str) -> DataFrame:
        return (
            df.select(_hash60(canon).alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("h").cast("decimal(38,0)")).alias("checksum_dec"),
            )
            # checksum travels as its canonical decimal STRING: a 2^60-term
            # sum overflows int64, and DECIMAL(38,0) reaches pandas as
            # float64 from DuckDB but Decimal from Spark -- the string is
            # the only representation both engines render identically
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                F.col("checksum_dec").cast("string").alias("checksum"),
            )
        )

    return _sum(o, o_canon, "orders").unionByName(_sum(c, c_canon, "customer"))


# DuckDB twins of _canon_str/_canon_num: single-quoted strings are literal
# (no backslash escapes), so '\' is one backslash and '\\' is two.
def _dk_str(expr: str) -> str:
    return rf"coalesce(replace(replace({expr}, '\', '\\'), '|', '\|'), '\N')"


def _dk_num(expr: str) -> str:
    return rf"coalesce({expr}, '\N')"


def _sql_canon_orders() -> str:
    return (
        "concat_ws('|', "
        + _dk_num("CAST(o_orderkey AS VARCHAR)") + ", "
        + _dk_num("CAST(o_custkey AS VARCHAR)") + ", "
        + _dk_str("o_orderstatus") + ", "
        + _dk_num("CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)") + ", "
        + _dk_num("CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR)") + ", "
        + _dk_str("o_orderpriority") + ")"
    )


def _sql_canon_customer() -> str:
    return (
        "concat_ws('|', "
        + _dk_num("CAST(c_custkey AS VARCHAR)") + ", "
        + _dk_str("c_name") + ", "
        + _dk_num("CAST(c_nationkey AS VARCHAR)") + ", "
        + _dk_num("CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)") + ", "
        + _dk_str("c_mktsegment") + ")"
    )


SQL_TABLE_CHECKSUM = f"""
SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM({_sql_hash60(_sql_canon_orders())}) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM orders
UNION ALL
SELECT 'customer', CAST(count(*) AS BIGINT),
       CAST(CAST(SUM({_sql_hash60(_sql_canon_customer())}) AS DECIMAL(38,0)) AS VARCHAR)
FROM customer
"""


# (column, kind) specs for profile_table.  min/max run on the NATIVE type
# (string min would be lexicographic over display text for dates), then
# render through the same canonical forms the checksum uses: decimals for
# doubles, integer epochs for timestamps, 7-byte prefixes for strings.
_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_quantity", "dec2"),
    ("l_extendedprice", "dec2"),
    ("l_returnflag", "str7"),
    ("l_shipdate", "epoch"),
)

# DuckDB canonical-render twins, keyed by kind ({m} = min(col)/max(col))
_DK_FMT = {
    "int": "CAST({m} AS VARCHAR)",
    "dec2": "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)",
    "str7": "substring({m}, 1, 7)",
    "epoch": "CAST(CAST(floor(epoch({m})) AS BIGINT) AS VARCHAR)",
}


# string min/max ride the shared enc_fw/dec_fw fixed-width surrogate
# (see _util.py): 7 bytes here -- safe for ARBITRARY strings, where the
# 8-byte variant needs an ASCII first byte.


def _enc7(c: Column) -> Column:
    return enc_fw(c, 7)


def _dec7(m: Column) -> Column:
    return dec_fw(m, 7)


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over ``lineitem`` -- the first command a data
    engineer runs against an unfamiliar table: one row per column with
    null count, EXACT distinct count, and canonical-string min/max.

    Shape: ONE scan, ONE HashAggregate. All per-column aggregates run in a
    single ``agg``; the multi-column exact count-distincts compile to one
    Expand (a 6-way row replication) feeding a shared two-phase aggregate,
    which is the documented price of exactness -- the
    approx_count_distinct variant drops the Expand entirely (see
    ``approx_distinct_users``) and is what a 100 TB profile would use for
    the distinct column only. String columns aggregate over the ``_enc7``
    fixed-width surrogate (var-width values in the buffer would demote the
    whole agg to SortAggregate) and so report min/max as a <=7-byte
    prefix: exact for code/flag columns like this one, and truthfully a
    prefix for free text -- which is what a profile needs from a text
    column. The wide 1-row result is reshaped long with ``stack``
    (row-local, no extra shuffle). The DuckDB oracle is the per-column
    UNION ALL with the same canonical renders.

    The scan fans out first (guide section 2.5): the 6-way Expand and
    the distinct-map partial aggregates are the heaviest map side in the
    relational family, and a single-row-group input would otherwise run
    all of it on one task."""
    li = fan_out_table(
        load_table(spark, sf_dir, "lineitem").select(
            *[name for name, _ in _PROFILE_COLS]
        ),
        sf_dir,
        "lineitem",
    )

    def _minmax(name: str, kind: str, agg_fn):  # -> Column (canonical string)
        c = F.col(name)
        if kind == "str7":
            return _dec7(agg_fn(_enc7(c)))
        if kind == "dec2":
            return agg_fn(c).cast("decimal(18,2)").cast("string")
        if kind == "epoch":
            return F.unix_timestamp(agg_fn(c)).cast("string")
        return agg_fn(c).cast("string")

    aggs, stack_args = [], []
    for i, (name, kind) in enumerate(_PROFILE_COLS):
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).alias(f"nn{i}"),
            F.countDistinct(name).alias(f"nd{i}"),
            _minmax(name, kind, F.min).alias(f"mn{i}"),
            _minmax(name, kind, F.max).alias(f"mx{i}"),
        ]
        stack_args.append(f"'{name}', nn{i}, nd{i}, mn{i}, mx{i}")
    wide = li.agg(*aggs)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)})"
        " as (column_name, n_nulls, n_distinct, min_s, max_s)"
    )


SQL_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS column_name,
       CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {_DK_FMT[kind].format(m=f"min({name})")} AS min_s,
       {_DK_FMT[kind].format(m=f"max({name})")} AS max_s
FROM lineitem"""
    for name, kind in _PROFILE_COLS
)


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared association between the ``documents`` table's two
    categorical columns (lang x source) -- the standard "are these fields
    independent?" data-profiling statistic: one output row with the cell
    count, degrees of freedom, and the chi-squared statistic.

    Determinism: observed / marginal counts are integers; each cell's
    ``(obs - exp)^2 / exp`` is a handful of IEEE double ops on identical
    integer inputs (bit-identical across engines), and the cross-cell SUM
    -- the only order-dependent step -- goes through an exact
    DECIMAL(18,6) per-cell rounding, so partition order cannot move the
    total. Shape: one groupBy for cells, two tiny marginal aggregates
    joined back broadcast-style, a few dozen rows after the first
    aggregate -- at 100 TB the only full-data pass is the cell count."""
    # NULL lang/source rows are excluded on BOTH engines: Spark's groupBy
    # would keep NULL as a category while the oracle's count(DISTINCT)
    # drops it, silently skewing dof if the corpus ever has NULLs
    d = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source")
        .where(F.col("lang").isNotNull() & F.col("source").isNotNull())
    )
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    rowt = cells.groupBy("lang").agg(F.sum("obs").alias("r"))
    colt = cells.groupBy("source").agg(F.sum("obs").alias("c"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    cell_chi = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    joined = (
        cells.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
    )
    nl = rowt.agg(F.count(F.lit(1)).alias("v"))
    ns = colt.agg(F.count(F.lit(1)).alias("v"))
    stats = joined.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(cell_chi.cast("decimal(18,6)")).cast("double").alias("chi2"),
    )
    return (
        stats.crossJoin(F.broadcast(nl.select(F.col("v").alias("n_langs"))))
        .crossJoin(F.broadcast(ns.select(F.col("v").alias("n_sources"))))
        .select(
            "n_cells",
            ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).alias("dof"),
            F.round("chi2", 6).alias("chi2"),
        )
    )


SQL_CHI2 = """
WITH docs AS (
  SELECT lang, source FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
),
cells AS (SELECT lang, source, count(*) AS obs FROM docs GROUP BY 1, 2),
rowt AS (SELECT lang, SUM(obs) AS r FROM cells GROUP BY 1),
colt AS (SELECT source, SUM(obs) AS c FROM cells GROUP BY 1),
tot AS (SELECT SUM(obs) AS n FROM cells),
cellchi AS (
  SELECT CAST((obs - r * c / n) * (obs - r * c / n) / (r * c / n)
              AS DECIMAL(18,6)) AS chi
  FROM cells JOIN rowt USING (lang) JOIN colt USING (source), tot
)
SELECT CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
       CAST((SELECT (count(DISTINCT lang) - 1) FROM docs) *
            (SELECT (count(DISTINCT source) - 1) FROM docs) AS BIGINT) AS dof,
       round(CAST(SUM(chi) AS DOUBLE), 6) AS chi2
FROM cellchi
"""


# (relation label, child table, child FK col, parent table, parent PK col)
_FK_RELATIONS = (
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the schema's declared FK edges:
    one row per relationship with the child count, ORPHANS (child rows
    whose key has no parent -- must be 0 on healthy data; any other number
    is the post-ingest red flag this report exists to raise), and
    CHILDLESS PARENTS (parents no child references -- legitimately nonzero:
    TPC-H leaves ~1/3 of customers orderless, so the report's values are
    exercised, not vacuously zero).

    Shape per edge: two anti-joins on the key -- Spark broadcasts the
    parent side where it is small and falls back to a shuffled hash anti
    join where it is not, and an anti join's output stops at the FIRST
    match per row, so cost is one build + one probe pass per edge. The
    distinct-key prepass on the child side keeps the anti join's probe
    proportional to key cardinality, not child rows."""
    rows = None
    for label, child_t, fk, parent_t, pk in _FK_RELATIONS:
        child = load_table(spark, sf_dir, child_t).select(F.col(fk).cast("long").alias("k"))
        parent = load_table(spark, sf_dir, parent_t).select(F.col(pk).cast("long").alias("k"))
        n_child = child.agg(F.count(F.lit(1)).alias("n_child"))
        orphans = (
            child.select("k").distinct().join(parent, "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphan_keys"))
        )
        childless = parent.join(child.select("k").distinct(), "k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_childless_parents")
        )
        row = (
            n_child.crossJoin(F.broadcast(orphans))
            .crossJoin(F.broadcast(childless))
            .select(
                F.lit(label).alias("relation"),
                "n_child",
                "n_orphan_keys",
                "n_childless_parents",
            )
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


SQL_FK_REPORT = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS relation,
       CAST((SELECT count(*) FROM {child_t}) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM (SELECT DISTINCT {fk} AS k FROM {child_t}) c
             WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p WHERE p.{pk} = c.k)) AS BIGINT)
         AS n_orphan_keys,
       CAST((SELECT count(*) FROM {parent_t} p
             WHERE NOT EXISTS (SELECT 1 FROM {child_t} c WHERE c.{fk} = p.{pk})) AS BIGINT)
         AS n_childless_parents"""
    for label, child_t, fk, parent_t, pk in _FK_RELATIONS
)


LINREG_X_BASE = 1_704_067_200  # 2024-01-01: centering keeps x^2 sums small


def groupwise_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ordinary-least-squares fit of ``value`` against
    time -- "is this metric drifting?" asked per group, the scalable way:
    OLS over (x, y) needs only the five classic sums (n, Sx, Sy, Sxy,
    Sxx), all ALGEBRAIC -- they partial-aggregate map-side and merge, so
    the whole regression is one two-phase aggregate pass, no per-group
    value collection (contrast the exact-median UDAF above it in the
    registry, which documents the non-mergeable case).

    Determinism: x is integer seconds centered on a constant epoch (keeps
    Sxx ~ 1e19 at a month's range -- far inside DECIMAL(38,0)); y sums go
    through DECIMAL(18,6). Both engines therefore hold IDENTICAL exact
    sums, and slope/intercept are a fixed sequence of double ops on those
    sums, rounded to 6. The DuckDB twin spells out the same sums rather
    than calling regr_slope (whose internal accumulation order is not
    contracted)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_timestamp("ts") - LINREG_X_BASE).cast("long").alias("x"),
        "value",
    )
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sy"),
        F.sum((F.col("x") * F.col("value")).cast("decimal(38,6)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    return sums.select(
        "event_type",
        "n",
        F.round(slope * 86_400, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


SQL_LINREG = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) - {LINREG_X_BASE} AS x, value
  FROM events
),
sums AS (
  SELECT event_type, count(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(value AS DECIMAL(18,6))) AS sy,
         SUM(CAST(x * value AS DECIMAL(38,6))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
  FROM ev GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400, 6)
         AS slope_per_day,
       round((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM sums
"""


Z_THRESH = 3.0  # |z| at or above this is reported


def outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier report: events whose ``value`` sits
    ``Z_THRESH`` population standard deviations or more from their
    event_type's mean -- the first-pass anomaly screen of a metrics
    pipeline.

    Two-pass shape that scales: (1) one mergeable aggregate computes the
    per-group moment sums (n, sum(x), sum(x^2)) -- map-side partials, 5
    groups; (2) the 5-row stats frame broadcast-joins back onto the event
    scan, so the fact table is read twice but never shuffled. Determinism
    across engines: the moment sums ride exact DECIMAL accumulation
    (order-independent), and mean/variance/z are then a fixed sequence of
    double ops on identical inputs -- so even the >= threshold comparison
    lands identically. Population (not sample) variance, computed as
    E[x^2] - E[x]^2 from the exact sums."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    # Zero-variance guard: a constant-valued group would give z = 0/0 =
    # NaN, and Spark's NaN-is-largest ordering would then report EVERY
    # row as an outlier (DuckDB differs -> cross-engine divergence). The
    # guard is on VAR, not sd: float rounding can push var of a constant
    # group slightly negative, where sqrt -> NaN and `NaN > 0` is TRUE
    # under Spark's NaN semantics -- var > 0 is false in both engines.
    stats = stats.where(var > 0).select(
        "event_type", mean.alias("mean"), F.sqrt(var).alias("sd")
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) >= Z_THRESH)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("z"),
        )
    )


SQL_OUTLIER_Z = f"""
WITH s AS (
  SELECT event_type, count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS s2
  FROM events GROUP BY 1
),
st AS (
  SELECT event_type, s1 / n AS mean, sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sd
  FROM s
  WHERE s2 / n - (s1 / n) * (s1 / n) > 0  -- zero-variance guard, see Spark side
)
SELECT event_id, user_id, event_type, round(value, 6) AS value,
       round((value - mean) / sd, 6) AS z
FROM events JOIN st USING (event_type)
WHERE abs((value - mean) / sd) >= {Z_THRESH}
"""


def register(reg: Registry) -> None:
    reg.add(
        "outlier_zscore",
        outlier_zscore,
        SQL_OUTLIER_Z,
        "per-group z-score outliers from exact moment sums + broadcast stats",
    )
    reg.add(
        "table_checksum",
        table_checksum,
        SQL_TABLE_CHECKSUM,
        "order-independent canonical-row content checksum (migration check)",
    )
    reg.add(
        "profile_table",
        profile_table,
        SQL_PROFILE,
        "one-scan column profile: nulls, exact distincts, canonical min/max",
    )
    reg.add(
        "fk_integrity_report",
        fk_integrity_report,
        SQL_FK_REPORT,
        "referential-integrity audit: orphans + childless parents per FK edge",
    )
    reg.add(
        "groupwise_linreg",
        groupwise_linreg,
        SQL_LINREG,
        "per-group OLS drift fit from mergeable exact sums (one pass)",
    )
    reg.add(
        "chi2_lang_source",
        chi2_lang_source,
        SQL_CHI2,
        "chi-squared lang x source association profile (decimal-exact sum)",
    )

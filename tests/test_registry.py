"""Fast (no-Spark) invariants of the driver contract: the registry is the
product surface, so its internal consistency gets its own guards --
a silently-dropped priority name or an oracle keyed to a missing query
would only surface as a confusing driver-side diff otherwise."""

from __future__ import annotations

import duckdb
import pytest

from big_data_assignment2_spark.registry import _PRIORITY, build_registry

REG = build_registry()

# the only operators allowed to ship without a DuckDB oracle, and why
ROWS_ONLY_ALLOWED = {
    "minhash_cols_fast",  # DuckDB has no xxhash64; value-verified via minhash_lsh_pairs_fast
    "approx_distinct_users",  # HLL estimates are sketch-implementation-specific
    # GK-sketch values equal exact quantiles only below ~sf0.17; the
    # scale-proof value check is percentiles_approx_rank_check
    "percentiles_by_flag_approx",
    # DataSketches HLL estimates are sketch-implementation-specific;
    # 5%-error-bound + union-overlap property test in test_properties.py
    "hll_union_by_source",
    # CMS sketch layout is implementation-specific; estimates bounded in
    # [exact, exact + eps*N] by the property test
    "cms_partkey_counts",
}


def test_every_oracle_keys_a_query():
    assert set(REG.oracles()) <= set(REG.fns())


def test_rows_only_set_is_exactly_the_documented_exceptions():
    rows_only = set(REG.fns()) - set(REG.oracles())
    assert rows_only == ROWS_ONLY_ALLOWED, rows_only


def test_priority_names_all_exist():
    """A typo in _PRIORITY silently demotes the query to the unordered
    tail -- outside the driver's 50-query verification window."""
    missing = set(_PRIORITY) - set(REG.queries)
    assert not missing, f"_PRIORITY names not in registry: {sorted(missing)}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_registration_order_follows_priority():
    """The driver evaluates in registration order; the dict must lead
    with _PRIORITY's order exactly."""
    names = list(REG.queries)
    assert names[: len(_PRIORITY)] == [n for n in _PRIORITY if n in REG.queries]


@pytest.mark.parametrize("name", sorted(REG.oracles()))
def test_oracle_sql_parses_in_duckdb(name):
    """Catch SQL-dialect slips (unsupported functions, brace-template
    leftovers) without running Spark: every oracle must at least PREPARE
    against empty tables of the driver's schema."""
    con = duckdb.connect()
    for t, cols in {
        "region": "r_regionkey INT, r_name VARCHAR",
        "nation": "n_nationkey INT, n_name VARCHAR, n_regionkey INT",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, s_acctbal DOUBLE",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR,"
        " p_size INT, p_retailprice DOUBLE",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR,"
        " l_linestatus VARCHAR, l_shipdate TIMESTAMP",
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }.items():
        con.execute(f"CREATE TABLE {t} ({cols})")
    con.execute(REG.oracles()[name])  # empty tables: must parse + run
    con.close()


def test_bench_scaled_dir_replicates_faithfully(spark, sf_dir, monkeypatch, tmp_path):
    """The bench's 10x scale-check harness must replicate faithfully:
    factor x rows, keys still distinct (offsets can't collide), schema
    unchanged -- otherwise the scale ratios measure a broken corpus."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    out = bench._build_scaled_dir(spark, sf_dir, 3)
    from big_data_assignment2_spark.sources.catalog import load_table

    for tbl, key in (
        ("lineitem", None),
        ("documents", "doc_id"),
        ("events", "event_id"),
        ("embeddings", "vec_id"),
    ):
        src = load_table(spark, sf_dir, tbl)
        rep = load_table(spark, out, tbl)
        assert rep.count() == 3 * src.count(), tbl
        assert rep.schema == src.schema, tbl
        if key:
            assert rep.select(key).distinct().count() == 3 * src.count(), tbl

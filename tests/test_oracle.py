"""Every registered query with an oracle must match DuckDB on the same
parquet tables -- the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from big_data_assignment2_spark.registry import build_registry

from ._compare import compare, duck_connection

REG = build_registry()
ORACLED = sorted(n for n, q in REG.queries.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REG.queries.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, spark, sf_dir, duck):
    q = REG.queries[name]
    diff = compare(q.fn(spark, sf_dir), duck, q.oracle)
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = REG.queries[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

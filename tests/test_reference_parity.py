"""Reference-corpus parity (SURVEY.md section 5): the three app.sh smoke
queries over the reference's own 1000-file fixture corpus, value-checked
against a DuckDB oracle reading the same files."""

from __future__ import annotations

import os

import duckdb
import pytest

from big_data_assignment2_spark.sources import reference_corpus as rc
from tests._compare import compare

pytestmark = pytest.mark.skipif(
    not os.path.isdir(rc.REFERENCE_DATA_DIR), reason="reference fixture absent"
)


def test_corpus_loads(spark):
    docs = rc.load_reference_corpus(spark)
    assert docs.columns == ["doc_id", "title", "text"]
    n = docs.count()
    assert n == 1000
    # doc_id parsed from every filename, no blanks
    assert docs.where("doc_id = '' OR doc_id IS NULL").count() == 0


@pytest.mark.parametrize("name,query", sorted(rc.SMOKE_QUERIES.items()))
def test_smoke_query_matches_oracle(spark, name, query):
    con = duckdb.connect()
    diff = compare(
        rc.reference_search(spark, query),
        con,
        rc.sql_bm25(query, docs_cte=rc.sql_reference_docs_cte()),
    )
    assert diff is None, diff


def test_ranking_shape(spark):
    rows = rc.reference_search(spark, "big data analytics").collect()
    assert [r["rank"] for r in rows] == list(range(1, 11))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)

"""Persisted-index engine facade (SURVEY.md section 7 step 2): build_index
-> parquet layout -> load_index -> bucket-pruned search, vs both the
in-memory flagship and the DuckDB oracle."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_spark import engine
from big_data_assignment2_spark.operators import index_build, search as search_ops
from tests._compare import compare, duck_connection


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    docs = index_build.documents_with_title(spark, sf_dir)
    engine.build_index(docs, d, n_buckets=8)
    return d


def test_index_layout(spark, index_dir):
    idx = engine.load_index(spark, index_dir)
    assert set(idx.inverted_index.columns) == {"term", "doc_id", "tf", "term_bucket"}
    assert set(idx.vocab.columns) == {"term", "doc_freq"}
    assert set(idx.doc_stats.columns) == {"doc_id", "title", "length"}
    meta = {r["key"]: r["value"] for r in idx.meta.collect()}
    # meta values persisted as strings (reference load_index.py:101-111
    # quirk); n_buckets persisted so search derives the bucket layout
    assert set(meta) == {"total_docs", "avg_dl", "n_buckets"}
    assert meta["n_buckets"] == "8"
    assert float(meta["avg_dl"]) > 0
    # every posting's bucket is crc32(term) % n
    bad = idx.inverted_index.where(
        F.col("term_bucket") != F.pmod(F.crc32("term"), F.lit(8))
    ).count()
    assert bad == 0


def test_bucket_pruning_reaches_scan(spark, index_dir):
    """The physical plan must carry the term_bucket partition filter, so the
    parquet source prunes bucket directories (Cassandra partition-key
    analog)."""
    plan = engine.search(spark, index_dir, "data model")._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan


def test_persisted_matches_inmemory(spark, sf_dir, index_dir):
    got = {
        tuple(r)
        for r in engine.search(spark, index_dir, search_ops.DEFAULT_QUERY).collect()
    }
    want = {tuple(r) for r in search_ops.bm25_search(spark, sf_dir).collect()}
    assert got == want


def test_persisted_matches_oracle(spark, sf_dir, index_dir):
    con = duck_connection(sf_dir)
    diff = compare(
        engine.search(spark, index_dir, search_ops.DEFAULT_QUERY),
        con,
        search_ops.sql_bm25(),
    )
    assert diff is None, diff


def test_python_bucket_matches_spark(spark):
    terms = ["data", "model", "zebra", "q7", "1", ""]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", engine.term_bucket_col("term", 64).alias("b")).collect()
    for r in rows:
        assert r["b"] == zlib.crc32(r["term"].encode()) % 64


def test_append_then_delete_composes(spark, sf_dir, tmp_path):
    """The maintenance ops must COMPOSE: build on one slice, append a
    second, delete a third -- the searchable state must equal a
    from-scratch index of exactly the surviving documents (same top-k,
    same scores). Registry queries cover append and delete separately;
    this covers the lifecycle a real index lives through."""
    d_lifecycle = str(tmp_path / "lifecycle")
    d_fresh = str(tmp_path / "fresh")
    docs = index_build.documents_with_title(spark, sf_dir)
    even = docs.where(F.col("doc_id").cast("long") % 2 == 0)
    odd = docs.where(F.col("doc_id").cast("long") % 2 == 1)
    doomed = docs.where(F.col("doc_id").cast("long") % 5 == 0).select("doc_id")

    engine.build_index(even, d_lifecycle, n_buckets=8)
    engine.append_to_index(odd, d_lifecycle)
    engine.delete_from_index(doomed, d_lifecycle)

    survivors = docs.where(F.col("doc_id").cast("long") % 5 != 0)
    engine.build_index(survivors, d_fresh, n_buckets=8)

    got = engine.search(spark, d_lifecycle, "spark query window merge").collect()
    want = engine.search(spark, d_fresh, "spark query window merge").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0

"""Unit + property tests for the text/BM25 building blocks
(SURVEY.md section 5 test strategy: tf >= 1, sum(tf) per doc == doc length,
df <= N, idf monotone-decreasing in df)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_assignment2_spark.functions.text import tokenize_query
from big_data_assignment2_spark.operators import index_build, search


def test_tokenize_query_matches_reference_cleaning():
    assert tokenize_query("Big-Data, ANALYTICS!") == ["big", "data", "analytics"]
    assert tokenize_query("dup dup dup") == ["dup"]  # de-duplicated
    assert tokenize_query("  ") == []
    assert tokenize_query("a1b2;c3") == ["a1b2", "c3"]


def test_edge_documents(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello, WORLD! hello"),
            (2, ""),
            (3, "!!! ... ---"),
            (4, "tab\there\nnewline"),
        ],
        "doc_id long, text string",
    )
    from big_data_assignment2_spark.functions.text import tokenize, tokens

    tok = tokenize(docs).groupBy("doc_id").agg(F.collect_list("term").alias("t"))
    got = {r["doc_id"]: r["t"] for r in tok.collect()}
    assert got[1] == ["hello", "world", "hello"]
    assert 2 not in got and 3 not in got  # empty/punct-only docs vanish
    assert got[4] == ["tab", "here", "newline"]
    lengths = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    assert lengths == {1: 3, 2: 0, 3: 0, 4: 3}


def test_index_invariants(spark, sf_dir):
    inv = index_build.inverted_index(spark, sf_dir).cache()
    ds = index_build.doc_stats(spark, sf_dir)
    n_docs = ds.count()

    assert inv.where(F.col("tf") < 1).count() == 0
    # sum(tf) per doc == doc length
    sums = inv.groupBy("doc_id").agg(F.sum("tf").alias("s"))
    mism = sums.join(ds, "doc_id").where(F.col("s") != F.col("length")).count()
    assert mism == 0
    # df <= N and df >= 1
    voc = index_build.vocab(spark, sf_dir)
    assert voc.where((F.col("doc_freq") < 1) | (F.col("doc_freq") > n_docs)).count() == 0
    inv.unpersist()


def test_idf_monotone():
    from big_data_assignment2_spark.functions.bm25 import SQL_SCORE  # noqa: F401

    def idf(n, df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    vals = [idf(1000, d) for d in (1, 2, 10, 100, 999)]
    assert vals == sorted(vals, reverse=True)
    assert all(v > 0 for v in vals)


def test_bm25_flagship_shape(spark):
    df = search.bm25_search(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert [f.name for f in df.schema.fields] == ["rank", "doc_id", "title", "score"]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # absent term ('zzz') must not crash or contribute (df=0 drop, P5)


def test_documents_payloads_are_ascii(spark, sf_dir):
    """The multimodal frame-sample oracle slices characters (DuckDB substr)
    while the Spark side slices utf-8 bytes; they agree only while the
    fixture text is pure ASCII (DuckDB cannot substr BLOBs, so a byte-level
    oracle is not expressible). Assert the assumption so a non-ASCII
    regeneration of testdata fails loudly here instead of as an opaque
    value-hash mismatch."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.where(
        F.octet_length(F.encode("text", "utf-8")) != F.length("text")
    ).count()
    assert non_ascii == 0

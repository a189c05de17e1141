"""Randomized BM25 query fuzz: the flagship must match the oracle for
ARBITRARY queries, not just the fixed DEFAULT_QUERY the registry checks --
mixed casing, punctuation noise, unicode (stripped by normalization),
duplicate terms, out-of-vocabulary terms, and multi-term mixes of real
corpus vocabulary. Seeded, so failures reproduce."""

from __future__ import annotations

import random

from big_data_assignment2_spark.functions.text import tokenize_query
from big_data_assignment2_spark.operators import index_build
from big_data_assignment2_spark.operators import search as search_ops
from tests._compare import compare, duck_connection


def test_bm25_random_queries_match_oracle(spark, sf_dir):
    vocab = sorted(
        r["term"] for r in index_build.vocab(spark, sf_dir).select("term").collect()
    )
    assert vocab, "corpus vocabulary unexpectedly empty"
    junk = ["zzz", "qqq7", "ünïcödé", "data-base", "42", "ZZTOP!"]
    rng = random.Random(42)
    queries = []
    for _ in range(8):
        terms = rng.sample(vocab, min(rng.randint(1, 5), len(vocab)))
        terms += rng.sample(junk, rng.randint(0, 2))
        terms += [terms[0]]  # duplicate term: must contribute once
        rng.shuffle(terms)
        q = " ".join(t.upper() if rng.random() < 0.3 else t for t in terms)
        queries.append(q)
    con = duck_connection(sf_dir)
    try:
        for q in queries:
            assert tokenize_query(q), q
            diff = compare(
                search_ops.bm25_search(spark, sf_dir, q),
                con,
                search_ops.sql_bm25(q),
            )
            assert diff is None, (q, diff)
    finally:
        con.close()


def test_bm25_persisted_random_queries_match_oracle(spark, sf_dir, tmp_path):
    """Same fuzz against the PERSISTED index: random term sets must
    survive the crc32 bucket pruning (a pruning bug silently drops
    postings, which the value hash catches)."""
    from big_data_assignment2_spark import engine

    d = str(tmp_path / "fuzz_index")
    engine.build_index(index_build.documents_with_title(spark, sf_dir), d, n_buckets=8)
    vocab = sorted(
        r["term"] for r in index_build.vocab(spark, sf_dir).select("term").collect()
    )
    rng = random.Random(7)
    con = duck_connection(sf_dir)
    try:
        for _ in range(4):
            terms = rng.sample(vocab, min(rng.randint(1, 4), len(vocab))) + ["zzz"]
            q = " ".join(terms)
            diff = compare(engine.search(spark, d, q), con, search_ops.sql_bm25(q))
            assert diff is None, (q, diff)
    finally:
        con.close()


def test_bm25_no_valid_terms_returns_empty(spark, sf_dir):
    """A query normalizing to zero terms (all punctuation/whitespace)
    returns an empty top-k, not an error -- the CLI edge a real user
    hits."""
    assert tokenize_query("?!... --- !!!") == []
    rows = search_ops.bm25_search(spark, sf_dir, "?!... --- !!!").collect()
    assert rows == []

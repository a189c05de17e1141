"""Engine facade: persisted index + search, the reference's index/query
split (SURVEY.md section 7 step 2).

The reference materializes four Cassandra tables (``app/load_index.py:20-53``)
and its query engine scans them with ``isin(query_terms)`` filters that prune
via Cassandra's ``PRIMARY KEY (term, doc_id)`` partition key
(``app/query.py:48-50``, ``load_index.py:35-41``). Here the same split is
Parquet-native:

- ``inverted_index`` is written **partitioned by a term-hash bucket**
  (``term_bucket = crc32(term) % n_buckets``). A query computes its terms'
  buckets driver-side (zlib.crc32 == Spark's ``F.crc32``, both the IEEE
  polynomial) and filters on the partition column, so the scan touches only
  the matching bucket directories — directory-level pruning, the moral
  equivalent of Cassandra's partition-key lookup. Within a bucket the
  ``term IN (...)`` predicate pushes down to parquet row groups.
- At 100 TB the bucket count scales with index size (buckets stay
  ~file-sized); hot terms spread across row groups within their bucket and
  the scan stays pruned to ``len(query_terms)`` directories regardless of
  corpus size.
- ``meta`` stores ``total_docs`` / ``avg_dl`` **as strings**, faithful to the
  reference's quirk (``load_index.py:101-111``), and ``search`` parses them
  back like ``query.py:37-38`` — but keeps them in a 1-row DataFrame
  (broadcast at join time) instead of driver-collected globals.
"""

from __future__ import annotations

import zlib
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import tokenize_query
from .operators import index_build, search as search_ops

N_TERM_BUCKETS = 64


class IndexTables(NamedTuple):
    """The four persisted index tables (reference ``load_index.py:20-53``)."""

    doc_stats: DataFrame
    inverted_index: DataFrame
    vocab: DataFrame
    meta: DataFrame


def term_bucket_col(term, n_buckets: int = N_TERM_BUCKETS) -> F.Column:
    return F.pmod(F.crc32(F.col(term) if isinstance(term, str) else term), F.lit(n_buckets))


def term_bucket_py(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Driver-side twin of :func:`term_bucket_col` (same CRC-32)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def build_index(
    docs: DataFrame, index_dir: str, n_buckets: int = N_TERM_BUCKETS
) -> None:
    """Materialize the four index tables under *index_dir* (replaces the
    reference's MapReduce -> getmerge -> Cassandra-batch pipeline, S6/S7,
    with direct parquet writes)."""
    inverted = index_build.inverted_from_docs(docs)
    (
        inverted.withColumn("term_bucket", term_bucket_col("term", n_buckets))
        # one shuffle keyed by the partition column so each bucket directory
        # gets one writer task (no small-file explosion at high parallelism)
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_dir}/inverted_index")
    )
    # vocab/doc_stats re-read the persisted postings rather than recomputing
    # the tokenize shuffle a second time.
    spark = docs.sparkSession
    persisted = spark.read.parquet(f"{index_dir}/inverted_index")
    index_build.vocab_from_inverted(persisted).write.mode("overwrite").parquet(
        f"{index_dir}/vocab"
    )
    ds = index_build.doc_stats_from_docs(docs)
    ds.write.mode("overwrite").parquet(f"{index_dir}/doc_stats")
    stats = index_build.corpus_stats_agg(spark.read.parquet(f"{index_dir}/doc_stats"))
    # n_buckets is part of the index layout: persist it so search derives
    # the bucket function from the index itself (a build/search mismatch
    # would silently prune away every matching posting).
    meta = stats.select(
        F.explode(
            F.create_map(
                F.lit("total_docs"), F.col("total_docs").cast("string"),
                F.lit("avg_dl"), F.col("avg_dl").cast("string"),
                F.lit("n_buckets"), F.lit(str(n_buckets)),
            )
        ).alias("key", "value")
    )
    meta.write.mode("overwrite").parquet(f"{index_dir}/meta")


def append_to_index(new_docs: DataFrame, index_dir: str) -> None:
    """Incremental index maintenance: add *new_docs* WITHOUT reindexing
    the existing corpus (the reference can only rebuild from scratch --
    its MapReduce+Cassandra pipeline has no append path).

    What appends vs what rewrites is the whole design:

    - **postings** (the corpus-sized table) are strictly append-only --
      the new docs' postings land as extra files inside the existing
      ``term_bucket=`` directories (same layout invariant, read from the
      index's own meta), so the append costs one tokenize pass over ONLY
      the new documents;
    - **doc_stats** (row per doc) appends the new rows;
    - **vocab** (df per term) and **meta** (N, avg_dl) are derived
      GLOBAL statistics -- appending changes every BM25 idf, so they are
      recomputed from the persisted tables and rewritten. They are
      term-cardinality- and 3-row-sized: at 100 TB this rewrite is noise
      next to re-tokenizing the corpus, which is exactly what this path
      avoids.

    Search needs no changes: it reads the same four tables and sees the
    merged corpus -- verified by the oracle computing BM25 over the full
    corpus in one shot (``bm25_search_incremental``)."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{index_dir}/meta")
    row = meta.where(F.col("key") == "n_buckets").select("value").collect()
    n_buckets = int(row[0]["value"]) if row else N_TERM_BUCKETS
    inverted_new = index_build.inverted_from_docs(new_docs)
    (
        inverted_new.withColumn("term_bucket", term_bucket_col("term", n_buckets))
        .repartition("term_bucket")
        .write.mode("append")
        .partitionBy("term_bucket")
        .parquet(f"{index_dir}/inverted_index")
    )
    index_build.doc_stats_from_docs(new_docs).write.mode("append").parquet(
        f"{index_dir}/doc_stats"
    )
    # derived global stats: recompute from persisted state, rewrite
    persisted = spark.read.parquet(f"{index_dir}/inverted_index")
    index_build.vocab_from_inverted(persisted).write.mode("overwrite").parquet(
        f"{index_dir}/vocab"
    )
    stats = index_build.corpus_stats_agg(spark.read.parquet(f"{index_dir}/doc_stats"))
    new_meta = stats.select(
        F.explode(
            F.create_map(
                F.lit("total_docs"), F.col("total_docs").cast("string"),
                F.lit("avg_dl"), F.col("avg_dl").cast("string"),
                F.lit("n_buckets"), F.lit(str(n_buckets)),
            )
        ).alias("key", "value")
    )
    new_meta.write.mode("overwrite").parquet(f"{index_dir}/meta")


def delete_from_index(doc_ids: DataFrame, index_dir: str) -> None:
    """Tombstone deletes: the other half of incremental maintenance.

    The corpus-sized tables (postings, doc_stats) are NOT rewritten --
    deleting by rewrite would re-shuffle the whole index for any delete
    batch. Instead the doc ids append to a ``tombstones`` table that
    search anti-joins (broadcast -- tombstone sets are tiny relative to
    an index worth keeping), and the derived global statistics are
    corrected immediately: per-term df recomputed from the live postings
    view (one postings scan, no tokenize) and N / avg_dl from the live
    doc_stats view. Stats correctness is NOT deferred to compaction --
    BM25 idf must reflect the live corpus or every score drifts
    (verified: post-delete search hash-equals a from-scratch index of
    the surviving docs). A background compaction that rewrites buckets
    and clears tombstones is the eventual-space story; it changes no
    query result, so it is out of scope here."""
    spark = doc_ids.sparkSession
    meta = spark.read.parquet(f"{index_dir}/meta")
    row = meta.where(F.col("key") == "n_buckets").select("value").collect()
    n_buckets = int(row[0]["value"]) if row else N_TERM_BUCKETS
    (
        doc_ids.select(F.col("doc_id").cast("string").alias("doc_id"))
        .write.mode("append")
        .parquet(f"{index_dir}/tombstones")
    )
    tomb = spark.read.parquet(f"{index_dir}/tombstones")
    live_postings = spark.read.parquet(f"{index_dir}/inverted_index").join(
        F.broadcast(tomb), "doc_id", "left_anti"
    )
    index_build.vocab_from_inverted(live_postings).write.mode("overwrite").parquet(
        f"{index_dir}/vocab"
    )
    live_stats = spark.read.parquet(f"{index_dir}/doc_stats").join(
        F.broadcast(tomb), "doc_id", "left_anti"
    )
    stats = index_build.corpus_stats_agg(live_stats)
    new_meta = stats.select(
        F.explode(
            F.create_map(
                F.lit("total_docs"), F.col("total_docs").cast("string"),
                F.lit("avg_dl"), F.col("avg_dl").cast("string"),
                F.lit("n_buckets"), F.lit(str(n_buckets)),
            )
        ).alias("key", "value")
    )
    new_meta.write.mode("overwrite").parquet(f"{index_dir}/meta")


def _tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The tombstone table if any deletes happened, else None."""
    try:
        return spark.read.parquet(f"{index_dir}/tombstones")
    except Exception:  # noqa: BLE001 - no tombstone dir -> never deleted
        return None


def load_index(spark: SparkSession, index_dir: str) -> IndexTables:
    """S2: the four index tables back as DataFrames."""
    return IndexTables(
        doc_stats=spark.read.parquet(f"{index_dir}/doc_stats"),
        inverted_index=spark.read.parquet(f"{index_dir}/inverted_index"),
        vocab=spark.read.parquet(f"{index_dir}/vocab"),
        meta=spark.read.parquet(f"{index_dir}/meta"),
    )


def search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 top-k over the **persisted** index (reference ``query.py``
    lifecycle, SURVEY.md section 3.2): bucket-pruned postings scan, broadcast
    vocab, meta-derived stats, one job.

    ``n_buckets`` defaults to the value persisted in the index's meta
    table at build time (passing a different one would prune to the wrong
    directories and silently return no hits)."""
    idx = load_index(spark, index_dir)
    if n_buckets is None:
        row = idx.meta.where(F.col("key") == "n_buckets").select("value").collect()
        n_buckets = int(row[0]["value"]) if row else N_TERM_BUCKETS
    terms = tokenize_query(query)
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    postings = idx.inverted_index.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    ).drop("term_bucket")
    # tombstone mask AFTER bucket+term pruning: the anti join runs over
    # only the query's postings, broadcast against the (tiny) delete set.
    # vocab/meta were corrected at delete time, so masking the postings
    # is the only search-side change deletes need.
    tomb = _tombstones(spark, index_dir)
    if tomb is not None:
        postings = postings.join(F.broadcast(tomb), "doc_id", "left_anti")
    # meta strings -> numbers, as query.py:37-38 does with float();
    # stays a 1-row DataFrame that broadcasts into the scoring join.
    stats = idx.meta.agg(
        F.max(F.when(F.col("key") == "total_docs", F.col("value")))
        .cast("long")
        .alias("n_docs"),
        F.max(F.when(F.col("key") == "avg_dl", F.col("value")))
        .cast("double")
        .alias("avg_dl"),
    )
    return search_ops.bm25_rank_with_stats(
        postings, idx.vocab, idx.doc_stats, stats, query, k
    )

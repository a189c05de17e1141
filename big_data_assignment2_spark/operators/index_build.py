"""Index-build operators: the reference's two MapReduce jobs + loader
(``app/mapreduce/mapper1.py``/``reducer1.py``: doc stats + global
aggregates; ``mapper2.py``/``reducer2.py``: inverted index with TF and DF;
``app/load_index.py``: the four index tables), re-expressed as DataFrame
aggregations.

Where the reference shuffles **every token occurrence** to reducers with no
combiner (``mapper2.py:12-18``), Spark's two-phase HashAggregate combines
map-side first, so shuffle volume is bounded by distinct ``(term, doc)``
pairs per partition -- the difference between shipping 100 TB of tokens
and shipping the index. The single-reducer global-aggregate hack
(``-D mapreduce.job.reduces=1``, ``app/index.sh:26``) is replaced by a
regular two-phase global agg.

``doc_id`` is emitted as string, matching the reference's Cassandra DDL
(``app/load_index.py:29,37``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    SQL_CLEAN_TEXT,
    SQL_TOKENS,
    clean_text,
    clean_title,
    safe_filename,
    tokenize,
    tokens,
)
from ..registry import Registry
from ..sources.catalog import load_table
from ._util import davg

def sql_docs_cte_over(docs_select: str) -> str:
    """Index-shaped DuckDB CTE chain (docs -> doc_stats/tok/inverted/vocab)
    over any subquery yielding ``(doc_id, title, text)``."""
    return f"""
WITH docs AS (
  SELECT doc_id, title, {SQL_TOKENS.format(col='text')} AS toks
  FROM ({docs_select})
),
doc_stats AS (
  SELECT doc_id, title, CAST(len(toks) AS BIGINT) AS length FROM docs
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
inverted AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
vocab AS (SELECT term, count(*) AS doc_freq FROM inverted GROUP BY term)
"""


# Shared CTE prefix for every index-shaped oracle on the driver's
# synthetic `documents` table.
SQL_DOCS_CTE = sql_docs_cte_over(
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
    " 'doc_' || CAST(doc_id AS VARCHAR) AS title, text FROM documents"
)


def documents_with_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus as the engine sees it: string doc_id + derived title
    (the driver's ``documents`` table has no title column -- FIXTURES.md).

    Deliberately NOT fanned out (see operators/_rebalance.py): this
    frame mostly feeds tokenize -> groupBy chains whose map side is
    cheap enough that an interleaved A/B measured the extra exchange as
    a net LOSS (bm25_search 1.31x, inverted_index 1.22x); the heavy
    per-row consumers (lang_id, text_quality, simhash, ...) fan out at
    their own roots instead."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("title"),
        "text",
    )


def inverted_from_docs(docs: DataFrame) -> DataFrame:
    """A2 over any ``(doc_id, title, text)`` frame: TF per (term, doc)."""
    return tokenize(docs).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def vocab_from_inverted(inverted: DataFrame) -> DataFrame:
    """A3: document frequency per term (doc_id is distinct per term post-A2)."""
    return inverted.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))


def doc_stats_from_docs(docs: DataFrame) -> DataFrame:
    """A4 over any ``(doc_id, title, text)`` frame: per-doc token count."""
    return docs.select(
        "doc_id", "title", F.size(tokens("text")).cast("long").alias("length")
    )


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F1/F2: derived clean_text / clean_title columns
    (reference ``prepare_data.py:22-34``)."""
    docs = documents_with_title(spark, sf_dir)
    return docs.select(
        "doc_id",
        clean_text("text").alias("clean_text"),
        clean_title("title").alias("clean_title"),
    )


SQL_CORPUS_CLEAN = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       {SQL_CLEAN_TEXT.format(col='text')} AS clean_text,
       regexp_replace('doc_' || CAST(doc_id AS VARCHAR), '[\\t\\n]', ' ', 'g') AS clean_title
FROM documents
"""


def tokenize_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: one row per token occurrence (reference ``mapper2.py:12-18``)."""
    docs = documents_with_title(spark, sf_dir)
    return tokenize(docs)


SQL_TOKENIZE = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       unnest({SQL_TOKENS.format(col='text')}) AS term
FROM documents
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: term frequency per (term, doc) (reference ``reducer2.py:11-52``)."""
    return inverted_from_docs(documents_with_title(spark, sf_dir))


SQL_INVERTED = SQL_DOCS_CTE + "SELECT term, doc_id, tf FROM inverted"


def vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: document frequency per term (reference ``reducer2.py`` DF path)."""
    return vocab_from_inverted(inverted_index(spark, sf_dir))


SQL_VOCAB = SQL_DOCS_CTE + "SELECT term, doc_freq FROM vocab"


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-doc whitespace token count + title
    (reference ``mapper1.py:13-18``, ``load_index.py:27-30``)."""
    return doc_stats_from_docs(documents_with_title(spark, sf_dir))


SQL_DOC_STATS = SQL_DOCS_CTE + "SELECT doc_id, title, length FROM doc_stats"


def corpus_stats_agg(
    doc_stats_df: DataFrame, n_alias: str = "total_docs", avg_alias: str = "avg_dl"
) -> DataFrame:
    """THE total-docs + average-doc-length aggregate (unrounded), shared
    by corpus_stats, BM25 ranking, and the persisted-index build so the
    decimal-sum determinism idiom lives in exactly one place."""
    return doc_stats_df.agg(
        F.count(F.lit(1)).alias(n_alias),
        davg(F.col("length"), 6).alias(avg_alias),
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: global total_docs + avg_dl, a regular two-phase aggregate instead
    of the reference's single-reducer sentinel-key hack
    (``reducer1.py:31-37``)."""
    return corpus_stats_agg(doc_stats(spark, sf_dir)).select(
        "total_docs", F.round("avg_dl", 6).alias("avg_dl")
    )


SQL_CORPUS_STATS = SQL_DOCS_CTE + """
SELECT count(*) AS total_docs,
       round(CAST(SUM(CAST(length AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_dl
FROM doc_stats
"""


def tsv_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F4: the ``id\\ttitle\\ttext`` line corpus the reference writes to
    HDFS ``/index/data`` (``prepare_data.py:52-55``)."""
    docs = documents_with_title(spark, sf_dir)
    return docs.select(
        F.concat_ws("\t", "doc_id", "title", clean_text("text")).alias("line")
    )


SQL_TSV = f"""
SELECT CAST(doc_id AS VARCHAR) || chr(9) || 'doc_' || CAST(doc_id AS VARCHAR)
       || chr(9) || {SQL_CLEAN_TEXT.format(col='text')} AS line
FROM documents
"""


def doc_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/S4: ``<doc_id>_<safe_title>.txt`` per-document export names
    (reference ``prepare_data.py:36-50``); the engine keeps this as a column,
    not a driver-side file loop."""
    docs = documents_with_title(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.concat(
            F.col("doc_id"), F.lit("_"), safe_filename("title"), F.lit(".txt")
        ).alias("filename"),
    )


SQL_FILENAMES = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(doc_id AS VARCHAR) || '_' ||
       substr(regexp_replace('doc_' || CAST(doc_id AS VARCHAR), '[^A-Za-z0-9]+', '_', 'g'), 1, 50)
       || '.txt' AS filename
FROM documents
"""


def register(reg: Registry) -> None:
    reg.add("corpus_clean", corpus_clean, SQL_CORPUS_CLEAN, "F1/F2 text cleaning")
    reg.add("tokenize_explode", tokenize_explode, SQL_TOKENIZE, "A1 tokenize flatMap")
    reg.add("inverted_index", inverted_index, SQL_INVERTED, "A2 TF per (term,doc)")
    reg.add("vocab", vocab, SQL_VOCAB, "A3 doc_freq per term")
    reg.add("doc_stats", doc_stats, SQL_DOC_STATS, "A4 doc lengths")
    reg.add("corpus_stats", corpus_stats, SQL_CORPUS_STATS, "A5 global N/avg_dl")
    reg.add("tsv_export", tsv_export, SQL_TSV, "S3 TSV line corpus")
    reg.add("doc_filenames", doc_filenames, SQL_FILENAMES, "F8 safe filenames")

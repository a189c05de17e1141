"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``AlexeyShulmin/big-data-assignment2``
(a BM25 full-text search engine: Parquet ingest -> text cleaning ->
inverted index with TF/DF -> BM25 top-k ranking), re-expressed as an
idiomatic Spark DataFrame/SQL library, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, windowed event analytics, multimodal plumbing).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.

Layout
------
- ``session``      SparkSession factory (AQE on, UTC, arrow)
- ``sources``      table catalog, reference-corpus loader, index sinks
- ``functions``    column-expression building blocks (text, bm25, vectors, hashing)
- ``operators``    DataFrame->DataFrame operators (index build, search,
                   relational primitives, dedup, similarity, text stats,
                   windows, multimodal)
- ``plans``        explain/plan-inspection helpers
- ``streaming``    Structured Streaming variants of the event analytics
"""

__version__ = "0.1.0"

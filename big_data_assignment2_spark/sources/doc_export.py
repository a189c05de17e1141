"""S4: physical per-document file export -- one ``<doc_id>_<safe_title>.txt``
file per document, holding its cleaned text.

The reference does this with a driver-side loop: ``collect()`` every
document, write a local file, shell out to ``hdfs dfs -put`` per doc
(``app/prepare_data.py:36-50``). Here the writes happen **inside the
executors** via ``foreachPartition`` -- no driver collect, no per-file
subprocess, and the write parallelism is the DataFrame's partitioning. On a
cluster, point ``out_dir`` at a shared filesystem (NFS / fuse-mounted
object store), or swap ``open()`` for ``pyarrow.fs`` to target HDFS/S3
directly; the operator shape is identical.

The registered query is the full roundtrip: export to a scratch directory,
read the files back (wholetext source), and return per-file
``(doc_id, filename, content_md5, n_chars)`` -- which the DuckDB oracle
recomputes from the ``documents`` table alone, so a missing, misnamed, or
corrupted file is a value-hash mismatch, not just a count drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_CLEAN_TEXT, clean_text, safe_filename
from ..operators.index_build import documents_with_title
from ..registry import Registry


def export_documents(docs: DataFrame, out_dir: str) -> None:
    """Write one text file per document (columns ``doc_id, title, text``)
    under *out_dir*, named ``<doc_id>_<safe_title>.txt`` and containing the
    cleaned text -- the reference's export, distributed."""
    rows = docs.select(
        F.concat(
            F.col("doc_id"), F.lit("_"), safe_filename("title"), F.lit(".txt")
        ).alias("filename"),
        clean_text("text").alias("content"),
    )

    def write_partition(it) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for r in it:
            with open(os.path.join(out_dir, r["filename"]), "w", encoding="utf-8") as f:
                f.write(r["content"] or "")

    rows.foreachPartition(write_partition)


_EXPORTED: dict[str, str] = {}  # in-process memo of completed exports


def ensure_exported(spark: SparkSession, sf_dir: str) -> str:
    """Run the export (once per process) and return its directory --
    separated from the read-back so bench.py times write vs read."""
    import shutil

    from ..operators._util import scratch_root, scratch_slug

    if sf_dir not in _EXPORTED:
        out_dir = f"{scratch_root()}/docs_{scratch_slug(sf_dir)}"
        shutil.rmtree(out_dir, ignore_errors=True)  # no stale files from prior runs
        export_documents(documents_with_title(spark, sf_dir), out_dir)
        _EXPORTED[sf_dir] = out_dir
    return _EXPORTED[sf_dir]


def doc_file_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export + read-back roundtrip over the ``documents`` table.

    The read-back is **manifest-driven**: the directory listing (driver
    side, one listdir) becomes a DataFrame of filenames, and an
    Arrow-batched ``mapInPandas`` kernel opens and hashes each file in the
    executors. Spark's JVM file sources (``text``/``binaryFile``) pay
    ~70 ms of per-file stream overhead on tiny files -- 12+ s for this
    5000-file corpus at sf0.1 -- while the manifest kernel does the same
    read in ~1 s. This is also the honest at-scale shape: massive
    small-file corpora are read from an object-store manifest, not from
    a glob (and per-doc files are the *reference's* layout, kept for S4
    parity -- a 100 TB pipeline stores docs in parquet, as every other
    operator here does)."""
    import os as _os

    out_dir = ensure_exported(spark, sf_dir)
    manifest = spark.createDataFrame(
        [(n,) for n in _os.listdir(out_dir) if n.endswith(".txt")],
        "filename string",
    ).repartition(spark.sparkContext.defaultParallelism)

    def read_files(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            md5s, lens = [], []
            for fn in pdf["filename"]:
                with open(_os.path.join(out_dir, fn), "rb") as f:
                    data = f.read()
                md5s.append(_hashlib.md5(data).hexdigest())
                lens.append(len(data.decode("utf-8")))
            yield _pd.DataFrame(
                {"filename": pdf["filename"], "content_md5": md5s, "n_chars": lens}
            )

    raw = manifest.mapInPandas(
        read_files, "filename string, content_md5 string, n_chars long"
    )
    return raw.select(
        F.regexp_extract("filename", r"^(\d+)_", 1).alias("doc_id"),
        "filename",
        "content_md5",
        "n_chars",
    )


_CLEAN = SQL_CLEAN_TEXT.format(col="text")
# coalesce to '' AFTER cleaning: the Spark writer emits an empty file for
# a NULL text (`r["content"] or ""`), so the oracle must hash/measure the
# empty string too, not propagate NULL through md5/length
_CONTENT = f"coalesce({_CLEAN}, '')"

SQL_DOC_FILE_EXPORT = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(doc_id AS VARCHAR) || '_' ||
       substr(regexp_replace('doc_' || CAST(doc_id AS VARCHAR), '[^A-Za-z0-9]+', '_', 'g'), 1, 50)
       || '.txt' AS filename,
       md5({_CONTENT}) AS content_md5,
       CAST(length({_CONTENT}) AS BIGINT) AS n_chars
FROM documents
"""


def register(reg: Registry) -> None:
    reg.add(
        "python_datasource_textdir",
        python_datasource_textdir,
        SQL_DOC_FILE_EXPORT,
        "Spark 4 Python Data Source: partition-planned text-dir connector",
    )
    reg.add(
        "doc_file_export",
        doc_file_export,
        SQL_DOC_FILE_EXPORT,
        "S4 per-document .txt export + read-back roundtrip",
    )


def python_datasource_textdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc text corpus exposed through Spark 4's **Python Data
    Source API** -- the pluggable-connector surface (``DataSource`` /
    ``DataSourceReader`` / ``InputPartition``): the reader lists the
    directory once at PLANNING time (driver-side, metadata-sized), chunks
    the file list into balanced ``InputPartition``s, and each executor
    task opens only its own chunk -- the same manifest-driven shape as
    ``doc_file_export``, but packaged as a first-class source any query
    can ``spark.read.format(...)`` against. IO stays minimal in Python
    (read bytes); hashing and length run JVM-side on the returned
    column.

    Classes are defined inside this function so cloudpickle ships them
    by value (the registered source is pickled to executors; a
    module-level class would pickle by reference and break under the
    driver's runtime sys.path).

    Oracle: same full per-file reconstruction as ``doc_file_export``
    (filename, md5, length recomputed from the documents table alone).
    """
    import os as _os

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    out_dir = ensure_exported(spark, sf_dir)

    class _Chunk(InputPartition):
        def __init__(self, files: list) -> None:
            self.files = files

    class _TextDirReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.path = options["path"]
            self.n_parts = int(options.get("numPartitions", "16"))

        def partitions(self):
            files = sorted(
                n for n in _os.listdir(self.path) if n.endswith(".txt")
            )
            k = max(1, len(files) // self.n_parts + (len(files) % self.n_parts > 0))
            return [_Chunk(files[i : i + k]) for i in range(0, len(files), k)]

        def read(self, part):
            for fn in part.files:
                with open(_os.path.join(self.path, fn), "rb") as f:
                    data = f.read()
                yield (fn, data.decode("utf-8"))

    class _TextDirSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "textdir"

        def schema(self) -> str:
            return "filename STRING, content STRING"

        def reader(self, schema):
            return _TextDirReader(self.options)

    spark.dataSource.register(_TextDirSource)
    raw = (
        spark.read.format("textdir")
        .option("path", out_dir)
        .option("numPartitions", "16")
        .load()
    )
    return raw.select(
        F.regexp_extract("filename", r"^(\d+)_", 1).alias("doc_id"),
        "filename",
        F.md5(F.encode("content", "UTF-8")).alias("content_md5"),
        F.length("content").cast("long").alias("n_chars"),
    )

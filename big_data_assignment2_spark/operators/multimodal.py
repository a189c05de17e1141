"""Multimodal-column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, and run decode/feature-extraction
as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio libraries, so the decode step is STUBBED
(deterministic md5-derived fake features; a real decoder slots into
``_decode_payload``). The Spark-side plumbing -- schema, batch shape,
partitioning -- is real and tested: this is exactly how a 100 TB
image-dedup/feature pipeline is laid out (binary parquet columns, narrow
mapInPandas, no shuffle until the feature join).

The driver's tables have no binary column, so payloads are derived from
``documents.text`` utf-8 bytes; the operator contract is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Registry
from ..sources.catalog import load_table

FEATURE_DIM = 4


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length, content
    hash, and a modality tag. Pure Column ops -- fully oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


SQL_MULTIMODAL_META = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    ``mapInPandas`` keeps the decode embarrassingly parallel: each Arrow
    batch is decoded in-process with zero shuffle; downstream consumers
    join on doc_id. A real pipeline emits ``array<float>`` features; the
    registered shape flattens them to scalar columns so the stub decode
    path sits under the full value-hash gate (the md5-derived stub is
    reproducible in SQL -- hex-slice -> int -> /2^32 is exact in both
    engines, divisions by 2^32 are lossless in doubles).

    The closure is deliberately self-contained (local imports, no
    module-level references) so cloudpickle ships it by value -- executor
    Python workers must not need this package importable on their own
    sys.path.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    feature_dim = FEATURE_DIM

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def decode_payload(payload: bytes) -> list[float]:
            # STUB decoder. A real pipeline would decode image/audio here
            # (PIL / torchaudio / ffmpeg) and emit model features; none of
            # those libraries exist in this container, so features are a
            # deterministic function of the content hash -- same shape,
            # same determinism guarantees, swappable implementation.
            try:
                import PIL.Image  # noqa: F401  # pragma: no cover

                raise NotImplementedError("real image decode not wired up yet")
            except ImportError:
                digest = _hashlib.md5(payload).digest()
                return [
                    int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
                    for i in range(feature_dim)
                ]

        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_payload(bytes(p)))
            out = {"doc_id": pdf["doc_id"]}
            for i in range(feature_dim):
                out[f"f{i}"] = feats.map(lambda v, i=i: v[i])
            out["n_frames"] = pdf["payload"].map(len) // 100 + 1
            yield _pd.DataFrame(out)

    schema = "doc_id bigint, " + ", ".join(
        f"f{i} double" for i in range(FEATURE_DIM)
    ) + ", n_frames bigint"
    return docs.mapInPandas(decode_batches, schema=schema)


SQL_MULTIMODAL_FEATURES = (
    "SELECT doc_id, "
    + ", ".join(
        f"CAST(CAST('0x' || substr(md5(text), {i * 8 + 1}, 8) AS BIGINT) AS DOUBLE)"
        f" / 4294967296 AS f{i}"
        for i in range(FEATURE_DIM)
    )
    + ", CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames"
    + " FROM documents"
)


FRAME_BYTES = 100  # stub "frame" size
FRAME_STRIDE = 2  # sample every 2nd frame


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads: one row in, one row out per
    sampled fixed-size byte chunk (every ``FRAME_STRIDE``-th frame) --
    the 1->N expansion shape of real video frame extraction, as a narrow
    ``mapInPandas`` with zero shuffle. A real decoder replaces the
    byte-slice with actual frame decode; an md5-per-chunk keeps the stub
    under the full value-hash gate. The fingerprint is md5 of the chunk's
    UPPERCASE HEX (not the raw bytes): DuckDB's md5 only accepts VARCHAR,
    so hashing the hex form is the one encoding both engines can compute
    byte-exactly for ANY payload, including non-UTF8 binary and non-ASCII
    text -- no character-slice == byte-slice assumption."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 2)  # the 'video' modality slice
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    frame_bytes, frame_stride = FRAME_BYTES, FRAME_STRIDE

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, frame_stride):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    fp = _hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    rows.append((int(doc_id), idx, fp, len(chunk)))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "frame_len"]
            )

    return docs.mapInPandas(
        sample_batches,
        schema="doc_id bigint, frame_idx bigint, frame_md5 string, frame_len bigint",
    )


SQL_FRAME_SAMPLE = f"""
WITH v AS (SELECT doc_id, hex(encode(text)) AS h FROM documents WHERE doc_id % 3 = 2),
idx AS (
  SELECT doc_id, h,
         unnest(range(0, (length(h) // 2 + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                      {FRAME_STRIDE})) AS frame_idx
  FROM v
)
SELECT doc_id, frame_idx,
       md5(substr(h, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES})) AS frame_md5,
       CAST(length(substr(h, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES})) // 2
            AS BIGINT) AS frame_len
FROM idx
"""


def register(reg: Registry) -> None:
    reg.add("multimodal_meta", multimodal_meta, SQL_MULTIMODAL_META, "binary payload metadata")
    reg.add(
        "multimodal_features",
        multimodal_features,
        SQL_MULTIMODAL_FEATURES,
        "stubbed decode via mapInPandas, hex-slice oracle",
    )
    reg.add(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        SQL_FRAME_SAMPLE,
        "1->N frame sampling via mapInPandas",
    )

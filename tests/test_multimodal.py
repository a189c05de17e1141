"""The frame-sample fingerprint must be byte-exact between engines for
NON-ASCII payloads -- the Spark kernel slices utf-8 bytes while DuckDB's
substr slices characters, so both sides fingerprint the chunk's hex form
(the one representation both can hash). This pins that equivalence on
multi-byte text, which the driver's ASCII fixtures never exercise."""

from __future__ import annotations

import duckdb

from big_data_assignment2_spark.operators.multimodal import (
    SQL_FRAME_SAMPLE,
    multimodal_frame_sample,
)

from ._compare import compare


def test_frame_sample_nonascii_byte_exact(spark, tmp_path):
    rows = [
        (2, "héllo wörld — naïve façade " * 20, "de", "web", 0),
        (5, "日本語のテキストです。" * 40, "ja", "web", 0),
        (8, "mixed ascii then ünïcödé tail " * 15, "en", "web", 0),
    ]  # doc_id % 3 == 2 -> all land in the 'video' modality slice
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    try:
        diff = compare(
            multimodal_frame_sample(spark, str(tmp_path)), con, SQL_FRAME_SAMPLE
        )
        assert diff is None, diff
    finally:
        con.close()

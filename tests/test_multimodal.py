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


# --- BMP codec (functions/imaging.py) ---------------------------------------


def test_bmp_golden_bytes():
    """Encode a hand-checkable 2x2 image and verify the exact file bytes:
    54-byte headers, bottom-up row order, BGR channel order, rows padded
    from 6 to 8 bytes. A correct-looking roundtrip can hide a symmetric
    encode/decode bug; golden bytes cannot."""
    import struct

    import numpy as np

    from big_data_assignment2_spark.functions.imaging import bmp_codec

    encode_bmp, _ = bmp_codec()
    # top-down RGB: (0,0)=red (1,0)... rows: [[red, green], [blue, white]]
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    data = encode_bmp(arr)
    assert len(data) == 14 + 40 + 16
    assert data[:2] == b"BM"
    assert struct.unpack("<I", data[2:6])[0] == 70  # file size
    assert struct.unpack("<I", data[10:14])[0] == 54  # pixel offset
    hdr = struct.unpack("<IiiHHIIiiII", data[14:54])
    assert hdr[0] == 40 and hdr[1] == 2 and hdr[2] == 2  # header size, w, h
    assert hdr[3] == 1 and hdr[4] == 24 and hdr[5] == 0  # planes, bpp, no compression
    # bottom row first (blue, white), BGR order, 2 pad bytes per row
    assert data[54:62] == bytes([255, 0, 0, 255, 255, 255, 0, 0])
    # then the top row (red, green)
    assert data[62:70] == bytes([0, 0, 255, 0, 255, 0, 0, 0])


def test_bmp_roundtrip_all_paddings():
    """decode(encode(x)) == x for every row-padding remainder and
    non-square shapes (incl. width 1)."""
    import numpy as np

    from big_data_assignment2_spark.functions.imaging import bmp_codec

    encode_bmp, decode_bmp = bmp_codec()
    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 13, 16):
        for h in (1, 3, 8):
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = decode_bmp(encode_bmp(arr))
            assert out.shape == (h, w, 3)
            assert (out == arr).all(), (w, h)


def test_bmp_decode_rejects_garbage():
    import pytest

    from big_data_assignment2_spark.functions.imaging import bmp_codec

    _, decode_bmp = bmp_codec()
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JUNKJUNKJUNK" * 10)
    encode_bmp, _ = bmp_codec()
    import numpy as np

    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-5])

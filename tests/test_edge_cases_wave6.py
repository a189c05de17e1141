"""Analytic edge cases for the round-6 final-wave operators.

The oracle sweep proves cross-engine equality on the REAL corpus, whose
documents are all multi-char, multi-distinct prose -- it never exercises
the boundary arms of the sorted-run-length form (a single run, a run of
length 1 at each end, the empty-text guard). These cases have entropy
values known in closed form, so a wrong slice/sentinel shows up as a
wrong NUMBER, not just a cross-engine diff.
"""

from __future__ import annotations

import math

from big_data_assignment2_spark.operators.textstats import doc_char_entropy


def test_char_entropy_closed_form_cases(spark, tmp_path):
    rows = [
        (1, "a"),      # one char: one run of length 1 -> H = 0
        (2, "aaaa"),   # one run of length n -> H = 0
        (3, "abab"),   # two runs after sort -> H = ln 2
        (4, "abcd"),   # four runs of length 1 -> H = ln 4
        (5, "aab"),    # 2/3, 1/3 split
        (6, ""),       # filtered out by the length guard
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r for r in doc_char_entropy(spark, d).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # empty text dropped

    assert out[1]["n_chars"] == 1
    assert out[1]["n_distinct_chars"] == 1
    assert out[1]["entropy_nats"] == 0.0

    assert out[2]["n_distinct_chars"] == 1
    assert out[2]["entropy_nats"] == 0.0

    assert out[3]["n_distinct_chars"] == 2
    assert out[3]["entropy_nats"] == round(math.log(2), 6)

    assert out[4]["n_distinct_chars"] == 4
    assert out[4]["entropy_nats"] == round(math.log(4), 6)

    h5 = (2 / 3) * math.log(3 / 2) + (1 / 3) * math.log(3)
    assert abs(out[5]["entropy_nats"] - h5) < 2e-6
    assert out[5]["n_chars"] == 3
    assert out[5]["n_distinct_chars"] == 2


def test_skyline_keeps_all_tied_optima(spark, tmp_path):
    """Two parts at the SAME (price, max size) are mutually
    non-dominating and must BOTH stay -- the tie arm a per-price max +
    running-max pipeline most easily gets wrong (and which the real
    TPC-H-ish part table may never exercise)."""
    from big_data_assignment2_spark.operators.mining import skyline_2d

    rows = [
        (101, 1.0, 5),  # tied optimum at price 1
        (102, 1.0, 5),  # tied optimum at price 1
        (103, 2.0, 7),  # bigger for more money: on the skyline
        (104, 2.0, 3),  # dominated by 103 (same price, smaller)
        (105, 3.0, 7),  # dominated by 103 (same size, pricier)
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/part.parquet")
    keys = sorted(r["p_partkey"] for r in skyline_2d(spark, d).collect())
    assert keys == [101, 102, 103]


def test_spatial_grid_join_equals_brute_force(spark, sf_dir):
    """Completeness of the 3x3 neighborhood decomposition: the grid-cell
    candidate join must find EXACTLY the pairs a brute-force crossJoin
    finds -- a missing neighbor offset or an off-by-one in the cell snap
    would silently drop boundary pairs while the oracle (which also
    brute-forces) is only compared on the real driver run."""
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.operators.mining import (
        GEO_GRID,
        GEO_R2,
        spatial_radius_join,
    )
    from big_data_assignment2_spark.sources.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37) % GEO_GRID).alias("cx"),
        ((F.col("c_custkey") * 91) % GEO_GRID).alias("cy"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53) % GEO_GRID).alias("sx"),
        ((F.col("s_suppkey") * 17) % GEO_GRID).alias("sy"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    brute = (
        cust.crossJoin(supp)
        .where(d2 <= GEO_R2)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_nearby"), F.min(d2).cast("long").alias("min_dist2"))
    )
    got = {tuple(r) for r in spatial_radius_join(spark, sf_dir).collect()}
    want = {tuple(r) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_audio_features_subframe_docs(spark, tmp_path):
    """Docs shorter than one PCM frame: a single partial frame, so
    peak_frame_energy == energy; zero crossings count sign flips around
    PCM_CENTER=80 (letters positive, space negative)."""
    from big_data_assignment2_spark.operators.multimodal import audio_features

    rows = [
        (1, "ab"),   # doc_id % 3 == 1 -> audio; s = [17, 18]: no flip
        (4, "a b"),  # s = [17, -48, 18]: two flips
        (2, "zzz"),  # not audio modality -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in audio_features(spark, d).collect()}
    assert set(out) == {1, 4}
    assert out[1]["zero_crossings"] == 0
    assert out[1]["energy"] == 17 * 17 + 18 * 18
    assert out[1]["peak_frame_energy"] == out[1]["energy"]
    assert out[4]["zero_crossings"] == 2
    assert out[4]["energy"] == 17 * 17 + 48 * 48 + 18 * 18
    assert out[4]["peak_frame_energy"] == out[4]["energy"]


def test_audio_features_excludes_non_ascii_docs(spark, tmp_path):
    """ASCII guard (round-6 ADVICE): Spark reads BYTES while the DuckDB
    oracle reads CODE POINTS, so any non-ASCII audio-modality doc would
    silently diverge n_samples/energy/ZCR between engines. Both sides
    now exclude such docs identically (octet_length == length) -- the
    same guard the prefix ops use."""
    from big_data_assignment2_spark.operators.multimodal import audio_features

    rows = [
        (1, "ab"),        # ASCII audio doc -> kept
        (4, "café"), # non-ASCII audio doc (4 chars, 5 bytes) -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in audio_features(spark, d).collect()}
    assert set(out) == {1}

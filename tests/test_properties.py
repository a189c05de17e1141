"""Property-based equivalence tests (hypothesis) for the hot-path
rewrites: the Arrow-batched shingle/tokenize forms must match the
interpreted Column forms on ARBITRARY text, not just the fixture corpus."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_assignment2_spark.functions.hashing import shingles, shingles_pd
from big_data_assignment2_spark.functions.text import tokens
from big_data_assignment2_spark.operators._util import dsum

# text with ascii letters/digits/punct/whitespace, incl. empty and
# separator-only strings
TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cc",)) | st.sampled_from(" \t.,;-_"),
    max_size=120,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_shingles_pd_matches_column_form(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", shingles_pd("text", 3).alias("sh")).collect()
    }
    want = {
        r["id"]: r["sh"]
        for r in df.select("id", shingles("text", 3).alias("sh")).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_tokenize_matches_tokens_explode(spark, texts):
    from big_data_assignment2_spark.functions.text import tokenize

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = sorted(map(tuple, tokenize(df).collect()))
    want = sorted(
        map(tuple, df.select("doc_id", F.explode(tokens("text")).alias("term")).collect())
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=20),
       st.randoms())
def test_dsum_is_order_independent(spark, values, rnd):
    shuffled = list(values)
    rnd.shuffle(shuffled)
    a = spark.createDataFrame([(v,) for v in values], "v double").agg(dsum(F.col("v"), 6)).collect()[0][0]
    b = spark.createDataFrame([(v,) for v in shuffled], "v double").agg(dsum(F.col("v"), 6)).collect()[0][0]
    assert a == b


def test_approx_distinct_error_bound(spark, sf_dir):
    """approx_distinct_users has no SQL oracle (HLL estimates are
    sketch-specific); bound its relative error against the exact
    count-distinct instead. rsd=0.02 gives a ~2% standard deviation --
    5% is a >2-sigma ceiling, loose enough to be flake-free."""
    from big_data_assignment2_spark.operators.pipeline import approx_distinct_users
    from big_data_assignment2_spark.sources.catalog import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, est in approx.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])


def test_hll_union_error_bound(spark, sf_dir):
    """hll_union_by_source has no SQL oracle (DataSketches estimates are
    sketch-specific); bound every per-source estimate AND the union row
    against exact distinct token counts. Default lgK=12 gives ~1.6% rse;
    5% is a >3-sigma ceiling. The union row must also be genuinely less
    than the per-source sum (token sets overlap), or the union surface
    proves nothing."""
    from big_data_assignment2_spark.functions.text import tokens
    from big_data_assignment2_spark.operators.pipeline import hll_union_by_source
    from big_data_assignment2_spark.sources.catalog import load_table

    est = {
        r["source"]: r["distinct_terms_est"]
        for r in hll_union_by_source(spark, sf_dir).collect()
    }
    toks = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(tokens("text")).alias("term")
    )
    exact = {
        r["source"]: r["exact"]
        for r in toks.groupBy("source").agg(F.countDistinct("term").alias("exact")).collect()
    }
    exact["(all)"] = toks.select("term").distinct().count()
    assert est.keys() == exact.keys()
    for src, e in est.items():
        assert abs(e - exact[src]) / exact[src] < 0.05, (src, e, exact[src])
    per_source_sum = sum(v for k, v in est.items() if k != "(all)")
    assert est["(all)"] < per_source_sum, est


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_codec_roundtrip_property(w, h, seed):
    """decode(encode(x)) == x for ARBITRARY shapes and pixel values --
    every row-padding remainder, degenerate 1-pixel rows/columns, and
    random content (the fixed-grid test in test_multimodal.py covers the
    golden bytes; this covers the space)."""
    import numpy as np

    from big_data_assignment2_spark.functions.imaging import bmp_codec

    encode_bmp, decode_bmp = bmp_codec()
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(arr))
    assert out.shape == (h, w, 3)
    assert (out == arr).all()


def test_cms_estimates_bounded(spark, sf_dir):
    """cms_partkey_counts has no SQL oracle (sketch layout is
    implementation-specific); pin the CMS guarantee instead: every
    estimate sits in [exact, exact + eps * total], and totals equal the
    scanned row count. Deterministic (fixed seed), so this is a fixed
    arithmetic check, not a statistical one."""
    from big_data_assignment2_spark.operators.pipeline import (
        CMS_EPS,
        cms_partkey_counts,
    )
    from big_data_assignment2_spark.sources.catalog import load_table

    est = {
        r["l_partkey"]: (r["est_count"], r["total_rows"])
        for r in cms_partkey_counts(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    exact = {
        r["l_partkey"]: r["c"]
        for r in li.where(F.col("l_partkey").isin(*est.keys()))
        .groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for k, (e, tot) in est.items():
        x = exact.get(k, 0)
        assert tot == n
        assert x <= e <= x + CMS_EPS * n + 1, (k, e, x)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", min_codepoint=1, max_codepoint=127), max_size=8), min_size=2, max_size=12))
def test_enc_fw_roundtrips_and_preserves_order(spark, texts):
    """enc_fw/dec_fw contract (the HashAggregate-keeping surrogate used by
    profile_table and the activity max_by aggregates): exact round-trip
    for <=8-byte ASCII values, and the surrogate's integer order equals
    bytewise string order."""
    from big_data_assignment2_spark.operators._util import dec_fw, enc_fw

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    out = df.select("i", "s", enc_fw(F.col("s")).alias("c")).select(
        "i", "s", "c", dec_fw(F.col("c")).alias("back")
    )
    rows = out.collect()
    for r in rows:
        assert r["back"] == r["s"], (r["s"], r["back"])
    by_str = [r["c"] for r in sorted(rows, key=lambda r: r["s"].encode())]
    assert by_str == sorted(by_str)


def test_enc_fw_checked_enforces_preconditions(spark):
    """enc_fw_checked (round-6 ADVICE): values that break the nbytes=8
    contract -- longer than 8 bytes, or a non-ASCII first byte -- must
    raise LOUDLY instead of silently truncating/corrupting the surrogate;
    valid enum-like values and NULLs behave exactly like enc_fw."""
    import pytest

    from big_data_assignment2_spark.operators._util import (
        dec_fw,
        enc_fw,
        enc_fw_checked,
    )

    ok = spark.createDataFrame(
        [("click",), ("purchase",), (None,)], "s string"
    ).select(
        enc_fw_checked(F.col("s")).alias("c"),
        enc_fw(F.col("s")).alias("plain"),
    )
    for r in ok.collect():
        assert r["c"] == r["plain"]

    too_long = spark.createDataFrame([("page_view_x",)], "s string")
    with pytest.raises(Exception, match="precondition violated"):
        too_long.select(enc_fw_checked(F.col("s")).alias("c")).collect()

    non_ascii = spark.createDataFrame([("évent",)], "s string")
    with pytest.raises(Exception, match="precondition violated"):
        non_ascii.select(enc_fw_checked(F.col("s")).alias("c")).collect()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=25),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=10**6),
)
def test_span_exact_dedup_matches_python_reference(spark, tmp_path_factory, docs, seed):
    """span_exact_dedup against a direct Python reference (gram counting
    + run merging) on random tiny-alphabet corpora -- small alphabets
    force heavy gram duplication, exercising run merging, span
    boundaries, whole-doc spans, and the shorter-than-K guard."""
    import uuid
    from collections import Counter

    from big_data_assignment2_spark.operators.dedup import K_SPAN, span_exact_dedup

    toks_by_id = {i: list(t) for i, t in enumerate(docs)}
    counts: Counter = Counter()
    for t in toks_by_id.values():
        for i in range(len(t) - K_SPAN + 1):
            counts[tuple(t[i : i + K_SPAN])] += 1
    want = set()
    for did, t in toks_by_id.items():
        dup = [
            i
            for i in range(len(t) - K_SPAN + 1)
            if counts[tuple(t[i : i + K_SPAN])] >= 2
        ]
        run = None
        for i in dup:
            if run is not None and i == run[1] + 1:
                run = (run[0], i)
            else:
                if run is not None:
                    want.add((did, run[0], run[1] - run[0] + K_SPAN))
                run = (i, i)
        if run is not None:
            want.add((did, run[0], run[1] - run[0] + K_SPAN))

    d = str(tmp_path_factory.mktemp("span") / uuid.uuid4().hex[:8])
    spark.createDataFrame(
        [(i, " ".join(t), "s") for i, t in toks_by_id.items()],
        "doc_id long, text string, source string",
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in span_exact_dedup(spark, d).collect()
    }
    assert got == want

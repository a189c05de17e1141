"""Semantic invariants for the mining operators (basket association
rules, RFM segmentation, time-decay attribution) beyond the DuckDB
oracle equality that tests/test_oracle.py already enforces."""

from __future__ import annotations

import math

from big_data_assignment2_spark.operators import mining


def test_basket_pair_lift_invariants(spark, sf_dir):
    rows = mining.basket_pair_lift(spark, sf_dir).collect()
    assert rows, "expected at least one rule at test scale"
    for r in rows:
        assert r.part_u < r.part_v, "pairs must be canonical u < v"
        assert r.n_both >= mining.MIN_SUPPORT
        assert r.n_both <= min(r.n_u, r.n_v), "pair support bounded by items"
        assert math.isclose(r.confidence, round(r.n_both / r.n_u, 6))
        assert r.lift > 0
    # descending-support order with lift tie-break is total
    keys = [(-r.n_both, -r.lift, r.part_u, r.part_v) for r in rows]
    assert keys == sorted(keys)


def test_rfm_scores_quartile_balanced(spark, sf_dir):
    rows = mining.rfm_segments(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.recency_days >= 0 and r.frequency >= 1 and r.monetary > 0
    # threshold-bucket scoring must roughly quarter the population on the
    # continuous metric (monetary has no mass ties at test scale)
    for s in (1, 2, 3, 4):
        frac = sum(1 for r in rows if r.m_score == s) / n
        assert 0.10 <= frac <= 0.40, (s, frac)


def test_quantile_normalize_aligns_distributions(spark, sf_dir):
    """After normalization every source's values are drawn from the SAME
    global grid, so per-source means must be far closer together than
    the raw per-source means, and the normalized range stays inside the
    observed global [min, max]."""
    import statistics

    rows = mining.quantile_normalize_by_source(spark, sf_dir).collect()
    assert rows
    lo = min(r.n_chars for r in rows)
    hi = max(r.n_chars for r in rows)
    by_source: dict[str, list[float]] = {}
    raw_by_source: dict[str, list[float]] = {}
    for r in rows:
        assert lo <= r.norm_chars <= hi
        by_source.setdefault(r.source, []).append(r.norm_chars)
        raw_by_source.setdefault(r.source, []).append(float(r.n_chars))
    if len(by_source) > 1:
        norm_spread = statistics.pstdev(
            [statistics.mean(v) for v in by_source.values()]
        )
        raw_spread = statistics.pstdev(
            [statistics.mean(v) for v in raw_by_source.values()]
        )
        assert norm_spread <= raw_spread + 1e-9


def test_tfidf_top_terms_shape(spark, sf_dir):
    from big_data_assignment2_spark.operators import textstats

    rows = textstats.tfidf_top_terms(spark, sf_dir).collect()
    assert rows
    per_source: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.rk <= textstats.TFIDF_TOP_K
        assert r.n_occ >= 1 and r.df >= 1
        assert r.score >= 0, "df <= N implies non-negative idf"
        per_source.setdefault(r.source, []).append(r)
    for source, rs in per_source.items():
        rs.sort(key=lambda r: r.rk)
        keys = [(-r.score, r.term) for r in rs]
        assert keys == sorted(keys), (source, keys)


def test_time_decay_credit_conserved(spark, sf_dir):
    """Each purchase with >= 1 touch hands out exactly one unit of credit
    (weights are dyadic so the normalization is exact): channel totals
    must sum to the number of attributed purchases."""
    df = mining.time_decay_attribution(spark, sf_dir)
    rows = df.collect()
    assert rows
    total_credit = sum(r.credit for r in rows)
    from pyspark.sql import functions as F

    from big_data_assignment2_spark.sources.catalog import load_events

    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    t = ev.where(F.col("event_type").isin(*mining._TOUCH_TYPES)).alias("t")
    win_us = mining.ATTRIBUTION_WINDOW_DAYS * mining._US_PER_DAY
    attributed = (
        p.join(
            t,
            (F.col("p.user_id") == F.col("t.user_id"))
            & (F.col("t.us") <= F.col("p.us"))
            & (F.col("p.us") - F.col("t.us") < win_us),
            "left_semi",
        )
        .count()
    )
    assert math.isclose(total_credit, attributed, rel_tol=0, abs_tol=1e-6)

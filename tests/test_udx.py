"""Focused tests for the udx operators' internals (beyond the oracle).

r13: cogroup_user_days switched its cogroup key from user_id to a hash
BUCKET of it, computing every user's overlap vectorized inside one
applyInPandas call per bucket. The closed-form fixture exercises the
paths the bucket-local pandas merge must get right: a user present on
one side only (empty-side alignment + fillna), duplicate same-day rows
(drop_duplicates), overlapping vs disjoint day sets, and non-click /
non-purchase event types that must be filtered out entirely.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from big_data_assignment2_spark.operators import udx


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=hour)


def test_cogroup_user_days_closed_form(spark, tmp_path):
    rows = [
        # user 1: clicks days {0,1}, purchases days {1,2} -> common {1}
        (1, 1, _ts(0), "click", 1.0),
        (2, 1, _ts(1), "click", 1.0),
        (3, 1, _ts(1, 5), "click", 1.0),  # duplicate click day 1
        (4, 1, _ts(1), "purchase", 9.0),
        (5, 1, _ts(2), "purchase", 9.0),
        # user 2: clicks only, days {0,3}
        (6, 2, _ts(0), "click", 1.0),
        (7, 2, _ts(3), "click", 1.0),
        # user 3: purchases only, day {5} (twice, same day)
        (8, 3, _ts(5), "purchase", 9.0),
        (9, 3, _ts(5, 7), "purchase", 9.0),
        # user 4: only 'view' events -> absent from the result entirely
        (10, 4, _ts(0), "view", 0.0),
        # user 5: disjoint click/purchase days -> common 0
        (11, 5, _ts(0), "click", 1.0),
        (12, 5, _ts(1), "purchase", 9.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    d = tmp_path / "cg"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pdf), str(d / "events.parquet"))

    got = sorted(
        map(tuple, udx.cogroup_user_days(spark, str(d)).collect())
    )
    assert got == [
        (1, 2, 2, 1),
        (2, 2, 0, 0),
        (3, 0, 1, 0),
        (5, 1, 1, 0),
    ]

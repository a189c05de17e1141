"""Local replica of the driver's Spark-vs-DuckDB oracle comparison:
row count + column names + order-insensitive value comparison
(floats rounded to 6 decimals)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from big_data_assignment2_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _rows(df: pd.DataFrame) -> list[str]:
    """Stringified, column-name-sorted, row-sorted tuples -- floats rounded
    to 6 decimals. Strict about int-vs-float the way a value hash is."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.astype("float64").round(6)
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: round(v, 6)
                if isinstance(v, float) and not math.isnan(v)
                else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
    return sorted(str(t) for t in df.itertuples(index=False, name=None))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> str | None:
    """Return None on match, else a human-readable diff summary."""
    got_df = spark_df.toPandas()
    want_df = con.execute(sql).df()
    if sorted(got_df.columns) != sorted(want_df.columns):
        return f"columns differ: spark={sorted(got_df.columns)} duckdb={sorted(want_df.columns)}"
    if len(got_df) != len(want_df):
        return f"row count differs: spark={len(got_df)} duckdb={len(want_df)}"
    got, want = _rows(got_df), _rows(want_df)
    if got != want:
        bad = [(g, w) for g, w in zip(got, want) if g != w][:3]
        detail = "\n".join(f"  spark={g}\n  duck ={w}" for g, w in bad)
        return f"values differ ({sum(g != w for g, w in zip(got, want))} rows):\n{detail}"
    return None

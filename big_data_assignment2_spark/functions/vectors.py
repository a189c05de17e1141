"""Vector math over ``array<float>`` embedding columns -- pure Column
expressions (``zip_with`` / ``aggregate``), no UDFs, so similarity search
stays JVM-side and codegen'd.

All arithmetic is promoted to double before accumulating so results match
a double-precision oracle; accumulation is sequential (index order), the
same order DuckDB's list functions use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-sum dot product in double precision."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs instead of NaN."""
    return F.coalesce(
        dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0)), F.lit(0.0)
    )


def make_cosine_pd():
    """Arrow-batched numpy cosine ``(array, array) -> double`` -- the fast
    path for BULK pair verification (LSH candidate sets), where the
    interpreted ``aggregate``/``zip_with`` fold costs ~40us per 64-dim
    pair and the vectorized kernel ~0.2us. Same double-precision math;
    numpy's pairwise summation differs from the sequential fold only in
    final ulps, absorbed by the shared round-to-6 (the same argument the
    blocked near-dup kernel relies on). Built lazily: parsing the return
    type needs an active session."""
    from pyspark.sql.functions import pandas_udf

    def cos(ea, eb):
        import numpy as np
        import pandas as pd

        if len(ea) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in ea])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in eb])
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        out = np.divide(num, den, out=np.zeros_like(num), where=den != 0.0)
        return pd.Series(out)

    # no type hints: under ``from __future__ import annotations`` they
    # stringify and break eval-type inference; SCALAR is the default.
    return pandas_udf(cos, "double")


# DuckDB twins. list_dot_product on DOUBLE[] accumulates in double; tiny
# last-ulp ordering differences vs the Spark fold are absorbed by the
# round-to-6-decimals both engines apply before comparison.
SQL_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def sql_cosine(a: str, b: str) -> str:
    d_ab = SQL_DOT.format(a=a, b=b)
    d_aa = SQL_DOT.format(a=a, b=a)
    d_bb = SQL_DOT.format(a=b, b=b)
    return (
        f"coalesce(({d_ab}) / nullif(sqrt({d_aa}) * sqrt({d_bb}), 0.0), 0.0)"
    )

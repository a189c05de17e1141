"""Query registry: every operator exposed to the driver contract.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB SQL string (the correctness oracle), or ``None`` for
genuinely non-SQL-expressible operators (the driver then records a weaker
rows-only check).

Determinism rules every entry follows (so order-insensitive value hashing
matches across engines):

- every computed column is aliased identically in Spark and SQL;
- double results that aggregate across rows go through an exact
  ``DECIMAL(18,s)`` sum (order-independent) and are cast back to double,
  or are rounded to 6 decimals when per-row arithmetic is bit-identical
  anyway;
- timestamps are compared/returned as epoch seconds (bigint) so session
  timezones can't shift values;
- any LIMIT is preceded by a total ORDER BY with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


@dataclass
class Registry:
    queries: dict[str, Query] = field(default_factory=dict)

    def add(self, name: str, fn: QueryFn, oracle: str | None, doc: str = "") -> None:
        if name in self.queries:
            raise KeyError(f"duplicate query name {name!r}")
        self.queries[name] = Query(name, fn, oracle, doc)

    def fns(self) -> dict[str, QueryFn]:
        return {q.name: q.fn for q in self.queries.values()}

    def oracles(self) -> dict[str, str]:
        return {q.name: q.oracle for q in self.queries.values() if q.oracle is not None}


def build_registry() -> Registry:
    """Assemble the full registry from all operator modules."""
    from .operators import (
        dedup,
        index_build,
        multimodal,
        relational,
        search,
        similarity,
        skew,
        temporal,
        udx,
        textstats,
        windows,
    )
    from .sources import partitioned_sink, reference_corpus
    from .streaming import events_stream

    reg = Registry()
    for mod in (
        relational,
        index_build,
        search,
        textstats,
        dedup,
        similarity,
        temporal,
        windows,
        skew,
        udx,
        multimodal,
        events_stream,
        reference_corpus,
        partitioned_sink,
    ):
        mod.register(reg)
    return reg

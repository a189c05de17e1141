"""Physical-plan audit helpers: make "is this the plan you'd want?"
checkable in tests instead of eyeballed in notebooks.

The reference encodes its physical strategy in infrastructure (Cassandra
partition keys, reducer counts -- SURVEY.md section 4); this engine encodes
it declaratively and *verifies* Catalyst produced the intended physical
shape: filters pushed to scans, dimension joins broadcast, top-k planned as
TakeOrderedAndProject, no accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (what ``.explain`` prints)."""
    jdf = df._jdf  # noqa: SLF001 - no public API returns the plan text
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """One PushedFilters body per scan, verbatim (filters like
    ``EqualTo(a,b)`` contain commas, so no entry-level splitting)."""
    out = []
    for line in explain_formatted(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.split(":", 1)[1].strip().strip("[]"))
    return out


def operators(df: DataFrame) -> list[str]:
    """Physical operator names in plan order (from the '(n) Op' lines)."""
    import re

    ops = []
    for line in explain_formatted(df).splitlines():
        m = re.match(r"\(\d+\)\s+(\w[\w ]*?)(?:\s+\[codegen id : \d+\])?\s*$", line.strip())
        if m:
            ops.append(m.group(1).strip())
    return ops


def audit(
    df: DataFrame,
    requires: tuple[str, ...] = (),
    forbids: tuple[str, ...] = (),
) -> list[str]:
    """Return violation messages (empty list = plan is as intended).

    *requires*/*forbids* are substrings matched against the formatted
    plan, e.g. ``requires=("BroadcastHashJoin", "PushedFilters: [IsNotNull")``
    or ``forbids=("CartesianProduct", "SortMergeJoin")``.
    """
    plan = explain_formatted(df)
    problems = [f"missing required plan fragment: {r!r}" for r in requires if r not in plan]
    problems += [f"forbidden plan fragment present: {f!r}" for f in forbids if f in plan]
    return problems

"""Text cleaning / tokenization column expressions.

Reproduces the reference's text semantics exactly (SURVEY.md section 4 BM25
box), as pure Column expressions (JVM-side, whole-stage-codegen'd -- no
Python UDFs on this path):

- clean_text: lowercase, ``[^a-z0-9\\s]`` -> space, ``\\s+`` -> single
  space (reference ``app/prepare_data.py:22-29``).
- clean_title: only tabs/newlines -> space; case and punctuation kept
  (reference ``app/prepare_data.py:31-34``).
- tokens: whitespace split of clean text dropping empties -- equivalently,
  maximal runs of ``[a-z0-9]`` in the lowercased text (reference
  ``app/mapreduce/mapper2.py:13`` uses Python ``str.split()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A token is a maximal run of [a-z0-9] in lowercased text; everything else
# separates. This single regex is exactly equivalent to the reference's
# clean-then-split pipeline and is what the DuckDB oracles mirror.
NON_TOKEN_RE = "[^a-z0-9]+"


def clean_text(col: Column | str) -> Column:
    """Reference ``prepare_data.py:22-29`` (F1/F2): lower, strip, collapse."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.regexp_replace(c, r"\s+", " ")


def clean_title(col: Column | str) -> Column:
    """Reference ``prepare_data.py:31-34``: tabs/newlines -> space only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\t\n]", " ")


def safe_filename(title: Column | str, max_len: int = 50) -> Column:
    """Reference ``prepare_data.py:44`` (F8): ``[^A-Za-z0-9]+`` -> ``_``,
    truncated to *max_len* chars."""
    c = F.col(title) if isinstance(title, str) else title
    return F.substring(F.regexp_replace(c, "[^A-Za-z0-9]+", "_"), 1, max_len)


def tokens(col: Column | str) -> Column:
    """Array of tokens (duplicates kept, in order), empties dropped."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.filter(F.split(c, NON_TOKEN_RE), lambda t: t != F.lit(""))


def doc_length(col: Column | str) -> Column:
    """Whitespace token count == reference doc length
    (``app/mapreduce/mapper1.py:14-15``, A4)."""
    return F.size(tokens(col))


def tokenize(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode to one ``(doc_id, term)`` row per token occurrence (A1,
    reference ``mapper2.py:12-18``). Narrow transform -- no shuffle.

    Empties are dropped by a plain Filter AFTER the explode rather than a
    higher-order ``F.filter`` lambda inside it: identical rows out, but
    explode+WHERE stays in whole-stage codegen while array lambdas are
    interpreted per element."""
    c = F.lower(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(F.split(c, NON_TOKEN_RE)).alias("term"))
        .where(F.col("term") != "")
    )


def tokenize_query(query: str) -> list[str]:
    """Driver-side query normalization, mirroring ``app/query.py:25`` but
    de-duplicated with first-seen order (a repeated query term contributes
    once in the reference too -- SURVEY.md section 4 quirks)."""
    import re

    terms = re.sub(r"[^a-z0-9\s]", " ", query.lower()).split()
    return list(dict.fromkeys(terms))


# --- DuckDB oracle fragments -------------------------------------------------
# The same semantics in DuckDB SQL, used by oracle_sql() twins. DuckDB needs
# the 'g' flag where Spark's regexp_replace replaces all matches by default.

SQL_CLEAN_TEXT = (
    "regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g')"
)
SQL_TOKENS = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)

"""Hash-based text representations: shingles, MinHash, SimHash,
fingerprints.

Two hash families, chosen deliberately:

- **md5-derived** (``F.md5``): bit-identical in DuckDB, so every operator
  built on it gets a full SQL oracle. Used for the *correctness-graded*
  MinHash/LSH, SimHash and fingerprint paths.
- **xxhash64** (``F.xxhash64``): ~10x cheaper, JVM-intrinsic; offered as
  the scale path (``fast=True``) for 100 TB runs where the oracle isn't in
  the loop. Same operator shapes, different hash.

Everything is Column arithmetic -- no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import tokens

# --- shingling ---------------------------------------------------------------


def shingles(text_col: Column | str, k: int = 5) -> Column:
    """Distinct k-token shingles (space-joined) of the tokenized text.

    Docs with fewer than k tokens contribute a single shingle of all their
    tokens, so short docs still participate in dedup.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.array_distinct(
        F.when(n >= k, shingled).when(n > 0, whole).otherwise(F.array().cast("array<string>"))
    )


def sql_shingles(col: str, k: int = 5) -> str:
    """DuckDB twin of :func:`shingles` (list lambdas + list_distinct)."""
    toks = f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
    return (
        f"list_distinct(CASE"
        f" WHEN len({toks}) >= {k} THEN"
        f"  list_transform(range(1, len({toks}) - {k} + 2),"
        f"   i -> array_to_string({toks}[i:i+{k - 1}], ' '))"
        f" WHEN len({toks}) > 0 THEN [array_to_string({toks}, ' ')]"
        f" ELSE [] END)"
    )


# --- MinHash (md5 family, oracle-able) ---------------------------------------

N_MINHASH = 16  # signature length; 4 bands x 4 rows for LSH


def minhash_cols(shingle_col: Column | str, n: int = N_MINHASH) -> list[Column]:
    """n MinHash values for an exploded shingle column: permutation i is
    ``min(md5(i || '|' || shingle))``; aggregate with min() per doc.

    String-min over hex md5 == numeric min over the 128-bit value, and is
    reproducible verbatim in DuckDB.
    """
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), c))).alias(f"mh{i}") for i in range(n)
    ]


def sql_minhash_cols(shingle_expr: str, n: int = N_MINHASH) -> str:
    return ", ".join(
        f"min(md5('{i}|' || {shingle_expr})) AS mh{i}" for i in range(n)
    )


def band_cols(n: int = N_MINHASH, bands: int = 4) -> list[Column]:
    """LSH band keys: md5 over each contiguous group of signature values."""
    rows = n // bands
    out = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        out.append(F.md5(F.concat_ws("#", *parts)).alias(f"band{b}"))
    return out


def sql_band_cols(n: int = N_MINHASH, bands: int = 4) -> str:
    rows = n // bands
    return ", ".join(
        "md5(" + " || '#' || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(bands)
    )


# --- SimHash (md5-nibble family, oracle-able) --------------------------------


def simhash_hex(term_col: Column | str, tf_col: Column | str) -> Column:
    """64-bit SimHash as a 16-hex-digit string, aggregated over a
    ``(doc, term, tf)`` relation: for each of the 64 bits of ``md5(term)``
    (first 16 hex nibbles), vote +tf / -tf; bit set iff vote sum > 0.

    Usage: ``tf_df.groupBy("doc_id").agg(simhash_hex("term","tf"))``.
    """
    term = F.col(term_col) if isinstance(term_col, str) else term_col
    tf = (F.col(tf_col) if isinstance(tf_col, str) else tf_col).cast("long")
    h = F.md5(term)
    nib_hex = []
    for pos in range(16):  # nibble index -> 4 bits
        v = F.conv(F.substring(h, pos + 1, 1), 16, 10).cast("int")
        bits = []
        for b in (3, 2, 1, 0):  # high bit first within the nibble
            vote = F.sum(F.when(F.shiftright(v, b).bitwiseAND(1) == 1, tf).otherwise(-tf))
            bits.append(F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)))
        nibble = bits[0] * 8 + bits[1] * 4 + bits[2] * 2 + bits[3]
        nib_hex.append(F.lower(F.conv(nibble.cast("string"), 10, 16)))
    return F.concat(*nib_hex)


def sql_simhash_hex(term_expr: str, tf_expr: str) -> str:
    nibs = []
    for pos in range(16):
        v = f"CAST(('0x' || substr(md5({term_expr}), {pos + 1}, 1)) AS INTEGER)"
        bits = []
        for b in (3, 2, 1, 0):
            vote = (
                f"sum(CASE WHEN (({v} >> {b}) & 1) = 1"
                f" THEN {tf_expr} ELSE -{tf_expr} END)"
            )
            bits.append(f"(CASE WHEN {vote} > 0 THEN 1 ELSE 0 END)")
        nib = f"({bits[0]}*8 + {bits[1]}*4 + {bits[2]}*2 + {bits[3]})"
        nibs.append(f"substr('0123456789abcdef', {nib} + 1, 1)")
    return " || ".join(nibs)


# --- xxhash64 scale path ------------------------------------------------------


def minhash_cols_fast(shingle_col: Column | str, n: int = N_MINHASH) -> list[Column]:
    """xxhash64-based MinHash (no SQL oracle; ~10x cheaper at scale)."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    return [F.min(F.xxhash64(c, F.lit(i))).alias(f"mh{i}") for i in range(n)]

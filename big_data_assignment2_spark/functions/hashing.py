"""Hash-based text representations: shingles, MinHash, SimHash,
fingerprints.

Two hash families, chosen deliberately:

- **md5-derived** (``F.md5``): bit-identical in DuckDB, so every operator
  built on it gets a full SQL oracle. Used for the *correctness-graded*
  MinHash/LSH, SimHash and fingerprint paths.
- **xxhash64** (``F.xxhash64``): ~10x cheaper, JVM-intrinsic; offered as
  the scale path (``fast=True``) for 100 TB runs where the oracle isn't in
  the loop. Same operator shapes, different hash.

Aggregations (MinHash, SimHash) are Column arithmetic -- JVM-side, no
Python in the shuffle path. Per-row shingle construction is an
Arrow-batched Pandas UDF (``shingles_pd`` / ``fingerprint_pd``): the
equivalent higher-order-function Columns are interpreted (not codegen'd)
and re-evaluate the tokenization per shingle position, which measured
~50x slower; the Column forms are kept for reference/tests.
"""

from __future__ import annotations

import pandas as pd
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


def shingles_pd(text_col: Column | str, k: int = 5) -> Column:
    """Arrow-batched Pandas-UDF twin of :func:`shingles` -- identical
    output set, ~50x faster.

    The Column version re-evaluates the tokenization expression inside the
    ``transform`` lambda (higher-order functions are interpreted, and the
    lambda body is evaluated per shingle position), making it O(doc_len^2)
    per document. Here tokenization runs once per doc in compiled regex
    code and the shingle loop is plain Python over an Arrow batch -- the
    narrow/no-shuffle shape is unchanged, so this is the 100 TB path.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sh(s: pd.Series) -> pd.Series:
        import re

        tok = re.compile(r"[a-z0-9]+")

        def one(text: str | None) -> list[str]:
            toks = tok.findall(text.lower()) if text else []
            n = len(toks)
            if n >= k:
                it = (" ".join(toks[i : i + k]) for i in range(n - k + 1))
            elif n > 0:
                it = (" ".join(toks),)
            else:
                it = ()
            return list(dict.fromkeys(it))  # array_distinct: first-seen order

        return s.map(one)

    return _sh(F.col(text_col) if isinstance(text_col, str) else text_col)


def ngrams_pd(text_col: Column | str, n: int = 2) -> Column:
    """All token n-grams of a document, **duplicates kept, in order** --
    the frequency-counting sibling of :func:`shingles_pd` (which dedups
    per doc because set semantics are what Jaccard/MinHash need). Docs
    with fewer than *n* tokens emit no n-grams (no short-doc fallback:
    a 1-token doc has no bigrams). Same Arrow-batched narrow shape."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _ng(s: pd.Series) -> pd.Series:
        import re

        tok = re.compile(r"[a-z0-9]+")

        def one(text: str | None) -> list[str]:
            toks = tok.findall(text.lower()) if text else []
            return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

        return s.map(one)

    return _ng(F.col(text_col) if isinstance(text_col, str) else text_col)


def sql_ngrams(col: str, n: int = 2) -> str:
    """DuckDB twin of :func:`ngrams_pd` (no list_distinct, no fallback)."""
    toks = f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
    return (
        f"list_transform(range(1, len({toks}) - {n} + 2),"
        f" i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def fingerprint_pd(text_col: Column | str, k: int = 8) -> Column:
    """Winnowing-style fingerprint as a struct, computed in one Arrow
    batch: ``min(md5(shingle))`` over the doc's distinct k-token shingles
    plus the distinct-shingle count. Same output as the Column-expression
    pipeline ``array_min(transform(shingles(c,k), md5))`` but with
    tokenization and hashing done once per doc in compiled code."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<fingerprint:string,n_shingles:bigint>")
    def _fp(s: pd.Series) -> pd.DataFrame:
        import re

        tok = re.compile(r"[a-z0-9]+")
        fps: list[str | None] = []
        ns: list[int] = []
        for text in s:
            toks = tok.findall(text.lower()) if text else []
            n = len(toks)
            if n >= k:
                sh = {" ".join(toks[i : i + k]) for i in range(n - k + 1)}
            elif n > 0:
                sh = {" ".join(toks)}
            else:
                sh = set()
            fps.append(
                min(hashlib.md5(x.encode()).hexdigest() for x in sh) if sh else None
            )
            ns.append(len(sh))
        return pd.DataFrame({"fingerprint": fps, "n_shingles": ns})

    return _fp(F.col(text_col) if isinstance(text_col, str) else text_col)


# --- MinHash (md5 family, oracle-able) ---------------------------------------

N_MINHASH = 16  # signature length; 4 bands x 4 rows for LSH
_MH_MOD = 4294967291  # largest prime < 2^32


def minhash_cols(shingle_col: Column | str, n: int = N_MINHASH) -> list[Column]:
    """n MinHash values for an exploded shingle column via ONE md5 per
    shingle + Carter-Wegman affine derivations: split md5(shingle) into
    two 32-bit words (a, b) and take permutation i as
    ``min((a + i*b) mod p)`` with p the largest prime < 2^32.

    One cryptographic hash instead of n per row -- at 100 TB the
    signature stage's hashing CPU drops n-fold -- while every derived
    value is integer arithmetic both engines compute identically.
    ``i*b`` is at most ~2^36, so the int64 product cannot overflow."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    h = F.md5(c)
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return [
        F.min((a + F.lit(i) * b) % F.lit(_MH_MOD)).alias(f"mh{i}") for i in range(n)
    ]


def sql_minhash_cols(shingle_expr: str, n: int = N_MINHASH) -> str:
    a = f"CAST(('0x' || substr(md5({shingle_expr}), 1, 8)) AS BIGINT)"
    b = f"CAST(('0x' || substr(md5({shingle_expr}), 9, 8)) AS BIGINT)"
    return ", ".join(
        f"min(({a} + {i} * {b}) % {_MH_MOD}) AS mh{i}" for i in range(n)
    )


def band_cols(n: int = N_MINHASH, bands: int = 4) -> list[Column]:
    """LSH band keys: md5 over each contiguous group of signature values
    (cast to strings explicitly so both engines format them the same)."""
    rows = n // bands
    out = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        out.append(F.md5(F.concat_ws("#", *parts)).alias(f"band{b}"))
    return out


def sql_band_cols(n: int = N_MINHASH, bands: int = 4) -> str:
    rows = n // bands
    return ", ".join(
        "md5("
        + " || '#' || ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )


# --- SimHash (md5-nibble family, oracle-able) --------------------------------


def simhash_contrib_cols(term_col: str, tf_col: str) -> list[Column]:
    """Per-row SimHash contributions ``c0..c63`` = ``tf * bit_j`` where
    ``bit_j`` is bit j of ``md5(term)``'s first 16 hex nibbles (high bit
    first within each nibble). Evaluated ONCE per row in a projection;
    the old single-aggregate form re-evaluated md5 inside each of 128
    conditional sums, dominating the aggregate's cost."""
    # Built as per-column F.expr strings, not composed Column ops: the 64
    # composed trees cost ~1.2s of driver-side py4j construction per
    # query invocation (r13); the parsed trees are identical. *term_col*
    # and *tf_col* are SQL expression strings here (a Column tf like
    # F.lit(1) is rendered via str() -> "Column<'1'>" would be wrong, so
    # accept only str; callers pass SQL text).
    term = term_col if isinstance(term_col, str) else None
    tf = tf_col if isinstance(tf_col, str) else None
    assert term is not None and tf is not None, "pass SQL expression strings"
    # Bit j (j=0 is the high bit of the first nibble) lives in one of two
    # 32-bit words decoded with a single conv each -- not 16 per-nibble
    # conv(substring(...)) calls, which measured as the projection's cost.
    hi = f"CAST(conv(substring(md5({term}), 1, 8), 16, 10) AS BIGINT)"
    lo = f"CAST(conv(substring(md5({term}), 9, 8), 16, 10) AS BIGINT)"
    out: list[Column] = []
    for j in range(64):
        word, off = (hi, 31 - j) if j < 32 else (lo, 63 - j)
        out.append(
            F.expr(
                f"(CAST({tf} AS BIGINT) * (shiftright({word}, {off}) & 1)) AS c{j}"
            )
        )
    return out


def simhash_hex_from_votes(total_col: str = "total") -> Column:
    """Rebuild the 16-hex-char SimHash from aggregated contribution sums
    ``s0..s63`` and the total tf: the +tf/-tf vote for bit j equals
    ``2*s_j - total`` (exact integer identity with the conditional-sum
    form), bit set iff vote > 0. One F.expr string (same ~400-node tree
    the composed-Column form built, without its ~0.5s of driver-side
    py4j construction); *total_col* is a column name."""
    nib_hex = []
    j = 0
    for _pos in range(16):
        bits = []
        for _b in range(4):
            bits.append(
                f"(CASE WHEN (2 * s{j} - {total_col}) > 0 THEN 1 ELSE 0 END)"
            )
            j += 1
        nibble = f"({bits[0]} * 8 + {bits[1]} * 4 + {bits[2]} * 2 + {bits[3]})"
        nib_hex.append(f"lower(conv(CAST({nibble} AS STRING), 10, 16))")
    return F.expr("concat(" + ", ".join(nib_hex) + ")")


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

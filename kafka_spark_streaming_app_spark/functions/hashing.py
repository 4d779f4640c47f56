"""Cross-engine deterministic hashing.

Spark's ``hash()``/``xxhash64()`` are Murmur3/xxHash with Spark-specific
seeds — no other engine reproduces them. For oracle-checkable
sketch operators (MinHash, SimHash, fingerprints) we derive a 60-bit
integer from the first 15 hex chars of md5, which both Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``) compute identically.
60 bits keeps the value strictly positive in a signed 64-bit integer
(no ANSI overflow, no sign-extension divergence).

This is NOT a cryptographic choice — md5 here is a portable,
well-distributed mixing function. At 100 TB scale md5 costs more than
xxhash64; production paths that don't need cross-engine parity should
use ``F.xxhash64`` instead (same operator shape, swap the hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column | str) -> Column:
    """60-bit positive integer hash, identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`h60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h60_py(s: str) -> int:
    """Driver-side Python twin of :func:`h60` / :func:`h60_sql` — the
    THIRD face of the same definition, for bounded-state driver
    fixpoints (e.g. the interleaving team-draft coin) that must flip
    the exact coins the SQL oracle derives. Keep all three in lockstep
    (a parity test pins them to each other)."""
    import hashlib as _hashlib

    return int(_hashlib.md5(s.encode()).hexdigest()[:15], 16)


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup: lowercase, trimmed, whitespace
    collapsed. NULL text is treated as empty — a null-propagating
    normalizer silently DROPS null-text documents from every
    explode-based operator downstream (posexplode of a null array
    emits no rows), which is data loss a cleaning pipeline must never
    do implicitly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " "
    )


NORMALIZE_SQL = "regexp_replace(lower(trim(coalesce({x}, ''))), '\\s+', ' ', 'g')"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(col), " ")


TOKENS_SQL = "string_split(" + NORMALIZE_SQL + ", ' ')"


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (empty when the doc has
    fewer than n tokens). Built-in higher-order functions only — no
    explode, no shuffle: the array stays row-local until the operator
    that consumes it decides how to distribute."""
    toks = tokens(col)
    count = F.size(toks) - F.lit(n - 1)
    make = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(count >= 1, make).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB fragment: same shingles as :func:`word_shingles`, for use
    in a LATERAL unnest over ``range(1, len(words)-n+2)``."""
    words = TOKENS_SQL.format(x=expr)
    return (
        f"CASE WHEN len({words}) >= {n} THEN "
        f"list_transform(range(1, len({words}) - {n} + 2), "
        f"i -> array_to_string(({words})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )

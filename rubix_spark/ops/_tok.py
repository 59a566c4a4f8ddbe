"""Tokenization shared by dedup / text ops.

The Spark expressions and the DuckDB SQL snippets here MUST stay semantically identical —
the correctness gate hash-compares their outputs.  Both sides:

    lower(text) → non-[a-z0-9 ] chars → ' ' → split on ' ' → drop empties

Shingles are k-word sliding windows joined with a single space.  All hashing downstream
uses ``md5`` (same lowercase hex in Spark and DuckDB), so min-hash signatures etc. agree
across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Array<string> of normalized word tokens.

    Non-ASCII is stripped BEFORE lowercasing: unicode case folding differs between the
    JVM (Spark) and DuckDB for characters like 'İ' (U+0130), while ASCII lowercasing is
    identical everywhere — hypothesis found this (tests/test_properties.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(F.regexp_replace(c, "[^a-zA-Z0-9 ]", " ")), " ")
    return F.filter(arr, lambda x: x != "")


def shingles(tok: Column, k: int = 3) -> Column:
    """Array<string> of k-word shingles (empty array when the doc has < k tokens)."""
    idx = F.sequence(F.lit(0), F.size(tok) - k)
    mk = lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j + 1) for j in range(k)])  # noqa: E731
    return F.when(F.size(tok) >= k, F.transform(idx, mk)).otherwise(F.array().cast("array<string>"))


def duck_tokens(col: str = "text") -> str:
    """DuckDB SQL producing the same token list (ASCII-strip before lower, see tokens())."""
    return (
        f"list_filter(string_split(lower(regexp_replace({col}, '[^a-zA-Z0-9 ]', ' ', 'g')), ' '), "
        "x -> x <> '')"
    )


def duck_shingles(tok_expr: str, k: int = 3) -> str:
    """DuckDB SQL producing the same k-shingle list (1-based list_slice)."""
    return (
        f"list_transform(generate_series(1, greatest(len({tok_expr}) - {k - 1}, 0)), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {k - 1}), ' '))"
    )


# 32-bit unsigned int from the first 8 hex chars of md5 — identical in both engines.
def hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10).cast("long")


def duck_hash32(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"

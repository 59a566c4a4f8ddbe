"""Cross-engine deterministic expression helpers.

``ROUND(double, n)`` is NOT portable: Spark rounds the shortest decimal string of the
double (java BigDecimal.valueOf), DuckDB rounds the binary value — they disagree whenever
the true value sits at a ``…5`` boundary (e.g. AVG hitting 152741.235).  Every float
rounding in this engine therefore goes through ``floor(x * 10^n + 0.5) / 10^n`` — pure
IEEE double ops that both engines evaluate bit-for-bit identically.

Float *sums* are made deterministic separately, by casting to DECIMAL(18,4) per row
before SUM (exact, associative — immune to partition/summation order), then back to
double for the rounded output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 4) -> Column:
    """Per-row cast to exact decimal for order-insensitive SUM."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def round_det(col: Column, n: int = 2) -> Column:
    """Deterministic half-up rounding of a double, identical in Spark and DuckDB."""
    m = float(10**n)
    return F.floor(col.cast("double") * m + 0.5) / F.lit(m)


def dec_det(col: Column, scale: int = 4) -> Column:
    """Deterministic decimal cast for COMPUTED doubles (products, sums of terms).

    Spark casts double→decimal via the shortest decimal string (BigDecimal.valueOf),
    DuckDB via the binary value — multi-factor products land near .xxxx5 boundaries often
    enough for the two to disagree. Floor-rounding to the target scale first (pure IEEE,
    identical in both engines) puts the value off-boundary so the cast is unambiguous.
    Raw data columns don't need this (their doubles carry short decimal representations).
    """
    return round_det(col, scale).cast(f"decimal(18,{scale})")


def duck_dec_det(expr: str, scale: int = 4) -> str:
    """DuckDB SQL matching dec_det()."""
    return f"CAST({duck_round(expr, scale)} AS DECIMAL(18,{scale}))"


def money(agg: Column, alias: str) -> Column:
    """Exact decimal aggregate -> rounded double output column."""
    return round_det(agg, 2).alias(alias)


def money_sum_fast(col: Column | str, alias: str, scale: int = 4) -> Column:
    """money(SUM(dec(col))) on the LONG fast path: sum integer ten-thousandths
    (floor(x*10^scale+0.5) as BIGINT — exact and associative like the decimal sum,
    but a plain long add instead of Spark's BigDecimal-string double->decimal cast,
    measured 4x on the aggregate at sf10), then convert to decimal ONCE on the final
    row before the money rounding. Bit-identical to money(F.sum(dec(col))) for RAW
    data columns whose doubles carry <= ``scale`` decimals (the same contract dec()
    already relies on), AND to money(F.sum(dec_det(expr))) for COMPUTED expressions
    whose oracle quantizes per row with the same FLOOR(expr*10^scale+0.5) form (the
    floored double is an exact integer, so both engines' decimal is exactly L/10^scale
    and the long sum telescopes identically — the late-round-7 q28 rewrite). Long
    capacity: 9.2e18 ten-thousandths = 9.2e14 in money units per group — far past any
    fixture SF."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    s = F.sum(F.floor(c * m + F.lit(0.5)).cast("long"))
    return round_det(s.cast(f"decimal(38,{scale})") / F.lit(m), 2).alias(alias)


def duck_round(expr: str, n: int = 2) -> str:
    """DuckDB SQL for the same deterministic rounding."""
    m = 10**n
    return f"FLOOR(CAST({expr} AS DOUBLE) * {m} + 0.5) / {m}.0"


def duck_sum2(expr: str, alias: str) -> str:
    """DuckDB SQL: exact decimal sum -> rounded double, matching money()."""
    return f"{duck_round(f'SUM(CAST({expr} AS DECIMAL(18,4)))', 2)} AS {alias}"

"""Driver-style Spark-vs-DuckDB comparison used by the test suite.

Mirrors the correctness gate: run the Spark builder and the DuckDB oracle on the same
parquet tables, then compare row count, column names, and an order-insensitive canonical
form (columns sorted by name, rows sorted, values normalized).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from rubix_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision: the engine is designed to match the oracle bit-for-bit
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple("" if x is None else str(x) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty → match)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    problems = []
    if sorted(s_cols) != sorted(c.lower() for c in o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    sc, s_can = canonical(s_cols, s_rows)
    oc, o_can = canonical([c.lower() for c in o_cols], o_rows)
    if s_can != o_can:
        diffs = [i for i, (a, b) in enumerate(zip(s_can, o_can)) if a != b]
        sample = [(i, s_can[i], o_can[i]) for i in diffs[:3]]
        problems.append(f"values differ in {len(diffs)}+ rows, cols={sc}, sample={sample}")
    return problems

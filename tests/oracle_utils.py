"""Driver-style Spark-vs-DuckDB comparison used by the test suite.

Mirrors the correctness gate: run the Spark builder and the DuckDB oracle on the same
parquet tables, then compare row count, column names, and an order-insensitive canonical
form (columns sorted by name, rows sorted, values normalized).

Both sides are fetched THROUGH PANDAS (`DataFrame.toPandas()` / duckdb `.df()`) because
that is the driver's rendering path. This is load-bearing for integer aggregates:
DuckDB SUM(BIGINT) yields HUGEINT, which pandas materializes as float64 (e.g. 153156.0),
while Spark returns int64 (153156) — a `fetchall()`-based gate silently normalizes that
divergence away (round-1 `x1_dedup_keep_first` hash FAIL escaped exactly this way).
Oracles must CAST integer SUMs to BIGINT; this gate now reproduces the failure if not.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from rubix_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run the oracle SQL, registering the testdata tables as views; fetch via pandas.

    Driver fixtures are single parquet files; generated scale fixtures
    (tools/gen_sf.py) are DIRECTORIES of part-files (invariant 14) — branch on isdir.
    """
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir.rstrip('/')}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    pdf = con.execute(sql).df()
    con.close()
    return pdf


def _norm(v):
    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision: the engine is designed to match the oracle bit-for-bit
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        v = v.to_pydatetime()
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # duckdb's .df() renders DATE as datetime64-at-midnight while Spark keeps
        # datetime.date; the driver treats them as equal (q9 passed r1) — mirror that
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(None if v is pd.NaT or v is None else v for v in row))
    return out


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple("" if x is None else str(x) for x in t))
    return [cols[i] for i in order], out


def compare_tolerant(spark_df, oracle: str, sf_dir: str, atol: float = 1e-3) -> list[str]:
    """``compare`` with a numeric guard band (ADVICE r6, q28_tpch_q1_fast): cell pairs
    that are both numeric pass when |delta| <= atol. For quantized-double oracles a
    cross-engine summation-order delta (~1e-6) can flip a FLOOR(x+0.5) boundary on
    some fixture generation — a 1-unit quantization flip is not a wrong answer, so
    the repo gate accepts it while still failing on genuine regressions."""
    s_pdf = spark_df.toPandas()
    o_pdf = run_oracle(oracle, sf_dir)
    o_pdf.columns = [c.lower() for c in o_pdf.columns]
    s_cols, o_cols = list(s_pdf.columns), list(o_pdf.columns)
    if sorted(s_cols) != sorted(o_cols):
        return [f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"]
    s_rows, o_rows = _rows(s_pdf), _rows(o_pdf)
    if len(s_rows) != len(o_rows):
        return [f"row count: spark={len(s_rows)} oracle={len(o_rows)}"]
    sc, s_can = canonical(s_cols, s_rows)
    _, o_can = canonical(o_cols, o_rows)
    # Re-sort with EXACT (non-float) columns dominating the key (ADVICE r7): a
    # within-atol delta in a float column that led the canonical sort could order the
    # two frames differently and misalign the positional zip. Float columns only
    # break ties among rows identical in every exact column.
    floatish = {
        c for c in sc
        if pd.api.types.is_float_dtype(s_pdf[c]) or pd.api.types.is_float_dtype(o_pdf[c])
    }
    order = [i for i, c in enumerate(sc) if c not in floatish] + [
        i for i, c in enumerate(sc) if c in floatish
    ]
    float_idx = {i for i, c in enumerate(sc) if c in floatish}

    def _key(t):
        # Float tiebreakers sort on their ATOL-GRANULARITY quantization, not
        # str(float) (ADVICE r8): two rows tied on every exact column whose float
        # cells differ within atol would otherwise order differently per engine
        # and misalign the positional zip. Quantized, within-atol values collapse
        # to (at worst adjacent) buckets, and cell_ok's atol band absorbs any
        # residual boundary straddle.
        parts = []
        for i in order:
            v = t[i]
            if v is None:
                parts.append("")
            elif i in float_idx:
                try:
                    parts.append(f"{round(float(v) / atol):+021d}")
                except (TypeError, ValueError, OverflowError):
                    parts.append(str(v))
            else:
                parts.append(str(v))
        return tuple(parts)

    s_can = sorted(s_can, key=_key)
    o_can = sorted(o_can, key=_key)

    def cell_ok(a, b) -> bool:
        if a == b:
            return True
        try:  # canonical floats are repr() strings; ints pass through
            return abs(float(a) - float(b)) <= atol
        except (TypeError, ValueError):
            return False

    def row_ok(ra, rb) -> bool:
        return all(cell_ok(a, b) for a, b in zip(ra, rb))

    # Rows tied on every EXACT column are compared as a MULTISET with greedy
    # matching (ADVICE r9): the quantized float tiebreaker can still split
    # within-atol values into adjacent buckets, so a positional zip inside a tied
    # group is order-sensitive at bucket boundaries. Groups are contiguous after
    # the exact-dominant sort; within one, each spark row claims the first
    # unclaimed oracle row within atol (groups are small — ties on all exact
    # columns — so O(g^2) is fine).
    def _exact_key(t):
        return tuple("" if t[i] is None else str(t[i]) for i in order
                     if i not in float_idx)

    bad: list[tuple] = []
    i = 0
    while i < len(s_can):
        j = i + 1
        ek = _exact_key(s_can[i])
        while j < len(s_can) and _exact_key(s_can[j]) == ek:
            j += 1
        if _exact_key(o_can[i]) != ek or (j < len(o_can) and _exact_key(o_can[j]) == ek):
            # group boundaries disagree -> exact columns differ; positional report
            bad.extend((i, a, b) for a, b in zip(s_can[i], o_can[i]) if not cell_ok(a, b))
            i += 1
            continue
        # maximum bipartite matching via augmenting paths (ADVICE r10): greedy
        # first-fit could false-FAIL at atol bucket boundaries — a spark row
        # claiming the only oracle row compatible with a later spark row — even
        # when a perfect matching exists. Groups are small (ties on all exact
        # columns), so the O(V*E) Hopcroft-lite walk is fine.
        owner: dict[int, int] = {}  # oracle idx -> spark idx

        def _augment(si: int, visited: set) -> bool:
            # iterative alternating-path DFS (ADVICE r11): the recursive form's
            # depth equals the reassignment-chain length, so a tied group past
            # ~1000 rows could blow Python's recursion limit and crash the
            # comparator instead of reporting a mismatch. Each frame is
            # (spark idx, candidate iterator, oracle idx that links it to its
            # parent); on reaching a free oracle row, ownership shifts one step
            # toward the root along the recorded chain — exactly the recursive
            # Kuhn unwind.
            stack = [(si, iter(range(i, j)), -1)]
            while stack:
                v, it, _ = stack[-1]
                pushed = False
                for u in it:
                    if u in visited or not row_ok(s_can[v], o_can[u]):
                        continue
                    visited.add(u)
                    if u not in owner:
                        owner[u] = v
                        for k in range(len(stack) - 1, 0, -1):
                            owner[stack[k][2]] = stack[k - 1][0]
                        return True
                    stack.append((owner[u], iter(range(i, j)), u))
                    pushed = True
                    break
                if not pushed:
                    stack.pop()
            return False

        for si in range(i, j):
            if not _augment(si, set()):
                bad.extend((si, a, b) for a, b in zip(s_can[si], o_can[si])
                           if not cell_ok(a, b))
        i = j
    return [f"values differ beyond atol={atol}: sample={bad[:3]}"] if bad else []


def compare(spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty → match)."""
    s_pdf = spark_df.toPandas()
    o_pdf = run_oracle(oracle, sf_dir)
    s_cols, o_cols = list(s_pdf.columns), [c.lower() for c in o_pdf.columns]
    problems = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    s_rows, o_rows = _rows(s_pdf), _rows(o_pdf)
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    sc, s_can = canonical(s_cols, s_rows)
    oc, o_can = canonical(o_cols, o_rows)
    if s_can != o_can:
        diffs = [i for i, (a, b) in enumerate(zip(s_can, o_can)) if a != b]
        sample = [(i, s_can[i], o_can[i]) for i in diffs[:3]]
        problems.append(f"values differ in {len(diffs)}+ rows, cols={sc}, sample={sample}")
    return problems

"""Property-based tests (hypothesis) for the cross-engine determinism layer.

These don't need Spark: they check that the *model* of our deterministic primitives
(floor-rounding, decimal sums, universal minhash) agrees with DuckDB's evaluation of the
same SQL text over arbitrary inputs — the foundation the oracle gate rests on.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import assume, given, settings
from hypothesis import strategies as st

# round_det's documented envelope: |x| <= 2^52 / 10^n keeps the +0.5 tick resolvable
# in x*10^n (see fns.round_det). Inputs BIND as doubles (con.execute params) — a VALUES
# literal would type as DECIMAL, and DuckDB's decimal->double cast (scaled-int64 ->
# double -> divide, two roundings) diverges from a correctly-rounded string parse once
# the scaled int exceeds 2^53. That literal-typing divergence — hypothesis-found at
# x = -900719925474.4451 in round 7 — is exactly why group SUMS never take the double
# path at all (they quantize in integer space; tests below).
_ROUND2_ENVELOPE = 2.0**52 / 100
finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False,
    min_value=-_ROUND2_ENVELOPE, max_value=_ROUND2_ENVELOPE,
)


def _duck(vals_sql: str, expr: str):
    con = duckdb.connect()
    return con.execute(f"SELECT {expr} FROM (VALUES {vals_sql}) t(x)").fetchall()


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=20))
def test_floor_round_matches_python_model(xs):
    """floor(x*100+0.5)/100 in DuckDB == the same IEEE ops in Python, for any double
    inside round_det's documented envelope, with the double bound as a parameter (the
    engines must hold the SAME input double — that is part of the contract)."""
    con = duckdb.connect()
    for x in xs:
        (g,) = con.execute("SELECT FLOOR(CAST(? AS DOUBLE) * 100 + 0.5) / 100.0", [x]).fetchone()
        expected = math.floor(x * 100 + 0.5) / 100.0
        assert g == expected or (math.isnan(g) and math.isnan(expected)), (x, g, expected)


unit_sums = st.integers(min_value=-(2**63) + 51, max_value=2**63 - 51)


@settings(max_examples=200, deadline=None)
@given(st.lists(unit_sums, min_size=1, max_size=20))
def test_integer_hundredths_finalize_matches_duckdb_at_any_magnitude(ss):
    """fns.money_sum_fast's finalize — h = (s+50)//100 on the exact long unit sum,
    then ONE int->double conversion — matches DuckDB's pmod-normalized `//` form for
    ANY int64 unit sum (the full capacity of the long fast path, no envelope). This is
    the foundation the round-8 oracle gate rests on: no double ever carries a sum."""
    con = duckdb.connect()
    for s in ss:
        g_h, g_out = con.execute(
            "SELECT ((t - (((t % 100) + 100) % 100)) // 100),"
            "       CAST(((t - (((t % 100) + 100) % 100)) // 100) AS DOUBLE) / 100"
            " FROM (SELECT CAST(? AS BIGINT) + 50 AS t)",
            [s],
        ).fetchone()
        h = (s + 50) // 100  # Python // floors — the model of the engines' div
        assert g_h == h, (s, g_h, h)
        assert g_out == h / 100.0, (s, g_out, h / 100.0)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**55), max_value=2**55),  # numerator must fit int64 at every scale pair
    st.integers(min_value=1, max_value=10**12),
    st.sampled_from([(4, 2), (2, 2), (4, 4), (0, 2), (0, 4)]),
)
def test_integer_average_finalize_matches_duckdb(s, c, scales):
    """fns.avg_units_det — the reduced floor((2*s*10^nd + 10^si*c)/(2*10^si*c)) in
    integer space — equals the half-up rounding of the exact rational (s/10^si)/c in
    both DuckDB and the Python model, at any magnitude inside int64 (q13/q28's money
    averages and the x3 integer-count averages)."""
    si, nd = scales
    if si >= nd:
        f = 10 ** (si - nd)
        num, den = 2 * s + f * c, 2 * f * c
    else:
        g = 10 ** (nd - si)
        num, den = 2 * g * s + c, 2 * c
    # the declared envelope (avg_units_det contract): the scaled numerator and
    # denominator must fit int64 — the up-scaling branch (si < nd) multiplies the sum
    # by 10^(nd-si), so the raw ±2^55 draw must be rejected where that product leaves
    # the envelope (Hypothesis found 2*10^4*s + c past 2^63 for the (0,4) pair; real
    # uses are token/char counts ~1e12 × 2*10^4 = 2e16, three orders inside)
    assume(abs(num) < 2**63 and 0 < den < 2**63)
    h = num // den  # Python floor division == the engines' pmod-normalized div
    # CAST the parameters: DuckDB types bare int literals as the NARROWEST fitting
    # integer, so (num % den) + den can overflow INT32 in the test harness — the
    # production oracles (duck_sum2/duck_avg_units) always operate on BIGINT sum and
    # count COLUMNS, which is what the casts reproduce here (found by Hypothesis at
    # den = 2*715827883 ≈ 1.4e9).
    (g,) = duckdb.connect().execute(
        "SELECT ((n - (((n % d) + d) % d)) // d) FROM "
        f"(SELECT CAST({num} AS BIGINT) AS n, CAST({den} AS BIGINT) AS d)"
    ).fetchone()
    assert g == h, (s, c, si, nd, g, h)
    # the integer result IS the half-up rounding of the exact rational
    from fractions import Fraction

    exact = Fraction(s, 10**si) / c * 10**nd
    assert h == math.floor(exact + Fraction(1, 2)), (s, c, si, nd)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9), min_size=2, max_size=50))
def test_decimal_sum_is_permutation_invariant(xs):
    """SUM(CAST(x AS DECIMAL(18,4))) must not depend on row order (the property double
    sums lack and the reason every money aggregate casts first)."""
    fwd = ", ".join(f"({x!r})" for x in xs)
    rev = ", ".join(f"({x!r})" for x in reversed(xs))
    a = _duck(fwd, "SUM(CAST(x AS DECIMAL(18,4)))")[0][0]
    b = _duck(rev, "SUM(CAST(x AS DECIMAL(18,4)))")[0][0]
    assert a == b


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_minhash_universal_hash_in_range(h):
    """(a*h+b) mod P stays within [0, P) and never overflows int64 for our constants."""
    from rubix_spark.ops.dedup import _A, _B, _P

    for a, b in zip(_A, _B):
        assert a * h + b < 2**63  # no 64-bit overflow in either engine
        assert 0 <= (a * h + b) % _P < _P


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA), max_size=80))
def test_tokenizer_parity_duckdb_vs_python_model(text):
    """The shared tokenizer (strip non-ASCII-alnum FIRST, then lower) matches the Python
    model for arbitrary unicode. The strip-then-lower order is load-bearing: unicode
    case folding differs between the JVM and DuckDB ('İ' U+0130), ASCII lowering doesn't —
    hypothesis originally caught the lower-then-strip version diverging."""
    import re

    from rubix_spark.ops._tok import duck_tokens

    con = duckdb.connect()
    got = con.execute(f"SELECT {duck_tokens('?')}", [text]).fetchone()[0]
    model = [t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split(" ") if t != ""]
    assert got == model


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500), max_size=60),
       st.integers(min_value=1, max_value=8))
def test_collate_partitions_input_into_contiguous_capped_runs(groups, max_run):
    """A4 collation invariants: runs cover exactly the distinct input, each run is
    contiguous and ascending, no run exceeds the cap, adjacent runs never mergeable."""
    from rubix_spark.cache.manager import CacheManager

    runs = CacheManager.collate(groups, max_run=max_run)
    flat = [i for run in runs for i in run]
    assert flat == sorted(set(groups))
    for run in runs:
        assert run == list(range(run[0], run[0] + len(run)))
        assert len(run) <= max_run
    for a, b in zip(runs, runs[1:]):
        # a gap, or the cap, must justify every split
        assert b[0] > a[-1] + 1 or len(a) == max_run


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=20), min_size=2, max_size=10),
       st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=50, unique=True))
def test_ring_removal_only_remaps_keys_of_the_removed_node(nodes, keys):
    """Rendezvous-hash stability (A12/A21): dropping one node must not move any key
    whose owner survives — the 1/n-remap property the reference's consistent hash
    guarantees (ClusterManager.java:43-46)."""
    from rubix_spark.cache.ring import locate_key

    nodes = sorted(nodes)
    before = {k: locate_key(k, nodes) for k in keys}
    victim = nodes[0]
    survivors = [n for n in nodes if n != victim]
    for k, owner in before.items():
        if owner != victim:
            assert locate_key(k, survivors) == owner


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9), st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_pack_two_level_prefix_sum_model(rows):
    """x9_pack's distributed form: block-local cumsum + per-block offsets telescopes to
    the oracle's single global cumsum for ANY doc_id spacing / token counts, and the
    double-division bin assignment floor((cum - n)/512.0) is exact while cumsum < 2^53
    (the documented scale dial — a 100 TB corpus is ~2.5e13 tokens, still inside it)."""
    rows = sorted(rows)
    budget, block = 512, 256
    # global model (the oracle)
    cum = 0
    want = []
    for doc_id, n in rows:
        cum += n
        want.append(math.floor((cum - n) / float(budget)))
    # two-level model (the Spark plan): per-block local cumsum + offset of prior blocks
    from collections import defaultdict

    btot = defaultdict(int)
    for doc_id, n in rows:
        btot[doc_id // block] += n
    boff = {}
    run = 0
    for b in sorted(btot):
        boff[b] = run
        run += btot[b]
    lcum = defaultdict(int)
    got = []
    for doc_id, n in rows:
        b = doc_id // block
        lcum[b] += n
        got.append(math.floor((boff[b] + lcum[b] - n) / float(budget)))
    assert got == want

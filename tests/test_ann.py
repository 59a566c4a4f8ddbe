"""ANN-specific correctness beyond the oracle gate.

- the BLAS brute-force twin must agree with the oracle-exact HOF variant (same top-k
  ids; sims equal at the rounded precision) — the twin is the 100 TB scoring path, the
  HOF variant is the proof.
"""

from __future__ import annotations

from rubix_spark.queries import load_all
from tests.conftest import SF_SMOKE, SF_T2

REG = load_all()


def test_bruteforce_np_matches_hof_exact(spark):
    for sf in (SF_SMOKE, SF_T2):
        hof = [(r.vec_id, r.sim) for r in REG["x2_ann_bruteforce"].builder(spark, sf).collect()]
        blas = [(r.vec_id, r.sim) for r in REG["x2_ann_bruteforce_np"].builder(spark, sf).collect()]
        assert len(hof) == len(blas) == 10
        assert [v for v, _ in hof] == [v for v, _ in blas]
        for (_, a), (_, b) in zip(hof, blas):
            assert abs(a - b) <= 1e-4, (a, b)  # rounded to 4 places; ulp drift only

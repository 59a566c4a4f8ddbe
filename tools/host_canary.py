"""Host-window canary (round-14): this VM oscillates between speed windows, and
the degradation is NOT uniform — measured 2026-08-17: a 3000x64 @ 64x3000 numpy
matmul (SIMD-heavy) ran 0.13 s in one window and 6.5-7.0 s minutes later in the
SAME process lifetime (~50x), while JVM-heavy query rows drift only 2-5x
(invariant 11). Any numpy/BLAS-kernel A/B timed across windows is garbage.

canary() returns (simd_ms, scalar_ms): a fixed small matmul+elementwise block
and a fixed pure-Python loop. Healthy on this box: simd < ~40 ms, scalar
< ~60 ms. Call it before AND after a timing block; if either side is degraded,
discard the block and re-run. `python tools/host_canary.py [n]` prints n
samples at 1 Hz.
"""

from __future__ import annotations

import time


def canary() -> tuple[float, float]:
    import numpy as np

    m = np.random.rand(512, 64)
    b = np.random.rand(512, 64)
    t0 = time.perf_counter()
    for _ in range(8):
        s = m @ b.T
        mask = (s >= 0.9) | np.isnan(s)
        mask.sum()
    simd_ms = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    x = 0
    for i in range(300_000):
        x += i * 31 % 97
    scalar_ms = (time.perf_counter() - t0) * 1000
    return round(simd_ms, 1), round(scalar_ms, 1)


def healthy(simd_ms: float, scalar_ms: float) -> bool:
    return simd_ms < 40.0 and scalar_ms < 60.0


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for _ in range(n):
        s, c = canary()
        print(f"simd_ms={s} scalar_ms={c} healthy={healthy(s, c)}", flush=True)
        if n > 1:
            time.sleep(1)

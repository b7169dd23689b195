"""Decompose the headline (host LDLT refactorize+solve, laplace2d(100)) into
phases so the 8.8 ms -> <=6 ms work targets the right component.

Phases per iteration:
  refact   F.refactorize(Ad)            (values cache hit -> host numeric only)
  native   native.factorize alone       (the C++ multifrontal numeric phase)
  solveh   F._solve_host(bh)            (C++ triangular solves, no container)
  solve    F.solve(b)                   (adds from_global device push)
  push     DistVector.from_global(x)    (the device push alone)

Usage: python tools/profile_headline.py [grid=100]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def laplace2d(m, dtype=np.float64):
    n = m * m
    main = np.full(n, 4.0, dtype)
    ex = np.ones(n - 1, dtype)
    ex[m - 1::m] = 0.0
    ey = np.ones(n - m, dtype)
    return sp.diags([main, -ex, -ex, -ey, -ey], [0, 1, -1, m, -m],
                    format="csr").astype(dtype)


def med_ms(fn, K=10, R=3):
    best = np.inf
    for _ in range(R):
        ts = []
        for _ in range(K):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(best, float(np.median(ts) * 1e3))
    return best


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import hpclinalg as hl

    be = hl.backend_auto(dtype=np.float64)
    A = laplace2d(g)
    n = g * g
    Ad = hl.DistSparseMatrix.from_scipy(A, be)
    bh = np.random.default_rng(0).standard_normal(n)
    b = hl.DistVector.from_global(bh, be)
    F = hl.ldlt(Ad)
    x = F.solve(b)
    resid = np.linalg.norm(A @ x.to_numpy() - bh) / np.linalg.norm(bh)
    print(f"n={n} resid={resid:.2e}")

    print(f"refact   {med_ms(lambda: F.refactorize(Ad)):7.3f} ms")

    # native numeric factorization alone (same args _numeric uses)
    from hpclinalg.solver import api as sapi
    vals = sapi._csr_values(Ad).astype(F.dtype)
    eps = 1e-10 * float(np.abs(vals).max())
    csc = F._csc_for(Ad, vals)
    print(f"native   {med_ms(lambda: F.native.factorize(F._lib, csc, F.kind, eps, pivot=False)):7.3f} ms")
    F.refactorize(Ad)

    print(f"unstab   {med_ms(lambda: F._unstable()):7.3f} ms")
    print(f"solveh   {med_ms(lambda: F._solve_host(bh, False)):7.3f} ms")
    print(f"solve    {med_ms(lambda: F.solve(b)):7.3f} ms")
    xs = F._solve_refined(bh, False, 0)
    print(f"push     {med_ms(lambda: hl.DistVector.from_global(xs, be, partition=Ad.row_partition, dtype=np.float64)):7.3f} ms")

    both = med_ms(lambda: (F.refactorize(Ad), F.solve(b)))
    print(f"TOTAL    {both:7.3f} ms")


if __name__ == "__main__":
    main()

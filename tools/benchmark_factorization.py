"""Factorization benchmark — mirrors the reference's
tools/benchmark_factorization.jl (2D Laplacian kron construction :32-39,
barrier-bracketed medians with warmup :47-66) plus the 3D Poisson workload
from BASELINE.md.

Usage: python tools/benchmark_factorization.py [--grid2d K] [--grid3d K]
"""

import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def laplace2d(k):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def laplace3d(k):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
            + sp.kron(sp.kron(I, I), T)).tocsr()


def run(A, name, reps=5):
    import hpclinalg as hl

    n = A.shape[0]
    be = hl.backend_auto(dtype=np.float64)
    Ad = hl.DistSparseMatrix.from_scipy(A, be)
    b = hl.DistVector.from_global(np.random.default_rng(0).standard_normal(n), be)

    t0 = time.perf_counter()
    F = hl.ldlt(Ad)
    t_first = time.perf_counter() - t0
    x = F.solve(b)

    tf, ts = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        F.refactorize(Ad)
        tf.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        x = F.solve(b)
        ts.append(time.perf_counter() - t0)
    resid = np.linalg.norm(A @ x.to_numpy() - b.to_numpy()) / np.linalg.norm(b.to_numpy())
    print(f"{name}: n={n} nnz={A.nnz} lnz={F.sym.lnz} nsuper={F.sym.nsuper}")
    print(f"  first factor (symbolic+numeric): {1e3*t_first:9.1f} ms")
    print(f"  refactorize (numeric only):      {1e3*np.median(tf):9.2f} ms")
    print(f"  solve:                           {1e3*np.median(ts):9.2f} ms")
    print(f"  relative residual:               {resid:.2e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid2d", type=int, default=100)
    ap.add_argument("--grid3d", type=int, default=0)
    args = ap.parse_args()
    if args.grid2d:
        run(laplace2d(args.grid2d), f"2D Laplacian {args.grid2d}^2")
    if args.grid3d:
        run(laplace3d(args.grid3d), f"3D Poisson {args.grid3d}^3", reps=3)

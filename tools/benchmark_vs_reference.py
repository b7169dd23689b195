"""Head-to-head table against the reference's published numbers
(BASELINE.md) — the analogue of tools/benchmark_vs_petsc.jl's comparison
report. Run on the real TPU (default platform) for the record:

    python tools/benchmark_vs_reference.py
"""

import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def med(f, iters, sync):
    f()
    sync()
    out = []
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f()
        sync(r)
        out.append((time.perf_counter() - t0) / iters)
    return min(out) * 1e3


def main():
    import jax.numpy as jnp

    import hpclinalg as hl

    rows = []

    # --- LDLT factor + solve, n=10,000 (ref: 17.27 + 5.94 = 23.2 ms) -------
    be = hl.backend_auto(dtype=np.float64)
    A = laplace2d(100)
    Ad = hl.DistSparseMatrix.from_scipy(A, be)
    b = hl.DistVector.from_global(np.random.default_rng(0).standard_normal(10000), be)
    F = hl.ldlt(Ad)
    x = F.solve(b)

    def fs():
        F.refactorize(Ad)
        return F.solve(b)

    ms = med(fs, 5, lambda *a: None)
    resid = np.linalg.norm(A @ x.to_numpy() - b.to_numpy()) / np.linalg.norm(b.to_numpy())
    rows.append(("LDLT factor+solve n=1e4", 23.2, ms, f"resid {resid:.1e}"))

    # --- SpGEMM A*A (ref: 1.216 ms) -----------------------------------------
    bef = hl.backend_auto(dtype=np.float32)
    Af = laplace2d(100, np.float32)
    Adf = hl.DistSparseMatrix.from_scipy(Af, bef, dtype=np.float32)
    C = Adf @ Adf

    ms = med(lambda: Adf @ Adf, 20, lambda *a: float(jnp.sum(a[0].nzval)) if a else None)
    err = abs((Adf @ Adf).to_scipy() - Af @ Af).max()
    rows.append(("SpGEMM A*A n=1e4", 1.216, ms, f"err {err:.1e}"))

    # --- SpMV 1e6 (no ref number; roofline interest) -------------------------
    A6 = laplace2d(1000, np.float32)
    Ad6 = hl.DistSparseMatrix.from_scipy(A6, bef, dtype=np.float32)
    x6 = hl.DistVector.rand(10 ** 6, bef, dtype=np.float32)
    ms = med(lambda: Ad6 @ x6, 20, lambda *a: float(jnp.sum(a[0].data)) if a else None)
    rows.append(("SpMV Laplacian n=1e6", None, ms, "DIA engine"))

    print(f"{'workload':28s} {'reference':>10s} {'hpclinalg':>10s}  notes")
    for name, ref, ours, note in rows:
        r = f"{ref:8.2f}ms" if ref else "       --"
        print(f"{name:28s} {r:>10s} {ours:8.2f}ms  {note}")


if __name__ == "__main__":
    main()

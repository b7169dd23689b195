"""SpMV roofline benchmark vs HBM peak — the BASELINE.json north-star
metric (SpMV at HBM speed-of-light per chip). Mirrors the reference's
benchmark_single_rank.jl workload shapes (random nnz/row ~ 10 symmetric)
plus the Laplacian stencil workloads that exercise the DIA engine.

NOTE: timings sync via scalar readback — block_until_ready is unreliable
through the axon relay (see .claude/skills/verify/SKILL.md).
"""

import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def laplace2d(k, dtype):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def bench(Ad, x, iters=30):
    import jax.numpy as jnp

    y = Ad @ x
    _ = float(jnp.sum(y.data))  # sync warmup
    best = np.inf
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = Ad @ x
        _ = float(jnp.sum(y.data))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, y


def main():
    import hpclinalg as hl
    from hpclinalg.ops.spmv import get_spmv_plan

    dtype = np.float32
    be = hl.backend_auto(dtype=dtype)
    rng = np.random.default_rng(0)
    cases = [("laplace 100^2", laplace2d(100, dtype)),
             ("laplace 1000^2", laplace2d(1000, dtype)),
             ("random nnz/row~10 n=1e5",
              sp.random(100_000, 100_000, 1e-4, format="csr",
                        random_state=rng).astype(dtype))]
    for name, A in cases:
        n = A.shape[0]
        Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
        xh = rng.standard_normal(n).astype(dtype)
        x = hl.DistVector.from_global(xh, be, dtype=dtype)
        ms, y = bench(Ad, x)
        err = np.abs(y.to_numpy() - A @ xh).max()
        plan = get_spmv_plan(Ad, x)
        engine = "DIA" if plan.offsets is not None else "seg"
        gf = 2 * A.nnz / (ms / 1e3) / 1e9
        print(f"{name:26s} [{engine}]: {ms:8.3f} ms  {gf:7.2f} GF/s  err={err:.1e}")


if __name__ == "__main__":
    main()

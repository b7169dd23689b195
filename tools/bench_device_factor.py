"""Steady-state device multifrontal factor+solve timing at 2D k^2
(bench.py's device_chol_factor_262k methodology, standalone so kernel
changes can be measured without a full bench run).

    python tools/bench_device_factor.py [k=512] [kind=chol]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kind = sys.argv[2] if len(sys.argv) > 2 else "chol"
    import jax
    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.config import enable_compile_cache

    enable_compile_cache()
    from hpclinalg.parallel.mesh import allgather_full

    be = hl.backend_auto(dtype=np.float64)
    A2 = laplace2d(k)
    A2d = hl.DistSparseMatrix.from_scipy(A2, be)
    t0 = time.perf_counter()
    Fd = hl.ldlt(A2d, method="device", spd=(kind == "chol"))
    print(f"plan/schedule {time.perf_counter() - t0:.1f}s", flush=True)
    st2 = A2d.structure
    nnzb = np.concatenate([[0], np.cumsum(st2.nnz_local)]).astype(np.int64)
    Av2 = allgather_full(A2d.nzval, nnzb, be)
    eps2 = np.float32(1e-7 * float(jnp.max(jnp.abs(A2d.nzval))))

    def sync(x):
        float(jnp.sum(x))

    t0 = time.perf_counter()
    out = Fd.engine.factor(Av2, eps2)
    sync(out[0][-1][0])
    print(f"first factor (compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = Fd.engine.factor(Av2, eps2)
        sync(out[0][-1][0])
        ts.append(time.perf_counter() - t0)
    print(f"factor steady: {np.median(ts) * 1e3:.1f} ms  "
          f"(min {min(ts) * 1e3:.1f})", flush=True)

    b2 = hl.DistVector.from_global(
        np.random.default_rng(3).standard_normal(k * k), be,
        dtype=np.float32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        x = Fd.solve(b2, refine=0)
        sync(x.data)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            x = Fd.solve(b2, refine=0)
            sync(x.data)
            ts.append(time.perf_counter() - t0)
    print(f"solve steady: {np.median(ts) * 1e3:.1f} ms  "
          f"(min {min(ts) * 1e3:.1f})", flush=True)
    xr = Fd.solve(b2)
    resid = np.linalg.norm(A2 @ xr.to_numpy() - np.asarray(
        b2.to_numpy())) / np.linalg.norm(b2.to_numpy())
    print(f"resid (refined): {resid:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Shuffle-engine benchmark: plan construction + SpMV throughput + route
stats for random-sparsity patterns (the KA CSR-kernel role,
/root/reference/src/sparse.jl:2055).

    python tools/bench_shuffle.py [n_log2=20] [nnz_per_row=8]

On a TPU backend this drives the deployed static-shuffle tier; elsewhere
it reports the ELL/XLA fallback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << nlog

    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.config import enable_compile_cache
    from hpclinalg.ops.pallas_shuffle import (build_spmv_shuffle,
                                              shuffle_available,
                                              shuffle_spmv)
    from hpclinalg.ops.spmv import get_spmv_plan

    enable_compile_cache()
    rng = np.random.default_rng(5)
    rows = np.repeat(np.arange(n), W)
    cols = rng.integers(0, n, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32),
                       (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    xv = hl.DistVector.from_global(x, be, dtype=np.float32)
    plan = get_spmv_plan(Ad, xv)
    print(f"n={n} nnz={A.nnz} tier: ell={plan.ell} "
          f"shuffle={shuffle_available(be, Ad.structure)}")
    t0 = time.perf_counter()
    packed = build_spmv_shuffle(Ad, plan, int(xv.data.shape[1]))
    print(f"plan build: {time.perf_counter()-t0:.1f} s  "
          f"tables {packed.table_bytes()/1e6:.0f} MB  "
          f"spill {len(np.asarray(packed.plan.spill_dst))}")
    y = shuffle_spmv(Ad, plan, xv.data)
    err = np.linalg.norm(np.asarray(y).ravel()[:n] - A @ x) \
        / np.linalg.norm(A @ x)
    print(f"rel err {err:.2e}")
    float(jnp.sum(y))
    N = 16
    t0 = time.perf_counter()
    for _ in range(N):
        y = shuffle_spmv(Ad, plan, xv.data)
    float(jnp.sum(y))
    t1 = time.perf_counter()
    float(jnp.sum(xv.data))
    rtt = time.perf_counter() - t1
    ms = max((t1 - t0) - rtt, (t1 - t0) / 2) / N * 1e3
    print(f"SpMV {ms:.2f} ms = {A.nnz/(ms/1e3)/1e9:.2f} Gelem/s "
          f"(XLA gather path is ~0.1)")


if __name__ == "__main__":
    main()

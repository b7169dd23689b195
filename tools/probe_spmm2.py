"""Round-2 SpMM probe: XLA formulations of the deployed random-SpMM tier.

probe_spmm_variants measured the plain row-gather at 45.3 ms while the
deployed `_ell_spmm_exec` path benches 59.6 ms — this isolates where the
~14 ms of wrapper overhead lives and tests einsum fusion of the
multiply-reduce.

  base     take + mul + sum                (probe_spmm_variants base)
  einsum   take + einsum('nwk,nw->nk')     (fused multiply-reduce)
  deployed _ell_apply(..., spmm=True)      (the shipped tier, via plan)
  nobar    deployed math, no _ub barrier / pad / tail

Usage: python tools/probe_spmm2.py [n=1000000] [k=64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = 8
    import jax
    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.ops.spmv import _ell_apply, get_spmv_plan

    rng = np.random.default_rng(2)  # the bench workload
    rows = np.repeat(np.arange(n, dtype=np.int64), W)
    cols = rng.integers(0, n, size=n * W)
    Ar = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32),
                        (rows, cols)), shape=(n, n))
    Ar.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    Ad = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
    xv = hl.DistVector.from_global(
        rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, xv)
    G = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    colsj = jnp.asarray(rng.integers(0, n, (n, W)).astype(np.int32))
    valsj = jnp.asarray(rng.standard_normal((n, W)).astype(np.float32))

    @jax.jit
    def base(G, cols, vals):
        gr = jnp.take(G, cols.reshape(-1), axis=0).reshape(n, W, k)
        return jnp.sum(vals[:, :, None] * gr, axis=1)

    @jax.jit
    def einsum(G, cols, vals):
        gr = jnp.take(G, cols.reshape(-1), axis=0).reshape(n, W, k)
        return jnp.einsum("nwk,nw->nk", gr, vals)

    Gb = G[None]

    @jax.jit
    def deployed(Gb):
        return _ell_apply(Ad, plan, Gb, spmm=True)

    def timeit(fn, args, n_rep=6):
        out = fn(*args)
        jax.block_until_ready(out)
        def run(K):
            t0 = time.perf_counter()
            o = None
            for _ in range(K):
                o = fn(*args)
            jax.block_until_ready(o)
            return time.perf_counter() - t0
        t1 = min(run(2) for _ in range(3))
        t2 = min(run(2 + n_rep) for _ in range(3))
        return (t2 - t1) / n_rep * 1e3

    for name, fn, args in (("base", base, (G, colsj, valsj)),
                           ("einsum", einsum, (G, colsj, valsj)),
                           ("deployed", deployed, (Gb,))):
        t = timeit(fn, args)
        print(f"{name:9s} {t:8.2f} ms   {Ar.nnz * k / t / 1e6:6.2f} Gelem/s",
              flush=True)


if __name__ == "__main__":
    main()

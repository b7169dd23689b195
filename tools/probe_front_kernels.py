"""Per-level front-kernel A/B probe for the device multifrontal factor.

The 262k 2D profile (tools/profile_device_mf.py) attributes ~100 ms of the
169 ms steady factor to the front kernels (cholesky + trsm + syrk) whose
total flops are ~20 GFLOP — 0.5% of the f32 MXU rate, i.e. the time is
While-loop iteration overhead inside lax.linalg.cholesky / triangular_solve
at small NC, not compute. This probe times, per real level geometry of the
512^2 workload:

  cur    lax.linalg.cholesky + _tri trsm + matmul syrk   (the shipped kernel)
  inv    blocked cholesky-with-inverse: L11 and L11^{-1} by recursive
         2x2 blocking (MXU matmuls), L21 = F21 @ Linv^T (pure MXU)

Usage: python tools/probe_front_kernels.py [k=512]
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
    import jax
    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.solver.device_mf import DeviceMF, _tri, chol_inv_blocked

    be = hl.backend_auto(dtype=np.float32)
    A = laplace2d(k)
    eng = DeviceMF(A, be, kind="chol")
    geom = [(m.B, m.NC, m.NF) for m in eng.local_levels]
    print("levels:", geom, flush=True)

    rng = np.random.default_rng(0)

    def spd_batch(B, NC, NF):
        # well-conditioned SPD F11 + generic F21
        G = rng.standard_normal((B, NC, NC)).astype(np.float32) * 0.1
        F11 = G @ G.transpose(0, 2, 1) + np.eye(NC, dtype=np.float32)[None] * NC
        F21 = rng.standard_normal((B, NF - NC, NC)).astype(np.float32)
        return jnp.asarray(F11), jnp.asarray(F21)

    def cur_kernel(F11, F21):
        L11 = jax.lax.linalg.cholesky(F11, symmetrize_input=False)
        L21 = _tri(L11, F21, left_side=False, lower=True, transpose_a=True)
        U = jnp.matmul(L21, jnp.swapaxes(L21, 1, 2))
        return L11, L21, U

    def inv_kernel(F11, F21):
        L11, Linv = chol_inv_blocked(F11)
        L21 = jnp.matmul(F21, jnp.swapaxes(Linv, 1, 2))
        U = jnp.matmul(L21, jnp.swapaxes(L21, 1, 2))
        return L11, L21, U

    def timeit(fn, args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        for _ in range(3 * n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t1 - (t1 - t0)) / (2 * n) * 1e3

    nlev = int(sys.argv[2]) if len(sys.argv) > 2 else len(geom)
    tot_cur = tot_inv = 0.0
    for (B, NC, NF) in geom[:nlev]:
        F11, F21 = spd_batch(B, NC, NF)
        jc = jax.jit(cur_kernel)
        ji = jax.jit(inv_kernel)
        tc = timeit(jc, (F11, F21))
        ti = timeit(ji, (F11, F21))
        # accuracy check of the inv path vs the direct one
        Lc, L21c, _ = jc(F11, F21)
        Li, L21i, _ = ji(F11, F21)
        err = float(jnp.max(jnp.abs(L21c - L21i)) /
                    (1e-6 + jnp.max(jnp.abs(L21c))))
        tot_cur += tc
        tot_inv += ti
        print(f"B={B:6d} NC={NC:5d} NF={NF:5d}: cur {tc:7.2f} ms  "
              f"inv {ti:7.2f} ms  relerr {err:.2e}", flush=True)
    print(f"TOTAL: cur {tot_cur:.1f} ms   inv {tot_inv:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: device multifrontal factor+solve time under AMD vs ND
ordering at 2D k^2 (default 512^2 = 262k), f32 chol.

Usage: python tools/ab_ordering_device.py [k=512] [modes=amd,nd]
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def median_ms(fn, sync, n=5):
    out = fn()
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    modes = (sys.argv[2] if len(sys.argv) > 2 else "amd,nd").split(",")

    import jax
    import jax.numpy as jnp

    from hpclinalg.backend import backend_auto
    from hpclinalg.solver import symbolic
    from hpclinalg.solver.device_mf import DeviceMF
    from hpclinalg.solver.ordering import amd_order, nd_order

    A = laplace2d(k)
    be = backend_auto(nshards=1, dtype=np.float32)
    Avals = jnp.asarray(A.data.astype(np.float32))
    eps = np.float32(1e-7 * float(np.abs(A.data).max()))
    b = jnp.asarray(np.random.default_rng(3).standard_normal(k * k),
                    dtype=jnp.float32)

    orig_best = symbolic.analyze_best

    def forced(order_fn):
        def best(A_csr, **kw):
            p = order_fn(A_csr.indptr.astype(np.int64),
                         A_csr.indices.astype(np.int64), A_csr.shape[0])
            return symbolic.analyze(A_csr, p, **kw)
        return best

    for mode in modes:
        if mode == "amd":
            symbolic.analyze_best = forced(amd_order)
        elif mode == "nd":
            symbolic.analyze_best = forced(nd_order)
        else:
            symbolic.analyze_best = orig_best
        t0 = time.time()
        mf = DeviceMF(A, be, kind="chol", dtype=np.float32)
        build_s = time.time() - t0

        def sync(out):
            # scalar readback forces completion through the relay —
            # block_until_ready returns at dispatch, not completion, there
            float(jnp.sum(jnp.abs(out)))

        t0 = time.time()
        tf = median_ms(lambda: mf.factor(Avals, eps)[0][-1][0], sync, n=5)
        fac_total = time.time() - t0
        fac = mf.factor(Avals, eps)
        ts = median_ms(lambda: mf.solve(fac, b), sync, n=5)
        print(f"[{mode}] build={build_s:.0f}s compile+meas={fac_total:.0f}s "
              f"factor={tf:.1f}ms solve={ts:.1f}ms "
              f"(nlevels={len(mf.local_levels)+len(mf.top_levels)}, "
              f"nsuper={mf.sym.nsuper})", flush=True)
    symbolic.analyze_best = orig_best


if __name__ == "__main__":
    main()

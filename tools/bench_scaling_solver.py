"""Multi-shard scaling probe for the ROUND-3/4 paths: device multifrontal
factor, row-distributed solve, and the stacked shuffle-tier route build —
on the virtual CPU mesh (VERDICT r4 item 9; ref multi-rank harness:
/root/reference/tools/benchmark_factorization.jl).

The CI host is 1-core, so wall-clock cannot strong-scale; the rows verify
the OBJECTIVE scaling quantities instead: the solve phase's per-device
buffer contract O(n/S + |top|) (cuDSS row-1d role, CUDAExt:672-689), the
stacked common-geometry route tables, and that factor/solve run and agree
with the oracle at every shard count.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import hpclinalg as hl

    k = 128
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    A = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))).tocsr() \
        .astype(np.float32)
    n = k * k
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(np.float32)

    out = {"n": n, "shards": [], "factor_ms": [], "solve_ms": [],
           "resid": [], "solve_pad_frac_of_n": []}
    for S in (1, 2, 4, 8):
        be = hl.backend_auto(nshards=S, dtype=np.float32)
        Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
        bd = hl.DistVector.from_global(b, be, dtype=np.float32)
        F = hl.ldlt(Ad, method="device", spd=True)
        x = F.solve(bd, refine=0)  # warm (compile) both executables
        t0 = time.perf_counter()
        F._numeric(Ad)
        tf = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        x = F.solve(bd, refine=0)
        ts = (time.perf_counter() - t0) * 1e3
        r = float(np.linalg.norm(A @ np.asarray(x.to_numpy(), np.float64)
                                 - b) / np.linalg.norm(b))
        # per-device memory contract: the solve's compact in-plan buffer is
        # O(n/S + |top|), NOT O(n)
        pad = int(F.engine.in_plan.out_pad)
        out["shards"].append(S)
        out["factor_ms"].append(round(tf, 1))
        out["solve_ms"].append(round(ts, 1))
        out["resid"].append(float(f"{r:.2e}"))
        out["solve_pad_frac_of_n"].append(round(pad / n, 3))
    # contract: at 8 shards the compact buffer is well under n
    out["memory_contract_ok"] = out["solve_pad_frac_of_n"][-1] < 0.6

    # stacked shuffle route at 2 shards: common geometry + oracle match
    try:
        import jax.numpy as jnp

        import hpclinalg.ops.spmv as spmv_mod
        from hpclinalg.ops.pallas_shuffle import (_StackedRoutes,
                                                  build_spmv_shuffle,
                                                  shuffle_spmv)
        from hpclinalg.ops.spmv import get_spmv_plan

        nr = 4096
        W = 6
        rows = np.repeat(np.arange(nr), W)
        cols = rng.integers(0, nr, nr * W)
        Ar = sp.csr_matrix((rng.standard_normal(nr * W).astype(np.float32),
                            (rows, cols)), shape=(nr, nr))
        Ar.sum_duplicates()
        be2 = hl.backend_auto(nshards=2, dtype=np.float32)
        old = spmv_mod.DENSE_MAX_ELEMS
        spmv_mod.DENSE_MAX_ELEMS = 0
        try:
            Ard = hl.DistSparseMatrix.from_scipy(Ar, be2, dtype=np.float32)
            xr = rng.standard_normal(nr).astype(np.float32)
            xv = hl.DistVector.from_global(xr, be2, dtype=np.float32)
            plan = get_spmv_plan(Ard, xv)
            xb = plan.exchange.apply(xv.data)
            packed = build_spmv_shuffle(Ard, plan, int(xb.shape[1]))
            assert isinstance(packed, _StackedRoutes)
            y = np.asarray(shuffle_spmv(Ard, plan, xb, interpret=True))
            Lrow = Ard.structure.Lrow
            got = np.concatenate([y[s][: min(Lrow, nr - s * Lrow)]
                                  for s in range(2)])
            err = float(np.linalg.norm(got - Ar @ xr)
                        / np.linalg.norm(Ar @ xr))
            out["shuffle_2shard"] = {
                "stacked": True, "err": float(f"{err:.2e}"),
                "table_mb": round(packed.table_bytes() / 1e6, 1),
                "banks": [packed.KAe, packed.KB1e, packed.KB2e]}
        finally:
            spmv_mod.DENSE_MAX_ELEMS = old
    except Exception as e:  # pragma: no cover
        out["shuffle_2shard"] = {"error": str(e)[:150]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()

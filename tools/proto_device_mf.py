"""Prototype: device-resident multifrontal Cholesky (SPD), level-scheduled.

The design stage after the host engine (docs/device_solver_design.md): the
supernode tree is cut into levels; each level's fronts are padded to a
common size and factored as ONE batch of MXU-native ops
(cholesky / triangular_solve / matmul), with extend-add between levels as
static scatter-adds. The triangular solve runs the same schedule.

This is a tools/ prototype: SPD-only, one bucket per level, correctness
validated against scipy, timed on the real chip. The production wiring
(shard_map distribution, LDLT Pallas kernel for indefinite, bucketing)
is round-2 work.

Usage: python tools/proto_device_mf.py [--cpu] [--grid K]
"""

import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _maybe_cpu():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=4"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


_maybe_cpu()

import jax
import jax.numpy as jnp

from hpclinalg.solver import ordering, symbolic


def laplace2d(k):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


from hpclinalg.solver.device_chol import DeviceCholesky  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=100)
    args = ap.parse_args()
    A = laplace2d(args.grid)
    n = A.shape[0]
    dc = DeviceCholesky(A, dtype=np.float32)
    print(f"n={n}, nsuper={dc.sym.nsuper}, levels={len(dc.levels)}, "
          f"level sizes (last 5): {[len(l) for l in dc.levels[-5:]]}", flush=True)
    vals = np.ascontiguousarray(dc.Ap.data)
    t0 = time.perf_counter()
    factors = dc.factor(vals)
    jax.block_until_ready(factors)
    print(f"first factor (incl compile): {time.perf_counter()-t0:.1f} s", flush=True)
    b = np.random.default_rng(0).standard_normal(n)
    x = np.asarray(dc.solve(factors, b))
    resid = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    print(f"device solve resid (f32): {resid:.2e}", flush=True)
    best = np.inf
    for _t in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            factors = dc.factor(vals)
        s = float(jnp.sum(factors[0][-1]))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"device factor steady state: {best*1e3:.1f} ms "
          f"(host C++ engine: ~5.2 ms f64 on this workload)")


if __name__ == "__main__":
    main()

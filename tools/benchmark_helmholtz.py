"""Complex Helmholtz LU + block-matrix API over a multi-shard mesh —
(run with --cpu: complex device arrays are UNIMPLEMENTED on some TPU
generations, including the v5e used in round-1 benchmarking) —
BASELINE.md workload 5 ("ComplexF64 Helmholtz LU + block-matrix API on
sub-meshes, 8-64 shards"; shard counts here bounded by available devices).

Usage: python tools/benchmark_helmholtz.py [--cpu] [--grid K] [--shards S]
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
            " --xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


_maybe_cpu()


def helmholtz2d(k, wavenum=2.0, damping=0.05):
    """-(Laplacian) - (wavenum^2 - i*damping) I — complex symmetric."""
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    L = sp.kron(I, T) + sp.kron(T, I)
    h = 1.0 / (k + 1)
    return (L / h**2 - (wavenum**2 - 1j * damping) * sp.eye(k * k)).tocsr()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=60)
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args()

    import hpclinalg as hl

    be = hl.backend_auto(nshards=args.shards, dtype=np.complex128)
    H = helmholtz2d(args.grid)
    n = H.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    # block assembly exercise: H assembled from 2x2 sub-blocks through the
    # distributed block API, then compared against the monolithic operator
    half = n // 2
    blocks = [hl.DistSparseMatrix.from_scipy(sp.csr_matrix(H[r0:r1, c0:c1]), be,
                                             dtype=np.complex128)
              for (r0, r1) in ((0, half), (half, n))
              for (c0, c1) in ((0, half), (half, n))]
    Hd = hl.cat_sparse(*blocks, dims=(2, 2))
    blk_err = abs(Hd.to_scipy() - H).max()
    assert blk_err <= 1e-6 * abs(H).max(), f"block assembly error {blk_err}"


    bd = hl.DistVector.from_global(b, be, dtype=np.complex128)
    t0 = time.perf_counter()
    F = hl.lu(Hd)
    t1 = time.perf_counter()
    x = F.solve(bd)
    t2 = time.perf_counter()
    resid = np.linalg.norm(H @ x.to_numpy() - b) / np.linalg.norm(b)
    print(f"Helmholtz {args.grid}^2 (n={n}, complex128, {be.nshards} shards): "
          f"LU {1e3*(t1-t0):.1f} ms, solve {1e3*(t2-t1):.1f} ms, resid {resid:.2e}")
    # multi-RHS
    B = rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
    Bd = hl.DistDenseMatrix.from_global(B, be, dtype=np.complex128)
    X = F.solve_matrix(Bd)
    r2 = np.linalg.norm(H @ X.to_numpy() - B) / np.linalg.norm(B)
    print(f"  multi-RHS (k=4) resid {r2:.2e}")


if __name__ == "__main__":
    main()

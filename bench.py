"""Headline benchmark — prints ONE JSON line.

Workload: SpGEMM A·A on the 2D Laplacian 100² (n=10,000, nnz=49,600) — the
reference's PETSc head-to-head workload (/root/reference/tools/
benchmark_vs_petsc.jl), where HPCLinearAlgebra.jl reports 1.216 ms on
4 MPI ranks / 3 threads (tools/benchmark_vs_petsc_results.txt:8-10).

Methodology mirrors the reference's harness: warmup (plan construction +
compile), then median of timed executions of the steady-state value-only
path (barrier-bracketed MPI.Wtime medians, benchmark_factorization.jl:47-66;
here block_until_ready brackets).
"""

import json
import time

import numpy as np
import scipy.sparse as sp

BASELINE_MS = 1.216  # reference SpGEMM A*A, 4 ranks (BASELINE.md)


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def main():
    import jax

    import hpclinalg as hl

    platform = jax.devices()[0].platform
    # float32 on TPU (f64 is emulated); float64 elsewhere for reference parity
    dtype = np.float32 if platform != "cpu" else np.float64

    be = hl.backend_auto(dtype=dtype)
    A = laplace2d(100, dtype)  # n=10,000, nnz=49,600
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)

    # warmup: plan construction + compile + one full product
    C = Ad @ Ad
    C.nzval.block_until_ready()

    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        C = Ad @ Ad
        C.nzval.block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)

    # sanity: result correct
    err = abs(C.to_scipy() - (A @ A)).max()
    assert err < (1e-8 if dtype == np.float64 else 1e-2), f"SpGEMM wrong: {err}"

    print(json.dumps({
        "metric": f"spgemm_AxA_laplace100sq_ms_{np.dtype(dtype).name}_{platform}",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()

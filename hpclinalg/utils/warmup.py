"""Warmup: pre-populate jit caches with tiny instances of every hot op.

Analogue of the reference's PrecompileTools @compile_workload
(/root/reference/src/HPCLinearAlgebra.jl:1473-1607). First compiles on TPU
can cost tens of seconds; running this once at process start moves that
cost out of the first real operation.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


from ..solver.api import Symmetric  # noqa: F401 (re-export; lives with solve)


def warmup(backend) -> None:
    """Run tiny versions of the hot ops to populate jit caches."""
    from ..dense import DistDenseMatrix
    from ..sparse import DistSparseMatrix
    from ..vector import DistVector
    from ..solver.api import ldlt

    n = 16
    rng = np.random.default_rng(0)
    T = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    R = sp.random(n, n, 0.3, format="csr", random_state=rng) + sp.eye(n)
    A = DistSparseMatrix.from_scipy(T, backend)      # DIA engine
    B = DistSparseMatrix.from_scipy(R, backend)      # fallback engine
    x = DistVector.from_global(rng.standard_normal(n), backend)
    M = DistDenseMatrix.from_global(rng.standard_normal((n, 4)), backend)

    _ = (A @ x).data
    _ = (B @ x).data
    _ = (A + B).nzval
    _ = (A @ B).nzval
    _ = A.transpose_materialized().nzval
    _ = (A @ M).data
    _ = x.dot(x)
    _ = x[2: n - 2].data
    F = ldlt(A)
    _ = F.solve(x)

"""Shared test helpers mirroring /root/reference/test/test_utils.jl:
deterministic generators (:90-124), per-dtype tolerances (:154-157), and the
SPMD-safety assertions (assert_uniform :169, assert_type :281) translated to
their TPU analogues: padding-invariant checks and exact container checks."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def tolerance(dtype) -> float:
    """Ref: tolerance (test_utils.jl:154-157)."""
    dt = np.dtype(dtype)
    if dt in (np.dtype(np.float64), np.dtype(np.complex128)):
        return 1e-10
    return 1e-4


def tridiagonal_matrix(n: int, dtype=np.float64) -> sp.csr_matrix:
    """Ref: tridiagonal_matrix (test_utils.jl:90)."""
    main = np.full(n, 2.0)
    off = np.full(n - 1, -1.0)
    A = sp.diags([off, main, off], [-1, 0, 1], format="csr").astype(dtype)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        A = A + 1j * sp.diags([np.full(n, 0.5)], [0], format="csr")
    return sp.csr_matrix(A)


def random_sparse(m, n, density, dtype=np.float64, seed=0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density, format="csr", random_state=rng)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        B = sp.random(m, n, density, format="csr", random_state=rng)
        A = (A + 1j * B).tocsr()
    return A.astype(dtype)


def dense_matrix(m, n, dtype=np.float64, seed=1) -> np.ndarray:
    """Ref: dense_matrix (test_utils.jl:107)."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((m, n))
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        M = M + 1j * rng.standard_normal((m, n))
    return M.astype(dtype)


def rand_vector(n, dtype=np.float64, seed=2) -> np.ndarray:
    """Ref: test_vector (test_utils.jl:124)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        v = v + 1j * rng.standard_normal(n)
    return v.astype(dtype)


def assert_padding_zero(x) -> None:
    """The TPU analogue of assert_uniform: the padding invariant must hold on
    every shard or later masked ops silently corrupt (test_utils.jl:169-192
    catches the equivalent rank-divergence class)."""
    from hpclinalg.partition import shard_mask

    if hasattr(x, "partition"):  # DistVector
        arr = np.asarray(x.data)
        mask = shard_mask(x.partition, arr.shape[1])
        assert np.all(arr[~mask] == 0), "padding invariant violated"
    elif hasattr(x, "structure"):  # DistSparseMatrix
        arr = np.asarray(x.nzval)
        st = x.structure
        for s in range(arr.shape[0]):
            assert np.all(arr[s, st.nnz_local[s]:] == 0), \
                f"nzval padding invariant violated on shard {s}"
    elif hasattr(x, "row_partition"):  # DistDenseMatrix
        arr = np.asarray(x.data)
        mask = shard_mask(x.row_partition, arr.shape[1])
        assert np.all(arr[~mask] == 0), "dense padding invariant violated"


def assert_close(a, b, dtype, factor=1.0):
    tol = tolerance(dtype) * factor
    a, b = np.asarray(a), np.asarray(b)
    denom = max(np.abs(b).max(), 1.0) if b.size else 1.0
    assert np.allclose(a, b, rtol=tol, atol=tol * denom), \
        f"max err {np.abs(a - b).max() if a.shape == b.shape else 'shape'} vs tol {tol}"

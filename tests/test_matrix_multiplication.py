"""SpGEMM — mirrors test_matrix_multiplication.jl (square, non-square,
plan reuse, result partitions)."""

import numpy as np

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, random_sparse, tridiagonal_matrix


def test_spgemm_square(cfg):
    be, dtype = cfg
    A = tridiagonal_matrix(26, dtype)
    B = random_sparse(26, 26, 0.2, dtype, seed=21)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    C = Ad @ Bd
    assert_close(C.to_scipy().toarray(), (A @ B).toarray(), dtype)
    assert_padding_zero(C)
    assert np.array_equal(C.row_partition, Ad.row_partition)


def test_spgemm_nonsquare(cfg):
    be, dtype = cfg
    A = random_sparse(14, 22, 0.3, dtype, seed=22)
    B = random_sparse(22, 9, 0.3, dtype, seed=23)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    assert_close((Ad @ Bd).to_scipy().toarray(), (A @ B).toarray(), dtype)


def test_spgemm_aa(cfg):
    be, dtype = cfg
    A = tridiagonal_matrix(31, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close((Ad @ Ad).to_scipy().toarray(), (A @ A).toarray(), dtype)


def test_spgemm_plan_reuse_values_only(be4):
    """Same patterns, new values: only the value exchange reruns
    (ref SpGEMM plan memoization, sparse.jl:900)."""
    A = random_sparse(20, 20, 0.25, seed=24)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    n_before = hl.cache_sizes().get("matrix_plan", 0)
    C1 = Ad @ Ad
    A2 = Ad * 3.0  # same structure object
    C2 = A2 @ A2
    n_after = hl.cache_sizes().get("matrix_plan", 0)
    assert n_after == n_before + 1  # one plan for both products
    assert_close(C2.to_scipy().toarray(), 9 * (A @ A).toarray(), np.float64)


def test_spgemm_chain(be4):
    A = random_sparse(12, 18, 0.3, seed=25)
    B = random_sparse(18, 15, 0.3, seed=26)
    C = random_sparse(15, 7, 0.4, seed=27)
    res = (hl.DistSparseMatrix.from_scipy(A, be4)
           @ hl.DistSparseMatrix.from_scipy(B, be4)
           @ hl.DistSparseMatrix.from_scipy(C, be4))
    assert_close(res.to_scipy().toarray(), (A @ B @ C).toarray(), np.float64)


def test_lazy_transpose_products(cfg):
    """Ref sparse.jl:2318-2379: At*Bt = lazy (B*A)^T; At*B and A*Bt
    materialize the cached transpose."""
    from hpclinalg.lazy import LazyTranspose

    be, dtype = cfg
    A = random_sparse(16, 12, 0.3, dtype, seed=31)
    B = random_sparse(12, 16, 0.3, dtype, seed=32)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    # At * Bt = (B A)^T stays lazy
    lt = Ad.T @ Bd.T
    assert isinstance(lt, LazyTranspose)
    assert_close(lt.materialize().to_scipy().toarray(),
                 (A.T @ B.T).toarray(), dtype)
    # At * B materializes the transpose (cached bidirectionally)
    C1 = Ad.T @ Ad
    assert_close(C1.to_scipy().toarray(), (A.T @ A).toarray(), dtype)
    # A * Bt
    C2 = Ad @ Ad.T
    assert_close(C2.to_scipy().toarray(), (A @ A.T).toarray(), dtype)


def test_spgemm_mismatched_partitions(be4):
    """Operands on different row partitions multiply correctly (the plan
    handles arbitrary owner layouts)."""
    A = random_sparse(18, 18, 0.25, seed=33)
    B = random_sparse(18, 18, 0.25, seed=34)
    Ad = hl.DistSparseMatrix.from_scipy(
        A, be4, row_partition=np.array([0, 2, 9, 14, 18]))
    Bd = hl.DistSparseMatrix.from_scipy(
        B, be4, row_partition=np.array([0, 5, 10, 15, 18]))
    C = Ad @ Bd
    assert_close(C.to_scipy().toarray(), (A @ B).toarray(), np.float64)
    assert np.array_equal(C.row_partition, Ad.row_partition)


def test_spgemm_with_identity_and_diagonal(cfg):
    """Products against I and diagonal matrices preserve values exactly."""
    be, dtype = cfg
    A = random_sparse(13, 13, 0.3, dtype, seed=35)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    I = hl.speye(13, be, dtype=dtype)
    assert_close((Ad @ I).to_scipy().toarray(), A.toarray(), dtype)
    assert_close((I @ Ad).to_scipy().toarray(), A.toarray(), dtype)
    d = np.arange(1.0, 14.0).astype(dtype)
    D = hl.spdiagm((0, hl.DistVector.from_global(d, be, dtype=dtype)))
    assert_close((Ad @ D).to_scipy().toarray(),
                 (A.toarray() * d[None, :]), dtype)
    assert_close((D @ Ad).to_scipy().toarray(),
                 (A.toarray() * d[:, None]), dtype)


def test_spgemm_empty_result(be4):
    """Structurally-disjoint product: C has zero nnz but valid shape."""
    import scipy.sparse as sp

    A = sp.csr_matrix((np.ones(3), (np.array([0, 1, 2]),
                                    np.array([0, 1, 2]))), shape=(10, 10))
    B = sp.csr_matrix((np.ones(2), (np.array([7, 8]),
                                    np.array([3, 4]))), shape=(10, 10))
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    C = Ad @ Bd
    assert C.nnz() == 0
    assert C.shape == (10, 10)

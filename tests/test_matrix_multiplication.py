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

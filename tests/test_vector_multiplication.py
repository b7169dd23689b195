"""SpMV and dense matvec — mirrors test_vector_multiplication.jl."""

import numpy as np

import hpclinalg as hl
from utils import (assert_close, assert_padding_zero, dense_matrix,
                   random_sparse, rand_vector, tridiagonal_matrix)


def test_spmv_square(cfg):
    be, dtype = cfg
    A = tridiagonal_matrix(30, dtype)
    x = rand_vector(30, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Ad @ xv
    assert_close(y.to_numpy(), A @ x, dtype)
    assert_padding_zero(y)
    assert np.array_equal(y.partition, Ad.row_partition)


def test_spmv_nonsquare(cfg):
    be, dtype = cfg
    A = random_sparse(17, 35, 0.25, dtype, seed=13)
    x = rand_vector(35, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Ad @ xv).to_numpy(), A @ x, dtype)


def test_spmv_plan_reuse(be4):
    """Repeated products with the same structures hit the memoized plan
    (ref: get_vector_plan cache, sparse.jl:1992)."""
    A = random_sparse(20, 20, 0.3, seed=14)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(20)
    xv = hl.DistVector.from_global(x, be4)
    before = hl.cache_sizes().get("vector_plan", 0)
    for _ in range(3):
        y = Ad @ xv
    after = hl.cache_sizes().get("vector_plan", 0)
    assert after <= before + 1
    assert_close(y.to_numpy(), A @ x, np.float64)


def test_spmv_mismatched_x_partition(be4):
    A = random_sparse(20, 20, 0.3, seed=15)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(20)
    xv = hl.DistVector.from_global(x, be4, partition=np.array([0, 1, 3, 18, 20]))
    assert_close((Ad @ xv).to_numpy(), A @ x, np.float64)


def test_dense_matvec(cfg):
    be, dtype = cfg
    M = dense_matrix(21, 13, dtype)
    x = rand_vector(13, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Md @ xv).to_numpy(), M @ x, dtype)


def test_dense_transpose_matvec(cfg):
    """transpose(A)*x via partials+psum, no materialization
    (ref: DenseTransposeVectorPlan, dense.jl:1000-1261)."""
    be, dtype = cfg
    M = dense_matrix(21, 13, dtype)
    y = rand_vector(21, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    yv = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close((Md.T @ yv).to_numpy(), M.T @ y, dtype)


def test_sparse_transpose_matvec(cfg):
    be, dtype = cfg
    A = random_sparse(18, 25, 0.25, dtype, seed=16)
    y = rand_vector(18, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    yv = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close((Ad.T @ yv).to_numpy(), A.T @ y, dtype)

"""Sparse addition incl. mismatched sparsity & A±λI — mirrors
test_addition.jl, test_addition_different_sparsity.jl."""

import numpy as np
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, random_sparse, tridiagonal_matrix


def test_same_pattern(cfg):
    be, dtype = cfg
    A = tridiagonal_matrix(28, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = Ad * 2.0
    assert_close((Ad + Bd).to_scipy().toarray(), 3 * A.toarray(), dtype)
    assert_close((Ad - Bd).to_scipy().toarray(), -A.toarray(), dtype)


def test_different_sparsity(cfg):
    be, dtype = cfg
    A = random_sparse(25, 25, 0.15, dtype, seed=41)
    B = random_sparse(25, 25, 0.15, dtype, seed=42)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    C = Ad + Bd
    assert_close(C.to_scipy().toarray(), (A + B).toarray(), dtype)
    assert_padding_zero(C)
    D = Ad - Bd
    assert_close(D.to_scipy().toarray(), (A - B).toarray(), dtype)


def test_disjoint_patterns(be4):
    A = sp.csr_matrix(sp.triu(random_sparse(20, 20, 0.2, seed=43), 1))
    B = sp.csr_matrix(sp.tril(random_sparse(20, 20, 0.2, seed=44), -1))
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    assert_close((Ad + Bd).to_scipy().toarray(), (A + B).toarray(), np.float64)


def test_mismatched_partitions(be4):
    A = random_sparse(22, 22, 0.2, seed=45)
    B = random_sparse(22, 22, 0.2, seed=46)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4,
                                        row_partition=np.array([0, 2, 11, 20, 22]))
    assert_close((Ad + Bd).to_scipy().toarray(), (A + B).toarray(), np.float64)


def test_identity_addition_fast_path(cfg):
    """Full structural diagonal -> structure-sharing value update
    (ref IdentityAdditionPlan fast path, sparse.jl:3740)."""
    be, dtype = cfg
    A = tridiagonal_matrix(24, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    C = Ad.add_identity(2.5)
    assert C.structure is Ad.structure  # fast path shares the pattern
    assert_close(C.to_scipy().toarray(), (A + 2.5 * sp.eye(24)).toarray(), dtype)


def test_identity_addition_expansion(be4):
    """Missing diagonal entries -> pattern expansion (ref sparse.jl:3740+)."""
    A = sp.csr_matrix(sp.triu(random_sparse(18, 18, 0.2, seed=47), 1))
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    C = Ad.add_identity(-1.5)
    assert_close(C.to_scipy().toarray(), (A - 1.5 * sp.eye(18)).toarray(), np.float64)


def test_addition_plan_reuse(be4):
    A = random_sparse(20, 20, 0.2, seed=48)
    B = random_sparse(20, 20, 0.2, seed=49)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    n0 = hl.cache_sizes().get("addition_plan", 0)
    _ = Ad + Bd
    _ = (Ad * 2.0) + (Bd * 3.0)  # same structures
    assert hl.cache_sizes().get("addition_plan", 0) == n0 + 1


def test_complex_shift_of_real_matrix(be4):
    """A + 1j*I on a real matrix must promote to complex (shift-invert
    pattern), in both the structure-sharing fast path and the expansion
    path."""
    A = sp.eye(12).tocsr() * 2.0
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    C = Ad.add_identity(1j)
    assert np.issubdtype(C.dtype, np.complexfloating)
    assert np.allclose(C.to_scipy().toarray(), A.toarray() + 1j * np.eye(12))
    # expansion path: no structural diagonal
    B = sp.csr_matrix(np.diag(np.ones(11), 1))
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    D = Bd.add_identity(2j)
    assert np.allclose(D.to_scipy().toarray(), B.toarray() + 2j * np.eye(12))

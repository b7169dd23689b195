"""Scenario-for-scenario port of /root/reference/test/test_lazy_transpose.jl:
transpose(C)*transpose(D) = transpose(D*C) on the reference's exact 8x6/6x8
patterns, one-sided materialization rules, adjoint/conj for complex, scalar x
transpose in all four orders, and entrywise/operator norms of non-square
matrices (norm p in {fro,1,inf,3}, opnorm p in {1,inf})."""

import numpy as np
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, tolerance


def _vals(dtype, k):
    v = np.arange(1, k + 1, dtype=np.float64)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        return (v + 1j * v[::-1]).astype(dtype)
    return v.astype(dtype)


def _ref_C(dtype):
    # C is 8x6 (test_lazy_transpose.jl "trans_trans" block)
    i = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 3]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 1, 2, 3, 4]) - 1
    return sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(8, 6))


def _ref_D(dtype):
    # D is 6x8
    i = np.array([1, 2, 3, 4, 5, 6, 1, 2]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8]) - 1
    return sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(6, 8))


def test_trans_times_trans(cfg):
    """transpose(C) * transpose(D) stays lazy and equals transpose(D*C)."""
    be, dtype = cfg
    C, D = _ref_C(dtype), _ref_D(dtype)
    Cd = hl.DistSparseMatrix.from_scipy(C, be, dtype=dtype)
    Dd = hl.DistSparseMatrix.from_scipy(D, be, dtype=dtype)
    Z = Cd.T @ Dd.T
    assert isinstance(Z, hl.LazyTranspose)
    Zm = Z.materialize()
    ref = (D @ C).T.tocsr()
    assert_close(Zm.to_scipy().toarray(), ref.toarray(), dtype)
    assert_padding_zero(Zm)


def test_trans_left_materialize(cfg):
    """transpose(A) * B materializes the left operand (A 8x6, B 8x10)."""
    be, dtype = cfg
    i = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 3, 5, 7]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 1, 2, 3, 4, 5, 6]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(8, 6))
    ib = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 3, 5, 7]) - 1
    jb = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1, 2]) - 1
    B = sp.csr_matrix((_vals(dtype, len(ib)), (ib, jb)), shape=(8, 10))
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    R = Ad.T @ Bd
    assert isinstance(R, hl.DistSparseMatrix)
    assert_close(R.to_scipy().toarray(), (A.T @ B).toarray(), dtype)


def test_trans_right_materialize(cfg):
    """A * transpose(B) materializes the right operand (A 8x10, B 6x10)."""
    be, dtype = cfg
    i = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 3]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(8, 10))
    ib = np.array([1, 2, 3, 4, 5, 6, 1, 2]) - 1
    jb = np.array([1, 2, 3, 4, 5, 6, 7, 8]) - 1
    B = sp.csr_matrix((_vals(dtype, len(ib)), (ib, jb)), shape=(6, 10))
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    R = Ad @ Bd.T
    assert isinstance(R, hl.DistSparseMatrix)
    assert_close(R.to_scipy().toarray(), (A @ B.T).toarray(), dtype)


def test_adjoint_and_conj_complex(be4):
    """A' (conjugate transpose) + conj(A) for complex (ref complex-only
    block)."""
    dtype = np.complex128
    i = np.array([1, 2, 3, 4, 5, 6, 1, 3]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(6, 8))
    Ad = hl.DistSparseMatrix.from_scipy(A, be4, dtype=dtype)
    H = Ad.H
    assert isinstance(H, hl.LazyTranspose)
    assert_close(H.materialize().to_scipy().toarray(),
                 A.conj().T.toarray(), dtype)
    Cj = Ad.conj()
    assert isinstance(Cj, hl.DistSparseMatrix)
    assert_close(Cj.to_scipy().toarray(), A.conj().toarray(), dtype)


def test_scalar_times_transpose_all_orders(cfg):
    """a*A, A*a, a*transpose(A), transpose(A)*a all match the replicated
    oracle (ref scalar-multiplication block)."""
    be, dtype = cfg
    i = np.array([1, 2, 3, 4, 5, 6, 1, 3]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(6, 8))
    a = dtype(2.5 + 0.5j) if np.issubdtype(np.dtype(dtype),
                                           np.complexfloating) else dtype(2.5)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    ref = (a * A).toarray()
    assert_close((a * Ad).to_scipy().toarray(), ref, dtype)
    assert_close((Ad * a).to_scipy().toarray(), ref, dtype)
    Z1 = a * Ad.T
    Z2 = Ad.T * a
    for Z in (Z1, Z2):
        assert isinstance(Z, hl.LazyTranspose)
        assert_close(Z.materialize().to_scipy().toarray(), ref.T, dtype)


def test_norms_nonsquare(cfg):
    """Entrywise norms p in {2 (fro), 1, inf, 3} of a 6x8 matrix."""
    be, dtype = cfg
    tol = tolerance(dtype)
    i = np.array([1, 2, 3, 4, 5, 6, 1, 3]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(6, 8))
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    v = np.abs(A.toarray()[A.toarray() != 0])
    assert abs(Ad.norm() - np.sqrt((v ** 2).sum())) < tol * 10
    assert abs(Ad.norm(1) - v.sum()) < tol * 10
    assert abs(Ad.norm(np.inf) - v.max()) < tol * 10
    assert abs(Ad.norm(3) - (v ** 3).sum() ** (1 / 3)) < tol * 10


def test_opnorms_nonsquare(cfg):
    """Operator norms p in {1, inf} of a 6x8 matrix with an extra
    off-pattern pair (ref opnorm block)."""
    be, dtype = cfg
    tol = tolerance(dtype)
    i = np.array([1, 2, 3, 4, 5, 6, 1, 3, 2, 4]) - 1
    j = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 3]) - 1
    A = sp.csr_matrix((_vals(dtype, len(i)), (i, j)), shape=(6, 8))
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Aa = np.abs(A.toarray())
    assert abs(Ad.opnorm(1) - Aa.sum(axis=0).max()) < tol * 10
    assert abs(Ad.opnorm(np.inf) - Aa.sum(axis=1).max()) < tol * 10


def test_lazy_of_lazy_and_matvec(cfg):
    """transpose(transpose(A)) returns the parent; transpose(A)*x and
    x'*A-style row products agree with the oracle."""
    be, dtype = cfg
    C = _ref_C(dtype)
    Cd = hl.DistSparseMatrix.from_scipy(C, be, dtype=dtype)
    assert Cd.T.T is Cd
    x = _vals(dtype, 8)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Cd.T @ xv).to_numpy(), C.T @ x, dtype)


def test_add_sub_with_lazy_transpose(cfg):
    """A ± transpose(A) in every operand order materializes and matches the
    oracle (ref: + over mismatched patterns, sparse.jl:1405 + transpose)."""
    be, dtype = cfg
    C = _ref_C(dtype)  # 8x6
    S = (C @ C.T).tocsr()  # square, unsymmetric pattern usage below
    Sd = hl.DistSparseMatrix.from_scipy(S, be, dtype=dtype)
    for got, want in [
        (Sd + Sd.T, S + S.T),
        (Sd - Sd.T, S - S.T),
        (Sd.T + Sd, S.T + S),
        (Sd.T - Sd, S.T - S),
        ((Sd.T + Sd.T).materialize(), S.T + S.T),
    ]:
        assert_close(got.to_scipy().toarray(), np.asarray(want.todense()),
                     dtype)
        assert_padding_zero(got)

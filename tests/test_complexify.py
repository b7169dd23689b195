"""Realified complex solves (solver/complexify.py).

Role under test: the reference's complex dispatch through MUMPS/cuDSS
(/root/reference/src/mumps_factorization.jl:242-353,
test_factorization.jl complex cases). On complex-incapable TPU runtimes
the engine factors the 2n real form; these tests check the realification
algebra and the solve/matvec/refactorize contract against scipy oracles
on the CPU mesh (where the same code path runs)."""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from hpclinalg.solver.complexify import (ComplexDeviceFactorization,
                                         derealify_vec, realify_matrix,
                                         realify_vec)



def _helmholtz(k, shift=0.5, damp=0.05):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    L = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))).tocsr()
    n = k * k
    return (L - shift * sp.eye(n) + damp * 1j * sp.eye(n)) \
        .astype(np.complex64).tocsr()


def test_realify_identities():
    rng = np.random.default_rng(0)
    n = 60
    A = sp.random(n, n, 0.1, random_state=1).astype(np.complex128)
    A = (A + 1j * sp.random(n, n, 0.1, random_state=2)).tocsr()
    B = (sp.random(n, n, 0.1, random_state=3)
         + 1j * sp.random(n, n, 0.08, random_state=4)).tocsr()
    z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    R = realify_matrix(A).astype(np.float64)
    # R(A) r(z) == r(A z)
    assert np.allclose(derealify_vec(R @ realify_vec(z)), A @ z, atol=1e-5)
    # ring homomorphism: R(A B) == R(A) R(B), R(A+B) == R(A)+R(B)
    RB = realify_matrix(B).astype(np.float64)
    assert np.allclose((R @ RB).toarray(),
                       realify_matrix((A @ B).tocsr()).toarray(), atol=1e-4)
    assert np.allclose((R + RB).toarray(),
                       realify_matrix((A + B).tocsr()).toarray(), atol=1e-5)
    # R(A)^T == R(A^H)
    assert np.allclose(R.T.toarray(),
                       realify_matrix(A.getH().tocsr()).toarray(), atol=1e-5)
    # symmetric form is real-symmetric for complex-symmetric A
    S = A + A.T
    Rs = realify_matrix(S.tocsr(), symmetric=True)
    assert abs(Rs - Rs.T).max() < 1e-5
    # and solves the same system: Rs [x;y]interleaved = r_sym(b)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = derealify_vec(np.linalg.solve(Rs.toarray().astype(np.float64),
                                      realify_vec(b, symmetric=True)))
    assert np.allclose(S @ x, b, atol=1e-3)


@pytest.mark.parametrize("nshards", [4])
def test_complex_device_factorization_lu(nshards):
    be = hl.backend_auto(nshards=nshards, dtype=np.float32)
    A = _helmholtz(20)
    n = A.shape[0]
    rng = np.random.default_rng(5)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    F = ComplexDeviceFactorization(A, be, kind="lu")
    assert np.linalg.norm(F.matvec(b) - A @ b) < 1e-4 * np.linalg.norm(A @ b)
    x = F.solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-5 * np.linalg.norm(b)
    xt = F.solve(b, transpose=True)
    assert np.linalg.norm(A.T @ xt - b) < 1e-5 * np.linalg.norm(b)
    B = (rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))) \
        .astype(np.complex64)
    X = F.solve(B)
    assert np.linalg.norm(A @ X - B) < 1e-5 * np.linalg.norm(B)
    A2 = _helmholtz(20, shift=0.3, damp=0.07)
    F.refactorize(A2)
    x2 = F.solve(b)
    assert np.linalg.norm(A2 @ x2 - b) < 1e-5 * np.linalg.norm(b)
    F.finalize()


def test_complex_device_factorization_ldl():
    be = hl.backend_auto(nshards=4, dtype=np.float32)
    A = _helmholtz(16)
    n = A.shape[0]
    rng = np.random.default_rng(6)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    F = ComplexDeviceFactorization(A, be, kind="ldl")
    assert np.linalg.norm(F.matvec(b) - A @ b) < 1e-4 * np.linalg.norm(A @ b)
    x = F.solve(b)
    assert np.linalg.norm(A @ x - b) < 1e-5 * np.linalg.norm(b)
    # non-symmetric input refused for ldl
    Abad = A.copy().tolil()
    Abad[0, 1] += 1.0
    with pytest.raises(ValueError):
        ComplexDeviceFactorization(Abad.tocsr(), be, kind="ldl")
    F.finalize()

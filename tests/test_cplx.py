"""Split-plane complex containers (hpclinalg/cplx.py) vs scipy oracles.

Ref parity: complex containers behave like real ones — operators
(sparse.jl:2261-2280), complex A \\ b through the same dispatch
(mumps_factorization.jl:242-353). On the CPU mesh the facade is exercised
explicitly (the mesh is complex-capable, so constructors return native
complex containers by default); tests_tpu covers the transparent
dispatch on the chip.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from hpclinalg.cplx import (
    ComplexDistSparseMatrix,
    ComplexDistVector,
    ComplexFactorization,
    ldlt_complex,
    lu_complex,
    realify_dist,
)

def _rng():
    return np.random.default_rng(7)


def _rand_complex_csr(n=120, density=0.06, seed=3):
    rng = np.random.default_rng(seed)
    Ar = sp.random(n, n, density, random_state=seed, format="csr")
    Ai = sp.random(n, n, density, random_state=seed + 1, format="csr")
    A = (Ar + 1j * Ai + sp.eye(n)).tocsr().astype(np.complex64)
    A.sort_indices()
    return A


def _helmholtz(k=16):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    eye = sp.eye(k)
    L = sp.kron(eye, T) + sp.kron(T, eye)
    n = k * k
    return (L - 0.5 * sp.eye(n) + 0.05j * sp.eye(n)).tocsr() \
        .astype(np.complex64)


@pytest.fixture
def be2():
    return hl.backend_auto(nshards=2, dtype=np.float32)


def test_vector_roundtrip_and_arith(be2):
    rng = _rng()
    z = (rng.standard_normal(95) + 1j * rng.standard_normal(95)) \
        .astype(np.complex64)
    w = (rng.standard_normal(95) + 1j * rng.standard_normal(95)) \
        .astype(np.complex64)
    zd = ComplexDistVector.from_global(z, be2)
    wd = ComplexDistVector.from_global(w, be2)
    assert zd.dtype == np.complex64
    assert np.allclose(zd.to_numpy(), z, atol=1e-6)
    assert np.allclose((zd + wd).to_numpy(), z + w, atol=1e-6)
    assert np.allclose((zd - wd).to_numpy(), z - w, atol=1e-6)
    assert np.allclose((zd * wd).to_numpy(), z * w, atol=1e-5)
    c = 1.5 - 2.25j
    assert np.allclose((zd * c).to_numpy(), z * c, atol=1e-5)
    assert np.allclose((zd / c).to_numpy(), z / c, atol=1e-5)
    assert np.allclose(zd.conj().to_numpy(), np.conj(z), atol=1e-6)
    assert np.allclose(np.asarray(zd.abs().to_numpy()), np.abs(z), atol=1e-5)
    # Julia dot convention: conj(z)' w
    assert np.isclose(zd.dot(wd), np.vdot(z, w), atol=1e-3)
    assert np.isclose(float(zd.norm()), np.linalg.norm(z), rtol=1e-5)
    assert np.isclose(zd.sum(), z.sum(), atol=1e-4)
    # repartition keeps values
    zr = zd.repartition(np.array([0, 10, 95]))
    assert np.allclose(zr.to_numpy(), z, atol=1e-6)


def test_sparse_roundtrip_operators(be2):
    rng = _rng()
    A = _rand_complex_csr()
    B = _rand_complex_csr(seed=9)
    n = A.shape[0]
    Ad = ComplexDistSparseMatrix.from_scipy(A, be2)
    Bd = ComplexDistSparseMatrix.from_scipy(B, be2)
    assert Ad.dtype == np.complex64
    assert Ad.nnz() == A.nnz
    assert np.allclose(Ad.to_scipy().toarray(), A.toarray(), atol=1e-6)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    zd = ComplexDistVector.from_global(z, be2)
    # SpMV: 4 real SpMVs through one shared plan
    assert np.allclose((Ad @ zd).to_numpy(), A @ z, atol=1e-3)
    # addition / scalar / negation
    assert np.allclose((Ad + Bd).to_scipy().toarray(), (A + B).toarray(),
                       atol=1e-5)
    assert np.allclose((Ad - Bd).to_scipy().toarray(), (A - B).toarray(),
                       atol=1e-5)
    c = 0.5 + 2j
    assert np.allclose((Ad * c).to_scipy().toarray(), (A * c).toarray(),
                       atol=1e-5)
    assert np.allclose((-Ad).to_scipy().toarray(), (-A).toarray(), atol=1e-6)
    # transpose / adjoint
    assert np.allclose(Ad.T.materialize().to_scipy().toarray(),
                       A.T.toarray(), atol=1e-6)
    assert np.allclose(Ad.H.materialize().to_scipy().toarray(),
                       A.conj().T.toarray(), atol=1e-6)
    # SpGEMM through plane products
    assert np.allclose((Ad @ Bd).to_scipy().toarray(), (A @ B).toarray(),
                       atol=1e-3)
    # norms / reductions
    assert np.isclose(float(Ad.norm()),
                      np.sqrt((np.abs(A.data) ** 2).sum()), rtol=1e-5)
    assert np.isclose(float(Ad.norm(1)), np.abs(A.data).sum(), rtol=1e-4)
    assert np.isclose(float(Ad.opnorm(np.inf)),
                      np.abs(A.toarray()).sum(axis=1).max(), rtol=1e-4)
    assert np.isclose(Ad.tr(), complex(A.diagonal().sum()), atol=1e-3)
    assert np.allclose(Ad.diag().to_numpy(), A.diagonal(), atol=1e-6)
    assert np.isclose(Ad.sum(), A.sum(), atol=1e-3)
    # add_identity with a complex shift
    lam = 0.3 - 0.7j
    assert np.allclose(Ad.add_identity(lam).to_scipy().toarray(),
                       (A + lam * sp.eye(n)).toarray(), atol=1e-5)


def test_realify_matches_oracle(be2):
    from hpclinalg.solver.complexify import realify_matrix

    A = _rand_complex_csr(n=60)
    Ad = ComplexDistSparseMatrix.from_scipy(A, be2)
    for symm in (False,):
        Rd = realify_dist(Ad, symmetric=symm)
        R_ref = realify_matrix(A, symmetric=symm)
        got = Rd.to_scipy()
        # realify_dist keeps explicit zeros (full 2x2 blocks); compare dense
        assert np.allclose(got.toarray(), R_ref.toarray(), atol=1e-6)
    # symmetric (swapped) form on a complex-symmetric matrix
    As = _helmholtz(8)
    Asd = ComplexDistSparseMatrix.from_scipy(As, be2)
    Rd = realify_dist(Asd, symmetric=True)
    R_ref = realify_matrix(As, symmetric=True)
    assert np.allclose(Rd.to_scipy().toarray(), R_ref.toarray(), atol=1e-6)


def test_complex_factorization_device_engine(be2):
    A = _helmholtz(14)
    n = A.shape[0]
    rng = _rng()
    Ad = ComplexDistSparseMatrix.from_scipy(A, be2)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    zd = ComplexDistVector.from_global(z, be2)
    for F in (lu_complex(Ad, method="device"),
              ldlt_complex(Ad, method="device")):
        x = F.solve(zd)
        assert isinstance(x, ComplexDistVector)
        res = np.linalg.norm(A @ x.to_numpy() - z) / np.linalg.norm(z)
        assert res < 1e-4, res
    F = lu_complex(Ad, method="device")
    xt = F.solve(zd, transpose=True)
    rest = np.linalg.norm(A.T @ xt.to_numpy() - z) / np.linalg.norm(z)
    assert rest < 1e-4, rest
    # refactorize with new values, same pattern
    A2 = (A + (0.2 + 0.1j) * sp.eye(n, format="csr",
                                    dtype=np.complex64)).tocsr()
    A2.sort_indices()
    A2d = ComplexDistSparseMatrix.from_scipy(A2, be2)
    assert A2d.hash == Ad.hash
    F.refactorize(A2d)
    x2 = F.solve(zd)
    res2 = np.linalg.norm(A2 @ x2.to_numpy() - z) / np.linalg.norm(z)
    assert res2 < 1e-4, res2
    F.finalize()


def test_complex_host_engine_and_backslash(be2):
    A = _rand_complex_csr(n=100)
    n = A.shape[0]
    rng = _rng()
    Ad = ComplexDistSparseMatrix.from_scipy(A, be2)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    zd = ComplexDistVector.from_global(z, be2)
    F = ComplexFactorization(Ad, kind="lu", method="host")
    x = F.solve(zd)
    res = np.linalg.norm(A @ x.to_numpy() - z) / np.linalg.norm(z)
    assert res < 1e-4, res
    # hl.lu / hl.solve dispatch on the facade
    x2 = hl.lu(Ad, method="host").solve(zd)
    assert np.linalg.norm(A @ x2.to_numpy() - z) / np.linalg.norm(z) < 1e-4
    x3 = hl.solve(Ad, zd)
    assert np.linalg.norm(A @ x3.to_numpy() - z) / np.linalg.norm(z) < 1e-4
    # numpy multi-RHS path (host engine: no extra device-solve compiles)
    B = (rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))) \
        .astype(np.complex64)
    X = F.solve_matrix(B)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-3
    # backslash cache: same pattern + new values refactorizes only
    A2 = (A * (1.0 + 0.5j)).tocsr()
    A2d = ComplexDistSparseMatrix.from_scipy(A2, be2)
    x4 = hl.solve(A2d, zd)
    assert np.linalg.norm(A2 @ x4.to_numpy() - z) / np.linalg.norm(z) < 1e-4


def test_mixed_real_complex_ops(be2):
    rng = _rng()
    A = _rand_complex_csr(n=80)
    R = sp.random(80, 80, 0.06, random_state=11, format="csr") \
        .astype(np.float32) + sp.eye(80, dtype=np.float32, format="csr")
    Ad = ComplexDistSparseMatrix.from_scipy(A, be2)
    Rd = hl.DistSparseMatrix.from_scipy(R, be2, dtype=np.float32)
    v = rng.standard_normal(80).astype(np.float32)
    vd = hl.DistVector.from_global(v, be2, dtype=np.float32)
    # complex matrix @ real vector
    assert np.allclose((Ad @ vd).to_numpy(), A @ v, atol=1e-3)
    # complex +- real (pattern union through the same plan)
    assert np.allclose((Ad + Rd).to_scipy().toarray(),
                       (A + R).toarray(), atol=1e-5)
    assert np.allclose((Ad @ Rd).to_scipy().toarray(),
                       (A @ R).toarray(), atol=1e-3)

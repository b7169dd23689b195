"""Numerical pivoting robustness (VERDICT r4 item 6).

Ref parity: MUMPS gives the reference threshold partial pivoting by
default (CNTL(1)=0.01) plus the ICNTL(6) max-transversal preprocessing;
the ref test suite exercises indefinite and unsymmetric systems
(/root/reference/test/test_factorization.jl:134-515). Here the escalation
ladder is: fast unpivoted kernels -> within-front pivoted kernels
(Bunch-Kaufman LDLt / partial-pivot LU, native/mf.cpp kinds 2/3) -> the
MC64-role column permutation, each step triggered by perturbation counts
or the |L| growth monitor. The device engine flags growth and escalates
its solves to full-budget compensated refinement.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from utils import rand_vector


def _resid(A, x, b):
    return np.linalg.norm(A @ x - b) / np.linalg.norm(b)


@pytest.fixture
def be4():
    return hl.backend_auto(nshards=4)


def test_unsymmetric_zero_diagonal(be4):
    """Half the diagonal exactly zero: unpivoted static perturbation
    diverges (measured 1e+114 residual); the pivot escalation must reach
    f64 direct-solve accuracy."""
    rng = np.random.default_rng(0)
    n = 400
    A = sp.random(n, n, 0.02, random_state=1).tolil()
    A.setdiag(1e-14 * rng.standard_normal(n))
    A[0, 1] = 1.0
    A[1, 0] = 1.0
    A = (A + sp.diags(np.where(rng.random(n) < 0.5, 0.0, 3.0))).tocsr()
    A.eliminate_zeros()
    b = rng.standard_normal(n)
    F = hl.lu(hl.DistSparseMatrix.from_scipy(A, be4))
    x = F.solve(hl.DistVector.from_global(b, be4))
    assert _resid(A, x.to_numpy(), b) < 1e-10
    xt = F.solve(hl.DistVector.from_global(b, be4), transpose=True)
    assert np.linalg.norm(A.T @ xt.to_numpy() - b) < 1e-10 * np.linalg.norm(b)
    # multi-RHS through the same escalated factor
    B = rng.standard_normal((n, 3))
    X = F.solve_matrix(B)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-10
    # refactorize keeps the escalation state (same pattern, new values)
    A2 = (2.5 * A).tocsr()
    F.refactorize(hl.DistSparseMatrix.from_scipy(A2, be4))
    x2 = F.solve(hl.DistVector.from_global(b, be4))
    assert _resid(A2, x2.to_numpy(), b) < 1e-10


def test_symmetric_tiny_diagonal_bk(be4):
    """tridiag(1, 1e-10, 1): every 1x1 pivot is tiny but the matrix is
    well conditioned — needs Bunch-Kaufman 2x2 pivots (unpivoted +
    refinement plateaued at ~1e-7)."""
    n = 500
    T = sp.diags([np.ones(n - 1), 1e-10 * np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    b = rand_vector(n)
    F = hl.ldlt(hl.DistSparseMatrix.from_scipy(T, be4))
    assert F.native is None or F.native.pivoted
    x = F.solve(hl.DistVector.from_global(b, be4))
    assert _resid(T, x.to_numpy(), b) < 1e-12


def test_saddle_point_both_kinds(be4):
    """[[H, B^T], [B, 0]] saddle point through lu and Symmetric ldlt."""
    rng = np.random.default_rng(2)
    m, k = 150, 75
    H = sp.random(m, m, 0.05, random_state=2)
    H = (H @ H.T + sp.eye(m)).tocsr()
    B = (sp.random(k, m, 0.08, random_state=3)
         + sp.hstack([sp.eye(k), sp.csr_matrix((k, m - k))])).tocsr()
    S = sp.bmat([[H, B.T], [B, None]], format="csr")
    b = rng.standard_normal(m + k)
    Sd = hl.DistSparseMatrix.from_scipy(S, be4)
    bd = hl.DistVector.from_global(b, be4)
    x = hl.lu(Sd).solve(bd)
    assert _resid(S, x.to_numpy(), b) < 1e-10
    x2 = hl.solve(hl.Symmetric(Sd), bd)
    assert _resid(S, x2.to_numpy(), b) < 1e-10


def test_pivoted_matches_unpivoted_on_clean(be4):
    """Forcing the pivoted kernels on a well-pivoted SPD system gives the
    same answer as the default path (plumbing check: perms, relabeled
    scatter rows, Dsub all identity/empty)."""
    from hpclinalg.solver.api import (_CSCView, _csr_values, _get_perm_csc,
                                      _get_symbolic)
    from hpclinalg.solver.multifrontal import _PERT_REL
    from hpclinalg.solver.native import NativeFactor, load_mf

    lib = load_mf()
    if lib is None:
        pytest.skip("native engine unavailable")
    k = 12
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    A = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))).tocsr()
    n = k * k
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    sym = _get_symbolic(Ad)
    b = rand_vector(n)
    xs = []
    for kind in ("ldlt", "lu"):
        for pivot in (False, True):
            nf = NativeFactor(sym, np.float64)
            vals = _csr_values(Ad).astype(np.float64)
            indptr, indices, nzmap = _get_perm_csc(Ad, sym)
            eps = _PERT_REL * float(np.abs(vals).max())
            csc = _CSCView(indptr, indices,
                           np.ascontiguousarray(vals[nzmap]))
            nf.factorize(lib, csc, kind, eps, pivot=pivot)
            assert nf.n_perturbed == 0
            xs.append(nf.solve(lib, b))
            assert _resid(A, xs[-1], b) < 1e-12
    for x in xs[1:]:
        assert np.allclose(x, xs[0], atol=1e-9)


def test_device_growth_monitor():
    """The device engine flags large |L| growth and escalates its solves
    to full-budget compensated refinement (cuDSS-role contract: no
    numerical pivoting on device, so growth detection + refinement is the
    recovery path)."""
    from hpclinalg.solver.device_mf import DeviceFactorization

    be = hl.backend_auto(nshards=4, dtype=np.float32)
    k = 20
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    L = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k))).tocsr()
    n = 2 * k * k
    # [[eps I, L], [L, eps I]]: WELL conditioned (cond ~ cond(L)) but every
    # early pivot is ~eps -> |L| growth ~ 1/eps; the unpivoted device
    # factor must flag it and recover through compensated refinement
    A = sp.bmat([[1e-4 * sp.eye(k * k), L], [L, 1e-4 * sp.eye(k * k)]],
                format="csr")
    Ad = hl.DistSparseMatrix.from_scipy(A.astype(np.float32), be,
                                        dtype=np.float32)
    F = DeviceFactorization(Ad, kind="ldl")
    assert F.growth > 1e3
    assert F._unstable == (F.n_perturbed > 0 or F.growth > 1e4)
    b = rand_vector(n).astype(np.float32)
    x = F.solve(b)
    r = np.linalg.norm(A @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)
    assert r < 1e-4, r

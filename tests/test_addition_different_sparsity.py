"""Mixed-sparsity addition — scenario-for-scenario port of
/root/reference/test/test_addition_different_sparsity.jl (171 LoC):
tri+bidiagonal union (:37-65), D'WD FEM-operator products (:68-95),
Hessian-style accumulation chains (:98-125), and the exact historical
bug-triggering pattern prod1 + prod2 with transposed factors (:128-148).
These patterns stress the AdditionPlan symbolic union + the plan caches
when structurally-different results of cached SpGEMMs are combined."""

import numpy as np
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close


def _sd(n, pairs, dtype):
    """spdiagm-style scipy builder: pairs = [(offset, values)]."""
    return sp.csr_matrix(sp.diags([v for _, v in pairs],
                                  [k for k, _ in pairs],
                                  shape=(n, n)).astype(dtype))


def test_addition_different_patterns(cfg):
    """Ref :37-65: tridiagonal + (diag & +2 off-diagonal)."""
    be, dtype = cfg
    n = 8
    A = _sd(n, [(-1, np.ones(n - 1)), (0, 2 * np.ones(n)),
                (1, np.ones(n - 1))], dtype)
    B = _sd(n, [(0, 3 * np.ones(n)), (2, 0.5 * np.ones(n - 2))], dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    C = Ad + Bd
    assert_close(C.to_scipy().toarray(), (A + B).toarray(), dtype)
    # and subtraction across the same mismatched union
    D = Ad - Bd
    assert_close(D.to_scipy().toarray(), (A - B).toarray(), dtype)


def test_dwd_products(cfg):
    """Ref :68-95: M1 = idᵀ W dx, M2 = dxᵀ W id — different structures
    from cached SpGEMM plans, then M1 + M2."""
    be, dtype = cfg
    n = 8
    dx = _sd(n, [(0, -np.ones(n)), (1, np.ones(n - 1))], dtype).tolil()
    dx[n - 1, n - 1] = 0
    dx = sp.csr_matrix(dx)
    ident = _sd(n, [(0, np.ones(n))], dtype)
    w = _sd(n, [(0, 0.5 * np.ones(n))], dtype)

    D_dx = hl.DistSparseMatrix.from_scipy(dx, be, dtype=dtype)
    D_id = hl.DistSparseMatrix.from_scipy(ident, be, dtype=dtype)
    W = hl.DistSparseMatrix.from_scipy(w, be, dtype=dtype)

    M1 = D_id.T @ W @ D_dx
    M2 = D_dx.T @ W @ D_id
    Ms = M1 + M2
    ref = (ident.T @ w @ dx + dx.T @ w @ ident).toarray()
    assert_close(Ms.to_scipy().toarray(), ref, dtype)


def test_hessian_style_accumulation(cfg):
    """Ref :98-125: H += DᵀWD terms of four different structures chained
    through repeated AdditionPlans."""
    be, dtype = cfg
    n = 8
    dx = _sd(n, [(0, -np.ones(n)), (1, np.ones(n - 1))], dtype).tolil()
    dx[n - 1, n - 1] = 0
    dx = sp.csr_matrix(dx)
    ident = _sd(n, [(0, np.ones(n))], dtype)
    w = _sd(n, [(0, 0.5 * np.ones(n))], dtype)

    D_dx = hl.DistSparseMatrix.from_scipy(dx, be, dtype=dtype)
    D_id = hl.DistSparseMatrix.from_scipy(ident, be, dtype=dtype)
    W = hl.DistSparseMatrix.from_scipy(w, be, dtype=dtype)

    H = D_dx.T @ W @ D_dx
    H = H + D_id.T @ W @ D_id
    cross1 = D_dx.T @ W @ D_id
    cross2 = D_id.T @ W @ D_dx
    H = H + (cross1 + cross2)
    ref = (dx.T @ w @ dx + ident.T @ w @ ident
           + dx.T @ w @ ident + ident.T @ w @ dx).toarray()
    assert_close(H.to_scipy().toarray(), ref, dtype)


def test_exact_bug_pattern(cfg):
    """Ref :128-148: foo1*D + Dᵀ*foo2 — the addition that originally hit
    the stale-cached-plan BoundsError in the reference."""
    be, dtype = cfg
    n = 8
    dx = _sd(n, [(0, -np.ones(n)), (1, np.ones(n - 1))], dtype).tolil()
    dx[n - 1, n - 1] = 0
    dx = sp.csr_matrix(dx)
    foo1 = _sd(n, [(0, 0.3 * np.ones(n))], dtype)
    foo2 = _sd(n, [(0, 0.7 * np.ones(n))], dtype)

    F1 = hl.DistSparseMatrix.from_scipy(foo1, be, dtype=dtype)
    F2 = hl.DistSparseMatrix.from_scipy(foo2, be, dtype=dtype)
    Dd = hl.DistSparseMatrix.from_scipy(dx, be, dtype=dtype)

    prod1 = F1 @ Dd
    prod2 = Dd.T @ F2
    s = prod1 + prod2
    ref = (foo1 @ dx + dx.T @ foo2).toarray()
    assert_close(s.to_scipy().toarray(), ref, dtype)


def test_addition_with_distributed_spdiagm(cfg):
    """Same scenarios built through OUR spdiagm (device multi-offset path)
    rather than scipy — ties the constructor into the addition machinery."""
    be, dtype = cfg
    n = 8
    v0 = hl.DistVector.from_global(2 * np.ones(n), be, dtype=dtype)
    v1 = hl.DistVector.from_global(np.ones(n - 1), be, dtype=dtype)
    v2 = hl.DistVector.from_global(0.5 * np.ones(n - 2), be, dtype=dtype)
    A = hl.spdiagm((-1, v1), (0, v0), (1, v1))
    B = hl.spdiagm((0, v0), (2, v2))
    ref = (sp.diags([np.ones(n - 1), 2 * np.ones(n), np.ones(n - 1)],
                    [-1, 0, 1])
           + sp.diags([2 * np.ones(n), 0.5 * np.ones(n - 2)], [0, 2]))
    assert_close((A + B).to_scipy().toarray(), ref.toarray(), dtype)

"""Block ops — mirrors test_blocks.jl (cat dims=1/2/(m,n), blockdiag)."""

import numpy as np
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, random_sparse


def _mk(be, dtype, m, n, seed):
    A = random_sparse(m, n, 0.3, dtype, seed=seed)
    return A, hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)


def test_vcat(cfg):
    be, dtype = cfg
    A, Ad = _mk(be, dtype, 8, 10, 81)
    B, Bd = _mk(be, dtype, 5, 10, 82)
    V = hl.vcat_sparse(Ad, Bd)
    assert_close(V.to_scipy().toarray(), sp.vstack([A, B]).toarray(), dtype)


def test_hcat(cfg):
    be, dtype = cfg
    A, Ad = _mk(be, dtype, 9, 6, 83)
    B, Bd = _mk(be, dtype, 9, 11, 84)
    H = hl.hcat_sparse(Ad, Bd)
    assert_close(H.to_scipy().toarray(), sp.hstack([A, B]).toarray(), dtype)


def test_grid_cat(cfg):
    be, dtype = cfg
    A11, D11 = _mk(be, dtype, 7, 5, 85)
    A12, D12 = _mk(be, dtype, 7, 8, 86)
    A21, D21 = _mk(be, dtype, 4, 5, 87)
    A22, D22 = _mk(be, dtype, 4, 8, 88)
    G = hl.cat_sparse(D11, D12, D21, D22, dims=(2, 2))
    ref = sp.bmat([[A11, A12], [A21, A22]]).toarray()
    assert_close(G.to_scipy().toarray(), ref, dtype)


def test_blockdiag(cfg):
    be, dtype = cfg
    A, Ad = _mk(be, dtype, 6, 7, 89)
    B, Bd = _mk(be, dtype, 4, 3, 90)
    C, Cd = _mk(be, dtype, 5, 5, 91)
    BD = hl.blockdiag(Ad, Bd, Cd)
    assert_close(BD.to_scipy().toarray(), sp.block_diag([A, B, C]).toarray(), dtype)


def test_blocks_plan_reuse(be4):
    A, Ad = _mk(be4, np.float64, 6, 6, 92)
    B, Bd = _mk(be4, np.float64, 6, 6, 93)
    n0 = hl.cache_sizes().get("blocks_plan", 0)
    _ = hl.vcat_sparse(Ad, Bd)
    _ = hl.vcat_sparse(Ad * 2.0, Bd * 3.0)  # same structures
    assert hl.cache_sizes().get("blocks_plan", 0) == n0 + 1


def test_ops_on_cat_result(be4):
    A, Ad = _mk(be4, np.float64, 5, 9, 94)
    B, Bd = _mk(be4, np.float64, 4, 9, 95)
    V = hl.vcat_sparse(Ad, Bd)
    x = np.random.default_rng(96).standard_normal(9)
    xv = hl.DistVector.from_global(x, be4)
    assert_close((V @ xv).to_numpy(), sp.vstack([A, B]) @ x, np.float64)

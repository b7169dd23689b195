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


def test_dense_vcat_hcat(cfg):
    """Ref: cat for HPCMatrix (blocks.jl:183)."""
    from utils import assert_padding_zero, dense_matrix

    be, dtype = cfg
    A = dense_matrix(7, 5, dtype, seed=21)
    B = dense_matrix(4, 5, dtype, seed=22)
    C = dense_matrix(7, 3, dtype, seed=23)
    Ad = hl.DistDenseMatrix.from_global(A, be, dtype=dtype)
    Bd = hl.DistDenseMatrix.from_global(B, be, dtype=dtype)
    Cd = hl.DistDenseMatrix.from_global(C, be, dtype=dtype)
    V = hl.vcat_dense(Ad, Bd)
    assert_close(V.to_numpy(), np.vstack([A, B]), dtype)
    assert_padding_zero(V)
    H = hl.hcat_dense(Ad, Cd)
    assert_close(H.to_numpy(), np.hstack([A, C]), dtype)
    assert_padding_zero(H)


def test_dense_grid_cat(cfg):
    from utils import dense_matrix

    be, dtype = cfg
    blocks = [dense_matrix(m, n, dtype, seed=30 + i)
              for i, (m, n) in enumerate([(6, 4), (6, 7), (3, 4), (3, 7)])]
    dist = [hl.DistDenseMatrix.from_global(b, be, dtype=dtype) for b in blocks]
    G = hl.cat(*dist, dims=(2, 2))
    ref = np.block([[blocks[0], blocks[1]], [blocks[2], blocks[3]]])
    assert_close(G.to_numpy(), ref, dtype)


def test_vector_cat(cfg):
    """Ref: vcat for HPCVector (blocks.jl:304-445)."""
    from utils import assert_padding_zero, rand_vector

    be, dtype = cfg
    a = rand_vector(9, dtype, seed=41)
    b = rand_vector(4, dtype, seed=42)
    c = rand_vector(13, dtype, seed=43)
    va = hl.DistVector.from_global(a, be, dtype=dtype)
    vb = hl.DistVector.from_global(b, be, dtype=dtype)
    vc = hl.DistVector.from_global(c, be, dtype=dtype)
    V = hl.vcat_vectors(va, vb, vc)
    assert_close(V.to_numpy(), np.concatenate([a, b, c]), dtype)
    assert_padding_zero(V)
    # generic dispatcher
    V2 = hl.cat(va, vb, vc)
    assert_close(V2.to_numpy(), np.concatenate([a, b, c]), dtype)


def test_dense_cat_plan_reuse(be4):
    from utils import dense_matrix

    A = dense_matrix(6, 4, np.float64, seed=51)
    B = dense_matrix(5, 4, np.float64, seed=52)
    Ad = hl.DistDenseMatrix.from_global(A, be4)
    Bd = hl.DistDenseMatrix.from_global(B, be4)
    n0 = hl.cache_sizes().get("dense_cat_rows", 0)
    _ = hl.vcat_dense(Ad, Bd)
    _ = hl.vcat_dense(Ad * 2.0, Bd * 3.0)  # same partitions -> cached plans
    assert hl.cache_sizes().get("dense_cat_rows", 0) == n0 + 2


def test_ops_on_cat_result(be4):
    A, Ad = _mk(be4, np.float64, 5, 9, 94)
    B, Bd = _mk(be4, np.float64, 4, 9, 95)
    V = hl.vcat_sparse(Ad, Bd)
    x = np.random.default_rng(96).standard_normal(9)
    xv = hl.DistVector.from_global(x, be4)
    assert_close((V @ xv).to_numpy(), sp.vstack([A, B]) @ x, np.float64)


def test_grid_cat_3x2_2x3(cfg):
    """Ref :169-226: non-square block grids."""
    be, dtype = cfg
    shapes32 = [(5, 4), (5, 6), (3, 4), (3, 6), (7, 4), (7, 6)]
    blocks = [random_sparse(m, n, 0.3, dtype, seed=60 + i)
              for i, (m, n) in enumerate(shapes32)]
    dist = [hl.DistSparseMatrix.from_scipy(b, be, dtype=dtype)
            for b in blocks]
    G = hl.cat_sparse(*dist, dims=(3, 2))
    ref = sp.bmat([[blocks[0], blocks[1]], [blocks[2], blocks[3]],
                   [blocks[4], blocks[5]]]).toarray()
    assert_close(G.to_scipy().toarray(), ref, dtype)

    shapes23 = [(5, 4), (5, 6), (5, 3), (2, 4), (2, 6), (2, 3)]
    blocks = [random_sparse(m, n, 0.3, dtype, seed=70 + i)
              for i, (m, n) in enumerate(shapes23)]
    dist = [hl.DistSparseMatrix.from_scipy(b, be, dtype=dtype)
            for b in blocks]
    G = hl.cat_sparse(*dist, dims=(2, 3))
    ref = sp.bmat([[blocks[0], blocks[1], blocks[2]],
                   [blocks[3], blocks[4], blocks[5]]]).toarray()
    assert_close(G.to_scipy().toarray(), ref, dtype)


def test_vector_hcat(cfg):
    """Ref :246-264: hcat of vectors -> dense matrix."""
    from utils import assert_padding_zero, rand_vector

    be, dtype = cfg
    a = rand_vector(11, dtype, seed=44)
    b = rand_vector(11, dtype, seed=45)
    c = rand_vector(11, dtype, seed=46)
    va = hl.DistVector.from_global(a, be, dtype=dtype)
    vb = hl.DistVector.from_global(b, be, dtype=dtype)
    vc = hl.DistVector.from_global(c, be, dtype=dtype)
    M = hl.hcat_vectors(va, vb, vc)
    assert isinstance(M, hl.DistDenseMatrix)
    assert M.shape == (11, 3)
    assert_close(M.to_numpy(), np.stack([a, b, c], axis=1), dtype)
    assert_padding_zero(M)
    # generic dispatcher with dims=2
    M2 = hl.cat(va, vb, dims=2)
    assert_close(M2.to_numpy(), np.stack([a, b], axis=1), dtype)
    # mismatched partitions align to the first operand
    vb2 = vb.repartition(np.array(
        [0, 2, 6, 9, 11])) if be.nshards == 4 else vb
    M3 = hl.hcat_vectors(va, vb2)
    assert_close(M3.to_numpy(), np.stack([a, b], axis=1), dtype)


def test_blockdiag_many_and_single(cfg):
    """Ref :267-283 + degenerate single block."""
    be, dtype = cfg
    A, Ad = _mk(be, dtype, 3, 3, 97)
    BD1 = hl.blockdiag(Ad)
    assert_close(BD1.to_scipy().toarray(), A.toarray(), dtype)
    mats = [_mk(be, dtype, 2 + i, 3 + i, 100 + i) for i in range(5)]
    BD = hl.blockdiag(*[d for _, d in mats])
    ref = sp.block_diag([m for m, _ in mats]).toarray()
    assert_close(BD.to_scipy().toarray(), ref, dtype)


def test_cat_with_empty_blocks(be4):
    """All-zero blocks inside a grid keep the layout correct."""
    A = random_sparse(4, 5, 0.4, seed=111)
    Z = sp.csr_matrix((4, 7))
    B = random_sparse(3, 5, 0.4, seed=112)
    C = random_sparse(3, 7, 0.4, seed=113)
    blocks = [A, Z, B, C]
    dist = [hl.DistSparseMatrix.from_scipy(sp.csr_matrix(b), be4)
            for b in blocks]
    G = hl.cat_sparse(*dist, dims=(2, 2))
    ref = sp.bmat([[A, Z], [B, C]]).toarray()
    assert_close(G.to_scipy().toarray(), ref, np.float64)


def test_vector_cat_tuple_dims(cfg):
    """Ref blocks.jl:349-383: cat(v...; dims=(n,1)) == vcat, dims=(1,n) ==
    hcat -> dense, dims=(1,1) returns the vector itself."""
    from utils import rand_vector

    be, dtype = cfg
    vs = [rand_vector(7, dtype, seed=120 + i) for i in range(3)]
    ds = [hl.DistVector.from_global(v, be, dtype=dtype) for v in vs]
    V = hl.cat(*ds, dims=(3, 1))
    assert isinstance(V, hl.DistVector)
    assert_close(V.to_numpy(), np.concatenate(vs), dtype)
    M = hl.cat(*ds, dims=(1, 3))
    assert isinstance(M, hl.DistDenseMatrix)
    assert_close(M.to_numpy(), np.stack(vs, axis=1), dtype)
    single = hl.cat(ds[0], dims=(1, 1))
    assert_close(single.to_numpy(), vs[0], dtype)
    import pytest

    with pytest.raises(ValueError):
        hl.cat(*ds, dims=(2, 2))
    with pytest.raises(ValueError):
        hl.cat(*ds, dims=(2, 1))


def test_three_block_cats(cfg):
    """Ref blocks.jl:103-142 uses THREE operands for vcat/hcat; cover the
    >2-block path plus a following SpMV on the result."""
    be, dtype = cfg
    A, Ad = _mk(be, dtype, 8, 10, 130)
    B, Bd = _mk(be, dtype, 5, 10, 131)
    C, Cd = _mk(be, dtype, 6, 10, 132)
    V = hl.cat(Ad, Bd, Cd, dims=1)
    ref = sp.vstack([A, B, C])
    assert_close(V.to_scipy().toarray(), ref.toarray(), dtype)
    H = hl.cat(Ad.transpose_materialized(), Bd.transpose_materialized(),
               Cd.transpose_materialized(), dims=2)
    assert_close(H.to_scipy().toarray(), ref.T.toarray(), dtype)

"""Mixed sparse×dense products, map_rows, local constructors, utilities —
mirrors test_new_operations.jl, test_map_rows.jl, test_local_constructors.jl,
test_utilities.jl."""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, dense_matrix, random_sparse, rand_vector


def test_sparse_times_dense(cfg):
    be, dtype = cfg
    A = random_sparse(14, 20, 0.25, dtype, seed=111)
    B = dense_matrix(20, 7, dtype, seed=112)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistDenseMatrix.from_global(B, be, dtype=dtype)
    C = Ad @ Bd
    assert_close(C.to_numpy(), A @ B, dtype)
    assert isinstance(C, hl.DistDenseMatrix)


def test_sparse_transpose_times_dense(cfg):
    be, dtype = cfg
    A = random_sparse(20, 14, 0.25, dtype, seed=113)
    B = dense_matrix(20, 5, dtype, seed=114)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistDenseMatrix.from_global(B, be, dtype=dtype)
    assert_close((Ad.T @ Bd).to_numpy(), A.T @ B, dtype)


def test_dense_times_sparse(cfg):
    be, dtype = cfg
    A = dense_matrix(9, 16, dtype, seed=115)
    B = random_sparse(16, 12, 0.3, dtype, seed=116)
    Ad = hl.DistDenseMatrix.from_global(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    assert_close((Ad @ Bd).to_numpy(), A @ B.toarray(), dtype)


def test_dense_times_sparse_fallback_path(cfg, monkeypatch):
    """Both engines of A_dn @ B_sp agree with the oracle: the allgather +
    densify MXU path (default) and the (Bᵀ Aᵀ)ᵀ transpose fallback for
    un-replicable B (forced by shrinking the densify gate)."""
    from hpclinalg.ops import mixed

    be, dtype = cfg
    A = dense_matrix(11, 23, dtype, seed=215)
    B = random_sparse(23, 17, 0.22, dtype, seed=216)
    Ad = hl.DistDenseMatrix.from_global(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    ref = A @ B.toarray()
    assert_close((Ad @ Bd).to_numpy(), ref, dtype)
    monkeypatch.setattr(mixed, "DXS_DENSIFY_MAX_ELEMS", 0)
    assert_close((Ad @ Bd).to_numpy(), ref, dtype)


def test_dense_times_sparse_tall_result(cfg):
    """Non-square shapes where the result is taller than either operand's
    common dimension (exercises the replicated densify indexing)."""
    be, dtype = cfg
    A = dense_matrix(26, 7, dtype, seed=217)
    B = random_sparse(7, 31, 0.4, dtype, seed=218)
    Ad = hl.DistDenseMatrix.from_global(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    C = Ad @ Bd
    assert C.m == 26 and C.ncols == 31
    assert_close(C.to_numpy(), A @ B.toarray(), dtype)


def test_map_rows_vectors(cfg):
    import jax.numpy as jnp

    be, dtype = cfg
    x = rand_vector(22, dtype, seed=117)
    y = rand_vector(22, dtype, seed=118)
    vx = hl.DistVector.from_global(x, be, dtype=dtype)
    vy = hl.DistVector.from_global(y, be, dtype=dtype,
                                   partition=None if be.nshards == 1 else None)
    r = hl.map_rows(lambda a, b: a * b + 2 * a, vx, vy)
    assert_close(r.to_numpy(), x * y + 2 * x, dtype)


def test_map_rows_mixed_partitions(be4):
    x = rand_vector(18)
    vx = hl.DistVector.from_global(x, be4)
    vy = hl.DistVector.from_global(x, be4, partition=np.array([0, 1, 9, 9, 18]))
    r = hl.map_rows(lambda a, b: a + b, vx, vy)
    assert_close(r.to_numpy(), 2 * x, np.float64)
    assert np.array_equal(r.partition, vx.partition)


def test_map_rows_dense(be4):
    import jax.numpy as jnp

    M = dense_matrix(15, 4)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    r = hl.map_rows(lambda row: jnp.dot(row, row), Md)
    assert_close(r.to_numpy(), (M * M).sum(axis=1), np.float64)


def test_vertex_indices(be4):
    p = np.array([0, 4, 9, 9, 17])
    vi = hl.vertex_indices(p, be4)
    assert_close(vi.to_numpy(), np.arange(17), np.int64)
    assert np.array_equal(vi.partition, p)


def test_local_constructors(cfg):
    be, dtype = cfg
    S = be.nshards
    # per-shard CSR pieces
    rng = np.random.default_rng(119)
    parts, rows = [], []
    ncols = 12
    for s in range(S):
        nl = int(rng.integers(0, 5))
        dense = (rng.random((nl, ncols)) < 0.4) * rng.standard_normal((nl, ncols))
        loc = sp.csr_matrix(dense)
        parts.append((loc.indptr.astype(np.int64), loc.indices.astype(np.int64),
                      loc.data.astype(dtype)))
        rows.append(np.asarray(dense, dtype=dtype))
    A = hl.DistSparseMatrix.from_local_csr(parts, ncols, be, dtype=dtype)
    ref = np.concatenate(rows, axis=0) if rows else np.zeros((0, ncols))
    assert_close(A.to_scipy().toarray(), ref, dtype)


def test_show_gathers(be4):
    """Gathering display (ref: Base.show, HPCLinearAlgebra.jl:941-1005)."""
    import io

    v = hl.DistVector.from_global(np.arange(6.0), be4)
    s = hl.show(v, stream=io.StringIO())
    assert "5." in s and "DistVector" in s
    A = hl.DistSparseMatrix.from_scipy(random_sparse(5, 5, 0.4, seed=9), be4)
    s = hl.show(A, stream=io.StringIO())
    assert "DistSparseMatrix" in s and "=" in s
    M = hl.DistDenseMatrix.from_global(np.eye(3), be4)
    s = hl.show(M, stream=io.StringIO())
    assert "1." in s


def test_utilities(be4):
    # io0 returns a writable stream
    import sys

    assert hl.io0(sys.stdout) is sys.stdout
    # cache sizes / clear
    hl.clear_plan_cache()
    assert all(v == 0 for v in hl.cache_sizes().values())
    x = hl.DistVector.from_global(rand_vector(10), be4)
    _ = x[2:8]
    assert hl.cache_sizes().get("vec_getindex", 0) >= 1
    hl.clear_plan_cache("vec_getindex")
    assert hl.cache_sizes().get("vec_getindex", 0) == 0
    hl.check_cache_sizes(max_entries=1000)


def test_hashing_identities(be4):
    A = random_sparse(10, 10, 0.3, seed=120)
    Ad1 = hl.DistSparseMatrix.from_scipy(A, be4)
    Ad2 = hl.DistSparseMatrix.from_scipy(A, be4)
    assert Ad1.hash == Ad2.hash  # same structure, same hash
    B = random_sparse(10, 10, 0.3, seed=121)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    assert Ad1.hash != Bd.hash
    assert (Ad1 * 2.0).hash == Ad1.hash  # value change preserves structure


def test_lazy_transpose_converters(be4):
    v = hl.DistVector.from_global(np.arange(5.0), be4)
    rt = v.T
    arr = rt.to_numpy()
    assert arr.shape == rt.shape == (1, 5)
    M = hl.DistDenseMatrix.from_global(np.arange(6.0).reshape(3, 2), be4)
    with pytest.raises(TypeError, match="to_scipy"):
        M.T.to_scipy()
    assert M.T.to_numpy().shape == (2, 3)


def test_map_rows_out_dtype(be4):
    v = hl.DistVector.from_global(np.arange(8.0), be4)
    w = hl.map_rows(lambda x: x * 2, v, out_dtype=np.float32)
    assert w.dtype == np.float32
    assert np.allclose(w.to_numpy(), np.arange(8.0) * 2)

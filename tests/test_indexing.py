"""Indexing — mirrors test_indexing.jl (~30 cases: range get/set, fancy
with distributed index vectors, matrix slicing, scalar rejection)."""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, random_sparse, rand_vector


def test_vector_slice(cfg):
    be, dtype = cfg
    x = rand_vector(40, dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    for sl in (slice(3, 27), slice(0, 40), slice(5, 6), slice(2, 38, 3)):
        got = v[sl]
        assert_close(got.to_numpy(), x[sl], dtype)
        assert_padding_zero(got)


def test_vector_fancy(cfg):
    be, dtype = cfg
    x = rand_vector(30, dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    idx = np.array([4, 1, 28, 7, 7, 0])
    assert_close(v[idx].to_numpy(), x[idx], dtype)
    # distributed index vector (ref indexing.jl:1339)
    iv = hl.DistVector.from_global(idx.astype(np.float64), be)
    got = v[iv]
    assert_close(got.to_numpy(), x[idx], dtype)
    assert np.array_equal(got.partition, iv.partition)


def test_vector_setindex_slice(cfg):
    be, dtype = cfg
    x = rand_vector(24, dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    v[3:9] = 7.0
    xe = x.copy()
    xe[3:9] = 7.0
    assert_close(v.to_numpy(), xe, dtype)
    assert_padding_zero(v)
    w = rand_vector(5, dtype, seed=71)
    v[10:15] = hl.DistVector.from_global(w, be, dtype=dtype)
    xe[10:15] = w
    assert_close(v.to_numpy(), xe, dtype)


def test_vector_setindex_fancy(be4):
    x = rand_vector(20)
    v = hl.DistVector.from_global(x, be4)
    idx = np.array([2, 15, 9])
    vals = np.array([10.0, 20.0, 30.0])
    v[idx] = vals
    xe = x.copy()
    xe[idx] = vals
    assert_close(v.to_numpy(), xe, np.float64)


def test_vector_setindex_duplicate_ids(be4):
    """Duplicate indices: last write wins (Julia setindex! semantics; ADVICE
    r1 low finding — JAX scatter leaves the winner unspecified)."""
    x = rand_vector(20)
    v = hl.DistVector.from_global(x, be4)
    idx = np.array([4, 11, 4, 7, 11, 11])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    v[idx] = vals
    xe = x.copy()
    for i, val in zip(idx, vals):
        xe[i] = val
    assert_close(v.to_numpy(), xe, np.float64)
    assert_padding_zero(v)


def test_scalar_indexing_rejected(be4):
    """Ref: scalar indexing deliberately removed (indexing.jl:17-21)."""
    v = hl.DistVector.from_global(rand_vector(10), be4)
    with pytest.raises(TypeError):
        v[3]
    A = hl.DistSparseMatrix.from_scipy(random_sparse(10, 10, 0.3, seed=72), be4)
    with pytest.raises(TypeError):
        A[3, 4]


def test_sparse_range_indexing(cfg):
    be, dtype = cfg
    A = random_sparse(30, 25, 0.2, dtype, seed=73)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    S = Ad[5:22, 3:20]
    assert_close(S.to_scipy().toarray(), A[5:22, 3:20].toarray(), dtype)
    S2 = Ad[0:30, 10:11]
    assert_close(S2.to_scipy().toarray(), A[:, 10:11].toarray(), dtype)


def test_sparse_fancy_indexing(cfg):
    be, dtype = cfg
    A = random_sparse(20, 20, 0.3, dtype, seed=74)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    ridx = np.array([3, 11, 0, 19])
    cidx = np.array([5, 2, 18])
    S = Ad[ridx, cidx]
    assert_close(S.to_scipy().toarray(), A[np.ix_(ridx, cidx)].toarray(), dtype)
    # mixed range x fancy
    S2 = Ad[4:16, cidx]
    assert_close(S2.to_scipy().toarray(), A[4:16][:, cidx].toarray(), dtype)
    S3 = Ad[ridx, 0:20]
    assert_close(S3.to_scipy().toarray(), A[ridx].toarray(), dtype)


def test_sparse_fancy_with_distvector(be4):
    A = random_sparse(18, 18, 0.3, seed=75)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    ridx = np.array([1, 7, 13])
    iv = hl.DistVector.from_global(ridx.astype(float), be4)
    S = Ad[iv, 0:18]
    assert_close(S.to_scipy().toarray(), A[ridx].toarray(), np.float64)


def test_indexing_plan_reuse(be4):
    x = rand_vector(32)
    v = hl.DistVector.from_global(x, be4)
    n0 = hl.cache_sizes().get("vec_getindex", 0)
    _ = v[4:20]
    _ = v[4:20]
    assert hl.cache_sizes().get("vec_getindex", 0) == n0 + 1


def test_sparse_setindex(be4):
    import scipy.sparse as sp

    A = random_sparse(16, 16, 0.2, seed=76)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    h0 = Ad.hash
    Ad[2:6, 3:9] = 5.0
    ref = A.tolil()
    ref[2:6, 3:9] = 5.0
    assert_close(Ad.to_scipy().toarray(), ref.toarray(), np.float64)
    assert Ad.hash != h0  # structural change invalidated identity
    # ops still work after mutation
    x = rand_vector(16)
    xv = hl.DistVector.from_global(x, be4)
    assert_close((Ad @ xv).to_numpy(), ref.tocsr() @ x, np.float64)


def test_sparse_setindex_block(be4):
    import scipy.sparse as sp

    A = random_sparse(14, 14, 0.25, seed=77)
    B = random_sparse(4, 5, 0.5, seed=78)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    Ad[1:5, 2:7] = Bd
    ref = A.tolil()
    ref[1:5, 2:7] = B.toarray()
    assert_close(Ad.to_scipy().toarray(), ref.toarray(), np.float64)


def test_dense_setindex(be4):
    from utils import dense_matrix

    M = dense_matrix(12, 8)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    Md[3:7, 2:5] = -1.5
    ref = M.copy()
    ref[3:7, 2:5] = -1.5
    assert_close(Md.to_numpy(), ref, np.float64)
    ridx = np.array([0, 10])
    vals = np.arange(16.0).reshape(2, 8)
    Md[ridx, 0:8] = vals
    ref[ridx] = vals
    assert_close(Md.to_numpy(), ref, np.float64)


def test_sparse_setindex_large_local(be4):
    """Setting a 10-row block of a 100k-row matrix must run in O(local nnz),
    never materializing the matrix densely (VERDICT r1 item 4)."""
    import time

    n = 100_000
    A = sp.diags([np.full(n - 1, -1.0), np.full(n, 2.0), np.full(n - 1, -1.0)],
                 [-1, 0, 1], format="csr")
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    rows = np.arange(500, 510)
    cols = np.array([3, 77, 4000, 99_999])
    V = np.arange(40, dtype=np.float64).reshape(10, 4) + 1.0
    t0 = time.time()
    Ad[rows, cols] = V
    elapsed = time.time() - t0
    assert elapsed < 30.0  # densified O(m*n) would be ~80 GB / minutes
    ref = A.tolil()
    ref[np.ix_(rows, cols)] = V
    got = Ad.to_scipy()
    d = (got - ref.tocsr())
    assert (abs(d).max() if d.nnz else 0.0) == 0.0
    # hash invalidation: new pattern, transpose cache dropped
    assert Ad.cached_transpose is None


def test_sparse_setindex_duplicate_ids(be4):
    A = random_sparse(12, 12, 0.4, seed=77)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    rows = np.array([2, 5, 2])
    cols = np.array([1, 3])
    V = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    Ad[rows, cols] = V
    ref = A.tolil()
    ref[np.ix_([5, 2], [1, 3])] = np.array([[3.0, 4.0], [5.0, 6.0]])
    d = Ad.to_scipy() - ref.tocsr()
    assert (abs(d).max() if d.nnz else 0.0) == 0.0


def test_spgemm_pair_cap_chunks(be4, monkeypatch):
    """Pair-engine memory guard: above PAIR_CAP the product streams bounded
    chunks and still matches the oracle (VERDICT r1 weak #7)."""
    import warnings

    import hpclinalg.ops.spgemm as spgemm_mod

    monkeypatch.setattr(spgemm_mod, "PAIR_CAP", 256)
    A = random_sparse(40, 40, 0.25, seed=411)
    B = random_sparse(40, 40, 0.25, seed=412)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Bd = hl.DistSparseMatrix.from_scipy(B, be4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        C = Ad @ Bd
        plan = spgemm_mod.get_spgemm_plan(Ad, Bd)
    assert plan.nchunks > 1
    assert_close(C.to_scipy().toarray(), (A @ B).toarray(), np.float64)


def test_sparse_fancy_duplicates(be4):
    """Julia fancy-index semantics: repeated indices replicate rows/cols."""
    A = random_sparse(16, 14, 0.3, seed=79)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    ridx = np.array([2, 2, 9, 0, 2])
    cidx = np.array([3, 1, 1, 13])
    S = Ad[ridx, cidx]
    assert_close(S.to_scipy().toarray(), A.toarray()[np.ix_(ridx, cidx)],
                 np.float64)


def test_setindex_bounds_checked(be4):
    """OOB ids must raise (ref BoundsError), not silently corrupt other
    entries via flat-index wrap (dense) or unowned columns (sparse)."""
    A = hl.DistSparseMatrix.from_scipy(sp.eye(10).tocsr(), be4)
    M = hl.DistDenseMatrix.from_global(np.zeros((10, 10)), be4)
    for bad_r, bad_c in (([10], [0]), ([0], [10]), ([-1], [0]), ([0], [-1])):
        with pytest.raises(IndexError):
            A[bad_r, bad_c] = 1.0
        with pytest.raises(IndexError):
            M[bad_r, bad_c] = 1.0


def test_setindex_complex_into_real_raises(be4):
    """Assigning complex values into a real container must raise instead of
    silently dropping the imaginary part (matches the solver's guard)."""
    A = hl.DistSparseMatrix.from_scipy(sp.eye(10).tocsr(), be4)
    M = hl.DistDenseMatrix.from_global(np.zeros((10, 10)), be4)
    with pytest.raises(TypeError):
        A[[0], [0]] = 1 + 2j
    with pytest.raises(TypeError):
        M[[0], [0]] = 1 + 2j


def test_int_index_bounds_checked(be4):
    """Scalar row/column indices: negative and OOB must raise (sparse
    previously normalized to an EMPTY slice and returned zeros; dense was
    clamped by JAX to the last column)."""
    A = hl.DistSparseMatrix.from_scipy(sp.eye(8).tocsr(), be4)
    M = hl.DistDenseMatrix.from_global(np.arange(32.0).reshape(8, 4), be4)
    for bad in (-1, 8):
        with pytest.raises(IndexError):
            A[:, bad]
        with pytest.raises(IndexError):
            A[bad, :]
    for bad in (-1, 4):
        with pytest.raises(IndexError):
            M[:, bad]
    # valid int column still works
    assert np.allclose(M[:, 2].to_numpy(), np.arange(32.0).reshape(8, 4)[:, 2])


def test_sparse_row_and_col_to_vector(cfg):
    """A[k, cols] -> row as DistVector; A[rows, k] -> column slice
    (ref indexing.jl:385/872 A[:,k] plus idx-x-Int forms :1654)."""
    be, dtype = cfg
    A = random_sparse(15, 11, 0.35, dtype, seed=170)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    D = A.toarray()
    col = Ad[:, 4]
    assert isinstance(col, hl.DistVector)
    assert_close(col.to_numpy(), D[:, 4], dtype)
    row = Ad[7, :]
    assert isinstance(row, hl.DistVector)
    assert_close(row.to_numpy(), D[7, :], dtype)
    picked = Ad[[3, 9, 0, 9], 2]
    assert_close(picked.to_numpy(), D[[3, 9, 0, 9], 2], dtype)
    rpick = Ad[5, [1, 10, 1]]
    assert_close(rpick.to_numpy(), D[5, [1, 10, 1]], dtype)


def test_sparse_mixed_range_fancy(cfg):
    """Mixed range x idx forms both ways (ref indexing.jl:1483-1654)."""
    be, dtype = cfg
    A = random_sparse(18, 14, 0.3, dtype, seed=171)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    D = A.toarray()
    S1 = Ad[2:15, [0, 5, 13, 5]]
    assert_close(S1.to_scipy().toarray(), D[2:15][:, [0, 5, 13, 5]], dtype)
    S2 = Ad[[17, 4, 4, 11], 3:12]
    assert_close(S2.to_scipy().toarray(), D[[17, 4, 4, 11], 3:12], dtype)


def test_strided_slices(cfg):
    """Strided ranges (ref indexing.jl range forms support step)."""
    be, dtype = cfg
    A = random_sparse(20, 20, 0.3, dtype, seed=172)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    D = A.toarray()
    assert_close(Ad[::2, 1::3].to_scipy().toarray(), D[::2, 1::3], dtype)
    v = rand_vector(21, dtype, seed=173)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    assert_close(vd[2::4].to_numpy(), v[2::4], dtype)


def test_dense_fancy_and_column(cfg):
    """Dense fancy gets, M[:, k] and M[k, :] vector extraction
    (ref indexing.jl dense sections :691-940)."""
    from utils import dense_matrix

    be, dtype = cfg
    M = dense_matrix(16, 9, dtype, seed=174)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    col = Md[:, 6]
    assert isinstance(col, hl.DistVector)
    assert_close(col.to_numpy(), M[:, 6], dtype)
    row = Md[3, :]
    assert_close(row.to_numpy(), M[3, :], dtype)
    F = Md[[15, 2, 2, 8], :]
    assert_close(F.to_numpy(), M[[15, 2, 2, 8], :], dtype)
    G = Md[4:12, [8, 0, 3]]
    assert_close(G.to_numpy(), M[4:12][:, [8, 0, 3]], dtype)

"""SpMV and dense matvec — mirrors test_vector_multiplication.jl."""

import numpy as np

import hpclinalg as hl
from utils import (assert_close, assert_padding_zero, dense_matrix,
                   random_sparse, rand_vector, tridiagonal_matrix)


def test_spmv_square(cfg):
    be, dtype = cfg
    A = tridiagonal_matrix(30, dtype)
    x = rand_vector(30, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Ad @ xv
    assert_close(y.to_numpy(), A @ x, dtype)
    assert_padding_zero(y)
    assert np.array_equal(y.partition, Ad.row_partition)


def test_spmv_nonsquare(cfg):
    be, dtype = cfg
    A = random_sparse(17, 35, 0.25, dtype, seed=13)
    x = rand_vector(35, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Ad @ xv).to_numpy(), A @ x, dtype)


def test_spmv_plan_reuse(be4):
    """Repeated products with the same structures hit the memoized plan
    (ref: get_vector_plan cache, sparse.jl:1992)."""
    A = random_sparse(20, 20, 0.3, seed=14)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(20)
    xv = hl.DistVector.from_global(x, be4)
    before = hl.cache_sizes().get("vector_plan", 0)
    for _ in range(3):
        y = Ad @ xv
    after = hl.cache_sizes().get("vector_plan", 0)
    assert after <= before + 1
    assert_close(y.to_numpy(), A @ x, np.float64)


def test_spmv_mismatched_x_partition(be4):
    A = random_sparse(20, 20, 0.3, seed=15)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(20)
    xv = hl.DistVector.from_global(x, be4, partition=np.array([0, 1, 3, 18, 20]))
    assert_close((Ad @ xv).to_numpy(), A @ x, np.float64)


def test_dense_matvec(cfg):
    be, dtype = cfg
    M = dense_matrix(21, 13, dtype)
    x = rand_vector(13, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Md @ xv).to_numpy(), M @ x, dtype)


def test_dense_transpose_matvec(cfg):
    """transpose(A)*x via partials+psum, no materialization
    (ref: DenseTransposeVectorPlan, dense.jl:1000-1261)."""
    be, dtype = cfg
    M = dense_matrix(21, 13, dtype)
    y = rand_vector(21, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    yv = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close((Md.T @ yv).to_numpy(), M.T @ y, dtype)


def test_sparse_transpose_matvec(cfg):
    be, dtype = cfg
    A = random_sparse(18, 25, 0.25, dtype, seed=16)
    y = rand_vector(18, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    yv = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close((Ad.T @ yv).to_numpy(), A.T @ y, dtype)


def test_spmv_explicit_pattern_nonsquare(cfg):
    """Ref :95-119: the specific 6x8 pattern with duplicate (1,1)/(2,2)
    entries summed by sparse() — exercised with complex values too."""
    import scipy.sparse as sp

    be, dtype = cfg
    I = np.array([1, 2, 3, 4, 5, 6, 1, 2, 3, 4]) - 1
    J = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 2]) - 1
    V = np.arange(1, 11, dtype=np.float64)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        V = V + 1j * np.arange(10, 0, -1)
    A = sp.csr_matrix((V.astype(dtype), (I, J)), shape=(6, 8))
    A.sum_duplicates()
    x = rand_vector(8, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Ad @ xv
    assert len(y) == 6
    assert_close(y.to_numpy(), A @ x, dtype)


def test_vector_transpose_adjoint_times_sparse(cfg):
    """Ref :123-160: conj(v), transpose(v)*A = transpose(Aᵀv), and
    v'*A = transpose(Aᵀ conj(v)) — the lazy row-vector identities."""
    from hpclinalg.lazy import LazyTranspose

    be, dtype = cfg
    n = 8
    A = tridiagonal_matrix(n, dtype)
    x = rand_vector(n, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close(xv.conj().to_numpy(), np.conj(x), dtype)
    yt = xv.T @ Ad
    assert isinstance(yt, LazyTranspose)
    assert_close(yt.parent.to_numpy(), x @ A.toarray(), dtype)
    yh = xv.H @ Ad
    assert isinstance(yh, LazyTranspose)
    assert_close(yh.parent.to_numpy(), x.conj() @ A.toarray(), dtype)


def test_vector_norms(cfg):
    """Ref :163-195: 2-, 1-, and Inf-norms."""
    be, dtype = cfg
    v = rand_vector(10, dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    assert_close(float(vd.norm()), np.linalg.norm(v), dtype)
    assert_close(float(vd.norm(1)), np.abs(v).sum(), dtype)
    assert_close(float(vd.norm(np.inf)), np.abs(v).max(), dtype)


def test_vector_reductions(cfg):
    """Ref :198-225: sum, mean, and (real) extrema."""
    be, dtype = cfg
    v = rand_vector(10, dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    assert_close(complex(vd.sum()), v.sum(), dtype)
    assert_close(complex(vd.mean()), v.mean(), dtype)
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        assert_close(float(vd.max()), v.max(), dtype)
        assert_close(float(vd.min()), v.min(), dtype)
    w = rand_vector(10, dtype, seed=8)
    wd = hl.DistVector.from_global(w, be, dtype=dtype)
    # Julia dot convention: conj(v)' * w == numpy vdot
    assert_close(complex(vd.dot(wd)), np.vdot(v, w), dtype)


def test_vector_addsub(cfg):
    """Ref :228-258."""
    be, dtype = cfg
    v = rand_vector(9, dtype, seed=3)
    w = rand_vector(9, dtype, seed=4)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    wd = hl.DistVector.from_global(w, be, dtype=dtype)
    assert_close((vd + wd).to_numpy(), v + w, dtype)
    assert_close((vd - wd).to_numpy(), v - w, dtype)
    assert_padding_zero(vd + wd)


def test_vector_scalar_ops(cfg):
    """Ref :261-313: a*v, v*a, v/a, and the lazy-transpose variants
    a*vᵀ, vᵀ*a, vᵀ/a."""
    from hpclinalg.lazy import LazyTranspose

    be, dtype = cfg
    v = rand_vector(8, dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    a = dtype(3.5 + 0.5j) if np.issubdtype(np.dtype(dtype),
                                           np.complexfloating) else dtype(3.5)
    assert_close((a * vd).to_numpy(), a * v, dtype)
    assert_close((vd * a).to_numpy(), a * v, dtype)
    assert_close((vd / a).to_numpy(), v / a, dtype)
    wt = a * vd.T
    assert isinstance(wt, LazyTranspose)
    assert_close(wt.parent.to_numpy(), a * v, dtype)
    wt2 = vd.T * a
    assert isinstance(wt2, LazyTranspose)
    assert_close(wt2.parent.to_numpy(), a * v, dtype)


def test_different_partitions_alignment(be4):
    """Ref :316-385: binary ops align mismatched partitions; the result
    carries the LEFT operand's partition."""
    n = 12
    u = rand_vector(n, seed=11)
    v = rand_vector(n, seed=12)
    ud = hl.DistVector.from_global(u, be4)
    custom = np.array([0, 2, 5, 9, 12])
    vd = hl.DistVector.from_global(v, be4, partition=custom)
    assert not np.array_equal(ud.partition, vd.partition)
    w = ud + vd
    assert_close(w.to_numpy(), u + v, np.float64)
    assert np.array_equal(w.partition, ud.partition)
    assert_close((ud - vd).to_numpy(), u - v, np.float64)
    w2 = vd + ud
    assert_close(w2.to_numpy(), u + v, np.float64)
    assert np.array_equal(w2.partition, vd.partition)
    # transpose(u) + transpose(v) across partitions
    wt = ud.T + vd.T
    assert_close(wt.parent.to_numpy(), u + v, np.float64)


def test_vector_size_eltype(be4):
    """Ref :388-399."""
    v = hl.DistVector.from_global(np.arange(1.0, 9.0), be4)
    assert len(v) == 8
    assert v.shape == (8,)
    assert np.dtype(v.dtype) == np.dtype(np.float64)


def test_spmv_aliasing(cfg):
    """y = A @ y-style aliasing: immutable arrays make this safe by
    construction — the ref guards mul! aliasing; here the old y must be
    unchanged after the product."""
    be, dtype = cfg
    A = tridiagonal_matrix(12, dtype)
    x = rand_vector(12, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    y1 = Ad @ xv
    y2 = Ad @ y1
    assert_close(y1.to_numpy(), A @ x, dtype)       # y1 not clobbered
    assert_close(y2.to_numpy(), A @ (A @ x), dtype)


def test_spmv_empty_shards(be4):
    """Partitions with empty shards (ref: asymmetric partitions in
    test_factorization.jl:134-515 use them; every op must tolerate
    zero-row shards)."""
    A = random_sparse(12, 12, 0.4, seed=17)
    part = np.array([0, 0, 7, 7, 12])
    Ad = hl.DistSparseMatrix.from_scipy(A, be4, row_partition=part)
    x = rand_vector(12)
    xv = hl.DistVector.from_global(x, be4, partition=part)
    y = Ad @ xv
    assert_close(y.to_numpy(), A @ x, np.float64)
    assert np.array_equal(y.partition, part)


def test_spmv_value_refresh_same_plan(be4):
    """The plan/execute split contract: same structure + new values reuse
    the SAME compiled plan and produce the new product (ref: values-only
    re-execution, execute_plan!, vectors.jl:394)."""
    A = random_sparse(25, 25, 0.25, seed=18)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(25)
    xv = hl.DistVector.from_global(x, be4)
    _ = Ad @ xv
    n0 = hl.cache_sizes().get("vector_plan", 0)
    A2 = A.copy()
    A2.data[:] = np.random.default_rng(19).standard_normal(A.nnz)
    Ad2 = hl.DistSparseMatrix.from_scipy(A2, be4)  # same pattern
    y2 = Ad2 @ xv
    assert hl.cache_sizes().get("vector_plan", 0) == n0  # plan reused
    assert_close(y2.to_numpy(), A2 @ x, np.float64)


def test_spmv_after_setindex_invalidation(be4):
    """Structural setindex invalidates the hash: the next product must NOT
    ride the stale plan (ref: indexing.jl:1276-1295 invalidation)."""
    A = random_sparse(15, 15, 0.3, seed=20)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    x = rand_vector(15)
    xv = hl.DistVector.from_global(x, be4)
    assert_close((Ad @ xv).to_numpy(), A @ x, np.float64)
    Ad[2:5, 3:9] = 7.5
    D = A.toarray().copy()
    D[2:5, 3:9] = 7.5
    assert_close((Ad @ xv).to_numpy(), D @ x, np.float64)

"""Dense matrix ops — scenario-for-scenario port of
/root/reference/test/test_dense_matrix.jl (463 LoC, 30 scenarios):
construction + local-rows check (:47-75), A*x (:78-96), repeated matvec in
place of mul! (:99-118 — JAX arrays are immutable; plan reuse is the
contract being tested), transpose(A)*x (:121-140), adjoint(A)*x complex
(:143-164), transpose(v)*A and v'*A row-vector algebra (:167-209),
transpose materialization (:212-229), adjoint materialization (:232-250),
scalar multiplication incl. lazy-transpose scalars (:253-284), conj
(:287-303), elementwise norms 2/1/Inf (:306-328), operator norms 1/Inf
(:331-347), square-matrix ops (:350-377), mapslices dims=2 / dims=1 /
partition preservation (:381-440)."""

import numpy as np

import hpclinalg as hl
from hpclinalg.lazy import LazyTranspose
from utils import assert_close, assert_padding_zero, dense_matrix, rand_vector


def test_construction(cfg):
    """Ref :47-75: sizes, eltype, per-shard local rows match the slice."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert Md.shape == (m, n)
    assert Md.m == m and Md.ncols == n
    assert np.dtype(Md.dtype) == np.dtype(dtype)
    rp = Md.row_partition
    data = np.asarray(Md.data)
    for s in range(be.nshards):
        nl = int(rp[s + 1] - rp[s])
        assert_close(data[s, :nl], M[rp[s]:rp[s + 1]], dtype)
    assert_padding_zero(Md)


def test_matvec(cfg):
    """Ref :78-96 (A*x) and :99-118 (mul!): the second product reuses the
    cached plan — values-only re-execution is the mul! analogue."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    x = rand_vector(n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xd = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Md @ xd
    assert isinstance(y, hl.DistVector)
    assert_close(y.to_numpy(), M @ x, dtype)
    assert_padding_zero(y)
    # "mul!": same plan, fresh values
    x2 = rand_vector(n, dtype, seed=7)
    xd2 = hl.DistVector.from_global(x2, be, dtype=dtype)
    assert_close((Md @ xd2).to_numpy(), M @ x2, dtype)


def test_transpose_matvec(cfg):
    """Ref :121-140: transpose(A)*x via local partials + allreduce
    (DenseTransposeVectorPlan role, dense.jl:1000-1261)."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    x = rand_vector(m, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xd = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Md.T @ xd
    assert isinstance(y, hl.DistVector)
    assert len(y) == n
    assert_close(y.to_numpy(), M.T @ x, dtype)


def test_adjoint_matvec(cfg):
    """Ref :143-164 (complex only there; here for all dtypes — real adjoint
    degenerates to transpose)."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    x = rand_vector(m, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xd = hl.DistVector.from_global(x, be, dtype=dtype)
    y = Md.H @ xd
    assert_close(y.to_numpy(), M.conj().T @ x, dtype)


def test_rowvector_times_matrix(cfg):
    """Ref :167-209: transpose(v)*A and v'*A return lazy row vectors whose
    parent is the column-space vector."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    v = rand_vector(m, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    yt = vd.T @ Md
    assert isinstance(yt, LazyTranspose)
    assert_close(yt.parent.to_numpy(), v @ M, dtype)
    yh = vd.H @ Md
    assert isinstance(yh, LazyTranspose)
    assert_close(yh.parent.to_numpy(), v.conj() @ M, dtype)


def test_transpose_materialization(cfg):
    """Ref :212-229: copy(transpose(A)) is a real (n, m) distributed
    matrix."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Mt = Md.transpose_materialized()
    assert isinstance(Mt, hl.DistDenseMatrix)
    assert Mt.shape == (n, m)
    assert_close(Mt.to_numpy(), M.T, dtype)
    # lazy handle materializes to the same thing
    assert_close(Md.T.materialize().to_numpy(), M.T, dtype)


def test_adjoint_materialization(cfg):
    """Ref :232-250: copy(adjoint(A)) — complex conjugate-transpose."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Mh = Md.H.materialize()
    assert Mh.shape == (n, m)
    assert_close(Mh.to_numpy(), M.conj().T, dtype)


def test_scalar_multiplication(cfg):
    """Ref :253-284: a*A, A*a, and scalar × lazy transpose staying lazy."""
    be, dtype = cfg
    m, n = 8, 6
    M = dense_matrix(m, n, dtype)
    a = dtype(3.5 + 0.5j) if np.issubdtype(np.dtype(dtype),
                                           np.complexfloating) else dtype(3.5)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close((a * Md).to_numpy(), a * M, dtype)
    assert_close((Md * a).to_numpy(), a * M, dtype)
    Ct = a * Md.T
    assert isinstance(Ct, LazyTranspose)
    assert_close(Ct.materialize().to_numpy(), (a * M).T, dtype)
    Ct2 = Md.T * a
    assert isinstance(Ct2, LazyTranspose)
    assert_close(Ct2.materialize().to_numpy(), (a * M).T, dtype)


def test_conj(cfg):
    """Ref :287-303."""
    be, dtype = cfg
    M = dense_matrix(8, 6, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(Md.conj().to_numpy(), np.conj(M), dtype)
    assert_close(Md.real().to_numpy(), M.real, dtype)
    assert_close(Md.imag().to_numpy(), M.imag, dtype)


def test_elementwise_norms(cfg):
    """Ref :306-328: Frobenius, elementwise 1-norm, elementwise Inf-norm."""
    be, dtype = cfg
    M = dense_matrix(8, 6, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(float(Md.norm()), np.linalg.norm(M), dtype)
    assert_close(float(Md.norm(1)), np.abs(M).sum(), dtype)
    assert_close(float(Md.norm(np.inf)), np.abs(M).max(), dtype)
    assert_close(float(Md.norm(3)), (np.abs(M) ** 3).sum() ** (1 / 3), dtype)


def test_operator_norms(cfg):
    """Ref :331-347: opnorm 1 (max col sum) and Inf (max row sum)."""
    be, dtype = cfg
    M = dense_matrix(8, 6, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(float(Md.opnorm(1)), np.abs(M).sum(axis=0).max(), dtype)
    assert_close(float(Md.opnorm(np.inf)), np.abs(M).sum(axis=1).max(), dtype)


def test_square_matrix_ops(cfg):
    """Ref :350-377: square A*x and transpose(A)*x share the partition."""
    be, dtype = cfg
    n = 8
    M = dense_matrix(n, n, dtype)
    x = rand_vector(n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    xd = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Md @ xd).to_numpy(), M @ x, dtype)
    yt = Md.T @ xd
    assert_close(yt.to_numpy(), M.T @ x, dtype)
    assert np.array_equal(yt.partition, (Md @ xd).partition)


def test_mapslices_rows(cfg):
    """Ref :381-406: dims=2 row-wise with a vector-valued function."""
    import jax.numpy as jnp

    be, dtype = cfg
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        dtype = np.float64  # ref uses the real type for mapslices
    m, n = 8, 5
    M = dense_matrix(m, n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)

    def f_row(row):
        return jnp.stack([jnp.linalg.norm(row), jnp.max(row), jnp.sum(row)])

    Bd = Md.mapslices(f_row, axis=1)
    ref = np.stack([[np.linalg.norm(r), r.max(), r.sum()] for r in M])
    assert Bd.shape == (m, 3)
    assert_close(Bd.to_numpy(), ref, dtype)


def test_mapslices_columns(cfg):
    """Ref :409-426: dims=1 column-wise."""
    import jax.numpy as jnp

    be, dtype = cfg
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        dtype = np.float64
    m, n = 8, 5
    M = dense_matrix(m, n, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)

    def f_col(col):
        return jnp.stack([jnp.linalg.norm(col), jnp.max(col)])

    Bd = Md.mapslices(f_col, axis=0)
    ref = np.stack([[np.linalg.norm(M[:, j]), M[:, j].max()]
                    for j in range(n)], axis=1)
    assert Bd.shape == (2, n)
    assert_close(Bd.to_numpy(), ref, dtype)


def test_mapslices_preserves_partition(cfg):
    """Ref :429-440: dims=2 output keeps the input row partition."""
    import jax.numpy as jnp

    be, dtype = cfg
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        dtype = np.float64
    M = dense_matrix(8, 5, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Bd = Md.mapslices(lambda r: jnp.stack([jnp.linalg.norm(r), jnp.max(r)]),
                      axis=1)
    assert np.array_equal(Bd.row_partition, Md.row_partition)


def test_matmat_shapes(cfg):
    """Dense × dense across non-square shapes (ref matmul coverage)."""
    be, dtype = cfg
    for (m, k, n) in [(13, 17, 8), (5, 3, 9), (1, 7, 1)]:
        M = dense_matrix(m, k, dtype, seed=m)
        N = dense_matrix(k, n, dtype, seed=n)
        Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
        Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
        assert_close((Md @ Nd).to_numpy(), M @ N, dtype)


def test_arithmetic(cfg):
    be, dtype = cfg
    M = dense_matrix(14, 9, dtype, seed=61)
    N = dense_matrix(14, 9, dtype, seed=62)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
    assert_close((Md + Nd).to_numpy(), M + N, dtype)
    assert_close((Md - Nd).to_numpy(), M - N, dtype)
    assert_close((Md * 2.0).to_numpy(), 2 * M, dtype)
    assert_close((Md / 2.0).to_numpy(), M / 2, dtype)
    assert_close((-Md).to_numpy(), -M, dtype)
    assert_close((Md + 1.0).to_numpy(), M + 1.0, dtype)
    assert_padding_zero(Md + 1.0)
    assert_close(abs(Md).to_numpy(), np.abs(M), dtype)


def test_reductions(cfg):
    be, dtype = cfg
    M = dense_matrix(12, 7, dtype, seed=67)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(Md.sum(), M.sum(), dtype)
    assert_close(Md.sum(axis=0), M.sum(axis=0), dtype)
    assert_close(Md.sum(axis=1).to_numpy(), M.sum(axis=1), dtype)


def test_indexing(be4):
    M = dense_matrix(20, 12)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    assert_close(Md[3:15, 2:9].to_numpy(), M[3:15, 2:9], np.float64)
    ridx = np.array([1, 17, 4])
    assert_close(Md[ridx, 0:12].to_numpy(), M[ridx], np.float64)
    col = Md[0:20, 5]
    assert_close(col.to_numpy(), M[:, 5], np.float64)


def test_lazy_transpose_times_dense(cfg):
    """Aᵀ @ B without materialization (ref dense.jl:952-982)."""
    be, dtype = cfg
    M = dense_matrix(15, 10, dtype, seed=65)
    N = dense_matrix(15, 6, dtype, seed=66)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
    assert_close((Md.T @ Nd).to_numpy(), M.T @ N, dtype)
    assert Md.T.T is Md

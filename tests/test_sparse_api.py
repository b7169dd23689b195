"""Extended sparse API — mirrors test_sparse_api.jl (structural queries,
elementwise, reductions, diag/triu/tril, spdiagm, issymmetric)."""

import numpy as np
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, random_sparse, rand_vector, tridiagonal_matrix


def test_structural_queries(cfg):
    be, dtype = cfg
    A = random_sparse(20, 26, 0.2, dtype, seed=51)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert Ad.nnz() == A.nnz
    assert Ad.shape == (20, 26)
    assert Ad.dtype == np.dtype(dtype)


def test_norms(cfg):
    be, dtype = cfg
    A = random_sparse(18, 18, 0.25, dtype, seed=52)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(Ad.norm(), sp.linalg.norm(A), dtype)
    assert_close(Ad.norm(1), np.abs(A.toarray()).sum(), dtype)
    assert_close(Ad.opnorm(np.inf), np.abs(A.toarray()).sum(axis=1).max(), dtype)
    assert_close(Ad.opnorm(1), np.abs(A.toarray()).sum(axis=0).max(), dtype)


def test_elementwise(cfg):
    import jax.numpy as jnp

    be, dtype = cfg
    A = random_sparse(15, 15, 0.3, dtype, seed=53)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(abs(Ad).to_scipy().toarray(), np.abs(A.toarray()), dtype)
    assert_close(Ad.conj().to_scipy().toarray(), A.conj().toarray(), dtype)
    assert_close(Ad.real().to_scipy().toarray(), A.toarray().real, dtype)
    assert_close((Ad * 3.0).to_scipy().toarray(), 3 * A.toarray(), dtype)
    assert_close((Ad / 2.0).to_scipy().toarray(), A.toarray() / 2, dtype)
    assert_close((-Ad).to_scipy().toarray(), -A.toarray(), dtype)
    M = Ad.map_nonzeros(lambda v: v ** 2)
    assert_close(M.to_scipy().toarray(), A.multiply(A).toarray(), dtype)


def test_sum_dims(cfg):
    be, dtype = cfg
    A = random_sparse(17, 23, 0.25, dtype, seed=54)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(Ad.sum(), A.sum(), dtype)
    assert_close(Ad.sum(axis=1).to_numpy(), np.asarray(A.sum(axis=1)).ravel(), dtype)
    assert_close(Ad.sum(axis=0).to_numpy(), np.asarray(A.sum(axis=0)).ravel(), dtype)


def test_trace_diag(cfg):
    be, dtype = cfg
    A = random_sparse(21, 21, 0.3, dtype, seed=55) + sp.eye(21, dtype=dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(Ad.tr(), A.diagonal().sum(), dtype)
    for k in (0, 1, -2, 5):
        assert_close(Ad.diag(k).to_numpy(), A.diagonal(k), dtype)


def test_triu_tril(cfg):
    be, dtype = cfg
    A = random_sparse(19, 19, 0.3, dtype, seed=56)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    for k in (0, 1, -1, 3):
        assert_close(Ad.triu(k).to_scipy().toarray(), sp.triu(A, k).toarray(), dtype)
        assert_close(Ad.tril(k).to_scipy().toarray(), sp.tril(A, k).toarray(), dtype)


def test_dropzeros(be4):
    A = random_sparse(16, 16, 0.3, seed=57)
    A.data[::3] = 0.0
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    D = Ad.dropzeros()
    Aref = A.copy()
    Aref.eliminate_zeros()
    assert D.nnz() == Aref.nnz
    assert_close(D.to_scipy().toarray(), Aref.toarray(), np.float64)


def test_spdiagm(cfg):
    be, dtype = cfg
    v = rand_vector(20, dtype)
    dv = hl.DistVector.from_global(v, be, dtype=dtype)
    D = hl.spdiagm(dv)
    assert_close(D.to_scipy().toarray(), np.diag(v), dtype)
    # fast path: cached structure for the main diagonal
    n0 = hl.cache_sizes().get("diag_structure", 0)
    D2 = hl.spdiagm(dv * 2.0)
    assert hl.cache_sizes().get("diag_structure", 0) == n0
    assert_close(D2.to_scipy().toarray(), np.diag(2 * v), dtype)


def test_spdiagm_offsets(be4):
    v = rand_vector(12)
    dv = hl.DistVector.from_global(v, be4)
    D = hl.spdiagm((1, dv), (-2, dv))
    ref = np.zeros((14, 14))
    ref[np.arange(12), np.arange(12) + 1] += v
    ref[np.arange(12) + 2, np.arange(12)] += v
    assert_close(D.to_scipy().toarray(), ref, np.float64)


def test_issymmetric(cfg):
    be, dtype = cfg
    A = random_sparse(14, 14, 0.3, dtype, seed=58)
    S = A + A.T
    Sd = hl.DistSparseMatrix.from_scipy(S, be, dtype=dtype)
    assert Sd.issymmetric()
    N = S.copy().tolil()
    N[0, 5] = N[0, 5] + 1.0
    Nd = hl.DistSparseMatrix.from_scipy(N.tocsr(), be, dtype=dtype)
    assert not Nd.issymmetric()


def test_issymmetric_asymmetric_partitions(be4):
    """Ref: issymmetric with asymmetric partitions (test_factorization.jl)."""
    A = random_sparse(16, 16, 0.3, seed=59)
    S = A + A.T
    Sd = hl.DistSparseMatrix.from_scipy(
        S.tocsr(), be4, row_partition=np.array([0, 2, 9, 15, 16]))
    assert Sd.issymmetric()


def test_speye(be4):
    I = hl.speye(13, be4)
    assert_close(I.to_scipy().toarray(), np.eye(13), np.float64)


def test_abs2_floor_ceil_round(cfg):
    be, dtype = cfg
    A = random_sparse(13, 13, 0.35, dtype, seed=131)
    A.data = A.data * 5
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(Ad.abs2().to_scipy().toarray(), np.abs(A.toarray()) ** 2, dtype)
    v = rand_vector(11, dtype, seed=132)
    dv = hl.DistVector.from_global(v, be, dtype=dtype)
    assert_close(dv.abs2().to_numpy(), np.abs(v) ** 2, dtype)
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        dense = A.toarray()
        assert_close(Ad.floor().to_scipy().toarray(),
                     np.floor(dense) * (dense != 0), dtype)
        assert_close(Ad.ceil().to_scipy().toarray(),
                     np.ceil(dense) * (dense != 0), dtype)
        assert_close(dv.floor().to_numpy(), np.floor(v), dtype)
        assert_close(dv.round().to_numpy(), np.round(v), dtype)


def test_empty_diag(be4):
    A = random_sparse(10, 10, 0.3, seed=133)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    assert len(Ad.diag(15)) == 0
    assert len(Ad.diag(-15)) == 0


def test_degenerate_shapes(be4):
    """1x1, all-zero-row, fully-empty, tall/wide matrices (edge battery)."""
    import scipy.sparse as sp

    A1 = sp.csr_matrix(np.array([[3.0]]))
    Ad1 = hl.DistSparseMatrix.from_scipy(A1, be4)
    x1 = hl.DistVector.from_global(np.array([2.0]), be4)
    assert_close((Ad1 @ x1).to_numpy(), np.array([6.0]), np.float64)
    assert_close((Ad1 @ Ad1).to_scipy().toarray(), np.array([[9.0]]), np.float64)

    E = sp.csr_matrix((6, 6))
    Ed = hl.DistSparseMatrix.from_scipy(E, be4)
    xe = hl.DistVector.rand(6, be4)
    assert np.abs((Ed @ xe).to_numpy()).max() == 0
    assert (Ed @ Ed).nnz() == 0
    assert Ed.transpose_materialized().nnz() == 0
    assert_close(Ed.add_identity(2.0).to_scipy().toarray(), 2 * np.eye(6),
                 np.float64)

    T = random_sparse(40, 3, 0.4, seed=141)
    W = random_sparse(3, 40, 0.4, seed=142)
    Td = hl.DistSparseMatrix.from_scipy(T, be4)
    Wd = hl.DistSparseMatrix.from_scipy(W, be4)
    assert_close((Td @ Wd).to_scipy().toarray(), (T @ W).toarray(), np.float64)


def test_colsum_prefix_regression():
    """Round-2 advisor high: scatter_exchange_plan passed partition sizes as
    src_sizes, falsely qualifying the ExchangePlan 'prefix' self-mode whose
    whole-block dynamic_update_slice copied off-shard-destined payload into
    the output padding (col_sum over-counted: 84 instead of 82 on a 28x28
    upper-bidiagonal over 2 shards). Valid payload lengths must be used."""
    import scipy.sparse as sp

    be2 = hl.backend_auto(nshards=2, dtype=np.float64)
    n = 28
    A = sp.diags([np.ones(n), np.ones(n - 1)], [0, 1], format="csr")
    Ad = hl.DistSparseMatrix.from_scipy(sp.csr_matrix(A), be2)
    cs = Ad.sum(axis=0)
    assert_close(cs.to_numpy(), np.asarray(A.sum(axis=0)).ravel(), np.float64)
    assert abs(float(cs.sum()) - A.sum()) < 1e-10
    assert abs(float(cs.norm()) -
               np.linalg.norm(np.asarray(A.sum(axis=0)).ravel())) < 1e-10


def test_to_numpy_writable():
    """Round-2 advisor low: to_numpy() must hand back a writable array (user
    pattern ``x = F.solve(b); x += dx``); the cached gather stays frozen."""
    be2 = hl.backend_auto(nshards=2, dtype=np.float64)
    v = hl.DistVector.from_global(np.arange(8.0), be2)
    a = v.to_numpy()
    a += 1.0  # must not raise
    # the cache itself is unpoisoned:
    assert_close(v.to_numpy(), np.arange(8.0), np.float64)
    ro = v.to_numpy_ro()
    assert not ro.flags.writeable


def test_vector_broadcasting(cfg):
    """Ref :257-313: operator and function broadcasting (bmap/map are the
    broadcasting machinery, vectors.jl:1093-1226)."""
    import jax.numpy as jnp

    be, dtype = cfg
    v = np.arange(1.0, 11.0).astype(dtype)
    w = np.arange(11.0, 21.0).astype(dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    wd = hl.DistVector.from_global(w, be, dtype=dtype)
    assert_close((vd + wd).to_numpy(), v + w, dtype)
    assert_close(hl.DistVector.bmap(lambda a, b: a * b, vd, wd).to_numpy(),
                 v * w, dtype)
    assert_close((vd * dtype(2.0)).to_numpy(), v * 2, dtype)
    assert_close((vd + dtype(100.0)).to_numpy(), v + 100, dtype)
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        assert_close(vd.map(jnp.sin).to_numpy(), np.sin(v), dtype)
        assert_close(vd.map(jnp.exp).to_numpy(), np.exp(v), dtype)
        assert_close(vd.map(jnp.sqrt).to_numpy(), np.sqrt(v), dtype)
    # compound expression v*2 + w^2
    comp = hl.DistVector.bmap(lambda a, b: a * dtype(2.0) + b * b, vd, wd)
    assert_close(comp.to_numpy(), v * 2 + w ** 2, dtype)


def test_vector_broadcasting_mixed_partitions(cfg):
    """Ref :318-369: broadcasting aligns operands on different partitions;
    the result carries the first operand's partition."""
    be, dtype = cfg
    n = 12
    v = np.arange(1.0, n + 1.0).astype(dtype)
    w = np.arange(101.0, 101.0 + n).astype(dtype)
    vd = hl.DistVector.from_global(v, be, dtype=dtype)
    if be.nshards == 4:
        custom = np.array([0, 4, 7, 10, 12])
    elif be.nshards == 8:
        custom = np.array([0, 2, 4, 5, 7, 9, 10, 11, 12])
    else:
        custom = None
    wd = hl.DistVector.from_global(w, be, partition=custom, dtype=dtype)
    assert_close(complex(wd.sum()), w.sum(), dtype)
    s = vd + wd
    assert_close(s.to_numpy(), v + w, dtype)
    assert np.array_equal(s.partition, vd.partition)
    p = hl.DistVector.bmap(lambda a, b: a * b, vd, wd)
    assert_close(p.to_numpy(), v * w, dtype)
    comp = hl.DistVector.bmap(lambda a, b: a * dtype(2.0) + b, vd, wd)
    assert_close(comp.to_numpy(), v * 2 + w, dtype)


def test_complex_elementwise_sparse():
    """Ref :372-408: real/imag of a complex sparse matrix and vector."""
    import scipy.sparse as sp

    be = hl.backend_auto(nshards=4, dtype=np.complex128)
    n = 20
    vals = np.array([1 + 2j, 3 - 1j, 2 + 1j, -1 + 3j, 4 - 2j, 1 - 1j,
                     2 + 2j, 3 + 1j], np.complex128)
    A = sp.csr_matrix((vals, (np.array([0, 1, 2, 3, 4, 0, 1, 2]),
                              np.array([0, 1, 2, 3, 4, 5, 6, 7]))),
                      shape=(n, n))
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.complex128)
    assert_close(complex(Ad.real().sum()), A.real.sum(), np.complex128)
    assert_close(complex(Ad.imag().sum()), A.imag.sum(), np.complex128)
    v = np.concatenate([vals[:4], np.zeros(n - 4, np.complex128)])
    vd = hl.DistVector.from_global(v, be, dtype=np.complex128)
    assert_close(complex(vd.real().sum()), v.real.sum(), np.complex128)
    assert_close(complex(vd.imag().sum()), v.imag.sum(), np.complex128)


def test_copy_semantics(cfg):
    """Ref :58-67: copy gives an independent matrix with equal values
    (JAX arrays are immutable, so copy is a cheap same-structure wrap)."""
    be, dtype = cfg
    A = random_sparse(15, 15, 0.3, dtype, seed=201)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = Ad * dtype(1)
    assert Bd is not Ad
    assert_close(Bd.to_scipy().toarray(), A.toarray(), dtype)
    assert Bd.hash == Ad.hash  # same structure identity


def test_maximum_minimum_mean(cfg):
    """Ref sparse.jl:2650-2678: maximum/minimum include the implicit zeros
    of a non-full pattern; mean divides by m*n."""
    be, dtype = cfg
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        A = random_sparse(14, 19, 0.3, np.float64, seed=158).astype(dtype)
    else:
        A = random_sparse(14, 19, 0.3, dtype, seed=158)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    D = A.toarray()
    assert_close(complex(Ad.mean()), D.mean(), dtype)
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        assert_close(float(Ad.maximum()), D.max(), dtype)
        assert_close(float(Ad.minimum()), D.min(), dtype)
        # all-positive stored values: the implicit zero must win the min
        P = sp.csr_matrix(np.abs(D) + (D != 0))
        Pd = hl.DistSparseMatrix.from_scipy(P, be, dtype=dtype)
        assert_close(float(Pd.minimum()), 0.0, dtype)
        # full (dense-pattern) matrix: zeros no longer participate
        F = sp.csr_matrix(np.abs(np.asarray(D)) + 1.0)
        Fd = hl.DistSparseMatrix.from_scipy(F, be, dtype=dtype)
        assert_close(float(Fd.minimum()), (np.abs(D) + 1.0).min(), dtype)


def test_adjoint_materialized(cfg):
    """Ref sparse.jl:2261-2280: A' materializes to the conjugate transpose
    through the cached TransposePlan."""
    be, dtype = cfg
    A = random_sparse(12, 17, 0.3, dtype, seed=159)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    H = Ad.H.materialize()
    assert_close(H.to_scipy().toarray(), A.toarray().conj().T, dtype)
    x = rand_vector(12, dtype, seed=160)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Ad.H @ xv).to_numpy(), A.toarray().conj().T @ x, dtype)


def test_imag_and_scalar_rmul(cfg):
    """Ref sparse.jl:2488-2569 map family + 2289 scalar products."""
    be, dtype = cfg
    A = random_sparse(13, 13, 0.3, dtype, seed=161)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert_close(Ad.imag().to_scipy().toarray(), A.toarray().imag, dtype)
    assert_close((2.0 * Ad).to_scipy().toarray(), 2 * A.toarray(), dtype)
    assert_close((Ad * dtype(0)).to_scipy().toarray(),
                 np.zeros((13, 13), dtype), dtype)


def test_norm_p_and_opnorm_nonsquare(cfg):
    """Elementwise p-norm (p=3) and induced norms on a non-square pattern
    (ref sparse.jl:2172-2244)."""
    be, dtype = cfg
    A = random_sparse(9, 22, 0.35, dtype, seed=162)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    D = A.toarray()
    assert_close(float(Ad.norm(3)), (np.abs(D) ** 3).sum() ** (1 / 3), dtype)
    assert_close(float(Ad.norm(np.inf)), np.abs(D).max(), dtype)
    assert_close(Ad.opnorm(1), np.abs(D).sum(axis=0).max(), dtype)
    assert_close(Ad.opnorm(np.inf), np.abs(D).sum(axis=1).max(), dtype)

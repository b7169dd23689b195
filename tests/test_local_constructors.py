"""Local (per-shard) constructors — scenario-for-scenario port of
/root/reference/test/test_local_constructors.jl (254 LoC, 8 scenarios):
vector/dense/sparse from per-shard locals with uneven sizes, roundtrip
consistency against the global constructors (same partition, same
values), and products computed from locally-constructed operands."""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from utils import tolerance

CONFIGS = [(np.float64, 2), (np.float64, 4), (np.complex128, 4)]


def _be(S, T):
    return hl.backend_auto(nshards=S, dtype=T)


def _split_sizes(n, S):
    """Reference's uneven split: first n % S shards get one extra row."""
    base, extra = divmod(n, S)
    return [base + (1 if s < extra else 0) for s in range(S)]


@pytest.mark.parametrize("T,S", CONFIGS)
def test_vector_local_basic(T, S):
    be = _be(S, T)
    n = 10
    sizes = _split_sizes(n, S)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    full = (np.arange(1, n + 1)).astype(T)
    shards = [full[bounds[s]: bounds[s + 1]] for s in range(S)]
    v = hl.DistVector.from_local(shards, be, dtype=T)
    assert len(v) == n
    assert np.linalg.norm(v.to_numpy() - full) < tolerance(T)
    assert np.array_equal(v.partition, bounds)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_vector_local_roundtrip(T, S):
    be = _be(S, T)
    full = np.array([1.5, -2.3, 3.7, 4.1, -5.9, 6.2, 7.8, -8.4], T)
    vg = hl.DistVector.from_global(full, be, dtype=T)
    p = vg.partition
    shards = [full[p[s]: p[s + 1]] for s in range(S)]
    vl = hl.DistVector.from_local(shards, be, dtype=T)
    assert np.linalg.norm(vl.to_numpy() - full) < tolerance(T)
    assert np.array_equal(vl.partition, vg.partition)
    # identical structural identity -> shared plans
    assert vl.partition_hash == vg.partition_hash


@pytest.mark.parametrize("T,S", CONFIGS)
def test_dense_local_basic(T, S):
    be = _be(S, T)
    m, n = 10, 4
    sizes = _split_sizes(m, S)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    M = np.array([[i + 1 + (j + 1) * 0.1 for j in range(n)]
                  for i in range(m)], T)
    shards = [M[bounds[s]: bounds[s + 1]] for s in range(S)]
    Md = hl.DistDenseMatrix.from_local(shards, be, dtype=T)
    assert Md.shape == (m, n)
    assert np.linalg.norm(Md.to_numpy() - M) < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 4)])
def test_dense_local_roundtrip(T, S):
    be = _be(S, T)
    M = np.arange(1.0, 16.0).reshape(5, 3).astype(T) * 1.1
    Mg = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    p = Mg.row_partition
    shards = [M[p[s]: p[s + 1]] for s in range(S)]
    Ml = hl.DistDenseMatrix.from_local(shards, be, dtype=T)
    assert np.linalg.norm(Ml.to_numpy() - M) < tolerance(T)
    assert np.array_equal(Ml.row_partition, Mg.row_partition)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_sparse_local_basic(T, S):
    be = _be(S, T)
    m, n = 12, 8
    A = sp.random(m, n, 0.4, random_state=3, format="csr").astype(T)
    A.sort_indices()
    sizes = _split_sizes(m, S)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    parts = []
    for s in range(S):
        loc = A[bounds[s]: bounds[s + 1]]
        parts.append((loc.indptr.astype(np.int64),
                      loc.indices.astype(np.int64), loc.data))
    Ad = hl.DistSparseMatrix.from_local_csr(parts, n, be, dtype=T)
    assert Ad.shape == (m, n)
    assert abs(Ad.to_scipy() - A).max() < tolerance(T)
    assert np.array_equal(Ad.row_partition, bounds)


@pytest.mark.parametrize("T,S", [(np.float64, 4), (np.complex128, 4)])
def test_sparse_local_roundtrip(T, S):
    be = _be(S, T)
    A = sp.random(9, 9, 0.3, random_state=5, format="csr").astype(T)
    A = (A + sp.eye(9, dtype=T)).tocsr()
    A.sort_indices()
    Ag = hl.DistSparseMatrix.from_scipy(A, be, dtype=T)
    p = Ag.row_partition
    parts = []
    for s in range(S):
        loc = A[p[s]: p[s + 1]]
        parts.append((loc.indptr.astype(np.int64),
                      loc.indices.astype(np.int64), loc.data))
    Al = hl.DistSparseMatrix.from_local_csr(parts, 9, be, dtype=T)
    assert abs(Al.to_scipy() - A).max() < tolerance(T)
    assert Al.hash == Ag.hash  # same structure -> same plans


@pytest.mark.parametrize("T,S", [(np.float64, 2), (np.float64, 4)])
def test_dense_local_times_vector_local(T, S):
    be = _be(S, T)
    m, n = 8, 5
    rng = np.random.default_rng(7)
    M = rng.standard_normal((m, n)).astype(T)
    x = rng.standard_normal(n).astype(T)
    mb = np.concatenate([[0], np.cumsum(_split_sizes(m, S))])
    xb = np.concatenate([[0], np.cumsum(_split_sizes(n, S))])
    Md = hl.DistDenseMatrix.from_local(
        [M[mb[s]: mb[s + 1]] for s in range(S)], be, dtype=T)
    xd = hl.DistVector.from_local(
        [x[xb[s]: xb[s + 1]] for s in range(S)], be, dtype=T)
    y = Md @ xd
    assert np.linalg.norm(y.to_numpy() - M @ x) < tolerance(T) * 10


@pytest.mark.parametrize("T,S", [(np.float64, 4), (np.complex128, 4)])
def test_sparse_local_times_vector_local(T, S):
    be = _be(S, T)
    m = 12
    A = (sp.random(m, m, 0.3, random_state=11, format="csr")
         + sp.eye(m)).astype(T).tocsr()
    A.sort_indices()
    rng = np.random.default_rng(13)
    x = rng.standard_normal(m).astype(T)
    if np.issubdtype(np.dtype(T), np.complexfloating):
        x = x + 1j * rng.standard_normal(m).astype(np.float64)
    b = np.concatenate([[0], np.cumsum(_split_sizes(m, S))])
    parts = []
    for s in range(S):
        loc = A[b[s]: b[s + 1]]
        parts.append((loc.indptr.astype(np.int64),
                      loc.indices.astype(np.int64), loc.data))
    Ad = hl.DistSparseMatrix.from_local_csr(parts, m, be, dtype=T)
    xd = hl.DistVector.from_local(
        [x[b[s]: b[s + 1]] for s in range(S)], be, dtype=T)
    y = Ad @ xd
    assert np.linalg.norm(y.to_numpy() - A @ x) < tolerance(T) * 10

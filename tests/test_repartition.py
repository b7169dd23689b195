"""Repartition plans — mirrors test_repartition.jl."""

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, random_sparse, rand_vector


def test_vector_repartition(cfg):
    be, dtype = cfg
    S = be.nshards
    x = rand_vector(33, dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    if S == 4:
        p2 = np.array([0, 1, 20, 30, 33])
    elif S == 8:
        p2 = np.array([0, 1, 5, 5, 12, 20, 30, 32, 33])
    else:
        p2 = np.array([0, 33])
    w = v.repartition(p2)
    assert_close(w.to_numpy(), x, dtype)
    assert_padding_zero(w)
    assert np.array_equal(w.partition, p2)
    # roundtrip back
    u = w.repartition(v.partition)
    assert_close(u.to_numpy(), x, dtype)


def test_sparse_repartition(cfg):
    be, dtype = cfg
    S = be.nshards
    A = random_sparse(24, 24, 0.2, dtype, seed=11)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    if S == 4:
        p2 = np.array([0, 10, 10, 20, 24])
    elif S == 8:
        p2 = np.array([0, 3, 6, 6, 10, 15, 20, 24, 24])
    else:
        p2 = np.array([0, 24])
    Ar = Ad.repartition(p2)
    assert_close(Ar.to_scipy().toarray(), A.toarray(), dtype)
    assert_padding_zero(Ar)
    # ops on repartitioned matrix still correct
    x = rand_vector(24, dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close((Ar @ xv).to_numpy(), A @ x, dtype)


def test_dense_repartition(be4):
    from utils import dense_matrix

    M = dense_matrix(19, 7)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    p2 = np.array([0, 0, 6, 18, 19])
    Mr = Md.repartition(p2)
    assert_close(Mr.to_numpy(), M, np.float64)
    assert_padding_zero(Mr)


def test_repartition_noop_is_same_object(be4):
    x = rand_vector(16)
    v = hl.DistVector.from_global(x, be4)
    assert v.repartition(v.partition) is v


def test_repartition_wrong_shard_count_raises(be4):
    """A partition with a different shard count than the mesh must raise
    for ALL three containers (rows silently vanished for dense/sparse)."""
    bad = np.array([0, 3, 6, 12])  # 3 shards on a 4-shard mesh
    v = hl.DistVector.from_global(np.arange(12.0), be4)
    M = hl.DistDenseMatrix.from_global(np.ones((12, 2)), be4)
    A = hl.DistSparseMatrix.from_scipy(sp.eye(12).tocsr(), be4)
    for obj in (v, M, A):
        with pytest.raises(ValueError, match="shard count"):
            obj.repartition(bad)


# --- scenario-depth ports of test_repartition.jl (219 LoC) ------------------

def test_vector_repartition_reference_shift(cfg):
    """Ref Test 1: uniform -> shifted partition (first ranks get fewer,
    last gets the remainder), exact partition equality asserted."""
    be, dtype = cfg
    S = be.nshards
    n = 12
    x = np.arange(1.0, n + 1).astype(dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    if S >= 2:
        counts = []
        total = 0
        for r in range(S - 1):
            c = max(n // S - 1 + (1 if r < n % S else 0), 0)
            counts.append(c)
            total += c
        counts.append(n - total)
        p2 = np.concatenate([[0], np.cumsum(counts)])
    else:
        p2 = v.partition
    w = v.repartition(p2)
    assert_close(w.to_numpy(), x, dtype)
    assert np.array_equal(w.partition, p2)


def test_repartition_plan_caching(be4):
    """Ref: repeated repartition with the same (src, dst) pair hits ONE
    cached plan and produces identical results."""
    from hpclinalg.cache import cache_sizes

    x = rand_vector(12)
    v = hl.DistVector.from_global(x, be4)
    p2 = np.array([0, 2, 5, 9, 12])
    w1 = v.repartition(p2)
    n_plans = sum(cache_sizes().values())
    w2 = v.repartition(p2)
    assert sum(cache_sizes().values()) == n_plans
    assert np.array_equal(w1.to_numpy(), w2.to_numpy())
    assert w1.partition_hash == w2.partition_hash


def test_dense_repartition_same_partition_fast_path(be4):
    M = hl.DistDenseMatrix.from_global(np.ones((8, 3)), be4)
    assert M.repartition(M.row_partition) is M


def test_sparse_repartition_nnz_preserved_and_fast_path(cfg):
    be, dtype = cfg
    A = random_sparse(18, 18, 0.3, dtype, seed=21)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert Ad.repartition(Ad.row_partition) is Ad
    S = be.nshards
    p2 = np.linspace(0, 18, S + 1).astype(np.int64)
    p2[1:-1] = np.minimum(p2[1:-1] + 1, 18)
    Ar = Ad.repartition(p2)
    assert Ar.nnz() == Ad.nnz() == A.nnz
    assert np.array_equal(Ar.col_partition, Ad.col_partition)


def test_ops_after_repartition_match(cfg):
    """Ref: y = A_repart @ x equals y = A @ x — plans rebuilt for the new
    partition give identical numerics."""
    be, dtype = cfg
    A = random_sparse(20, 20, 0.25, dtype, seed=23)
    x = rand_vector(20, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    S = be.nshards
    p2 = np.linspace(0, 20, S + 1).astype(np.int64)
    if S >= 4:
        p2[1] = 0
        p2[2] = 7
    Ar = Ad.repartition(p2)
    y0 = (Ad @ xv).to_numpy()
    y1 = (Ar @ xv).to_numpy()
    assert_close(y0, y1, dtype)
    # vector on the new partition too (operand alignment)
    xr = xv.repartition(p2)
    y2 = (Ar @ xr).to_numpy()
    assert_close(y0, y2, dtype)


def test_repartition_empty_shards_roundtrip(be8):
    """Degenerate partitions with several empty shards roundtrip exactly
    (the stacked-shard padding invariant must hold through the exchange)."""
    x = rand_vector(9)
    v = hl.DistVector.from_global(x, be8)
    p2 = np.array([0, 0, 0, 9, 9, 9, 9, 9, 9])
    w = v.repartition(p2)
    assert_close(w.to_numpy(), x, np.float64)
    assert_padding_zero(w)
    u = w.repartition(v.partition)
    assert_close(u.to_numpy(), x, np.float64)
    assert_padding_zero(u)

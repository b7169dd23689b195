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

"""Transpose materialization + lazy transpose — mirrors test_transpose.jl
and test_lazy_transpose.jl."""

import numpy as np
import pytest

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, random_sparse, rand_vector


def test_materialize(cfg):
    be, dtype = cfg
    A = random_sparse(23, 17, 0.25, dtype, seed=31)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    At = Ad.transpose_materialized()
    assert_close(At.to_scipy().toarray(), A.T.toarray(), dtype)
    assert_padding_zero(At)
    assert np.array_equal(At.row_partition, Ad.col_partition)
    assert np.array_equal(At.col_partition, Ad.row_partition)


def test_bidirectional_cache(be4):
    """Ref: A.cached_transpose = Y; Y.cached_transpose = A (sparse.jl:1857)."""
    A = random_sparse(15, 15, 0.3, seed=32)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    At = Ad.transpose_materialized()
    assert At.transpose_materialized() is Ad
    assert Ad.transpose_materialized() is At


def test_double_transpose_identity(cfg):
    be, dtype = cfg
    A = random_sparse(12, 19, 0.3, dtype, seed=33)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    assert Ad.T.T is Ad
    Att = Ad.transpose_materialized().transpose_materialized()
    assert_close(Att.to_scipy().toarray(), A.toarray(), dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128],
                         ids=["f64", "c128"])
def test_lazy_rules(dtype):
    """Ref lazy transpose algebra (sparse.jl:2318-2379). 4-shard configs
    only: the chain compiles ~25 s per config on the 1-core CI box, and
    the serial/8-shard variants exercise no transpose-specific logic the
    other tests miss."""
    be = hl.backend_auto(nshards=4, dtype=dtype)
    A = random_sparse(16, 16, 0.25, dtype, seed=34)
    B = random_sparse(16, 16, 0.25, dtype, seed=35)
    x = rand_vector(16, dtype)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    Bd = hl.DistSparseMatrix.from_scipy(B, be, dtype=dtype)
    xv = hl.DistVector.from_global(x, be, dtype=dtype)
    # At*x
    assert_close((Ad.T @ xv).to_numpy(), A.T @ x, dtype)
    # At*B, A*Bt materialize
    assert_close((Ad.T @ Bd).to_scipy().toarray(), (A.T @ B).toarray(), dtype)
    assert_close((Ad @ Bd.T).to_scipy().toarray(), (A @ B.T).toarray(), dtype)
    # At*Bt stays lazy and equals (B*A)^T
    Z = Ad.T @ Bd.T
    assert isinstance(Z, hl.LazyTranspose)
    assert_close(np.asarray(Z.to_scipy().todense()), (A.T @ B.T).toarray(), dtype)


def test_transpose_scalar_ops(be4):
    A = random_sparse(10, 14, 0.3, seed=36)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    Z = Ad.T * 2.0
    assert isinstance(Z, hl.LazyTranspose)
    assert_close(np.asarray(Z.to_scipy().todense()), 2 * A.T.toarray(), np.float64)


def test_transpose_empty_shards_and_cache(be4):
    """Transpose across a partition with empty shards; the bidirectional
    result cache returns the SAME object both ways (ref sparse.jl:1857-59)."""
    A = random_sparse(10, 16, 0.3, seed=31)
    part = np.array([0, 4, 4, 4, 10])
    Ad = hl.DistSparseMatrix.from_scipy(A, be4, row_partition=part)
    At = Ad.transpose_materialized()
    assert_close(At.to_scipy().toarray(), A.T.toarray(), np.float64)
    assert At.transpose_materialized() is Ad      # bidirectional cache
    assert Ad.transpose_materialized() is At      # idempotent

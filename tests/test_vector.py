"""Vector ops — mirrors the vector portions of test_sparse_api.jl and
vectors.jl coverage (reductions vectors.jl:758-857, broadcasting :1093)."""

import numpy as np
import scipy.sparse as sp
import pytest

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, rand_vector, tolerance


def test_roundtrip(cfg):
    be, dtype = cfg
    x = rand_vector(37, dtype)
    v = hl.DistVector.from_global(x, be, dtype=dtype)
    assert_close(v.to_numpy(), x, dtype)
    assert_padding_zero(v)
    assert len(v) == 37
    assert v.shape == (37,)


def test_arithmetic(cfg):
    be, dtype = cfg
    x, y = rand_vector(29, dtype, 3), rand_vector(29, dtype, 4)
    vx = hl.DistVector.from_global(x, be, dtype=dtype)
    vy = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close((vx + vy).to_numpy(), x + y, dtype)
    assert_close((vx - vy).to_numpy(), x - y, dtype)
    assert_close((vx * vy).to_numpy(), x * y, dtype)
    assert_close((vx * 2.5).to_numpy(), x * 2.5, dtype)
    assert_close((2.5 * vx).to_numpy(), 2.5 * x, dtype)
    assert_close((vx / 2.0).to_numpy(), x / 2.0, dtype)
    assert_close((-vx).to_numpy(), -x, dtype)
    assert_close((vx + 1.0).to_numpy(), x + 1.0, dtype)
    assert_padding_zero(vx + 1.0)
    assert_close(abs(vx).to_numpy(), np.abs(x), dtype)
    assert_close(vx.conj().to_numpy(), np.conj(x), dtype)
    assert_close(vx.real().to_numpy(), x.real, dtype)
    assert_close(vx.imag().to_numpy(), x.imag, dtype)


def test_reductions(cfg):
    be, dtype = cfg
    x = rand_vector(41, dtype, 5)
    y = rand_vector(41, dtype, 6)
    vx = hl.DistVector.from_global(x, be, dtype=dtype)
    vy = hl.DistVector.from_global(y, be, dtype=dtype)
    assert_close(vx.dot(vy), np.vdot(x, y), dtype)
    assert_close(vx.norm(), np.linalg.norm(x), dtype)
    assert_close(vx.norm(1), np.abs(x).sum(), dtype)
    assert_close(vx.norm(np.inf), np.abs(x).max(), dtype)
    assert_close(vx.sum(), x.sum(), dtype)
    assert_close(vx.mean(), x.mean(), dtype)
    if not np.issubdtype(np.dtype(dtype), np.complexfloating):
        assert_close(vx.max(), x.max(), dtype)
        assert_close(vx.min(), x.min(), dtype)


def test_mismatched_partition_alignment(be4):
    """Binary ops align partitions via repartition (ref vectors.jl:868-876)."""
    x, y = rand_vector(30), rand_vector(30, seed=9)
    vx = hl.DistVector.from_global(x, be4)
    vy = hl.DistVector.from_global(y, be4,
                                   partition=np.array([0, 2, 9, 17, 30]))
    s = vx + vy
    assert_close(s.to_numpy(), x + y, np.float64)
    assert np.array_equal(s.partition, vx.partition)
    assert_close(vx.dot(vy), np.vdot(x, y), np.float64)


def test_map_and_bmap(be4):
    import jax.numpy as jnp

    x = rand_vector(25)
    v = hl.DistVector.from_global(x, be4)
    assert_close(v.map(jnp.exp).to_numpy(), np.exp(x), np.float64)
    assert_padding_zero(v.map(jnp.exp))
    w = hl.DistVector.bmap(lambda a, b: a * 2 + jnp.cos(b), v, v)
    assert_close(w.to_numpy(), 2 * x + np.cos(x), np.float64)


def test_zeros_and_from_local(be4):
    z = hl.DistVector.zeros(23, be4)
    assert np.all(z.to_numpy() == 0)
    shards = [np.arange(3.0), np.arange(4.0), np.zeros(0), np.arange(2.0)]
    v = hl.DistVector.from_local(shards, be4)
    assert_close(v.to_numpy(), np.concatenate(shards), np.float64)
    assert np.array_equal(v.partition, [0, 3, 7, 7, 9])


def test_scalar_ops_nonfinite_preserve_padding(be4):
    """A non-finite scalar must not write 0*inf = NaN into the padding
    region (the padding invariant feeds whole-array reductions)."""
    v = hl.DistVector.from_global(np.arange(1.0, 8.0), be4)
    assert np.isinf((v * np.inf).norm(1))
    assert np.isinf((v / 0.0).norm(1))
    M = hl.DistDenseMatrix.from_global(np.ones((7, 3)), be4)
    assert np.isinf((M * np.inf).norm())
    A = hl.DistSparseMatrix.from_scipy(sp.eye(7).tocsr(), be4)
    assert np.isinf((A * np.inf).norm())


def test_fancy_index_bounds_checked(be4):
    v = hl.DistVector.from_global(np.arange(5.0), be4)
    import pytest

    with pytest.raises(IndexError):
        v[[7]]
    with pytest.raises(IndexError):
        v[[-1]]
    with pytest.raises(IndexError):
        v[[7]] = 9.0
    A = hl.DistSparseMatrix.from_scipy(sp.eye(5).tocsr(), be4)
    with pytest.raises(IndexError):
        A[[0, 9], :]


def test_float_index_vector_rounds(be4):
    """Float ids carry roundoff; 2.9999999999999996 must select 3."""
    v = hl.DistVector.from_global(np.arange(10.0), be4)
    idx = hl.DistVector.from_global(
        np.array([0.0, np.nextafter(3.0, 0.0), 7.0]), be4)
    assert np.allclose(v[idx].to_numpy(), [0.0, 3.0, 7.0])


def test_cat_sparse_dtype_promotes(be4):
    A32 = hl.DistSparseMatrix.from_scipy(sp.eye(4).tocsr(), be4,
                                         dtype=np.float32)
    A64 = hl.DistSparseMatrix.from_scipy(
        (sp.eye(4) * (1 + 1e-12)).tocsr(), be4, dtype=np.float64)
    C = hl.vcat_sparse(A32, A64)
    assert C.dtype == np.float64


def test_dense_add_shape_mismatch_raises(be4):
    A = hl.DistDenseMatrix.from_global(np.ones((4, 3)), be4)
    B = hl.DistDenseMatrix.from_global(np.ones((4, 1)), be4)
    import pytest

    with pytest.raises(ValueError, match="mismatch"):
        A + B

"""Dense matrix ops — mirrors test_dense_matrix.jl."""

import numpy as np

import hpclinalg as hl
from utils import assert_close, assert_padding_zero, dense_matrix, rand_vector


def test_roundtrip(cfg):
    be, dtype = cfg
    M = dense_matrix(19, 11, dtype)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(Md.to_numpy(), M, dtype)
    assert_padding_zero(Md)
    assert Md.shape == (19, 11)


def test_arithmetic(cfg):
    be, dtype = cfg
    M = dense_matrix(14, 9, dtype, seed=61)
    N = dense_matrix(14, 9, dtype, seed=62)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
    assert_close((Md + Nd).to_numpy(), M + N, dtype)
    assert_close((Md - Nd).to_numpy(), M - N, dtype)
    assert_close((Md * 2.0).to_numpy(), 2 * M, dtype)
    assert_close((-Md).to_numpy(), -M, dtype)
    assert_close((Md + 1.0).to_numpy(), M + 1.0, dtype)
    assert_padding_zero(Md + 1.0)
    assert_close(abs(Md).to_numpy(), np.abs(M), dtype)
    assert_close(Md.conj().to_numpy(), M.conj(), dtype)


def test_matmat(cfg):
    be, dtype = cfg
    M = dense_matrix(13, 17, dtype, seed=63)
    N = dense_matrix(17, 8, dtype, seed=64)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
    assert_close((Md @ Nd).to_numpy(), M @ N, dtype)


def test_transpose(cfg):
    be, dtype = cfg
    M = dense_matrix(15, 10, dtype, seed=65)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    Mt = Md.transpose_materialized()
    assert_close(Mt.to_numpy(), M.T, dtype)
    assert Md.T.T is Md
    # lazy dense transpose times dense
    N = dense_matrix(15, 6, dtype, seed=66)
    Nd = hl.DistDenseMatrix.from_global(N, be, dtype=dtype)
    assert_close((Md.T @ Nd).to_numpy(), M.T @ N, dtype)


def test_reductions(cfg):
    be, dtype = cfg
    M = dense_matrix(12, 7, dtype, seed=67)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=dtype)
    assert_close(Md.sum(), M.sum(), dtype)
    assert_close(Md.sum(axis=0), M.sum(axis=0), dtype)
    assert_close(Md.sum(axis=1).to_numpy(), M.sum(axis=1), dtype)
    assert_close(Md.norm(), np.linalg.norm(M), dtype)
    assert_close(Md.opnorm(np.inf), np.abs(M).sum(axis=1).max(), dtype)
    assert_close(Md.opnorm(1), np.abs(M).sum(axis=0).max(), dtype)


def test_indexing(be4):
    M = dense_matrix(20, 12)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    assert_close(Md[3:15, 2:9].to_numpy(), M[3:15, 2:9], np.float64)
    ridx = np.array([1, 17, 4])
    assert_close(Md[ridx, 0:12].to_numpy(), M[ridx], np.float64)
    col = Md[0:20, 5]
    assert_close(col.to_numpy(), M[:, 5], np.float64)


def test_mapslices(be4):
    import jax.numpy as jnp

    M = dense_matrix(10, 6)
    Md = hl.DistDenseMatrix.from_global(M, be4)
    r = Md.mapslices(lambda row: jnp.sum(row ** 2))
    assert_close(r.to_numpy(), (M ** 2).sum(axis=1), np.float64)

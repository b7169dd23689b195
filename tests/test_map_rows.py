"""map_rows / vertex_indices — scenario-for-scenario port of
/root/reference/test/test_map_rows.jl (171 LoC, 12 scenarios):
vector->scalar, two vectors, matrix row norms, constant row -> matrix,
(sum, prod) rows, matrix+vector weighted sums, two-matrix row dots,
mismatched partitions, complex abs2 and complex matrix -> (re, im),
identity row transform, row max. Parameterized over dtypes x shard
counts like the reference's ALL_CONFIGS loop."""

import jax.numpy as jnp
import numpy as np
import pytest

import hpclinalg as hl
from utils import tolerance

CONFIGS = [(np.float64, 1), (np.float64, 4), (np.complex128, 4),
           (np.float32, 8)]


def _be(nshards, dtype):
    return hl.backend_auto(nshards=nshards, dtype=dtype)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_vector_to_scalar(T, S):
    be = _be(S, T)
    v = hl.DistVector.from_global(np.arange(1.0, 9.0).astype(T), be, dtype=T)
    r = hl.map_rows(lambda x: x ** 2, v)
    assert np.linalg.norm(r.to_numpy() - np.arange(1.0, 9.0) ** 2) \
        < tolerance(T)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_two_vectors_to_scalar(T, S):
    be = _be(S, T)
    u = hl.DistVector.from_global(np.array([1, 2, 3, 4], T), be, dtype=T)
    v = hl.DistVector.from_global(np.array([4, 3, 2, 1], T), be, dtype=T)
    r = hl.map_rows(lambda a, b: a * b, u, v)
    assert np.linalg.norm(r.to_numpy() - np.array([4, 6, 6, 4])) \
        < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 1), (np.float64, 4)])
def test_matrix_row_norms(T, S):
    be = _be(S, T)
    M = np.array([[1.0, 0, 0], [0, 2, 0], [0, 0, 3], [1, 1, 1]], T)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    r = hl.map_rows(lambda row: jnp.linalg.norm(row), Md)
    assert np.linalg.norm(r.to_numpy()
                          - np.array([1, 2, 3, np.sqrt(3.0)])) < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 4)])
def test_constant_row_to_matrix(T, S):
    be = _be(S, T)
    M = np.array([[1.0, 2], [3, 4], [5, 6]], T)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    const = jnp.array([1.0, 2.0, 3.0])
    r = hl.map_rows(lambda row: const, Md, out_dtype=T)
    assert r.shape == (3, 3)
    assert np.linalg.norm(r.to_numpy() - np.tile([1.0, 2, 3], (3, 1))) \
        < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 1), (np.float64, 4)])
def test_sum_prod_rows(T, S):
    be = _be(S, T)
    M = np.array([[1.0, 2], [3, 4], [5, 6], [7, 8]], T)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    r = hl.map_rows(lambda row: jnp.stack([jnp.sum(row), jnp.prod(row)]), Md)
    exp = np.array([[3.0, 2], [7, 12], [11, 30], [15, 56]])
    assert r.shape == (4, 2)
    assert np.linalg.norm(r.to_numpy() - exp) < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 4)])
def test_matrix_plus_vector_weighted(T, S):
    be = _be(S, T)
    M = np.arange(1.0, 13.0).reshape(4, 3).astype(T)
    w = np.array([1.0, 2, 3, 4], T)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    wd = hl.DistVector.from_global(w, be, dtype=T)
    r = hl.map_rows(lambda row, wi: jnp.sum(row) * wi, Md, wd)
    assert np.linalg.norm(r.to_numpy() - M.sum(1) * w) < tolerance(T)


@pytest.mark.parametrize("T,S", [(np.float64, 1), (np.float64, 4)])
def test_two_matrices_row_dot(T, S):
    be = _be(S, T)
    A = np.array([[1.0, 2], [3, 4]], T)
    B = np.array([[10.0, 20], [30, 40]], T)
    Ad = hl.DistDenseMatrix.from_global(A, be, dtype=T)
    Bd = hl.DistDenseMatrix.from_global(B, be, dtype=T)
    r = hl.map_rows(lambda a, b: jnp.dot(a, b), Ad, Bd)
    assert np.linalg.norm(r.to_numpy() - np.array([50.0, 250.0])) \
        < tolerance(T)


def test_mismatched_partitions_align():
    be = _be(4, np.float64)
    u = hl.DistVector.from_global(np.arange(1.0, 7.0), be)
    v = hl.DistVector.from_global(10.0 * np.arange(1.0, 7.0), be,
                                  partition=np.array([0, 1, 2, 3, 6]))
    r = hl.map_rows(lambda a, b: a + b, u, v)
    assert np.linalg.norm(r.to_numpy() - 11.0 * np.arange(1.0, 7.0)) < 1e-12
    # result lives on the FIRST argument's partition (ref contract)
    assert np.array_equal(r.partition, u.partition)


def test_complex_abs2_and_parts():
    T = np.complex128
    be = _be(4, T)
    z = np.array([1 + 2j, 3 + 4j, 5 + 6j, 7 + 8j], T)
    zd = hl.DistVector.from_global(z, be, dtype=T)
    r = hl.map_rows(lambda x: (x * jnp.conj(x)).real, zd,
                    out_dtype=np.float64)
    assert np.linalg.norm(r.to_numpy() - np.abs(z) ** 2) < 1e-12
    M = np.array([[1 + 1j, 2 - 1j], [3 + 2j, 4 - 2j]], T)
    Md = hl.DistDenseMatrix.from_global(M, be, dtype=T)
    r2 = hl.map_rows(lambda row: jnp.stack([row[0].real, row[1].imag]), Md,
                     out_dtype=np.float64)
    assert np.linalg.norm(r2.to_numpy() - np.array([[1.0, -1], [3, -2]])) \
        < 1e-12


def test_identity_row_transform():
    be = _be(4, np.float64)
    M = np.array([[1.0, 2, 3], [4, 5, 6]])
    Md = hl.DistDenseMatrix.from_global(M, be)
    r = hl.map_rows(lambda row: row, Md)
    assert np.linalg.norm(r.to_numpy() - M) < 1e-14


def test_row_max():
    be = _be(4, np.float64)
    M = np.array([[1.0, 5, 3], [7, 2, 4], [3, 3, 9]])
    Md = hl.DistDenseMatrix.from_global(M, be)
    r = hl.map_rows(jnp.max, Md)
    assert np.linalg.norm(r.to_numpy() - np.array([5.0, 7, 9])) < 1e-14


def test_vertex_indices():
    be = _be(4, np.float64)
    p = np.array([0, 2, 3, 3, 7])
    vi = hl.vertex_indices(p, be)
    assert np.array_equal(vi.to_numpy(), np.arange(7))
    assert np.array_equal(vi.partition, p)
    # composes with map_rows (the reference's vertex-dependent-map idiom)
    v = hl.DistVector.from_global(np.full(7, 2.0), be,
                                  partition=p)
    r = hl.map_rows(lambda i, x: i.astype(jnp.float64) * x, vi, v)
    assert np.linalg.norm(r.to_numpy() - 2.0 * np.arange(7)) < 1e-14


def test_map_rows_type_errors():
    be = _be(4, np.float64)
    with pytest.raises(TypeError):
        hl.map_rows(lambda a: a, np.ones(4))

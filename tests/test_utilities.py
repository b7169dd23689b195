"""Utilities — scenario-for-scenario port of
/root/reference/test/test_utilities.jl (231 LoC): io0 stream selection,
gather-converter roundtrips with dtype/shape/nnz assertions for all three
container types, show/repr methods (type name, sizes, stored entries),
io0+show integration, and the cache_sizes / check_cache_sizes /
clear_plan_cache leak-guard API (ref: HPCLinearAlgebra.jl:208-242)."""

import io

import numpy as np
import pytest
import scipy.sparse as sp

import hpclinalg as hl
from hpclinalg.cache import cache_sizes, check_cache_sizes, clear_plan_cache
from hpclinalg.utils.io import io0, show
from utils import tolerance

CONFIGS = [(np.float64, 4), (np.complex128, 4), (np.float32, 8)]


def _be(S, T):
    return hl.backend_auto(nshards=S, dtype=T)


def test_io0_stream_selection():
    # single-process SPMD: process 0 -> identity on the given stream
    buf = io.StringIO()
    assert io0(buf) is buf
    print("test", file=io0(buf), end="")
    assert buf.getvalue() == "test"
    # default stream is stdout
    import sys

    assert io0() is sys.stdout
    # non-member rank set -> a sink, and printing to it is harmless
    sink = io0(buf, ranks={10_000})
    assert sink is not buf
    print("dropped", file=sink)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_vector_roundtrip(T, S):
    be = _be(S, T)
    v0 = np.linspace(-3, 5, 11).astype(T)
    if np.issubdtype(np.dtype(T), np.complexfloating):
        v0 = v0 + 1j * np.linspace(2, -2, 11)
    v = hl.DistVector.from_global(v0, be, dtype=T)
    back = v.to_numpy()
    assert np.linalg.norm(back - v0) < tolerance(T)
    assert back.dtype == np.dtype(T)
    assert back.shape == v0.shape and len(v) == len(v0)


@pytest.mark.parametrize("T,S", CONFIGS)
def test_dense_roundtrip(T, S):
    be = _be(S, T)
    M0 = np.arange(36.0).reshape(9, 4).astype(T)
    M = hl.DistDenseMatrix.from_global(M0, be, dtype=T)
    back = M.to_numpy()
    assert np.linalg.norm(back - M0) < tolerance(T)
    assert back.dtype == np.dtype(T)
    assert back.shape == M0.shape == M.shape


@pytest.mark.parametrize("T,S", CONFIGS)
def test_sparse_roundtrip(T, S):
    be = _be(S, T)
    A0 = sp.random(13, 7, 0.35, random_state=2, format="csr").astype(T)
    A0.sort_indices()
    A = hl.DistSparseMatrix.from_scipy(A0, be, dtype=T)
    back = A.to_scipy()
    assert abs(back - A0).max() < tolerance(T)
    assert back.nnz == A0.nnz
    assert back.shape == A0.shape
    assert back.dtype == np.dtype(T)


def test_vector_show():
    be = _be(4, np.float64)
    v = hl.DistVector.from_global(np.array([1.0, 2.0, 3.0, 4.0]), be)
    r = repr(v)
    assert "DistVector" in r
    assert "4" in r            # length
    assert "float64" in r
    buf = io.StringIO()
    s = show(v, stream=buf)
    assert "DistVector" in s and "1." in s
    assert buf.getvalue().startswith("DistVector")


def test_dense_show():
    be = _be(4, np.float64)
    M = hl.DistDenseMatrix.from_global(np.eye(3), be)
    r = repr(M)
    assert "DistDenseMatrix" in r and "3" in r and "float64" in r
    s = show(M, stream=io.StringIO())
    assert "DistDenseMatrix" in s


def test_sparse_show():
    be = _be(4, np.float64)
    A = hl.DistSparseMatrix.from_scipy(sp.eye(5, format="csr") * 2.0, be)
    r = repr(A)
    assert "DistSparseMatrix" in r and "float64" in r
    s = show(A, stream=io.StringIO())
    # stored-entry lines like the reference's SparseMatrixCSC display
    assert "[0, 0]" in s and "2.0" in s
    # truncation path
    s2 = show(A, stream=io.StringIO(), max_elems=2)
    assert "more stored entries" in s2


def test_show_io0_integration():
    be = _be(4, np.float64)
    v = hl.DistVector.from_global(np.arange(4.0), be)
    buf = io.StringIO()
    print(repr(v), file=io0(buf))
    assert "DistVector" in buf.getvalue()


def test_cache_sizes_and_leak_guard():
    clear_plan_cache()
    sizes0 = cache_sizes()
    assert all(n == 0 for n in sizes0.values())
    be = _be(4, np.float64)
    A = hl.DistSparseMatrix.from_scipy(
        sp.random(30, 30, 0.2, random_state=1, format="csr")
        + sp.eye(30), be)
    x = hl.DistVector.from_global(np.ones(30), be)
    _ = A @ x
    sizes = cache_sizes()
    assert sum(sizes.values()) >= 1        # the SpMV plan landed
    check_cache_sizes(max_entries=50)      # under the limit: no raise
    with pytest.raises(RuntimeError):
        check_cache_sizes(max_entries=0)
    # named clear drops exactly that family
    name = next(k for k, n in sizes.items() if n > 0)
    clear_plan_cache(name)
    assert cache_sizes()[name] == 0
    clear_plan_cache()


def test_cache_reuse_same_structure():
    """Two matrices with the SAME pattern share one plan (the memoization
    contract, ref HPCLinearAlgebra.jl:126-164)."""
    clear_plan_cache()
    be = _be(4, np.float64)
    A0 = sp.random(24, 24, 0.25, random_state=3, format="csr") + sp.eye(24)
    A1 = A0.copy()
    A1.data = A1.data * 2.0
    Ad0 = hl.DistSparseMatrix.from_scipy(A0.tocsr(), be)
    Ad1 = hl.DistSparseMatrix.from_scipy(A1.tocsr(), be)
    x = hl.DistVector.from_global(np.ones(24), be)
    _ = Ad0 @ x
    n_after_first = sum(cache_sizes().values())
    _ = Ad1 @ x
    assert sum(cache_sizes().values()) == n_after_first
    clear_plan_cache()


def test_repr_strings(be4):
    from utils import random_sparse

    """Container __repr__ carries shape/shards/dtype (debugging surface,
    ref Base.show HPCLinearAlgebra.jl:941-1005)."""
    A = random_sparse(9, 9, 0.3, seed=77)
    Ad = hl.DistSparseMatrix.from_scipy(A, be4)
    r = repr(Ad)
    assert "9" in r and "shards=4" in r and "float64" in r
    v = hl.DistVector.from_global(np.arange(5.0), be4)
    assert "5" in repr(v)

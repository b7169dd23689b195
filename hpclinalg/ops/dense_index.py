"""Range/fancy indexing for distributed dense matrices.

Reference: dense indexing paths in indexing.jl (A[rng,rng] :691, A[:,k]
:872, fancy :1654). Row selection is an ExchangePlan over row payloads;
column selection is a device-side take (columns are replicated within a
row block)."""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..hashing import _h
from ..partition import uniform_partition
from .gather import gather_exchange_plan
from .indexing import _normalize_slice, subrange_partition


def _row_ids(key, m, S):
    from ..vector import DistVector
    from .indexing import check_ids_bounds, v_to_int_host

    if isinstance(key, slice):
        s0, s1, st = _normalize_slice(key, m)
        return np.arange(s0, s1, st, dtype=np.int64), ("slice", s0, s1, st), (s0, s1, st)
    if isinstance(key, DistVector):
        ids = v_to_int_host(key)
        check_ids_bounds(ids, m)
        return ids, ("vec", _h(ids)), None
    if isinstance(key, (list, np.ndarray)):
        ids = np.asarray(key, dtype=np.int64)
        check_ids_bounds(ids, m)
        return ids, ("arr", _h(ids)), None
    raise TypeError("unsupported dense row index (scalar indexing is "
                    "deliberately unsupported, ref indexing.jl:17-21)")


def dense_getindex(A, key):
    from ..dense import DistDenseMatrix
    from ..vector import DistVector
    from .indexing import check_ids_bounds, v_to_int_host

    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix indexing requires A[rows, cols]")
    rkey, ckey = key
    m, n = A.shape
    S = A.backend.nshards

    # A[k, cols] -> row as DistVector (ref indexing.jl idx-x-Int forms,
    # the transpose analogue of A[:, k])
    if isinstance(rkey, (int, np.integer)) and not isinstance(
            ckey, (int, np.integer)):
        check_ids_bounds(np.array([int(rkey)]), m)
        R = dense_getindex(A, (slice(int(rkey), int(rkey) + 1), ckey))
        from ..parallel.mesh import scatter_from_full

        full = _sum_rows(R.data)  # (ncols,) replicated; one valid row
        rp = uniform_partition(R.ncols, S)
        return DistVector(scatter_from_full(full, rp, A.backend), rp,
                          A.backend)

    rids, rtag, rslice = _row_ids(rkey, m, S)

    # column selector (replicated within row blocks -> local take)
    if isinstance(ckey, slice):
        c0, c1, cst = _normalize_slice(ckey, n)
        cids = np.arange(c0, c1, cst, dtype=np.int64)
    elif isinstance(ckey, DistVector):
        cids = v_to_int_host(ckey)
        check_ids_bounds(cids, n)
    elif isinstance(ckey, (list, np.ndarray)):
        cids = np.asarray(ckey, dtype=np.int64)
        check_ids_bounds(cids, n)
    elif isinstance(ckey, (int, np.integer)):
        # A[:, k] -> column as DistVector (ref indexing.jl:872). Bounds
        # checked: JAX clamps OOB gathers, so A[:, ncols+5] would silently
        # return the LAST column.
        check_ids_bounds(np.array([int(ckey)]), n)
        col = _take_col_fn(int(ckey))(A.data)
        v = DistVector(col, A.row_partition, A.backend)
        return dense_getindex_rows(v, rids, rtag, rslice, A)
    else:
        raise TypeError("unsupported dense column index")

    if rslice is not None:
        rp2 = subrange_partition(A.row_partition, *rslice)
    else:
        rp2 = uniform_partition(len(rids), S)
    wanted = [rids[rp2[d]: rp2[d + 1]] for d in range(S)]
    from ..partition import padded_size

    plan = cached_plan(
        "dense_getindex",
        (A.row_partition_hash, rtag, A.backend.key),
        lambda: gather_exchange_plan(A.backend, A.row_partition, wanted,
                                     out_len=padded_size(rp2)),
    )
    rows = plan.apply(A.data)  # (S, L2, ncols)
    cols_dev = jnp.asarray(cids, dtype=jnp.int32)
    out = _take_cols(rows, cols_dev)
    return DistDenseMatrix(out, rp2, len(cids), A.backend)


@lru_cache(maxsize=None)
def _take_col_fn(k: int):
    return jax.jit(lambda d: d[:, :, k])


@jax.jit
def _sum_rows(d):
    return jnp.sum(d, axis=(0, 1))


@jax.jit
def _take_cols(rows, cols):
    return jnp.take(rows, cols, axis=2)


def dense_getindex_rows(v, rids, rtag, rslice, A):
    """Row-subset of a single column vector."""
    from ..vector import DistVector
    from ..partition import padded_size

    S = A.backend.nshards
    if rslice is not None:
        rp2 = subrange_partition(A.row_partition, *rslice)
    else:
        rp2 = uniform_partition(len(rids), S)
    wanted = [rids[rp2[d]: rp2[d + 1]] for d in range(S)]
    plan = cached_plan(
        "vec_getindex",
        (v.partition_hash, rtag, A.backend.key),
        lambda: gather_exchange_plan(A.backend, v.partition, wanted,
                                     out_len=padded_size(rp2)),
    )
    return DistVector(plan.apply(v.data), rp2, A.backend)

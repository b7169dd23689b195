"""setindex! analogues for distributed matrices.

Reference: ~20 setindex! methods (indexing.jl:1871-4362). Sparse structural
setindex rebuilds the local CSR with insertions and invalidates the hash and
cached transpose (indexing.jl:1276-1295); JAX arrays are immutable, so the
wrapper swaps in a new structure + value array and resets its caches
(SURVEY.md §7.3 item 4).

The sparse rebuild is a per-shard CSR splice touching only affected rows —
O(local nnz + inserts) numpy, the same cost class as the reference's local
rebuild (_rebuild_AT_with_insertions, sparse.jl:191) — and the value
movement (old kept values -> new slots, inserted values from the RHS) is a
cached local ExchangePlan. Dense setindex is a cached device scatter.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..cache import cached_plan
from ..config import round_up
from ..hashing import _h
from ..parallel.exchange import ExchangePlan
from ..partition import global_to_local
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


def _check_bounds(ids: np.ndarray, n: int, what: str) -> None:
    """Global ids must be in [0, n): OOB ids would silently corrupt other
    entries (dense flat-index wrap) or build an unowned structure entry
    (sparse) — the reference's setindex! throws a BoundsError."""
    if len(ids) and (ids.min() < 0 or ids.max() >= n):
        bad = ids[(ids < 0) | (ids >= n)][0]
        raise IndexError(f"{what} index {bad} out of bounds for size {n}")


def _check_value_dtype(vdtype, adtype) -> None:
    if (np.issubdtype(np.dtype(vdtype), np.complexfloating)
            and not np.issubdtype(np.dtype(adtype), np.complexfloating)):
        raise TypeError(
            "cannot assign complex values into a real container "
            "(casting would silently drop the imaginary part)")


def _dedup_last(ids: np.ndarray):
    """Positions keeping the LAST occurrence of each id, original order
    (Julia last-write-wins setindex! semantics)."""
    if len(ids) and len(np.unique(ids)) != len(ids):
        _, first_in_rev = np.unique(ids[::-1], return_index=True)
        return np.sort(len(ids) - 1 - first_in_rev)
    return None


def _sparse_insert_plan(A, rids, cids, V_indptr, V_indices):
    """Per-shard CSR splice: drop the (rids x cids) block's old entries,
    insert V's pattern, and derive the value-movement maps.

    Returns (new_structure, value ExchangePlan, ins_dst, ins_src) where the
    plan moves surviving old values to their new slots and
    ``template[s, ins_dst[s]] = V.data[ins_src[s]]`` seeds the inserted ones.
    """
    from ..sparse import SparseStructure

    st = A.structure
    S = A.backend.nshards
    p = st.row_partition
    cid_sorted = np.sort(cids)

    indptr2, colind2, colval2 = [], [], []
    old_src, old_dst, ins_dst, ins_src = [], [], [], []
    for s in range(S):
        ip = st.indptr[s]
        nl = len(ip) - 1
        gcols = (st.col_indices[s][st.colval[s]] if len(st.colval[s])
                 else np.zeros(0, np.int64))
        rows_l = np.repeat(np.arange(nl, dtype=np.int64), np.diff(ip))

        owned = (rids >= p[s]) & (rids < p[s + 1])
        al = rids[owned] - p[s]
        row_affected = np.zeros(nl, dtype=bool)
        row_affected[al] = True
        if len(gcols) and len(cid_sorted):
            pos = np.minimum(np.searchsorted(cid_sorted, gcols),
                             len(cid_sorted) - 1)
            in_cids = cid_sorted[pos] == gcols
        else:
            in_cids = np.zeros(len(gcols), dtype=bool)
        keep = ~(row_affected[rows_l] & in_cids)

        kept_rows = rows_l[keep]
        kept_cols = gcols[keep]
        kept_pos = np.flatnonzero(keep)

        # inserted entries from V's rows owned by this shard
        ks = np.flatnonzero(owned)  # indices into rids / V rows
        counts = (V_indptr[ks + 1] - V_indptr[ks]) if len(ks) \
            else np.zeros(0, np.int64)
        i_rows = np.repeat(al, counts)
        if len(ks):
            vsrc = np.concatenate(
                [np.arange(V_indptr[k], V_indptr[k + 1]) for k in ks]
            ).astype(np.int64) if counts.sum() else np.zeros(0, np.int64)
        else:
            vsrc = np.zeros(0, np.int64)
        i_cols = cids[V_indices[vsrc]] if len(vsrc) else np.zeros(0, np.int64)

        rows2 = np.concatenate([kept_rows, i_rows])
        cols2 = np.concatenate([kept_cols, i_cols])
        order = np.lexsort((cols2, rows2))
        rows2, cols2 = rows2[order], cols2[order]

        ip2 = np.zeros(nl + 1, dtype=np.int64)
        np.add.at(ip2, rows2 + 1, 1)
        indptr2.append(np.cumsum(ip2))
        ci = np.unique(cols2)
        colind2.append(ci)
        colval2.append(np.searchsorted(ci, cols2).astype(np.int32))

        # new slot of each concatenated entry
        newpos = np.empty(len(order), dtype=np.int64)
        newpos[order] = np.arange(len(order))
        nk = len(kept_pos)
        old_src.append(kept_pos)
        old_dst.append(newpos[:nk])
        ins_dst.append(newpos[nk:])
        ins_src.append(vsrc)

    st2 = SparseStructure(p, st.col_partition, indptr2, colind2, colval2,
                          A.backend)
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    for s in range(S):
        send[s][s] = old_src[s]
        recv[s][s] = old_dst[s]
    plan = ExchangePlan(A.backend, send, recv, st2.NNZpad)
    return st2, plan, ins_dst, ins_src


def sparse_setindex(A, key, value) -> None:
    """A[rows, cols] = value. value: scalar, ndarray (len(rows), len(cols)),
    scipy sparse, or DistSparseMatrix. Mutates A in place: new structure,
    new values, caches invalidated (ref: indexing.jl:1276-1295). The rebuild
    touches only the affected rows of each shard — the full matrix is never
    gathered or densified."""
    import jax

    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix setindex requires A[rows, cols] = value")
    rids = _ids_of(key[0], A.m)
    cids = _ids_of(key[1], A.ncols)
    _check_bounds(rids, A.m, "row")
    _check_bounds(cids, A.ncols, "column")

    from ..sparse import DistSparseMatrix

    if isinstance(value, DistSparseMatrix):
        V = value.to_scipy().tocsr()
    elif sp.issparse(value):
        V = sp.csr_matrix(value)
    elif np.isscalar(value) or isinstance(value, (int, float, complex)):
        V = sp.csr_matrix(np.full((len(rids), len(cids)), value))
    else:
        V = sp.csr_matrix(np.asarray(value))
    if V.shape != (len(rids), len(cids)):
        raise ValueError(f"value shape {V.shape} does not match index block "
                         f"({len(rids)}, {len(cids)})")
    V.sort_indices()

    kr = _dedup_last(rids)
    if kr is not None:
        rids, V = rids[kr], V[kr]
    kc = _dedup_last(cids)
    if kc is not None:
        cids, V = cids[kc], sp.csr_matrix(V[:, kc])
        V.sort_indices()

    Vip = V.indptr.astype(np.int64)
    Vix = V.indices.astype(np.int64)
    st2, plan, ins_dst, ins_src = cached_plan(
        "sparse_setindex",
        (A.hash, _h(rids), _h(cids), _h(Vip, Vix), A.backend.key),
        lambda: _sparse_insert_plan(A, rids, cids, Vip, Vix),
    )

    S = A.backend.nshards
    dtype = A.dtype
    _check_value_dtype(V.dtype, dtype)
    template = np.zeros((S, plan.out_pad), dtype=dtype)
    vdata = V.data.astype(dtype)
    for s in range(S):
        if len(ins_dst[s]):
            template[s, ins_dst[s]] = vdata[ins_src[s]]
    base = jax.device_put(template, A.backend.row_sharding())
    nz2 = plan.apply(A.nzval, base=base)
    Anew = DistSparseMatrix(st2, nz2, A.backend)
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
    """M[rows, cols] = value for distributed dense matrices — a cached
    device scatter of the (rows x cols) block; the matrix itself never
    leaves the device."""
    import jax
    import jax.numpy as jnp

    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix setindex requires M[rows, cols] = value")
    rids = _ids_of(key[0], M.m)
    cids = _ids_of(key[1], M.ncols)
    _check_bounds(rids, M.m, "row")
    _check_bounds(cids, M.ncols, "column")

    if np.isscalar(value) or isinstance(value, (int, float, complex)):
        vals = np.full((len(rids), len(cids)), value)
    elif hasattr(value, "to_numpy"):
        vals = value.to_numpy_ro()
    else:
        vals = np.asarray(value)
    if vals.shape != (len(rids), len(cids)):
        raise ValueError("value shape mismatch")

    kr = _dedup_last(rids)
    if kr is not None:
        rids, vals = rids[kr], vals[kr]
    kc = _dedup_last(cids)
    if kc is not None:
        cids, vals = cids[kc], vals[:, kc]

    S = M.backend.nshards
    L, n = M.data.shape[1], M.ncols

    def build():
        owners, loc = global_to_local(M.row_partition, rids)
        sel = [np.flatnonzero(owners == s) for s in range(S)]
        K = max((len(sl) * len(cids) for sl in sel), default=0)
        Kpad = max(round_up(max(K, 1), 8), 1)
        dst = np.full((S, Kpad), L * n, dtype=np.int32)  # out-of-range drop
        for s in range(S):
            if len(sel[s]):
                d = (loc[sel[s]][:, None] * n + cids[None, :]).ravel()
                dst[s, : len(d)] = d
        return (jax.device_put(dst, M.backend.row_sharding()), sel, Kpad)

    dst_dev, sel, Kpad = cached_plan(
        "dense_setindex",
        (M.row_partition_hash, n, L, _h(rids), _h(cids), M.backend.key),
        build,
    )
    _check_value_dtype(vals.dtype, M.dtype)
    payload = np.zeros((S, Kpad), dtype=M.dtype)
    for s in range(S):
        if len(sel[s]):
            block = vals[sel[s]].astype(M.dtype).ravel()
            payload[s, : len(block)] = block
    pay = jax.device_put(payload, M.backend.row_sharding())
    M.data = _scatter_flat(M.data, dst_dev, pay)


def _scatter_flat(data, dst, payload):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(d, i, p):
        Sn, Ln, nn = d.shape
        flat = d.reshape(Sn, Ln * nn)
        flat = jax.vmap(lambda f, ii, pp: f.at[ii].set(pp, mode="drop"))(
            flat, i, p.astype(d.dtype))
        return flat.reshape(Sn, Ln, nn)

    return run(data, dst, payload)

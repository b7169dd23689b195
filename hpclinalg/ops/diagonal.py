"""diag / triu / tril / dropzeros for distributed sparse matrices.

Reference: diag(A, k) (sparse.jl:2801), triu/tril (sparse.jl:2874/2971),
dropzeros (sparse.jl:2755). Structure filtering is host-side (replicated
metadata); value movement is a cached local permutation or a scatter plan.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..partition import uniform_partition
from ..parallel.exchange import ExchangePlan


def diag(A, k: int = 0):
    """k-th diagonal as a DistVector of length min(m, n-k) (k>=0) or
    min(m+k, n) (k<0), matching Julia's diag (ref sparse.jl:2801)."""
    from ..vector import DistVector

    m, n = A.shape
    dlen = max(0, min(m, n - k) if k >= 0 else min(m + k, n))
    st = A.structure
    S = A.backend.nshards

    def build():
        # per shard: storage positions of entries on the k-diagonal, and the
        # diag index each maps to
        pos, didx = [], []
        for s in range(S):
            r, c = st.global_coo[s]
            msk = c == r + k
            pos.append(np.flatnonzero(msk))
            didx.append((r[msk] if k >= 0 else c[msk]).astype(np.int64))
        dpart = uniform_partition(dlen, S)
        plan = build_position_scatter(A.backend, pos, didx, dpart)
        return (plan, dpart)

    plan, dpart = cached_plan("diag_plan", (A.hash, k, A.backend.key), build)
    data = plan.apply(A.nzval)
    return DistVector(data, dpart, A.backend)


def build_position_scatter(backend, src_positions, dst_global, dst_partition):
    """ExchangePlan sending src storage slots ``src_positions[s]`` to global
    rows ``dst_global[s]`` of a vector over ``dst_partition``."""
    from ..partition import global_to_local, padded_size

    S = backend.nshards
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    for s in range(S):
        owners, loc = global_to_local(dst_partition, dst_global[s])
        for d in range(S):
            msk = owners == d
            if msk.any():
                send[s][d] = src_positions[s][msk]
                recv[d][s] = loc[msk]
    return ExchangePlan(backend, send, recv, padded_size(dst_partition))


def _filter_structure(A, keep_fn):
    """New matrix keeping entries where keep_fn(grow, gcol) — local value
    permutation, no communication."""
    from ..sparse import DistSparseMatrix, SparseStructure

    st = A.structure
    S = A.backend.nshards

    def build():
        indptr, col_indices, colval = [], [], []
        send = []
        for s in range(S):
            r, c = st.global_coo[s]
            msk = keep_fn(r, c)
            pos = np.flatnonzero(msk)
            send.append(pos)
            rk, ck = r[msk] - st.row_partition[s], c[msk]
            nl = len(st.indptr[s]) - 1
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, rk + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(ck)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, ck).astype(np.int32))
        new_st = SparseStructure(st.row_partition, st.col_partition, indptr,
                                 col_indices, colval, A.backend)
        sends = [[send[s] if d == s else np.zeros(0, np.int64) for d in range(S)]
                 for s in range(S)]
        recvs = [[np.arange(len(send[s])) if d == s else np.zeros(0, np.int64)
                  for d in range(S)] for s in range(S)]
        plan = ExchangePlan(A.backend, sends, recvs, new_st.NNZpad)
        return new_st, plan

    return build


def triu(A, k: int = 0):
    from ..sparse import DistSparseMatrix

    st, plan = cached_plan("triu_plan", (A.hash, k, A.backend.key),
                           _filter_structure(A, lambda r, c: c >= r + k))
    return DistSparseMatrix(st, plan.apply(A.nzval), A.backend)


def tril(A, k: int = 0):
    from ..sparse import DistSparseMatrix

    st, plan = cached_plan("tril_plan", (A.hash, k, A.backend.key),
                           _filter_structure(A, lambda r, c: c <= r + k))
    return DistSparseMatrix(st, plan.apply(A.nzval), A.backend)


def dropzeros(A, tol: float = 0.0):
    """Drop stored values with |v| <= tol (ref sparse.jl:2755). Value-
    dependent structure — requires a host readback of nzval; not cached."""
    from ..sparse import DistSparseMatrix

    nz = np.asarray(A.nzval)
    st = A.structure
    parts = []
    for s in range(A.backend.nshards):
        v = nz[s, : st.nnz_local[s]]
        keep = np.abs(v) > tol
        r, c = st.global_coo[s]
        rk = r[keep] - st.row_partition[s]
        nl = len(st.indptr[s]) - 1
        ip = np.zeros(nl + 1, dtype=np.int64)
        np.add.at(ip, rk + 1, 1)
        parts.append((np.cumsum(ip), c[keep], v[keep]))
    return DistSparseMatrix.from_local_csr(
        parts, A.ncols, A.backend, col_partition=st.col_partition, dtype=A.dtype
    )

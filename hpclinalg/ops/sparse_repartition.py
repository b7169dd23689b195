"""Sparse row repartitioning.

Reference: SparseRepartitionPlan (/root/reference/src/sparse.jl:4098-4573):
structure exchange at plan time (tag 94), values-only at execution (tag 96),
eager result hash. Here the structure "exchange" is a host-side re-slice of
replicated metadata and the value movement is one static ExchangePlan.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..hashing import partition_hash
from ..partition import validate_partition
from ..parallel.exchange import ExchangePlan


def _build(A, p2):
    from ..sparse import SparseStructure

    st = A.structure
    S = A.backend.nshards
    # global CSR row lengths, replicated
    rowlen = np.concatenate([np.diff(ip) for ip in st.indptr])
    g_indptr = np.concatenate([[0], np.cumsum(rowlen)]).astype(np.int64)

    indptr, col_indices, colval = [], [], []
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    # global col ids per original shard, in storage order
    gcols = [st.col_indices[s][st.colval[s]] if len(st.colval[s])
             else np.zeros(0, np.int64) for s in range(S)]
    p1 = st.row_partition
    for d in range(S):
        lo, hi = int(p2[d]), int(p2[d + 1])
        nl = hi - lo
        ip = np.zeros(nl + 1, dtype=np.int64)
        ip[1:] = np.cumsum(rowlen[lo:hi])
        indptr.append(ip)
        # columns of the rows moving to d, ordered by global row
        cols_d = []
        for s in range(S):
            a, b = max(lo, int(p1[s])), min(hi, int(p1[s + 1]))
            if a >= b:
                continue
            st_lo = g_indptr[a] - g_indptr[p1[s]]
            st_hi = g_indptr[b] - g_indptr[p1[s]]
            cols_d.append((a, gcols[s][st_lo:st_hi]))
            send[s][d] = np.arange(st_lo, st_hi)
            recv[d][s] = np.arange(g_indptr[a] - g_indptr[lo],
                                   g_indptr[b] - g_indptr[lo])
        cols_cat = (np.concatenate([c for _a, c in sorted(cols_d, key=lambda t: t[0])])
                    if cols_d else np.zeros(0, np.int64))
        ci = np.unique(cols_cat)
        col_indices.append(ci)
        colval.append(np.searchsorted(ci, cols_cat).astype(np.int32))
    new_st = SparseStructure(p2, st.col_partition, indptr, col_indices, colval,
                             A.backend)
    plan = ExchangePlan(A.backend, send, recv, new_st.NNZpad)
    return new_st, plan


def repartition_sparse(A, new_row_partition):
    """Ref: repartition (sparse.jl:4573)."""
    from ..sparse import DistSparseMatrix

    p2 = validate_partition(new_row_partition, A.m)
    from ..partition import nshards_of

    if nshards_of(p2) != A.backend.nshards:
        raise ValueError("new partition must have the same shard count as the mesh")
    if partition_hash(p2) == A.row_partition_hash:
        return A
    key = (A.hash, partition_hash(p2), A.backend.key)
    new_st, plan = cached_plan("sparse_repartition", key, lambda: _build(A, p2))
    return DistSparseMatrix(new_st, plan.apply(A.nzval), A.backend)

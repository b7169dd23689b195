"""Sparse transpose materialization.

Reference: TransposePlan (/root/reference/src/sparse.jl:1519-1829) classifies
every stored value by the owner of its column under ``col_partition``, moves
(row,col,val) triples via tagged Isend/Irecv, and caches the result
bidirectionally (sparse.jl:1846-1865).

Here the classification and the full symbolic construction of Aᵀ's CSR
structure run on replicated host metadata; the value movement is one static
ExchangePlan permutation from A's storage order into Aᵀ's storage order.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..partition import owner_of
from ..parallel.exchange import ExchangePlan


def _build_transpose_plan(A):
    from ..sparse import SparseStructure

    st = A.structure
    S = A.backend.nshards
    rp, cp = st.row_partition, st.col_partition

    # Collect every stored entry: (gcol, grow, src shard, src storage pos)
    gcols, grows, srcs, poss = [], [], [], []
    for s in range(S):
        r, c = st.global_coo[s]
        gcols.append(c)
        grows.append(r)
        srcs.append(np.full(len(c), s, dtype=np.int64))
        poss.append(np.arange(len(c), dtype=np.int64))
    gcol = np.concatenate(gcols) if gcols else np.zeros(0, np.int64)
    grow = np.concatenate(grows) if grows else np.zeros(0, np.int64)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    pos = np.concatenate(poss) if poss else np.zeros(0, np.int64)

    # At storage order: sort by (dst shard = owner(gcol), gcol, grow)
    order = np.lexsort((grow, gcol))
    gcol, grow, src, pos = gcol[order], grow[order], src[order], pos[order]
    dst = owner_of(cp, gcol)

    # Build At structure per destination shard
    indptr, col_indices, colval = [], [], []
    at_pos = np.empty(len(gcol), dtype=np.int64)  # position in dst-local storage
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    for d in range(S):
        m = dst == d
        nl = int(cp[d + 1] - cp[d])
        lc, lr = gcol[m] - cp[d], grow[m]
        nnz_d = int(m.sum())
        ip = np.zeros(nl + 1, dtype=np.int64)
        np.add.at(ip, lc + 1, 1)
        indptr.append(np.cumsum(ip))
        ci = np.unique(lr)
        col_indices.append(ci)
        colval.append(np.searchsorted(ci, lr).astype(np.int32))
        at_pos[m] = np.arange(nnz_d)
        for s in range(S):
            ms = m & (src == s)
            if ms.any():
                send[s][d] = pos[ms]
                recv[d][s] = at_pos[ms]

    at_st = SparseStructure(cp, rp, indptr, col_indices, colval, A.backend)
    plan = ExchangePlan(A.backend, send, recv, at_st.NNZpad)
    return at_st, plan


def get_transpose_plan(A):
    return cached_plan("transpose_plan", (A.hash, A.backend.key),
                       lambda: _build_transpose_plan(A))


def materialize_transpose(A):
    """Ref: HPCSparseMatrix{T}(transpose(A)) (sparse.jl:1846-1865), with the
    same bidirectional result caching."""
    from ..sparse import DistSparseMatrix

    if A.cached_transpose is not None:
        return A.cached_transpose
    at_st, plan = get_transpose_plan(A)
    at_nz = plan.apply(A.nzval)
    At = DistSparseMatrix(at_st, at_nz, A.backend)
    A.cached_transpose = At
    At.cached_transpose = A
    return At

"""Range and fancy indexing for distributed sparse matrices.

Reference: indexing.jl (4.4 kLoC) — A[rng,rng] (:300/:691), A[:,k] (:385),
fancy index-vector forms (:1483), setindex! variants (:1871-4362). Round-1
coverage: slice×slice, slice×fancy, fancy×slice, fancy×fancy getindex via
host structure filtering + one value ExchangePlan; row-subset extraction is
the reference's row-gather helper equivalent (sparse.jl:3079-3225).
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..hashing import _h
from ..partition import uniform_partition
from ..parallel.exchange import ExchangePlan
from .indexing import (_normalize_slice, check_ids_bounds,
                       subrange_partition)


def _key_ids(key, n, v_to_host):
    """Normalize an index expression into an explicit id array + cache tag."""
    from ..vector import DistVector

    if isinstance(key, slice):
        s0, s1, st = _normalize_slice(key, n)
        return np.arange(s0, s1, st, dtype=np.int64), ("slice", s0, s1, st)
    if isinstance(key, DistVector):
        ids = v_to_host(key)
        check_ids_bounds(ids, n)
        return ids, ("vec", _h(ids))
    if isinstance(key, (list, np.ndarray)):
        ids = np.asarray(key, dtype=np.int64)
        check_ids_bounds(ids, n)
        return ids, ("arr", _h(ids))
    if isinstance(key, (int, np.integer)):
        raise TypeError("scalar indexing of distributed matrices is unsupported "
                        "(reference removed it too; indexing.jl:17-21)")
    raise TypeError(f"unsupported index type {type(key)}")


def sparse_getindex(A, key):
    from ..sparse import DistSparseMatrix, SparseStructure
    from .indexing import v_to_int_host

    if not isinstance(key, tuple) or len(key) != 2:
        raise TypeError("matrix indexing requires A[rows, cols]")
    rkey, ckey = key
    m, n = A.shape

    # A[rows, k] -> DistVector (ref: A[:,k], indexing.jl:385); the row case
    # A[k, cols] is the transpose analogue
    if isinstance(ckey, (int, np.integer)) and not isinstance(rkey, (int, np.integer)):
        from .indexing import check_ids_bounds

        check_ids_bounds(np.array([int(ckey)]), n)  # A[:, -1]/A[:, n+5]
        # previously normalized to an EMPTY slice and returned zeros
        col = sparse_getindex(A, (rkey, slice(int(ckey), int(ckey) + 1)))
        from .reductions import row_sum

        return row_sum(col)
    if isinstance(rkey, (int, np.integer)) and not isinstance(ckey, (int, np.integer)):
        from .indexing import check_ids_bounds

        check_ids_bounds(np.array([int(rkey)]), m)
        row = sparse_getindex(A, (slice(int(rkey), int(rkey) + 1), ckey))
        from .reductions import col_sum

        return col_sum(row)
    rids, rtag = _key_ids(rkey, m, v_to_int_host)
    cids, ctag = _key_ids(ckey, n, v_to_int_host)

    def build():
        st = A.structure
        S = A.backend.nshards
        # result row partition: uniform for fancy, locality-preserving for slices
        if rtag[0] == "slice":
            rp2 = subrange_partition(st.row_partition, rtag[1], rtag[2], rtag[3])
        else:
            rp2 = uniform_partition(len(rids), S)
        # duplicate-tolerant index maps: sorted ids + searchsorted ranges let
        # one source entry fan out to every output position that selects it
        # (Julia fancy-index semantics, ref indexing.jl:1483)
        r_order = np.argsort(rids, kind="stable")
        r_sorted = rids[r_order]
        c_order = np.argsort(cids, kind="stable")
        c_sorted = cids[c_order]

        def expand(ids_sorted, order, values):
            """for each value, the list of output positions selecting it;
            returns (entry index repeat array, output positions)"""
            lo = np.searchsorted(ids_sorted, values, side="left")
            hi = np.searchsorted(ids_sorted, values, side="right")
            cnt = hi - lo
            src = np.repeat(np.arange(len(values)), cnt)
            within = np.arange(len(src)) - np.repeat(
                np.concatenate([[0], np.cumsum(cnt)])[:-1], cnt)
            outpos = order[np.repeat(lo, cnt) + within]
            return src, outpos

        send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        # collect selected entries per destination shard
        per_dst = [[] for _ in range(S)]  # (new_row, new_col, src_shard, src_pos)
        for s in range(S):
            r, c = st.global_coo[s]
            # fan out by rows then by cols
            e_r, out_r = expand(r_sorted, r_order, r)
            if not len(e_r):
                continue
            e_rc, out_c = expand(c_sorted, c_order, c[e_r])
            nr = out_r[e_rc]
            nc = out_c
            pos = e_r[e_rc]  # source storage position (may repeat)
            d_of = np.searchsorted(rp2, nr, side="right") - 1
            for d in range(S):
                md = d_of == d
                if md.any():
                    per_dst[d].append((nr[md], nc[md], s, pos[md]))
        indptr, col_indices, colval = [], [], []
        for d in range(S):
            if per_dst[d]:
                nr = np.concatenate([t[0] for t in per_dst[d]])
                nc = np.concatenate([t[1] for t in per_dst[d]])
                srcs = np.concatenate([np.full(len(t[0]), t[2]) for t in per_dst[d]])
                poss = np.concatenate([t[3] for t in per_dst[d]])
            else:
                nr = nc = srcs = poss = np.zeros(0, np.int64)
            order = np.lexsort((nc, nr))
            nr, nc, srcs, poss = nr[order], nc[order], srcs[order], poss[order]
            nl = int(rp2[d + 1] - rp2[d])
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, nr - rp2[d] + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(nc)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, nc).astype(np.int32))
            newpos = np.arange(len(nr), dtype=np.int64)
            for s in range(S):
                ms = srcs == s
                if ms.any():
                    send[s][d] = poss[ms]
                    recv[d][s] = newpos[ms]
        cp2 = uniform_partition(len(cids), S)
        new_st = SparseStructure(rp2, cp2, indptr, col_indices, colval, A.backend)
        plan = ExchangePlan(A.backend, send, recv, new_st.NNZpad)
        return new_st, plan

    new_st, plan = cached_plan("sparse_getindex",
                               (A.hash, rtag, ctag, A.backend.key), build)
    return DistSparseMatrix(new_st, plan.apply(A.nzval), A.backend)

"""Block operations: cat / hcat / vcat / blockdiag.

Reference: blocks.jl (/root/reference/src/blocks.jl:30-547) — each rank
gathers only the rows overlapping its output slice, and all ranks join every
block's collective. Here the output structure is assembled on host from the
replicated block structures, and each input contributes its values through
one ExchangePlan scattered into the shared output value array.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..partition import uniform_partition
from ..parallel.exchange import ExchangePlan


def _grid_from_dims(blocks, dims):
    if dims == 1:
        return [[b] for b in blocks]
    if dims == 2:
        return [list(blocks)]
    raise ValueError("dims must be 1, 2 or a (nrows, ncols) tuple")


def cat_sparse(*blocks, dims=1):
    """Concatenate sparse blocks (ref: cat, blocks.jl:30-127). ``dims`` may be
    1 (vcat), 2 (hcat), or (bm, bn) arranging blocks row-major in a grid."""
    from ..sparse import DistSparseMatrix, SparseStructure

    if isinstance(dims, tuple):
        bm, bn = dims
        if len(blocks) != bm * bn:
            raise ValueError("block count does not match grid")
        grid = [list(blocks[i * bn:(i + 1) * bn]) for i in range(bm)]
    else:
        grid = _grid_from_dims(blocks, dims)

    backend = grid[0][0].backend
    S = backend.nshards
    # validate + offsets
    row_off = [0]
    for brow in grid:
        h = brow[0].m
        if any(b.m != h for b in brow):
            raise ValueError("inconsistent block heights in a grid row")
        row_off.append(row_off[-1] + h)
    col_off = [0]
    for j in range(len(grid[0])):
        w = grid[0][j].ncols
        if any(brow[j].ncols != w for brow in grid):
            raise ValueError("inconsistent block widths in a grid column")
        col_off.append(col_off[-1] + w)
    M, N = row_off[-1], col_off[-1]

    key = ("cat", tuple(tuple(b.hash for b in brow) for brow in grid),
           backend.key)

    def build():
        rp2 = uniform_partition(M, S)
        # per output shard: lists of (grow, gcol, block id, src shard, src pos)
        ent = [[] for _ in range(S)]
        bid = 0
        plans_meta = []
        for bi, brow in enumerate(grid):
            for bj, B in enumerate(brow):
                st = B.structure
                for s in range(S):
                    r, c = st.global_coo[s]
                    gr = r + row_off[bi]
                    gc = c + col_off[bj]
                    d_of = np.searchsorted(rp2, gr, side="right") - 1
                    pos = np.arange(len(r), dtype=np.int64)
                    for d in range(S):
                        md = d_of == d
                        if md.any():
                            ent[d].append((gr[md], gc[md], bid, s, pos[md]))
                plans_meta.append((bid, B))
                bid += 1
        nblocks = bid
        indptr, col_indices, colval = [], [], []
        send = [[[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
                for _ in range(nblocks)]
        recv = [[[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
                for _ in range(nblocks)]
        for d in range(S):
            if ent[d]:
                gr = np.concatenate([e[0] for e in ent[d]])
                gc = np.concatenate([e[1] for e in ent[d]])
                bids = np.concatenate([np.full(len(e[0]), e[2]) for e in ent[d]])
                srcs = np.concatenate([np.full(len(e[0]), e[3]) for e in ent[d]])
                poss = np.concatenate([e[4] for e in ent[d]])
            else:
                gr = gc = bids = srcs = poss = np.zeros(0, np.int64)
            order = np.lexsort((gc, gr))
            gr, gc, bids, srcs, poss = gr[order], gc[order], bids[order], srcs[order], poss[order]
            nl = int(rp2[d + 1] - rp2[d])
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, gr - rp2[d] + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(gc)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, gc).astype(np.int32))
            newpos = np.arange(len(gr), dtype=np.int64)
            for b in range(nblocks):
                for s in range(S):
                    m = (bids == b) & (srcs == s)
                    if m.any():
                        send[b][s][d] = poss[m]
                        recv[b][d][s] = newpos[m]
        from ..sparse import SparseStructure

        cp2 = uniform_partition(N, S)
        new_st = SparseStructure(rp2, cp2, indptr, col_indices, colval, backend)
        plans = [ExchangePlan(backend, send[b], recv[b], new_st.NNZpad)
                 for b in range(nblocks)]
        return new_st, plans

    new_st, plans = cached_plan("blocks_plan", key, build)
    out = None
    bid = 0
    for brow in grid:
        for B in brow:
            out = plans[bid].apply(B.nzval, base=out)
            bid += 1
    return DistSparseMatrix(new_st, out, backend)


def vcat_sparse(*blocks):
    return cat_sparse(*blocks, dims=1)


def hcat_sparse(*blocks):
    return cat_sparse(*blocks, dims=2)


def blockdiag(*blocks):
    """Ref: blockdiag (blocks.jl:467). Assembled as a grid with implicit zero
    off-diagonal blocks — built directly to avoid materializing zeros."""
    from ..sparse import DistSparseMatrix, SparseStructure

    backend = blocks[0].backend
    S = backend.nshards
    M = sum(b.m for b in blocks)
    N = sum(b.ncols for b in blocks)
    key = ("blockdiag", tuple(b.hash for b in blocks), backend.key)

    def build():
        rp2 = uniform_partition(M, S)
        ent = [[] for _ in range(S)]
        ro, co = 0, 0
        for bid, B in enumerate(blocks):
            st = B.structure
            for s in range(S):
                r, c = st.global_coo[s]
                gr, gc = r + ro, c + co
                d_of = np.searchsorted(rp2, gr, side="right") - 1
                pos = np.arange(len(r), dtype=np.int64)
                for d in range(S):
                    md = d_of == d
                    if md.any():
                        ent[d].append((gr[md], gc[md], bid, s, pos[md]))
            ro += B.m
            co += B.ncols
        nblocks = len(blocks)
        indptr, col_indices, colval = [], [], []
        send = [[[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
                for _ in range(nblocks)]
        recv = [[[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
                for _ in range(nblocks)]
        for d in range(S):
            if ent[d]:
                gr = np.concatenate([e[0] for e in ent[d]])
                gc = np.concatenate([e[1] for e in ent[d]])
                bids = np.concatenate([np.full(len(e[0]), e[2]) for e in ent[d]])
                srcs = np.concatenate([np.full(len(e[0]), e[3]) for e in ent[d]])
                poss = np.concatenate([e[4] for e in ent[d]])
            else:
                gr = gc = bids = srcs = poss = np.zeros(0, np.int64)
            order = np.lexsort((gc, gr))
            gr, gc, bids, srcs, poss = gr[order], gc[order], bids[order], srcs[order], poss[order]
            nl = int(rp2[d + 1] - rp2[d])
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, gr - rp2[d] + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(gc)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, gc).astype(np.int32))
            newpos = np.arange(len(gr), dtype=np.int64)
            for b in range(nblocks):
                for s in range(S):
                    m = (bids == b) & (srcs == s)
                    if m.any():
                        send[b][s][d] = poss[m]
                        recv[b][d][s] = newpos[m]
        cp2 = uniform_partition(N, S)
        new_st = SparseStructure(rp2, cp2, indptr, col_indices, colval, backend)
        plans = [ExchangePlan(backend, send[b], recv[b], new_st.NNZpad)
                 for b in range(nblocks)]
        return new_st, plans

    new_st, plans = cached_plan("blocks_plan", key, build)
    out = None
    for bid, B in enumerate(blocks):
        out = plans[bid].apply(B.nzval, base=out)
    return DistSparseMatrix(new_st, out, backend)

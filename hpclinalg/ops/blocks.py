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


def _assemble_blocks(backend, placed):
    """Build the output structure + one value ExchangePlan per input block.

    placed: list of (block, row_offset, col_offset) with global offsets in
    the output matrix. Returns (structure, plans) where plans[i] scatters
    block i's nzval into the shared output value array.
    """
    from ..sparse import SparseStructure

    S = backend.nshards
    M = max((b.m + ro for b, ro, _ in placed), default=0)
    N = max((b.ncols + co for b, _, co in placed), default=0)
    rp2 = uniform_partition(M, S)

    # per output shard: (grow, gcol, block id, src shard, src pos)
    ent = [[] for _ in range(S)]
    for bid, (B, ro, co) in enumerate(placed):
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

    nblocks = len(placed)
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
        gr, gc, bids, srcs, poss = (gr[order], gc[order], bids[order],
                                    srcs[order], poss[order])
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
    st = SparseStructure(rp2, cp2, indptr, col_indices, colval, backend)
    plans = [ExchangePlan(backend, send[b], recv[b], st.NNZpad)
             for b in range(nblocks)]
    return st, plans


def _run_blocks(backend, key, placed):
    from ..sparse import DistSparseMatrix

    st, plans = cached_plan("blocks_plan", key,
                            lambda: _assemble_blocks(backend, placed))
    # promote to the common dtype up front (like cat_dense/vcat_vectors):
    # scattering a f64 block into a f32 base would silently downcast it
    dtype = np.result_type(*[B.dtype for (B, _ro, _co) in placed])
    out = None
    for plan, (B, _ro, _co) in zip(plans, placed):
        out = plan.apply(B.nzval.astype(dtype), base=out)
    return DistSparseMatrix(st, out, backend)


def cat_sparse(*blocks, dims=1):
    """Concatenate sparse blocks (ref: cat, blocks.jl:30-127). ``dims`` may be
    1 (vcat), 2 (hcat), or (bm, bn) arranging blocks row-major in a grid."""
    if isinstance(dims, tuple):
        bm, bn = dims
        if len(blocks) != bm * bn:
            raise ValueError("block count does not match grid")
        grid = [list(blocks[i * bn:(i + 1) * bn]) for i in range(bm)]
    elif dims == 1:
        grid = [[b] for b in blocks]
    elif dims == 2:
        grid = [list(blocks)]
    else:
        raise ValueError("dims must be 1, 2 or a (nrows, ncols) tuple")

    backend = grid[0][0].backend
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

    placed = [(b, row_off[i], col_off[j])
              for i, brow in enumerate(grid) for j, b in enumerate(brow)]
    key = ("cat", tuple(tuple(b.hash for b in brow) for brow in grid),
           backend.key)
    return _run_blocks(backend, key, placed)


def _grid_offsets(blocks, dims):
    """Arrange blocks in a grid and validate consistent heights/widths;
    returns (grid, row_offsets, col_offsets)."""
    if isinstance(dims, tuple):
        bm, bn = dims
        if len(blocks) != bm * bn:
            raise ValueError("block count does not match grid")
        grid = [list(blocks[i * bn:(i + 1) * bn]) for i in range(bm)]
    elif dims == 1:
        grid = [[b] for b in blocks]
    elif dims == 2:
        grid = [list(blocks)]
    else:
        raise ValueError("dims must be 1, 2 or a (nrows, ncols) tuple")
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
    return grid, row_off, col_off


def cat_dense(*blocks, dims=1):
    """Concatenate distributed dense matrices (ref: cat for HPCMatrix,
    blocks.jl:183). Rows move through one cached ExchangePlan per block with
    full-row payloads; column placement is a local static update."""
    import jax
    import jax.numpy as jnp

    from ..dense import DistDenseMatrix
    from ..hashing import partition_hash
    from ..partition import padded_size
    from .gather import scatter_exchange_plan

    grid, row_off, col_off = _grid_offsets(blocks, dims)
    backend = grid[0][0].backend
    S = backend.nshards
    M, N = row_off[-1], col_off[-1]
    rp2 = uniform_partition(M, S)
    dtype = np.result_type(*[b.dtype for b in blocks])
    out = jnp.zeros((S, padded_size(rp2), N), dtype=dtype)
    p2h = partition_hash(rp2)
    for i, brow in enumerate(grid):
        for j, B in enumerate(brow):
            ro = row_off[i]

            def build(B=B, ro=ro):
                dst = [ro + np.arange(B.row_partition[s], B.row_partition[s + 1])
                       for s in range(S)]
                return scatter_exchange_plan(backend, B.row_partition, dst, rp2)

            plan = cached_plan(
                "dense_cat_rows",
                (partition_hash(B.row_partition), p2h, ro, backend.key), build)
            moved = plan.apply(B.data.astype(dtype))  # (S, Lout, w)
            out = out.at[:, :, col_off[j]:col_off[j + 1]].add(moved)
    return DistDenseMatrix(jax.device_put(out, backend.row_sharding(1)),
                           rp2, N, backend)


def vcat_dense(*blocks):
    return cat_dense(*blocks, dims=1)


def hcat_dense(*blocks):
    return cat_dense(*blocks, dims=2)


def vcat_vectors(*vs):
    """Concatenate distributed vectors (ref: vcat for HPCVector,
    blocks.jl:304-445) — one cached scatter ExchangePlan per input."""
    from ..hashing import partition_hash
    from ..vector import DistVector
    from .gather import scatter_exchange_plan

    backend = vs[0].backend
    S = backend.nshards
    n = sum(len(v) for v in vs)
    p2 = uniform_partition(n, S)
    p2h = partition_hash(p2)
    dtype = np.result_type(*[v.dtype for v in vs])
    out = None
    off = 0
    for v in vs:
        def build(v=v, off=off):
            dst = [off + np.arange(v.partition[s], v.partition[s + 1])
                   for s in range(S)]
            return scatter_exchange_plan(backend, v.partition, dst, p2)

        plan = cached_plan("vec_cat", (v.partition_hash, p2h, off, backend.key),
                           build)
        out = plan.apply(v.data.astype(dtype), base=out)
        off += len(v)
    return DistVector(out, p2, backend)


def hcat_vectors(*vs):
    """Column-stack distributed vectors into a dense matrix (ref: hcat for
    HPCVector -> HPCMatrix, blocks.jl:304-445). Operands are aligned to the
    first vector's partition; the stack is a pure per-shard reshape."""
    import jax.numpy as jnp

    from ..dense import DistDenseMatrix

    v0 = vs[0]
    dtype = np.result_type(*[v.dtype for v in vs])
    cols = [v0._aligned(v).data.astype(dtype) if v is not v0
            else v0.data.astype(dtype) for v in vs]
    data = jnp.stack(cols, axis=2)  # (S, L, k)
    return DistDenseMatrix(data, v0.partition, len(vs), v0.backend)


def cat(*blocks, dims=1):
    """Type-dispatching cat covering all three container families
    (ref: blocks.jl:30/183/304)."""
    from ..dense import DistDenseMatrix
    from ..sparse import DistSparseMatrix
    from ..vector import DistVector

    b0 = blocks[0]
    if isinstance(b0, DistSparseMatrix):
        return cat_sparse(*blocks, dims=dims)
    if isinstance(b0, DistDenseMatrix):
        return cat_dense(*blocks, dims=dims)
    if isinstance(b0, DistVector):
        if isinstance(dims, tuple):
            # ref blocks.jl:349-383: dims=(n,1) == vcat, dims=(1,n) == hcat
            m, n = dims
            if m * n != len(blocks):
                raise ValueError("dims grid does not match block count")
            if n == 1:
                return vcat_vectors(*blocks) if m > 1 else blocks[0]
            if m == 1:
                return hcat_vectors(*blocks)
            raise ValueError("vector cat grids must be (n,1) or (1,n)")
        if dims == 2:
            return hcat_vectors(*blocks)
        if dims != 1:
            raise ValueError("vectors concatenate along dims=1 (vcat) or "
                             "dims=2 (hcat -> dense matrix)")
        return vcat_vectors(*blocks)
    raise TypeError(f"unsupported block type {type(b0)}")


def vcat_sparse(*blocks):
    return cat_sparse(*blocks, dims=1)


def hcat_sparse(*blocks):
    return cat_sparse(*blocks, dims=2)


def blockdiag(*blocks):
    """Ref: blockdiag (blocks.jl:467) — diagonal placement, implicit zero
    off-diagonal blocks never materialized."""
    backend = blocks[0].backend
    placed, ro, co = [], 0, 0
    for B in blocks:
        placed.append((B, ro, co))
        ro += B.m
        co += B.ncols
    key = ("blockdiag", tuple(b.hash for b in blocks), backend.key)
    return _run_blocks(backend, key, placed)

"""Dense transpose as a block-cyclic device exchange.

Analogue of the reference's DenseTransposePlan (/root/reference/src/
dense.jl:690-978): sub-blocks are exchanged between shards and transposed
on pack/unpack. Here the whole thing is one compiled shard_map: static
column-window slices -> all_to_all -> transpose -> static row take. No
host round-trip, no full-matrix materialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..backend import AXIS
from ..cache import cached_plan
from ..hashing import partition_hash
from ..partition import padded_size, partition_sizes


def _transpose_fn(mesh, col_bounds: tuple, maxW: int, out_L: int,
                  row_idx: np.ndarray):
    """col_bounds: col_partition boundaries; row_idx: flat (m,) map from
    global row -> slot in the concatenated (S*Lrow) source-row axis.

    NOT lru_cached on row_idx: an m-element tuple key costs O(m) hashing
    per call and ~10s of MB retained per pattern. The caller memoizes the
    built function in the plan cache keyed by the structural hashes."""
    S = len(col_bounds) - 1
    idx = jnp.asarray(np.asarray(row_idx, dtype=np.int32))

    def body(x):
        # x: (1, Lrow, ncols) local block
        Lrow = x.shape[1]
        blocks = []
        for d in range(S):
            c0, c1 = col_bounds[d], col_bounds[d + 1]
            blk = jax.lax.slice(x[0], (0, c0), (Lrow, c1))
            if c1 - c0 < maxW:
                blk = jnp.pad(blk, ((0, 0), (0, maxW - (c1 - c0))))
            blocks.append(blk)
        buf = jnp.stack(blocks)  # (S, Lrow, maxW)
        recv = jax.lax.all_to_all(buf, AXIS, split_axis=0, concat_axis=0)
        # recv[s] = shard s's rows for MY column window
        t = jnp.transpose(recv, (2, 0, 1)).reshape(maxW, S * Lrow)
        out = jnp.take(t, idx, axis=1)  # (maxW, m) in global row order
        if out_L > maxW:
            out = jnp.pad(out, ((0, out_L - maxW), (0, 0)))
        elif out_L < maxW:
            out = out[:out_L]
        return out[None]

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None, None),), out_specs=P(AXIS, None, None)))


def dense_transpose(A):
    from ..dense import DistDenseMatrix

    be = A.backend
    cp = A.col_partition
    key = (A.row_partition_hash, partition_hash(cp), A.ncols, be.key)

    def build():
        sizes = partition_sizes(A.row_partition)
        Lrow = int(A.data.shape[1])
        row_idx = np.concatenate(
            [s * Lrow + np.arange(sz) for s, sz in enumerate(sizes)]
        ).astype(np.int32) if len(sizes) else np.zeros(0, np.int32)
        maxW = int(partition_sizes(cp).max())
        out_L = padded_size(cp)
        return _transpose_fn(be.mesh, tuple(int(b) for b in cp), maxW,
                             out_L, row_idx)

    fn = cached_plan("dense_transpose", key, build)
    data = fn(A.data)
    return DistDenseMatrix(data, cp, A.m, be, col_partition=A.row_partition)

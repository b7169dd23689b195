"""Mesh-level helpers: full-array gathers and replicated views.

The reference's gather-to-all converters (``Vector()``/``Matrix()``/
``SparseMatrixCSC()``, /root/reference/src/HPCLinearAlgebra.jl:817-930) and
the dense matvec's full-x gather (DenseMatrixVectorPlan, dense.jl:397-588)
map here to ``all_gather`` + a static unpad/reorder take.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..backend import AXIS, Backend
from ..cache import cached_plan
from ..hashing import partition_hash
from ..partition import nshards_of, partition_sizes


@lru_cache(maxsize=None)
def _allgather_fn(mesh, extra_dims: int):
    spec = P(AXIS, *([None] * (1 + extra_dims)))

    def body(x):
        # x: (1, L, ...) -> (S, L, ...) replicated
        return jax.lax.all_gather(x[0], AXIS, axis=0)

    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(spec,),
                      out_specs=P(*([None] * (2 + extra_dims))), check_vma=False)
    )


def _unpad_index(partition: np.ndarray, L: int) -> np.ndarray:
    """Flat (n,) indices into a reshaped (S*L, ...) stacked array that pick
    out the valid entries in global order."""
    sizes = partition_sizes(partition)
    return np.concatenate(
        [s * L + np.arange(sz) for s, sz in enumerate(sizes)]
    ).astype(np.int32) if len(sizes) else np.zeros(0, np.int32)


def allgather_full(x: jax.Array, partition: np.ndarray, backend: Backend) -> jax.Array:
    """Stacked shards (S, L, ...) -> replicated full (n, ...) device array."""
    S, L = x.shape[0], x.shape[1]
    gathered = _allgather_fn(backend.mesh, x.ndim - 2)(x)  # (S, L, ...)

    def build():
        idx = _unpad_index(partition, L)
        return jax.device_put(idx, backend.replicated())

    idx = cached_plan("unpad_index", (partition_hash(partition), L, backend.key), build)
    flat = gathered.reshape((S * L,) + x.shape[2:])
    return jnp.take(flat, idx, axis=0)


def scatter_from_full(arr: jax.Array, partition: np.ndarray,
                      backend: Backend) -> jax.Array:
    """Replicated full (n, ...) device array -> stacked shards (S, L, ...)
    with zero padding — the inverse of :func:`allgather_full`, entirely on
    device (no host round-trip)."""
    from ..partition import padded_size

    L = padded_size(partition)
    S = nshards_of(partition)

    def build():
        idx = _unpad_index(partition, L)
        return jax.device_put(idx, backend.replicated())

    idx = cached_plan("unpad_index", (partition_hash(partition), L, backend.key),
                      build)
    flat = jnp.zeros((S * L,) + arr.shape[1:], arr.dtype).at[idx].set(arr)
    return jax.device_put(flat.reshape((S, L) + arr.shape[1:]),
                          backend.row_sharding())


def gather_to_host(x: jax.Array, partition: np.ndarray) -> np.ndarray:
    """Host copy of the full (unpadded) array in global order."""
    arr = np.asarray(x)
    sizes = partition_sizes(partition)
    return np.concatenate([arr[s, : sizes[s]] for s in range(nshards_of(partition))], axis=0)

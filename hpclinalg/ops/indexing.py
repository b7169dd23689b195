"""Indexing for distributed vectors (matrix indexing lives alongside the
matrix types; see sparse/dense modules).

Mirrors /root/reference/src/indexing.jl: range getindex (:79), fancy
indexing with distributed integer index vectors (:1339), setindex! variants
(:1871-4362). Scalar indexing is deliberately unsupported, exactly as the
reference removed it to prevent rank divergence (indexing.jl:17-21) — here
it would force a device sync per element, the moral equivalent.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan
from ..hashing import _h, partition_hash
from ..partition import (
    nshards_of,
    partition_sizes,
    uniform_partition,
    validate_partition,
)
from .gather import gather_exchange_plan, scatter_exchange_plan


def _normalize_slice(key: slice, n: int) -> tuple[int, int, int]:
    start, stop, step = key.indices(n)
    if step <= 0:
        raise ValueError("negative slice steps are not supported")
    return start, stop, step


def subrange_partition(p: np.ndarray, start: int, stop: int, step: int = 1) -> np.ndarray:
    """Partition induced on the subrange by the parent partition — each shard
    keeps the selected entries it already owns (ref: _compute_subpartition,
    indexing.jl:38)."""
    S = nshards_of(p)
    sizes = np.zeros(S, dtype=np.int64)
    for s in range(S):
        lo, hi = max(start, int(p[s])), min(stop, int(p[s + 1]))
        if lo < hi:
            # count of k in [lo, hi) with (k - start) % step == 0
            first = lo + (-(lo - start)) % step
            sizes[s] = max(0, (hi - 1 - first) // step + 1) if first < hi else 0
    return np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)


def _range_ids(start: int, stop: int, step: int, sub_p: np.ndarray) -> list[np.ndarray]:
    """Global parent ids wanted by each result shard, in local order."""
    all_ids = np.arange(start, stop, step, dtype=np.int64)
    return [all_ids[sub_p[d]: sub_p[d + 1]] for d in range(nshards_of(sub_p))]


def vector_getindex(v, key):
    from ..vector import DistVector

    if isinstance(key, (int, np.integer)):
        raise TypeError(
            "scalar indexing of distributed vectors is unsupported (it would "
            "sync the mesh per element); use slices or index vectors "
            "(design matches reference indexing.jl:17-21)"
        )
    if isinstance(key, slice):
        start, stop, step = _normalize_slice(key, v.n)
        sub_p = subrange_partition(v.partition, start, stop, step)
        wanted = _range_ids(start, stop, step, sub_p)
        from ..partition import padded_size

        def build():
            return gather_exchange_plan(v.backend, v.partition, wanted,
                                        out_len=padded_size(sub_p))

        plan = cached_plan(
            "vec_getindex",
            (v.partition_hash, start, stop, step, v.backend.key),
            build,
        )
        return DistVector(plan.apply(v.data), sub_p, v.backend)
    if isinstance(key, DistVector):
        idx_host = np.asarray(v_to_int_host(key))
        check_ids_bounds(idx_host, v.n)
        wanted = [
            idx_host[key.partition[d]: key.partition[d + 1]]
            for d in range(nshards_of(key.partition))
        ]
        from ..partition import padded_size

        def build():
            return gather_exchange_plan(v.backend, v.partition, wanted,
                                        out_len=padded_size(key.partition))

        plan = cached_plan(
            "vec_fancy_getindex",
            (v.partition_hash, key.partition_hash, _h(idx_host), v.backend.key),
            build,
        )
        return DistVector(plan.apply(v.data), key.partition.copy(), v.backend)
    if isinstance(key, (list, np.ndarray)):
        idx = np.asarray(key, dtype=np.int64)
        check_ids_bounds(idx, v.n)
        backend = v.backend
        sub_p = uniform_partition(len(idx), backend.nshards)
        wanted = [idx[sub_p[d]: sub_p[d + 1]] for d in range(nshards_of(sub_p))]
        from ..partition import padded_size

        plan = cached_plan(
            "vec_fancy_getindex",
            (v.partition_hash, _h(idx), backend.key),
            lambda: gather_exchange_plan(backend, v.partition, wanted,
                                         out_len=padded_size(sub_p)),
        )
        return DistVector(plan.apply(v.data), sub_p, backend)
    raise TypeError(f"unsupported index type {type(key)}")


def check_ids_bounds(ids: np.ndarray, n: int) -> None:
    """Fancy ids must be in [0, n): OOB/negative ids map to no owner shard
    and would silently read zeros (gather) or drop writes (scatter)."""
    if len(ids) and (ids.min() < 0 or ids.max() >= n):
        bad = ids[(ids < 0) | (ids >= n)][0]
        raise IndexError(f"index {bad} out of bounds for size {n}")


def v_to_int_host(key) -> np.ndarray:
    """Replicate a distributed integer index vector to host (ref:
    _gather_vector_to_all, indexing.jl:1821)."""
    arr = key.to_numpy_ro()
    if not np.issubdtype(arr.dtype, np.integer):
        if np.issubdtype(arr.dtype, np.complexfloating):
            arr = arr.real  # index vectors on a complex backend store Re+0j
        # rint, not truncation: ids computed in floating point carry
        # roundoff (2.9999999999999996 must select 3, not 2)
        arr = np.rint(arr).astype(np.int64)
    return arr


def vector_setindex(v, key, value):
    """In-place ranged/fancy setindex (ref: indexing.jl:1871-...). Mutates
    the wrapper by swapping its device array."""
    from ..vector import DistVector
    import jax.numpy as jnp

    if isinstance(key, slice):
        start, stop, step = _normalize_slice(key, v.n)
        ids = np.arange(start, stop, step, dtype=np.int64)
    elif isinstance(key, DistVector):
        ids = v_to_int_host(key)
    elif isinstance(key, (list, np.ndarray)):
        ids = np.asarray(key, dtype=np.int64)
    else:
        raise TypeError(f"unsupported index type {type(key)}")
    check_ids_bounds(ids, v.n)

    if np.isscalar(value) or isinstance(value, (int, float, complex)):
        src = DistVector.from_global(
            np.full(len(ids), value), v.backend, dtype=v.dtype
        )
    elif isinstance(value, DistVector):
        src = value
    else:
        src = DistVector.from_global(np.asarray(value), v.backend, dtype=v.dtype)
    if len(src) != len(ids):
        raise ValueError("value length must match index count")

    if len(ids) and len(np.unique(ids)) != len(ids):
        # last-write-wins on duplicate indices (Julia setindex! semantics);
        # ExchangePlan requires unique scatter positions per shard, and JAX
        # scatter-set leaves duplicate-index winners unspecified
        _, first_in_rev = np.unique(ids[::-1], return_index=True)
        keep = np.sort(len(ids) - 1 - first_in_rev)
        ids = ids[keep]
        src = src[keep]

    sp = src.partition
    dst_global = [ids[sp[s]: sp[s + 1]] for s in range(nshards_of(sp))]
    plan = cached_plan(
        "vec_setindex",
        (v.partition_hash, src.partition_hash, _h(ids), v.backend.key),
        lambda: scatter_exchange_plan(v.backend, sp, dst_global, v.partition),
    )
    v.data = plan.apply(src.data.astype(v.dtype), base=v.data)

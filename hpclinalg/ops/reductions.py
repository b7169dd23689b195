"""Row/column reductions over distributed sparse matrices.

Reference: norms/reductions (sparse.jl:2172-2244), sum(dims) (sparse.jl:
2586), maximum/minimum/mean (sparse.jl:2650-2678), tr (sparse.jl:2723).
Row-wise reductions are purely local segment sums; column-wise reductions
reduce into the compressed column space locally and then scatter-ADD to the
column owners — the owner-computes psum pattern (SURVEY.md §2.3 item 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..partition import padded_size


from functools import lru_cache, partial


@lru_cache(maxsize=None)
def _segsum_rows_fn(Lrow: int):
    # one compiled kernel per Lrow — a per-call closure would recompile
    # every reduction (opnorm in a loop pays a remote compile per step)
    @jax.jit
    def run(vals, ri):
        return jax.vmap(partial(jax.ops.segment_sum, num_segments=Lrow,
                                indices_are_sorted=True))(vals, ri)

    return run


@lru_cache(maxsize=None)
def _segsum_cols_fn(Gpad: int):
    @jax.jit
    def run(vals, cv):
        return jax.vmap(partial(jax.ops.segment_sum, num_segments=Gpad))(
            vals, cv)

    return run


def _row_reduce(A, vals):
    from ..vector import DistVector

    st = A.structure
    y = _segsum_rows_fn(st.Lrow)(vals, st.row_ids_dev)
    return DistVector(y, st.row_partition, A.backend)


def row_sum(A):
    return _row_reduce(A, A.nzval)


def row_abs_sum(A):
    return _row_reduce(A, jnp.abs(A.nzval))


def _col_reduce(A, vals):
    from ..vector import DistVector

    st = A.structure

    partial_ = _segsum_cols_fn(st.Gpad)(vals, st.colval_dev)

    def build():
        # src "partition" is positional: shard s holds len(col_indices[s])
        # partial sums at slots 0.., destined to global col ids col_indices[s]
        return scatter_exchange_plan_positional(A)

    plan = cached_plan("colsum_plan", (A.hash, A.backend.key), build)
    y = plan.apply(partial_, add=True)
    return DistVector(y, st.col_partition, A.backend)


def scatter_exchange_plan_positional(A):
    """Positional scatter of per-shard partial sums to the owners of the
    global column ids — exactly gather.py's scatter contract."""
    from .gather import scatter_exchange_plan

    st = A.structure
    return scatter_exchange_plan(A.backend, st.row_partition,
                                 st.col_indices, st.col_partition)


def col_sum(A):
    return _col_reduce(A, A.nzval)


def col_abs_sum(A):
    return _col_reduce(A, jnp.abs(A.nzval))


def trace(A):
    """tr(A) (ref sparse.jl:2723)."""
    return A.diag(0).sum()


def _nnz_mask(A):
    st = A.structure
    return st.row_ids_dev < st.Lrow


def maximum(A):
    """max over ALL entries incl. implicit zeros when the matrix is not full
    (ref sparse.jl:2650-2678 semantics)."""
    import jax.numpy as jnp

    m = _nnz_mask(A)
    stored = jnp.max(jnp.where(m, A.nzval, -jnp.inf))
    full = A.nnz() == A.m * A.ncols
    return stored if full else jnp.maximum(stored, jnp.zeros((), A.dtype))


def minimum(A):
    import jax.numpy as jnp

    m = _nnz_mask(A)
    stored = jnp.min(jnp.where(m, A.nzval, jnp.inf))
    full = A.nnz() == A.m * A.ncols
    return stored if full else jnp.minimum(stored, jnp.zeros((), A.dtype))


def mean(A):
    """Mean over all m*n entries (implicit zeros count)."""
    import jax.numpy as jnp

    return jnp.sum(A.nzval) / (A.m * A.ncols)

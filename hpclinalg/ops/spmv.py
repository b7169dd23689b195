"""SpMV: distributed sparse matrix × vector — the hottest path.

Reference call stack (SURVEY.md §3.1): ``get_vector_plan`` memoized on
(hash(A), hash(x)) builds the halo-gather handshake (sparse.jl:1875-1992),
``execute_plan!`` moves x values point-to-point (vectors.jl:394-463), then a
KernelAbstractions CSR kernel computes y (sparse.jl:2055-2084).

Here: the gather is a cached static ExchangePlan delivering
``x[col_indices[s]]`` into each shard's gathered buffer; the local kernel is
a vmapped masked segmented reduction that XLA lowers per shard. Padding
contract: gathered slot ``len(col_indices[s])`` is guaranteed zero and all
padding colval entries point there; padding row ids point at row Lrow which
``segment_sum`` drops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..parallel.exchange import ExchangePlan
from .gather import gather_exchange_plan


def get_vector_plan(A, x) -> ExchangePlan:
    """Memoized gather plan for x[A.col_indices] (ref: get_vector_plan,
    sparse.jl:1992)."""
    key = (A.hash, x.partition_hash, A.backend.key)
    return cached_plan(
        "vector_plan",
        key,
        lambda: gather_exchange_plan(
            A.backend, x.partition, A.structure.col_indices, out_len=A.structure.Gpad
        ),
    )


@partial(jax.jit, static_argnums=(4,))
def _local_spmv(nzval, colval, row_ids, gathered, Lrow):
    """Per-shard CSR SpMV as gather + segment-sum (ref kernel: _spmv_kernel!,
    sparse.jl:2055)."""

    def one(nz, cv, ri, g):
        contrib = nz * jnp.take(g, cv, axis=0)
        return jax.ops.segment_sum(contrib, ri, num_segments=Lrow,
                                   indices_are_sorted=True)

    return jax.vmap(one)(nzval, colval, row_ids, gathered)


def matvec(A, x):
    """y = A @ x (ref: Base.:*(A::HPCSparseMatrix, x::HPCVector),
    sparse.jl:2096-2128)."""
    from ..vector import DistVector

    if len(x) != A.ncols:
        raise ValueError(f"dimension mismatch: A is {A.shape}, x has {len(x)}")
    st = A.structure
    plan = get_vector_plan(A, x)
    gathered = plan.apply(x.data)  # (S, Gpad)
    y = _local_spmv(A.nzval, st.colval_dev, st.row_ids_dev, gathered, st.Lrow)
    return DistVector(y, st.row_partition, A.backend)

"""Mixed sparse×dense products.

The reference implements these column-by-column over B[:,k] and documents
the design as known-slow (/root/reference/src/sparse.jl:2391-2424,
3617-3689; dense.jl:1286-1308). The TPU build does better: a sparse×dense
product is ONE gather of the needed B rows (the same ExchangePlan as SpMV,
carrying (k,) row payloads) followed by a segment-sum — the multi-column
generalization of SpMV, executed entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cache import cached_plan
from .gather import gather_exchange_plan


def _get_row_gather_plan(A, B):
    """Gather B's rows indexed by A.col_indices (keyed like get_vector_plan)."""
    key = (A.hash, B.row_partition_hash, "rows", A.backend.key)
    return cached_plan(
        "vector_plan", key,
        lambda: gather_exchange_plan(A.backend, B.row_partition,
                                     A.structure.col_indices,
                                     out_len=A.structure.Gpad),
    )


from functools import partial


@partial(jax.jit, static_argnums=(4,))
def _spmm_local(nzval, colval, row_ids, gathered, Lrow):
    def one(nz, cv, ri, g):
        contrib = nz[:, None] * jnp.take(g, cv, axis=0)  # (nnz, k)
        return jax.ops.segment_sum(contrib, ri, num_segments=Lrow,
                                   indices_are_sorted=True)

    return jax.vmap(one)(nzval, colval, row_ids, gathered)


def sparse_times_dense(A, B):
    """C = A_sp @ B_dn (ref sparse.jl:2391-2424, redesigned)."""
    from ..dense import DistDenseMatrix

    if A.ncols != B.m:
        raise ValueError("dimension mismatch")
    st = A.structure
    plan = _get_row_gather_plan(A, B)
    gathered = plan.apply(B.data)  # (S, Gpad, k)
    C = _spmm_local(A.nzval, st.colval_dev, st.row_ids_dev, gathered, st.Lrow)
    return DistDenseMatrix(C, st.row_partition, B.ncols, A.backend)


def dense_times_sparse(A, B):
    """C = A_dn @ B_sp = (Bᵀ @ Aᵀ)ᵀ via the cached sparse transpose and the
    fast sparse×dense kernel (ref dense.jl:1286-1308, redesigned)."""
    if A.ncols != B.m:
        raise ValueError("dimension mismatch")
    Bt = B.transpose_materialized()
    At = A.transpose_materialized()
    Ct = sparse_times_dense(Bt, At)
    return Ct.transpose_materialized()

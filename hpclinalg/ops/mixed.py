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
import numpy as np

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


from functools import lru_cache, partial


@partial(jax.jit, static_argnums=(4,))
def _spmm_local(nzval, colval, row_ids, gathered, Lrow):
    def one(nz, cv, ri, g):
        contrib = nz[:, None] * jnp.take(g, cv, axis=0)  # (nnz, k)
        return jax.ops.segment_sum(contrib, ri, num_segments=Lrow,
                                   indices_are_sorted=True)

    return jax.vmap(one)(nzval, colval, row_ids, gathered)


@lru_cache(maxsize=None)
def _dia_spmm_exec(offsets: tuple, Lrow: int, bias_lo: int, bias_hi: int,
                   pad_to: int = 0):
    """DIA engine for row payloads: C[:, r, :] = Σ_o dval[:,o,r,None] *
    gathered[:, r+o, :] — the multi-column generalization of the SpMV
    stencil kernel, still free of gathers/scatters."""

    @jax.jit
    def run(dval, gathered):
        if pad_to:
            L = gathered.shape[1]
            if pad_to < L:
                gathered = gathered[:, :pad_to]
            elif pad_to > L:
                gathered = jnp.pad(gathered, ((0, 0), (0, pad_to - L), (0, 0)))
        dt = jnp.result_type(dval.dtype, gathered.dtype)
        dval = dval.astype(dt)
        gathered = gathered.astype(dt)
        gp = jnp.pad(gathered, ((0, 0), (bias_lo, bias_hi), (0, 0))) \
            if (bias_lo or bias_hi) else gathered
        S, _, k = gathered.shape
        y = jnp.zeros((S, Lrow, k), dt)
        for i, o in enumerate(offsets):
            xs = jax.lax.slice(gp, (0, bias_lo + o, 0), (S, bias_lo + o + Lrow, k))
            y = y + dval[:, i, :, None] * xs
        return y

    return run


def sparse_times_dense(A, B):
    """C = A_sp @ B_dn (ref sparse.jl:2391-2424, redesigned: one row-payload
    gather + stencil/segment kernel instead of column-by-column SpMVs)."""
    from ..dense import DistDenseMatrix
    from .spmv import SpMVPlan, _dia_values
    from ..cache import cached_plan

    if A.ncols != B.m:
        raise ValueError("dimension mismatch")
    st = A.structure

    def build():
        exchange = _get_row_gather_plan(A, B)
        return SpMVPlan(A, B.row_partition_hash, exchange)

    plan = cached_plan("spmm_plan", (A.hash, B.row_partition_hash, A.backend.key),
                       build)
    if plan.offsets is not None:
        dval = _dia_values(A, plan)
        if plan.exchange.is_identity:
            C = _dia_spmm_exec(plan.offsets, st.Lrow, plan.bias_lo, plan.bias_hi,
                               pad_to=plan.exchange.out_pad)(dval, B.data)
        else:
            gathered = plan.exchange.apply(B.data)
            C = _dia_spmm_exec(plan.offsets, st.Lrow, plan.bias_lo,
                               plan.bias_hi)(dval, gathered)
    elif plan.densify:
        from .spmv import _dense_block

        blk = _dense_block(A, plan)
        gathered = B.data if plan.exchange.is_identity \
            else plan.exchange.apply(B.data)
        dt = jnp.result_type(blk.dtype, gathered.dtype)
        G = blk.shape[-1]
        if gathered.shape[1] < G:
            gathered = jnp.pad(
                gathered, ((0, 0), (0, G - gathered.shape[1]), (0, 0)))
        C = jnp.einsum("slg,sgk->slk", blk.astype(dt),
                       gathered[:, :G].astype(dt),
                       precision=jax.lax.Precision.HIGHEST)
    elif plan.ell:
        from .spmv import _ell_apply

        C = _ell_apply(A, plan, B.data, spmm=True)
    else:
        gathered = plan.exchange.apply(B.data)  # (S, Gpad, k)
        C = _spmm_local(A.nzval, st.colval_dev, st.row_ids_dev, gathered, st.Lrow)
    return DistDenseMatrix(C, st.row_partition, B.ncols, A.backend)


# dense×sparse densify gate: replicate B as a dense (m, k) block when it
# fits (elements). A (mA, nB) dense A already exists, so an (nB, kB)
# replicated block is affordable for every realistic dense×sparse shape.
DXS_DENSIFY_MAX_ELEMS = 1 << 25


@lru_cache(maxsize=None)
def _densify_matmat(nB: int, kB: int):
    @jax.jit
    def run(Adata, vals, flat):
        dt = jnp.result_type(Adata.dtype, vals.dtype)
        Bd = jnp.zeros((nB * kB,), dt).at[flat].add(
            vals.astype(dt), mode="drop").reshape(nB, kB)
        return jnp.einsum("slg,gk->slk", Adata.astype(dt), Bd,
                          precision=jax.lax.Precision.HIGHEST)

    return run


def dense_times_sparse(A, B):
    """C = A_dn @ B_sp (ref dense.jl:1286-1308, column-by-column there).

    Redesigned as ONE collective: allgather B's nonzeros (O(nnz) traffic),
    scatter them into a replicated dense (m, k) block on device, and run a
    single MXU einsum against the local A rows — owner-computes on C with
    zero transposes (each shard does exactly its nnz·Lrow_A share of the
    FLOPs). Falls back to (Bᵀ @ Aᵀ)ᵀ through the cached sparse transpose
    when B is too large to replicate densely."""
    if A.ncols != B.m:
        raise ValueError("dimension mismatch")
    if B.m * B.ncols <= DXS_DENSIFY_MAX_ELEMS:
        from ..dense import DistDenseMatrix
        from ..parallel.mesh import allgather_full

        st = B.structure
        be = B.backend

        def build():
            idx = []
            for s in range(be.nshards):
                r0 = int(st.row_partition[s])
                counts = np.diff(st.indptr[s])
                rows = np.repeat(
                    np.arange(len(counts), dtype=np.int64) + r0, counts)
                cols = st.col_indices[s][st.colval[s]]
                idx.append(rows * B.ncols + cols)
            flat = (np.concatenate(idx) if idx
                    else np.zeros(0, np.int64)).astype(np.int32)
            nnzb = np.concatenate(
                [[0], np.cumsum(st.nnz_local)]).astype(np.int64)
            return jax.device_put(flat, be.replicated()), nnzb

        flat, nnzb = cached_plan("dxs_densify", (st.hash, be.key), build)
        vals = allgather_full(B.nzval, nnzb, be)
        C = _densify_matmat(B.m, B.ncols)(A.data, vals, flat)
        return DistDenseMatrix(C, A.row_partition, B.ncols, be)
    Bt = B.transpose_materialized()
    At = A.transpose_materialized()
    Ct = sparse_times_dense(Bt, At)
    return Ct.transpose_materialized()

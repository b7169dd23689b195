"""Pallas TPU kernel for general-sparsity (non-stencil) SpMV.

The role the reference fills with its KernelAbstractions CSR kernel
(_spmv_kernel!, /root/reference/src/sparse.jl:2055). On TPU the hard part
is the x-gather: there is no hardware vector-gather, so the XLA fallback
(take + segment_sum) runs at ~150M elem/s. This kernel reformulates the
shard's CSR as ELL (rows padded to the max row length W) and keeps the
ENTIRE gathered x buffer resident in VMEM, so the per-element gathers hit
on-chip memory instead of HBM:

    y[i] = sum_w vals[i, w] * x[cols[i, w]]      (padding -> zero slot)

**Mosaic limitation (v5e, jax 0.8)**: the in-kernel gather lowers only as
``tpu.dynamic_gather`` with take_along_axis semantics (2D operand, same-
shape indices, gather along one axis within the other) — there is no
arbitrary large-space vector gather, so ``xg[idx]`` against a ~1M-slot
VMEM buffer does NOT lower. ``ell_available`` therefore returns False on
Mosaic TPUs; the kernel stays interpret-validated (tests/test_engines.py)
as a historical record of the direct formulation.

SUPERSEDED: the deployed general-sparsity engine is the static-shuffle
gather (ops/shuffle_router.py + ops/pallas_shuffle.py +
native/route.cpp), which compiles the gather into lane-gather/transpose
routing passes — 1.14 Gelem/s on the 1M random SpMV, >10x the XLA path.
See docs/shuffle_engine_design.md.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..backend import AXIS

TR = 2048           # rows per grid tile (multiple of 8)
VMEM_X_BYTES = 12 << 20   # max gathered-x bytes held in VMEM
MAX_ELL_BLOWUP = 2.5      # skip patterns where ELL padding explodes storage
MIN_NNZ = 1 << 20         # below this the dispatch floor dominates anyway


def ell_available(backend, st, Gpad: int) -> bool:
    # Mosaic on current TPU generations cannot lower the in-kernel
    # large-space gather (see module docstring) — the kernel is correct
    # (interpret mode) but not deployable; keep the XLA engine in charge.
    return False


def ell_policy_would_accept(backend, st, Gpad: int) -> bool:
    """The deployment policy this kernel will use once Mosaic lowers
    arbitrary gathers: TPU platform, x buffer resident in VMEM, bounded
    ELL padding, enough work to clear the dispatch floor."""
    try:
        platform = backend.mesh.devices.flat[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):  # pltpu kernel: TPU only
        return False
    if Gpad * 4 > VMEM_X_BYTES or st.nnz < MIN_NNZ:
        return False
    W = _ell_width(st)
    return W * int(np.diff(st.row_partition).sum()) <= \
        MAX_ELL_BLOWUP * max(st.nnz, 1)


def _ell_width(st) -> int:
    W = 1
    for s in range(len(st.indptr)):
        if len(st.indptr[s]) > 1:
            W = max(W, int(np.diff(st.indptr[s]).max()))
    return W


def ell_pack(A, plan):
    """(S, Lrow, W) int32 cols (into the gathered buffer; padding -> the
    guaranteed-zero slot) — static per plan — plus the per-instance value
    table, both cached."""
    st = A.structure
    S = A.backend.nshards

    # cache FIRST: _ell_width is an O(total rows) host scan, and it plus
    # zero_slot were previously recomputed on every cache HIT
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    key = ("ell", plan.key)
    hit = cache.get(key)
    if hit is not None:
        return hit

    W = _ell_width(st)
    zero_slot = plan.exchange.out_pad - 1  # guaranteed-zero gathered slot
    cols = np.full((S, st.Lrow, W), zero_slot, dtype=np.int32)
    scat = np.full((S, st.NNZpad), st.Lrow * W, dtype=np.int32)
    for s in range(S):
        ip = st.indptr[s]
        nl = len(ip) - 1
        if not nl:
            continue
        lens = np.diff(ip)
        rows_l = np.repeat(np.arange(nl), lens)
        within = np.arange(len(rows_l)) - np.repeat(ip[:-1], lens)
        cols[s, rows_l, within] = st.colval[s]
        scat[s, : st.nnz_local[s]] = rows_l * W + within
    cols_dev = jax.device_put(cols, A.backend.row_sharding(1))
    # value table: scatter nzval into the same (Lrow, W) slots
    from .spmv import _dia_build

    zeros = jax.device_put(jnp.zeros((S, st.Lrow * W), jnp.float32),
                           A.backend.row_sharding())
    vals_dev = _dia_build(jax.device_put(scat, A.backend.row_sharding()),
                          A.nzval.astype(jnp.float32), zeros)
    vals_dev = vals_dev.reshape(S, st.Lrow, W)
    out = (vals_dev, cols_dev, W)
    cache[key] = out
    return out


@lru_cache(maxsize=None)
def _pallas_ell_fn(Lrow: int, W: int, Gpad: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = -(-Lrow // TR)
    npad = ntiles * TR
    gpad128 = ((Gpad + 127) // 128) * 128

    def kern(vals_ref, cols_ref, x_ref, y_ref):
        xg = x_ref[0, :]                       # (gpad128,) resident in VMEM
        idx = cols_ref[...]                    # (TR, W)
        g = jnp.take(xg, idx, axis=0)          # in-VMEM gather
        y_ref[...] = jnp.sum(vals_ref[...] * g, axis=1)

    @jax.jit
    def run(vals, cols, xb):
        # vals/cols: (1, Lrow, W); xb: (1, Lin) -> y (1, Lrow) f32
        x = xb[0].astype(jnp.float32)
        cur = x.shape[0]
        x = jnp.pad(x, (0, gpad128 - cur)) if cur < gpad128 else x[:gpad128]
        vp = jnp.pad(vals[0], ((0, npad - Lrow), (0, 0))) \
            if npad > Lrow else vals[0]
        cp = jnp.pad(cols[0], ((0, npad - Lrow), (0, 0)),
                     constant_values=Gpad - 1) if npad > Lrow else cols[0]
        y = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((TR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, gpad128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
            interpret=interpret,
        )(vp, cp, x[None, :])
        return y[:Lrow][None]

    return run


@lru_cache(maxsize=None)
def _sharded_ell(fn, mesh):
    body = jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(AXIS, None, None), P(AXIS, None, None),
                                   P(AXIS, None)),
                         out_specs=P(AXIS, None), check_vma=False)
    return jax.jit(body)


def pallas_ell_matvec(A, plan, xb: jax.Array, interpret: bool = False):
    """xb: (S, Lin) gathered (or identity) x block; returns (S, Lrow) f32."""
    st = A.structure
    vals, cols, W = ell_pack(A, plan)
    fn = _pallas_ell_fn(st.Lrow, W, plan.exchange.out_pad, interpret)
    if A.backend.nshards == 1:
        return fn(vals, cols, xb)
    return _sharded_ell(fn, A.backend.mesh)(vals, cols, xb)

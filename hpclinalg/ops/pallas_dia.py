"""Pallas TPU kernel for the DIA/stencil SpMV engine — NOT deployed.

Slope-timed head-to-head on v5e (two-point chained-loop slopes, which
cancel the relay RTT; tools/probe_dia_kernels.py, round 3):

  n=4M 5-pt Laplacian:  XLA DIA 342 us | this kernel 396 us | best
    redesign (flat rank-1 table, manual double-buffered DMA, x read
    once) 333 us | pure table-stream roofline 214 us (450 GB/s — the
    DMA-engine ceiling for this pattern; 2 concurrent DMAs measure the
    same 448 GB/s)
  n=1M chained (the compiled-loop regime of iterative solvers): XLA
    74 us | this kernel 134 us — XLA keeps the loop-invariant dia table
    VMEM-resident across chain iterations; an explicit-DMA kernel
    re-reads it from HBM every call by construction.

Conclusion: the XLA DIA engine wins at every measured size in both
regimes, so it is THE deployed stencil tier and this kernel is gated
off (HPCLINALG_PALLAS_DIA=1 re-enables it for experiments). Earlier
rounds' numbers claiming the opposite came from a subtract-one-RTT-probe
timing scheme that mismeasured sub-ms kernels by up to the full relay
round trip — see bench.py's slope methodology notes.

``interpret=True`` (CPU) backs the automated correctness lane in tests.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..backend import AXIS

TR = 131072  # rows per tile: multiple of 128, sized for ~7 MB of VMEM
# minimum per-shard rows for the kernel's tiling to make sense when it is
# explicitly enabled
MIN_ROWS = 1 << 19


def pallas_available(backend, Lrow: int = MIN_ROWS) -> bool:
    """False unless explicitly enabled: the XLA DIA engine measures
    faster at every size (module docstring). With HPCLINALG_PALLAS_DIA=1,
    gates on an actual TPU platform ('gpu' would dispatch pltpu and fail
    to compile) and f32 operands (callers check the result dtype; see
    ops/spmv.py)."""
    if not os.environ.get("HPCLINALG_PALLAS_DIA"):
        return False
    try:
        platform = backend.mesh.devices.flat[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon") and Lrow >= MIN_ROWS


@lru_cache(maxsize=None)
def _pallas_dia_fn(offsets: tuple, Lrow: int, Lin: int, interpret: bool = False):
    """offsets: static diagonal offsets (gathered-index space); Lrow: output
    rows per shard; Lin: length of the input (x or gathered) buffer.

    The x window of tile i overlaps tile i+1's by the offset span, so it
    cannot ride Pallas's automatic input pipelining (blocks must tile).
    Classic manual double-buffering instead: two VMEM window buffers with
    their own DMA semaphores; iteration i starts the prefetch of window
    i+1 into the other buffer before waiting on its own (VERDICT r2 #6).
    The dval blocks are plain BlockSpec inputs and pipeline automatically.
    (An attempted 'split the window into aligned main+halo blocks and
    concatenate in-kernel' variant was 7x SLOWER — value-land unaligned
    slices of a 130k-element vector generate register shift chains; the
    ref-based pl.ds reads are nearly free.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    minoff, maxoff = min(offsets), max(offsets)
    span = maxoff - minoff
    span_pad = ((span + 1023) // 1024) * 1024  # VMEM slices: 1024-aligned
    ntiles = -(-Lrow // TR)
    npad = ntiles * TR
    O = len(offsets)
    WIN = TR + span_pad

    def kern(dval_ref, xp_ref, y_ref, xw0, xw1, sem0, sem1):
        i = pl.program_id(0)

        def start(j, buf, sem):
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * TR, WIN)], buf, sem).start()

        def finish(j, buf, sem):
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * TR, WIN)], buf, sem).wait()

        def compute(xw):
            acc = jnp.zeros((TR,), jnp.float32)
            for t, o in enumerate(offsets):
                acc = acc + dval_ref[t, :] * xw[pl.ds(o - minoff, TR)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            start(0, xw0, sem0)

        @pl.when(i % 2 == 0)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, xw1, sem1)

            finish(i, xw0, sem0)
            compute(xw0)

        @pl.when(i % 2 == 1)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, xw0, sem0)

            finish(i, xw1, sem1)
            compute(xw1)

    @jax.jit
    def run(dval_pad, xb):
        # dval_pad: (1, O, npad) f32 (pre-padded table); xb: (1, Lin)
        x = xb[0].astype(jnp.float32)
        # xp[j] must equal x[j + minoff]
        if minoff < 0:
            x = jnp.pad(x, (-minoff, 0))
        elif minoff > 0:
            x = x[minoff:]
        need = npad + span_pad
        cur = x.shape[0]
        x = jnp.pad(x, (0, need - cur)) if cur < need else x[:need]
        y = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((WIN,), jnp.float32),
                pltpu.VMEM((WIN,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(dval_pad[0], x)
        return y[:Lrow][None]

    return run, npad


@lru_cache(maxsize=None)
def _pallas_dia_fn_monolithic(offsets: tuple, Lrow: int, Lin: int,
                              interpret: bool = False):
    """Fallback for offset spans wider than a tile (> TR): one manual DMA
    of the whole overlapping window per tile (the original kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    minoff, maxoff = min(offsets), max(offsets)
    span = maxoff - minoff
    span_pad = ((span + 1023) // 1024) * 1024
    ntiles = -(-Lrow // TR)
    npad = ntiles * TR
    O = len(offsets)

    def kern(dval_ref, xp_ref, y_ref):
        i = pl.program_id(0)

        def inner(xw, sem):
            cp = pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * TR, TR + span_pad)], xw, sem)
            cp.start()
            cp.wait()
            acc = jnp.zeros((TR,), jnp.float32)
            for t, o in enumerate(offsets):
                acc = acc + dval_ref[t, :] * xw[pl.ds(o - minoff, TR)]
            y_ref[:] = acc

        pl.run_scoped(inner, xw=pltpu.VMEM((TR + span_pad,), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA)

    @jax.jit
    def run(dval_pad, xb):
        x = xb[0].astype(jnp.float32)
        if minoff < 0:
            x = jnp.pad(x, (-minoff, 0))
        elif minoff > 0:
            x = x[minoff:]
        need = npad + span_pad
        cur = x.shape[0]
        x = jnp.pad(x, (0, need - cur)) if cur < need else x[:need]
        y = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
            interpret=interpret,
        )(dval_pad[0], x)
        return y[:Lrow][None]

    return run, npad


def dia_table_padded(A, plan, npad: int) -> jax.Array:
    """(S, O, npad) f32 table for the Pallas kernel, cached per instance."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    key = ("pallas_dia", plan.key, npad)
    hit = cache.get(key)
    if hit is not None:
        return hit
    from .spmv import _dia_build

    st = A.structure
    S = A.backend.nshards
    O = len(plan.offsets)
    zeros = jax.device_put(jnp.zeros((S, O * npad), jnp.float32),
                           A.backend.row_sharding())
    # dia_scatter indexes an (O, Lrow) layout; re-map into the padded layout
    scat_host = np.asarray(plan.dia_scatter)
    oi, rl = scat_host // st.Lrow, scat_host % st.Lrow
    pad_scat = np.where(scat_host >= O * st.Lrow, O * npad, oi * npad + rl)
    tbl = _dia_build(jax.device_put(pad_scat.astype(np.int32),
                                    A.backend.row_sharding()),
                     A.nzval.astype(jnp.float32), zeros)
    tbl = tbl.reshape(S, O, npad)
    cache[key] = tbl
    return tbl


@lru_cache(maxsize=None)
def _sharded_fn(fn, mesh):
    """Per-shard kernel body wrapped over the mesh: each device runs the
    pallas kernel on its own (1, ...) block of the stacked arrays."""
    body = jax.shard_map(fn, mesh=mesh,
                         in_specs=(P(AXIS, None, None), P(AXIS, None)),
                         out_specs=P(AXIS, None), check_vma=False)
    return jax.jit(body)


def pallas_dia_matvec(A, plan, xb: jax.Array, interpret: bool = False) -> jax.Array:
    """xb: (S, Lin) input block (x itself when the gather is identity, the
    gathered buffer otherwise). Returns (S, Lrow) f32. On multi-shard
    meshes the kernel runs as the per-shard body inside shard_map."""
    st = A.structure
    fn, npad = _pallas_dia_fn(plan.offsets, st.Lrow, int(xb.shape[1]),
                              interpret)
    tbl = dia_table_padded(A, plan, npad)
    if A.backend.nshards == 1:
        return fn(tbl, xb)
    return _sharded_fn(fn, A.backend.mesh)(tbl, xb)

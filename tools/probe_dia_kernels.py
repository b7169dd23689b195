"""DIA kernel design probe (slope-timed, 4M dof, single shard).

Variants:
  v0_current — the shipped double-buffered window kernel (unaligned
               in-VMEM reads via pl.ds)
  v1_aligned — same structure but all compute reads aligned at window
               base (WRONG results; isolates the lane-rotation cost of
               the unaligned reads)
  v2_shift   — one HBM window DMA per tile + O VMEM->VMEM shifted-copy
               DMAs into aligned buffers + aligned compute (x read ONCE
               from HBM; the unalignment is absorbed by the DMA engine)

Timing: two-point slope over chained fori_loop (K2-K1 = 512 iterations)
— cancels relay RTT and dispatch constants; min over rounds kills jitter.

Usage: python tools/probe_dia_kernels.py
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import hpclinalg as hl
    from hpclinalg.ops.pallas_dia import (TR, _pallas_dia_fn,
                                          dia_table_padded)
    from hpclinalg.ops.spmv import _dia_exec, _dia_values, get_spmv_plan

    def lap2d(k):
        T = sp.diags([-1., 2., -1.], [-1, 0, 1], shape=(k, k))
        I = sp.eye(k)
        return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(np.float32)

    def slope_ms(step, x0, K1=64, K2=576, rounds=3):
        def mk(K):
            return jax.jit(lambda v: jax.lax.fori_loop(
                0, K, lambda i, y: step(y), v))
        c1, c2 = mk(K1), mk(K2)
        float(jnp.sum(c1(x0)))
        float(jnp.sum(c2(x0)))
        t1s, t2s = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(jnp.sum(c1(x0)))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(c2(x0)))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (K2 - K1) * 1e3

    k = 2000
    n = k * k
    be = hl.backend_auto(dtype=np.float64)
    A = lap2d(k)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    x = hl.DistVector.from_global(
        np.random.default_rng(1).standard_normal(n), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, x)
    offsets = plan.offsets
    O = len(offsets)
    minoff = min(offsets)
    span = max(offsets) - minoff
    span_pad = ((span + 1023) // 1024) * 1024
    ntiles = -(-Ad.structure.Lrow // TR)
    npad = ntiles * TR
    WIN = TR + span_pad
    traffic = (O + 2) * n * 4

    # ---- v0: shipped kernel --------------------------------------------
    fn, npad0 = _pallas_dia_fn(offsets, Ad.structure.Lrow,
                               int(x.data.shape[1]))
    tbl = dia_table_padded(Ad, plan, npad0) * 0.125
    t0_ = slope_ms(lambda v: fn(tbl, v), x.data)
    print(f"v0_current {t0_*1e3:.1f} us  {traffic/(t0_/1e3)/1e9:.0f} GB/s-eq",
          flush=True)

    # ---- xla engine -----------------------------------------------------
    dval = _dia_values(Ad, plan) * 0.125
    ex = _dia_exec(offsets, Ad.structure.Lrow, plan.bias_lo, plan.bias_hi,
                   pad_to=plan.exchange.out_pad)
    tx = slope_ms(lambda v: ex(dval, v), x.data)
    print(f"xla        {tx*1e3:.1f} us  {traffic/(tx/1e3)/1e9:.0f} GB/s-eq",
          flush=True)

    tbl1 = tbl[0]

    def runner(kern, scratch):
        def run(xb):
            xv = xb[0]
            xp = jnp.pad(xv, (-minoff, npad + span_pad - n + minoff))
            y = pl.pallas_call(
                kern,
                grid=(ntiles,),
                in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
                scratch_shapes=scratch,
            )(tbl1, xp)
            return y[:n][None]
        return run

    # ---- v1: aligned-only compute (wrong results, perf probe) ----------
    def kern1(dval_ref, xp_ref, y_ref, xw0, xw1, sem0, sem1):
        i = pl.program_id(0)

        def start(j, buf, sem):
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * TR, WIN)], buf, sem).start()

        def compute(xw):
            acc = jnp.zeros((TR,), jnp.float32)
            for t in range(O):
                acc = acc + dval_ref[t, :] * xw[pl.ds(0, TR)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            start(0, xw0, sem0)

        @pl.when(i % 2 == 0)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, xw1, sem1)
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * TR, WIN)], xw0, sem0).wait()
            compute(xw0)

        @pl.when(i % 2 == 1)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, xw0, sem0)
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * TR, WIN)], xw1, sem1).wait()
            compute(xw1)

    run1 = runner(kern1, [pltpu.VMEM((WIN,), jnp.float32),
                          pltpu.VMEM((WIN,), jnp.float32),
                          pltpu.SemaphoreType.DMA,
                          pltpu.SemaphoreType.DMA])
    t1_ = slope_ms(run1, x.data)
    print(f"v1_aligned {t1_*1e3:.1f} us  {traffic/(t1_/1e3)/1e9:.0f} GB/s-eq",
          flush=True)

    # ---- v3: pure dval stream (manual flat DMA, no window) -------------
    import jax as _jax

    dflat = jnp.asarray(np.ascontiguousarray(
        np.asarray(tbl1).reshape(O, ntiles, TR).transpose(1, 0, 2)
        ).reshape(-1))  # per-tile contiguous (O*TR) chunks, rank-1 layout

    CH = O * TR

    def kern3(df_ref, c_ref, y_ref, dv0, dv1, sem0, sem1):
        i = pl.program_id(0)

        def start(j, buf, sem):
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH, CH)], buf, sem).start()

        def compute(dv):
            acc = jnp.full((TR,), c_ref[0], jnp.float32)
            for t in range(O):
                acc = acc + dv[pl.ds(t * TR, TR)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            start(0, dv0, sem0)

        @pl.when(i % 2 == 0)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, dv1, sem1)
            pltpu.make_async_copy(
                df_ref.at[pl.ds(i * CH, CH)], dv0, sem0).wait()
            compute(dv0)

        @pl.when(i % 2 == 1)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, dv0, sem0)
            pltpu.make_async_copy(
                df_ref.at[pl.ds(i * CH, CH)], dv1, sem1).wait()
            compute(dv1)

    p3 = pl.pallas_call(
        kern3,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH,), jnp.float32),
                        pltpu.VMEM((CH,), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA])
    t3_ = slope_ms(lambda v: p3(dflat, v[0, :1] * 1e-9)[None][:, :n],
                   x.data)
    st3 = (O + 1) * n * 4 / (t3_ / 1e3) / 1e9
    print(f"v3_stream  {t3_*1e3:.1f} us  {st3:.0f} GB/s actual", flush=True)

    # ---- v4: flat dval + window, both manually double-buffered ---------
    def kern4(df_ref, xp_ref, y_ref, dv0, dv1, xw0, xw1, s0, s1, s2, s3):
        i = pl.program_id(0)

        def startd(j, buf, sem):
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH, CH)], buf, sem).start()

        def startx(j, buf, sem):
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * TR, WIN)], buf, sem).start()

        def compute(dv, xw):
            acc = jnp.zeros((TR,), jnp.float32)
            for t, o in enumerate(offsets):
                acc = acc + dv[pl.ds(t * TR, TR)] * xw[pl.ds(o - minoff,
                                                             TR)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            startd(0, dv0, s0)
            startx(0, xw0, s2)

        @pl.when(i % 2 == 0)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                startd(i + 1, dv1, s1)
                startx(i + 1, xw1, s3)
            pltpu.make_async_copy(
                df_ref.at[pl.ds(i * CH, CH)], dv0, s0).wait()
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * TR, WIN)], xw0, s2).wait()
            compute(dv0, xw0)

        @pl.when(i % 2 == 1)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                startd(i + 1, dv0, s0)
                startx(i + 1, xw0, s2)
            pltpu.make_async_copy(
                df_ref.at[pl.ds(i * CH, CH)], dv1, s1).wait()
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * TR, WIN)], xw1, s3).wait()
            compute(dv1, xw1)

    p4 = pl.pallas_call(
        kern4,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH,), jnp.float32),
                        pltpu.VMEM((CH,), jnp.float32),
                        pltpu.VMEM((WIN,), jnp.float32),
                        pltpu.VMEM((WIN,), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA])

    def run4(xb):
        xv = xb[0]
        xp = jnp.pad(xv, (-minoff, npad + span_pad - n + minoff))
        return p4(dflat, xp)[:n][None]

    t4_ = slope_ms(run4, x.data)
    print(f"v4_flat    {t4_*1e3:.1f} us  {traffic/(t4_/1e3)/1e9:.0f} GB/s-eq",
          flush=True)

    y4 = np.asarray(run4(x.data))[0]
    yx = np.asarray(ex(dval, x.data))[0][:n]
    err = np.abs(y4 - yx).max() / max(np.abs(yx).max(), 1e-30)
    print(f"v4 vs xla rel err: {err:.2e}")


if __name__ == "__main__" and "--ring" not in sys.argv:
    main()


def ring_probe():
    """v5: dval stream with a DEPTH-3 buffer ring and 2 outstanding DMAs
    — does concurrent DMA lift the 450 GB/s single-stream ceiling?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import time
    import hpclinalg as hl
    from hpclinalg.ops.pallas_dia import TR, dia_table_padded, _pallas_dia_fn
    from hpclinalg.ops.spmv import get_spmv_plan
    import scipy.sparse as sp

    def lap2d(k):
        T = sp.diags([-1., 2., -1.], [-1, 0, 1], shape=(k, k))
        I = sp.eye(k)
        return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(np.float32)

    def slope_ms(step, x0, K1=64, K2=576, rounds=3):
        def mk(K):
            return jax.jit(lambda v: jax.lax.fori_loop(
                0, K, lambda i, y: step(y), v))
        c1, c2 = mk(K1), mk(K2)
        float(jnp.sum(c1(x0)))
        float(jnp.sum(c2(x0)))
        t1s, t2s = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(jnp.sum(c1(x0)))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(c2(x0)))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (K2 - K1) * 1e3

    k = 2000
    n = k * k
    be = hl.backend_auto(dtype=np.float64)
    A = lap2d(k)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    x = hl.DistVector.from_global(
        np.random.default_rng(1).standard_normal(n), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, x)
    O = len(plan.offsets)
    ntiles = -(-Ad.structure.Lrow // TR)
    npad = ntiles * TR
    fn0, npad0 = _pallas_dia_fn(plan.offsets, Ad.structure.Lrow,
                                int(x.data.shape[1]))
    tbl = dia_table_padded(Ad, plan, npad0) * 0.125
    tbl1 = tbl[0]
    dflat = jnp.asarray(np.ascontiguousarray(
        np.asarray(tbl1).reshape(O, ntiles, TR).transpose(1, 0, 2)
        ).reshape(-1))
    CH = O * TR
    H = CH // 2  # two concurrent half-DMAs per chunk

    def kern5(df_ref, c_ref, y_ref, dv0, dv1, s0a, s0b, s1a, s1b):
        i = pl.program_id(0)

        def start(j, buf, sa, sb):
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH, H)], buf.at[pl.ds(0, H)],
                sa).start()
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH + H, H)], buf.at[pl.ds(H, H)],
                sb).start()

        def wait(j, buf, sa, sb):
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH, H)], buf.at[pl.ds(0, H)],
                sa).wait()
            pltpu.make_async_copy(
                df_ref.at[pl.ds(j * CH + H, H)], buf.at[pl.ds(H, H)],
                sb).wait()

        def compute(dv):
            acc = jnp.full((TR,), c_ref[0], jnp.float32)
            for t in range(O):
                acc = acc + dv[pl.ds(t * TR, TR)]
            y_ref[:] = acc

        @pl.when(i == 0)
        def _():
            start(0, dv0, s0a, s0b)

        @pl.when(i % 2 == 0)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, dv1, s1a, s1b)
            wait(i, dv0, s0a, s0b)
            compute(dv0)

        @pl.when(i % 2 == 1)
        def _():
            @pl.when(i + 1 < ntiles)
            def _():
                start(i + 1, dv0, s0a, s0b)
            wait(i, dv1, s1a, s1b)
            compute(dv1)

    p5 = pl.pallas_call(
        kern5,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CH,), jnp.float32),
                        pltpu.VMEM((CH,), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA])
    t5 = slope_ms(lambda v: p5(dflat, v[0, :1] * 1e-9)[None][:, :n], x.data)
    print(f"v5_ring3   {t5*1e3:.1f} us  "
          f"{(O+1)*n*4/(t5/1e3)/1e9:.0f} GB/s actual", flush=True)


if __name__ == "__main__" and "--ring" in sys.argv:
    ring_probe()
    sys.exit(0)

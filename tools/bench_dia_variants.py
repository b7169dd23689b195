"""DIA SpMV kernel attribution on the real chip (round-3 stencil push).

Times, at n = 1M and 4M (2D 5-point Laplacian, f32, single shard):

  xla       — the XLA DIA engine (`_dia_exec`), the portable tier
  pallas_db — the shipped double-buffered window kernel (`_pallas_dia_fn`),
              including its in-jit pad/shift epilogue
  pallas_raw— the same kernel's pallas_call ONLY, on a pre-padded x kept
              on device (isolates the pad/astype/slice epilogue cost)
  stream    — a roofline probe: a pallas kernel that only streams the
              (O, TR) dval blocks and writes a per-tile reduction (the
              dominant traffic stream with zero x-window work)

Chained-dispatch timing (K iterations inside one jit via fori_loop) with
relay-RTT subtraction, the bench.py methodology. The chain feeds y back
as x; tables are prescaled by 1/8 so the iterates stay bounded without a
separate scale op polluting the measurement.

Usage: python tools/bench_dia_variants.py [K=64]
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def laplace2d(k, dtype=np.float32):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax
    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.ops.pallas_dia import (TR, _pallas_dia_fn,
                                          dia_table_padded)
    from hpclinalg.ops.spmv import _dia_exec, _dia_values, get_spmv_plan

    be = hl.backend_auto(dtype=np.float64)

    def sync(x):
        float(jnp.sum(x))

    def chain_ms(step, x0, reps=K):
        chain = jax.jit(lambda v: jax.lax.fori_loop(
            0, reps, lambda i, y: step(y), v))
        sync(chain(x0))
        t0 = time.perf_counter()
        sync(chain(x0))
        t1 = time.perf_counter()
        sync(x0)
        rtt = time.perf_counter() - t1
        return max((t1 - t0) - rtt, (t1 - t0) / 2) / reps * 1e3

    for k in (1000, 2000):
        n = k * k
        A = laplace2d(k)
        Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
        x = hl.DistVector.from_global(
            np.random.default_rng(1).standard_normal(n), be,
            dtype=np.float32)
        plan = get_spmv_plan(Ad, x)
        O = len(plan.offsets)
        st = Ad.structure
        res = {"n": n, "O": O}

        # ---- xla tier (prescaled dval: pure engine in the chain) ----
        dval = _dia_values(Ad, plan) * 0.125
        ex = _dia_exec(plan.offsets, st.Lrow, plan.bias_lo, plan.bias_hi,
                       pad_to=plan.exchange.out_pad)
        res["xla_ms"] = round(chain_ms(lambda v: ex(dval, v), x.data), 3)

        # ---- shipped pallas (pad/astype/slice epilogue included) ----
        fn, npad = _pallas_dia_fn(plan.offsets, st.Lrow, int(x.data.shape[1]))
        tbl = dia_table_padded(Ad, plan, npad) * 0.125
        res["pallas_db_ms"] = round(chain_ms(lambda v: fn(tbl, v), x.data), 3)

        # ---- raw pallas_call on a pre-padded persistent x ----
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        offsets = plan.offsets
        minoff = min(offsets)
        span = max(offsets) - minoff
        span_pad = ((span + 1023) // 1024) * 1024
        ntiles = -(-st.Lrow // TR)
        WIN = TR + span_pad

        def kern(dval_ref, xp_ref, y_ref, xw0, xw1, sem0, sem1):
            i = pl.program_id(0)

            def start(j, buf, sem):
                pltpu.make_async_copy(
                    xp_ref.at[pl.ds(j * TR, WIN)], buf, sem).start()

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

        raw = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles * TR,), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((WIN,), jnp.float32),
                pltpu.VMEM((WIN,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        xpad = jnp.pad(x.data[0], (-minoff, ntiles * TR + span_pad
                                   - n - (-minoff)))
        tbl1 = tbl[0]

        def raw_step(v):
            y = raw(tbl1, v)
            # feed back: y has npad length == xpad length - span_pad
            return jnp.pad(y, (0, span_pad))

        res["pallas_raw_ms"] = round(chain_ms(raw_step, xpad), 3)

        # ---- stream roofline: dval blocks only (carry forces the chain
        # dependency without rebuilding the table) ----
        def skern(dval_ref, c_ref, y_ref):
            y_ref[:] = dval_ref[0, :] * 0.125 + c_ref[0]

        stream = pl.pallas_call(
            skern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles * TR,), jnp.float32),
        )
        t = chain_ms(lambda v: stream(tbl1, v[:1] * 1e-8),
                     jnp.zeros((ntiles * TR,), jnp.float32), reps=K)
        res["stream_ms"] = round(t, 3)
        res["stream_gbs"] = round((O + 1) * ntiles * TR * 4 / (t / 1e3)
                                  / 1e9, 1)

        traffic = (O + 2) * n * 4
        for key in ("xla_ms", "pallas_db_ms", "pallas_raw_ms"):
            res[key.replace("_ms", "_gbs")] = round(
                traffic / (res[key] / 1e3) / 1e9, 1)
        print(res, flush=True)


if __name__ == "__main__":
    main()

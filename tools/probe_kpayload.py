"""Microbenchmark: the (k, 128) column-payload masked-pass primitive.

Decides the random-SpMM shuffle-k tier design (VERDICT r4 item 3): a
k-wide payload tile moves whole (k,) columns with ONE lane-gather (no
transposes, no banks — duplicates and arbitrary lane maps are free).
Reordering 8M emissions from source to dest order needs a radix exchange
of L levels with fan F; per output tile each level costs F masked passes
(gather + select). This probe measures the REAL per-pass cost on the VPU
so the level/fan budget — and whether >=25 Gelem/s is reachable — is
arithmetic, not guesswork.

    python tools/probe_kpayload.py [k=64] [F=8] [ntiles=4096]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ntiles = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    rng = np.random.default_rng(0)
    src = rng.standard_normal((ntiles, F, k, LANES)).astype(np.float32)
    idx = rng.integers(0, LANES, (ntiles, 1, LANES)).astype(np.int8)
    sel = rng.integers(0, F, (ntiles, 1, LANES)).astype(np.uint8)

    def kern(idx_ref, sel_ref, src_ref, out_ref):
        ib = jnp.broadcast_to(idx_ref[0, 0].astype(jnp.int32)[None],
                              (k, LANES))
        sl = jnp.broadcast_to(sel_ref[0, 0].astype(jnp.int32)[None],
                              (k, LANES))
        acc = jnp.zeros((k, LANES), jnp.float32)
        for f in range(F):
            g = jnp.take_along_axis(src_ref[0, f], ib, axis=1)
            acc = jnp.where(sl == f, g, acc)
        out_ref[0] = acc

    @jax.jit
    def run(idx, sel, src):
        return pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, k, LANES), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, k, LANES), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles, k, LANES), jnp.float32),
        )(idx, sel, src)

    d = (jnp.asarray(idx), jnp.asarray(sel), jnp.asarray(src))
    out = run(*d)
    float(jnp.sum(out))  # sync

    # slope timing: K chained runs vs 1
    def timed(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = run(*d)
        float(jnp.sum(o))
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(3))
    t5 = min(timed(5) for _ in range(3))
    per = (t5 - t1) / 4
    emis = ntiles * LANES
    elems = emis * k
    gbs = (src.nbytes + out.nbytes) / per / 1e9
    cyc = per * 940e6
    print(f"k={k} F={F} ntiles={ntiles}: {per*1e3:.3f} ms/pass-set  "
          f"{elems/per/1e9:.1f} Gelem/s(level)  {gbs:.0f} GB/s  "
          f"{cyc/ntiles:.0f} cyc/tile ({cyc/ntiles/F:.1f}/pass)")
    # level-throughput -> end-to-end estimate for levels L covering 64k
    # dest tiles: total time = L * (this) scaled by (65536/ntiles)
    import math
    L = max(1, math.ceil(math.log(65536) / math.log(max(F, 2))))
    est = per * (65536 / ntiles) * L
    print(f"  -> {L} levels over 64k tiles: ~{est*1e3:.0f} ms reorder; "
          f"8M x {k} = {8e6*k/est/1e9:.1f} Gelem/s end-to-end bound")


if __name__ == "__main__":
    main()

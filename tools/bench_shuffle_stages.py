"""Per-stage timing of the shuffle SpMV pipeline on the real chip:
kernel A (expand+bin), B1 (re-bin), B2 (placement), and the fused
pipeline, each slope-timed. Pinpoints which stage to diet.

Usage: python tools/bench_shuffle_stages.py [n=1000000] [W=8]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(fn, sync, N1=8, N2=40, rounds=3):
    sync(fn())

    def run(N):
        t0 = time.perf_counter()
        out = None
        for _ in range(N):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t1s, t2s = [], []
    for _ in range(rounds):
        t1s.append(run(N1))
        t2s.append(run(N2))
    return (min(t2s) - min(t1s)) / (N2 - N1) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from hpclinalg.ops.pallas_shuffle import (PackedRoute, _ceil,
                                              _shuffle_fns)
    from hpclinalg.ops.shuffle_router import LANES

    rng = np.random.default_rng(1)
    nb = _ceil(n, LANES)
    src = rng.integers(0, n, (nb * LANES, W)).astype(np.int64)
    src[n:] = -1
    src = np.ascontiguousarray(
        src.reshape(nb, LANES, W).transpose(0, 2, 1)).reshape(-1)
    t0 = time.time()
    packed = PackedRoute.from_native(src, n)
    print(f"route build {time.time() - t0:.1f}s  "
          f"tables {packed.table_bytes() / 1e6:.1f} MB", file=sys.stderr)

    nrow_x = _ceil(packed.plan.nsrc, LANES) + LANES
    key = (packed.n_sc, packed.gamma, packed.cpg, packed.RAu, packed.TP_A,
           packed.nsub, packed.RBu, packed.TP_B, packed.PS, nrow_x,
           packed.KAe, packed.KB1e, packed.KB2e)
    run_a, run_b1, run_b2 = _shuffle_fns(
        key, tuple(packed.A_live), tuple(packed.B1_live),
        tuple(packed.B2_live))

    x = jnp.asarray(rng.standard_normal(nrow_x * LANES), jnp.float32)
    x2 = x.reshape(nrow_x, LANES)

    def sync(out):
        float(jnp.sum(jnp.abs(out)))

    ta = slope_ms(lambda: run_a((packed.win, packed.win_rel, packed.M,
                                 packed.SA, packed.A_rel, packed.A_sel),
                                x2), sync)
    aout = run_a((packed.win, packed.win_rel, packed.M, packed.SA,
                  packed.A_rel, packed.A_sel), x2)
    tb1 = slope_ms(lambda: run_b1(packed.S1, packed.B1_rel, packed.B1_sel,
                                  aout), sync)
    staging = run_b1(packed.S1, packed.B1_rel, packed.B1_sel, aout)
    tb2 = slope_ms(lambda: run_b2(packed.S2, packed.B2_rel, packed.B2_sel,
                                  staging), sync)
    print(f"A={ta:.2f}ms B1={tb1:.2f}ms B2={tb2:.2f}ms "
          f"sum={ta + tb1 + tb2:.2f}ms")
    print(f"geom n_sc={packed.n_sc} gamma={packed.gamma} cpg={packed.cpg} "
          f"RAu={packed.RAu} nsub={packed.nsub} RBu={packed.RBu} "
          f"TP_A={packed.TP_A} TP_B={packed.TP_B} PS={packed.PS} "
          f"live A/B1/B2 = {len(packed.A_live)}/{len(packed.B1_live)}/"
          f"{len(packed.B2_live)}")


if __name__ == "__main__":
    main()

"""Ablation probe: why the deployed SpMM tier (107 ms) is 2.5x slower
than the bare XLA row-gather (43 ms, probe_spmm_variants.py).

Replicates `ops/spmv.py:_ell_spmm_exec` at the bench geometry (S=1,
n=1M, W=8, k=64, no tail) and ablates one ingredient at a time:

  deployed   vmap(S=1) + _ub(pad(astype(g))) + _ub(take)   (the real path)
  no_ub_take drop the barrier on the gather result
  no_ub_all  drop both barriers
  no_vmap    squeeze the S=1 batch dim (plain take, keep barriers)
  no_pad     skip the pad/astype producer copy

Usage: python tools/probe_spmm_deployed.py [n=1000000] [k=64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    W = 8
    import jax
    import jax.numpy as jnp
    from hpclinalg.ops.spmv import _ub, _pad_trunc

    Lrow = -(-n // 8) * 8
    pad_to = -(-n // 128) * 128 + 128     # Gpad-ish: pad + astype producer

    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, (1, Lrow * W)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((1, Lrow, W)).astype(np.float32))
    G = jnp.asarray(rng.standard_normal((1, n, k)).astype(np.float32))

    def make(ub_take, ub_prod, use_vmap, do_pad, use_stack=False):
        idf = lambda a: a

        ubt = _ub if ub_take else idf
        ubp = _ub if ub_prod else idf

        def one(v, c, g):
            gr = ubt(jnp.take(g, c, axis=0)).reshape(Lrow, W, k)
            return jnp.sum(v[:, :, None] * gr, axis=1)

        def run(vals, cols, g):
            if do_pad:
                g = ubp(_pad_trunc(g, pad_to).astype(jnp.float32))
            if use_vmap:
                return jax.vmap(one)(vals, cols, g)
            if use_stack:
                return jnp.stack(
                    [one(vals[s], cols[s], g[s]) for s in range(1)])
            return one(vals[0], cols[0], g[0])[None]

        return jax.jit(run)

    def timeit(f, *args):
        o = f(*args)
        jax.block_until_ready(o)
        float(jnp.sum(o))

        def chain(K):
            t0 = time.perf_counter()
            oo = None
            for _ in range(K):
                oo = f(*args)
            float(jnp.sum(oo))
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(2))
        t3 = min(chain(3) for _ in range(2))
        return (t3 - t1) / 2 * 1e3

    for name, kw in [
        ("deployed", dict(ub_take=True, ub_prod=True, use_vmap=True, do_pad=True)),
        ("no_ub_take", dict(ub_take=False, ub_prod=True, use_vmap=True, do_pad=True)),
        ("no_ub_all", dict(ub_take=False, ub_prod=False, use_vmap=True, do_pad=True)),
        ("no_vmap", dict(ub_take=True, ub_prod=True, use_vmap=False, do_pad=True)),
        ("no_pad", dict(ub_take=True, ub_prod=True, use_vmap=True, do_pad=False)),
        ("bare", dict(ub_take=False, ub_prod=False, use_vmap=False, do_pad=False)),
        ("noub_novmap", dict(ub_take=False, ub_prod=True, use_vmap=False, do_pad=True)),
        ("noub_stack", dict(ub_take=False, ub_prod=True, use_vmap=False,
                            do_pad=True, use_stack=True)),
    ]:
        try:
            ms = timeit(make(**kw), vals, cols, G)
            gel = n * W * k / (ms / 1e3) / 1e9
            print(f"{name:10s} {ms:8.2f} ms   {gel:6.2f} Gelem/s")
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()

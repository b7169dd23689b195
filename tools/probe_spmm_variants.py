"""Quick A/B probe: XLA-level variants of the random-SpMM row gather.

The deployed SpMM tier (`ops/spmv.py:_ell_spmm_exec`) is an XLA row
gather `take(G(n,k), cols, axis=0)` measured ~190 M rows/s — issue-bound,
not bandwidth-bound. Before committing to the Pallas shuffle-k tier
(tools/probe_kpayload.py), measure the cheap XLA levers on the real
workload (n=1M, 8 nnz/row, k=64):

  base    take(G, cols, axis=0) f32              (the deployed tier)
  bf16    gather a bf16 copy of G, f32 accumulate (halves gather bytes)
  lanes_t take(G.T (k,n), cols, axis=1)          (lane-dim gather, k sublanes)
  split8  8 gathers of (n, 8) slabs               (smaller rows, more issues)

Usage: python tools/probe_spmm_variants.py [n=1000000] [k=64]
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

    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, (n, W)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((n, W)).astype(np.float32))
    G = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    Gb = G.astype(jnp.bfloat16)
    Gt = jnp.array(G.T)

    def base(G, cols, vals):
        gr = jnp.take(G, cols.reshape(-1), axis=0).reshape(n, W, k)
        return jnp.sum(vals[:, :, None] * gr, axis=1)

    def bf16(Gb, cols, vals):
        gr = jnp.take(Gb, cols.reshape(-1), axis=0).reshape(n, W, k)
        return jnp.sum(vals[:, :, None] * gr.astype(jnp.float32), axis=1)

    def lanes_t(Gt, cols, vals):
        gr = jnp.take(Gt, cols.reshape(-1), axis=1)      # (k, n*W)
        gr = gr.reshape(k, n, W)
        return jnp.einsum("knw,nw->nk", gr, vals)

    def split8(G, cols, vals):
        out = []
        ci = cols.reshape(-1)
        for j in range(0, k, 8):
            gr = jnp.take(G[:, j:j + 8], ci, axis=0).reshape(n, W, 8)
            out.append(jnp.sum(vals[:, :, None] * gr, axis=1))
        return jnp.concatenate(out, axis=1)

    def timeit(fn, *args):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        float(jnp.sum(o))                 # forced readback (relay quirk)

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

    for name, fn, args in [
        ("base", base, (G, cols, vals)),
        ("bf16", bf16, (Gb, cols, vals)),
        ("lanes_t", lanes_t, (Gt, cols, vals)),
        ("split8", split8, (G, cols, vals)),
    ]:
        try:
            ms = timeit(fn, *args)
            gel = n * W * k / (ms / 1e3) / 1e9
            print(f"{name:8s} {ms:8.2f} ms   {gel:6.2f} Gelem/s")
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()

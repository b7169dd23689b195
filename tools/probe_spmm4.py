"""Barrier-placement matrix for the SpMM gather: {none, operand, result,
both} x {eager slope, in-jit chain slope}, pad-free stack-unrolled body."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
from hpclinalg.ops.spmv import _ell_values, _ell_cols_raw, get_spmv_plan, _ub

n, k, W = 1 << 20, 64, 8
rng = np.random.default_rng(7)
rows = np.repeat(np.arange(n), W)
cols = rng.integers(0, n, n * W)
A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32), (rows, cols)), shape=(n, n))
A.sum_duplicates()
be = hl.backend_auto(nshards=1, dtype=np.float32)
Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
xv = hl.DistVector.from_global(np.ones(n, np.float32), be, dtype=np.float32)
plan = get_spmv_plan(Ad, xv)
vals, _ = _ell_values(Ad, plan)
colsr = _ell_cols_raw(Ad, plan)
Lrow = Ad.structure.Lrow
B = rng.standard_normal((n, k)).astype(np.float32)
Bd = jnp.asarray(B)[None]

def body(ub_op, ub_res):
    def run(g):
        gg = _ub(g) if ub_op else g
        def one(v, c, gs):
            gr = jnp.take(gs, c, axis=0)
            if ub_res:
                gr = _ub(gr)
            return jnp.sum(v[:, :, None] * gr.reshape(Lrow, W, k), axis=1)
        return jnp.stack([one(vals[0], colsr[0], gg[0])])
    return run

def sync(o):
    float(jnp.sum(o))

def eager_slope(fn):
    jf = jax.jit(fn)
    sync(jf(Bd))
    def r(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = jf(Bd)
        sync(o)
        return time.perf_counter() - t0
    t1 = min(r(2) for _ in range(3)); t2 = min(r(8) for _ in range(3))
    return (t2 - t1) / 6 * 1e3

def chain_slope(fn):
    def mk(N):
        return jax.jit(lambda y: jax.lax.fori_loop(0, N, lambda i, v: fn(v) * 0.125, y))
    c1, c2 = mk(2), mk(8)
    sync(c1(Bd)); sync(c2(Bd))
    t1 = []; t2 = []
    for _ in range(3):
        t0 = time.perf_counter(); sync(c1(Bd)); t1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); sync(c2(Bd)); t2.append(time.perf_counter()-t0)
    return (min(t2) - min(t1)) / 6 * 1e3

for name, uo, ur in (("none", 0, 0), ("operand", 1, 0), ("result", 0, 1), ("both", 1, 1)):
    fn = body(uo, ur)
    te = eager_slope(fn)
    tc = chain_slope(fn)
    print(f"{name:8s} eager {te:7.2f} ms ({A.nnz*k/te/1e6:5.2f} G/s)   chain {tc:7.2f} ms ({A.nnz*k/tc/1e6:5.2f} G/s)", flush=True)

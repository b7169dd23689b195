"""Const-capture vs arg-passing for the SpMM gather tables, plus table
barriers as the inline-safe fix."""
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
Bd = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))[None]

def sync(o):
    float(jnp.sum(o))

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

def mkbody(ub_tables):
    def run(g):
        v, c = ((_ub(vals), _ub(colsr)) if ub_tables else (vals, colsr))
        def one(vv, cc, gs):
            gr = jnp.take(gs, cc, axis=0)
            return jnp.sum(vv[:, :, None] * gr.reshape(Lrow, W, k), axis=1)
        return jnp.stack([one(v[0], c[0], g[0])])
    return run

for name, ubt in (("const", False), ("ub_tables", True)):
    t = chain_slope(mkbody(ubt))
    print(f"{name:10s} chain {t:7.2f} ms ({A.nnz*k/t/1e6:5.2f} G/s)", flush=True)

from hpclinalg.ops.spmv import _pad_trunc
colsc = plan.ell_cols
pad_to = plan.exchange.out_pad

def legacy(g):
    gg = _ub(_pad_trunc(g, pad_to).astype(jnp.float32))
    def one(vv, cc, gs):
        gr = jnp.take(gs, cc, axis=0)
        return jnp.sum(vv[:, :, None] * gr.reshape(Lrow, W, k), axis=1)
    return jnp.stack([one(vals[0], colsc[0], gg[0])])

def padonly(g):
    gg = _pad_trunc(g, pad_to)
    def one(vv, cc, gs):
        gr = jnp.take(gs, cc, axis=0)
        return jnp.sum(vv[:, :, None] * gr.reshape(Lrow, W, k), axis=1)
    return jnp.stack([one(vals[0], colsc[0], gg[0])])

def copyonly(g):
    gg = _ub(g * np.float32(1.0))
    def one(vv, cc, gs):
        gr = jnp.take(gs, cc, axis=0)
        return jnp.sum(vv[:, :, None] * gr.reshape(Lrow, W, k), axis=1)
    return jnp.stack([one(vals[0], colsr[0], gg[0])])

for name, fn in (("legacy", legacy), ("padonly", padonly), ("copyonly", copyonly)):
    t = chain_slope(fn)
    print(f"{name:10s} chain {t:7.2f} ms ({A.nnz*k/t/1e6:5.2f} G/s)", flush=True)

"""n=1e6 vs n=2^20: is the eager row-gather speed size-dependent?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
from hpclinalg.ops.spmv import _ell_apply, get_spmv_plan

def one(n, seed):
    W, k = 8, 64
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), W)
    cols = rng.integers(0, n, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32), (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    xv = hl.DistVector.from_global(np.ones(n, np.float32), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, xv)
    Bd = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))[None]
    def runN(N):
        t0 = time.perf_counter()
        o = None
        for _ in range(N):
            o = _ell_apply(Ad, plan, Bd, spmm=True)
        float(jnp.sum(o))
        return time.perf_counter() - t0
    runN(2)
    t1s, t2s = [], []
    for _ in range(3):
        t1s.append(runN(2)); t2s.append(runN(8))
    ms = (min(t2s) - min(t1s)) / 6 * 1e3
    print(f"n={n} seed={seed}: {ms:.2f} ms {A.nnz*k/(ms/1e3)/1e9:.2f} G/s", flush=True)

one(1_000_000, 7)
one(1 << 20, 7)
one(1_000_000, 2)

def one_padded(n, seed, padrows):
    W, k = 8, 64
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), W)
    cols = rng.integers(0, n, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32), (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    xv = hl.DistVector.from_global(np.ones(n, np.float32), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, xv)
    from hpclinalg.ops.spmv import _ell_values, _ell_cols_raw
    vals, _ = _ell_values(Ad, plan)
    colsr = _ell_cols_raw(Ad, plan)
    Lrow = Ad.structure.Lrow
    B0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    @jax.jit
    def f(B0):
        g = jnp.pad(B0, ((0, padrows), (0, 0)))
        gr = jnp.take(g, colsr[0], axis=0)
        return jnp.sum(vals[0][:, :, None] * gr.reshape(Lrow, W, k), axis=1)
    def runN(N):
        t0 = time.perf_counter()
        o = None
        for _ in range(N):
            o = f(B0)
        float(jnp.sum(o))
        return time.perf_counter() - t0
    runN(2)
    t1s, t2s = [], []
    for _ in range(3):
        t1s.append(runN(2)); t2s.append(runN(8))
    ms = (min(t2s) - min(t1s)) / 6 * 1e3
    print(f"n={n} pad={padrows}: {ms:.2f} ms {A.nnz*k/(ms/1e3)/1e9:.2f} G/s", flush=True)

one_padded(1 << 20, 7, 8)
one_padded(1 << 20, 7, 0)

"""Direct A/B: the real _ell_apply(spmm=True) vs its bare-equivalent on the
same plan data, slope-timed identically."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
from hpclinalg.ops.spmv import _ell_apply, _ell_values, get_spmv_plan

n, k, W = 1_000_000, 64, 8
rng = np.random.default_rng(2)
rows = np.repeat(np.arange(n, dtype=np.int64), W)
cols = rng.integers(0, n, size=n * W)
Ar = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32), (rows, cols)), shape=(n, n))
Ar.sum_duplicates()
be = hl.backend_auto(nshards=1, dtype=np.float32)
Ad = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
xv = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
plan = get_spmv_plan(Ad, xv)
print("W", plan.ell_W, "Tpad", plan.ell_Tpad, "identity", plan.exchange.is_identity, "out_pad", plan.exchange.out_pad, "Lrow", Ad.structure.Lrow, flush=True)
G = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
Gb = G[None]
vals, _ = _ell_values(Ad, plan)
colsd = plan.ell_cols
Lrow = Ad.structure.Lrow

@jax.jit
def bare(vals, colsd, g):
    gr = jnp.take(g, colsd[0], axis=0).reshape(Lrow, W, k)
    return jnp.sum(vals[0][:, :, None] * gr, axis=1)[None]

def dep(Gb):
    return _ell_apply(Ad, plan, Gb, spmm=True)

def sync(o):
    float(jnp.sum(o))  # scalar readback: block_until_ready does not
    # actually wait through the axon relay (bench.py methodology)

def slope(fn, args):
    sync(fn(*args))
    def run(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fn(*args)
        sync(o)
        return time.perf_counter() - t0
    t1 = min(run(2) for _ in range(3))
    t2 = min(run(8) for _ in range(3))
    return (t2 - t1) / 6 * 1e3

tb = slope(bare, (vals, colsd, G))
td = slope(dep, (Gb,))
print(f"bare {tb:.2f} ms {Ar.nnz*k/tb/1e6:.2f} G/s   deployed {td:.2f} ms {Ar.nnz*k/td/1e6:.2f} G/s")
# equality check
d1 = np.asarray(bare(vals, colsd, G))
d2 = np.asarray(dep(Gb))
print("agree", np.allclose(d1, d2, atol=1e-3))

"""Exact test_random_spmm_tier body, standalone."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
be1 = hl.backend_auto(nshards=1, dtype=np.float32)
n = 1 << 20
W, k = 8, 64
rng = np.random.default_rng(7)
rows = np.repeat(np.arange(n), W)
cols = rng.integers(0, n, n * W)
A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32), (rows, cols)), shape=(n, n))
A.sum_duplicates()
Ad = hl.DistSparseMatrix.from_scipy(A, be1, dtype=np.float32)
xv = hl.DistVector.from_global(np.ones(n, np.float32), be1, dtype=np.float32)
from hpclinalg.ops.spmv import _ell_apply, get_spmv_plan
plan = get_spmv_plan(Ad, xv)
B = rng.standard_normal((n, k)).astype(np.float32)
Bd = jnp.asarray(B)[None]
C = _ell_apply(Ad, plan, Bd, spmm=True)
ref = A @ B
got = np.asarray(C)[0][:n]
print("err ok", np.linalg.norm(got - ref)/np.linalg.norm(ref))
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
print(f"{ms:.2f} ms {A.nnz*k/(ms/1e3)/1e9:.2f} G/s")

"""Validate the Pallas DIA engine through the public API on the real TPU."""
import time, numpy as np, scipy.sparse as sp, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import hpclinalg as hl
def laplace2d(k, dtype):
    T = sp.diags([-1.0,2.0,-1.0],[-1,0,1],shape=(k,k)); I = sp.eye(k)
    return (sp.kron(I,T)+sp.kron(T,I)).tocsr().astype(dtype)
dtype = np.float32
be = hl.backend_auto(dtype=dtype)
from hpclinalg.ops.pallas_dia import pallas_available
print("pallas_available:", pallas_available(be), flush=True)
for k in (100, 2000):
    A = laplace2d(k, dtype); n = A.shape[0]
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    xh = np.random.default_rng(0).standard_normal(n).astype(dtype)
    x = hl.DistVector.from_global(xh, be, dtype=dtype)
    y = Ad @ x
    err = np.abs(y.to_numpy() - A@xh).max()
    best = np.inf
    for _t in range(3):
        t0=time.perf_counter()
        for _ in range(30): y = Ad @ x
        s = float(jnp.sum(y.data))
        best = min(best, (time.perf_counter()-t0)/30)
    print(f"n={n}: {best*1e3:.3f} ms  err={err:.1e}", flush=True)

"""Marginal-bandwidth measurement for the DIA SpMV engine: the relay's
~1.5 ms dispatch floor hides absolute kernel time, so estimate the
HBM-limited slope from the time difference between 1M and 4M dof."""
import time, numpy as np, scipy.sparse as sp, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import hpclinalg as hl
def laplace2d(k, dtype):
    T = sp.diags([-1.0,2.0,-1.0],[-1,0,1],shape=(k,k)); I = sp.eye(k)
    return (sp.kron(I,T)+sp.kron(T,I)).tocsr().astype(dtype)
dtype = np.float32
be = hl.backend_auto(dtype=dtype)
res = {}
for k in (1000, 2000):
    A = laplace2d(k, dtype); n = A.shape[0]
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
    x = hl.DistVector.rand(n, be, dtype=dtype)
    y = Ad @ x; _ = float(jnp.sum(y.data))
    best = np.inf
    for _t in range(3):
        t0=time.perf_counter()
        for _ in range(30): y = Ad @ x
        s = float(jnp.sum(y.data))
        best = min(best, (time.perf_counter()-t0)/30)
    bytes_ = 5*n*4*2 + n*4*2  # dval read + x slices (~5 passes) + x,y
    res[n] = (best*1e3, bytes_)
    print(f"n={n}: {best*1e3:.3f} ms", flush=True)
(t1, b1), (t4, b4) = res[1000000], res[4000000]
slope_gbps = (b4-b1) / ((t4-t1)/1e3) / 1e9
print(f"marginal bandwidth: {slope_gbps:.0f} GB/s (v5e HBM peak ~819)")

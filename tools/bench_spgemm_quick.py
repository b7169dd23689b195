import time, numpy as np, scipy.sparse as sp, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import hpclinalg as hl
def laplace2d(k, dtype):
    T = sp.diags([-1.0,2.0,-1.0],[-1,0,1],shape=(k,k)); I = sp.eye(k)
    return (sp.kron(I,T)+sp.kron(T,I)).tocsr().astype(dtype)
dtype = np.float32
be = hl.backend_auto(dtype=dtype)
A = laplace2d(100, dtype)
Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=dtype)
C = Ad @ Ad; _ = float(jnp.sum(C.nzval))
for t in range(3):
    t0=time.perf_counter()
    for _ in range(30): C = Ad @ Ad
    s = float(jnp.sum(C.nzval))
    print(f"trial{t}: {1e3*(time.perf_counter()-t0)/30:.3f} ms", flush=True)
err = abs(C.to_scipy() - (A@A)).max()
print("err:", err, "| reference baseline 1.216 ms")

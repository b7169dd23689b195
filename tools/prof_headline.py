import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, scipy.sparse as sp
import hpclinalg as hl
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp

def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)

be = hl.backend_auto(dtype=np.float64)
A = laplace2d(100)
Ad = hl.DistSparseMatrix.from_scipy(A, be)
bh = np.random.default_rng(0).standard_normal(10000)
b = hl.DistVector.from_global(bh, be)
F = hl.ldlt(Ad)
x = F.solve(b)

def t(f, n=30):
    f()
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return float(np.median(ts)*1e3)

print("refactorize_ms:", t(lambda: F.refactorize(Ad)))
print("solve_dist_ms:", t(lambda: F.solve(b)))
print("combo_ms:", t(lambda: (F.refactorize(Ad), F.solve(b))))
bh64 = bh.astype(np.float64)
print("solve_host_raw_ms:", t(lambda: F._solve_host(bh64, False)))
vals = F._A_vals
print("csc_for_ms:", t(lambda: F._csc_for(Ad, vals)))
csc = F._csc_for(Ad, vals)
print("native_factorize_ms:", t(lambda: F.native.factorize(F._lib, csc, F.kind, 1e-9, pivot=False)))
print("to_numpy_ro_ms:", t(lambda: b.to_numpy_ro()))
from hpclinalg.vector import DistVector
xh = F._solve_host(bh64, False)
print("from_global_ms:", t(lambda: DistVector.from_global(xh, be, partition=Ad.row_partition, dtype=np.float64)))
print("clean:", F._clean(), "npert:", F.n_perturbed)
print("growth_scan_ms:", t(lambda: (setattr(F,'_growth',None), F._factor_growth())))

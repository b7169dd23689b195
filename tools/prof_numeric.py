import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, scipy.sparse as sp
import hpclinalg as hl
from hpclinalg.config import enable_compile_cache
enable_compile_cache()

def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)

be = hl.backend_auto(dtype=np.float64)
A = laplace2d(100)
Ad = hl.DistSparseMatrix.from_scipy(A, be)
F = hl.ldlt(Ad)

import hpclinalg.solver.api as api

def t(f, n=50):
    f()
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return float(np.median(ts)*1e3)

vals0 = api._csr_values(Ad)
print("csr_values_cached:", t(lambda: api._csr_values(Ad)))
print("astype:", t(lambda: vals0.astype(F.dtype, copy=False)))
print("absmax:", t(lambda: float(np.abs(vals0).max())))
csc = F._csc_for(Ad, vals0)
print("factorize_nopiv:", t(lambda: F.native.factorize(F._lib, csc, F.kind, 1e-9, pivot=False)))
print("unstable:", t(lambda: (setattr(F,'_growth',None), F._unstable())))
print("numeric_full:", t(lambda: F._numeric(Ad)))
print("hashcheck:", t(lambda: Ad.hash != F.structural_hash))
# now what does refactorize add
print("refactorize:", t(lambda: F.refactorize(Ad)))

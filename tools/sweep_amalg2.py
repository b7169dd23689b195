import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import time, numpy as np, scipy.sparse as sp
from hpclinalg.solver.symbolic import analyze
from hpclinalg.solver.ordering import amd_order, nd_order
from hpclinalg.solver.native import NativeFactor, load_mf

def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)

A = laplace2d(100)
n = A.shape[0]
ip = A.indptr.astype(np.int64); ix = A.indices.astype(np.int64)
lib = load_mf()

def bench(sym, tag):
    nf = NativeFactor(sym, np.float64)
    coo = A.tocoo()
    r2 = sym.iperm[coo.row]; c2 = sym.iperm[coo.col]
    order = np.lexsort((r2, c2))
    indices = r2[order].astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, c2[order] + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int64)
    class V: pass
    v = V(); v.indptr=indptr; v.indices=indices; v.data=coo.data[order].astype(np.float64)
    nf.factorize(lib, v, "ldlt", 1e-9)
    N=15
    t0=time.perf_counter()
    for _ in range(N): nf.factorize(lib, v, "ldlt", 1e-9)
    tf=(time.perf_counter()-t0)/N*1e3
    b = np.random.default_rng(0).standard_normal(n)
    nf.solve(lib, b)
    t0=time.perf_counter()
    for _ in range(N): nf.solve(lib, b)
    ts=(time.perf_counter()-t0)/N*1e3
    print(f"{tag:30s} ns={sym.nsuper:5d} lnz={sym.lnz:7d} fl={sym.flops/1e6:7.1f}M  factor {tf:6.3f} ms  solve {ts:6.3f} ms", flush=True)

import sys as _s
which = _s.argv[1] if len(_s.argv)>1 else "amd"
perm = amd_order(ip, ix, n) if which=="amd" else nd_order(ip, ix, n)
for relax, zf, small in ((0,0.0,0),(4,0.1,8),(8,0.2,12),(16,0.3,16),(24,0.35,20),(48,0.45,28)):
    sym = analyze(A, perm, relax=relax, zeros_frac=zf, small=small)
    bench(sym, f"{which} r={relax} zf={zf} sm={small}")

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HPCLINALG_ROUTE_CACHE"] = "0"
import numpy as np, scipy.sparse as sp
n = 1_000_000
import hpclinalg as hl
import hpclinalg.ops.spmv as spmv_mod
rng = np.random.default_rng(2)
rows = np.repeat(np.arange(n, dtype=np.int64), 8)
cols = rng.integers(0, n, size=n * 8)
Ar = sp.csr_matrix((rng.standard_normal(n * 8).astype(np.float32), (rows, cols)), shape=(n, n))
Ar.sum_duplicates()
be = hl.backend_auto(nshards=1, dtype=np.float32)
t0=time.perf_counter()
Ad = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
print("from_scipy", round(time.perf_counter()-t0,2))
xv = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)

import hpclinalg.ops.gather as gather_mod
t0=time.perf_counter()
ex = gather_mod.gather_exchange_plan(be, xv.partition, Ad.structure.col_indices, out_len=Ad.structure.Gpad)
print("exchange_plan", round(time.perf_counter()-t0,2))

# time SpMVPlan __init__ sections by monkeypatch
cls = spmv_mod.SpMVPlan
t0=time.perf_counter()
plan = cls(Ad, xv.partition_hash, ex)
print("SpMVPlan total", round(time.perf_counter()-t0,2))

# now re-time _build_ell alone
t0=time.perf_counter()
plan._build_ell(Ad)
print("_build_ell alone", round(time.perf_counter()-t0,2))

import cProfile, pstats, io
pr = cProfile.Profile()
pr.enable()
plan2 = cls(Ad, xv.partition_hash, ex)
pr.disable()
st_io = io.StringIO()
ps = pstats.Stats(pr, stream=st_io).sort_stats("cumulative")
ps.print_stats(18)
print(st_io.getvalue())

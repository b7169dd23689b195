"""Slope-timed deployed shuffle SpMV (the bench.py spmv_random methodology,
standalone): builds the full plan (route cache OFF) and times shuffle_spmv."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HPCLINALG_ROUTE_CACHE"] = "0"
import numpy as np, scipy.sparse as sp
import jax, jax.numpy as jnp
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
from hpclinalg.ops.spmv import get_spmv_plan
from hpclinalg.ops.pallas_shuffle import shuffle_spmv, build_spmv_shuffle

n = 1_000_000
rng = np.random.default_rng(2)
rows = np.repeat(np.arange(n, dtype=np.int64), 8)
cols = rng.integers(0, n, size=n * 8)
Ar = sp.csr_matrix((rng.standard_normal(n * 8).astype(np.float32), (rows, cols)), shape=(n, n))
Ar.sum_duplicates()
be = hl.backend_auto(dtype=np.float64)
Ard = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
xs = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
plan = get_spmv_plan(Ard, xs)
t0 = time.perf_counter()
pk = build_spmv_shuffle(Ard, plan, int(xs.data.shape[1]))
print(f"route build {time.perf_counter()-t0:.1f}s tables {pk.table_bytes()/1e6:.1f} MB RBu={pk.RBu} TP_B={pk.TP_B} PS={pk.PS} nspill={0 if pk.spill_dst is None else int(pk.spill_dst.shape[0])}", flush=True)

def sync(x):
    float(jnp.sum(x))

out = shuffle_spmv(Ard, plan, xs.data)
sync(out)
yref = Ar @ xs.to_numpy_ro()
err = np.linalg.norm(np.asarray(out)[0][:n] - yref) / np.linalg.norm(yref)
print("err", err, flush=True)

def run(N):
    t0 = time.perf_counter()
    o = None
    for _ in range(N):
        o = shuffle_spmv(Ard, plan, xs.data)
    sync(o)
    return time.perf_counter() - t0

t1s, t2s = [], []
for _ in range(3):
    t1s.append(run(8)); t2s.append(run(40))
tr = (min(t2s) - min(t1s)) / 32 * 1e3
print(f"spmv {tr:.3f} ms  {Ar.nnz/(tr/1e3)/1e6:.0f} Melem/s")

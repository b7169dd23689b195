"""Cold end-to-end spmv_random_plan_s exactly as bench.py measures it."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HPCLINALG_ROUTE_CACHE"] = "0"
import numpy as np, scipy.sparse as sp
import jax
from hpclinalg.config import enable_compile_cache
enable_compile_cache()
import hpclinalg as hl
n = 1_000_000
rng = np.random.default_rng(2)
rows = np.repeat(np.arange(n, dtype=np.int64), 8)
cols = rng.integers(0, n, size=n * 8)
Ar = sp.csr_matrix((rng.standard_normal(n * 8).astype(np.float32), (rows, cols)), shape=(n, n))
Ar.sum_duplicates()
be = hl.backend_auto(dtype=np.float64)
Ard = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
xs = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
t0 = time.perf_counter()
y = Ard @ xs
print("plan_s", round(time.perf_counter() - t0, 2))
import jax.numpy as jnp
float(jnp.sum(y.data))
yref = Ar @ xs.to_numpy_ro()
err = np.linalg.norm(y.to_numpy() - yref) / np.linalg.norm(yref)
print("err", err)
assert err < 2e-5, err

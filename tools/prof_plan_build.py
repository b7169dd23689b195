"""Phase timing of the random-SpMV plan build (VERDICT r4 item 4):
SpMVPlan(ELL) build, C++ route_build, packed export+upload."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HPCLINALG_ROUTE_CACHE"] = "0"   # force cold build
import numpy as np, scipy.sparse as sp

def main():
    n = 1_000_000
    import jax
    import hpclinalg as hl
    from hpclinalg.ops.spmv import get_spmv_plan
    rng = np.random.default_rng(2)
    rows = np.repeat(np.arange(n, dtype=np.int64), 8)
    cols = rng.integers(0, n, size=n * 8)
    t0 = time.perf_counter()
    Ar = sp.csr_matrix((rng.standard_normal(n * 8).astype(np.float32),
                        (rows, cols)), shape=(n, n))
    Ar.sum_duplicates()
    print(f"scipy build {time.perf_counter()-t0:.1f}s", flush=True)
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    t0 = time.perf_counter()
    Ad = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
    print(f"from_scipy {time.perf_counter()-t0:.1f}s", flush=True)
    xv = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
    t0 = time.perf_counter()
    plan = get_spmv_plan(Ad, xv)
    print(f"spmv_plan(ELL) {time.perf_counter()-t0:.1f}s", flush=True)
    from hpclinalg.ops import pallas_shuffle as ps
    # instrument from_native: time route_build vs export vs upload
    t0 = time.perf_counter()
    pk = ps.build_spmv_shuffle(Ad, plan, int(xv.data.shape[1]))
    print(f"build_spmv_shuffle total {time.perf_counter()-t0:.1f}s", flush=True)
    print("table_MB", pk.table_bytes() / 1e6)

main()

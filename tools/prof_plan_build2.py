"""Fine-grained: _shard_src / route_build / export / upload split."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["HPCLINALG_ROUTE_CACHE"] = "0"
import numpy as np, scipy.sparse as sp

def main():
    n = 1_000_000
    import jax, ctypes
    import hpclinalg as hl
    from hpclinalg.ops.spmv import get_spmv_plan
    from hpclinalg.ops import pallas_shuffle as ps
    from hpclinalg.solver.native import build_native_lib
    rng = np.random.default_rng(2)
    rows = np.repeat(np.arange(n, dtype=np.int64), 8)
    cols = rng.integers(0, n, size=n * 8)
    Ar = sp.csr_matrix((rng.standard_normal(n * 8).astype(np.float32), (rows, cols)), shape=(n, n))
    Ar.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    Ad = hl.DistSparseMatrix.from_scipy(Ar, be, dtype=np.float32)
    xv = hl.DistVector.from_global(rng.standard_normal(n).astype(np.float32), be, dtype=np.float32)
    plan = get_spmv_plan(Ad, xv)
    xlen = int(xv.data.shape[1])

    # replicate build() single-shard path with timers
    import hpclinalg.ops.pallas_shuffle as P
    st = Ad.structure
    t0=time.perf_counter()
    # _shard_src is a closure; call via build_spmv_shuffle internals: copy code path
    src_fn = None
    # hack: time the pieces by monkeypatching from_native
    orig = P.PackedRoute.from_native.__func__
    times = {}
    def timed_from_native(cls, src_of, nsrc, **kw):
        t1 = time.perf_counter()
        times["shard_src"] = t1 - t0
        lib = build_native_lib("hpcroute", "route.cpp")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        if not getattr(lib, "_route_sigs", False):
            lib.route_build.restype = ctypes.c_void_p
            lib.route_build.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, i64p] + [ctypes.c_int64]*7
            lib.route_export_packed.restype = None
            lib.route_free.argtypes = [ctypes.c_void_p]
            lib._route_sigs = True
        src_c = np.ascontiguousarray(src_of, np.int64)
        geom = np.zeros(16, np.int64)
        t2 = time.perf_counter()
        h = lib.route_build(len(src_c), int(nsrc), src_c, geom, 0,0,0,0,0,0,0)
        t3 = time.perf_counter(); times["route_build"] = t3 - t2
        lib.route_free(ctypes.c_void_p(h))
        times["geom"] = geom[:13].tolist()
        t4 = time.perf_counter()
        r = orig(cls, src_of, nsrc, **kw)
        times["from_native_total"] = time.perf_counter() - t4
        return r
    P.PackedRoute.from_native = classmethod(timed_from_native)
    t0 = time.perf_counter()
    pk = ps.build_spmv_shuffle(Ad, plan, xlen)
    total = time.perf_counter() - t0
    print("times:", {k: (round(v,2) if isinstance(v,float) else v) for k,v in times.items()})
    print("total:", round(total,2))
    # second from_native timing: export vs upload — redo with manual split
    # (orig from_native does route_build AGAIN + export + jnp.asarray)
main()

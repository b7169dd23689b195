import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import ctypes, time, numpy as np, scipy.sparse as sp
import hpclinalg as hl
from hpclinalg.solver import api
from hpclinalg.solver.native import NativeFactor, _blas_path, _i64p

def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)

be = hl.backend_auto(dtype=np.float64)
A = laplace2d(100)
Ad = hl.DistSparseMatrix.from_scipy(A, be)
F = hl.ldlt(Ad)

lib = ctypes.CDLL("/tmp/libhpcmf_prof.so")
lib.mf_init.argtypes=[ctypes.c_char_p]; lib.mf_init.restype=ctypes.c_int
assert lib.mf_init(_blas_path().encode())==0
fp = np.ctypeslib.ndpointer(np.float64, flags="C")
f = lib.mf_factorize_d
f.argtypes = [ctypes.c_int64, ctypes.c_int64, _i64p, _i64p, _i64p,
              _i64p, _i64p, _i64p, fp, _i64p, _i64p, fp, fp, fp, fp,
              fp, ctypes.c_int, ctypes.c_double]
f.restype = ctypes.c_int64
lib.mf_prof_dump.restype=None

nf = F.native
vals = api._csr_values(Ad).astype(np.float64)
csc = F._csc_for(Ad, vals)
Ax = np.ascontiguousarray(csc.data)
Ap = np.asarray(csc.indptr, np.int64); Ai = np.asarray(csc.indices, np.int64)
args = (nf.sym.n, nf.sym.nsuper, nf.snode_ptr, nf.rows_ptr, nf.rows, nf.sparent,
        Ap, Ai, Ax, nf.l11_off, nf.l21_off, nf.L11, nf.L21, nf.D, nf.U11, nf.U12, 0, 1e-9)
f(*args)
lib.mf_prof_dump()  # reset
N=20
t0=time.perf_counter()
for _ in range(N): f(*args)
dt=(time.perf_counter()-t0)/N
print(f"factorize: {dt*1e3:.3f} ms (x{N})")
lib.mf_prof_dump()
sym = nf.sym
ncs = np.diff(nf.snode_ptr); nrs = np.diff(nf.rows_ptr)
print("nsuper:", sym.nsuper, "n:", sym.n, "lnz:", sym.lnz)
print("nc hist:", np.percentile(ncs,[50,90,99,100]).tolist())
print("nr hist:", np.percentile(nrs,[50,90,99,100]).tolist())
print("front sizes nf=nc+nr p50/p90/max:", np.percentile(ncs+nrs,[50,90,100]).tolist())
fl = ((ncs+nrs).astype(float)**2*ncs).sum()
print("approx flops:", fl, "-> GF/s at 4ms:", fl/4e-3/1e9)

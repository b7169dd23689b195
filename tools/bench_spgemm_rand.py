"""TPU timing of the densify SpGEMM tier on the README quickstart workload
(sprand 1000x1000 density 0.01, A@A)."""
import time, numpy as np, scipy.sparse as sp, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import hpclinalg as hl
from hpclinalg.ops.spgemm import get_spgemm_plan
be = hl.backend_auto(dtype=np.float32)
rng = np.random.default_rng(0)
A = (sp.random(1000, 1000, 0.01, format="csr", random_state=rng) + sp.eye(1000)).tocsr().astype(np.float32)
Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
C = Ad @ Ad; _ = float(jnp.sum(C.nzval))
p = get_spgemm_plan(Ad, Ad)
best = np.inf
for _t in range(3):
    t0=time.perf_counter()
    for _ in range(30): C = Ad @ Ad
    s = float(jnp.sum(C.nzval))
    best = min(best, (time.perf_counter()-t0)/30)
err = abs(C.to_scipy() - A@A).max()
print(f"sprand 1k A@A [densify={p.densify}]: {best*1e3:.3f} ms  err={err:.1e}", flush=True)

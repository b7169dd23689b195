"""Quickstart — the README example as a runnable script (the analogue of the
reference's README quickstart: sprand(1000,1000,0.01), A*x, A*B,
transpose(A)*B, ldlt solve).

    python examples/quickstart.py          # default platform (TPU if present)
    python examples/quickstart.py --cpu    # 4-device virtual CPU mesh
"""

import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--cpu" in sys.argv:
    import os

    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import hpclinalg as hl

rng = np.random.default_rng(0)
be = hl.backend_auto()
print(f"mesh: {be.nshards} device(s), dtype {np.dtype(be.dtype).name}")

A_host = (sp.random(1000, 1000, 0.01, format="csr", random_state=rng)
          + sp.eye(1000)).tocsr()
A = hl.DistSparseMatrix.from_scipy(A_host, be)
x = hl.DistVector.from_global(rng.standard_normal(1000), be)

y = A @ x
print("A @ x          max err:", np.abs(y.to_numpy() - A_host @ x.to_numpy()).max())

C = A @ A
print("A @ A          max err:", abs(C.to_scipy() - A_host @ A_host).max())

D = A.T @ A
print("A' @ A         max err:", abs(D.to_scipy() - A_host.T @ A_host).max())

S = A + A.T.materialize()
F = hl.ldlt(S)
b = hl.DistVector.from_global(rng.standard_normal(1000), be)
b2 = hl.DistVector.from_global(rng.standard_normal(1024), be)
u = F.solve(b)
res = np.linalg.norm((A_host + A_host.T) @ u.to_numpy() - b.to_numpy())
print("ldlt solve     residual:", res / np.linalg.norm(b.to_numpy()))

v = hl.solve(S, b)  # the A \ b analogue (cached)
print("backslash      plans:", sum(hl.cache_sizes().values()), "cached")

# mesh-distributed device multifrontal (the cuDSS-MGMN analogue): per-shard
# subtree waves on the MXU, RHS on device end-to-end. A stencil system
# keeps this quickstart-fast (PDE-class patterns are its home turf).
T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(32, 32))
I32 = sp.eye(32)
P_host = (sp.kron(I32, T) + sp.kron(T, I32) + 0.5 * sp.eye(1024)).tocsr()
P = hl.DistSparseMatrix.from_scipy(P_host, be)
G = hl.ldlt(P, method="device")
w = G.solve(b2)
res = np.linalg.norm(P_host @ w.to_numpy() - b2.to_numpy())
print("device ldlt    residual:", res / np.linalg.norm(b2.to_numpy()))

# right division and row-vector algebra
rt = b2.T / P
print("right division residual:",
      np.linalg.norm(P_host.T @ rt.T.to_numpy() - b2.to_numpy())
      / np.linalg.norm(b2.to_numpy()))

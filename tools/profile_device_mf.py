"""Phase attribution for the device multifrontal factor (VERDICT r2 #7).

The 2D stencil regime is scatter/assembly-bound (small fronts, many of
them); this tool splits the steady factor time into its three phases by
compiling ablated variants of the SAME level program:

  full      — the shipped _factor_impl
  stub_kern — front kernels replaced by slicing (fac = (F11, F21),
              U = F22): assembly + extend-add traffic only, no
              cholesky/trsm/matmul compute
  no_ea     — extend-add maps emptied (upds produced but never consumed):
              assembly + kernels, no EA scatters/one-hot matmuls
  asm_only  — both ablations: the raw A-scatter + zeros + diag floor

Attribution (phases overlap inside one jit, so these are bounds, not a
partition): kernels >= full - stub_kern, EA >= full - no_ea, assembly
~ asm_only.

Usage:  python tools/profile_device_mf.py [k=512] [kind=chol] [reps=5]

Run on the real chip (the relay): each variant costs one remote compile
(minutes); timings use chained dispatch + readback sync, the bench.py
methodology.
"""

import copy
import json
import os
import sys
import time
import types

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def _stub_front_kernel(self, F, NC, eps):
    """Zero-compute kernel: keeps the full data dependency on F (so XLA
    cannot dead-code the assembly/EA scatters) while doing no LA."""
    import jax.numpy as jnp

    F11 = F[:, :NC, :NC]
    F21 = F[:, NC:, :NC]
    U = F[:, NC:, NC:]
    z = jnp.zeros((), jnp.int32)
    if self.kind == "chol":
        return (F11, F21), U, z
    if self.kind == "ldl":
        d = F11[:, :, 0] + 1.0  # (B', NC) shaped like the real d
        return (F11, d, F21), U, z
    F12 = F[:, :NC, NC:]
    return (F11, F11, F21, F12), U, z


def _variant(mf, stub_kernel=False, no_ea=False):
    """Clone the DeviceMF schedule with the requested ablations and build
    a fresh jit of the same _factor_impl."""
    import jax

    v = copy.copy(mf)
    if no_ea:
        def strip(levels):
            out = []
            for m in levels:
                m2 = copy.copy(m)
                m2.ea = []
                if hasattr(m2, "ea_cross"):
                    m2.ea_cross = []
                out.append(m2)
            return out

        v.local_levels = strip(mf.local_levels)
        v.top_levels = strip(mf.top_levels)
        v.cross_maps = []
    if stub_kernel:
        v._front_kernel = types.MethodType(_stub_front_kernel, v)
    v._factor_jit = jax.jit(v._factor_impl)
    return v


def _steady_ms(fn, sync, reps):
    out = fn()
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 0.0) / reps * 1e3


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kind = sys.argv[2] if len(sys.argv) > 2 else "chol"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax
    import jax.numpy as jnp

    from hpclinalg.backend import backend_auto
    from hpclinalg.solver.device_mf import DeviceMF

    A = laplace2d(k)
    be = backend_auto(nshards=1, dtype=np.float32)
    t0 = time.time()
    mf = DeviceMF(A, be, kind=kind, dtype=np.float32)
    print(f"schedule build {time.time() - t0:.1f}s; "
          f"{len(mf.local_levels)} local + {len(mf.top_levels)} top levels",
          file=sys.stderr)

    Avals = jnp.asarray(A.data.astype(np.float32))
    eps = 1e-10 * float(np.abs(A.data).max())

    def sync(out):
        # readback forces completion through the relay
        float(np.asarray(jax.device_get(out[2])))

    res = {}
    for name, v in [
        ("full", mf),
        ("stub_kern", _variant(mf, stub_kernel=True)),
        ("no_ea", _variant(mf, no_ea=True)),
        ("asm_only", _variant(mf, stub_kernel=True, no_ea=True)),
    ]:
        t0 = time.time()
        ms = _steady_ms(lambda v=v: v.factor(Avals, eps), sync, reps)
        print(f"{name}: {ms:.1f} ms  (compile+run {time.time() - t0:.0f}s)",
              file=sys.stderr)
        res[name] = round(ms, 2)

    res["kernel_lb_ms"] = round(res["full"] - res["stub_kern"], 2)
    res["ea_lb_ms"] = round(res["full"] - res["no_ea"], 2)
    res["n"] = k * k
    res["kind"] = kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()

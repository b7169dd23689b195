"""Host-only schedule diagnostics: compare AMD vs ND device-MF schedules
at a given size without compiling anything. Prints, per ordering:
level count, padded front flops, total EA scatter elements, staged flag,
and the per-level (B, NC, NF) histogram summary.

Usage: python tools/diag_schedule.py [k=512] [kind=chol] [nshards=1]
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("HPCLINALG_NO_COMPILE_CACHE", "1")


def laplace2d(k, dtype=np.float64):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr().astype(dtype)


def stats(mf):
    out = {}
    levels = list(mf.local_levels) + list(mf.top_levels)
    out["nlevels"] = len(levels)
    out["padded_flops"] = sum(m.B * m.NF**2 * m.NC for m in mf.local_levels) \
        + sum(m.B * m.NF**2 * m.NC for m in mf.top_levels)
    out["padded_elems"] = sum(m.B * m.NF * m.NF for m in levels)
    ea_elems = 0
    for m in levels:
        for tup in m.ea:
            src = tup[1]
            ea_elems += int(np.prod(mf._bufs[src].shape)) if isinstance(src, int) else 0
        for tup in getattr(m, "ea_cross", []):
            src = tup[0]
            ea_elems += int(np.prod(mf._bufs[src].shape)) if isinstance(src, int) else 0
    out["ea_ref_count"] = sum(len(m.ea) + len(getattr(m, "ea_cross", [])) for m in levels)
    out["staged"] = getattr(mf, "_staged", None)
    out["geom"] = [(m.B, m.NC, m.NF) for m in levels]
    return out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kind = sys.argv[2] if len(sys.argv) > 2 else "chol"
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from hpclinalg.backend import backend_auto
    from hpclinalg.solver import symbolic
    from hpclinalg.solver.device_mf import DeviceMF

    A = laplace2d(k)
    be = backend_auto(nshards=S, dtype=np.float32)

    orig_best = symbolic.analyze_best

    for mode in ("amd", "nd", "best"):
        if mode == "amd":
            symbolic.analyze_best = lambda A_csr, **kw: symbolic.analyze(
                A_csr, __import__("hpclinalg.solver.ordering", fromlist=["amd_order"]).amd_order(
                    A_csr.indptr.astype(np.int64), A_csr.indices.astype(np.int64), A_csr.shape[0]),
                **kw)
        elif mode == "nd":
            symbolic.analyze_best = lambda A_csr, **kw: symbolic.analyze(
                A_csr, __import__("hpclinalg.solver.ordering", fromlist=["nd_order"]).nd_order(
                    A_csr.indptr.astype(np.int64), A_csr.indices.astype(np.int64), A_csr.shape[0]),
                **kw)
        else:
            symbolic.analyze_best = orig_best
        t0 = time.time()
        mf = DeviceMF(A, be, kind=kind, dtype=np.float32)
        dt = time.time() - t0
        st = stats(mf)
        geom = st.pop("geom")
        bsum = sum(b for b, _, _ in geom)
        nfmax = max(nf for _, _, nf in geom)
        print(f"[{mode}] build {dt:.1f}s  sym.flops={mf.sym.flops/1e9:.2f}G "
              f"lnz={mf.sym.lnz/1e6:.2f}M nsuper={mf.sym.nsuper}")
        print(f"  nlevels={st['nlevels']} padded_flops={st['padded_flops']/1e9:.2f}G "
              f"padded_elems={st['padded_elems']/1e6:.1f}M ea_refs={st['ea_ref_count']} "
              f"staged={st['staged']} Bsum={bsum} NFmax={nfmax}")
        biggest = sorted(geom, key=lambda g: g[0] * g[2] * g[2])[-5:]
        print(f"  top5 levels by elems: {biggest}")


if __name__ == "__main__":
    main()

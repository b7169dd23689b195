"""Phase attribution for the device multifrontal SOLVE (VERDICT r4 #1:
device_solve_262k_ms <= 40).

Ablated variants of the same level program, chained-dispatch slope timing:

  full       — the shipped _solve_impl (inverted-block matmul sweeps)
  no_gather  — takeS/setS/addS replaced by contiguous slices/updates of
               the same shapes: wave compute + buffer traffic, no
               index-gather/scatter work
  gather_only— the matmul sweeps replaced by pass-through: the
               gather/scatter skeleton alone

Usage: python tools/profile_device_solve.py [k=512] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def laplace2d(k):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    eye = sp.eye(k)
    return (sp.kron(eye, T) + sp.kron(T, eye)).tocsr()


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp

    import hpclinalg as hl
    from hpclinalg.config import enable_compile_cache
    from hpclinalg.solver.device_mf import DeviceMF, _mm_prec

    enable_compile_cache()
    A = laplace2d(k).astype(np.float32)
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    eng = DeviceMF(A, be, kind="chol", dtype=np.float32)
    Av = jnp.asarray(A.data.astype(np.float32))
    eps = np.float32(1e-7 * 4)
    fac = eng.factor(Av, eps)
    (loc, top), _ = eng.prep_solve(fac)
    n = k * k
    b = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(n).astype(np.float32))
    from hpclinalg.parallel.mesh import scatter_from_full

    bs = scatter_from_full(b[:, None], eng.row_partition, be)
    bloc = eng.in_plan.apply(bs.astype(eng.dtype))

    def variant(mode):
        def solve(bufs, loc_f, top_f, bl):
            dt = eng.dtype
            S, SENT = eng.S, eng.SVPAD
            TOPM, Mmax = eng.TOPM, eng.Mmax
            kk = bl.shape[2]
            y = jnp.pad(bl.astype(dt), ((0, 0), (0, 1), (0, 0)))
            contrib = jnp.zeros((S, SENT + 1, kk), dt)
            zloc = jnp.zeros((S, SENT + 1, kk), dt)

            def takeS(arr, idx):
                if mode == "no_gather":
                    B_, W_ = idx.shape[1], idx.shape[2]
                    return jax.lax.dynamic_slice(
                        arr, (0, 0, 0), (S, B_ * W_, kk)).reshape(
                        S, B_, W_, kk)
                return jax.vmap(lambda a, i: a[i])(arr, idx)

            def setS(arr, idx, val):
                if mode == "no_gather":
                    return jax.lax.dynamic_update_slice(
                        arr, val.astype(arr.dtype), (0, 0, 0))
                return jax.vmap(lambda a, i, v: a.at[i].set(v))(arr, idx, val)

            def addS(arr, idx, val):
                if mode == "no_gather":
                    return jax.lax.dynamic_update_slice(
                        arr, val.astype(arr.dtype), (0, 0, 0))
                return jax.vmap(lambda a, i, v: a.at[i].add(v))(arr, idx, val)

            def fwd(fc, seg):
                if mode == "gather_only":
                    return seg, seg
                prec = _mm_prec(seg.dtype)
                w = jnp.matmul(fc[0], seg, precision=prec)
                return w, w

            def bwd(fc, rhs, xr):
                if mode == "gather_only":
                    return rhs
                prec = _mm_prec(rhs.dtype)
                Li, L21 = fc
                t = rhs - jnp.matmul(jnp.swapaxes(L21, 1, 2), xr,
                                     precision=prec)
                return jnp.matmul(jnp.swapaxes(Li, 1, 2), t, precision=prec)

            for m, fc in zip(eng.local_levels, loc_f):
                B, NC, NF = m.B, m.NC, m.NF
                NR = NF - NC
                ccol, crow = bufs[m.ccol], bufs[m.crow]
                seg = takeS(y, ccol) + takeS(contrib, ccol)
                seg = seg.reshape(S * B, NC, kk)
                fcf = tuple(x.reshape((S * B,) + x.shape[2:]) for x in fc)
                z, w = fwd(fcf, seg)
                zloc = setS(zloc, ccol.reshape(S, B * NC),
                            z.reshape(S, B * NC, kk))
                upd = jnp.matmul(fcf[-1], w, precision=_mm_prec(w.dtype)) \
                    if mode != "gather_only" else w[:, :1, :] * jnp.zeros(
                        (S * B, NR, kk), dt)
                contrib = addS(contrib, crow.reshape(S, B * NR),
                               -upd.reshape(S, B * NR, kk))
                contrib = contrib.at[:, SENT].set(0.0)
                zloc = zloc.at[:, SENT].set(0.0)
            if TOPM:
                ytop = jnp.sum(jax.lax.slice(
                    y + contrib, (0, Mmax, 0), (S, Mmax + TOPM, kk)), axis=0)
                ytop = jnp.concatenate([ytop, jnp.zeros((1, kk), dt)])
            else:
                ytop = jnp.zeros((1, kk), dt)
            for m, fc in zip(eng.top_levels, top_f):
                B, NC, NF = m.B, m.NC, m.NF
                NR = NF - NC
                ccol, crow = bufs[m.ccol], bufs[m.crow]
                seg = jnp.take(ytop, ccol, axis=0)
                z, w = fwd(fc, seg)
                ytop = ytop.at[ccol.reshape(-1)].set(z.reshape(B * NC, kk))
                if mode != "gather_only":
                    upd = jnp.matmul(fc[-1], w, precision=_mm_prec(w.dtype))
                    ytop = ytop.at[crow.reshape(-1)].add(
                        -upd.reshape(B * NR, kk))
                ytop = ytop.at[TOPM].set(0.0)
            for m, fc in zip(reversed(eng.top_levels), reversed(top_f)):
                B, NC, NF = m.B, m.NC, m.NF
                ccol, crow = bufs[m.ccol], bufs[m.crow]
                rhs = jnp.take(ytop, ccol, axis=0)
                xr = jnp.take(ytop, crow, axis=0)
                x = bwd(fc, rhs, xr)
                ytop = ytop.at[ccol.reshape(-1)].set(x.reshape(B * NC, kk))
                ytop = ytop.at[TOPM].set(0.0)
            xtop = jnp.zeros((TOPM + 1, kk), dt)
            if eng.n_topcols:
                tc = bufs[eng.topcols]
                xtop = xtop.at[tc].set(ytop[tc])
            xloc = jnp.zeros((S, SENT + 1, kk), dt)
            if TOPM:
                xloc = jax.lax.dynamic_update_slice(
                    xloc, jnp.broadcast_to(xtop[:TOPM], (S, TOPM, kk)),
                    (0, Mmax, 0))
            for m, fc in zip(reversed(eng.local_levels), reversed(loc_f)):
                B, NC, NF = m.B, m.NC, m.NF
                ccol, crow = bufs[m.ccol], bufs[m.crow]
                rhs = takeS(zloc, ccol).reshape(S * B, NC, kk)
                xr = takeS(xloc, crow).reshape(S * B, NF - NC, kk)
                fcf = tuple(x.reshape((S * B,) + x.shape[2:]) for x in fc)
                x = bwd(fcf, rhs, xr)
                xloc = setS(xloc, ccol.reshape(S, B * NC),
                            x.reshape(S, B * NC, kk))
                xloc = xloc.at[:, SENT].set(0.0)
            return xloc

        return jax.jit(solve)

    def slope(fn, *args):
        out = fn(*args)
        float(jnp.sum(out))

        def run(N):
            t0 = time.perf_counter()
            o = None
            for _ in range(N):
                o = fn(*args)
            float(jnp.sum(o))
            return time.perf_counter() - t0

        best = np.inf
        for _ in range(3):
            best = min(best, (run(10) - run(2)) / 8)
        return best * 1e3

    for mode in ("full", "no_gather", "gather_only"):
        fn = variant(mode)
        ms = slope(fn, eng._bufs, loc, top, bloc)
        print(f"{mode:12s} {ms:7.1f} ms", flush=True)
    # the shipped path end-to-end (incl. in/out plans) for reference
    def shipped():
        return eng.solve_dist(fac, bs)
    out = shipped()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    o = None
    for _ in range(8):
        o = shipped()
    float(jnp.sum(o))
    t8 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2):
        o = shipped()
    float(jnp.sum(o))
    t2 = time.perf_counter() - t0
    print(f"shipped solve_dist slope: {(t8-t2)/6*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

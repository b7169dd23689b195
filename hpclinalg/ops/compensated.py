"""Compensated (double-f32) residual SpMV for extended-precision refinement.

Role: the reference reaches 1e-10 tolerances by running MUMPS in Float64
(/root/reference/test/test_utils.jl:154-157, mumps_factorization.jl). On
TPU generations where f64 is impractical, iterative refinement with an f32
factor stalls at the f32 residual noise floor (~1e-7 relative): once the
solution is accurate to ~1e-7, computing r = b - A x in f32 loses the
cancelling digits. This module computes that residual with error-free
transformations (Dekker split + two-prod + Knuth two-sum — no FMA needed),
carrying the solution as an unevaluated double-f32 pair (xh, xl), so the
refinement loop converges to ~1e-9..1e-10 relative residuals on-chip —
SuperLU-style extended refinement, built from VPU adds/muls at HBM-bound
cost (~10 flops/element on arrays the SpMV already streams).

Supported engine tiers: DIA (stencil) and ELL (general); other tiers fall
back to plain-f32 refinement at the call site.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # Dekker splitter for f32: 2^12 + 1


def _two_sum(a, b):
    """Knuth two-sum (branchless, no magnitude ordering needed)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    c = jnp.float32(_SPLIT) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker two-prod without FMA: p + err == a*b exactly."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _acc(s, c, p, e):
    """Accumulate exact product (p, e) into compensated sum (s, c)."""
    s, e2 = _two_sum(s, p)
    return s, c + (e + e2)


@lru_cache(maxsize=None)
def _dia_residual_fn(offsets: tuple, Lrow: int, bias_lo: int, bias_hi: int):
    """r = b - A (xh + xl) for the DIA engine, with the dominant A*xh in
    exact-product compensated arithmetic (the A*xl term is plain f32 — it
    is already ~1e-7 smaller)."""

    @jax.jit
    def run(dval, gh, gl, b):
        # dval (S, O, Lrow); gh/gl gathered pair (S, Gpad); b (S, Lrow)
        if bias_lo or bias_hi:
            gh = jnp.pad(gh, ((0, 0), (bias_lo, bias_hi)))
            gl = jnp.pad(gl, ((0, 0), (bias_lo, bias_hi)))
        S = gh.shape[0]
        s = jnp.zeros((S, Lrow), jnp.float32)
        c = jnp.zeros((S, Lrow), jnp.float32)
        for i, o in enumerate(offsets):
            xh = jax.lax.slice(gh, (0, bias_lo + o), (S, bias_lo + o + Lrow))
            xl = jax.lax.slice(gl, (0, bias_lo + o), (S, bias_lo + o + Lrow))
            d = dval[:, i, :]
            p, e = _two_prod(d, xh)
            s, c = _acc(s, c, p, e + d * xl)
        # r = b - s - c with the cancelling subtraction done exactly
        t, e = _two_sum(b, -s)
        return t + (e - c)

    return run


@lru_cache(maxsize=None)
def _ell_residual_fn(Lrow: int, W: int, Tpad: int):
    """ELL-tier compensated residual; the COO tail contributes in plain f32
    into the compensation slot (tail entries are the >W overflow — rare)."""

    @jax.jit
    def run(vals, cols, tvals, trows, tgidx, gh, gl, b):
        gh = jax.lax.optimization_barrier(gh)
        gl = jax.lax.optimization_barrier(gl)

        def one(v, cidx, gh1, gl1, b1, *tail):
            xh = jax.lax.optimization_barrier(
                jnp.take(gh1, cidx)).reshape(Lrow, W)
            xl = jax.lax.optimization_barrier(
                jnp.take(gl1, cidx)).reshape(Lrow, W)
            s = jnp.zeros((Lrow,), jnp.float32)
            c = jnp.zeros((Lrow,), jnp.float32)
            for w in range(W):
                vw = v[:, w]
                p, e = _two_prod(vw, xh[:, w])
                s, c = _acc(s, c, p, e + vw * xl[:, w])
            if Tpad:
                tv, tr, tg = tail
                th = jax.lax.optimization_barrier(jnp.take(gh1, tg))
                c = c.at[tr].add(tv * th, mode="drop")
            t, e = _two_sum(b1, -s)
            return t + (e - c)

        if Tpad:
            return jax.vmap(one)(vals, cols.reshape(-1, Lrow, W), gh, gl, b,
                                 tvals, trows, tgidx)
        return jax.vmap(one)(vals, cols.reshape(-1, Lrow, W), gh, gl, b)

    return run


@jax.jit
def add_double_f32(xh, xl, dx):
    """(xh, xl) + dx -> renormalized double-f32 pair."""
    s, e = _two_sum(xh, dx)
    return s, xl + e


def residual_compensated(A, plan, xh_data, xl_data, b_data):
    """Stacked-shard compensated residual r = b - A(xh+xl) for a matrix on
    the DIA or ELL tier. Returns (S, Lrow) f32, or None when the pattern's
    engine tier has no compensated path (caller falls back to plain f32)."""
    import jax.numpy as jnp

    from .spmv import _dia_values, _ell_values

    st = A.structure

    def gather(d):
        if plan.exchange.is_identity:
            L, P = d.shape[1], plan.exchange.out_pad
            if P == L:
                return d
            if P < L:
                return d[:, :P]
            return jnp.pad(d, ((0, 0), (0, P - L)))
        return plan.exchange.apply(d)

    if plan.offsets is not None:
        dval = _dia_values(A, plan).astype(jnp.float32)
        fn = _dia_residual_fn(plan.offsets, st.Lrow, plan.bias_lo,
                              plan.bias_hi)
        return fn(dval, gather(xh_data), gather(xl_data), b_data)
    if plan.ell:
        vals, tvals = _ell_values(A, plan)
        if not plan.ell_Tpad:
            tvals = trows = tgidx = vals[:, :0, 0]
        else:
            trows, tgidx = plan.ell_tail_rows, plan.ell_tail_gidx
        fn = _ell_residual_fn(st.Lrow, plan.ell_W, plan.ell_Tpad)
        return fn(vals.astype(jnp.float32), plan.ell_cols, tvals, trows,
                  tgidx, gather(xh_data), gather(xl_data), b_data)
    return None

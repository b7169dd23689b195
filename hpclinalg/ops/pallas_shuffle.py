"""Pallas TPU kernels executing a shuffle_router RoutePlan.

Three kernels mirror the numpy simulator primitive for primitive:

  Kernel A (grid over 512-row source superchunks): slab DMA + window CG +
    lane LG expand the column-sorted emission stream; banked LGs +
    selector-masked CGs bin elements into per-(superchunk, γ) regions.
    One output ref per γ keeps every write a contiguous block.
  Kernel B1 (grid over (γ, sub-block)): re-bins the γ's BIN rows to exact
    destination chunks (banked LG + selector CG) into a staging buffer.
  Kernel B2 (grid over (γ, δ)): final placement — banked LGs + one
    selector CG emit the finished (128, 128) destination chunk.

Table encoding: each CG stage stores per output tile a TRANSPOSED
relative-row table (int8 source row % 128) and a SELECTOR (uint8 code =
bank * ntiles + tile, 255 dead). Kernels loop over the statically-live
codes, compare the selector on the VPU, and accumulate masked
lane-gathers — the only data-movement ops issued are lane-gathers and
transposes, the two primitives Mosaic vectorizes (CG(X, B) =
TR(LG(TR(X), Bᵀ)), Bᵀ precomputed on host).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .shuffle_router import (CHROWS, KA, KB1, KB2, LANES, SC, SUB,
                             RoutePlan)


def _ceil(a, b):
    return -(-a // b)


def _pack_cg(brow, bank, K, P):
    """(.., rows, 128) row + bank tables -> per-128-row-tile TRANSPOSED
    (rel int8, sel uint8) tables. sel = bank * P + row//128; 255 dead."""
    lead = brow.shape[:-2]
    rows = brow.shape[-2]
    T = _ceil(rows, LANES)
    pad = T * LANES - rows
    if pad:
        padw = [(0, 0)] * len(lead) + [(0, pad), (0, 0)]
        brow = np.pad(brow, padw)
        bank = np.pad(bank, padw, constant_values=255)
    br = brow.reshape(lead + (T, LANES, LANES))
    bk = bank.reshape(lead + (T, LANES, LANES))
    rel = (br % LANES).astype(np.int8).swapaxes(-1, -2)
    sel = np.where(bk == 255, 255,
                   bk.astype(np.int64) * P + br // LANES).astype(np.uint8) \
        .swapaxes(-1, -2)
    live = sorted({int(c) for c in np.unique(sel) if c != 255})
    assert all(c < K * P for c in live), (live, K, P)
    return (np.ascontiguousarray(rel), np.ascontiguousarray(sel), live, T)


class PackedRoute:
    """Device-resident, γ-uniform kernel tables for one RoutePlan."""

    def __init__(self, plan: RoutePlan):
        self.plan = plan
        n_sc = plan.n_superchunks
        gamma, cpg = plan.gamma, plan.cpg
        self.n_sc, self.gamma, self.cpg = n_sc, gamma, cpg
        RAu = int(plan.RA.max()) if len(plan.RA) else 1
        self.RAu = RAu
        self.PA = _ceil(SC, LANES)

        # ---- kernel A -----------------------------------------------------
        self.win = jnp.asarray(plan.win.astype(np.int32))
        self.win_rel = jnp.asarray(
            plan.win_rel.reshape(n_sc, self.PA, LANES).astype(np.int32))
        self.M = jnp.asarray(
            plan.M.reshape(n_sc, SC, LANES).astype(np.int8))
        self.SA = jnp.asarray(
            plan.SA.reshape(KA, n_sc, SC, LANES).swapaxes(0, 1)
            .astype(np.int8))

        RAoff = np.concatenate([[0], np.cumsum(plan.RA)])
        # per-γ uniform regions (RAu rows each), packed (n_sc, γ, RAu, 128)
        brow_u = np.zeros((n_sc, gamma, RAu, LANES), np.int32)
        bank_u = np.full((n_sc, gamma, RAu, LANES), 255, np.uint8)
        for g in range(gamma):
            Rg = int(plan.RA[g])
            brow_u[:, g, :Rg] = plan.A_brow[:, RAoff[g]:RAoff[g] + Rg]
            bank_u[:, g, :Rg] = plan.A_bank[:, RAoff[g]:RAoff[g] + Rg]
        rel, sel, live, TAr = _pack_cg(
            brow_u.reshape(n_sc * gamma, RAu, LANES),
            bank_u.reshape(n_sc * gamma, RAu, LANES), KA, self.PA)
        self.TAr = TAr                          # tiles per (sc, γ) region
        self.A_rel = jnp.asarray(
            rel.reshape(n_sc, gamma, TAr, LANES, LANES))
        self.A_sel = jnp.asarray(
            sel.reshape(n_sc, gamma, TAr, LANES, LANES))
        self.A_live = live

        # ---- kernel B1 ----------------------------------------------------
        nsub = max(1, _ceil(n_sc * RAu, SUB))
        self.nsub = nsub
        RBu = max(int(max(rb.max() for rb in plan.RB)) if gamma else 1, 1)
        self.RBu = RBu
        S1 = np.zeros((gamma, KB1, nsub * SUB, LANES), np.int8)
        brow1 = np.zeros((gamma, nsub, cpg, RBu, LANES), np.int32)
        bank1 = np.full((gamma, nsub, cpg, RBu, LANES), 255, np.uint8)
        for g in range(gamma):
            s1 = plan.B1_S[g]
            S1[g, :, : s1.shape[1]] = s1[:KB1]
            RB = plan.RB[g]
            RBoff = np.concatenate([[0], np.cumsum(RB)])
            for d in range(cpg):
                Rd = int(RB[d])
                brow1[g, :, d, :Rd] = \
                    plan.B1_brow[g][:, RBoff[d]:RBoff[d] + Rd]
                bank1[g, :, d, :Rd] = \
                    plan.B1_bank[g][:, RBoff[d]:RBoff[d] + Rd]
        rel1, sel1, live1, TBr = _pack_cg(
            brow1.reshape(gamma * nsub * cpg, RBu, LANES),
            bank1.reshape(gamma * nsub * cpg, RBu, LANES), KB1,
            _ceil(SUB, LANES))
        self.TBr = TBr
        self.PB = _ceil(SUB, LANES)
        self.S1 = jnp.asarray(S1)
        self.B1_rel = jnp.asarray(
            rel1.reshape(gamma, nsub, cpg, TBr, LANES, LANES))
        self.B1_sel = jnp.asarray(
            sel1.reshape(gamma, nsub, cpg, TBr, LANES, LANES))
        self.B1_live = live1

        # ---- kernel B2 ----------------------------------------------------
        self.stage_rows = nsub * RBu
        self.PS = _ceil(self.stage_rows, LANES)
        stage_pad = self.PS * LANES
        S2 = np.zeros((gamma, cpg, KB2, stage_pad, LANES), np.int8)
        brow2 = np.zeros((gamma, cpg, CHROWS, LANES), np.int32)
        bank2 = np.full((gamma, cpg, CHROWS, LANES), 255, np.uint8)
        for g in range(gamma):
            RB = plan.RB[g]
            for d in range(cpg):
                Rd = int(RB[d])
                s2 = plan.B2_S[g][d]
                for sb in range(nsub):
                    S2[g, d, :, sb * RBu: sb * RBu + Rd] = \
                        s2[:KB2, sb * Rd:(sb + 1) * Rd]
                br = plan.B2_brow[g][d].astype(np.int64)
                if Rd:
                    br = (br // Rd) * RBu + br % Rd
                brow2[g, d] = br
                bank2[g, d] = plan.B2_bank[g][d]
        rel2, sel2, live2, _T2 = _pack_cg(
            brow2.reshape(gamma * cpg, CHROWS, LANES),
            bank2.reshape(gamma * cpg, CHROWS, LANES), KB2, self.PS)
        self.S2 = jnp.asarray(S2)
        self.B2_rel = jnp.asarray(
            rel2.reshape(gamma, cpg, LANES, LANES))
        self.B2_sel = jnp.asarray(
            sel2.reshape(gamma, cpg, LANES, LANES))
        self.B2_live = live2

        self.spill_src = jnp.asarray(plan.spill_src.astype(np.int32)) \
            if len(plan.spill_src) else None
        self.spill_dst = jnp.asarray(plan.spill_dst.astype(np.int32)) \
            if len(plan.spill_dst) else None

    def table_bytes(self) -> int:
        t = 0
        for a in (self.win, self.win_rel, self.M, self.SA, self.A_rel,
                  self.A_sel, self.S1, self.B1_rel, self.B1_sel, self.S2,
                  self.B2_rel, self.B2_sel):
            t += a.size * a.dtype.itemsize
        return t


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _i32(ref_val):
    return ref_val.astype(jnp.int32)


@lru_cache(maxsize=None)
def _shuffle_fns(key_shapes, A_live, B1_live, B2_live, interpret=False):
    """Builds the three jitted pallas calls for one geometry. key_shapes =
    (n_sc, gamma, cpg, RAu, TAr, nsub, RBu, TBr, PS, nrow_x)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (n_sc, gamma, cpg, RAu, TAr, nsub, RBu, TBr, PS, nrow_x) = key_shapes
    PA = _ceil(SC, LANES)

    # ---------------- kernel A -------------------------------------------
    def kern_a(win_ref, wr_ref, m_ref, sa_ref, rel_ref, sel_ref, xg_ref,
               *out_refs, slab, ce, ty, sem):
        sc = pl.program_id(0)
        q0 = win_ref[sc]
        cp = pltpu.make_async_copy(
            xg_ref.at[pl.ds(q0, LANES), :], slab, sem)
        cp.start()
        cp.wait()
        trs = slab[...].T
        wr = wr_ref[...]
        mm = _i32(m_ref[...])
        for p in range(PA):
            C = jnp.broadcast_to(wr[p:p + 1, :], (LANES, LANES))
            srt = jnp.take_along_axis(trs, C, axis=1).T     # (128,128)
            mp = mm[p * LANES:(p + 1) * LANES]
            ce[pl.ds(p * LANES, LANES), :] = \
                jnp.take_along_axis(srt, mp, axis=1)
        sa = _i32(sa_ref[...])
        cev = ce[...]
        tyv = {}
        for k in range(KA):
            yk = jnp.take_along_axis(cev, sa[k], axis=1)
            for p in range(PA):
                tyv[k, p] = yk[p * LANES:(p + 1) * LANES, :].T
        for g in range(gamma):
            for t in range(TAr):
                sel = _i32(sel_ref[g, t])
                rel = _i32(rel_ref[g, t])
                acc = jnp.zeros((LANES, LANES), jnp.float32)
                for code in A_live:
                    k, p = code // PA, code % PA
                    gth = jnp.take_along_axis(tyv[k, p], rel, axis=1)
                    acc = jnp.where(sel == code, gth, acc)
                out_refs[g][pl.ds(t * LANES, LANES), :] = acc.T

    def run_a(packed_args, xg):
        win, wr, m, sa, rel, sel = packed_args
        rows_out = TAr * LANES
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_sc,),
            in_specs=[
                pl.BlockSpec((1, PA, LANES), lambda sc, w: (sc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SC, LANES), lambda sc, w: (sc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KA, SC, LANES),
                             lambda sc, w: (sc, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gamma, TAr, LANES, LANES),
                             lambda sc, w: (sc, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gamma, TAr, LANES, LANES),
                             lambda sc, w: (sc, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((rows_out, LANES), lambda sc, w: (sc, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(gamma)),
            scratch_shapes=[
                pltpu.VMEM((LANES, LANES), jnp.float32),
                pltpu.VMEM((SC, LANES), jnp.float32),
                pltpu.VMEM((KA, PA, LANES, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )

        def body(win_s, wr_b, m_b, sa_b, rel_b, sel_b, xg_b, *rest):
            outs, (slab, ce, ty, sem) = rest[:gamma], rest[gamma:]
            kern_a(win_s, wr_b[0], m_b[0], sa_b[0], rel_b[0], sel_b[0],
                   xg_b, *outs, slab=slab, ce=ce, ty=ty, sem=sem)

        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((n_sc * rows_out, LANES), jnp.float32)
                for _ in range(gamma)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(win, wr, m, sa, rel, sel, xg)

    # ---------------- kernel B1 ------------------------------------------
    PB = _ceil(SUB, LANES)

    def kern_b1(s1_ref, rel_ref, sel_ref, bin_ref, out_ref, z, tz):
        # bin_ref: (SUB, 128) rows of this γ's BIN; tables for (γ, sb)
        binv = bin_ref[...]
        s1 = _i32(s1_ref[...])
        tzv = {}
        for k in range(KB1):
            zk = jnp.take_along_axis(binv, s1[k], axis=1)
            for p in range(PB):
                tzv[k, p] = zk[p * LANES:(p + 1) * LANES, :].T
        for d in range(cpg):
            for t in range(TBr):
                sel = _i32(sel_ref[d, t])
                rel = _i32(rel_ref[d, t])
                acc = jnp.zeros((LANES, LANES), jnp.float32)
                for code in B1_live:
                    k, p = code // PB, code % PB
                    gth = jnp.take_along_axis(tzv[k, p], rel, axis=1)
                    acc = jnp.where(sel == code, gth, acc)
                out_ref[d, pl.ds(t * LANES, LANES), :] = acc.T

    def run_b1(s1, rel, sel, bins):
        # bins: (gamma, nsub*SUB, 128); staging out:
        # (gamma, nsub, cpg, TBr*128, 128) — 5-D so kernel B2 can block-
        # select one (γ, sb, δ) region
        rows_out = TBr * LANES

        def body(s1_b, rel_b, sel_b, bin_b, out_b, z, tz):
            kern_b1(s1_b[0], rel_b[0][0], sel_b[0][0], bin_b[0],
                    out_b.at[0, 0], z, tz)


        return pl.pallas_call(
            body,
            grid=(gamma, nsub),
            in_specs=[
                pl.BlockSpec((1, KB1, SUB, LANES),
                             lambda g, sb: (g, 0, sb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cpg, TBr, LANES, LANES),
                             lambda g, sb: (g, sb, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cpg, TBr, LANES, LANES),
                             lambda g, sb: (g, sb, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUB, LANES), lambda g, sb: (g, sb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, cpg, rows_out, LANES),
                lambda g, sb: (g, sb, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (gamma, nsub, cpg, rows_out, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1,), jnp.float32),
                pltpu.VMEM((KB1, PB, LANES, LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(s1, rel, sel, bins)

    # ---------------- kernel B2 ------------------------------------------
    def kern_b2(s2_ref, rel_ref, sel_ref, stg_refs, out_ref, stage, tz):
        # assemble staging rows (nsub pieces, RBu valid rows each)
        for sb in range(nsub):
            piece = stg_refs[sb][...]
            stage[pl.ds(sb * RBu, RBu), :] = piece[:RBu]
        stg = stage[...]
        if PS * LANES > nsub * RBu:
            stg = jnp.pad(stg, ((0, PS * LANES - nsub * RBu), (0, 0)))
        s2 = _i32(s2_ref[...])
        tzv = {}
        for k in range(KB2):
            zk = jnp.take_along_axis(stg, s2[k], axis=1)
            for p in range(PS):
                tzv[k, p] = zk[p * LANES:(p + 1) * LANES, :].T
        sel = _i32(sel_ref[...])
        rel = _i32(rel_ref[...])
        acc = jnp.zeros((LANES, LANES), jnp.float32)
        for code in B2_live:
            k, p = code // PS, code % PS
            gth = jnp.take_along_axis(tzv[k, p], rel, axis=1)
            acc = jnp.where(sel == code, gth, acc)
        out_ref[...] = acc.T

    def run_b2(s2, rel, sel, staging):
        # staging: (gamma, nsub, cpg*TBr*128, 128); per (γ, δ, sb) the
        # piece at rows [(δ*TBr...) hm: B1 wrote (d, t) tiles at rows
        # (d*TBr + t)*128; region rows RBu = TBr*128 occupied (RBu <=
        # TBr*128). One input ref per sb selects its (RBu-range) block.
        stage_pad = PS * LANES

        def body(s2_b, rel_b, sel_b, *args):
            stg = args[:nsub]
            out_b, stage, tz = args[nsub], args[nsub + 1], args[nsub + 2]
            kern_b2(s2_b[0][0], rel_b[0][0], sel_b[0][0],
                    [s[0][0][0] for s in stg], out_b.at[0, 0],
                    stage=stage, tz=tz)

        in_specs = [
            pl.BlockSpec((1, 1, KB2, stage_pad, LANES),
                         lambda g, d: (g, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES, LANES), lambda g, d: (g, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES, LANES), lambda g, d: (g, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        stg_specs = [
            pl.BlockSpec((1, 1, 1, TBr * LANES, LANES),
                         (lambda sbv: (lambda g, d: (g, sbv, d, 0, 0)))(sb),
                         memory_space=pltpu.VMEM)
            for sb in range(nsub)
        ]
        return pl.pallas_call(
            body,
            grid=(gamma, cpg),
            in_specs=in_specs + stg_specs,
            out_specs=pl.BlockSpec((1, 1, CHROWS, LANES),
                                   lambda g, d: (g, d, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (gamma, cpg, CHROWS, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nsub * RBu, LANES), jnp.float32),
                pltpu.VMEM((KB2, PS, LANES, LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(s2, rel, sel, *([staging] * nsub))

    return jax.jit(run_a), jax.jit(run_b1), jax.jit(run_b2)


def shuffle_apply(packed: PackedRoute, xg: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """xg: (nsrc_padded_rows*128,)-reshapeable 1-D x buffer; returns xe
    (C2*DCH,) f32 in destination (ELL-flat) order."""
    plan = packed.plan
    nrow_x = _ceil(plan.nsrc, LANES) + LANES
    key = (packed.n_sc, packed.gamma, packed.cpg, packed.RAu, packed.TAr,
           packed.nsub, packed.RBu, packed.TBr, packed.PS, nrow_x)
    run_a, run_b1, run_b2 = _shuffle_fns(
        key, tuple(packed.A_live), tuple(packed.B1_live),
        tuple(packed.B2_live), interpret)

    x2 = jnp.zeros((nrow_x * LANES,), jnp.float32) \
        .at[: xg.shape[0]].set(xg.astype(jnp.float32)).reshape(nrow_x, LANES)
    bins = run_a((packed.win, packed.win_rel, packed.M, packed.SA,
                  packed.A_rel, packed.A_sel), x2)
    # bins: tuple per γ of (n_sc*TAr*128, 128); rows per sc = TAr*128 >=
    # RAu; B1 expects (gamma, nsub*SUB, 128) with RAu stride
    binstack = jnp.stack([
        b.reshape(packed.n_sc, packed.TAr * LANES, LANES)[:, : packed.RAu]
        .reshape(packed.n_sc * packed.RAu, LANES) for b in bins])
    pad = packed.nsub * SUB - binstack.shape[1]
    if pad > 0:
        binstack = jnp.pad(binstack, ((0, 0), (0, pad), (0, 0)))
    staging = run_b1(packed.S1, packed.B1_rel, packed.B1_sel, binstack)
    out = run_b2(packed.S2, packed.B2_rel, packed.B2_sel, staging)
    xe = out.reshape(-1)
    if packed.spill_dst is not None:
        vals = jnp.take(x2.reshape(-1), packed.spill_src)
        xe = xe.at[packed.spill_dst].set(vals)
    return xe


# ---------------------------------------------------------------------------
# SpMV engine-tier glue
# ---------------------------------------------------------------------------

def shuffle_available(backend, st) -> bool:
    """The shuffle engine tier: real-TPU platform, single shard (the
    kernels run per shard; multi-shard stacking needs per-shard geometry —
    future work), and enough work to amortize the routing passes."""
    try:
        platform = backend.mesh.devices.flat[0].platform
    except Exception:
        return False
    return (platform in ("tpu", "axon") and backend.nshards == 1
            and st.nnz >= (1 << 20))


def build_spmv_shuffle(A, plan):
    """Route plan + packed tables for A's ELL gather, cached per matrix
    structure (host build is O(nnz log nnz) numpy — the analogue of the
    reference's plan-construction phase)."""
    from ..cache import cached_plan
    from .shuffle_router import build_route

    st = A.structure

    def build():
        W = plan.ell_W
        Lrow = st.Lrow
        cols = np.asarray(plan.ell_cols).reshape(1, Lrow, W)[0]
        # mark ELL padding slots dead: slots at/after each row's length
        lens = np.zeros(Lrow, np.int64)
        ip = st.indptr[0]
        if len(ip) > 1:
            lens[: len(ip) - 1] = np.minimum(np.diff(ip), W)
        mask = np.arange(W)[None, :] < lens[:, None]
        src = np.where(mask, cols, -1).astype(np.int64).reshape(-1)
        route = build_route(src, plan.exchange.out_pad)
        return PackedRoute(route)

    return cached_plan("spmv_shuffle", ("shuffle", plan.key), build)


def shuffle_spmv(A, plan, xb, interpret: bool = False):
    """y = A @ x through the shuffle engine: xe = shuffle(x) in ELL order,
    then a pure elementwise multiply + lane reduction (no gathers) plus
    the standard COO tail. xb: (1, Lin) stacked block (identity or
    gathered). Returns (1, Lrow) f32."""
    from .spmv import _ell_values, _pad_trunc

    st = A.structure
    packed = build_spmv_shuffle(A, plan)
    g = xb if plan.exchange.is_identity else plan.exchange.apply(xb)
    g = _pad_trunc(g, plan.exchange.out_pad)
    xe = shuffle_apply(packed, g[0], interpret=interpret)
    W, Lrow = plan.ell_W, st.Lrow
    vals, tvals = _ell_values(A, plan)
    y = _shuffle_epilogue(vals.astype(jnp.float32),
                          xe, Lrow, W)
    if plan.ell_Tpad:
        tv = tvals.astype(jnp.float32)[0]
        tg = jnp.take(g[0].astype(jnp.float32), plan.ell_tail_gidx[0])
        y = y.at[0, plan.ell_tail_rows[0]].add(
            tv * tg, mode="drop")
    return y


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _shuffle_epilogue(vals, xe, Lrow, W):
    # vals (1, Lrow, W); xe (>= Lrow*W,) in ELL-flat order
    xev = jax.lax.optimization_barrier(
        xe[: Lrow * W].reshape(Lrow, W))
    return jnp.sum(vals[0] * xev, axis=1)[None]

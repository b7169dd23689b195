"""Pallas TPU kernels executing a shuffle_router RoutePlan.

Three kernels mirror the numpy simulator primitive for primitive:

  Kernel A (grid over 512-row source superchunks): slab DMA + window CG +
    lane LG expand the column-sorted emission stream; banked LGs +
    selector-masked CGs bin elements into per-(superchunk, γ) regions.
    All γ regions are PACKED contiguously (uniform pow2 stride RAu) into
    one output ref, so every 128-row masked tile is ~full of live rows.
  Kernel B1 (grid over (γ, sub-block)): re-bins a 512-row bin block to
    exact destination chunks (banked LG + selector CG). The cpg
    destination regions (uniform stride RBu) are again packed into
    ceil(cpg·RBu/128) tiles instead of one 128-row tile per region —
    this packing is what keeps the masked-select pass count proportional
    to the payload, not to the region count.
  Kernel B2 (grid over (γ, δ)): final placement — block-selects δ's
    (nsub, RBu) staging rows straight out of B1's packed output, banked
    LGs + one selector CG emit the finished (128, 128) destination chunk.

Table encoding: each CG stage stores per output tile a TRANSPOSED
relative-row table (int8 source row % 128) and a SELECTOR (uint8 code =
bank * ntiles + tile, 255 dead). Lane tables (window/lane/bank gathers)
are int8 (< 128) and widened on the VPU. Kernels loop over the
statically-live codes, compare the selector on the VPU, and accumulate
masked lane-gathers — the only data-movement ops issued are lane-gathers
and transposes, the two primitives Mosaic vectorizes (CG(X, B) =
TR(LG(TR(X), Bᵀ)), Bᵀ precomputed on host).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .shuffle_router import (CHROWS, DCH, KA, KB1, KB2, LANES, SC, SUB,
                             RoutePlan)


def _ceil(a, b):
    return -(-a // b)


def _pack_cg(brow, bank, K, P):
    """(.., rows, 128) row + bank tables -> per-128-row-tile TRANSPOSED
    (rel int8, sel uint8) tables. sel = bank * P + row//128; 255 dead.
    Integer-width-conscious: the naive int64 np.where promotion measured
    14 s over the three pack calls at 8M-emission scale."""
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
    rel = np.ascontiguousarray(
        (br & (LANES - 1)).astype(np.int8).swapaxes(-1, -2))
    sel16 = bk.astype(np.uint16) * np.uint16(P) \
        + (br >> 7).astype(np.uint16)
    sel16[bk == 255] = 255
    sel = np.ascontiguousarray(sel16.astype(np.uint8).swapaxes(-1, -2))
    counts = np.bincount(sel.reshape(-1), minlength=256)
    live = [c for c in range(255) if counts[c]]
    assert all(c < K * P for c in live), (live, K, P)
    return (rel, sel, live, T)


class _PlanStub:
    """Minimal plan facade for natively-built routes (the fields
    shuffle_apply/shuffle_spmv read)."""

    def __init__(self, nsrc, ndest, spill_dst, spill_src):
        self.nsrc, self.ndest = nsrc, ndest
        self.spill_dst, self.spill_src = spill_dst, spill_src


class PackedRoute:
    """Device-resident, geometry-uniform kernel tables for one RoutePlan."""

    @classmethod
    def from_native(cls, src_of: np.ndarray, nsrc: int, force_RAu: int = 0,
                    force_RBu: int = 0, pad_n_sc: int = 0,
                    pad_nsub: int = 0, force_KA: int = 0,
                    force_KB1: int = 0, force_KB2: int = 0) -> "PackedRoute":
        """Build the packed tables through the C++ router (native/route.cpp
        — the same algorithm as shuffle_router.build_route as fused passes
        over radix-sorted streams; ~10x the numpy build). The router also
        performs the CG-table packing (route_export_packed) and reports
        ADAPTIVE live bank counts (KAe/KB1e/KB2e <= the static budgets), so
        Python only allocates and uploads — no hundreds-of-MB numpy
        intermediates (the old _pack_cg pass measured 15 s at 8M
        emissions). Returns None if the native library is unavailable.
        force_*/pad_* impose a common geometry across shards so per-shard
        tables stack for shard_map (packing bakes tile counts into
        selector codes, so the common geometry must be known at build
        time)."""
        from ..solver.native import build_native_lib
        import ctypes

        lib = build_native_lib("hpcroute", "route.cpp")
        if lib is None or not hasattr(lib, "route_export_packed"):
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        if not getattr(lib, "_route_sigs", False):
            lib.route_build.restype = ctypes.c_void_p
            lib.route_build.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                        i64p, i64p] + [ctypes.c_int64] * 7
            lib.route_export_packed.restype = None
            lib.route_free.argtypes = [ctypes.c_void_p]
            lib._route_sigs = True
        src_of = np.ascontiguousarray(src_of, np.int64)
        geom = np.zeros(16, np.int64)
        h = lib.route_build(len(src_of), int(nsrc), src_of, geom,
                            int(force_RAu), int(force_RBu), int(pad_n_sc),
                            int(pad_nsub), int(force_KA), int(force_KB1),
                            int(force_KB2))
        try:
            (ne, T1, n_sc, C2, gamma, cpg, RAu, nsub, RBu, nspill,
             KAe, KB1e, KB2e) = (int(v) for v in geom[:13])
            PA = _ceil(SC, LANES)
            PB = _ceil(SUB, LANES)
            PS = _ceil(nsub * RBu, LANES)
            TP_A = _ceil(gamma * RAu, LANES)
            TP_B = _ceil(cpg * RBu, LANES)
            # np.empty: route_export_packed writes every byte of each table
            win = np.empty(n_sc, np.int32)
            win_rel = np.empty(T1, np.int8)
            M = np.empty((n_sc, SC, LANES), np.int8)
            SA = np.empty((n_sc, KAe, SC, LANES), np.int8)
            A_rel = np.empty((n_sc, TP_A, LANES, LANES), np.int8)
            A_sel = np.empty((n_sc, TP_A, LANES, LANES), np.uint8)
            S1 = np.empty((gamma, KB1e, nsub * SUB, LANES), np.int8)
            B1_rel = np.empty((gamma, nsub, TP_B, LANES, LANES), np.int8)
            B1_sel = np.empty((gamma, nsub, TP_B, LANES, LANES), np.uint8)
            S2 = np.empty((gamma, cpg, KB2e, nsub * RBu, LANES), np.int8)
            B2_rel = np.empty((gamma, cpg, LANES, LANES), np.int8)
            B2_sel = np.empty((gamma, cpg, LANES, LANES), np.uint8)
            live = np.zeros(3 * 256, np.uint8)
            spill_dst = np.empty(nspill, np.int64)
            spill_src = np.empty(nspill, np.int64)
            args = [win, win_rel, M, SA, A_rel, A_sel, S1, B1_rel, B1_sel,
                    S2, B2_rel, B2_sel, live, spill_dst, spill_src]
            lib.route_export_packed(ctypes.c_void_p(h), *[
                a.ctypes.data_as(ctypes.c_void_p) for a in args])
        finally:
            lib.route_free(ctypes.c_void_p(h))

        self = cls.__new__(cls)
        self.plan = _PlanStub(int(nsrc), C2 * DCH, spill_dst, spill_src)
        self.n_sc, self.gamma, self.cpg = n_sc, gamma, cpg
        self.RAu, self.nsub, self.RBu = RAu, nsub, RBu
        self.KAe, self.KB1e, self.KB2e = KAe, KB1e, KB2e
        self.SCG = SUB // RAu
        self.PA, self.PB, self.PS = PA, PB, PS
        self.TP_A, self.TP_B = TP_A, TP_B
        self.stage_rows = nsub * RBu
        self.win = jnp.asarray(win)
        self.win_rel = jnp.asarray(win_rel.reshape(n_sc, PA, LANES))
        self.M = jnp.asarray(M)
        self.SA = jnp.asarray(SA)
        self.A_rel, self.A_sel = jnp.asarray(A_rel), jnp.asarray(A_sel)
        self.A_live = [c for c in range(255) if live[c]]
        stage_pad = PS * LANES
        if stage_pad > nsub * RBu:
            S2 = np.pad(S2, ((0, 0), (0, 0), (0, 0),
                             (0, stage_pad - nsub * RBu), (0, 0)))
        self.S1 = jnp.asarray(S1)
        self.B1_rel, self.B1_sel = jnp.asarray(B1_rel), jnp.asarray(B1_sel)
        self.B1_live = [c for c in range(255) if live[256 + c]]
        self.S2 = jnp.asarray(S2)
        self.B2_rel, self.B2_sel = jnp.asarray(B2_rel), jnp.asarray(B2_sel)
        self.B2_live = [c for c in range(255) if live[512 + c]]
        self.spill_src = jnp.asarray(spill_src.astype(np.int32)) \
            if nspill else None
        self.spill_dst = jnp.asarray(spill_dst.astype(np.int32)) \
            if nspill else None
        return self

    def __init__(self, plan: RoutePlan, pad_n_sc: int = 0,
                 pad_nsub: int = 0):
        self.plan = plan
        gamma, cpg = plan.gamma, plan.cpg
        RAu, nsub = plan.RAu, plan.nsub
        nsub = max(nsub, pad_nsub, _ceil(pad_n_sc * RAu, SUB))
        n_sc = nsub * SUB // RAu            # padded so nsub*SUB = n_sc*RAu
        self.n_sc, self.gamma, self.cpg = n_sc, gamma, cpg
        self.RAu, self.nsub = RAu, nsub
        self.SCG = SUB // RAu               # superchunks per B1 sub-block
        self.PA = _ceil(SC, LANES)
        n_sc_r = plan.n_superchunks

        # ---- kernel A -----------------------------------------------------
        def _padsc(a):
            """extend leading sc dim from n_sc_r to n_sc (dead zeros)."""
            if n_sc == n_sc_r:
                return a
            pad = [(0, n_sc - n_sc_r)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, pad)

        self.win = jnp.asarray(_padsc(plan.win.astype(np.int32)))
        self.win_rel = jnp.asarray(_padsc(
            plan.win_rel.reshape(n_sc_r, self.PA, LANES).astype(np.int8)))
        self.M = jnp.asarray(_padsc(
            plan.M.reshape(n_sc_r, SC, LANES).astype(np.int8)))
        SA_np = _padsc(plan.SA.reshape(KA, n_sc_r, SC, LANES).swapaxes(0, 1)
                       .astype(np.int8))

        RAoff = np.concatenate([[0], np.cumsum(plan.RA)])
        self.TP_A = _ceil(gamma * RAu, LANES)
        brow_u = np.zeros((n_sc, self.TP_A * LANES, LANES), np.int32)
        bank_u = np.full((n_sc, self.TP_A * LANES, LANES), 255, np.uint8)
        for g in range(gamma):
            Rg = int(plan.RA[g])
            brow_u[:n_sc_r, g * RAu: g * RAu + Rg] = \
                plan.A_brow[:, RAoff[g]:RAoff[g] + Rg]
            bank_u[:n_sc_r, g * RAu: g * RAu + Rg] = \
                plan.A_bank[:, RAoff[g]:RAoff[g] + Rg]
        rel, sel, live, _ = _pack_cg(brow_u, bank_u, KA, self.PA)
        self.A_rel = jnp.asarray(rel)       # (n_sc, TP_A, 128, 128)
        self.A_sel = jnp.asarray(sel)
        self.A_live = live
        # adaptive live bank counts (match the native path's table diet)
        self.KAe = max((c // self.PA for c in live), default=0) + 1
        self.SA = jnp.asarray(SA_np[:, : self.KAe])

        # ---- kernel B1 ----------------------------------------------------
        RBu = max(int(max(rb.max() for rb in plan.RB)) if gamma else 1, 1)
        RBu = _ceil(RBu, 8) * 8             # 8-row DMA granularity
        RBu = max(RBu, getattr(plan, "force_RBu", 0))
        self.RBu = RBu
        self.TP_B = _ceil(cpg * RBu, LANES)
        S1 = np.zeros((gamma, KB1, nsub * SUB, LANES), np.int8)
        brow1 = np.zeros((gamma, nsub, self.TP_B * LANES, LANES), np.int32)
        bank1 = np.full((gamma, nsub, self.TP_B * LANES, LANES), 255,
                        np.uint8)
        for g in range(gamma):
            s1 = plan.B1_S[g]
            S1[g, :, : s1.shape[1]] = s1[:KB1]
            RB = plan.RB[g]
            RBoff = np.concatenate([[0], np.cumsum(RB)])
            nsub_g = plan.B1_brow[g].shape[0]
            for d in range(cpg):
                Rd = int(RB[d])
                brow1[g, :nsub_g, d * RBu: d * RBu + Rd] = \
                    plan.B1_brow[g][:, RBoff[d]:RBoff[d] + Rd]
                bank1[g, :nsub_g, d * RBu: d * RBu + Rd] = \
                    plan.B1_bank[g][:, RBoff[d]:RBoff[d] + Rd]
        rel1, sel1, live1, _ = _pack_cg(
            brow1.reshape(gamma * nsub, self.TP_B * LANES, LANES),
            bank1.reshape(gamma * nsub, self.TP_B * LANES, LANES), KB1,
            _ceil(SUB, LANES))
        self.PB = _ceil(SUB, LANES)
        self.KB1e = max((c // self.PB for c in live1), default=0) + 1
        self.S1 = jnp.asarray(S1[:, : self.KB1e])
        self.B1_rel = jnp.asarray(
            rel1.reshape(gamma, nsub, self.TP_B, LANES, LANES))
        self.B1_sel = jnp.asarray(
            sel1.reshape(gamma, nsub, self.TP_B, LANES, LANES))
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
            nsub_g = plan.B1_brow[g].shape[0]
            for d in range(cpg):
                Rd = int(RB[d])
                s2 = plan.B2_S[g][d]
                for sb in range(nsub_g):
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
        self.KB2e = max((c // self.PS for c in live2), default=0) + 1
        self.S2 = jnp.asarray(S2[:, :, : self.KB2e])
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
    (n_sc, gamma, cpg, RAu, TP_A, nsub, RBu, TP_B, PS, nrow_x,
    KAe, KB1e, KB2e) — the trailing three are the ADAPTIVE live bank
    counts: tables carry only live banks and the kernels compute
    per-(bank, tile) gathers ONLY for (k, p) pairs some selector code
    references (the static budgets cost both table bytes and VPU issue
    slots on dead banks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (n_sc, gamma, cpg, RAu, TP_A, nsub, RBu, TP_B, PS, nrow_x,
     KAe, KB1e, KB2e) = key_shapes
    PA = _ceil(SC, LANES)
    SCG = SUB // RAu

    def _need(live, P):
        need: dict = {}
        for code in live:
            need.setdefault(code // P, set()).add(code % P)
        return {k: sorted(ps) for k, ps in sorted(need.items())}

    needA = _need(A_live, PA)

    # ---------------- kernel A -------------------------------------------
    def kern_a(win_ref, wr_ref, m_ref, sa_ref, rel_ref, sel_ref, xg_ref,
               out_ref, slab, ce, sem):
        sc = pl.program_id(0)
        q0 = win_ref[sc]
        cp = pltpu.make_async_copy(
            xg_ref.at[pl.ds(q0, LANES), :], slab, sem)
        cp.start()
        cp.wait()
        trs = slab[...].T
        wr = _i32(wr_ref[...])
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
        for k, ps in needA.items():
            yk = jnp.take_along_axis(cev, sa[k], axis=1)
            for p in ps:
                tyv[k, p] = yk[p * LANES:(p + 1) * LANES, :].T
        for t in range(TP_A):
            sel = _i32(sel_ref[t])
            rel = _i32(rel_ref[t])
            acc = jnp.zeros((LANES, LANES), jnp.float32)
            for code in A_live:
                k, p = code // PA, code % PA
                gth = jnp.take_along_axis(tyv[k, p], rel, axis=1)
                acc = jnp.where(sel == code, gth, acc)
            out_ref[pl.ds(t * LANES, LANES), :] = acc.T

    def run_a(packed_args, xg):
        win, wr, m, sa, rel, sel = packed_args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_sc,),
            in_specs=[
                pl.BlockSpec((1, PA, LANES), lambda sc, w: (sc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SC, LANES), lambda sc, w: (sc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KAe, SC, LANES),
                             lambda sc, w: (sc, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP_A, LANES, LANES),
                             lambda sc, w: (sc, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP_A, LANES, LANES),
                             lambda sc, w: (sc, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, TP_A * LANES, LANES),
                                   lambda sc, w: (sc, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((LANES, LANES), jnp.float32),
                pltpu.VMEM((SC, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )

        def body(win_s, wr_b, m_b, sa_b, rel_b, sel_b, xg_b, out_b,
                 slab, ce, sem):
            kern_a(win_s, wr_b[0], m_b[0], sa_b[0], rel_b[0], sel_b[0],
                   xg_b, out_b.at[0], slab=slab, ce=ce, sem=sem)

        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_sc, TP_A * LANES, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(win, wr, m, sa, rel, sel, xg)

    # ---------------- kernel B1 ------------------------------------------
    PB = _ceil(SUB, LANES)

    needB1 = _need(B1_live, PB)

    def kern_b1(s1_ref, rel_ref, sel_ref, bin_ref, out_ref):
        binv = bin_ref[...].reshape(SUB, LANES)
        s1 = _i32(s1_ref[...])
        tzv = {}
        for k, ps in needB1.items():
            zk = jnp.take_along_axis(binv, s1[k], axis=1)
            for p in ps:
                tzv[k, p] = zk[p * LANES:(p + 1) * LANES, :].T
        for t in range(TP_B):
            sel = _i32(sel_ref[t])
            rel = _i32(rel_ref[t])
            acc = jnp.zeros((LANES, LANES), jnp.float32)
            for code in B1_live:
                k, p = code // PB, code % PB
                gth = jnp.take_along_axis(tzv[k, p], rel, axis=1)
                acc = jnp.where(sel == code, gth, acc)
            out_ref[pl.ds(t * LANES, LANES), :] = acc.T

    def run_b1(s1, rel, sel, aout):
        # aout: (n_sc, TP_A*128, 128) from kernel A; bin block for (γ, sb)
        # = SCG superchunks × RAu packed region rows, reshaped to (512, 128)
        def body(s1_b, rel_b, sel_b, bin_b, out_b):
            kern_b1(s1_b[0], rel_b[0][0], sel_b[0][0], bin_b,
                    out_b.at[0, 0])

        return pl.pallas_call(
            body,
            grid=(gamma, nsub),
            in_specs=[
                pl.BlockSpec((1, KB1e, SUB, LANES),
                             lambda g, sb: (g, 0, sb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TP_B, LANES, LANES),
                             lambda g, sb: (g, sb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TP_B, LANES, LANES),
                             lambda g, sb: (g, sb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SCG, RAu, LANES),
                             lambda g, sb: (sb, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, TP_B * LANES, LANES),
                lambda g, sb: (g, sb, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (gamma, nsub, TP_B * LANES, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(s1, rel, sel, aout)

    # ---------------- kernel B2 ------------------------------------------
    needB2 = _need(B2_live, PS)

    def kern_b2(s2_ref, rel_ref, sel_ref, stg_ref, out_ref):
        stg = stg_ref[...].reshape(nsub * RBu, LANES)
        if PS * LANES > nsub * RBu:
            stg = jnp.pad(stg, ((0, PS * LANES - nsub * RBu), (0, 0)))
        s2 = _i32(s2_ref[...])
        tzv = {}
        for k, ps in needB2.items():
            zk = jnp.take_along_axis(stg, s2[k], axis=1)
            for p in ps:
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
        # staging: (gamma, nsub, TP_B*128, 128); δ's region = RBu rows at
        # offset δ*RBu of dim 2 across all nsub sub-blocks — one block ref
        stage_pad = PS * LANES

        def body(s2_b, rel_b, sel_b, stg_b, out_b):
            kern_b2(s2_b[0][0], rel_b[0][0], sel_b[0][0], stg_b[0],
                    out_b.at[0, 0])

        return pl.pallas_call(
            body,
            grid=(gamma, cpg),
            in_specs=[
                pl.BlockSpec((1, 1, KB2e, stage_pad, LANES),
                             lambda g, d: (g, d, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANES, LANES),
                             lambda g, d: (g, d, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANES, LANES),
                             lambda g, d: (g, d, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsub, RBu, LANES),
                             lambda g, d: (g, 0, d, 0),
                             memory_space=pltpu.VMEM),
            ],
            # chunk id is d * gamma + g (γ interleaved over chunks) — write
            # each (γ, δ) block straight to its chunk slot so reshape(-1)
            # of the output IS destination order
            out_specs=pl.BlockSpec((1, 1, CHROWS, LANES),
                                   lambda g, d: (d, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (cpg, gamma, CHROWS, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(s2, rel, sel, staging)

    return jax.jit(run_a), jax.jit(run_b1), jax.jit(run_b2)


def shuffle_apply(packed: PackedRoute, xg: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """xg: (nsrc_padded_rows*128,)-reshapeable 1-D x buffer; returns xe
    (C2*DCH,) f32 in destination order."""
    plan = packed.plan
    nrow_x = _ceil(plan.nsrc, LANES) + LANES
    key = (packed.n_sc, packed.gamma, packed.cpg, packed.RAu, packed.TP_A,
           packed.nsub, packed.RBu, packed.TP_B, packed.PS, nrow_x,
           packed.KAe, packed.KB1e, packed.KB2e)
    run_a, run_b1, run_b2 = _shuffle_fns(
        key, tuple(packed.A_live), tuple(packed.B1_live),
        tuple(packed.B2_live), interpret)

    x2 = jnp.zeros((nrow_x * LANES,), jnp.float32) \
        .at[: xg.shape[0]].set(xg.astype(jnp.float32)).reshape(nrow_x, LANES)
    aout = run_a((packed.win, packed.win_rel, packed.M, packed.SA,
                  packed.A_rel, packed.A_sel), x2)
    staging = run_b1(packed.S1, packed.B1_rel, packed.B1_sel, aout)
    out = run_b2(packed.S2, packed.B2_rel, packed.B2_sel, staging)
    xe = out.reshape(-1)[: plan.ndest]
    if packed.spill_dst is not None:
        vals = jnp.take(x2.reshape(-1), packed.spill_src)
        xe = xe.at[packed.spill_dst].set(vals)
    return xe


# ---------------------------------------------------------------------------
# SpMV engine-tier glue
# ---------------------------------------------------------------------------

def shuffle_available(backend, st) -> bool:
    """The shuffle engine tier: real-TPU platform and enough work to
    amortize the routing passes. Multi-shard meshes stack per-shard routes
    built with a COMMON geometry (forced RAu/RBu, padded sc/nsub dims) and
    run the same kernels as the per-shard body inside shard_map."""
    try:
        platform = backend.mesh.devices.flat[0].platform
    except Exception:
        return False
    return (platform in ("tpu", "axon")
            and st.nnz >= (1 << 20) * backend.nshards)


def build_spmv_shuffle(A, plan, xlen):
    """Route plan + packed tables for A's ELL gather, cached per matrix
    structure (host build is O(nnz log nnz) numpy — the analogue of the
    reference's plan-construction phase). Two TPU-first choices:
    (1) destination order is ROW-MAJOR ELL (dest = r*W + w), which makes
    every destination chunk — and hence every routing group γ/δ at every
    binning level — a pure function of the destination ROW, statistically
    independent of the column-sorted source stream. (Column-major ELL
    makes γ the slot index w, which correlates perfectly with the source
    column: measured RAu=512, 1.4 GB tables, 32 ms/SpMV. Row-major:
    balanced bins at every level.) (2) the compressed-column-space map
    (st.col_indices) is COMPOSED into the route sources, so the engine
    reads the RAW x buffer — the per-call compression gather (a
    scalar-issue take of ~|cols| elements) disappears entirely."""
    from ..cache import cached_plan
    from .shuffle_router import build_route

    st = A.structure

    def _shard_src(s, compose_ci):
        """Sublane-grouped destination source vector of shard s.
        compose_ci: single-shard reads the RAW x buffer (the compression
        map is composed into the route); multi-shard reads the GATHERED
        halo buffer, which is already in compressed-column order."""
        W = plan.ell_W
        Lrow = st.Lrow
        cols_all = getattr(plan, "ell_cols_np", None)
        if cols_all is None:  # plans built before the host copy existed
            cols_all = np.asarray(plan.ell_cols)
        cols = cols_all.reshape(-1, Lrow, W)[s]
        # mark ELL padding slots dead: slots at/after each row's length
        lens = np.zeros(Lrow, np.int64)
        ip = st.indptr[s]
        if len(ip) > 1:
            lens[: len(ip) - 1] = np.minimum(np.diff(ip), W)
        mask = np.arange(W)[None, :] < lens[:, None]
        src = np.where(mask, cols, -1).astype(np.int64)
        if compose_ci:
            ci = st.col_indices[s]
            if len(ci):
                src = np.where(src >= 0, ci[np.clip(src, 0, len(ci) - 1)],
                               -1)
        # per-row slot ROTATION by hash(r) (values rotated identically in
        # _ell_values_bi): CSR columns are sorted, so slot w correlates
        # with the column — without the rotation the routing groups of
        # pass B2 concentrate on few final lanes and its banks overflow
        # (measured 641k spills = 7.7%). The hash must be independent of
        # r's LOW bits (a plain r % W rotation stays correlated with the
        # lane structure — measured: no improvement).
        src = np.take_along_axis(src, _slot_perm(Lrow, W), axis=1)
        # SUBLANE-GROUPED destination layout: dest = (r//128)·(128·W)
        # + w·128 + (r%128), i.e. xe reshaped (nb, W, 128) holds row r's
        # W slots in ONE lane across W consecutive sublanes. The epilogue
        # y = Σ_w v·xe is then a native sublane-axis reduce — the naive
        # (Lrow, W) layout puts W in the lane dim (8 of 128 lanes live)
        # and measured 3.0 ms of pure relayout per SpMV.
        nb = _ceil(Lrow, LANES)
        srcp = np.full((nb * LANES, W), -1, np.int64)
        srcp[:Lrow] = src
        return np.ascontiguousarray(
            srcp.reshape(nb, LANES, W).transpose(0, 2, 1)).reshape(-1)

    def build():
        S = A.backend.nshards
        if S == 1:
            src_bi = _shard_src(0, compose_ci=True)
            packed = PackedRoute.from_native(src_bi, xlen)
            if packed is not None:
                return packed
            route = build_route(src_bi, xlen)  # numpy fallback (oracle)
            return PackedRoute(route)
        # multi-shard: per-shard routes rebuilt under a COMMON geometry
        # (max RAu/RBu/n_sc/nsub/bank counts across shards) so the tables
        # stack with a leading shard dim and the same kernels run inside
        # shard_map
        srcs = [_shard_src(s, compose_ci=False) for s in range(S)]
        routes = [PackedRoute.from_native(srcs[s], xlen) for s in range(S)]
        if any(r is None for r in routes):
            routes = [PackedRoute(build_route(srcs[s], xlen))
                      for s in range(S)]
        RAu = max(r.RAu for r in routes)
        RBu = max(r.RBu for r in routes)
        n_sc = max(r.n_sc for r in routes)
        nsub = max(_ceil(n_sc * RAu, SUB), *(r.nsub for r in routes))
        KAe = max(r.KAe for r in routes)
        KB1e = max(r.KB1e for r in routes)
        KB2e = max(r.KB2e for r in routes)
        rebuilt = []
        for s in range(S):
            r = PackedRoute.from_native(srcs[s], xlen, force_RAu=RAu,
                                        force_RBu=RBu, pad_n_sc=n_sc,
                                        pad_nsub=nsub, force_KA=KAe,
                                        force_KB1=KB1e, force_KB2=KB2e)
            if r is None:
                rp = build_route(srcs[s], xlen, force_RAu=RAu,
                                 force_RBu=RBu)
                r = PackedRoute(rp, pad_n_sc=n_sc, pad_nsub=nsub)
            rebuilt.append(r)
        if rebuilt[0].__class__ is PackedRoute and any(
                (r.KAe, r.KB1e, r.KB2e) != (KAe, KB1e, KB2e)
                for r in rebuilt):
            _pad_banks(rebuilt, KAe, KB1e, KB2e)  # numpy-fallback stacks
        return _StackedRoutes(rebuilt)

    def build_or_load():
        import hashlib
        import os

        d = _route_cache_dir()
        if d is None:
            return build()
        keyh = hashlib.blake2b(
            repr(("shuffle-bi", _ROUTE_FORMAT, plan.key, xlen)).encode(),
            digest_size=12).hexdigest()
        path = os.path.join(d, f"route-{keyh}.npz")
        if os.path.exists(path):
            try:
                r = load_route(path)
                r.from_disk = True  # provenance for benchmarks/diagnostics
                return r
            except Exception:  # corrupt/stale entry: rebuild
                try:
                    os.unlink(path)
                except OSError:
                    pass
        r = build()
        r.from_disk = False
        try:
            save_route(r, path)
            cap = int(os.environ.get("HPCLINALG_ROUTE_CACHE_BYTES",
                                     4 << 30))
            _sweep_route_cache(d, cap)
        except Exception:
            pass  # persistence is best-effort; the route itself is good
        return r

    return cached_plan("spmv_shuffle", ("shuffle-bi", plan.key, xlen),
                       build_or_load)


def _pad_banks(routes, KAe, KB1e, KB2e):
    """Pad numpy-fallback routes' bank dims to a common live count (dead
    banks: zero tables, never referenced by any selector code)."""
    for r in routes:
        if r.KAe < KAe:
            r.SA = jnp.asarray(np.pad(np.asarray(r.SA),
                                      ((0, 0), (0, KAe - r.KAe),
                                       (0, 0), (0, 0))))
            r.KAe = KAe
        if r.KB1e < KB1e:
            r.S1 = jnp.asarray(np.pad(np.asarray(r.S1),
                                      ((0, 0), (0, KB1e - r.KB1e),
                                       (0, 0), (0, 0))))
            r.KB1e = KB1e
        if r.KB2e < KB2e:
            r.S2 = jnp.asarray(np.pad(np.asarray(r.S2),
                                      ((0, 0), (0, 0),
                                       (0, KB2e - r.KB2e),
                                       (0, 0), (0, 0))))
            r.KB2e = KB2e


class _StackedRoutes:
    """Per-shard PackedRoutes under one common geometry, tables stacked
    with a leading shard dim for shard_map dispatch."""

    def __init__(self, routes):
        r0 = routes[0]
        for k in ("n_sc", "gamma", "cpg", "RAu", "nsub", "RBu", "TP_A",
                  "TP_B", "PS", "PA", "PB", "SCG", "stage_rows",
                  "KAe", "KB1e", "KB2e"):
            vals = {getattr(r, k) for r in routes}
            assert len(vals) == 1, (k, vals)
            setattr(self, k, vals.pop())
        self.routes = routes
        self.plan = r0.plan
        self.A_live = sorted({c for r in routes for c in r.A_live})
        self.B1_live = sorted({c for r in routes for c in r.B1_live})
        self.B2_live = sorted({c for r in routes for c in r.B2_live})
        for k in ("win", "win_rel", "M", "SA", "A_rel", "A_sel", "S1",
                  "B1_rel", "B1_sel", "S2", "B2_rel", "B2_sel"):
            setattr(self, k, jnp.stack([getattr(r, k) for r in routes]))
        # spill: pad per-shard lists to the max count; padding rows point
        # one past the shard length so mode='drop' discards them
        nspill = max((0 if r.spill_dst is None else int(r.spill_dst.shape[0])
                      for r in routes), default=0)
        self.nspill = nspill
        self.spill_dst = None
        self.spill_src = None
        if nspill:
            ds, ss = [], []
            for r in routes:
                d = (np.asarray(r.spill_dst) if r.spill_dst is not None
                     else np.zeros(0, np.int64))
                s_ = (np.asarray(r.spill_src) if r.spill_src is not None
                      else np.zeros(0, np.int64))
                pad = nspill - len(d)
                ds.append(np.pad(d, (0, pad),
                                 constant_values=self.plan.ndest))
                ss.append(np.pad(s_, (0, pad)))
            self.spill_dst = jnp.asarray(np.stack(ds).astype(np.int64))
            self.spill_src = jnp.asarray(np.stack(ss).astype(np.int32))

    def table_bytes(self) -> int:
        return sum(r.table_bytes() for r in self.routes)


# ---------------------------------------------------------------------------
# route persistence — the plan analogue of the XLA compile disk cache.
#
# A 1M x 8nnz route build is ~10 s of host analysis; the resulting tables
# are pure functions of (matrix structure, x partition), the same key the
# in-process plan cache uses. Persisting them means a session — or a later
# process — pays the build once per structure (the ref's plans are
# per-session objects, sparse.jl:1875-1984; the compiled-artifact disk
# cache is the TPU-native extension, matching enable_compile_cache).
# ---------------------------------------------------------------------------

_TABLE_KEYS = ("win", "win_rel", "M", "SA", "A_rel", "A_sel", "S1",
               "B1_rel", "B1_sel", "S2", "B2_rel", "B2_sel")
_GEOM_KEYS = ("n_sc", "gamma", "cpg", "RAu", "nsub", "RBu", "KAe", "KB1e",
              "KB2e", "SCG", "PA", "PB", "PS", "TP_A", "TP_B", "stage_rows")
_ROUTE_FORMAT = 2          # bump to invalidate persisted routes (2: RBu/bank-cap diet)
_route_cache_default = None  # set by config.enable_route_cache


def _route_dict(r: "PackedRoute", prefix: str = "") -> dict:
    d = {prefix + "geom": np.array([getattr(r, k) for k in _GEOM_KEYS],
                                   np.int64),
         prefix + "plan_meta": np.array([r.plan.nsrc, r.plan.ndest],
                                        np.int64),
         prefix + "spill_dst": np.asarray(r.plan.spill_dst, np.int64),
         prefix + "spill_src": np.asarray(r.plan.spill_src, np.int64)}
    for k in _TABLE_KEYS:
        d[prefix + k] = np.asarray(getattr(r, k))
    for k in ("A_live", "B1_live", "B2_live"):
        d[prefix + k] = np.asarray(getattr(r, k), np.int64)
    return d


def _route_from_dict(z, prefix: str = "") -> "PackedRoute":
    r = PackedRoute.__new__(PackedRoute)
    for k, v in zip(_GEOM_KEYS, z[prefix + "geom"]):
        setattr(r, k, int(v))
    nsrc, ndest = (int(v) for v in z[prefix + "plan_meta"])
    sd = np.ascontiguousarray(z[prefix + "spill_dst"])
    ss = np.ascontiguousarray(z[prefix + "spill_src"])
    r.plan = _PlanStub(nsrc, ndest, sd, ss)
    for k in _TABLE_KEYS:
        setattr(r, k, jnp.asarray(z[prefix + k]))
    for k in ("A_live", "B1_live", "B2_live"):
        setattr(r, k, [int(c) for c in z[prefix + k]])
    r.spill_dst = jnp.asarray(sd.astype(np.int32)) if len(sd) else None
    r.spill_src = jnp.asarray(ss.astype(np.int32)) if len(ss) else None
    return r


def save_route(packed, path: str) -> None:
    """Persist a PackedRoute/_StackedRoutes as an uncompressed .npz,
    written atomically (temp + rename) so interrupted runs never leave a
    truncated entry (same discipline as config._make_cache_writes_atomic)."""
    import os
    import uuid

    if isinstance(packed, _StackedRoutes):
        d = {"n_routes": np.int64(len(packed.routes))}
        for i, r in enumerate(packed.routes):
            d.update(_route_dict(r, f"r{i}_"))
    else:
        d = {"n_routes": np.int64(0)}
        d.update(_route_dict(packed))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # np.savez appends '.npz' unless the name already ends with it
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp.npz"
    try:
        np.savez(tmp, **d)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_route(path: str):
    """Load a route persisted by save_route (device upload happens here)."""
    with np.load(path) as z:
        n = int(z["n_routes"])
        if n == 0:
            return _route_from_dict(z)
        return _StackedRoutes([_route_from_dict(z, f"r{i}_")
                               for i in range(n)])


def _route_cache_dir():
    import os

    env = os.environ.get("HPCLINALG_ROUTE_CACHE")
    if env is not None:
        return None if env in ("", "0") else env
    return _route_cache_default


def _sweep_route_cache(d: str, keep_bytes: int) -> None:
    """Drop oldest entries (by mtime) until the dir fits keep_bytes."""
    import os

    try:
        ents = []
        for name in os.listdir(d):
            full = os.path.join(d, name)
            if name.endswith(".tmp.npz"):
                os.unlink(full)
                continue
            if name.endswith(".npz"):
                st = os.stat(full)
                ents.append((st.st_mtime, st.st_size, full))
        total = sum(e[1] for e in ents)
        for mt, sz, full in sorted(ents):
            if total <= keep_bytes:
                break
            os.unlink(full)
            total -= sz
    except OSError:
        pass


@lru_cache(maxsize=None)
def _spmv_pipeline(key_shapes, A_live, B1_live, B2_live, Lrow, W, Tpad,
                   pad_to, has_spill, interpret=False):
    """ONE jitted executable for the whole shuffle SpMV: pad → kernel A →
    B1 → B2 → spill scatter → per-row W-slot reduce → COO tail. A single
    device dispatch per product (the per-op dispatch chain measured ~3×
    the kernel time through the remote relay)."""
    run_a, run_b1, run_b2 = _shuffle_fns(
        key_shapes, A_live, B1_live, B2_live, interpret)
    nrow_x = key_shapes[9]  # (..., PS, nrow_x, KAe, KB1e, KB2e)

    nb = _ceil(Lrow, LANES)

    def whole(tables, xb, vbi, spill, tail):
        (win, wr, m, sa, arel, asel, s1, b1rel, b1sel,
         s2, b2rel, b2sel) = tables
        g = xb[0].astype(jnp.float32)
        gl = g.shape[0]
        if gl > pad_to:
            g = g[:pad_to]
        # barrier: keep the scatter producer out of the gather consumers
        # below (a fused producer forces XLA's scalar gather emitter)
        x2 = jax.lax.optimization_barrier(
            jnp.zeros((nrow_x * LANES,), jnp.float32)
            .at[: min(gl, pad_to)].set(g)).reshape(nrow_x, LANES)
        aout = run_a((win, wr, m, sa, arel, asel), x2)
        staging = run_b1(s1, b1rel, b1sel, aout)
        out = run_b2(s2, b2rel, b2sel, staging)
        xe = jax.lax.optimization_barrier(
            out.reshape(-1)[: nb * W * LANES]).reshape(nb, W, LANES)
        y = jnp.sum(vbi * xe, axis=1).reshape(nb * LANES)[:Lrow]
        if has_spill:
            # spilled dest slots are exactly the slots NO bank wrote (their
            # selector is dead), so xe there is 0 — add the contribution
            # straight into y instead of scattering into the 33 MB xe
            # buffer (that scatter fused into the reduce costs ~20 ms).
            spill_src, spill_row, spill_val = spill
            sv = jax.lax.optimization_barrier(
                jnp.take(x2.reshape(-1), spill_src))
            y = y.at[spill_row].add(spill_val * sv, mode="drop",
                                    indices_are_sorted=True)
        if Tpad:
            tvals, trows, tgidx = tail
            y = y.at[trows].add(
                tvals.astype(jnp.float32) * jnp.take(g, tgidx),
                mode="drop")
        return y[None]

    return jax.jit(whole)


def shuffle_spmv(A, plan, xb, interpret: bool = False):
    """y = A @ x through the shuffle engine: xe = shuffle(x) in
    sublane-grouped ELL order, then a pure elementwise multiply + sublane
    reduction (no gathers) plus the standard COO tail. xb: (S, Lin)
    stacked block (identity or gathered). Returns (S, Lrow) f32. On
    multi-shard meshes the same pipeline runs as the per-shard body
    inside shard_map over stacked common-geometry tables."""
    from .spmv import _ell_values

    st = A.structure
    S = A.backend.nshards
    xlen = int(xb.shape[1])          # raw x buffer — no compression gather
    packed = build_spmv_shuffle(A, plan, xlen)
    W, Lrow = plan.ell_W, st.Lrow
    stacked = isinstance(packed, _StackedRoutes)
    vrm = _ell_values_bi(A, plan, stacked=stacked)
    nrow_x = _ceil(packed.plan.nsrc, LANES) + LANES
    key = (packed.n_sc, packed.gamma, packed.cpg, packed.RAu, packed.TP_A,
           packed.nsub, packed.RBu, packed.TP_B, packed.PS, nrow_x,
           packed.KAe, packed.KB1e, packed.KB2e)
    has_spill = packed.spill_dst is not None
    fn = _spmv_pipeline(
        key, tuple(packed.A_live), tuple(packed.B1_live),
        tuple(packed.B2_live), Lrow, W, plan.ell_Tpad,
        xlen, has_spill, interpret)
    tables = (packed.win, packed.win_rel, packed.M, packed.SA,
              packed.A_rel, packed.A_sel, packed.S1, packed.B1_rel,
              packed.B1_sel, packed.S2, packed.B2_rel, packed.B2_sel)
    spill = _spill_epilogue_tables(A, plan, packed, vrm, W,
                                   stacked=stacked) if has_spill else ()
    if plan.ell_Tpad:
        _, tvals = _ell_values(A, plan)
        if stacked:
            tail = (tvals, plan.ell_tail_rows,
                    _tail_gidx_raw(A, plan, stacked=True))
        else:
            tail = (tvals[0], plan.ell_tail_rows[0],
                    _tail_gidx_raw(A, plan))
    else:
        tail = ()
    if not stacked:
        return fn(tables, xb, vrm, spill, tail)
    return _sharded_pipeline(fn, A.backend.mesh)(tables, xb, vrm, spill,
                                                 tail)


@lru_cache(maxsize=None)
def _sharded_pipeline(fn, mesh):
    """Wrap the per-shard pipeline body over the mesh: every argument
    carries a leading shard dim; each device sees its (1, ...) block and
    runs the identical kernels."""
    from ..backend import AXIS
    from jax.sharding import PartitionSpec as P

    def body(tables, xb, vrm, spill, tail):
        t1 = tuple(a[0] for a in tables)
        sp = tuple(a[0] for a in spill) if spill else ()
        tl = tuple(a[0] for a in tail) if tail else ()
        return fn(t1, xb, vrm[0], sp, tl)

    def spec(tree):
        return jax.tree.map(lambda _: P(AXIS), tree)

    def run(tables, xb, vrm, spill, tail):
        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec(tables), P(AXIS), P(AXIS), spec(spill),
                      spec(tail)),
            out_specs=P(AXIS), check_vma=False)
        return sm(tables, xb, vrm, spill, tail)

    return jax.jit(run)


def _spill_epilogue_tables(A, plan, packed, vbi, W, stacked=False):
    """Static per-matrix spill tables for the y-side epilogue: the
    destination row (decoded from the sublane-grouped dest index) and the
    matrix value at the spilled slot (gathered once from vbi, cached).
    Rows are pre-sorted so the scatter-add can use the sorted path.
    Stacked routes carry per-shard (S, nspill) tables; padding entries
    decode to rows >= Lrow and are dropped by the scatter."""
    cache = A._engine_cache
    hit = cache.get(("spill_epi", plan.key))
    if hit is not None:
        return hit
    dst = np.asarray(packed.spill_dst, np.int64)
    # dest = b·(128·W) + w·128 + l ; row = b·128 + l
    rows = (dst // (LANES * W)) * LANES + dst % LANES
    o = np.argsort(rows, axis=-1, kind="stable")
    if stacked:
        rows_s = np.take_along_axis(rows, o, axis=-1)
        dst_s = np.take_along_axis(dst, o, axis=-1)
        src_s = np.take_along_axis(np.asarray(packed.spill_src, np.int64),
                                   o, axis=-1)
        spill_row = jnp.asarray(rows_s.astype(np.int32))
        nb_el = int(np.prod(vbi.shape[1:]))
        spill_val = jax.device_put(jax.vmap(
            lambda v, d: jnp.take(v.reshape(-1), d, mode="fill",
                                  fill_value=0.0))(
            vbi, jnp.asarray(np.minimum(dst_s, nb_el - 1))))
        spill_src = jnp.asarray(src_s.astype(np.int32))
    else:
        spill_row = jnp.asarray(rows[o].astype(np.int32))
        spill_val = jax.device_put(
            jnp.take(vbi.reshape(-1), jnp.asarray(dst[o])))
        spill_src = jnp.asarray(np.asarray(packed.spill_src)[o])
    out = (spill_src, spill_row, spill_val)
    cache[("spill_epi", plan.key)] = out
    return out


def _tail_gidx_raw(A, plan, stacked=False):
    """COO-tail gather indices. Single-shard: composed with the
    compressed-column map so the tail reads the raw x buffer like the
    main engine. Stacked (multi-shard): the gathered halo buffer is
    already in compressed order — use the plan indices as-is."""
    cache = A._engine_cache
    hit = cache.get(("tail_raw", plan.key, stacked))
    if hit is not None:
        return hit
    st = A.structure
    if stacked:
        out = jnp.asarray(plan.ell_tail_gidx_np.astype(np.int32))
    else:
        ci = st.col_indices[0]
        tg = plan.ell_tail_gidx_np[0].astype(np.int64)
        raw = ci[np.clip(tg, 0, max(len(ci) - 1, 0))] if len(ci) else tg
        out = jnp.asarray(raw.astype(np.int32))
    cache[("tail_raw", plan.key, stacked)] = out
    return out


def _slot_perm(Lrow: int, W: int) -> np.ndarray:
    """(Lrow, W) int32 per-row slot permutation: row r's slots rotated by
    a multiplicative hash of r (Knuth constant, top bits) so the rotation
    is independent of r's low bits."""
    r = np.arange(Lrow, dtype=np.uint32)
    rot = ((r * np.uint32(2654435761)) >> np.uint32(16)).astype(np.int64) % W
    return ((np.arange(W)[None, :] - rot[:, None]) % W).astype(np.int32)


def _ell_values_bi(A, plan, stacked=False):
    """Sublane-grouped (nb, W, 128) — or stacked (S, nb, W, 128) — f32
    ELL value table, cached per matrix, with each row's slots permuted by
    _slot_perm — the same per-row permutation build_spmv_shuffle applies
    to the route sources (y[r] = Σ_w v·xe is invariant to a per-row slot
    permutation applied to both)."""
    from .spmv import _ell_values

    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    hit = cache.get(("ell_bi", plan.key, stacked))
    if hit is not None:
        return hit
    vals, _ = _ell_values(A, plan)              # (S, Lrow, W)
    S, Lrow, W = vals.shape
    nb = _ceil(Lrow, LANES)
    perm = jax.device_put(_slot_perm(Lrow, W)[None])
    vr = jnp.take_along_axis(vals.astype(jnp.float32),
                             jnp.broadcast_to(perm, (S, Lrow, W)), axis=2)
    vr = jnp.pad(vr, ((0, 0), (0, nb * LANES - Lrow), (0, 0)))
    vbi = jnp.transpose(vr.reshape(S, nb, LANES, W), (0, 1, 3, 2))
    vbi = jax.device_put(vbi if stacked else vbi[0])
    cache[("ell_bi", plan.key, stacked)] = vbi
    return vbi

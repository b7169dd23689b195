"""Host router for the Pallas static-shuffle SpMV engine.

Role: the general-sparsity gather kernel the reference gets from its
KernelAbstractions CSR kernel (/root/reference/src/sparse.jl:2055). On TPU
there is no vectorized random gather: XLA's gather is scalar-issue-bound
(~100-140 M elem/s measured on v5e with synchronous readback), and Mosaic
exposes exactly two vectorized data-movement primitives on (R, 128) tiles:

    LG(X, S)[i, j] = X[i, S[i, j]]        (lane gather, within a row)
    TR(X)[i, j]    = X[j, i]              (transpose)
    => CG(X, B)[i, j] = X[B[i, j], j]     (TR-LG-TR: any sublane, own lane)

This module compiles ONE static gather  xe[D] = x[src_of[D]]  (the ELL
x-expansion of a sparse matrix — every table is a pure function of the
STRUCTURE; values never move) into a two-pass routing program:

  Pass A (grid over 512-row source superchunks):
    1. expansion: the emission stream is COLUMN-SORTED, so each ce row
       reads one 128-wide window of x: slab DMA + CG (window select) +
       LG (lane within window);
    2. binning into per-(superchunk, super-group) HBM regions. Elements
       fill regions sorted by source row — runs per row are <= 128, so
       this stage is CONFLICT-FREE (single bank) by construction.
  Pass B (grid over super-groups of destination chunks):
    3. second-level binning to exact destination chunks (VMEM-local),
       filled round-robin over final lanes so that
    4. exact placement per destination chunk needs only ~2 banks.

Duplicated reads (one x element feeding many dest slots) are free: LG/CG
may read an element any number of times. Conflicts beyond the bank budget
and pathological window spans spill to a tiny COO list handled by the XLA
epilogue (plan-reported, typically <1%).

Balance is the whole game: routing-group assignments must be
statistically INDEPENDENT of the (column-sorted) source stream, or single
bins swallow whole superchunks and the packed regions/tables blow up.
Hence (a) γ is interleaved over destination chunks (chunk % gamma), and
(b) the SpMV glue (pallas_shuffle.build_spmv_shuffle) lays destinations
out so chunk ids are functions of the destination ROW and rotates ELL
slots per row by a hash of r (measured on the 1M×1M / 8-nnz-per-row
random SpMV: these three choices together take the route from RAu=512 /
1.4 GB tables / 32 ms to RAu=64 / 0.3 GB / 7.4 ms on v5e).

`simulate()` executes the emitted tables with numpy LG/TR semantics — the
kernels in pallas_shuffle.py mirror it op for op.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LANES = 128
SC = 512            # source superchunk rows (pass-A grid unit)
CHROWS = 128        # dest chunk rows
DCH = CHROWS * LANES
KA = 6              # banks: pass-A binning
KB1 = 5             # banks: pass-B first-level binning
KB2 = 5             # banks: pass-B exact placement
SUB = 512           # pass-B sub-block rows


def _lg(X, S):
    return np.take_along_axis(X, S, axis=1)


def _cg(X, B):
    return np.take_along_axis(X, B, axis=0)


def _cumcount_sorted(ks):
    """Rank within key group for an ALREADY-SORTED key array — O(n), no
    sort. (The general _cumcount pays an argsort; most call sites in
    build_route operate on keys that are sorted by construction.)"""
    n = len(ks)
    if n == 0:
        return np.zeros(0, np.int64)
    new = np.empty(n, bool)
    new[0] = True
    np.not_equal(ks[1:], ks[:-1], out=new[1:])
    grp_start = np.flatnonzero(new)
    return np.arange(n, dtype=np.int64) - np.repeat(
        grp_start, np.diff(np.concatenate([grp_start, [n]])))


def _cumcount(keys):
    """Rank of each element within its key group (keys int64)."""
    order = np.argsort(keys, kind="stable")
    out = np.empty(len(keys), np.int64)
    out[order] = _cumcount_sorted(keys[order])
    return out


@dataclass
class RoutePlan:
    nsrc: int
    ndest: int
    T1: int
    n_superchunks: int
    C2: int
    gamma: int
    cpg: int
    nsub: int
    RAu: int                      # uniform region stride (pow2, SUB % RAu == 0)
    win: np.ndarray               # (n_sc,) slab base row
    win_rel: np.ndarray           # (T1,) int window row rel. to slab
    M: np.ndarray                 # (T1, 128) lane within window
    SA: np.ndarray                # (KA, T1, 128) pass-A lane tables
    RA: np.ndarray                # (gamma,) region rows per (sc, γ)
    # pass A region CG tables, per sc: (sum(RA), 128) src-row + bank id
    A_brow: np.ndarray            # (n_sc, RAsum, 128) int16
    A_bank: np.ndarray            # (n_sc, RAsum, 128) uint8 (255 dead)
    # pass B per γ:
    B1_S: list = None             # [γ] (K, nsub*SUB, 128) lane tables
    B1_brow: list = None          # [γ] (nsub, RBsum, 128) int16
    B1_bank: list = None          # [γ] (nsub, RBsum, 128) int8 (255 dead)
    RB: list = None               # [γ] (cpg,) staging rows per (sub, δ)
    B2_S: list = None             # [γ] list per δ: (K2, rows, 128)
    B2_brow: list = None          # [γ] list per δ: (128, 128) int16
    B2_bank: list = None          # [γ] list per δ: (128, 128) int8
    spill_dst: np.ndarray = None
    spill_src: np.ndarray = None
    stats: dict = None
    force_RBu: int = 0            # multi-shard common staging stride


def build_route(src_of: np.ndarray, nsrc: int, force_RAu: int = 0,
                force_RBu: int = 0) -> RoutePlan:
    """src_of: (NDEST,) int64 source slot per dest slot, -1 = dead.
    force_RAu/force_RBu (>= the natural values) impose a common region /
    staging geometry — used to stack per-shard routes for shard_map."""
    src_of = np.asarray(src_of, np.int64)
    ndest = len(src_of)
    C2 = max(1, -(-ndest // DCH))
    # group size: prefer FEW groups (small kernel IR, long sorted runs ->
    # fewer bank conflicts) with cpg capped so pass-B blocks stay VMEM-sized
    cpg = min(C2, 64)
    gamma = -(-C2 // cpg)

    live = np.flatnonzero(src_of >= 0)
    order = np.argsort(src_of[live], kind="stable")
    e_src = src_of[live][order]
    e_dst = live[order]
    ne = len(e_src)

    # --- ce layout: rows break at window boundaries and every 128 elems --
    spilled = np.zeros(ne, bool)
    if ne:
        wins = e_src // LANES
        newrun = np.concatenate([[True], np.diff(wins) != 0])
        starts = np.flatnonzero(newrun)
        runid = np.cumsum(newrun) - 1
        pos_in_run = np.arange(ne) - starts[runid]
        run_rows = -(-np.diff(np.concatenate([starts, [ne]])) // LANES)
        run_row0 = np.concatenate([[0], np.cumsum(run_rows)[:-1]])
        e_row = run_row0[runid] + pos_in_run // LANES
        e_lane = pos_in_run % LANES
        T1 = int(run_row0[-1] + run_rows[-1])
    else:
        e_row = np.zeros(0, np.int64)
        e_lane = np.zeros(0, np.int64)
        T1 = 1
    n_sc = -(-T1 // SC)
    T1 = n_sc * SC

    row_win = np.zeros(T1, np.int64)
    has_win = np.zeros(T1, bool)
    if ne:
        row_win[e_row] = e_src // LANES
        has_win[e_row] = True
    win = np.zeros(n_sc, np.int64)
    win_rel = np.zeros(T1, np.int32)
    for scid in range(n_sc):
        sl = slice(scid * SC, (scid + 1) * SC)
        rw, hw = row_win[sl], has_win[sl]
        base = int(rw[hw].min()) if hw.any() else 0
        win[scid] = base
        rel = np.where(hw, rw - base, 0)
        bad = rel >= LANES
        win_rel[sl] = np.where(bad, 0, rel).astype(np.int32)
        if bad.any():
            bad_rows = np.flatnonzero(bad) + scid * SC
            spilled |= np.isin(e_row, bad_rows)

    M = np.zeros((T1, LANES), np.int32)
    if ne:
        M[e_row, e_lane] = e_src % LANES

    d_chunk = e_dst // DCH
    d_row = (e_dst % DCH) // LANES
    d_lane = e_dst % LANES
    # γ INTERLEAVED over chunks (chunk % gamma, not chunk // cpg): for a
    # column-major-ELL destination stream the block assignment makes γ the
    # ELL slot index w, which correlates perfectly with the column-sorted
    # source position — single (sc, γ) bins then swallow whole superchunks
    # (measured RAu=512, 1.4 GB tables, 32 ms). Interleaving makes γ a
    # function of the destination ROW block, independent of the source.
    d_gamma = d_chunk % gamma
    e_sc = e_row // SC

    # --- pass A (vectorized, conflict-free): bin by γ, fill sorted by
    # source (row, lane): each ce row contributes <=128 elements to a
    # group, occupying consecutive (hence distinct) slot lanes.
    cntA = np.bincount((e_sc * gamma + d_gamma)[~spilled],
                       minlength=n_sc * gamma).reshape(n_sc, gamma)
    orderA = np.lexsort((e_lane, e_row, d_gamma, e_sc))
    grpA = (e_sc * gamma + d_gamma)[orderA]
    withinA = _cumcount_sorted(grpA)
    rankA = np.empty(ne, np.int64)
    rankA[orderA] = withinA

    RA = np.maximum(1, -(-cntA.max(axis=0) // LANES))
    RAsum = int(RA.sum())
    RAoff = np.concatenate([[0], np.cumsum(RA)])
    a_row = RAoff[d_gamma] + rankA // LANES       # row within the sc block
    a_lane = rankA % LANES
    okA = (~spilled) & (rankA // LANES < RA[d_gamma])
    # SA banks: the slot-lane sequence restarts per group, so elements of
    # one ce row can land on the same slot lane across groups — banked
    bankA = _bank_by_srclane(e_row * LANES + a_lane, e_lane)
    _n_win_spill = int(spilled.sum())
    _n_rank_a = int((~okA & ~spilled).sum())
    okA &= bankA < KA
    spilled |= ~okA
    _n_bank_a = int(spilled.sum()) - _n_win_spill - _n_rank_a

    SA = np.zeros((KA, T1, LANES), np.int32)
    A_brow = np.zeros((n_sc, RAsum, LANES), np.int16)
    A_bank = np.full((n_sc, RAsum, LANES), 255, np.uint8)
    sel = np.flatnonzero(okA)
    SA[bankA[sel], e_row[sel], a_lane[sel]] = e_lane[sel]
    A_brow[e_sc[sel], a_row[sel], a_lane[sel]] = (e_row[sel] % SC)
    A_bank[e_sc[sel], a_row[sel], a_lane[sel]] = bankA[sel]

    # --- pass B ----------------------------------------------------------
    B1_S, B1_brow, B1_bank, RBl = [], [], [], []
    B2_S, B2_brow, B2_bank = [], [], []
    okB = np.zeros(ne, bool)
    _n_rank_b1 = _n_bank_b1 = _n_bank_b2 = 0
    # uniform BIN stride across groups: bin row = sc * RAu + region row,
    # so kernel shapes are identical for every γ (dead rows stay zero).
    # RAu is rounded to a power of two dividing SUB so the kernels can
    # block-select any γ's region directly out of pass A's packed output.
    RAu = 8
    while RAu < (int(RA.max()) if len(RA) else 1):
        RAu *= 2
    RAu = min(RAu, SUB)
    if force_RAu >= RAu:
        RAu = force_RAu
    nsub_all = max(1, -(-(n_sc * RAu) // SUB))
    # staging-stride cap: smallest 8-aligned RBu with rank-overflow spills
    # <= 0.05% of emissions (max-based sizing wastes ~2x; see route.cpp)
    allcnt = []
    for g in range(gamma):
        selg = np.flatnonzero(okA & (d_gamma == g))
        sub_g = (e_sc[selg] * RAu + (a_row[selg] - RAoff[g])) // SUB
        nsub_g = max(1, -(-(n_sc * RAu) // SUB))
        allcnt.append(np.bincount(sub_g * cpg + d_chunk[selg] // gamma,
                                  minlength=nsub_g * cpg))
    allcnt = np.concatenate(allcnt) if gamma else np.zeros(1, np.int64)
    _rbu_nat = -(-int(allcnt.max()) // LANES) if len(allcnt) else 1
    _rbu_nat = -(-_rbu_nat // 8) * 8
    rbu_cap = _rbu_nat
    for cand in range(8, _rbu_nat, 8):
        ov = int(np.maximum(allcnt - cand * LANES, 0).sum())
        if ov * 2000 <= max(ne, 1):
            rbu_cap = cand
            break
    for g in range(gamma):
        nrows_bin = n_sc * RAu
        nsub = max(1, -(-nrows_bin // SUB))
        sel = np.flatnonzero(okA & (d_gamma == g))
        bin_row = e_sc[sel] * RAu + (a_row[sel] - RAoff[g])
        bin_lane = a_lane[sel]
        sub = bin_row // SUB
        delta = d_chunk[sel] // gamma

        # fill order: round-robin over final lanes within (sub, δ), so the
        # B2 stage sees ~one element per (staging row, final lane)
        rr = _cumcount((sub * cpg + delta) * LANES + d_lane[sel])
        seq_key = (rr * LANES + d_lane[sel])
        orderB = np.lexsort((seq_key, delta, sub))
        grpB = (sub * cpg + delta)[orderB]
        withinB = _cumcount_sorted(grpB)
        rankB = np.empty(len(sel), np.int64)
        rankB[orderB] = withinB
        cntB = np.bincount(sub * cpg + delta,
                           minlength=nsub * cpg).reshape(nsub, cpg)
        RB = np.minimum(np.maximum(1, -(-cntB.max(axis=0) // LANES)),
                        rbu_cap)
        RBsum = int(RB.sum())
        RBoff = np.concatenate([[0], np.cumsum(RB)])
        b_row = RBoff[delta] + rankB // LANES
        b_lane = rankB % LANES
        ok1 = rankB // LANES < RB[delta]
        _n_rank_b1 += int((~ok1).sum())
        # banks for the B1 LG step: per (bin row, slot lane) distinct
        # source lanes get successive banks (same source lane shares)
        bank1 = _bank_by_srclane(bin_row * LANES + b_lane, bin_lane)
        _n_bank_b1 += int((ok1 & (bank1 >= KB1)).sum())
        ok1 &= bank1 < KB1
        okg = ok1

        S1 = np.zeros((KB1, nsub * SUB, LANES), np.int32)
        brow1 = np.zeros((nsub, RBsum, LANES), np.int16)
        bank1t = np.full((nsub, RBsum, LANES), 255, np.uint8)
        s2 = np.flatnonzero(okg)
        S1[bank1[s2], bin_row[s2], b_lane[s2]] = bin_lane[s2]
        brow1[sub[s2], b_row[s2], b_lane[s2]] = bin_row[s2] % SUB
        bank1t[sub[s2], b_row[s2], b_lane[s2]] = bank1[s2]

        # --- B2: exact placement per δ --------------------------------
        S2g, brow2g, bank2g = [], [], []
        for dlt in range(cpg):
            s3 = np.flatnonzero(okg & (delta == dlt))
            Rd = int(RB[dlt])
            stage_rows = nsub * Rd
            stg_row = sub[s3] * Rd + (b_row[s3] - RBoff[dlt])
            stg_lane = b_lane[s3]
            fl = d_lane[sel[s3]]
            fr = d_row[sel[s3]]
            bank2 = _bank_by_srclane(stg_row * LANES + fl, stg_lane)
            ok2 = bank2 < KB2
            _n_bank_b2 += int((~ok2).sum())
            S2 = np.zeros((KB2, stage_rows, LANES), np.int32)
            brow2 = np.zeros((CHROWS, LANES), np.int16)
            bank2t = np.full((CHROWS, LANES), 255, np.uint8)
            s4 = np.flatnonzero(ok2)
            S2[bank2[s4], stg_row[s4], fl[s4]] = stg_lane[s4]
            brow2[fr[s4], fl[s4]] = stg_row[s4]
            bank2t[fr[s4], fl[s4]] = bank2[s4]
            S2g.append(S2)
            brow2g.append(brow2)
            bank2g.append(bank2t)
            okB[sel[s3[s4]]] = True
        B1_S.append(S1)
        B1_brow.append(brow1)
        B1_bank.append(bank1t)
        RBl.append(RB)
        B2_S.append(S2g)
        B2_brow.append(brow2g)
        B2_bank.append(bank2g)

    spill = ~okB
    return RoutePlan(
        nsrc=nsrc, ndest=C2 * DCH, T1=T1, n_superchunks=n_sc, C2=C2,
        gamma=gamma, cpg=cpg, nsub=nsub_all, RAu=RAu, force_RBu=force_RBu,
        win=win, win_rel=win_rel, M=M, SA=SA, RA=RA,
        A_brow=A_brow, A_bank=A_bank,
        B1_S=B1_S, B1_brow=B1_brow, B1_bank=B1_bank, RB=RBl,
        B2_S=B2_S, B2_brow=B2_brow, B2_bank=B2_bank,
        spill_dst=e_dst[spill], spill_src=e_src[spill],
        stats={"emissions": ne, "spill": int(spill.sum()),
               "spill_frac": float(spill.sum()) / max(ne, 1),
               "spill_win": _n_win_spill, "spill_rank_a": _n_rank_a,
               "spill_bank_a": _n_bank_a, "spill_rank_b1": _n_rank_b1,
               "spill_bank_b1": _n_bank_b1, "spill_bank_b2": _n_bank_b2,
               "T1": T1, "C2": C2, "gamma": gamma, "cpg": cpg,
               "RA": RA.tolist()})


def _bank_by_srclane(dst_key, src_lane):
    """Bank id: rank of the element's DISTINCT source lane within its
    destination key group (same source lane shares a bank). One stable
    sort of the combined key; in sorted order a bank increments exactly
    at each NEW (dst_key, src_lane) pair within a dst_key run."""
    n = len(dst_key)
    if n == 0:
        return np.zeros(0, np.int64)
    comb = dst_key * LANES + src_lane
    order = np.argsort(comb, kind="stable")
    cs = comb[order]
    new_pair = np.empty(n, bool)
    new_pair[0] = True
    np.not_equal(cs[1:], cs[:-1], out=new_pair[1:])
    ds = cs // LANES
    new_grp = np.empty(n, bool)
    new_grp[0] = True
    np.not_equal(ds[1:], ds[:-1], out=new_grp[1:])
    # bank = (#new pairs so far in this group) - 1, computed as a global
    # running count minus its value at the group start
    run = np.cumsum(new_pair)
    base = run[np.flatnonzero(new_grp)]
    grp_id = np.cumsum(new_grp) - 1
    bank_sorted = run - base[grp_id]  # 0-based within group (run includes self)
    out = np.empty(n, np.int64)
    out[order] = bank_sorted
    return out


def _bank_vec(samekey):
    du, inv = np.unique(samekey, return_inverse=True)
    return _cumcount(du // LANES)[inv]


# ---------------------------------------------------------------------------
# numpy simulator — mirrors the kernels primitive for primitive
# ---------------------------------------------------------------------------

def simulate(plan: RoutePlan, x: np.ndarray) -> np.ndarray:
    nrow_x = -(-plan.nsrc // LANES) + LANES
    xr = np.zeros(nrow_x * LANES, np.asarray(x).dtype)
    xr[: len(x)] = x
    xr = xr.reshape(nrow_x, LANES)
    gamma, cpg = plan.gamma, plan.cpg
    dt = xr.dtype

    regions = []   # [sc] (RAsum, 128)
    for scid in range(plan.n_superchunks):
        slab = xr[plan.win[scid]: plan.win[scid] + LANES]
        rel = plan.win_rel[scid * SC:(scid + 1) * SC].astype(np.int64)
        SR = _cg(slab, np.broadcast_to(rel[:, None], (SC, LANES)))
        ce = _lg(SR, plan.M[scid * SC:(scid + 1) * SC].astype(np.int64))
        Yk = [_lg(ce, plan.SA[k, scid * SC:(scid + 1) * SC]
                  .astype(np.int64)) for k in range(KA)]
        brow = plan.A_brow[scid].astype(np.int64)
        bk = plan.A_bank[scid]
        reg = np.zeros((brow.shape[0], LANES), dt)
        for k in range(KA):
            m = bk == k
            if m.any():
                reg[m] = _cg(Yk[k], brow)[m]
        regions.append(reg)

    xe = np.zeros(plan.ndest, dt)
    RAoff = np.concatenate([[0], np.cumsum(plan.RA)])
    RAu = plan.RAu
    for g in range(gamma):
        Rg = int(plan.RA[g])
        BIN = np.zeros((plan.n_superchunks * RAu, LANES), dt)
        for sc in range(plan.n_superchunks):
            BIN[sc * RAu: sc * RAu + Rg] = \
                regions[sc][RAoff[g]:RAoff[g] + Rg]
        nsub = plan.B1_brow[g].shape[0]
        if BIN.shape[0] < nsub * SUB:
            BIN = np.vstack([BIN, np.zeros((nsub * SUB - BIN.shape[0],
                                            LANES), dt)])
        RB = plan.RB[g]
        RBoff = np.concatenate([[0], np.cumsum(RB)])
        staging = [np.zeros((nsub * int(RB[d]), LANES), dt)
                   for d in range(cpg)]
        for sb in range(nsub):
            blk = BIN[sb * SUB:(sb + 1) * SUB]
            Yk = [_lg(blk, plan.B1_S[g][k].astype(np.int64)
                      [sb * SUB:(sb + 1) * SUB])
                  for k in range(KB1)]
            brow = plan.B1_brow[g][sb].astype(np.int64)
            bk = plan.B1_bank[g][sb]
            for d in range(cpg):
                Rd = int(RB[d])
                rsl = slice(RBoff[d], RBoff[d] + Rd)
                out = np.zeros((Rd, LANES), dt)
                for k in range(KB1):
                    m = bk[rsl] == k
                    if m.any():
                        out[m] = _cg(Yk[k], brow[rsl])[m]
                staging[d][sb * Rd:(sb + 1) * Rd] = out
        for d in range(cpg):
            Zk = [_lg(staging[d], plan.B2_S[g][d][k].astype(np.int64))
                  for k in range(KB2)]
            brow = plan.B2_brow[g][d].astype(np.int64)
            bk = plan.B2_bank[g][d]
            out = np.zeros((CHROWS, LANES), dt)
            for k in range(KB2):
                m = bk == k
                if m.any():
                    out[m] = _cg(Zk[k], brow)[m]
            chunk = d * gamma + g
            if chunk < plan.C2:
                xe[chunk * DCH:(chunk + 1) * DCH] = out.reshape(-1)

    if len(plan.spill_dst):
        xe[plan.spill_dst] = np.asarray(x)[plan.spill_src]
    return xe


def _selftest(n=5000, ndest=40000, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, ndest).astype(np.int64)
    src[rng.random(ndest) < 0.05] = -1
    plan = build_route(src, n)
    x = rng.standard_normal(n).astype(np.float32)
    xe = simulate(plan, x)
    liv = src >= 0
    ok = np.array_equal(xe[: len(src)][liv], x[src[liv]])
    return ok, plan.stats

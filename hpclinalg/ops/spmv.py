"""SpMV: distributed sparse matrix × vector — the hottest path.

Reference call stack (SURVEY.md §3.1): ``get_vector_plan`` memoized on
(hash(A), hash(x)) builds the halo-gather handshake (sparse.jl:1875-1992),
``execute_plan!`` moves x values point-to-point (vectors.jl:394-463), then a
KernelAbstractions CSR kernel computes y (sparse.jl:2055-2084).

TPU design: the gather is a cached static ExchangePlan delivering
``x[col_indices[s]]`` into each shard's gathered buffer; the local kernel is
chosen per sparsity pattern at plan time:

  * DIA/stencil engine (default for PDE-class matrices): the pattern is
    decomposed by diagonal offset IN THE GATHERED INDEX SPACE; SpMV becomes
    O static shifted FMAs over dense vectors — zero gathers, zero scatters,
    HBM-streaming speed. Chosen when the shards' offset union is compact.
    Measured 52x faster than the scatter path on TPU v5e (1M-dof Laplacian:
    1.6 ms vs 80 ms).
  * ELL(+COO tail) engine (general sparsity): rows padded to a capped
    width; y is a gather plus a LANE-SUM, with overflow entries in a small
    scatter-added COO tail. XLA's random gather on TPU is issue-bound at
    ~146M elem/s; dropping the segment_sum doubles throughput vs the
    classic gather+segment formulation (measured 142 vs 64 M elem/s in-jit
    at n=1e6, 8 random nnz/row on v5e). Mosaic offers no large-space
    vector gather (tpu.dynamic_gather is single-vreg only, probed on v5e),
    so this XLA form is the deployable ceiling for random access.
  * Fallback: gather + masked segment-sum, kept for zero-nnz/degenerate
    shapes.

The per-value-instance DIA table (S, O, Lrow) is built once per matrix
object by a single device scatter and cached on the instance — repeated
SpMVs with the same matrix (iterative solvers) run entirely scatter-free.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..parallel.exchange import ExchangePlan
from .gather import gather_exchange_plan

# DIA engine limits: max distinct offsets, and max storage blowup vs nnz
DIA_MAX_OFFSETS = 64
DIA_FILL_FACTOR = 3.0
# densify engine: per-shard dense block cap (elements). Small general
# matrices run fastest as one MXU matvec — random gather/scatter on TPU is
# ~150M elem/s, the MXU is ~10^14 flop/s.
DENSE_MAX_ELEMS = 1 << 22
# ELL engine: rows padded to width W = min(max row len, ELL_WIDTH_MULT×mean);
# overflow entries go to a COO tail. Chosen over the take+segment_sum
# fallback because the row-sum over ELL lanes avoids the scatter-add
# entirely: measured 142 M elem/s vs 64 M elem/s on TPU v5e (n=1e6, 8
# random nnz/row) — XLA's random gather is issue-bound (~146 M/s) and the
# segment_sum used to cost another ~2x on top.
ELL_WIDTH_MULT = 3.0
ELL_MIN_WIDTH = 4


@lru_cache(maxsize=1)
def _ell_native():
    """ctypes handle to the native single-pass ELL layout builder
    (native/route.cpp:ell_build); None -> numpy fallback."""
    import ctypes

    from ..solver.native import build_native_lib

    lib = build_native_lib("hpcroute", "route.cpp")
    if lib is None or not hasattr(lib, "ell_build"):
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.ell_build.restype = ctypes.c_int64
    lib.ell_build.argtypes = [ctypes.c_int64] * 4 + [i64p, i32p, i32p, i32p,
                                                     i32p, i32p, i64p]
    return lib


def _ub(x):
    """Fusion barrier around gather operands/results. Keeps the gather an
    isolated HLO so multi-gather consumer fusions can't multiply its cost
    (XLA's TPU gather is scalar-issue-bound at ~90-130 M elem/s — verified
    with synchronous readback; chained fusions of several gathers were
    measured far slower than the isolated ops). NOTE: XLA has no
    vectorized random-gather on this hardware — the real fix for random
    SpMV is the Pallas lane-gather engine (ops/pallas_shuffle.py)."""
    return jax.lax.optimization_barrier(x)


def _distinct_offsets(offs, Lrow, cap):
    """Sorted distinct values of ``offs`` (all >= -Lrow) via a presence
    bitmap — two linear passes instead of a sort. Returns None as soon as
    the count provably exceeds ``cap`` (a 256k-element sample is probed
    first: sample-distinct > cap implies total-distinct > cap)."""
    if not offs.size:
        return np.zeros(0, np.int64)

    def census(a):
        bm = np.zeros(Lrow + int(a.max()) + 2, bool)
        bm[a + Lrow] = True
        return bm

    if offs.size > (1 << 18):
        if np.count_nonzero(census(offs[: 1 << 18])) > cap:
            return None
    bm = census(offs)
    if np.count_nonzero(bm) > cap:
        return None
    return np.flatnonzero(bm).astype(np.int64) - Lrow


class SpMVPlan:
    """Gather plan + local-engine selection for one (structure, x-partition)."""

    def __init__(self, A, x_partition_hash, exchange: ExchangePlan):
        st = A.structure
        self.exchange = exchange
        self.key = (A.hash, x_partition_hash, A.backend.key)
        self.st_hash = A.hash
        self.ell = False

        # ---- try the DIA decomposition (host, replicated metadata) --------
        # distinct-offset census via a presence bitmap with a sampled
        # early-exit: np.unique is an O(nnz log nnz) sort (~1 s/shard at
        # 8M nnz) paid even by patterns that reject DIA immediately.
        # The sample is probed BEFORE materializing the full 8M-entry
        # rows/offs arrays (searchsorted on 256k positions) so random
        # patterns reject in ~10 ms instead of ~1 s of repeat/subtract.
        S = A.backend.nshards
        offsets = set()
        per_shard = []
        rejected = False
        for s in range(S):
            nl = len(st.indptr[s]) - 1
            ip = st.indptr[s]
            nnz_s = int(st.nnz_local[s])
            if nnz_s > (1 << 18):
                pos = np.arange(1 << 18, dtype=np.int64)
                rows_smp = np.searchsorted(ip, pos, side="right") - 1
                offs_smp = st.colval[s][: 1 << 18].astype(np.int64) - rows_smp
                if _distinct_offsets(offs_smp, st.Lrow,
                                     DIA_MAX_OFFSETS) is None:
                    rejected = True
                    break
            rows_local = np.repeat(np.arange(nl, dtype=np.int64),
                                   np.diff(ip))
            offs = st.colval[s].astype(np.int64) - rows_local
            per_shard.append(offs)
            u = _distinct_offsets(offs, st.Lrow, DIA_MAX_OFFSETS)
            if u is None:
                rejected = True
                break
            offsets.update(u.tolist())
            if len(offsets) > DIA_MAX_OFFSETS:
                rejected = True
                break
        if rejected:
            offsets = set(range(DIA_MAX_OFFSETS + 1))  # force the else arm
        total_rows = int(np.diff(st.row_partition).sum())
        if (len(offsets) <= DIA_MAX_OFFSETS and
                len(offsets) * total_rows <= DIA_FILL_FACTOR * max(st.nnz, 1) + 1024):
            self.offsets = tuple(sorted(offsets))
            omap = {o: i for i, o in enumerate(self.offsets)}
            O = len(self.offsets)
            Lrow = st.Lrow
            scat = np.full((S, st.NNZpad), O * Lrow, dtype=np.int32)  # drop
            for s in range(S):
                nl = len(st.indptr[s]) - 1
                rows_local = np.repeat(np.arange(nl, dtype=np.int64),
                                       np.diff(st.indptr[s]))
                oidx = np.array([omap[o] for o in per_shard[s]], dtype=np.int64) \
                    if len(per_shard[s]) else np.zeros(0, np.int64)
                scat[s, : st.nnz_local[s]] = oidx * Lrow + rows_local
            self.dia_scatter = jax.device_put(scat, A.backend.row_sharding())
            # pad widths so every shifted slice of the gathered buffer is
            # valid (an all-zero matrix has no offsets and needs no padding)
            self.bias_lo = max(0, -min(self.offsets)) if self.offsets else 0
            need_hi = (max(self.offsets) + Lrow - exchange.out_pad) \
                if self.offsets else 0
            self.bias_hi = max(0, need_hi)
            self.densify = False
        else:
            self.offsets = None
            # small general matrices: densify the local block and ride the MXU
            self.densify = st.Lrow * exchange.out_pad <= DENSE_MAX_ELEMS
            if self.densify:
                scat = np.full((S, st.NNZpad), st.Lrow * exchange.out_pad,
                               dtype=np.int32)  # padding -> dropped
                for s in range(S):
                    nl = len(st.indptr[s]) - 1
                    rows_local = np.repeat(np.arange(nl, dtype=np.int64),
                                           np.diff(st.indptr[s]))
                    scat[s, : st.nnz_local[s]] = (
                        rows_local * exchange.out_pad
                        + st.colval[s].astype(np.int64))
                self.dense_scatter = jax.device_put(scat, A.backend.row_sharding())
            else:
                self._build_ell(A)

    def _build_ell(self, A):
        """ELL(+COO tail) layout for general sparsity: per-shard (Lrow, W)
        column table indexing the gathered buffer; entries past W in their
        row spill into a small COO tail handled by one scatter-add. The row
        reduction is a lane-sum (no segment_sum on the hot bulk)."""
        st = A.structure
        S = A.backend.nshards
        self.ell = False
        if st.nnz == 0:
            return
        lens_all = []
        for s in range(S):
            ip = st.indptr[s]
            lens_all.append(np.diff(ip) if len(ip) > 1
                            else np.zeros(0, np.int64))
        maxlen = max((int(l.max()) if l.size else 0) for l in lens_all)
        nrows_tot = max(1, sum(l.size for l in lens_all))
        mean_len = st.nnz / nrows_tot
        W = int(min(maxlen, max(ELL_MIN_WIDTH,
                                int(np.ceil(ELL_WIDTH_MULT * mean_len)))))
        if W == 0:
            return
        cols = np.zeros((S, st.Lrow, W), dtype=np.int32)
        ell_scat = np.full((S, st.NNZpad), st.Lrow * W, dtype=np.int32)
        tails = []          # per shard (rows, gidx, nzpos)
        ell_lib = _ell_native()
        for s in range(S):
            lens = lens_all[s]
            nl = lens.size
            if not nl:
                tails.append((np.zeros(0, np.int64),) * 3)
                continue
            ip = st.indptr[s]
            if ell_lib is not None:
                # single-pass C++ layout build (the numpy repeat +
                # fancy-scatter path below measured ~2 s at 8M nnz)
                nov = int(np.maximum(lens - W, 0).sum())
                trow = np.empty(max(nov, 1), np.int32)
                tgidx = np.empty(max(nov, 1), np.int32)
                tpos = np.empty(max(nov, 1), np.int64)
                nt = ell_lib.ell_build(
                    nl, st.Lrow, W, int(st.NNZpad),
                    np.ascontiguousarray(ip, np.int64),
                    np.ascontiguousarray(st.colval[s], np.int32),
                    cols[s].reshape(-1), ell_scat[s], trow, tgidx, tpos)
                tails.append((trow[:nt].astype(np.int64),
                              tgidx[:nt].astype(np.int64), tpos[:nt]))
                continue
            rows_l = np.repeat(np.arange(nl), lens)
            within = np.arange(len(rows_l)) - np.repeat(ip[:-1], lens)
            main = within < W
            cols[s, rows_l[main], within[main]] = st.colval[s][main]
            ell_scat[s, np.flatnonzero(main)] = rows_l[main] * W + within[main]
            ov = ~main
            tails.append((rows_l[ov], st.colval[s][ov].astype(np.int64),
                          np.flatnonzero(ov)))
        Tpad = max(t[0].size for t in tails)
        Tpad = int(-(-Tpad // 8) * 8) if Tpad else 0
        self.ell = True
        self.ell_W = W
        self.ell_Tpad = Tpad
        sh = A.backend.row_sharding
        self.ell_cols = jax.device_put(cols.reshape(S, st.Lrow * W), sh())
        # host copy for the shuffle-tier route build: reading ell_cols BACK
        # through the device relay measured ~27 s at 1M x 8nnz
        self.ell_cols_np = cols.reshape(S, st.Lrow * W)
        self.ell_scat = jax.device_put(ell_scat, sh())
        if Tpad:
            trows = np.full((S, Tpad), st.Lrow, dtype=np.int32)   # drop slot
            tgidx = np.zeros((S, Tpad), dtype=np.int32)
            tscat = np.full((S, st.NNZpad), Tpad, dtype=np.int32)  # drop
            for s, (r, g, p) in enumerate(tails):
                trows[s, : r.size] = r
                tgidx[s, : r.size] = g
                tscat[s, p] = np.arange(r.size)
            self.ell_tail_rows = jax.device_put(trows, sh())
            self.ell_tail_gidx = jax.device_put(tgidx, sh())
            self.ell_tail_gidx_np = tgidx      # for shuffle-tier composition
            self.ell_tail_scat = jax.device_put(tscat, sh())


def get_spmv_plan(A, x) -> SpMVPlan:
    """Memoized plan (ref: get_vector_plan, sparse.jl:1992)."""
    key = (A.hash, x.partition_hash, A.backend.key)

    def build():
        exchange = gather_exchange_plan(
            A.backend, x.partition, A.structure.col_indices,
            out_len=A.structure.Gpad,
        )
        return SpMVPlan(A, x.partition_hash, exchange)

    return cached_plan("vector_plan", key, build)


@jax.jit
def _dia_build(scat, nzval, zeros):
    return jax.vmap(lambda z, p, v: z.at[p].set(v, mode="drop"))(zeros, scat, nzval)


def _dia_values(A, plan: SpMVPlan) -> jax.Array:
    """(S, O, Lrow) diagonal-value table, built once per matrix instance."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    hit = cache.get(("dia", plan.key))
    if hit is not None:
        return hit
    st = A.structure
    O, Lrow = len(plan.offsets), st.Lrow
    S = A.backend.nshards
    zeros = jax.device_put(jnp.zeros((S, O * Lrow), A.dtype), A.backend.row_sharding())
    dval = _dia_build(plan.dia_scatter, A.nzval, zeros).reshape(S, O, Lrow)
    if not isinstance(dval, jax.core.Tracer):  # first call may be in a trace
        cache[("dia", plan.key)] = dval
    return dval


def _pad_trunc(gathered, pad_to: int):
    """Truncate-or-pad the gathered buffer's slot axis (axis 1) to pad_to
    (0 = leave unchanged). One shared preamble for every exec kernel —
    handles both (S, L) and (S, L, k) payloads."""
    if not pad_to:
        return gathered
    L = gathered.shape[1]
    if pad_to < L:
        return gathered[:, :pad_to]
    if pad_to > L:
        pad = [(0, 0), (0, pad_to - L)] + [(0, 0)] * (gathered.ndim - 2)
        return jnp.pad(gathered, pad)
    return gathered


@lru_cache(maxsize=None)
def _dia_exec(offsets: tuple, Lrow: int, bias_lo: int, bias_hi: int,
              pad_to: int = 0):
    """Jitted O-term shifted-FMA kernel; offsets are compile-time constants
    so every slice is static (misaligned dynamic slices are slow on TPU).
    ``pad_to`` > 0 means the input is the raw x block (identity gather) that
    must first be padded/truncated to the gathered width — fusing the
    exchange away entirely on single-shard / fully-local patterns."""

    @jax.jit
    def run(dval, gathered):
        # dval: (S, O, Lrow); gathered: (S, Gpad) padding-zero
        gathered = _pad_trunc(gathered, pad_to)
        dt = jnp.result_type(dval.dtype, gathered.dtype)
        dval = dval.astype(dt)
        gathered = gathered.astype(dt)
        gp = jnp.pad(gathered, ((0, 0), (bias_lo, bias_hi))) \
            if (bias_lo or bias_hi) else gathered
        S = gathered.shape[0]
        y = jnp.zeros((S, Lrow), dt)
        for i, o in enumerate(offsets):
            xs = jax.lax.slice(gp, (0, bias_lo + o), (S, bias_lo + o + Lrow))
            y = y + dval[:, i, :] * xs
        return y

    return run


def _dense_block(A, plan) -> jax.Array:
    """(S, Lrow, Gpad) densified local block, cached per matrix instance."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    hit = cache.get(("dense", plan.key))
    if hit is not None:
        return hit
    st = A.structure
    S = A.backend.nshards
    G = plan.exchange.out_pad
    zeros = jax.device_put(jnp.zeros((S, st.Lrow * G), A.dtype),
                           A.backend.row_sharding())
    blk = _dia_build(plan.dense_scatter, A.nzval, zeros).reshape(S, st.Lrow, G)
    cache[("dense", plan.key)] = blk
    return blk


@lru_cache(maxsize=None)
def _densified_exec(pad_to: int = 0):
    @jax.jit
    def run(blk, gathered):
        gathered = _pad_trunc(gathered, pad_to)
        dt = jnp.result_type(blk.dtype, gathered.dtype)
        return jnp.einsum("slg,sg->sl", blk.astype(dt), gathered.astype(dt),
                          precision=jax.lax.Precision.HIGHEST)

    return run


def _ell_values(A, plan: SpMVPlan):
    """Per-instance ELL value tables: (S, Lrow, W) bulk plus (S, Tpad) tail,
    built by one device scatter each and cached on the matrix object."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    hit = cache.get(("ell", plan.key))
    if hit is not None:
        return hit
    st = A.structure
    S = A.backend.nshards
    W, Tpad = plan.ell_W, plan.ell_Tpad
    sh = A.backend.row_sharding
    zeros = jax.device_put(jnp.zeros((S, st.Lrow * W), A.dtype), sh())
    vals = _dia_build(plan.ell_scat, A.nzval, zeros).reshape(S, st.Lrow, W)
    if Tpad:
        tz = jax.device_put(jnp.zeros((S, Tpad), A.dtype), sh())
        tvals = _dia_build(plan.ell_tail_scat, A.nzval, tz)
    else:
        tvals = None
    out = (vals, tvals)
    if not isinstance(vals, jax.core.Tracer):  # first call may be in a trace
        cache[("ell", plan.key)] = out
    return out


@lru_cache(maxsize=None)
def _ell_exec(Lrow: int, W: int, Tpad: int, pad_to: int = 0):
    """y[s, r] = Σ_w vals[s,r,w] · g[s, cols[s,r,w]]  (+ COO tail). The
    take is XLA's issue-bound gather; the lane-sum replaces segment_sum."""

    @jax.jit
    def run(vals, cols, tvals, trows, tgidx, gathered):
        dt = jnp.result_type(vals.dtype, gathered.dtype)
        # barrier the OPERAND too: a pad/astype producer fused into the
        # gather also forces the scalar emitter (measured 72 ms vs 0.4 ms
        # inside a jitted solver loop)
        gathered = _ub(_pad_trunc(gathered, pad_to).astype(dt))

        def one(v, c, g, *tail):
            y = jnp.sum(v.astype(dt)
                        * _ub(jnp.take(g, c)).reshape(Lrow, W),
                        axis=1)
            if Tpad:
                tv, tr, tg = tail
                y = y.at[tr].add(tv.astype(dt) * _ub(jnp.take(g, tg)),
                                 mode="drop")
            return y

        if Tpad:
            return jax.vmap(one)(vals, cols, gathered, tvals, trows, tgidx)
        return jax.vmap(one)(vals, cols, gathered)

    return run


@lru_cache(maxsize=None)
def _ell_spmm_exec(Lrow: int, W: int, Tpad: int, pad_to: int = 0):
    """Row-payload ELL product: C[s,r,:] = Σ_w vals[s,r,w] · G[s,cols,:].
    Row-gathers run at the same issue rate as scalar gathers (~190 M rows/s
    measured), so wide payloads amortize the gather almost for free.

    The shard loop is UNROLLED, not vmapped: XLA lowers a batched row
    gather ~1.8x slower than S independent plain gathers (105 vs 59 ms at
    1M x 8 x k=64, tools/probe_spmm_deployed.py), and the extra barrier on
    the gather result costs another ~14 ms — only the operand barrier
    (which fixes the scalar-emitter pathology, see _ell_exec) is kept.
    Measured 107 -> ~45 ms (4.8 -> 11.4 Gelem/s) on the bench workload."""

    @jax.jit
    def run(vals, cols, tvals, trows, tgidx, gathered):
        dt = jnp.result_type(vals.dtype, gathered.dtype)
        # no _pad_trunc here: take's default clip mode makes indices into
        # the padded tail in-bounds, and dead ELL slots carry vals == 0 so
        # clipped rows contribute nothing — the pad materialized a full
        # (n, k) copy (~256 MB at the 1M x 64 workload) per product. With
        # the pad/astype producer gone there is nothing to fuse into the
        # gather, and the operand barrier itself measured ~15 ms at the
        # bench geometry (tools/probe_spmm_deployed.py noub_stack 45.8 ms
        # vs the barriered path at 60.4) — so no _ub here either.
        gathered = gathered.astype(dt)
        k = gathered.shape[-1]
        S = gathered.shape[0]

        def one(v, c, g, *tail):
            gr = jnp.take(g, c, axis=0).reshape(Lrow, W, k)
            y = jnp.sum(v.astype(dt)[:, :, None] * gr, axis=1)
            if Tpad:
                tv, tr, tg = tail
                y = y.at[tr].add(tv.astype(dt)[:, None]
                                 * jnp.take(g, tg, axis=0),
                                 mode="drop")
            return y

        def args(s):
            if Tpad:
                return (vals[s], cols[s], gathered[s],
                        tvals[s], trows[s], tgidx[s])
            return (vals[s], cols[s], gathered[s])

        return jnp.stack([one(*args(s)) for s in range(S)])

    return run


def _ell_cols_raw(A, plan):
    """(S, Lrow*W) ELL column table composed with the compressed-column
    map (st.col_indices), so single-shard consumers index the RAW x/B
    block directly — skipping the compression-exchange gather, which for
    SpMM re-reads the whole (n, k) dense operand (measured as the bulk of
    the deployed-vs-bare gap at 1M x 64). Dead slots point at a real
    column; their vals are 0. Cached per matrix instance."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    hit = cache.get(("ell_raw", plan.key))
    if hit is not None:
        return hit
    st = A.structure
    cols = getattr(plan, "ell_cols_np", None)
    if cols is None:
        cols = np.asarray(plan.ell_cols)
    out = np.empty_like(cols)
    for s in range(cols.shape[0]):
        ci = st.col_indices[s]
        c = cols[s].astype(np.int64)
        out[s] = (ci[np.minimum(c, len(ci) - 1)] if len(ci)
                  else cols[s]).astype(cols.dtype)
    dev = jax.device_put(out, A.backend.row_sharding())
    cache[("ell_raw", plan.key)] = dev
    return dev


def _ell_tail_gidx_raw(A, plan):
    """COO-tail gather indices composed with the compressed-column map
    (single-shard raw-operand path)."""
    cache = A._engine_cache
    hit = cache.get(("ell_tail_raw", plan.key))
    if hit is not None:
        return hit
    st = A.structure
    ci = st.col_indices[0]
    tg = plan.ell_tail_gidx_np[0].astype(np.int64)
    raw = ci[np.clip(tg, 0, max(len(ci) - 1, 0))] if len(ci) else tg
    dev = jax.device_put(raw.astype(np.int32)[None])
    cache[("ell_tail_raw", plan.key)] = dev
    return dev


def _ell_apply(A, plan, data, spmm: bool):
    st = A.structure
    vals, tvals = _ell_values(A, plan)
    if not plan.ell_Tpad:
        tvals = trows = tgidx = vals[:, :0, 0]  # unused placeholders
    else:
        trows, tgidx = plan.ell_tail_rows, plan.ell_tail_gidx
    fn = _ell_spmm_exec if spmm else _ell_exec
    if spmm and A.backend.nshards == 1:
        # raw-operand path: compression composed into the column tables
        cols = _ell_cols_raw(A, plan)
        if plan.ell_Tpad:
            tgidx = _ell_tail_gidx_raw(A, plan)
        return fn(st.Lrow, plan.ell_W, plan.ell_Tpad, 0)(
            vals, cols, tvals, trows, tgidx, data)
    pad_to = plan.exchange.out_pad if plan.exchange.is_identity else 0
    g = data if plan.exchange.is_identity else plan.exchange.apply(data)
    return fn(st.Lrow, plan.ell_W, plan.ell_Tpad, pad_to)(
        vals, plan.ell_cols, tvals, trows, tgidx, g)


@partial(jax.jit, static_argnums=(4,))
def _local_spmv(nzval, colval, row_ids, gathered, Lrow):
    """Fallback per-shard CSR SpMV as gather + segment-sum (ref kernel:
    _spmv_kernel!, sparse.jl:2055)."""

    def one(nz, cv, ri, g):
        contrib = nz * _ub(jnp.take(g, cv, axis=0))
        return jax.ops.segment_sum(contrib, ri, num_segments=Lrow,
                                   indices_are_sorted=True)

    return jax.vmap(one)(nzval, colval, row_ids, _ub(gathered))


def matvec(A, x):
    """y = A @ x (ref: Base.:*(A::HPCSparseMatrix, x::HPCVector),
    sparse.jl:2096-2128)."""
    from ..vector import DistVector

    if len(x) != A.ncols:
        raise ValueError(f"dimension mismatch: A is {A.shape}, x has {len(x)}")
    st = A.structure
    plan = get_spmv_plan(A, x)
    if plan.offsets is not None:
        from .pallas_dia import pallas_available, pallas_dia_matvec

        if pallas_available(A.backend, st.Lrow) and jnp.result_type(
                A.dtype, x.dtype) == jnp.float32:
            xb = x.data if plan.exchange.is_identity else plan.exchange.apply(x.data)
            y = pallas_dia_matvec(A, plan, xb)
            return DistVector(y, st.row_partition, A.backend)
        dval = _dia_values(A, plan)
        if plan.exchange.is_identity:
            # fully-local gather: fuse the pad into the DIA kernel (1 dispatch)
            y = _dia_exec(plan.offsets, st.Lrow, plan.bias_lo, plan.bias_hi,
                          pad_to=plan.exchange.out_pad)(dval, x.data)
        else:
            gathered = plan.exchange.apply(x.data)
            y = _dia_exec(plan.offsets, st.Lrow, plan.bias_lo, plan.bias_hi)(
                dval, gathered)
    elif plan.densify:
        blk = _dense_block(A, plan)
        if plan.exchange.is_identity:
            y = _densified_exec(pad_to=plan.exchange.out_pad)(blk, x.data)
        else:
            y = _densified_exec()(blk, plan.exchange.apply(x.data))
    elif plan.ell:
        from .pallas_shuffle import shuffle_available, shuffle_spmv

        if (shuffle_available(A.backend, st)
                and jnp.result_type(A.dtype, x.dtype) == jnp.float32):
            # single shard routes the RAW x buffer (compression composed
            # into the tables); multi-shard routes the gathered halo
            # buffer, already in compressed-column order
            xb = x.data if A.backend.nshards == 1 \
                else plan.exchange.apply(x.data)
            y = shuffle_spmv(A, plan, xb)
        else:
            y = _ell_apply(A, plan, x.data, spmm=False)
    else:
        gathered = plan.exchange.apply(x.data)  # (S, Gpad)
        y = _local_spmv(A.nzval, st.colval_dev, st.row_ids_dev, gathered, st.Lrow)
    return DistVector(y, st.row_partition, A.backend)


# kept for callers that want the raw exchange (mixed products)
def get_vector_plan(A, x) -> ExchangePlan:
    return get_spmv_plan(A, x).exchange

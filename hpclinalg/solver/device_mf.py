"""Distributed device-resident multifrontal factorization over the mesh.

The TPU-native replacement for the reference's distributed direct solvers
(MUMPS distributed-input factorization, mumps_factorization.jl:152-213;
cuDSS MGMN multi-GPU path with the RHS staying distributed, CUDAExt:602-710,
835-885). Design per docs/device_solver_design.md:

  * **Proportional subtree mapping**: the supernode forest is split into
    per-shard subtrees balanced by subtree flops; supernodes above the cut
    form the replicated "top" set (the classic proportional mapping used by
    parallel multifrontal codes).
  * **Local phase** — all shards factor their own subtrees concurrently:
    each level's fronts are identity-padded to one (S, B, NF, NF) batch
    sharded P("rows"); assembly / extend-add are per-shard static scatters
    (vmapped over the shard axis), the numeric kernels are MXU-native
    batched ops. No collectives anywhere in the local phase.
  * **Cross reduction** — local subtree roots scatter their update matrices
    into a (S, CROSS) buffer; ONE cross-shard reduction (sum over the
    sharded axis -> all-reduce) makes the contributions replicated.
  * **Top phase** — the top tree is factored replicated (identical ops on
    every shard), which XLA executes without further communication.
  * **Solves** run the same wave schedule with the RHS on device end-to-end.

Kinds: "chol" (SPD, jnp.linalg.cholesky), "ldl" (symmetric indefinite,
recursive blocked unpivoted LDLᵀ with static-pivot perturbation — the MUMPS
CNTL(4) analogue), "lu" (unsymmetric on the symmetrized pattern, recursive
blocked unpivoted LU with perturbation). Perturbations are compensated by
iterative refinement in the wrapper, SuperLU_DIST-style.

The whole factorization is ONE jitted executable; each solve is another —
the per-level Python loops unroll at trace time (tree depth is ~10-25 after
relaxed amalgamation).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from . import symbolic
from .ordering import amd_order

_PERT_REL = 1e-10  # relative static-pivot perturbation (matches host engine)

# Matmul precision for the numeric kernels. On TPU, f32 matmuls are built
# from bf16 MXU passes: HIGHEST = 6 passes (full f32), HIGH = 3 passes
# (~2^-21 relative error, ~2x faster). The engine runs HIGH for f32 —
# the iterative refinement in the wrapper recovers full accuracy — and
# HIGHEST for f64/complex (CPU mesh, where passes don't apply anyway).
# Configurable via set_mm_precision(); solves with an explicit refine=0
# warn, since they skip the refinement that HIGH relies on.
MM_PRECISION = "high"


def set_mm_precision(level: str) -> None:
    """Set the frontal-matmul precision ('high' = bf16x3, ~2x faster f32
    factors recovered by refinement; 'highest' = full f32). Affects factors
    built AFTER the call (precision is baked into the compiled engine)."""
    global MM_PRECISION
    if level.lower() not in ("high", "highest"):
        raise ValueError("mm precision must be 'high' or 'highest'")
    MM_PRECISION = level.lower()


def _mm_prec(dt=None):
    if dt is not None and np.dtype(dt).itemsize > 4:
        return jax.lax.Precision.HIGHEST
    return getattr(jax.lax.Precision, MM_PRECISION.upper())

# Extend-add engine: True routes child->parent update assembly through
# selection-matrix matmuls (P @ U @ P^T with one-hot P built on device from
# the parent-slot table) on the MXU; False uses the element-wise scatter
# path. Random scatter on TPU is issue-bound at ~150M elem/s, so for an
# NF-wide parent the matmul form is ~NF^2/nr^2 * (MXU rate / scatter rate)
# faster — measured 2.6x end-to-end on the 3D 48^3 factor (v5e).
EA_MATMUL = True
# Cap on the (step, NF, NF) contrib temporary per chunk. Levels whose whole
# child set fits one chunk take the inline path (no fori sequencing);
# 512 MB f32 keeps every 48^3-class level inline while the 16k-wide 64^3
# roots (1 GB per child) still sequence one chunk at a time.
_EA_CHUNK_ELEMS = 1 << 27


def _ea_onehot_add(F4, dstb, psl, u, dt):
    """F4 (..., B, NF, NF) += scatter of child updates u (..., C, nr, nr)
    into parent slots dstb (..., C) at positions psl (..., C, nr), computed
    as P @ u @ P^T per child. Invalid rows (psl = -1) produce zero one-hot
    rows; padding children (all -1) contribute zeros to slot 0."""
    NF = F4.shape[-1]
    C = u.shape[-3]
    hi = jax.lax.Precision.HIGHEST
    step = max(1, _EA_CHUNK_ELEMS // (NF * NF))
    batched = F4.ndim == 4  # (S, B, NF, NF) vs (B, NF, NF)

    def one_chunk(F4, ps, uc, db):
        iota = jax.lax.broadcasted_iota(
            jnp.int32, ps.shape[:-1] + (NF, ps.shape[-1]), ps.ndim - 1)
        OH = (ps[..., None, :] == iota).astype(dt)
        if batched:
            t = jnp.einsum("scfr,scrq->scfq", OH, uc, precision=hi)
            contrib = jnp.einsum("scfq,scgq->scfg", t, OH, precision=hi)
            return jax.vmap(lambda f, d, v: f.at[d].add(v, mode="drop"))(
                F4, db, contrib)
        t = jnp.einsum("cfr,crq->cfq", OH, uc, precision=hi)
        contrib = jnp.einsum("cfq,cgq->cfg", t, OH, precision=hi)
        return F4.at[db].add(contrib, mode="drop")

    if C <= step:
        return one_chunk(F4, psl, u, dstb)
    # Wide fronts (one chunk per child at NF ~ 10^4): sequence the chunks
    # through a fori_loop. Unrolled chunks are pure producers into a scatter
    # chain, so XLA keeps many (step, NF, NF) contrib temps alive at once —
    # measured 7 x 1 GB resident at the 3D 64^3 root, 10 MB over HBM.
    ax = psl.ndim - 2  # child axis
    npad = (-C) % step
    if npad:
        psl = jnp.concatenate([psl, jnp.full(
            psl.shape[:ax] + (npad,) + psl.shape[ax + 1:], -1, psl.dtype)],
            axis=ax)
        u = jnp.concatenate([u, jnp.zeros(
            u.shape[:ax] + (npad,) + u.shape[ax + 1:], u.dtype)], axis=ax)
        dstb = jnp.concatenate([dstb, jnp.zeros(
            dstb.shape[:-1] + (npad,), dstb.dtype)], axis=-1)

    def body(i, F4):
        c0 = i * step
        ps = jax.lax.dynamic_slice_in_dim(psl, c0, step, axis=ax)
        uc = jax.lax.dynamic_slice_in_dim(u, c0, step, axis=ax)
        db = jax.lax.dynamic_slice_in_dim(dstb, c0, step, axis=-1)
        return one_chunk(F4, ps, uc, db)

    return jax.lax.fori_loop(0, (C + npad) // step, body, F4)


# ---------------------------------------------------------------------------
# supernode -> shard mapping
# ---------------------------------------------------------------------------

def proportional_map(sym: symbolic.SymbolicFactor, S: int) -> np.ndarray:
    """Owner shard per supernode; -1 marks the replicated top set.

    Proportional mapping: walk the forest from the roots with a shard
    interval, splitting children proportionally to subtree flops; once an
    interval narrows to one shard the whole subtree is local to it."""
    ns = sym.nsuper
    parent = sym.snode_parent
    children = [[] for _ in range(ns)]
    for k in range(ns):
        p = int(parent[k])
        if p >= 0:
            children[p].append(k)
    w = np.empty(ns)
    for k in range(ns):
        nc = int(sym.snode_ptr[k + 1] - sym.snode_ptr[k])
        nr = len(sym.snode_rows[k])
        w[k] = nc * float(nc + nr) ** 2 + 1.0
    subtree = w.copy()
    for k in range(ns):  # postorder: children precede parents
        p = int(parent[k])
        if p >= 0:
            subtree[p] += subtree[k]

    owner = np.full(ns, -1, dtype=np.int64)

    def assign_whole(root, s):
        stack = [root]
        while stack:
            v = stack.pop()
            owner[v] = s
            stack.extend(children[v])

    roots = [k for k in range(ns) if parent[k] < 0]
    stack = [(roots, 0, S)]
    while stack:
        kids, lo, hi = stack.pop()
        total = sum(subtree[c] for c in kids)
        acc = 0.0
        for c in kids:
            start = lo + (hi - lo) * acc / total
            acc += subtree[c]
            end = lo + (hi - lo) * acc / total
            s0 = max(lo, int(np.floor(start + 1e-9)))
            s1 = min(hi, int(np.ceil(end - 1e-9)))
            if s1 - s0 <= 1:
                assign_whole(c, min(max(s0, lo), hi - 1))
            else:
                # owner[c] stays -1 (top, replicated)
                stack.append((children[c], s0, s1))
    return owner


# ---------------------------------------------------------------------------
# batched unpivoted kernels (recursive blocked; trace-time recursion)
# ---------------------------------------------------------------------------

@jax.jit
def _all_finite(tree):
    """One compiled finiteness probe over a whole factor pytree (every level
    batch, ADVICE r1: multi-root forests can hide a non-SPD component at a
    low level). Op-by-op per-buffer probes cost ~70 separate remote XLA
    compiles per pattern on the build path."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.inexact)]
    if not leaves:
        return jnp.bool_(True)
    return jnp.stack([jnp.isfinite(x).all() for x in leaves]).all()


# |L| growth ceiling before a device factorization is flagged unstable and
# its solves escalate to full-budget compensated refinement (f32 engine:
# growth g costs ~log2(g) of the 24 mantissa bits per sweep)
_GROWTH_MAX_DEV = 1e4


@jax.jit
def _max_abs(tree):
    """One compiled max-|x| probe over a factor pytree (growth monitor)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.inexact) and x.size]
    if not leaves:
        return jnp.float32(0)
    return jnp.stack([jnp.max(jnp.abs(x)).astype(jnp.float32)
                      for x in leaves]).max()


def _clamp(d, eps):
    """Static-pivot perturbation: |d| < eps -> sign-preserving +-eps."""
    bad = jnp.abs(d) < eps
    safe = jnp.where(bad,
                     jnp.where(jnp.real(d) >= 0, eps, -eps).astype(d.dtype),
                     d)
    return safe, jnp.sum(bad)


# XLA's batched triangular_solve lowers to an InvertDiagBlocksLowerTriangular
# custom call whose scoped-VMEM workspace is a fixed ~17.5 MB at 81-wide
# fronts — over the 16 MB scoped limit, a hard COMPILE error (hit at 2D
# 10^6 dof with relax=64 amalgamation; the workspace is size-class-, not
# batch-dependent: chunking the batch reproduced the identical overflow).
# For those shapes a hand-rolled recursive block substitution exists:
# pure batched MXU matmuls + an unrolled leaf, no custom call, no scoped
# workspace. But the custom call is FASTER where it compiles (measured 2D
# 262k f32 chol on v5e: 191.7 ms factor with the custom call vs 303 ms
# with the substitution — the r3 regression). Policy: custom call is the
# default everywhere; each DeviceMF retraces with the substitution ONLY
# after its own compile hits the scoped-VMEM wall (see DeviceMF.factor).
import os as _os

_TRSM_SMALL_N = int(_os.environ.get("HPCLINALG_TRSM_SMALL_N", 128))
_TRSM_MIN_BATCH = int(_os.environ.get("HPCLINALG_TRSM_MIN_BATCH", 256))
_TRSM_LEAF = int(_os.environ.get("HPCLINALG_TRSM_LEAF", 8))
# "" = auto (custom call first, per-engine fallback on scoped-VMEM compile
# OOM); "1" = always substitution on eligible shapes; "0" = never
_TRSM_POLICY = _os.environ.get("HPCLINALG_TRSM_SMALL", "")
# matmul-only cholesky/LDL-with-inverse front kernels (chol_inv_blocked /
# ldl_inv_blocked). OFF by default by measurement — including per-level
# deployment: isolated A/B (tools/probe_front_kernels.py) shows them far
# faster at small NC / huge batch (9.28 -> 0.41 ms at B=4101/NC=20), but
# inside the fused level program the While-loop cholesky OVERLAPS the
# assembly/extend-add scatters while the inv kernels' VPU-unrolled leaves
# compete with them: 512^2 chol steady factor measured 186.4 ms (off) vs
# 224.6 (NC<=96 levels only) vs 220.8 (NC<=256) vs 231.8 (all levels,
# round-4 session). HPCLINALG_CHOL_INV: "0"/default = never; "1" = every
# level; "auto" = NC <= HPCLINALG_CHOL_INV_MAX (kept for re-measurement
# on other topologies).
_CHOL_INV_POLICY = _os.environ.get("HPCLINALG_CHOL_INV", "0")
_CHOL_INV_MAX = int(_os.environ.get("HPCLINALG_CHOL_INV_MAX", 96))


def _use_inv_kernel(NC: int) -> bool:
    if _CHOL_INV_POLICY == "1":
        return True
    if _CHOL_INV_POLICY == "auto":
        return NC <= _CHOL_INV_MAX
    return False
# trace-time switch: set by DeviceMF around each jit invocation so the
# engine that hit the wall retraces with substitution while other engines
# in the same process keep the fast custom call
_TRSM_FORCE_SMALL = _TRSM_POLICY == "1"


def _is_compile_oom(e) -> bool:
    s = str(e).lower()
    return ("scoped" in s or "vmem" in s or "resource_exhausted" in s
            or "out of memory" in s)


def _solve_lower(L, B, unit, prec):
    """X = L^{-1} B for batched lower-triangular L (recursive blocked
    forward substitution)."""
    n = L.shape[-1]
    if n <= _TRSM_LEAF:
        # in-place row updates on the (batch, n, k) buffer — NOT
        # jnp.stack of row vectors: stack's expanded singleton axis lands
        # minor-most in the temps' layout and pads to 128 lanes (measured
        # f32[5677,1,106] -> 310 MB, a 135x expansion, OOMing the compile)
        X = B
        for i in range(n):
            acc = X[..., i, :]
            for j in range(i):
                acc = acc - L[..., i, j, None] * X[..., j, :]
            if not unit:
                acc = acc / L[..., i, i, None]
            X = X.at[..., i, :].set(acc)
        return X
    m = n // 2
    X1 = _solve_lower(L[..., :m, :m], B[..., :m, :], unit, prec)
    B2 = B[..., m:, :] - jnp.matmul(L[..., m:, :m], X1, precision=prec)
    X2 = _solve_lower(L[..., m:, m:], B2, unit, prec)
    return jnp.concatenate([X1, X2], axis=-2)


def _tri_small(a, b, left_side=False, lower=True, transpose_a=False,
               unit_diagonal=False):
    """lax.linalg.triangular_solve semantics (the flag combinations this
    module uses; conjugate_a unsupported) via _solve_lower."""
    prec = _mm_prec(a.dtype)
    if not left_side:
        # X op(A) = B  <=>  op(A)^T X^T = B^T
        N = a if transpose_a else jnp.swapaxes(a, -1, -2)
        nlower = lower if transpose_a else not lower
        X = _tri_small(N, jnp.swapaxes(b, -1, -2), left_side=True,
                       lower=nlower, unit_diagonal=unit_diagonal)
        return jnp.swapaxes(X, -1, -2)
    M = a if not transpose_a else jnp.swapaxes(a, -1, -2)
    mlower = lower if not transpose_a else not lower
    if mlower:
        return _solve_lower(M, b, unit_diagonal, prec)
    # upper-triangular left solve: index-reversal maps it to a lower solve
    Xr = _solve_lower(M[..., ::-1, ::-1], b[..., ::-1, :],
                      unit_diagonal, prec)
    return Xr[..., ::-1, :]


def _tri(a, b, **kw):
    batch = 1
    for s in a.shape[:-2]:
        batch *= int(s)
    # substitution only under the fallback/forced policy AND on the shape
    # class where the custom call's scoped workspace can overflow (large
    # batches of small fronts) — everywhere else the custom call wins
    if (_TRSM_FORCE_SMALL and _TRSM_POLICY != "0"
            and a.shape[-1] <= _TRSM_SMALL_N and batch >= _TRSM_MIN_BATCH
            and not kw.get("conjugate_a", False)):
        # flatten batch dims to ONE: a singleton interior batch axis would
        # otherwise land minor-most in the leaf row temps' layout and pad
        # to 128 lanes (measured f32[5677,1,106] -> 310 MB, a 135x
        # expansion that OOMed the 1M-dof stage compile)
        x = _tri_small(a.reshape((batch,) + a.shape[-2:]),
                       b.reshape((batch,) + b.shape[-2:]), **kw)
        return x.reshape(b.shape)
    return jax.lax.linalg.triangular_solve(a, b, **kw)


_CHOL_LEAF = 24


def chol_inv_blocked(A):
    """Batched (B, n, n) SPD Cholesky that CO-PRODUCES the triangular
    inverse: returns (L, Linv) with A = L Lᵀ and Linv = L⁻¹ (lower).

    Rationale: lax.linalg.cholesky lowers to a While loop and
    triangular_solve to a substitution custom call — at the multifrontal's
    small-NC/huge-B levels both are iteration-overhead-bound (measured
    ~100 ms of the 169 ms 262k factor for ~20 GFLOP of work, 0.5% MXU).
    This kernel is pure batched matmuls via recursive 2x2 blocking; the
    leaf co-computes the inverse Gauss-Jordan style (the factor's
    elementary matrices applied to I), so the front's trsm collapses to
    ONE MXU matmul  L21 = F21 @ Linvᵀ."""
    n = A.shape[-1]
    prec = _mm_prec(A.dtype)
    if n <= _CHOL_LEAF:
        X = A
        L = jnp.zeros_like(A)
        M = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        idx = jnp.arange(n)
        for j in range(n):
            d = jnp.sqrt(X[:, j, j])
            col = X[:, :, j] / d[:, None]
            col = jnp.where(idx[None, :] >= j, col, jnp.zeros_like(col))
            L = L.at[:, :, j].set(col)
            colb = jnp.where(idx[None, :] > j, col, jnp.zeros_like(col))
            # trailing Schur update (rows/cols <= j go stale, never read)
            X = X - colb[:, :, None] * colb[:, None, :]
            # Linv: apply the same elementary row op to M
            mrow = M[:, j, :] / d[:, None]
            M = M.at[:, j, :].set(mrow)
            M = M - colb[:, :, None] * mrow[:, None, :]
        return L, M
    k = -(-(n // 2) // 8) * 8  # mid split, 8-row aligned
    A11, A21, A22 = A[:, :k, :k], A[:, k:, :k], A[:, k:, k:]
    L11, M11 = chol_inv_blocked(A11)
    L21 = jnp.matmul(A21, jnp.swapaxes(M11, 1, 2), precision=prec)
    S = A22 - jnp.matmul(L21, jnp.swapaxes(L21, 1, 2), precision=prec)
    L22, M22 = chol_inv_blocked(S)
    M21 = -jnp.matmul(M22, jnp.matmul(L21, M11, precision=prec),
                      precision=prec)
    B = A.shape[0]
    zt = jnp.zeros((B, k, n - k), A.dtype)
    L = jnp.concatenate([jnp.concatenate([L11, zt], axis=2),
                         jnp.concatenate([L21, L22], axis=2)], axis=1)
    M = jnp.concatenate([jnp.concatenate([M11, zt], axis=2),
                         jnp.concatenate([M21, M22], axis=2)], axis=1)
    return L, M


def ldl_inv_blocked(F, eps):
    """Batched unpivoted LDLᵀ co-producing the unit-L inverse — the LDL
    analogue of chol_inv_blocked (matmul-only; no While loops / custom
    calls). Returns (unit-lower L, d, Linv, n_perturbed)."""
    n = F.shape[-1]
    prec = _mm_prec(F.dtype)
    if n <= _CHOL_LEAF:
        X = F
        L = jnp.broadcast_to(jnp.eye(n, dtype=F.dtype), F.shape)
        M = L
        idx = jnp.arange(n)
        dcols = []
        npert = jnp.zeros((), jnp.int32)
        for j in range(n):
            dj, pj = _clamp(X[:, j, j], eps)
            npert = npert + pj
            colb = X[:, :, j] / dj[:, None]
            colb = jnp.where(idx[None, :] > j, colb, jnp.zeros_like(colb))
            L = L.at[:, :, j].add(colb)
            X = X - (colb * dj[:, None])[:, :, None] * colb[:, None, :]
            mrow = M[:, j, :]
            M = M - colb[:, :, None] * mrow[:, None, :]
            dcols.append(dj)
        return L, jnp.stack(dcols, axis=1), M, npert
    k = -(-(n // 2) // 8) * 8
    F11, F21, F22 = F[:, :k, :k], F[:, k:, :k], F[:, k:, k:]
    L11, d1, M11, p1 = ldl_inv_blocked(F11, eps)
    W = jnp.matmul(F21, jnp.swapaxes(M11, 1, 2), precision=prec)
    L21 = W / d1[:, None, :]
    S = F22 - jnp.matmul(L21, jnp.swapaxes(W, 1, 2), precision=prec)
    L22, d2, M22, p2 = ldl_inv_blocked(S, eps)
    M21 = -jnp.matmul(M22, jnp.matmul(L21, M11, precision=prec),
                      precision=prec)
    B = F.shape[0]
    zt = jnp.zeros((B, k, n - k), F.dtype)
    L = jnp.concatenate([jnp.concatenate([L11, zt], axis=2),
                         jnp.concatenate([L21, L22], axis=2)], axis=1)
    M = jnp.concatenate([jnp.concatenate([M11, zt], axis=2),
                         jnp.concatenate([M21, M22], axis=2)], axis=1)
    return L, jnp.concatenate([d1, d2], axis=1), M, p1 + p2


def batched_ldl(F, eps):
    """Unpivoted LDLᵀ of a (B, n, n) symmetric batch (plain transpose — also
    valid complex-symmetric). Returns (unit-lower L, d, n_perturbed)."""
    n = F.shape[-1]
    if n == 1:
        d, npert = _clamp(F[:, 0, 0], eps)
        return jnp.ones_like(F), d[:, None], npert
    k = n // 2
    F11, F12 = F[:, :k, :k], F[:, :k, k:]
    F21, F22 = F[:, k:, :k], F[:, k:, k:]
    del F12
    L11, d1, p1 = batched_ldl(F11, eps)
    # W = F21 L11^{-T};  L21 = W D1^{-1};  S = F22 - L21 Wᵀ
    W = _tri(L11, F21, left_side=False, lower=True, transpose_a=True,
             unit_diagonal=True)
    L21 = W / d1[:, None, :]
    S22 = F22 - jnp.matmul(L21, jnp.swapaxes(W, 1, 2),
                           precision=_mm_prec(F.dtype))
    L22, d2, p2 = batched_ldl(S22, eps)
    B = F.shape[0]
    top = jnp.concatenate([L11, jnp.zeros((B, k, n - k), F.dtype)], axis=2)
    bot = jnp.concatenate([L21, L22], axis=2)
    return jnp.concatenate([top, bot], axis=1), \
        jnp.concatenate([d1, d2], axis=1), p1 + p2


def batched_lu(F, eps):
    """Unpivoted LU of a (B, n, n) batch with diagonal perturbation.
    Returns (unit-lower L, upper U, n_perturbed)."""
    n = F.shape[-1]
    if n == 1:
        u, npert = _clamp(F[:, 0, 0], eps)
        return jnp.ones_like(F), u[:, None, None], npert
    k = n // 2
    F11, F12 = F[:, :k, :k], F[:, :k, k:]
    F21, F22 = F[:, k:, :k], F[:, k:, k:]
    L11, U11, p1 = batched_lu(F11, eps)
    U12 = _tri(L11, F12, left_side=True, lower=True, unit_diagonal=True)
    L21 = _tri(U11, F21, left_side=False, lower=False)
    S22 = F22 - jnp.matmul(L21, U12, precision=_mm_prec(F.dtype))
    L22, U22, p2 = batched_lu(S22, eps)
    B = F.shape[0]
    zt = jnp.zeros((B, k, n - k), F.dtype)
    L = jnp.concatenate([jnp.concatenate([L11, zt], axis=2),
                         jnp.concatenate([L21, L22], axis=2)], axis=1)
    U = jnp.concatenate([jnp.concatenate([U11, U12], axis=2),
                         jnp.concatenate([jnp.zeros((B, n - k, k), F.dtype),
                                          U22], axis=2)], axis=1)
    return L, U, p1 + p2


# ---------------------------------------------------------------------------
# plan construction (host, cached per structural hash)
# ---------------------------------------------------------------------------

class _Level:
    """Static metadata of one wave level (local: stacked (S, ...) arrays;
    top: plain arrays)."""
    __slots__ = ("B", "NC", "NF", "a_src", "a_dst", "diag", "ea", "ea_cross",
                 "ccol", "crow")

    def __init__(self):
        self.ea = []        # (child_level, src, dst)
        self.ea_cross = []  # (src_into_cross, dst) — top levels only


def _pad2(rows_list, fill, width=None):
    """list of 1-D int arrays -> (len, W) int32 padded with ``fill``."""
    W = width if width is not None else max((len(r) for r in rows_list),
                                            default=0)
    W = max(W, 1)
    out = np.full((len(rows_list), W), fill, dtype=np.int32)
    for i, r in enumerate(rows_list):
        out[i, : len(r)] = r
    return out


def _pad2_sorted(dst_list, src_list, oob_base, src_fill):
    """Per-row: sort (dst, src) jointly by dst; pad dst with DISTINCT
    ascending out-of-bounds values (oob_base + 0, 1, ...) and src with the
    zero slot. The resulting scatter index rows are strictly sorted and
    duplicate-free end to end, so the device scatter can legally carry
    ``indices_are_sorted=True, unique_indices=True`` — without the hints
    XLA's TPU scatter serializes for determinism (assembly measured
    ~100 M elem/s, scalar-issue class)."""
    W = max((len(r) for r in dst_list), default=0)
    W = max(W, 1)
    D = np.empty((len(dst_list), W), np.int32)
    Sr = np.full((len(dst_list), W), src_fill, np.int32)
    for i, (d, s) in enumerate(zip(dst_list, src_list)):
        o = np.argsort(d, kind="stable")
        D[i, : len(d)] = d[o]
        Sr[i, : len(d)] = np.asarray(s)[o]
        D[i, len(d):] = oob_base + np.arange(W - len(d), dtype=np.int64)
    return D, Sr


def _pad_oob(rows_list, oob_base):
    """Pad already-sorted, duplicate-free index rows with distinct
    ascending OOB values (companion of _pad2_sorted for .at[].set)."""
    W = max((len(r) for r in rows_list), default=0)
    W = max(W, 1)
    out = np.empty((len(rows_list), W), np.int32)
    for i, r in enumerate(rows_list):
        out[i, : len(r)] = r
        out[i, len(r):] = oob_base + np.arange(W - len(r), dtype=np.int64)
    return out


def _ea_dst_flat(dstb, psl, NF, oob):
    """(…, C) batch slots + (…, C, NR) parent slots -> flat front indices
    (…, C, NR, NR), computed on device (never materialized on host:
    O(sum nr^2) would sink 3D problems)."""
    pi = psl[..., :, None]
    pj = psl[..., None, :]
    dst = (dstb[..., None, None] * NF + pi) * NF + pj
    return jnp.where((pi < 0) | (pj < 0), oob, dst)


class DeviceScheduleError(ValueError):
    """Pattern unsuited to the device wave schedule (e.g. chain trees from
    banded matrices). Solver dispatch catches this and falls back to the
    host engine automatically."""


class DeviceMF:
    """Mesh-distributed multifrontal engine for one sparsity pattern."""

    def __init__(self, A_csr: sp.csr_matrix, backend, kind: str = "ldl",
                 dtype=np.float32, row_partition=None):
        self._row_partition = row_partition
        if kind not in ("chol", "ldl", "lu"):
            raise ValueError(f"unknown kind {kind!r}")
        import os

        if not os.environ.get("HPCLINALG_NO_COMPILE_CACHE"):
            # minutes-scale remote compiles dominate plan construction;
            # persist them so repeat patterns skip compilation entirely
            from ..config import enable_compile_cache

            enable_compile_cache()
        self.kind = kind
        self.dtype = np.dtype(dtype)
        self.backend = backend
        # every static index array is registered here and passed to the
        # jitted executables as an ARGUMENT pytree — closing over them would
        # embed multi-MB constants in the HLO, which blows up compile time
        # (measured 333 s vs ~40 s at n=262k through the remote compiler)
        self._bufs: list = []
        S = backend.nshards
        self.S = S
        n = A_csr.shape[0]
        self.n = n

        perm = amd_order(A_csr.indptr.astype(np.int64),
                         A_csr.indices.astype(np.int64), n)
        sym = symbolic.analyze(A_csr, perm)
        # device-tuned amalgamation for scatter-bound (low arithmetic
        # intensity, 2D-stencil-class) trees: merge harder — explicit-zero
        # flops are cheap on the MXU, scatter elements and wave levels are
        # not (measured n=262k 2D: 665 -> 553 ms steady). Flop-dominated 3D
        # trees (high flops/lnz) keep the lean host setting.
        #
        # Ordering stays AMD here even though analyze_best prefers nested
        # dissection on these patterns for the HOST engine. Measured on-chip
        # at 2D 262k f32 chol (tools/ab_ordering_device.py, v5e): AMD
        # factor 303 ms / solve 109 ms vs ND 446 / 133 — ND's host metrics
        # (flops 11.2G vs 21.6G, lnz 17.5M vs 20.3M, padded front flops
        # 22.5G vs 50G) ALL favor it, yet it is 47% slower: the device
        # factor is bound by extend-add table traffic and supernode count
        # (ND: 51k fronts vs 35.7k, +20% EA scatter elements), not flops.
        if sym.lnz and sym.flops / sym.lnz < 3000:
            sym = symbolic.analyze(A_csr, perm, relax=64, zeros_frac=0.5,
                                   small=64)
        self.sym = sym
        ns = sym.nsuper
        ptr, rows_of = sym.snode_ptr, sym.snode_rows
        parent = sym.snode_parent

        owner = proportional_map(sym, S)
        self.owner = owner

        # -- wave levels ----------------------------------------------------
        lvl = np.zeros(ns, dtype=np.int64)     # local levels (per shard tree)
        tlvl = np.zeros(ns, dtype=np.int64)    # top levels
        for k in range(ns):
            p = int(parent[k])
            if p < 0:
                continue
            if owner[k] >= 0 and owner[p] == owner[k]:
                lvl[p] = max(lvl[p], lvl[k] + 1)
            elif owner[k] < 0 and owner[p] < 0:
                tlvl[p] = max(tlvl[p], tlvl[k] + 1)
        nloc_lvl = int(lvl[owner >= 0].max()) + 1 if (owner >= 0).any() else 0
        ntop_lvl = int(tlvl[owner < 0].max()) + 1 if (owner < 0).any() else 0

        # per (level): fronts per shard (local) / flat list (top)
        loc_fronts = [[[] for _ in range(S)] for _ in range(nloc_lvl)]
        top_fronts = [[] for _ in range(ntop_lvl)]
        slot = {}  # supernode -> ("loc", l, s, b) | ("top", l, b)
        for k in range(ns):
            if owner[k] >= 0:
                l, s = int(lvl[k]), int(owner[k])
                slot[k] = ("loc", l, s, len(loc_fronts[l][s]))
                loc_fronts[l][s].append(k)
            else:
                l = int(tlvl[k])
                slot[k] = ("top", l, len(top_fronts[l]))
                top_fronts[l].append(k)

        nc_of = np.diff(ptr).astype(np.int64)
        nr_of = np.array([len(r) for r in rows_of], dtype=np.int64)

        def front_slot(k, ids):
            """Front-local slot of each global permuted id for supernode k."""
            j0, j1 = int(ptr[k]), int(ptr[k + 1])
            NCl = self._lvl_geom[k][0]
            within = (ids >= j0) & (ids < j1)
            ri = np.searchsorted(rows_of[k], ids)
            return np.where(within, ids - j0, NCl + ri)

        # level geometry (shared NC/NF per level; identity padding)
        self.local_levels: list[_Level] = []
        self.top_levels: list[_Level] = []
        self._lvl_geom = {}
        for l in range(nloc_lvl):
            ks_all = [k for s in range(S) for k in loc_fronts[l][s]]
            NC = int(nc_of[ks_all].max())
            NF = NC + int(nr_of[ks_all].max())
            B = max(max(len(loc_fronts[l][s]) for s in range(S)), 1)
            m = _Level()
            m.B, m.NC, m.NF = B, NC, NF
            self.local_levels.append(m)
            for k in ks_all:
                self._lvl_geom[k] = (NC, NF)
        for l in range(ntop_lvl):
            ks_all = top_fronts[l]
            NC = int(nc_of[ks_all].max())
            NF = NC + int(nr_of[ks_all].max())
            m = _Level()
            m.B, m.NC, m.NF = max(len(ks_all), 1), NC, NF
            self.top_levels.append(m)
            for k in ks_all:
                self._lvl_geom[k] = (NC, NF)
        for m in (*self.local_levels, *self.top_levels):
            if m.B * m.NF * m.NF >= 2**31 - 1:
                raise ValueError(
                    "front batch exceeds int32 index space "
                    f"(B={m.B}, NF={m.NF})")
        # deep chain trees (banded matrices) make the wave schedule
        # sequential: each level is one unrolled stage of the jit, so
        # hundreds of levels explode trace/compile time and run serially
        # anyway — the host engine is the right tool there
        if len(self.local_levels) + len(self.top_levels) > 128:
            raise DeviceScheduleError(
                f"elimination tree too deep for the device wave schedule "
                f"({len(self.local_levels)} local + {len(self.top_levels)} "
                "top levels; banded/chain-structured patterns serialize) — "
                "use the host engine (method='host')")

        # -- assembly maps: A entries (global CSR order) -> front slots ------
        # the gathered distributed nzval (concat of contiguous row shards,
        # indices sorted) IS the global CSR data order, so entry t maps to
        # permuted (r2, c2) straight from the replicated pattern
        A_csr = sp.csr_matrix(A_csr)
        A_csr.sort_indices()
        rg = np.repeat(np.arange(n, dtype=np.int64), np.diff(A_csr.indptr))
        cg = A_csr.indices.astype(np.int64)
        r2 = sym.iperm[rg]
        c2 = sym.iperm[cg]
        tpos = np.arange(len(r2), dtype=np.int64)
        if kind != "lu":
            keep = r2 >= c2  # lower triangle only (symmetric kinds)
            r2, c2, tpos = r2[keep], c2[keep], tpos[keep]
        dest = sym.snode_of[np.minimum(r2, c2)]

        asm = {}  # (kind of level, l, s|None) -> ([srcs], [dsts])
        order = np.argsort(dest, kind="stable")
        r2o, c2o, tpo, do = r2[order], c2[order], tpos[order], dest[order]
        bounds = np.flatnonzero(np.diff(do)) + 1
        groups = np.split(np.arange(len(do)), bounds)
        for g in groups:
            if not len(g):
                continue
            k = int(do[g[0]])
            kindL, *loc = slot[k]
            NC, NF = self._lvl_geom[k]
            I = front_slot(k, r2o[g])
            J = front_slot(k, c2o[g])
            if kindL == "loc":
                l, s, b = loc
                key = ("loc", l, s)
            else:
                l, b = loc
                key = ("top", l, None)
            flat = (b * NF + I) * NF + J
            sr, ds = asm.setdefault(key, ([], []))
            sr.append(tpo[g])
            ds.append(flat)

        nnzA = len(rg)
        self.nnzA = nnzA

        def pack_asm(m, l, is_top):
            if is_top:
                sr, ds = asm.get(("top", l, None), ([], []))
                D, Sr = _pad2_sorted(
                    [np.concatenate(ds) if ds else np.zeros(0, np.int64)],
                    [np.concatenate(sr) if sr else np.zeros(0, np.int64)],
                    m.B * m.NF * m.NF, nnzA)
                m.a_src = self._reg(jnp.asarray(Sr[0]))
                m.a_dst = self._reg(jnp.asarray(D[0]))
            else:
                srcs, dsts = [], []
                for s in range(S):
                    sr, ds = asm.get(("loc", l, s), ([], []))
                    srcs.append(np.concatenate(sr) if sr
                                else np.zeros(0, np.int64))
                    dsts.append(np.concatenate(ds) if ds
                                else np.zeros(0, np.int64))
                D, Sr = _pad2_sorted(dsts, srcs, m.B * m.NF * m.NF, nnzA)
                m.a_src = self._reg(self._dev(Sr))
                m.a_dst = self._reg(self._dev(D))

        # -- identity padding (diag slots not covered by a real front) -------
        def pack_diag(m, fronts_by_slot, is_top):
            def one(frs):
                ds = []
                for b in range(m.B):
                    if b < len(frs):
                        k = frs[b]
                        nc_k = int(ptr[k + 1] - ptr[k])
                        i = np.concatenate([
                            np.arange(nc_k, m.NC, dtype=np.int64),
                            np.arange(m.NC + len(rows_of[k]), m.NF,
                                      dtype=np.int64)])
                    else:
                        i = np.arange(m.NF, dtype=np.int64)
                    ds.append(b * m.NF * m.NF + i * (m.NF + 1))
                return (np.concatenate(ds) if ds
                        else np.zeros(0, dtype=np.int64))
            if is_top:
                m.diag = self._reg(jnp.asarray(
                    _pad_oob([one(fronts_by_slot)], m.B * m.NF * m.NF)[0]))
            else:
                m.diag = self._reg(self._dev(
                    _pad_oob([one(fronts_by_slot[s]) for s in range(S)],
                             m.B * m.NF * m.NF)))

        # -- extend-add maps --------------------------------------------------
        # COMPACT representation: the per-child nr x nr scatter indices are
        # never materialized (O(sum nr^2) host/device memory would sink 3D
        # problems); we store only each child's parent-slot vector psl
        # (O(sum nr)) plus batch slots, and the jitted executable computes
        # dst[b, i, j] = (b_parent*NF + psl[i])*NF + psl[j] on device by
        # broadcasting.
        # cross buffer: local subtree roots with a top parent
        croff = {}
        off = 0
        for k in range(ns):
            if owner[k] >= 0 and int(parent[k]) >= 0 \
                    and owner[int(parent[k])] < 0:
                croff[k] = off
                off += int(nr_of[k]) ** 2
        self.CROSS = max(off, 1)

        ea_loc = {}    # (lp, lc) -> per shard [(bc, bp, psl)]
        ea_top = {}    # (lp, lc) -> [(bc, bp, psl)]
        cross_out = {}  # lc -> per shard [(bc, croff, nr)]
        cross_in = {}   # lp -> [(croff, nr, bp, psl)]
        for k in range(ns):
            p = int(parent[k])
            if p < 0 or int(nr_of[k]) == 0:
                continue
            pslot = front_slot(p, rows_of[k]).astype(np.int32)
            pk, *ploc = slot[p]
            kk, *kloc = slot[k]
            nr = int(nr_of[k])
            if kk == "loc" and pk == "loc":
                lp, sp_, bp = ploc
                lc, sc, bc = kloc
                ea_loc.setdefault((lp, lc), [[] for _ in range(S)])[sp_]\
                    .append((bc, bp, pslot))
            elif kk == "loc" and pk == "top":
                lc, sc, bc = kloc
                lp, bp = ploc
                cross_out.setdefault(lc, [[] for _ in range(S)])[sc]\
                    .append((bc, croff[k], nr))
                cross_in.setdefault(lp, []).append((croff[k], nr, bp, pslot))
            else:  # top -> top
                lp, bp = ploc
                lc, bc = kloc
                ea_top.setdefault((lp, lc), []).append((bc, bp, pslot))

        def _pack_group(entries, NR):
            """[(bc, bp, psl)] -> (srcb (C,), dstb (C,), psl (C, NR))."""
            C = max(len(entries), 1)
            srcb = np.zeros(C, dtype=np.int32)
            dstb = np.zeros(C, dtype=np.int32)
            psl = np.full((C, NR), -1, dtype=np.int32)
            for i, (bc, bp, ps) in enumerate(entries):
                srcb[i] = bc
                dstb[i] = bp
                psl[i, : len(ps)] = ps
            return srcb, dstb, psl

        def _pack_group_sharded(per_shard, NR):
            packed = [_pack_group(per_shard[s], NR) for s in range(S)]
            C = max(p0[0].shape[0] for p0 in packed)
            srcb = np.zeros((S, C), dtype=np.int32)
            dstb = np.zeros((S, C), dtype=np.int32)
            psl = np.full((S, C, NR), -1, dtype=np.int32)
            for s, (sb, db, ps) in enumerate(packed):
                srcb[s, : sb.shape[0]] = sb
                dstb[s, : db.shape[0]] = db
                psl[s, : ps.shape[0]] = ps
            return srcb, dstb, psl

        # -- row-distributed solve-phase spaces (VERDICT r2 #4) ---------------
        # Per-shard COMPACT column space instead of O(n) full-length solve
        # buffers: shard s's space is the union of its supernodes' column
        # ranges ([0, M_s)) plus a copy of the replicated top set at
        # [Mmax, Mmax+TOPM). Local fronts only ever touch own columns and
        # top rows (proportional mapping invariant), so every ccol/crow id
        # translates into this space — per-device solve memory becomes
        # O(n/S + |top|), the cuDSS row-1d distributed-RHS contract
        # (CUDAExt:672-689, 835-885).
        topset: set = set()
        for ks in top_fronts:
            for k2 in ks:
                topset.update(range(int(ptr[k2]), int(ptr[k2 + 1])))
                topset.update(int(r) for r in rows_of[k2])
        topids = np.array(sorted(topset), dtype=np.int64)
        self.TOPM = TOPM = len(topids)
        topmap = np.full(n + 1, TOPM, dtype=np.int64)
        if TOPM:
            topmap[topids] = np.arange(TOPM)
        loc_lists = [[] for _ in range(S)]
        for k2 in range(ns):
            if owner[k2] >= 0:
                loc_lists[int(owner[k2])].append(
                    np.arange(int(ptr[k2]), int(ptr[k2 + 1])))
        cid = [np.sort(np.concatenate(ll)) if ll else np.zeros(0, np.int64)
               for ll in loc_lists]
        self.Ms = np.array([len(c) for c in cid], dtype=np.int64)
        Mmax = int(self.Ms.max()) if S else 0
        self.Mmax = Mmax
        from ..config import round_up as _ru

        self.SVPAD = _ru(max(Mmax + TOPM, 1))   # in-plan out_pad
        SENT = self.SVPAD                        # sentinel slot (zeroed)
        # per-shard translation: global permuted id -> compact slot
        cmap = np.full((S, n + 1), SENT, dtype=np.int64)
        for s in range(S):
            cmap[s, cid[s]] = np.arange(len(cid[s]))
        if TOPM:
            cmap[:, topids] = Mmax + topmap[topids][None, :]
        self._cid, self._topids = cid, topids

        # -- solve gather maps (translated into the compact spaces) -----------
        def pack_cols(m, fronts_by_slot, is_top):
            def one(frs, s):
                cc = np.full((m.B, m.NC), n, dtype=np.int64)
                cr = np.full((m.B, m.NF - m.NC), n, dtype=np.int64)
                for b, k in enumerate(frs):
                    j0, j1 = int(ptr[k]), int(ptr[k + 1])
                    cc[b, : j1 - j0] = np.arange(j0, j1)
                    cr[b, : len(rows_of[k])] = rows_of[k]
                if is_top:
                    return topmap[cc], topmap[cr]   # sentinel -> TOPM
                return cmap[s, cc], cmap[s, cr]     # sentinel -> SENT
            if is_top:
                cc, cr = one(fronts_by_slot, None)
                m.ccol = self._reg(jnp.asarray(cc.astype(np.int32)))
                m.crow = self._reg(jnp.asarray(cr.astype(np.int32)))
            else:
                ccs, crs = zip(*[one(fronts_by_slot[s], s) for s in range(S)])
                m.ccol = self._reg(self._dev(
                    np.stack(ccs).astype(np.int32)))
                m.crow = self._reg(self._dev(
                    np.stack(crs).astype(np.int32)))

        # -- finalize static arrays -------------------------------------------
        for l, m in enumerate(self.local_levels):
            pack_asm(m, l, False)
            pack_diag(m, loc_fronts[l], False)
            pack_cols(m, loc_fronts[l], False)
            for (lp, lc), per_shard in sorted(x for x in ea_loc.items()
                                              if x[0][0] == l):
                mc = self.local_levels[lc]
                NRc = mc.NF - mc.NC
                srcb, dstb, psl = _pack_group_sharded(per_shard, NRc)
                m.ea.append((lc, self._reg(self._dev(srcb)),
                             self._reg(self._dev(dstb)),
                             self._reg(self._dev(psl))))
        for l, m in enumerate(self.top_levels):
            pack_asm(m, l, True)
            pack_diag(m, top_fronts[l], True)
            pack_cols(m, top_fronts[l], True)
            for (lp, lc), entries in sorted(x for x in ea_top.items()
                                            if x[0][0] == l):
                mc = self.top_levels[lc]
                NRc = mc.NF - mc.NC
                srcb, dstb, psl = _pack_group(entries, NRc)
                m.ea.append((lc, self._reg(jnp.asarray(srcb)),
                             self._reg(jnp.asarray(dstb)),
                             self._reg(jnp.asarray(psl))))
            if l in cross_in:
                entries = cross_in[l]
                NRX = max(len(e[3]) for e in entries)
                C = len(entries)
                co = np.zeros(C, dtype=np.int32)
                nrv = np.zeros(C, dtype=np.int32)
                dstb = np.zeros(C, dtype=np.int32)
                psl = np.full((C, NRX), -1, dtype=np.int32)
                for i, (o, nr, bp, ps) in enumerate(entries):
                    co[i], nrv[i], dstb[i] = o, nr, bp
                    psl[i, : len(ps)] = ps
                m.ea_cross.append((self._reg(jnp.asarray(co)),
                                   self._reg(jnp.asarray(nrv)),
                                   self._reg(jnp.asarray(dstb)),
                                   self._reg(jnp.asarray(psl)), NRX))

        # cross scatter (per child level): update buffer -> (S, CROSS)
        self.cross_maps = []
        for lc, per_shard in sorted(cross_out.items()):
            C = max(max(len(per_shard[s]) for s in range(S)), 1)
            srcb = np.zeros((S, C), dtype=np.int32)
            co = np.full((S, C), self.CROSS, dtype=np.int32)  # pad -> OOB
            nrv = np.zeros((S, C), dtype=np.int32)
            for s in range(S):
                for i, (bc, o, nr) in enumerate(per_shard[s]):
                    srcb[s, i], co[s, i], nrv[s, i] = bc, o, nr
            self.cross_maps.append((lc, self._reg(self._dev(srcb)),
                                    self._reg(self._dev(co)),
                                    self._reg(self._dev(nrv))))

        # top column ids in the top-compact space (device)
        topcols = np.concatenate(
            [np.arange(int(ptr[k]), int(ptr[k + 1])) for k in range(ns)
             if owner[k] < 0]) if (owner < 0).any() else np.zeros(0, np.int64)
        self.n_topcols = len(topcols)
        self.topcols = self._reg(jnp.asarray(
            topmap[topcols].astype(np.int32)))

        # -- RHS in-gather / solution out-scatter plans (natural order <->
        # compact solve spaces; the fill-reducing permutation is folded in)
        from ..parallel.exchange import ExchangePlan
        from ..partition import global_to_local, padded_size
        from .. import partition as _partition_mod
        from ..ops.gather import gather_exchange_plan

        rp = backend_row_partition = getattr(self, "_row_partition", None)
        # row partition comes from the wrapping DistSparseMatrix; DeviceMF
        # itself is partition-agnostic, so default to the uniform split
        if rp is None:
            rp = _partition_mod.uniform_partition(n, S)
        self.row_partition = rp
        perm = sym.perm
        wanted = []
        for s in range(S):
            w = perm[cid[s]]
            if s == 0 and TOPM:
                filler = np.zeros(Mmax - len(w), dtype=np.int64)
                w = np.concatenate([w, filler, perm[topids]])
            wanted.append(w)
        self.in_plan = gather_exchange_plan(backend, rp, wanted,
                                            out_len=Mmax + TOPM)
        assert self.in_plan.out_pad == self.SVPAD
        send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        for s in range(S):
            nats = perm[cid[s]]
            owners_o, locs = global_to_local(rp, nats)
            slots = np.arange(len(nats), dtype=np.int64)
            for d in range(S):
                mm = owners_o == d
                if mm.any():
                    send[s][d] = slots[mm]
                    recv[d][s] = locs[mm]
        if TOPM:
            # top columns: every shard holds the replicated copy — the
            # natural-row owner reads its OWN copy (pure self-traffic)
            tnat = perm[topids]
            towners, tlocs = global_to_local(rp, tnat)
            for d in range(S):
                mm = towners == d
                if mm.any():
                    send[d][d] = np.concatenate(
                        [send[d][d], Mmax + np.flatnonzero(mm)])
                    recv[d][d] = np.concatenate([recv[d][d], tlocs[mm]])
        self.out_plan = ExchangePlan(backend, send, recv, padded_size(rp))

        self._trsm_small = _TRSM_FORCE_SMALL
        self._reset_jits()

        # -- fused vs staged factor execution --------------------------------
        # The single-jit factor gives XLA the whole level program (best
        # steady time: scatters overlap kernels across levels) but its
        # buffer-assignment peak is a few times the padded front volume —
        # at 2D 10^6 dof that is 28 GB against 15.75 GB of HBM, a hard
        # compile error. Above a working-set estimate we run each level as
        # its own jit: XLA frees a level's assembly intermediates at stage
        # exit, bounding peak at (persistent factors + updates + one
        # level's working set) for a few ms of extra dispatch overhead.
        itemsize = self.dtype.itemsize
        fsum = sum(S * m.B * m.NF * m.NF for m in self.local_levels) \
            * itemsize
        usum = sum(S * m.B * (m.NF - m.NC) ** 2 for m in self.local_levels) \
            * itemsize
        est = 4 * (fsum + usum)
        cap = int(os.environ.get("HPCLINALG_FUSED_FACTOR_CAP",
                                 str(10 << 30)))
        self._staged = est > cap
        self._stage_jits: dict = {}

    # ------------------------------------------------------------------
    def _reset_jits(self):
        """Fresh jit wrappers (forces a retrace, e.g. after a TRSM-policy
        flip)."""
        self._factor_jit = jax.jit(self._factor_impl)
        self._solve_jit = jax.jit(self._solve_impl, static_argnums=(4,))
        self._stage_jits = {}
        if hasattr(self, "_prep_jit"):
            del self._prep_jit
        self._prep_cache = None

    def _with_trsm(self, fn, *args):
        """Run fn with the module TRSM switch set to this engine's policy
        for the duration (the switch is read at trace time only)."""
        global _TRSM_FORCE_SMALL
        old = _TRSM_FORCE_SMALL
        _TRSM_FORCE_SMALL = self._trsm_small
        try:
            return fn(*args)
        finally:
            _TRSM_FORCE_SMALL = old

    def _run_oom_guarded(self, fn, *args):
        """Invoke a jitted path; if the compile hits the scoped-VMEM wall
        of the triangular_solve custom call (or any compile OOM), retrace
        this engine with the substitution TRSM and retry once."""
        try:
            return self._with_trsm(fn, *args)
        except Exception as e:  # noqa: BLE001 — filtered below
            if (self._trsm_small or _TRSM_POLICY == "0"
                    or not _is_compile_oom(e)):
                raise
            self._trsm_small = True
            self._reset_jits()
            return self._with_trsm(fn, *args)

    # ------------------------------------------------------------------
    def _stage(self, l):
        """Per-level jitted stage for the staged factor path (cached)."""
        hit = self._stage_jits.get(l)
        if hit is not None:
            return hit
        m = self.local_levels[l]
        need = sorted({lc for lc, *_ in m.ea})

        def stage(bufs, Av, upds_in, eps):
            upds = dict(zip(need, upds_in))
            return self._local_level_body(m, bufs, Av, upds, eps)

        out = (jax.jit(stage), need)
        self._stage_jits[l] = out
        return out

    def _factor_staged(self, Avals, eps):
        bufs = self._bufs
        jits = self._stage_jits
        if "prep" not in jits:
            dt = self.dtype
            jits["prep"] = jax.jit(lambda Av: jnp.concatenate(
                [Av.astype(dt), jnp.zeros(1, dt)]))
            cn = sorted({lc for lc, *_ in self.cross_maps})
            jits["cross"] = (jax.jit(lambda bufs, upds_in: self._cross_body(
                bufs, dict(zip(cn, upds_in)))), cn)
            jits["top"] = jax.jit(self._top_body)
            jits["npert"] = jax.jit(
                lambda ps: jnp.stack(list(ps)).sum().astype(jnp.int32))
        Av = jits["prep"](Avals)
        upds: dict = {}
        loc_factors = []
        nperts = []
        for l in range(len(self.local_levels)):
            fn, need = self._stage(l)
            fac, U, p = fn(bufs, Av, tuple(upds[lc] for lc in need), eps)
            upds[l] = U
            loc_factors.append(fac)
            nperts.append(p)
        cfn, cn = jits["cross"]
        crossp = cfn(bufs, tuple(upds[lc] for lc in cn))
        top_factors, ptop = jits["top"](bufs, Av, crossp, eps)
        nperts.append(ptop)
        return loc_factors, top_factors, jits["npert"](tuple(nperts))

    # ------------------------------------------------------------------
    def _dev(self, arr):
        return jax.device_put(arr, self.backend.row_sharding(arr.ndim - 2))

    def _reg(self, arr) -> int:
        """Register a static device array; returns its handle into the
        buffer pytree passed to the jitted executables."""
        self._bufs.append(arr)
        return len(self._bufs) - 1

    # ------------------------------------------------------------------
    # numeric factorization (one jit)
    # ------------------------------------------------------------------
    def _take(self, x, idx):
        """vmapped per-shard take: x (S, L), idx (S, K) -> (S, K)."""
        return jax.vmap(lambda xs, ix: jnp.take(xs, ix, axis=0,
                                                mode="fill", fill_value=0))(x, idx)

    def _front_kernel(self, F, NC, eps):
        """Factor one padded batch (B', NF, NF); returns per-kind factor
        tuple + update (B', NR, NR) + n_perturbed."""
        NF = F.shape[-1]
        F11 = F[:, :NC, :NC]
        F21 = F[:, NC:, :NC]
        F22 = F[:, NC:, NC:]
        if self.kind == "chol":
            # fronts are assembled lower-triangle-only for symmetric kinds;
            # the default symmetrize_input would halve the off-diagonals.
            if _use_inv_kernel(NC):
                L11, Minv = chol_inv_blocked(F11)
                L21 = jnp.matmul(F21, jnp.swapaxes(Minv, 1, 2),
                                 precision=_mm_prec(F.dtype))
            else:
                L11 = jax.lax.linalg.cholesky(F11, symmetrize_input=False)
                L21 = _tri(L11, F21, left_side=False, lower=True,
                           transpose_a=True)
            U = F22 - jnp.matmul(L21, jnp.swapaxes(L21, 1, 2),
                                 precision=_mm_prec(F.dtype))
            return (L11, L21), U, jnp.zeros((), jnp.int32)
        if self.kind == "ldl":
            if _use_inv_kernel(NC):
                L11, d, Minv, npert = ldl_inv_blocked(F11, eps)
                W = jnp.matmul(F21, jnp.swapaxes(Minv, 1, 2),
                               precision=_mm_prec(F.dtype))
            else:
                L11, d, npert = batched_ldl(F11, eps)
                W = _tri(L11, F21, left_side=False, lower=True,
                         transpose_a=True, unit_diagonal=True)
            L21 = W / d[:, None, :]
            U = F22 - jnp.matmul(L21, jnp.swapaxes(W, 1, 2),
                                 precision=_mm_prec(F.dtype))
            return (L11, d, L21), U, npert
        # lu
        F12 = F[:, :NC, NC:]
        L11, U11, npert = batched_lu(F11, eps)
        U12 = _tri(L11, F12, left_side=True, lower=True, unit_diagonal=True)
        L21 = _tri(U11, F21, left_side=False, lower=False)
        U = F22 - jnp.matmul(L21, U12, precision=_mm_prec(F.dtype))
        return (L11, U11, L21, U12), U, npert

    def _local_level_body(self, m, bufs, Av, upds, eps):
        """Assemble + extend-add + factor ONE local level batch.
        ``upds``: anything indexable by child level id. Returns
        (fac tuple (S, B, ...), U (S, B, NR, NR), n_perturbed)."""
        dt = self.dtype
        S = self.S
        B, NC, NF = m.B, m.NC, m.NF
        vals = jnp.take(Av, bufs[m.a_src], axis=0)  # (S, Ka) repl. source
        F = jnp.zeros((S, B * NF * NF), dt)
        F = jax.vmap(lambda f, d, v: f.at[d].add(
            v, mode="drop", unique_indices=True, indices_are_sorted=True))(
            F, bufs[m.a_dst], vals)
        F = jax.vmap(lambda f, d: f.at[d].set(
            1.0, mode="drop", unique_indices=True, indices_are_sorted=True))(
            F, bufs[m.diag])
        if EA_MATMUL and m.ea:
            F4 = F.reshape(S, B, NF, NF)
            for lc, srcb, dstb, psl in m.ea:
                u = jax.vmap(lambda Us, sb: Us[sb])(upds[lc], bufs[srcb])
                F4 = _ea_onehot_add(F4, bufs[dstb], bufs[psl], u, dt)
            F = F4.reshape(S, B * NF * NF)
        else:
            for lc, srcb, dstb, psl in m.ea:
                u = jax.vmap(lambda Us, sb: Us[sb])(upds[lc], bufs[srcb])
                dst = _ea_dst_flat(bufs[dstb], bufs[psl], NF, B * NF * NF)
                F = jax.vmap(lambda f, d, vv: f.at[d.reshape(-1)].add(
                    vv.reshape(-1), mode="drop"))(F, dst, u)
        F = F.reshape(S * B, NF, NF)
        fac, U, p = self._front_kernel(F, NC, eps)
        NR = NF - NC
        return (tuple(x.reshape((S, B) + x.shape[1:]) for x in fac),
                U.reshape(S, B, NR, NR), p)

    def _cross_body(self, bufs, upds):
        """Local subtree roots' updates -> replicated cross contributions
        (one mesh-wide reduction), padded with the zero slot."""
        dt = self.dtype
        S = self.S
        cross = jnp.zeros((S, self.CROSS), dt)
        for lc, srcb, co, nrv in self.cross_maps:
            U = upds[lc]
            NRc = U.shape[-1]
            u = jax.vmap(lambda Us, sb: Us[sb])(U, bufs[srcb])  # (S,C,NR,NR)
            ii = jax.lax.broadcasted_iota(jnp.int32, (NRc, NRc), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (NRc, NRc), 1)
            nre = bufs[nrv][:, :, None, None]
            dst = bufs[co][:, :, None, None] + ii * nre + jj
            dst = jnp.where((ii < nre) & (jj < nre), dst, self.CROSS)
            cross = jax.vmap(lambda c, d, vv: c.at[d.reshape(-1)].add(
                vv.reshape(-1), mode="drop"))(cross, dst, u)
        crossr = jnp.sum(cross, axis=0)  # all-reduce over the mesh axis
        return jnp.concatenate([crossr, jnp.zeros(1, dt)])  # zero slot

    def _factor_impl(self, bufs, Avals, eps):
        dt = self.dtype
        Av = jnp.concatenate([Avals.astype(dt), jnp.zeros(1, dt)])
        upds = []          # per local level: (S, B, NR, NR)
        loc_factors = []
        npert = jnp.zeros((), jnp.int32)

        for m in self.local_levels:
            fac, U, p = self._local_level_body(m, bufs, Av, upds, eps)
            npert = npert + p
            upds.append(U)
            loc_factors.append(fac)

        crossp = self._cross_body(bufs, upds)

        top_factors, ptop = self._top_body(bufs, Av, crossp, eps)
        return loc_factors, top_factors, npert + ptop

    def _top_body(self, bufs, Av, crossp, eps):
        """Replicated top-tree factorization (small dense levels)."""
        dt = self.dtype
        npert = jnp.zeros((), jnp.int32)
        tupds = []
        top_factors = []
        for m in self.top_levels:
            B, NC, NF = m.B, m.NC, m.NF
            F = jnp.zeros((B * NF * NF,), dt)
            F = F.at[bufs[m.a_dst]].add(
                jnp.take(Av, bufs[m.a_src], axis=0), mode="drop",
                unique_indices=True, indices_are_sorted=True)
            F = F.at[bufs[m.diag]].set(1.0, mode="drop",
                                       unique_indices=True,
                                       indices_are_sorted=True)
            if EA_MATMUL:
                F4 = F.reshape(B, NF, NF)
                for lc, srcb, dstb, psl in m.ea:
                    u = tupds[lc][bufs[srcb]]  # (C, NR, NR)
                    F4 = _ea_onehot_add(F4, bufs[dstb], bufs[psl], u, dt)
                for co, nrv, dstb, psl, NRX in m.ea_cross:
                    ii = jax.lax.broadcasted_iota(jnp.int32, (NRX, NRX), 0)
                    jj = jax.lax.broadcasted_iota(jnp.int32, (NRX, NRX), 1)
                    nre = bufs[nrv][:, None, None]
                    sidx = bufs[co][:, None, None] + ii * nre + jj
                    sidx = jnp.where((ii < nre) & (jj < nre), sidx,
                                     self.CROSS)
                    vals_c = crossp[sidx]  # (C, NRX, NRX); invalid -> 0
                    F4 = _ea_onehot_add(F4, bufs[dstb], bufs[psl], vals_c, dt)
                F = F4
            else:
                for lc, srcb, dstb, psl in m.ea:
                    u = tupds[lc][bufs[srcb]]  # (C, NR, NR)
                    dst = _ea_dst_flat(bufs[dstb], bufs[psl], NF,
                                       B * NF * NF)
                    F = F.at[dst.reshape(-1)].add(u.reshape(-1), mode="drop")
                for co, nrv, dstb, psl, NRX in m.ea_cross:
                    ii = jax.lax.broadcasted_iota(jnp.int32, (NRX, NRX), 0)
                    jj = jax.lax.broadcasted_iota(jnp.int32, (NRX, NRX), 1)
                    nre = bufs[nrv][:, None, None]
                    sidx = bufs[co][:, None, None] + ii * nre + jj
                    sidx = jnp.where((ii < nre) & (jj < nre), sidx,
                                     self.CROSS)
                    vals_c = crossp[sidx]  # (C, NRX, NRX); invalid -> 0
                    dst = _ea_dst_flat(bufs[dstb], bufs[psl], NF,
                                       B * NF * NF)
                    F = F.at[dst.reshape(-1)].add(vals_c.reshape(-1),
                                                  mode="drop")
                F = F.reshape(B, NF, NF)
            fac, U, p = self._front_kernel(F, NC, eps)
            npert = npert + p
            NR = NF - NC
            tupds.append(U.reshape(B, NR, NR))
            top_factors.append(fac)
        return top_factors, npert

    # ------------------------------------------------------------------
    # solve (one jit; RHS (n, k) replicated on device)
    #
    # Wave sweeps run on INVERTED diagonal blocks (prep_solve): every
    # per-level triangular solve becomes one batched MXU matmul with the
    # precomputed L11^-1 / U11^-1 instead of the InvertDiagBlocks custom
    # call — at k=1 (the vector-solve case) the custom call's fixed
    # per-level cost dominated the whole solve (the cuDSS/Ginkgo
    # block-inverse solve strategy). Inversion happens ONCE per
    # factorization in a separate jit; the flop count of (inv @ rhs)
    # equals substitution, so only overhead is removed.
    # ------------------------------------------------------------------
    def prep_solve(self, factors):
        """(loc, top, npert) -> solve-ready factors with diagonal blocks
        inverted; cached per factors identity."""
        hit = getattr(self, "_prep_cache", None)
        if hit is not None and hit[0] is factors:
            return hit[1]
        if not hasattr(self, "_prep_jit"):
            self._prep_jit = jax.jit(self._prep_impl)
        out = (self._prep_jit(factors[0], factors[1]), factors[2])
        self._prep_cache = (factors, out)
        return out

    def _inv_fac(self, fac):
        """Replace the triangular diagonal blocks of one level's factor
        tuple with their inverses (unit-ness folded in)."""
        dt = self.dtype
        L11 = fac[0]
        nc = L11.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(nc, dtype=dt), L11.shape)
        if self.kind == "chol":
            Li = _tri(L11, eye, left_side=True, lower=True)
            return (Li,) + tuple(fac[1:])
        if self.kind == "ldl":
            Li = _tri(L11, eye, left_side=True, lower=True,
                      unit_diagonal=True)
            return (Li,) + tuple(fac[1:])
        U11 = fac[1]
        Li = _tri(L11, eye, left_side=True, lower=True, unit_diagonal=True)
        Ui = _tri(U11, eye, left_side=True, lower=False)
        return (Li, Ui) + tuple(fac[2:])

    def _prep_impl(self, loc_factors, top_factors):
        loc = [self._inv_fac(f) for f in loc_factors]
        top = [self._inv_fac(f) for f in top_factors]
        return loc, top

    def _fwd(self, fac, seg, tr=False):
        """seg (B', NC, k) -> (z stored for backward, w for updates);
        fac carries INVERTED diagonal blocks (prep_solve). ``tr`` solves
        the transposed system (LU only: Aᵀ = Uᵀ Lᵀ, forward uses Uᵀ)."""
        prec = _mm_prec(seg.dtype)
        if self.kind == "chol":
            w = jnp.matmul(fac[0], seg, precision=prec)
            return w, w
        if self.kind == "ldl":
            d = fac[1]
            w = jnp.matmul(fac[0], seg, precision=prec)
            return w / d[:, :, None], w
        if tr:  # LU transpose: Uᵀ z = b -> z = (U^-1)ᵀ b
            w = jnp.matmul(jnp.swapaxes(fac[1], 1, 2), seg, precision=prec)
            return w, w
        w = jnp.matmul(fac[0], seg, precision=prec)
        return w, w

    def _bwd(self, fac, rhs, xr, tr=False):
        """rhs is the stored z segment; xr (B', NR, k) the ancestor solution
        rows. ``tr`` (LU only): backward with Lᵀ (unit)."""
        prec = _mm_prec(rhs.dtype)
        if self.kind == "chol":
            Li, L21 = fac
            t = rhs - jnp.matmul(jnp.swapaxes(L21, 1, 2), xr, precision=prec)
            return jnp.matmul(jnp.swapaxes(Li, 1, 2), t, precision=prec)
        if self.kind == "ldl":
            Li, _d, L21 = fac
            t = rhs - jnp.matmul(jnp.swapaxes(L21, 1, 2), xr, precision=prec)
            return jnp.matmul(jnp.swapaxes(Li, 1, 2), t, precision=prec)
        Li, Ui, L21, U12 = fac
        if tr:  # Lᵀ x = z -> x = (L^-1)ᵀ z
            t = rhs - jnp.matmul(jnp.swapaxes(L21, 1, 2), xr, precision=prec)
            return jnp.matmul(jnp.swapaxes(Li, 1, 2), t, precision=prec)
        t = rhs - jnp.matmul(U12, xr, precision=prec)
        return jnp.matmul(Ui, t, precision=prec)

    def _l21(self, fac, tr=False):
        if self.kind != "lu":
            return fac[-1]
        if tr:  # Uᵀ off-block: U12ᵀ (NR, NC)
            return jnp.swapaxes(fac[3], 1, 2)
        return fac[2]

    def _solve_impl(self, bufs, loc_factors, top_factors, bloc, tr=False):
        # bloc: (S, SVPAD, k) — the in_plan gather of the row-distributed
        # RHS into the per-shard compact spaces (local columns at [0, M_s),
        # the replicated top copy at [Mmax, Mmax+TOPM) on shard 0 only).
        # All work buffers are O(n/S + |top|) per device — the cuDSS
        # row-1d distributed-RHS contract (VERDICT r2 #4) — instead of the
        # O(n)-per-device (S, n+1, k) buffers of the round-2 design.
        dt = self.dtype
        S = self.S
        SENT = self.SVPAD          # sentinel slot, kept zero
        TOPM, Mmax = self.TOPM, self.Mmax
        k = bloc.shape[2]
        y = jnp.pad(bloc.astype(dt), ((0, 0), (0, 1), (0, 0)))
        contrib = jnp.zeros((S, SENT + 1, k), dt)
        zloc = jnp.zeros((S, SENT + 1, k), dt)

        def takeS(arr, idx):  # arr (S, L, k), idx (S, B, W) -> (S, B, W, k)
            return jax.vmap(lambda a, i: a[i])(arr, idx)

        def setS(arr, idx, val):
            return jax.vmap(lambda a, i, v: a.at[i].set(v))(arr, idx, val)

        def addS(arr, idx, val):
            return jax.vmap(lambda a, i, v: a.at[i].add(v))(arr, idx, val)

        # forward, local phase (compact per-shard spaces)
        for m, fac in zip(self.local_levels, loc_factors):
            B, NC, NF = m.B, m.NC, m.NF
            NR = NF - NC
            ccol, crow = bufs[m.ccol], bufs[m.crow]
            seg = takeS(y, ccol) + takeS(contrib, ccol)
            seg = seg.reshape(S * B, NC, k)
            facf = tuple(x.reshape((S * B,) + x.shape[2:]) for x in fac)
            z, w = self._fwd(facf, seg, tr)
            zloc = setS(zloc, ccol.reshape(S, B * NC),
                        z.reshape(S, B * NC, k))
            upd = jnp.matmul(self._l21(facf, tr), w,
                             precision=_mm_prec(w.dtype))
            contrib = addS(contrib, crow.reshape(S, B * NR),
                           -upd.reshape(S, B * NR, k))
            contrib = contrib.at[:, SENT].set(0.0)
            zloc = zloc.at[:, SENT].set(0.0)

        # forward, top phase: ONE cross-shard reduction of the compact top
        # region (b_top rides shard 0's slice; others carry only updates)
        if TOPM:
            ytop = jnp.sum(
                jax.lax.slice(y + contrib, (0, Mmax, 0),
                              (S, Mmax + TOPM, k)), axis=0)
            ytop = jnp.concatenate([ytop, jnp.zeros((1, k), dt)])
        else:
            ytop = jnp.zeros((1, k), dt)
        for m, fac in zip(self.top_levels, top_factors):
            B, NC, NF = m.B, m.NC, m.NF
            NR = NF - NC
            ccol, crow = bufs[m.ccol], bufs[m.crow]
            seg = jnp.take(ytop, ccol, axis=0)  # (B, NC, k)
            z, w = self._fwd(fac, seg, tr)
            ytop = ytop.at[ccol.reshape(-1)].set(z.reshape(B * NC, k))
            upd = jnp.matmul(self._l21(fac, tr), w,
                             precision=_mm_prec(w.dtype))
            ytop = ytop.at[crow.reshape(-1)].add(-upd.reshape(B * NR, k))
            ytop = ytop.at[TOPM].set(0.0)

        # backward, top phase (replicated compute on the compact top space)
        for m, fac in zip(reversed(self.top_levels), reversed(top_factors)):
            B, NC, NF = m.B, m.NC, m.NF
            ccol, crow = bufs[m.ccol], bufs[m.crow]
            rhs = jnp.take(ytop, ccol, axis=0)
            xr = jnp.take(ytop, crow, axis=0)
            x = self._bwd(fac, rhs, xr, tr)
            ytop = ytop.at[ccol.reshape(-1)].set(x.reshape(B * NC, k))
            ytop = ytop.at[TOPM].set(0.0)
        xtop = jnp.zeros((TOPM + 1, k), dt)
        if self.n_topcols:
            tc = bufs[self.topcols]
            xtop = xtop.at[tc].set(ytop[tc])

        # backward, local phase: every shard carries the top solution copy
        # in its [Mmax, Mmax+TOPM) region
        xloc = jnp.zeros((S, SENT + 1, k), dt)
        if TOPM:
            xloc = jax.lax.dynamic_update_slice(
                xloc, jnp.broadcast_to(xtop[:TOPM], (S, TOPM, k)),
                (0, Mmax, 0))
        for m, fac in zip(reversed(self.local_levels), reversed(loc_factors)):
            B, NC, NF = m.B, m.NC, m.NF
            ccol, crow = bufs[m.ccol], bufs[m.crow]
            rhs = takeS(zloc, ccol).reshape(S * B, NC, k)
            xr = takeS(xloc, crow).reshape(S * B, NF - NC, k)
            facf = tuple(x.reshape((S * B,) + x.shape[2:]) for x in fac)
            x = self._bwd(facf, rhs, xr, tr)
            xloc = setS(xloc, ccol.reshape(S, B * NC),
                        x.reshape(S, B * NC, k))
            xloc = xloc.at[:, SENT].set(0.0)

        return xloc  # (S, SENT+1, k); out_plan scatters to natural order

    # ------------------------------------------------------------------
    def factor(self, Avals, eps):
        # new factors invalidate the prepped (inverted-block) solve cache;
        # clearing eagerly also releases the old factor buffers (GBs at 3D
        # scale) before the new ones allocate
        self._prep_cache = None
        Av = jnp.asarray(Avals)
        ep = jnp.asarray(eps, self.dtype)
        if self._staged:
            return self._run_oom_guarded(self._factor_staged, Av, ep)
        return self._run_oom_guarded(
            lambda a, e: self._factor_jit(self._bufs, a, e), Av, ep)

    def solve_dist(self, factors, bstacked, transpose: bool = False):
        """Row-distributed solve: bstacked (S, Lrow[, k]) on
        ``self.row_partition`` -> solution stacked the same way. The RHS
        never replicates: in_plan gathers it into the per-shard compact
        spaces, the wave solve runs on O(n/S + |top|) buffers, out_plan
        scatters the solution back to natural row order (the cuDSS
        row-1d distributed-RHS contract, CUDAExt:672-689, 835-885)."""
        (loc, top), _ = self.prep_solve(factors)
        b = jnp.asarray(bstacked)
        squeeze = b.ndim == 2
        if squeeze:
            b = b[:, :, None]
        # bucket the RHS width: the level-unrolled solve executable costs
        # minutes through the remote compiler PER distinct k, so pad k up
        # to {1, 8, 16, 32, ...} and slice the result — one compile serves
        # every width in the bucket
        k = b.shape[2]
        kb = 1 if k == 1 else max(8, 1 << (k - 1).bit_length())
        if kb != k:
            b = jnp.pad(b, ((0, 0), (0, 0), (0, kb - k)))
        bloc = self.in_plan.apply(b.astype(self.dtype))
        # chol/ldl are symmetric: transpose == plain solve
        tr = bool(transpose) and self.kind == "lu"
        xloc = self._run_oom_guarded(
            lambda *a: self._solve_jit(self._bufs, *a), loc, top, bloc, tr)
        x = self.out_plan.apply(xloc)
        if kb != k:
            x = x[:, :, :k]
        return x[:, :, 0] if squeeze else x

    def solve(self, factors, b, transpose: bool = False):
        """Replicated-RHS convenience wrapper: (n[, k]) in, (n[, k]) out
        (scatter -> distributed solve -> gather)."""
        from ..parallel.mesh import allgather_full, scatter_from_full

        b = jnp.asarray(b)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        bs = scatter_from_full(b, self.row_partition, self.backend)
        xs = self.solve_dist(factors, bs, transpose=transpose)
        x = allgather_full(xs, self.row_partition, self.backend)
        return x[:, 0] if squeeze else x


class DeviceFactorization:
    """Factorization-interface adapter over the distributed DeviceMF engine
    (ref: MUMPSFactorization / CuDSSFactorizationMPI). The RHS and solution
    stay on device end-to-end: all_gather in, wave solves, scatter out —
    the cuDSS MGMN contract (CUDAExt:835-885)."""

    def __init__(self, A, kind: str = "ldl", dtype=None):
        from ..cache import cached_plan

        self.A = A
        self.backend = A.backend
        self.structural_hash = A.hash
        iscomplex = np.issubdtype(np.dtype(A.dtype), np.complexfloating)
        if iscomplex and kind == "chol":
            raise ValueError("device Cholesky is real-SPD only; use "
                             "kind='ldl' for complex-symmetric systems")
        if dtype is None:
            platform = A.backend.mesh.devices.flat[0].platform
            if platform == "cpu" and jax.config.jax_enable_x64:
                dtype = np.complex128 if iscomplex else np.float64
            else:
                # NOTE: complex dtypes are UNIMPLEMENTED on the current TPU
                # generation; complex device solves run on the CPU mesh
                dtype = np.complex64 if iscomplex else np.float32
        self.dtype = np.dtype(dtype)
        self.kind = kind

        def build():
            # pattern-only host CSR: the symbolic/plan phase never reads
            # values, and pulling nzval through the relay costs 32 s at
            # n=262k (measured — over half the cache-hit build time)
            return DeviceMF(A.pattern_csr(), A.backend, kind=kind,
                            dtype=self.dtype,
                            row_partition=A.row_partition)

        self.engine = cached_plan(
            "device_mf", (A.hash, kind, str(self.dtype), A.backend.key), build)
        self._numeric(A)

    def _numeric(self, A):
        from ..parallel.mesh import allgather_full

        st = A.structure
        nnzb = np.concatenate([[0], np.cumsum(st.nnz_local)]).astype(np.int64)
        Avals = allgather_full(A.nzval, nnzb, self.backend)  # (nnzA,) device
        anorm = float(jnp.max(jnp.abs(A.nzval)))
        eps = _PERT_REL * (anorm if anorm > 0 else 1.0)  # relative, no floor
        # drop the previous factors BEFORE launching: at 3D-64^3 scale the
        # factor buffers are GBs, and old+new+temps together exceed HBM
        self.factors = None
        self.factors = self.engine.factor(Avals, eps)
        self.n_perturbed = int(self.factors[2])
        # growth monitor (VERDICT r4 #6, device side): the device engine
        # has no numerical pivoting, so a legal-but-tiny pivot shows up as
        # large |L| growth; flag it and escalate the solve to the
        # full-budget compensated refinement (the eps clamp alone only
        # catches |pivot| < eps)
        loc, top, _ = self.factors
        self.growth = float(_max_abs((loc, top)))
        self._unstable = (self.n_perturbed > 0
                          or self.growth > _GROWTH_MAX_DEV)
        if self.kind == "chol":
            if not bool(_all_finite((loc, top))):
                raise ValueError("device Cholesky requires an SPD matrix "
                                 "(use kind='ldl' for indefinite systems)")

    def refactorize(self, A) -> "DeviceFactorization":
        if A.hash != self.structural_hash:
            raise ValueError("refactorize requires the same sparsity pattern")
        self.A = A
        self._numeric(A)
        return self

    def _default_refine(self) -> int:
        """Sweep CAP, not a fixed count — the loop exits as soon as the
        residual hits dtype noise, so the cap only binds on ill-conditioned
        systems (e.g. the 2D 10^6 Laplacian, cond ~ 4e5, needs 3-4 f32
        sweeps; a 3D Poisson exits after 1-2)."""
        n = 1 if self.n_perturbed == 0 else 2
        if (np.dtype(self.engine.dtype).itemsize <= 4
                and _mm_prec(self.engine.dtype)
                is not jax.lax.Precision.HIGHEST):
            n += 4  # bf16x3 matmul roundoff + f32 headroom
        return n

    @staticmethod
    def _part_of(o):
        """Row partition of a DistVector (.partition) or matrix."""
        p = getattr(o, "partition", None)
        return p if p is not None else o.row_partition

    def _refined_solve(self, Bd, transpose, refine, to_dist, extended=None):
        """Shared solve + capped early-stopping iterative refinement with
        DEVICE residuals through the distributed SpMV/SpMM — compensates
        static-pivot perturbations and bf16x3 front roundoff. Stops when
        the relative residual reaches dtype noise or stagnates (each sweep
        costs a full triangular-solve pass, ~1/3 of total solve time at
        3D-64^3 scale). Every gather uses the operand's OWN partition —
        the RHS may live on a different partition than A (the binary ops
        align automatically). ``extended`` (default: auto for f32 vector
        solves on DIA/ELL-tier patterns) switches to the compensated
        double-f32 refinement (_extended_refine)."""
        # explicit extended=True buys the full sweep budget (reference-f64
        # tolerance class); the auto default keeps the fast cap so routine
        # f32 solves stay ~refine-cost while still gaining the compensated
        # residual's accuracy
        if getattr(self, "_unstable", False) and extended is not False:
            # growth-flagged factorization: spend the full compensated
            # budget — refinement is what recovers the lost accuracy
            extended = True
        explicit_ext = extended is True
        if extended is None:
            extended = self.engine.dtype == jnp.float32
        # the RHS stays row-distributed end-to-end (VERDICT r2 #4): align
        # it to the engine's partition once, then every solve/residual is
        # a distributed stacked-shard operation
        part = self.engine.row_partition
        if not np.array_equal(self._part_of(Bd), part):
            Bd = Bd.repartition(part)
        Xs = self.engine.solve_dist(self.factors, Bd.data,
                                    transpose=transpose)
        Xd = to_dist(Xs)
        if not refine:
            if (MM_PRECISION == "high"
                    and self.engine.dtype == jnp.float32):
                import warnings
                warnings.warn(
                    "refine=0 with bf16x3 ('high') frontal matmuls returns "
                    "~2^-21 relative accuracy; pass refine>=1 or call "
                    "set_mm_precision('highest') before factorizing",
                    stacklevel=4)
            return Xd
        if extended:
            ext = self._extended_refine(Bd, Xd, transpose, refine,
                                        full_budget=explicit_ext)
            if ext is not None:
                return ext
        Aop = self.A.T if transpose else self.A
        rtol = 50 * float(jnp.finfo(self.engine.dtype).eps)
        bn = float(Bd.norm())
        prev = np.inf
        for _ in range(refine):
            R = Bd - Aop @ Xd
            rn = float(R.norm())
            if bn > 0 and (rn <= rtol * bn or rn >= 0.8 * prev):
                break
            prev = rn
            if not np.array_equal(self._part_of(R), part):
                R = R.repartition(part)
            Xs = Xs + self.engine.solve_dist(self.factors, R.data,
                                             transpose=transpose)
            Xd = to_dist(Xs)
        return Xd

    # extended refinement: stop once the compensated relative residual hits
    # ~double-f32 noise (well past the 1e-9 target; the pair (xh, xl)
    # carries ~48 bits so the floor is set by the factor's contraction
    # rate). The sweep cap is its own budget, NOT the plain-refine cap:
    # with bf16x3 fronts the contraction on the 2D 10^6 Laplacian is
    # ~0.4/sweep (measured, cond ~4e5), so reaching 5e-10 from ~1e-3
    # takes ~16 sweeps; the loop exits early on well-conditioned systems.
    _EXT_RTOL = 5e-10
    _EXT_MAX_SWEEPS = 24

    def _extended_refine(self, Bd, Xd, transpose, refine,
                         full_budget: bool = False):
        """Double-f32 iterative refinement (VERDICT r2 #3): the solution is
        carried as an unevaluated (xh, xl) pair and the residual SpMV runs
        in compensated arithmetic (ops/compensated.py), so on-chip f32
        factorizations converge to ~1e-9..1e-10 relative residuals — the
        on-chip stand-in for the reference's f64 tolerance discipline
        (test_utils.jl:154-157). Returns None when unsupported (non-f32
        engine, matrix RHS, or an engine tier without a compensated path);
        the caller then runs the plain-f32 loop."""
        from ..ops.compensated import add_double_f32, residual_compensated
        from ..ops.spmv import get_spmv_plan
        from ..vector import DistVector

        if self.engine.dtype != jnp.float32 or not isinstance(Bd, DistVector):
            return None
        Am = self.A.transpose_materialized() if transpose else self.A
        if np.dtype(Am.dtype) != np.dtype(np.float32):
            return None
        part = self.A.row_partition
        if not np.array_equal(self._part_of(Bd), part):
            Bd = Bd.repartition(part)
        if not np.array_equal(self._part_of(Xd), part):
            Xd = Xd.repartition(part)
        plan = get_spmv_plan(Am, Xd)
        if plan.offsets is None and not plan.ell:
            return None  # densify/fallback tiers: plain refinement
        xh = Xd.data.astype(jnp.float32)
        xl = jnp.zeros_like(xh)
        bn = float(Bd.norm())
        b32 = Bd.data.astype(jnp.float32)
        prev = np.inf
        cap = max(refine, self._EXT_MAX_SWEEPS) if full_budget \
            else refine + 3
        for _ in range(cap):
            r = residual_compensated(Am, plan, xh, xl, b32)
            rn = float(jnp.linalg.norm(r))
            if bn > 0 and (rn <= self._EXT_RTOL * bn or rn >= 0.9 * prev):
                break
            prev = rn
            dxs = self.engine.solve_dist(
                self.factors, r, transpose=transpose).astype(jnp.float32)
            xh, xl = add_double_f32(xh, xl, dxs)
        # The pair (xh, xl) carries ~48 bits; collapsing to one f32 would
        # re-lose everything below ~1e-7 (measured: internal residual
        # 3e-10, collapsed residual 1.6e-6). Keep f64 when the platform
        # stores it (CPU mesh under x64); on-chip, return the f32 high part
        # with the low part attached for host-side f64 retrieval
        # (solve() combines them for numpy-RHS callers).
        if jax.config.jax_enable_x64 and \
                self.backend.mesh.devices.flat[0].platform == "cpu":
            x64 = xh.astype(jnp.float64) + xl.astype(jnp.float64)
            dt = np.result_type(Bd.dtype, np.float64)
            return DistVector(x64.astype(dt), part, self.backend)
        out = DistVector((xh + xl).astype(Bd.dtype), part, self.backend)
        out._ext_pair = (xh, xl)
        return out

    def solve(self, b, transpose: bool = False, refine: int | None = None,
              extended: bool | None = None):
        from ..parallel.mesh import scatter_from_full
        from ..vector import DistVector

        if self.factors is None:
            raise RuntimeError("factorization was finalized")
        if refine is None:
            refine = self._default_refine()
        is_dist = isinstance(b, DistVector)
        part = self.A.row_partition
        if not is_dist:
            # replicated-array RHS refines through the same distributed path
            b = DistVector(
                scatter_from_full(jnp.asarray(np.asarray(b)), part,
                                  self.backend), part, self.backend)

        def to_dist(xs):
            # xs arrives stacked/row-distributed from solve_dist
            return DistVector(xs.astype(b.dtype), part, self.backend)

        xd = self._refined_solve(b, transpose, refine, to_dist,
                                 extended=extended)
        if is_dist:
            return xd
        pair = getattr(xd, "_ext_pair", None)
        if pair is not None:
            # numpy-RHS caller on-chip: combine the double-f32 pair on host
            # in f64 so the returned solution keeps the extended accuracy
            from ..parallel.mesh import gather_to_host

            xh, xl = pair
            return (gather_to_host(xh, self.A.row_partition).astype(np.float64)
                    + gather_to_host(xl, self.A.row_partition))
        return xd.to_numpy()

    def solve_matrix(self, B, transpose: bool = False,
                     refine: int | None = None,
                     extended: bool | None = None):
        """Multi-RHS device solve — one batched wave sweep for all columns
        (ref: MUMPS multi-RHS, mumps_factorization.jl:291-353), with the
        same capped early-stopping refinement as the vector path (the
        residual is one distributed SpMM per sweep)."""
        from ..dense import DistDenseMatrix
        from ..parallel.mesh import scatter_from_full

        if self.factors is None:
            raise RuntimeError("factorization was finalized")
        if refine is None:
            refine = self._default_refine()
        is_dist = isinstance(B, DistDenseMatrix)
        part = self.A.row_partition
        if not is_dist:
            Bg = jnp.asarray(np.asarray(B))
            B = DistDenseMatrix(
                scatter_from_full(Bg, part, self.backend), part,
                Bg.shape[1], self.backend)
        k = B.ncols

        def to_dist(Xs):
            # Xs arrives stacked/row-distributed from solve_dist
            return DistDenseMatrix(Xs.astype(B.dtype), part, k, self.backend)

        Xd = self._refined_solve(B, transpose, refine, to_dist,
                                 extended=extended)
        return Xd if is_dist else Xd.to_numpy()

    def finalize(self):
        self.factors = None

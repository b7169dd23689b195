"""Device-resident multifrontal Cholesky (SPD) — the accelerator-side
solver path (SURVEY.md §7.2 step 9b; design in docs/device_solver_design.md).

The supernode tree is cut into levels; each level's fronts are identity-
padded to a common (NC, NF) split and factored as one batch of MXU-native
ops (cholesky / triangular_solve / matmul); extend-add between levels is a
static scatter-add; the triangular solves run the same wave schedule. The
entire factorization and each solve are single compiled executables.

On a single chip this is scatter/dispatch-bound and the host C++ engine is
faster (16.4 ms vs 5.2 ms at n=1e4); it exists for multi-chip scaling and
as the SPD accelerator path. Opt in via ``hl.ldlt(A, method="device")``.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from . import ordering, symbolic


class DeviceCholesky:
    def __init__(self, A_csr, dtype=np.float32):
        n = A_csr.shape[0]
        self.n = n
        self.dtype = dtype
        perm = ordering.amd_order(A_csr.indptr.astype(np.int64),
                                  A_csr.indices.astype(np.int64), n)
        sym = symbolic.analyze(A_csr, perm)
        self.sym = sym
        ns = sym.nsuper

        # ---- level schedule (children before parents) -----------------------
        level = np.zeros(ns, dtype=np.int64)
        for k in range(ns):
            p = sym.snode_parent[k]
            if p >= 0:
                level[p] = max(level[p], level[k] + 1)
        nlev = int(level.max()) + 1 if ns else 0
        self.levels = [np.flatnonzero(level == l) for l in range(nlev)]

        Ap = sp.csc_matrix(A_csr[sym.perm][:, sym.perm])
        Ap.sort_indices()
        self.Ap = Ap

        # ---- per-level static metadata --------------------------------------
        # fronts: (B, NF, NF); leading nc_k columns factored. Padding of the
        # diagonal with 1.0 keeps cholesky valid for ragged nc/nf.
        self.meta = []
        col_of = {}  # supernode -> (level, batch slot)
        for l, ks in enumerate(self.levels):
            ncs = sym.snode_ptr[ks + 1] - sym.snode_ptr[ks]
            nrs = np.array([len(sym.snode_rows[k]) for k in ks])
            NC = int(ncs.max())
            NF = NC + int(nrs.max())  # common split: cols [0,NC), rows [NC,NF)
            B = len(ks)
            for b, k in enumerate(ks):
                col_of[k] = (l, b)
            # A assembly scatter: entries of Ap columns in this level's fronts
            src, dst = [], []
            diag_pad = []
            for b, k in enumerate(ks):
                j0, j1 = int(sym.snode_ptr[k]), int(sym.snode_ptr[k + 1])
                rows = sym.snode_rows[k]
                pos = {int(j): i for i, j in enumerate(range(j0, j1))}
                pos.update({int(r): NC + i for i, r in enumerate(rows)})
                for j in range(j0, j1):
                    c = j - j0
                    for t in range(Ap.indptr[j], Ap.indptr[j + 1]):
                        p = pos.get(int(Ap.indices[t]))
                        if p is not None:
                            src.append(t)
                            dst.append((b * NF + p) * NF + c)
                # identity on the unused diagonal slots: factored-block cols
                # beyond nc_k and row slots beyond nr_k
                for i in range(j1 - j0, NC):
                    diag_pad.append((b * NF + i) * NF + i)
                for i in range(NC + len(rows), NF):
                    diag_pad.append((b * NF + i) * NF + i)
            self.meta.append(dict(
                ks=ks, B=B, NF=NF, NC=NC,
                ncs=jnp.asarray(ncs), a_src=jnp.asarray(np.asarray(src, np.int32)),
                a_dst=jnp.asarray(np.asarray(dst, np.int32)),
                diag_pad=jnp.asarray(np.asarray(diag_pad, np.int32)),
                ea=[],  # extend-add ops, filled below
            ))
        # extend-add maps: child update (level lc, slot) -> parent front slots
        for l, ks in enumerate(self.levels):
            per_src = {}
            for b, k in enumerate(ks):
                j0, j1 = int(sym.snode_ptr[k]), int(sym.snode_ptr[k + 1])
                rows = sym.snode_rows[k]
                NF = self.meta[l]["NF"]
                NC = self.meta[l]["NC"]
                pos = {int(j): i for i, j in enumerate(range(j0, j1))}
                pos.update({int(r): NC + i for i, r in enumerate(rows)})
                for c in np.flatnonzero(sym.snode_parent == k):
                    lc, bc = col_of[c]
                    crows = sym.snode_rows[c]
                    cnr = len(crows)
                    NRc = self.meta[lc]["NF"] - self.meta[lc]["NC"]
                    s_, d_ = per_src.setdefault(lc, ([], []))
                    for cj in range(cnr):
                        pj = pos[int(crows[cj])]
                        for ci in range(cnr):
                            s_.append((bc * NRc + ci) * NRc + cj)
                            d_.append((b * NF + pos[int(crows[ci])]) * NF + pos[int(crows[cj])])
            for lc, (s_, d_) in per_src.items():
                self.meta[l]["ea"].append(
                    (lc, jnp.asarray(np.asarray(s_, np.int32)),
                     jnp.asarray(np.asarray(d_, np.int32))))

        self._factor = jax.jit(self._factor_impl)
        self._solve = jax.jit(self._solve_impl)

    # ------------------------------------------------------------------
    def _factor_impl(self, Ax):
        L11s, L21s, upds = [], [], []
        for l, m in enumerate(self.meta):
            B, NF, NC = m["B"], m["NF"], m["NC"]
            F = jnp.zeros((B * NF * NF,), self.dtype)
            F = F.at[m["a_dst"]].set(Ax[m["a_src"]].astype(self.dtype))
            F = F.at[m["diag_pad"]].set(1.0)
            for lc, s_, d_ in m["ea"]:
                F = F.at[d_].add(upds[lc].reshape(-1)[s_])
            F = F.reshape(B, NF, NF)
            F11 = F[:, :NC, :NC]
            F21 = F[:, NC:, :NC]
            F22 = F[:, NC:, NC:]
            L11 = jnp.linalg.cholesky(F11)
            # L21 = F21 L11^{-T}
            L21 = jax.lax.linalg.triangular_solve(
                L11, F21, left_side=False, lower=True, transpose_a=True)
            U = F22 - jnp.matmul(L21, jnp.swapaxes(L21, 1, 2),
                                 precision=jax.lax.Precision.HIGHEST)
            L11s.append(L11)
            L21s.append(L21)
            upds.append(U)
        return L11s, L21s

    # ------------------------------------------------------------------
    def _gather_maps(self):
        """x-segment gather/scatter maps per level (cols and rows slots)."""
        maps = []
        for l, m in enumerate(self.meta):
            B, NF, NC = m["B"], m["NF"], m["NC"]
            ks = m["ks"]
            ccol = np.full((B, NC), self.n, np.int32)   # -> dump slot
            crow = np.full((B, NF - NC), self.n, np.int32)
            for b, k in enumerate(ks):
                j0, j1 = int(self.sym.snode_ptr[k]), int(self.sym.snode_ptr[k + 1])
                ccol[b, : j1 - j0] = np.arange(j0, j1)
                rows = self.sym.snode_rows[k]
                crow[b, : len(rows)] = rows
            maps.append((jnp.asarray(ccol), jnp.asarray(crow)))
        return maps

    def _solve_impl(self, L11s, L21s, b):
        maps = self._gather_maps()
        y = jnp.concatenate([b[self.sym.perm].astype(self.dtype),
                             jnp.zeros(1, self.dtype)])  # dump slot
        # forward: L z = y (levels ascending)
        for l, m in enumerate(self.meta):
            ccol, crow = maps[l]
            seg = y[ccol]  # (B, NC)
            z = jax.lax.linalg.triangular_solve(
                L11s[l], seg[:, :, None], left_side=True, lower=True)[:, :, 0]
            y = y.at[ccol].set(z)
            upd = jnp.matmul(L21s[l], z[:, :, None],
                             precision=jax.lax.Precision.HIGHEST)[:, :, 0]
            y = y.at[crow].add(-upd)
            y = y.at[self.n].set(0.0)
        # backward: L^T x = z (levels descending)
        for l in range(len(self.meta) - 1, -1, -1):
            ccol, crow = maps[l]
            rhs = y[ccol] - jnp.matmul(
                jnp.swapaxes(L21s[l], 1, 2), y[crow][:, :, None],
                precision=jax.lax.Precision.HIGHEST)[:, :, 0]
            x = jax.lax.linalg.triangular_solve(
                L11s[l], rhs[:, :, None], left_side=True, lower=True,
                transpose_a=True)[:, :, 0]
            y = y.at[ccol].set(x)
            y = y.at[self.n].set(0.0)
        out = jnp.empty_like(y[:-1])
        return out.at[jnp.asarray(self.sym.perm)].set(y[:-1])

    # ------------------------------------------------------------------
    def factor(self, values_permuted_csc):
        return self._factor(jnp.asarray(values_permuted_csc))

    def solve(self, factors, b):
        L11s, L21s = factors
        return self._solve(L11s, L21s, jnp.asarray(b))




class DeviceFactorization:
    """Factorization-interface adapter over DeviceCholesky (SPD only)."""

    def __init__(self, A, dtype=None):
        from ..cache import cached_plan

        self.A = A
        self.backend = A.backend
        self.structural_hash = A.hash
        if dtype is None:
            platform = A.backend.mesh.devices.flat[0].platform
            dtype = np.float64 if (platform == "cpu" and
                                   jax.config.jax_enable_x64) else np.float32
        self.dtype = np.dtype(dtype)
        self.kind = "device_cholesky"
        self.n_perturbed = 0

        def build():
            return DeviceCholesky(A.to_scipy(), dtype=self.dtype)

        self.engine = cached_plan("device_cholesky", (A.hash, str(self.dtype)),
                                  build)
        self._numeric(A)

    def _numeric(self, A):
        from .api import _csr_values

        vals = _csr_values(A)
        csr = sp.csr_matrix(
            (vals, A.to_scipy().indices, A.to_scipy().indptr), shape=A.shape)
        Ap = sp.csc_matrix(csr[self.engine.sym.perm][:, self.engine.sym.perm])
        Ap.sort_indices()
        self.factors = self.engine.factor(np.ascontiguousarray(Ap.data))
        # SPD check: cholesky NaNs on non-SPD input. Check EVERY level's
        # batches — with multiple elimination-forest roots (block-diagonal
        # systems) a non-SPD component can finish below the last level and
        # never propagate NaN upward. One fused readback for all levels.
        L11s, L21s = self.factors
        finite = jnp.stack([jnp.isfinite(x).all()
                            for x in (*L11s, *L21s)]).all()
        if not bool(finite):
            raise ValueError("device Cholesky requires an SPD matrix "
                             "(use the host ldlt for indefinite systems)")

    def refactorize(self, A) -> "DeviceFactorization":
        if A.hash != self.structural_hash:
            raise ValueError("refactorize requires the same sparsity pattern")
        self.A = A
        self._numeric(A)
        return self

    def solve(self, b, transpose: bool = False, refine: int | None = None):
        from ..parallel.mesh import allgather_full, scatter_from_full
        from ..vector import DistVector

        if self.factors is None:
            raise RuntimeError("factorization was finalized")
        is_dist = isinstance(b, DistVector)
        if is_dist:
            # device-resident end-to-end: all_gather the RHS on device, run
            # the compiled solve, scatter the solution back to the row
            # partition — no host round-trip (ref: cuDSS keeps the RHS on
            # GPUs, CUDAExt:835-885)
            bg = allgather_full(b.data, b.partition, self.backend)
            x = self.engine.solve(self.factors, bg)
            return DistVector(
                scatter_from_full(x, self.A.row_partition, self.backend),
                self.A.row_partition, self.backend)
        x = np.asarray(self.engine.solve(self.factors, np.asarray(b)))
        return x

    def finalize(self):
        self.factors = None

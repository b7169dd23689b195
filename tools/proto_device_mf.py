"""Prototype: device-resident multifrontal Cholesky (SPD), level-scheduled.

The design stage after the host engine (docs/device_solver_design.md): the
supernode tree is cut into levels; each level's fronts are padded to a
common size and factored as ONE batch of MXU-native ops
(cholesky / triangular_solve / matmul), with extend-add between levels as
static scatter-adds. The triangular solve runs the same schedule.

This is a tools/ prototype: SPD-only, one bucket per level, correctness
validated against scipy, timed on the real chip. The production wiring
(shard_map distribution, LDLT Pallas kernel for indefinite, bucketing)
is round-2 work.

Usage: python tools/proto_device_mf.py [--cpu] [--grid K]
"""

import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _maybe_cpu():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=4"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


_maybe_cpu()

import jax
import jax.numpy as jnp

from hpclinalg.solver import ordering, symbolic


def laplace2d(k):
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(k, k))
    I = sp.eye(k)
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=100)
    args = ap.parse_args()
    A = laplace2d(args.grid)
    n = A.shape[0]
    dc = DeviceCholesky(A, dtype=np.float32)
    print(f"n={n}, nsuper={dc.sym.nsuper}, levels={len(dc.levels)}, "
          f"level sizes (last 5): {[len(l) for l in dc.levels[-5:]]}", flush=True)
    vals = np.ascontiguousarray(dc.Ap.data)
    t0 = time.perf_counter()
    factors = dc.factor(vals)
    jax.block_until_ready(factors)
    print(f"first factor (incl compile): {time.perf_counter()-t0:.1f} s", flush=True)
    b = np.random.default_rng(0).standard_normal(n)
    x = np.asarray(dc.solve(factors, b))
    resid = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    print(f"device solve resid (f32): {resid:.2e}", flush=True)
    best = np.inf
    for _t in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            factors = dc.factor(vals)
        s = float(jnp.sum(factors[0][-1]))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"device factor steady state: {best*1e3:.1f} ms "
          f"(host C++ engine: ~5.2 ms f64 on this workload)")


if __name__ == "__main__":
    main()

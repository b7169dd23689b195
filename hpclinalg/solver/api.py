"""Solver API: lu / ldlt / solve with the reference's backslash cache.

Reference semantics (/root/reference/src/mumps_factorization.jl,
HPCLinearAlgebra.jl:626-744):
  * ``lu(A)`` / ``ldlt(A)`` return a Factorization; ``F.solve(b)`` solves.
  * ``solve(A, b)`` (the ``A \\ b`` analogue) consults a global cache keyed
    by (structural hash, kind, dtype): a hit re-uses the symbolic analysis
    and only refreshes values + refactorizes — the O(nnz) ``nzval_perm``
    value-refresh trick (mumps_factorization.jl:105-140, 386-391) is
    implemented as a cached CSR->permuted-CSC data permutation.
  * transpose/adjoint solves and ``finalize!`` are supported.

Numeric phases run in the native C++ engine (native/mf.cpp, BLAS fronts)
for float64/complex128, with the numpy multifrontal as fallback. Static
pivoting is compensated by iterative refinement using the DEVICE
distributed SpMV for residuals — the standard companion of static pivoting
(SuperLU_DIST-style)."""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan, plan_cache
from .multifrontal import NumericFactor, factorize, solve_factored, _PERT_REL
from .native import NativeFactor, load_mf
from .symbolic import SymbolicFactor, analyze_best, analyze_fastest


def _get_symbolic(A) -> SymbolicFactor:
    """Symbolic analysis cached per sparsity pattern — shared by lu/ldlt and
    every refactorization (the expensive, comm-free phase)."""

    def build():
        A_csr = A.pattern_csr()  # symbolic phase never reads values
        return analyze_fastest(A_csr)

    return cached_plan("symbolic", (A.hash,), build)


def _get_perm_csc(A, sym):
    """Cached permuted-CSC pattern + the CSR-data -> permuted-CSC-data map
    (the reference's nzval_perm, mumps_factorization.jl:105-140)."""

    def build():
        import scipy.sparse as sp

        A_csr = A.pattern_csr()  # structure only; values refreshed per factorize
        n = A.m
        coo = A_csr.tocoo()
        r2 = sym.iperm[coo.row]
        c2 = sym.iperm[coo.col]
        order = np.lexsort((r2, c2))  # CSC: by column, then row
        indices = r2[order].astype(np.int64)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, c2[order] + 1, 1)
        indptr = np.cumsum(indptr).astype(np.int64)
        return indptr, indices, order.astype(np.int64)

    return cached_plan("solver_perm", (A.hash,), build)


class _CSCView:
    __slots__ = ("indptr", "indices", "data")

    def __init__(self, indptr, indices, data):
        self.indptr, self.indices, self.data = indptr, indices, data


def _colperm_matching(A_host) -> np.ndarray | None:
    """MC64-role maximum-product transversal (MUMPS ICNTL(6) role,
    mumps_factorization.jl:176-185 pipeline): a column permutation cperm
    with A[i, cperm[i]] large, via min-weight full bipartite matching on
    -log(|a| / rowmax). Returns None when structurally singular or the
    identity already matches."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    M = sp.csr_matrix(abs(A_host))
    n = M.shape[0]
    if M.nnz == 0:
        return None
    rowmax = np.maximum(np.asarray(abs(M).max(axis=1).todense()).ravel(),
                        1e-300)
    W = M.tocoo()
    w = 1e-3 - np.log(np.maximum(W.data, 1e-300) / rowmax[W.row])
    Wm = sp.csr_matrix((w, (W.row, W.col)), shape=M.shape)
    try:
        rows_i, cols_i = min_weight_full_bipartite_matching(Wm)
    except Exception:
        return None
    if len(rows_i) < n:
        return None
    cperm = np.empty(n, np.int64)
    cperm[rows_i] = cols_i
    if np.array_equal(cperm, np.arange(n)):
        return None
    return cperm


def _get_symbolic_cp(A, cperm) -> SymbolicFactor:
    """Symbolic analysis of the column-permuted pattern A[:, cperm]."""
    import hashlib

    h = hashlib.blake2b(cperm.tobytes(), digest_size=12).hexdigest()

    def build():
        import scipy.sparse as sp

        pat = A.pattern_csr()
        icperm = np.argsort(cperm)
        B = sp.csr_matrix((pat.data, icperm[pat.indices], pat.indptr),
                          shape=pat.shape)
        B.sort_indices()
        return analyze_best(B)

    return cached_plan("symbolic", (A.hash, "cp", h), build)


def _get_perm_csc_cp(A, sym, cperm):
    """_get_perm_csc for the column-permuted system B = A[:, cperm]."""
    import hashlib

    h = hashlib.blake2b(cperm.tobytes(), digest_size=12).hexdigest()

    def build():
        A_csr = A.pattern_csr()
        n = A.m
        coo = A_csr.tocoo()
        icperm = np.argsort(cperm)
        r2 = sym.iperm[coo.row]
        c2 = sym.iperm[icperm[coo.col]]
        order = np.lexsort((r2, c2))
        indices = r2[order].astype(np.int64)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, c2[order] + 1, 1)
        indptr = np.cumsum(indptr).astype(np.int64)
        return indptr, indices, order.astype(np.int64)

    return cached_plan("solver_perm", (A.hash, "cp", h), build)


class Symmetric:
    """Marker asserting symmetry for solves — the analogue of wrapping in
    LinearAlgebra.Symmetric before backslash (ref: Base.:\\ on Symmetric,
    HPCLinearAlgebra.jl:674)."""

    def __init__(self, A):
        self.A = A

    def __matmul__(self, o):
        return self.A @ o

    @property
    def shape(self):
        return self.A.shape


class Factorization:
    """LDLᵀ/LU factorization handle (ref: MUMPSFactorization,
    mumps_factorization.jl:42)."""

    def __init__(self, A, kind: str):
        self.A = A
        self.kind = kind
        self.backend = A.backend
        self.structural_hash = A.hash
        self.dtype = np.dtype(np.complex128 if np.issubdtype(
            np.dtype(A.dtype), np.complexfloating) else np.float64)
        self._A_host = None
        self._csc_buf = None
        self._growth: float | None = None
        self.cperm: np.ndarray | None = None  # MC64-role column permutation
        self.sym = _get_symbolic(A)
        self._lib = load_mf()
        self.native: NativeFactor | None = (
            NativeFactor(self.sym, self.dtype) if self._lib is not None else None)
        self.num: NumericFactor | None = None
        self._numeric(A)

    def _numeric(self, A):
        vals = _csr_values(A).astype(self.dtype, copy=False)
        # host CSR copy for refinement residuals (values refreshed with the
        # factorization; structure cached, value refresh LAZY — only the
        # refinement/escalation paths read it, so the common clean
        # refactorize skips the O(nnz) copy). Host residuals avoid device
        # round-trips and f32 truncation on TPUs without x64.
        self._A_vals = vals
        if self._A_host is None:
            # pattern from replicated metadata + the values we already
            # pulled — avoids a second full device->host nzval transfer.
            # Deliberately NOT sort_indices()'d: scipy matvec does not need
            # sorted rows, and sorting would permute .data so the
            # storage-order value refresh below would silently misalign on
            # patterns with unsorted within-row columns.
            M = A.pattern_csr().astype(self.dtype)
            M.data[:] = vals
            self._A_host = M
            self._A_host_stale = False
        else:
            self._A_host_stale = True
        if self.native is not None:
            anorm = float(np.abs(vals).max()) if vals.size else 0.0
            # relative threshold (no 1.0 floor: it would perturb every
            # pivot of a small-magnitude matrix)
            eps = _PERT_REL * (anorm if anorm > 0 else 1.0)
            csc = self._csc_for(A, vals)
            self._growth = None
            self.native.factorize(self._lib, csc, self.kind, eps,
                                  pivot=self.cperm is not None)
            if self._unstable():
                # a static perturbation fired, or the factor shows large
                # element growth (a legal-but-tiny pivot the eps clamp
                # missed): escalate to the within-front pivoted kernels
                # (BK LDLt / partial-pivot LU — the MUMPS CNTL(1) role,
                # mumps_factorization.jl:176-224). The fast unpivoted
                # kernels stay the default for the overwhelmingly common
                # well-pivoted case.
                self._growth = None
                self.native.factorize(self._lib, csc, self.kind, eps,
                                      pivot=True)
            if self._unstable() and self.kind == "lu" \
                    and self.cperm is None:
                # in-front pivoting exhausted its fully-summed candidate
                # pool: escalate to the MC64-role column permutation
                # (strong diagonal by construction) and refactor on the
                # permuted pattern — the MUMPS ICNTL(6) preprocessing role
                cperm = _colperm_matching(self._host_matrix())
                if cperm is not None:
                    self.cperm = cperm
                    self.sym = _get_symbolic_cp(A, cperm)
                    self.native = NativeFactor(self.sym, self.dtype)
                    self._growth = None
                    self.native.factorize(self._lib, self._csc_for(A, vals),
                                          self.kind, eps, pivot=True)
        else:
            self.num = factorize(self.sym, A.to_scipy(), self.kind)

    def _host_matrix(self):
        """The host CSR copy with CURRENT values (lazy refresh — see
        _numeric)."""
        if self._A_host_stale:
            self._A_host.data[:] = self._A_vals
            self._A_host_stale = False
        return self._A_host

    _GROWTH_MAX = 1e8

    def _factor_growth(self) -> float:
        """Max |L| entry — the growth monitor deciding pivot escalation
        and the refinement default (bounded for pivoted factors). Memoized
        per numeric factorization: the headline refactorize+solve loop
        otherwise scans the full factor 3x per iteration (_unstable twice,
        _clean once — ~1.5 ms of an 8 ms budget at n=10k)."""
        if self._growth is not None:
            return self._growth
        nf = self.native
        g = getattr(nf, "growth", 0.0)
        if not g and (nf.L11.size > 1 or nf.L21.size > 1):
            # engine built before the fused in-factorize scan existed
            suffix = "z" if nf.dtype == np.complex128 else "d"
            am = getattr(self._lib, f"mf_absmax2_{suffix}", None)
            if am is not None:
                g = float(am(nf.L11, nf.L11.size, nf.L21, nf.L21.size))
            else:
                for a in (nf.L11, nf.L21):
                    if a.size:
                        g = max(g, float(np.abs(a).max()))
        self._growth = g
        return g

    def _unstable(self) -> bool:
        return (self.native.n_perturbed > 0
                or self._factor_growth() > self._GROWTH_MAX)

    def _csc_for(self, A, vals):
        if self.cperm is None:
            indptr, indices, nzmap = _get_perm_csc(A, self.sym)
        else:
            indptr, indices, nzmap = _get_perm_csc_cp(A, self.sym, self.cperm)
        # reusable permuted-value buffer: the native factorize reads it
        # synchronously, so per-refactorize reuse is safe and skips an
        # O(nnz) allocation on the hot refactorize+solve loop
        buf = self._csc_buf
        if buf is None or buf.size != nzmap.size or buf.dtype != vals.dtype:
            buf = self._csc_buf = np.empty(nzmap.size, vals.dtype)
        np.take(vals, nzmap, out=buf)
        return _CSCView(indptr, indices, buf)

    # -- refactorization: same pattern, new values (ref: job=2 re-run,
    # mumps_factorization.jl:386-396) --------------------------------------
    def refactorize(self, A) -> "Factorization":
        if A.hash != self.structural_hash:
            raise ValueError("refactorize requires the same sparsity pattern")
        new_dtype = np.dtype(np.complex128 if np.issubdtype(
            np.dtype(A.dtype), np.complexfloating) else np.float64)
        if new_dtype != self.dtype:
            # value dtype changed (e.g. real -> complex values on the same
            # pattern): rebuild the numeric engine instead of silently casting
            # to the stale dtype (ref pins A and b to one T,
            # HPCLinearAlgebra.jl:643-744, so this cannot arise there)
            self.dtype = new_dtype
            self._A_host = None
            self._csc_buf = None
            self.native = (NativeFactor(self.sym, self.dtype)
                           if self._lib is not None else None)
            self.num = None
        self.A = A
        self._numeric(A)
        return self

    def _solve_host(self, bh: np.ndarray, transpose: bool) -> np.ndarray:
        if self.native is not None:
            if self.cperm is None:
                return self.native.solve(self._lib, bh, transpose=transpose)
            # factor is of B = A[:, cperm]:  A x = b  <=>  B y = b with
            # x[cperm] = y;  A^T x = b  <=>  B^T x = b[cperm]
            if transpose:
                return self.native.solve(self._lib, bh[self.cperm],
                                         transpose=True)
            y = self.native.solve(self._lib, bh, transpose=False)
            x = np.empty_like(y)
            x[self.cperm] = y
            return x
        return solve_factored(self.num, bh, transpose=transpose)

    def _solve_refined(self, bh: np.ndarray, transpose: bool,
                       refine: int) -> np.ndarray:
        """Solve + iterative refinement with host residuals in full
        precision — no device round-trips, exact f64 regardless of the TPU's
        x64 mode. ``bh`` must already be self.dtype."""
        x = self._solve_host(bh, transpose)
        if refine <= 0:
            return x
        Ah = self._host_matrix().T if transpose else self._host_matrix()
        for _ in range(refine):
            r = bh - Ah @ x
            if not np.isfinite(r).all():
                break
            x = x + self._solve_host(r, transpose)
        return x

    def solve(self, b, transpose: bool = False, refine: int | None = None):
        """Solve A x = b (or Aᵀ x = b). b: DistVector or host array; returns
        the same flavor, partitioned like A's rows. The RHS is gathered to
        host — the analogue of the reference's Gatherv-to-rank-0 MUMPS path
        (mumps_factorization.jl:316-329); keeping it distributed end-to-end
        is the planned device-solve upgrade."""
        from ..vector import DistVector

        if self.native is None and self.num is None:
            raise RuntimeError("factorization was finalized")
        if refine is None:
            # unperturbed, growth-bounded f64 direct solves are already at
            # ~1e-13 relative residual; a default sweep would double the
            # solve cost (the reference's MUMPS path runs without
            # refinement by default, mumps_factorization.jl:291-353)
            refine = 0 if self._clean() else 3
        is_dist = isinstance(b, DistVector)
        bh = b.to_numpy_ro() if is_dist else np.asarray(b)
        dtype = np.result_type(bh.dtype, self.dtype)
        if (np.issubdtype(bh.dtype, np.complexfloating)
                and not np.issubdtype(self.dtype, np.complexfloating)):
            # real factorization, complex RHS: solve Re(b) and Im(b)
            # separately — casting to the real dtype would silently drop
            # Im(b) (the reference's same-eltype dispatch forbids the mix)
            xr = self._solve_refined(np.ascontiguousarray(bh.real), transpose,
                                     refine)
            xi = self._solve_refined(np.ascontiguousarray(bh.imag), transpose,
                                     refine)
            x = (xr + 1j * xi).astype(dtype)
        else:
            x = self._solve_refined(bh.astype(self.dtype), transpose,
                                    refine).astype(dtype)

        if is_dist:
            # deferred device residency: host consumers (residuals, repeated
            # solves, to_numpy) skip the relay push entirely; the first
            # device use pays it once
            return DistVector.from_global_deferred(
                x, self.backend, partition=self.A.row_partition, dtype=dtype)
        return x

    def solve_transpose(self, b, refine: int | None = None):
        return self.solve(b, transpose=True, refine=refine)

    def _solve_multi_host(self, Bh: np.ndarray, transpose: bool) -> np.ndarray:
        if self.native is not None:
            if self.cperm is None:
                return self.native.solve_multi(self._lib, Bh,
                                               transpose=transpose)
            if transpose:
                return self.native.solve_multi(
                    self._lib, np.ascontiguousarray(Bh[self.cperm]),
                    transpose=True)
            Y = self.native.solve_multi(self._lib, Bh, transpose=False)
            X = np.empty_like(Y)
            X[self.cperm] = Y
            return X
        return np.stack([solve_factored(self.num, Bh[:, j], transpose=transpose)
                         for j in range(Bh.shape[1])], axis=1)

    def solve_matrix(self, B, transpose: bool = False, refine: int | None = None):
        """Blocked multi-RHS solve: B is a DistDenseMatrix (or host (n, k)
        array) whose columns are right-hand sides. The RHS block is gathered
        ONCE and all columns go through a single gemm-based sweep, with
        matrix-level refinement (ref: MUMPS multi-RHS solve path,
        mumps_factorization.jl:291-353 — the reference likewise gathers the
        whole RHS rather than looping columns)."""
        from ..dense import DistDenseMatrix

        if self.native is None and self.num is None:
            raise RuntimeError("factorization was finalized")
        if refine is None:
            refine = 0 if self._clean() else 3
        is_dist = isinstance(B, DistDenseMatrix)
        Bh = B.to_numpy_ro() if is_dist else np.asarray(B)
        dtype = np.result_type(Bh.dtype, self.dtype)
        if (np.issubdtype(Bh.dtype, np.complexfloating)
                and not np.issubdtype(self.dtype, np.complexfloating)):
            Xr = self._refined_multi(np.ascontiguousarray(Bh.real), transpose,
                                     refine)
            Xi = self._refined_multi(np.ascontiguousarray(Bh.imag), transpose,
                                     refine)
            X = (Xr + 1j * Xi).astype(dtype)
        else:
            X = self._refined_multi(Bh.astype(self.dtype), transpose,
                                    refine).astype(dtype)
        if is_dist:
            return DistDenseMatrix.from_global(X, self.backend,
                                               row_partition=self.A.row_partition,
                                               dtype=X.dtype)
        return X

    def _refined_multi(self, Bh: np.ndarray, transpose: bool,
                       refine: int) -> np.ndarray:
        X = self._solve_multi_host(Bh, transpose)
        if refine <= 0:
            return X
        Ah = self._host_matrix().T if transpose else self._host_matrix()
        for _ in range(refine):
            R = Bh - Ah @ X
            if not np.isfinite(R).all():
                break
            X = X + self._solve_multi_host(R, transpose)
        return X

    def finalize(self):
        """Release numeric data (ref: finalize!, mumps_factorization.jl:421)."""
        self.num = None
        self.native = None

    def _clean(self) -> bool:
        """No perturbations and bounded growth: safe to skip refinement."""
        if self.n_perturbed != 0:
            return False
        if self.native is not None:
            return self._factor_growth() <= self._GROWTH_MAX
        return True

    @property
    def n_perturbed(self) -> int:
        if self.native is not None:
            return self.native.n_perturbed
        return self.num.n_perturbed if self.num else 0

    def __repr__(self):
        return (f"Factorization(kind={self.kind}, n={self.A.m}, "
                f"nsuper={self.sym.nsuper}, lnz={self.sym.lnz}, "
                f"native={self.native is not None})")


def _csr_values(A) -> np.ndarray:
    """Host copy of A's values in global CSR order (matches to_scipy().data),
    cached per value-array identity — repeated refactorizations of the same
    matrix instance skip the device->host transfer."""
    cache = getattr(A, "_engine_cache", None)
    if cache is None:
        cache = A._engine_cache = {}
    # a matrix instance's nzval never changes (setindex! replaces the whole
    # engine cache), so one host copy per instance suffices
    hit = cache.get("hostvals")
    if hit is not None:
        return hit
    st = A.structure
    nz = np.asarray(A.nzval)
    vals = np.concatenate([nz[s, : st.nnz_local[s]]
                           for s in range(A.backend.nshards)]) \
        if A.backend.nshards else np.zeros(0, A.dtype)
    cache["hostvals"] = vals
    return vals


def _resolve_method(A, method):
    """None -> the backend's solver selection (ref: the Solver type
    parameter of HPCBackend routes ``A \\ b`` to MUMPS or cuDSS)."""
    if method is not None:
        return method
    return "device" if getattr(A.backend, "solver", "") == "device" else "host"


def ldlt(A, method: str | None = None, spd: bool = False):
    """Ref: ldlt (mumps_factorization.jl:259). Symmetric (possibly complex-
    symmetric) LDLᵀ with static pivoting. ``method="device"`` (or a backend
    built with ``solver="device"``) selects the mesh-distributed
    device-resident multifrontal engine (solver/device_mf.py; the
    cuDSS-MGMN analogue, CUDAExt:602-710) — indefinite systems use the
    blocked unpivoted LDL kernel; ``spd=True`` opts into the faster
    Cholesky kernel."""
    from ..cplx import ComplexDistSparseMatrix, ldlt_complex

    if isinstance(A, ComplexDistSparseMatrix):
        # split-plane complex containers factor the realified 2n system
        # through the SAME dispatch as real (ref complex A \\ b,
        # mumps_factorization.jl:242-353)
        return ldlt_complex(A, method=method)
    if A.m != A.ncols:
        raise ValueError("ldlt requires a square matrix")
    if _resolve_method(A, method) == "device":
        from .device_mf import DeviceFactorization, DeviceScheduleError

        try:
            return DeviceFactorization(A, kind="chol" if spd else "ldl")
        except DeviceScheduleError as e:
            _warn_host_fallback(e)
    return Factorization(A, "ldlt")


def lu(A, method: str | None = None):
    """Ref: lu (mumps_factorization.jl:242). Unsymmetric LU on the
    symmetrized pattern with static pivoting + refinement. ``method=
    "device"`` (or ``solver="device"`` backends) runs the distributed
    device multifrontal LU."""
    from ..cplx import ComplexDistSparseMatrix, lu_complex

    if isinstance(A, ComplexDistSparseMatrix):
        return lu_complex(A, method=method)
    if A.m != A.ncols:
        raise ValueError("lu requires a square matrix")
    if _resolve_method(A, method) == "device":
        from .device_mf import DeviceFactorization, DeviceScheduleError

        try:
            return DeviceFactorization(A, kind="lu")
        except DeviceScheduleError as e:
            _warn_host_fallback(e)
    return Factorization(A, "lu")


def _warn_host_fallback(e):
    import warnings

    warnings.warn(f"device multifrontal unavailable for this pattern "
                  f"({e}); falling back to the host engine", stacklevel=3)


class BackslashCache:
    """The A \\ b cache (ref: _mumps_backslash_cache keyed on
    (hash, symmetric, T), HPCLinearAlgebra.jl:643-744): repeated solves with
    the same sparsity pattern skip symbolic analysis; same values skip the
    numeric factorization entirely."""

    @staticmethod
    def _cache():
        return plan_cache("backslash")

    @staticmethod
    def solve(A, b, symmetric: bool | None = None, transpose: bool = False):
        if symmetric is None:
            symmetric = A.issymmetric()
        kind = "ldlt" if symmetric else "lu"
        # key includes the matrix's VALUE dtype: a complex-valued matrix on a
        # real-valued pattern twin must not hit the real factorization (the
        # reference dispatches on a single T, HPCLinearAlgebra.jl:643-744)
        solver = getattr(A.backend, "solver", "multifrontal")
        # backend.key (mesh/device identity) matters like in every plan
        # cache: the same pattern on a different mesh must not reuse a
        # Factorization whose distributed outputs live on the stale mesh
        key = (A.hash, kind, str(np.dtype(A.dtype)),
               str(np.dtype(A.backend.dtype)), solver, A.backend.key)
        c = BackslashCache._cache()
        F = c.get(key)
        if F is None:
            if solver == "device":
                # backend-selected device engine (ref: SolverCuDSS backends
                # route the backslash to cuDSS, CUDAExt:779-885)
                from .device_mf import DeviceFactorization, DeviceScheduleError

                try:
                    F = DeviceFactorization(
                        A, kind="ldl" if symmetric else "lu")
                except DeviceScheduleError as e:
                    _warn_host_fallback(e)
                    F = Factorization(A, kind)
            else:
                F = Factorization(A, kind)
            c[key] = F
            F._vals_ref = A.nzval
        else:
            # identity of the value array detects value swaps. Holding a
            # strong reference (not just id()) makes this immune to id
            # recycling after the old array is garbage-collected.
            if F._vals_ref is not A.nzval:
                F.refactorize(A)
                F._vals_ref = A.nzval
        from ..dense import DistDenseMatrix
        from ..vector import DistVector

        if isinstance(b, DistDenseMatrix) or (
                not isinstance(b, DistVector) and np.ndim(b) == 2):
            # matrix RHS: A \ B through the blocked multi-RHS sweep
            return F.solve_matrix(b, transpose=transpose)
        return F.solve(b, transpose=transpose)


def _solve_complex(A, b, symmetric: bool | None = None):
    """Backslash for split-plane complex containers: cached realified
    factorization with refactorize-only value hits (same discipline as
    BackslashCache; ref HPCLinearAlgebra.jl:643-744)."""
    from ..cplx import ComplexFactorization

    if symmetric is None:
        symmetric = A.issymmetric()
    kind = "ldl" if symmetric else "lu"
    key = (A.hash, "cplx", kind, A.backend.key)
    c = plan_cache("backslash")
    F = c.get(key)
    if F is None:
        F = ComplexFactorization(A, kind=kind)
        c[key] = F
        F._vals_ref = (A.re.nzval, A.im.nzval)
    elif F._vals_ref[0] is not A.re.nzval \
            or F._vals_ref[1] is not A.im.nzval:
        F.refactorize(A)
        F._vals_ref = (A.re.nzval, A.im.nzval)
    return F.solve(b)


def solve(A, b, symmetric: bool | None = None):
    """``A \\ b`` (ref: Base.:\\, HPCLinearAlgebra.jl:674). Wrapping A in
    hl.Symmetric asserts symmetry; a LazyTranspose solves the transposed
    system (ref: transpose/adjoint solve, test_factorization.jl)."""
    from ..cplx import ComplexDistSparseMatrix
    from ..lazy import LazyTranspose

    inner = A.A if isinstance(A, Symmetric) else A
    if isinstance(inner, ComplexDistSparseMatrix):
        return _solve_complex(inner, b,
                              symmetric=(True if isinstance(A, Symmetric)
                                         else symmetric))
    if isinstance(A, Symmetric):
        return BackslashCache.solve(A.A, b, symmetric=True)
    if isinstance(A, LazyTranspose):
        return BackslashCache.solve(A.parent, b, symmetric=symmetric,
                                    transpose=True)
    return BackslashCache.solve(A, b, symmetric=symmetric)

"""Solver API: lu / ldlt / solve with the reference's backslash cache.

Reference semantics (/root/reference/src/mumps_factorization.jl,
HPCLinearAlgebra.jl:626-744):
  * ``lu(A)`` / ``ldlt(A)`` return a Factorization; ``F.solve(b)`` solves.
  * ``solve(A, b)`` (the ``A \\ b`` analogue) consults a global cache keyed
    by (structural hash, symmetric, dtype): a hit re-uses the symbolic
    analysis and only refreshes values + refactorizes (mumps_factorization.
    jl:404: _refactorize_and_solve!, O(nnz) value refresh via nzval_perm).
  * transpose/adjoint solves and ``finalize!`` are supported.

Static pivoting is compensated by iterative refinement in ``solve`` using
the DEVICE distributed SpMV for residuals — refinement is the standard
companion of static pivoting (SuperLU_DIST-style) and keeps the accuracy at
the reference's tolerance on its test problems.
"""

from __future__ import annotations

import numpy as np

from ..cache import cached_plan, plan_cache
from .multifrontal import NumericFactor, factorize, solve_factored
from .ordering import amd_order
from .symbolic import SymbolicFactor, analyze


class Factorization:
    """LDLᵀ/LU factorization handle (ref: MUMPSFactorization,
    mumps_factorization.jl:42)."""

    def __init__(self, A, kind: str):
        self.A = A
        self.kind = kind
        self.backend = A.backend
        self.structural_hash = A.hash
        A_csr = A.to_scipy()
        self.sym = _get_symbolic(A, kind)
        self.num: NumericFactor | None = factorize(self.sym, A_csr, kind)
        self.dtype = A_csr.dtype

    # -- refactorization: same pattern, new values (ref: job=2 re-run,
    # mumps_factorization.jl:386-396) --------------------------------------
    def refactorize(self, A) -> "Factorization":
        if A.hash != self.structural_hash:
            raise ValueError("refactorize requires the same sparsity pattern")
        self.A = A
        self.num = factorize(self.sym, A.to_scipy(), self.kind)
        return self

    def solve(self, b, transpose: bool = False, refine: int = 2):
        """Solve A x = b (or Aᵀ x = b). b: DistVector or host array; returns
        the same flavor, partitioned like A's rows. The RHS is gathered to
        host — the analogue of the reference's Gatherv-to-rank-0 MUMPS path
        (mumps_factorization.jl:316-329); keeping it distributed end-to-end
        is the planned device-solve upgrade."""
        from ..vector import DistVector

        if self.num is None:
            raise RuntimeError("factorization was finalized")
        is_dist = isinstance(b, DistVector)
        bh = b.to_numpy() if is_dist else np.asarray(b)
        dtype = np.result_type(bh.dtype, self.dtype)
        x = solve_factored(self.num, bh.astype(dtype), transpose=transpose)

        if refine > 0:
            A = self.A
            Aop = A.transpose_materialized() if transpose else A
            xd = DistVector.from_global(x, self.backend, partition=A.row_partition,
                                        dtype=dtype)
            bd = (b.repartition(A.row_partition) if is_dist
                  else DistVector.from_global(bh, self.backend,
                                              partition=A.row_partition, dtype=dtype))
            for _ in range(refine):
                r = bd - Aop @ xd  # device SpMV residual
                rh = r.to_numpy()
                if not np.isfinite(rh).all():
                    break
                dx = solve_factored(self.num, rh.astype(dtype), transpose=transpose)
                x = x + dx
                xd = DistVector.from_global(x, self.backend,
                                            partition=A.row_partition, dtype=dtype)
            x = xd.to_numpy()

        if is_dist:
            return DistVector.from_global(x, self.backend,
                                          partition=self.A.row_partition, dtype=dtype)
        return x

    def solve_transpose(self, b, refine: int = 2):
        return self.solve(b, transpose=True, refine=refine)

    def finalize(self):
        """Release numeric data (ref: finalize!, mumps_factorization.jl:421)."""
        self.num = None

    @property
    def n_perturbed(self) -> int:
        return self.num.n_perturbed if self.num else 0

    def __repr__(self):
        return (f"Factorization(kind={self.kind}, n={self.A.m}, "
                f"nsuper={self.sym.nsuper}, lnz={self.sym.lnz})")


def _get_symbolic(A, kind: str) -> SymbolicFactor:
    """Symbolic analysis cached per sparsity pattern — shared by lu/ldlt and
    every refactorization (the expensive, comm-free phase)."""

    def build():
        A_csr = A.to_scipy()
        perm = amd_order(A_csr.indptr.astype(np.int64),
                         A_csr.indices.astype(np.int64), A.m)
        return analyze(A_csr, perm)

    return cached_plan("symbolic", (A.hash,), build)


def ldlt(A) -> Factorization:
    """Ref: ldlt (mumps_factorization.jl:259). Symmetric (possibly complex-
    symmetric) LDLᵀ with static pivoting."""
    if A.m != A.ncols:
        raise ValueError("ldlt requires a square matrix")
    return Factorization(A, "ldlt")


def lu(A) -> Factorization:
    """Ref: lu (mumps_factorization.jl:242). Unsymmetric LU on the
    symmetrized pattern with static pivoting + refinement."""
    if A.m != A.ncols:
        raise ValueError("lu requires a square matrix")
    return Factorization(A, "lu")


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
        key = (A.hash, kind, str(np.dtype(A.backend.dtype)))
        c = BackslashCache._cache()
        F = c.get(key)
        if F is None:
            F = Factorization(A, kind)
            c[key] = F
            F._vals_id = _vals_fingerprint(A)
        else:
            fp = _vals_fingerprint(A)
            if F._vals_id != fp:
                F.refactorize(A)
                F._vals_id = fp
        return F.solve(b, transpose=transpose)


def _vals_fingerprint(A):
    """Cheap identity of the value array to detect when a cached
    factorization must be numerically refreshed."""
    return id(A.nzval)


def solve(A, b, symmetric: bool | None = None):
    """``A \\ b`` (ref: Base.:\\, HPCLinearAlgebra.jl:674)."""
    return BackslashCache.solve(A, b, symmetric=symmetric)

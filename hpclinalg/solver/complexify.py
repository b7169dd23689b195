"""Complex solves on complex-incapable TPU runtimes via realification.

Role: the reference solves ComplexF64 systems through MUMPS with the same
dispatch as real (/root/reference/src/mumps_factorization.jl:242-353); the
CUDA extension does the same through cuDSS. On the current TPU generation
the runtime cannot even device_put a complex64 array (UNIMPLEMENTED), so
the TPU-native formulation is the classical **realification**: each
complex entry a = ar + i*ai becomes the 2x2 real block

    general (LU):            [[ar, -ai], [ai, ar]]
    complex-symmetric (LDL): [[ai,  ar], [ar, -ai]]   (equations swapped;
                             real-symmetric indefinite when A is complex
                             symmetric)

with variables interleaved (z_k -> rows 2k, 2k+1), so the 2n x 2n real
system has exactly A's sparsity pattern in 2x2 blocks — AMD sees the
blocked structure, every frontal matmul runs as real f32 on the MXU, and
the ENTIRE tested real device engine (factor, wave solves, multi-RHS,
compensated refinement) is reused unchanged.

Identities used (R = general realification):
    R(A B) = R(A) R(B),  R(A + B) = R(A) + R(B)       (ring homomorphism)
    R(A)^T = R(A^H),  R(conj A) = D R(A) D  with D = diag(+1, -1, ...)
    => transpose solve: A^T z = b  <=>  R^T (D u) = D realify(b),
       z = conj(derealify(v)) where v solves the R^T system.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

_I2 = np.array([[1.0, 0.0], [0.0, 1.0]])
_J2 = np.array([[0.0, -1.0], [1.0, 0.0]])
_X2 = np.array([[0.0, 1.0], [1.0, 0.0]])
_Z2 = np.array([[1.0, 0.0], [0.0, -1.0]])


def realify_matrix(A, symmetric: bool = False):
    """Complex scipy matrix -> interleaved 2n x 2n real f32 CSR."""
    A = sp.csr_matrix(A)
    Ar = A.real.astype(np.float64)
    Ai = A.imag.astype(np.float64)
    if symmetric:
        R = sp.kron(Ai, _Z2) + sp.kron(Ar, _X2)
    else:
        R = sp.kron(Ar, _I2) + sp.kron(Ai, _J2)
    return R.tocsr().astype(np.float32)


def realify_vec(b, symmetric: bool = False) -> np.ndarray:
    """Complex (n,) or (n, k) -> interleaved real (2n,) / (2n, k)."""
    b = np.asarray(b)
    shape = (2 * b.shape[0],) + b.shape[1:]
    out = np.empty(shape, np.float64)
    if symmetric:             # equations swapped: RHS per variable (bi, br)
        out[0::2], out[1::2] = b.imag, b.real
    else:
        out[0::2], out[1::2] = b.real, b.imag
    return out


def derealify_vec(x) -> np.ndarray:
    """Interleaved real (2n,) / (2n, k) -> complex (n,) / (n, k).
    (The UNKNOWNS are (re, im) interleaved in both forms — only the
    equations are permuted in the symmetric form.)"""
    x = np.asarray(x)
    return x[0::2] + 1j * x[1::2]


class ComplexDeviceFactorization:
    """Distributed device factorization of a complex sparse matrix on
    TPU hardware that cannot represent complex dtypes, via the realified
    2n real system (ref parity: mumps_factorization.jl complex dispatch;
    BASELINE workload 5, Helmholtz complex LU + multi-RHS).

    kind='lu' uses the general realification; kind='ldl' requires a
    complex-SYMMETRIC matrix (A == A^T, not Hermitian) and factors the
    real-symmetric indefinite swapped form. Accepts a complex scipy
    matrix; solves take/return complex numpy arrays (vector or (n, k))."""

    def __init__(self, A, backend, kind: str = "lu"):
        from ..sparse import DistSparseMatrix
        from .device_mf import DeviceFactorization

        if kind not in ("lu", "ldl"):
            raise ValueError("complex device kinds: 'lu' or 'ldl'")
        A = sp.csr_matrix(A)
        if A.shape[0] != A.shape[1]:
            raise ValueError("square matrices only")
        self.n = A.shape[0]
        self.kind = kind
        self.symmetric = kind == "ldl"
        if self.symmetric:
            d = (A - A.T)
            if d.nnz and abs(d).max() > 1e-6 * max(abs(A).max(), 1e-30):
                raise ValueError("kind='ldl' requires a complex-symmetric "
                                 "matrix (A == A.T); use kind='lu'")
        R = realify_matrix(A, symmetric=self.symmetric)
        self._Rd = DistSparseMatrix.from_scipy(R, backend, dtype=np.float32)
        self.engine = DeviceFactorization(self._Rd, kind=kind,
                                          dtype=np.float32)
        self.backend = backend

    def refactorize(self, A) -> "ComplexDeviceFactorization":
        """New values, same pattern: rebuild the realified values and rerun
        the numeric phase only (ref: refactorize-only backslash-cache hits,
        mumps_factorization.jl:404)."""
        from ..sparse import DistSparseMatrix

        R = realify_matrix(sp.csr_matrix(A), symmetric=self.symmetric)
        Rd = DistSparseMatrix.from_scipy(R, self.backend, dtype=np.float32)
        if Rd.hash != self._Rd.hash:
            raise ValueError("refactorize requires the same sparsity pattern")
        self._Rd = Rd
        self.engine.refactorize(Rd)
        return self

    def _solve_real(self, rb, transpose, refine, extended):
        eng = self.engine
        if rb.ndim == 1:
            return eng.solve(rb, transpose=transpose, refine=refine,
                             extended=extended)
        return eng.solve_matrix(rb, transpose=transpose, refine=refine,
                                extended=extended)

    def solve(self, b, transpose: bool = False, refine: int | None = None,
              extended: bool | None = None) -> np.ndarray:
        """x with A x = b (or A^T x = b). b: complex (n,) or (n, k)."""
        b = np.asarray(b)
        if b.shape[0] != self.n:
            raise ValueError(f"RHS has {b.shape[0]} rows, matrix is {self.n}")
        if transpose and not self.symmetric:
            # R(A^T) = D R^T D: conjugate in, transpose-solve, conjugate out
            rb = realify_vec(np.conj(b))
            x = self._solve_real(rb, True, refine, extended)
            return np.conj(derealify_vec(x))
        rb = realify_vec(b, symmetric=self.symmetric)
        x = self._solve_real(rb, transpose, refine, extended)
        return derealify_vec(x)

    def matvec(self, z) -> np.ndarray:
        """A z through the realified distributed SpMV (complex SpMV on a
        complex-incapable chip). z: complex (n,)."""
        from ..parallel.mesh import scatter_from_full
        from ..vector import DistVector

        import jax.numpy as jnp

        part = self._Rd.row_partition
        if self.symmetric:
            # the stored realification has swapped equations; matvec wants
            # the general form: un-swap the output blocks
            zr = realify_vec(np.asarray(z), symmetric=False)
            zv = DistVector(
                scatter_from_full(jnp.asarray(zr, jnp.float32), part,
                                  self.backend), part, self.backend)
            y = (self._Rd @ zv).to_numpy()
            return y[1::2] + 1j * y[0::2]
        zr = realify_vec(np.asarray(z))
        zv = DistVector(
            scatter_from_full(jnp.asarray(zr, jnp.float32), part,
                              self.backend), part, self.backend)
        return derealify_vec((self._Rd @ zv).to_numpy())

    def finalize(self):
        self.engine.finalize()

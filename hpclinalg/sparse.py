"""DistSparseMatrix: the distributed row-partitioned CSR sparse matrix.

TPU-native analogue of ``HPCSparseMatrix`` (/root/reference/src/sparse.jl:
319-337): each shard owns a contiguous block of rows stored as local CSR
with a **compressed column space** — ``col_indices[s]`` is the sorted set of
global columns present on shard s and ``colval[s]`` holds indices into it
(reference design note at sparse.jl:297-309; avoids hypersparse storage).

Split of concerns (SURVEY.md §7.1):
  * ALL structure metadata (partitions, indptr, col_indices, colval) is
    host-replicated numpy, wrapped in an immutable ``SparseStructure`` that
    carries the blake2b structural hash used as the plan-cache key — the
    analogue of the reference's collective Blake3 hash (sparse.jl:97-121).
  * Only ``nzval`` lives on device: one stacked (S, NNZpad) array sharded
    P("rows"), padding zero. Matrices sharing a pattern share the structure
    object, which is what makes refactorize-only solve hits and plan reuse
    O(1) (ref backslash cache, HPCLinearAlgebra.jl:643-744).
  * The device copies of the CSR index arrays needed by compute kernels
    (row ids, compressed cols) mirror the reference duplicating
    ``rowptr_target/colval_target`` on the compute device (sparse.jl:330).
"""

from __future__ import annotations

import hashlib
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .backend import Backend, resolve_dtype
from .config import round_up
from .hashing import DIGEST_SIZE, _h, partition_hash
from .partition import (
    nshards_of,
    padded_size,
    partition_sizes,
    uniform_partition,
    validate_partition,
)


class SparseStructure:
    """Immutable replicated description of a distributed CSR pattern."""

    def __init__(self, row_partition, col_partition, indptr, col_indices, colval,
                 backend: Backend):
        self.backend = backend
        self.row_partition = validate_partition(row_partition)
        self.col_partition = validate_partition(col_partition)
        self.indptr = [np.asarray(a, dtype=np.int64) for a in indptr]
        self.col_indices = [np.asarray(a, dtype=np.int64) for a in col_indices]
        self.colval = [np.asarray(a, dtype=np.int32) for a in colval]
        S = backend.nshards
        assert len(self.indptr) == S

        self.nnz_local = np.array([len(c) for c in self.colval], dtype=np.int64)
        self.nnz = int(self.nnz_local.sum())
        self.Lrow = padded_size(self.row_partition)
        self.NNZpad = round_up(int(self.nnz_local.max()) if S else 0)
        # gathered-x buffer length: >= max compressed width + 1 guaranteed-zero
        # slot that padding colval entries point to (keeps 0*inf out of SpMV)
        self.Gmax = int(max((len(c) for c in self.col_indices), default=0))
        self.Gpad = round_up(self.Gmax + 1)

    @cached_property
    def hash(self) -> str:
        """Ref: compute_structural_hash (sparse.jl:97-121) — here pure
        local. Delegates to the public hashing function so the identity
        keying the plan caches IS the exported one."""
        from .hashing import sparse_structural_hash

        return sparse_structural_hash(self.row_partition, self.col_partition,
                                      self.indptr, self.col_indices,
                                      self.colval)

    @cached_property
    def row_ids_dev(self) -> jax.Array:
        """(S, NNZpad) int32 local row of each stored value; padding points at
        row Lrow which segment_sum drops."""
        S = self.backend.nshards
        out = np.full((S, self.NNZpad), self.Lrow, dtype=np.int32)
        for s in range(S):
            nl = len(self.indptr[s]) - 1
            out[s, : self.nnz_local[s]] = np.repeat(
                np.arange(nl, dtype=np.int32), np.diff(self.indptr[s])
            )
        return jax.device_put(out, self.backend.row_sharding())

    @cached_property
    def colval_dev(self) -> jax.Array:
        """(S, NNZpad) int32 compressed column of each stored value; padding
        points at the guaranteed-zero slot of the gathered-x buffer."""
        S = self.backend.nshards
        out = np.empty((S, self.NNZpad), dtype=np.int32)
        for s in range(S):
            out[s, :] = len(self.col_indices[s])  # a zero slot < Gpad
            out[s, : self.nnz_local[s]] = self.colval[s]
        return jax.device_put(out, self.backend.row_sharding())

    @cached_property
    def global_coo(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per shard: (global rows, global cols) of stored values in CSR
        (storage) order — the common currency of symbolic planning."""
        out = []
        for s in range(len(self.indptr)):
            rows = np.repeat(
                np.arange(len(self.indptr[s]) - 1, dtype=np.int64),
                np.diff(self.indptr[s]),
            ) + self.row_partition[s]
            cols = self.col_indices[s][self.colval[s]] if len(self.colval[s]) else np.zeros(0, np.int64)
            out.append((rows, cols))
        return out

    def local_sizes(self) -> np.ndarray:
        return partition_sizes(self.row_partition)

    @property
    def shape(self):
        return (int(self.row_partition[-1]), int(self.col_partition[-1]))


def _structure_from_local_csr(parts, ncols, backend, col_partition=None):
    """parts: list of (indptr, global col indices) per shard."""
    indptr, col_indices, colval = [], [], []
    sizes = []
    # flag-array compression: unique+searchsorted are O(nnz log nnz) sorts
    # (measured 6.7 s at 8M nnz); a presence bitmap + rank table is two
    # linear passes. Falls back to the sort path for huge column spaces.
    use_flags = 0 < ncols <= (1 << 24)
    if use_flags:
        present = np.zeros(ncols, bool)
        rank = np.empty(ncols, np.int32)
    for ip, gj in parts:
        ip = np.asarray(ip, dtype=np.int64)
        gj = np.asarray(gj, dtype=np.int64)
        sizes.append(len(ip) - 1)
        if use_flags and len(gj):
            present[:] = False
            present[gj] = True
            ci = np.flatnonzero(present).astype(np.int64)
            rank[ci] = np.arange(len(ci), dtype=np.int32)
            cv = rank[gj]
        else:
            ci = np.unique(gj)
            cv = np.searchsorted(ci, gj).astype(np.int32)
        indptr.append(ip)
        col_indices.append(ci)
        colval.append(cv)
    row_partition = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    cp = (validate_partition(col_partition, ncols) if col_partition is not None
          else uniform_partition(ncols, backend.nshards))
    return SparseStructure(row_partition, cp, indptr, col_indices, colval, backend)


def _pad_stack_nzval(vals: list[np.ndarray], NNZpad: int, dtype) -> np.ndarray:
    S = len(vals)
    out = np.zeros((S, NNZpad), dtype=dtype)
    for s, v in enumerate(vals):
        out[s, : len(v)] = v
    return out


class DistSparseMatrix:
    """Distributed CSR sparse matrix (ref: HPCSparseMatrix, sparse.jl:319)."""

    __array_priority__ = 120

    def __init__(self, structure: SparseStructure, nzval: jax.Array, backend: Backend):
        self.structure = structure
        self.nzval = nzval  # (S, NNZpad), padding zero
        self.backend = backend
        self.cached_transpose: "DistSparseMatrix | None" = None  # ref sparse.jl:333
        self._issym: bool | None = None

    # -- identity / metadata -------------------------------------------------
    @property
    def hash(self) -> str:
        return self.structure.hash

    @property
    def row_partition(self) -> np.ndarray:
        return self.structure.row_partition

    @property
    def col_partition(self) -> np.ndarray:
        return self.structure.col_partition

    @property
    def row_partition_hash(self) -> str:
        return partition_hash(self.structure.row_partition)

    @property
    def shape(self):
        return self.structure.shape

    @property
    def m(self):
        return self.shape[0]

    @property
    def ncols(self):
        return self.shape[1]

    @property
    def dtype(self):
        return self.nzval.dtype

    def nnz(self) -> int:
        """Ref: SparseArrays.nnz (sparse.jl:2436)."""
        return self.structure.nnz

    # -- constructors ----------------------------------------------------------
    @staticmethod
    def from_scipy(A, backend: Backend, row_partition=None, col_partition=None,
                   dtype=None) -> "DistSparseMatrix":
        """Build from a replicated scipy sparse matrix — each shard slices its
        rows (ref global ctor, sparse.jl:398-409). Complex input on a
        complex-incapable platform returns the split-plane
        ComplexDistSparseMatrix (cplx.py) transparently."""
        A = sp.csr_matrix(A)
        A.sort_indices()
        if np.issubdtype(np.dtype(dtype or A.dtype), np.complexfloating) \
                and not backend.complex_capable:
            from .cplx import ComplexDistSparseMatrix

            return ComplexDistSparseMatrix.from_scipy(
                A, backend, row_partition=row_partition,
                col_partition=col_partition, dtype=dtype)
        backend.check_dtype(dtype or A.dtype)
        m, n = A.shape
        rp = (validate_partition(row_partition, m) if row_partition is not None
              else uniform_partition(m, backend.nshards))
        parts, vals = [], []
        for s in range(backend.nshards):
            lo, hi = int(rp[s]), int(rp[s + 1])
            loc = A[lo:hi]
            parts.append((loc.indptr.astype(np.int64), loc.indices.astype(np.int64)))
            vals.append(loc.data)
        st = _structure_from_local_csr(parts, n, backend, col_partition)
        # parts were sliced by rp, so the cumsum row partition equals rp
        nz = _pad_stack_nzval(vals, st.NNZpad,
                              resolve_dtype(backend, A.dtype, dtype))
        return DistSparseMatrix(st, jax.device_put(nz, backend.row_sharding()), backend)

    @staticmethod
    def from_local_csr(parts, ncols: int, backend: Backend, col_partition=None,
                       dtype=None) -> "DistSparseMatrix":
        """Build from per-shard (indptr, global col indices, values) triples
        (ref: HPCSparseMatrix_local, sparse.jl:454-525)."""
        backend.check_dtype(dtype or np.result_type(*(v for _, _, v in parts)))
        struct_parts = [(ip, gj) for (ip, gj, _v) in parts]
        st = _structure_from_local_csr(struct_parts, ncols, backend, col_partition)
        nz = _pad_stack_nzval([np.asarray(v) for (_i, _j, v) in parts],
                              st.NNZpad,
                              resolve_dtype(backend,
                                            np.result_type(*(v for _, _, v in parts)),
                                            dtype))
        return DistSparseMatrix(st, jax.device_put(nz, backend.row_sharding()), backend)

    @staticmethod
    def from_structure(st: SparseStructure, nzval_parts: list[np.ndarray],
                       dtype=None) -> "DistSparseMatrix":
        nz = _pad_stack_nzval(nzval_parts, st.NNZpad,
                              resolve_dtype(st.backend,
                                            np.result_type(*nzval_parts) if nzval_parts else st.backend.dtype,
                                            dtype))
        return DistSparseMatrix(st, jax.device_put(nz, st.backend.row_sharding()),
                                st.backend)

    def with_values(self, nzval: jax.Array) -> "DistSparseMatrix":
        """Same pattern, new values — shares structure, hash, and every plan."""
        return DistSparseMatrix(self.structure, nzval, self.backend)

    def _gathered_pattern(self):
        """(indptr, indices) of the replicated global CSR — pure host work
        over the replicated structure metadata, no device transfer."""
        st = self.structure
        indices_all = []
        indptr = np.zeros(self.m + 1, dtype=np.int64)
        rows_done = 0
        for s in range(self.backend.nshards):
            ip = st.indptr[s]
            nl = len(ip) - 1
            indptr[rows_done + 1: rows_done + nl + 1] = indptr[rows_done] + ip[1:]
            gcols = st.col_indices[s][st.colval[s]] if len(st.colval[s]) else np.zeros(0, np.int64)
            indices_all.append(gcols)
            rows_done += nl
        indices = np.concatenate(indices_all) if indices_all else np.zeros(0, np.int64)
        return indptr, indices

    def pattern_csr(self) -> sp.csr_matrix:
        """Replicated host CSR of the PATTERN only (data = ones; scipy
        canonicalization prunes explicit zeros, which would silently drop
        pattern entries under e.g. A + A.T symmetrization) — for symbolic
        consumers (ordering, symbolic factorization, plan construction).
        Pulling values through the device->host link costs ~seconds-to-
        minutes at scale and symbolic phases never read them."""
        indptr, indices = self._gathered_pattern()
        return sp.csr_matrix(
            (np.ones(len(indices), np.float32), indices, indptr),
            shape=self.shape)

    def to_scipy(self) -> sp.csr_matrix:
        """Gather to a replicated scipy CSR (ref converter SparseMatrixCSC(),
        HPCLinearAlgebra.jl:871-930)."""
        st = self.structure
        nz = np.asarray(self.nzval)
        indptr, indices = self._gathered_pattern()
        data = np.concatenate(
            [nz[s, : st.nnz_local[s]] for s in range(self.backend.nshards)]
        ) if self.backend.nshards else np.zeros(0, self.dtype)
        return sp.csr_matrix((data, indices, indptr), shape=self.shape)

    # -- elementwise / scalar (zero-preserving; ref sparse.jl:2261-2569) -------
    def _nnz_mask(self):
        """Device (S, NNZpad) validity mask over nzval slots."""
        from .cache import cached_plan

        st = self.structure

        def build():
            m = np.arange(st.NNZpad)[None, :] < st.nnz_local[:, None]
            return jax.device_put(m, self.backend.row_sharding())

        return cached_plan("masks", ("nnzmask", st.hash, self.backend.key),
                           build)

    def _map_nz(self, fn, zero_preserving: bool = True) -> "DistSparseMatrix":
        out = fn(self.nzval)
        if not zero_preserving:
            out = jnp.where(self._nnz_mask(), out, jnp.zeros((), out.dtype))
        return self.with_values(out)

    def __mul__(self, o):
        if np.isscalar(o) or isinstance(o, (int, float, complex)):
            from .vector import _finite_scalar

            return self._map_nz(lambda v: v * o,
                                zero_preserving=_finite_scalar(o))
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, o):
        if np.isscalar(o) or isinstance(o, (int, float, complex)):
            from .vector import _finite_scalar

            return self._map_nz(lambda v: v / o,
                                zero_preserving=_finite_scalar(o) and o != 0)
        return NotImplemented

    def __neg__(self):
        return self._map_nz(jnp.negative)

    def conj(self):
        return self._map_nz(jnp.conj)

    def real(self):
        return self._map_nz(jnp.real)

    def imag(self):
        return self._map_nz(jnp.imag)

    def __abs__(self):
        return self._map_nz(jnp.abs)

    def abs(self):
        return self.__abs__()

    def abs2(self):
        """|a|^2 on stored values, real result (ref sparse.jl:2488-2569)."""
        return self._map_nz(lambda v: jnp.real(v * jnp.conj(v)))

    def floor(self):
        return self._map_nz(jnp.floor)

    def ceil(self):
        return self._map_nz(jnp.ceil)

    def round(self):
        return self._map_nz(jnp.round)

    def map_nonzeros(self, fn, zero_preserving: bool = True) -> "DistSparseMatrix":
        """Zero-preserving elementwise map over stored values (ref: map/abs/
        real/..., sparse.jl:2488-2569). Padding slots must stay zero, so a
        non-zero-preserving fn is masked back to zero on padding."""
        out = fn(self.nzval)
        if not zero_preserving:
            valid = self.structure.row_ids_dev < self.structure.Lrow
            out = jnp.where(valid, out, jnp.zeros((), out.dtype))
        return self.with_values(out)

    # -- operators --------------------------------------------------------------
    def __matmul__(self, o):
        from .vector import DistVector
        from .dense import DistDenseMatrix
        from .lazy import LazyTranspose
        from .ops import spmv, spgemm, mixed

        if isinstance(o, DistVector):
            return spmv.matvec(self, o)
        if isinstance(o, DistSparseMatrix):
            return spgemm.spgemm(self, o)
        if isinstance(o, LazyTranspose):
            return spgemm.spgemm(self, o.materialize())
        if isinstance(o, DistDenseMatrix):
            return mixed.sparse_times_dense(self, o)
        return NotImplemented

    def __add__(self, o):
        from .lazy import LazyTranspose
        from .ops import addition

        if isinstance(o, LazyTranspose):
            o = o.materialize()  # A + Bᵀ (ref sparse.jl:1405 via transpose)
        if isinstance(o, DistSparseMatrix):
            return addition.add(self, o, 1, 1)
        return NotImplemented

    def __sub__(self, o):
        from .lazy import LazyTranspose
        from .ops import addition

        if isinstance(o, LazyTranspose):
            o = o.materialize()
        if isinstance(o, DistSparseMatrix):
            return addition.add(self, o, 1, -1)
        return NotImplemented

    def add_identity(self, lam=1.0) -> "DistSparseMatrix":
        """A + lam*I (ref: IdentityAdditionPlan, sparse.jl:3704-4060)."""
        from .ops import addition

        return addition.add_identity(self, lam)

    @property
    def T(self):
        from .lazy import LazyTranspose

        return LazyTranspose(self)

    @property
    def H(self):
        """Adjoint (conjugate transpose), lazy (ref: adjoint, sparse.jl:2261)."""
        from .lazy import LazyTranspose

        return LazyTranspose(self.conj())

    def transpose_materialized(self) -> "DistSparseMatrix":
        from .ops import transpose

        return transpose.materialize_transpose(self)

    # -- reductions & structural API (ref sparse.jl:2172-3605) -------------------
    def norm(self, p=2):
        """Elementwise (Frobenius for p=2) norm, ref sparse.jl:2172."""
        if p == 2:
            return jnp.sqrt(jnp.sum(jnp.abs(self.nzval) ** 2))
        if p == 1:
            return jnp.sum(jnp.abs(self.nzval))
        if p == np.inf:
            return jnp.max(jnp.abs(self.nzval))
        return jnp.sum(jnp.abs(self.nzval) ** p) ** (1.0 / p)

    def opnorm(self, p=np.inf):
        """Induced 1/inf norms (ref sparse.jl:2203-2244)."""
        from .ops import reductions

        if p == np.inf:
            return reductions.row_abs_sum(self).max()
        if p == 1:
            return reductions.col_abs_sum(self).max()
        raise ValueError("opnorm supports p=1 and p=inf")

    def sum(self, axis=None):
        from .ops import reductions

        if axis is None:
            return jnp.sum(self.nzval)
        if axis == 1:
            return reductions.row_sum(self)
        if axis == 0:
            return reductions.col_sum(self)
        raise ValueError("axis must be None, 0 or 1")

    def tr(self):
        """Trace (ref sparse.jl:2723)."""
        from .ops import reductions

        return reductions.trace(self)

    def maximum(self):
        """Max over all entries incl. implicit zeros (ref sparse.jl:2650)."""
        from .ops import reductions

        return reductions.maximum(self)

    def minimum(self):
        from .ops import reductions

        return reductions.minimum(self)

    def mean(self):
        """Mean over all m*n entries (ref sparse.jl:2678)."""
        from .ops import reductions

        return reductions.mean(self)

    def diag(self, k: int = 0):
        from .ops import diagonal

        return diagonal.diag(self, k)

    def triu(self, k: int = 0) -> "DistSparseMatrix":
        from .ops import diagonal

        return diagonal.triu(self, k)

    def tril(self, k: int = 0) -> "DistSparseMatrix":
        from .ops import diagonal

        return diagonal.tril(self, k)

    def dropzeros(self, tol: float = 0.0) -> "DistSparseMatrix":
        from .ops import diagonal

        return diagonal.dropzeros(self, tol)

    def issymmetric(self) -> bool:
        """Distributed symmetry check (ref: HPCLinearAlgebra.jl:391-618).
        Structure is replicated so the pattern check is local; the value
        check compares nzval against the materialized transpose's."""
        if self._issym is None:
            if self.m != self.ncols:
                self._issym = False
            else:
                At = self.transpose_materialized()
                if At.structure.hash != self.structure.hash:
                    # patterns differ: distributed value comparison via the
                    # AdditionPlan (ref does a distributed row comparison,
                    # HPCLinearAlgebra.jl:391-618) — no host gather; padding
                    # is zero so a device max-abs readback decides
                    D = self - At
                    nz = D.nzval
                    self._issym = (not nz.size) or bool(
                        jnp.max(jnp.abs(nz)) == 0)
                else:
                    self._issym = bool(
                        jnp.all(self.nzval == At.nzval).item()
                    )
        return self._issym

    def repartition(self, new_row_partition: np.ndarray) -> "DistSparseMatrix":
        from .ops import sparse_repartition

        return sparse_repartition.repartition_sparse(self, new_row_partition)

    def __getitem__(self, key):
        from .ops import sparse_index

        return sparse_index.sparse_getindex(self, key)

    def __setitem__(self, key, value):
        from .ops import setindex

        setindex.sparse_setindex(self, key, value)

    def __repr__(self):
        return (f"DistSparseMatrix(shape={self.shape}, nnz={self.nnz()}, "
                f"shards={self.backend.nshards}, dtype={self.dtype})")

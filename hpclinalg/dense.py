"""DistDenseMatrix: the distributed row-partitioned dense matrix.

TPU-native analogue of ``HPCMatrix`` (/root/reference/src/dense.jl:59):
local block is (local_nrows, ncols_global), stored stacked as (S, Lrow,
ncols) sharded P("rows", None, None). Dense compute is where XLA already
does the work: matvec gathers x (DenseMatrixVectorPlan, dense.jl:397-658),
transpose-matvec computes local partials then reduces (Allreduce ->
psum; DenseTransposeVectorPlan, dense.jl:1000-1261), and transpose is a
resharding (DenseTransposePlan, dense.jl:690-978).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .backend import Backend, resolve_dtype
from .hashing import dense_structural_hash, partition_hash
from .parallel.mesh import allgather_full, gather_to_host
from .partition import (
    nshards_of,
    padded_size,
    partition_sizes,
    shard_mask,
    uniform_partition,
    validate_partition,
)


class DistDenseMatrix:
    """Distributed dense matrix (ref: HPCMatrix, dense.jl:59)."""

    __array_priority__ = 110

    def __init__(self, data: jax.Array, row_partition: np.ndarray, ncols: int,
                 backend: Backend, col_partition: np.ndarray | None = None):
        self.backend = backend
        self.row_partition = validate_partition(row_partition)
        self.ncols = int(ncols)
        self.data = data  # (S, Lrow, ncols), padding rows zero
        self.col_partition = (validate_partition(col_partition, ncols)
                              if col_partition is not None
                              else uniform_partition(ncols, backend.nshards))
        assert data.ndim == 3 and data.shape[2] == self.ncols

    # -- metadata ---------------------------------------------------------
    @property
    def m(self) -> int:
        return int(self.row_partition[-1])

    @property
    def shape(self):
        return (self.m, self.ncols)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def row_partition_hash(self) -> str:
        return partition_hash(self.row_partition)

    @property
    def hash(self) -> str:
        """Ref: compute_dense_structural_hash (dense.jl:12-34)."""
        return dense_structural_hash(self.row_partition, self.ncols)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_global(arr, backend: Backend, row_partition=None, dtype=None):
        """Ref global ctor (dense.jl:185)."""
        arr = np.asarray(arr)
        backend.check_dtype(dtype or arr.dtype)
        m, n = arr.shape
        rp = (validate_partition(row_partition, m) if row_partition is not None
              else uniform_partition(m, backend.nshards))
        L = padded_size(rp)
        S = nshards_of(rp)
        out = np.zeros((S, L, n), dtype=resolve_dtype(backend, arr.dtype, dtype))
        for s in range(S):
            out[s, : rp[s + 1] - rp[s]] = arr[rp[s]: rp[s + 1]]
        return DistDenseMatrix(jax.device_put(out, backend.row_sharding(1)),
                               rp, n, backend)

    @staticmethod
    def from_local(shards: list[np.ndarray], backend: Backend, dtype=None):
        """Ref: HPCMatrix_local (dense.jl:125)."""
        backend.check_dtype(dtype or np.result_type(*shards))
        sizes = [s.shape[0] for s in shards]
        n = shards[0].shape[1]
        rp = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        L = padded_size(rp)
        out = np.zeros((len(shards), L, n),
                       dtype=resolve_dtype(backend, np.result_type(*shards), dtype))
        for s, blk in enumerate(shards):
            out[s, : sizes[s]] = blk
        return DistDenseMatrix(jax.device_put(out, backend.row_sharding(1)),
                               rp, n, backend)

    @staticmethod
    def zeros(m: int, n: int, backend: Backend, row_partition=None, dtype=None):
        rp = (validate_partition(row_partition, m) if row_partition is not None
              else uniform_partition(m, backend.nshards))
        data = jnp.zeros((nshards_of(rp), padded_size(rp), n),
                         dtype=dtype or backend.dtype)
        return DistDenseMatrix(jax.device_put(data, backend.row_sharding(1)),
                               rp, n, backend)

    def to_numpy(self) -> np.ndarray:
        """Ref converter Matrix() (HPCLinearAlgebra.jl:871-930)."""
        return gather_to_host(self.data, self.row_partition)

    # uncached here, so read-only and writable paths coincide
    to_numpy_ro = to_numpy

    def _like(self, data):
        return DistDenseMatrix(data, self.row_partition, self.ncols,
                               self.backend, self.col_partition)

    def _mask3(self):
        from .vector import _mask_dev

        return _mask_dev(self.row_partition, self.data.shape[1], self.backend)[..., None]

    # -- elementwise / scalar (ref dense.jl:1317-1346, 1818-1851) -------------
    def _check_same_shape(self, o):
        if o.shape != self.shape:
            raise ValueError(
                f"dimension mismatch: {self.shape} vs {o.shape}")

    def __add__(self, o):
        if isinstance(o, DistDenseMatrix):
            self._check_same_shape(o)
            o = o.repartition(self.row_partition)
            return self._like(self.data + o.data)
        return self.map(lambda d: d + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, DistDenseMatrix):
            self._check_same_shape(o)
            o = o.repartition(self.row_partition)
            return self._like(self.data - o.data)
        return self.map(lambda d: d - o)

    def __rsub__(self, o):
        return self.map(lambda d: o - d)

    def __mul__(self, o):
        if np.isscalar(o) or isinstance(o, (int, float, complex)):
            from .vector import _finite_scalar

            return self.map(lambda d: d * o,
                            zero_preserving=_finite_scalar(o))
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, o):
        if np.isscalar(o) or isinstance(o, (int, float, complex)):
            from .vector import _finite_scalar

            return self.map(lambda d: d / o,
                            zero_preserving=_finite_scalar(o) and o != 0)
        return NotImplemented

    def __neg__(self):
        return self._like(-self.data)

    def map(self, fn, zero_preserving: bool = False):
        out = fn(self.data)
        if not zero_preserving:
            out = jnp.where(self._mask3(), out, jnp.zeros((), out.dtype))
        return self._like(out)

    def conj(self):
        return self._like(jnp.conj(self.data))

    def real(self):
        return self._like(jnp.real(self.data))

    def imag(self):
        return self._like(jnp.imag(self.data))

    def __abs__(self):
        return self._like(jnp.abs(self.data))

    # -- multiply (ref: DenseMatrixVectorPlan dense.jl:397-658) ----------------
    def __matmul__(self, o):
        from .vector import DistVector
        from .lazy import LazyTranspose
        from .sparse import DistSparseMatrix

        if isinstance(o, DistVector):
            return self.matvec(o)
        if isinstance(o, DistDenseMatrix):
            return self.matmat(o)
        if isinstance(o, DistSparseMatrix):
            from .ops.mixed import dense_times_sparse

            return dense_times_sparse(self, o)
        if isinstance(o, LazyTranspose):
            return self.matmat(o.materialize())
        return NotImplemented

    def matvec(self, x):
        from .vector import DistVector

        if len(x) != self.ncols:
            raise ValueError("dimension mismatch")
        xf = allgather_full(x.data, x.partition, self.backend)  # (n,)
        y = _dense_matvec(self.data, xf)
        return DistVector(y, self.row_partition, self.backend)

    def rmatvec(self, x):
        """transpose(A) @ x without materializing Aᵀ: local partials +
        psum, sliced onto col_partition (ref: DenseTransposeVectorPlan,
        dense.jl:1000-1261)."""
        from .vector import DistVector

        if len(x) != self.m:
            raise ValueError("dimension mismatch")
        if not np.array_equal(x.partition, self.row_partition):
            x = x.repartition(self.row_partition)
        full = _dense_rmatvec(self.data, x.data)  # (ncols,) replicated
        from .parallel.mesh import scatter_from_full

        return DistVector(scatter_from_full(full, self.col_partition,
                                            self.backend),
                          self.col_partition, self.backend)

    def matmat(self, B: "DistDenseMatrix") -> "DistDenseMatrix":
        if self.ncols != B.m:
            raise ValueError("dimension mismatch")
        Bf = allgather_full(B.data, B.row_partition, self.backend)  # (n, k)
        C = _dense_matmat(self.data, Bf)
        return DistDenseMatrix(C, self.row_partition, B.ncols, self.backend)

    @property
    def T(self):
        from .lazy import LazyTranspose

        return LazyTranspose(self)

    @property
    def H(self):
        """Adjoint (ref: adjoint handling, dense.jl:952-982)."""
        from .lazy import LazyTranspose

        return LazyTranspose(self.conj())

    def transpose_materialized(self) -> "DistDenseMatrix":
        """Materialized Aᵀ over col_partition — a block-cyclic device
        exchange, the analogue of DenseTransposePlan's pack/transpose/unpack
        (ref dense.jl:690-978): each shard slices its column window per
        destination, one all_to_all moves the blocks, and a static take
        reassembles the transposed rows."""
        from .parallel.dense_transpose import dense_transpose

        return dense_transpose(self)

    # -- reductions (ref dense.jl:1367-1454) ------------------------------------
    def sum(self, axis=None):
        if axis is None:
            return jnp.sum(self.data)
        if axis == 0:
            return jnp.sum(self.data, axis=(0, 1))  # replicated (ncols,)
        if axis == 1:
            from .vector import DistVector

            return DistVector(jnp.sum(self.data, axis=2), self.row_partition,
                              self.backend)
        raise ValueError("axis must be None, 0 or 1")

    def norm(self, p=2):
        if p == 2:
            return jnp.sqrt(jnp.sum(jnp.abs(self.data) ** 2))
        if p == 1:
            return jnp.sum(jnp.abs(self.data))
        if p == np.inf:
            return jnp.max(jnp.abs(self.data))
        return jnp.sum(jnp.abs(self.data) ** p) ** (1.0 / p)

    def opnorm(self, p=np.inf):
        if p == np.inf:
            return jnp.max(jnp.sum(jnp.abs(self.data), axis=2))
        if p == 1:
            return jnp.max(jnp.sum(jnp.abs(self.data), axis=(0, 1)))
        raise ValueError("opnorm supports p=1 and p=inf")

    def mapslices(self, fn, axis=1):
        """Slice-wise function application (ref: mapslices, dense.jl:1476).
        ``axis=1`` maps rows (distributed, via map_rows); ``axis=0`` maps
        columns — columns span shards, so the matrix is gathered replicated
        on device, fn vmapped over columns, and the (kout, n) result
        redistributed by rows (mirroring the reference's gather-based
        dims=1 path)."""
        from .ops.map_rows import map_rows

        if axis == 1:
            return map_rows(fn, self)
        if axis != 0:
            raise ValueError("axis must be 0 (columns) or 1 (rows)")
        from .parallel.mesh import allgather_full

        full = allgather_full(self.data, self.row_partition,
                              self.backend)          # (m, ncols) replicated
        out = jax.vmap(fn, in_axes=1, out_axes=1)(full)
        if out.ndim == 1:
            out = out[None, :]
        return DistDenseMatrix.from_global(np.asarray(out), self.backend,
                                           dtype=out.dtype)

    def repartition(self, new_partition):
        from .ops.repartition import repartition_dense

        return repartition_dense(self, new_partition)

    def __getitem__(self, key):
        from .ops.dense_index import dense_getindex

        return dense_getindex(self, key)

    def __setitem__(self, key, value):
        from .ops.setindex import dense_setindex

        dense_setindex(self, key, value)

    def __repr__(self):
        return (f"DistDenseMatrix(shape={self.shape}, shards="
                f"{self.backend.nshards}, dtype={self.dtype})")


@jax.jit
def _dense_matvec(data, xf):
    return jnp.einsum("slc,c->sl", data, xf)


@jax.jit
def _dense_rmatvec(data, xdata):
    # conj-free transpose product: sum_s A_s^T x_s (padding rows are zero on
    # both sides, so they contribute nothing)
    return jnp.einsum("slc,sl->c", data, xdata)


@jax.jit
def _dense_matmat(data, Bf):
    return jnp.einsum("slc,ck->slk", data, Bf)

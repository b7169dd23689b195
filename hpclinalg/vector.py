"""DistVector: the distributed dense vector.

TPU-native analogue of ``HPCVector`` (/root/reference/src/vectors.jl:21-30):
row-partitioned over the mesh, stored as one stacked-shard JAX array of
static shape (S, L) sharded ``P("rows", None)``, with the padding region
kept identically zero (the padding invariant). All elementwise arithmetic
and reductions run as plain jitted ops on the sharded array — XLA inserts
the psum that the reference performs explicitly via Allreduce
(vectors.jl:758-857).

Binary ops align mismatched partitions by repartitioning the right operand
to the left's partition, as the reference does (vectors.jl:868-876, dot at
:798, broadcasting at :1093-1226).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .backend import Backend, backends_compatible, resolve_dtype
from .cache import cached_plan
from .hashing import partition_hash
from .partition import (
    nshards_of,
    padded_size,
    partition_sizes,
    shard_mask,
    uniform_partition,
    validate_partition,
)
from .parallel.mesh import gather_to_host


def _mask_dev(partition: np.ndarray, L: int, backend: Backend) -> jax.Array:
    """Device (S, L) bool validity mask, cached per (partition, L, backend)."""
    key = ("mask", partition_hash(partition), L, backend.key)
    return cached_plan(
        "masks", key,
        lambda: jax.device_put(shard_mask(partition, L), backend.row_sharding()),
    )


@jax.jit
def _where_mask(mask, a, fill):
    return jnp.where(mask, a, fill)


def _finite_scalar(o) -> bool:
    """True when scalar-multiplying by ``o`` preserves zeros (finite o):
    a non-finite scalar writes 0*inf = NaN into the padding region and
    poisons whole-array reductions (the padding invariant)."""
    try:
        return bool(np.isfinite(o))
    except Exception:
        return False


class DistVector:
    """Distributed dense vector (ref: HPCVector, vectors.jl:21)."""

    __array_priority__ = 100  # beat numpy in mixed operators

    def __init__(self, data: jax.Array, partition: np.ndarray, backend: Backend):
        self.backend = backend
        self.partition = validate_partition(partition)
        self._lazy_stacked = None
        self._lazy_full = None
        self.data = data  # (S, L), padding zero
        assert data.ndim == 2 and data.shape[0] == backend.nshards
        self._phash: str | None = None

    # -- deferred device residency ----------------------------------------
    # Solver returns stage the solution on host and push to device only on
    # first .data use: the reference's MUMPS path likewise leaves the
    # scattered solution on the ranks' hosts (mumps_factorization.jl:
    # 338-353) — device residency is a TPU-side addition that a host-only
    # consumer (to_numpy, residual checks, another solve) never needs to
    # pay the relay transfer for.
    @property
    def data(self):
        if self._data is None:
            self._data = jax.device_put(self._lazy_stacked,
                                        self.backend.row_sharding())
            self._lazy_stacked = None  # _lazy_full stays valid (immutable)
        return self._data

    @data.setter
    def data(self, value):
        self._data = value
        if value is not None:
            self._lazy_stacked = None
            self._lazy_full = None

    # -- identity ----------------------------------------------------------
    @property
    def partition_hash(self) -> str:
        if self._phash is None:
            self._phash = partition_hash(self.partition)
        return self._phash

    @property
    def n(self) -> int:
        return int(self.partition[-1])

    def __len__(self) -> int:
        return self.n

    @property
    def shape(self):
        return (self.n,)

    @property
    def dtype(self):
        src = self._data if self._data is not None else self._lazy_stacked
        return src.dtype

    @property
    def L(self) -> int:
        src = self._data if self._data is not None else self._lazy_stacked
        return int(src.shape[1])

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_global(arr, backend: Backend, partition: np.ndarray | None = None,
                    dtype=None) -> "DistVector":
        """Build from a replicated full array (ref global ctor, vectors.jl:119).
        Complex input on a complex-incapable platform returns the
        split-plane ComplexDistVector (cplx.py) transparently."""
        arr = np.asarray(arr)
        if np.issubdtype(np.dtype(dtype or arr.dtype), np.complexfloating) \
                and not backend.complex_capable:
            from .cplx import ComplexDistVector

            return ComplexDistVector.from_global(arr, backend,
                                                 partition=partition,
                                                 dtype=dtype)
        backend.check_dtype(dtype or arr.dtype)
        n = arr.shape[0]
        p = validate_partition(partition, n) if partition is not None else uniform_partition(n, backend.nshards)
        L = padded_size(p)
        S = nshards_of(p)
        out = np.zeros((S, L), dtype=resolve_dtype(backend, arr.dtype, dtype))
        sizes = partition_sizes(p)
        for s in range(S):
            out[s, : sizes[s]] = arr[p[s]: p[s + 1]]
        return DistVector(jax.device_put(out, backend.row_sharding()), p, backend)

    @staticmethod
    def from_global_deferred(arr, backend: Backend,
                             partition: np.ndarray | None = None,
                             dtype=None) -> "DistVector":
        """from_global with DEFERRED device residency: the (S, L) staging
        stays on host and is pushed by the first ``.data`` access. Host
        consumers (to_numpy, solver residuals) never pay the transfer.
        Internal fast path for solver returns."""
        arr = np.asarray(arr)
        if np.issubdtype(np.dtype(dtype or arr.dtype), np.complexfloating) \
                and not backend.complex_capable:
            return DistVector.from_global(arr, backend, partition=partition,
                                          dtype=dtype)
        backend.check_dtype(dtype or arr.dtype)
        n = arr.shape[0]
        p = validate_partition(partition, n) if partition is not None \
            else uniform_partition(n, backend.nshards)
        L = padded_size(p)
        S = nshards_of(p)
        dt = resolve_dtype(backend, arr.dtype, dtype)
        out = np.zeros((S, L), dtype=dt)
        sizes = partition_sizes(p)
        for s in range(S):
            out[s, : sizes[s]] = arr[p[s]: p[s + 1]]
        v = object.__new__(DistVector)
        v.backend = backend
        v.partition = p
        v._phash = None
        v._data = None
        v._lazy_stacked = out
        full = arr.astype(dt, copy=not arr.flags.owndata)
        full.setflags(write=False)
        v._lazy_full = full
        return v

    @staticmethod
    def from_local(shards: list[np.ndarray], backend: Backend, dtype=None) -> "DistVector":
        """Build from per-shard local arrays (ref: HPCVector_local, vectors.jl:76)."""
        backend.check_dtype(dtype or np.result_type(*shards))
        sizes = [int(np.asarray(s).shape[0]) for s in shards]
        p = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        L = padded_size(p)
        out = np.zeros((len(shards), L),
                       dtype=resolve_dtype(backend, np.result_type(*shards), dtype))
        for s, v in enumerate(shards):
            out[s, : sizes[s]] = np.asarray(v)
        return DistVector(jax.device_put(out, backend.row_sharding()), p, backend)

    @staticmethod
    def ones(n: int, backend: Backend, partition=None, dtype=None) -> "DistVector":
        return DistVector.from_global(np.ones(n), backend, partition=partition,
                                      dtype=dtype)

    @staticmethod
    def full(n: int, value, backend: Backend, partition=None, dtype=None) -> "DistVector":
        return DistVector.from_global(np.full(n, value), backend,
                                      partition=partition, dtype=dtype)

    @staticmethod
    def rand(n: int, backend: Backend, partition=None, dtype=None, seed=0) -> "DistVector":
        return DistVector.from_global(
            np.random.default_rng(seed).standard_normal(n), backend,
            partition=partition, dtype=dtype)

    @staticmethod
    def zeros(n: int, backend: Backend, partition=None, dtype=None) -> "DistVector":
        p = validate_partition(partition, n) if partition is not None else uniform_partition(n, backend.nshards)
        L = padded_size(p)
        data = jnp.zeros((nshards_of(p), L), dtype=dtype or backend.dtype)
        return DistVector(jax.device_put(data, backend.row_sharding()), p, backend)

    def to_numpy(self) -> np.ndarray:
        """Gather the full vector to host (ref converter Vector(),
        HPCLinearAlgebra.jl:817-870). Returns a WRITABLE copy — users
        commonly do ``x = F.solve(b); x += dx``. The device gather itself is
        cached read-only (see to_numpy_ro); the host memcpy per call is cheap
        next to the relay round-trip the cache saves.

        Extended-precision solves on f32-only platforms attach the
        double-f32 pair as ``_ext_pair``; combine it in f64 on host so the
        returned array keeps the extended accuracy (collapsing to one f32
        would re-lose everything below ~1e-7)."""
        pair = getattr(self, "_ext_pair", None)
        if pair is not None:
            xh, xl = pair
            hi = DistVector(xh, self.partition, self.backend)
            lo = DistVector(xl, self.partition, self.backend)
            return hi.to_numpy_ro().astype(np.float64) + \
                lo.to_numpy_ro().astype(np.float64)
        return self.to_numpy_ro().copy()

    def to_numpy_ro(self) -> np.ndarray:
        """Read-only cached gather — internal fast path for callers that only
        read (converters, solver RHS staging). Cached per device buffer — jax
        arrays are immutable, and in-place setindex swaps ``self.data``, so
        the identity check stays sound."""
        if self._lazy_full is not None:
            return self._lazy_full
        cached = getattr(self, "_host_cache", None)
        if cached is not None and cached[0] is self.data:
            return cached[1]
        arr = gather_to_host(self.data, self.partition)
        # read-only: mutation would poison later cached reads
        arr.setflags(write=False)
        self._host_cache = (self.data, arr)
        return arr

    # -- helpers -------------------------------------------------------------
    def _like(self, data) -> "DistVector":
        v = DistVector(data, self.partition, self.backend)
        v._phash = self._phash
        return v

    def mask(self) -> jax.Array:
        return _mask_dev(self.partition, self.L, self.backend)

    def _aligned(self, other: "DistVector") -> "DistVector":
        if not backends_compatible(self.backend, other.backend):
            raise ValueError("incompatible backends")
        if other.partition_hash == self.partition_hash:
            return other
        from .ops.repartition import repartition_vector
        return repartition_vector(other, self.partition)

    def map(self, fn: Callable, zero_preserving: bool = False) -> "DistVector":
        """Elementwise map (ref: abs/real/imag/conj & broadcast machinery,
        vectors.jl:1019-1226). Non-zero-preserving maps re-zero the padding."""
        out = fn(self.data)
        if not zero_preserving:
            out = _where_mask(self.mask(), out, jnp.zeros((), out.dtype))
        return DistVector(out, self.partition, self.backend)

    @staticmethod
    def bmap(fn: Callable, *vs: "DistVector", zero_preserving: bool = False) -> "DistVector":
        """Aligned multi-operand elementwise map (broadcasting analogue)."""
        v0 = vs[0]
        rest = [v0._aligned(v) for v in vs[1:]]
        out = fn(v0.data, *[r.data for r in rest])
        if not zero_preserving:
            out = _where_mask(v0.mask(), out, jnp.zeros((), out.dtype))
        return DistVector(out, v0.partition, v0.backend)

    # -- arithmetic ------------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, DistVector):
            return DistVector.bmap(jnp.add, self, o, zero_preserving=True)
        return self.map(lambda d: d + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, DistVector):
            return DistVector.bmap(jnp.subtract, self, o, zero_preserving=True)
        return self.map(lambda d: d - o)

    def __rsub__(self, o):
        return self.map(lambda d: o - d)

    def __mul__(self, o):
        if isinstance(o, DistVector):
            return DistVector.bmap(jnp.multiply, self, o, zero_preserving=True)
        return self.map(lambda d: d * o, zero_preserving=_finite_scalar(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, DistVector):
            return DistVector.bmap(jnp.divide, self, o)
        return self.map(lambda d: d / o,
                        zero_preserving=_finite_scalar(o) and o != 0)

    def __rtruediv__(self, o):
        return self.map(lambda d: o / d)

    def __pow__(self, e):
        return self.map(lambda d: d ** e, zero_preserving=(e > 0))

    def __neg__(self):
        return self._like(-self.data)

    def __abs__(self):
        return self._like(jnp.abs(self.data))

    def abs(self):
        return self.__abs__()

    def abs2(self):
        """|x|^2 elementwise, real result (ref: abs2, test_sparse_api)."""
        return self._like(jnp.real(self.data * jnp.conj(self.data)))

    def floor(self):
        return self._like(jnp.floor(self.data))

    def ceil(self):
        return self._like(jnp.ceil(self.data))

    def round(self):
        return self._like(jnp.round(self.data))

    def real(self):
        return self._like(jnp.real(self.data))

    def imag(self):
        return self._like(jnp.imag(self.data))

    def conj(self):
        return self._like(jnp.conj(self.data))

    # -- reductions (ref: vectors.jl:758-857) ---------------------------------
    def dot(self, other: "DistVector"):
        """conj(self)' * other, Julia ``dot`` convention (vectors.jl:798)."""
        o = self._aligned(other)
        return jnp.vdot(self.data, o.data)

    def norm(self, p=2):
        if p == 2:
            return jnp.sqrt(jnp.sum(jnp.abs(self.data) ** 2))
        if p == 1:
            return jnp.sum(jnp.abs(self.data))
        if p == np.inf:
            return jnp.max(jnp.abs(self.data))
        return jnp.sum(jnp.abs(self.data) ** p) ** (1.0 / p)

    def sum(self):
        return jnp.sum(self.data)

    def mean(self):
        return jnp.sum(self.data) / self.n

    def max(self):
        fill = jnp.asarray(-jnp.inf, self.dtype) if jnp.issubdtype(self.dtype, jnp.floating) \
            else jnp.iinfo(self.dtype).min
        return jnp.max(_where_mask(self.mask(), self.data, fill))

    def min(self):
        fill = jnp.asarray(jnp.inf, self.dtype) if jnp.issubdtype(self.dtype, jnp.floating) \
            else jnp.iinfo(self.dtype).max
        return jnp.min(_where_mask(self.mask(), self.data, fill))

    @property
    def T(self):
        """Row vector, transpose(v) (ref: vectors.jl:738) — enables
        ``v.T @ A``, ``v.T @ w`` and right division ``v.T / A``."""
        from .lazy import LazyTranspose

        return LazyTranspose(self)

    @property
    def H(self):
        """Conjugated row vector, v' (ref: adjoint handling alongside
        vectors.jl:738) — ``v.H @ A`` and ``v.H @ w`` (the latter is the
        sesquilinear inner product)."""
        from .lazy import LazyTranspose

        return LazyTranspose(self.conj())

    # -- structure ops ---------------------------------------------------------
    def repartition(self, new_partition: np.ndarray) -> "DistVector":
        from .ops.repartition import repartition_vector
        return repartition_vector(self, new_partition)

    def __getitem__(self, key):
        from .ops.indexing import vector_getindex
        return vector_getindex(self, key)

    def __setitem__(self, key, value):
        from .ops.indexing import vector_setindex
        vector_setindex(self, key, value)

    def __repr__(self):
        return (f"DistVector(n={self.n}, shards={self.backend.nshards}, "
                f"dtype={self.dtype}, partition={self.partition.tolist()})")

"""Backend: the mesh/dtype/solver configuration object.

TPU-native replacement for the reference's ``HPCBackend{T,Ti,Device,Comm,
Solver}`` (/root/reference/src/backends.jl:137) and its ``AbstractComm``
layer (backends.jl:196-327). The MPI communicator becomes a 1-D
``jax.sharding.Mesh`` over the ``"rows"`` axis; the serial no-op comm
(``CommSerial``) becomes a 1-device mesh; device selection (CPU/Metal/CUDA)
becomes JAX platform selection (tpu / cpu). All collectives are XLA
collectives inside ``shard_map`` — there is no send/recv tag discipline to
maintain (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import cached_property
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "rows"


@dataclass(frozen=True)
class Backend:
    """Configuration: device mesh + element dtype + index dtype + solver.

    ``mesh`` is always 1-D over axis "rows"; ``nshards == mesh.size`` plays
    the role of the reference's MPI world size. Generalizing to 2-D meshes is
    a layout change confined to this module.
    """

    mesh: Mesh
    dtype: Any = np.float64
    index_dtype: Any = np.int32
    solver: str = "multifrontal"

    def __post_init__(self):
        if self.mesh.axis_names != (AXIS,):
            raise ValueError(f"backend mesh must be 1-D over axis {AXIS!r}")

    @property
    def nshards(self) -> int:
        return int(self.mesh.size)

    @property
    def complex_capable(self) -> bool:
        """Whether the platform can hold complex dtypes at all. The current
        TPU generation cannot even device_put complex64 (runtime
        UNIMPLEMENTED); complex solves there go through the realified 2n
        real form (solver/complexify.py)."""
        return self.mesh.devices.flat[0].platform == "cpu"

    @cached_property
    def key(self) -> tuple:
        """Hashable identity for plan-cache keys. Device ids are only
        unique per platform (CpuDevice and TpuDevice ids both start at 0),
        so the platform is part of the identity."""
        dev = tuple((d.platform, d.id) for d in self.mesh.devices.flat)
        return (dev, np.dtype(self.dtype).str, np.dtype(self.index_dtype).str)

    def check_dtype(self, dtype) -> None:
        """Raise early (with guidance) for dtypes the platform cannot hold —
        the runtime's own failure is a cryptic device_put UNIMPLEMENTED.
        (Container constructors route complex dtypes to the split-plane
        containers in cplx.py before reaching this check; hitting it means
        a raw complex device array was requested directly.)"""
        if np.issubdtype(np.dtype(dtype), np.complexfloating) \
                and not self.complex_capable:
            raise NotImplementedError(
                "this TPU runtime cannot represent complex dtypes as raw "
                "device arrays; complex containers are provided by the "
                "split-plane classes in hpclinalg.cplx (constructors "
                "DistVector.from_global / DistSparseMatrix.from_scipy "
                "return them automatically for complex inputs)")

    def row_sharding(self, extra_dims: int = 0) -> NamedSharding:
        """Sharding for stacked-shard arrays (S, local, ...): axis 0 over rows."""
        return NamedSharding(self.mesh, P(AXIS, *([None] * (extra_dims + 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def with_dtype(self, dtype) -> "Backend":
        """Ref: retype_backend (backends.jl:482)."""
        return replace(self, dtype=dtype)


def resolve_dtype(backend: Backend, src_dtype, dtype) -> np.dtype:
    """Allocation dtype for container constructors: an explicit ``dtype``
    wins; otherwise the backend default, promoted to complex when the
    SOURCE data is complex — a complex input must never silently drop its
    imaginary part by landing in the backend's real default dtype."""
    if dtype is not None:
        return np.dtype(dtype)
    dt = np.dtype(backend.dtype)
    if np.issubdtype(np.dtype(src_dtype), np.complexfloating) \
            and not np.issubdtype(dt, np.complexfloating):
        dt = np.result_type(src_dtype, dt)
    return dt


def backends_compatible(a: Backend, b: Backend) -> bool:
    """Same mesh and index dtype — operands may differ in element dtype
    (ref: backends_compatible, backends.jl:444)."""
    return a.mesh == b.mesh and np.dtype(a.index_dtype) == np.dtype(b.index_dtype)


def _make_mesh(nshards: int | None, platform: str | None) -> Mesh:
    devices = jax.devices(platform) if platform else jax.devices()
    n = nshards if nshards is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} shards but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]), (AXIS,))


def backend_auto(nshards: int | None = None, dtype=np.float64, index_dtype=np.int32,
                 solver: str = "multifrontal", platform: str | None = None) -> Backend:
    """Factory over the default platform (ref factories: backend_cpu_mpi etc.,
    backends.jl:348-432)."""
    return Backend(_make_mesh(nshards, platform), dtype, index_dtype, solver)


def backend_serial(dtype=np.float64, index_dtype=np.int32,
                   solver: str = "multifrontal") -> Backend:
    """1-device mesh — the analogue of CommSerial (backends.jl:207-327)."""
    return Backend(_make_mesh(1, None), dtype, index_dtype, solver)

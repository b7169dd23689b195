"""Backend conversion (ref: to_backend / retyping, backends.jl:482 and the
device-conversion helpers in the Metal/CUDA extensions).

On TPU there is one accelerator platform, so conversion means moving a
container to a different mesh and/or element dtype — rebuilt through the
host gather-converters (structure metadata is host-resident already)."""

from __future__ import annotations

import numpy as np


def to_backend(x, backend):
    """Return a copy of a distributed container on another Backend."""
    from ..dense import DistDenseMatrix
    from ..sparse import DistSparseMatrix
    from ..vector import DistVector

    if isinstance(x, DistVector):
        return DistVector.from_global(x.to_numpy_ro(), backend, dtype=backend.dtype)
    if isinstance(x, DistSparseMatrix):
        return DistSparseMatrix.from_scipy(x.to_scipy(), backend, dtype=backend.dtype)
    if isinstance(x, DistDenseMatrix):
        return DistDenseMatrix.from_global(x.to_numpy(), backend, dtype=backend.dtype)
    raise TypeError(f"cannot convert {type(x)} between backends")


def comm_size(backend) -> int:
    """Mesh size — the world-size analogue (ref: comm_size, backends.jl)."""
    return backend.nshards


def comm_rank() -> int:
    """Host process index (always 0 single-host; the rank analogue for
    multi-host SPMD deployments; ref: comm_rank)."""
    import jax

    return jax.process_index()


def clear_solver_caches() -> None:
    """Drop cached symbolic analyses + backslash factorizations (ref:
    clear_mumps_analysis_cache!, mumps_factorization.jl:68-88)."""
    from ..cache import clear_plan_cache

    for name in ("symbolic", "solver_perm", "backslash"):
        clear_plan_cache(name)

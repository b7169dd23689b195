"""hpclinalg — TPU-native distributed sparse/dense linear algebra.

A from-scratch rebuild of the capabilities of HPCLinearAlgebra.jl
(sloisel/LinearAlgebraMPI.jl, mounted read-only at /root/reference) on
JAX/XLA/Pallas: row-partitioned vectors, dense matrices and CSR sparse
matrices sharded over a 1-D device mesh, with the reference's memoized MPI
communication plans re-designed as host-computed static index plans
compiled into shard_map collectives, and the MUMPS/cuDSS direct solvers
replaced by a from-scratch supernodal multifrontal factorization.

See SURVEY.md at the repo root for the architecture mapping.
"""

from .backend import (
    AXIS,
    Backend,
    backend_auto,
    backend_serial,
    backends_compatible,
)
from .cache import cache_sizes, check_cache_sizes, clear_plan_cache
from .config import enable_compile_cache, enable_x64
from .hashing import dense_structural_hash, partition_hash, sparse_structural_hash
from .partition import uniform_partition
from .vector import DistVector
from .sparse import DistSparseMatrix
from .dense import DistDenseMatrix
from .cplx import (
    ComplexDistSparseMatrix,
    ComplexDistVector,
    ComplexFactorization,
)
from .lazy import LazyTranspose
from .ops.repartition import repartition_dense, repartition_vector
from .ops.sparse_build import spdiagm, speye, sprand_dist, spzeros
from .ops.blocks import (
    blockdiag,
    cat,
    cat_dense,
    cat_sparse,
    hcat_dense,
    hcat_sparse,
    vcat_dense,
    vcat_sparse,
    hcat_vectors,
    vcat_vectors,
)
from .ops.map_rows import map_rows, vertex_indices
from .solver.api import BackslashCache, Factorization, ldlt, lu, solve
from .utils.io import io0, show
from .utils.warmup import Symmetric, warmup
from .utils.profiling import annotate, profile_trace
from .utils.convert import clear_solver_caches, comm_rank, comm_size, to_backend

__all__ = [
    "AXIS", "Backend", "backend_auto", "backend_serial", "backends_compatible",
    "cache_sizes", "check_cache_sizes", "clear_plan_cache", "enable_x64",
    "enable_compile_cache",
    "partition_hash", "sparse_structural_hash", "dense_structural_hash",
    "uniform_partition", "DistVector", "DistSparseMatrix", "DistDenseMatrix",
    "ComplexDistVector", "ComplexDistSparseMatrix", "ComplexFactorization",
    "LazyTranspose", "repartition_vector", "repartition_dense",
    "spdiagm", "speye", "sprand_dist", "spzeros", "blockdiag", "cat",
    "cat_sparse", "hcat_sparse", "vcat_sparse", "cat_dense", "hcat_dense",
    "vcat_dense", "vcat_vectors", "hcat_vectors", "map_rows", "vertex_indices",
    "Factorization", "BackslashCache", "lu", "ldlt", "solve", "io0",
    "Symmetric", "warmup", "profile_trace", "annotate", "show",
    "to_backend", "comm_rank", "comm_size", "clear_solver_caches",
]

__version__ = "0.1.0"

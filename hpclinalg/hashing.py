"""Structural hashing: stable identity of partitions and sparsity patterns.

The reference computes collective Blake3 hashes (local hash -> Allgather ->
hash-of-hashes; /root/reference/src/sparse.jl:97-121, dense.jl:12-34,
HPCLinearAlgebra.jl:255) because structure metadata lives scattered across
ranks. In this TPU build all structure metadata (partitions, indptr,
col indices) is host-replicated, so hashing is purely local — blake2b over
the raw bytes — and needs no communication (SURVEY.md §2.4 "the handshake
can be computed locally without communication").

Hashes key the global plan caches (the analogue of the reference's
``_plan_cache`` family, HPCLinearAlgebra.jl:126-164).
"""

from __future__ import annotations

import hashlib

import numpy as np

DIGEST_SIZE = 16  # 128-bit; collision-safe for cache keying


def _h(*arrays: np.ndarray) -> str:
    h = hashlib.blake2b(digest_size=DIGEST_SIZE)
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(np.asarray(a.shape, dtype=np.int64).tobytes())
        h.update(a.tobytes())
    return h.hexdigest()


def partition_hash(p: np.ndarray) -> str:
    """Identity of a partition boundary vector (ref: compute_partition_hash,
    HPCLinearAlgebra.jl:255)."""
    return _h(np.asarray(p, dtype=np.int64))


def sparse_structural_hash(
    row_partition: np.ndarray,
    col_partition: np.ndarray,
    indptr: list[np.ndarray],
    col_indices: list[np.ndarray],
    colval: list[np.ndarray],
) -> str:
    """Identity of a distributed CSR structure (ref: compute_structural_hash,
    sparse.jl:97-121). Covers both partitions and the full local sparsity
    pattern of every shard."""
    h = hashlib.blake2b(digest_size=DIGEST_SIZE)
    h.update(partition_hash(row_partition).encode())
    h.update(partition_hash(col_partition).encode())
    for s in range(len(indptr)):
        h.update(_h(indptr[s], col_indices[s], colval[s]).encode())
    return h.hexdigest()


def dense_structural_hash(row_partition: np.ndarray, ncols: int) -> str:
    """Identity of a distributed dense matrix structure (ref:
    compute_dense_structural_hash, dense.jl:12-34)."""
    h = hashlib.blake2b(digest_size=DIGEST_SIZE)
    h.update(partition_hash(row_partition).encode())
    h.update(np.int64(ncols).tobytes())
    return h.hexdigest()

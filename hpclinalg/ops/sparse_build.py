"""Sparse constructors: speye, spdiagm, distributed random matrices.

Reference: spdiagm family (/root/reference/src/sparse.jl:3304-3605) with the
fast cached-structure path for the main diagonal (sparse.jl:3544,
HPCLinearAlgebra.jl:150-156).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..partition import (
    nshards_of,
    partition_sizes,
    uniform_partition,
    validate_partition,
)


def speye(n: int, backend, row_partition=None, col_partition=None, dtype=None):
    """Identity matrix with the given row partition."""
    from ..sparse import DistSparseMatrix

    rp = (validate_partition(row_partition, n) if row_partition is not None
          else uniform_partition(n, backend.nshards))
    parts = []
    for s in range(backend.nshards):
        nl = int(rp[s + 1] - rp[s])
        ip = np.arange(nl + 1, dtype=np.int64)
        gj = np.arange(rp[s], rp[s + 1], dtype=np.int64)
        parts.append((ip, gj, np.ones(nl)))
    M = DistSparseMatrix.from_local_csr(parts, n, backend,
                                        col_partition=col_partition, dtype=dtype)
    # keep the caller's row partition (from_local_csr recomputes cumsum — equal)
    return M


def spdiagm(*diags, m: int | None = None, n: int | None = None, backend=None):
    """spdiagm(k1 => v1, k2 => v2, ...) analogue: pass (k, DistVector) pairs
    (ref sparse.jl:3304/3439). Values are pulled once to host to build the
    structure; the main-diagonal single-vector case has a fast structural
    path (ref sparse.jl:3544) via build_diag below."""
    from ..sparse import DistSparseMatrix
    from ..vector import DistVector

    pairs = []
    for d in diags:
        if isinstance(d, DistVector):
            pairs.append((0, d))
        else:
            k, v = d
            pairs.append((int(k), v))
    if backend is None:
        backend = pairs[0][1].backend
    # Julia spdiagm(kv...) without explicit size returns a square matrix just
    # large enough to hold all diagonals (ref sparse.jl:3304)
    need = max(len(v) + abs(k) for k, v in pairs)
    m = m if m is not None else need
    n = n if n is not None else need

    if len(pairs) == 1 and pairs[0][0] == 0 and m == n == len(pairs[0][1]):
        return build_diag(pairs[0][1], m)

    rows, cols, vals = [], [], []
    for k, v in pairs:
        h = v.to_numpy_ro()
        i = np.arange(len(h), dtype=np.int64)
        r = i + max(0, -k)
        c = i + max(0, k)
        rows.append(r)
        cols.append(c)
        vals.append(h)
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n),
    )
    return DistSparseMatrix.from_scipy(A, backend, dtype=pairs[0][1].dtype)


def build_diag(v, n: int):
    """Fast path: diagonal matrix from a distributed vector WITHOUT host
    round-trip — the structure depends only on the partition, so it is cached
    (ref: _diag_structure_cache, HPCLinearAlgebra.jl:150-156) and the values
    are placed by a pure device reshape."""
    from ..sparse import DistSparseMatrix, SparseStructure

    backend = v.backend
    p = v.partition
    from ..hashing import partition_hash

    def build():
        indptr, col_indices, colval = [], [], []
        for s in range(backend.nshards):
            nl = int(p[s + 1] - p[s])
            indptr.append(np.arange(nl + 1, dtype=np.int64))
            col_indices.append(np.arange(p[s], p[s + 1], dtype=np.int64))
            colval.append(np.arange(nl, dtype=np.int32))
        return SparseStructure(p, p, indptr, col_indices, colval, backend)

    st = cached_plan("diag_structure", (partition_hash(p), backend.key), build)
    # v.data is (S, L) with padding zero; nzval wants (S, NNZpad) where the
    # first nnz_local[s] slots are v's first local entries — same layout when
    # L >= NNZpad slice, pad otherwise
    L, NZ = v.data.shape[1], st.NNZpad
    if L == NZ:
        nz = v.data
    elif L > NZ:
        nz = v.data[:, :NZ]
    else:
        nz = jnp.pad(v.data, ((0, 0), (0, NZ - L)))
    return DistSparseMatrix(st, nz, backend)


def spzeros(m: int, n: int, backend, row_partition=None, dtype=None):
    """All-zero sparse matrix (ref: spzeros-equivalent via zeros,
    HPCLinearAlgebra.jl:1430-1467)."""
    from ..sparse import DistSparseMatrix

    rp = (validate_partition(row_partition, m) if row_partition is not None
          else uniform_partition(m, backend.nshards))
    parts = []
    for s in range(backend.nshards):
        nl = int(rp[s + 1] - rp[s])
        parts.append((np.zeros(nl + 1, dtype=np.int64), np.zeros(0, np.int64),
                      np.zeros(0)))
    return DistSparseMatrix.from_local_csr(parts, n, backend, dtype=dtype)


def sprand_dist(m: int, n: int, density: float, backend, dtype=None, seed: int = 0):
    """Distributed random sparse matrix (test/bench helper; the reference
    builds these via Julia sprand in its tests)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density, format="csr", random_state=rng)
    from ..sparse import DistSparseMatrix

    return DistSparseMatrix.from_scipy(A, backend, dtype=dtype)

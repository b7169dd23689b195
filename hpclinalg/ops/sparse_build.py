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
    return _spdiagm_device(pairs, m, n, backend)


def _spdiagm_device(pairs, m: int, n: int, backend):
    """Multi-offset spdiagm built distributed: the structure (index-only,
    O(nnz) host numpy) is cached per (shape, offsets, lengths, partitions);
    the VALUES never touch the host — each diagonal's DistVector data is
    scattered into the output nzval by a cached ExchangePlan (one per
    diagonal). Ref: sparse.jl:3304-3605 builds the same thing rank-local
    over MPI; duplicates (repeated offsets) sum, matching Julia."""
    import jax

    from ..hashing import partition_hash
    from ..partition import global_to_local, uniform_partition
    from ..parallel.exchange import ExchangePlan
    from ..sparse import DistSparseMatrix, SparseStructure

    S = backend.nshards
    rp = uniform_partition(m, S)
    sig = tuple((k, len(v), partition_hash(v.partition)) for k, v in pairs)

    def build():
        # per-diagonal global (row, col, source-index) triples
        rows_all, cols_all, diag_id, src_i = [], [], [], []
        for di, (k, v) in enumerate(pairs):
            i = np.arange(len(v), dtype=np.int64)
            r = i + max(0, -k)
            c = i + max(0, k)
            keep = (r < m) & (c < n)
            rows_all.append(r[keep])
            cols_all.append(c[keep])
            diag_id.append(np.full(keep.sum(), di, np.int64))
            src_i.append(i[keep])
        rows = np.concatenate(rows_all) if rows_all else np.zeros(0, np.int64)
        cols = np.concatenate(cols_all) if cols_all else np.zeros(0, np.int64)
        dids = np.concatenate(diag_id) if diag_id else np.zeros(0, np.int64)
        srci = np.concatenate(src_i) if src_i else np.zeros(0, np.int64)

        order = np.lexsort((cols, rows))
        rows, cols, dids, srci = rows[order], cols[order], dids[order], srci[order]
        # dedupe structurally (duplicate offsets sum into one slot)
        if len(rows):
            new = np.concatenate([[True], (np.diff(rows) != 0)
                                  | (np.diff(cols) != 0)])
        else:
            new = np.zeros(0, bool)
        upos = np.cumsum(new) - 1          # entry -> unique slot (global order)
        urows = rows[new]
        ucols = cols[new]

        indptr, col_indices, colval, base = [], [], [], []
        for s in range(S):
            lo, hi = np.searchsorted(urows, [rp[s], rp[s + 1]])
            base.append(lo)
            gr, gc = urows[lo:hi] - rp[s], ucols[lo:hi]
            nl = int(rp[s + 1] - rp[s])
            indptr.append(np.concatenate(
                [[0], np.cumsum(np.bincount(gr, minlength=nl))]).astype(np.int64))
            ci = np.unique(gc)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, gc).astype(np.int32))
        st = SparseStructure(rp, uniform_partition(n, S), indptr,
                             col_indices, colval, backend)

        # one ExchangePlan per diagonal: ship v's local slots to the nzval
        # positions of the owning output shard
        plans = []
        owners_u, _ = global_to_local(rp, urows)
        for di, (k, v) in enumerate(pairs):
            mask = dids == di
            gpos = upos[mask]                  # unique slot (global order)
            si = srci[mask]                    # source index in v
            d_sh = owners_u[gpos]
            d_slot = gpos - np.asarray(base)[d_sh]
            s_sh, s_slot = global_to_local(v.partition, si)
            send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
            recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
            for ss in range(S):
                for dd in range(S):
                    mm = (s_sh == ss) & (d_sh == dd)
                    if mm.any():
                        send[ss][dd] = s_slot[mm]
                        recv[dd][ss] = d_slot[mm]
            plans.append(ExchangePlan(backend, send, recv, st.NNZpad))
        return st, plans

    st, plans = cached_plan("spdiagm_structure",
                            (m, n, sig, backend.key), build)
    dtype = np.result_type(*[v.dtype for _, v in pairs])
    nz = None
    for (k, v), plan in zip(pairs, plans):
        data = v.data.astype(dtype)
        nz = plan.apply(data, base=nz, add=True) if nz is not None \
            else plan.apply(data, add=True)
    if nz is None:
        nz = jax.device_put(jnp.zeros((S, st.NNZpad), dtype),
                            backend.row_sharding())
    return DistSparseMatrix(st, nz, backend)


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

"""Sparse addition/subtraction across (possibly mismatched) sparsity patterns.

Reference: AdditionPlan (/root/reference/src/sparse.jl:1072-1454) computes
the symbolic union of two patterns (merge over sorted compressed columns)
into three index-map triples and executes KernelAbstractions scatter kernels;
IdentityAdditionPlan (sparse.jl:3704-4060) is the A ± λI special case with a
fast path when all diagonal entries exist structurally.

Here the symbolic union is one np.unique over (row, col) keys per shard (the
patterns are host-replicated), and execution is two vmapped scatter-adds on
device — no communication, since the row partitions are aligned first
(mismatched partitions repartition the right operand, matching the
reference's operand-alignment discipline)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..config import round_up


class AdditionPlan:
    def __init__(self, A, B):
        from ..sparse import SparseStructure

        stA, stB = A.structure, B.structure
        assert np.array_equal(stA.row_partition, stB.row_partition)
        S = A.backend.nshards
        n = A.ncols
        indptr, col_indices, colval = [], [], []
        mapsA, mapsB = [], []
        for s in range(S):
            rA, cA = stA.global_coo[s]
            rB, cB = stB.global_coo[s]
            r0 = stA.row_partition[s]
            keys = np.concatenate([(rA - r0) * n + cA, (rB - r0) * n + cB])
            uniq, inv = np.unique(keys, return_inverse=True)
            rows, cols = uniq // n, uniq % n
            nl = len(stA.indptr[s]) - 1
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, rows + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(cols)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, cols).astype(np.int32))
            mapsA.append(inv[: len(rA)])
            mapsB.append(inv[len(rA):])
        self.structure = SparseStructure(
            stA.row_partition, stA.col_partition, indptr, col_indices, colval, A.backend
        )
        # device maps: (S, NNZpad_in) int32, padding -> out of range (dropped)
        def pack(maps, NNZpad_in):
            out = np.full((S, NNZpad_in), self.structure.NNZpad, dtype=np.int32)
            for s, m in enumerate(maps):
                out[s, : len(m)] = m
            return jax.device_put(out, A.backend.row_sharding())

        self.mapA = pack(mapsA, stA.NNZpad)
        self.mapB = pack(mapsB, stB.NNZpad)


@jax.jit
def _add_exec(Anz, Bnz, mapA, mapB, alpha, beta, out_zeros):
    def one(an, bn, ma, mb, o):
        o = o.at[ma].add(alpha * an, mode="drop")
        return o.at[mb].add(beta * bn, mode="drop")

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(Anz, Bnz, mapA, mapB, out_zeros)


def get_addition_plan(A, B) -> AdditionPlan:
    key = (A.hash, B.hash, A.backend.key)
    return cached_plan("addition_plan", key, lambda: AdditionPlan(A, B))


def add(A, B, alpha=1, beta=1):
    """alpha*A + beta*B (ref: Base.:+/-, sparse.jl:1405/1454)."""
    from ..sparse import DistSparseMatrix

    if A.shape != B.shape:
        raise ValueError(f"shape mismatch {A.shape} vs {B.shape}")
    if not np.array_equal(A.row_partition, B.row_partition):
        B = B.repartition(A.row_partition)
    plan = get_addition_plan(A, B)
    # scalars participate: a complex alpha/beta on real operands must
    # promote the result instead of crashing on the complex->float cast
    dtype = jnp.result_type(A.dtype, B.dtype, alpha, beta)
    out0 = jnp.zeros((A.backend.nshards, plan.structure.NNZpad), dtype)
    out0 = jax.device_put(out0, A.backend.row_sharding())
    nz = _add_exec(A.nzval.astype(dtype), B.nzval.astype(dtype),
                   plan.mapA, plan.mapB,
                   jnp.asarray(alpha, dtype), jnp.asarray(beta, dtype), out0)
    return DistSparseMatrix(plan.structure, nz, A.backend)


def _diag_positions(A):
    """Per-shard storage positions of structurally-present diagonal
    entries."""
    st = A.structure
    pos = []
    for s in range(A.backend.nshards):
        r, c = st.global_coo[s]
        pos.append(np.flatnonzero(r == c))
    return pos


def add_identity(A, lam=1.0):
    """A + lam*I (ref: IdentityAdditionPlan, sparse.jl:3704-4060). Fast path
    when every diagonal entry exists structurally: a pure value update that
    shares A's structure (and therefore every cached plan)."""
    from ..sparse import DistSparseMatrix
    from .sparse_build import speye

    if A.m != A.ncols:
        raise ValueError("A must be square")
    st = A.structure

    def build():
        pos = _diag_positions(A)
        sizes = np.diff(st.row_partition)
        complete = all(len(p) == sz for p, sz in zip(pos, sizes))
        if not complete:
            return ("incomplete", None)
        S = A.backend.nshards
        P = round_up(int(max((len(p) for p in pos), default=1)))
        arr = np.full((S, P), st.NNZpad, dtype=np.int32)
        for s, p in enumerate(pos):
            arr[s, : len(p)] = p
        return ("ok", jax.device_put(arr, A.backend.row_sharding()))

    _tag, posdev = cached_plan("identity_addition_plan", (A.hash, A.backend.key), build)
    dtype = jnp.result_type(A.dtype, lam)
    if posdev is None:
        I = speye(A.m, A.backend, row_partition=st.row_partition,
                  col_partition=st.col_partition, dtype=dtype)
        return add(A, I, 1, lam)
    lam_arr = jnp.asarray(lam, dtype)
    nz = jax.vmap(lambda v, p: v.at[p].add(lam_arr, mode="drop"))(
        A.nzval.astype(dtype), posdev)
    return DistSparseMatrix(st, nz, A.backend)

"""SpGEMM: distributed sparse × sparse matrix multiply.

Reference call stack (SURVEY.md §3.2): MatrixPlan (sparse.jl:554-978)
fetches the remote rows of B indexed by A.col_indices via a two-round
handshake, builds a gathered Bᵀ with zeroed values, and every execution
refreshes the values and runs a local CSC multiply (sparse.jl:991-1059).

Here the entire symbolic phase — which B rows each shard needs, the
flop-pair expansion, and C's exact CSR structure — is pure host numpy over
replicated metadata. Execution is:
    gathered_B = ExchangePlan(B.nzval)            # one all_to_all
    contrib    = A.nzval[pairA] * gathered[pairB] # device gather-multiply
    C.nzval    = segment_sum(contrib, pair_out)   # device scatter-add
with all three pair arrays static per (hash(A), hash(B)) — the memoized
plan means repeated products with the same patterns only move values,
exactly the reference's plan-reuse contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cache import cached_plan
from ..config import round_up
from ..partition import global_to_local
from ..parallel.exchange import ExchangePlan


class SpGEMMPlan:
    def __init__(self, A, B):
        from ..sparse import SparseStructure

        stA, stB = A.structure, B.structure
        S = A.backend.nshards
        n_out_cols = B.ncols

        # --- which B rows each shard needs, and the gathered-value layout ----
        # gathered buffer on shard s = concat of B-row values for rows in
        # col_indices_A[s] (sorted); offsets goff[s]
        brow_len = []  # len of each B row (global), replicated
        row_of_nnz = []
        for sb in range(S):
            ip = stB.indptr[sb]
            brow_len.append(np.diff(ip))
        brow_len_global = np.concatenate(brow_len) if brow_len else np.zeros(0, np.int64)

        send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
        goffs, gtot = [], 0
        max_g = 0
        for s in range(S):
            wanted = stA.col_indices[s]  # global B rows needed
            lens = brow_len_global[wanted] if len(wanted) else np.zeros(0, np.int64)
            goff = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            goffs.append(goff)
            max_g = max(max_g, int(goff[-1]))
            owners, loc_rows = global_to_local(stB.row_partition, wanted)
            for sb in range(S):
                m = owners == sb
                if not m.any():
                    continue
                ipb = stB.indptr[sb]
                starts = ipb[loc_rows[m]]
                ends = ipb[loc_rows[m] + 1]
                # source storage positions on sb, in wanted order
                src = np.concatenate(
                    [np.arange(a, b) for a, b in zip(starts, ends)]
                ) if len(starts) else np.zeros(0, np.int64)
                # destination offsets in s's gathered buffer
                w_idx = np.flatnonzero(m)
                dsts = np.concatenate(
                    [np.arange(goff[j], goff[j + 1]) for j in w_idx]
                ) if len(w_idx) else np.zeros(0, np.int64)
                send[sb][s] = src
                recv[s][sb] = dsts
        self.gpad = round_up(max_g + 1)
        self.value_plan = ExchangePlan(A.backend, send, recv, self.gpad)

        # --- flop-pair expansion + C structure, per shard --------------------
        indptr, col_indices, colval = [], [], []
        pairsA, pairsB, pairsO = [], [], []
        max_pairs, max_cnnz = 0, 0
        for s in range(S):
            rA, cA = stA.global_coo[s]  # storage order
            goff = goffs[s]
            j_comp = stA.colval[s].astype(np.int64)  # compressed col per A-nnz
            lens = (goff[j_comp + 1] - goff[j_comp]) if len(j_comp) else np.zeros(0, np.int64)
            npairs = int(lens.sum())
            max_pairs = max(max_pairs, npairs)
            # pairA: repeat A-nnz position by its B-row length
            pA = np.repeat(np.arange(len(j_comp), dtype=np.int64), lens)
            # pairB: for each A-nnz, the run goff[j] .. goff[j+1]
            starts_rep = np.repeat(goff[j_comp], lens)
            within = np.arange(npairs, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)])[:-1], lens
            )
            pB = starts_rep + within
            # output (row, col) of each pair: row = A row; col = B col of the
            # B-nnz. B cols in gathered order: concat of B rows' global cols.
            wanted = stA.col_indices[s]
            bcols_per_row = []
            for g in wanted:
                sb = np.searchsorted(stB.row_partition, g, side="right") - 1
                lr = int(g - stB.row_partition[sb])
                a, b = stB.indptr[sb][lr], stB.indptr[sb][lr + 1]
                bcols_per_row.append(stB.col_indices[sb][stB.colval[sb][a:b]])
            gath_cols = (np.concatenate(bcols_per_row)
                         if bcols_per_row else np.zeros(0, np.int64))
            out_row = np.repeat(rA - stA.row_partition[s], lens)
            out_col = gath_cols[pB]
            keys = out_row * n_out_cols + out_col
            uniq, inv = np.unique(keys, return_inverse=True)
            cnnz = len(uniq)
            max_cnnz = max(max_cnnz, cnnz)
            rows, cols = uniq // n_out_cols, uniq % n_out_cols
            nl = len(stA.indptr[s]) - 1
            ip = np.zeros(nl + 1, dtype=np.int64)
            np.add.at(ip, rows + 1, 1)
            indptr.append(np.cumsum(ip))
            ci = np.unique(cols)
            col_indices.append(ci)
            colval.append(np.searchsorted(ci, cols).astype(np.int32))
            pairsA.append(pA)
            pairsB.append(pB)
            pairsO.append(inv)

        self.structure = SparseStructure(
            stA.row_partition, stB.col_partition, indptr, col_indices, colval,
            A.backend,
        )
        Ppad = round_up(max(max_pairs, 1))
        S_ = S

        def pack(lists, fill):
            out = np.full((S_, Ppad), fill, dtype=np.int32)
            for s, l in enumerate(lists):
                out[s, : len(l)] = l
            return jax.device_put(out, A.backend.row_sharding())

        # padding: pairA -> any valid slot (0), pairB -> guaranteed-zero
        # gathered slot, pairO -> out of range (dropped by segment_sum)
        self.pairA = pack(pairsA, 0)
        self.pairB = pack(pairsB, self.gpad - 1)
        self.pairO = pack(pairsO, self.structure.NNZpad)


@partial(jax.jit, static_argnums=(4,))
def _spgemm_exec(Anz, gathered, pairA, pairB, NNZpad, pairO):
    def one(an, g, pa, pb, po):
        contrib = jnp.take(an, pa, axis=0) * jnp.take(g, pb, axis=0)
        return jax.ops.segment_sum(contrib, po, num_segments=NNZpad)

    return jax.vmap(one)(Anz, gathered, pairA, pairB, pairO)


def get_spgemm_plan(A, B) -> SpGEMMPlan:
    key = (A.hash, B.hash, A.backend.key)
    return cached_plan("matrix_plan", key, lambda: SpGEMMPlan(A, B))


def spgemm(A, B):
    """C = A @ B (ref: Base.:*, sparse.jl:991-1059). C inherits A's row
    partition and B's col partition, hash computed eagerly at plan time."""
    from ..sparse import DistSparseMatrix

    if A.ncols != B.m:
        raise ValueError(f"dimension mismatch: {A.shape} @ {B.shape}")
    plan = get_spgemm_plan(A, B)
    dtype = jnp.result_type(A.dtype, B.dtype)
    gathered = plan.value_plan.apply(B.nzval.astype(dtype))
    nz = _spgemm_exec(A.nzval.astype(dtype), gathered, plan.pairA, plan.pairB,
                      plan.structure.NNZpad, plan.pairO)
    return DistSparseMatrix(plan.structure, nz, A.backend)

"""Host-side symbolic analysis for the multifrontal factorization.

The reference gets all of this from MUMPS's analysis phase (job=1,
/root/reference/src/mumps_factorization.jl:196-203). Implemented from
scratch here: elimination tree (Liu's algorithm with path compression),
postorder, column counts, fundamental-supernode detection with relaxed
amalgamation, and per-supernode row structures — everything the numeric
phase needs, computed once per sparsity pattern and cached under the
structural hash.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp


def etree(indptr, indices, n):
    """Elimination tree of a symmetric positive-structure matrix (lower or
    full pattern accepted; uses upper triangle). Liu (1986) with path
    compression."""
    parent = np.full(n, -1, dtype=np.int64)
    ancestor = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        for t in range(indptr[j], indptr[j + 1]):
            i = indices[t]
            if i >= j:
                continue
            # walk from i to the root of its current tree
            while True:
                a = ancestor[i]
                if a == -1:
                    ancestor[i] = j
                    parent[i] = j
                    break
                if a == j:
                    break
                ancestor[i] = j  # path compression
                i = a
    return parent


def postorder(parent, n):
    """Postorder of the elimination forest."""
    # children lists
    head = np.full(n, -1, dtype=np.int64)
    nxt = np.full(n, -1, dtype=np.int64)
    for v in range(n - 1, -1, -1):
        p = parent[v]
        if p != -1:
            nxt[v] = head[p]
            head[p] = v
    order = np.empty(n, dtype=np.int64)
    k = 0
    stack = []
    for root in range(n):
        if parent[root] != -1:
            continue
        stack.append(root)
        while stack:
            v = stack[-1]
            c = head[v]
            if c != -1:
                head[v] = nxt[c]
                stack.append(c)
            else:
                order[k] = v
                k += 1
                stack.pop()
    return order


@dataclass
class SymbolicFactor:
    n: int
    perm: np.ndarray            # new-to-old (fill-reducing ∘ postorder)
    iperm: np.ndarray           # old-to-new
    parent: np.ndarray          # etree on permuted matrix
    snode_ptr: np.ndarray       # supernode column ranges [ptr[k], ptr[k+1])
    snode_of: np.ndarray        # column -> supernode
    snode_parent: np.ndarray    # supernode tree
    snode_rows: list            # per supernode: row structure BELOW the
                                # supernode columns (global permuted ids, sorted)
    L_colptr: np.ndarray        # CSC column pointers of L (below-diag only)
    lnz: int                    # total below-diagonal nnz of L
    flops: float

    @property
    def nsuper(self) -> int:
        return len(self.snode_ptr) - 1


def analyze(A_csr: sp.csr_matrix, perm: np.ndarray,
            relax: int = 16) -> SymbolicFactor:
    """Full symbolic analysis of P A Pᵀ.

    relax: amalgamation — merge a child supernode into its parent when the
    extra fill stays under ``relax`` rows per column (MUMPS-style relaxed
    supernodes keep fronts big enough for the MXU)."""
    n = A_csr.shape[0]
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)
    # permuted symmetric pattern, upper triangle CSR (rows sorted)
    A = sp.csr_matrix(A_csr)
    Ap = A[perm][:, perm]
    Ap = (Ap + Ap.T).tocsr()
    Ap.sort_indices()

    par = etree(Ap.indptr, Ap.indices, n)
    post = postorder(par, n)
    # compose permutations so columns are postordered
    perm2 = perm[post]
    iperm2 = np.empty(n, dtype=np.int64)
    iperm2[perm2] = np.arange(n)
    Ap = A[perm2][:, perm2]
    Ap = (Ap + Ap.T).tocsr()
    Ap.sort_indices()
    par = etree(Ap.indptr, Ap.indices, n)

    # --- row structures of L by column (sets), built by simulation ----------
    # col_struct[j] = sorted rows > j in column j of L
    # Standard symbolic Cholesky: struct(j) = A_below(j) ∪ (∪_{c: parent=j} struct(c)\{j})
    children = [[] for _ in range(n)]
    for v in range(n):
        if par[v] != -1:
            children[par[v]].append(v)
    col_struct: list[np.ndarray] = [None] * n
    for j in range(n):  # postordered -> children precede parents
        rows = Ap.indices[Ap.indptr[j]: Ap.indptr[j + 1]]
        rows = rows[rows > j]
        pieces = [rows]
        for c in children[j]:
            rc = col_struct[c]
            pieces.append(rc[rc > j])
        s = np.unique(np.concatenate(pieces)) if len(pieces) > 1 else np.unique(rows)
        col_struct[j] = s

    counts = np.array([len(s) for s in col_struct], dtype=np.int64)

    # --- fundamental supernodes + relaxed amalgamation -----------------------
    snode_start = [0]
    for j in range(1, n):
        fundamental = (par[j - 1] == j) and (counts[j - 1] == counts[j] + 1) \
            and (len(children[j]) == 1)
        if fundamental:
            continue
        # relaxed: merge anyway if fill increase is small
        if par[j - 1] == j and counts[j - 1] <= counts[j] + 1 + relax:
            continue
        snode_start.append(j)
    snode_ptr = np.array(snode_start + [n], dtype=np.int64)
    nsuper = len(snode_ptr) - 1
    snode_of = np.zeros(n, dtype=np.int64)
    for k in range(nsuper):
        snode_of[snode_ptr[k]: snode_ptr[k + 1]] = k

    # per-supernode row structure = union of member column structures minus
    # the supernode's own columns
    snode_rows = []
    flops = 0.0
    lnz = 0
    L_colptr = np.zeros(n + 1, dtype=np.int64)
    for k in range(nsuper):
        j0, j1 = int(snode_ptr[k]), int(snode_ptr[k + 1])
        s = np.unique(np.concatenate([col_struct[j] for j in range(j0, j1)]))
        s = s[s >= j1]
        snode_rows.append(s.astype(np.int64))
        nc, nr = j1 - j0, len(s)
        flops += nc * (nc + nr) ** 2
        for j in range(j0, j1):
            # column j of L: remaining snode cols + snode rows
            L_colptr[j + 1] = (j1 - j - 1) + nr
            lnz += (j1 - j - 1) + nr
    L_colptr = np.cumsum(L_colptr)

    snode_parent = np.full(nsuper, -1, dtype=np.int64)
    for k in range(nsuper):
        rows = snode_rows[k]
        if len(rows):
            snode_parent[k] = snode_of[rows[0]]

    return SymbolicFactor(
        n=n, perm=perm2, iperm=iperm2, parent=par,
        snode_ptr=snode_ptr, snode_of=snode_of, snode_parent=snode_parent,
        snode_rows=snode_rows, L_colptr=L_colptr, lnz=int(lnz), flops=flops,
    )

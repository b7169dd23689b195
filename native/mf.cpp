// Supernodal multifrontal numeric factorization + triangular solves — C++.
//
// Native replacement for MUMPS's numeric phase (the reference binds MUMPS
// Fortran via /root/reference/src/mumps_factorization.jl; this implements
// the same job=2/job=3 roles from scratch). Frontal kernels call BLAS
// (dgemm/dtrsm/...) resolved at runtime via dlopen of scipy's bundled
// OpenBLAS — the same dependency class as MUMPS linking OpenBLAS.
//
// C ABI (ctypes):
//   int mf_init(const char* blas_so_path);
//   int mf_factorize_d / mf_factorize_z: unpivoted supernodal LDLt (kind=0)
//     or LU (kind=1) with static tiny-pivot perturbation; returns number of
//     perturbed pivots, or -1 on error.
//   int mf_solve_d / mf_solve_z: forward/diag/backward sweeps; transpose
//     flag selects A^T x = b for LU (LDLt is symmetric).
//
// Layout contract (all computed by the Python symbolic layer):
//   snode_ptr[ns+1]  : column ranges (postordered, contiguous)
//   rows_ptr[ns+1]   : per-supernode below-block row lists (concatenated)
//   rows[]           : the row indices (global, permuted ordering, sorted)
//   sparent[ns]      : supernode tree parent (-1 = root)
//   l11_off/l21_off/u11_off/u12_off : per-supernode offsets into the packed
//     factor arrays (column-major within each block)
//   A given in CSC of the permuted matrix (symmetric: full pattern).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <complex>
#include <dlfcn.h>
#include <unistd.h>
#ifdef MF_PROF
#include <chrono>
#include <cstdio>
static double tAcc[8];
struct ProfT {
  int slot; std::chrono::high_resolution_clock::time_point t0;
  ProfT(int s): slot(s), t0(std::chrono::high_resolution_clock::now()) {}
  ~ProfT(){ tAcc[slot] += std::chrono::duration<double>(std::chrono::high_resolution_clock::now()-t0).count(); }
};
#define PROF_CAT2(a, b) a##b
#define PROF_CAT(a, b) PROF_CAT2(a, b)
#define PROF(slot) ProfT PROF_CAT(_pt, __LINE__)(slot)
extern "C" void mf_prof_dump() {
  const char* names[8] = {"zeroF","assembleA","extendadd","panel","trsm/L21","schur","alloc","other"};
  for (int i=0;i<8;++i) if (tAcc[i]>0) fprintf(stderr, "  %-10s %.3f ms\n", names[i], tAcc[i]*1e3);
  for (int i=0;i<8;++i) tAcc[i]=0;
}
#else
#define PROF(slot)
#endif
#include <vector>

using i64 = int64_t;

// below this work size, hand-rolled loops beat a BLAS call's dispatch cost
static constexpr size_t kSmallFront = 2048;
using cd = std::complex<double>;

typedef int blasint;

// ---- BLAS via dlopen -------------------------------------------------------
typedef void (*dgemm_t)(const char*, const char*, const blasint*, const blasint*,
                        const blasint*, const double*, const double*, const blasint*,
                        const double*, const blasint*, const double*, double*,
                        const blasint*);
typedef void (*dtrsm_t)(const char*, const char*, const char*, const char*,
                        const blasint*, const blasint*, const double*, const double*,
                        const blasint*, double*, const blasint*);
typedef void (*dgemv_t)(const char*, const blasint*, const blasint*, const double*,
                        const double*, const blasint*, const double*, const blasint*,
                        const double*, double*, const blasint*);
typedef void (*dtrsv_t)(const char*, const char*, const char*, const blasint*,
                        const double*, const blasint*, double*, const blasint*);

typedef void (*zgemm_t)(const char*, const char*, const blasint*, const blasint*,
                        const blasint*, const cd*, const cd*, const blasint*,
                        const cd*, const blasint*, const cd*, cd*, const blasint*);
typedef void (*ztrsm_t)(const char*, const char*, const char*, const char*,
                        const blasint*, const blasint*, const cd*, const cd*,
                        const blasint*, cd*, const blasint*);
typedef void (*zgemv_t)(const char*, const blasint*, const blasint*, const cd*,
                        const cd*, const blasint*, const cd*, const blasint*,
                        const cd*, cd*, const blasint*);
typedef void (*ztrsv_t)(const char*, const char*, const char*, const blasint*,
                        const cd*, const blasint*, cd*, const blasint*);

static dgemm_t dgemm_p; static dtrsm_t dtrsm_p; static dgemv_t dgemv_p; static dtrsv_t dtrsv_p;
static zgemm_t zgemm_p; static ztrsm_t ztrsm_p; static zgemv_t zgemv_p; static ztrsv_t ztrsv_p;

typedef void (*set_threads_t)(int);

extern "C" int mf_init(const char *blas_path) {
  // RTLD_LOCAL: every symbol is resolved via dlsym below; injecting
  // dgemm_ etc. into the global namespace could rebind other libraries'
  // BLAS lookups to this one
  void *h = dlopen(blas_path, RTLD_NOW | RTLD_LOCAL);
  if (!h) return -1;
  // engage OpenBLAS threading for the large frontal GEMMs (MUMPS gets the
  // same effect from OPENBLAS_NUM_THREADS; guide.md:218-252). Respect an
  // explicit OPENBLAS_NUM_THREADS: this is scipy's own bundled OpenBLAS,
  // and overriding it silently would change the user's scipy threading
  // (and oversubscribe multi-process-per-host deployments).
  auto st = (set_threads_t)dlsym(h, "scipy_openblas_set_num_threads");
  if (!st) st = (set_threads_t)dlsym(h, "openblas_set_num_threads");
  if (st && !getenv("OPENBLAS_NUM_THREADS")) {
    long nc = sysconf(_SC_NPROCESSORS_ONLN);
    st((int)(nc > 0 ? nc : 1));
  }
  auto sym = [&](const char *a, const char *b) -> void * {
    void *p = dlsym(h, a);
    return p ? p : dlsym(h, b);
  };
  dgemm_p = (dgemm_t)sym("scipy_dgemm_", "dgemm_");
  dtrsm_p = (dtrsm_t)sym("scipy_dtrsm_", "dtrsm_");
  dgemv_p = (dgemv_t)sym("scipy_dgemv_", "dgemv_");
  dtrsv_p = (dtrsv_t)sym("scipy_dtrsv_", "dtrsv_");
  zgemm_p = (zgemm_t)sym("scipy_zgemm_", "zgemm_");
  ztrsm_p = (ztrsm_t)sym("scipy_ztrsm_", "ztrsm_");
  zgemv_p = (zgemv_t)sym("scipy_zgemv_", "zgemv_");
  ztrsv_p = (ztrsv_t)sym("scipy_ztrsv_", "ztrsv_");
  return (dgemm_p && dtrsm_p && dgemv_p && dtrsv_p &&
          zgemm_p && ztrsm_p && zgemv_p && ztrsv_p) ? 0 : -2;
}

// ---- generic scalar helpers -------------------------------------------------
template <class T> struct Blas;
template <> struct Blas<double> {
  static void gemm(char ta, char tb, blasint m, blasint n, blasint k, double al,
                   const double *A, blasint lda, const double *B, blasint ldb,
                   double be, double *C, blasint ldc) {
    dgemm_p(&ta, &tb, &m, &n, &k, &al, A, &lda, B, &ldb, &be, C, &ldc);
  }
  static void trsm(char side, char uplo, char ta, char diag, blasint m, blasint n,
                   double al, const double *A, blasint lda, double *B, blasint ldb) {
    dtrsm_p(&side, &uplo, &ta, &diag, &m, &n, &al, A, &lda, B, &ldb);
  }
  static void gemv(char ta, blasint m, blasint n, double al, const double *A,
                   blasint lda, const double *x, blasint incx, double be,
                   double *y, blasint incy) {
    dgemv_p(&ta, &m, &n, &al, A, &lda, x, &incx, &be, y, &incy);
  }
  static void trsv(char uplo, char ta, char diag, blasint n, const double *A,
                   blasint lda, double *x, blasint incx) {
    dtrsv_p(&uplo, &ta, &diag, &n, A, &lda, x, &incx);
  }
};
template <> struct Blas<cd> {
  static void gemm(char ta, char tb, blasint m, blasint n, blasint k, cd al,
                   const cd *A, blasint lda, const cd *B, blasint ldb, cd be,
                   cd *C, blasint ldc) {
    zgemm_p(&ta, &tb, &m, &n, &k, &al, A, &lda, B, &ldb, &be, C, &ldc);
  }
  static void trsm(char side, char uplo, char ta, char diag, blasint m, blasint n,
                   cd al, const cd *A, blasint lda, cd *B, blasint ldb) {
    ztrsm_p(&side, &uplo, &ta, &diag, &m, &n, &al, A, &lda, B, &ldb);
  }
  static void gemv(char ta, blasint m, blasint n, cd al, const cd *A, blasint lda,
                   const cd *x, blasint incx, cd be, cd *y, blasint incy) {
    zgemv_p(&ta, &m, &n, &al, A, &lda, x, &incx, &be, y, &incy);
  }
  static void trsv(char uplo, char ta, char diag, blasint n, const cd *A,
                   blasint lda, cd *x, blasint incx) {
    ztrsv_p(&uplo, &ta, &diag, &n, A, &lda, x, &incx);
  }
};

template <class T> static double absval(T x) { return std::abs(x); }

// ---- within-front pivoting helpers -------------------------------------------
// The front F is stored FULL (assembly writes both halves of the symmetric
// pattern), so a symmetric permutation is a plain row swap + column swap.
template <class T>
static inline void swap_front_rows(T *F, i64 nf, i64 p, i64 q) {
  for (i64 c = 0; c < nf; ++c) std::swap(F[(size_t)c * nf + p],
                                         F[(size_t)c * nf + q]);
}
template <class T>
static inline void swap_front_cols(T *F, i64 nf, i64 p, i64 q) {
  T *cp = &F[(size_t)p * nf], *cq = &F[(size_t)q * nf];
  for (i64 i = 0; i < nf; ++i) std::swap(cp[i], cq[i]);
}

// ---- factorization ----------------------------------------------------------
// kind: 0 = LDLt (symmetric, possibly complex-symmetric), 1 = LU,
//       2 = LDLt with within-front Bunch-Kaufman pivoting (1x1 + 2x2,
//           symmetric swaps local to the supernode; MUMPS CNTL(1) role,
//           /root/reference/src/mumps_factorization.jl:176-224),
//       3 = LU with within-front threshold partial row pivoting.
// Pivoted kinds fill Dsub (2x2 subdiagonal, 0 = 1x1), pivperm (factor
// position -> pre-pivot position) and rows_out (descendant scatter targets
// relabeled to post-pivot positions).
template <class T>
static i64 factorize_full(
    i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr, const i64 *rows,
    const i64 *sparent,
    const i64 *Ap, const i64 *Ai, const T *Ax,
    const i64 *l11_off, const i64 *l21_off,
    T *L11, T *L21, T *D, T *U11, T *U12,
    int kind, double eps,
    T *Dsub = nullptr, i64 *pivperm = nullptr, i64 *rows_out = nullptr,
    double *growth_out = nullptr) {
  double growth = 0.0;  // max |L| entry, accumulated per front while the
  // exported blocks are still cache-hot — replaces the separate O(lnz)
  // absmax pass the growth monitor (api.py:_factor_growth) otherwise runs
  // per refactorization (~0.6 ms of the n=10k headline loop)
  i64 npert = 0;
  if (pivperm) for (i64 i = 0; i < n; ++i) pivperm[i] = i;
  if (Dsub) for (i64 i = 0; i < n; ++i) Dsub[i] = T(0);
  std::vector<i64> pos_of(n, -1);
  std::vector<i64> chead(ns, -1), cnext(ns, -1);
  for (i64 k = 0; k < ns; ++k) {
    const i64 p = sparent[k];
    if (p >= 0) { cnext[k] = chead[p]; chead[p] = k; }
  }
  std::vector<T> F;

  // classic multifrontal update stack: postorder makes child Schur
  // complements LIFO, so one arena replaces per-front malloc/free
  i64 peak = 0, top_sim = 0, max_nrnc = 0;
  {
    std::vector<i64> off_sim(ns, 0);
    for (i64 k = 0; k < ns; ++k) {
      i64 base = top_sim;
      for (i64 c = chead[k]; c != -1; c = cnext[c]) base = std::min(base, off_sim[c]);
      top_sim = base;
      const i64 nrk = rows_ptr[k + 1] - rows_ptr[k];
      const i64 nck = snode_ptr[k + 1] - snode_ptr[k];
      off_sim[k] = top_sim;
      top_sim += nrk * nrk;
      peak = std::max(peak, top_sim);
      max_nrnc = std::max(max_nrnc, nrk * nck);
    }
  }
  std::vector<T> arena((size_t)std::max<i64>(peak, 1));
  std::vector<i64> upd_off(ns, 0);
  std::vector<T> VDinv_buf((size_t)std::max<i64>(max_nrnc, 1));
  i64 top = 0;

  for (i64 k = 0; k < ns; ++k) {
    const i64 j0 = snode_ptr[k], j1 = snode_ptr[k + 1];
    const i64 nc = j1 - j0;
    const i64 r0 = rows_ptr[k], r1 = rows_ptr[k + 1];
    const i64 nr = r1 - r0;
    const i64 nf = nc + nr;
    { PROF(0); F.assign((size_t)nf * nf, T(0)); }

    for (i64 j = j0; j < j1; ++j) pos_of[j] = j - j0;
    for (i64 t = r0; t < r1; ++t) pos_of[rows[t]] = nc + (t - r0);

    // assemble A columns of the supernode
    { PROF(1);
    for (i64 j = j0; j < j1; ++j) {
      const i64 c = j - j0;
      for (i64 t = Ap[j]; t < Ap[j + 1]; ++t) {
        const i64 p = pos_of[Ai[t]];
        if (p >= 0) F[(size_t)c * nf + p] = Ax[t];
      }
    }
    }
    if (kind == 1 || kind == 3) {
      // upper block F[0:nc, nc:]: A entries (r, c) with r in snode cols and
      // c in rows — scan each front-row column in CSC
      for (i64 t = r0; t < r1; ++t) {
        const i64 col = rows[t];
        const i64 p = nc + (t - r0);
        for (i64 u = Ap[col]; u < Ap[col + 1]; ++u) {
          const i64 q = pos_of[Ai[u]];
          if (q >= 0 && q < nc) F[(size_t)p * nf + q] = Ax[u];
        }
      }
    }

    // extend-add child Schur complements, then pop them off the stack
    { PROF(2);
    i64 base = top;
    std::vector<i64> map;
    for (i64 c = chead[k]; c != -1; c = cnext[c]) {
      const i64 cr0 = rows_ptr[c], cr1 = rows_ptr[c + 1];
      const i64 cnr = cr1 - cr0;
      const T *U = &arena[upd_off[c]];
      base = std::min(base, upd_off[c]);
      // child rows are a subset of this front's index list
      map.resize((size_t)cnr);
      for (i64 t = 0; t < cnr; ++t) map[t] = pos_of[rows[cr0 + t]];
      for (i64 cj = 0; cj < cnr; ++cj) {
        const i64 pj = map[cj];
        T *Fcol = &F[(size_t)pj * nf];
        const T *Ucol = &U[(size_t)cj * cnr];
        for (i64 ci = 0; ci < cnr; ++ci) Fcol[map[ci]] += Ucol[ci];
      }
    }
    top = base;
    }

    T *l11 = &L11[l11_off[k]];
    T *l21 = &L21[l21_off[k]];
    T *d = &D[j0];

    if (kind == 2) {
      PROF(3);
      // ---- Bunch-Kaufman LDLt with within-front symmetric swaps ---------
      // Right-looking level-2 with FULL-front symmetric updates (both
      // halves stay valid so swaps are plain row+col exchanges), pivot
      // tests over current values including the non-fully-summed rows.
      // Escalation path only: api.py retries with kind 2/3 when a static
      // perturbation fires, so the fast blocked kernels stay the default.
      const double alpha = 0.6403882032022076;  // (1+sqrt(17))/8
      i64 j = 0;
      while (j < nc) {
        i64 r_in = -1;
        double lam = 0.0, lam_in = 0.0;
        for (i64 i = j + 1; i < nf; ++i) {
          const double v = absval(F[(size_t)j * nf + i]);
          if (v > lam) lam = v;
          if (i < nc && v > lam_in) { lam_in = v; r_in = i; }
        }
        const double ajj = absval(F[(size_t)j * nf + j]);
        bool two = false;
        if (!(nc - j == 1 || lam == 0.0 || ajj >= alpha * lam)
            && r_in >= 0) {
          const i64 rr = r_in;
          double sig = 0.0;
          for (i64 i = j; i < nf; ++i) {
            if (i == rr) continue;
            const double v = absval(F[(size_t)rr * nf + i]);
            if (v > sig) sig = v;
          }
          const double arr = absval(F[(size_t)rr * nf + rr]);
          if (ajj * sig >= alpha * lam_in * lam_in) {
            // keep the 1x1 at j
          } else if (arr >= alpha * sig) {
            swap_front_rows(F.data(), nf, j, rr);
            swap_front_cols(F.data(), nf, j, rr);
            if (pivperm) std::swap(pivperm[j0 + j], pivperm[j0 + rr]);
          } else {
            if (rr != j + 1) {
              swap_front_rows(F.data(), nf, j + 1, rr);
              swap_front_cols(F.data(), nf, j + 1, rr);
              if (pivperm) std::swap(pivperm[j0 + j + 1], pivperm[j0 + rr]);
            }
            two = true;
          }
        }
        if (!two) {
          T dj = F[(size_t)j * nf + j];
          if (absval(dj) < eps) {
            dj = (absval(dj) == 0.0 || std::real(dj) >= 0.0) ? T(eps)
                                                             : T(-eps);
            ++npert;
          }
          d[j] = dj;
          const T inv = T(1.0) / dj;
          T *col = &F[(size_t)j * nf];
          for (i64 i = j + 1; i < nf; ++i) col[i] *= inv;   // L column
          for (i64 c = j + 1; c < nf; ++c) {
            const T s = col[c] * dj;
            if (s == T(0)) continue;
            T *dst = &F[(size_t)c * nf];
            for (i64 i = j + 1; i < nf; ++i) dst[i] -= col[i] * s;
          }
          j += 1;
        } else {
          T a = F[(size_t)j * nf + j];
          T b = F[(size_t)j * nf + j + 1];
          T c2 = F[(size_t)(j + 1) * nf + j + 1];
          T det = a * c2 - b * b;
          // BK 2x2 blocks have |b| >= alpha*sigma, so det ~ -b^2 is well
          // scaled; the clamp is a safety net for degenerate exact zeros
          if (absval(det) < eps * eps) {
            a += (std::real(a) >= 0 ? T(eps) : T(-eps));
            c2 += (std::real(c2) >= 0 ? T(eps) : T(-eps));
            det = a * c2 - b * b;
            ++npert;
          }
          d[j] = a;
          d[j + 1] = c2;
          if (Dsub) Dsub[j0 + j] = b;
          const T i00 = c2 / det, i01 = -b / det, i11 = a / det;
          T *c0 = &F[(size_t)j * nf];
          T *c1 = &F[(size_t)(j + 1) * nf];
          for (i64 i = j + 2; i < nf; ++i) {
            const T l0 = c0[i] * i00 + c1[i] * i01;
            const T l1 = c0[i] * i01 + c1[i] * i11;
            c0[i] = l0;
            c1[i] = l1;
          }
          for (i64 c = j + 2; c < nf; ++c) {
            const T w0 = a * c0[c] + b * c1[c];    // raw A(c, j)
            const T w1 = b * c0[c] + c2 * c1[c];   // raw A(c, j+1)
            if (w0 == T(0) && w1 == T(0)) continue;
            T *dst = &F[(size_t)c * nf];
            for (i64 i = j + 2; i < nf; ++i)
              dst[i] -= c0[i] * w0 + c1[i] * w1;
          }
          c1[j] = T(0);
          c0[j + 1] = T(0);
          j += 2;
        }
      }
      // extraction: L (scaled) already lives in F, Schur in F22
      for (i64 jj = 0; jj < nc; ++jj) {
        T *dst = &l11[(size_t)jj * nc];
        for (i64 i = 0; i < nc; ++i)
          dst[i] = (i == jj) ? T(1) : (i > jj ? F[(size_t)jj * nf + i]
                                              : T(0));
      }
      if (nr > 0) {
        for (i64 jj = 0; jj < nc; ++jj)
          memcpy(&l21[(size_t)jj * nr], &F[(size_t)jj * nf + nc],
                 sizeof(T) * nr);
        upd_off[k] = top;
        T *U = &arena[top];
        top += nr * nr;
        for (i64 jj = 0; jj < nr; ++jj)
          memcpy(&U[(size_t)jj * nr], &F[(size_t)(nc + jj) * nf + nc],
                 sizeof(T) * nr);
      } else {
        upd_off[k] = top;
      }
    } else if (kind == 0) {
      PROF(3);
      // ---- unpivoted blocked LDLt of F11 (nc x nc) -----------------------
      const i64 NB = 48;
      for (i64 p0 = 0; p0 < nc; p0 += NB) {
        const i64 pb = std::min(NB, nc - p0);
        // panel factor (level-2)
        for (i64 j = p0; j < p0 + pb; ++j) {
          T dj = F[(size_t)j * nf + j];
          if (absval(dj) < eps) {
            dj = (absval(dj) == 0.0 || std::real(dj) >= 0.0) ? T(eps) : T(-eps);
            ++npert;
          }
          d[j] = dj;
          const i64 mrem = nc - j - 1;
          if (mrem > 0) {
            T *col = &F[(size_t)j * nf + j + 1];
            const T inv = T(1.0) / dj;
            for (i64 i = 0; i < mrem; ++i) col[i] *= inv;
            // rank-1 update of the remaining panel columns (level-2);
            // F[j*nf+jj] now holds the scaled L[jj,j]
            for (i64 jj = j + 1; jj < p0 + pb; ++jj) {
              const T s = F[(size_t)j * nf + jj] * dj;
              T *dst = &F[(size_t)jj * nf + jj];
              const T *src = &F[(size_t)j * nf + jj];
              const i64 len = nc - jj;
              for (i64 i = 0; i < len; ++i) dst[i] -= src[i] * s;
            }
          }
        }
        // block update of trailing columns beyond the panel:
        // F[p1:, p1:] -= Lpanel * diag(d) * Lpanel^T  restricted to cols p1:
        const i64 p1 = p0 + pb;
        const i64 mrem = nc - p1;
        if (mrem > 0) {
          // W = Lpanel(p1:, p0:p1) * diag(d)
          std::vector<T> W((size_t)mrem * pb);
          for (i64 jj = 0; jj < pb; ++jj)
            for (i64 ii = 0; ii < mrem; ++ii)
              W[(size_t)jj * mrem + ii] =
                  F[(size_t)(p0 + jj) * nf + p1 + ii] * d[p0 + jj];
          // F[p1:nc, p1:nc] -= W * Lpanel(p1:, :)^T
          Blas<T>::gemm('N', 'T', (blasint)mrem, (blasint)mrem, (blasint)pb,
                        T(-1), W.data(), (blasint)mrem,
                        &F[(size_t)p0 * nf + p1], (blasint)nf, T(1),
                        &F[(size_t)p1 * nf + p1], (blasint)nf);
        }
      }
      // copy L11 (unit lower) out
      for (i64 j = 0; j < nc; ++j) {
        T *dst = &l11[(size_t)j * nc];
        for (i64 i = 0; i < nc; ++i) dst[i] = (i == j) ? T(1) : T(0);
        for (i64 i = j + 1; i < nc; ++i) dst[i] = F[(size_t)j * nf + i];
      }
      if (nr > 0) {
        // L21raw = F21; L21 = F21 * L11^{-T} * D^{-1}
        for (i64 j = 0; j < nc; ++j)
          memcpy(&l21[(size_t)j * nr], &F[(size_t)j * nf + nc],
                 sizeof(T) * nr);
        if ((size_t)nr * nc <= kSmallFront) {
          // hand-rolled X * L11^T = F21 solve: X[:,j] -= X[:,k<j] * L11[j,k]
          // — BLAS per-call overhead dominates on the thousands of tiny
          // fronts typical after AMD (avg nf ~ 12 on 2D meshes)
          for (i64 j = 1; j < nc; ++j) {
            T *xj = &l21[(size_t)j * nr];
            for (i64 k2 = 0; k2 < j; ++k2) {
              const T m = l11[(size_t)k2 * nc + j];
              if (m == T(0)) continue;
              const T *xk = &l21[(size_t)k2 * nr];
              for (i64 i = 0; i < nr; ++i) xj[i] -= m * xk[i];
            }
          }
        } else
        Blas<T>::trsm('R', 'L', 'T', 'U', (blasint)nr, (blasint)nc, T(1),
                      l11, (blasint)nc, l21, (blasint)nr);
        // W = L21 (still scaled by D on the right: actually after trsm,
        // l21 = F21 * L11^{-T}; divide columns by d to finish)
        {
          upd_off[k] = top;
          T *U = &arena[top];
          top += nr * nr;
          // Schur: with V := F21 L11^{-T} (pre-division l21):
          // U22 = F22 - V * D^{-1} * V^T
          T *VDinv_p = VDinv_buf.data();
          for (i64 j = 0; j < nc; ++j) {
            const T inv = T(1.0) / d[j];
            for (i64 i = 0; i < nr; ++i)
              VDinv_p[(size_t)j * nr + i] = l21[(size_t)j * nr + i] * inv;
          }
          // copy F22 into U
          for (i64 j = 0; j < nr; ++j)
            memcpy(&U[(size_t)j * nr], &F[(size_t)(nc + j) * nf + nc],
                   sizeof(T) * nr);
          if ((size_t)nr * nr * nc <= kSmallFront * 16) {
            // hand-rolled U -= VDinv * V^T for tiny fronts
            for (i64 j = 0; j < nr; ++j) {
              T *Uj = &U[(size_t)j * nr];
              for (i64 k2 = 0; k2 < nc; ++k2) {
                const T vjk = l21[(size_t)k2 * nr + j];
                if (vjk == T(0)) continue;
                const T *w = &VDinv_p[(size_t)k2 * nr];
                for (i64 i = 0; i < nr; ++i) Uj[i] -= w[i] * vjk;
              }
            }
          } else
          Blas<T>::gemm('N', 'T', (blasint)nr, (blasint)nr, (blasint)nc,
                        T(-1), VDinv_p, (blasint)nr, l21, (blasint)nr,
                        T(1), U, (blasint)nr);
          // finish l21 scaling: l21 = V * D^{-1}
          memcpy(l21, VDinv_p, sizeof(T) * (size_t)nr * nc);
        }
      } else {
        upd_off[k] = top;
      }
    } else if (kind == 3) {
      // ---- LU of F11 with threshold partial ROW pivoting -----------------
      // Pivot rows are the fully-summed rows [j, nc) only (rows >= nc
      // belong to ancestors — the classic multifrontal restriction); the
      // eps clamp + refinement still covers growth those rows carry.
      // Level-2 right-looking on F11; L21/U12/Schur extraction below is
      // shared with the blocked path (F21/F12 stay raw; row swaps span
      // ALL nf columns so the F12 region follows its rows).
      for (i64 j = 0; j < nc; ++j) {
        i64 r = j;
        double best = absval(F[(size_t)j * nf + j]);
        for (i64 i = j + 1; i < nc; ++i) {
          const double v = absval(F[(size_t)j * nf + i]);
          if (v > best) { best = v; r = i; }
        }
        if (r != j) {
          swap_front_rows(F.data(), nf, j, r);
          if (pivperm) std::swap(pivperm[j0 + j], pivperm[j0 + r]);
        }
        T dj = F[(size_t)j * nf + j];
        if (absval(dj) < eps) {
          dj = (absval(dj) == 0.0 || std::real(dj) >= 0.0) ? T(eps) : T(-eps);
          F[(size_t)j * nf + j] = dj;
          ++npert;
        }
        const T inv = T(1.0) / dj;
        T *col = &F[(size_t)j * nf];
        for (i64 i = j + 1; i < nc; ++i) col[i] *= inv;
        for (i64 c = j + 1; c < nc; ++c) {
          const T u = F[(size_t)c * nf + j];
          if (u == T(0)) continue;
          T *dst = &F[(size_t)c * nf];
          for (i64 i = j + 1; i < nc; ++i) dst[i] -= col[i] * u;
        }
      }
      // export L11 (unit lower) and U11 (upper incl diag)
      T *u11 = &U11[l11_off[k]];
      T *u12 = &U12[l21_off[k]];
      for (i64 j = 0; j < nc; ++j) {
        T *dl = &l11[(size_t)j * nc];
        T *du = &u11[(size_t)j * nc];
        for (i64 i = 0; i < nc; ++i) {
          const T v = F[(size_t)j * nf + i];
          dl[i] = (i == j) ? T(1) : (i > j ? v : T(0));
          du[i] = (i <= j) ? v : T(0);
        }
      }
      if (nr > 0) {
        for (i64 j = 0; j < nc; ++j)
          memcpy(&l21[(size_t)j * nr], &F[(size_t)j * nf + nc], sizeof(T) * nr);
        Blas<T>::trsm('R', 'U', 'N', 'N', (blasint)nr, (blasint)nc, T(1),
                      u11, (blasint)nc, l21, (blasint)nr);
        for (i64 j = 0; j < nr; ++j)
          memcpy(&u12[(size_t)j * nc], &F[(size_t)(nc + j) * nf], sizeof(T) * nc);
        Blas<T>::trsm('L', 'L', 'N', 'U', (blasint)nc, (blasint)nr, T(1),
                      l11, (blasint)nc, u12, (blasint)nc);
        upd_off[k] = top;
        T *U = &arena[top];
        top += nr * nr;
        for (i64 j = 0; j < nr; ++j)
          memcpy(&U[(size_t)j * nr], &F[(size_t)(nc + j) * nf + nc],
                 sizeof(T) * nr);
        Blas<T>::gemm('N', 'N', (blasint)nr, (blasint)nr, (blasint)nc, T(-1),
                      l21, (blasint)nr, u12, (blasint)nc, T(1), U, (blasint)nr);
      } else {
        upd_off[k] = top;
      }
    } else {
      // ---- unpivoted blocked LU of F11 -----------------------------------
      const i64 NB = 48;
      for (i64 p0 = 0; p0 < nc; p0 += NB) {
        const i64 pb = std::min(NB, nc - p0);
        for (i64 j = p0; j < p0 + pb; ++j) {
          T dj = F[(size_t)j * nf + j];
          if (absval(dj) < eps) {
            dj = (absval(dj) == 0.0 || std::real(dj) >= 0.0) ? T(eps) : T(-eps);
            F[(size_t)j * nf + j] = dj;
            ++npert;
          }
          const i64 mrem = nc - j - 1;
          if (mrem > 0) {
            T *col = &F[(size_t)j * nf + j + 1];
            const T inv = T(1.0) / dj;
            for (i64 i = 0; i < mrem; ++i) col[i] *= inv;
            // update within panel
            for (i64 jj = j + 1; jj < p0 + pb; ++jj) {
              const T up = F[(size_t)jj * nf + j];
              T *dst = &F[(size_t)jj * nf + j + 1];
              for (i64 i = 0; i < mrem; ++i) dst[i] -= col[i] * up;
            }
          }
        }
        const i64 p1 = p0 + pb;
        const i64 mrem = nc - p1;
        if (mrem > 0) {
          // U-panel: F[p0:p1, p1:nc] = L(p0:p1,p0:p1)^{-1} * F[p0:p1, p1:nc]
          // L block is unit-lower inside F
          std::vector<T> Lblk((size_t)pb * pb);
          for (i64 j = 0; j < pb; ++j)
            for (i64 i = 0; i < pb; ++i)
              Lblk[(size_t)j * pb + i] =
                  (i == j) ? T(1) : (i > j ? F[(size_t)(p0 + j) * nf + p0 + i] : T(0));
          // gather the row-panel into contiguous storage, trsm, scatter back
          std::vector<T> RP((size_t)pb * mrem);
          for (i64 j = 0; j < mrem; ++j)
            for (i64 i = 0; i < pb; ++i)
              RP[(size_t)j * pb + i] = F[(size_t)(p1 + j) * nf + p0 + i];
          Blas<T>::trsm('L', 'L', 'N', 'U', (blasint)pb, (blasint)mrem, T(1),
                        Lblk.data(), (blasint)pb, RP.data(), (blasint)pb);
          for (i64 j = 0; j < mrem; ++j)
            for (i64 i = 0; i < pb; ++i)
              F[(size_t)(p1 + j) * nf + p0 + i] = RP[(size_t)j * pb + i];
          // trailing update: F[p1:, p1:] -= L[p1:, p0:p1] * U[p0:p1, p1:]
          // L-part lives in F[(p0..p1) cols, rows p1:nc]; U-part in RP
          Blas<T>::gemm('N', 'N', (blasint)mrem, (blasint)mrem, (blasint)pb,
                        T(-1), &F[(size_t)p0 * nf + p1], (blasint)nf,
                        RP.data(), (blasint)pb, T(1),
                        &F[(size_t)p1 * nf + p1], (blasint)nf);
        }
      }
      // export L11 (unit lower) and U11 (upper incl diag)
      T *u11 = &U11[l11_off[k]];
      T *u12 = &U12[l21_off[k]];
      for (i64 j = 0; j < nc; ++j) {
        T *dl = &l11[(size_t)j * nc];
        T *du = &u11[(size_t)j * nc];
        for (i64 i = 0; i < nc; ++i) {
          const T v = F[(size_t)j * nf + i];
          dl[i] = (i == j) ? T(1) : (i > j ? v : T(0));
          du[i] = (i <= j) ? v : T(0);
        }
      }
      if (nr > 0) {
        // L21 = F21 * U11^{-1}
        for (i64 j = 0; j < nc; ++j)
          memcpy(&l21[(size_t)j * nr], &F[(size_t)j * nf + nc], sizeof(T) * nr);
        Blas<T>::trsm('R', 'U', 'N', 'N', (blasint)nr, (blasint)nc, T(1),
                      u11, (blasint)nc, l21, (blasint)nr);
        // U12 = L11^{-1} * F12  (F12 = F[0:nc, nc:nf], lda nf)
        for (i64 j = 0; j < nr; ++j)
          memcpy(&u12[(size_t)j * nc], &F[(size_t)(nc + j) * nf], sizeof(T) * nc);
        Blas<T>::trsm('L', 'L', 'N', 'U', (blasint)nc, (blasint)nr, T(1),
                      l11, (blasint)nc, u12, (blasint)nc);
        upd_off[k] = top;
        T *U = &arena[top];
        top += nr * nr;
        for (i64 j = 0; j < nr; ++j)
          memcpy(&U[(size_t)j * nr], &F[(size_t)(nc + j) * nf + nc],
                 sizeof(T) * nr);
        Blas<T>::gemm('N', 'N', (blasint)nr, (blasint)nr, (blasint)nc, T(-1),
                      l21, (blasint)nr, u12, (blasint)nc, T(1), U, (blasint)nr);
      } else {
        upd_off[k] = top;
      }
    }

    if (growth_out) {
      const T *a = &L11[l11_off[k]];
      for (i64 i = 0, e = nc * nc; i < e; ++i) {
        const double v = absval(a[i]);
        if (v > growth) growth = v;
      }
      const T *b = &L21[l21_off[k]];
      for (i64 i = 0, e = nr * nc; i < e; ++i) {
        const double v = absval(b[i]);
        if (v > growth) growth = v;
      }
    }

    for (i64 j = j0; j < j1; ++j) pos_of[j] = -1;
    for (i64 t = r0; t < r1; ++t) pos_of[rows[t]] = -1;
  }
  if (growth_out) *growth_out = growth;
  if (rows_out && pivperm) {
    // descendant scatter targets relabeled to post-pivot positions
    std::vector<i64> g(n);
    for (i64 i = 0; i < n; ++i) g[pivperm[i]] = i;
    for (i64 t = 0; t < rows_ptr[ns]; ++t) rows_out[t] = g[rows[t]];
  }
  return npert;
}

// ---- solve -------------------------------------------------------------------
// small-size manual kernels for the solve sweeps (BLAS dispatch overhead
// dominates at the tiny per-supernode sizes typical after AMD)
template <class T>
static inline void trsv_lnu(i64 n, const T *L, T *x) {  // unit-lower, no-T
  for (i64 j = 0; j < n; ++j) {
    const T xj = x[j];
    const T *col = &L[(size_t)j * n];
    for (i64 i = j + 1; i < n; ++i) x[i] -= col[i] * xj;
  }
}
template <class T>
static inline void trsv_ltu(i64 n, const T *L, T *x) {  // unit-lower, T
  for (i64 j = n - 1; j >= 0; --j) {
    T acc = x[j];
    const T *col = &L[(size_t)j * n];
    for (i64 i = j + 1; i < n; ++i) acc -= col[i] * x[i];
    x[j] = acc;
  }
}
template <class T>
static inline void gemv_n(i64 m, i64 n, const T *A, const T *x, T *y) {
  // y += A x, A (m x n) col-major
  for (i64 j = 0; j < n; ++j) {
    const T xj = x[j];
    if (xj == T(0)) continue;
    const T *col = &A[(size_t)j * m];
    for (i64 i = 0; i < m; ++i) y[i] += col[i] * xj;
  }
}
template <class T>
static inline void gemv_t(i64 m, i64 n, const T *A, const T *x, T *y) {
  // y += A^T x, A (m x n) col-major
  for (i64 j = 0; j < n; ++j) {
    const T *col = &A[(size_t)j * m];
    T acc = T(0);
    for (i64 i = 0; i < m; ++i) acc += col[i] * x[i];
    y[j] += acc;
  }
}
static constexpr i64 kSmallSolve = 8192;

template <class T>
static void solve_impl(
    i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr, const i64 *rows,
    const i64 *l11_off, const i64 *l21_off,
    const T *L11, const T *L21, const T *D, const T *U11, const T *U12,
    int kind, int transpose, T *y /* permuted rhs, in-out */,
    const T *Dsub = nullptr /* 2x2 subdiagonals from the BK kind */,
    const i64 *rowsU = nullptr /* COLUMN-space labels for the U sweeps:
    within-front LU pivoting permutes ROW positions only, so the L sweeps
    scatter/gather by the relabeled rows while the U sweeps keep the
    original column labels (defaults to rows) */) {
  if (!rowsU) rowsU = rows;
  std::vector<T> tmp;
  if (kind == 0 || !transpose) {
    // forward with L
    for (i64 k = 0; k < ns; ++k) {
      const i64 j0 = snode_ptr[k], nc = snode_ptr[k + 1] - j0;
      const i64 r0 = rows_ptr[k], nr = rows_ptr[k + 1] - r0;
      if (nc * nc <= kSmallSolve)
        trsv_lnu(nc, &L11[l11_off[k]], &y[j0]);
      else
        Blas<T>::trsv('L', 'N', 'U', (blasint)nc, &L11[l11_off[k]], (blasint)nc,
                      &y[j0], 1);
      if (nr > 0) {
        tmp.assign((size_t)nr, T(0));
        if (nr * nc <= kSmallSolve)
          gemv_n(nr, nc, &L21[l21_off[k]], &y[j0], tmp.data());
        else
          Blas<T>::gemv('N', (blasint)nr, (blasint)nc, T(1), &L21[l21_off[k]],
                        (blasint)nr, &y[j0], 1, T(0), tmp.data(), 1);
        for (i64 t = 0; t < nr; ++t) y[rows[r0 + t]] -= tmp[t];
      }
      if (kind == 0) {
        for (i64 j = 0; j < nc; ++j) {
          if (Dsub && Dsub[j0 + j] != T(0)) {
            // BK 2x2 block (j, j+1)
            const T a = D[j0 + j], b = Dsub[j0 + j], c = D[j0 + j + 1];
            const T det = a * c - b * b;
            const T r0v = y[j0 + j], r1v = y[j0 + j + 1];
            y[j0 + j] = (c * r0v - b * r1v) / det;
            y[j0 + j + 1] = (a * r1v - b * r0v) / det;
            ++j;
          } else {
            y[j0 + j] /= D[j0 + j];
          }
        }
      }
    }
  } else {
    // LU transpose: forward with U^T (lower, non-unit); off-block U12^T.
    // Small fronts take the hand kernels like every other sweep — after
    // AMD a 2D mesh has thousands of ~12-wide supernodes where BLAS
    // dispatch overhead dominates.
    for (i64 k = 0; k < ns; ++k) {
      const i64 j0 = snode_ptr[k], nc = snode_ptr[k + 1] - j0;
      const i64 r0 = rows_ptr[k], nr = rows_ptr[k + 1] - r0;
      if (nc * nc <= kSmallSolve) {
        // non-unit U^T forward substitution (col-major U11)
        const T *U0 = &U11[l11_off[k]];
        for (i64 j = 0; j < nc; ++j) {
          const T *col = &U0[(size_t)j * nc];
          T acc = y[j0 + j];
          for (i64 i = 0; i < j; ++i) acc -= col[i] * y[j0 + i];
          y[j0 + j] = acc / col[j];
        }
      } else
        Blas<T>::trsv('U', 'T', 'N', (blasint)nc, &U11[l11_off[k]],
                      (blasint)nc, &y[j0], 1);
      if (nr > 0) {
        tmp.assign((size_t)nr, T(0));
        // y[rows] -= U12^T y[j0:j1]: U12 is (nc x nr) col-major
        if (nr * nc <= kSmallSolve)
          gemv_t(nc, nr, &U12[l21_off[k]], &y[j0], tmp.data());
        else
          Blas<T>::gemv('T', (blasint)nc, (blasint)nr, T(1), &U12[l21_off[k]],
                        (blasint)nc, &y[j0], 1, T(0), tmp.data(), 1);
        for (i64 t = 0; t < nr; ++t) y[rowsU[r0 + t]] -= tmp[t];
      }
    }
  }

  if (kind == 0 || transpose) {
    // backward with L^T
    for (i64 k = ns - 1; k >= 0; --k) {
      const i64 j0 = snode_ptr[k], nc = snode_ptr[k + 1] - j0;
      const i64 r0 = rows_ptr[k], nr = rows_ptr[k + 1] - r0;
      if (nr > 0) {
        tmp.assign((size_t)nr, T(0));
        for (i64 t = 0; t < nr; ++t) tmp[t] = y[rows[r0 + t]];
        if (nr * nc <= kSmallSolve) {
          // y[j0:] -= L21^T tmp
          for (i64 j = 0; j < nc; ++j) {
            const T *col = &L21[l21_off[k] + (size_t)j * nr];
            T acc = T(0);
            for (i64 i = 0; i < nr; ++i) acc += col[i] * tmp[i];
            y[j0 + j] -= acc;
          }
        } else
          Blas<T>::gemv('T', (blasint)nr, (blasint)nc, T(-1), &L21[l21_off[k]],
                        (blasint)nr, tmp.data(), 1, T(1), &y[j0], 1);
      }
      if (nc * nc <= kSmallSolve)
        trsv_ltu(nc, &L11[l11_off[k]], &y[j0]);
      else
        Blas<T>::trsv('L', 'T', 'U', (blasint)nc, &L11[l11_off[k]], (blasint)nc,
                      &y[j0], 1);
    }
  } else {
    // backward with U
    for (i64 k = ns - 1; k >= 0; --k) {
      const i64 j0 = snode_ptr[k], nc = snode_ptr[k + 1] - j0;
      const i64 r0 = rows_ptr[k], nr = rows_ptr[k + 1] - r0;
      if (nr > 0) {
        tmp.assign((size_t)nr, T(0));
        for (i64 t = 0; t < nr; ++t) tmp[t] = y[rowsU[r0 + t]];
        if (nr * nc <= kSmallSolve) {
          // y[j0:] -= U12 tmp (U12 is (nc x nr) col-major)
          for (i64 j = 0; j < nr; ++j) {
            const T tj = tmp[j];
            if (tj == T(0)) continue;
            const T *col = &U12[l21_off[k] + (size_t)j * nc];
            for (i64 i = 0; i < nc; ++i) y[j0 + i] -= col[i] * tj;
          }
        } else
          Blas<T>::gemv('N', (blasint)nc, (blasint)nr, T(-1), &U12[l21_off[k]],
                        (blasint)nc, tmp.data(), 1, T(1), &y[j0], 1);
      }
      if (nc * nc <= kSmallSolve) {
        // non-unit upper backward substitution
        const T *U0 = &U11[l11_off[k]];
        for (i64 j = nc - 1; j >= 0; --j) {
          const T xj = y[j0 + j] / U0[(size_t)j * nc + j];
          y[j0 + j] = xj;
          const T *col = &U0[(size_t)j * nc];
          for (i64 i = 0; i < j; ++i) y[j0 + i] -= col[i] * xj;
        }
      } else
        Blas<T>::trsv('U', 'N', 'N', (blasint)nc, &U11[l11_off[k]], (blasint)nc,
                      &y[j0], 1);
    }
  }
}

// ---- multi-RHS solve ----------------------------------------------------------
// Y is (n, k) ROW-major (numpy C order): per global row, k contiguous values.
// Large blocks go through BLAS level-3 using the row-major == transposed-
// col-major identity (Y_rm(n,k) == Y^T_cm(k,n)); small blocks use manual
// kernels whose inner loop runs contiguously over the k RHS columns.
// This replaces the reference's per-column RHS loop with one gemm-based
// sweep (MUMPS gathers the whole RHS once, mumps_factorization.jl:291-353).

template <class T>
static inline void trsm_lnu_rm(i64 n, i64 k, const T *L, T *Y) {
  for (i64 j = 0; j < n; ++j) {
    const T *col = &L[(size_t)j * n];
    const T *yj = &Y[(size_t)j * k];
    for (i64 i = j + 1; i < n; ++i) {
      const T lij = col[i];
      if (lij == T(0)) continue;
      T *yi = &Y[(size_t)i * k];
      for (i64 c = 0; c < k; ++c) yi[c] -= lij * yj[c];
    }
  }
}
template <class T>
static inline void trsm_ltu_rm(i64 n, i64 k, const T *L, T *Y) {
  for (i64 j = n - 1; j >= 0; --j) {
    const T *col = &L[(size_t)j * n];
    T *yj = &Y[(size_t)j * k];
    for (i64 i = j + 1; i < n; ++i) {
      const T lij = col[i];
      if (lij == T(0)) continue;
      const T *yi = &Y[(size_t)i * k];
      for (i64 c = 0; c < k; ++c) yj[c] -= lij * yi[c];
    }
  }
}
// Tm (m,k) rm += A (m x n, col-major) @ X (n,k) rm
template <class T>
static inline void gemm_n_rm(i64 m, i64 n, i64 k, const T *A, const T *X, T *Tm) {
  for (i64 j = 0; j < n; ++j) {
    const T *col = &A[(size_t)j * m];
    const T *xj = &X[(size_t)j * k];
    for (i64 i = 0; i < m; ++i) {
      const T a = col[i];
      if (a == T(0)) continue;
      T *ti = &Tm[(size_t)i * k];
      for (i64 c = 0; c < k; ++c) ti[c] += a * xj[c];
    }
  }
}
// Y (n,k) rm -= A^T (A is m x n col-major) @ Tm (m,k) rm
template <class T>
static inline void gemm_t_sub_rm(i64 m, i64 n, i64 k, const T *A, const T *Tm,
                                 T *Y) {
  for (i64 j = 0; j < n; ++j) {
    const T *col = &A[(size_t)j * m];
    T *yj = &Y[(size_t)j * k];
    for (i64 i = 0; i < m; ++i) {
      const T a = col[i];
      if (a == T(0)) continue;
      const T *ti = &Tm[(size_t)i * k];
      for (i64 c = 0; c < k; ++c) yj[c] -= a * ti[c];
    }
  }
}

template <class T>
static void solve_multi_impl(
    i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr, const i64 *rows,
    const i64 *l11_off, const i64 *l21_off,
    const T *L11, const T *L21, const T *D, const T *U11, const T *U12,
    int kind, int transpose, i64 k, T *Y /* (n,k) rm, permuted, in-out */,
    const T *Dsub = nullptr, const i64 *rowsU = nullptr) {
  if (!rowsU) rowsU = rows;
  std::vector<T> tmp;
  const blasint kb = (blasint)k;
  if (kind == 0 || !transpose) {
    // forward with L (unit-lower)
    for (i64 s = 0; s < ns; ++s) {
      const i64 j0 = snode_ptr[s], nc = snode_ptr[s + 1] - j0;
      const i64 r0 = rows_ptr[s], nr = rows_ptr[s + 1] - r0;
      T *Yb = &Y[(size_t)j0 * k];
      if (nc * nc * k <= kSmallSolve)
        trsm_lnu_rm(nc, k, &L11[l11_off[s]], Yb);
      else  // X^T L^T = Y^T  (col-major view)
        Blas<T>::trsm('R', 'L', 'T', 'U', kb, (blasint)nc, T(1),
                      &L11[l11_off[s]], (blasint)nc, Yb, kb);
      if (nr > 0) {
        tmp.assign((size_t)nr * k, T(0));
        if (nr * nc * k <= kSmallSolve)
          gemm_n_rm(nr, nc, k, &L21[l21_off[s]], Yb, tmp.data());
        else  // tmp^T = Y^T L21^T
          Blas<T>::gemm('N', 'T', kb, (blasint)nr, (blasint)nc, T(1), Yb, kb,
                        &L21[l21_off[s]], (blasint)nr, T(0), tmp.data(), kb);
        for (i64 t = 0; t < nr; ++t) {
          T *yr = &Y[(size_t)rows[r0 + t] * k];
          const T *tt = &tmp[(size_t)t * k];
          for (i64 c = 0; c < k; ++c) yr[c] -= tt[c];
        }
      }
      if (kind == 0)
        for (i64 j = 0; j < nc; ++j) {
          if (Dsub && Dsub[j0 + j] != T(0)) {
            const T a = D[j0 + j], b = Dsub[j0 + j], cc = D[j0 + j + 1];
            const T det = a * cc - b * b;
            T *y0 = &Y[(size_t)(j0 + j) * k];
            T *y1 = &Y[(size_t)(j0 + j + 1) * k];
            for (i64 c = 0; c < k; ++c) {
              const T r0v = y0[c], r1v = y1[c];
              y0[c] = (cc * r0v - b * r1v) / det;
              y1[c] = (a * r1v - b * r0v) / det;
            }
            ++j;
            continue;
          }
          const T d = D[j0 + j];
          T *yj = &Y[(size_t)(j0 + j) * k];
          for (i64 c = 0; c < k; ++c) yj[c] /= d;
        }
    }
  } else {
    // LU transpose forward: U^T (lower, non-unit), off-block U12^T
    for (i64 s = 0; s < ns; ++s) {
      const i64 j0 = snode_ptr[s], nc = snode_ptr[s + 1] - j0;
      const i64 r0 = rows_ptr[s], nr = rows_ptr[s + 1] - r0;
      T *Yb = &Y[(size_t)j0 * k];
      // X^T U = Y^T (col-major view of X U^T... = trsm R,U,N? careful):
      // solve U^T X = Y -> X^T U = Y^T: side=R, uplo=U, trans=N, diag=N
      Blas<T>::trsm('R', 'U', 'N', 'N', kb, (blasint)nc, T(1),
                    &U11[l11_off[s]], (blasint)nc, Yb, kb);
      if (nr > 0) {
        tmp.assign((size_t)nr * k, T(0));
        // tmp = U12^T Yb: U12 is (nc x nr) cm -> tmp^T = Y^T U12
        Blas<T>::gemm('N', 'N', kb, (blasint)nr, (blasint)nc, T(1), Yb, kb,
                      &U12[l21_off[s]], (blasint)nc, T(0), tmp.data(), kb);
        for (i64 t = 0; t < nr; ++t) {
          T *yr = &Y[(size_t)rowsU[r0 + t] * k];
          const T *tt = &tmp[(size_t)t * k];
          for (i64 c = 0; c < k; ++c) yr[c] -= tt[c];
        }
      }
    }
  }

  if (kind == 0 || transpose) {
    // backward with L^T (unit)
    for (i64 s = ns - 1; s >= 0; --s) {
      const i64 j0 = snode_ptr[s], nc = snode_ptr[s + 1] - j0;
      const i64 r0 = rows_ptr[s], nr = rows_ptr[s + 1] - r0;
      T *Yb = &Y[(size_t)j0 * k];
      if (nr > 0) {
        tmp.assign((size_t)nr * k, T(0));
        for (i64 t = 0; t < nr; ++t) {
          const T *yr = &Y[(size_t)rows[r0 + t] * k];
          T *tt = &tmp[(size_t)t * k];
          for (i64 c = 0; c < k; ++c) tt[c] = yr[c];
        }
        if (nr * nc * k <= kSmallSolve)
          gemm_t_sub_rm(nr, nc, k, &L21[l21_off[s]], tmp.data(), Yb);
        else  // Y^T -= tmp^T L21
          Blas<T>::gemm('N', 'N', kb, (blasint)nc, (blasint)nr, T(-1),
                        tmp.data(), kb, &L21[l21_off[s]], (blasint)nr, T(1),
                        Yb, kb);
      }
      if (nc * nc * k <= kSmallSolve)
        trsm_ltu_rm(nc, k, &L11[l11_off[s]], Yb);
      else  // X^T L = Y^T
        Blas<T>::trsm('R', 'L', 'N', 'U', kb, (blasint)nc, T(1),
                      &L11[l11_off[s]], (blasint)nc, Yb, kb);
    }
  } else {
    // backward with U (non-unit upper); off-block U12
    for (i64 s = ns - 1; s >= 0; --s) {
      const i64 j0 = snode_ptr[s], nc = snode_ptr[s + 1] - j0;
      const i64 r0 = rows_ptr[s], nr = rows_ptr[s + 1] - r0;
      T *Yb = &Y[(size_t)j0 * k];
      if (nr > 0) {
        tmp.assign((size_t)nr * k, T(0));
        for (i64 t = 0; t < nr; ++t) {
          const T *yr = &Y[(size_t)rowsU[r0 + t] * k];
          T *tt = &tmp[(size_t)t * k];
          for (i64 c = 0; c < k; ++c) tt[c] = yr[c];
        }
        // Y -= U12 tmp (U12 (nc x nr) cm): Y^T -= tmp^T U12^T
        Blas<T>::gemm('N', 'T', kb, (blasint)nc, (blasint)nr, T(-1),
                      tmp.data(), kb, &U12[l21_off[s]], (blasint)nc, T(1), Yb,
                      kb);
      }
      // X^T U^T = Y^T: side=R, uplo=U, trans=T, diag=N
      Blas<T>::trsm('R', 'U', 'T', 'N', kb, (blasint)nc, T(1),
                    &U11[l11_off[s]], (blasint)nc, Yb, kb);
    }
  }
}

// ---- C ABI -------------------------------------------------------------------
extern "C" {

// max |v| over two value arrays in one pass — the factor-growth monitor
// (api.py:_factor_growth). One fused C++ scan replaces two numpy
// abs().max() temporaries per refactorization on the hot headline loop.
double mf_absmax2_d(const double *a, i64 na, const double *b, i64 nb) {
  double m = 0.0;
  for (i64 i = 0; i < na; ++i) { const double v = std::fabs(a[i]); if (v > m) m = v; }
  for (i64 i = 0; i < nb; ++i) { const double v = std::fabs(b[i]); if (v > m) m = v; }
  return m;
}
double mf_absmax2_z(const cd *a, i64 na, const cd *b, i64 nb) {
  double m = 0.0;
  for (i64 i = 0; i < na; ++i) { const double v = std::abs(a[i]); if (v > m) m = v; }
  for (i64 i = 0; i < nb; ++i) { const double v = std::abs(b[i]); if (v > m) m = v; }
  return m;
}

i64 mf_factorize_d(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                   const i64 *rows, const i64 *sparent, const i64 *Ap,
                   const i64 *Ai, const double *Ax, const i64 *l11_off,
                   const i64 *l21_off, double *L11, double *L21, double *D,
                   double *U11, double *U12, int kind, double eps,
                   double *growth_out) {
  return factorize_full<double>(n, ns, snode_ptr, rows_ptr, rows, sparent, Ap,
                                Ai, Ax, l11_off, l21_off, L11, L21, D, U11,
                                U12, kind, eps, nullptr, nullptr, nullptr,
                                growth_out);
}

i64 mf_factorize_z(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                   const i64 *rows, const i64 *sparent, const i64 *Ap,
                   const i64 *Ai, const cd *Ax, const i64 *l11_off,
                   const i64 *l21_off, cd *L11, cd *L21, cd *D, cd *U11,
                   cd *U12, int kind, double eps, double *growth_out) {
  return factorize_full<cd>(n, ns, snode_ptr, rows_ptr, rows, sparent, Ap, Ai,
                            Ax, l11_off, l21_off, L11, L21, D, U11, U12, kind,
                            eps, nullptr, nullptr, nullptr, growth_out);
}

void mf_solve_d(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                const double *L11, const double *L21, const double *D,
                const double *U11, const double *U12, int kind, int transpose,
                double *y) {
  solve_impl<double>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off, L11,
                     L21, D, U11, U12, kind, transpose, y);
}

void mf_solve_z(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                const cd *L11, const cd *L21, const cd *D, const cd *U11,
                const cd *U12, int kind, int transpose, cd *y) {
  solve_impl<cd>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off, L11, L21,
                 D, U11, U12, kind, transpose, y);
}

void mf_solve_multi_d(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                      const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                      const double *L11, const double *L21, const double *D,
                      const double *U11, const double *U12, int kind,
                      int transpose, i64 k, double *Y) {
  solve_multi_impl<double>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off,
                           L11, L21, D, U11, U12, kind, transpose, k, Y);
}

void mf_solve_multi_z(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                      const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                      const cd *L11, const cd *L21, const cd *D, const cd *U11,
                      const cd *U12, int kind, int transpose, i64 k, cd *Y) {
  solve_multi_impl<cd>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off, L11,
                       L21, D, U11, U12, kind, transpose, k, Y);
}

i64 mf_factorize_piv_d(i64 n, i64 ns, const i64 *snode_ptr,
                       const i64 *rows_ptr, const i64 *rows,
                       const i64 *sparent, const i64 *Ap, const i64 *Ai,
                       const double *Ax, const i64 *l11_off,
                       const i64 *l21_off, double *L11, double *L21,
                       double *D, double *U11, double *U12, int kind,
                       double eps, double *Dsub, i64 *pivperm,
                       i64 *rows_out, double *growth_out) {
  return factorize_full<double>(n, ns, snode_ptr, rows_ptr, rows, sparent,
                                Ap, Ai, Ax, l11_off, l21_off, L11, L21, D,
                                U11, U12, kind, eps, Dsub, pivperm, rows_out,
                                growth_out);
}

i64 mf_factorize_piv_z(i64 n, i64 ns, const i64 *snode_ptr,
                       const i64 *rows_ptr, const i64 *rows,
                       const i64 *sparent, const i64 *Ap, const i64 *Ai,
                       const cd *Ax, const i64 *l11_off, const i64 *l21_off,
                       cd *L11, cd *L21, cd *D, cd *U11, cd *U12, int kind,
                       double eps, cd *Dsub, i64 *pivperm, i64 *rows_out,
                       double *growth_out) {
  return factorize_full<cd>(n, ns, snode_ptr, rows_ptr, rows, sparent, Ap,
                            Ai, Ax, l11_off, l21_off, L11, L21, D, U11, U12,
                            kind, eps, Dsub, pivperm, rows_out, growth_out);
}

void mf_solve_piv_d(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                    const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                    const double *L11, const double *L21, const double *D,
                    const double *U11, const double *U12, int kind,
                    int transpose, double *y, const double *Dsub,
                    const i64 *rowsU) {
  solve_impl<double>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off, L11,
                     L21, D, U11, U12, kind, transpose, y, Dsub, rowsU);
}

void mf_solve_piv_z(i64 n, i64 ns, const i64 *snode_ptr, const i64 *rows_ptr,
                    const i64 *rows, const i64 *l11_off, const i64 *l21_off,
                    const cd *L11, const cd *L21, const cd *D, const cd *U11,
                    const cd *U12, int kind, int transpose, cd *y,
                    const cd *Dsub, const i64 *rowsU) {
  solve_impl<cd>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off, L11,
                 L21, D, U11, U12, kind, transpose, y, Dsub, rowsU);
}

void mf_solve_multi_piv_d(i64 n, i64 ns, const i64 *snode_ptr,
                          const i64 *rows_ptr, const i64 *rows,
                          const i64 *l11_off, const i64 *l21_off,
                          const double *L11, const double *L21,
                          const double *D, const double *U11,
                          const double *U12, int kind, int transpose, i64 k,
                          double *Y, const double *Dsub,
                          const i64 *rowsU) {
  solve_multi_impl<double>(n, ns, snode_ptr, rows_ptr, rows, l11_off,
                           l21_off, L11, L21, D, U11, U12, kind, transpose,
                           k, Y, Dsub, rowsU);
}

void mf_solve_multi_piv_z(i64 n, i64 ns, const i64 *snode_ptr,
                          const i64 *rows_ptr, const i64 *rows,
                          const i64 *l11_off, const i64 *l21_off,
                          const cd *L11, const cd *L21, const cd *D,
                          const cd *U11, const cd *U12, int kind,
                          int transpose, i64 k, cd *Y, const cd *Dsub) {
  solve_multi_impl<cd>(n, ns, snode_ptr, rows_ptr, rows, l11_off, l21_off,
                       L11, L21, D, U11, U12, kind, transpose, k, Y, Dsub);
}

}  // extern "C"

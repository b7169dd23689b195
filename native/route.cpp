// Native route builder for the Pallas static-shuffle gather engine.
//
// Role: the plan-construction phase of the general-sparsity SpMV tier
// (the reference's MatrixPlan/VectorPlan handshake construction,
// /root/reference/src/sparse.jl:579-850 — here a purely local
// computation). The numpy implementation (hpclinalg/ops/shuffle_router.py
// build_route) is the readable oracle; this is the same algorithm as
// fused linear passes over radix-sorted streams: ~100 s of numpy churn at
// 8M emissions becomes a few seconds.
//
// Output format: the UNIFORM-geometry tables PackedRoute consumes
// (regions strided by pow2 RAu, staging by 8-aligned RBu), so the Python
// side only packs CG tables and uploads.
//
// Two-call ABI (handle-based):
//   route_build(ndest, nsrc, src_of, geom_out[16]) -> handle
//   route_export(handle, ...table pointers...)
//   route_free(handle)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <chrono>
#include <vector>
#include <sys/mman.h>

namespace {

// HPCLINALG_ROUTE_DEBUG=1: per-section wall times to stderr
struct SectTimer {
    bool on;
    std::chrono::high_resolution_clock::time_point t0;
    SectTimer() : on(getenv("HPCLINALG_ROUTE_DEBUG") != nullptr),
                  t0(std::chrono::high_resolution_clock::now()) {}
    void lap(const char* name) {
        if (!on) return;
        auto t1 = std::chrono::high_resolution_clock::now();
        fprintf(stderr, "[route] %-12s %.3f s\n", name,
                std::chrono::duration<double>(t1 - t0).count());
        t0 = t1;
    }
};

constexpr int64_t LANES = 128;
constexpr int64_t SC = 512;
constexpr int64_t DCH = 128 * 128;
constexpr int64_t KA = 6;
constexpr int64_t KB1 = 5;
constexpr int64_t KB2 = 5;
constexpr int64_t SUB = 512;

using i64 = int64_t;
using i32 = int32_t;
using i16 = int16_t;
using u8 = uint8_t;
using i8 = int8_t;

// LSD radix argsort (stable) of idx by keys[idx].
//
// Fast path: when key-bits + position-bits fit in 64, sort PACKED
// (key << pb | position) pairs with 16-bit digits — every pass streams
// the pair array sequentially instead of chasing keys[idx[i]] through
// 64 MB of random reads (the byte-wise indirect sort measured as the
// dominant cost of the 8M-emission route build).
void radix_argsort(const std::vector<i64>& keys, std::vector<i64>& idx,
                   i64 maxkey) {
    const size_t n = idx.size();
    if (n == 0) return;
    typedef unsigned long long u64;
    int kb = 1;
    while (kb < 63 && (maxkey >> kb) > 0) kb++;
    int pb = 1;
    while ((size_t(1) << pb) < n) pb++;
    if (kb + pb <= 64) {
        std::vector<u64> a(n), tmp(n);
        for (size_t i = 0; i < n; i++)
            a[i] = ((u64)keys[idx[i]] << pb) | (u64)i;
        const int totbits = kb + pb;
        std::vector<i64> cnt(1 << 16);
        for (int sh = 0; sh < totbits; sh += 16) {
            std::fill(cnt.begin(), cnt.end(), 0);
            for (size_t i = 0; i < n; i++) cnt[(a[i] >> sh) & 0xffff]++;
            i64 run = 0;
            for (i64 v = 0; v < (1 << 16); v++) { i64 c = cnt[v]; cnt[v] = run; run += c; }
            for (size_t i = 0; i < n; i++)
                tmp[cnt[(a[i] >> sh) & 0xffff]++] = a[i];
            a.swap(tmp);
        }
        const u64 mask = ((u64)1 << pb) - 1;
        std::vector<i64> src(idx);
        for (size_t j = 0; j < n; j++) idx[j] = src[a[j] & mask];
        return;
    }
    int nbytes = 1;
    while (nbytes < 8 && (maxkey >> (8 * nbytes)) > 0) nbytes++;
    std::vector<i64> tmp(n);
    std::vector<i64> cnt(256);
    for (int b = 0; b < nbytes; b++) {
        std::fill(cnt.begin(), cnt.end(), 0);
        const int sh = 8 * b;
        for (size_t i = 0; i < n; i++) cnt[(keys[idx[i]] >> sh) & 0xff]++;
        i64 run = 0;
        for (int v = 0; v < 256; v++) { i64 c = cnt[v]; cnt[v] = run; run += c; }
        for (size_t i = 0; i < n; i++)
            tmp[cnt[(keys[idx[i]] >> sh) & 0xff]++] = idx[i];
        idx.swap(tmp);
    }
}

// Adaptive bank CAP (table diet): almost all emissions land in banks 0-1,
// but a single bank-(K-1) element anywhere forces K table banks AND K
// masked kernel passes. Pick the smallest cap whose overflow fits in the
// COO spill epilogue budget (1/600 of total emissions per stage).
i64 bank_cap(const std::vector<u8>& bank, const std::vector<u8>& dead,
             i64 ne_total, i64 K) {
    std::vector<i64> hist(K + 1, 0);
    for (size_t i = 0; i < bank.size(); i++)
        if (!dead[i]) hist[std::min<i64>(bank[i], K - 1)]++;
    i64 over = 0, cap = 1;
    for (i64 c = K; c >= 2; c--) {
        over += hist[c - 1];
        if (over * 600 > ne_total) { cap = c; break; }
    }
    if (getenv("HPCLINALG_ROUTE_DEBUG")) {
        fprintf(stderr, "bank_cap K=%lld cap=%lld hist:", (long long)K,
                (long long)cap);
        for (i64 b = 0; b < K; b++)
            fprintf(stderr, " %lld", (long long)hist[b]);
        fprintf(stderr, "\n");
    }
    return cap;
}

// calloc-backed buffer: zero-initialized tables get kernel zero pages
// that are never touched until the sparse sweep-2 writes (std::vector's
// value-init faulted+wrote ~250 MB of pages: 1.2 s of the cold build).
template <class T> struct CBuf {
    T* p = nullptr;
    size_t cnt = 0, bytes = 0;
    CBuf() = default;
    CBuf(const CBuf&) = delete;
    CBuf& operator=(const CBuf&) = delete;
    ~CBuf() { if (p) munmap(p, bytes); }
    void alloc(size_t n) {
        if (p) munmap(p, bytes);
        cnt = n;
        bytes = (n * sizeof(T) + 4095) & ~size_t(4095);
        if (!bytes) bytes = 4096;
        p = (T*)mmap(nullptr, bytes, PROT_READ | PROT_WRITE,
                     MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        madvise(p, bytes, MADV_HUGEPAGE);  // 512x fewer first-touch faults
    }
    void assign0(size_t n) { alloc(n); }   // anonymous mmap is zero-filled
    void assign_byte(size_t n, int byte) {
        alloc(n);
        std::memset(p, byte, n * sizeof(T));
    }
    T* data() { return p; }
    const T* data() const { return p; }
    size_t size() const { return cnt; }
    T& operator[](size_t i) { return p[i]; }
    const T& operator[](size_t i) const { return p[i]; }
};

struct Route {
    i64 ne, T1, n_sc, C2, gamma, cpg, RAu, nsub, RBu, nrows_bin;
    i64 KAe, KB1e, KB2e;         // live bank counts (adaptive table diet)
    // pass A tables
    std::vector<i32> win;        // (n_sc)
    std::vector<i8> win_rel;     // (T1)
    CBuf<i8> M;                  // (T1, 128)
    CBuf<i8> SA;                 // (n_sc, KA, SC, 128); exported (.., KAe, ..)
    CBuf<i16> A_brow;            // (n_sc, gamma*RAu, 128)
    CBuf<u8> A_bank;             // (n_sc, gamma*RAu, 128)
    // pass B tables (uniform RBu stride)
    CBuf<i8> S1;                 // (gamma, KB1, nsub*SUB, 128); exp KB1e
    CBuf<i16> B1_brow;           // (gamma, nsub, cpg*RBu, 128)
    CBuf<u8> B1_bank;            // (gamma, nsub, cpg*RBu, 128)
    CBuf<i8> S2;                 // (gamma, cpg, KB2, nsub*RBu, 128); exp KB2e
    CBuf<i16> B2_brow;           // (gamma, cpg, 128, 128)
    CBuf<u8> B2_bank;            // (gamma, cpg, 128, 128)
    std::vector<i64> spill_dst, spill_src;
};

// Pack a (lead, rows, 128) (brow, bank) pair into the kernels' transposed
// per-128-row-tile tables (the numpy _pack_cg, done here so Python never
// touches the hundreds-of-MB intermediates — measured 15 s at 8M
// emissions): rel[lead][t][lane][i] = brow[lead][t*128+i][lane] & 127,
// sel = bank * P + (brow >> 7), 255 dead. Also collects the live codes.
void pack_cg(const i16* browp, const u8* bankp,
             i64 lead, i64 rows, i64 P, i8* rel, u8* sel, u8* live) {
    const i64 T = (rows + LANES - 1) / LANES;
    for (i64 l = 0; l < lead; l++) {
        const i16* br = browp + l * rows * LANES;
        const u8* bk = bankp + l * rows * LANES;
        i8* rl = rel + l * T * LANES * LANES;
        u8* sl = sel + l * T * LANES * LANES;
        // rel must stay in [0, 127] even at dead slots: the kernels gather
        // with it unconditionally and mask by sel afterwards
        std::memset(rl, 0, T * LANES * LANES);
        std::memset(sl, 255, T * LANES * LANES);
        for (i64 r = 0; r < rows; r++) {
            const i64 t = r >> 7, i = r & 127;
            for (i64 j = 0; j < LANES; j++) {
                const u8 b = bk[r * LANES + j];
                if (b == 255) continue;
                const i16 v = br[r * LANES + j];
                const u8 code = (u8)(b * P + (v >> 7));
                rl[(t * LANES + j) * LANES + i] = (i8)(v & 127);
                sl[(t * LANES + j) * LANES + i] = code;
                live[code] = 1;
            }
        }
    }
}

}  // namespace

extern "C" {

// pad_n_sc/pad_nsub/force_K*: multi-shard common geometry — the packed
// tables bake tile counts (PS = ceil(nsub*RBu/128)) into selector codes,
// so shard stacking must impose the common geometry BEFORE packing.
void* route_build(i64 ndest, i64 nsrc, const i64* src_of, i64* geom,
                  i64 force_RAu, i64 force_RBu, i64 pad_n_sc, i64 pad_nsub,
                  i64 force_KA, i64 force_KB1, i64 force_KB2) {
    SectTimer ST;
    auto* R = new Route();
    const i64 C2 = std::max<i64>(1, (ndest + DCH - 1) / DCH);
    const i64 cpg = std::min<i64>(C2, 64);
    const i64 gamma = (C2 + cpg - 1) / cpg;
    R->C2 = C2; R->cpg = cpg; R->gamma = gamma;

    // ---- live emissions, stable-sorted by source ------------------------
    std::vector<i64> idx;
    idx.reserve(ndest);
    for (i64 d = 0; d < ndest; d++)
        if (src_of[d] >= 0) idx.push_back(d);
    const i64 ne = (i64)idx.size();
    R->ne = ne;
    {
        std::vector<i64> key(ndest);
        for (i64 d = 0; d < ndest; d++) key[d] = src_of[d];
        radix_argsort(key, idx, nsrc > 0 ? nsrc : 1);
    }
    ST.lap("sort_src");
    std::vector<i64> e_src(ne), e_dst(ne);
    for (i64 i = 0; i < ne; i++) { e_dst[i] = idx[i]; e_src[i] = src_of[idx[i]]; }

    // ---- ce rows: break at window boundaries and every 128 elements ----
    std::vector<i64> e_row(ne), e_lane(ne);
    i64 T1 = 0;
    {
        i64 row = -1, inrow = 0, prev_win = -1;
        for (i64 i = 0; i < ne; i++) {
            const i64 w = e_src[i] / LANES;
            if (w != prev_win || inrow == LANES) { row++; inrow = 0; prev_win = w; }
            e_row[i] = row; e_lane[i] = inrow++;
        }
        T1 = ne ? row + 1 : 1;
    }
    // natural sizes; the FINAL n_sc is fixed only after RAu/nsub (the B1
    // block-select invariant n_sc*RAu == nsub*SUB bakes into the packed
    // selector codes), so pass-A table allocation is deferred
    const i64 n_sc = (T1 + SC - 1) / SC;
    T1 = n_sc * SC;

    ST.lap("ce_rows");
    // ---- per-sc slab base + window spill --------------------------------
    std::vector<i64> row_win(T1, 0);
    std::vector<u8> has_win(T1, 0);
    for (i64 i = 0; i < ne; i++) {
        row_win[e_row[i]] = e_src[i] / LANES;
        has_win[e_row[i]] = 1;
    }
    std::vector<i32> win_n(n_sc, 0);
    std::vector<i8> win_rel_n(T1, 0);
    std::vector<u8> spilled(ne, 0);
    std::vector<u8> bad_row(T1, 0);
    for (i64 s = 0; s < n_sc; s++) {
        i64 base = -1;
        for (i64 r = s * SC; r < (s + 1) * SC; r++)
            if (has_win[r] && (base < 0 || row_win[r] < base)) base = row_win[r];
        if (base < 0) base = 0;
        win_n[s] = (i32)base;
        for (i64 r = s * SC; r < (s + 1) * SC; r++) {
            i64 rel = has_win[r] ? row_win[r] - base : 0;
            if (rel >= LANES) { bad_row[r] = 1; rel = 0; }
            win_rel_n[r] = (i8)rel;
        }
    }
    for (i64 i = 0; i < ne; i++)
        if (bad_row[e_row[i]]) spilled[i] = 1;

    ST.lap("win_spill");
    // ---- pass A: bin by (sc, gamma), rank in stream order ----------------
    // narrow per-element types (i64 -> i32/u8): ~450 MB of per-element
    // working vectors at 8M emissions was measured as several seconds of
    // first-touch+traffic on the cold build
    std::vector<i32> d_gamma(ne), e_sc(ne);
    std::vector<u8> delta(ne);   // d_chunk / gamma < cpg <= 64
    for (i64 i = 0; i < ne; i++) {
        const i64 dc = e_dst[i] / DCH;
        d_gamma[i] = (i32)(dc % gamma);
        delta[i] = (u8)(dc / gamma);
        e_sc[i] = (i32)(e_row[i] / SC);
    }
    // counts and per-gamma max rows
    std::vector<i64> cntA(n_sc * gamma, 0);
    for (i64 i = 0; i < ne; i++)
        if (!spilled[i]) cntA[e_sc[i] * gamma + d_gamma[i]]++;
    std::vector<i64> RA(gamma, 1);
    for (i64 s = 0; s < n_sc; s++)
        for (i64 g = 0; g < gamma; g++) {
            i64 r = (cntA[s * gamma + g] + LANES - 1) / LANES;
            if (r > RA[g]) RA[g] = r;
        }
    i64 RAmax = 1;
    for (i64 g = 0; g < gamma; g++) RAmax = std::max(RAmax, RA[g]);
    i64 RAu = 8;
    while (RAu < RAmax) RAu *= 2;
    RAu = std::min(RAu, SUB);
    if (force_RAu >= RAu) RAu = force_RAu;   // multi-shard common geometry
    R->RAu = RAu;
    i64 nsub = std::max<i64>(
        1, (std::max(n_sc, pad_n_sc) * RAu + SUB - 1) / SUB);
    if (pad_nsub > nsub) nsub = pad_nsub;
    R->nsub = nsub;
    // final padded sc count: nsub*SUB == n_sc_f*RAu exactly, so B1 can
    // block-select any gamma's packed region out of pass A's output
    const i64 n_sc_f = nsub * SUB / RAu;
    R->n_sc = n_sc_f;
    R->T1 = n_sc_f * SC;
    R->win.assign(n_sc_f, 0);
    std::memcpy(R->win.data(), win_n.data(), n_sc * sizeof(i32));
    R->win_rel.assign(n_sc_f * SC, 0);
    std::memcpy(R->win_rel.data(), win_rel_n.data(), T1);
    R->M.assign0(n_sc_f * SC * LANES);
    for (i64 i = 0; i < ne; i++)
        R->M[e_row[i] * LANES + e_lane[i]] = (i8)(e_src[i] % LANES);
    std::vector<i64> RAoff(gamma + 1, 0);
    for (i64 g = 0; g < gamma; g++) RAoff[g + 1] = RAoff[g] + RA[g];

    // rankA within (sc, gamma) in stream order (the stream is already
    // sorted by (e_sc, e_row, e_lane), matching numpy's lexsort)
    std::vector<i32> rankA(ne);
    {
        std::vector<i32> ctr(gamma, 0);
        i64 cur_sc = -1;
        for (i64 i = 0; i < ne; i++) {
            if (e_sc[i] != cur_sc) { std::fill(ctr.begin(), ctr.end(), 0); cur_sc = e_sc[i]; }
            rankA[i] = ctr[d_gamma[i]]++;
        }
    }
    // slot lane PHASED per gamma group: every group's rank sequence
    // starting at lane 0 makes elements of one ce row collide on the low
    // lanes across groups (same slot lane, distinct source lanes -> banks;
    // measured 7% of emissions at bank >= 2 at 1M/gamma=8). Offsetting
    // group g by g*(128/gamma) spreads the groups' lane ranges apart.
    const i64 phase = LANES / std::max<i64>(gamma, 1);
    std::vector<i32> a_row(ne);
    std::vector<u8> a_lane(ne);
    for (i64 i = 0; i < ne; i++) {
        a_row[i] = (i32)(RAoff[d_gamma[i]] + rankA[i] / LANES);
        a_lane[i] = (u8)((rankA[i] + d_gamma[i] * phase) % LANES);
        if (!spilled[i] && rankA[i] / LANES >= RA[d_gamma[i]]) spilled[i] = 1;
    }
    ST.lap("passA_rank");
    // bankA: rank of distinct src lane within (e_row*128 + a_lane).
    // Direct seen-list assignment (one linear pass; the radix argsort this
    // replaces was ~1 s warm / several s cold at 8M emissions). Any
    // bijection distinct-lane -> bank is valid — the kernels read the bank
    // id back from the same tables — so arrival order replaces sorted
    // order; duplicates (same src lane twice in a group) share a bank.
    std::vector<u8> bankA(ne);
    {
        std::vector<u8> seen((size_t)T1 * LANES * KA, 255);
        for (i64 i = 0; i < ne; i++) {
            u8* s = &seen[(size_t)(e_row[i] * LANES + a_lane[i]) * KA];
            const u8 v = (u8)e_lane[i];
            i64 b = 0;
            for (; b < KA; b++) {
                if (s[b] == v) break;
                if (s[b] == 255) { s[b] = v; break; }
            }
            bankA[i] = (u8)b;  // b == KA -> overflow, spills below
        }
    }
    ST.lap("bankA");
    // adaptive bank CAP (table diet): almost all emissions land in banks
    // 0-1, but a single bank-5 element anywhere forces 6 SA banks (and 6
    // masked kernel passes). Pick the smallest cap whose overflow fits in
    // the COO spill epilogue budget (0.1% of emissions per stage).
    const i64 capA = bank_cap(bankA, spilled, ne, KA);
    for (i64 i = 0; i < ne; i++)
        if (!spilled[i] && bankA[i] >= capA) spilled[i] = 1;

    ST.lap("capA");
    R->SA.assign0(n_sc_f * KA * SC * LANES);
    R->A_brow.assign0(n_sc_f * gamma * RAu * LANES);
    R->A_bank.assign_byte(n_sc_f * gamma * RAu * LANES, 255);
    for (i64 i = 0; i < ne; i++) {
        if (spilled[i]) continue;
        const i64 s = e_sc[i];
        // SA layout (n_sc, KA, SC, 128)
        R->SA[((s * KA + bankA[i]) * SC + e_row[i] % SC) * LANES + a_lane[i]] =
            (i8)e_lane[i];
        // uniform region row: g*RAu + (a_row - RAoff[g])
        const i64 ur = d_gamma[i] * RAu + (a_row[i] - RAoff[d_gamma[i]]);
        R->A_brow[(s * gamma * RAu + ur) * LANES + a_lane[i]] =
            (i16)(e_row[i] % SC);
        R->A_bank[(s * gamma * RAu + ur) * LANES + a_lane[i]] = (u8)bankA[i];
    }

    ST.lap("fillA");
    // ---- pass B ----------------------------------------------------------
    // per element: bin_row (uniform stride), sub (delta computed above)
    std::vector<i32> bin_row(ne), subv(ne);
    std::vector<u8> d_lane(ne), d_row(ne);
    for (i64 i = 0; i < ne; i++) {
        bin_row[i] = (i32)(e_sc[i] * RAu + (a_row[i] - RAoff[d_gamma[i]]));
        subv[i] = (i32)(bin_row[i] / SUB);
        d_lane[i] = (u8)(e_dst[i] % LANES);
        d_row[i] = (u8)((e_dst[i] % DCH) / LANES);
    }

    ST.lap("passB_prep");
    // RB computed per gamma then unified: first pass over gammas for counts
    // rr (round-robin rank over final lanes within (gamma, sub, delta))
    // computed with a hash-free two-pass: sort by full key.
    // Work gamma-by-gamma using index lists to bound memory.
    // flat CSR layout (counted fill): 8M vector push_backs measured as a
    // full second of the cold build
    std::vector<i64> goff(gamma + 1, 0);
    std::vector<i32> gel;
    {
        for (i64 i = 0; i < ne; i++) if (!spilled[i]) goff[d_gamma[i] + 1]++;
        for (i64 g = 0; g < gamma; g++) goff[g + 1] += goff[g];
        gel.resize(goff[gamma]);
        std::vector<i64> cur(goff.begin(), goff.end() - 1);
        for (i64 i = 0; i < ne; i++)
            if (!spilled[i]) gel[cur[d_gamma[i]]++] = (i32)i;
    }

    i64 RBu = 1;
    // global RBu: the smallest 8-aligned staging stride whose rank
    // overflow spills <= 0.05% of the emissions. Sizing by the MAX cell
    // count wastes ~2x (max 1047 vs mean 961 on the 1M random case, then
    // 8-rounding: RBu 16 where 8 + a few spills suffices) — staging size,
    // B1 tables and the B1 masked-pass count all scale with RBu.
    {
        std::vector<i64> cntB(nsub * cpg);
        std::vector<i64> allcnt;
        allcnt.reserve(gamma * nsub * cpg);
        for (i64 g = 0; g < gamma; g++) {
            std::fill(cntB.begin(), cntB.end(), 0);
            for (i64 t = goff[g]; t < goff[g + 1]; t++) {
                const i64 i = gel[t];
                cntB[subv[i] * cpg + delta[i]]++;
            }
            for (i64 c : cntB) {
                allcnt.push_back(c);
                RBu = std::max(RBu, (c + LANES - 1) / LANES);
            }
        }
        if (getenv("HPCLINALG_ROUTE_DEBUG")) {
            std::vector<i64> srt(allcnt);
            std::sort(srt.begin(), srt.end());
            const i64 nc_ = (i64)srt.size();
            fprintf(stderr, "[route] cells n=%lld p50=%lld p90=%lld p99=%lld"
                    " top:", (long long)nc_, (long long)srt[nc_ / 2],
                    (long long)srt[nc_ * 9 / 10], (long long)srt[nc_ * 99 / 100]);
            for (i64 t = std::max<i64>(0, nc_ - 8); t < nc_; t++)
                fprintf(stderr, " %lld", (long long)srt[t]);
            fprintf(stderr, "\n");
        }
        RBu = ((RBu + 7) / 8) * 8;  // 8-row DMA granularity
        // rank-overflow budget: accept cand when overflow spills stay
        // under ne/budget (HPCLINALG_ROUTE_RBU_BUDGET, default 100 =
        // 1%). Each halving of RBu halves B1's masked-pass count and
        // the S2 staging tables, at the price of more COO-epilogue adds.
        i64 budget = 100;
        if (const char* e = getenv("HPCLINALG_ROUTE_RBU_BUDGET"))
            budget = atoll(e);
        for (i64 cand = 8; cand < RBu; cand += 8) {
            i64 ov = 0;
            for (i64 c : allcnt) ov += std::max<i64>(0, c - cand * LANES);
            if (getenv("HPCLINALG_ROUTE_DEBUG"))
                fprintf(stderr, "[route] RBu cand=%lld ov=%lld (%.3f%%)\n",
                        (long long)cand, (long long)ov, 100.0 * ov / ne);
            if (ov * budget <= ne) { RBu = cand; break; }
        }
    }
    if (force_RBu >= RBu) RBu = force_RBu;   // multi-shard common geometry
    R->RBu = RBu;

    ST.lap("RBu");
    R->S1.assign0(gamma * KB1 * nsub * SUB * LANES);
    R->B1_brow.assign0(gamma * nsub * cpg * RBu * LANES);
    R->B1_bank.assign_byte(gamma * nsub * cpg * RBu * LANES, 255);
    R->S2.assign0(gamma * cpg * KB2 * nsub * RBu * LANES);
    R->B2_brow.assign0(gamma * cpg * LANES * LANES);
    R->B2_bank.assign_byte(gamma * cpg * LANES * LANES, 255);

    ST.lap("allocB");
    // Sweep 1 (compute): per-gamma ranks, staging coordinates and bank ids
    // are STORED so the adaptive bank caps (cap1/cap2) can be chosen from
    // the global histograms before any table is filled.
    //
    // All four per-gamma quantities are computed by LINEAR counting passes
    // over small dense aux arrays instead of radix argsorts (this sweep's
    // four 1M-element sorts per gamma were the dominant cost of the whole
    // route build - measured 4.2 s warm / 6+ s cold of a ~10 s build):
    //   rr     - dense per-(sub,delta,d_lane) counter in stream order
    //   rankB  - bucket offsets per (sub,delta,rr) + a d_lane-ordered
    //            second pass (rr is a per-lane rank, so (grp,rr,d_lane) is
    //            unique and bucket arrival in d_lane order reproduces the
    //            (rr, d_lane)-sorted rank exactly)
    //   bank1/bank2 - seen-lane lists per group in arrival order (any
    //            distinct-lane -> bank bijection is valid, as for bankA)
    std::vector<std::vector<i32>> G_brow(gamma), G_blane(gamma),
        G_bank1(gamma), G_stg(gamma), G_bank2(gamma);
    i64 hist1[KB1 + 1] = {0}, hist2[KB2 + 1] = {0};
    {
        const i64 NKEY = nsub * cpg * LANES;     // (sub, delta, d_lane)
        const i64 NGRP = nsub * cpg;             // (sub, delta)
        const i64 CAPR = RBu * LANES;            // rr >= CAPR spills anyway
        std::vector<i32> ctr(NKEY), cntR((size_t)NGRP * CAPR);
        std::vector<i32> rr, rankB, dlorder;
        std::vector<i64> dl_off(LANES + 1);
        std::vector<u8> seen1((size_t)nsub * SUB * LANES * KB1);
        std::vector<u8> seen2((size_t)cpg * nsub * RBu * LANES * KB2);
        for (i64 g = 0; g < gamma; g++) {
            const i32* el = gel.data() + goff[g];
            const i64 m = goff[g + 1] - goff[g];
            if (!m) continue;
            rr.resize(m); rankB.resize(m); dlorder.resize(m);
            // rr + per-key counts (stream order)
            std::fill(ctr.begin(), ctr.end(), 0);
            for (i64 j = 0; j < m; j++) {
                const i64 i = el[j];
                const i64 k = (subv[i] * cpg + delta[i]) * LANES + d_lane[i];
                rr[j] = ctr[k]++;
            }
            // cntR[grp][r] = #lanes in grp with count > r (r < CAPR)
            std::fill(cntR.begin(), cntR.end(), 0);
            for (i64 k = 0; k < NKEY; k++) {
                const i64 c = std::min<i64>(ctr[k], CAPR);
                i32* base = &cntR[(size_t)(k / LANES) * CAPR];
                for (i64 r = 0; r < c; r++) base[r]++;
            }
            // exclusive prefix per grp -> bucket start offsets
            for (i64 grp = 0; grp < NGRP; grp++) {
                i32* base = &cntR[(size_t)grp * CAPR];
                i32 run = 0;
                for (i64 r = 0; r < CAPR; r++) {
                    const i32 c = base[r];
                    base[r] = run;
                    run += c;
                }
            }
            // d_lane-ordered traversal (stable counting sort, 128 buckets)
            std::fill(dl_off.begin(), dl_off.end(), 0);
            for (i64 j = 0; j < m; j++) dl_off[d_lane[el[j]] + 1]++;
            for (i64 l = 0; l < LANES; l++) dl_off[l + 1] += dl_off[l];
            for (i64 j = 0; j < m; j++)
                dlorder[dl_off[d_lane[el[j]]]++] = (i32)j;
            // rankB: bucket-offset fill in d_lane order
            for (i64 jj = 0; jj < m; jj++) {
                const i64 j = dlorder[jj];
                if (rr[j] >= CAPR) { rankB[j] = (i32)CAPR; continue; }
                const i64 i = el[j];
                const i64 grp = subv[i] * cpg + delta[i];
                rankB[j] = cntR[(size_t)grp * CAPR + rr[j]]++;
            }
            auto& brow_g = G_brow[g]; auto& blane_g = G_blane[g];
            auto& bank1_g = G_bank1[g]; auto& stg_g = G_stg[g];
            auto& bank2_g = G_bank2[g];
            brow_g.resize(m); blane_g.resize(m); bank1_g.resize(m);
            stg_g.resize(m); bank2_g.resize(m);
            std::memset(seen1.data(), 255, seen1.size());
            std::memset(seen2.data(), 255, seen2.size());
            for (i64 j = 0; j < m; j++) {
                const i64 i = el[j];
                if (rankB[j] / LANES >= RBu) spilled[i] = 1;
                const i32 br = (i32)(rankB[j] / LANES);
                const i32 bl = (i32)(rankB[j] % LANES);
                brow_g[j] = br;
                blane_g[j] = bl;
                // bank1: distinct a_lane per (bin_row, b_lane)
                {
                    u8* s = &seen1[(size_t)(bin_row[i] * LANES + bl) * KB1];
                    const u8 v = (u8)a_lane[i];
                    i64 b = 0;
                    for (; b < KB1; b++) {
                        if (s[b] == v) break;
                        if (s[b] == 255) { s[b] = v; break; }
                    }
                    bank1_g[j] = (i32)b;
                }
                // bank2: distinct b_lane per (delta, stg_row, d_lane)
                const i32 sg = (i32)(subv[i] * RBu + br);
                stg_g[j] = sg;
                {
                    u8* s = &seen2[(size_t)((delta[i] * (nsub * RBu) + sg)
                                            * LANES + d_lane[i]) * KB2];
                    const u8 v = (u8)bl;
                    i64 b = 0;
                    for (; b < KB2; b++) {
                        if (s[b] == v) break;
                        if (s[b] == 255) { s[b] = v; break; }
                    }
                    bank2_g[j] = (i32)b;
                }
                if (!spilled[i]) {
                    hist1[std::min<i64>(bank1_g[j], KB1 - 1)]++;
                    hist2[std::min<i64>(bank2_g[j], KB2 - 1)]++;
                }
            }
        }
    }

    ST.lap("sweep1");
    // global adaptive caps from the accumulated bank histograms
    i64 cap1, cap2;
    {
        auto cap_of = [&](const i64* hist, i64 K, const char* tag) {
            i64 over = 0, cap = 1;
            for (i64 c = K; c >= 2; c--) {
                over += hist[c - 1];
                if (over * 600 > ne) { cap = c; break; }
            }
            if (getenv("HPCLINALG_ROUTE_DEBUG")) {
                fprintf(stderr, "bank_cap %s K=%lld cap=%lld hist:", tag,
                        (long long)K, (long long)cap);
                for (i64 b = 0; b < K; b++)
                    fprintf(stderr, " %lld", (long long)hist[b]);
                fprintf(stderr, "\n");
            }
            return cap;
        };
        cap1 = cap_of(hist1, KB1, "B1");
        cap2 = cap_of(hist2, KB2, "B2");
    }

    ST.lap("caps12");
    // Sweep 2 (fill) with the caps applied
    for (i64 g = 0; g < gamma; g++) {
        const i32* el = gel.data() + goff[g];
        const i64 m = goff[g + 1] - goff[g];
        for (i64 j = 0; j < m; j++) {
            const i64 i = el[j];
            if (G_bank1[g][j] >= cap1 || G_bank2[g][j] >= cap2)
                spilled[i] = 1;
            if (spilled[i]) continue;
            const i64 brj = G_brow[g][j], blj = G_blane[g][j];
            // S1 (g, KB1, nsub*SUB, 128)
            R->S1[((g * KB1 + G_bank1[g][j]) * nsub * SUB + bin_row[i])
                  * LANES + blj] = (i8)a_lane[i];
            // B1_brow (g, nsub, cpg*RBu, 128): uniform row delta*RBu + b_row
            const i64 urow = delta[i] * RBu + brj;
            R->B1_brow[((g * nsub + subv[i]) * cpg * RBu + urow) * LANES +
                       blj] = (i16)(bin_row[i] % SUB);
            R->B1_bank[((g * nsub + subv[i]) * cpg * RBu + urow) * LANES +
                       blj] = (u8)G_bank1[g][j];
            const i64 d = delta[i];
            const i64 sgj = G_stg[g][j];
            // S2 (g, cpg, KB2, nsub*RBu, 128)
            R->S2[(((g * cpg + d) * KB2 + G_bank2[g][j]) * (nsub * RBu) +
                   sgj) * LANES + d_lane[i]] = (i8)blj;
            // B2_brow (g, cpg, 128, 128)
            R->B2_brow[((g * cpg + d) * LANES + d_row[i]) * LANES +
                       d_lane[i]] = (i16)sgj;
            R->B2_bank[((g * cpg + d) * LANES + d_row[i]) * LANES +
                       d_lane[i]] = (u8)G_bank2[g][j];
        }
    }

    ST.lap("sweep2");
    for (i64 i = 0; i < ne; i++)
        if (spilled[i]) { R->spill_dst.push_back(e_dst[i]);
                          R->spill_src.push_back(e_src[i]); }

    // ---- adaptive bank counts (table diet): most patterns keep only a
    // fraction of the static bank budget live (measured 2 of 6 A-banks at
    // the 1M random workload); tables and kernel masked-pass counts both
    // shrink to the live count
    i64 KAe = 1, KB1e = 1, KB2e = 1;
    for (i64 i = 0; i < ne; i++)
        if (!spilled[i]) KAe = std::max<i64>(KAe, bankA[i] + 1);
    for (i64 j = 0; j < (i64)R->B1_bank.size(); j++)
        if (R->B1_bank[j] != 255)
            KB1e = std::max(KB1e, (i64)R->B1_bank[j] + 1);
    for (i64 j = 0; j < (i64)R->B2_bank.size(); j++)
        if (R->B2_bank[j] != 255)
            KB2e = std::max(KB2e, (i64)R->B2_bank[j] + 1);
    KAe = std::min(std::max(KAe, force_KA), KA);
    KB1e = std::min(std::max(KB1e, force_KB1), KB1);
    KB2e = std::min(std::max(KB2e, force_KB2), KB2);
    R->KAe = KAe; R->KB1e = KB1e; R->KB2e = KB2e;

    ST.lap("tail");
    geom[0] = R->ne; geom[1] = R->T1; geom[2] = R->n_sc; geom[3] = R->C2;
    geom[4] = R->gamma; geom[5] = R->cpg; geom[6] = R->RAu; geom[7] = R->nsub;
    geom[8] = R->RBu; geom[9] = (i64)R->spill_dst.size();
    geom[10] = KAe; geom[11] = KB1e; geom[12] = KB2e;
    return R;
}

void route_export(void* h, i32* win, i8* win_rel, i8* M, i8* SA,
                  i16* A_brow, u8* A_bank, i8* S1, i16* B1_brow, u8* B1_bank,
                  i8* S2, i16* B2_brow, u8* B2_bank,
                  i64* spill_dst, i64* spill_src) {
    auto* R = (Route*)h;
    auto cp = [](auto& v, auto* p) { std::memcpy(p, v.data(),
                                                 v.size() * sizeof(v[0])); };
    cp(R->win, win); cp(R->win_rel, win_rel); cp(R->M, M); cp(R->SA, SA);
    cp(R->A_brow, A_brow); cp(R->A_bank, A_bank);
    cp(R->S1, S1); cp(R->B1_brow, B1_brow); cp(R->B1_bank, B1_bank);
    cp(R->S2, S2); cp(R->B2_brow, B2_brow); cp(R->B2_bank, B2_bank);
    cp(R->spill_dst, spill_dst); cp(R->spill_src, spill_src);
}

// Packed export: emits the kernel-ready transposed CG tables (rel/sel)
// with the leading bank dims of SA/S1/S2 sliced to the LIVE counts
// (geom[10..12]) — the Python side allocates and uploads, nothing more.
// live: u8[3*256] (A | B1 | B2) code-liveness flags.
void route_export_packed(void* h, i32* win, i8* win_rel, i8* M, i8* SA,
                         i8* A_rel, u8* A_sel, i8* S1, i8* B1_rel,
                         u8* B1_sel, i8* S2, i8* B2_rel, u8* B2_sel,
                         u8* live, i64* spill_dst, i64* spill_src) {
    auto* R = (Route*)h;
    auto cp = [](auto& v, auto* p) { std::memcpy(p, v.data(),
                                                 v.size() * sizeof(v[0])); };
    cp(R->win, win); cp(R->win_rel, win_rel); cp(R->M, M);
    cp(R->spill_dst, spill_dst); cp(R->spill_src, spill_src);
    const i64 n_sc = R->n_sc, gamma = R->gamma, cpg = R->cpg;
    const i64 RAu = R->RAu, nsub = R->nsub, RBu = R->RBu;
    // SA (n_sc, KA, SC, 128) -> (n_sc, KAe, SC, 128)
    for (i64 s = 0; s < n_sc; s++)
        std::memcpy(SA + s * R->KAe * SC * LANES,
                    R->SA.data() + s * KA * SC * LANES,
                    R->KAe * SC * LANES);
    // S1 (gamma, KB1, nsub*SUB, 128) -> (gamma, KB1e, ...)
    for (i64 g = 0; g < gamma; g++)
        std::memcpy(S1 + g * R->KB1e * nsub * SUB * LANES,
                    R->S1.data() + g * KB1 * nsub * SUB * LANES,
                    R->KB1e * nsub * SUB * LANES);
    // S2 (gamma, cpg, KB2, nsub*RBu, 128) -> (..., KB2e, ...)
    for (i64 gd = 0; gd < gamma * cpg; gd++)
        std::memcpy(S2 + gd * R->KB2e * nsub * RBu * LANES,
                    R->S2.data() + gd * KB2 * nsub * RBu * LANES,
                    R->KB2e * nsub * RBu * LANES);
    std::memset(live, 0, 3 * 256);
    const i64 PA = (SC + LANES - 1) / LANES;
    const i64 PB = (SUB + LANES - 1) / LANES;
    const i64 PS = (nsub * RBu + LANES - 1) / LANES;
    pack_cg(R->A_brow.data(), R->A_bank.data(), n_sc, gamma * RAu, PA,
            A_rel, A_sel, live);
    pack_cg(R->B1_brow.data(), R->B1_bank.data(), gamma * nsub, cpg * RBu,
            PB, B1_rel, B1_sel, live + 256);
    pack_cg(R->B2_brow.data(), R->B2_bank.data(), gamma * cpg, LANES, PS,
            B2_rel, B2_sel, live + 512);
}

void route_free(void* h) { delete (Route*)h; }

// Single-pass ELL layout build for one shard (the plan-construction numpy
// repeat/fancy-scatter build measured ~2 s at 8M nnz; this is one CSR
// sweep). cols (Lrow, W) i32; scat (nnzpad) i32 with dead slots = Lrow*W;
// tail outputs get the per-row overflow entries (slot >= W); returns the
// tail count. Caller allocates tails at the precomputed overflow count.
i64 ell_build(i64 nl, i64 Lrow, i64 W, i64 nnzpad,
              const i64* indptr, const i32* colval,
              i32* cols, i32* scat,
              i32* trow, i32* tgidx, i64* tpos) {
  std::memset(cols, 0, sizeof(i32) * (size_t)(Lrow * W));
  const i32 dead = (i32)(Lrow * W);
  for (i64 t = 0; t < nnzpad; t++) scat[t] = dead;
  i64 ntail = 0;
  for (i64 r = 0; r < nl; r++) {
    const i64 p0 = indptr[r], p1 = indptr[r + 1];
    const i64 lim = std::min(p1, p0 + W);
    i32* cr = cols + (size_t)r * W;
    for (i64 t = p0; t < lim; t++) {
      cr[t - p0] = colval[t];
      scat[t] = (i32)(r * W + (t - p0));
    }
    for (i64 t = p0 + W; t < p1; t++) {
      trow[ntail] = (i32)r;
      tgidx[ntail] = colval[t];
      tpos[ntail] = t;
      ntail++;
    }
  }
  return ntail;
}

}  // extern "C"

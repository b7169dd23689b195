"""Phase attribution for the shuffle plan build (VERDICT r4 item 4:
plan build <= 5 s at 1M x 8nnz).

    python tools/profile_shuffle_build.py [n_log2=20] [W=8]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << nlog

    import jax.numpy as jnp

    import hpclinalg as hl
    import hpclinalg.ops.pallas_shuffle as ps
    from hpclinalg.ops.spmv import get_spmv_plan

    rng = np.random.default_rng(5)
    rows = np.repeat(np.arange(n), W)
    cols = rng.integers(0, n, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32),
                       (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)

    t0 = time.perf_counter()
    Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
    t_fs = time.perf_counter() - t0
    x = rng.standard_normal(n).astype(np.float32)
    xv = hl.DistVector.from_global(x, be, dtype=np.float32)
    t0 = time.perf_counter()
    plan = get_spmv_plan(Ad, xv)
    t_ell = time.perf_counter() - t0

    # instrument from_native: wrap jnp.asarray to time uploads
    up = [0.0]
    orig_asarray = ps.jnp.asarray

    def timed_asarray(a, *k, **kw):
        t = time.perf_counter()
        out = orig_asarray(a, *k, **kw)
        up[0] += time.perf_counter() - t
        return out

    xlen = int(xv.data.shape[1])
    st = Ad.structure

    # phase: _shard_src
    t0 = time.perf_counter()
    src = ps.build_spmv_shuffle.__wrapped__ if hasattr(
        ps.build_spmv_shuffle, "__wrapped__") else None
    # call the internal pieces the way build() does
    from hpclinalg.ops.pallas_shuffle import PackedRoute

    # reproduce _shard_src(0, compose_ci=True)
    cols_np = plan.ell_cols_np.reshape(-1, st.Lrow, W)[0]
    lens = np.zeros(st.Lrow, np.int64)
    ip = st.indptr[0]
    lens[: len(ip) - 1] = np.minimum(np.diff(ip), W)
    mask = np.arange(W)[None, :] < lens[:, None]
    srcv = np.where(mask, cols_np, -1).astype(np.int64)
    ci = st.col_indices[0]
    srcv = np.where(srcv >= 0, ci[np.clip(srcv, 0, len(ci) - 1)], -1)
    from hpclinalg.ops.pallas_shuffle import _slot_perm, _ceil, LANES
    srcv = np.take_along_axis(srcv, _slot_perm(st.Lrow, W), axis=1)
    nb = _ceil(st.Lrow, LANES)
    srcp = np.full((nb * LANES, W), -1, np.int64)
    srcp[: st.Lrow] = srcv
    src_bi = np.ascontiguousarray(
        srcp.reshape(nb, LANES, W).transpose(0, 2, 1)).reshape(-1)
    t_src = time.perf_counter() - t0

    ps.jnp.asarray = timed_asarray
    try:
        t0 = time.perf_counter()
        packed = PackedRoute.from_native(src_bi, xlen)
        t_native = time.perf_counter() - t0 - up[0]
    finally:
        ps.jnp.asarray = orig_asarray
    print(f"from_scipy {t_fs:.1f}s  ell_plan {t_ell:.1f}s  "
          f"shard_src {t_src:.1f}s  route_build+pack {t_native:.1f}s  "
          f"upload {up[0]:.1f}s  tables {packed.table_bytes()/1e6:.0f} MB  "
          f"KAe={packed.KAe} KB1e={packed.KB1e} KB2e={packed.KB2e}")
    for f in ("SA", "S1", "S2", "A_rel", "A_sel", "B1_rel", "B1_sel",
              "B2_rel", "B2_sel", "M", "win_rel"):
        a = getattr(packed, f)
        print(f"  {f}: {a.size * a.dtype.itemsize / 1e6:.1f} MB {a.shape}")


if __name__ == "__main__":
    main()

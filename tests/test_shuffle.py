"""Static-shuffle gather engine (shuffle_router + pallas_shuffle).

Role under test: the TPU replacement for the reference's KA CSR gather
kernel (/root/reference/src/sparse.jl:2055) — one static gather
xe[D] = x[src[D]] compiled into lane-gather/transpose routing passes.
The Pallas kernels run in interpret mode on the CPU mesh; the numpy
simulator is the intermediate oracle, the direct fancy-index the final
one."""

import numpy as np
import pytest

from hpclinalg.ops.shuffle_router import build_route, simulate


def _check(n, ndest, seed, dead_frac=0.03, dup_heavy=False):
    rng = np.random.default_rng(seed)
    if dup_heavy:
        # few hot sources read by many dest slots (duplication stress)
        src = rng.integers(0, max(n // 50, 2), ndest).astype(np.int64)
    else:
        src = rng.integers(0, n, ndest).astype(np.int64)
    src[rng.random(ndest) < dead_frac] = -1
    plan = build_route(src, n)
    x = rng.standard_normal(n).astype(np.float32)
    xe = simulate(plan, x)
    liv = src >= 0
    assert np.array_equal(xe[: len(src)][liv], x[src[liv]]), \
        f"routing wrong (seed={seed})"
    assert plan.stats["spill_frac"] < 0.02, plan.stats
    return plan


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_router_random(seed):
    _check(5000, 40000, seed)


def test_router_duplication_heavy():
    _check(4000, 50000, 7, dup_heavy=True)


def test_router_tiny_and_empty():
    plan = _check(100, 300, 3, dead_frac=0.3)
    assert plan.C2 >= 1
    # fully dead
    src = np.full(200, -1, np.int64)
    plan = build_route(src, 50)
    xe = simulate(plan, np.ones(50, np.float32))
    assert np.all(xe == 0)


def test_router_structured_pattern():
    """Stencil-like src pattern (banded): windows are dense — exercises
    the run-splitting at window boundaries."""
    n = 3000
    rows = np.arange(n)
    cols = np.stack([np.clip(rows + o, 0, n - 1) for o in
                     (-64, -1, 0, 1, 64)], axis=1)
    src = cols.reshape(-1).astype(np.int64)
    plan = build_route(src, n)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    xe = simulate(plan, x)
    assert np.array_equal(xe[: len(src)], x[src])
    assert plan.stats["spill_frac"] < 0.02


def test_pallas_kernels_interpret():
    """The three Pallas kernels reproduce the simulator exactly
    (interpret mode = CPU execution of the same program)."""
    import jax.numpy as jnp

    from hpclinalg.ops.pallas_shuffle import PackedRoute, shuffle_apply

    rng = np.random.default_rng(11)
    n = 4000
    nd = 30000
    src = rng.integers(0, n, nd).astype(np.int64)
    src[rng.random(nd) < 0.04] = -1
    plan = build_route(src, n)
    packed = PackedRoute(plan)
    x = rng.standard_normal(n).astype(np.float32)
    ref = simulate(plan, x)
    xe = np.asarray(shuffle_apply(packed, jnp.asarray(x), interpret=True))
    assert np.array_equal(xe, ref)


def test_pallas_kernels_interpret_multichunk():
    """Multi-superchunk / multi-sub-block geometry."""
    import jax.numpy as jnp

    from hpclinalg.ops.pallas_shuffle import PackedRoute, shuffle_apply

    rng = np.random.default_rng(12)
    n = 1 << 14
    nd = n * 6
    src = rng.integers(0, n, nd).astype(np.int64)
    plan = build_route(src, n)
    packed = PackedRoute(plan)
    assert packed.n_sc > 1
    x = rng.standard_normal(n).astype(np.float32)
    xe = np.asarray(shuffle_apply(packed, jnp.asarray(x), interpret=True))
    liv = src >= 0
    assert np.array_equal(xe[: len(src)][liv], x[src[liv]])


def test_native_router_matches_oracle():
    """The C++ route builder (native/route.cpp) against the numpy oracle:
    identical gather results through the interpret-mode kernels, for
    random, duplication-heavy and dead-slot streams."""
    import jax.numpy as jnp

    from hpclinalg.ops.pallas_shuffle import PackedRoute, shuffle_apply

    rng = np.random.default_rng(21)
    cases = [
        rng.integers(0, 4000, 30000),
        rng.integers(0, 80, 50000),          # duplication-heavy
        rng.integers(0, 1 << 14, 6 << 14),   # multi-superchunk
    ]
    cases[0][rng.random(30000) < 0.05] = -1
    for src in cases:
        src = src.astype(np.int64)
        n = int(src.max()) + 1
        pn = PackedRoute.from_native(src, n)
        if pn is None:
            pytest.skip("native route builder unavailable")
        x = rng.standard_normal(n).astype(np.float32)
        xe = np.asarray(shuffle_apply(pn, jnp.asarray(x), interpret=True))
        liv = src >= 0
        assert np.array_equal(xe[: len(src)][liv], x[src[liv]])
        # numpy path agrees end-to-end
        pp = PackedRoute(build_route(src, n))
        xe2 = np.asarray(shuffle_apply(pp, jnp.asarray(x), interpret=True))
        assert np.array_equal(xe2[: len(src)][liv], x[src[liv]])


def test_multishard_shuffle_spmv_interpret():
    """Multi-shard shuffle tier: per-shard routes under a common forced
    geometry, shard_map over the stacked tables, gathered-halo input.
    Interpret-mode on a 2-shard CPU mesh vs the scipy oracle."""
    import scipy.sparse as sp

    import hpclinalg as hl
    import hpclinalg.ops.spmv as spmv_mod
    from hpclinalg.ops.pallas_shuffle import build_spmv_shuffle, shuffle_spmv
    from hpclinalg.ops.spmv import get_spmv_plan

    rng = np.random.default_rng(31)
    n = 6000
    W = 5
    rows = np.repeat(np.arange(n), W)
    cols = rng.integers(0, n, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32),
                       (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=2, dtype=np.float32)
    old = spmv_mod.DENSE_MAX_ELEMS
    spmv_mod.DENSE_MAX_ELEMS = 0
    try:
        Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        xv = hl.DistVector.from_global(x, be, dtype=np.float32)
        plan = get_spmv_plan(Ad, xv)
        assert plan.ell
        xb = plan.exchange.apply(xv.data)
        y = np.asarray(shuffle_spmv(Ad, plan, xb, interpret=True))
        ref = A @ x
        Lrow = Ad.structure.Lrow
        got = np.concatenate([y[s][: min(Lrow, n - s * Lrow)]
                              for s in range(2)])
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert err < 2e-6, err
        packed = build_spmv_shuffle(Ad, plan, int(xb.shape[1]))
        from hpclinalg.ops.pallas_shuffle import _StackedRoutes

        assert isinstance(packed, _StackedRoutes)
    finally:
        spmv_mod.DENSE_MAX_ELEMS = old


def test_shuffle_spmv_spill_epilogue_interpret():
    """A duplication-heavy matrix overflows the bank budgets, forcing the
    spill epilogue (sorted scatter-add of the COO leftovers) — the full
    shuffle_spmv pipeline must still match scipy exactly-ish."""
    import scipy.sparse as sp

    import hpclinalg as hl
    import hpclinalg.ops.spmv as spmv_mod
    from hpclinalg.ops.pallas_shuffle import build_spmv_shuffle, shuffle_spmv
    from hpclinalg.ops.spmv import get_spmv_plan

    rng = np.random.default_rng(41)
    n = 4000
    W = 6
    rows = np.repeat(np.arange(n), W)
    # few hot columns read by many rows: duplication stress -> bank spills
    cols = rng.integers(0, 50, n * W)
    A = sp.csr_matrix((rng.standard_normal(n * W).astype(np.float32),
                       (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    be = hl.backend_auto(nshards=1, dtype=np.float32)
    old = spmv_mod.DENSE_MAX_ELEMS
    spmv_mod.DENSE_MAX_ELEMS = 0
    try:
        Ad = hl.DistSparseMatrix.from_scipy(A, be, dtype=np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        xv = hl.DistVector.from_global(x, be, dtype=np.float32)
        plan = get_spmv_plan(Ad, xv)
        assert plan.ell
        packed = build_spmv_shuffle(Ad, plan, int(xv.data.shape[1]))
        y = np.asarray(shuffle_spmv(Ad, plan, xv.data, interpret=True))
        ref = A @ x
        err = np.linalg.norm(y.ravel()[:n] - ref) / np.linalg.norm(ref)
        assert err < 2e-6, err
    finally:
        spmv_mod.DENSE_MAX_ELEMS = old


def test_route_save_load_roundtrip(tmp_path):
    """Persisted routes (save_route/load_route) reproduce the simulator
    exactly after a disk round-trip — both the native-built single route
    and the numpy fallback; geometry, live codes, and spill epilogue all
    survive serialization."""
    import jax.numpy as jnp

    from hpclinalg.ops.pallas_shuffle import (PackedRoute, load_route,
                                              save_route, shuffle_apply)

    rng = np.random.default_rng(31)
    n = 4000
    nd = 30000
    src = rng.integers(0, n, nd).astype(np.int64)
    src[rng.random(nd) < 0.04] = -1
    packed = PackedRoute.from_native(src, n)
    if packed is None:
        packed = PackedRoute(build_route(src, n))
    p = str(tmp_path / "route.npz")
    save_route(packed, p)
    loaded = load_route(p)
    for k in ("n_sc", "gamma", "cpg", "RAu", "nsub", "RBu",
              "KAe", "KB1e", "KB2e"):
        assert getattr(loaded, k) == getattr(packed, k), k
    assert loaded.A_live == list(packed.A_live)
    x = rng.standard_normal(n).astype(np.float32)
    ref = np.asarray(shuffle_apply(packed, jnp.asarray(x), interpret=True))
    out = np.asarray(shuffle_apply(loaded, jnp.asarray(x), interpret=True))
    assert np.array_equal(out, ref)


def test_route_disk_cache_build_once(tmp_path, monkeypatch):
    """build_spmv_shuffle persists through HPCLINALG_ROUTE_CACHE: a second
    process-level build (plan cache cleared) loads from disk instead of
    rebuilding, and the loaded plan's SpMV matches scipy."""
    import scipy.sparse as sp

    import hpclinalg as hl
    from hpclinalg.cache import clear_plan_cache
    from hpclinalg.ops import pallas_shuffle
    from hpclinalg.ops.pallas_shuffle import build_spmv_shuffle
    from hpclinalg.ops.spmv import get_spmv_plan

    monkeypatch.setenv("HPCLINALG_ROUTE_CACHE", str(tmp_path))
    rng = np.random.default_rng(7)
    n = 2048
    A = sp.random(n, n, density=4.0 / n, random_state=3,
                  format="csr", dtype=np.float64)
    A = A + sp.eye(n, format="csr")
    be = hl.backend_auto(nshards=1)
    Ad = hl.DistSparseMatrix.from_scipy(A.tocsr(), be)
    xv = hl.DistVector.from_global(rng.standard_normal(n), be)
    plan = get_spmv_plan(Ad, xv)
    r1 = build_spmv_shuffle(Ad, plan, n)
    files = [f for f in (tmp_path).iterdir() if f.suffix == ".npz"]
    assert len(files) == 1, "route was not persisted"
    clear_plan_cache("spmv_shuffle")
    calls = {"n": 0}
    orig = pallas_shuffle.PackedRoute.from_native.__func__

    def counting(cls, *a, **kw):
        calls["n"] += 1
        return orig(cls, *a, **kw)

    monkeypatch.setattr(pallas_shuffle.PackedRoute, "from_native",
                        classmethod(counting))
    r2 = build_spmv_shuffle(Ad, plan, n)
    assert calls["n"] == 0, "second build should load from disk"
    assert r2.table_bytes() == r1.table_bytes()

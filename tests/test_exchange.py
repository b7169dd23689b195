"""ExchangePlan tier tests — the universal data-movement primitive.

The reference's equivalent surface is the per-plan Isend/Irecv execution
(vectors.jl:394-463 and friends); here one primitive serves every plan, so
its tier dispatch (identity / window / local-permute / split all_to_all
with none|scatter|prefix self modes) gets direct coverage: every tier must
produce the same result as a numpy oracle built from the same send/recv
lists, and the self-traffic split must keep the collective's padded width
at the off-diagonal maximum.
"""

import numpy as np
import pytest

from hpclinalg.parallel.exchange import ExchangePlan


def _oracle(send, recv, x_shards, out_pad, S):
    """numpy reference: out[d][recv[d][s][j]] = x_shards[s][send[s][d][j]]."""
    out = [np.zeros(out_pad, np.float64) for _ in range(S)]
    for s in range(S):
        for d in range(S):
            for j, src in enumerate(send[s][d]):
                out[d][recv[d][s][j]] = x_shards[s][src]
    return np.stack(out)


def _run_plan(plan, x_shards):
    import jax

    x = jax.device_put(np.stack(x_shards), plan.backend.row_sharding(0))
    return np.asarray(plan.apply(x))


def test_halo_prefix_tier(be4):
    """Each shard keeps its whole block (prefix run) and ships a 2-element
    halo to each neighbour — the SpMV gather shape. The collective must be
    padded to the halo width, not the block width."""
    S, L = 4, 16
    rng = np.random.default_rng(0)
    x_shards = [rng.standard_normal(L) for _ in range(S)]
    halo = 2
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    out_pad = halo + L + halo
    for s in range(S):
        send[s][s] = np.arange(L)
        recv[s][s] = np.arange(halo, halo + L)
        if s > 0:  # ship my first rows to the left neighbour's hi-halo
            send[s][s - 1] = np.arange(halo)
            recv[s - 1][s] = np.arange(halo + L, halo + L + halo)
        if s < S - 1:  # ship my last rows to the right neighbour's lo-halo
            send[s][s + 1] = np.arange(L - halo, L)
            recv[s + 1][s] = np.arange(halo)
    plan = ExchangePlan(be4, send, recv, out_pad, src_sizes=[L] * S)
    assert not plan.local_only
    assert plan.self_prefix is not None, "halo layout must take the prefix tier"
    assert plan.send_idx.shape[-1] <= 8, (
        "collective padded width must be the off-diagonal max (halo), "
        f"got {plan.send_idx.shape[-1]}")
    got = _run_plan(plan, x_shards)
    want = _oracle(send, recv, x_shards, plan.out_pad, S)
    np.testing.assert_allclose(got[:, :out_pad], want[:, :out_pad])
    assert np.all(got[:, out_pad:] == 0), "padding invariant violated"


def test_self_scatter_tier(be4):
    """Non-contiguous kept slots force the scatter self mode; result must
    still match the oracle."""
    S, L = 4, 12
    rng = np.random.default_rng(1)
    x_shards = [rng.standard_normal(L) for _ in range(S)]
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    for s in range(S):
        send[s][s] = np.array([0, 2, 4, 6])  # strided: not a prefix run
        recv[s][s] = np.array([1, 3, 5, 7])
        d = (s + 1) % S
        send[s][d] = np.array([11])
        recv[d][s] = np.array([0])
    plan = ExchangePlan(be4, send, recv, 16, src_sizes=[L] * S)
    assert not plan.local_only and plan.self_prefix is None
    got = _run_plan(plan, x_shards)
    want = _oracle(send, recv, x_shards, plan.out_pad, S)
    np.testing.assert_allclose(got, want)


def test_pure_exchange_no_self(be4):
    """Ring rotation: nothing kept locally -> self mode 'none'."""
    S, L = 4, 8
    rng = np.random.default_rng(2)
    x_shards = [rng.standard_normal(L) for _ in range(S)]
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    for s in range(S):
        d = (s + 1) % S
        send[s][d] = np.arange(L)
        recv[d][s] = np.arange(L)
    plan = ExchangePlan(be4, send, recv, L, src_sizes=[L] * S)
    assert not plan.has_self
    got = _run_plan(plan, x_shards)
    want = _oracle(send, recv, x_shards, plan.out_pad, S)
    np.testing.assert_allclose(got, want)


def test_prefix_tier_guard_falls_back(be4):
    """When the padded payload is longer than out_pad allows
    (start + L > out_pad), apply must fall back to the scatter self mode
    and stay correct."""
    S, L = 4, 16
    rng = np.random.default_rng(3)
    keep = L - 2  # valid length; slots >= keep are padding (zero invariant)
    x_shards = []
    for _ in range(S):
        xs = rng.standard_normal(L)
        xs[keep:] = 0.0
        x_shards.append(xs)
    send = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    recv = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    start = 9
    for s in range(S):
        send[s][s] = np.arange(keep)
        recv[s][s] = np.arange(start, start + keep)
        d = (s + 1) % S
        send[s][d] = np.array([keep - 1])
        recv[d][s] = np.array([0])
    # prefix qualifies at plan time, but start(9) + L(16) = 25 > out_pad(24)
    plan = ExchangePlan(be4, send, recv, start + keep + 1,
                        src_sizes=[keep] * S)
    assert plan.self_prefix is not None
    assert plan.self_prefix_max + L > plan.out_pad, "guard must trigger"
    got = _run_plan(plan, x_shards)
    want = _oracle(send, recv, x_shards, plan.out_pad, S)
    np.testing.assert_allclose(got, want)

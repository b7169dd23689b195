"""ExchangePlan: the universal static data-movement primitive.

Every communication pattern in the reference is a memoized two-phase plan:
(1) an Alltoall/Isend handshake exchanging counts and index lists at plan
time, (2) allocation-free Isend/Irecv of value payloads at execution time
(SURVEY.md §2.4; e.g. VectorPlan /root/reference/src/vectors.jl:229-463,
TransposePlan sparse.jl:1519-1829, SparseRepartitionPlan sparse.jl:4098-4536).

On TPU the structure metadata is host-replicated, so phase (1) is pure local
numpy — no handshake exists. Phase (2) compiles to ONE static collective:

    per shard s:  buf[d]  = payload[send_idx[s, d]]          (local take)
                  recv    = all_to_all(buf)  over axis "rows"
                  out     = zeros.at[recv_pos[s]].set(recv)   (local scatter)

with all counts padded to a common static width so the executable is shape-
stable and memoizable. Invalid (padding) receive positions point out of
bounds and are dropped by the scatter (`mode="drop"`). The output buffer's
padding region is therefore guaranteed zero — the global padding invariant.

One jitted executable per (mesh, payload rank, shapes) is shared by ALL
plans — the analogue of the reference's disjoint-MPI-tag discipline is
simply separate index arrays.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..backend import AXIS, Backend
from ..config import round_up


@lru_cache(maxsize=None)
def _exchange_fn(mesh, extra_dims: int, with_base: bool, add: bool,
                 self_mode: str = "scatter"):
    """Jitted all_to_all exchange for payloads of rank 1+extra_dims per slot.

    Self-traffic (slots a shard keeps for itself) never rides the
    collective: the all_to_all carries only the off-shard slots, so its
    padded width is the max OFF-diagonal count. Without the split, a halo
    pattern (keep Lrow locally, ship a boundary sliver) pads every
    shard-pair buffer to Lrow and the collective moves S*Lrow per shard —
    measured 23x slowdown at 8 shards on the 2048^2 stencil.

    self_mode:
      "none"    — no shard keeps anything locally (pure exchange)
      "scatter" — general local take/scatter of the kept slots
      "prefix"  — each shard keeps its ENTIRE valid block, landing on a
                  contiguous destination run (the halo-gather layout):
                  one dynamic_update_slice of the whole shard at the
                  per-shard start — a bandwidth-speed copy instead of an
                  element scatter. Requires out starting from zeros (the
                  trailing x padding is zero by the padding invariant, so
                  over-writing [start+valid, start+L) with it is a no-op).

    with_base: scatter into a provided base array instead of zeros (setindex
    paths). add: scatter-add instead of overwrite (assembly paths)."""
    pay_spec = P(AXIS, *([None] * (1 + extra_dims)))

    def body(x, send_idx, recv_pos, self_a, self_b, base, out_pad):
        # x: (1, L, ...); send_idx/recv_pos: (1, S, C)
        # self_a/self_b: (1, Cs) scatter arrays, or (1,) starts for "prefix"
        S, C = send_idx.shape[1], send_idx.shape[2]
        trail = x.shape[2:]
        out = base[0] if with_base else jnp.zeros((out_pad,) + trail, x.dtype)
        if self_mode == "prefix":
            out = jax.lax.dynamic_update_slice(
                out, x[0], (self_a[0],) + (jnp.int32(0),) * len(trail))
        elif self_mode == "scatter":
            sbuf = jnp.take(x[0], self_a[0], axis=0)
            sat = out.at[self_b[0]]
            out = sat.add(sbuf, mode="drop") if add \
                else sat.set(sbuf, mode="drop")
        buf = jnp.take(x[0], send_idx[0].reshape(-1), axis=0)
        buf = buf.reshape((S, C) + trail)
        recv = jax.lax.all_to_all(buf, AXIS, split_axis=0, concat_axis=0)
        flat = recv.reshape((S * C,) + trail)
        at = out.at[recv_pos[0].reshape(-1)]
        out = at.add(flat, mode="drop") if add else at.set(flat, mode="drop")
        return out[None]

    @partial(jax.jit, static_argnums=(6,))
    def run(x, send_idx, recv_pos, self_a, self_b, base, out_pad):
        in_specs = [pay_spec, P(AXIS, None, None), P(AXIS, None, None)]
        args = [x, send_idx, recv_pos]
        if self_mode == "prefix":
            in_specs += [P(AXIS)]
            args += [self_a]
        elif self_mode == "scatter":
            in_specs += [P(AXIS, None), P(AXIS, None)]
            args += [self_a, self_b]
        if with_base:
            in_specs.append(pay_spec)
            args.append(base)

        def fn(x_, si, rp, *rest):
            rest = list(rest)
            sa = rest.pop(0) if self_mode != "none" else None
            sb = rest.pop(0) if self_mode == "scatter" else None
            b = rest.pop(0) if with_base else None
            return body(x_, si, rp, sa, sb, b, out_pad)

        return jax.shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                             out_specs=pay_spec)(*args)

    return run


@lru_cache(maxsize=None)
def _local_permute_fn(with_base: bool, add: bool):
    """Jitted purely-local take+scatter (no collective) for plans where every
    shard only moves data within itself — the CommSerial / 1-device fast path
    and e.g. repartitions onto an identical partition."""

    @partial(jax.jit, static_argnums=(4,))
    def run(x, send_idx, recv_pos, base, out_pad):
        # x: (S, L, ...); send_idx/recv_pos: (S, C)
        trail = x.shape[2:]
        buf = jax.vmap(lambda xs, ix: jnp.take(xs, ix, axis=0))(x, send_idx)
        out = base if with_base else jnp.zeros((x.shape[0], out_pad) + trail, x.dtype)
        if add:
            out = jax.vmap(lambda o, p, b: o.at[p].add(b, mode="drop"))(out, recv_pos, buf)
        else:
            out = jax.vmap(lambda o, p, b: o.at[p].set(b, mode="drop"))(out, recv_pos, buf)
        return out

    return run


@lru_cache(maxsize=None)
def _window_fn():
    @partial(jax.jit, static_argnums=(1, 2))
    def run(x, window, out_pad):
        a, b, L0 = window
        S = x.shape[0]
        trail = x.shape[2:]
        seg = jax.lax.slice(x, (0, a) + (0,) * len(trail),
                            (S, a + L0) + trail)
        pad = [(0, 0), (b, out_pad - b - L0)] + [(0, 0)] * len(trail)
        return jnp.pad(seg, pad)

    return run


@lru_cache(maxsize=None)
def _identity_pad_fn():
    @partial(jax.jit, static_argnums=(1,))
    def run(x, out_pad):
        L = x.shape[1]
        if out_pad == L:
            return x
        if out_pad < L:
            return x[:, :out_pad]
        pad = [(0, 0), (0, out_pad - L)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad)

    return run


class ExchangePlan:
    """A compiled static exchange.

    Host inputs:
      send[s][d]     : np int array — local slot indices on shard s to ship to d
      recv_pos[d][s] : np int array — output slots on shard d for data from s
                       (same length as send[s][d]; positions unique per shard)
      out_len        : logical output-buffer length per shard (padded up
                       internally; padding slots stay zero)
    """

    def __init__(self, backend: Backend, send, recv_pos, out_len: int,
                 src_sizes=None):
        S = backend.nshards
        self.backend = backend
        self.out_len = int(out_len)
        self.out_pad = round_up(self.out_len)

        counts = np.zeros((S, S), dtype=np.int64)
        for s in range(S):
            for d in range(S):
                counts[s, d] = len(send[s][d])
        self.counts = counts
        self.local_only = bool(np.all(counts[~np.eye(S, dtype=bool)] == 0)) if S > 1 else True
        # identity fast path: every shard keeps ALL of its own data in place
        # (send = recv = arange(local size)) — the exchange degenerates to a
        # pad/slice (crucial on TPU, where an element-wise scatter of the
        # local block would cost ~ms). Requires knowing the source's valid
        # lengths, so only plans built with src_sizes can qualify.
        self.is_identity = (
            src_sizes is not None and self.local_only and all(
                len(send[s][s]) == int(src_sizes[s])
                and np.array_equal(send[s][s], np.arange(int(src_sizes[s])))
                and np.array_equal(recv_pos[s][s], np.arange(int(src_sizes[s])))
                for s in range(S)
            )
        )
        # uniform-window fast path: every shard copies the SAME contiguous
        # source run to the SAME contiguous destination run — a static
        # slice+pad instead of take/scatter (e.g. single-shard halo windows)
        self.window = None
        if self.local_only and not self.is_identity:
            runs = []
            for s in range(S):
                sd, rv = send[s][s], recv_pos[s][s]
                L0 = len(sd)
                if L0 and np.array_equal(sd, np.arange(sd[0], sd[0] + L0)) \
                        and np.array_equal(rv, np.arange(rv[0], rv[0] + L0)):
                    runs.append((int(sd[0]), int(rv[0]), L0))
                else:
                    runs.append(None)
            if all(r is not None for r in runs) and len(set(runs)) == 1:
                self.window = runs[0]  # (src_start, dst_start, length)

        self.self_idx = self.self_pos = self.self_prefix = None
        self.self_prefix_max = 0
        self.has_self = False
        if self.local_only:
            if self.is_identity or self.window is not None:
                # the fast tiers never read the scatter arrays; build them
                # lazily only if a base/add apply forces the general path
                # (saves two padded-local-length uploads per cached plan)
                self.send_idx = self.recv_pos = None
                self._send_host = send
                self._recv_host = recv_pos
                return
            C = max(1, round_up(int(np.diag(counts).max() if S else 0), 8))
            si = np.zeros((S, C), dtype=np.int32)
            rp = np.full((S, C), self.out_pad, dtype=np.int32)  # out of bounds -> drop
            for s in range(S):
                c = counts[s, s]
                si[s, :c] = send[s][s]
                rp[s, :c] = recv_pos[s][s]
        else:
            # self-traffic rides a local take/scatter; the collective is
            # padded only to the max OFF-diagonal count (halo patterns keep
            # O(L) locally but ship O(halo) — padding the all_to_all to the
            # diagonal count would move S*L per shard)
            off = counts.copy()
            np.fill_diagonal(off, 0)
            C = max(1, round_up(int(off.max()), 8))
            si = np.zeros((S, S, C), dtype=np.int32)
            rp = np.full((S, S, C), self.out_pad, dtype=np.int32)
            for s in range(S):
                for d in range(S):
                    if d == s:
                        continue
                    c = counts[s, d]
                    si[s, d, :c] = send[s][d]
                    rp[d, s, :c] = recv_pos[d][s]
            Cd = int(np.diag(counts).max())
            self.has_self = Cd > 0
            if self.has_self:
                sh1 = backend.row_sharding(0)
                # prefix fast path: every shard keeps its whole valid block
                # (send = arange(valid)) on a contiguous destination run —
                # one dynamic_update_slice per shard instead of an element
                # scatter (the halo-gather layout). Needs src_sizes so we
                # know "whole block", and the payload's trailing padding to
                # be zero (the global invariant).
                starts = np.zeros(S, dtype=np.int32)
                pref = src_sizes is not None
                if pref:
                    for s in range(S):
                        sd, rv = send[s][s], recv_pos[s][s]
                        c = len(sd)
                        b0 = int(rv[0]) if c else 0
                        if (c != int(src_sizes[s])
                                or not np.array_equal(
                                    sd, np.arange(c, dtype=sd.dtype))
                                or not np.array_equal(
                                    rv, np.arange(b0, b0 + c,
                                                  dtype=rv.dtype))):
                            pref = False
                            break
                        starts[s] = b0
                if pref:
                    self.self_prefix = jax.device_put(
                        starts, NamedSharding(backend.mesh, P(AXIS)))
                    self.self_prefix_max = int(starts.max())
                Cd = round_up(Cd, 8)
                ssi = np.zeros((S, Cd), dtype=np.int32)
                srp = np.full((S, Cd), self.out_pad, dtype=np.int32)
                for s in range(S):
                    c = counts[s, s]
                    ssi[s, :c] = send[s][s]
                    srp[s, :c] = recv_pos[s][s]
                self.self_idx = jax.device_put(ssi, sh1)
                self.self_pos = jax.device_put(srp, sh1)

        sh = backend.row_sharding(si.ndim - 2)
        self.send_idx = jax.device_put(si, sh)
        self.recv_pos = jax.device_put(rp, sh)

    def apply(self, x: jax.Array, base: jax.Array | None = None, add: bool = False) -> jax.Array:
        """x: stacked shards (S, L, ...). Returns (S, out_pad, ...) with the
        exchanged payload scattered to its destination slots; remaining slots
        are zero, or copied from ``base`` when provided. ``add=True`` scatter-
        adds (for assembly patterns with overlapping destinations)."""
        with_base = base is not None
        if self.is_identity and not with_base and not add:
            return _identity_pad_fn()(x, self.out_pad)
        if self.window is not None and not with_base and not add:
            return _window_fn()(x, self.window, self.out_pad)
        if self.local_only:
            if self.send_idx is None:  # lazily built for fast-tier plans
                S = self.backend.nshards
                send, recv_pos = self._send_host, self._recv_host
                C = max(1, round_up(int(np.diag(self.counts).max()), 8))
                si = np.zeros((S, C), dtype=np.int32)
                rp = np.full((S, C), self.out_pad, dtype=np.int32)
                for s in range(S):
                    c = self.counts[s, s]
                    si[s, :c] = send[s][s]
                    rp[s, :c] = recv_pos[s][s]
                sh = self.backend.row_sharding(0)
                self.send_idx = jax.device_put(si, sh)
                self.recv_pos = jax.device_put(rp, sh)
            return _local_permute_fn(with_base, add)(
                x, self.send_idx, self.recv_pos, base, self.out_pad)
        if not self.has_self:
            mode, sa, sb = "none", None, None
        elif (self.self_prefix is not None and not with_base
                and self.self_prefix_max + x.shape[1] <= self.out_pad):
            mode, sa, sb = "prefix", self.self_prefix, None
        else:
            mode, sa, sb = "scatter", self.self_idx, self.self_pos
        fn = _exchange_fn(self.backend.mesh, x.ndim - 2, with_base, add,
                          self_mode=mode)
        return fn(x, self.send_idx, self.recv_pos, sa, sb, base,
                  self.out_pad)

"""Global configuration for hpclinalg.

The reference (HPCLinearAlgebra.jl) defaults to Float64/ComplexF64 element
types (see /root/reference/src/backends.jl:348-376 where factory functions
default T=Float64). On TPU, float64 is emulated and slow; we therefore make
x64 support opt-in at import time via `enable_x64()` (tests enable it so the
reference's 1e-10 tolerances hold on the CPU mesh; TPU benchmarks typically
run float32/bfloat16).
"""

from __future__ import annotations

import jax

# Padding granularity for the trailing (lane-adjacent) dimension of padded
# local shards. 8 matches the float32 sublane size on TPU; padding local
# shard lengths up to a multiple of this keeps layouts tile-friendly.
PAD_MULTIPLE = 8


def enable_x64() -> None:
    """Enable 64-bit types (needed to match the reference's Float64 tests)."""
    jax.config.update("jax_enable_x64", True)


def enable_compile_cache(path: str | None = None,
                         min_secs: float = 1.0) -> None:
    """Enable JAX's persistent compilation cache.

    The device multifrontal compiles one large level-unrolled executable per
    (pattern hash, kind, dtype); through the remote TPU compiler that is the
    dominant cost of plan construction (minutes at 3D 64^3). The persistent
    cache makes repeat factorizations of the same pattern — across processes
    and sessions — skip compilation entirely, the compiled analogue of the
    reference's memoized backslash cache surviving the Julia session
    (HPCLinearAlgebra.jl:643-690 caches within one process; XLA's disk cache
    extends that across processes).

    CPU backends are a NO-OP: XLA:CPU persists AOT machine code and its
    loader flags tuning pseudo-features (+prefer-no-scatter/-gather) that
    never appear in host feature detection, so every load — even on the
    compiling machine — emits a SIGILL-risk warning. CPU compiles are
    seconds, not the minutes-scale remote-TPU compiles the cache exists
    for; skipping the cache there costs little and keeps the risk (and
    the log tail) at zero. Non-CPU dirs are still scoped per platform +
    machine fingerprint so a shared /tmp across hosts stays safe."""
    if jax.default_backend() == "cpu" and path is None:
        return
    if path is None:
        path = (f"/tmp/hpclinalg_xla_cache_{jax.default_backend()}"
                f"_{_machine_fingerprint()}")
    _make_cache_writes_atomic()
    _sweep_corrupt_entries(path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)


def enable_route_cache(path: str | None = None) -> None:
    """Enable disk persistence of shuffle-engine route tables.

    A first-time 1M-dof random-sparsity structure pays ~10 s of route
    analysis; the tables are pure functions of (structure hash, partition,
    backend), so persisting them makes every later process with the same
    structure load in ~1 s instead. Off by default (entries are hundreds
    of MB); the ``HPCLINALG_ROUTE_CACHE`` env var overrides (a path, or
    ``0`` to force off), ``HPCLINALG_ROUTE_CACHE_BYTES`` caps the dir
    (default 4 GiB, LRU by mtime)."""
    from .ops import pallas_shuffle

    if path is None:
        path = f"/tmp/hpclinalg_routes_{_machine_fingerprint()}"
    pallas_shuffle._route_cache_default = path


def _make_cache_writes_atomic() -> None:
    """Patch the JAX disk-cache writer to write-temp-then-rename.

    Upstream ``LRUCache.put`` uses a bare ``write_bytes``; a run interrupted
    mid-write leaves a truncated zstd frame that every later process trips
    over ('ZstdError: did not decompress full frame' on each compile).
    ``os.replace`` within the same directory is atomic on POSIX, so readers
    only ever see complete entries."""
    import os
    import uuid

    try:
        from jax._src.lru_cache import (_ATIME_SUFFIX, _CACHE_SUFFIX,
                                        LRUCache)
    except ImportError:  # cache layout moved; fall back to upstream writer
        return
    if getattr(LRUCache, "_hpclinalg_atomic", False):
        return

    def atomic_put(self, key, val):
        import time
        import warnings

        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled and len(val) > self.max_size:
            warnings.warn(
                f"Cache value for key {key!r} of size {len(val)} bytes "
                f"exceeds the maximum cache size of {self.max_size} bytes")
            return
        cache_path = self.path / f"{key}{_CACHE_SUFFIX}"
        if self.eviction_enabled:
            self.lock.acquire(timeout=self.lock_timeout_secs)
        try:
            if cache_path.exists():
                return
            self._evict_if_needed(additional_size=len(val))
            tmp_path = self.path / f".{key}.{uuid.uuid4().hex[:8]}.tmp"
            tmp_path.write_bytes(val)
            os.replace(tmp_path, cache_path)
            if self.eviction_enabled:
                timestamp = time.time_ns().to_bytes(8, "little")
                (self.path / f"{key}{_ATIME_SUFFIX}").write_bytes(timestamp)
        finally:
            if self.eviction_enabled:
                self.lock.release()

    LRUCache.put = atomic_put
    LRUCache._hpclinalg_atomic = True


def _sweep_corrupt_entries(path: str) -> None:
    """Delete persisted cache entries whose zstd frame does not decompress
    fully (truncated by an interrupted writer before atomic writes landed).
    One-shot at enable time; cost is a decompress pass over the dir."""
    import os

    if not os.path.isdir(path):
        return
    try:
        import zstandard
    except ImportError:
        return
    dctx = zstandard.ZstdDecompressor()
    for name in os.listdir(path):
        if not name.endswith("-cache") and not name.endswith(".tmp"):
            continue
        full = os.path.join(path, name)
        if name.endswith(".tmp"):  # abandoned staging file
            try:
                os.unlink(full)
            except OSError:
                pass
            continue
        try:
            with open(full, "rb") as f:
                data = f.read()
            if data[:4] == b"\x28\xb5\x2f\xfd":  # zstd magic
                dobj = dctx.decompressobj()
                dobj.decompress(data)
                if not dobj.eof:
                    raise ValueError("truncated zstd frame")
        except Exception:
            try:
                os.unlink(full)
            except OSError:
                pass


def _machine_fingerprint() -> str:
    """Short hash of the host CPU's model + feature flags, so persisted
    XLA:CPU AOT blobs are never loaded on a host with different machine
    features."""
    import hashlib
    import platform

    txt = platform.machine() + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    txt += line
                    if line.startswith(("flags", "Features")):
                        break
    except OSError:
        pass
    return hashlib.blake2b(txt.encode(), digest_size=6).hexdigest()


def round_up(n: int, m: int = PAD_MULTIPLE) -> int:
    """Round ``n`` up to a multiple of ``m`` (always at least ``m``)."""
    if n <= 0:
        return m
    return ((n + m - 1) // m) * m

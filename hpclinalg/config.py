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
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)


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

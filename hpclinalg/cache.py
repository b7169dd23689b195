"""Global plan-cache registry with diagnostics.

Mirrors the reference's eight global plan caches plus ``cache_sizes`` /
``check_cache_sizes!`` / ``clear_plan_cache!`` leak-detection API
(/root/reference/src/HPCLinearAlgebra.jl:126-244). Each named cache maps a
structural-hash key tuple to a built plan (host index metadata + device
constant arrays + a jitted executable).
"""

from __future__ import annotations

from typing import Any, Callable, Hashable

_caches: dict[str, dict[Hashable, Any]] = {}


def plan_cache(name: str) -> dict:
    """Get (or create) the named global plan cache."""
    return _caches.setdefault(name, {})


def cached_plan(name: str, key: Hashable, build: Callable[[], Any]) -> Any:
    """Memoized plan lookup (ref pattern: get_*_plan, e.g. sparse.jl:1992)."""
    c = plan_cache(name)
    hit = c.get(key)
    if hit is None:
        hit = build()
        c[key] = hit
    return hit


def cache_sizes() -> dict[str, int]:
    """Entry counts of every plan cache (ref: cache_sizes,
    HPCLinearAlgebra.jl:208)."""
    return {k: len(v) for k, v in sorted(_caches.items())}


def clear_plan_cache(name: str | None = None) -> None:
    """Drop all plans (ref: clear_plan_cache!, HPCLinearAlgebra.jl:126-164)."""
    if name is None:
        for v in _caches.values():
            v.clear()
    else:
        _caches.get(name, {}).clear()


def check_cache_sizes(max_entries: int = 20) -> None:
    """Raise if any cache exceeds ``max_entries`` — a leak guard used by the
    test suite (ref: check_cache_sizes!, HPCLinearAlgebra.jl:208-242)."""
    offenders = {k: n for k, n in cache_sizes().items() if n > max_entries}
    if offenders:
        raise RuntimeError(f"plan caches exceed {max_entries} entries: {offenders}")

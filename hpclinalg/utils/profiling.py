"""Profiling hooks.

The reference has no in-library tracing; performance work uses external
benchmark scripts plus the cache_sizes leak guard (SURVEY.md §5). On TPU the
natural tool is the JAX profiler — this thin wrapper pairs a trace context
with a plan-cache snapshot so a captured trace can be correlated with which
plans were built during it.
"""

from __future__ import annotations

import contextlib

from ..cache import cache_sizes


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX profiler trace (view with TensorBoard/XProf) plus the
    plan-cache delta across the traced region."""
    import jax

    before = cache_sizes()
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        after = cache_sizes()
        delta = {k: after.get(k, 0) - before.get(k, 0)
                 for k in set(before) | set(after)
                 if after.get(k, 0) != before.get(k, 0)}
        if delta:
            print(f"[hpclinalg] plans built during trace: {delta}")


def annotate(name: str):
    """Named region for profiler timelines (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)

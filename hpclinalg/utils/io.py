"""Logging helpers.

Reference: ``io0(io; r=Set([0]))`` returns devnull off rank 0 — the entire
logging story (/root/reference/src/HPCLinearAlgebra.jl:802-805). Under SPMD
jit there is one Python process, so io0 is the identity by default; in
multi-host deployments it silences non-zero hosts.
"""

from __future__ import annotations

import io
import sys

import jax


def io0(stream=None, ranks={0}):
    """Return ``stream`` on host 0 (or any host in ``ranks``), else a sink."""
    stream = stream if stream is not None else sys.stdout
    if jax.process_index() in ranks:
        return stream
    return open("/dev/null", "w")

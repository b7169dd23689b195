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


def show(obj, stream=None, max_elems: int = 200) -> str:
    """Gathering display of a distributed container (ref: Base.show gathers
    to full arrays, HPCLinearAlgebra.jl:941-1005). O(n) communication by
    design — a debugging aid, truncated beyond ``max_elems``."""
    import numpy as np

    out = [repr(obj)]
    if hasattr(obj, "to_scipy"):  # DistSparseMatrix
        M = obj.to_scipy().tocoo()
        k = min(M.nnz, max_elems)
        for t in range(k):
            out.append(f"  [{M.row[t]}, {M.col[t]}]  =  {M.data[t]}")
        if M.nnz > k:
            out.append(f"  ... ({M.nnz - k} more stored entries)")
    elif hasattr(obj, "to_numpy"):  # DistVector / DistDenseMatrix
        arr = obj.to_numpy()
        with np.printoptions(threshold=max_elems, edgeitems=4):
            out.append(str(arr))
    s = "\n".join(out)
    print(s, file=io0(stream))
    return s

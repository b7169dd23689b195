"""LazyTranspose: deferred transpose with the reference's algebra rules.

Reference: lazy transpose algebra (/root/reference/src/sparse.jl:2318-2379,
vectors.jl:738, dense.jl:952-982): ``At*Bt = transpose(B*A)`` stays lazy;
``At*B``, ``A*Bt`` and ``At*x`` materialize the (cached) transpose. Dense
``At*x`` avoids materialization entirely via the partial+psum path.
"""

from __future__ import annotations

import numpy as np


class LazyTranspose:
    __array_priority__ = 130

    def __init__(self, parent):
        self.parent = parent

    @property
    def T(self):
        return self.parent

    @property
    def shape(self):
        shp = self.parent.shape
        if len(shp) == 1:  # row vector: transpose(v)
            return (1, shp[0])
        m, n = shp
        return (n, m)

    @property
    def dtype(self):
        return self.parent.dtype

    @property
    def backend(self):
        return self.parent.backend

    def materialize(self):
        return self.parent.transpose_materialized()

    def __matmul__(self, o):
        from .dense import DistDenseMatrix
        from .sparse import DistSparseMatrix
        from .vector import DistVector

        p = self.parent
        if isinstance(p, DistVector):
            # row-vector algebra (ref: transpose(v) handling, vectors.jl:738)
            if isinstance(o, DistVector):
                # transpose(v) * w — plain (non-conjugating) inner product
                import jax.numpy as jnp

                w = p._aligned(o)
                return jnp.sum(p.data * w.data)
            if isinstance(o, (DistSparseMatrix, DistDenseMatrix)):
                # vᵀ A = (Aᵀ v)ᵀ
                return LazyTranspose(o.T @ p)
            if isinstance(o, LazyTranspose):
                # vᵀ Aᵀ = (A v)ᵀ
                return LazyTranspose(o.parent @ p)
            return NotImplemented
        if isinstance(o, DistVector):
            if isinstance(p, DistDenseMatrix):
                return p.rmatvec(o)  # no materialization (dense.jl:1000-1261)
            return self.materialize() @ o
        if isinstance(o, LazyTranspose):
            # At * Bt = (B @ A).T — stays lazy (ref sparse.jl:2318)
            return LazyTranspose(o.parent @ p)
        if isinstance(o, (DistSparseMatrix, DistDenseMatrix)):
            return self.materialize() @ o
        return NotImplemented

    def __rmatmul__(self, o):
        # A @ Bt with A dispatching here is handled in container __matmul__
        return NotImplemented

    def __mul__(self, scalar):
        if np.isscalar(scalar) or isinstance(scalar, (int, float, complex)):
            return LazyTranspose(self.parent * scalar)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, o):
        """Right division (ref: HPCLinearAlgebra.jl:713-744):
        ``transpose(v) / A  = transpose(Aᵀ \\ v)`` and
        ``transpose(v) / Aᵀ = transpose(A \\ v)``."""
        from .sparse import DistSparseMatrix
        from .vector import DistVector

        if isinstance(self.parent, DistVector):
            from .solver.api import solve as _solve

            if isinstance(o, LazyTranspose) and isinstance(o.parent,
                                                           DistSparseMatrix):
                return LazyTranspose(_solve(o.parent, self.parent))
            if isinstance(o, DistSparseMatrix):
                return LazyTranspose(_solve(LazyTranspose(o), self.parent))
        if np.isscalar(o) or isinstance(o, (int, float, complex)):
            return LazyTranspose(self.parent / o)
        return NotImplemented

    def __neg__(self):
        return LazyTranspose(-self.parent)

    def __add__(self, o):
        if isinstance(o, LazyTranspose):
            return LazyTranspose(self.parent + o.parent)
        return self.materialize() + o

    def __sub__(self, o):
        if isinstance(o, LazyTranspose):
            return LazyTranspose(self.parent - o.parent)
        return self.materialize() - o

    def __radd__(self, o):
        # o + Aᵀ where o's own __add__ punted (e.g. dense + lazy-sparse)
        return o + self.materialize()

    def __rsub__(self, o):
        return o - self.materialize()

    def to_numpy(self):
        mat = self.parent
        if hasattr(mat, "to_scipy"):
            return mat.to_scipy().T
        arr = mat.to_numpy()
        if arr.ndim == 1:  # row vector: match self.shape == (1, n)
            return arr.reshape(1, -1)
        return arr.T

    def to_scipy(self):
        if not hasattr(self.parent, "to_scipy"):
            raise TypeError(
                f"to_scipy is only available for sparse parents, "
                f"not {type(self.parent).__name__}; use to_numpy()")
        return self.parent.to_scipy().T.tocsr()

    def __repr__(self):
        return f"LazyTranspose({self.parent!r})"

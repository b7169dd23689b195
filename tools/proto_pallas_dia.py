"""Prototype: Pallas DIA SpMV — per-tile manual DMA of the x window into
VMEM, O static shifted FMAs, one pass over dval/x/y."""
import time, numpy as np, scipy.sparse as sp, sys, functools
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def laplace2d(k, dtype):
    T = sp.diags([-1.0,2.0,-1.0],[-1,0,1],shape=(k,k)); I = sp.eye(k)
    return (sp.kron(I,T)+sp.kron(T,I)).tocsr().astype(dtype)

dtype = np.float32
k = 2000; A = laplace2d(k, dtype); n = A.shape[0]
coo = A.tocoo(); offs = coo.col - coo.row
uoffs = tuple(sorted(np.unique(offs).tolist())); O = len(uoffs)
minoff, maxoff = uoffs[0], uoffs[-1]
span = maxoff - minoff
dval = np.zeros((O, n), dtype)
dval[np.searchsorted(uoffs, offs), coo.row] = coo.data
dval_d = jnp.asarray(dval)
xh = np.random.default_rng(0).standard_normal(n).astype(dtype)
x = jnp.asarray(xh)

TR = 131072  # rows per tile (multiple of 128; sized for VMEM)
SPAN_PAD = ((span + 511) // 512) * 512
ntiles = -(-n // TR)
NPAD = ntiles * TR

def kern(dval_ref, xp_ref, y_ref):
    i = pl.program_id(0)
    def inner(xw, sem):
        cp = pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * TR, TR + SPAN_PAD)], xw, sem)
        cp.start(); cp.wait()
        acc = jnp.zeros((TR,), jnp.float32)
        for t, o in enumerate(uoffs):
            acc = acc + dval_ref[t, :] * xw[pl.ds(o - minoff, TR)]
        y_ref[:] = acc
    pl.run_scoped(inner, xw=pltpu.VMEM((TR + SPAN_PAD,), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA)

@jax.jit
def spmv_pallas(dval_d, x):
    xp = jnp.pad(x, (-minoff, SPAN_PAD + minoff + (NPAD - n)))
    dv = jnp.pad(dval_d, ((0, 0), (0, NPAD - n)))
    out = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((O, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TR,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD,), jnp.float32),
    )(dv, xp)
    return out[:n]

y = spmv_pallas(dval_d, x)
ref = A @ xh
print("err:", np.abs(np.asarray(y) - ref).max(), flush=True)
best = np.inf
for _t in range(3):
    t0=time.perf_counter()
    for _ in range(30): acc = spmv_pallas(dval_d, x)
    s = float(jnp.sum(acc))
    best = min(best, (time.perf_counter()-t0)/30)
bytes_ = (O+2)*n*4
print(f"pallas dia n={n}: {best*1e3:.3f} ms  ~{bytes_/best/1e9:.0f} GB/s effective")

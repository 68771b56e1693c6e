"""Round-3 probe 3 (minimal): FMA exactness in Mosaic + copy BW."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
print("jax ready", flush=True)

# ---- 1. FMA exactness probe ----------------------------------------
def fma_probe_kernel(x, y, o1, o2):
    a = x[:]
    b = y[:]
    p = a * b
    r = a * b - p
    o1[:] = p
    o2[:] = r

vecs = pl.BlockSpec((8, LANE), lambda: (0, 0), memory_space=pltpu.VMEM)
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.standard_normal((8, LANE)), jnp.float32) * 1.000001
ys = jnp.asarray(rng.standard_normal((8, LANE)), jnp.float32) * 0.999999
p, r = pl.pallas_call(
    fma_probe_kernel,
    in_specs=[vecs, vecs], out_specs=[vecs, vecs],
    out_shape=[jax.ShapeDtypeStruct((8, LANE), jnp.float32)] * 2,
)(xs, ys)
exact = (np.asarray(xs, np.float64) * np.asarray(ys, np.float64)
         - np.asarray(p, np.float64))
r_np = np.asarray(r, np.float64)
print("FMA probe: max|r|:", np.abs(r_np).max(),
      " max|r-exact|:", np.abs(r_np - exact).max(), flush=True)

# ---- 2. copy bandwidth, long scans ---------------------------------
ROWS = 1 << 15   # 16 MB/plane
TR = 1024
n_tiles = ROWS // TR
vec = pl.BlockSpec((TR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
out1 = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)
copy_k = pl.pallas_call(
    lambda x, o: o.__setitem__(slice(None), x[:] * np.float32(1.0000001)),
    grid=(n_tiles,), in_specs=[vec], out_specs=vec, out_shape=out1,
    compiler_params=cp)


@jax.jit
def mkdata():
    return jax.random.normal(jax.random.PRNGKey(0), (ROWS, LANE), jnp.float32)


x = mkdata()
x.block_until_ready()
print("data ready", flush=True)


@partial(jax.jit, static_argnames=("n",))
def loop(x, n):
    c, _ = jax.lax.scan(lambda c, _: (copy_k(c), None), x, None, length=n)
    return c.sum()


for n1 in (500,):
    n2 = 2 * n1
    float(loop(x, n1)); float(loop(x, n2))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); float(loop(x, n1)); t1 = time.perf_counter()
        float(loop(x, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    t = best / (n2 - n1)
    print(f"copy: {t*1e3:.4f} ms/iter  {2*ROWS*LANE*4/t/1e9:.0f} GB/s",
          flush=True)

"""Scratch: calibrate HBM bandwidth + VPU throughput on this chip."""
import time, sys
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1 << 15   # 2^15 x 128 f32 = 16 MB/plane
LANE = 128
TR = 512
n_tiles = ROWS // TR
vec = pl.BlockSpec((TR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
out1 = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)

def mk(kern, n_in, n_out=1):
    f = pl.pallas_call(kern, grid=(n_tiles,), in_specs=[vec] * n_in,
                       out_specs=[vec] * n_out if n_out > 1 else vec,
                       out_shape=[out1] * n_out if n_out > 1 else out1,
                       compiler_params=cp)
    return f

copy_k = mk(lambda x, o: o.__setitem__(slice(None), x[:]), 1)
add_k = mk(lambda x, y, o: o.__setitem__(slice(None), x[:] + y[:]), 2)

def fma16_kern(x, y, o):
    a = x[:]; b = y[:]
    for i in range(16):
        a = a * 1.0000001 + b
    o[:] = a
fma16_k = mk(fma16_kern, 2)

def fma64_kern(x, y, o):
    a = x[:]; b = y[:]
    for i in range(64):
        a = a * 1.0000001 + b
    o[:] = a
fma64_k = mk(fma64_kern, 2)

def roll12_kern(x, o):
    a = x[:]
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    acc = a
    for j in range(7):
        d = 1 << j
        acc = acc + jnp.where((lane_idx & d) != 0, jnp.roll(a, d, 1), jnp.roll(a, -d, 1))
    for j in range(5):
        d = 1 << j
        acc = acc + jnp.where((rows_idx & d) != 0, jnp.roll(a, d, 0), jnp.roll(a, -d, 0))
    o[:] = acc
roll12_k = mk(roll12_kern, 1)

def matmul_kern(x, m, o):
    o[:] = jnp.dot(x[:], m[:], preferred_element_type=jnp.float32)
mat = pl.BlockSpec((LANE, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
matmul_k = pl.pallas_call(matmul_kern, grid=(n_tiles,), in_specs=[vec, mat],
                          out_specs=vec, out_shape=out1, compiler_params=cp)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((ROWS, LANE)), jnp.float32)
y = jnp.asarray(rng.standard_normal((ROWS, LANE)), jnp.float32)
M = jnp.asarray(rng.standard_normal((LANE, LANE)), jnp.float32)

@partial(jax.jit, static_argnames=("which", "n"))
def loop(x, y, which, n):
    def body(c, _):
        if which == "copy":
            return copy_k(c), None
        if which == "add":
            return add_k(c, y), None
        if which == "fma16":
            return fma16_k(c, y), None
        if which == "fma64":
            return fma64_k(c, y), None
        if which == "roll12":
            return roll12_k(c), None
        if which == "matmul":
            return matmul_k(c, M), None
    c, _ = jax.lax.scan(body, x, None, length=n)
    return c.sum()

def diff(which, n1=30):
    n2 = 3 * n1
    float(loop(x, y, which, n1)); float(loop(x, y, which, n2))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(x, y, which, n1)); t1 = time.perf_counter()
        float(loop(x, y, which, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)

PLANE = ROWS * LANE * 4 / 1e9
for which, planes in [("copy", 2), ("add", 3), ("fma16", 3), ("fma64", 3),
                      ("roll12", 2), ("matmul", 2)]:
    t = diff(which)
    gbs = planes * PLANE / t
    gelem = ROWS * LANE / t / 1e9
    print(f"{which:8s}: {t*1e3:7.3f} ms  {gbs:7.0f} GB/s ({planes} planes)  {gelem:6.1f} Gelem/s")

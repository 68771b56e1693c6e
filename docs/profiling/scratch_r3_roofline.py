"""Round-3 scratch: calibrated HBM bandwidth, VPU throughput, VMEM size."""
import time, sys
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1 << 15   # 16 MB/plane
LANE = 128
TR = 512
n_tiles = ROWS // TR
vec = pl.BlockSpec((TR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
out1 = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)


def mk(kern, n_in, n_out=1):
    return pl.pallas_call(kern, grid=(n_tiles,), in_specs=[vec] * n_in,
                          out_specs=[vec] * n_out if n_out > 1 else vec,
                          out_shape=[out1] * n_out if n_out > 1 else out1,
                          compiler_params=cp)


copy_k = mk(lambda x, o: o.__setitem__(slice(None), x[:]), 1)
add_k = mk(lambda x, y, o: o.__setitem__(slice(None), x[:] + y[:]), 2)
tri_k = mk(lambda x, y, z, o: o.__setitem__(slice(None), x[:] + y[:] * z[:]), 3)


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

@jax.jit
def mkdata():
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(kk, (ROWS, LANE), jnp.float32) for kk in k)
x, y, z = mkdata()
jax.block_until_ready((x, y, z))
print("data ready", flush=True)


@partial(jax.jit, static_argnames=("which", "n"))
def loop(x, y, z, which, n):
    def body(c, _):
        if which == "copy":
            return copy_k(c), None
        if which == "add":
            return add_k(c, y), None
        if which == "tri":
            return tri_k(c, y, z), None
        if which == "fma64":
            return fma64_k(c, y), None
        if which == "roll12":
            return roll12_k(c), None
    c, _ = jax.lax.scan(body, x, None, length=n)
    return c.sum()


def diff(which, n1=50):
    n2 = 2 * n1
    float(loop(x, y, z, which, n1)); float(loop(x, y, z, which, n2))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); float(loop(x, y, z, which, n1)); t1 = time.perf_counter()
        float(loop(x, y, z, which, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)


PLANE = ROWS * LANE * 4 / 1e9
for which, planes in [("copy", 2), ("add", 3), ("tri", 4), ("fma64", 3),
                      ("roll12", 2)]:
    t = diff(which)
    gbs = planes * PLANE / t
    gelem = ROWS * LANE / t / 1e9
    print(f"{which:8s}: {t*1e3:7.3f} ms  {gbs:7.0f} GB/s ({planes} planes)  {gelem:6.1f} Gelem/s",
          flush=True)

# ---- VMEM size probe: single-tile kernel with growing scratch -------
print("\nVMEM probe:", flush=True)
for mb in (16, 24, 32, 48, 64, 96, 128):
    rows_s = mb * (1 << 20) // (LANE * 4)
    try:
        def kern(x_ref, o_ref, scratch):
            scratch[0:TR, :] = x_ref[:]
            o_ref[:] = scratch[0:TR, :] * 2.0

        f = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((TR, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, LANE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TR, LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows_s, LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * (1 << 20)),
        )
        r = f(x[:TR])
        r.block_until_ready()
        print(f"  {mb:4d} MB scratch: OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"  {mb:4d} MB scratch: FAIL ({msg})", flush=True)
        break

"""Round-3 probe 2: copy BW (long runs), FMA exactness in Mosaic, roll variants."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# ---- 1. FMA exactness probe ----------------------------------------
def fma_probe_kernel(x, y, o1, o2):
    a = x[:]
    b = y[:]
    p = a * b
    r = a * b - p          # = 0 if separate mul+round; = exact residual if fused
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
      " max|r - exact_resid|:", np.abs(r_np - exact).max(),
      " -> ", "FUSED (exact residual)" if np.abs(r_np - exact).max() < 1e-30
      and np.abs(r_np).max() > 0 else
      ("separate mul (r==0)" if np.abs(r_np).max() == 0 else "OTHER"),
      flush=True)

# ---- 2. copy/add bandwidth with long runs ---------------------------
ROWS = 1 << 15   # 16 MB/plane
TR = 1024
n_tiles = ROWS // TR
vec = pl.BlockSpec((TR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
out1 = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)


def mk(kern, n_in):
    return pl.pallas_call(kern, grid=(n_tiles,), in_specs=[vec] * n_in,
                          out_specs=vec, out_shape=out1, compiler_params=cp)


copy_k = mk(lambda x, o: o.__setitem__(slice(None), x[:] * 1.0000001), 1)
add_k = mk(lambda x, y, o: o.__setitem__(slice(None), x[:] + y[:]), 2)
seven_k = mk(lambda a, b, c, d, e, f, g, o: o.__setitem__(
    slice(None), a[:] + b[:] + c[:] + d[:] + e[:] + f[:] + g[:]), 7)


@jax.jit
def mkdata():
    k = jax.random.split(jax.random.PRNGKey(0), 7)
    return tuple(jax.random.normal(kk, (ROWS, LANE), jnp.float32) for kk in k)


data = mkdata()
jax.block_until_ready(data)
x, y = data[0], data[1]


@partial(jax.jit, static_argnames=("which", "n"))
def loop(x, which, n):
    def body(c, _):
        if which == "copy":
            return copy_k(c), None
        if which == "add":
            return add_k(c, y), None
        if which == "seven":
            return seven_k(c, *data[1:]), None
    c, _ = jax.lax.scan(body, x, None, length=n)
    return c.sum()


def diff(which, n1):
    n2 = 2 * n1
    float(loop(x, which, n1)); float(loop(x, which, n2))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(loop(x, which, n1)); t1 = time.perf_counter()
        float(loop(x, which, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)


PLANE = ROWS * LANE * 4 / 1e9
for which, planes, n1 in [("copy", 2, 600), ("add", 3, 400), ("seven", 8, 200)]:
    t = diff(which, n1)
    print(f"{which:6s}: {t*1e3:7.4f} ms  {planes*PLANE/t:7.0f} GB/s "
          f"({planes} planes)", flush=True)

# ---- 3. roll variants: cost of one bit-flip permutation -------------
# a: roll+roll+select (current); b: grouped-roll via reshape; c: top-bit
# single roll
def flips_a_kern(x, o):
    a = x[:]
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    acc = a
    for j in range(10):
        d = 1 << j
        acc = acc + jnp.where((rows_idx & d) != 0, jnp.roll(a, d, 0),
                              jnp.roll(a, -d, 0))
    o[:] = acc


def flips_b_kern(x, o):
    a = x[:]
    acc = a
    for j in range(10):
        d = 1 << j
        t = a.reshape(TR // (2 * d), 2 * d, LANE)
        acc = acc + pltpu.roll(t, d, 1).reshape(TR, LANE)
    o[:] = acc


flips_a = mk(flips_a_kern, 1)
try:
    flips_b = mk(flips_b_kern, 1)
    HAVE_B = True
except Exception as e:
    print("flips_b build fail:", str(e)[:100])
    HAVE_B = False


@partial(jax.jit, static_argnames=("which", "n"))
def loop2(x, which, n):
    def body(c, _):
        return (flips_a(c) if which == "a" else flips_b(c)), None
    c, _ = jax.lax.scan(body, x, None, length=n)
    return c.sum()


def diff2(which, n1=100):
    n2 = 2 * n1
    float(loop2(x, which, n1)); float(loop2(x, which, n2))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(loop2(x, which, n1)); t1 = time.perf_counter()
        float(loop2(x, which, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)


for which in ("a", "b") if HAVE_B else ("a",):
    try:
        t = diff2(which)
        gelem = ROWS * LANE / t / 1e9
        print(f"flips10_{which}: {t*1e3:7.4f} ms  {gelem:6.1f} Gelem/s "
              f"({gelem*10:.0f} Gflipterms/s)", flush=True)
    except Exception as e:
        print(f"flips10_{which} run fail:", str(e)[:100], flush=True)

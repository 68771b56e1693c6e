"""Scratch: measure flip-primitive variants + permutation-matmul exactness."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1 << 13   # 2^13 x 128 f32 = 4 MB/plane (2^20 state plane)
LANE = 128
TR = 512
n_tiles = ROWS // TR
vec = pl.BlockSpec((TR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
mat = pl.BlockSpec((LANE, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
out1 = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)

def mk(kern, specs):
    return pl.pallas_call(kern, grid=(n_tiles,), in_specs=specs,
                          out_specs=vec, out_shape=out1, compiler_params=cp)

# --- variants: each applies a 12-bit flip-sum-like workload on ONE plane
def flipsum_where(x, o):          # current: 2 rolls + where per bit, plain add
    a = x[:]
    ri = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    acc = a
    for j in range(7):
        d = 1 << j
        acc = acc + jnp.where((li & d) != 0, jnp.roll(a, d, 1), jnp.roll(a, -d, 1))
    for j in range(7, 9):
        d = 1 << (j - 7)
        acc = acc + jnp.where((ri & d) != 0, jnp.roll(a, d, 0), jnp.roll(a, -d, 0))
    o[:] = acc

def flipsum_ptpu(x, o):           # pltpu.roll instead of jnp.roll
    a = x[:]
    ri = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    acc = a
    for j in range(7):
        d = 1 << j
        acc = acc + jnp.where((li & d) != 0, pltpu.roll(a, d, 1), pltpu.roll(a, -d % LANE, 1))
    for j in range(7, 9):
        d = 1 << (j - 7)
        acc = acc + jnp.where((ri & d) != 0, pltpu.roll(a, d, 0), pltpu.roll(a, -d % TR, 0))
    o[:] = acc

def flipsum_reshape_rows(x, o):   # row bits via reshape+reverse; lane via where
    a = x[:]
    li = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    acc = a
    for j in range(7):
        d = 1 << j
        acc = acc + jnp.where((li & d) != 0, jnp.roll(a, d, 1), jnp.roll(a, -d, 1))
    for j in range(2):
        d = 1 << j
        f = a.reshape(TR // (2 * d), 2, d, LANE)[:, ::-1].reshape(TR, LANE)
        acc = acc + f
    o[:] = acc

def flipsum_lanemat(x, m, o):     # lane bits via ONE A01 matmul; rows via where
    a = x[:]
    ri = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    acc = a + jax.lax.dot_general(
        a, m[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    for j in range(2):
        d = 1 << j
        acc = acc + jnp.where((ri & d) != 0, jnp.roll(a, d, 0), jnp.roll(a, -d, 0))
    o[:] = acc

def flipsum_permmats(x, m, o):    # 7 separate permutation matmuls (exactness probe)
    a = x[:]
    acc = a
    for j in range(7):
        P = jnp.roll(m[:], j, 0) * 0.0  # placeholder won't use; replaced below
    o[:] = acc

k_where = mk(flipsum_where, [vec])
k_ptpu = mk(flipsum_ptpu, [vec])
k_resh = mk(flipsum_reshape_rows, [vec])
k_lanemat = mk(flipsum_lanemat, [vec, mat])

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((ROWS, LANE)), jnp.float32)

A01 = np.zeros((LANE, LANE), np.float32)
for j in range(7):
    idx = np.arange(LANE)
    A01[idx ^ (1 << j), idx] += 1.0
A01 = jnp.asarray(A01)

@partial(jax.jit, static_argnames=("which", "n"))
def loop(x, which, n):
    def body(c, _):
        if which == "where":
            return k_where(c), None
        if which == "ptpu":
            return k_ptpu(c), None
        if which == "resh":
            return k_resh(c), None
        if which == "lanemat":
            return k_lanemat(c, A01), None
    c, _ = jax.lax.scan(body, x, None, length=n)
    return c.sum()

def diff(which, n1=50):
    n2 = 3 * n1
    float(loop(x, which, n1)); float(loop(x, which, n2))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); float(loop(x, which, n1)); t1 = time.perf_counter()
        float(loop(x, which, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)

for which in ["where", "ptpu", "resh", "lanemat"]:
    try:
        t = diff(which)
        print(f"{which:8s}: {t*1e3:7.4f} ms/iter (9-bit flipsum, 1 plane 4MB)")
    except Exception as e:
        print(f"{which:8s}: FAILED {type(e).__name__}: {str(e)[:200]}")

# --- exactness probes (single tile, on-chip vs numpy f64)
def probe_kern(x, m, o):
    o[:] = jax.lax.dot_general(x[:], m[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
probe = pl.pallas_call(probe_kern, grid=(1,), in_specs=[vec, mat],
                       out_specs=vec, out_shape=jax.ShapeDtypeStruct((TR, LANE), jnp.float32))
xt = jnp.asarray(rng.standard_normal((TR, LANE)) * np.exp(rng.uniform(-30, 30, (TR, LANE))), jnp.float32)

# single permutation exactness
P = np.zeros((LANE, LANE), np.float32)
idx = np.arange(LANE)
P[idx ^ 1, idx] = 1.0
rP = np.asarray(probe(xt, jnp.asarray(P)))
exact = np.asarray(xt, np.float64) @ P.astype(np.float64)
print("perm matmul HIGHEST exact:", np.max(np.abs(rP - exact)) == 0.0)

# A01 7-bit sum accuracy at HIGHEST
rA = np.asarray(probe(xt, A01)).astype(np.float64)
exactA = np.asarray(xt, np.float64) @ np.asarray(A01, np.float64)
rel = np.max(np.abs(rA - exactA) / (np.abs(exactA) + 1e-300))
denom = np.abs(np.asarray(xt, np.float64)).max()
print(f"A01 matmul HIGHEST: max rel err {rel:.2e}, max abs/xmax {np.max(np.abs(rA-exactA))/denom:.2e}")

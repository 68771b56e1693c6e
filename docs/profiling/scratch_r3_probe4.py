"""Probe: (a) does Mosaic fold (sigma+x)-sigma? (b) is the MXU f32
matmul exact for grid-aligned inputs? (c) default vs HIGHEST precision."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
rng = np.random.default_rng(0)

# ---- (a) extraction folding probe ----------------------------------
def extract_kernel(x, o1, o2):
    v = x[:]
    m = jnp.max(jnp.abs(v))
    sigma = np.float32(64.0) * m
    q1 = (sigma + v) - sigma
    o1[:] = q1
    o2[:] = v - q1

vecs = pl.BlockSpec((8, LANE), lambda: (0, 0), memory_space=pltpu.VMEM)
x = (rng.standard_normal((8, LANE)) * np.exp(rng.uniform(-8, 3, (8, LANE)))).astype(np.float32)
q1, r1 = pl.pallas_call(
    extract_kernel, in_specs=[vecs], out_specs=[vecs, vecs],
    out_shape=[jax.ShapeDtypeStruct((8, LANE), jnp.float32)] * 2,
)(jnp.asarray(x))
# host emulation in strict f32
m = np.max(np.abs(x))
sigma = np.float32(64.0 * m)
q1_ref = np.float32(np.float32(sigma + x) - sigma)
print("extract: max|q1 - q1_ref| =", np.abs(np.asarray(q1) - q1_ref).max(),
      " (0 => no folding);  max|q1 - x| =", np.abs(np.asarray(q1) - x).max(),
      " (0 => FOLDED)", flush=True)

# ---- (b/c) MXU aligned exactness -----------------------------------
# aligned inputs: multiples of eps = ulp(sigma)/2, magnitudes ~ m
eps = np.float32(sigma * 2.0 ** -24)
q = (np.round(x / eps) * eps).astype(np.float32)  # aligned plane
A = np.zeros((LANE, LANE), dtype=np.float32)
for j in range(7):
    idx = np.arange(LANE)
    A[idx ^ (1 << j), idx] += 1.0

def dot_kernel(prec, xr, ar, o):
    o[:] = jnp.dot(xr[:], ar[:], preferred_element_type=jnp.float32,
                   precision=prec)

mat = pl.BlockSpec((LANE, LANE), lambda: (0, 0), memory_space=pltpu.VMEM)
for prec in (None, jax.lax.Precision.HIGHEST):
    out = pl.pallas_call(
        lambda xr, ar, o, p=prec: dot_kernel(p, xr, ar, o),
        in_specs=[vecs, mat], out_specs=vecs,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
    )(jnp.asarray(q), jnp.asarray(A))
    exact = (q.astype(np.float64) @ A.astype(np.float64))
    err = np.abs(np.asarray(out, np.float64) - exact).max()
    rel = err / max(np.abs(exact).max(), 1e-30)
    print(f"MXU dot precision={prec}: abs err {err:.3e}  rel {rel:.3e}",
          flush=True)

# ---- grouped roll correctness --------------------------------------
def roll_kernel(xr, o):
    t = xr[:]
    R = t.shape[0]
    d = 2
    t3 = t.reshape(R // (2 * d), 2 * d, LANE)
    o[:] = jnp.roll(t3, d, axis=1).reshape(R, LANE)

xr = rng.standard_normal((32, LANE)).astype(np.float32)
out = pl.pallas_call(
    roll_kernel, in_specs=[pl.BlockSpec((32, LANE), lambda: (0, 0),
                                        memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((32, LANE), lambda: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((32, LANE), jnp.float32),
)(jnp.asarray(xr))
idx = np.arange(32)
want = xr[idx ^ 2]
print("grouped roll: max err =", np.abs(np.asarray(out) - want).max(),
      " (0 => exact XOR)", flush=True)

"""Scratch: profile df64 fused kernel components at 2^20."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from quantumpropagators.ops.fused_cheby import make_flip_plan, _LANE
from quantumpropagators.ops import fused_cheby_dd as fdd
from quantumpropagators.models.lattice import chain_bonds, ising_diagonal_np
from quantumpropagators.ops.cheby import cheby_coeffs

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
tile_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 256
n_iter = 16

J, g, h = 1.0, 1.2, 0.3
N = 2 ** L
plan = make_flip_plan(L, g, tile_rows=tile_rows)
print(f"L={L} tile_rows={plan.tile_rows} row_bits={plan.n_row_bits} cross={plan.n_cross}")

bound = J * (L - 1) + abs(h) * L + g * L
e_min, delta = -bound, 2 * bound
dt = 0.05
beta = delta / 2.0 + e_min
diag64 = ising_diagonal_np(L, chain_bonds(L), J, h)

def dd_split(x64):
    hi = x64.astype(np.float32)
    return jnp.asarray(hi), jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32))

dmb_h, dmb_l = dd_split(diag64 - beta)
cdd_h, cdd_l = dd_split(np.asarray(cheby_coeffs(delta, dt)))
n_coeffs = cdd_h.shape[0]
print(f"{n_coeffs} coeffs")

rng = np.random.default_rng(1)
re0 = rng.standard_normal(N).astype(np.float32)
im0 = rng.standard_normal(N).astype(np.float32)
nrm = np.sqrt((re0.astype(np.float64)**2 + im0.astype(np.float64)**2).sum())
rh = jnp.asarray(re0 / nrm); ih = jnp.asarray(im0 / nrm)
state = (rh, jnp.zeros_like(rh), ih, jnp.zeros_like(ih))

rows = N // _LANE
n_tiles = rows // plan.tile_rows
s_h, s_l = fdd._split_f64(-2.0 / delta)
s2_h, s2_l = fdd._split_f64(-4.0 / delta)

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

vec = fdd._vec_spec(plan.tile_rows)
out4 = [jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)] * 4
out8 = out4 * 2
cparams = pltpu.CompilerParams(dimension_semantics=("parallel",))
dmb_h2, dmb_l2 = fdd._dd_planes(dmb_h, dmb_l)

# ---- cross kernel only, n_iter times
@partial(jax.jit, static_argnames=("n",))
def run_cross(v4, n):
    def body(v4, _):
        specs, args = [], []
        for j in range(plan.n_cross):
            for p in v4:
                specs.append(fdd._neighbor_spec(plan.tile_rows, j))
                args.append(p)
        kern = partial(fdd._cross_kernel_dd, plan, plan.n_cross)
        w = pl.pallas_call(kern, grid=(n_tiles,), in_specs=specs,
                           out_specs=[vec] * 4, out_shape=out4,
                           compiler_params=cparams)(*args)
        return tuple(w), None
    v4, _ = jax.lax.scan(body, v4, None, length=n)
    return v4[0].sum()

# ---- main iter kernel only (w = zeros fixed), n_iter times
w_fixed = tuple(jnp.zeros((rows, _LANE), jnp.float32) for _ in range(4))

@partial(jax.jit, static_argnames=("n",))
def run_main(v4, n):
    v0 = v4
    v1 = tuple(p * 0.5 for p in v4)
    phi = tuple(jnp.zeros_like(p) for p in v4)
    a_k2 = jnp.stack([cdd_h[2], cdd_l[2]]).reshape(1, 2)
    uniform_g = len(set(plan.gs)) == 1

    def run_iter(v0, v1, w, phi):
        args = list(v0) + list(v1) + list(w) + [dmb_h2, dmb_l2] + list(phi)
        specs = [vec] * 8 + [vec] * 4 + [vec] * 6
        kern = partial(fdd._iter_kernel_dd, plan, uniform_g, s2_h, s2_l)
        n_in = 1 + len(args)
        phi_base = n_in - 4
        aliases = {1: 0, 2: 1, 3: 2, 4: 3,
                   phi_base: 4, phi_base + 1: 5,
                   phi_base + 2: 6, phi_base + 3: 7}
        return pl.pallas_call(lambda a_ref, *r: kern(a_ref, *r),
                              grid=(n_tiles,), in_specs=[fdd._smem_spec(2)] + specs,
                              out_specs=[vec] * 8, out_shape=out8,
                              input_output_aliases=aliases,
                              compiler_params=cparams)(a_k2, *args)

    def body(carry, _):
        v0, v1, phi = carry
        out = run_iter(v0, v1, w_fixed, phi)
        v2 = tuple(out[:4]); phi = tuple(out[4:])
        return (v1, v2, phi), None
    (_, _, phi), _ = jax.lax.scan(body, (v0, v1, phi), None, length=n)
    return phi[0].sum()

# ---- full step
@partial(jax.jit, static_argnames=("n",))
def run_full(state, n):
    def body(s, _):
        return fdd.cheby_step_fused_dd(plan, dmb_h, dmb_l, s, cdd_h, cdd_l,
                                       delta, e_min, dt), None
    state, _ = jax.lax.scan(body, state, None, length=n)
    rh, rl, ih, il = state
    return jnp.sqrt(jnp.sum((rh + rl) ** 2 + (ih + il) ** 2))

v4 = (rh.reshape(-1, _LANE), jnp.zeros((rows, _LANE), jnp.float32),
      ih.reshape(-1, _LANE), jnp.zeros((rows, _LANE), jnp.float32))

def difftime(f, *a, n1=n_iter, reps=3):
    """Per-unit time via difference between n1 and 3*n1 runs."""
    n2 = 3 * n1
    float(f(*a, n1)); float(f(*a, n2))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(f(*a, n1)); t1 = time.perf_counter()
        float(f(*a, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)

t_cross = difftime(run_cross, v4)
print(f"cross kernel: {t_cross*1e3:.3f} ms/iter")
t_main = difftime(run_main, v4)
print(f"main  kernel: {t_main*1e3:.3f} ms/iter")
t_full = difftime(run_full, state, n1=4)
print(f"full step: {t_full*1e3:.2f} ms/step ({n_coeffs-2} scan iters/step)")
bw_m = 26 * rows * 128 * 4 / t_main / 1e9
bw_c = (4 * plan.n_cross + 4) * rows * 128 * 4 / t_cross / 1e9
print(f"main kernel HBM rate: {bw_m:.0f} GB/s (26 planes); "
      f"cross: {bw_c:.0f} GB/s ({4*plan.n_cross+4} planes)")

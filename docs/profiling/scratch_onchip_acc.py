"""On-chip accuracy validation: compiled dd kernel vs host f64 oracle.

Runs N steps of the dd fused Chebyshev kernel on the TPU and compares
against an exact complex128 Chebyshev recurrence on the host.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from quantumpropagators.ops.fused_cheby import make_flip_plan
from quantumpropagators.ops.fused_cheby_dd import cheby_step_fused_dd, dd_tile_rows
from quantumpropagators.models.lattice import chain_bonds, ising_diagonal_np
from quantumpropagators.ops.cheby import cheby_coeffs

L = int(sys.argv[1]) if len(sys.argv) > 1 else 14
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
J, g, h = 1.0, 1.2, 0.3
N = 2 ** L
plan = make_flip_plan(L, g, tile_rows=dd_tile_rows(L))
print(f"L={L}, tile_rows={plan.tile_rows}, n_cross={plan.n_cross}")
bound = J * (L - 1) + abs(h) * L + g * L
e_min, delta = -bound, 2 * bound
dt = 0.05
beta = delta / 2 + e_min
diag64 = ising_diagonal_np(L, chain_bonds(L), J, h)

def dd_split(x64):
    hi = x64.astype(np.float32)
    return jnp.asarray(hi), jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32))

dmb_h, dmb_l = dd_split(diag64 - beta)
c64 = np.asarray(cheby_coeffs(delta, dt))
c_h, c_l = dd_split(c64)
rng = np.random.default_rng(1)
r0 = rng.standard_normal(N)
i0 = rng.standard_normal(N)
nn = np.sqrt((r0 ** 2 + i0 ** 2).sum())
r0 /= nn; i0 /= nn
state = (jnp.asarray(r0, jnp.float32),
         jnp.asarray((r0 - np.asarray(jnp.asarray(r0, jnp.float32), np.float64)), jnp.float32),
         jnp.asarray(i0, jnp.float32),
         jnp.asarray((i0 - np.asarray(jnp.asarray(i0, jnp.float32), np.float64)), jnp.float32))

# host f64 oracle: same recurrence
idx = np.arange(N)
def h_apply(v):
    out = diag64 * v
    for j in range(L):
        out = out + g * v[idx ^ (1 << j)]
    return out

psi = r0 + 1j * i0
for step in range(n_steps):
    s = cheby_step_fused_dd(plan, dmb_h, dmb_l, state, c_h, c_l, delta, e_min, dt)
    state = tuple(x.block_until_ready() for x in s)
    # oracle step
    v0 = psi
    v1 = (-2j / delta) * (h_apply(v0) - beta * v0)
    phi = c64[0] * v0 + c64[1] * v1
    for k in range(2, len(c64)):
        v2 = (-4j / delta) * (h_apply(v1) - beta * v1) + v0
        phi = phi + c64[k] * v2
        v0, v1 = v1, v2
    psi = np.exp(-1j * beta * dt) * phi

z = (np.asarray(state[0], np.float64) + np.asarray(state[1], np.float64)
     + 1j * (np.asarray(state[2], np.float64) + np.asarray(state[3], np.float64)))
err = np.abs(z - psi).max()
nrm = np.linalg.norm(z)
print(f"{n_steps} steps: max elementwise err vs f64 oracle = {err:.3e}")
print(f"per-step error = {err / n_steps:.3e}; norm = {nrm:.15f}")
print("PASS" if err / n_steps < 1e-12 else "FAIL")

"""Multi-amplitude driven lattice at reference accuracy.

A 10-site chain with THREE independent controls — a diagonal drive and
two separately-driven transverse-field groups (odd/even sites) — is
the reference's general generator form ``Ĥ₀ + Σₗ aₗ(t)Ĥₗ``
(``src/generators.jl:44-61``).  On TPU this propagates through the
double-float Pallas kernel (``kernel="dd"``): every per-interval
control value folds into traced per-bit dd coefficient tables, so an
optimal-control loop updates controls WITHOUT retracing, and the
per-step error stays ~1e-13 on f32-only hardware (reference contract:
1e-10, ``test/test_cheby.jl:8``).

Run: ``python examples/multi_amplitude_dd.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")   # demo runs anywhere;
jax.config.update("jax_enable_x64", True)   # on TPU drop these lines

import jax.numpy as jnp
import numpy as np

import quantumpropagators as qp
from quantumpropagators.fused import cheby_propagate_fused
from quantumpropagators.models.lattice import (
    SiteOperatorSum,
    transverse_field_ising,
)

L = 10
H_diag, _ = transverse_field_ising(L, J=1.0, g=1.0, h=0.3,
                                   dtype=jnp.float64)

# two disjoint flip groups: odd and even sites, each with its own drive
sx = np.array([[0.0, 1.0], [1.0, 0.0]])
mats_odd = np.zeros((L, 2, 2))
mats_even = np.zeros((L, 2, 2))
for i in range(L):
    (mats_odd if i % 2 else mats_even)[i] = sx
Hx_odd = SiteOperatorSum(
    jnp.asarray(mats_odd), L=L,
    active=tuple(i % 2 == 1 for i in range(L)),
)
Hx_even = SiteOperatorSum(
    jnp.asarray(mats_even), L=L,
    active=tuple(i % 2 == 0 for i in range(L)),
)

eps_d = lambda t: 1.0 + 0.3 * np.sin(0.9 * t)    # diagonal drive
eps_o = lambda t: 1.2 + 0.4 * np.cos(1.7 * t)    # odd-site field
eps_e = lambda t: 0.9 + 0.5 * np.sin(2.3 * t)    # even-site field
gen = qp.hamiltonian(
    (H_diag, eps_d), (Hx_odd, eps_o), (Hx_even, eps_e), check=False
)

rng = np.random.default_rng(0)
psi0 = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
psi0 = jnp.asarray(psi0 / np.linalg.norm(psi0))

n_steps = 100
tlist = np.linspace(0.0, 2.0, n_steps + 1)
# certified spectral envelope over the control ranges
bound = 1.3 * (1.0 * (L - 1) + 0.3 * L) + 1.6 * L
kw = dict(specrange_method="manual", E_min=-bound, E_max=bound)

psi_dd, _ = cheby_propagate_fused(psi0, gen, tlist, kernel="dd", **kw)
psi_ref, _ = cheby_propagate_fused(psi0, gen, tlist, kernel="xla", **kw)

err = float(jnp.abs(psi_dd - psi_ref).max())
nrm = float(jnp.linalg.norm(psi_dd))
print(f"{n_steps} steps, 3 independent controls on {L} sites")
print(f"dd kernel vs complex128 oracle: max|Δ| = {err:.2e}")
print(f"‖Ψ‖ = {nrm:.12f}")
assert err < 1e-12

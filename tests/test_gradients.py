"""Differentiable propagation — gradient-based optimal control.

A capability the Julia reference does not have natively: the entire
fused Chebyshev propagation is differentiable with ``jax.grad``, so
GRAPE-style pulse optimization is ``grad(fidelity)(coeff_table)``
against one compiled executable (forward + reverse).  This validates
the zero-retrace coefficient-table design end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.fused import make_fused_cheby_propagator
from quantumpropagators.models.generators import coeff_table
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector


@pytest.fixture(scope="module")
def control_problem():
    """State transfer |0⟩ → |1⟩ on a TLS with a σx drive."""
    sx = jnp.asarray([[0, 1], [1, 0]], dtype=complex)
    sz = jnp.asarray([[1, 0], [0, -1]], dtype=complex)
    gen = qp.hamiltonian(0.0 * sz, (sx, lambda t: 0.2))
    tlist = np.linspace(0, 2, 41)
    psi0 = jnp.asarray([1, 0], dtype=complex)
    target = jnp.asarray([0, 1], dtype=complex)
    # generous spectral envelope so optimized pulses stay certified
    fn = make_fused_cheby_propagator(
        psi0, gen, tlist, E_min=-3.0, E_max=3.0, specrange_method="manual"
    )
    return fn, tlist, psi0, target, gen


def test_gradient_matches_finite_difference(control_problem):
    fn, tlist, psi0, target, gen = control_problem
    table0 = np.asarray(coeff_table(gen, tlist))

    def infidelity(table):
        psi_T, _ = fn(psi0, table)
        overlap = jnp.vdot(target, psi_T)
        return 1.0 - jnp.abs(overlap) ** 2

    g = jax.grad(infidelity)(jnp.asarray(table0))
    assert g.shape == table0.shape
    # finite-difference check on a few entries
    rng = np.random.default_rng(0)
    for idx in [(0, 0), (10, 0), (25, 0)]:
        eps = 1e-6
        tp = table0.copy()
        tp[idx] += eps
        tm = table0.copy()
        tm[idx] -= eps
        fd = (float(infidelity(jnp.asarray(tp))) - float(infidelity(jnp.asarray(tm)))) / (
            2 * eps
        )
        assert float(g[idx]) == pytest.approx(fd, rel=1e-5, abs=1e-8)


def test_grape_style_optimization(control_problem):
    """A few steps of gradient descent must drive the infidelity down
    and reach a near-perfect pi-pulse."""
    fn, tlist, psi0, target, gen = control_problem
    table = jnp.asarray(coeff_table(gen, tlist))

    @jax.jit
    def loss_and_grad(table):
        def infidelity(tb):
            psi_T, _ = fn(psi0, tb)
            return 1.0 - jnp.abs(jnp.vdot(target, psi_T)) ** 2

        return jax.value_and_grad(infidelity)(table)

    l0, _ = loss_and_grad(table)
    lr = 1.0
    losses = [float(l0)]
    for _ in range(200):
        l, g = loss_and_grad(table)
        table = table - lr * g
        losses.append(float(l))
    assert losses[-1] < 1e-6, f"optimization stalled: {losses[-1]}"
    assert losses[-1] < losses[0] / 100
    # the optimized pulse is a pi-pulse: ∫ε dt ≈ π/2 (for σx generator,
    # |0⟩→|1⟩ requires exp(-i σx π/2) up to phase)
    dt = tlist[1] - tlist[0]
    area = float(jnp.sum(table[:, 0]) * dt)
    assert abs(abs(area) - np.pi / 2) < 0.05


def test_gradient_through_observable_trajectory(control_problem):
    """Gradients flow through in-scan observables too (trajectory
    shaping objectives)."""
    fn0, tlist, psi0, target, gen = control_problem
    from quantumpropagators.fused import make_fused_cheby_propagator

    sz = jnp.asarray([[1, 0], [0, -1]], dtype=complex)
    fn = make_fused_cheby_propagator(
        psi0,
        gen,
        tlist,
        E_min=-3.0,
        E_max=3.0,
        specrange_method="manual",
        observable_fn=lambda psi: jnp.vdot(psi, sz @ psi).real,
    )
    table = jnp.asarray(coeff_table(gen, tlist))

    def traj_cost(tb):
        _, vals = fn(psi0, tb)
        return jnp.mean((vals + 1.0) ** 2)  # drive ⟨σz⟩ toward -1

    g = jax.grad(traj_cost)(table)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 1e-6

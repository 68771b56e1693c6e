"""Checkpoint / resume of propagations (SURVEY §5: the reference's
resumable-propagator contract made durable)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.parallel.distributed import (
    load_checkpoint,
    propagator_checkpoint_state,
    restore_propagator,
    save_checkpoint,
)
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector


@pytest.fixture
def problem():
    rng = np.random.default_rng(123)
    N = 12
    H0 = jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=2, rng=rng))
    H1 = jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=1, rng=rng))
    gen = qp.hamiltonian(H0, (H1, lambda t: np.sin(t)))
    tlist = np.linspace(0, 2, 41)
    psi0 = jnp.asarray(random_state_vector(N, rng=rng))
    return gen, tlist, psi0


def test_resume_mid_propagation(problem, tmp_path):
    """Interrupt after 20 steps, checkpoint, restore into a FRESH
    propagator, finish: must match uninterrupted propagation exactly."""
    gen, tlist, psi0 = problem
    ref = qp.propagate(psi0, gen, tlist, method="cheby")

    prop = qp.init_prop(psi0, gen, tlist, method="cheby")
    for _ in range(20):
        prop.prop_step()
    ckpt = propagator_checkpoint_state(prop)
    save_checkpoint(tmp_path / "ckpt", ckpt)

    loaded = load_checkpoint(tmp_path / "ckpt")
    assert np.allclose(loaded["state"], np.asarray(prop.state))
    prop2 = qp.init_prop(psi0, gen, tlist, method="cheby")
    restore_propagator(prop2, loaded)
    assert prop2.t == pytest.approx(tlist[20])
    while prop2.prop_step() is not None:
        pass
    assert np.linalg.norm(np.asarray(prop2.state) - np.asarray(ref)) < 1e-12


def test_checkpoint_includes_parameters(problem, tmp_path):
    gen, tlist, psi0 = problem
    prop = qp.init_prop(psi0, gen, tlist, method="cheby")
    for c in prop.controls:
        prop.parameters[c] = 2.0 * np.asarray(prop.parameters[c])
    ckpt = propagator_checkpoint_state(prop)
    save_checkpoint(tmp_path / "c2", ckpt)
    loaded = load_checkpoint(tmp_path / "c2")
    prop2 = qp.init_prop(psi0, gen, tlist, method="cheby")
    restore_propagator(prop2, loaded)
    for c in prop2.controls:
        assert np.allclose(
            np.asarray(prop2.parameters[c]), np.asarray(prop.parameters[c])
        )

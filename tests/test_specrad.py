"""Spectral-range estimation tests (mirrors reference
``test/test_specrad.jl``): Ritz values vs exact eigenvalues, bracketing
of the true spectral range, and the values derived by the Cheby
propagator."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantumpropagators.ops.specrange import random_state, ritzvals, specrange
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector


def test_ritzvals_hermitian():
    rng = np.random.default_rng(1)
    N = 1000
    H = random_matrix(N, spectral_radius=5.0, hermitian=True, rng=rng)
    evals = np.linalg.eigvalsh(H)
    state = random_state_vector(N, rng=rng)
    R = ritzvals(jnp.asarray(H), state, 20, 60, prec=1e-3)
    assert abs(R.real.min() - evals[0]) / abs(evals[0]) < 0.02
    assert abs(R.real.max() - evals[-1]) / abs(evals[-1]) < 0.02


def test_specrange_brackets():
    rng = np.random.default_rng(2)
    N = 500
    H = random_matrix(N, spectral_radius=8.0, hermitian=True, rng=rng)
    evals = np.linalg.eigvalsh(H)
    E_min, E_max = specrange(jnp.asarray(H), "arnoldi", rng=rng)
    delta = evals[-1] - evals[0]
    # bounds must bracket the true extremes, within 5% of the width
    assert E_min <= evals[0] + 1e-9
    assert E_max >= evals[-1] - 1e-9
    assert E_min > evals[0] - 0.05 * delta
    assert E_max < evals[-1] + 0.05 * delta


def test_specrange_diag_and_manual():
    rng = np.random.default_rng(3)
    H = random_matrix(16, spectral_radius=3.0, hermitian=True, rng=rng)
    evals = np.linalg.eigvalsh(H)
    E_min, E_max = specrange(jnp.asarray(H), "diag")
    assert E_min == pytest.approx(evals[0])
    assert E_max == pytest.approx(evals[-1])
    # auto → diag for small H
    E_min2, E_max2 = specrange(jnp.asarray(H), "auto")
    assert E_min2 == pytest.approx(evals[0])
    assert (E_min, E_max) != specrange(jnp.asarray(H), "manual", E_min=-1, E_max=1)
    assert specrange(jnp.asarray(H), "manual", E_min=-1, E_max=1) == (-1.0, 1.0)
    # auto with given bounds → manual
    assert specrange(jnp.asarray(H), "auto", E_min=-2, E_max=2) == (-2.0, 2.0)


def test_random_state():
    rng = np.random.default_rng(4)
    H = random_matrix(64, hermitian=True, rng=rng)
    psi = random_state(jnp.asarray(H), rng=rng)
    assert psi.shape == (64,)
    assert np.linalg.norm(psi) == pytest.approx(1.0)

"""Chebyshev kernel vs dense ground truth.

Mirrors reference ``test/test_cheby.jl``: N=1000 random Hermitian H,
dt=0.5, compared against ``U = exp(-i H dt)`` at 1e-10, including the
pinned coefficient count (267-268 at limit 1e-12 for the reference's
random-matrix normalization).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from quantumpropagators.ops.cheby import ChebyWorkspace, cheby_apply, cheby_coeffs
from quantumpropagators.utils.fixtures import random_state_vector


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(2591)
    N = 1000
    # Reference: H = Hermitian(rand(ComplexF64, (N, N))) — complex
    # entries with Re/Im uniform in [0,1), upper triangle + real diag
    X = rng.random((N, N)) + 1j * rng.random((N, N))
    H = np.triu(X) + np.triu(X, 1).conj().T
    np.fill_diagonal(H, np.real(np.diag(X)))
    psi0 = random_state_vector(N, rng=rng)
    evals = np.linalg.eigvalsh(H)
    return H, psi0, evals


def test_cheby_coeff_count(system):
    """Coefficient count pinned as in reference test_cheby.jl:36."""
    H, psi0, evals = system
    dt = 0.5
    delta = evals[-1] - evals[0]
    a = cheby_coeffs(delta, dt, limit=1e-12)
    # the reference pins 267-268 for this ensemble (test_cheby.jl:36)
    assert 266 <= len(a) <= 269
    alpha = delta * dt / 2
    assert len(a) > alpha  # superexponential tail starts at k ≈ alpha


def test_cheby_vs_expm(system):
    H, psi0, evals = system
    dt = 0.5
    e_min, e_max = evals[0], evals[-1]
    delta = e_max - e_min
    U = expm(-1j * H * dt)
    exact = U @ psi0
    a = cheby_coeffs(delta, dt)
    res = cheby_apply(
        jnp.asarray(H), jnp.asarray(psi0), jnp.asarray(a), delta, e_min, dt
    )
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_cheby_backward(system):
    H, psi0, evals = system
    dt = 0.5
    e_min, e_max = evals[0], evals[-1]
    delta = e_max - e_min
    a = jnp.asarray(cheby_coeffs(delta, dt))
    fwd = cheby_apply(jnp.asarray(H), jnp.asarray(psi0), a, delta, e_min, dt)
    back = cheby_apply(jnp.asarray(H), fwd, a, delta, e_min, -dt, forward=False)
    assert np.linalg.norm(np.asarray(back) - psi0) < 1e-10


def test_cheby_normalization_check(system):
    H, psi0, evals = system
    dt = 0.5
    e_min, e_max = evals[0], evals[-1]
    delta = e_max - e_min
    a = jnp.asarray(cheby_coeffs(delta, dt))
    res, max_norm = cheby_apply(
        jnp.asarray(H),
        jnp.asarray(psi0),
        a,
        delta,
        e_min,
        dt,
        check_normalization=True,
    )
    assert float(max_norm) <= 1.0 + 1e-12
    # with a too-small delta the normalization check must trip
    bad_delta = 0.2 * delta
    a_bad = jnp.asarray(cheby_coeffs(bad_delta, dt))
    _res, bad_norm = cheby_apply(
        jnp.asarray(H),
        jnp.asarray(psi0),
        a_bad,
        bad_delta,
        e_min,
        dt,
        check_normalization=True,
    )
    assert float(bad_norm) > 1.0


def test_workspace_padding():
    ws = ChebyWorkspace.create(10.0, -5.0, 0.5, pad_to=8)
    assert ws.coeffs.shape[0] % 8 == 0
    assert ws.coeffs.shape[0] >= ws.n_coeffs
    assert np.all(np.asarray(ws.coeffs[ws.n_coeffs:]) == 0)

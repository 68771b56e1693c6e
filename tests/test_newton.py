"""Newton kernel vs dense ground truth.

Mirrors reference ``test/test_newton.jl``: N=1000 Hermitian
(m_max=5, max_restarts=200), N=1000 non-Hermitian (m_max=50), and a
random sparse "Liouvillian-like" matrix with ``func=exp(z)`` — all at
1e-10 vs dense ``expm``.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from quantumpropagators.ops.newton import NewtonInfo, newton_apply
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector


def test_newton_hermitian():
    rng = np.random.default_rng(100)
    N = 1000
    H = random_matrix(N, spectral_radius=10.0, hermitian=True, rng=rng)
    psi0 = random_state_vector(N, rng=rng)
    dt = 0.5
    exact = expm(-1j * H * dt) @ psi0
    info = NewtonInfo()
    res = newton_apply(
        jnp.asarray(H),
        jnp.asarray(psi0),
        dt,
        m_max=5,
        max_restarts=200,
        info=info,
    )
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10
    assert info.restarts > 1  # m_max=5 forces restarts


def test_newton_non_hermitian():
    rng = np.random.default_rng(101)
    N = 1000
    G = random_matrix(N, spectral_radius=10.0, hermitian=False, rng=rng)
    psi0 = random_state_vector(N, rng=rng)
    dt = 0.5
    exact = expm(-1j * G * dt) @ psi0
    res = newton_apply(jnp.asarray(G), jnp.asarray(psi0), dt, m_max=50)
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_newton_sparse_exp_func():
    """Sparse non-Hermitian with func=exp(z) (the Liouville-equation
    use case; reference test_newton.jl:130-177)."""
    rng = np.random.default_rng(102)
    N = 1024
    L = random_matrix(N, spectral_radius=2.0, hermitian=False, density=0.5, rng=rng)
    psi0 = random_state_vector(N, rng=rng)
    dt = 0.5
    exact = expm(L * dt) @ psi0
    res = newton_apply(
        jnp.asarray(L), jnp.asarray(psi0), dt, m_max=30, func=np.exp
    )
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_newton_eigenvector_shortcut():
    """If psi is an eigenvector the Krylov dim collapses to 1 and
    f(H)psi = f(lambda) psi (reference src/newton.jl:289-294)."""
    rng = np.random.default_rng(103)
    N = 50
    H = random_matrix(N, spectral_radius=5.0, hermitian=True, rng=rng)
    evals, evecs = np.linalg.eigh(H)
    psi = evecs[:, 3].astype(complex)
    dt = 0.7
    res = newton_apply(jnp.asarray(H), jnp.asarray(psi), dt, m_max=10)
    exact = np.exp(-1j * evals[3] * dt) * psi
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_newton_requires_dim():
    with pytest.raises(ValueError):
        newton_apply(
            jnp.eye(2, dtype=complex), jnp.ones(2, dtype=complex), 0.5, m_max=10
        )

"""Krylov expv and ODE propagation methods vs ground truth
(mirrors reference ``test/test_exponential_utilities.jl`` categories and
the OrdinaryDiffEq extension behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

import quantumpropagators as qp
from quantumpropagators.ops.expv import expv_apply
from quantumpropagators.ops.ode import dopri5_integrate
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector


def test_expv_dense_hermitian():
    rng = np.random.default_rng(50)
    N = 400
    H = random_matrix(N, spectral_radius=5.0, hermitian=True, rng=rng)
    psi = random_state_vector(N, rng=rng)
    dt = 0.5
    exact = expm(-1j * H * dt) @ psi
    res = expv_apply(jnp.asarray(H), jnp.asarray(psi), dt, m=40)
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_expv_non_hermitian_tol():
    rng = np.random.default_rng(51)
    N = 300
    G = random_matrix(N, spectral_radius=4.0, hermitian=False, rng=rng)
    psi = random_state_vector(N, rng=rng)
    dt = 0.3
    exact = expm(-1j * G * dt) @ psi
    res = expv_apply(jnp.asarray(G), jnp.asarray(psi), dt, m=10, tol=1e-12)
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-9


def test_expv_happy_breakdown():
    rng = np.random.default_rng(52)
    H = random_matrix(40, hermitian=True, rng=rng)
    evals, evecs = np.linalg.eigh(H)
    psi = evecs[:, 5].astype(complex)
    res = expv_apply(jnp.asarray(H), jnp.asarray(psi), 0.9, m=20)
    exact = np.exp(-1j * evals[5] * 0.9) * psi
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_krylov_propagator():
    rng = np.random.default_rng(53)
    N = 30
    gen = qp.hamiltonian(
        jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=2, rng=rng)),
        (
            jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=1, rng=rng)),
            lambda t: np.cos(t),
        ),
    )
    tlist = np.linspace(0, 3, 61)
    psi0 = jnp.asarray(random_state_vector(N, rng=rng))
    res_k = qp.propagate(psi0, gen, tlist, method="krylov", m_max=25)
    res_e = qp.propagate(psi0, gen, tlist, method="expprop")
    assert np.linalg.norm(np.asarray(res_k) - np.asarray(res_e)) < 1e-10


def test_dopri5_scalar_oscillator():
    """y'' = -y via 2-component system, against the exact solution."""
    A = jnp.asarray(np.array([[0.0, 1.0], [-1.0, 0.0]]))
    f = lambda t, y: A @ y
    y0 = jnp.asarray(np.array([1.0, 0.0]))
    y1 = dopri5_integrate(f, y0, 0.0, 2 * np.pi, rtol=1e-10, atol=1e-10)
    assert np.allclose(np.asarray(y1), [1.0, 0.0], atol=1e-7)


def test_dopri5_backward():
    lam = -0.7 + 0.3j
    f = lambda t, y: lam * y
    y0 = jnp.asarray(np.array([1.0 + 0j]))
    fwd = dopri5_integrate(f, y0, 0.0, 2.0, rtol=1e-11, atol=1e-11)
    assert np.allclose(np.asarray(fwd), np.exp(lam * 2.0), atol=1e-8)
    back = dopri5_integrate(f, fwd, 2.0, 0.0, rtol=1e-11, atol=1e-11)
    assert np.allclose(np.asarray(back), 1.0, atol=1e-7)


@pytest.mark.parametrize("pwc", [True, False])
def test_ode_propagator(pwc):
    rng = np.random.default_rng(54)
    N = 16
    H0 = jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=2, rng=rng))
    H1 = jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=1, rng=rng))
    eps = (lambda t: jnp.cos(t)) if not pwc else (lambda t: np.cos(t))
    gen = qp.hamiltonian(H0, (H1, eps))
    tlist = np.linspace(0, 2, 41)
    psi0 = jnp.asarray(random_state_vector(N, rng=rng))
    res = qp.propagate(psi0, gen, tlist, method="ode", pwc=pwc, check=False)
    res_ref = qp.propagate(psi0, gen, tlist, method="expprop", check=False)
    tol = 1e-7 if pwc else 2e-3  # pwc comparison is exact; continuous
    # vs pwc reference differs by the midpoint discretization error
    assert np.linalg.norm(np.asarray(res) - np.asarray(res_ref)) < tol
    if not pwc:
        # continuous integration against a fine-grid pwc reference
        tfine = np.linspace(0, 2, 4001)
        res_fine = qp.propagate(psi0, gen, tfine, method="expprop", check=False)
        assert np.linalg.norm(np.asarray(res) - np.asarray(res_fine)) < 1e-5


def test_ode_backward():
    rng = np.random.default_rng(55)
    N = 8
    H0 = jnp.asarray(random_matrix(N, hermitian=True, spectral_radius=2, rng=rng))
    gen = qp.hamiltonian(H0, (H0, lambda t: 0.1 * jnp.sin(t)))
    tlist = np.linspace(0, 2, 21)
    psi0 = jnp.asarray(random_state_vector(N, rng=rng))
    fwd = qp.propagate(psi0, gen, tlist, method="ode")
    back = qp.propagate(fwd, gen, tlist, method="ode", backward=True)
    assert np.linalg.norm(np.asarray(back) - np.asarray(psi0)) < 1e-7


# -- ExponentialUtilities-style backend characterization --------------------
# (mirrors the reference's test_exponential_utilities.jl: pin down the
# behavior of the expv backend across operator types and modes)


def test_expv_csr_operator():
    from quantumpropagators.ops.operators import csr_from_dense

    rng = np.random.default_rng(60)
    H = random_matrix(200, spectral_radius=3.0, hermitian=True, density=0.1, rng=rng)
    psi = random_state_vector(200, rng=rng)
    dt = 0.4
    exact = expm(-1j * H * dt) @ psi
    res = expv_apply(csr_from_dense(H), jnp.asarray(psi), dt, m=40)
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_expv_lazy_operator():
    rng = np.random.default_rng(61)
    H0 = random_matrix(100, hermitian=True, spectral_radius=2, rng=rng)
    H1 = random_matrix(100, hermitian=True, spectral_radius=1, rng=rng)
    op = qp.Operator([jnp.asarray(H0), jnp.asarray(H1)], np.array([0.7]))
    psi = random_state_vector(100, rng=rng)
    dt = 0.3
    exact = expm(-1j * (H0 + 0.7 * H1) * dt) @ psi
    res = expv_apply(op, jnp.asarray(psi), dt, m=40)
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-10


def test_expv_custom_func():
    """func=expm(+z) (Liouville-style application without the -i)."""
    import scipy.linalg

    rng = np.random.default_rng(62)
    G = random_matrix(150, spectral_radius=1.5, hermitian=False, rng=rng)
    psi = random_state_vector(150, rng=rng)
    dt = 0.5
    exact = expm(G * dt) @ psi
    res = expv_apply(
        jnp.asarray(G), jnp.asarray(psi), dt, m=40,
        func=lambda M: scipy.linalg.expm(M),
    )
    assert np.linalg.norm(np.asarray(res) - exact) < 1e-9


def test_expv_zero_state():
    res = expv_apply(jnp.eye(8, dtype=complex), jnp.zeros(8, dtype=complex), 0.5)
    assert np.linalg.norm(np.asarray(res)) == 0.0


def test_expv_backward_dt():
    rng = np.random.default_rng(63)
    H = random_matrix(120, hermitian=True, spectral_radius=4, rng=rng)
    psi = random_state_vector(120, rng=rng)
    fwd = expv_apply(jnp.asarray(H), jnp.asarray(psi), 0.4, m=40)
    back = expv_apply(jnp.asarray(H), fwd, -0.4, m=40)
    assert np.linalg.norm(np.asarray(back) - psi) < 1e-10


def test_expv_tol_grows_m():
    """With a loose starting m and tight tol, the error estimate must
    drive the Krylov dimension up until accuracy is reached."""
    rng = np.random.default_rng(64)
    H = random_matrix(400, hermitian=True, spectral_radius=20.0, rng=rng)
    psi = random_state_vector(400, rng=rng)
    dt = 0.5
    exact = expm(-1j * H * dt) @ psi
    res_fixed = expv_apply(jnp.asarray(H), jnp.asarray(psi), dt, m=8)
    res_adapt = expv_apply(jnp.asarray(H), jnp.asarray(psi), dt, m=8, tol=1e-12)
    err_fixed = np.linalg.norm(np.asarray(res_fixed) - exact)
    err_adapt = np.linalg.norm(np.asarray(res_adapt) - exact)
    assert err_adapt < 1e-9
    assert err_adapt < err_fixed / 100

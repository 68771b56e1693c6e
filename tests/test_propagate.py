"""High-level propagation tests.

Mirrors reference ``test/test_propagate.jl``: TLS Rabi cycling vs the
analytic solution, storage round trips, backward propagation exactly
reversing unitary dynamics, and cross-method agreement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


@pytest.fixture
def tls():
    """Resonant Rabi problem: H = Ω σ_x, |0⟩ → cos²(Ωt) population."""
    Omega = 1.0
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (jnp.asarray(SX), lambda t: Omega))
    tlist = np.linspace(0, 10, 101)
    psi0 = jnp.asarray(np.array([1, 0], dtype=complex))
    return gen, tlist, psi0, Omega


@pytest.mark.parametrize("method", ["expprop", "cheby"])
def test_tls_rabi_analytic(tls, method):
    gen, tlist, psi0, Omega = tls
    states = qp.propagate(psi0, gen, tlist, method=method, storage=True)
    assert states.shape == (2, len(tlist))
    pop0 = np.abs(states[0, :]) ** 2
    assert np.max(np.abs(pop0 - np.cos(Omega * tlist) ** 2)) < 1e-10
    # exact phases: psi(t) = (cos(Ωt), -i sin(Ωt))
    assert np.max(np.abs(states[0, :] - np.cos(Omega * tlist))) < 1e-10
    assert np.max(np.abs(states[1, :] + 1j * np.sin(Omega * tlist))) < 1e-10


def test_final_state_return(tls):
    gen, tlist, psi0, Omega = tls
    psi = qp.propagate(psi0, gen, tlist, method="cheby")
    assert psi.shape == (2,)
    assert complex(psi[0]) == pytest.approx(np.cos(Omega * tlist[-1]), abs=1e-10)


def test_backward_reverses_forward(tls):
    """Backward propagation must exactly reverse unitary dynamics,
    including the stored trajectory (reference
    ``test/test_propagate.jl:53-69``, tolerance 1e-12)."""
    gen, tlist, psi0, _ = tls
    fwd = qp.propagate(psi0, gen, tlist, method="cheby", storage=True)
    psi_T = jnp.asarray(fwd[:, -1])
    bwd = qp.propagate(psi_T, gen, tlist, method="cheby", backward=True, storage=True)
    assert np.max(np.abs(np.asarray(bwd) - np.asarray(fwd))) < 1e-12


def test_observables(tls):
    gen, tlist, psi0, Omega = tls
    data = qp.propagate(
        psi0,
        gen,
        tlist,
        method="cheby",
        observables=(jnp.asarray(SZ),),
        storage=True,
    )
    assert np.max(np.abs(data.real - np.cos(2 * Omega * tlist))) < 1e-10


def test_three_arg_observable(tls):
    gen, tlist, psi0, _ = tls
    calls = []

    def obs(state, tl, n):
        calls.append(n)
        return float(np.abs(np.asarray(state)[0]) ** 2)

    data = qp.propagate(
        psi0, gen, tlist, method="cheby", observables=(obs,), storage=True
    )
    assert calls[0] == 0
    assert calls[-1] == len(tlist) - 1
    assert data.shape == (len(tlist),)


def test_callback(tls):
    gen, tlist, psi0, _ = tls
    seen = []
    qp.propagate(
        psi0,
        gen,
        tlist,
        method="cheby",
        callback=lambda prop, obs: seen.append(prop.t),
    )
    assert len(seen) == len(tlist) - 1
    assert seen[-1] == pytest.approx(tlist[-1])


def test_cross_method_random_generator():
    """Newton vs Cheby vs ExpProp cross-validation on a random
    time-dependent Hermitian system (the optomech-style agreement test,
    reference ``test/test_propagate.jl:153-163``, tolerance 1e-10)."""
    rng = np.random.default_rng(7)
    N = 24
    H0 = random_matrix(N, spectral_radius=3.0, hermitian=True, rng=rng)
    H1 = random_matrix(N, spectral_radius=1.0, hermitian=True, rng=rng)
    gen = qp.hamiltonian(jnp.asarray(H0), (jnp.asarray(H1), lambda t: np.sin(2 * t)))
    tlist = np.linspace(0, 5, 126)
    psi0 = jnp.asarray(random_state_vector(N, rng=rng))
    res = {}
    for method in ("expprop", "cheby", "newton"):
        res[method] = np.asarray(qp.propagate(psi0, gen, tlist, method=method))
    assert np.linalg.norm(res["cheby"] - res["expprop"]) < 1e-10
    assert np.linalg.norm(res["newton"] - res["expprop"]) < 1e-10


def test_propagate_sequence(tls):
    """A two-stage sequence with a frame-change hook between stages."""
    gen, tlist, psi0, Omega = tls
    t_half = np.linspace(0, 5, 51)
    stages = [
        qp.Propagation(gen, t_half, method="cheby"),
        qp.Propagation(gen, t_half + 5.0, method="cheby"),
    ]
    psi = qp.propagate_sequence(psi0, stages)
    direct = qp.propagate(psi0, gen, tlist, method="cheby")
    assert np.linalg.norm(np.asarray(psi) - np.asarray(direct)) < 1e-10
    # with a pre_propagation hook flipping the phase
    psi2 = qp.propagate_sequence(
        psi0,
        [
            qp.Propagation(gen, t_half, method="cheby"),
            qp.Propagation(
                gen, t_half + 5.0, method="cheby", pre_propagation=lambda s: -s
            ),
        ],
    )
    assert np.linalg.norm(np.asarray(psi2) + np.asarray(direct)) < 1e-10


def test_storage_prealloc(tls):
    gen, tlist, psi0, _ = tls
    from quantumpropagators import init_storage

    storage = np.zeros((2, len(tlist)), dtype=complex)
    out = qp.propagate(psi0, gen, tlist, method="cheby", storage=storage)
    assert out.shape == (2,)  # returns final state when storage given
    assert np.abs(storage[0, 0]) == pytest.approx(1.0)
    assert np.linalg.norm(storage[:, -1] - np.asarray(out)) < 1e-12

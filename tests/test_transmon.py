"""Driven transmon ladder (BASELINE config: N=10 levels,
piecewise-constant pulse, Newton vs Cheby cross-check)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp


@pytest.fixture(scope="module")
def transmon():
    """Anharmonic ladder H0 = Σ (ω n - α/2 n(n-1)) |n⟩⟨n| with a charge
    drive ε(t)(a + a†)."""
    N = 10
    omega, alpha = 5.0, 0.3
    n = np.arange(N)
    H0 = np.diag(omega * n - 0.5 * alpha * n * (n - 1)).astype(complex)
    a = np.diag(np.sqrt(np.arange(1, N)), 1).astype(complex)
    H_drive = a + a.conj().T
    eps = lambda t: 0.5 * qp.flattop(t, T=4.0, t_rise=1.0) * np.cos(omega * t)
    gen = qp.hamiltonian(jnp.asarray(H0), (jnp.asarray(H_drive), eps))
    psi0 = jnp.asarray(np.eye(N)[0].astype(complex))
    tlist = np.linspace(0, 4, 401)
    return gen, tlist, psi0


def test_newton_vs_cheby(transmon):
    gen, tlist, psi0 = transmon
    psi_n = qp.propagate(psi0, gen, tlist, method="newton", m_max=8)
    psi_c = qp.propagate(psi0, gen, tlist, method="cheby")
    assert np.linalg.norm(np.asarray(psi_n) - np.asarray(psi_c)) < 1e-10


def test_resonant_drive_excites(transmon):
    """A resonant drive must move population out of the ground state,
    mostly into the first excited state (anharmonicity blocks higher
    levels)."""
    gen, tlist, psi0 = transmon
    pops = qp.propagate(
        psi0,
        gen,
        tlist,
        method="cheby",
        observables=(lambda psi: np.abs(np.asarray(psi)) ** 2,),
        storage=True,
    )
    pops = np.asarray(pops)
    assert pops[0, -1] < 0.99  # left the ground state
    assert np.all(np.abs(pops.sum(axis=0) - 1.0) < 1e-9)  # normalized
    assert pops[3:, :].max() < 0.1  # ladder truncation not hit


def test_backward_roundtrip(transmon):
    gen, tlist, psi0 = transmon
    fwd = qp.propagate(psi0, gen, tlist, method="cheby")
    back = qp.propagate(fwd, gen, tlist, method="cheby", backward=True)
    assert np.linalg.norm(np.asarray(back) - np.asarray(psi0)) < 1e-11

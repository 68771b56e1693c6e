"""Optomechanical cavity system (mirrors reference ``test/optomech.jl``
+ ``test/test_propagate.jl:153-163``): a 55-dim kron-structured sparse
Hamiltonian, cross-validated between Newton, Cheby, Krylov (expv), and
dense expm at 1e-10 — the "Optomech cavity CSR + Arnoldi expm-Krylov"
benchmark config of BASELINE.md."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.linalg import expm

import quantumpropagators as qp
from quantumpropagators.ops.operators import csr_from_scipy


def build_optomech():
    """Driven cavity coupled to a mechanical oscillator
    (reference ``test/optomech.jl:1-45``)."""
    omega_mech = 10.0
    Delta = -omega_mech
    g, eta = 1.0, 2.0
    N_cav, N_mech = 4, 10

    def destroy(N):
        return sp.diags(np.sqrt(np.arange(1, N + 1)).astype(complex), 1)

    def create(N):
        return sp.diags(np.sqrt(np.arange(1, N + 1)).astype(complex), -1)

    def ident(N):
        return sp.identity(N + 1, dtype=complex, format="csr")

    a = sp.kron(destroy(N_cav), ident(N_mech), format="csr")
    at = sp.kron(create(N_cav), ident(N_mech), format="csr")
    b = sp.kron(ident(N_cav), destroy(N_mech), format="csr")
    bt = sp.kron(ident(N_cav), create(N_mech), format="csr")

    H_cav = (-Delta) * (at @ a) + eta * (a + at)
    H_mech = omega_mech * (bt @ b)
    H_int = (-g) * ((bt + b) @ (at @ a))
    H0 = (H_cav + H_mech).tocsr()
    return H0, H_int.tocsr()


@pytest.fixture(scope="module")
def optomech():
    H0, H_int = build_optomech()
    eps = lambda t: float(np.sin(2 * np.pi * t / 5.0) ** 2)
    gen = qp.hamiltonian(csr_from_scipy(H0), (csr_from_scipy(H_int), eps))
    N = H0.shape[0]
    psi0 = np.zeros(N, dtype=complex)
    psi0[0] = 1.0
    tlist = np.linspace(0, 5, 251)
    return gen, tlist, jnp.asarray(psi0), H0, H_int, eps


def test_newton_vs_cheby(optomech):
    """Reference tolerance 1e-10 (test_propagate.jl:158-162)."""
    gen, tlist, psi0, *_ = optomech
    psi_n = qp.propagate(psi0, gen, tlist, method="newton", m_max=20)
    psi_c = qp.propagate(psi0, gen, tlist, method="cheby")
    assert np.linalg.norm(np.asarray(psi_n) - np.asarray(psi_c)) < 1e-10


def test_krylov_vs_dense(optomech):
    gen, tlist, psi0, H0, H_int, eps = optomech
    psi_k = qp.propagate(psi0, gen, tlist, method="krylov", m_max=30)
    # dense piecewise-constant reference with the same midpoint values
    psi = np.asarray(psi0)
    from quantumpropagators import t_mid

    for n in range(len(tlist) - 1):
        dt = tlist[n + 1] - tlist[n]
        H = (H0 + eps(t_mid(tlist, n)) * H_int).todense()
        psi = expm(-1j * np.asarray(H) * dt) @ psi
    assert np.linalg.norm(np.asarray(psi_k) - psi) < 1e-10


def test_storage_population_dynamics(optomech):
    """Cavity population stays physical and the propagation is
    norm-preserving."""
    gen, tlist, psi0, H0, H_int, eps = optomech
    n_cav_op = csr_from_scipy(
        sp.kron(
            sp.diags(np.arange(5).astype(complex)),
            sp.identity(11, dtype=complex),
            format="csr",
        )
    )
    data = qp.propagate(
        psi0, gen, tlist, method="cheby", observables=(n_cav_op,), storage=True
    )
    pops = np.asarray(data).real
    assert pops[0] == pytest.approx(0.0, abs=1e-12)
    assert np.all(pops >= -1e-9)
    assert np.all(pops <= 4.0 + 1e-9)

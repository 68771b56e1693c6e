"""Time-dependent observables (mirrors reference
``test/test_timedependent_observables.jl``): rotating-frame ↔ lab-frame
transformations as 3-argument observables, vs closed-form sin/cos."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SY = np.array([[0, -1j], [1j, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)


def test_rotating_frame_observable():
    """Propagate in the lab frame under H = (ω/2)σz; measure σx in the
    frame rotating at ω: the result must be the CONSTANT initial ⟨σx⟩,
    while the lab-frame ⟨σx⟩ oscillates as cos(ωt)."""
    omega = 3.0
    H = 0.5 * omega * SZ
    tlist = np.linspace(0, 4, 201)
    psi0 = jnp.asarray(np.array([1, 1], dtype=complex) / np.sqrt(2))

    def sx_rotating(state, tl, n):
        t = tl[n]
        U = np.array(
            [[np.exp(0.5j * omega * t), 0], [0, np.exp(-0.5j * omega * t)]]
        )
        rotated = U @ np.asarray(state)
        return float(np.real(rotated.conj() @ SX @ rotated))

    data = qp.propagate(
        psi0,
        jnp.asarray(H),
        tlist,
        method="expprop",
        observables=(jnp.asarray(SX), sx_rotating),
        storage=True,
    )
    # mixed numeric observables stack into a (2, nt) array
    lab = np.asarray(data)[0].real
    rot = np.asarray(data)[1].real
    assert np.max(np.abs(lab - np.cos(omega * tlist))) < 1e-10
    assert np.max(np.abs(rot - 1.0)) < 1e-10


def test_lab_frame_sin_component():
    """⟨σy⟩ under σz rotation follows +sin(ωt) for |+⟩:
    ψ(t) = (e^{-iωt/2}, e^{iωt/2})/√2 → ⟨σy⟩ = 2·Im(a*b) = sin(ωt)."""
    omega = 2.0
    H = 0.5 * omega * SZ
    tlist = np.linspace(0, 5, 251)
    psi0 = jnp.asarray(np.array([1, 1], dtype=complex) / np.sqrt(2))
    data = qp.propagate(
        psi0,
        jnp.asarray(H),
        tlist,
        method="cheby",
        observables=(jnp.asarray(SY),),
        storage=True,
    )
    assert np.max(np.abs(np.asarray(data).real - np.sin(omega * tlist))) < 1e-9

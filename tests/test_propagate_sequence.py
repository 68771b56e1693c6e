"""Multi-stage propagation schemes (mirrors reference
``test/test_propagate_sequence.jl``): a physical Ramsey
π/2 – free evolution – π/2 interferometry sequence with frame-changing
hooks."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp

SX = jnp.asarray([[0, 1], [1, 0]], dtype=complex)
SZ = jnp.asarray([[1, 0], [0, -1]], dtype=complex)


def pulse_stage(theta, n_pulse=51):
    """Resonant pulse of total rotation angle theta around x."""
    T = 1.0
    Omega = theta / (2 * T)  # exp(-i Ω σx T) rotates by 2ΩT
    gen = qp.hamiltonian(0.0 * SZ, (SX, lambda t: Omega))
    return qp.Propagation(gen, np.linspace(0, T, n_pulse), method="cheby")


def free_stage(detuning, T_free, t0=0.0, n=101):
    gen_free = 0.5 * detuning * SZ
    return qp.Propagation(
        jnp.asarray(gen_free),
        np.linspace(t0, t0 + T_free, n),
        method="expprop",
    )


@pytest.mark.parametrize("detuning_phase", [0.0, np.pi / 2, np.pi, 4.2])
def test_ramsey_fringes(detuning_phase):
    """Ramsey: P(|1⟩) = cos²(φ/2) with φ the free-evolution phase."""
    T_free = 2.0
    detuning = detuning_phase / T_free
    psi0 = jnp.asarray([1, 0], dtype=complex)
    psi = qp.propagate_sequence(
        psi0,
        [
            pulse_stage(np.pi / 2),
            free_stage(detuning, T_free, t0=1.0),
            pulse_stage(np.pi / 2),
        ],
    )
    p1 = float(jnp.abs(psi[1]) ** 2)
    assert p1 == pytest.approx(np.cos(detuning_phase / 2) ** 2, abs=1e-9)


def test_sequence_with_frame_change_hooks():
    """pre/post_propagation hooks implement an interaction-frame hop:
    applying U† before and U after a stage must be the identity overall
    when the stage generator is transformed accordingly — here checked
    with the trivial-commuting case."""
    theta = 1.1
    U = jnp.asarray(
        np.diag([np.exp(-1j * theta / 2), np.exp(1j * theta / 2)])
    )
    psi0 = jnp.asarray(np.array([1, 1], dtype=complex) / np.sqrt(2))
    # free evolution under σz commutes with the σz frame change
    stage = free_stage(1.5, 2.0)
    direct = qp.propagate_sequence(psi0, [stage])
    framed = qp.propagate_sequence(
        psi0,
        [
            qp.Propagation(
                stage.generator,
                stage.tlist,
                method="expprop",
                pre_propagation=lambda s: U @ s,
                post_propagation=lambda s: U.conj().T @ s,
            )
        ],
    )
    assert np.linalg.norm(np.asarray(framed) - np.asarray(direct)) < 1e-12


def test_sequence_storage_per_stage():
    psi0 = jnp.asarray([1, 0], dtype=complex)
    stages = [pulse_stage(np.pi / 2), free_stage(1.0, 2.0, t0=1.0)]
    storages = qp.propagate_sequence(psi0, stages, storage=True)
    assert len(storages) == 2
    assert storages[0].shape == (2, 51)
    assert storages[1].shape == (2, 101)
    # stage boundaries chain: last state of stage 1 = first of stage 2
    assert np.allclose(storages[0][:, -1], storages[1][:, 0], atol=1e-12)

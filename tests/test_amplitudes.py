"""Amplitude types (mirrors reference ``test/test_amplitudes.jl``):
Locked/Shaped/Guided with callable and vector slots, control
extraction, evaluation, substitution."""

import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators import (
    GuidedAmplitude,
    LockedAmplitude,
    ShapedAmplitude,
    evaluate,
    get_controls,
    substitute,
)
from quantumpropagators.utils.iddict import IdDict


@pytest.fixture
def tlist():
    return np.linspace(0, 10, 21)


def test_locked_amplitude(tlist):
    S = lambda t: qp.flattop(t, T=10, t_rise=2)
    a = LockedAmplitude(S)
    assert get_controls(a) == ()
    assert evaluate(a, tlist, 3) == pytest.approx(S(qp.t_mid(tlist, 3)))
    assert evaluate(a, 5.0) == pytest.approx(S(5.0))
    # discretized variant
    a2 = LockedAmplitude(S, tlist)
    assert evaluate(a2, tlist, 3) == pytest.approx(S(qp.t_mid(tlist, 3)))
    with pytest.raises(ValueError):
        evaluate(a2, 5.0)  # vector-backed: (tlist, n) only
    with pytest.raises(ValueError):
        LockedAmplitude(42)


def test_shaped_amplitude(tlist):
    S = lambda t: qp.blackman(t, 0, 10)
    eps = lambda t: np.sin(t)
    a = ShapedAmplitude(eps, shape=S)
    assert get_controls(a) == (eps,)
    t3 = qp.t_mid(tlist, 3)
    assert evaluate(a, tlist, 3) == pytest.approx(S(t3) * np.sin(t3))
    assert evaluate(a, 2.0) == pytest.approx(S(2.0) * np.sin(2.0))
    # vals_dict override of the control
    vals = IdDict([(eps, 2.0)])
    assert evaluate(a, tlist, 3, vals_dict=vals) == pytest.approx(S(t3) * 2.0)
    # discretizing constructor
    a2 = ShapedAmplitude(eps, tlist, shape=S)
    assert evaluate(a2, tlist, 3) == pytest.approx(S(t3) * np.sin(t3))
    assert isinstance(get_controls(a2)[0], np.ndarray)


def test_guided_amplitude(tlist):
    S = lambda t: qp.blackman(t, 0, 10)
    G = lambda t: 0.3 * np.cos(t)
    eps = lambda t: np.sin(t)
    a = GuidedAmplitude(eps, shape=S, guide=G)
    assert get_controls(a) == (eps,)
    t3 = qp.t_mid(tlist, 3)
    assert evaluate(a, tlist, 3) == pytest.approx(G(t3) + S(t3) * np.sin(t3))
    a2 = GuidedAmplitude(eps, tlist, shape=S, guide=G)
    assert evaluate(a2, tlist, 3) == pytest.approx(G(t3) + S(t3) * np.sin(t3))


def test_substitute_control_in_amplitude(tlist):
    S = lambda t: 1.0
    eps1 = lambda t: np.sin(t)
    eps2 = lambda t: np.cos(t)
    a = ShapedAmplitude(eps1, shape=S)
    b = substitute(a, IdDict([(eps1, eps2)]))
    assert get_controls(b) == (eps2,)
    assert evaluate(b, 1.0) == pytest.approx(np.cos(1.0))


def test_amplitude_in_generator(tlist):
    import jax.numpy as jnp

    sx = jnp.asarray([[0, 1], [1, 0]], dtype=complex)
    sz = jnp.asarray([[1, 0], [0, -1]], dtype=complex)
    S = lambda t: qp.flattop(t, T=10, t_rise=2)
    eps = lambda t: 0.4
    gen = qp.hamiltonian(sz, (sx, ShapedAmplitude(eps, shape=S)))
    assert get_controls(gen) == (eps,)
    psi0 = jnp.asarray([1, 0], dtype=complex)
    psi = qp.propagate(psi0, gen, tlist, method="cheby")
    # amplitude-modulated drive vs explicit product control
    gen2 = qp.hamiltonian(sz, (sx, lambda t: S(t) * 0.4))
    psi2 = qp.propagate(psi0, gen2, tlist, method="cheby")
    assert np.linalg.norm(np.asarray(psi) - np.asarray(psi2)) < 1e-12
    from quantumpropagators.interfaces import check_amplitude

    assert check_amplitude(ShapedAmplitude(eps, shape=S), tlist=tlist)

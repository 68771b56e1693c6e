"""Controls evaluation/substitution protocol (mirrors reference
``test/test_controls.jl``), including tuple-format generators."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators import IdDict, evaluate, get_controls, substitute


@pytest.fixture
def tlist():
    return np.linspace(0, 10, 21)


def test_evaluate_function_control(tlist):
    eps = lambda t: np.sin(t)
    assert evaluate(eps, 2.5) == pytest.approx(np.sin(2.5))
    assert evaluate(eps, tlist, 3) == pytest.approx(np.sin(qp.t_mid(tlist, 3)))


def test_evaluate_vector_control(tlist):
    vals = np.arange(20.0)  # on midpoints
    assert evaluate(vals, tlist, 7) == 7.0
    with pytest.raises(ValueError):
        evaluate(vals, 2.5)
    on_points = np.arange(21.0)
    # point values are un-averaged to midpoint values
    mid = qp.discretize_on_midpoints(on_points, tlist)
    assert evaluate(on_points, tlist, 5) == pytest.approx(mid[5])


def test_vals_dict_override(tlist):
    eps = lambda t: np.sin(t)
    vals = IdDict([(eps, 42.0)])
    assert evaluate(eps, tlist, 3, vals_dict=vals) == 42.0
    assert evaluate(eps, 1.0, vals_dict=vals) == 42.0


def test_evaluate_tuple_generator(tlist):
    H0 = jnp.asarray(np.diag([1.0, -1.0]).astype(complex))
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]]).astype(complex))
    eps = lambda t: np.cos(t)
    G = (H0, (H1, eps))
    assert get_controls(G) == (eps,)
    op = evaluate(G, tlist, 4)
    t4 = qp.t_mid(tlist, 4)
    expected = np.asarray(H0) + np.cos(t4) * np.asarray(H1)
    assert np.allclose(np.asarray(op), expected)
    # continuous evaluation
    op_t = evaluate(G, 1.7)
    assert np.allclose(np.asarray(op_t), np.asarray(H0) + np.cos(1.7) * np.asarray(H1))


def test_propagate_with_tuple_generator(tlist):
    """Tuple generators work directly in propagate (reference accepts
    them everywhere)."""
    H0 = jnp.zeros((2, 2), dtype=complex)
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]]).astype(complex))
    psi0 = jnp.asarray([1, 0], dtype=complex)
    res_tuple = qp.propagate(psi0, (H0, (H1, lambda t: 1.0)), tlist, method="cheby")
    gen = qp.hamiltonian(H0, (H1, lambda t: 1.0))
    res_gen = qp.propagate(psi0, gen, tlist, method="cheby")
    assert np.linalg.norm(np.asarray(res_tuple) - np.asarray(res_gen)) < 1e-12


def test_liouvillian_accepts_tuple():
    H0 = np.diag([0.5, -0.5]).astype(complex)
    H1 = np.array([[0, 1], [1, 0]], dtype=complex)
    eps = lambda t: np.cos(t)
    L = qp.liouvillian((jnp.asarray(H0), (jnp.asarray(H1), eps)), [], convention="TDSE")
    assert isinstance(L, qp.Generator)
    assert L.shape == (4, 4)
    assert L.amplitudes[0] is eps


def test_substitute_control(tlist):
    eps1 = lambda t: np.sin(t)
    eps2 = lambda t: np.cos(t)
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]]).astype(complex))
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, eps1))
    gen2 = substitute(gen, IdDict([(eps1, eps2)]))
    assert get_controls(gen2) == (eps2,)
    # original untouched
    assert get_controls(gen) == (eps1,)


def test_nonlinear_amplitude(tlist):
    """Amplitude = ϵ² of a control (reference test_controls.jl nonlinear
    coupling): controls extraction sees ϵ, evaluation squares it."""

    class SquaredAmplitude:
        def __init__(self, control):
            self.control = control

        def _get_controls(self):
            return (self.control,)

        def _evaluate(self, *args, vals_dict=None):
            v = evaluate(self.control, *args, vals_dict=vals_dict)
            return v ** 2

        def _substitute(self, repl):
            return SquaredAmplitude(substitute(self.control, repl))

    eps = lambda t: np.sin(t)
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]]).astype(complex))
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, SquaredAmplitude(eps)))
    assert get_controls(gen) == (eps,)
    op = evaluate(gen, tlist, 3)
    t3 = qp.t_mid(tlist, 3)
    assert np.allclose(np.asarray(op.to_dense()), np.sin(t3) ** 2 * np.asarray(H1))
    # vals_dict override applies to the CONTROL, amplitude still squares
    op2 = evaluate(gen, tlist, 3, vals_dict=IdDict([(eps, 3.0)]))
    assert np.allclose(np.asarray(op2.to_dense()), 9.0 * np.asarray(H1))

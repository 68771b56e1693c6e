"""Negative-path contract tests (mirrors reference
``test/test_invalid_interfaces.jl``): deliberately broken states,
operators, amplitudes, controls, generators, and propagators must make
the corresponding checker return ``False`` AND emit the specific
diagnostic."""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.interfaces import (
    check_amplitude,
    check_control,
    check_generator,
    check_operator,
    check_propagator,
    check_state,
    check_tlist,
)
from quantumpropagators.utils.fixtures import random_matrix, random_state_vector

LOGGER = "quantumpropagators.interfaces"


@pytest.fixture
def tlist():
    return np.linspace(0, 1, 11)


# -- tlist ------------------------------------------------------------------

def test_tlist_too_short(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_tlist(np.array([1.0]))
    assert "at least 2 points" in caplog.text


def test_tlist_not_monotonic(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_tlist(np.array([0.0, 2.0, 1.0]))
    assert "monotonically increasing" in caplog.text


def test_tlist_not_vector(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_tlist(np.zeros((3, 3)))
    assert "1D" in caplog.text


def test_tlist_nonfinite(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_tlist(np.array([0.0, 1.0, np.inf]))
    assert "finite" in caplog.text


# -- state ------------------------------------------------------------------

def test_state_real_dtype(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(jnp.ones(4))
    assert "complex" in caplog.text


def test_state_unnormalized(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(2.0 * jnp.ones(4, dtype=complex), normalized=True)
    assert "normalized" in caplog.text


def test_state_nonfinite(caplog):
    bad = jnp.asarray(np.array([np.nan + 0j, 1.0]))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(bad)
    assert "finite" in caplog.text or "norm" in caplog.text


class _BadAddState:
    """A 'state' whose addition is broken (returns wrong values)."""

    def __init__(self, data):
        self.data = np.asarray(data, dtype=complex)

    def __add__(self, other):
        return _BadAddState(self.data)  # wrong: ignores other

    def __sub__(self, other):
        return _BadAddState(self.data - other.data)

    def __mul__(self, a):
        return _BadAddState(a * self.data)

    __rmul__ = __mul__

    def __array__(self, dtype=None, copy=None):
        return self.data if dtype is None else self.data.astype(dtype)


def test_state_broken_addition(caplog):
    psi = _BadAddState(random_state_vector(4, rng=np.random.default_rng(0)))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(psi)
    assert "state + state" in caplog.text


# -- operator ---------------------------------------------------------------

def test_operator_not_square(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(jnp.ones((3, 4), dtype=complex), tlist=tlist)
    assert "square" in caplog.text


class _WrongShapeOp:
    shape = (4, 4)

    def apply(self, psi):
        return jnp.zeros(3, dtype=psi.dtype)  # wrong output shape


def test_operator_wrong_apply_shape(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(1)))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(_WrongShapeOp(), state=psi, tlist=tlist)
    assert "same shape" in caplog.text


# -- control ----------------------------------------------------------------

def test_control_returns_string(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_control(lambda t: "nope", tlist=tlist)
    assert "float" in caplog.text


def test_control_nonfinite_discretization(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_control(lambda t: 1.0 / (t - t), tlist=tlist)
    # 1/(t-t) = inf/nan everywhere
    assert "finite" in caplog.text or "float" in caplog.text


def test_control_wrong_length_vector(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_control(np.zeros(5), tlist=tlist)
    assert caplog.text  # any diagnostic


# -- amplitude --------------------------------------------------------------

class _NonNumericAmplitude:
    def _get_controls(self):
        return ()

    def _evaluate(self, *args, vals_dict=None):
        return np.zeros(3)  # not a number

    def _substitute(self, replacements):
        return replacements.get(self, self)


def test_amplitude_not_numeric(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_amplitude(_NonNumericAmplitude(), tlist=tlist)
    assert "number" in caplog.text


# -- generator --------------------------------------------------------------

def test_generator_bad_control(caplog, tlist):
    rng = np.random.default_rng(2)
    H0 = jnp.asarray(random_matrix(4, hermitian=True, rng=rng))
    H1 = jnp.asarray(random_matrix(4, hermitian=True, rng=rng))
    gen = qp.hamiltonian(H0, (H1, lambda t: "broken"))
    psi = jnp.asarray(random_state_vector(4, rng=rng))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_generator(gen, state=psi, tlist=tlist)
    assert "check_control" in caplog.text or "float" in caplog.text


# -- propagator -------------------------------------------------------------

class _StuckPropagator(qp.propagators.Propagator):
    """prop_step never advances t."""

    def __init__(self, state, tlist):
        self.state = state
        self.tlist = np.asarray(tlist)
        self.t = float(tlist[0])
        self.parameters = None
        self.backward = False

    def prop_step(self):
        return self.state  # t not advanced

    def set_t(self, t):
        self.t = float(t)

    def _reinit(self, state, **kw):
        self.state = state
        self.t = float(self.tlist[0])


def test_propagator_stuck_time(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(3)))
    prop = _StuckPropagator(psi, tlist)
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop)
    assert "one grid point" in caplog.text


class _NeverEndsPropagator(_StuckPropagator):
    def prop_step(self):
        # advances but never returns None
        i = int(np.searchsorted(self.tlist, self.t, side="right"))
        if i < len(self.tlist):
            self.t = float(self.tlist[i])
        return self.state


def test_propagator_never_returns_none(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(4)))
    prop = _NeverEndsPropagator(psi, tlist)
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop)
    assert "None past the end" in caplog.text


def test_propagator_missing_property(caplog, tlist):
    class _NoParams:
        state = jnp.zeros(2, dtype=complex)
        tlist = np.linspace(0, 1, 5)
        t = 0.0
        backward = False

        def prop_step(self):
            return None

    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(_NoParams())
    assert "parameters" in caplog.text

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


# -- state pathologies (reference test_invalid_interfaces.jl:426-1028) -------

class _ArrayLikeState:
    """Minimal well-behaved duck state; subclasses break ONE axiom."""

    def __init__(self, data):
        self.data = np.asarray(data, dtype=complex)

    def _new(self, data):
        out = object.__new__(type(self))
        out.data = np.asarray(data, dtype=complex)
        return out

    def __add__(self, other):
        return self._new(self.data + other.data)

    def __sub__(self, other):
        return self._new(self.data - other.data)

    def __mul__(self, a):
        return self._new(a * self.data)

    __rmul__ = __mul__

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]

    def __iter__(self):
        return iter(self.data)

    def __array__(self, dtype=None, copy=None):
        return self.data if dtype is None else self.data.astype(dtype)

    def dot(self, other):
        return np.vdot(self.data, other.data)

    def norm(self):
        return float(np.linalg.norm(self.data))


def _rand_duck(cls, n=4, seed=0):
    return cls(random_state_vector(n, rng=np.random.default_rng(seed)))


def test_duck_state_passes():
    """The well-behaved duck state passes (fixture sanity)."""
    assert check_state(_rand_duck(_ArrayLikeState))


class _ConstantNormState(_ArrayLikeState):
    """norm() always returns 1 (reference 'constant norm' testset)."""

    def norm(self):
        return 1.0


def test_state_constant_norm(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_ConstantNormState, seed=1))
    assert "norm" in caplog.text


class _SquaredNormState(_ArrayLikeState):
    """norm() returns ||psi||^2 (reference 'squared norm' testset)."""

    def norm(self):
        return float(np.linalg.norm(self.data)) ** 2


def test_state_squared_norm(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_SquaredNormState, seed=2))
    assert "norm" in caplog.text


class _BrokenScalarMulState(_ArrayLikeState):
    def __mul__(self, a):
        return self._new(self.data)  # ignores the scalar

    __rmul__ = __mul__


def test_state_broken_scalar_mul(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_BrokenScalarMulState, seed=3))
    assert "scalar" in caplog.text or "homogeneous" in caplog.text


class _BrokenSubState(_ArrayLikeState):
    def __sub__(self, other):
        return self._new(self.data)  # ignores other


def test_state_broken_subtraction(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_BrokenSubState, seed=4))
    assert "norm 0" in caplog.text or "subtraction" in caplog.text


class _NonConjugateDotState(_ArrayLikeState):
    """dot without complex conjugation: dot(psi,psi) is complex."""

    def dot(self, other):
        return np.sum(self.data * other.data)


def test_state_nonconjugate_dot(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_NonConjugateDotState, seed=5))
    assert "dot" in caplog.text or "inner product" in caplog.text


class _ThrowingNormState(_ArrayLikeState):
    def norm(self):
        raise RuntimeError("norm exploded")


def test_state_throwing_norm(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_ThrowingNormState, seed=6))
    assert "norm" in caplog.text


class _ZeroLengthState(_ArrayLikeState):
    def __len__(self):
        return 0


def test_state_zero_length(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_ZeroLengthState, seed=7))
    assert "length" in caplog.text or "len" in caplog.text


class _LyingIterState(_ArrayLikeState):
    def __iter__(self):
        return iter(self.data[:2])  # fewer entries than len()


def test_state_lying_iteration(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_LyingIterState, seed=8))
    assert "len(state)" in caplog.text or "iterating" in caplog.text


class _RealArrayViewState(_ArrayLikeState):
    def __array__(self, dtype=None, copy=None):
        return self.data.real


def test_state_real_array_view(caplog):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_state(_rand_duck(_RealArrayViewState, seed=9))
    assert "complex" in caplog.text


# -- operator pathologies (reference testsets 82-402, 729-806) ---------------

class _ThrowingApplyOp:
    shape = (4, 4)

    def apply(self, psi):
        raise RuntimeError("apply exploded")


def test_operator_throwing_apply(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(10)))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(_ThrowingApplyOp(), state=psi, tlist=tlist)
    assert "applicable" in caplog.text or "apply" in caplog.text


class _ThrowingShapeOp:
    @property
    def shape(self):
        raise RuntimeError("size exploded")

    def apply(self, psi):
        return psi


def test_operator_throwing_shape(caplog, tlist):
    """Reference 'Invalid operator with throwing size' testset."""
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(_ThrowingShapeOp(), tlist=tlist)
    assert "shape" in caplog.text


class _BadSizeDimsOp:
    shape = (4, 4, 4)  # 3D "operator"

    def apply(self, psi):
        return psi


def test_operator_bad_size_dimensions(caplog, tlist):
    """Reference 'Invalid operator with bad size dimensions' testset."""
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(_BadSizeDimsOp(), tlist=tlist)
    assert "square" in caplog.text or "shape" in caplog.text


class _NonLinearOp:
    """apply is affine, not linear (violates op @ (a psi) = a op psi)."""

    shape = (4, 4)

    def apply(self, psi):
        return psi + 1.0


def test_operator_nonlinear(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(11)))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        ok = check_operator(_NonLinearOp(), state=psi, tlist=tlist)
    # the checker must either reject or at minimum flag expectation
    # inconsistency; a silent pass is a contract hole
    assert not ok


def test_operator_wrong_return_type(caplog, tlist):
    class _StringOp:
        shape = (4, 4)

        def apply(self, psi):
            return "not a state"

    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(12)))
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_operator(_StringOp(), state=psi, tlist=tlist)
    assert caplog.text


# -- amplitude pathologies (reference testsets 26-46, 754-780) ---------------

class _ThrowingEvaluateAmpl:
    def _get_controls(self):
        return ()

    def _evaluate(self, *args, vals_dict=None):
        raise RuntimeError("evaluate exploded")

    def _substitute(self, replacements):
        return replacements.get(self, self)


def test_amplitude_throwing_evaluate(caplog, tlist):
    """Reference 'Invalid operator with throwing evaluate' testset."""
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_amplitude(_ThrowingEvaluateAmpl(), tlist=tlist)
    assert "evaluate" in caplog.text


class _NonTupleControlsAmpl:
    def _get_controls(self):
        return [lambda t: 1.0]  # list, not tuple

    def _evaluate(self, *args, vals_dict=None):
        return 1.0

    def _substitute(self, replacements):
        return replacements.get(self, self)


def test_amplitude_controls_not_tuple(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_amplitude(_NonTupleControlsAmpl(), tlist=tlist)
    assert "tuple" in caplog.text


class _BadSubstituteAmpl:
    def _get_controls(self):
        return ()

    def _evaluate(self, *args, vals_dict=None):
        return 1.0

    def _substitute(self, replacements):
        return None  # does not round-trip


def test_amplitude_bad_substitute(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_amplitude(_BadSubstituteAmpl(), tlist=tlist)
    assert "substitute" in caplog.text


class _BadControlAmpl:
    def _get_controls(self):
        return (lambda t: "broken",)

    def _evaluate(self, *args, vals_dict=None):
        return 1.0

    def _substitute(self, replacements):
        return replacements.get(self, self)


def test_amplitude_with_invalid_control(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_amplitude(_BadControlAmpl(), tlist=tlist)
    assert "check_control" in caplog.text or "control" in caplog.text


# -- control pathologies ------------------------------------------------------

def test_control_complex_valued(caplog, tlist):
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_control(lambda t: 1.0j * t, tlist=tlist)
    assert "float" in caplog.text


def test_control_throwing(caplog, tlist):
    def boom(t):
        raise RuntimeError("control exploded")

    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_control(boom, tlist=tlist)
    assert caplog.text


# -- generator pathologies (reference testset 403-425) -----------------------

def test_generator_mismatched_shapes(caplog, tlist):
    rng = np.random.default_rng(13)
    H0 = jnp.asarray(random_matrix(4, hermitian=True, rng=rng))
    H1 = jnp.asarray(random_matrix(3, hermitian=True, rng=rng))
    with pytest.raises(ValueError):
        qp.hamiltonian(H0, (H1, lambda t: 1.0))


def test_generator_evaluates_to_invalid_operator(caplog, tlist):
    gen = qp.hamiltonian(
        jnp.ones((3, 4), dtype=complex), check=False
    )  # non-square drift smuggled past the builder
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_generator(gen, state=None, tlist=tlist)
    assert "operator" in caplog.text or "square" in caplog.text


# -- propagator pathologies (reference testset 1029+) ------------------------

class _WrongShapeStepPropagator(_StuckPropagator):
    def prop_step(self):
        i = int(np.searchsorted(self.tlist, self.t, side="right"))
        if i >= len(self.tlist):
            return None
        self.t = float(self.tlist[i])
        return jnp.zeros(3, dtype=complex)  # wrong shape, unnormalized


def test_propagator_wrong_state_shape(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(14)))
    prop = _WrongShapeStepPropagator(psi, tlist)
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop)
    assert "same shape" in caplog.text


class _BadReinitPropagator(_StuckPropagator):
    def prop_step(self):
        i = int(np.searchsorted(self.tlist, self.t, side="right"))
        if i >= len(self.tlist):
            return None
        self.t = float(self.tlist[i])
        return self.state

    def _reinit(self, state, **kw):
        self.state = state
        self.t = float(self.tlist[-1])  # WRONG: does not reset t


def test_propagator_bad_reinit(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(15)))
    prop = _BadReinitPropagator(psi, tlist)
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop)
    assert "reinit" in caplog.text


class _NoSnapWarnPropagator(_StuckPropagator):
    """Snaps set_t to the grid silently (must warn)."""

    def prop_step(self):
        i = int(np.searchsorted(self.tlist, self.t, side="right"))
        if i >= len(self.tlist):
            return None
        self.t = float(self.tlist[i])
        return self.state

    def set_t(self, t):
        idx = int(np.argmin(np.abs(self.tlist - float(t))))
        self.t = float(self.tlist[idx])  # silent snap

    def _reinit(self, state, **kw):
        self.state = state
        self.t = float(self.tlist[0])


def test_propagator_silent_snap(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(16)))
    prop = _NoSnapWarnPropagator(psi, tlist)
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop)
    assert "warn" in caplog.text


class _BadSetStatePropagator(_NoSnapWarnPropagator):
    def set_t(self, t):
        import warnings

        idx = int(np.argmin(np.abs(self.tlist - float(t))))
        if abs(self.tlist[idx] - float(t)) > 1e-12:
            warnings.warn(f"Snapping t={t} to grid")
        self.t = float(self.tlist[idx])

    def set_state(self, state):
        pass  # ignores the new state


def test_propagator_bad_set_state(caplog, tlist):
    psi = jnp.asarray(random_state_vector(4, rng=np.random.default_rng(17)))
    prop = _BadSetStatePropagator(psi, tlist)
    prop.prop_step()  # move off psi0 so set_state(psi0) is detectable
    prop2 = _BadSetStatePropagator(
        jnp.asarray(random_state_vector(4, rng=np.random.default_rng(18))),
        tlist,
    )
    with caplog.at_level(logging.ERROR, logger=LOGGER):
        assert not check_propagator(prop2)
    assert "set_state" in caplog.text

"""CRAB parameterized control functions (mirrors reference
``test/test_crab_functions.jl``): parameter layout, parity variants,
RNG reproducibility, guess/shape composition, frequency scaling."""

import numpy as np
import pytest

from quantumpropagators import (
    CRABFunction,
    ParameterizedFunction,
    VariedFrequencyCRABFunction,
    crab_initial_parameters,
    get_parameters,
)


def test_parameter_layout():
    # evenodd, no guess: 2N weights
    p = crab_initial_parameters(3)
    assert p.shape == (6,)
    assert np.all(p == 0)
    # with guess + scale: +1 leading weight = 1
    p = crab_initial_parameters(3, guess=lambda t: t)
    assert p.shape == (7,)
    assert p[0] == 1.0
    # single parity: N weights
    assert crab_initial_parameters(3, parity="even").shape == (3,)
    # varied frequencies: +N trailing scales = 1
    p = crab_initial_parameters(3, vary_frequencies=True)
    assert p.shape == (9,)
    assert np.all(p[-3:] == 1.0)


def test_rng_reproducibility():
    f1 = CRABFunction(4, max_frequency=5.0, rng=np.random.default_rng(42))
    f2 = CRABFunction(4, max_frequency=5.0, rng=np.random.default_rng(42))
    assert np.array_equal(f1.frequencies, f2.frequencies)
    assert np.array_equal(f1.parameters, f2.parameters)
    assert f1(1.234) == f2(1.234)


def test_evaluation_matches_formula():
    rng = np.random.default_rng(7)
    N = 3
    f = CRABFunction(
        N,
        frequencies=np.array([1.0, 2.0, 3.0]),
        rng=rng,
        guess=lambda t: 0.5 * t,
        shape=lambda t: np.exp(-t),
    )
    t = 0.7
    c0 = f.parameters[0]
    c_cos = f.parameters[1 : 1 + N]
    c_sin = f.parameters[1 + N : 1 + 2 * N]
    w = f.frequencies
    expected = np.exp(-t) * (
        np.dot(c_cos, np.cos(w * t)) + np.dot(c_sin, np.sin(w * t))
    ) + c0 * (0.5 * t)
    assert f(t) == pytest.approx(expected)


def test_parity_variants():
    freqs = np.array([1.0, 2.0])
    even = CRABFunction(2, frequencies=freqs, parity="even",
                        parameters=np.array([0.3, 0.4]))
    odd = CRABFunction(2, frequencies=freqs, parity="odd",
                       parameters=np.array([0.3, 0.4]))
    t = 0.9
    assert even(t) == pytest.approx(0.3 * np.cos(t) + 0.4 * np.cos(2 * t))
    assert odd(t) == pytest.approx(0.3 * np.sin(t) + 0.4 * np.sin(2 * t))
    assert even(-t) == pytest.approx(even(t))  # even function
    assert odd(-t) == pytest.approx(-odd(t))  # odd function


def test_varied_frequencies():
    freqs = np.array([1.0, 2.0])
    params = np.array([0.5, 0.5, 0.0, 0.0, 2.0, 3.0])  # cos+sin weights, scales
    f = VariedFrequencyCRABFunction(2, frequencies=freqs, parameters=params)
    t = 0.31
    expected = 0.5 * np.cos(2.0 * 1.0 * t) + 0.5 * np.cos(3.0 * 2.0 * t)
    assert f(t) == pytest.approx(expected)


def test_is_parameterized_function():
    f = CRABFunction(2, max_frequency=3.0, rng=np.random.default_rng(0))
    assert isinstance(f, ParameterizedFunction)
    assert get_parameters(f) is f.parameters
    from quantumpropagators.interfaces import check_parameterized_function

    assert check_parameterized_function(f, tlist=np.linspace(0, 1, 11))


def test_errors():
    with pytest.raises(ValueError, match="cannot be all zero"):
        CRABFunction(2)
    with pytest.raises(ValueError, match="parity"):
        CRABFunction(2, max_frequency=1.0, parity="bogus")
    with pytest.raises(ValueError, match="Number of parameters"):
        CRABFunction(2, max_frequency=1.0, parameters=np.zeros(17))
    with pytest.raises(ValueError, match="vector"):
        CRABFunction(2, max_frequency=1.0, guess=np.zeros(10))

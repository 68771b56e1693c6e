"""Parameterized controls and parameter aliasing (mirrors reference
``test/test_parameterization.jl``): collected parameter arrays alias
the controls' own parameters; shared vs independent parameters across
generators (the enantiomer-discrimination setup)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators import ParameterizedFunction, get_parameters
from quantumpropagators.interfaces import (
    check_parameterized,
    check_parameterized_function,
)


class CosineControl(ParameterizedFunction):
    """f(t) = p[0] * cos(p[1] * t)"""

    def __init__(self, a, w):
        self.parameters = np.array([a, w], dtype=np.float64)

    def __call__(self, t):
        return float(self.parameters[0] * np.cos(self.parameters[1] * t))


def test_parameters_alias():
    f = CosineControl(1.0, 2.0)
    p = get_parameters(f)
    assert p is f.parameters
    p[0] = 5.0  # mutating the collected array mutates the control
    assert f(0.0) == pytest.approx(5.0)
    tlist = np.linspace(0, 1, 11)
    assert check_parameterized_function(f, tlist=tlist)
    assert check_parameterized(f)


def test_generator_parameter_collection():
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]], dtype=complex))
    H2 = jnp.asarray(np.array([[0, -1j], [1j, 0]]))
    f1 = CosineControl(1.0, 2.0)
    f2 = CosineControl(0.5, 3.0)
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, f1), (H2, f2))
    params = get_parameters(gen)
    assert isinstance(params, tuple)
    assert len(params) == 2
    assert params[0] is f1.parameters
    assert params[1] is f2.parameters


def test_shared_vs_independent_parameters():
    """Enantiomer setup (reference test_parameterization.jl:226-297):
    two generators driven by controls that SHARE one parameter array —
    the shared array must be collected once across both generators,
    and mutating it affects both."""
    shared = np.array([1.0, 2.0])

    class SharedControl(ParameterizedFunction):
        def __init__(self, parameters, sign):
            self.parameters = parameters  # aliased, not copied
            self.sign = sign

        def __call__(self, t):
            return float(self.sign * self.parameters[0] * np.cos(self.parameters[1] * t))

    plus = SharedControl(shared, +1.0)
    minus = SharedControl(shared, -1.0)  # enantiomer: opposite sign
    H1 = jnp.asarray(np.array([[0, 1], [1, 0]], dtype=complex))
    gen_plus = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, plus))
    gen_minus = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, minus))

    # collected over both generators: ONE array (identity dedup)
    all_params = []
    for g in (gen_plus, gen_minus):
        p = get_parameters(g)
        arrs = p if isinstance(p, tuple) else (p,)
        for a in arrs:
            if not any(a is s for s in all_params):
                all_params.append(a)
    assert len(all_params) == 1
    assert all_params[0] is shared

    # mutation propagates to both drives with opposite sign
    shared[0] = 3.0
    assert plus(0.0) == pytest.approx(3.0)
    assert minus(0.0) == pytest.approx(-3.0)


def test_parameterized_control_in_propagation():
    """Propagation picks up the CURRENT parameter values at init
    (piecewise-constant discretization of the parameterized function)."""
    f = CosineControl(1.0, 0.0)  # constant amplitude p[0]
    sx = jnp.asarray(np.array([[0, 1], [1, 0]], dtype=complex))
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (sx, f))
    tlist = np.linspace(0, np.pi / 2, 51)
    psi0 = jnp.asarray([1, 0], dtype=complex)
    # amplitude 1.0 for time pi/2: full population transfer
    out = qp.propagate(psi0, gen, tlist, method="cheby")
    assert abs(float(jnp.abs(out[1]) ** 2) - 1.0) < 1e-9
    # change the parameter, re-init: half rotation
    f.parameters[0] = 0.5
    out2 = qp.propagate(psi0, gen, tlist, method="cheby")
    assert float(jnp.abs(out2[1]) ** 2) == pytest.approx(0.5, abs=1e-9)


def test_parameter_partition_combined_view():
    """Multiple parameter arrays combine into a flat aliased view
    (reference ArrayPartition combining, src/controls.jl:575-621)."""
    from quantumpropagators.models.controls import ParameterPartition

    H1 = jnp.asarray(np.array([[0, 1], [1, 0]], dtype=complex))
    H2 = jnp.asarray(np.array([[0, -1j], [1j, 0]]))
    f1 = CosineControl(1.0, 2.0)
    f2 = CosineControl(0.5, 3.0)
    gen = qp.hamiltonian(jnp.zeros((2, 2), dtype=complex), (H1, f1), (H2, f2))
    p = get_parameters(gen)
    assert isinstance(p, ParameterPartition)
    assert isinstance(p, tuple)  # backward compatible
    assert p.n_params == 4
    v = p.as_vector()
    assert v.shape == (4,)
    assert np.allclose(v, [1.0, 2.0, 0.5, 3.0])
    # writes through the combined view reach the controls
    p.set_vector(np.array([9.0, 8.0, 7.0, 6.0]))
    assert f1.parameters[0] == 9.0 and f1.parameters[1] == 8.0
    assert f2.parameters[0] == 7.0 and f2.parameters[1] == 6.0
    assert float(f1(0.0)) == 9.0  # control evaluates the new values
    with pytest.raises(ValueError):
        p.set_vector(np.zeros(3))
    assert p.flat_index(2) == (1, 0)

"""Behavioral contract tests for every propagator (mirrors reference
``test/test_prop_interfaces.jl``): ``check_propagator`` for
{forward, backward} × all methods, the property firewall, and
error paths (unknown methods, non-uniform grids)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.interfaces import check_propagator
from quantumpropagators.utils.fixtures import (
    random_dynamic_generator,
    random_state_vector,
)


@pytest.fixture
def problem():
    rng = np.random.default_rng(33)
    tlist = np.linspace(0, 2, 21)
    gen = random_dynamic_generator(12, tlist, rng=rng)
    psi0 = jnp.asarray(random_state_vector(12, rng=rng))
    return psi0, gen, tlist


@pytest.mark.parametrize("method", ["cheby", "newton", "expprop"])
@pytest.mark.parametrize("backward", [False, True])
def test_contract(problem, method, backward):
    psi0, gen, tlist = problem
    prop = qp.init_prop(psi0, gen, tlist, method=method, backward=backward)
    assert check_propagator(prop)


def test_generator_firewall(problem):
    psi0, gen, tlist = problem
    prop = qp.init_prop(psi0, gen, tlist, method="cheby")
    with pytest.raises(AttributeError):
        prop.generator = gen


def test_unknown_method(problem):
    psi0, gen, tlist = problem
    with pytest.raises(ValueError, match="Unknown propagation method"):
        qp.init_prop(psi0, gen, tlist, method="nosuchmethod")


def test_nonuniform_grid_rejected(problem):
    psi0, gen, _ = problem
    tlist = np.array([0.0, 0.1, 0.3, 0.6, 1.0])
    with pytest.warns(UserWarning, match="Non-uniform"):
        with pytest.raises(ValueError, match="uniform time grid"):
            qp.init_prop(psi0, gen, tlist, method="cheby")


def test_time_snapping(problem):
    psi0, gen, tlist = problem
    prop = qp.init_prop(psi0, gen, tlist, method="expprop")
    with pytest.warns(UserWarning, match="Snapping"):
        prop.set_t(tlist[3] + 0.33 * (tlist[4] - tlist[3]))
    # snaps UP to the next grid point (reference src/pwc_utils.jl:62
    # uses searchsortedfirst)
    assert prop.t == pytest.approx(tlist[4])


def test_set_t_moves_interval(problem):
    psi0, gen, tlist = problem
    prop = qp.init_prop(psi0, gen, tlist, method="cheby")
    prop.set_t(tlist[5])
    assert prop.n == 5
    psi = prop.prop_step()
    assert prop.t == pytest.approx(tlist[6])


def test_reinit_fast_path(problem):
    """Cheby reinit must not recompute coefficients when amplitudes stay
    within the certified range (the optimal-control fast path,
    reference ``src/cheby_propagator.jl:243-299``)."""
    psi0, gen, tlist = problem
    prop = qp.init_prop(psi0, gen, tlist, method="cheby")
    wrk_before = prop.wrk
    qp.reinit_prop(prop, psi0)
    assert prop.wrk is wrk_before  # reused
    # shrink parameters → still within range → reuse
    for c in prop.controls:
        prop.parameters[c] = 0.5 * np.asarray(prop.parameters[c])
    qp.reinit_prop(prop, psi0)
    assert prop.wrk is wrk_before
    # grow parameters past the range → recompute
    for c in prop.controls:
        prop.parameters[c] = 10.0 * np.asarray(prop.parameters[c])
    qp.reinit_prop(prop, psi0)
    assert prop.wrk is not wrk_before


def test_parameter_mutation_changes_dynamics(problem):
    """Mutating propagator.parameters must affect subsequent steps
    (optimal-control aliasing contract)."""
    psi0, gen, tlist = problem
    prop1 = qp.init_prop(psi0, gen, tlist, method="expprop")
    prop2 = qp.init_prop(psi0, gen, tlist, method="expprop")
    for c in prop2.controls:
        prop2.parameters[c] = 0.0 * np.asarray(prop2.parameters[c])
    s1 = s2 = None
    while True:
        r1 = prop1.prop_step()
        r2 = prop2.prop_step()
        if r1 is None:
            break
        s1, s2 = r1, r2
    assert np.linalg.norm(np.asarray(s1) - np.asarray(s2)) > 1e-6


def test_auto_method_selection():
    """method='auto' picks Chebyshev for Hermitian generators and
    Newton for non-Hermitian ones (Liouvillians)."""
    import quantumpropagators as qp
    from quantumpropagators.propagators import ChebyPropagator, NewtonPropagator

    rng = np.random.default_rng(5)
    H = random_dynamic_generator(12, np.linspace(0, 1, 11), rng=rng)
    psi = jnp.asarray(random_state_vector(12, rng=rng))
    prop = qp.init_prop(psi, H, np.linspace(0, 1, 11), method="auto")
    assert isinstance(prop, ChebyPropagator)
    # a dissipative Liouvillian is non-Hermitian
    SM = np.array([[0, 1], [0, 0]], dtype=complex)
    L = qp.liouvillian(
        jnp.asarray(np.diag([0.5, -0.5]).astype(complex)), [SM], convention="TDSE"
    )
    rho0 = jnp.asarray(np.array([0, 0, 0, 1], dtype=complex))
    prop2 = qp.init_prop(rho0, L, np.linspace(0, 1, 11), method="auto")
    assert isinstance(prop2, NewtonPropagator)

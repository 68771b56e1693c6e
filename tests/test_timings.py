"""Timing instrumentation (reference ``test/test_timings.jl`` strategy:
enable_timings must record matvec counts during a propagation; disabled
by default; reset on reinit)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.utils.timings import (
    disable_timings,
    enable_timings,
    timings_enabled,
)


@pytest.fixture()
def rabi_problem():
    sz = jnp.asarray([[1, 0], [0, -1]], dtype=complex)
    sx = jnp.asarray([[0, 1], [1, 0]], dtype=complex)
    H = qp.hamiltonian(0.5 * sz, (sx, lambda t: 0.8))
    tlist = np.linspace(0, 10, 101)
    psi0 = jnp.asarray([1, 0], dtype=complex)
    return psi0, H, tlist


@pytest.fixture(autouse=True)
def _restore_timings_flag():
    yield
    disable_timings()


def test_timings_disabled_by_default(rabi_problem):
    psi0, H, tlist = rabi_problem
    assert not timings_enabled()
    prop = qp.init_prop(psi0, H, tlist, method="cheby")
    for _ in range(len(tlist) - 1):
        qp.prop_step(prop)
    assert prop.timing_data.times == {}
    assert prop.timing_data.counters == {}


def test_timings_record_matvecs(rabi_problem):
    """After enable_timings, a 100-step Chebyshev propagation records
    >200 matvecs (reference ``test/test_timings.jl:28-30``)."""
    psi0, H, tlist = rabi_problem
    enable_timings()
    prop = qp.init_prop(psi0, H, tlist, method="cheby")
    n_steps = 0
    while qp.prop_step(prop) is not None:
        n_steps += 1
    assert n_steps == len(tlist) - 1
    assert prop.timing_data.calls["prop_step"] == n_steps
    assert prop.timing_data.counters["matvec"] > 200
    assert prop.timing_data.times["prop_step"] > 0.0
    report = prop.timing_data.report()
    assert "prop_step" in report and "matvec" in report


def test_timings_reset_on_reinit(rabi_problem):
    psi0, H, tlist = rabi_problem
    enable_timings()
    prop = qp.init_prop(psi0, H, tlist, method="cheby")
    qp.prop_step(prop)
    assert prop.timing_data.counters.get("matvec", 0) > 0
    qp.reinit_prop(prop, psi0)
    assert prop.timing_data.counters == {}
    assert prop.timing_data.calls == {}


def test_timings_toggle_roundtrip(rabi_problem):
    psi0, H, tlist = rabi_problem
    assert enable_timings() is True
    assert timings_enabled()
    assert disable_timings() is False
    assert not timings_enabled()
    prop = qp.init_prop(psi0, H, tlist, method="cheby")
    qp.prop_step(prop)
    assert prop.timing_data.counters == {}


@pytest.mark.parametrize("method", ["newton", "expv"])
def test_timings_other_methods(method):
    # Newton needs dim > 2: use an 8-level random Hermitian system
    rng = np.random.default_rng(5)
    A = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    H = qp.hamiltonian(jnp.asarray(A + A.conj().T))
    tlist = np.linspace(0, 1, 11)
    psi0 = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    psi0 = jnp.asarray(psi0 / np.linalg.norm(psi0))
    enable_timings()
    prop = qp.init_prop(psi0, H, tlist, method=method)
    qp.prop_step(prop)
    qp.prop_step(prop)
    assert prop.timing_data.calls["prop_step"] == 2
    if method == "newton":
        assert prop.timing_data.counters["matvec"] > 0

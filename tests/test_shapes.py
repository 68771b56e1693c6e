"""Pulse shape functions (reference ``test/test_shapes.jl`` strategy:
exact values at edges/center, support boundaries, ramp structure)."""

import numpy as np
import pytest

from quantumpropagators import blackman, box, flattop


def test_box_values():
    assert box(-0.1, 0.0, 1.0) == 0.0
    assert box(0.0, 0.0, 1.0) == 1.0
    assert box(0.5, 0.0, 1.0) == 1.0
    assert box(1.0, 0.0, 1.0) == 1.0
    assert box(1.1, 0.0, 1.0) == 0.0


def test_box_vectorized():
    t = np.linspace(-1, 2, 31)
    vals = box(t, 0.0, 1.0)
    assert vals.shape == t.shape
    np.testing.assert_array_equal(vals, ((t >= 0) & (t <= 1)).astype(float))


def test_blackman_window():
    # zero at the edges and outside, symmetric, peak at center
    assert blackman(0.0, 0.0, 1.0) == pytest.approx(0.0, abs=1e-15)
    assert blackman(1.0, 0.0, 1.0) == pytest.approx(0.0, abs=1e-15)
    assert blackman(-0.5, 0.0, 1.0) == 0.0
    assert blackman(1.5, 0.0, 1.0) == 0.0
    center = blackman(0.5, 0.0, 1.0)
    # B(1/2) = 1/2 (1 - a + 1 + a) = 1
    assert center == pytest.approx(1.0)
    t = np.linspace(0, 1, 101)
    vals = blackman(t, 0.0, 1.0)
    np.testing.assert_allclose(vals, vals[::-1], atol=1e-14)
    assert np.all(vals >= -1e-15)


def test_blackman_a_parameter():
    # a=0 degenerates to a Hann window: 1/2 (1 - cos 2πx)
    t = np.linspace(0, 1, 11)
    np.testing.assert_allclose(
        blackman(t, 0.0, 1.0, a=0.0), 0.5 * (1 - np.cos(2 * np.pi * t)),
        atol=1e-14,
    )


@pytest.mark.parametrize("func", ["blackman", "sinsq"])
def test_flattop_structure(func):
    T, t_rise = 10.0, 2.0
    f = lambda t: flattop(t, T=T, t_rise=t_rise, func=func)
    # zero outside support; ~0 at the very edges
    assert f(-0.5) == 0.0
    assert f(10.5) == 0.0
    assert f(0.0) == pytest.approx(0.0, abs=1e-14)
    assert f(T) == pytest.approx(0.0, abs=1e-14)
    # exactly 1 on the plateau
    for t in [2.0, 5.0, 8.0]:
        assert f(t) == pytest.approx(1.0, abs=1e-14)
    # ramps are monotone
    up = np.asarray(flattop(np.linspace(0, 2, 50), T=T, t_rise=t_rise, func=func))
    assert np.all(np.diff(up) >= -1e-14)
    down = np.asarray(
        flattop(np.linspace(8, 10, 50), T=T, t_rise=t_rise, func=func)
    )
    assert np.all(np.diff(down) <= 1e-14)


def test_flattop_sinsq_halfway():
    # sin² ramp is exactly 1/2 halfway up the ramp
    assert flattop(1.0, T=10.0, t_rise=2.0, func="sinsq") == pytest.approx(0.5)


def test_flattop_asymmetric_fall():
    T = 10.0
    f = lambda t: flattop(t, T=T, t_rise=1.0, t_fall=3.0)
    assert f(1.5) == pytest.approx(1.0, abs=1e-14)  # past short rise
    assert 0.0 < f(8.5) < 1.0  # inside the long fall
    assert f(6.9) == pytest.approx(1.0, abs=1e-14)  # before the fall


def test_flattop_t0_offset():
    vals0 = flattop(np.linspace(0, 10, 101), T=10.0, t_rise=2.0)
    vals1 = flattop(np.linspace(5, 15, 101), T=15.0, t_rise=2.0, t0=5.0)
    np.testing.assert_allclose(vals0, vals1, atol=1e-14)


def test_flattop_unknown_func():
    with pytest.raises(ValueError, match="sinsq"):
        flattop(0.5, T=10.0, t_rise=2.0, func="bogus")


def test_flattop_zero_rise_is_box():
    t = np.linspace(-1, 11, 49)
    np.testing.assert_array_equal(
        flattop(t, T=10.0, t_rise=0.0), box(t, 0.0, 10.0)
    )

"""Time-grid discretization semantics.

Mirrors reference ``test/test_discretization.jl``: point↔midpoint
conversions with boundary preservation, and bijectivity of repeated
round trips.
"""

import numpy as np
import pytest

from quantumpropagators import (
    discretize,
    discretize_on_midpoints,
    get_tlist_midpoints,
    t_mid,
)


def test_discretize_function_on_tlist():
    tlist = np.linspace(0, 10, 21)
    vals = discretize(np.sin, tlist, via_midpoints=False)
    assert vals.shape == (21,)
    assert np.allclose(vals, np.sin(tlist))


def test_get_tlist_midpoints():
    tlist = np.linspace(0, 10, 11)
    mid = get_tlist_midpoints(tlist)
    assert len(mid) == 10
    assert mid[0] == tlist[0]
    assert mid[-1] == tlist[-1]
    assert np.allclose(mid[1:-1], 0.5 * (tlist[1:-2] + tlist[2:-1]))
    mid2 = get_tlist_midpoints(tlist, preserve_start=False, preserve_end=False)
    assert mid2[0] == 0.5 * (tlist[0] + tlist[1])
    assert mid2[-1] == 0.5 * (tlist[-2] + tlist[-1])


def test_t_mid_snapping():
    tlist = np.linspace(0, 1, 6)
    assert t_mid(tlist, 0) == tlist[0]
    assert t_mid(tlist, 4) == tlist[-1]
    assert t_mid(tlist, 2) == 0.5 * (tlist[2] + tlist[3])
    with pytest.raises(IndexError):
        t_mid(tlist, 5)


def test_roundtrip_bijectivity():
    """After one (possibly lossy) conversion, further round trips
    between points and intervals must be exact (reference
    ``src/controls.jl:148-186`` note)."""
    rng = np.random.default_rng(1)
    tlist = np.linspace(0, 5, 50)
    c_points = rng.standard_normal(50)
    p = discretize_on_midpoints(c_points, tlist)
    c2 = discretize(p, tlist)
    p2 = discretize_on_midpoints(c2, tlist)
    assert np.allclose(p, p2, atol=1e-14)
    c3 = discretize(p2, tlist)
    assert np.allclose(c2, c3, atol=1e-14)
    # boundary values always preserved exactly
    assert p[0] == c_points[0]
    assert p[-1] == c_points[-1]


def test_discretize_function_via_midpoints():
    tlist = np.linspace(0, np.pi, 40)
    vals = discretize(np.cos, tlist)
    assert vals[0] == pytest.approx(np.cos(tlist[0]))
    assert vals[-1] == pytest.approx(np.cos(tlist[-1]))
    mid = discretize_on_midpoints(np.cos, tlist)
    assert np.allclose(vals, discretize(mid, tlist))


def test_invalid_sizes():
    tlist = np.linspace(0, 1, 10)
    with pytest.raises(ValueError):
        discretize(np.zeros(5), tlist)
    with pytest.raises(ValueError):
        discretize_on_midpoints(np.zeros(5), tlist)

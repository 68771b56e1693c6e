"""Sharded fused Pallas Chebyshev step vs the single-device kernels on
a virtual 8-device CPU mesh (multi-chip-matches-single-chip category,
SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.models.lattice import transverse_field_ising
from quantumpropagators.ops.cheby import cheby_apply, cheby_coeffs
from quantumpropagators.parallel.mesh import chain_mesh, shard_vector
from quantumpropagators.parallel.sharded_fused import (
    make_sharded_fused_cheby_step,
    sharded_flip_plan,
)

L, J, g, h = 13, 1.0, 1.2, 0.3


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return chain_mesh(8)


@pytest.fixture(scope="module")
def problem():
    H_diag, H_x = transverse_field_ising(L, J=J, g=g, h=h, dtype=jnp.float64)
    op = qp.Operator([H_diag, H_x.grouped(7)], np.array([1.0]))
    bound = J * (L - 1) + abs(h) * L + g * L
    rng = np.random.default_rng(23)
    psi = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
    psi /= np.linalg.norm(psi)
    return op, H_diag.diag, psi, -bound, 2 * bound


def test_sharded_flip_plan_split():
    plan, dev_gs = sharded_flip_plan(16, 2.0, 8, tile_rows=8)
    assert plan.L == 13
    assert dev_gs == (2.0, 2.0, 2.0)
    with pytest.raises(ValueError, match="power of two"):
        sharded_flip_plan(16, 1.0, 6)


def test_sharded_fused_step_matches_single_device(mesh, problem):
    op, diag, psi, e_min, delta = problem
    dt = 0.06
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))
    step = make_sharded_fused_cheby_step(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    re = shard_vector(mesh, jnp.asarray(psi.real))
    im = shard_vector(mesh, jnp.asarray(psi.imag))
    d = shard_vector(mesh, jnp.asarray(diag, dtype=jnp.float64))
    out_r, out_i = step(d, re, im, coeffs)
    expected = cheby_apply(op, jnp.asarray(psi), coeffs, delta, e_min, dt)
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    assert np.abs(out - np.asarray(expected)).max() < 1e-12


def test_sharded_fused_flip_scale(mesh, problem):
    """Time-dependent transverse field: sharded flip_scale must match a
    single-device operator with the scaled coefficient."""
    op, diag, psi, e_min, delta = problem
    dt = 0.05
    scale = 0.65
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))
    step = make_sharded_fused_cheby_step(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    re = shard_vector(mesh, jnp.asarray(psi.real))
    im = shard_vector(mesh, jnp.asarray(psi.imag))
    d = shard_vector(mesh, jnp.asarray(diag, dtype=jnp.float64))
    out_r, out_i = step(d, re, im, coeffs, scale)

    H_diag, H_x = transverse_field_ising(L, J=J, g=g, h=h, dtype=jnp.float64)
    op_scaled = qp.Operator(
        [H_diag, H_x.grouped(7)], np.array([scale])
    )
    expected = cheby_apply(
        op_scaled, jnp.asarray(psi), coeffs, delta, e_min, dt
    )
    out = np.asarray(out_r) + 1j * np.asarray(out_i)
    assert np.abs(out - np.asarray(expected)).max() < 1e-12


def test_sharded_fused_backward_roundtrip(mesh, problem):
    op, diag, psi, e_min, delta = problem
    dt = 0.07
    cf = jnp.asarray(cheby_coeffs(delta, dt))
    cb = jnp.asarray(cheby_coeffs(delta, -dt))
    fwd = make_sharded_fused_cheby_step(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    bwd = make_sharded_fused_cheby_step(
        mesh, L, g, delta=delta, e_min=e_min, dt=-dt,
        tile_rows=8, forward=False, interpret=True,
    )
    re = shard_vector(mesh, jnp.asarray(psi.real))
    im = shard_vector(mesh, jnp.asarray(psi.imag))
    d = shard_vector(mesh, jnp.asarray(diag, dtype=jnp.float64))
    re, im = fwd(d, re, im, cf)
    re, im = bwd(d, re, im, cb)
    rt = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(rt - psi) < 1e-12


def test_sharded_fused_dd_step_matches_f64(mesh, problem):
    """The df64 sharded step (device-bit flips via ppermute of all four
    dd planes) matches the complex128 kernel to 1e-12 on 8 virtual
    devices — the reference-accuracy multi-chip configuration (VERDICT
    r1 item 2)."""
    from quantumpropagators.parallel.sharded_fused import (
        make_sharded_fused_cheby_step_dd,
    )

    op, diag, psi, e_min, delta = problem
    dt = 0.06
    beta = delta / 2 + e_min

    def dd_split(x64):
        x64 = np.asarray(x64, dtype=np.float64)
        hi = x64.astype(np.float32)
        return (
            jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
        )

    dmb_h, dmb_l = dd_split(np.asarray(diag, np.float64) - beta)
    c_h, c_l = dd_split(np.asarray(cheby_coeffs(delta, dt)))
    step = make_sharded_fused_cheby_step_dd(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )
    dmb_h = shard_vector(mesh, dmb_h)
    dmb_l = shard_vector(mesh, dmb_l)
    out = step(dmb_h, dmb_l, state4, c_h, c_l)
    z = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    expected = np.asarray(
        cheby_apply(
            op, jnp.asarray(psi), jnp.asarray(cheby_coeffs(delta, dt)),
            delta, e_min, dt,
        )
    )
    assert np.abs(z - expected).max() < 1e-12


def test_sharded_fused_dd_flip_scale(mesh, problem):
    """Sharded dd step with a time-dependent flip scale g(t): matches
    the f64 oracle built at the scaled coupling to 1e-12 (the driven OC
    inner loop, sharded, at reference accuracy)."""
    from quantumpropagators.parallel.sharded_fused import (
        make_sharded_fused_cheby_step_dd,
    )

    op, diag, psi, e_min, delta = problem
    dt = 0.06
    beta = delta / 2 + e_min
    fs64 = 0.7342915  # g(t)/g at this interval

    def dd_split(x64):
        x64 = np.asarray(x64, dtype=np.float64)
        hi = x64.astype(np.float32)
        return (
            jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
        )

    dmb_h, dmb_l = dd_split(np.asarray(diag, np.float64) - beta)
    c_h, c_l = dd_split(np.asarray(cheby_coeffs(delta, dt)))
    step = make_sharded_fused_cheby_step_dd(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )
    out = step(
        shard_vector(mesh, dmb_h), shard_vector(mesh, dmb_l),
        state4, c_h, c_l, flip_scale=dd_split(fs64),
    )
    z = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    # oracle: same H but with the flip coupling scaled by fs64
    H_diag2, H_x2 = transverse_field_ising(
        L, J=J, g=g * fs64, h=h, dtype=jnp.float64
    )
    op2 = qp.Operator([H_diag2, H_x2.grouped(7)], np.array([1.0]))
    expected = np.asarray(
        cheby_apply(
            op2, jnp.asarray(psi), jnp.asarray(cheby_coeffs(delta, dt)),
            delta, e_min, dt,
        )
    )
    assert np.abs(z - expected).max() < 1e-12

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


def test_sharded_fused_dd_f32_tail(mesh, problem):
    """Round-3 kernel parity for the SHARDED dd step (VERDICT r3 item
    2): the mixed-precision f32 tail runs with device-bit remote planes
    delivered HI-ONLY (half the ICI bytes during tail orders), and the
    result still matches the complex128 kernel to 1e-12.  A forced
    4-order tail guarantees the remote-hi path is actually exercised
    regardless of what the 'auto' bound picks."""
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

    coeffs = cheby_coeffs(delta, dt)
    assert len(coeffs) >= 8, "problem too small to exercise a 4-order tail"
    dmb_h, dmb_l = dd_split(np.asarray(diag, np.float64) - beta)
    c_h, c_l = dd_split(coeffs)
    step = make_sharded_fused_cheby_step_dd(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True, f32_tail=4,
    )
    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )
    out = step(
        shard_vector(mesh, dmb_h), shard_vector(mesh, dmb_l),
        state4, c_h, c_l,
    )
    z = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    expected = np.asarray(
        cheby_apply(
            op, jnp.asarray(psi), jnp.asarray(coeffs), delta, e_min, dt,
        )
    )
    assert np.abs(z - expected).max() < 1e-12


def _np_cheby_oracle(diag64, g_bits, Lb, psi, coeffs, delta, e_min, dt):
    """f64 numpy oracle: exp(-i H dt) for H = diag + Σ_j g_j X_j."""
    idx = np.arange(1 << Lb)
    beta = delta / 2 + e_min
    c = -2.0j / delta

    def mv(v):
        out = diag64 * v
        for j in range(Lb):
            if g_bits[j] != 0.0:
                out = out + g_bits[j] * v[idx ^ (1 << j)]
        return out

    v0 = np.asarray(psi, np.complex128)
    v1 = c * (mv(v0) - beta * v0)
    phi = coeffs[0] * v0 + coeffs[1] * v1
    for a in coeffs[2:]:
        v2 = 2.0 * c * (mv(v1) - beta * v1) + v0
        phi = phi + a * v2
        v0, v1 = v1, v2
    return np.exp(-1j * beta * dt) * phi


def test_weak_site_device_bits_skip_exchange(mesh):
    """SCALING.md §2a lever i: device bits assigned to zero-coupling
    sites emit NO ppermute — the sharded dd step's exchange volume
    drops to zero for a field pattern with p uncoupled sites — and the
    result still matches the f64 oracle at 1e-12."""
    from quantumpropagators.parallel.sharded_fused import (
        invert_bit_order,
        make_sharded_fused_cheby_step_dd,
        permute_index_bits,
        weak_site_permutation,
    )

    Lb = 13
    rng = np.random.default_rng(31)
    # transverse field on only 10 of 13 bits: bits 4, 9, 11 uncoupled
    g_bits = rng.uniform(0.8, 1.5, size=Lb)
    for z in (4, 9, 11):
        g_bits[z] = 0.0
    diag64 = rng.normal(size=1 << Lb)
    bound = float(np.abs(diag64).max() + np.abs(g_bits).sum())
    e_min, delta = -bound, 2 * bound
    dt = 0.06

    bit_order, g_perm = weak_site_permutation(Lb, g_bits, 8)
    # the three zero-g bits (plus weakest nonzero ones, if fewer zeros
    # than device bits) land on top
    assert set(bit_order[-3:]) <= {4, 9, 11} or set((4, 9, 11)) <= set(
        bit_order[-3:]
    )
    assert list(g_perm) == [g_bits[b] for b in bit_order]

    step = make_sharded_fused_cheby_step_dd(
        mesh, Lb, g_perm, delta=delta, e_min=e_min, dt=dt,
        tile_rows=8, interpret=True,
    )
    assert step.exchange_plan["device_bits"] == 3
    assert step.exchange_plan["skipped_zero_coupling_bits"] == 3
    assert step.exchange_plan["bytes_per_elem_per_order_dd"] == 0

    psi = rng.standard_normal(1 << Lb) + 1j * rng.standard_normal(1 << Lb)
    psi /= np.linalg.norm(psi)
    psi_p = np.asarray(
        permute_index_bits(jnp.asarray(psi), bit_order)
    )
    diag_p = np.asarray(
        permute_index_bits(jnp.asarray(diag64), bit_order)
    )

    def dd_split(x64):
        x64 = np.asarray(x64, dtype=np.float64)
        hi = x64.astype(np.float32)
        return (
            jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
        )

    beta = delta / 2 + e_min
    coeffs = cheby_coeffs(delta, dt)
    c_h, c_l = dd_split(coeffs)
    dmb_h, dmb_l = dd_split(diag_p - beta)
    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi_p.real), *dd_split(psi_p.imag))
    )
    # no ppermute in the compiled computation: exchange fully skipped
    jaxpr_text = str(
        jax.make_jaxpr(
            lambda s4: step(
                shard_vector(mesh, dmb_h), shard_vector(mesh, dmb_l),
                s4, c_h, c_l,
            )
        )(state4)
    )
    assert "ppermute" not in jaxpr_text

    out = step(
        shard_vector(mesh, dmb_h), shard_vector(mesh, dmb_l),
        state4, c_h, c_l,
    )
    z_p = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    # un-permute and compare against the ORIGINAL-ordering oracle
    inv = invert_bit_order(bit_order)
    z = np.asarray(permute_index_bits(jnp.asarray(z_p), inv))
    want = _np_cheby_oracle(
        diag64, g_bits, Lb, psi, coeffs, delta, e_min, dt
    )
    assert np.abs(z - want).max() < 1e-12


def test_sharded_fused_dd_per_bit_flip_scale(mesh, problem):
    """Sharded multi-amplitude dd (VERDICT r3 item 4, sharded variant):
    a PER-BIT flip-scale vector — disjoint flip groups with independent
    drives, including the device bits — matches the f64 oracle at
    1e-12 on 8 virtual devices."""
    from quantumpropagators.parallel.sharded_fused import (
        make_sharded_fused_cheby_step_dd,
    )

    op, diag, psi, e_min, delta = problem
    dt = 0.06
    beta = delta / 2 + e_min
    rng = np.random.default_rng(41)
    scale_bits = rng.uniform(0.5, 1.5, size=L)  # independent per-bit

    def dd_split(x64):
        x64 = np.asarray(x64, dtype=np.float64)
        hi = x64.astype(np.float32)
        return (
            jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
        )

    coeffs = cheby_coeffs(delta, dt)
    dmb_h, dmb_l = dd_split(np.asarray(diag, np.float64) - beta)
    c_h, c_l = dd_split(coeffs)
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
        state4, c_h, c_l, flip_scale=dd_split(scale_bits),
    )
    z = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    want = _np_cheby_oracle(
        np.asarray(diag, np.float64), g * scale_bits, L, psi,
        coeffs, delta, e_min, dt,
    )
    assert np.abs(z - want).max() < 1e-12

"""Fused single-pass Pallas Chebyshev kernel vs the complex kernel and
expm (interpret mode on CPU; reference oracle strategy of
``test/test_cheby.jl``)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

import quantumpropagators as qp
from quantumpropagators.ops.cheby import cheby_apply, cheby_coeffs
from quantumpropagators.ops.fused_cheby import (
    cheby_step_fused,
    make_flip_plan,
)

L = 11
J, g, h = 1.0, 1.2, 0.3


@pytest.fixture(scope="module")
def tfim():
    H_diag, H_x = qp.transverse_field_ising(L, J=J, g=g, h=h, dtype=jnp.float32)
    op = qp.Operator([H_diag, H_x.grouped(6)], np.array([1.0], dtype=np.float32))
    bound = J * (L - 1) + abs(h) * L + g * L
    rng = np.random.default_rng(7)
    psi = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
    psi /= np.linalg.norm(psi)
    return op, H_diag.diag, psi, -bound, 2 * bound


def test_plan_structure():
    plan = make_flip_plan(16, 1.5, tile_rows=64)
    assert plan.n_row_bits == 6
    assert plan.n_cross == 16 - 7 - 6
    A = plan.lane_mat
    # lane matrix: symmetric single-bit-flip adjacency scaled by g
    assert A.shape == (128, 128)
    np.testing.assert_array_equal(A, A.T)
    assert A[0, 1] == np.float32(1.5) and A[0, 2] == np.float32(1.5)
    assert A[0, 3] == 0.0  # two-bit flip is not adjacent
    assert np.count_nonzero(A[0]) == 7
    C = plan.cross_mat
    assert C.shape == (8, 8) and np.count_nonzero(C[0]) == 3


def test_plan_per_site_g():
    gs = np.arange(1, 13, dtype=np.float32)
    plan = make_flip_plan(12, gs, tile_rows=8)
    assert plan.lane_mat[0, 4] == gs[2]  # bit 2 flip
    assert plan.row_gs == tuple(gs[7:10])
    # top bits 10, 11 in the cross matrix
    assert plan.cross_mat[0, 1] == gs[10]
    assert plan.cross_mat[0, 2] == gs[11]


def test_plan_requires_min_size():
    with pytest.raises(ValueError, match="L >="):
        make_flip_plan(8, 1.0)


@pytest.mark.parametrize("tile_rows", [8, 16])
def test_fused_matches_complex_kernel(tfim, tile_rows):
    """Cross-bit and no-cross tilings agree with the complex kernel."""
    op, diag, psi, e_min, delta = tfim
    dt = 0.05
    coeffs = jnp.asarray(cheby_coeffs(delta, dt), dtype=jnp.float32)
    plan = make_flip_plan(L, g, tile_rows=tile_rows)
    re, im = cheby_step_fused(
        plan, diag,
        jnp.asarray(psi.real, dtype=jnp.float32),
        jnp.asarray(psi.imag, dtype=jnp.float32),
        coeffs, delta, e_min, dt, interpret=True,
    )
    ref = cheby_apply(
        op, jnp.asarray(psi, dtype=jnp.complex64), coeffs, delta, e_min, dt
    )
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.abs(out - np.asarray(ref)).max() < 1e-6
    assert abs(np.linalg.norm(out) - 1.0) < 1e-5


def test_fused_vs_expm(tfim):
    """f32 fused step vs the dense f64 oracle (f32-limited tolerance)."""
    op, diag, psi, e_min, delta = tfim
    dt = 0.1
    coeffs = jnp.asarray(cheby_coeffs(delta, dt), dtype=jnp.float32)
    plan = make_flip_plan(L, g, tile_rows=8)
    re, im = cheby_step_fused(
        plan, diag,
        jnp.asarray(psi.real, dtype=jnp.float32),
        jnp.asarray(psi.imag, dtype=jnp.float32),
        coeffs, delta, e_min, dt, interpret=True,
    )
    H = np.asarray(qp.to_dense(op), dtype=np.float64)
    exact = expm(-1j * H * dt) @ psi
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(out - exact) < 1e-5


def test_fused_backward_roundtrip(tfim):
    op, diag, psi, e_min, delta = tfim
    dt = 0.08
    cf = jnp.asarray(cheby_coeffs(delta, dt), dtype=jnp.float32)
    cb = jnp.asarray(cheby_coeffs(delta, -dt), dtype=jnp.float32)
    plan = make_flip_plan(L, g, tile_rows=16)
    re = jnp.asarray(psi.real, dtype=jnp.float32)
    im = jnp.asarray(psi.imag, dtype=jnp.float32)
    re, im = cheby_step_fused(
        plan, diag, re, im, cf, delta, e_min, dt, interpret=True
    )
    re, im = cheby_step_fused(
        plan, diag, re, im, cb, delta, e_min, -dt,
        forward=False, interpret=True,
    )
    rt = np.asarray(re) + 1j * np.asarray(im)
    assert np.linalg.norm(rt - psi) < 1e-5


class TestFusedPropagateDriver:
    """kernel='pallas' path of :func:`cheby_propagate_fused` (interpret
    mode on CPU) vs the generic xla path."""

    @pytest.fixture()
    def driven_tfim(self):
        from quantumpropagators.models.lattice import transverse_field_ising

        H_diag, H_x = transverse_field_ising(
            L, J=J, g=1.0, h=h, dtype=jnp.float32
        )
        gen = qp.hamiltonian(
            H_diag, (H_x, lambda t: 0.8 + 0.4 * np.sin(t)), check=False
        )
        tlist = np.linspace(0, 1.0, 11)
        rng = np.random.default_rng(11)
        psi = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
        psi /= np.linalg.norm(psi)
        return gen, tlist, jnp.asarray(psi, dtype=jnp.complex64)

    def test_pallas_matches_xla(self, driven_tfim):
        from quantumpropagators.fused import cheby_propagate_fused

        gen, tlist, psi0 = driven_tfim
        ref, _ = cheby_propagate_fused(psi0, gen, tlist, kernel="xla")
        out, _ = cheby_propagate_fused(psi0, gen, tlist, kernel="pallas")
        assert out.dtype == psi0.dtype
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5

    def test_pallas_observables_and_trajectory(self, driven_tfim):
        from quantumpropagators.fused import cheby_propagate_fused

        gen, tlist, psi0 = driven_tfim
        _, nrm = cheby_propagate_fused(
            psi0, gen, tlist, kernel="pallas",
            observable_fn=lambda p: jnp.vdot(p, p).real,
        )
        assert nrm.shape == (len(tlist) - 1,)
        np.testing.assert_allclose(np.asarray(nrm), 1.0, atol=1e-5)
        _, traj = cheby_propagate_fused(
            psi0, gen, tlist, kernel="pallas", store_states=True
        )
        assert traj.shape == (len(tlist) - 1, 2 ** L)

    def test_pallas_requires_structure(self):
        from quantumpropagators.fused import cheby_propagate_fused
        from quantumpropagators.utils.fixtures import (
            random_matrix,
            random_state_vector,
        )

        rng = np.random.default_rng(5)
        H0 = jnp.asarray(random_matrix(16, hermitian=True, rng=rng))
        gen = qp.hamiltonian(H0, check=False)
        tlist = np.linspace(0, 1, 5)
        psi0 = jnp.asarray(random_state_vector(16, rng=rng))
        with pytest.raises(ValueError, match="site-flip"):
            cheby_propagate_fused(psi0, gen, tlist, kernel="pallas")

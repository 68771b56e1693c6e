"""Distributed reduction kernels on 8 virtual devices (VERDICT item 6,
SURVEY §5: "dot/norm become psum reductions ... in Arnoldi MGS, Newton
convergence").

The design is GSPMD: Arnoldi/Newton/specrange/expv consume a sharded
state through the same code as a local state — XLA inserts psum /
all-gather collectives for the inner products and rank-k updates
(reference inner products: ``src/arnoldi.jl:85-90``).  Each test pins
the input's sharding, checks 1e-12 agreement with the single-device
result, and asserts the output REMAINED sharded (the computation
actually ran distributed rather than through an implicit full gather
onto one device).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.models.lattice import transverse_field_ising
from quantumpropagators.ops.arnoldi import arnoldi
from quantumpropagators.ops.expv import expv_apply
from quantumpropagators.ops.newton import newton_apply
from quantumpropagators.ops.operators import to_dense
from quantumpropagators.ops.specrange import ritzvals, specrange
from quantumpropagators.parallel.mesh import chain_mesh, shard_vector
from quantumpropagators.utils.fixtures import random_state_vector


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return chain_mesh(8)


@pytest.fixture(scope="module")
def problem():
    L = 9
    H_diag, H_x = transverse_field_ising(
        L, J=1.0, g=1.2, h=0.3, dtype=jnp.complex128
    )
    op = qp.Operator([H_diag, H_x.grouped(3)], np.array([1.0]))
    rng = np.random.default_rng(23)
    psi = jnp.asarray(random_state_vector(2**L, rng=rng))
    return L, op, psi


def _n_shards(x):
    return len({s.device for s in x.addressable_shards})


def test_sharded_arnoldi_matches_local(mesh, problem):
    """The CGS2 Arnoldi factorization (all inner products = psum
    reductions under GSPMD) from a sharded start vector."""
    L, op, psi = problem
    Hess_ref, q_ref, m_ref = arnoldi(op, psi, 12, 0.1, extended=True)
    psi_sh = shard_vector(mesh, psi)
    Hess, q, m_eff = arnoldi(op, psi_sh, 12, 0.1, extended=True)
    assert m_eff == m_ref
    assert np.allclose(np.asarray(Hess), np.asarray(Hess_ref), atol=1e-12)
    # the Krylov basis must still live distributed
    assert _n_shards(q) == 8


def test_sharded_specrange_arnoldi(mesh, problem):
    """specrange(method='arnoldi') on a sharded state matches the
    single-device estimate to 1e-12."""
    L, op, psi = problem
    lo_ref, hi_ref = specrange(op, method="arnoldi", state=psi)
    psi_sh = shard_vector(mesh, psi)
    lo, hi = specrange(op, method="arnoldi", state=psi_sh)
    assert np.isclose(lo, lo_ref, atol=1e-12)
    assert np.isclose(hi, hi_ref, atol=1e-12)


def test_sharded_ritzvals(mesh, problem):
    L, op, psi = problem
    ritz_ref = np.sort_complex(np.asarray(ritzvals(op, psi, 10, 20)))
    ritz = np.sort_complex(np.asarray(ritzvals(op, shard_vector(mesh, psi), 10, 20)))
    assert np.allclose(ritz, ritz_ref, atol=1e-11)


def test_sharded_expv(mesh, problem):
    """One-shot Krylov exp(-iHdt) on a sharded state: 1e-12 vs dense
    oracle, output sharding preserved."""
    from scipy.linalg import expm

    L, op, psi = problem
    dt = 0.2
    exact = expm(-1j * np.asarray(to_dense(op)) * dt) @ np.asarray(psi)
    got = expv_apply(op, shard_vector(mesh, psi), dt, m=40)
    assert np.linalg.norm(np.asarray(got) - exact) < 1e-12
    assert _n_shards(got) == 8


@pytest.mark.parametrize("backward", [False, True])
def test_sharded_newton_forward_and_backward(mesh, problem, backward):
    """Restarted Newton under sharding, forward AND backward in time
    (VERDICT: 'newton (fwd+bwd) ... on 8 virtual devices at 1e-12')."""
    from scipy.linalg import expm

    L, op, psi = problem
    dt = -0.15 if backward else 0.15
    exact = expm(-1j * np.asarray(to_dense(op)) * dt) @ np.asarray(psi)
    got = newton_apply(op, shard_vector(mesh, psi), dt, m_max=30)
    assert np.linalg.norm(np.asarray(got) - exact) < 1e-12
    assert _n_shards(got) == 8


def test_sharded_propagate_newton_roundtrip(mesh, problem):
    """Full propagate() forward+backward round trip on a sharded state
    through the Newton propagator stays on the mesh and inverts to
    1e-12."""
    L, op, psi = problem
    gen = qp.hamiltonian(op)
    tlist = np.linspace(0, 1.0, 11)
    psi_sh = shard_vector(mesh, psi)
    fwd = qp.propagate(psi_sh, gen, tlist, method="newton", m_max=30)
    back = qp.propagate(fwd, gen, tlist, method="newton", m_max=30,
                        backward=True)
    assert np.linalg.norm(np.asarray(back) - np.asarray(psi)) < 1e-12
    assert _n_shards(fwd) == 8

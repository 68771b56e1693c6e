"""Structured lattice operators vs explicit kron construction."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantumpropagators as qp
from quantumpropagators.models.lattice import (
    PAULI,
    SiteOperatorSum,
    transverse_field_ising,
    z_chain_diagonal,
    zz_chain_diagonal,
)
from quantumpropagators.ops.operators import apply, to_dense
from quantumpropagators.utils.fixtures import random_state_vector


def dense_tfim(L, J, g, h, periodic=False):
    I, X, Z = PAULI["I"], PAULI["X"], PAULI["Z"]

    def site(op, i):
        out = np.array([[1.0]], dtype=complex)
        for j in range(L):
            out = np.kron(out, op if j == i else I)
        return out

    H = np.zeros((2 ** L, 2 ** L), dtype=complex)
    bonds = [(i, i + 1) for i in range(L - 1)] + ([(L - 1, 0)] if periodic else [])
    for i, j in bonds:
        H += J * site(Z, i) @ site(Z, j)
    for i in range(L):
        H += h * site(Z, i) + g * site(X, i)
    return H


@pytest.mark.parametrize("periodic", [False, True])
def test_tfim_matches_dense(periodic):
    L, J, g, h = 5, 0.7, 1.3, -0.4
    H_diag, H_x = transverse_field_ising(
        L, J=J, g=g, h=h, periodic=periodic, dtype=jnp.complex128
    )
    H = qp.Operator([H_diag, H_x], np.array([1.0]))
    dense = dense_tfim(L, J, g, h, periodic)
    assert np.allclose(np.asarray(to_dense(H)), dense, atol=1e-12)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(random_state_vector(2 ** L, rng=rng))
    assert np.allclose(np.asarray(apply(H, psi)), dense @ np.asarray(psi), atol=1e-12)


def test_site_operator_sum_heterogeneous():
    L = 4
    rng = np.random.default_rng(5)
    mats = rng.standard_normal((L, 2, 2)) + 1j * rng.standard_normal((L, 2, 2))
    op = SiteOperatorSum(jnp.asarray(mats), L=L)
    psi = jnp.asarray(random_state_vector(2 ** L, rng=rng))
    dense = np.asarray(op.to_dense())
    assert np.allclose(np.asarray(apply(op, psi)), dense @ np.asarray(psi), atol=1e-12)


def test_diag_builders():
    L = 4
    d_zz = np.asarray(zz_chain_diagonal(L, 1.0, dtype=jnp.float64))
    d_z = np.asarray(z_chain_diagonal(L, 1.0, dtype=jnp.float64))
    dense = dense_tfim(L, 1.0, 0.0, 1.0)
    assert np.allclose(d_zz + d_z, np.diag(dense).real, atol=1e-12)
    # per-bond / per-site couplings
    Jb = np.array([0.1, -0.2, 0.3])
    hb = np.array([1.0, 2.0, -1.0, 0.5])
    s = lambda i: np.diag(
        np.asarray(z_chain_diagonal(L, np.eye(L)[i], dtype=jnp.float64))
    )
    expected = sum(Jb[i] * s(i) @ s(i + 1) for i in range(3)) + sum(
        hb[i] * s(i) for i in range(L)
    )
    got = np.asarray(zz_chain_diagonal(L, Jb, dtype=jnp.float64)) + np.asarray(
        z_chain_diagonal(L, hb, dtype=jnp.float64)
    )
    assert np.allclose(got, np.diag(expected), atol=1e-12)


def test_driven_chain_propagation():
    """Driven TFIM propagated by cheby vs dense expprop."""
    L = 6
    H_diag, H_x = transverse_field_ising(L, J=1.0, g=1.0, dtype=jnp.complex128)
    gen = qp.hamiltonian(H_diag, (H_x, lambda t: 0.5 + 0.3 * np.sin(t)))
    tlist = np.linspace(0, 2, 41)
    rng = np.random.default_rng(9)
    psi0 = jnp.asarray(random_state_vector(2 ** L, rng=rng))
    res_c = qp.propagate(psi0, gen, tlist, method="cheby")
    dense_gen = qp.hamiltonian(
        to_dense(H_diag), (to_dense(H_x), gen.amplitudes[0])
    )
    res_e = qp.propagate(psi0, dense_gen, tlist, method="expprop")
    assert np.linalg.norm(np.asarray(res_c) - np.asarray(res_e)) < 1e-10


def test_tfim_2d_matches_dense():
    from quantumpropagators.models.lattice import transverse_field_ising_2d

    Lx, Ly, J, g, h = 2, 3, 0.7, 1.3, -0.4
    H_diag, H_x = transverse_field_ising_2d(
        Lx, Ly, J=J, g=g, h=h, dtype=jnp.complex128
    )
    H = qp.Operator([H_diag, H_x], np.array([1.0]))
    # dense reference over lattice bonds
    L = Lx * Ly
    I, X, Z = PAULI["I"], PAULI["X"], PAULI["Z"]

    def site(op, i):
        out = np.array([[1.0]], dtype=complex)
        for j in range(L):
            out = np.kron(out, op if j == i else I)
        return out

    dense = np.zeros((2 ** L, 2 ** L), dtype=complex)
    for x in range(Lx):
        for y in range(Ly):
            s = x * Ly + y
            dense += h * site(Z, s) + g * site(X, s)
            if x + 1 < Lx:
                dense += J * site(Z, s) @ site(Z, (x + 1) * Ly + y)
            if y + 1 < Ly:
                dense += J * site(Z, s) @ site(Z, x * Ly + y + 1)
    assert np.allclose(np.asarray(to_dense(H)), dense, atol=1e-12)
    # and it matches the native CSR assembly
    from quantumpropagators.native import native_available, tfim_lattice2d_csr

    if native_available():
        import scipy.sparse as sp

        indptr, cols, vals = tfim_lattice2d_csr(Lx, Ly, J, g, h)
        A = sp.csr_matrix((vals, cols, indptr), shape=(2 ** L, 2 ** L))
        assert np.abs(A.todense() - dense).max() < 1e-12


def test_grouped_site_sum():
    """Precomputed matricized groups match the in-graph form and dense."""
    from quantumpropagators.models.lattice import transverse_field_ising

    H_diag, H_x = transverse_field_ising(6, J=0.7, g=1.3, h=-0.4, dtype=jnp.complex128)
    G = H_x.grouped(3)
    assert G.dims == (8, 8)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(random_state_vector(64, rng=rng))
    assert np.allclose(np.asarray(apply(G, psi)), np.asarray(apply(H_x, psi)), atol=1e-13)
    assert np.allclose(np.asarray(to_dense(G)), np.asarray(to_dense(H_x)), atol=1e-13)
    # real-split path: real f32 group mats on a complex64 state
    _, H32 = transverse_field_ising(6, J=0.7, g=1.3, h=-0.4, dtype=jnp.float32)
    G32 = H32.grouped(3)
    got = apply(G32, psi.astype(jnp.complex64))
    assert np.allclose(
        np.asarray(got), np.asarray(apply(H_x, psi)), atol=1e-5
    )
    # pytree round trip (jit-compatible)
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(G)
    G2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.allclose(np.asarray(apply(G2, psi)), np.asarray(apply(G, psi)))

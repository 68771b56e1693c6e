"""Liouvillian construction and open-system dynamics (mirrors reference
``test/test_liouvillian.jl``): TLS decay under a Lindblad dissipator,
and the LvN-vs-TDSE convention factor."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

import quantumpropagators as qp
from quantumpropagators.ops.operators import to_dense


def vec(rho):
    """Column-stacking vectorization (Fortran order)."""
    return np.asarray(rho).reshape(-1, order="F")


def unvec(v, n):
    return np.asarray(v).reshape((n, n), order="F")


SM = np.array([[0, 1], [0, 0]], dtype=complex)  # sigma_minus |0><1|


def test_convention_factor():
    H = np.array([[1, 0], [0, -1]], dtype=complex)
    L_tdse = qp.liouvillian(jnp.asarray(H), [], convention="TDSE")
    L_lvn = qp.liouvillian(jnp.asarray(H), [], convention="LvN")
    assert np.allclose(
        1j * np.asarray(to_dense(L_tdse)), np.asarray(to_dense(L_lvn))
    )


def test_tls_decay():
    """Spontaneous decay: rho_11(t) = exp(-gamma t) rho_11(0)."""
    gamma = 0.5
    H = 0.5 * np.array([[1, 0], [0, -1]], dtype=complex)
    c_op = np.sqrt(gamma) * SM
    L = qp.liouvillian(jnp.asarray(H), [jnp.asarray(c_op)], convention="TDSE")
    rho0 = np.array([[0, 0], [0, 1]], dtype=complex)  # excited state
    tlist = np.linspace(0, 5, 101)
    rho_vec0 = jnp.asarray(vec(rho0))
    # i d/dt rho_vec = L rho_vec  →  propagate with Schrödinger-form methods
    states = qp.propagate(
        rho_vec0, L, tlist, method="newton", storage=True, check=False
    )
    pops = np.array([unvec(states[:, i], 2)[1, 1].real for i in range(len(tlist))])
    assert np.max(np.abs(pops - np.exp(-gamma * tlist))) < 1e-8
    # trace preserved
    traces = np.array(
        [np.trace(unvec(states[:, i], 2)).real for i in range(len(tlist))]
    )
    assert np.max(np.abs(traces - 1.0)) < 1e-8


def test_lvn_action():
    """The LvN-convention Liouvillian satisfies the reference's
    convention ``L ρ⃗ = vec(+i[H,ρ] + D(ρ))`` (reference
    ``test/test_liouvillian.jl:96-103``), while TDSE gives
    ``L ρ⃗ = vec([H,ρ]) + i vec(D(ρ))`` so that ``exp(-i L dt)``
    generates the physical dynamics."""
    gamma = 0.3
    H = np.array([[0.7, 0.2], [0.2, -0.7]], dtype=complex)
    c_op = np.sqrt(gamma) * SM
    rho0 = np.array([[0.25, 0.1], [0.1, 0.75]], dtype=complex)
    L_lvn = np.asarray(
        to_dense(qp.liouvillian(jnp.asarray(H), [jnp.asarray(c_op)], convention="LvN"))
    )
    D = (
        c_op @ rho0 @ c_op.conj().T
        - 0.5 * (c_op.conj().T @ c_op @ rho0 + rho0 @ c_op.conj().T @ c_op)
    )
    expected = 1j * (H @ rho0 - rho0 @ H) + D
    assert np.allclose(unvec(L_lvn @ vec(rho0), 2), expected, atol=1e-14)
    L_tdse = np.asarray(
        to_dense(qp.liouvillian(jnp.asarray(H), [jnp.asarray(c_op)], convention="TDSE"))
    )
    expected_tdse = (H @ rho0 - rho0 @ H) + 1j * D
    assert np.allclose(unvec(L_tdse @ vec(rho0), 2), expected_tdse, atol=1e-14)


def test_time_dependent_liouvillian():
    """liouvillian of a Generator preserves the amplitude structure."""
    H0 = np.diag([0.5, -0.5]).astype(complex)
    H1 = np.array([[0, 1], [1, 0]], dtype=complex)
    eps = lambda t: np.cos(t)
    gen = qp.hamiltonian(jnp.asarray(H0), (jnp.asarray(H1), eps))
    L = qp.liouvillian(gen, [np.sqrt(0.1) * SM], convention="TDSE")
    assert isinstance(L, qp.Generator)
    assert len(L.amplitudes) == 1
    assert L.amplitudes[0] is eps
    assert L.shape == (4, 4)


def test_liouvillian_stays_sparse_large():
    """Liouvillian assembly never densifies: a 2^6-dim sparse H gives a
    2^12-dim superoperator built entirely through sparse kron
    (reference src/generators.jl:473-524 stays sparse end-to-end).

    The action of L on a random rho is checked against the dense
    Lindblad RHS computed blockwise.
    """
    import scipy.sparse as sp

    from quantumpropagators.ops.operators import (
        CSROperator,
        csr_from_scipy,
        to_scipy_sparse,
    )

    rng = np.random.default_rng(7)
    N = 64  # superoperator dim 4096 = 2^12
    # sparse tridiagonal-ish Hermitian H + one sparse Lindblad op
    main = rng.normal(size=N)
    off = rng.normal(size=N - 1) + 1j * rng.normal(size=N - 1)
    H_sp = sp.diags([off.conj(), main, off], [-1, 0, 1]).tocsr()
    A_sp = sp.diags([np.sqrt(np.arange(1, N, dtype=float))], [1]).tocsr()
    H = csr_from_scipy(H_sp)
    A = csr_from_scipy(A_sp)
    L = qp.liouvillian(H, [A], convention="LvN")
    assert isinstance(L, CSROperator)
    # nnz must stay O(N * nnz_H) -- a densified path would give ~N^4
    assert L.nnz < 40 * N * H_sp.nnz
    rho = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    rho = 0.5 * (rho + rho.conj().T)
    got = np.asarray(qp.apply(L, jnp.asarray(vec(rho))))
    Hd, Ad = H_sp.toarray(), A_sp.toarray()
    # framework LvN convention (= reference src/generators.jl:477-480):
    # L vec(rho) = i vec([H, rho]) + vec(D[rho])
    rhs = 1j * (Hd @ rho - rho @ Hd) + (
        Ad @ rho @ Ad.conj().T
        - 0.5 * (Ad.conj().T @ Ad @ rho + rho @ Ad.conj().T @ Ad)
    )
    assert np.allclose(got, vec(rhs), atol=1e-12)


def test_to_scipy_sparse_roundtrips():
    """to_scipy_sparse handles every operator container without
    densifying semantics errors (DIA row-aligned -> scipy column map)."""
    import scipy.sparse as sp

    from quantumpropagators.ops.operators import (
        DiagonalOperator,
        csr_from_scipy,
        dia_from_scipy,
        to_dense,
        to_scipy_sparse,
    )

    rng = np.random.default_rng(3)
    N = 17
    D = sp.diags(
        [rng.normal(size=N - 2), rng.normal(size=N), rng.normal(size=N - 3)],
        [-2, 0, 3],
    ).tocsr()
    for op in (
        csr_from_scipy(D),
        dia_from_scipy(D),
        DiagonalOperator(jnp.asarray(rng.normal(size=N))),
        jnp.asarray(D.toarray()),
    ):
        got = to_scipy_sparse(op).toarray()
        want = np.asarray(to_dense(op))
        assert np.allclose(got, want, atol=1e-14), type(op)

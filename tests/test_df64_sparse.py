"""df64 BSR apply + Chebyshev for unstructured operators (VERDICT r2
item 4): reference accuracy (1e-10, ``test/test_cheby.jl:8`` /
``test/optomech.jl``) on f32 planes, general block sparsity."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.linalg import expm

from quantumpropagators.ops.cheby import cheby_coeffs
from quantumpropagators.ops.df64 import CDD, DD, cdd_to_c128, dd_to_f64
from quantumpropagators.ops.df64_sparse import (
    BSRdd,
    bsr_apply_dd,
    bsr_dd_from_scipy,
    cheby_apply_dd_bsr,
    dd_split_np,
)


def optomech_h(n_cav=4, n_mech=10):
    """The reference's optomech cavity Hamiltonian
    (``/root/reference/test/optomech.jl:1-45``): kron-structured sparse
    couplings between a cavity and a mechanical mode (Hermitian)."""

    def destroy(n):
        return sp.diags(np.sqrt(np.arange(1, n + 1)), 1)

    a = sp.kron(destroy(n_cav), sp.identity(n_mech + 1), format="csr")
    b = sp.kron(sp.identity(n_cav + 1), destroy(n_mech), format="csr")
    at, bt = a.T.tocsr(), b.T.tocsr()
    num_a = (at @ a).tocsr()
    H = (
        10.0 * num_a + 10.0 * (bt @ b) + 2.0 * (a + at)
        - 0.5 * ((bt + b) @ num_a + num_a @ (bt + b))
    ).tocsr()
    H.eliminate_zeros()
    return H


def test_bsr_dd_apply_matches_f64():
    H = optomech_h()
    N = H.shape[0]
    op = bsr_dd_from_scipy(H, block_size=8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N)
    xp = np.zeros(op.shape[0])
    xp[:N] = x
    y = dd_to_f64(bsr_apply_dd(op, DD(*dd_split_np(xp))))[:N]
    want = H @ x
    scale = np.abs(want).max()
    assert np.abs(y - want).max() < 1e-13 * max(scale, 1.0)


def test_bsr_dd_rejects_complex():
    H = optomech_h().astype(complex)
    H = H + 1j * sp.identity(H.shape[0])
    with pytest.raises(ValueError, match="real operator entries"):
        bsr_dd_from_scipy(H, block_size=8)


def test_optomech_dd_cheby_propagation_1e10():
    """Optomech (BASELINE config 3) propagates through the df64 BSR
    Chebyshev at reference accuracy: 50 steps vs dense expm < 1e-10
    (with orders of margin)."""
    H = optomech_h()
    N = H.shape[0]
    op = bsr_dd_from_scipy(H, block_size=8)
    Np = op.shape[0]
    evals = np.linalg.eigvalsh(H.toarray())
    e_min, delta = float(evals[0]), float(evals[-1] - evals[0])
    dt = 0.05
    rng = np.random.default_rng(1)
    psi = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi /= np.linalg.norm(psi)
    pp = np.zeros(Np, complex)
    pp[:N] = psi
    z = CDD(DD(*dd_split_np(pp.real)), DD(*dd_split_np(pp.imag)))
    coeffs = cheby_coeffs(delta, dt)
    n_steps = 50
    for _ in range(n_steps):
        z = cheby_apply_dd_bsr(op, z, coeffs, delta, e_min, dt)
    got = cdd_to_c128(z)
    assert np.abs(got[N:]).max() == 0.0  # padding stays exactly zero
    exact = expm(-1j * H.toarray() * dt * n_steps) @ psi
    err = np.abs(got[:N] - exact).max()
    assert err < 1e-12, err
    assert abs(np.linalg.norm(got) - 1.0) < 1e-12


def test_transmon_dd_cheby_propagation():
    """Transmon ladder (BASELINE config 2 drift) through the df64 BSR
    path at reference accuracy."""
    N = 10
    a = sp.diags(np.sqrt(np.arange(1, N, dtype=float)), 1).tocsr()
    ad = a.conj().T.tocsr()
    n_op = (ad @ a).tocsr()
    alpha = -0.2
    H = (6.0 * n_op + 0.5 * alpha * (n_op @ (n_op - sp.identity(N)))
         + 0.3 * (a + ad)).tocsr()
    H = (0.5 * (H + H.T)).tocsr()
    op = bsr_dd_from_scipy(H, block_size=2)
    Np = op.shape[0]
    evals = np.linalg.eigvalsh(H.toarray())
    e_min, delta = float(evals[0]), float(evals[-1] - evals[0])
    dt = 0.1
    psi = np.zeros(N, complex)
    psi[0] = 1.0
    pp = np.zeros(Np, complex)
    pp[:N] = psi
    z = CDD(DD(*dd_split_np(pp.real)), DD(*dd_split_np(pp.imag)))
    coeffs = cheby_coeffs(delta, dt)
    for _ in range(30):
        z = cheby_apply_dd_bsr(op, z, coeffs, delta, e_min, dt)
    got = cdd_to_c128(z)[:N]
    exact = expm(-1j * H.toarray() * dt * 30) @ psi
    assert np.abs(got - exact).max() < 1e-12


def test_dd_bsr_cheby_generic_envelope_beta_nonzero():
    """Regression (round 5): with an ASYMMETRIC spectral envelope
    (β = Δ/2 + E_min ≠ 0) the final global-phase multiply used to lose
    EFT exactness under CPU jit (XLA constant-folds the dd product for
    in-graph constant phases; 1.2e-8 observed) — masked in every
    earlier test by the symmetric-envelope convention β = 0."""
    import scipy.linalg
    import scipy.sparse as sp

    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.ops.df64 import cdd_from_c128, cdd_to_c128
    from quantumpropagators.ops.df64_sparse import (
        bsr_dd_from_scipy, cheby_apply_dd_bsr,
    )

    rng = np.random.default_rng(9)
    N = 32
    M0 = rng.normal(size=(N, N))
    H = M0 + M0.T
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)
    evals = np.linalg.eigvalsh(H)
    e_min = float(evals[0] - 0.5)   # asymmetric: beta != 0
    delta = float(evals[-1] + 0.5 - e_min)
    dt = 0.05
    assert abs(delta / 2 + e_min) > 0.05  # the regression regime
    op = bsr_dd_from_scipy(sp.csr_matrix(H), block_size=8)
    out = cheby_apply_dd_bsr(
        op, cdd_from_c128(psi), cheby_coeffs(delta, dt), delta, e_min, dt
    )
    want = scipy.linalg.expm(-1j * dt * H) @ psi
    assert np.abs(cdd_to_c128(out) - want).max() < 1e-13

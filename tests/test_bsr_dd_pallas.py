"""Pallas banded df64 block-SpMV (ops/bsr_dd_pallas.py): the at-scale
reference-accuracy path for unstructured banded operators (BASELINE
configs 3/5; VERDICT r3 item 5).

Interpret-mode tests use a SMALL block size (b=8): the EFT host-callback
barriers make the production b=128 unroll infeasible on CPU; the b=128
configuration is verified on-chip by the bench's cross-check against
the XLA df64 chain (bench_optomech, banded_vs_xla_dd_diff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

from quantumpropagators.ops.bsr_dd_pallas import (
    BandedDD,
    banded_dd_apply,
    banded_dd_from_scipy,
    cheby_apply_dd_banded,
)
from quantumpropagators.ops.cheby import cheby_coeffs
from quantumpropagators.ops.df64 import CDD, DD


def dds(v):
    v = np.asarray(v, np.float64)
    hi = v.astype(np.float32)
    return DD(jnp.asarray(hi),
              jnp.asarray((v - hi.astype(np.float64)).astype(np.float32)))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    N = 96
    A = sp.diags(
        [rng.normal(size=N - 2), rng.normal(size=N - 1),
         rng.normal(size=N), rng.normal(size=N - 1),
         rng.normal(size=N - 2)],
        [-2, -1, 0, 1, 2],
    ).tocsr()
    A = (0.5 * (A + A.T)).tocsr()
    return A, N, rng


def test_banded_reblock_layout(problem):
    A, N, rng = problem
    op = banded_dd_from_scipy(A, block=8)
    assert op.offsets == (-1, 0, 1)
    assert op.R == N // 8 and op.b == 8
    assert op.logical_nnz == A.nnz
    # planes reconstruct the matrix exactly (f64 across hi+lo)
    dense = np.zeros((N, N))
    ph = np.asarray(op.planes_hi, np.float64)
    pl_ = np.asarray(op.planes_lo, np.float64)
    for k, d in enumerate(op.offsets):
        for r in range(op.R):
            c = r + d
            if 0 <= c < op.R:
                dense[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = (
                    ph[k, :, r, :] + pl_[k, :, r, :]
                ).T
    # df64 carries ~48 mantissa bits: reconstruction is exact to 2^-48
    assert np.abs(dense - A.toarray()).max() < 1e-14


def test_banded_apply_matches_f64(problem):
    A, N, rng = problem
    op = banded_dd_from_scipy(A, block=8)
    x64 = rng.normal(size=N)
    y = banded_dd_apply(op, dds(x64), tile_rows=4, interpret=True)
    got = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
    want = A @ x64
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13


def test_banded_cheby_reference_accuracy(problem):
    A, N, rng = problem
    op = banded_dd_from_scipy(A, block=8)
    bound = float(np.abs(A).sum(axis=1).max())
    delta, e_min, dt = 2 * bound, -bound, 0.3
    c64 = cheby_coeffs(delta, dt)
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)
    z = CDD(dds(psi.real), dds(psi.imag))
    out = cheby_apply_dd_banded(
        op, z, c64, delta, e_min, dt, tile_rows=4, interpret=True
    )
    got = (
        np.asarray(out.re.hi, np.float64) + np.asarray(out.re.lo, np.float64)
    ) + 1j * (
        np.asarray(out.im.hi, np.float64) + np.asarray(out.im.lo, np.float64)
    )
    U = scipy.linalg.expm(-1j * A.toarray() * dt)
    assert np.abs(got - U @ psi).max() < 1e-12


def test_banded_rejects_non_banded():
    rng = np.random.default_rng(0)
    A = sp.random(256, 256, density=0.05, random_state=rng)
    A = (A + A.T).tocsr()
    with pytest.raises(ValueError, match="not a banded operator"):
        banded_dd_from_scipy(A, block=8, max_bands=5)


def test_banded_single_tile_operator(problem):
    """Regression (round-4 self-review): an operator that fits in ONE
    Pallas tile (n_tiles == 1) with nonzero band offsets must still
    apply correctly — the clamped prev/next windows serve the tile
    itself and the zero-padded edge blocks annihilate the wrapped
    rows."""
    A, N, rng = problem
    op = banded_dd_from_scipy(A, block=8)
    x64 = rng.normal(size=N)
    # tile_rows = R -> single tile
    y = banded_dd_apply(op, dds(x64), tile_rows=op.R, interpret=True)
    got = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
    want = A @ x64
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13

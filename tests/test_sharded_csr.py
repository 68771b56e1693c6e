"""Distributed generic CSR SpMV on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from quantumpropagators.ops.cheby import cheby_apply, cheby_coeffs
from quantumpropagators.parallel.mesh import chain_mesh, replicate, shard_vector
from quantumpropagators.parallel.sharded_csr import (
    make_allgather_csr_apply,
    make_banded_csr_apply,
    partition_csr_banded,
    partition_csr_rows,
)
from quantumpropagators.utils.fixtures import random_state_vector


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return chain_mesh(8)


def random_banded(N, w, rng, density=0.6, hermitian=True):
    rows, cols, vals = [], [], []
    for i in range(N):
        lo, hi = max(0, i - w), min(N, i + w + 1)
        for j in range(lo, hi):
            if hermitian and j < i:
                continue
            if rng.random() < density:
                v = rng.standard_normal() + 1j * rng.standard_normal()
                rows.append(i)
                cols.append(j)
                vals.append(v)
                if hermitian and j != i:
                    rows.append(j)
                    cols.append(i)
                    vals.append(np.conj(v))
    return sp.csr_matrix((vals, (rows, cols)), shape=(N, N))


def test_allgather_matches_dense(mesh):
    rng = np.random.default_rng(60)
    N = 256
    A = sp.random(N, N, density=0.05, random_state=np.random.RandomState(1))
    A = (A + 1j * sp.random(N, N, density=0.05, random_state=np.random.RandomState(2))).tocsr()
    psi = random_state_vector(N, rng=rng)
    pcsr = partition_csr_rows(A, 8)
    f = make_allgather_csr_apply(mesh, pcsr)
    got = f(pcsr, shard_vector(mesh, jnp.asarray(psi)))
    assert np.allclose(np.asarray(got), A @ psi, atol=1e-12)


def test_banded_matches_dense(mesh):
    rng = np.random.default_rng(61)
    N = 512
    A = random_banded(N, 20, rng)
    psi = random_state_vector(N, rng=rng)
    pcsr = partition_csr_banded(A, 8)
    assert pcsr.halo <= 20 + 8
    f = make_banded_csr_apply(mesh, pcsr)
    got = f(pcsr, shard_vector(mesh, jnp.asarray(psi)))
    assert np.allclose(np.asarray(got), A @ psi, atol=1e-12)


def test_banded_rejects_wide_band(mesh):
    rng = np.random.default_rng(62)
    N = 64
    A = random_banded(N, 30, rng)  # halo 30 > block 8
    with pytest.raises(ValueError, match="halo|neighbor"):
        partition_csr_banded(A, 8)


def test_banded_cheby_propagation(mesh):
    """Full sharded Chebyshev step over a banded CSR Hamiltonian."""
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from quantumpropagators.parallel.sharded_csr import banded_csr_apply, _pcsr_spec

    rng = np.random.default_rng(63)
    N = 512
    A = random_banded(N, 10, rng)
    evals = np.linalg.eigvalsh(A.todense())
    e_min, delta = float(evals[0]), float(evals[-1] - evals[0])
    dt = 0.1
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))
    psi = jnp.asarray(random_state_vector(N, rng=rng))

    pcsr = partition_csr_banded(A, 8)

    def _step(pc, v, a):
        pc_local = type(pc)(
            data=pc.data[0],
            col=pc.col[0],
            row=pc.row[0],
            halo=pc.halo,
            n_rows_local=pc.n_rows_local,
            n_devices=pc.n_devices,
            shape=pc.shape,
        )
        return cheby_apply(
            pc_local,
            v,
            a,
            delta,
            e_min,
            dt,
            apply_fn=lambda op, x: banded_csr_apply(op, x),
        )

    step = jax.jit(
        jax.shard_map(
            _step,
            mesh=mesh,
            in_specs=(_pcsr_spec(pcsr), P("x"), P()),
            out_specs=P("x"),
        )
    )
    got = step(pcsr, shard_vector(mesh, psi), replicate(mesh, coeffs))
    from scipy.linalg import expm

    exact = expm(-1j * A.todense() * dt) @ np.asarray(psi)
    assert np.linalg.norm(np.asarray(got) - np.asarray(exact).ravel()) < 1e-10

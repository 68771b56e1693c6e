"""Distributed BSR block SpMV on 8 virtual devices (BASELINE config 5
"BSR block-partitioned ... with halo overlap"; SURVEY §7.4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from quantumpropagators.ops.operators import bsr_from_scipy
from quantumpropagators.parallel.mesh import chain_mesh, shard_vector
from quantumpropagators.parallel.sharded_bsr import (
    make_allgather_bsr_apply,
    make_banded_bsr_apply,
    partition_bsr,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return chain_mesh(8)


def block_tridiag(R, b, rng, dtype=complex):
    """Block-tridiagonal matrix with dense random blocks."""
    blocks, rows, cols = [], [], []
    for r in range(R):
        for c in (r - 1, r, r + 1):
            if 0 <= c < R:
                B = rng.normal(size=(b, b))
                if np.dtype(dtype).kind == "c":
                    B = B + 1j * rng.normal(size=(b, b))
                rows.append(r)
                cols.append(c)
                blocks.append(B.astype(dtype))
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(rows, minlength=R))]
    ).astype(np.int64)
    return sp.bsr_matrix(
        (np.stack(blocks), np.asarray(cols), indptr), shape=(R * b, R * b)
    ).tocsr()


def test_banded_partition_matches_dense(mesh):
    rng = np.random.default_rng(0)
    R, b = 32, 8  # 4 block-rows per device, halo 1 block
    A = block_tridiag(R, b, rng)
    pbsr = partition_bsr(A, 8, block_size=b)
    assert pbsr.halo_blocks == 1
    f = make_banded_bsr_apply(mesh, pbsr)
    psi = jnp.asarray(
        rng.normal(size=R * b) + 1j * rng.normal(size=R * b)
    )
    got = f(pbsr, shard_vector(mesh, psi))
    want = A @ np.asarray(psi)
    assert np.allclose(np.asarray(got), want, atol=1e-12)


def test_allgather_partition_arbitrary_sparsity(mesh):
    """Random block sparsity (no banded structure) goes through the
    all-gather path."""
    rng = np.random.default_rng(1)
    R, b = 16, 4
    blocks, rows, cols = [], [], []
    for r in range(R):
        for c in sorted(rng.choice(R, size=3, replace=False)):
            rows.append(r)
            cols.append(int(c))
            blocks.append(
                (rng.normal(size=(b, b)) + 1j * rng.normal(size=(b, b)))
            )
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(rows, minlength=R))]
    ).astype(np.int64)
    A = sp.bsr_matrix(
        (np.stack(blocks), np.asarray(cols), indptr), shape=(R * b, R * b)
    ).tocsr()
    pbsr = partition_bsr(A, 8, block_size=b, mode="allgather")
    assert pbsr.halo_blocks == -1
    f = make_allgather_bsr_apply(mesh, pbsr)
    psi = jnp.asarray(rng.normal(size=R * b) + 1j * rng.normal(size=R * b))
    got = f(pbsr, shard_vector(mesh, psi))
    assert np.allclose(np.asarray(got), A @ np.asarray(psi), atol=1e-12)


def test_auto_mode_selects_banded(mesh):
    rng = np.random.default_rng(2)
    A = block_tridiag(32, 4, rng)
    pbsr = partition_bsr(A, 8, block_size=4, mode="auto")
    assert pbsr.halo_blocks == 1


def test_banded_mode_rejects_wide_coupling():
    rng = np.random.default_rng(3)
    R, b = 16, 4
    A = block_tridiag(R, b, rng).tolil()
    # couple first and last block-rows: halo would need R-1 blocks
    A[0, (R - 1) * b] = 1.0
    with pytest.raises(ValueError, match="halo"):
        partition_bsr(A.tocsr(), 8, block_size=b, mode="banded")


def test_sharded_bsr_cheby_propagation(mesh):
    """A full Chebyshev step chain through the distributed BSR apply
    matches the single-device dense propagation at 1e-12."""
    from scipy.linalg import expm

    from quantumpropagators.ops.cheby import cheby_coeffs

    rng = np.random.default_rng(4)
    R, b = 16, 4
    A = block_tridiag(R, b, rng)
    A = 0.5 * (A + A.conj().T)  # Hermitian
    N = R * b
    evals = np.linalg.eigvalsh(A.toarray())
    e_min, delta = float(evals[0]), float(evals[-1] - evals[0])
    dt = 0.1
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))
    pbsr = partition_bsr(A, 8, block_size=b)
    from quantumpropagators.parallel.sharded_bsr import banded_bsr_apply
    from jax.sharding import PartitionSpec as P

    beta = delta / 2 + e_min

    def step(pb_local, v):
        h = lambda x: banded_bsr_apply(pb_local, x)
        v0 = v
        v1 = (-2j / delta) * (h(v0) - beta * v0)
        phi = coeffs[0] * v0 + coeffs[1] * v1
        for k in range(2, coeffs.shape[0]):
            v2 = (-4j / delta) * (h(v1) - beta * v1) + v0
            phi = phi + coeffs[k] * v2
            v0, v1 = v1, v2
        return np.exp(-1j * beta * dt) * phi

    meta = dict(
        halo_blocks=pbsr.halo_blocks,
        n_block_rows_local=pbsr.n_block_rows_local,
        n_devices=pbsr.n_devices,
        block_size=pbsr.block_size,
        shape=pbsr.shape,
    )
    from quantumpropagators.parallel.sharded_bsr import PartitionedBSR

    spec = PartitionedBSR(blocks=P("x"), cols=P("x"), **meta)

    def fn(pb, v):
        return step(
            PartitionedBSR(blocks=pb.blocks[0], cols=pb.cols[0], **meta), v
        )

    f = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=(spec, P("x")),
                      out_specs=P("x"))
    )
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)
    got = f(pbsr, shard_vector(mesh, jnp.asarray(psi)))
    want = expm(-1j * A.toarray() * dt) @ psi
    assert np.linalg.norm(np.asarray(got) - want) < 1e-12


def test_make_sharded_bsr_cheby_step(mesh):
    """Library-level sharded BSR Chebyshev step: multi-step propagation
    matches dense expm and the single-device cheby_apply at 1e-12."""
    from scipy.linalg import expm

    from quantumpropagators.ops.cheby import cheby_apply, cheby_coeffs
    from quantumpropagators.parallel.mesh import replicate
    from quantumpropagators.parallel.sharded_bsr import (
        make_sharded_bsr_cheby_step,
    )

    rng = np.random.default_rng(11)
    R, b = 16, 8
    A = block_tridiag(R, b, rng)
    A = 0.5 * (A + A.conj().T)
    N = R * b
    evals = np.linalg.eigvalsh(A.toarray())
    e_min, delta = float(evals[0]), float(evals[-1] - evals[0])
    dt = 0.08
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))
    pbsr = partition_bsr(A, 8, block_size=b)
    assert pbsr.halo_blocks >= 0  # banded mode

    step = make_sharded_bsr_cheby_step(
        mesh, pbsr, delta=delta, e_min=e_min, dt=dt
    )
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)
    v = shard_vector(mesh, jnp.asarray(psi))
    c = replicate(mesh, coeffs)
    n_steps = 5
    for _ in range(n_steps):
        v = step(pbsr, v, c)
    U = expm(-1j * A.toarray() * dt * n_steps)
    assert np.linalg.norm(np.asarray(v) - U @ psi) < 1e-11
    # single-device oracle through the same kernel algebra
    op1 = bsr_from_scipy(A, block_size=b)
    v1 = jnp.asarray(psi)
    for _ in range(n_steps):
        v1 = cheby_apply(op1, v1, coeffs, delta, e_min, dt)
    assert np.linalg.norm(np.asarray(v) - np.asarray(v1)) < 1e-12
    # result stays sharded over the mesh
    assert len({s.device for s in v.addressable_shards}) == 8


def test_distributed_bsr_newton(mesh):
    """Newton restarted-Arnoldi propagation through the DistributedBSR
    operator wrapper (block halo SpMV + GSPMD psum reductions)."""
    from scipy.linalg import expm

    from quantumpropagators.ops.newton import newton_apply
    from quantumpropagators.parallel.sharded_bsr import DistributedBSR

    rng = np.random.default_rng(12)
    R, b = 16, 4
    A = block_tridiag(R, b, rng)  # non-Hermitian is fine for Newton
    A = 0.5 * (A + A.conj().T)
    N = R * b
    pbsr = partition_bsr(A, 8, block_size=b)
    op = DistributedBSR(mesh, pbsr)
    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)
    dt = 0.15
    got = newton_apply(op, shard_vector(mesh, jnp.asarray(psi)), dt, m_max=24)
    exact = expm(-1j * A.toarray() * dt) @ psi
    assert np.linalg.norm(np.asarray(got) - exact) < 1e-12
    assert len({s.device for s in got.addressable_shards}) == 8

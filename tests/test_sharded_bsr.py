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


def test_banded_bsr_apply_dd_matches_f64(mesh):
    """df64 distributed banded SpMV: dd halo exchange (hi + lo planes)
    matches the f64 matvec to ~1e-14 (VERDICT r3 item 1)."""
    from quantumpropagators.ops.df64 import DD
    from quantumpropagators.parallel.sharded_bsr import (
        banded_bsr_apply_dd,
        partition_bsr_dd,
    )
    from quantumpropagators.parallel.mesh import STATE_AXIS
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(7)
    R, b = 32, 8
    A = block_tridiag(R, b, rng, dtype=float)
    pb = partition_bsr_dd(A, 8, block_size=b)
    assert pb.halo_blocks == 1
    x64 = rng.normal(size=R * b)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)

    meta = dict(
        halo_blocks=pb.halo_blocks,
        n_block_rows_local=pb.n_block_rows_local,
        n_devices=pb.n_devices,
        block_size=pb.block_size,
        shape=pb.shape,
    )
    from quantumpropagators.parallel.sharded_bsr import PartitionedBSRdd

    spec = PartitionedBSRdd(
        blocks_hi=P(STATE_AXIS), blocks_lo=P(STATE_AXIS),
        cols=P(STATE_AXIS), **meta,
    )

    def fn(p, h, l):
        p_local = PartitionedBSRdd(
            blocks_hi=p.blocks_hi[0], blocks_lo=p.blocks_lo[0],
            cols=p.cols[0], **meta,
        )
        y = banded_bsr_apply_dd(p_local, DD(h, l))
        return y.hi, y.lo

    got_h, got_l = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(spec, P(STATE_AXIS), P(STATE_AXIS)),
            out_specs=(P(STATE_AXIS), P(STATE_AXIS)),
        )
    )(pb, shard_vector(mesh, jnp.asarray(xh)),
      shard_vector(mesh, jnp.asarray(xl)))
    got = np.asarray(got_h, np.float64) + np.asarray(got_l, np.float64)
    want = A @ x64
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-14


def test_sharded_bsr_cheby_step_dd_reference_accuracy(mesh):
    """The FULL df64 sharded BSR Chebyshev step matches the complex128
    oracle to 1e-12 — BASELINE config 5 (banded halo, multi-chip) at
    the 1e-10 accuracy contract the reference holds every config to
    (test/test_cheby.jl:8).  This is the banded regime where >=80%
    weak-scaling is reachable (SCALING.md §2b), now at reference
    accuracy."""
    import scipy.linalg

    from quantumpropagators.parallel.sharded_bsr import (
        make_sharded_bsr_cheby_step_dd,
        partition_bsr_dd,
    )

    rng = np.random.default_rng(11)
    R, b = 32, 8
    A = block_tridiag(R, b, rng, dtype=float)
    A = (0.5 * (A + A.T)).tocsr()
    N = R * b
    pb = partition_bsr_dd(A, 8, block_size=b)
    assert pb.halo_blocks == 1

    bound = float(np.abs(A).sum(axis=1).max())
    e_min, delta = -bound, 2 * bound
    dt = 0.05
    from quantumpropagators.ops.cheby import cheby_coeffs

    c64 = cheby_coeffs(delta, dt)
    c_h = jnp.asarray(c64.astype(np.float32))
    c_l = jnp.asarray((c64 - c64.astype(np.float32)).astype(np.float32))

    psi = rng.normal(size=N) + 1j * rng.normal(size=N)
    psi /= np.linalg.norm(psi)

    def dd_split(x64):
        hi = np.asarray(x64, np.float64).astype(np.float32)
        return (
            jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
        )

    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )
    step = make_sharded_bsr_cheby_step_dd(
        mesh, pb, delta=delta, e_min=e_min, dt=dt
    )
    out = step(pb, state4, c_h, c_l)
    got = (
        np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
    )
    U = scipy.linalg.expm(-1j * A.toarray() * dt)
    want = U @ psi
    assert np.abs(got - want).max() < 1e-12

    # and a 10-step propagation stays at reference accuracy
    st = state4
    for _ in range(10):
        st = step(pb, tuple(st), c_h, c_l)
    got10 = (
        np.asarray(st[0], np.float64) + np.asarray(st[1], np.float64)
        + 1j * (np.asarray(st[2], np.float64) + np.asarray(st[3], np.float64))
    )
    want10 = np.linalg.matrix_power(U, 10) @ psi
    assert np.abs(got10 - want10).max() < 1e-11


def test_allgather_bsr_apply_dd_matches_f64(mesh):
    """df64 distributed SpMV, ALL-GATHER mode (arbitrary block
    sparsity): dd state gathered across shards, compensated local
    apply — matches f64 at ~1e-14."""
    from jax.sharding import PartitionSpec as P

    from quantumpropagators.ops.df64 import DD
    from quantumpropagators.parallel.mesh import STATE_AXIS
    from quantumpropagators.parallel.sharded_bsr import (
        PartitionedBSRdd,
        allgather_bsr_apply_dd,
        partition_bsr_dd,
    )

    rng = np.random.default_rng(19)
    R, b = 16, 8
    blocks, rows, cols = [], [], []
    for r in range(R):
        for c in sorted(rng.choice(R, size=3, replace=False)):
            rows.append(r)
            cols.append(int(c))
            blocks.append(rng.normal(size=(b, b)))
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(rows, minlength=R))]
    ).astype(np.int64)
    A = sp.bsr_matrix(
        (np.stack(blocks), np.asarray(cols), indptr), shape=(R * b, R * b)
    ).tocsr()
    pb = partition_bsr_dd(A, 8, block_size=b, mode="allgather")
    assert pb.halo_blocks == -1
    x64 = rng.normal(size=R * b)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    meta = dict(
        halo_blocks=pb.halo_blocks,
        n_block_rows_local=pb.n_block_rows_local,
        n_devices=pb.n_devices,
        block_size=pb.block_size,
        shape=pb.shape,
    )
    spec = PartitionedBSRdd(
        blocks_hi=P(STATE_AXIS), blocks_lo=P(STATE_AXIS),
        cols=P(STATE_AXIS), **meta,
    )

    def fn(p, h, l):
        p_local = PartitionedBSRdd(
            blocks_hi=p.blocks_hi[0], blocks_lo=p.blocks_lo[0],
            cols=p.cols[0], **meta,
        )
        y = allgather_bsr_apply_dd(p_local, DD(h, l))
        return y.hi, y.lo

    got_h, got_l = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(spec, P(STATE_AXIS), P(STATE_AXIS)),
            out_specs=(P(STATE_AXIS), P(STATE_AXIS)),
        )
    )(pb, shard_vector(mesh, jnp.asarray(xh)),
      shard_vector(mesh, jnp.asarray(xl)))
    got = np.asarray(got_h, np.float64) + np.asarray(got_l, np.float64)
    want = A @ x64
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-13

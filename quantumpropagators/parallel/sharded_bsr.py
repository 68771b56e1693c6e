"""Distributed block-sparse (BSR) SpMV over the device mesh.

The BSR analogue of :mod:`.sharded_csr` (SURVEY §7.4.2, BASELINE
config 5 "BSR block-partitioned ... with halo overlap"): the state is
sharded by BLOCK-rows, each device owns its slab of dense ``(b, b)``
blocks in blocked-ELL layout, and applies it with one batched
``dot_general`` (MXU) over contiguous block gathers — never a scalar
gather.

Communication strategies:

- :func:`make_banded_bsr_apply` — when every nonzero block is within
  ``wb`` block-rows of the local slab (lattice/kron operators after
  ordering), two ``ppermute`` edge exchanges of ``wb·b`` state entries
  per matvec, independent of ``N`` — weak-scaling.
- :func:`make_allgather_bsr_apply` — arbitrary block sparsity; one
  ``all_gather`` of the state per matvec.

Block-column ids are pre-remapped on the host at partition time so the
device kernel is static-shaped; slabs are padded to the max per-device
block-degree so ``shard_map`` sees uniform blocks.  Reference
parallelism contrast: the reference is single-process Julia
(``src/cheby.jl:146-148`` generic ``mul!``); this module is the
TPU-native distribution layer it does not have.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.operators import BSROperator, bsr_from_scipy, _register_pytree
from .mesh import STATE_AXIS

__all__ = [
    "PartitionedBSR",
    "partition_bsr",
    "make_banded_bsr_apply",
    "make_allgather_bsr_apply",
    "banded_bsr_apply",
    "allgather_bsr_apply",
    "make_sharded_bsr_cheby_step",
    "DistributedBSR",
]


@dataclass(frozen=True)
class PartitionedBSR:
    """Block-row-partitioned blocked-ELL slabs, stacked over devices.

    ``blocks``: ``(P, R_local, k, b, b)``; ``cols``: ``(P, R_local, k)``
    int32.  For ``halo_blocks >= 0`` (banded mode) cols are
    extended-local block ids in ``[0, R_local + 2·halo_blocks)``; for
    ``halo_blocks < 0`` (all-gather mode) cols are GLOBAL block ids.
    """

    blocks: Any
    cols: Any
    halo_blocks: int = 0
    n_block_rows_local: int = 0
    n_devices: int = 0
    block_size: int = 0
    shape: tuple = ()


_register_pytree(
    PartitionedBSR,
    ("blocks", "cols"),
    ("halo_blocks", "n_block_rows_local", "n_devices", "block_size", "shape"),
)


def partition_bsr(
    A, n_devices: int, block_size: int = None, *, mode: str = "auto"
) -> PartitionedBSR:
    """Partition a matrix into per-device BSR block-row slabs.

    ``mode``: ``'banded'`` (halo exchange; requires all nonzero blocks
    within one slab of the diagonal), ``'allgather'``, or ``'auto'``
    (banded when the measured block-halo fits, else all-gather).
    """
    if isinstance(A, BSROperator):
        op = A
    else:
        op = bsr_from_scipy(A, block_size=block_size)
    blocks = np.asarray(op.blocks)
    cols = np.asarray(op.cols)
    R, k, b, _ = blocks.shape
    if op.shape[0] != R * b:
        raise ValueError(
            "partition_bsr requires a block-aligned operator "
            f"(logical dim {op.shape[0]} != {R}x{b}); pad the matrix "
            "to a multiple of the block size first"
        )
    if R % n_devices:
        raise ValueError(
            f"{R} block-rows not divisible by {n_devices} devices"
        )
    Rl = R // n_devices
    nz = np.abs(blocks).max(axis=(2, 3)) > 0  # (R, k) real entries
    lo = (np.arange(R) // Rl)[:, None] * Rl
    wb = int(
        max(
            (np.maximum(lo - cols, 0) * nz).max(initial=0),
            (np.maximum(cols - (lo + Rl - 1), 0) * nz).max(initial=0),
        )
    )
    banded_ok = wb <= Rl
    if mode == "banded" and not banded_ok:
        raise ValueError(
            f"block halo {wb} exceeds slab size {Rl}; use mode="
            "'allgather' or fewer devices"
        )
    use_banded = mode == "banded" or (mode == "auto" and banded_ok)
    slab_blocks = blocks.reshape(n_devices, Rl, k, b, b)
    slab_cols = cols.reshape(n_devices, Rl, k).astype(np.int64)
    if use_banded:
        for d in range(n_devices):
            ext = slab_cols[d] - (d * Rl - wb)
            # padding (zero) blocks may carry col 0 anywhere in the
            # grid -- point them at a guaranteed-local block instead
            ext = np.where(nz.reshape(n_devices, Rl, k)[d], ext, wb)
            slab_cols[d] = ext
        halo = wb
    else:
        halo = -1
    return PartitionedBSR(
        blocks=jnp.asarray(slab_blocks),
        cols=jnp.asarray(slab_cols.astype(np.int32)),
        halo_blocks=halo,
        n_block_rows_local=Rl,
        n_devices=n_devices,
        block_size=b,
        shape=op.shape,
    )


def _bsr_slab_matvec(blocks, cols, x_blocks):
    """blocks (Rl, k, b, b) · x_blocks[cols] -> (Rl, b)."""
    xg = x_blocks[cols]  # (Rl, k, b)
    return jax.lax.dot_general(
        blocks,
        xg,
        dimension_numbers=(((1, 3), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.result_type(blocks.dtype, x_blocks.dtype),
    )


def banded_bsr_apply(pbsr: PartitionedBSR, psi_local, *, axis_name=STATE_AXIS):
    """Block SpMV from inside ``shard_map`` with nearest-neighbor halo
    exchange: two edge ``ppermute``s of ``halo_blocks·b`` entries."""
    b = pbsr.block_size
    Rl = pbsr.n_block_rows_local
    wb = pbsr.halo_blocks
    n_dev = pbsr.n_devices
    x = psi_local.reshape(Rl, b)
    if wb > 0:
        w = wb * b
        right_perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
        left_perm = [(s, (s - 1) % n_dev) for s in range(n_dev)]
        left_halo = jax.lax.ppermute(psi_local[-w:], axis_name, right_perm)
        right_halo = jax.lax.ppermute(psi_local[:w], axis_name, left_perm)
        x = jnp.concatenate(
            [left_halo.reshape(wb, b), x, right_halo.reshape(wb, b)]
        )
    y = _bsr_slab_matvec(pbsr.blocks, pbsr.cols, x)
    return y.reshape(Rl * b)


def allgather_bsr_apply(pbsr: PartitionedBSR, psi_local, *, axis_name=STATE_AXIS):
    """Block SpMV from inside ``shard_map`` over the full gathered
    state (arbitrary block sparsity)."""
    b = pbsr.block_size
    psi_full = jax.lax.all_gather(psi_local, axis_name, tiled=True)
    x = psi_full.reshape(-1, b)
    y = _bsr_slab_matvec(pbsr.blocks, pbsr.cols, x)
    return y.reshape(pbsr.n_block_rows_local * b)


def _make_apply(mesh: Mesh, pbsr: PartitionedBSR, inner):
    meta = dict(
        halo_blocks=pbsr.halo_blocks,
        n_block_rows_local=pbsr.n_block_rows_local,
        n_devices=pbsr.n_devices,
        block_size=pbsr.block_size,
        shape=pbsr.shape,
    )
    spec = PartitionedBSR(blocks=P(STATE_AXIS), cols=P(STATE_AXIS), **meta)

    def _fn(pb, v):
        pb_local = PartitionedBSR(
            blocks=pb.blocks[0], cols=pb.cols[0], **meta
        )
        return inner(pb_local, v)

    return jax.jit(
        jax.shard_map(
            _fn, mesh=mesh, in_specs=(spec, P(STATE_AXIS)),
            out_specs=P(STATE_AXIS),
        )
    )


def make_banded_bsr_apply(mesh: Mesh, pbsr: PartitionedBSR):
    """Jitted distributed block SpMV ``(pbsr, psi) -> H psi`` (halo)."""
    if pbsr.halo_blocks < 0:
        raise ValueError("pbsr was partitioned in all-gather mode")
    return _make_apply(mesh, pbsr, banded_bsr_apply)


def make_allgather_bsr_apply(mesh: Mesh, pbsr: PartitionedBSR):
    """Jitted distributed block SpMV (all-gather fallback)."""
    if pbsr.halo_blocks >= 0:
        raise ValueError("pbsr was partitioned in banded mode")
    return _make_apply(mesh, pbsr, allgather_bsr_apply)


def _inner_for(pbsr: PartitionedBSR):
    return banded_bsr_apply if pbsr.halo_blocks >= 0 else allgather_bsr_apply


def make_sharded_bsr_cheby_step(
    mesh: Mesh,
    pbsr: PartitionedBSR,
    *,
    delta: float,
    e_min: float,
    dt: float,
    forward: bool = True,
):
    """Full Chebyshev step ``exp(-i H dt)`` over a block-partitioned BSR
    operator, entirely under ``shard_map`` (BASELINE config 5 composed
    with propagation, not just raw SpMV).

    Returns ``step(pbsr, psi, coeffs) -> psi`` where ``psi`` is the
    global state sharded ``P(x)`` and ``coeffs`` the replicated
    Chebyshev coefficients.  Each polynomial order costs one distributed
    block SpMV (two edge ``ppermute``s in banded mode); the recurrence
    itself needs no reductions (SURVEY §5)."""
    from ..ops.cheby import cheby_apply

    inner = _inner_for(pbsr)
    meta = dict(
        halo_blocks=pbsr.halo_blocks,
        n_block_rows_local=pbsr.n_block_rows_local,
        n_devices=pbsr.n_devices,
        block_size=pbsr.block_size,
        shape=pbsr.shape,
    )
    spec = PartitionedBSR(blocks=P(STATE_AXIS), cols=P(STATE_AXIS), **meta)

    def _step(pb, psi_local, coeffs):
        pb_local = PartitionedBSR(
            blocks=pb.blocks[0], cols=pb.cols[0], **meta
        )
        return cheby_apply(
            pb_local,
            psi_local,
            coeffs,
            delta,
            e_min,
            dt,
            forward=forward,
            apply_fn=lambda o, v: inner(o, v),
        )

    return jax.jit(
        jax.shard_map(
            _step,
            mesh=mesh,
            in_specs=(spec, P(STATE_AXIS), P()),
            out_specs=P(STATE_AXIS),
        )
    )


@dataclass(frozen=True)
class DistributedBSR:
    """Operator-protocol wrapper around a partitioned BSR matrix.

    Implements the framework's ``apply``/``shape`` operator contract
    (the TPU analogue of the reference's duck-typed ``mul!`` operand,
    ``src/cheby.jl:146-148``) with a distributed ``shard_map`` SpMV, so
    *any* kernel — Newton's restarted Arnoldi, ``specrange``, ``expv``
    — composes with BSR block partitioning unchanged: matvecs are block
    halo exchanges, inner products GSPMD ``psum`` reductions.  A
    registered pytree (``pbsr`` data, ``mesh`` static), so it traces
    through the jitted kernels like any other operator."""

    mesh: Mesh
    pbsr: PartitionedBSR

    @property
    def shape(self):
        return self.pbsr.shape

    def apply(self, psi):
        pbsr = self.pbsr
        inner = _inner_for(pbsr)
        meta = dict(
            halo_blocks=pbsr.halo_blocks,
            n_block_rows_local=pbsr.n_block_rows_local,
            n_devices=pbsr.n_devices,
            block_size=pbsr.block_size,
            shape=pbsr.shape,
        )
        spec = PartitionedBSR(
            blocks=P(STATE_AXIS), cols=P(STATE_AXIS), **meta
        )

        def _fn(pb, v):
            pb_local = PartitionedBSR(
                blocks=pb.blocks[0], cols=pb.cols[0], **meta
            )
            return inner(pb_local, v)

        return jax.shard_map(
            _fn,
            mesh=self.mesh,
            in_specs=(spec, P(STATE_AXIS)),
            out_specs=P(STATE_AXIS),
        )(pbsr, psi)


_register_pytree(DistributedBSR, ("pbsr",), ("mesh",))

"""Distributed generic sparse (CSR) SpMV over the device mesh.

For Hamiltonians without tensor-product structure, the state is
row-sharded and each device owns the CSR slab of its rows.  Two
communication strategies (SURVEY §7.2):

- :func:`make_allgather_csr_apply` — every matvec ``all_gather``s the
  state; correct for ARBITRARY sparsity.  Communication volume is
  ``(P-1)/P · N`` per matvec: acceptable on a few chips / dense
  coupling, the fallback path.
- :func:`BandedPartitionedCSR` / :func:`make_banded_csr_apply` — for
  matrices whose nonzeros lie within a bandwidth ``w < N/P`` of the
  diagonal (lattice/chain/kron-structured operators after ordering),
  each device only needs ``w`` halo entries from each neighbor: two
  ``ppermute`` edge exchanges per matvec, independent of ``N`` — the
  weak-scaling design of the BASELINE north star.

Both keep column indices *pre-remapped on the host at partition time*
so the device-side kernel is a plain gather + segment-sum with static
shapes; all slabs are padded to the maximum per-device nnz so the
``shard_map`` sees uniform blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.operators import CSROperator, _register_pytree
from .mesh import STATE_AXIS

__all__ = [
    "PartitionedCSR",
    "BandedPartitionedCSR",
    "partition_csr_rows",
    "partition_csr_banded",
    "make_allgather_csr_apply",
    "make_banded_csr_apply",
]


@dataclass(frozen=True)
class PartitionedCSR:
    """Row-partitioned CSR slabs, stacked over the device axis.

    ``data``/``col``/``row`` have shape ``(P, nnz_max)`` (zero-padded;
    padding rows point at row 0 / col 0 with zero data).  ``col`` holds
    GLOBAL column indices; ``row`` holds LOCAL row indices.
    """

    data: Any  # (P, nnz_max)
    col: Any  # (P, nnz_max) int32, global
    row: Any  # (P, nnz_max) int32, local
    n_rows_local: int = 0
    n_devices: int = 0
    shape: tuple = ()


_register_pytree(
    PartitionedCSR, ("data", "col", "row"), ("n_rows_local", "n_devices", "shape")
)


@dataclass(frozen=True)
class BandedPartitionedCSR:
    """Row-partitioned CSR with columns remapped into the extended
    local vector ``[left_halo | local | right_halo]`` (halo width
    ``w``); requires all nonzeros within ``w`` of the local block."""

    data: Any  # (P, nnz_max)
    col: Any  # (P, nnz_max) int32, extended-local (0 .. 2w+n_local-1)
    row: Any  # (P, nnz_max) int32, local
    halo: int = 0
    n_rows_local: int = 0
    n_devices: int = 0
    shape: tuple = ()


_register_pytree(
    BandedPartitionedCSR,
    ("data", "col", "row"),
    ("halo", "n_rows_local", "n_devices", "shape"),
)


def _pad_slabs(slabs):
    """Pad per-device (data, col, row) triples to uniform nnz."""
    nnz_max = max(len(d) for d, c, r in slabs)
    P_ = len(slabs)
    data = np.zeros((P_, nnz_max), dtype=slabs[0][0].dtype)
    col = np.zeros((P_, nnz_max), dtype=np.int32)
    row = np.zeros((P_, nnz_max), dtype=np.int32)
    for i, (d, c, r) in enumerate(slabs):
        data[i, : len(d)] = d
        col[i, : len(c)] = c
        row[i, : len(r)] = r
    return data, col, row


def partition_csr_rows(A, n_devices: int) -> PartitionedCSR:
    """Partition a scipy CSR (or :class:`CSROperator`) into row slabs."""
    if isinstance(A, CSROperator):
        A = A.to_scipy()
    A = A.tocsr()
    N = A.shape[0]
    if N % n_devices:
        raise ValueError(f"matrix dim {N} not divisible by {n_devices} devices")
    n_local = N // n_devices
    slabs = []
    for d in range(n_devices):
        S = A[d * n_local : (d + 1) * n_local]
        S = S.tocoo()
        order = np.lexsort((S.col, S.row))
        slabs.append(
            (
                S.data[order],
                S.col[order].astype(np.int32),
                S.row[order].astype(np.int32),
            )
        )
    data, col, row = _pad_slabs(slabs)
    return PartitionedCSR(
        data=jnp.asarray(data),
        col=jnp.asarray(col),
        row=jnp.asarray(row),
        n_rows_local=n_local,
        n_devices=n_devices,
        shape=tuple(A.shape),
    )


def partition_csr_banded(A, n_devices: int) -> BandedPartitionedCSR:
    """Partition a banded CSR into row slabs with neighbor halos.

    The halo width is the maximum distance of any nonzero column from
    the local block, and must not exceed the block size (only
    nearest-neighbor exchange is generated).
    """
    if isinstance(A, CSROperator):
        A = A.to_scipy()
    A = A.tocsr()
    N = A.shape[0]
    if N % n_devices:
        raise ValueError(f"matrix dim {N} not divisible by {n_devices} devices")
    n_local = N // n_devices
    # measure required halo
    w = 0
    coo = A.tocoo()
    block_r = coo.row // n_local
    lo = block_r * n_local
    w = int(
        max(
            np.maximum(lo - coo.col, 0).max(initial=0),
            np.maximum(coo.col - (lo + n_local - 1), 0).max(initial=0),
        )
    )
    if w > n_local:
        raise ValueError(
            f"bandwidth halo {w} exceeds block size {n_local}; use the "
            "all-gather path or fewer devices"
        )
    slabs = []
    for d in range(n_devices):
        S = A[d * n_local : (d + 1) * n_local].tocoo()
        order = np.lexsort((S.col, S.row))
        cols = S.col[order]
        # remap global -> extended-local [0, 2w + n_local)
        ext = cols - (d * n_local - w)
        if ext.min(initial=0) < 0 or (len(ext) and ext.max() >= n_local + 2 * w):
            raise ValueError("nonzero outside nearest-neighbor halo")
        slabs.append(
            (S.data[order], ext.astype(np.int32), S.row[order].astype(np.int32))
        )
    data, col, row = _pad_slabs(slabs)
    return BandedPartitionedCSR(
        data=jnp.asarray(data),
        col=jnp.asarray(col),
        row=jnp.asarray(row),
        halo=w,
        n_rows_local=n_local,
        n_devices=n_devices,
        shape=tuple(A.shape),
    )


def _csr_slab_matvec(data, col, row, v, n_rows):
    prod = data * v[col]
    return jax.ops.segment_sum(prod, row, num_segments=n_rows, indices_are_sorted=True)


def allgather_csr_apply(pcsr: PartitionedCSR, psi_local, *, axis_name=STATE_AXIS):
    """SpMV from inside ``shard_map``: gather the full state, apply the
    local slab."""
    psi_full = jax.lax.all_gather(psi_local, axis_name, tiled=True)
    return _csr_slab_matvec(
        pcsr.data, pcsr.col, pcsr.row, psi_full, pcsr.n_rows_local
    )


def banded_csr_apply(pcsr: BandedPartitionedCSR, psi_local, *, axis_name=STATE_AXIS):
    """SpMV from inside ``shard_map`` with nearest-neighbor halo
    exchange: two edge ``ppermute``s of width ``halo``."""
    w = pcsr.halo
    n_dev = pcsr.n_devices
    if w == 0:
        ext = psi_local
    else:
        # my tail -> right neighbor's left halo; my head -> left
        # neighbor's right halo
        right_perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
        left_perm = [(s, (s - 1) % n_dev) for s in range(n_dev)]
        left_halo = jax.lax.ppermute(psi_local[-w:], axis_name, right_perm)
        right_halo = jax.lax.ppermute(psi_local[:w], axis_name, left_perm)
        ext = jnp.concatenate([left_halo, psi_local, right_halo])
    return _csr_slab_matvec(pcsr.data, pcsr.col, pcsr.row, ext, pcsr.n_rows_local)


def _pcsr_spec(pcsr):
    """shard_map input spec: slabs sharded over their leading axis."""
    kind = type(pcsr)
    kwargs = dict(
        n_rows_local=pcsr.n_rows_local,
        n_devices=pcsr.n_devices,
        shape=pcsr.shape,
    )
    if isinstance(pcsr, BandedPartitionedCSR):
        kwargs["halo"] = pcsr.halo
    return kind(data=P(STATE_AXIS), col=P(STATE_AXIS), row=P(STATE_AXIS), **kwargs)


def _make_apply(mesh, pcsr, inner):
    spec = _pcsr_spec(pcsr)

    def _fn(pc, v):
        # leading device axis of the slab is squeezed inside shard_map
        pc_local = type(pc)(
            **{
                **{k: getattr(pc, k)[0] for k in ("data", "col", "row")},
                **{
                    k: getattr(pc, k)
                    for k in (
                        ("halo", "n_rows_local", "n_devices", "shape")
                        if isinstance(pc, BandedPartitionedCSR)
                        else ("n_rows_local", "n_devices", "shape")
                    )
                },
            }
        )
        return inner(pc_local, v)

    return jax.jit(
        jax.shard_map(_fn, mesh=mesh, in_specs=(spec, P(STATE_AXIS)), out_specs=P(STATE_AXIS))
    )


def make_allgather_csr_apply(mesh: Mesh, pcsr: PartitionedCSR):
    """Jitted distributed SpMV ``(pcsr, psi) -> H psi`` (all-gather)."""
    return _make_apply(mesh, pcsr, allgather_csr_apply)


def make_banded_csr_apply(mesh: Mesh, pcsr: BandedPartitionedCSR):
    """Jitted distributed SpMV ``(pcsr, psi) -> H psi`` (halo)."""
    return _make_apply(mesh, pcsr, banded_csr_apply)

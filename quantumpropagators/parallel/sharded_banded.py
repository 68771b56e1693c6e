"""Sharded Pallas banded df64 Chebyshev step: BASELINE config 5's
multi-chip path riding the measured-fastest df64 kernel.

Round-4 left the Pallas banded dd SpMV (:mod:`..ops.bsr_dd_pallas`,
5.3× the XLA df64 BSR chain at 2^16) reachable only from ``bench.py``
while :func:`..parallel.sharded_bsr.make_sharded_bsr_cheby_step_dd`
streamed the slow chain.  This module closes that gap (VERDICT r4
item 2): the banded band-major planes are split by block rows across
the device mesh, each matvec exchanges ONE full edge tile per side
(``tile_rows·b·2`` dd-plane entries — shard-size-independent), and the
shard-local contraction is the same VMEM-resident compensated Pallas
kernel via its halo-extended window mode
(:func:`~..ops.bsr_dd_pallas.banded_dd_apply_extended`), so per-shard
throughput ≈ the single-device kernel at equal local size.

Reference parallelism contrast: the reference is single-process Julia
(``src/cheby.jl:146-148`` generic ``mul!``); distribution is the
TPU-native layer it does not have (SURVEY §2.8, §7.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.bsr_dd_pallas import BandedDD, banded_dd_apply_extended, \
    banded_dd_from_scipy
from ..ops.operators import _register_pytree
from .mesh import STATE_AXIS
from .sharded_bsr import _halo_extend

__all__ = [
    "PartitionedBandedDD",
    "partition_banded_dd",
    "banded_pallas_apply_dd",
    "banded_pallas_apply_cdd",
    "make_sharded_banded_cheby_step_dd",
    "make_sharded_dd_cheby_step",
]


@dataclass(frozen=True)
class PartitionedBandedDD:
    """Block-row split of a :class:`~..ops.bsr_dd_pallas.BandedDD`
    across devices: ``planes_hi/planes_lo`` are
    ``(P, n_bands, b, R_local, b)`` f32, band offsets static.  The halo
    a shard needs is ``max|offset| ≤ tile_rows`` block rows per side;
    one full ``tile_rows`` edge tile is exchanged so the Pallas window
    maps stay exact shifts."""

    planes_hi: Any
    planes_lo: Any
    offsets: tuple = ()
    R_local: int = 0
    n_devices: int = 0
    b: int = 128
    tile_rows: int = 8
    shape: tuple = ()
    logical_nnz: int = 0


_register_pytree(
    PartitionedBandedDD, ("planes_hi", "planes_lo"),
    ("offsets", "R_local", "n_devices", "b", "tile_rows", "shape",
     "logical_nnz"),
)


def partition_banded_dd(
    A, n_devices: int, *, tile_rows: int = 8, block: int = 128,
    max_bands: int = 9,
) -> PartitionedBandedDD:
    """Split a banded operator (scipy matrix or prebuilt
    :class:`BandedDD`) into per-device band-plane slabs.

    Requires the global block-row count divisible by
    ``n_devices·tile_rows`` and every band offset within ``tile_rows``
    (one halo tile per side); raise otherwise — callers fall back to
    the all-gather XLA chain (:func:`make_sharded_dd_cheby_step`)."""
    op = A if isinstance(A, BandedDD) else banded_dd_from_scipy(
        A, max_bands=max_bands, block=block
    )
    wb = max((abs(d) for d in op.offsets), default=0)
    if wb > tile_rows:
        raise ValueError(
            f"band offset {wb} exceeds tile_rows {tile_rows}: halo "
            "does not fit one edge tile"
        )
    if op.R % (n_devices * tile_rows):
        raise ValueError(
            f"{op.R} block rows not divisible by n_devices·tile_rows "
            f"= {n_devices}·{tile_rows}"
        )
    Rl = op.R // n_devices
    # (n_bands, b, R, b) -> (P, n_bands, b, Rl, b)
    ph = jnp.moveaxis(
        op.planes_hi.reshape(len(op.offsets), op.b, n_devices, Rl, op.b),
        2, 0,
    )
    pl_ = jnp.moveaxis(
        op.planes_lo.reshape(len(op.offsets), op.b, n_devices, Rl, op.b),
        2, 0,
    )
    return PartitionedBandedDD(
        planes_hi=ph,
        planes_lo=pl_,
        offsets=op.offsets,
        R_local=Rl,
        n_devices=n_devices,
        b=op.b,
        tile_rows=tile_rows,
        shape=op.shape,
        logical_nnz=op.logical_nnz,
    )


def _pb_meta(pb: PartitionedBandedDD) -> dict:
    return dict(
        offsets=pb.offsets, R_local=pb.R_local, n_devices=pb.n_devices,
        b=pb.b, tile_rows=pb.tile_rows, shape=pb.shape,
        logical_nnz=pb.logical_nnz,
    )


def banded_pallas_apply_dd(
    pb: PartitionedBandedDD, x, *, axis_name=STATE_AXIS,
    interpret: bool = False,
):
    """df64 banded SpMV from inside ``shard_map``: exchange one full
    edge tile per side of both dd planes, then run the Pallas kernel
    over the halo-extended window.  ``x`` is a :class:`~..ops.df64.DD`
    of the local ``(R_local·b,)`` planes.

    At the global edges the ring ``ppermute`` wraps state around; those
    halo rows multiply the zero-filled out-of-range band blocks of the
    edge shards (:class:`BandedDD` zero-fills them), contributing exact
    zeros — same convention as the blocked-ELL banded path."""
    from ..ops.df64 import DD

    w = pb.tile_rows * pb.b
    op_local = BandedDD(
        planes_hi=pb.planes_hi, planes_lo=pb.planes_lo,
        offsets=pb.offsets, R=pb.R_local, b=pb.b,
        shape=(pb.R_local * pb.b, pb.R_local * pb.b),
        logical_nnz=0,
    )
    xh = _halo_extend(x.hi, w, pb.n_devices, axis_name)
    xl = _halo_extend(x.lo, w, pb.n_devices, axis_name)
    return banded_dd_apply_extended(
        op_local, DD(xh, xl), tile_rows=pb.tile_rows, interpret=interpret,
    )


def banded_pallas_apply_cdd(
    pb: PartitionedBandedDD, v, *, axis_name=STATE_AXIS,
    interpret: bool = False,
):
    """Complex df64 banded SpMV with ONE halo exchange per direction
    for ALL FOUR dd planes (re/im × hi/lo stacked into a single
    ``(4, w)`` buffer per side).

    The measured motivation (`docs/bench_r05/banded20.json`): with
    per-plane exchanges the 1-device-mesh sharded step ran 28.5% below
    the unsharded kernel — 8 ppermute launches per polynomial order
    serialize against the Pallas grid; batching them into 2 removes
    most of that."""
    from ..ops.df64 import CDD, DD

    w = pb.tile_rows * pb.b
    n_dev = pb.n_devices
    planes = (v.re.hi, v.re.lo, v.im.hi, v.im.lo)
    right_perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
    left_perm = [(s, (s - 1) % n_dev) for s in range(n_dev)]
    tails = jnp.stack([p[-w:] for p in planes])
    heads = jnp.stack([p[:w] for p in planes])
    left_halo = jax.lax.ppermute(tails, axis_name, right_perm)
    right_halo = jax.lax.ppermute(heads, axis_name, left_perm)
    op_local = BandedDD(
        planes_hi=pb.planes_hi, planes_lo=pb.planes_lo,
        offsets=pb.offsets, R=pb.R_local, b=pb.b,
        shape=(pb.R_local * pb.b, pb.R_local * pb.b),
        logical_nnz=0,
    )

    def ext(k):
        return jnp.concatenate([left_halo[k], planes[k], right_halo[k]])

    def comp(hi_k, lo_k):
        return banded_dd_apply_extended(
            op_local, DD(ext(hi_k), ext(lo_k)),
            tile_rows=pb.tile_rows, interpret=interpret,
        )

    return CDD(comp(0, 1), comp(2, 3))


def make_sharded_banded_cheby_step_dd(
    mesh: Mesh,
    pb: PartitionedBandedDD,
    *,
    delta: float,
    e_min: float,
    dt: float,
    forward: bool = True,
    interpret: bool = None,
):
    """Reference-accuracy multi-chip banded Chebyshev step on the
    Pallas df64 kernel — the fast realization of BASELINE config 5
    ("2D lattice 2^24 BSR block-partitioned ... with halo overlap";
    accuracy contract ``test/test_cheby.jl:8``).

    Returns ``step(pb, state4, coeffs_h, coeffs_l) -> state4`` with
    ``state4 = (re_hi, re_lo, im_hi, im_lo)`` global ``(N,)`` f32
    planes sharded ``P(x)``; each polynomial order costs one edge-tile
    halo exchange + one Pallas banded SpMV per real/imag component."""
    from ..ops.df64 import CDD, DD
    from ..ops.df64_sparse import cheby_dd_recurrence

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    meta = _pb_meta(pb)
    spec = PartitionedBandedDD(
        planes_hi=P(STATE_AXIS), planes_lo=P(STATE_AXIS), **meta
    )

    def _step(p, rh, rl, ih, il, c_h, c_l):
        p_local = PartitionedBandedDD(
            planes_hi=p.planes_hi[0], planes_lo=p.planes_lo[0], **meta
        )
        psi = CDD(DD(rh, rl), DD(ih, il))
        out = cheby_dd_recurrence(
            lambda v: banded_pallas_apply_cdd(
                p_local, v, interpret=interpret
            ),
            psi, c_h, c_l, delta, e_min, dt, forward,
        )
        return out.re.hi, out.re.lo, out.im.hi, out.im.lo

    sharded = jax.shard_map(
        _step,
        mesh=mesh,
        in_specs=(spec,) + (P(STATE_AXIS),) * 4 + (P(), P()),
        out_specs=(P(STATE_AXIS),) * 4,
        check_vma=False,
    )

    @jax.jit
    def step(pb, state4, coeffs_h, coeffs_l):
        rh, rl, ih, il = state4
        return sharded(pb, rh, rl, ih, il, coeffs_h, coeffs_l)

    return step


def make_sharded_dd_cheby_step(
    mesh: Mesh,
    A,
    n_devices: int,
    *,
    delta: float,
    e_min: float,
    dt: float,
    forward: bool = True,
    tile_rows: int = 8,
    block_size: int = None,
    kernel: str = "auto",
):
    """Partition a real-f64 operator and build the best available
    sharded reference-accuracy Chebyshev step for it.

    ``kernel='auto'`` selects the Pallas banded path (fast tier) when
    the operator is block-banded at 128-blocks with the halo fitting
    one edge tile, else the XLA blocked-ELL df64 chain (general tier;
    :func:`..parallel.sharded_bsr.make_sharded_bsr_cheby_step_dd`).
    Returns ``(partitioned, step, kind)`` with ``kind`` in
    ``('banded_pallas', 'bsr_xla')``."""
    if kernel not in ("auto", "banded_pallas", "bsr_xla"):
        raise ValueError(f"unknown kernel={kernel!r}")
    if kernel in ("auto", "banded_pallas"):
        try:
            pb = partition_banded_dd(
                A, n_devices, tile_rows=tile_rows,
                block=(block_size or 128),
            )
            step = make_sharded_banded_cheby_step_dd(
                mesh, pb, delta=delta, e_min=e_min, dt=dt, forward=forward,
            )
            return pb, step, "banded_pallas"
        except ValueError:
            if kernel == "banded_pallas":
                raise
    from .sharded_bsr import make_sharded_bsr_cheby_step_dd, \
        partition_bsr_dd

    pbdd = partition_bsr_dd(A, n_devices, block_size=block_size)
    step = make_sharded_bsr_cheby_step_dd(
        mesh, pbdd, delta=delta, e_min=e_min, dt=dt, forward=forward,
    )
    return pbdd, step, "bsr_xla"

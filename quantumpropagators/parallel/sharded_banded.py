"""Sharded Pallas banded df64 Chebyshev step: BASELINE config 5's
multi-chip path riding the measured-fastest df64 kernel.

Round-4 left the Pallas banded dd SpMV (:mod:`..ops.bsr_dd_pallas`,
5.3× the XLA df64 BSR chain at 2^16) reachable only from ``bench.py``
while :func:`..parallel.sharded_bsr.make_sharded_bsr_cheby_step_dd`
streamed the slow chain.  This module closes that gap (VERDICT r4
item 2).  Design (second iteration — the first ran the kernel in a
halo-extended window mode that measured ~3× slower than the plain
kernel): the band planes are split by block rows with the CROSS-SHARD
edge blocks zeroed out of the kernel's planes and moved into tiny
dense ``(wb·b, wb·b)`` edge matrices.  Each matvec then costs

1. one ``wb·b``-entry ``ppermute`` per direction (all four dd planes
   stacked into a single buffer — the minimal halo, shard-size-
   independent),
2. the UNMODIFIED full-speed clamped-window Pallas kernel on the
   shard interior (its edge garbage reads multiply exact zeros), and
3. a ``(wb·b)²``-MAC compensated dense edge correction
   ``y[:w] += E_L·left_halo``, ``y[−w:] += E_R·right_halo``.

Per-shard throughput therefore ≈ the single-device kernel at equal
local size (1-device-mesh probe in ``bench.py --config banded20``).

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
    across devices.

    ``planes_hi/planes_lo``: ``(P, n_bands, b, R_local, b)`` f32 with
    the CROSS-SHARD edge blocks ZEROED — the shard-local SpMV runs the
    plain (clamped-window) Pallas kernel at full speed, its edge
    garbage reads multiplying exact zeros (measured: the halo-extended
    window mode costs ~3× kernel slowdown, `docs/bench_r05/`).  The
    removed blocks live in ``edge_left_hi/lo`` / ``edge_right_hi/lo``
    ``(P, wb·b, wb·b)`` dense planes; the halo contribution is a tiny
    dd edge matvec applied OUTSIDE the kernel:
    ``y[:wb·b] += E_L·left_halo``, ``y[−wb·b:] += E_R·right_halo``.
    The exchange then moves only ``wb·b`` entries per side per plane —
    the minimal halo."""

    planes_hi: Any
    planes_lo: Any
    edge_left_hi: Any = None
    edge_left_lo: Any = None
    edge_right_hi: Any = None
    edge_right_lo: Any = None
    offsets: tuple = ()
    R_local: int = 0
    n_devices: int = 0
    b: int = 128
    wb: int = 1
    tile_rows: int = 8
    shape: tuple = ()
    logical_nnz: int = 0


_register_pytree(
    PartitionedBandedDD,
    ("planes_hi", "planes_lo", "edge_left_hi", "edge_left_lo",
     "edge_right_hi", "edge_right_lo"),
    ("offsets", "R_local", "n_devices", "b", "wb", "tile_rows", "shape",
     "logical_nnz"),
)


def partition_banded_dd(
    A, n_devices: int, *, tile_rows: int = 8, block: int = 128,
    max_bands: int = 9,
) -> PartitionedBandedDD:
    """Split a banded operator (scipy matrix or prebuilt
    :class:`BandedDD`) into per-device band-plane slabs.

    Cross-shard edge blocks are MOVED out of the band planes into
    dense ``(wb·b, wb·b)`` edge matrices (see the dataclass doc): the
    shard kernel stays the full-speed clamped-window variant and the
    halo contribution becomes a tiny dd edge matvec.

    Requires the global block-row count divisible by
    ``n_devices·tile_rows`` and every band offset within ``tile_rows``;
    raise otherwise — callers fall back to the all-gather XLA chain
    (:func:`make_sharded_dd_cheby_step`)."""
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
    b = op.b
    nb = len(op.offsets)
    P_ = n_devices
    # recombine to f64, split per device, extract cross-shard blocks
    ph64 = np.asarray(op.planes_hi, np.float64) + np.asarray(
        op.planes_lo, np.float64
    )  # (nb, b, R, b)
    w = max(wb, 1) * b
    EL = np.zeros((P_, w, w), np.float64)
    ER = np.zeros((P_, w, w), np.float64)
    for dev in range(P_):
        for k, d in enumerate(op.offsets):
            if d < 0:
                for r in range(min(-d, Rl)):
                    g = dev * Rl + r
                    # block (r, r+d): [o_row, i_col] = planes[k, i, g, o]
                    blk = ph64[k, :, g, :].T  # (o_row, i_col)
                    p = wb + r + d  # position in the left halo buffer
                    EL[dev, r * b:(r + 1) * b,
                       p * b:(p + 1) * b] = blk
                    ph64[k, :, g, :] = 0.0
            elif d > 0:
                for r in range(max(Rl - d, 0), Rl):
                    g = dev * Rl + r
                    blk = ph64[k, :, g, :].T
                    p = r + d - Rl  # position in the right halo buffer
                    rr = r - (Rl - wb)
                    ER[dev, rr * b:(rr + 1) * b,
                       p * b:(p + 1) * b] = blk
                    ph64[k, :, g, :] = 0.0
    hi = ph64.astype(np.float32)
    lo = (ph64 - hi.astype(np.float64)).astype(np.float32)

    def split_dev(x):
        # (nb, b, R, b) -> (P, nb, b, Rl, b)
        return np.moveaxis(
            x.reshape(nb, b, P_, Rl, b), 2, 0
        )

    def dd_pair(x64):
        h = x64.astype(np.float32)
        return (jnp.asarray(h),
                jnp.asarray((x64 - h.astype(np.float64)).astype(
                    np.float32)))

    el_h, el_l = dd_pair(EL)
    er_h, er_l = dd_pair(ER)
    return PartitionedBandedDD(
        planes_hi=jnp.asarray(split_dev(hi)),
        planes_lo=jnp.asarray(split_dev(lo)),
        edge_left_hi=el_h, edge_left_lo=el_l,
        edge_right_hi=er_h, edge_right_lo=er_l,
        offsets=op.offsets,
        R_local=Rl,
        n_devices=n_devices,
        b=b,
        wb=max(wb, 1),
        tile_rows=tile_rows,
        shape=op.shape,
        logical_nnz=op.logical_nnz,
    )


def _pb_meta(pb: PartitionedBandedDD) -> dict:
    return dict(
        offsets=pb.offsets, R_local=pb.R_local, n_devices=pb.n_devices,
        b=pb.b, wb=pb.wb, tile_rows=pb.tile_rows, shape=pb.shape,
        logical_nnz=pb.logical_nnz,
    )


_PB_DATA = ("planes_hi", "planes_lo", "edge_left_hi", "edge_left_lo",
            "edge_right_hi", "edge_right_lo")


def _pb_spec(meta) -> "PartitionedBandedDD":
    return PartitionedBandedDD(
        **{f: P(STATE_AXIS) for f in _PB_DATA}, **meta
    )


def _pb_local(p: PartitionedBandedDD, meta) -> "PartitionedBandedDD":
    return PartitionedBandedDD(
        **{f: getattr(p, f)[0] for f in _PB_DATA}, **meta
    )


def _local_op(pb: PartitionedBandedDD) -> BandedDD:
    return BandedDD(
        planes_hi=pb.planes_hi, planes_lo=pb.planes_lo,
        offsets=pb.offsets, R=pb.R_local, b=pb.b,
        shape=(pb.R_local * pb.b, pb.R_local * pb.b),
        logical_nnz=0,
    )


def _edge_correct(pb: PartitionedBandedDD, y, left_halo, right_halo):
    """``y[:w] += E_L·left_halo``; ``y[−w:] += E_R·right_halo`` in dd.

    ``left_halo/right_halo`` are ``(2, w)`` stacked (hi, lo) planes of
    the ``wb·b``-entry halos; the edge matvecs are tiny dense
    compensated contractions (``(wb·b)²`` MACs)."""
    from ..ops.df64 import DD, dd_add
    from ..ops.dd_linalg import _dense_real_matvec_dd

    w = pb.wb * pb.b
    cl = _dense_real_matvec_dd(
        pb.edge_left_hi, pb.edge_left_lo,
        DD(left_halo[0], left_halo[1]),
    )
    cr = _dense_real_matvec_dd(
        pb.edge_right_hi, pb.edge_right_lo,
        DD(right_halo[0], right_halo[1]),
    )
    head = dd_add(DD(y.hi[:w], y.lo[:w]), cl)
    tail = dd_add(DD(y.hi[-w:], y.lo[-w:]), cr)
    return DD(
        y.hi.at[:w].set(head.hi).at[-w:].set(tail.hi),
        y.lo.at[:w].set(head.lo).at[-w:].set(tail.lo),
    )


def _exchange_halos(planes, w, n_dev, axis_name):
    """One ppermute per direction for a stack of planes: returns
    ``(left_halo, right_halo)`` each ``(len(planes), w)``."""
    right_perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
    left_perm = [(s, (s - 1) % n_dev) for s in range(n_dev)]
    tails = jnp.stack([p[-w:] for p in planes])
    heads = jnp.stack([p[:w] for p in planes])
    left_halo = jax.lax.ppermute(tails, axis_name, right_perm)
    right_halo = jax.lax.ppermute(heads, axis_name, left_perm)
    return left_halo, right_halo


def banded_pallas_apply_dd(
    pb: PartitionedBandedDD, x, *, axis_name=STATE_AXIS,
    interpret: bool = False,
):
    """df64 banded SpMV from inside ``shard_map`` (one real dd plane
    pair): the PLAIN clamped-window Pallas kernel over the shard's
    band planes (cross-shard edge blocks are zeroed at partition time,
    so its edge garbage reads contribute exact zeros), plus the dense
    dd edge correction fed by a minimal ``wb·b``-entry halo exchange.

    At the global edges the ring ``ppermute`` wraps state around; the
    corresponding edge-matrix rows are zero, contributing exact zeros.
    """
    from ..ops.bsr_dd_pallas import banded_dd_apply

    w = pb.wb * pb.b
    left_halo, right_halo = _exchange_halos(
        (x.hi, x.lo), w, pb.n_devices, axis_name
    )
    y = banded_dd_apply(_local_op(pb), x, tile_rows=pb.tile_rows,
                        interpret=interpret)
    return _edge_correct(pb, y, left_halo, right_halo)


def banded_pallas_apply_cdd(
    pb: PartitionedBandedDD, v, *, axis_name=STATE_AXIS,
    interpret: bool = False,
):
    """Complex df64 banded SpMV: plain-kernel shard interior + dense
    dd edge corrections, with ONE ``wb·b``-entry halo exchange per
    direction for ALL FOUR planes (re/im × hi/lo stacked).

    Measured motivation (`docs/bench_r05/banded20.json`): the
    halo-extended window kernel ran ~3× slower than the plain kernel
    (28% step overhead on a 1-device mesh); zeroed edge blocks + a
    ``(wb·b)²``-MAC correction keep the interior at full speed and cut
    the exchange to the minimal halo."""
    from ..ops.bsr_dd_pallas import banded_dd_apply
    from ..ops.df64 import CDD, DD

    w = pb.wb * pb.b
    planes = (v.re.hi, v.re.lo, v.im.hi, v.im.lo)
    left_halo, right_halo = _exchange_halos(
        planes, w, pb.n_devices, axis_name
    )
    op_local = _local_op(pb)

    def comp(hi_k, lo_k):
        y = banded_dd_apply(
            op_local, DD(planes[hi_k], planes[lo_k]),
            tile_rows=pb.tile_rows, interpret=interpret,
        )
        return _edge_correct(
            pb, y,
            jnp.stack([left_halo[hi_k], left_halo[lo_k]]),
            jnp.stack([right_halo[hi_k], right_halo[lo_k]]),
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
    spec = _pb_spec(meta)

    def _step(p, rh, rl, ih, il, c_h, c_l):
        p_local = _pb_local(p, meta)
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

"""Pallas banded df64 block-SpMV: reference accuracy for UNSTRUCTURED
(block-banded) operators at HBM-streaming speed.

The XLA df64 BSR chain (:mod:`.df64_sparse`) materializes its
error-free product planes ``(R, b, k·b)`` in HBM — ``k·b`` times the
state size streamed several times per polynomial order, which caps it
orders of magnitude below the streaming bound at scale.  This module
moves the whole compensated contraction into ONE Pallas kernel per
matvec: operator blocks stream through VMEM exactly once, the dd
accumulators live in registers, and HBM traffic drops to
``8 bytes/nnz + O(state)`` per order — the same movement class as the
structured ``fused_cheby_dd`` kernel.

Scope (the BASELINE config-3/5 shape): **block-banded** operators with
static block-diagonal offsets — optomech/transmon kron chains, 1D/2D
lattice discretizations, re-blocked BSR chains.  The build step
re-blocks any banded matrix to ``b = 128`` blocks (the TPU lane width)
so every tile is layout-native; band planes are stored
in-block-column-major ``(b_in, R, b_out)`` so the inner contraction
step reads one contiguous ``(TR, 128)`` plane per (band, column).

Accuracy: error-free hi·hi products (Dekker two-product), hi·lo cross
terms in plain f32 (≤ 2⁻²⁴ of value scale), and BOTH accumulator lanes
carried by two_sum cascades — per-matvec error ~2⁻⁴⁸ relative,
matching the XLA path's compensated tree (reference contract 1e-10,
``/root/reference/test/test_cheby.jl:8``; cf. ``test/optomech.jl``).

Same EFT-barrier policy as :mod:`.fused_cheby_dd`: no barriers in
compiled Mosaic kernels, host-callback barriers in interpret mode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .fused_cheby_dd import _USE_BARRIER, _b, _split, _two_sum
from .operators import _register_pytree

__all__ = [
    "BandedDD",
    "banded_dd_from_scipy",
    "banded_dd_apply",
    "banded_dd_apply_extended",
    "cheby_apply_dd_banded",
]

_B = 128  # block size after re-blocking (= TPU lane width)


@dataclass(frozen=True)
class BandedDD:
    """Band-major df64 banded block operator.

    ``planes_hi/planes_lo``: ``(n_bands, b_in, R, b_out)`` f32 with
    ``b_in = b_out = b`` (128 in production — the TPU lane width;
    tests use small ``b`` so interpret-mode EFT barriers stay
    tractable); entry ``[k, i, r, o] = A[r·b + o,
    (r + offsets[k])·b + i]``.  ``offsets`` is a static tuple of
    block-diagonal offsets; out-of-range blocks are zero-filled, so
    edge tiles read clamped (garbage) state rows that are multiplied
    by exact zeros."""

    planes_hi: Any
    planes_lo: Any
    offsets: tuple = ()
    R: int = 0
    b: int = 128
    shape: tuple = ()
    logical_nnz: int = 0


_register_pytree(
    BandedDD, ("planes_hi", "planes_lo"),
    ("offsets", "R", "b", "shape", "logical_nnz"),
)


def banded_dd_from_scipy(A, max_bands: int = 9, block: int = _B) -> BandedDD:
    """Re-block a (real f64) banded scipy matrix to 128-blocks and
    extract its block-diagonal bands in band-major dd planes.

    The logical dimension is zero-padded up to a multiple of 128; the
    operator must be block-banded after re-blocking (≤ ``max_bands``
    distinct block-diagonal offsets — guards against accidentally
    densifying a non-banded matrix into R bands)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    if np.iscomplexobj(A.data) and np.abs(A.data.imag).max() > 0:
        raise ValueError("banded_dd_from_scipy supports real entries")
    A = sp.csr_matrix(A.real.astype(np.float64))
    b = int(block)
    N = A.shape[0]
    if A.shape[0] != A.shape[1]:
        raise ValueError("BandedDD requires a square matrix")
    n_pad = -(-N // b) * b
    if n_pad != N:
        A = sp.bmat(
            [[A, sp.csr_matrix((N, n_pad - N))],
             [sp.csr_matrix((n_pad - N, N)),
              sp.csr_matrix((n_pad - N, n_pad - N))]],
            format="csr",
        )
    Bm = A.tobsr(blocksize=(b, b))
    Bm.eliminate_zeros()
    R = n_pad // b
    offs = set()
    for r in range(R):
        for j in range(Bm.indptr[r], Bm.indptr[r + 1]):
            offs.add(int(Bm.indices[j]) - r)
    offsets = tuple(sorted(offs))
    if len(offsets) > max_bands:
        raise ValueError(
            f"{len(offsets)} block-diagonal offsets after re-blocking "
            f"(> {max_bands}): not a banded operator at block size 128"
        )
    planes = np.zeros((len(offsets), b, R, b), dtype=np.float64)
    kmap = {d: k for k, d in enumerate(offsets)}
    for r in range(R):
        for j in range(Bm.indptr[r], Bm.indptr[r + 1]):
            d = int(Bm.indices[j]) - r
            # block (b_out, b_in) → planes[k, b_in, r, b_out]
            planes[kmap[d], :, r, :] = Bm.data[j].T
    hi = planes.astype(np.float32)
    lo = (planes - hi.astype(np.float64)).astype(np.float32)
    return BandedDD(
        planes_hi=jnp.asarray(hi),
        planes_lo=jnp.asarray(lo),
        offsets=offsets,
        R=R,
        b=b,
        shape=(n_pad, n_pad),
        logical_nnz=int(A.nnz),
    )


def _banded_kernel(offsets, TR, b, has_prev, has_next, *refs):
    """One output tile ``y[r0:r0+TR]`` of the banded dd SpMV.

    refs: per band (Ah, Al) ``(b, TR, b)``; then the x window
    planes — ``[prev_h, prev_l]?, cur_h, cur_l, [next_h, next_l]?``
    each ``(TR, 128)``; outputs ``y_h, y_l``."""
    k = 0
    bands = []
    for _ in offsets:
        bands.append((refs[k], refs[k + 1]))
        k += 2
    parts_h, parts_l = [], []
    if has_prev:
        parts_h.append(refs[k][:]); parts_l.append(refs[k + 1][:]); k += 2
    parts_h.append(refs[k][:]); parts_l.append(refs[k + 1][:]); k += 2
    if has_next:
        parts_h.append(refs[k][:]); parts_l.append(refs[k + 1][:]); k += 2
    o_yh, o_yl = refs[k:]
    xh = jnp.concatenate(parts_h, axis=0) if len(parts_h) > 1 else parts_h[0]
    xl = jnp.concatenate(parts_l, axis=0) if len(parts_l) > 1 else parts_l[0]
    base = TR if has_prev else 0

    f32 = jnp.float32
    acc_p = jnp.zeros((TR, b), f32)
    acc_e = jnp.zeros((TR, b), f32)
    acc_e2 = jnp.zeros((TR, b), f32)
    for (ah_ref, al_ref), d in zip(bands, offsets):
        xh_d = xh[base + d: base + d + TR]
        xl_d = xl[base + d: base + d + TR]
        # Dekker split of the x window ONCE per band; the per-column
        # broadcasts then recombine exactly (c = c1 + c2)
        x1_d, x2_d = _split(xh_d)
        for i in range(b):
            ah = ah_ref[i]
            al = al_ref[i]
            c1 = jax.lax.broadcast_in_dim(x1_d[:, i], (TR, b), (0,))
            c2 = jax.lax.broadcast_in_dim(x2_d[:, i], (TR, b), (0,))
            cl = jax.lax.broadcast_in_dim(xl_d[:, i], (TR, b), (0,))
            ch = c1 + c2  # exact: Dekker halves recombine exactly
            p = _b(ah * ch)
            a1, a2 = _split(ah)
            e = _b(
                _b(_b(_b(a1 * c1) - p) + _b(a1 * c2) + _b(a2 * c1))
                + _b(a2 * c2)
            ) + _b(ah * cl) + _b(al * ch)
            acc_p, err = _two_sum(acc_p, p)
            acc_e, err2 = _two_sum(acc_e, _b(e + err))
            acc_e2 = _b(acc_e2 + err2)
    yh, yl = _two_sum(acc_p, acc_e)
    o_yh[:] = yh
    o_yl[:] = _b(yl + acc_e2)


@partial(jax.jit, static_argnames=("offsets", "R", "b", "tile_rows",
                                   "interpret", "halo_ext"))
def _banded_apply_impl(planes_hi, planes_lo, xh, xl, offsets, R, b,
                       tile_rows, interpret, halo_ext=False):
    _USE_BARRIER[0] = bool(interpret)
    TR = tile_rows
    n_tiles = R // TR
    wb = max((abs(d) for d in offsets), default=0)
    if wb > TR:
        raise ValueError(f"band offset {wb} exceeds tile_rows {TR}")
    # the prev/next windows are needed whenever an offset reaches
    # outside the tile — including at n_tiles == 1, where the clamped
    # index maps serve the tile itself and the out-of-range slice rows
    # multiply zero-padded edge blocks (an earlier `n_tiles > 1` guard
    # made single-tile operators slice an un-extended window out of
    # range)
    has_prev = any(d < 0 for d in offsets)
    has_next = any(d > 0 for d in offsets)
    kw = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
    vec = pl.BlockSpec((TR, b), lambda i: (i, 0), **kw)
    band_spec = pl.BlockSpec((b, TR, b), lambda i: (0, i, 0), **kw)
    if halo_ext:
        # sharded mode: x carries one extra TR-block-row halo tile on
        # each side (filled by the caller's ppermute exchange), so the
        # window maps are exact shifts — output tile i reads x tiles
        # (i, i+1, i+2) of the (n_tiles+2)-tile extended state
        has_prev = has_next = True
        prev_spec = pl.BlockSpec((TR, b), lambda i: (i, 0), **kw)
        cur_spec = pl.BlockSpec((TR, b), lambda i: (i + 1, 0), **kw)
        next_spec = pl.BlockSpec((TR, b), lambda i: (i + 2, 0), **kw)
    else:
        cur_spec = vec
        prev_spec = pl.BlockSpec(
            (TR, b), lambda i: (jnp.maximum(i - 1, 0), 0), **kw
        )
        next_spec = pl.BlockSpec(
            (TR, b), lambda i: (jnp.minimum(i + 1, n_tiles - 1), 0), **kw
        )

    args, specs = [], []
    for kband in range(len(offsets)):
        args += [planes_hi[kband], planes_lo[kband]]
        specs += [band_spec, band_spec]
    n_xrows = R + 2 * TR if halo_ext else R
    x2h = xh.reshape(n_xrows, b)
    x2l = xl.reshape(n_xrows, b)
    if has_prev:
        args += [x2h, x2l]; specs += [prev_spec, prev_spec]
    args += [x2h, x2l]; specs += [cur_spec, cur_spec]
    if has_next:
        args += [x2h, x2l]; specs += [next_spec, next_spec]

    nbytes = (2 * len(offsets) * b + 10) * TR * b * 4
    cparams = (
        pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(max(2 * nbytes, 16 << 20), 128 << 20),
        )
        if _HAS_PLTPU and not interpret
        else None
    )
    ckw = {"compiler_params": cparams} if cparams else {}
    yh, yl = pl.pallas_call(
        partial(_banded_kernel, offsets, TR, b, has_prev, has_next),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=[vec, vec],
        out_shape=[jax.ShapeDtypeStruct((R, b), jnp.float32)] * 2,
        interpret=interpret,
        **ckw,
    )(*args)
    return yh.reshape(-1), yl.reshape(-1)


def banded_dd_apply(op: BandedDD, x, *, tile_rows: int = 8,
                    interpret: bool = False):
    """``y = A·x`` in df64 over the banded band-major layout.

    ``x`` is a :class:`~.df64.DD` of ``(R·128,)`` planes; returns a
    ``DD``.  ``tile_rows`` = block-rows per Pallas tile (VMEM per tile
    ≈ ``2·n_bands·128·tile_rows·128·4`` bytes)."""
    from .df64 import DD

    tr = min(tile_rows, op.R)
    while op.R % tr:
        tr -= 1
    yh, yl = _banded_apply_impl(
        op.planes_hi, op.planes_lo, x.hi, x.lo,
        op.offsets, op.R, op.b, tr, interpret,
    )
    return DD(yh, yl)


def banded_dd_apply_extended(op: BandedDD, x_ext, *, tile_rows: int = 8,
                             interpret: bool = False):
    """``y = A·x`` over a HALO-EXTENDED state window: the sharded-mode
    entry point.  ``x_ext`` is a :class:`~.df64.DD` of
    ``((R + 2·tile_rows)·b,)`` planes — the local shard prefixed and
    suffixed with one full ``tile_rows``-block-row halo tile each (the
    caller fills these from its mesh neighbors; band offsets must fit
    in one tile, enforced by the kernel).  Returns the local ``(R·b,)``
    result rows.  ``op.R`` here is the LOCAL block-row count."""
    from .df64 import DD

    if op.R % tile_rows:
        raise ValueError(
            f"local block rows {op.R} not divisible by tile_rows "
            f"{tile_rows} (pick a tile_rows dividing the shard)"
        )
    yh, yl = _banded_apply_impl(
        op.planes_hi, op.planes_lo, x_ext.hi, x_ext.lo,
        op.offsets, op.R, op.b, tile_rows, interpret, halo_ext=True,
    )
    return DD(yh, yl)


@partial(
    jax.jit,
    static_argnames=(
        "offsets", "R", "b", "delta", "e_min", "dt", "forward",
        "tile_rows", "interpret",
    ),
)
def _cheby_banded_impl(planes_hi, planes_lo, psi, c_hi, c_lo, offsets,
                       R, b, delta, e_min, dt, forward, tile_rows,
                       interpret):
    from .df64 import CDD
    from .df64_sparse import cheby_dd_recurrence

    op = BandedDD(planes_hi, planes_lo, offsets, R, b,
                  (R * b, R * b), 0)

    def apply_cdd(v):
        return CDD(
            banded_dd_apply(op, v.re, tile_rows=tile_rows,
                            interpret=interpret),
            banded_dd_apply(op, v.im, tile_rows=tile_rows,
                            interpret=interpret),
        )

    return cheby_dd_recurrence(
        apply_cdd, psi, c_hi, c_lo, delta, e_min, dt, forward,
    )


def cheby_apply_dd_banded(op: BandedDD, psi, coeffs, delta, e_min, dt,
                          *, tile_rows: int = 8,
                          interpret: bool = False):
    """``exp(-i H dt)|psi⟩`` over a banded dd operator with the Pallas
    SpMV kernel — the at-scale reference-accuracy path for unstructured
    banded Hamiltonians (BASELINE configs 3/5; VERDICT r3 item 5).
    ``psi`` is a :class:`~.df64.CDD`; ``coeffs`` host f64.

    The ENTIRE recurrence is one jitted executable (the elementwise dd
    passes between SpMVs would otherwise dispatch eagerly — measured
    0.11 Gnnz/s over the remote tunnel vs the kernel's streaming
    rate)."""
    coeffs = np.asarray(coeffs, dtype=np.float64)
    c_hi = jnp.asarray(coeffs.astype(np.float32))
    c_lo = jnp.asarray(
        (coeffs - coeffs.astype(np.float32).astype(np.float64)).astype(
            np.float32
        )
    )
    tr = min(tile_rows, op.R)
    while op.R % tr:
        tr -= 1
    return _cheby_banded_impl(
        op.planes_hi, op.planes_lo, psi, c_hi, c_lo, op.offsets,
        op.R, op.b, float(delta), float(e_min), float(dt), dt > 0,
        tr, interpret,
    )

"""Multi-chip variant of the fused single-pass Pallas Chebyshev kernel.

Composes the two fast paths of this framework:

- **within a chip**: the fused Pallas iteration of
  :mod:`..ops.fused_cheby` (diag + lane-matmul + sublane-roll flips +
  recurrence + Φ accumulation in ONE HBM pass per polynomial order);
- **across chips**: the hypercube exchange of
  :mod:`.sharded_chain` — the state is row-sharded into ``2^p``
  contiguous blocks, so a flip of a *device-index bit* is a pairwise
  ``ppermute`` of whole shards (one ICI hop per bit on a
  hypercube-consistent device order).

Per polynomial order each chip therefore does: ``p`` shard
``ppermute``s (XLA overlaps them with compute), one small cross-bit
matmul, and one fused Pallas pass — no reductions anywhere in the
Chebyshev loop (SURVEY §5 "long-context": the recurrence needs only
SpMV + axpy).

The device-bit contribution rides the kernel's ``extra_w_fn`` hook and
is scaled by the same traced ``flip_scale`` as the local flips, so
time-dependent transverse fields work sharded with zero retracing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fused_cheby import FlipPlan, make_flip_plan, cheby_step_fused
from .mesh import STATE_AXIS

__all__ = [
    "make_sharded_fused_cheby_step",
    "make_sharded_fused_cheby_step_dd",
    "sharded_flip_plan",
]


def sharded_flip_plan(
    L: int, g, n_devices: int, *, tile_rows: int = 512
) -> tuple:
    """Split an ``L``-bit flip plan for a ``2^p``-device mesh.

    Returns ``(plan_local, device_gs)``: the per-shard
    :class:`~..ops.fused_cheby.FlipPlan` over the low ``L - p`` bits,
    and the flip coefficients of the ``p`` device-index bits
    (``device_gs[j]`` flips bit ``j`` of the device rank).
    """
    p = int(np.log2(n_devices))
    if (1 << p) != n_devices:
        raise ValueError("n_devices must be a power of two")
    gs = np.broadcast_to(np.asarray(g, dtype=np.float64), (L,))
    L_local = L - p
    plan_local = make_flip_plan(L_local, gs[:L_local], tile_rows=tile_rows)
    device_gs = tuple(float(v) for v in gs[L_local:])
    return plan_local, device_gs


def _device_flip_w(device_gs, axis_name):
    """``extra_w_fn`` adding the device-bit flip contributions:
    ``W += Σ_j g_j · shard_from(rank XOR 2^j)`` via pairwise
    ``ppermute`` exchanges."""

    def fn(vr, vi):
        n_dev = jax.lax.axis_size(axis_name)
        wr = jnp.zeros_like(vr)
        wi = jnp.zeros_like(vi)
        for j, gj in enumerate(device_gs):
            perm = [(i, i ^ (1 << j)) for i in range(n_dev)]
            wr = wr + gj * jax.lax.ppermute(vr, axis_name, perm)
            wi = wi + gj * jax.lax.ppermute(vi, axis_name, perm)
        return wr, wi

    return fn


def make_sharded_fused_cheby_step(
    mesh: Mesh,
    L: int,
    g,
    *,
    delta: float,
    e_min: float,
    dt: float,
    tile_rows: int = 512,
    forward: bool = True,
    interpret: bool = False,
    axis_name: str = STATE_AXIS,
):
    """Build a jitted multi-chip fused Chebyshev step.

    Returns ``step(diag, re, im, coeffs[, flip_scale]) -> (re, im)``
    where ``diag``/``re``/``im`` are global ``(2^L,)`` f32 arrays
    sharded ``P(axis_name)`` over the mesh and ``coeffs`` is the
    replicated Chebyshev coefficient array.  The whole polynomial
    recurrence — fused Pallas passes + ``ppermute`` shard exchanges —
    compiles to one XLA executable with no host round trips.
    """
    n_dev = mesh.devices.size
    plan_local, device_gs = sharded_flip_plan(
        L, g, n_dev, tile_rows=tile_rows
    )
    extra = _device_flip_w(device_gs, axis_name)

    def _step(diag_local, re_local, im_local, coeffs, flip_scale):
        return cheby_step_fused(
            plan_local,
            diag_local,
            re_local,
            im_local,
            coeffs,
            delta,
            e_min,
            dt,
            flip_scale=flip_scale,
            forward=forward,
            interpret=interpret,
            extra_w_fn=extra,
        )

    sharded = jax.shard_map(
        _step,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name)),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )

    @jax.jit
    def step(diag, re, im, coeffs, flip_scale=1.0):
        return sharded(
            diag, re, im, coeffs,
            jnp.asarray(flip_scale, dtype=re.dtype),
        )

    return step


def make_sharded_fused_cheby_step_dd(
    mesh: Mesh,
    L: int,
    g,
    *,
    delta: float,
    e_min: float,
    dt: float,
    tile_rows: int | None = None,
    forward: bool = True,
    interpret: bool = False,
    axis_name: str = STATE_AXIS,
):
    """Build a jitted multi-chip **double-float** fused Chebyshev step —
    the reference-accuracy (~1e-13/step) kernel of
    :mod:`..ops.fused_cheby_dd` composed with the hypercube shard
    exchange.

    Returns ``step(dmb_h, dmb_l, state4, coeffs_h, coeffs_l) ->
    state4`` where ``state4 = (re_hi, re_lo, im_hi, im_lo)`` are global
    ``(2^L,)`` f32 arrays sharded ``P(axis_name)``, ``dmb_h/dmb_l`` the
    dd planes of ``diag − β``, and ``coeffs_h/coeffs_l`` the replicated
    dd-split Chebyshev coefficients.  Device-index-bit flips are
    delivered to the kernel as extra whole-shard planes via pairwise
    ``ppermute`` (all four dd planes exchanged — the remote lo planes
    carry the compensation, keeping the sharded result bit-comparable
    to the single-device kernel)."""
    from ..ops.fused_cheby_dd import cheby_step_fused_dd, dd_tile_rows

    n_dev = mesh.devices.size
    p = int(np.log2(n_dev))
    if (1 << p) != n_dev:
        raise ValueError("n_devices must be a power of two")
    gs = np.broadcast_to(np.asarray(g, dtype=np.float64), (L,))
    L_local = L - p
    tr = tile_rows or dd_tile_rows(L_local)
    plan_local = make_flip_plan(L_local, gs[:L_local], tile_rows=tr)
    device_gs = tuple(float(v) for v in gs[L_local:])

    def extra_nb(state4):
        n = jax.lax.axis_size(axis_name)
        out = []
        for j in range(len(device_gs)):
            perm = [(i, i ^ (1 << j)) for i in range(n)]
            out.append(tuple(
                jax.lax.ppermute(pl_, axis_name, perm) for pl_ in state4
            ))
        return out

    def _step(dmb_h, dmb_l, state4, c_h, c_l, fs):
        return cheby_step_fused_dd(
            plan_local,
            dmb_h,
            dmb_l,
            state4,
            c_h,
            c_l,
            delta,
            e_min,
            dt,
            forward=forward,
            interpret=interpret,
            extra_nb_fn=extra_nb,
            extra_gs=device_gs,
            flip_scale=(fs[0], fs[1]),
        )

    sharded = jax.shard_map(
        _step,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name),
            (P(axis_name),) * 4, P(), P(), P(),
        ),
        out_specs=(P(axis_name),) * 4,
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )

    @jax.jit
    def step(dmb_h, dmb_l, state4, coeffs_h, coeffs_l, flip_scale=None):
        """``flip_scale``: optional ``(hi, lo)`` dd pair scaling all
        flip coefficients — the time-dependent transverse field
        ``g(t)``, sharded (device-bit flip coefficients scale with it
        through the same traced SMEM table)."""
        if flip_scale is None:
            fs = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
        else:
            fs = jnp.stack(
                [jnp.asarray(flip_scale[0], jnp.float32),
                 jnp.asarray(flip_scale[1], jnp.float32)]
            )
        return sharded(dmb_h, dmb_l, tuple(state4), coeffs_h, coeffs_l, fs)

    return step

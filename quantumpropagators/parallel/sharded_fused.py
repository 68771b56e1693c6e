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

__all__ = ["make_sharded_fused_cheby_step", "sharded_flip_plan"]


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

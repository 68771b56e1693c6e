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
    "weak_site_permutation",
    "permute_index_bits",
    "invert_bit_order",
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


def weak_site_permutation(L: int, g, n_devices: int) -> tuple:
    """Device-bit assignment to weak-coupling sites (SCALING.md §2a
    lever i): choose the ``p = log2(n_devices)`` index bits with the
    SMALLEST |g| as device bits and return the bit permutation that
    puts them on top.

    Returns ``(bit_order, g_permuted)``: ``bit_order`` is a length-L
    tuple — ``bit_order[new]`` is the OLD index bit that lands at new
    position ``new`` (low ``L-p`` = shard-local, top ``p`` = device
    bits); ``g_permuted`` the per-site couplings in the new order.
    Apply with :func:`permute_index_bits` to the state and any
    diagonal BEFORE sharding (once per propagation, not per step);
    device bits with g == 0 then cost NO exchange at all — the
    sharded step skips their ``ppermute`` entirely."""
    p = int(np.log2(n_devices))
    if (1 << p) != n_devices:
        raise ValueError("n_devices must be a power of two")
    gs = np.broadcast_to(np.asarray(g, dtype=np.float64), (L,))
    order = np.argsort(np.abs(gs), kind="stable")
    weak = sorted(order[:p].tolist())       # device bits: weakest |g|
    strong = sorted(order[p:].tolist())     # shard-local bits
    bit_order = tuple(strong + weak)
    return bit_order, gs[list(bit_order)]


def permute_index_bits(v, bit_order):
    """Relabel the index bits of a ``(2^L,)`` vector: the new index has
    old bit ``bit_order[k]`` at position ``k``.  One transpose — done
    ONCE before (and inverted once after) a sharded propagation."""
    L = len(bit_order)
    arr = jnp.asarray(v).reshape((2,) * L)
    # axis a of the reshape corresponds to index bit L-1-a; put old bit
    # bit_order[k] at new bit position k
    perm = [L - 1 - bit_order[L - 1 - a] for a in range(L)]
    return jnp.transpose(arr, perm).reshape(-1)


def invert_bit_order(bit_order):
    """The inverse relabeling for :func:`permute_index_bits`."""
    L = len(bit_order)
    inv = [0] * L
    for new, old in enumerate(bit_order):
        inv[old] = new
    return tuple(inv)


def _device_flip_w(device_gs, axis_name):
    """``extra_w_fn`` adding the device-bit flip contributions:
    ``W += Σ_j g_j · shard_from(rank XOR 2^j)`` via pairwise
    ``ppermute`` exchanges."""

    def fn(vr, vi):
        n_dev = jax.lax.axis_size(axis_name)
        wr = jnp.zeros_like(vr)
        wi = jnp.zeros_like(vi)
        for j, gj in enumerate(device_gs):
            if gj == 0.0:
                # zero-coupling device bit: NO exchange (SCALING.md
                # §2a lever i — weak-site device-bit assignment)
                continue
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
    f32_tail="auto",
    fast="lomxu",
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
    to the single-device kernel).

    ``f32_tail``: the round-3 mixed-precision tail, wired through the
    sharded path — ``"auto"`` computes the weighted-bound tail length
    from the Chebyshev coefficients of ``(delta, dt)`` via
    :func:`~..ops.fused_cheby_dd.f32_tail_orders`; during tail orders
    the device-bit exchange moves HI planes only (half the ICI bytes).
    ``fast`` selects the dd flip variant (``"lomxu"`` default — the
    measured-fastest round-3 kernel; the sharded step is no longer a
    round-2-era configuration)."""
    from ..ops.cheby import cheby_coeffs
    from ..ops.fused_cheby_dd import (
        cheby_step_fused_dd,
        dd_tile_rows,
        f32_tail_orders,
    )

    n_dev = mesh.devices.size
    p = int(np.log2(n_dev))
    if (1 << p) != n_dev:
        raise ValueError("n_devices must be a power of two")
    gs = np.broadcast_to(np.asarray(g, dtype=np.float64), (L,))
    L_local = L - p
    tr = tile_rows or dd_tile_rows(L_local)
    plan_local = make_flip_plan(L_local, gs[:L_local], tile_rows=tr)
    device_gs = tuple(float(v) for v in gs[L_local:])

    # device bits with zero coupling cost NO exchange (lever i of
    # SCALING.md §2a: weak_site_permutation assigns the weakest |g|
    # sites to device bits; zero-g bits then vanish from the comm plan)
    live = tuple(j for j, gj in enumerate(device_gs) if gj != 0.0)
    live_gs = tuple(device_gs[j] for j in live)

    def extra_nb(state4):
        n = jax.lax.axis_size(axis_name)
        out = []
        for j in live:
            perm = [(i, i ^ (1 << j)) for i in range(n)]
            out.append(tuple(
                jax.lax.ppermute(pl_, axis_name, perm) for pl_ in state4
            ))
        return out

    def extra_nb_hi(re_hi, im_hi):
        # tail orders: HI planes only — half the exchange bytes
        n = jax.lax.axis_size(axis_name)
        out = []
        for j in live:
            perm = [(i, i ^ (1 << j)) for i in range(n)]
            out.append((
                jax.lax.ppermute(re_hi, axis_name, perm),
                jax.lax.ppermute(im_hi, axis_name, perm),
            ))
        return out

    if f32_tail == "auto":
        tail = f32_tail_orders(cheby_coeffs(delta, dt))
    else:
        tail = int(f32_tail)

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
            extra_nb_hi_fn=extra_nb_hi,
            extra_gs=live_gs,
            flip_scale=(fs[0], fs[1]),
            fast=fast,
            f32_tail=tail,
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
        """``flip_scale``: optional ``(hi, lo)`` dd pair scaling the
        flip coefficients — either SCALARS (one time-dependent
        transverse field ``g(t)`` scaling everything) or PER-BIT
        vectors of length ``L`` (multi-amplitude generators: bit ``j``
        carries its own control; the builder selects the shard-local
        bits plus the live device bits).  Both ride the same traced
        SMEM table — control updates never retrace."""
        if flip_scale is None:
            fs = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
        else:
            fh = jnp.asarray(flip_scale[0], jnp.float32)
            fl = jnp.asarray(flip_scale[1], jnp.float32)
            if fh.ndim > 0:
                if fh.shape != (L,):
                    raise ValueError(
                        f"per-bit flip_scale must have shape ({L},), "
                        f"got {fh.shape}"
                    )
                sel = list(range(L_local)) + [L_local + j for j in live]
                fh, fl = fh[jnp.asarray(sel)], fl[jnp.asarray(sel)]
            fs = jnp.stack([fh, fl])
        return sharded(dmb_h, dmb_l, tuple(state4), coeffs_h, coeffs_l, fs)

    # measurable exchange accounting (SCALING.md §2a): bytes per local
    # element per polynomial order, dd orders vs f32-tail orders
    step.exchange_plan = {
        "device_bits": p,
        "live_device_bits": len(live),
        "skipped_zero_coupling_bits": p - len(live),
        "bytes_per_elem_per_order_dd": 16 * len(live),
        "bytes_per_elem_per_order_tail": 8 * len(live),
        "f32_tail_orders": tail,
    }
    return step

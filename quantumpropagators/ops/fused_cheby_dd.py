"""Double-float (df64) fused Pallas Chebyshev kernel: reference-grade
~1e-13 accuracy per step at a large fraction of f32 bandwidth on
f32-only TPUs.

The reference is complex128 end-to-end with 1e-10 kernel tolerances
(``/root/reference/test/test_cheby.jl:8``).  This module runs the
double-float arithmetic *inside* Pallas kernels so the whole polynomial
iteration is VMEM-resident.  Design (v2, round 2):

- **component-split kernels**: one kernel per output component
  (re / im).  Because the Chebyshev scalar is purely imaginary the
  recurrence couples components only through a plane swap
  (``v2_re = -(H'v1)_im + v0_re``), so each kernel reads the *other*
  component of v1 and its own component of v0/Φ.  Halving the planes
  per kernel halves VMEM pressure → larger tiles → fewer cross-tile
  bits.
- **cross-tile flips fused** into the main kernel as extra inputs whose
  BlockSpec ``index_map`` is a grid-index XOR (tile ``i`` reads tile
  ``i ^ 2^j``) — no separate cross kernel, no W round-trip through HBM.
- **scale folding**: the recurrence scalar ``s2 = ∓4/Δ`` is folded into
  the operator once per step (``H' = s2·(H−β)``: the diagonal planes by
  one XLA df64 pass, the flip coefficients exactly in host f64), which
  removes two dd-scalings per element per iteration.
- **reduced-flop dd arithmetic**: products keep unnormalized ``(p, e)``
  pairs feeding two_sum accumulators (Ogita-Rump-Oishi style); static
  scalars are Veltkamp-pre-split (host / SMEM scalar unit) so each
  error-free product costs 13 VPU flops instead of 17; Φ stays
  unnormalized across iterations (its compensation stays ≤ ~2⁻²⁴·Σ|aₖ|,
  so the deferred renormalization — one XLA pass before the final
  phase — is safe) while the recurrence value v2 is renormalized every
  iteration (its compensation feeds back through the recurrence and
  would otherwise grow linearly).

Error-free transformations (Dekker/Knuth two-sum/split/two-product) are
used WITHOUT optimization barriers in compiled Mosaic kernels (Mosaic
performs no algebraic simplification; verified bit-exact on-chip), and
WITH barriers in interpret mode (which lowers through XLA, whose
simplifier would cancel the error terms).

State layout: a df64 complex vector is four f32 planes
``(re_hi, re_lo, im_hi, im_lo)``, each viewed ``(ROWS, 128)``.
"""

from __future__ import annotations

from functools import partial

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

from .fused_cheby import (
    FlipPlan, make_flip_plan, _flip_adjacency, _LANE, _LANE_BITS,
)

__all__ = [
    "cheby_step_fused_dd", "make_flip_plan", "dd_tile_rows",
    "f32_tail_orders",
]

_SPLIT = np.float32(4097.0)  # 2^12 + 1 for f32 Dekker split

# Error-free transformations need protection from compiler rewrites.
# Mosaic (compiled TPU kernels) performs none — barriers are both
# unnecessary and UNSUPPORTED there.  Interpret mode runs the kernel
# body through XLA CPU, which contracts mul+add into FMA even THROUGH
# ``lax.optimization_barrier`` (measured on jax 0.9.0: the barriered
# product still fuses into the consuming add, breaking two_sum's
# exactness under cancellation).  The only reliable barrier there is a
# host round-trip (``pure_callback``) — slow, but interpret mode is a
# test-only path.  Set at trace time (interpret is a static arg, so
# each variant gets its own trace).
_USE_BARRIER = [False]


def _strong_b(x):
    """Host round-trip identity: no compiler can contract through it."""
    return jax.pure_callback(
        lambda v: v,
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        x,
        vmap_method="sequential",
    )


def _b(x):
    if _USE_BARRIER[0]:
        return _strong_b(x)
    return x


def _two_sum(a, b):
    """Error-free: a + b = s + err exactly (6 flops)."""
    s = _b(a + b)
    bb = _b(s - a)
    return s, _b(a - _b(s - bb)) + _b(b - bb)


def _split(a):
    """Dekker split: a = hi + lo, 12-bit mantissas (4 flops)."""
    t = _b(_SPLIT * a)
    hi = _b(t - _b(t - a))
    return hi, _b(a - hi)


def _split_f64(v: float):
    """Host split of a float64 into an f32 (hi, lo) pair."""
    hi = np.float32(v)
    return hi, np.float32(np.float64(v) - np.float64(hi))


def _veltkamp_f64(v: float):
    """Host split of the f32-hi part of ``v`` into two 12-bit halves
    plus the f64 residual: v = h1 + h2 + lo with h1·x, h2·x exact-ish
    products (Dekker)."""
    hi, lo = _split_f64(v)
    t = np.float32(_SPLIT * hi)
    h1 = np.float32(t - np.float32(t - hi))
    h2 = np.float32(hi - h1)
    return h1, h2, lo


def _prod_presplit(x, b1, b2, bh, bl, xl=None):
    """Unnormalized error-free product ``(x + xl)·(bh + bl)`` → (p, e)
    where bh = b1 + b2 is pre-split (b1/b2 scalars or planes).

    p = fl(x·bh); e captures the rounding error plus the lo cross
    terms.  13 VPU flops (+2 if xl given)."""
    p = _b(x * bh)
    h1, h2 = _split(x)
    e = _b(
        _b(_b(_b(h1 * b1) - p) + _b(h1 * b2) + _b(h2 * b1)) + _b(h2 * b2)
    ) + _b(x * bl)
    if xl is not None:
        e = e + _b(xl * bh)
    return p, e


def _roll_flip(t, dist, axis, idx):
    """Exact permutation ``t[i] -> t[i ^ dist]`` along ``axis`` via two
    rolls and a parity select."""
    bit_set = (idx & dist) != 0
    return jnp.where(
        bit_set,
        jnp.roll(t, dist, axis=axis),
        jnp.roll(t, -dist, axis=axis),
    )


def _flip_terms(plan: FlipPlan, th, tl, grouped_rows=False):
    """Yield ``(g_bit_index, f_hi, f_lo)`` for every in-tile bit flip of
    the dd plane ``(th, tl)`` — exact data movement.  Lane bits use
    roll+roll+select; row bits use roll+roll+select, or the grouped
    single roll (:func:`_xor_roll_rows`, 1 movement op per plane per
    bit instead of 3) when ``grouped_rows``."""
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, th.shape, 1)
    for j in range(_LANE_BITS):
        d = 1 << j
        yield j, _roll_flip(th, d, 1, lane_idx), _roll_flip(tl, d, 1, lane_idx)
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, th.shape, 0)
    for j in range(plan.n_row_bits):
        d = 1 << j
        if grouped_rows:
            yield (
                _LANE_BITS + j,
                _xor_roll_rows(th, d),
                _xor_roll_rows(tl, d),
            )
        else:
            yield (
                _LANE_BITS + j,
                _roll_flip(th, d, 0, rows_idx),
                _roll_flip(tl, d, 0, rows_idx),
            )


def _xor_roll_rows(t, d):
    """Exact permutation ``t[i] -> t[i ^ d]`` on the row axis as ONE
    grouped roll: viewing the rows as ``(R/2d, 2d)`` groups, XOR by
    ``d`` is a rotation by ``d`` within each group (for i<d: i+d; for
    i≥d: i−d — exactly the half-swap).  Uses the native Mosaic roll in
    compiled kernels; the jnp fallback in interpret mode."""
    R, LN = t.shape
    t3 = t.reshape(R // (2 * d), 2 * d, LN)
    if _HAS_PLTPU and not _USE_BARRIER[0]:
        rolled = pltpu.roll(t3, d, 1)
    else:
        rolled = jnp.roll(t3, d, axis=1)
    return rolled.reshape(R, LN)


def _h_component_fast(plan, gs_ref, vh, vl, nb, dh, dl, lane_ref):
    """Reduced-flop variant of :func:`_h_component` for UNIFORM flip
    coefficients.  Two-level σ-extraction aligns the hi plane to a
    per-tile fixed-point grid (σ = 64·max|vh|; rolls stay in-tile so
    the tile max covers every summand):

    - q1 values are multiples of ulp(σ)/2 with Σ|q1| ≤ 17·M < σ/2, so
      the 17-term flip sum of q1 is EXACT under plain VPU adds (every
      partial sum is a representable multiple of the grid step); q2
      (the re-extraction of the residual at σ₂ = σ·2⁻¹⁶) likewise —
      this replaces the per-bit 6-flop two_sum cascade with one add;
    - the remaining tiny planes are merged once, ``w = r2 + lo``
      (|r2| ≤ M·2⁻³³; merge rounding ~M·2⁻⁴⁸), and accumulated in
      plain f32: its LANE-bit sum rides one MXU matmul at HIGHEST
      precision (measured ~2⁻²⁴ relative on this chip — on |w| ~
      M·2⁻²⁴ that is M·2⁻⁴⁸, inside budget; the MXU is NOT exact even
      for grid-aligned f32 inputs, measured round 3, so the q planes
      must NOT ride it);
    - row-bit flips use the grouped single-roll (``_xor_roll_rows``,
      measured exact), 1 movement op per plane per bit instead of
      roll+roll+select.

    Cross-tile/remote planes (other tiles, other σ) stay on the exact
    two_sum path.  Net: ~2× fewer VPU ops in the flip accumulation;
    measured per-step error stays ~1e-16 (bench oracle)."""
    p = _b(vh * dh)
    x1, x2 = _split(vh)
    d1, d2 = _split(dh)
    e = _b(
        _b(_b(_b(x1 * d1) - p) + _b(x1 * d2) + _b(x2 * d1)) + _b(x2 * d2)
    ) + _b(vh * dl) + _b(vl * dh)

    m = jnp.max(jnp.abs(vh))
    sigma = _b(np.float32(64.0) * m)
    q1 = _b(_b(sigma + vh) - sigma)
    r1 = _b(vh - q1)
    sigma2 = sigma * np.float32(2.0 ** -16)
    q2 = _b(_b(sigma2 + r1) - sigma2)
    w = _b(_b(r1 - q2) + vl)  # r2 + lo, both ~2^-24·M scale

    f32 = jnp.float32
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, vh.shape, 1)
    S1 = None
    S2 = None
    for j in range(_LANE_BITS):
        d = 1 << j
        f1 = _roll_flip(q1, d, 1, lane_idx)
        f2 = _roll_flip(q2, d, 1, lane_idx)
        S1 = f1 if S1 is None else _b(S1 + f1)  # exact: aligned grid
        S2 = f2 if S2 is None else _b(S2 + f2)  # exact: aligned grid
    # w's 7 lane flips as ONE matmul (HIGHEST ≈ full-f32 emulation)
    Sw = jnp.dot(
        w, lane_ref[:], preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for j in range(plan.n_row_bits):
        d = 1 << j
        S1 = _b(S1 + _xor_roll_rows(q1, d))   # exact: aligned grid
        S2 = _b(S2 + _xor_roll_rows(q2, d))   # exact: aligned grid
        Sw = _b(Sw + _xor_roll_rows(w, d))

    Fh, err = _two_sum(S1, S2)
    Fc = err + Sw
    for _gidx, nh, nl in nb:
        Fh, err = _two_sum(Fh, nh)
        Fc = Fc + err + nl
    g1, g2, gl = _gs_triple(gs_ref, 0)
    gh = g1 + g2  # exact: Veltkamp halves recombine exactly
    q, qe = _prod_presplit(Fh, g1, g2, gh, gl, xl=Fc)
    p, err = _two_sum(p, q)
    e = e + err + qe
    return p, e


def _gs_triple(gs_ref, idx):
    """Read the pre-split flip scalar ``idx`` from the SMEM table:
    ``(g1, g2, gl)`` with ``g1 + g2`` the exact f32 hi part (Veltkamp
    halves) and ``gl`` the f64 residual.  The table is a traced kernel
    input, so time-dependent flip coefficients cost zero retracing."""
    g1 = gs_ref[0, 3 * idx]
    g2 = gs_ref[0, 3 * idx + 1]
    gl = gs_ref[0, 3 * idx + 2]
    return g1, g2, gl


def _variant(fast) -> str:
    """Normalize the ``fast`` argument: "lomxu" (the default — twosum
    with the LO plane's lane flips as one MXU HIGHEST matmul; measured
    fastest at every size), False → "twosum" (pure exact cascade),
    True → "sigma" (σ-extraction + MXU lane path), "rows" → twosum
    with grouped single-roll row flips, "tlane" → lomxu with the HI
    plane's lane flips via transpose + sublane rolls, "xcross" →
    lomxu + the LO plane's CROSS-TILE neighbor sum via one XLA (T×T)
    MXU matmul over the tile axis (replaces the 7 XOR-scattered lo
    neighbor plane reads per component per order with one streamed
    pass — ~15% less HBM traffic at 2^22+; precision-safe because lo
    planes are ≤ 2⁻²⁴ of the value scale, same argument as lomxu)."""
    if fast is True:
        return "sigma"
    if not fast:
        return "twosum"
    return str(fast)


def _h_component(plan, gs_ref, uniform, vh, vl, nb, dh, dl,
                 grouped_rows=False, lane_ref=None, tlane=False, sl=None,
                 mxq=False):
    """Unnormalized ``H'·v`` for ONE component of v: (p, e) with
    H' = dmb' + Σ_j G_j·flip_j, dmb' = (dh, dl) planes, ``gs_ref`` the
    SMEM table of pre-split (folded) flip scalars, ``nb`` a list of
    ``(gs_index, hi, lo)`` flip contributions supplied as whole planes
    (cross-tile neighbors and, in the sharded step, remote-shard
    planes from ``ppermute``)."""
    # diagonal product (dd planes; split of dh in-kernel, shared-free)
    p = _b(vh * dh)
    x1, x2 = _split(vh)
    d1, d2 = _split(dh)
    e = _b(
        _b(_b(_b(x1 * d1) - p) + _b(x1 * d2) + _b(x2 * d1)) + _b(x2 * d2)
    ) + _b(vh * dl) + _b(vl * dh)

    if uniform and lane_ref is not None and mxq:
        # "mxq" (round 4): the MXU at HIGHEST is BIT-EXACT for inputs
        # on ≤16-bit mantissa grids (measured, probe_mxu_grid_r4 —
        # round 3 had only tested the full 24-bit case).  So the HI
        # plane's lane-flip sum — the kernel's single largest VPU cost
        # (7 lane-roll pairs ≈ 150 op-equivalents at the measured ~10×
        # roll weight) — rides THREE matmuls via a two-level 14-bit
        # σ-extraction:
        #   vh = q1 + q2 + r2   (each split exact; Dekker/Rump
        #                        round-to-grid via (x+C)−C)
        #   S1 = q1·A, S2 = q2·A   — EXACT (≤16-bit grids, ≤2^17
        #                            aligned partial sums)
        #   Sw = (r2 + vl)·A       — HIGHEST error ≈ 5.6e-8·2⁻²⁴·M
        #                            = 2⁻⁴⁸·M, inside budget (the
        #                            same bound lomxu's lo matmul
        #                            already carries)
        m = jnp.max(jnp.abs(vh))
        C1 = _b(np.float32(2.0 ** 9) * m)    # grid ≈ m·2^-14
        q1 = _b(_b(vh + C1) - C1)
        r1 = _b(vh - q1)                      # exact
        C2 = _b(np.float32(2.0 ** -5) * m)   # grid ≈ m·2^-28
        q2 = _b(_b(r1 + C2) - C2)
        w = _b(r1 - q2) + vl                  # r2 + lo (~2^-24·M)

        def lane_dot(t):
            return jnp.dot(
                t, lane_ref[:], preferred_element_type=t.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        Fh, err = _two_sum(lane_dot(q1), lane_dot(q2))
        Fc = err + lane_dot(w)
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, vh.shape, 0)
        for j in range(plan.n_row_bits):
            d = 1 << j
            Fh, err = _two_sum(Fh, _roll_flip(vh, d, 0, rows_idx))
            Fc = Fc + err + _roll_flip(vl, d, 0, rows_idx)
        for _, nh, nl in nb:
            Fh, err = _two_sum(Fh, nh)
            Fc = Fc + err
            if nl is not None:
                Fc = Fc + nl
        if sl is not None:
            Fc = Fc + sl
        g1_, g2_, gl_ = _gs_triple(gs_ref, 0)
        gh_ = g1_ + g2_
        q, qe = _prod_presplit(Fh, g1_, g2_, gh_, gl_, xl=Fc)
        p, err = _two_sum(p, q)
        e = e + err + qe
        return p, e
    if uniform and lane_ref is not None:
        # "lomxu": the LO plane's 7 lane flips ride ONE MXU matmul at
        # HIGHEST (error ≤ ~5.6e-8·|vl| ≈ 3e-15·M — inside the dd
        # budget); the hi plane stays on the exact two_sum path.
        # "tlane" additionally moves the HI plane's lane flips to the
        # sublane axis via an exact transpose (lane-axis rolls are
        # ~10× a VPU op on this chip — measured: removing the lo
        # plane's lane rolls alone bought +38%), accumulating in
        # transposed space and transposing the (sum, compensation)
        # pair back — transposes are pure data movement, so the
        # two_sum cascade stays error-free.
        # "xcross": neighbor entries in ``nb`` carry nl=None (their lo
        # cross-sum arrives pre-combined in ``sl``, one plane).
        if tlane:
            vh_t = vh.T
            idx_t = jax.lax.broadcasted_iota(jnp.int32, vh_t.shape, 0)
            Fh_t = Fc_t = None
            for j in range(_LANE_BITS):
                d = 1 << j
                f = _roll_flip(vh_t, d, 0, idx_t)
                if Fh_t is None:
                    Fh_t, Fc_t = f, jnp.zeros_like(f)
                else:
                    Fh_t, err = _two_sum(Fh_t, f)
                    Fc_t = Fc_t + err
            Fh, Fc = Fh_t.T, Fc_t.T
        else:
            lane_idx = jax.lax.broadcasted_iota(jnp.int32, vh.shape, 1)
            Fh = Fc = None
            for j in range(_LANE_BITS):
                d = 1 << j
                fh = _roll_flip(vh, d, 1, lane_idx)
                if Fh is None:
                    Fh, Fc = fh, jnp.zeros_like(fh)
                else:
                    Fh, err = _two_sum(Fh, fh)
                    Fc = Fc + err
        Fc = Fc + jnp.dot(
            vl, lane_ref[:], preferred_element_type=vl.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, vh.shape, 0)
        for j in range(plan.n_row_bits):
            d = 1 << j
            Fh, err = _two_sum(Fh, _roll_flip(vh, d, 0, rows_idx))
            Fc = Fc + err + _roll_flip(vl, d, 0, rows_idx)
        for _, nh, nl in nb:
            Fh, err = _two_sum(Fh, nh)
            Fc = Fc + err
            if nl is not None:
                Fc = Fc + nl
        if sl is not None:
            Fc = Fc + sl  # pre-combined lo cross-sum (xcross)
        g1, g2, gl = _gs_triple(gs_ref, 0)
        gh = g1 + g2
        q, qe = _prod_presplit(Fh, g1, g2, gh, gl, xl=Fc)
        p, err = _two_sum(p, q)
        e = e + err + qe
        return p, e
    if uniform:
        # raw compensated flip sum, then ONE pre-split scale
        Fh = Fc = None
        for _, fh, fl_ in _flip_terms(plan, vh, vl, grouped_rows):
            if Fh is None:
                Fh, Fc = fh, fl_
            else:
                Fh, err = _two_sum(Fh, fh)
                Fc = Fc + err + fl_
        for _, nh, nl in nb:
            if Fh is None:
                Fh, Fc = nh, nl
            else:
                Fh, err = _two_sum(Fh, nh)
                Fc = Fc + err + nl
        if Fh is not None:
            g1, g2, gl = _gs_triple(gs_ref, 0)
            gh = g1 + g2  # exact: Veltkamp halves recombine exactly
            q, qe = _prod_presplit(Fh, g1, g2, gh, gl, xl=Fc)
            p, err = _two_sum(p, q)
            e = e + err + qe
    else:
        # per-bit pre-split scaling; in-tile bit index == gs index,
        # plane contributions carry their gs index explicitly
        for idx, fh, fl_ in _flip_terms(plan, vh, vl, grouped_rows):
            g1, g2, gl = _gs_triple(gs_ref, idx)
            gh = g1 + g2
            q, qe = _prod_presplit(fh, g1, g2, gh, gl, xl=fl_)
            p, err = _two_sum(p, q)
            e = e + err + qe
        for gidx, nh, nl in nb:
            g1, g2, gl = _gs_triple(gs_ref, gidx)
            gh = g1 + g2
            q, qe = _prod_presplit(nh, g1, g2, gh, gl, xl=nl)
            p, err = _two_sum(p, q)
            e = e + err + qe
    return p, e


def _iter_component_kernel(plan, uniform, variant, n_cross, n_remote,
                           sign, a_ref, gs_ref, *refs):
    """One fused dd Chebyshev iteration, ONE output component X:
    ``v2_X = sign·(H'v1)_Y + v0_X``;  ``Φ_X += a_k·v2_X``.

    refs: v1y(2), nb(2·n_cross — or n_cross hi planes + 1 combined lo
    cross-sum plane for "xcross"), remote(2·n_remote), dmb(2), v0x(2),
    phix(2) inputs, then outputs v2x(2), phix(2).  ``a_ref`` holds
    (a_hi, a_lo) in SMEM; ``gs_ref`` the pre-split flip-scalar table."""
    in_tile = plan.L - plan.n_cross
    k = 0
    lane_ref = None
    if variant in ("sigma", "lomxu", "tlane", "xcross", "mxq"):
        lane_ref = refs[k]; k += 1
    vh, vl = refs[k][:], refs[k + 1][:]; k += 2
    nb = []
    sl = None
    if variant == "xcross":
        for j in range(n_cross):
            nb.append((in_tile + j, refs[k][:], None)); k += 1
        if n_cross:
            sl = refs[k][:]; k += 1
    else:
        for j in range(n_cross):
            nb.append((in_tile + j, refs[k][:], refs[k + 1][:])); k += 2
    for j in range(n_remote):
        nb.append((plan.L + j, refs[k][:], refs[k + 1][:])); k += 2
    dh, dl = refs[k][:], refs[k + 1][:]; k += 2
    v0h, v0l = refs[k][:], refs[k + 1][:]; k += 2
    phh, phl = refs[k][:], refs[k + 1][:]; k += 2
    o_v2h, o_v2l, o_phh, o_phl = refs[k:]

    if variant == "sigma":
        p, e = _h_component_fast(plan, gs_ref, vh, vl, nb, dh, dl, lane_ref)
    else:
        p, e = _h_component(plan, gs_ref, uniform, vh, vl, nb, dh, dl,
                            grouped_rows=(variant == "rows"),
                            lane_ref=lane_ref,
                            tlane=(variant == "tlane"), sl=sl,
                            mxq=(variant == "mxq"))
    if sign < 0:
        p, e = -p, -e
    v2h, err = _two_sum(p, v0h)
    v2l = e + v0l + err
    v2h, v2l = _two_sum(v2h, v2l)  # renormalize: feeds the recurrence

    # Φ += a_k·v2 (a_k dd scalar from SMEM; split on the scalar unit)
    ah = a_ref[0, 0]
    al = a_ref[0, 1]
    t = _b(_SPLIT * ah)
    a1 = _b(t - _b(t - ah))
    a2 = _b(ah - a1)
    q, qe = _prod_presplit(v2h, a1, a2, ah, al, xl=v2l)
    nphh, err = _two_sum(phh, q)
    nphl = phl + qe + err  # Φ unnormalized across iterations (see doc)

    o_v2h[:] = v2h
    o_v2l[:] = v2l
    o_phh[:] = nphh
    o_phl[:] = nphl


def _first_component_kernel(plan, uniform, variant, n_cross, n_remote,
                            sign, a_ref, gs_ref, *refs):
    """Setup, ONE component X: ``v1_X = sign·0.5·(H'v0)_Y``;
    ``Φ_X = a0·v0_X + a1·v1_X``.  refs: v0y(2), nb(2·n_cross — or
    n_cross hi planes + 1 lo cross-sum plane for "xcross"),
    remote(2·n_remote), dmb(2), v0x(2) inputs → outputs v1x(2),
    phix(2)."""
    in_tile = plan.L - plan.n_cross
    k = 0
    lane_ref = None
    if variant in ("sigma", "lomxu", "tlane", "xcross", "mxq"):
        lane_ref = refs[k]; k += 1
    vh, vl = refs[k][:], refs[k + 1][:]; k += 2
    nb = []
    sl = None
    if variant == "xcross":
        for j in range(n_cross):
            nb.append((in_tile + j, refs[k][:], None)); k += 1
        if n_cross:
            sl = refs[k][:]; k += 1
    else:
        for j in range(n_cross):
            nb.append((in_tile + j, refs[k][:], refs[k + 1][:])); k += 2
    for j in range(n_remote):
        nb.append((plan.L + j, refs[k][:], refs[k + 1][:])); k += 2
    dh, dl = refs[k][:], refs[k + 1][:]; k += 2
    v0h, v0l = refs[k][:], refs[k + 1][:]; k += 2
    o_v1h, o_v1l, o_phh, o_phl = refs[k:]

    if variant == "sigma":
        p, e = _h_component_fast(plan, gs_ref, vh, vl, nb, dh, dl, lane_ref)
    else:
        p, e = _h_component(plan, gs_ref, uniform, vh, vl, nb, dh, dl,
                            grouped_rows=(variant == "rows"),
                            lane_ref=lane_ref,
                            tlane=(variant == "tlane"), sl=sl,
                            mxq=(variant == "mxq"))
    half = np.float32(0.5 * sign)
    v1h, v1l = _two_sum(_b(half * p), _b(half * e))  # exact halving + renorm

    a0h, a0l, a1h_, a1l_ = a_ref[0, 0], a_ref[0, 1], a_ref[0, 2], a_ref[0, 3]

    def smem_split(x):
        t = _b(_SPLIT * x)
        s1 = _b(t - _b(t - x))
        return s1, _b(x - s1)

    s1, s2_ = smem_split(a0h)
    q0, q0e = _prod_presplit(v0h, s1, s2_, a0h, a0l, xl=v0l)
    s1, s2_ = smem_split(a1h_)
    q1, q1e = _prod_presplit(v1h, s1, s2_, a1h_, a1l_, xl=v1l)
    phh, err = _two_sum(q0, q1)
    phl = q0e + q1e + err

    o_v1h[:] = v1h
    o_v1l[:] = v1l
    o_phh[:] = phh
    o_phl[:] = phl


def _tail_component_kernel(plan, n_cross, n_remote, sign, perbit,
                           sc_ref, gs_ref, *refs):
    """Pure-f32 Chebyshev iteration, ONE output component X (the
    mixed-precision TAIL: orders whose remaining recurrence-weighted
    Φ contribution is small enough that f32 rounding stays under the
    per-step budget — see :func:`f32_tail_orders`).  ~10× fewer VPU ops
    and half the plane traffic of the dd iteration.

    ``v2_X = sign·(H'v1)_Y + v0_X``;  ``Φtail_X += a_k·v2_X`` with
    H' = s2·(H−β) pre-folded exactly like the dd kernels (same dmb2/G
    scalars, hi parts only).  refs: lane(1), v1y(1), nb(n_cross),
    remote(n_remote — sharded device-bit planes, HI ONLY: the dropped
    remote compensation is ≤ 2⁻²⁴ relative, inside the tail's own
    eps32 budget and HALF the ICI bytes of the dd exchange), dmb(1),
    v0x(1), phtx(1) inputs → outputs v2x(1), phtx(1).

    ``perbit`` (multi-amplitude generators, VERDICT r4 item 5): each
    flip bit carries its own coefficient.  The 7 lane bits then ride a
    WEIGHTED adjacency matmul (``lane_ref`` holds Σⱼ Gⱼ·flipⱼ built
    per step outside the kernel — a traced input, zero retracing);
    row/cross/remote bits read their hi coefficient ``g1+g2`` from the
    SMEM table per bit.  All per-bit products are plain f32 — the tail
    budget (~eps32 relative) absorbs them by construction."""
    lane_ref = refs[0]
    vh = refs[1][:]
    nb = [refs[2 + j][:] for j in range(n_cross + n_remote)]
    k = 2 + n_cross + n_remote
    dh = refs[k][:]
    v0h = refs[k + 1][:]
    pht = refs[k + 2][:]
    o_v2, o_pht = refs[k + 3:]

    ak = sc_ref[0, 0]

    # lane flips: ONE MXU matmul with the 7-bit adjacency (0/1 when
    # uniform, per-bit-weighted when perbit).  HIGHEST = full-f32
    # emulation (~2⁻²⁴ relative, measured): the tail's own budget is
    # ~3e-7 relative so this is comfortably inside it; default
    # precision may lower to one-pass bf16 on some toolchains, which
    # would blow the budget.
    S = jnp.dot(vh, lane_ref[:], preferred_element_type=vh.dtype,
                precision=jax.lax.Precision.HIGHEST)
    in_tile = plan.L - plan.n_cross
    if perbit:
        def ghi(idx):
            return gs_ref[0, 3 * idx] + gs_ref[0, 3 * idx + 1]

        for j in range(plan.n_row_bits):
            S = S + ghi(_LANE_BITS + j) * _xor_roll_rows(vh, 1 << j)
        for j, nbp in enumerate(nb):
            gidx = in_tile + j if j < n_cross else plan.L + (j - n_cross)
            S = S + ghi(gidx) * nbp
        u = vh * dh + S
    else:
        G = gs_ref[0, 0] + gs_ref[0, 1]  # Veltkamp halves recombine
        for j in range(plan.n_row_bits):
            S = S + _xor_roll_rows(vh, 1 << j)
        for nbp in nb:
            S = S + nbp
        u = vh * dh + G * S
    v2 = np.float32(sign) * u + v0h
    o_v2[:] = v2
    o_pht[:] = pht + ak * v2


def f32_tail_orders(coeffs, per_step_budget: float = 3e-14,
                    eps32: float = 3e-7) -> int:
    """Number of TAIL polynomial orders safe to run in pure f32.

    The f32 iteration perturbs ``v_k`` by ~``eps32`` relative per
    order.  A perturbation injected at order ``k`` propagates through
    the three-term recurrence with second-kind-Chebyshev sensitivity —
    it reaches order ``j ≥ k`` with norm up to ``U_{j-k} ≤ j-k+1`` —
    so its Φ weight is ``W(k) = Σ_{j≥k}|a_j|·(j-k+1)``, NOT the plain
    tail sum.  The tail as a whole therefore contributes up to
    ``eps32·(W(k0) + Σ_{k≥k0} W(k))``: one ``W(k0)`` for the one-time
    f32 merge of the carry planes at the entry order ``k0``, plus one
    ``W(k)`` per f32 iteration.  Returns the largest ``m = n - k0``
    such that that bound stays under ``per_step_budget`` — the dd
    kernels handle orders below ``k0``, the f32 tail kernel the rest.
    (The Bessel tail decays superexponentially, so the quadratic
    weights move ``k0`` by at most an order or two vs the plain sum.)
    Mirrors the truncation logic of the reference's coefficient loop
    (``src/cheby.jl:22-48``) one precision tier down."""
    a = np.abs(np.asarray(coeffs, dtype=np.float64))
    n = len(a)
    j = np.arange(n, dtype=np.float64)

    def bound(k0: int) -> float:
        # W(k) = Σ_{j≥k} |a_j|·(j-k+1);  Σ_{k0≤k} W(k) telescopes to
        # Σ_{j≥k0} |a_j|·(j-k0+1)(j-k0+2)/2.  Merge term adds W(k0).
        d = j[k0:] - k0 + 1.0
        aj = a[k0:]
        return float((aj * (d + d * (d + 1.0) / 2.0)).sum())

    k0 = n
    while k0 > 2 and bound(k0 - 1) * eps32 < per_step_budget:
        k0 -= 1
    return n - k0


# ---- host-side driver ----------------------------------------------


def _vec_spec(tile_rows):
    kw = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
    return pl.BlockSpec((tile_rows, _LANE), lambda i: (i, 0), **kw)


def _neighbor_spec(tile_rows, j):
    kw = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
    return pl.BlockSpec(
        (tile_rows, _LANE), lambda i, _j=j: (i ^ (1 << _j), 0), **kw
    )


def _smem_spec(width):
    kw = {"memory_space": pltpu.SMEM} if _HAS_PLTPU else {}
    return pl.BlockSpec((1, width), lambda i: (0, 0), **kw)


def dd_tile_rows(L: int, budget_bytes: int = 100 * 2 ** 20) -> int:
    """Largest power-of-two tile_rows (≤ 4096) whose component-kernel
    working set — ``(12 + 2·n_cross + 4)`` blocks, × 2 for Mosaic's
    input/output double buffering — fits ``budget_bytes`` of scoped
    VMEM.  The v5e exposes ~128 MB of VMEM (measured round 3, VMEM
    probe in docs/benchmarks.md), so large tiles with few cross bits
    are the right trade: fewer neighbor-plane reads per iteration."""
    rows = 1 << (L - _LANE_BITS)
    tr = min(1024, rows)  # measured optimum (101 Gnnz/s at 2^20); the
    # fast path's scratch planes make bigger tiles VMEM-marginal
    while tr > 8:
        n_cross = max(0, L - _LANE_BITS - int(np.log2(tr)))
        blocks = 16 + 2 * n_cross
        if (2 * blocks + 12) * tr * _LANE * 4 <= budget_bytes:
            return tr
        tr //= 2
    return tr


def _x64_available() -> bool:
    return bool(jax.config.jax_enable_x64)


def _dd_resplit_f64(x64):
    hi = x64.astype(jnp.float32)
    return hi, (x64 - hi.astype(jnp.float64)).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=(
        "plan", "delta", "e_min", "dt", "forward", "interpret",
        "extra_nb_fn", "extra_nb_hi_fn", "extra_gs", "fast", "f32_tail",
    ),
)
def cheby_step_fused_dd(
    plan: FlipPlan,
    dmb_h,
    dmb_l,
    state,
    coeffs_h,
    coeffs_l,
    delta,
    e_min,
    dt,
    *,
    forward: bool = True,
    interpret: bool = False,
    extra_nb_fn=None,
    extra_nb_hi_fn=None,
    extra_gs: tuple = (),
    flip_scale=None,
    fast="lomxu",
    f32_tail: int = 0,
):
    """One dd Chebyshev step ``exp(-i H dt)``,
    ``H = diag + Σ g_j X_j``, on a df64 state.

    ``state`` is ``(re_hi, re_lo, im_hi, im_lo)`` f32 arrays;
    ``dmb_h/dmb_l`` the dd planes of ``diag − β`` (β = Δ/2 + E_min);
    ``coeffs_h/coeffs_l`` the dd-split f64 Chebyshev coefficients.
    Accuracy ~1e-13 per step (vs the reference's complex128 1e-10
    tolerance, ``/root/reference/test/test_cheby.jl:8``).  Cost: two
    component-split VMEM passes per polynomial order, cross-tile flips
    read in-place via XOR index maps.

    ``extra_nb_fn(state4) -> list[(rh, rl, ih, il)]`` (static) injects
    additional bit-flip contributions computed OUTSIDE the kernel — one
    4-plane tuple per extra bit, with flip coefficients ``extra_gs``
    (host floats).  The sharded variant uses this for device-index-bit
    flips delivered by ``ppermute``
    (:mod:`..parallel.sharded_fused`).

    ``extra_nb_hi_fn(re_hi, im_hi) -> list[(re_r, im_r)]`` (static) is
    the HI-ONLY companion hook used by the mixed-precision f32 tail:
    during tail orders only the hi planes are exchanged (half the ICI
    bytes; the dropped remote compensation is ≤ 2⁻²⁴ relative — inside
    the tail's own eps32 budget).  If ``extra_nb_fn`` is given without
    it, the tail is disabled (``f32_tail`` forced to 0) so sharded
    accuracy never silently degrades.

    ``flip_scale`` (traced, optional): a ``(hi, lo)`` dd pair of f32
    scalars multiplying ALL flip coefficients — the time-dependent
    transverse-field amplitude ``g(t)`` of the reference's OC inner
    loop (``src/cheby_propagator.jl:243-299``: coefficients change per
    step, the operator structure does not).  The pre-split scalar table
    the kernels read is a traced SMEM input, so per-interval control
    updates cost zero retracing.  Accuracy is preserved: the fold
    ``G_j = s2·g_j·g(t)`` is computed in df64 and Veltkamp-split with
    barriered exact ops."""
    _USE_BARRIER[0] = bool(interpret)  # see note above _b
    rh, rl, ih, il = state
    shape = rh.shape
    n = rh.size
    rows = n // _LANE
    n_tiles = rows // plan.tile_rows
    beta = float(delta) / 2.0 + float(e_min)
    sign = -1.0 if forward else 1.0
    s2 = 2.0 * sign * 2.0 / float(delta)
    # flip_scale may be a PER-BIT dd vector pair (multi-amplitude
    # generators: bit j's coefficient is an independent control — the
    # reference's Ĥ₀ + Σₗ aₗ(t)Ĥₗ, src/generators.jl:44-61).  A vector
    # scale makes the effective coefficients non-uniform at trace time,
    # so the per-bit gs-table path is used (shape is static, so this
    # costs no retracing across control updates).
    fs_vec = flip_scale is not None and np.ndim(flip_scale[0]) > 0
    uniform = (
        len(set(plan.gs) | set(float(g) for g in extra_gs)) == 1
        and not fs_vec
    )
    n_cross = plan.n_cross
    n_remote = len(extra_gs)
    variant = _variant(fast)
    if variant in ("sigma", "lomxu", "tlane", "xcross", "mxq") \
            and not uniform:
        # σ-extraction / lo-MXU lane paths: uniform coefficients only
        variant = "twosum"
    fast = variant in ("sigma", "lomxu", "tlane", "xcross", "mxq")
    xcross = variant == "xcross"
    # mixed-precision tail (see f32_tail_orders).  Non-uniform flip
    # coefficients (multi-amplitude generators / non-uniform couplings)
    # run the per-bit tail: weighted lane adjacency + SMEM per-bit
    # scalars (r4 item 5 — the uniform-only gate is gone).  Sharded
    # remote bits ride the tail via ``extra_nb_hi_fn(re, im) ->
    # [(re_r, im_r), ...]`` — a HI-only ppermute (half the ICI bytes
    # of the dd exchange; the dropped remote lo planes are ≤ 2⁻²⁴
    # relative, inside the tail budget).
    f32_tail = int(f32_tail)
    if extra_nb_fn is not None and extra_nb_hi_fn is None:
        f32_tail = 0
    tail_perbit = not uniform
    n_orders = int(coeffs_h.shape[0])
    f32_tail = max(0, min(f32_tail, n_orders - 3))

    # fold s2 into the operator: dmb' = s2·dmb (one pass per step),
    # G_j = s2·g_j exactly in host f64 (both static).  Under x64 (CPU
    # tests) the fold is exact f64; on f32-only TPUs it is one XLA df64
    # pass (optimization_barrier suffices on the TPU backend — verified
    # by validate_df64() on-chip; XLA *CPU* contracts through barriers,
    # hence the x64 branch).
    if _x64_available():
        d64 = dmb_h.astype(jnp.float64) + dmb_l.astype(jnp.float64)
        dmb2_h, dmb2_l = _dd_resplit_f64(d64 * np.float64(s2))
    else:
        from .df64 import DD, dd_scale

        s2h, s2l = _split_f64(s2)
        out = dd_scale(
            DD(dmb_h, dmb_l), DD(jnp.float32(s2h), jnp.float32(s2l))
        )
        dmb2_h, dmb2_l = out.hi, out.lo
    base = np.asarray(
        [s2 * float(g) for g in plan.gs]
        + [s2 * float(g) for g in extra_gs],
        dtype=np.float64,
    )
    if flip_scale is None:
        gs_flat = jnp.asarray(
            np.concatenate([_veltkamp_f64(v) for v in base]),
            dtype=jnp.float32,
        ).reshape(1, -1)
    else:
        fs_h, fs_l = (jnp.asarray(v, jnp.float32) for v in flip_scale)
        if fs_vec and fs_h.shape != (len(base),):
            raise ValueError(
                f"per-bit flip_scale must have shape ({len(base)},) = "
                f"(local bits + extra bits), got {fs_h.shape}"
            )
        if _x64_available():
            g64 = jnp.asarray(base) * (
                fs_h.astype(jnp.float64) + fs_l.astype(jnp.float64)
            )
            ghi = g64.astype(jnp.float32)
            glo = (g64 - ghi.astype(jnp.float64)).astype(jnp.float32)
        else:
            from .df64 import DD, dd_scale as _dd_scale

            bh = jnp.asarray(base.astype(np.float32))
            bl = jnp.asarray(
                (base - base.astype(np.float32).astype(np.float64)).astype(
                    np.float32
                )
            )
            g = _dd_scale(DD(bh, bl), DD(fs_h, fs_l))
            ghi, glo = g.hi, g.lo
        # Veltkamp halves of the hi part with barriered exact ops (the
        # XLA path; Mosaic reads the finished table from SMEM)
        from .df64 import _split as _xla_split

        g1, g2 = _xla_split(ghi)
        gs_flat = jnp.stack([g1, g2, glo], axis=1).reshape(1, -1)

    vec = _vec_spec(plan.tile_rows)
    if fast or f32_tail:
        from .fused_cheby import _flip_adjacency

        lane01 = jnp.asarray(
            _flip_adjacency(np.arange(_LANE_BITS), np.ones(_LANE_BITS)),
            dtype=jnp.float32,
        )
        lane_kw = {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}
        lane_spec = pl.BlockSpec((_LANE, _LANE), lambda i: (0, 0), **lane_kw)
    tail_lane = lane01 if f32_tail else None
    if f32_tail and tail_perbit:
        # per-bit tail: the 7 lane bits ride a WEIGHTED adjacency
        # Σⱼ Gⱼ·flipⱼ built once per step (traced — control updates
        # never retrace); hi parts only, inside the tail eps32 budget
        masks = np.stack([
            _flip_adjacency(np.arange(_LANE_BITS),
                            np.eye(_LANE_BITS)[j])
            for j in range(_LANE_BITS)
        ])
        if flip_scale is None:
            tail_lane = jnp.asarray(
                np.tensordot(base[:_LANE_BITS].astype(np.float32),
                             masks, axes=(0, 0)),
                dtype=jnp.float32,
            )
        else:
            tail_lane = jnp.tensordot(
                ghi[:_LANE_BITS], jnp.asarray(masks, jnp.float32),
                axes=(0, 0),
            )
    out4 = [jax.ShapeDtypeStruct((rows, _LANE), rh.dtype)] * 4
    # raise the scoped-VMEM cap when big tiles need it (fewer cross
    # bits ↔ bigger tiles is a net win; measured 76 → 101 Gnnz/s at
    # 2^20 going from tile 512 to 1024)
    nb_blocks = (n_cross + min(n_cross, 1)) if xcross else 2 * n_cross
    blocks = 12 + nb_blocks + 2 * n_remote + 4
    # ×2: Mosaic double-buffers grid-varying blocks; +12 tiles for the
    # fast path's scratch planes (q1/q2/r2/S1/S2/Sr + rolled temps);
    # +8 MB headroom.  The chip exposes ~128 MB VMEM (measured; see
    # docs/benchmarks.md)
    vmem_need = (2 * blocks + 12) * plan.tile_rows * _LANE * 4 + (8 << 20)
    cparams = (
        pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=min(max(vmem_need, 16 * 2 ** 20), 128 << 20),
        )
        if _HAS_PLTPU and not interpret
        else None
    )
    ckw = {"compiler_params": cparams} if cparams else {}

    dmb_planes = (dmb2_h.reshape(-1, _LANE), dmb2_l.reshape(-1, _LANE))

    if xcross and n_cross:
        # xcross: the lo-plane cross-tile neighbor sum rides ONE XLA
        # (T, T) MXU matmul over the tile axis — the 0/1 adjacency of
        # the n_cross bits, at HIGHEST (≈ 2⁻²⁴ relative; on lo planes
        # of scale ≤ 2⁻²⁴·M that is ≤ 2⁻⁴⁸·M, inside the dd budget —
        # the same exactness argument as lomxu's lane matmul).
        cross01 = jnp.asarray(
            _flip_adjacency(
                np.arange(n_cross), np.ones(n_cross)
            ),
            dtype=jnp.float32,
        )

        def cross_sum(plane):
            # leading-axis split/merge only — NO lane relayout (a
            # (rows, 128) → (T, tr·128) flatten would physically
            # re-tile the array, costing two full HBM passes)
            v3 = plane.reshape(n_tiles, plan.tile_rows, _LANE)
            return jnp.tensordot(
                cross01, v3, axes=(1, 0),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(rows, _LANE)

    def comp_specs():
        specs = [lane_spec] if fast else []
        specs += [vec, vec]
        if xcross:
            for j in range(n_cross):
                specs += [_neighbor_spec(plan.tile_rows, j)]  # hi only
            if n_cross:
                specs += [vec]  # combined lo cross-sum plane
        else:
            for j in range(n_cross):
                # cross bit j is row bit (n_row_bits + j) → tile bit j
                specs += [_neighbor_spec(plan.tile_rows, j)] * 2
        specs += [vec] * (2 * n_remote)  # remote planes, own tiling
        specs += [vec] * 6  # dmb(2), v0x(2), phix(2)
        return specs

    def run_iter_component(sgn, a_k2, v1y, remote_y, v0x, phix):
        """v1y/v0x/phix: (hi, lo) plane pairs; remote_y: list of (hi,
        lo) pairs of the Y component from the extra-bit hook."""
        args = [lane01] if fast else []
        args += list(v1y)
        if xcross:
            args += [v1y[0]] * n_cross  # hi plane, neighbor-indexed
            if n_cross:
                args += [cross_sum(v1y[1])]
        else:
            for _ in range(n_cross):
                args += list(v1y)  # same planes, neighbor-indexed specs
        for pair in remote_y:
            args += list(pair)
        args += list(dmb_planes) + list(v0x) + list(phix)
        n_in = 2 + len(args)
        phi_base = n_in - 2
        v0_base = n_in - 4
        aliases = {v0_base: 0, v0_base + 1: 1,
                   phi_base: 2, phi_base + 1: 3}
        kern = partial(
            _iter_component_kernel, plan, uniform, variant,
            n_cross, n_remote, sgn,
        )
        return pl.pallas_call(
            lambda a_ref, gs_ref, *r: kern(a_ref, gs_ref, *r),
            grid=(n_tiles,),
            in_specs=[_smem_spec(2), _smem_spec(gs_flat.shape[1])]
            + comp_specs(),
            out_specs=[vec] * 4,
            out_shape=out4,
            input_output_aliases=aliases,
            interpret=interpret,
            **ckw,
        )(a_k2, gs_flat, *args)

    def run_first_component(sgn, a01, v0y, remote_y, v0x):
        args = [lane01] if fast else []
        args += list(v0y)
        if xcross:
            args += [v0y[0]] * n_cross
            if n_cross:
                args += [cross_sum(v0y[1])]
        else:
            for _ in range(n_cross):
                args += list(v0y)
        for pair in remote_y:
            args += list(pair)
        args += list(dmb_planes) + list(v0x)
        specs = [lane_spec] if fast else []
        specs += [vec, vec]
        if xcross:
            specs += [_neighbor_spec(plan.tile_rows, j)
                      for j in range(n_cross)]
            if n_cross:
                specs += [vec]
        else:
            for j in range(n_cross):
                specs += [_neighbor_spec(plan.tile_rows, j)] * 2
        specs += [vec] * (2 * n_remote)
        specs += [vec] * 4
        kern = partial(
            _first_component_kernel, plan, uniform, variant,
            n_cross, n_remote, sgn,
        )
        return pl.pallas_call(
            lambda a_ref, gs_ref, *r: kern(a_ref, gs_ref, *r),
            grid=(n_tiles,),
            in_specs=[_smem_spec(4), _smem_spec(gs_flat.shape[1])] + specs,
            out_specs=[vec] * 4,
            out_shape=out4,
            interpret=interpret,
            **ckw,
        )(a01, gs_flat, *args)

    def planes2(h, l):
        return (h.reshape(-1, _LANE), l.reshape(-1, _LANE))

    def remote_pairs(v4_flat):
        """Call the extra-bit hook on flat (N,)-shaped planes and split
        the result into per-component (hi, lo) plane-pair lists."""
        if extra_nb_fn is None:
            return [], []
        ext = extra_nb_fn(tuple(p.reshape(shape) for p in v4_flat))
        re_pairs = [planes2(t[0], t[1]) for t in ext]
        im_pairs = [planes2(t[2], t[3]) for t in ext]
        return re_pairs, im_pairs

    v0_re = planes2(rh, rl)
    v0_im = planes2(ih, il)

    a01 = jnp.stack(
        [coeffs_h[0], coeffs_l[0], coeffs_h[1], coeffs_l[1]]
    ).reshape(1, 4)
    rem_re, rem_im = remote_pairs(v0_re + v0_im)
    # v1_re = -0.5·(H'v0)_im ; v1_im = +0.5·(H'v0)_re
    r1 = run_first_component(-1.0, a01, v0_im, rem_im, v0_re)
    v1_re, phi_re = (r1[0], r1[1]), (r1[2], r1[3])
    r1 = run_first_component(+1.0, a01, v0_re, rem_re, v0_im)
    v1_im, phi_im = (r1[0], r1[1]), (r1[2], r1[3])

    def body(carry, a_pair):
        v0_re, v0_im, v1_re, v1_im, phi_re, phi_im = carry
        a_k2 = jnp.stack(a_pair).reshape(1, 2)
        rem_re, rem_im = remote_pairs(v1_re + v1_im)
        o = run_iter_component(-1.0, a_k2, v1_im, rem_im, v0_re, phi_re)
        v2_re, phi_re = (o[0], o[1]), (o[2], o[3])
        o = run_iter_component(+1.0, a_k2, v1_re, rem_re, v0_im, phi_im)
        v2_im, phi_im = (o[0], o[1]), (o[2], o[3])
        return (v1_re, v1_im, v2_re, v2_im, phi_re, phi_im), None

    k_dd_end = n_orders - f32_tail  # dd handles orders [2, k_dd_end)
    (v0_re, v0_im, v1_re, v1_im, phi_re, phi_im), _ = jax.lax.scan(
        body,
        (v0_re, v0_im, v1_re, v1_im, phi_re, phi_im),
        (coeffs_h[2:k_dd_end], coeffs_l[2:k_dd_end]),
    )

    pht_re = pht_im = None
    if f32_tail:
        # mixed-precision tail: collapse the recurrence to hi-only f32
        # planes (the merge rounding enters Φ with weight ≤ the tail
        # sum, inside budget by construction of f32_tail_orders) and
        # run the remaining orders through the cheap f32 kernel.  The
        # tail's Φ contribution accumulates in its own f32 planes
        # (|Σ_{k≥k0} a_k·v_k| is tiny — plain adds are exact enough)
        # and is folded into the dd Φ once at the end.
        def merge(pair):
            return pair[0] + pair[1]

        t_v0_re, t_v0_im = merge(v0_re), merge(v0_im)
        t_v1_re, t_v1_im = merge(v1_re), merge(v1_im)
        zero = jnp.zeros_like(t_v0_re)
        pht_re, pht_im = zero, zero

        n_remote_tail = n_remote if extra_nb_hi_fn is not None else 0
        # xcross: the tail's n_cross neighbor reads collapse to ONE
        # pre-combined cross-sum plane (tail values are full-scale, but
        # the MXU HIGHEST error ≈ 2⁻²⁴ relative is inside the tail's
        # own eps32 ≈ 3e-7 budget)
        n_cross_tail = min(n_cross, 1) if xcross else n_cross
        tspecs_common = (
            [lane_spec, vec]
            + (
                [vec] * n_cross_tail if xcross
                else [_neighbor_spec(plan.tile_rows, j)
                      for j in range(n_cross)]
            )
            + [vec] * n_remote_tail
            + [vec, vec, vec]
        )

        def run_tail_component(sgn, a_k1, v1y, rem_y, v0x, phtx):
            args = [tail_lane, v1y]
            if xcross:
                if n_cross:
                    args += [cross_sum(v1y)]
            else:
                args += [v1y] * n_cross  # neighbor-indexed reads
            args += list(rem_y)  # remote device-bit planes (hi only)
            args += [dmb_planes[0], v0x, phtx]
            n_in = 2 + len(args)
            aliases = {n_in - 2: 0, n_in - 1: 1}
            kern = partial(
                _tail_component_kernel, plan, n_cross_tail,
                n_remote_tail, sgn, tail_perbit,
            )
            return pl.pallas_call(
                lambda a_ref, gs_ref, *r: kern(a_ref, gs_ref, *r),
                grid=(n_tiles,),
                in_specs=[_smem_spec(1), _smem_spec(gs_flat.shape[1])]
                + tspecs_common,
                out_specs=[vec] * 2,
                out_shape=[jax.ShapeDtypeStruct((rows, _LANE), rh.dtype)] * 2,
                input_output_aliases=aliases,
                interpret=interpret,
                **ckw,
            )(a_k1, gs_flat, *args)

        def tail_remote_pairs(v1r, v1i):
            """HI-only remote exchange for the tail orders: half the
            ICI bytes of the dd exchange (the remote lo planes are
            below the tail's own eps32 budget by construction)."""
            if n_remote_tail == 0:
                return [], []
            ext = extra_nb_hi_fn(v1r.reshape(shape), v1i.reshape(shape))
            rem_r = [t[0].reshape(-1, _LANE) for t in ext]
            rem_i = [t[1].reshape(-1, _LANE) for t in ext]
            return rem_r, rem_i

        def tail_body(carry, a_k):
            v0r, v0i, v1r, v1i, pr, pi = carry
            a_k1 = a_k.reshape(1, 1)
            rem_r, rem_i = tail_remote_pairs(v1r, v1i)
            v2r, pr = run_tail_component(-1.0, a_k1, v1i, rem_i, v0r, pr)
            v2i, pi = run_tail_component(+1.0, a_k1, v1r, rem_r, v0i, pi)
            return (v1r, v1i, v2r, v2i, pr, pi), None

        (_, _, _, _, pht_re, pht_im), _ = jax.lax.scan(
            tail_body,
            (t_v0_re, t_v0_im, t_v1_re, t_v1_im, pht_re, pht_im),
            coeffs_h[k_dd_end:],
        )

    # renormalize Φ (deferred through the loop), then the global phase
    # exp(-i β dt).  Under x64 (CPU tests): exact f64 pass; on TPU: one
    # elementwise XLA pass with the barriered dd ops from .df64.
    ph = np.exp(-1j * beta * float(dt))
    if _x64_available():
        zr = phi_re[0].astype(jnp.float64) + phi_re[1].astype(jnp.float64)
        zi = phi_im[0].astype(jnp.float64) + phi_im[1].astype(jnp.float64)
        if pht_re is not None:
            zr = zr + pht_re.astype(jnp.float64)
            zi = zi + pht_im.astype(jnp.float64)
        wr = zr * np.float64(ph.real) - zi * np.float64(ph.imag)
        wi = zr * np.float64(ph.imag) + zi * np.float64(ph.real)
        orh, orl = _dd_resplit_f64(wr)
        oih, oil = _dd_resplit_f64(wi)
        return (
            orh.reshape(shape), orl.reshape(shape),
            oih.reshape(shape), oil.reshape(shape),
        )
    from .df64 import CDD, DD, cdd_scale, two_sum as xla_two_sum

    prh, prl = xla_two_sum(*phi_re)
    pih, pil = xla_two_sum(*phi_im)
    if pht_re is not None:
        prh, e = xla_two_sum(prh, pht_re)
        prl = prl + e
        pih, e = xla_two_sum(pih, pht_im)
        pil = pil + e
    phase = CDD(
        DD(*(jnp.float32(v) for v in _split_f64(ph.real))),
        DD(*(jnp.float32(v) for v in _split_f64(ph.imag))),
    )
    out = cdd_scale(CDD(DD(prh, prl), DD(pih, pil)), phase)
    return (
        out.re.hi.reshape(shape),
        out.re.lo.reshape(shape),
        out.im.hi.reshape(shape),
        out.im.lo.reshape(shape),
    )

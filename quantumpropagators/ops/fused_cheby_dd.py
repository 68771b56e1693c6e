"""Double-float (df64) fused Pallas Chebyshev kernel: reference-grade
~1e-13 accuracy per step at near-f32 bandwidth on f32-only TPUs.

The reference is complex128 end-to-end with 1e-10 kernel tolerances
(``/root/reference/test/test_cheby.jl:8``).  The df64 XLA path
(:mod:`.df64`) reaches that accuracy but pays one full HBM pass per
bit-flip per dd-operation — measured 0.55 Gnnz/s at 2^20.  This module
runs the same double-float arithmetic *inside* Pallas kernels, so all
in-tile flip accumulation and the whole recurrence update happen in
VMEM:

- **main kernel** — one pass per polynomial order: dd diagonal product,
  compensated accumulation of all in-tile bit-flips (lane rolls +
  sublane rolls; flips are exact data movement), recurrence
  ``v₂ = c·(Hv₁ − βv₁) + v₀`` and ``Φ += a_k v₂`` in dd.
- **cross kernel** — the top-bit flip sum ``W = Σ g_j·v₁[idx^2^j]``
  with neighbor tiles addressed through the BlockSpec ``index_map``
  (grid-index XOR), compensated-summed in VMEM.

Error-free transformations (Dekker/Knuth two-sum/split/two-product) are
used WITHOUT the optimization barriers the XLA path needs
(``df64._b``): Mosaic does not run XLA's algebraic simplifier, and the
transforms were verified bit-exact in compiled kernels on the TPU
(two_sum/two_prod residual 0.0 vs f64).

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

from .fused_cheby import FlipPlan, make_flip_plan, _LANE, _LANE_BITS

__all__ = ["cheby_step_fused_dd", "make_flip_plan"]

_SPLIT = np.float32(4097.0)  # 2^12 + 1 for f32 Dekker split

# Error-free transformations need protection from compiler rewrites.
# Mosaic (compiled TPU kernels) performs none — barriers are both
# unnecessary and UNSUPPORTED there (optimization_barrier has no TPU
# Pallas lowering).  Interpret mode runs the kernel body through XLA,
# whose algebraic simplifier cancels the error terms — there the
# barriers of the .df64 module are required.  The flag is set at trace
# time by :func:`cheby_step_fused_dd` (interpret is a static arg, so
# each variant gets its own trace).
_USE_BARRIER = [False]


def _b(x):
    if _USE_BARRIER[0]:
        return jax.lax.optimization_barrier(x)
    return x


def _two_sum(a, b):
    s = _b(a + b)
    bb = _b(s - a)
    return s, _b(a - _b(s - bb)) + _b(b - bb)


def _split(a):
    t = _b(_SPLIT * a)
    hi = _b(t - _b(t - a))
    return hi, _b(a - hi)


def _two_prod(a, b):
    p = _b(a * b)
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = _b(
        _b(_b(_b(a_hi * b_hi) - p) + _b(a_hi * b_lo) + _b(a_lo * b_hi))
        + _b(a_lo * b_lo)
    )
    return p, err


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    return _two_sum(s, e)


def _dd_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + xh * yl + xl * yh
    return _two_sum(p, e)


def _dd_scale(xh, xl, sh, sl):
    """x · s with s a dd scalar (trace-time constants or SMEM values)."""
    return _dd_mul(xh, xl, sh, sl)


def _split_f64(v: float):
    hi = np.float32(v)
    return hi, np.float32(np.float64(v) - np.float64(hi))


# ---- in-kernel flip accumulation ------------------------------------


def _roll_flip(t, dist, axis, idx):
    """Exact permutation ``t[i] -> t[i ^ dist]`` along ``axis`` via two
    rolls and a parity select (``idx`` = broadcasted index array)."""
    bit_set = (idx & dist) != 0
    return jnp.where(
        bit_set,
        jnp.roll(t, dist, axis=axis),
        jnp.roll(t, -dist, axis=axis),
    )


def _accum_flips_dd(plan: FlipPlan, th, tl, uniform_g):
    """Compensated-dd sum of all in-tile bit flips of a dd plane
    ``(th, tl)``.

    With a uniform flip coefficient the (exact) flips are summed first
    and scaled once; per-site coefficients scale each flip in dd.
    Returns the dd pair ``(Σ g_j flip_j)``."""
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, th.shape, 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, th.shape, 1)

    def flips():
        for j in range(_LANE_BITS):
            yield (
                plan.gs[j],
                _roll_flip(th, 1 << j, 1, lane_idx),
                _roll_flip(tl, 1 << j, 1, lane_idx),
            )
        for j in range(plan.n_row_bits):
            yield (
                plan.gs[_LANE_BITS + j],
                _roll_flip(th, 1 << j, 0, rows_idx),
                _roll_flip(tl, 1 << j, 0, rows_idx),
            )

    if uniform_g:
        # Σ flips (compensated), then one dd scale by g
        s = e = None
        for _, fh, fl in flips():
            if s is None:
                s, e = fh, fl
            else:
                s, err = _two_sum(s, fh)
                e = e + err + fl
        gh, gl = _split_f64(plan.gs[0])
        return _dd_scale(s, e, gh, gl)
    s = e = None
    for gj, fh, fl in flips():
        gh, gl = _split_f64(gj)
        ph, pl_ = _dd_scale(fh, fl, gh, gl)
        if s is None:
            s, e = ph, pl_
        else:
            s, err = _two_sum(s, ph)
            e = e + err + pl_
    return _two_sum(s, e)


def _h_tile_dd(plan, uniform_g, trh, trl, tih, til, dmb_h, dmb_l, w):
    """dd ``(H − β)·t`` for a complex tile: diag product + in-tile flip
    sums (+ precomputed cross term ``w``)."""
    urh, url = _dd_mul(trh, trl, dmb_h, dmb_l)
    uih, uil = _dd_mul(tih, til, dmb_h, dmb_l)
    frh, frl = _accum_flips_dd(plan, trh, trl, uniform_g)
    fih, fil = _accum_flips_dd(plan, tih, til, uniform_g)
    urh, url = _dd_add(urh, url, frh, frl)
    uih, uil = _dd_add(uih, uil, fih, fil)
    if w is not None:
        wrh, wrl, wih, wil = w
        urh, url = _dd_add(urh, url, wrh, wrl)
        uih, uil = _dd_add(uih, uil, wih, wil)
    return urh, url, uih, uil


# ---- kernels --------------------------------------------------------


def _iter_kernel_dd(plan, uniform_g, s2h, s2l, a_ref, *refs):
    """One fused dd Chebyshev iteration on one tile.  ``a_ref`` holds
    ``(a_hi, a_lo)`` in SMEM; refs are (v0[4], v1[4], [w[4]], dmb[2],
    phi[4]) inputs then (v2[4], phi[4]) outputs."""
    n = len(refs)
    has_w = n == 26  # v0(4)+v1(4)+w(4)+dmb(2)+phi(4)+outs(8)
    k = 0
    v0 = [r[:] for r in refs[k:k + 4]]; k += 4
    v1 = [r[:] for r in refs[k:k + 4]]; k += 4
    w = None
    if has_w:
        w = tuple(r[:] for r in refs[k:k + 4]); k += 4
    dmb_h = refs[k][:]; dmb_l = refs[k + 1][:]; k += 2
    ph = [r[:] for r in refs[k:k + 4]]; k += 4
    outs = refs[k:]

    urh, url, uih, uil = _h_tile_dd(
        plan, uniform_g, v1[0], v1[1], v1[2], v1[3], dmb_h, dmb_l, w
    )
    # v2 = s2·i·u + v0  (s2 real dd; i·u swaps planes with sign)
    t_rh, t_rl = _dd_scale(uih, uil, -s2h, -s2l)
    t_ih, t_il = _dd_scale(urh, url, s2h, s2l)
    v2rh, v2rl = _dd_add(t_rh, t_rl, v0[0], v0[1])
    v2ih, v2il = _dd_add(t_ih, t_il, v0[2], v0[3])
    # Φ += a_k · v2 (a_k real dd from SMEM)
    ah = a_ref[0, 0]
    al = a_ref[0, 1]
    prh, prl = _dd_scale(v2rh, v2rl, ah, al)
    pih, pil = _dd_scale(v2ih, v2il, ah, al)
    phrh, phrl = _dd_add(ph[0], ph[1], prh, prl)
    phih, phil = _dd_add(ph[2], ph[3], pih, pil)
    for r, v in zip(outs, (v2rh, v2rl, v2ih, v2il, phrh, phrl, phih, phil)):
        r[:] = v


def _first_kernel_dd(plan, uniform_g, sh, sl, a_ref, *refs):
    """Setup: v₁ = s·i·(H−β)v₀; Φ = a₀v₀ + a₁v₁.  ``a_ref`` holds
    ``(a0_hi, a0_lo, a1_hi, a1_lo)`` in SMEM."""
    n = len(refs)
    has_w = n == 18
    k = 0
    v0 = [r[:] for r in refs[k:k + 4]]; k += 4
    w = None
    if has_w:
        w = tuple(r[:] for r in refs[k:k + 4]); k += 4
    dmb_h = refs[k][:]; dmb_l = refs[k + 1][:]; k += 2
    outs = refs[k:]

    urh, url, uih, uil = _h_tile_dd(
        plan, uniform_g, v0[0], v0[1], v0[2], v0[3], dmb_h, dmb_l, w
    )
    v1rh, v1rl = _dd_scale(uih, uil, -sh, -sl)
    v1ih, v1il = _dd_scale(urh, url, sh, sl)
    a0h, a0l, a1h, a1l = a_ref[0, 0], a_ref[0, 1], a_ref[0, 2], a_ref[0, 3]
    prh, prl = _dd_scale(v0[0], v0[1], a0h, a0l)
    pih, pil = _dd_scale(v0[2], v0[3], a0h, a0l)
    qrh, qrl = _dd_scale(v1rh, v1rl, a1h, a1l)
    qih, qil = _dd_scale(v1ih, v1il, a1h, a1l)
    phrh, phrl = _dd_add(prh, prl, qrh, qrl)
    phih, phil = _dd_add(pih, pil, qih, qil)
    for r, v in zip(
        outs, (v1rh, v1rl, v1ih, v1il, phrh, phrl, phih, phil)
    ):
        r[:] = v


def _cross_kernel_dd(plan, n_cross, *refs):
    """W tile = compensated dd sum of the ``n_cross`` scaled neighbor
    tiles (one per top bit; neighbors addressed by the grid index_map).
    refs: per cross bit 4 planes of v1's neighbor tile, then 4 W
    outputs... × (re, im)."""
    # refs layout: for j in range(n_cross): (rh, rl, ih, il); outputs 4
    outs = refs[-4:]
    srh = srl = sih = sil = None
    for j in range(n_cross):
        rh = refs[4 * j][:]
        rl = refs[4 * j + 1][:]
        ih = refs[4 * j + 2][:]
        il = refs[4 * j + 3][:]
        gh, gl = _split_f64(plan.gs[plan.L - plan.n_cross + j])
        rh, rl = _dd_scale(rh, rl, gh, gl)
        ih, il = _dd_scale(ih, il, gh, gl)
        if srh is None:
            srh, srl, sih, sil = rh, rl, ih, il
        else:
            srh, err = _two_sum(srh, rh)
            srl = srl + err + rl
            sih, err = _two_sum(sih, ih)
            sil = sil + err + il
    srh, srl = _two_sum(srh, srl)
    sih, sil = _two_sum(sih, sil)
    for r, v in zip(outs, (srh, srl, sih, sil)):
        r[:] = v


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


def _dd_planes(x_hi, x_lo):
    return x_hi.reshape(-1, _LANE), x_lo.reshape(-1, _LANE)


@partial(
    jax.jit,
    static_argnames=("plan", "delta", "e_min", "dt", "forward", "interpret"),
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
):
    """One dd Chebyshev step ``exp(-i H dt)``,
    ``H = diag + Σ g_j X_j``, on a df64 state.

    ``state`` is ``(re_hi, re_lo, im_hi, im_lo)`` f32 arrays;
    ``dmb_h/dmb_l`` the dd plane of ``diag − β`` (β = Δ/2 + E_min);
    ``coeffs_h/coeffs_l`` the dd-split f64 Chebyshev coefficients.
    Accuracy ~1e-13 per step (vs the reference's complex128 1e-10
    tolerance); cost: one fused VMEM pass + one neighbor-sum pass per
    polynomial order.
    """
    _USE_BARRIER[0] = bool(interpret)  # see note above _b
    rh, rl, ih, il = state
    shape = rh.shape
    n = rh.size
    rows = n // _LANE
    n_tiles = rows // plan.tile_rows
    beta = float(delta) / 2.0 + float(e_min)
    sign = -1.0 if forward else 1.0
    s_h, s_l = _split_f64(sign * 2.0 / float(delta))
    s2_h, s2_l = _split_f64(2.0 * sign * 2.0 / float(delta))
    uniform_g = len(set(plan.gs)) == 1
    has_cross = plan.n_cross > 0

    vec = _vec_spec(plan.tile_rows)
    out4 = [jax.ShapeDtypeStruct((rows, _LANE), rh.dtype)] * 4
    out8 = out4 * 2
    cparams = (
        pltpu.CompilerParams(dimension_semantics=("parallel",))
        if _HAS_PLTPU and not interpret
        else None
    )
    ckw = {"compiler_params": cparams} if cparams else {}

    dmb_h2, dmb_l2 = _dd_planes(dmb_h, dmb_l)

    def cross_w(v4):
        """W = Σ_topbits g_j · flip_j(v) via the neighbor-index kernel."""
        if not has_cross:
            return None
        specs = []
        args = []
        for j in range(plan.n_cross):
            for p in v4:
                specs.append(_neighbor_spec(plan.tile_rows, j))
                args.append(p)
        kern = partial(_cross_kernel_dd, plan, plan.n_cross)
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=specs,
            out_specs=[vec] * 4,
            out_shape=out4,
            interpret=interpret,
            **ckw,
        )(*args)

    def run_first(v0, a01, w):
        args = list(v0)
        specs = [vec] * 4
        if w is not None:
            args += list(w)
            specs += [vec] * 4
        args += [dmb_h2, dmb_l2]
        specs += [vec, vec]
        kern = partial(_first_kernel_dd, plan, uniform_g, s_h, s_l)
        return pl.pallas_call(
            lambda a_ref, *r: kern(a_ref, *r),
            grid=(n_tiles,),
            in_specs=[_smem_spec(4)] + specs,
            out_specs=[vec] * 8,
            out_shape=out8,
            interpret=interpret,
            **ckw,
        )(a01, *args)

    def run_iter(a_k2, v0, v1, w, phi):
        args = list(v0) + list(v1)
        specs = [vec] * 8
        if w is not None:
            args += list(w)
            specs += [vec] * 4
        args += [dmb_h2, dmb_l2] + list(phi)
        specs += [vec] * 6
        kern = partial(_iter_kernel_dd, plan, uniform_g, s2_h, s2_l)
        n_in = 1 + len(args)
        # v0 planes -> v2 outputs, phi planes -> phi outputs (in place)
        phi_base = n_in - 4
        aliases = {1: 0, 2: 1, 3: 2, 4: 3,
                   phi_base: 4, phi_base + 1: 5,
                   phi_base + 2: 6, phi_base + 3: 7}
        return pl.pallas_call(
            lambda a_ref, *r: kern(a_ref, *r),
            grid=(n_tiles,),
            in_specs=[_smem_spec(2)] + specs,
            out_specs=[vec] * 8,
            out_shape=out8,
            input_output_aliases=aliases,
            interpret=interpret,
            **ckw,
        )(a_k2, *args)

    v0 = (*_dd_planes(rh, rl), *_dd_planes(ih, il))
    a01 = jnp.stack(
        [coeffs_h[0], coeffs_l[0], coeffs_h[1], coeffs_l[1]]
    ).reshape(1, 4)
    w0 = cross_w(v0)
    r1 = run_first(v0, a01, w0)
    v1 = tuple(r1[:4])
    phi = tuple(r1[4:])

    def body(carry, a_pair):
        v0, v1, phi = carry
        a_k2 = jnp.stack(a_pair).reshape(1, 2)
        w = cross_w(v1)
        out = run_iter(a_k2, v0, v1, w, phi)
        v2 = tuple(out[:4])
        phi = tuple(out[4:])
        return (v1, v2, phi), None

    (_, _, phi), _ = jax.lax.scan(
        body, (v0, v1, phi), (coeffs_h[2:], coeffs_l[2:])
    )

    # global phase exp(-i β dt): dd complex scale, one elementwise XLA
    # pass using the barriered dd ops from .df64 (XLA needs them)
    from .df64 import CDD, DD, cdd_scale

    ph = np.exp(-1j * beta * float(dt))
    phase = CDD(
        DD(*(jnp.float32(v) for v in _split_f64(ph.real))),
        DD(*(jnp.float32(v) for v in _split_f64(ph.imag))),
    )
    prh, prl, pih, pil = phi
    out = cdd_scale(CDD(DD(prh, prl), DD(pih, pil)), phase)
    return (
        out.re.hi.reshape(shape),
        out.re.lo.reshape(shape),
        out.im.hi.reshape(shape),
        out.im.lo.reshape(shape),
    )

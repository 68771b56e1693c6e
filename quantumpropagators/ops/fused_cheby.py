"""Fused single-pass Pallas kernel for the Chebyshev hot loop on
diagonal-plus-site-flip Hamiltonians (the TFIM family, any lattice
dimension).

Motivation.  The Chebyshev recurrence (reference ``src/cheby.jl:150-213``)
is bandwidth-bound at large N: per polynomial order it touches v₀, v₁,
Φ, and the Hamiltonian application.  The XLA path expresses ``H·v`` as a
chain of grouped einsums + elementwise ops; above 2^22 XLA's fusion
choices degrade sharply (measured: 259 → 114 → 76 Gnnz/s for 2^22 →
2^23 → 2^24 on one TPU chip).  This module fuses one *entire* Chebyshev
iteration

    v₂ = c·(H v₁ − β v₁) + v₀,   Φ += a_k v₂

into a single Pallas pass over the state, so each iteration's HBM
traffic is exactly: read v₀, v₁, W, Φ, diag; write v₂, Φ.

Structure exploited (H = diag(d) + Σⱼ gⱼ·Xⱼ, Xⱼ = flip of index bit j):

- state planes (re, im) viewed as ``(ROWS, 128)`` f32;
- **lane bits** (0–6): all 7 flip terms at once as ONE 128×128 MXU
  matmul ``t @ A_lane`` (A_lane = Σ_{j<7} gⱼ·flipⱼ adjacency);
- **in-tile row bits**: sublane rolls ``±2^j`` with a parity select
  (pure VPU, no extra HBM traffic);
- **cross-tile (top) bits**: one small hypercube-adjacency matmul
  ``W = A_cross @ v₁.reshape(T, N/T)`` in XLA per iteration — the only
  non-fused pass, MXU-bound and cheap (T ≤ a few hundred);
- the purely imaginary Chebyshev scalar c means the recurrence is a
  plane swap with one real scale (cf. :mod:`.planar`) — the kernel is
  100% real f32 arithmetic.

Like the reference kernel, arbitrary time steps/controls enter only
through ``(coeffs, Δ, E_min, dt)``; the kernel is retraced only when
shapes change.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu imports fail on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = [
    "FlipPlan",
    "make_flip_plan",
    "cheby_step_fused",
    "flip_structure",
    "flip_structure_multi",
]

_LANE = 128
_LANE_BITS = 7


def _flip_adjacency(bits: np.ndarray, gs: np.ndarray) -> np.ndarray:
    """Σⱼ gⱼ·(flip of local bit j) adjacency over ``len(bits)`` bits."""
    n = 1 << len(bits)
    A = np.zeros((n, n), dtype=np.float64)
    for j, g in enumerate(gs):
        idx = np.arange(n)
        A[idx ^ (1 << j), idx] += g
    return A


@dataclass(frozen=True)
class FlipPlan:
    """Static (hashable — used as a jit static arg) plan for one
    ``(L, g, tile_rows)`` flip-Hamiltonian."""

    L: int
    tile_rows: int          # rows per Pallas tile (R_t, 128)
    n_row_bits: int         # in-tile row bits handled by rolls
    n_cross: int            # top bits handled by the XLA cross matmul
    gs: tuple               # per-site flip coefficient, length L

    @property
    def lane_mat(self) -> np.ndarray:
        """(128, 128) Σ_{j<7} g_j flip_j adjacency."""
        return _flip_adjacency(
            np.arange(_LANE_BITS), np.asarray(self.gs[:_LANE_BITS])
        )

    @property
    def cross_mat(self) -> np.ndarray | None:
        """(T, T) top-bit adjacency, T = 2^n_cross."""
        if not self.n_cross:
            return None
        return _flip_adjacency(
            np.arange(self.n_cross), np.asarray(self.gs[-self.n_cross:])
        )

    @property
    def row_gs(self) -> tuple:
        return self.gs[_LANE_BITS:_LANE_BITS + self.n_row_bits]


def make_flip_plan(L: int, g, tile_rows: int = 512) -> FlipPlan:
    """Plan for ``H_x = Σ_j g_j X_j`` on ``2^L`` states.

    ``g`` is a scalar (uniform transverse field) or a length-``L``
    per-site vector; site ``j`` flips index bit ``j``.
    """
    if L < _LANE_BITS + 3:
        raise ValueError(f"fused kernel needs L >= {_LANE_BITS + 3}, got {L}")
    gs = np.broadcast_to(np.asarray(g, dtype=np.float64), (L,))
    rows = 1 << (L - _LANE_BITS)
    tile_rows = min(tile_rows, rows)
    n_row_bits = int(np.log2(tile_rows))
    if (1 << n_row_bits) != tile_rows:
        raise ValueError("tile_rows must be a power of two")
    n_cross = L - _LANE_BITS - n_row_bits
    return FlipPlan(
        L=L,
        tile_rows=tile_rows,
        n_row_bits=n_row_bits,
        n_cross=n_cross,
        gs=tuple(float(v) for v in gs),
    )


def flip_structure(ops, tile_rows: int = 512):
    """Detect the diagonal-plus-site-flip structure the fused kernel
    accepts.

    ``ops`` is a list of operator terms (e.g. ``Operator.ops``).  If it
    consists of exactly one :class:`~..models.lattice.DiagonalOperator`
    and one X-type :class:`~..models.lattice.SiteOperatorSum` (every
    per-site matrix real ``[[0, a], [a, 0]]``), returns
    ``(plan, diag, diag_pos, flip_pos)`` where ``*_pos`` index into
    ``ops``; otherwise ``None``.

    Site ``i`` in the MSB-first kron convention
    (``models/lattice.py``) maps to index bit ``L-1-i`` in the plan.
    """
    from ..models.lattice import SiteOperatorSum
    from .operators import DiagonalOperator

    if len(ops) != 2:
        return None
    diag_pos = flip_pos = None
    for k, op in enumerate(ops):
        if isinstance(op, DiagonalOperator):
            diag_pos = k
        elif isinstance(op, SiteOperatorSum):
            flip_pos = k
    if diag_pos is None or flip_pos is None:
        return None
    flip = ops[flip_pos]
    mats = np.asarray(flip.site_mats)
    if np.iscomplexobj(mats) and np.abs(mats.imag).max() > 0:
        return None
    mats = mats.real
    L = flip.L
    active = flip.active if flip.active else (True,) * L
    gs_site = np.zeros(L, dtype=np.float64)
    for i in range(L):
        M = mats[i]
        if not active[i]:
            continue
        if M[0, 0] != 0 or M[1, 1] != 0 or M[0, 1] != M[1, 0]:
            return None
        gs_site[i] = M[0, 1]
    gs_bits = gs_site[::-1].copy()  # site i (MSB-first) = bit L-1-i
    if L < _LANE_BITS + 3:
        return None
    diag = ops[diag_pos].diag
    if jnp.iscomplexobj(diag):
        if np.abs(np.asarray(diag.imag)).max() > 0:
            return None
        diag = diag.real
    plan = make_flip_plan(L, gs_bits, tile_rows=tile_rows)
    return plan, diag, diag_pos, flip_pos


def _xtype_site_gs(op) -> "np.ndarray | None":
    """Per-BIT flip coefficients of an X-type SiteOperatorSum, or None
    if the term is not pure-real site-flip structure."""
    mats = np.asarray(op.site_mats)
    if np.iscomplexobj(mats) and np.abs(mats.imag).max() > 0:
        return None
    mats = mats.real
    L = op.L
    active = op.active if op.active else (True,) * L
    gs_site = np.zeros(L, dtype=np.float64)
    for i in range(L):
        if not active[i]:
            continue
        M = mats[i]
        if M[0, 0] != 0 or M[1, 1] != 0 or M[0, 1] != M[1, 0]:
            return None
        gs_site[i] = M[0, 1]
    return gs_site[::-1].copy()  # site i (MSB-first) = bit L-1-i


def flip_structure_multi(ops):
    """Multi-amplitude generalization of :func:`flip_structure` —
    the reference's ``Ĥ₀ + Σₗ aₗ(t)Ĥₗ`` with ANY number of diagonal
    terms and ANY number of independently-driven site-flip groups
    (``/root/reference/src/generators.jl:44-61``): each term is either
    a :class:`~.operators.DiagonalOperator` or an X-type
    :class:`~..models.lattice.SiteOperatorSum` (groups may overlap —
    a bit's effective coefficient is the coefficient-weighted sum).

    Returns ``(L, diag_terms, flip_terms)`` with
    ``diag_terms = [(pos, diag_f64)]`` and
    ``flip_terms = [(pos, gs_bits_f64 (L,))]`` (``pos`` indexes
    ``ops``), or ``None`` if any term does not fit.
    """
    from ..models.lattice import SiteOperatorSum
    from .operators import DiagonalOperator

    diag_terms, flip_terms = [], []
    L = None
    for k, op in enumerate(ops):
        if isinstance(op, DiagonalOperator):
            d = op.diag
            if jnp.iscomplexobj(d):
                if np.abs(np.asarray(d.imag)).max() > 0:
                    return None
                d = d.real
            diag_terms.append((k, np.asarray(d, dtype=np.float64)))
        elif isinstance(op, SiteOperatorSum):
            gs_bits = _xtype_site_gs(op)
            if gs_bits is None:
                return None
            if L is None:
                L = op.L
            elif op.L != L:
                return None
            flip_terms.append((k, gs_bits))
        else:
            return None
    if not flip_terms or L < _LANE_BITS + 3:
        return None
    return L, diag_terms, flip_terms


def _apply_h_tile(plan: FlipPlan, tr, lane_mat, dmb, w, scale):
    """In-tile ``(H − β)·t`` for one real plane: diag + lane flips +
    row flips (+ cross term ``w`` precomputed outside, already scaled).

    ``scale`` is the (possibly traced, time-dependent) coefficient of
    the flip part — e.g. ``g(t)`` for a driven transverse field."""
    flips = jnp.dot(tr, lane_mat, preferred_element_type=tr.dtype)
    if plan.n_row_bits:
        rows = jax.lax.broadcasted_iota(jnp.int32, tr.shape, 0)
        for j, gj in enumerate(plan.row_gs):
            dist = 1 << j
            bit_set = (rows & dist) != 0
            flipped = jnp.where(
                bit_set,
                jnp.roll(tr, dist, axis=0),
                jnp.roll(tr, -dist, axis=0),
            )
            flips = flips + gj * flipped
    u = tr * dmb + scale * flips
    if w is not None:
        u = u + w
    return u


def _iter_kernel(plan, s2, sc_ref, v0r, v0i, v1r, v1i, wr, wi, dmb, phr, phi,
                 lane, o_v2r, o_v2i, o_phr, o_phi):
    """One fused Chebyshev iteration on one (R_t, 128) tile.
    ``sc_ref`` holds (a_k, flip_scale) in SMEM."""
    a = sc_ref[0, 0]
    scale = sc_ref[0, 1]
    lm = lane[:]
    d = dmb[:]
    ur = _apply_h_tile(
        plan, v1r[:], lm, d, wr[:] if wr is not None else None, scale
    )
    ui = _apply_h_tile(
        plan, v1i[:], lm, d, wi[:] if wi is not None else None, scale
    )
    v2r = -s2 * ui + v0r[:]
    v2i = s2 * ur + v0i[:]
    o_v2r[:] = v2r
    o_v2i[:] = v2i
    o_phr[:] = phr[:] + a * v2r
    o_phi[:] = phi[:] + a * v2i


def _first_kernel(plan, s, sc_ref, v0r, v0i, wr, wi, dmb, lane,
                  o_v1r, o_v1i, o_phr, o_phi):
    """Chebyshev setup: v₁ = c·(H−β)v₀, Φ = a₀v₀ + a₁v₁ on one tile.
    ``sc_ref`` holds (a₀, a₁, flip_scale) in SMEM."""
    a0 = sc_ref[0, 0]
    a1 = sc_ref[0, 1]
    scale = sc_ref[0, 2]
    lm = lane[:]
    d = dmb[:]
    ur = _apply_h_tile(
        plan, v0r[:], lm, d, wr[:] if wr is not None else None, scale
    )
    ui = _apply_h_tile(
        plan, v0i[:], lm, d, wi[:] if wi is not None else None, scale
    )
    v1r = -s * ui
    v1i = s * ur
    o_v1r[:] = v1r
    o_v1i[:] = v1i
    o_phr[:] = a0 * v0r[:] + a1 * v1r
    o_phi[:] = a0 * v0i[:] + a1 * v1i


def _tile_specs(plan, n_tiles):
    vec = pl.BlockSpec(
        (plan.tile_rows, _LANE),
        lambda i: (i, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )
    lane = pl.BlockSpec(
        (_LANE, _LANE),
        lambda i: (0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )
    return vec, lane


def _cross_term(plan: FlipPlan, cross, vr, vi, scale):
    """W = scale · A_cross @ v over the top bits (XLA MXU pass)."""
    T = 1 << plan.n_cross
    n = vr.size
    wr = scale * (cross @ vr.reshape(T, n // T)).reshape(vr.shape)
    wi = scale * (cross @ vi.reshape(T, n // T)).reshape(vi.shape)
    return wr, wi


def _plane2d(x):
    return x.reshape(-1, _LANE)


@partial(
    jax.jit,
    static_argnames=(
        "plan", "dt", "delta", "e_min", "forward", "interpret", "extra_w_fn",
    ),
)
def cheby_step_fused(
    plan: FlipPlan,
    diag,
    re,
    im,
    coeffs,
    delta,
    e_min,
    dt,
    *,
    flip_scale=None,
    forward: bool = True,
    interpret: bool = False,
    extra_w_fn=None,
):
    """One Chebyshev step ``exp(-i H dt)`` with
    ``H = diag + flip_scale·Σ g_j X_j`` on planar f32 state ``(re, im)``.

    Mathematically identical to :func:`.cheby.cheby_apply` /
    :func:`.planar.cheby_apply_planar` (reference ``src/cheby.jl:150-213``);
    each polynomial order is a single fused Pallas pass plus one small
    cross-bit matmul.  ``delta``/``e_min``/``dt`` are static floats;
    control amplitudes enter via the traced ``coeffs``/``diag``/
    ``flip_scale`` arguments (e.g. a time-dependent transverse field
    ``g(t)·Σ Xᵢ`` passes ``flip_scale=g_n`` per interval with a plan
    built at ``g=1``) — no retracing across control updates.

    ``extra_w_fn(vr, vi) -> (wr, wi)`` (static) injects an additional
    per-iteration contribution to ``H·v`` computed outside the kernel —
    the hook the sharded variant uses for device-bit flips via
    ``ppermute`` (see :mod:`..parallel.sharded_fused`).
    """
    rdtype = re.dtype
    shape = re.shape
    n = re.size
    rows = n // _LANE
    n_tiles = rows // plan.tile_rows
    beta = float(delta) / 2.0 + float(e_min)
    sign = -1.0 if forward else 1.0
    s = float(sign * 2.0 / delta)
    s2 = 2.0 * s

    lane_mat = jnp.asarray(plan.lane_mat, dtype=rdtype)
    dmb = _plane2d(diag.astype(rdtype) - rdtype.type(beta))
    has_cross = plan.n_cross > 0
    has_w = has_cross or extra_w_fn is not None
    cross = (
        jnp.asarray(plan.cross_mat, dtype=rdtype) if has_cross else None
    )
    a = coeffs.astype(rdtype)
    scale = jnp.asarray(
        1.0 if flip_scale is None else flip_scale, dtype=rdtype
    )

    vec, lane = _tile_specs(plan, n_tiles)

    def _smem(width):
        kw = {"memory_space": pltpu.SMEM} if _HAS_PLTPU else {}
        return pl.BlockSpec((1, width), lambda i: (0, 0), **kw)

    out_shape = [jax.ShapeDtypeStruct((rows, _LANE), rdtype)] * 4
    # tiles are independent → let Mosaic pipeline the grid freely
    cparams = (
        pltpu.CompilerParams(dimension_semantics=("parallel",))
        if _HAS_PLTPU and not interpret
        else None
    )

    def run_first(v0r, v0i, wr, wi):
        # scalars (a₀, a₁, flip_scale) enter via SMEM (coeffs may be traced)
        args = [jnp.stack([a[0], a[1], scale]).reshape(1, 3), v0r, v0i]
        specs = [_smem(3), vec, vec]
        if has_w:
            args += [wr, wi]
            specs += [vec, vec]

        def kern(sc_ref, v0r_, v0i_, *rest):
            if has_w:
                wr_, wi_, dmb_, lane_, o1, o2, o3, o4 = rest
            else:
                dmb_, lane_, o1, o2, o3, o4 = rest
                wr_ = wi_ = None
            _first_kernel(
                plan, s, sc_ref,
                v0r_, v0i_, wr_, wi_, dmb_, lane_, o1, o2, o3, o4,
            )

        kwargs = {"compiler_params": cparams} if cparams else {}
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=specs + [vec, lane],
            out_specs=[vec] * 4,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(*args, dmb, lane_mat)

    def run_iter(a_k, v0r, v0i, v1r, v1i, wr, wi, phr, phi):
        args = [jnp.stack([a_k, scale]).reshape(1, 2), v0r, v0i, v1r, v1i]
        specs = [_smem(2), vec, vec, vec, vec]
        if has_w:
            args += [wr, wi]
            specs += [vec, vec]
        args += [dmb, phr, phi, lane_mat]
        specs += [vec, vec, vec, lane]

        def kern(a_ref, v0r_, v0i_, v1r_, v1i_, *rest):
            if has_w:
                wr_, wi_, dmb_, phr_, phi_, lane_, o1, o2, o3, o4 = rest
            else:
                dmb_, phr_, phi_, lane_, o1, o2, o3, o4 = rest
                wr_ = wi_ = None
            _iter_kernel(
                plan, s2, a_ref, v0r_, v0i_, v1r_, v1i_, wr_, wi_,
                dmb_, phr_, phi_, lane_, o1, o2, o3, o4,
            )

        # v0 buffers become v2, Φ accumulates in place
        n_w = 2 if has_w else 0
        aliases = {1: 0, 2: 1, 5 + n_w + 1: 2, 5 + n_w + 2: 3}
        kwargs = {"compiler_params": cparams} if cparams else {}
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=specs,
            out_specs=[vec] * 4,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
            **kwargs,
        )(*args)

    def make_w(vr, vi):
        wr = wi = None
        if has_cross:
            wr, wi = _cross_term(plan, cross, vr, vi, scale)
        if extra_w_fn is not None:
            er, ei = extra_w_fn(vr.reshape(shape), vi.reshape(shape))
            er = scale * _plane2d(er.astype(rdtype))
            ei = scale * _plane2d(ei.astype(rdtype))
            wr = er if wr is None else wr + er
            wi = ei if wi is None else wi + ei
        return wr, wi

    v0r = _plane2d(re)
    v0i = _plane2d(im)
    w0r, w0i = make_w(v0r, v0i)
    v1r, v1i, phr, phi = run_first(v0r, v0i, w0r, w0i)

    def body(carry, a_k):
        v0r, v0i, v1r, v1i, phr, phi = carry
        wr, wi = make_w(v1r, v1i)
        v2r, v2i, phr, phi = run_iter(
            a_k, v0r, v0i, v1r, v1i, wr, wi, phr, phi
        )
        return (v1r, v1i, v2r, v2i, phr, phi), None

    (_, _, _, _, phr, phi), _ = jax.lax.scan(
        body, (v0r, v0i, v1r, v1i, phr, phi), a[2:]
    )

    # final global phase exp(-i β dt)
    ang = -float(dt) * beta
    pr, pi = np.cos(ang), np.sin(ang)
    out_r = rdtype.type(pr) * phr - rdtype.type(pi) * phi
    out_i = rdtype.type(pr) * phi + rdtype.type(pi) * phr
    return out_r.reshape(shape), out_i.reshape(shape)

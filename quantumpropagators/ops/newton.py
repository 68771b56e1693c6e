"""Newton-with-restarted-Arnoldi propagation kernel.

Evaluates ``Ψ ← f(H·dt) Ψ`` for an arbitrary analytic ``f`` (default
``exp(-i z)``, i.e. Schrödinger evolution; works for non-Hermitian H /
Liouvillians) via restarted Arnoldi with Newton-polynomial interpolation
at Leja-ordered Ritz points — the algorithm of reference
``src/newton.jl``.

Work split (SURVEY §3.2, §7.4.4): the O(N)-sized work per restart —
``m_max`` matvecs + Gram-Schmidt (CGS2) inside :func:`..arnoldi.arnoldi`,
plus the rank-(m+1) state updates — runs jitted on device; the O(m²)
scalar bookkeeping (Hessenberg eigenvalues, greedy Leja ordering,
divided differences, small polynomial recurrences) stays on the host in
complex128.  The data-dependent restart loop is host-driven: restart
granularity is coarse (hundreds of matvecs per restart), so host control
flow costs nothing while keeping every shape static.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .arnoldi import arnoldi, diagonalize_hessenberg_matrix

__all__ = ["newton_apply", "extend_leja", "extend_newton_coeffs", "NewtonInfo"]


def _default_func(z):
    return np.exp(-1j * z)


def extend_leja(leja: np.ndarray, newpoints: np.ndarray, n_use: int) -> np.ndarray:
    """Append ``n_use`` points from ``newpoints`` to the Leja sequence.

    Greedy max-product selection: each added point maximizes
    ``Πⱼ |z - lejaⱼ|^(1/(n+n_use))`` over the remaining candidates (the
    damped exponent prevents overflow; reference
    ``src/newton.jl:97-148``).  If the sequence is empty it is seeded
    with the candidate of largest magnitude.  Returns the extended
    (copied) sequence.
    """
    leja = np.asarray(leja, dtype=np.complex128)
    pts = np.array(newpoints, dtype=np.complex128)
    n = len(leja)
    out = list(leja)
    take = n_use
    if n == 0:
        i0 = int(np.argmax(np.abs(pts)))
        out.append(pts[i0])
        pts = np.delete(pts, i0)
        take -= 1
    exponent = 1.0 / (n + n_use)
    for _ in range(take):
        # product over existing Leja points, damped to avoid overflow
        dists = np.abs(pts[:, None] - np.asarray(out)[None, :]) ** exponent
        p = np.prod(dists, axis=1)
        i_max = int(np.argmax(p))
        out.append(pts[i_max])
        pts = np.delete(pts, i_max)
    return np.asarray(out, dtype=np.complex128)


def extend_newton_coeffs(
    a: np.ndarray,
    leja: np.ndarray,
    func: Callable,
    n_leja: int,
    radius: float,
) -> np.ndarray:
    """Extend Newton divided-difference coefficients of ``func`` at the
    (radius-normalized) Leja points from ``len(a)`` to ``n_leja``
    (reference ``src/newton.jl:176-214``).

    The divided differences are accumulated with each factor normalized
    by ``radius`` to keep magnitudes bounded; underflow of the product
    (|d| ≤ 1e-200) raises, as in the reference.
    """
    a = list(np.asarray(a, dtype=np.complex128))
    n_a = len(a)
    if radius <= 0:
        raise ValueError("radius must be positive")
    n0 = n_a
    if n_a == 0:
        a.append(np.complex128(func(leja[0])))
        n0 = 1
    for k in range(n0, n_leja):
        d = np.complex128(1.0)
        pn = np.complex128(0.0)
        for n in range(1, k):
            d = d * (leja[k] - leja[n - 1]) / radius
            pn = pn + a[n] * d
        d = d * (leja[k] - leja[k - 1]) / radius
        if abs(d) <= 1e-200:
            raise FloatingPointError("Divided differences too small")
        a.append((np.complex128(func(leja[k])) - a[0] - pn) / d)
    return np.asarray(a, dtype=np.complex128)


@jax.jit
def _accumulate(Psi, q, P):
    """``Psi + Σᵢ P[i] q[i]`` as one rank-k update (device)."""
    return Psi + jnp.tensordot(P.astype(q.dtype), q, axes=(0, 0))


def _host_c128(x_dev) -> np.ndarray:
    """Device→host complex transfer via two REAL planes.  The TPU
    backend in this environment cannot transfer complex buffers across
    the jit boundary (real planes only); splitting re/im on device and
    recombining on the host is equivalent on every backend."""
    return np.asarray(jnp.real(x_dev), dtype=np.float64) + 1j * np.asarray(
        jnp.imag(x_dev), dtype=np.float64
    )


def _dev_complex(x_np, dtype):
    """Host complex → device via two real planes + in-graph
    ``lax.complex`` (see :func:`_host_c128`)."""
    x_np = np.asarray(x_np, dtype=np.complex128)
    rdt = jnp.finfo(dtype).dtype
    return jax.lax.complex(
        jnp.asarray(x_np.real, dtype=rdt), jnp.asarray(x_np.imag, dtype=rdt)
    )


@jax.jit
def _norm(x):
    return jnp.sqrt(jnp.real(jnp.vdot(x, x)))


class NewtonInfo:
    """Diagnostics from a :func:`newton_apply` call (the inspectable
    fields of the reference's ``NewtonWrk``)."""

    def __init__(self):
        self.restarts = 0
        self.n_leja = 0
        self.n_a = 0
        self.radius = 0.0
        self.matvecs = 0


def newton_apply(
    op,
    psi,
    dt: float,
    *,
    func: Optional[Callable] = None,
    m_max: int = 10,
    norm_min: float = 1e-14,
    relerr: float = 1e-12,
    max_restarts: int = 50,
    info: Optional[NewtonInfo] = None,
):
    """Evaluate ``f(H·dt)|psi⟩`` by restarted Arnoldi + Newton
    interpolation (reference ``src/newton.jl:246-385``).

    Per restart ``s``: an ``m``-step Arnoldi factorization of ``H·dt``
    from the current residual vector; Ritz values of all leading
    sub-blocks are appended to a global Leja sequence; Newton
    divided-difference coefficients of ``f`` are extended; the Newton
    polynomial is evaluated *in the small extended Hessenberg matrix* to
    give the Krylov-basis coordinates ``P`` of this restart's correction
    ``ΔΨ = Σ Pᵢ qᵢ``; the next residual is the last Newton basis
    polynomial applied to the start vector.  Converged when
    ``β·|a_last| / (1 + ‖Ψ‖) < relerr``.
    """
    if func is None:
        func = _default_func
    if info is None:
        info = NewtonInfo()
    N = psi.shape[-1]
    if m_max <= 2:
        raise ValueError("Newton propagation requires m_max > 2")
    if m_max >= N:
        m_max = N - 1
        if m_max <= 2:
            raise ValueError("Newton propagation requires state dimension > 2")
    dt = float(dt)
    if dt == 0.0:
        raise ValueError("dt must be nonzero")

    leja = np.zeros((0,), dtype=np.complex128)
    a = np.zeros((0,), dtype=np.complex128)
    radius = 0.0

    beta = float(_norm(psi))
    v = psi / beta
    Psi = None
    m = m_max
    s = 0
    while True:
        Hess_dev, q, m_eff = arnoldi(
            op, v, m, dt, extended=True, norm_min=norm_min
        )
        info.matvecs += m
        m = m_eff
        Hess = _host_c128(Hess_dev)
        if m == 1 and s == 0:
            # v is an eigenvector: f(H)Ψ = f(λ)Ψ
            lam = beta * Hess[0, 0]
            result = _dev_complex(func(lam), q.dtype) * psi
            info.restarts = s
            info.radius = radius
            return result

        ritz = diagonalize_hessenberg_matrix(Hess, m, accumulate=True)
        if s == 0:
            radius = 1.2 * float(np.max(np.abs(ritz)))

        n_s = len(leja)
        leja = extend_leja(leja, ritz, m)
        n_leja = len(leja)
        a = extend_newton_coeffs(a, leja, func, n_leja, radius)
        assert len(a) == n_leja

        # Evaluate the Newton polynomial in the (m+1)x(m+1) extended
        # Hessenberg matrix (host, small dense)
        Hm = Hess[: m + 1, : m + 1]
        R = np.zeros(m + 1, dtype=np.complex128)
        P = np.zeros(m + 1, dtype=np.complex128)
        R[0] = beta
        P[:] = a[n_s] * R
        for k in range(1, m):
            z = leja[n_s + k - 1]
            R = (Hm @ R - z * R) / radius
            P += a[n_s + k] * R

        delta_coords = _dev_complex(P[:m], q.dtype)
        if s == 0:
            Psi = jnp.tensordot(delta_coords.astype(q.dtype), q[:m], axes=(0, 0))
        else:
            Psi = _accumulate(Psi, q[:m], delta_coords)

        # Next restart vector: last Newton basis polynomial applied to v
        R = (Hm @ R - leja[n_s + m - 1] * R) / radius
        beta = float(np.linalg.norm(R))
        if beta <= norm_min:
            break  # residual vanished: expansion is exact
        R = R / beta
        v = jnp.tensordot(_dev_complex(R, q.dtype), q[: m + 1], axes=(0, 0))

        psi_relerr = beta * abs(a[n_leja - 1]) / (1.0 + float(_norm(Psi)))
        if psi_relerr < relerr:
            break
        s += 1
        if s > max_restarts:
            raise RuntimeError(
                f"Newton propagation did not converge within {max_restarts} restarts"
            )

    info.restarts = s
    info.n_leja = len(leja)
    info.n_a = len(a)
    info.radius = radius
    return Psi

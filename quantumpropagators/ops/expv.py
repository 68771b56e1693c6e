"""Krylov ``expv``: apply ``exp(-i dt H)`` through a single Arnoldi
factorization, without forming the propagator matrix.

The analogue of the reference's ExponentialUtilities backend
(``ext/QuantumPropagatorsExponentialUtilitiesExt.jl:74-210``): build an
``m``-dimensional Krylov subspace, exponentiate the small Hessenberg
matrix on the host, and combine ``Ψ' = β · Q† exp(-i dt Hess) e₁``.

Modes (mirroring the reference's ``:happy_breakdown`` vs
``:error_estimate``): with ``tol=None`` a fixed Krylov dimension ``m``
is used (stopping early only on happy breakdown); with a tolerance, the
generalized-residual error estimate ``β·|dt·h_{m+1,m}·[exp]_{m,1}|`` is
evaluated and ``m`` is doubled until it passes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from .arnoldi import arnoldi

__all__ = ["expv_apply"]


def _combine(q, weights):
    return jnp.tensordot(jnp.asarray(weights).astype(q.dtype), q, axes=(0, 0))


def expv_apply(
    op,
    psi,
    dt: float,
    *,
    m: int = 30,
    func=None,
    tol: Optional[float] = None,
    m_max: int = 120,
    norm_min: float = 1e-15,
):
    """Evaluate ``func(H·dt)|psi⟩`` (default ``exp(-i H dt)``) in one
    Krylov subspace.

    ``m`` is the (initial) Krylov dimension; with ``tol`` given, the
    dimension doubles until the standard Krylov error estimate drops
    below ``tol`` (capped at ``m_max``).
    """
    if func is None:
        func = lambda M: scipy.linalg.expm(-1j * M)
    beta = float(jnp.sqrt(jnp.real(jnp.vdot(psi, psi))))
    if beta == 0.0:
        return psi
    v = psi / beta
    N = psi.shape[-1]
    m = min(m, N)
    while True:
        Hess_dev, q, m_eff = arnoldi(op, v, m, dt, extended=True, norm_min=norm_min)
        Hess = np.asarray(Hess_dev)
        Hm = Hess[:m_eff, :m_eff]
        E = func(Hm)
        err = None
        happy = m_eff < m
        if not happy and tol is not None and m_eff >= 1:
            h_next = abs(Hess[m_eff, m_eff - 1]) if m_eff < Hess.shape[0] else 0.0
            err = beta * h_next * abs(E[m_eff - 1, 0])
            if err > tol and m < min(m_max, N):
                m = min(2 * m, m_max, N)
                continue
        weights = beta * E[:, 0]
        return _combine(q[:m_eff], weights)

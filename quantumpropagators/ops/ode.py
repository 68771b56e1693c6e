"""Adaptive Runge-Kutta integration (Dormand-Prince 5(4)) in JAX.

The in-house replacement for the reference's OrdinaryDiffEq weak
dependency (``ext/QuantumPropagatorsODEExt.jl``): a classic embedded
DP5(4) pair with a PI step-size controller, implemented as a
``lax.while_loop`` so an entire adaptive integration over a time
interval is one compiled device computation.  The RHS ``f(t, y)`` must
be JAX-traceable; for quantum propagation it is
``f(t, Ψ) = -i·H(t)·Ψ`` with ``H(t)`` built from the coefficient
algebra (see :mod:`quantumpropagators.propagators.ode`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dopri5_integrate"]

# Dormand-Prince 5(4) Butcher tableau
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = _A[6, :].copy()  # 5th order solution (FSAL)
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_E = _B5 - np.append(_B4[:6], _B4[6])  # error weights (length 7)


def dopri5_integrate(
    f: Callable,
    y0,
    t0,
    t1,
    *,
    rtol: float = 1e-8,
    atol: float = 1e-8,
    first_step=None,
    max_steps: int = 10_000,
    safety: float = 0.9,
):
    """Integrate ``dy/dt = f(t, y)`` from ``t0`` to ``t1`` adaptively.

    Supports backward integration (``t1 < t0``).  Returns ``y(t1)``.
    Raises no data-dependent Python errors; if the step limit is hit the
    result is whatever was reached (check via the optional stats).
    """
    rdtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    t0 = jnp.asarray(t0, dtype=rdtype)
    t1 = jnp.asarray(t1, dtype=rdtype)
    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)
    if first_step is None:
        h0 = span / 100.0
    else:
        h0 = jnp.asarray(abs(first_step), dtype=rdtype)

    A = jnp.asarray(_A, dtype=rdtype)
    C = jnp.asarray(_C, dtype=rdtype)
    B5 = jnp.asarray(_B5, dtype=rdtype)
    E = jnp.asarray(_E, dtype=rdtype)

    def rk_step(t, y, h, k0):
        ks = [k0]
        for i in range(1, 7):
            ti = t + C[i] * h
            yi = y
            for j in range(i):
                yi = yi + (h * A[i, j]) * ks[j]
            ks.append(f(ti, yi))
        y5 = y
        err = jnp.zeros_like(y)
        for i in range(7):
            y5 = y5 + (h * B5[i]) * ks[i]
            err = err + (h * E[i]) * ks[i]
        return y5, err, ks[6]  # FSAL: k7 = f(t+h, y5)

    def err_norm(err, y, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        r = jnp.abs(err) / scale
        return jnp.sqrt(jnp.mean(jnp.square(r)))

    def cond(state):
        t, y, h, k, done, n, err_prev = state
        return (~done) & (n < max_steps)

    def body(state):
        t, y, h, k, done, n, err_prev = state
        h_signed = direction * jnp.minimum(h, jnp.abs(t1 - t))
        last = jnp.abs(t1 - t) <= h
        y_new, err, k_new = rk_step(t, y, h_signed, k)
        en = err_norm(err, y, y_new)
        accept = en <= 1.0
        # PI controller (order 5 → exponent 1/5, with previous error)
        en_c = jnp.maximum(en, 1e-10)
        factor = safety * en_c ** -0.7 / 5.0 ** 0 * jnp.maximum(err_prev, 1e-10) ** 0.08
        factor = safety * en_c ** (-0.7 / 5.0) * jnp.maximum(err_prev, 1e-10) ** (0.08)
        factor = jnp.clip(factor, 0.2, 5.0)
        h_next = jnp.abs(h_signed) * factor
        t_next = jnp.where(accept, t + h_signed, t)
        y_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), y_new, y
        )
        k_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), k_new, k
        )
        done_next = accept & last
        err_next = jnp.where(accept, en_c, err_prev)
        return (t_next, y_next, h_next, k_next, done_next, n + 1, err_next)

    k0 = f(t0, y0)
    state = (
        t0,
        y0,
        h0,
        k0,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(1.0, rdtype),
    )
    t, y, h, k, done, n, _ = jax.lax.while_loop(cond, body, state)
    return y

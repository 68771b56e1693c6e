"""ODE propagator (reference ``src/ode_function.jl`` +
``ext/QuantumPropagatorsODEExt.jl``).

Integrates ``i ∂ₜ|Ψ⟩ = H(t)|Ψ⟩`` with the in-house adaptive
Dormand-Prince integrator (:mod:`quantumpropagators.ops.ode`).  Two
variants, as in the reference:

- ``pwc=True`` (default; the reference's ``ODEPWCPropagator``): the
  generator is held piecewise-constant on each interval (coefficients
  from the midpoint parameter dict), so arbitrary host-side controls
  work; the integrator adapts *within* the interval.
- ``pwc=False`` (``ODEContinuousPropagator``): true time-continuous
  ``H(t)`` — every amplitude must be a JAX-traceable callable of ``t``,
  since the coefficient evaluation happens inside the compiled RHS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.generators import Generator
from ..ops.ode import dopri5_integrate
from ..ops.operators import apply
from ..utils.timings import TimingData
from .base import register_method
from .pwc import IntervalStepper, PWCPropagatorBase

__all__ = [
    "ODEPropagator",
    "ODEPWCPropagator",
    "ODEContinuousPropagator",
    "ode_function",
]


def ode_function(generator, *, c=-1j):
    """Wrap ``generator`` as a traced RHS ``f(t, Ψ) = c·H(t)·Ψ``
    (reference ``src/ode_function.jl:53-93``).

    Requires all amplitudes to be JAX-traceable callables of ``t``.
    """
    if isinstance(generator, Generator):
        ops = generator.ops
        amplitudes = generator.amplitudes
        off = generator.drift_offset

        def f(t, psi):
            out = None
            for i, op in enumerate(ops):
                y = apply(op, psi)
                if i >= off:
                    y = amplitudes[i - off](t) * y
                out = y if out is None else out + y
            return c * out

        return f

    def f_static(t, psi):
        return c * apply(generator, psi)

    return f_static


@partial(jax.jit, static_argnames=("rtol", "atol", "max_steps"))
def _pwc_ode_step(op, psi, t0, t1, rtol, atol, max_steps):
    f = lambda t, y: -1j * apply(op, y)
    return dopri5_integrate(f, psi, t0, t1, rtol=rtol, atol=atol, max_steps=max_steps)


class _ODEBase:
    def _init_ode(self, rtol, atol, max_steps):
        self.rtol = float(rtol)
        self.atol = float(atol)
        self.max_steps = int(max_steps)
        self.timing_data = TimingData()

    def _interval_bounds(self, n):
        if self.backward:
            return float(self.tlist[n + 1]), float(self.tlist[n])
        return float(self.tlist[n]), float(self.tlist[n + 1])


class ODEPWCPropagator(_ODEBase, PWCPropagatorBase):
    """Piecewise-constant ODE propagation (reference
    ``ODEPWCPropagator``, ext ``:180-191``): the generator is frozen on
    each interval; adaptive integration within the interval."""

    def __init__(
        self,
        state,
        generator,
        tlist,
        *,
        backward: bool = False,
        parameters=None,
        rtol: float = 1e-10,
        atol: float = 1e-10,
        max_steps: int = 100_000,
        **_ignored,
    ):
        PWCPropagatorBase.__init__(
            self, state, generator, tlist, backward=backward, parameters=parameters
        )
        self._init_ode(rtol, atol, max_steps)

    def prop_step(self):
        if self._done:
            return None
        with self.timing_data.section("prop_step"):
            n = self.n
            t0, t1 = self._interval_bounds(n)
            op = self._interval_operator(n)
            self.state = _pwc_ode_step(
                op, self.state, t0, t1, self.rtol, self.atol, self.max_steps
            )
            self._advance()
            return self.state


class ODEContinuousPropagator(_ODEBase, IntervalStepper):
    """Time-continuous ODE propagation (reference
    ``ODEContinuousPropagator``, ext ``:169-178``): ``H(t)`` is
    evaluated inside the compiled RHS, so every amplitude must be a
    JAX-traceable callable of ``t``.  Not a piecewise propagator."""

    def __init__(
        self,
        state,
        generator,
        tlist,
        *,
        backward: bool = False,
        parameters=None,
        rtol: float = 1e-10,
        atol: float = 1e-10,
        max_steps: int = 100_000,
        **_ignored,
    ):
        IntervalStepper.__init__(
            self, state, generator, tlist, backward=backward, parameters=parameters
        )
        self._init_ode(rtol, atol, max_steps)
        self._rhs = ode_function(generator)
        # fail fast with a clear message if the RHS is not traceable
        try:
            jax.eval_shape(
                self._rhs, jax.ShapeDtypeStruct((), jnp.float64), state
            )
        except Exception as exc:
            raise ValueError(
                "Time-continuous ODE propagation evaluates H(t) inside the "
                "compiled integrator, so every amplitude must be a "
                "JAX-traceable function of t (use jnp.* math). For "
                "host-side controls, use `pwc=True` (piecewise-constant "
                f"evaluation on interval midpoints). Underlying error: {exc}"
            ) from None
        self._cont_step = jax.jit(
            lambda psi, t0, t1: dopri5_integrate(
                self._rhs,
                psi,
                t0,
                t1,
                rtol=self.rtol,
                atol=self.atol,
                max_steps=self.max_steps,
            )
        )

    def prop_step(self):
        if self._done:
            return None
        with self.timing_data.section("prop_step"):
            t0, t1 = self._interval_bounds(self.n)
            self.state = self._cont_step(self.state, t0, t1)
            self._advance()
            return self.state


#: Union alias matching the reference's ``ODEPropagator``
ODEPropagator = (ODEPWCPropagator, ODEContinuousPropagator)


def _factory(state, generator, tlist, **kwargs):
    # reference default is time-continuous (`pwc=false`,
    # ext/QuantumPropagatorsODEExt.jl:101-106); `piecewise` is an alias.
    # If neither flag is given and the generator's amplitudes are not
    # JAX-traceable, fall back to the PWC variant with a warning
    # (host-side controls are the common case for users porting from
    # the reference).
    explicit = ("pwc" in kwargs) or ("piecewise" in kwargs)
    pwc = (kwargs.get("pwc") is True) or (kwargs.get("piecewise") is True)
    keep = ("backward", "parameters", "rtol", "atol", "max_steps")
    filtered = {k: v for k, v in kwargs.items() if k in keep}
    if pwc:
        return ODEPWCPropagator(state, generator, tlist, **filtered)
    try:
        return ODEContinuousPropagator(state, generator, tlist, **filtered)
    except ValueError:
        if explicit:
            raise
        import warnings

        warnings.warn(
            "ODE method: amplitudes are not JAX-traceable; falling back "
            "to piecewise-constant evaluation (pass pwc=True to silence, "
            "or use jnp.* math in controls for time-continuous H(t))"
        )
        return ODEPWCPropagator(state, generator, tlist, **filtered)


register_method("ode", _factory)

"""Krylov (expv) PWC propagator.

The analogue of the reference's ExponentialUtilities propagator
(``src/exponential_utilities_propagator.jl`` +
``ext/QuantumPropagatorsODEExt...ExponentialUtilitiesExt.jl``): each
interval applies ``exp(-i dt H_n)`` via a single Krylov subspace
(:func:`~quantumpropagators.ops.expv.expv_apply`) — no restart loop, no
spectral-range estimate, works for any generator.
"""

from __future__ import annotations

from typing import Optional

from ..ops.expv import expv_apply
from ..utils.timings import TimingData
from .base import register_method
from .pwc import PWCPropagatorBase

__all__ = ["KrylovPropagator"]


class KrylovPropagator(PWCPropagatorBase):
    def __init__(
        self,
        state,
        generator,
        tlist,
        *,
        backward: bool = False,
        parameters=None,
        m_max: int = 30,
        tol: Optional[float] = None,
        norm_min: float = 1e-15,
        **_ignored,
    ):
        super().__init__(
            state, generator, tlist, backward=backward, parameters=parameters
        )
        self.m_max = int(m_max)
        self.tol = tol
        self.norm_min = float(norm_min)
        self.timing_data = TimingData()

    def prop_step(self):
        if self._done:
            return None
        with self.timing_data.section("prop_step"):
            n = self.n
            op = self._interval_operator(n)
            dt = float(self.tlist[n + 1] - self.tlist[n])
            if self.backward:
                dt = -dt
            self.state = expv_apply(
                op,
                self.state,
                dt,
                m=self.m_max,
                tol=self.tol,
                norm_min=self.norm_min,
            )
            self.timing_data.count("matvec", self.m_max)
            self._advance()
            return self.state


def _factory(state, generator, tlist, **kwargs):
    keep = ("backward", "parameters", "m_max", "tol", "norm_min")
    return KrylovPropagator(
        state, generator, tlist, **{k: v for k, v in kwargs.items() if k in keep}
    )


register_method("krylov", _factory)
register_method("expv", _factory)

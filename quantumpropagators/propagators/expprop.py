"""Dense matrix-exponential PWC propagator (reference
``src/exp_propagator.jl``).

The debug/small-system method: each step forms ``U = f(H·dt)`` by dense
matrix exponentiation on device and applies it.  ``convert_state`` /
``convert_operator`` escape hatches allow densifying unusual types
before ``expm`` (reference ``src/exp_propagator.jl:35-39``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..ops.operators import to_dense
from ..utils.timings import TimingData
from .base import register_method
from .pwc import PWCPropagatorBase

__all__ = ["ExpPropagator"]


@partial(jax.jit, static_argnames=("forward",))
def _exp_step(op, psi, dt, forward):
    H = op.to_dense() if hasattr(op, "to_dense") else jnp.asarray(op)
    sign = 1.0 if forward else -1.0
    U = jsl.expm(-1j * H * (sign * dt))
    return U @ psi


class ExpPropagator(PWCPropagatorBase):
    def __init__(
        self,
        state,
        generator,
        tlist,
        *,
        backward: bool = False,
        parameters=None,
        func: Optional[Callable] = None,
        convert_state: Optional[Callable] = None,
        convert_operator: Optional[Callable] = None,
        **_ignored,
    ):
        super().__init__(
            state, generator, tlist, backward=backward, parameters=parameters
        )
        self.func = func
        self.convert_state = convert_state
        self.convert_operator = convert_operator
        self.timing_data = TimingData()

    def prop_step(self):
        if self._done:
            return None
        with self.timing_data.section("prop_step"):
            n = self.n
            op = self._interval_operator(n)
            dt = float(self.tlist[n + 1] - self.tlist[n])
            psi = self.state
            if self.convert_state is not None:
                psi = self.convert_state(psi)
            if self.convert_operator is not None:
                op = self.convert_operator(op)
            if self.func is None:
                psi = _exp_step(op, psi, dt, not self.backward)
            else:
                H = np.asarray(to_dense(op))
                sign = -1.0 if self.backward else 1.0
                U = self.func(H * (sign * dt))
                psi = jnp.asarray(U) @ psi
            self.state = psi
            self._advance()
            return self.state


def _factory(state, generator, tlist, **kwargs):
    keep = ("backward", "parameters", "func", "convert_state", "convert_operator")
    return ExpPropagator(
        state, generator, tlist, **{k: v for k, v in kwargs.items() if k in keep}
    )


register_method("expprop", _factory)

"""Krotov's method on the stateful propagator API.

First-order Krotov optimal control: sequential-in-time pulse updates
interleaved with forward propagation, using the backward-propagated
co-state — the workflow the reference framework was designed to serve
(its `reinit_prop!` fast path exists exactly for this; here
`qp.reinit_prop` + mutable `propagator.parameters` play that role).

Monotonically convergent: each iteration propagates the co-state
backward under the OLD pulse (storing the trajectory), then sweeps
forward updating each interval's pulse value from the local overlap
Im⟨χ(t)|H₁|ψ(t)⟩ before stepping through it.

Run: ``python examples/krotov_state_transfer.py``
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import quantumpropagators as qp


def main():
    sx = jnp.asarray([[0, 1], [1, 0]], dtype=complex)
    sz = jnp.asarray([[1, 0], [0, -1]], dtype=complex)
    H0 = 0.5 * sz
    tlist = np.linspace(0, 5.0, 101)
    psi0 = jnp.asarray([1, 0], dtype=complex)
    target = jnp.asarray([0, 1], dtype=complex)

    guess = lambda t: 0.2 * qp.flattop(t, T=5.0, t_rise=1.0)
    gen = qp.hamiltonian(H0, (sx, guess))
    lam = 2.0  # Krotov step-size parameter (1/λ update weight)

    # propagators reused across iterations; control values live in
    # .parameters (the optimal-control aliasing contract)
    fwd = qp.init_prop(psi0, gen, tlist, method="cheby",
                       control_ranges=qp.IdDict([(guess, (-3.0, 3.0))]))
    bwd = qp.init_prop(target, gen, tlist, method="cheby", backward=True,
                       control_ranges=qp.IdDict([(guess, (-3.0, 3.0))]))
    control = fwd.controls[0]
    eps = np.asarray(fwd.parameters[control]).copy()

    def fidelity(pulse):
        fwd.parameters[control] = pulse
        qp.reinit_prop(fwd, psi0)
        while fwd.prop_step() is not None:
            pass
        return abs(complex(jnp.vdot(target, fwd.state))) ** 2

    print(f"guess fidelity: {fidelity(eps):.6f}")

    nt = len(tlist)
    for it in range(30):
        # backward propagation of the co-state under the CURRENT pulse,
        # storing chi at every grid point
        bwd.parameters[control] = eps
        qp.reinit_prop(bwd, target)
        chi = np.zeros((nt, 2), dtype=complex)
        chi[-1] = np.asarray(bwd.state)
        n = nt - 2
        while bwd.prop_step() is not None:
            chi[n] = np.asarray(bwd.state)
            n -= 1

        # forward sweep with sequential pulse updates
        new_eps = eps.copy()
        fwd.parameters[control] = new_eps  # aliased: updates take effect
        qp.reinit_prop(fwd, psi0)
        for i in range(nt - 1):
            psi = np.asarray(fwd.state)
            overlap = chi[i].conj() @ np.asarray(sx) @ psi
            new_eps[i] = eps[i] + (1.0 / lam) * np.imag(overlap)
            fwd.prop_step()
        F = abs(complex(jnp.vdot(target, fwd.state))) ** 2
        eps = new_eps
        if it % 5 == 0 or F > 1 - 1e-6:
            print(f"iter {it:2d}: fidelity = {F:.8f}")
        if F > 1 - 1e-6:
            break

    print(f"final fidelity: {F:.8f}")
    assert F > 0.999, "Krotov optimization failed to converge"


if __name__ == "__main__":
    main()

"""Round-4 probe: is the MXU EXACT for σ-aligned small-mantissa
inputs?

Round 3 measured "MXU HIGHEST ≈ 5.6e-8 relative even for grid-aligned
inputs" — but at WHICH granularity?  If f32 values quantized to a
k-bit mantissa grid (k ≤ 8 → bf16-exact operands; partial products
exact, f32 accumulation of aligned values representable) go through
the MXU exactly, then the dd kernel's HI-plane lane-flip sum — its
single largest VPU cost (~147 op-equivalents/elem/order of lane
rolls) — can ride 2–3 aligned matmuls plus one HIGHEST matmul for the
sub-2⁻²⁴ residue, the way `lomxu` already handles the lo plane.

Tests, per mantissa width k ∈ {4, 7, 8, 12, 16, 24} and precision
∈ {DEFAULT, HIGHEST}: max |MXU − exact-f64| over a (1024, 128) ×
(128, 128) 0/1-adjacency product of σ-aligned values.

Run: ``python docs/profiling/probe_mxu_grid_r4.py``
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    R = 1024
    v = rng.uniform(-1.0, 1.0, size=(R, 128)).astype(np.float32)
    # 7-bit 0/1 lane-flip adjacency (each column: 7 ones)
    A = np.zeros((128, 128), dtype=np.float32)
    for l in range(128):
        for j in range(7):
            A[l ^ (1 << j), l] = 1.0
    Aj = jnp.asarray(A)

    from functools import partial

    @partial(jax.jit, static_argnames=("prec",))
    def mm(q, prec):
        return jnp.dot(q, Aj, preferred_element_type=jnp.float32,
                       precision=prec)

    for k in (4, 7, 8, 12, 16, 24):
        g = np.float32(2.0 ** -k)
        c = np.float32(1.5 * 2.0 ** 23) * g
        q = ((v + c) - c).astype(np.float32)  # multiples of g, |q| <= 1
        exact = q.astype(np.float64) @ A.astype(np.float64)
        for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
            got = np.asarray(mm(jnp.asarray(q), prec), np.float64)
            err = np.abs(got - exact).max()
            log(f"k={k:2d} bits, {str(prec):10s}: max err = {err:.3e}"
                f"  ({'EXACT' if err == 0.0 else 'inexact'})")


if __name__ == "__main__":
    main()

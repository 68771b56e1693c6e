"""Weak-scaling harness: sharded Chebyshev throughput vs device count.

Weak scaling in the BASELINE sense: per-device problem size constant
(L grows by 1 per device-count doubling), efficiency = nnz/s per device
relative to 1 device.  Runs on real chips or virtual CPU devices:

``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
  python scaling.py --L-base 14``

Prints one JSON line with the efficiency table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_config(n_dev: int, L: int, steps: int, dt: float):
    import jax
    import jax.numpy as jnp

    from quantumpropagators import Operator
    from quantumpropagators.models.lattice import transverse_field_ising
    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.parallel.mesh import chain_mesh, replicate, shard_vector
    from quantumpropagators.parallel.sharded_chain import (
        make_sharded_cheby_step,
        prepare_sharded_operator,
    )

    J, g, h = 1.0, 1.2, 0.3
    H_diag, H_x = transverse_field_ising(L, J=J, g=g, h=h, dtype=jnp.complex64)
    op = Operator([H_diag, H_x], np.array([1.0], dtype=np.float32))
    op_sh = prepare_sharded_operator(op, n_dev)
    bound = J * (L - 1) + abs(h) * L + g * L
    e_min, delta = -bound, 2 * bound
    coeffs = jnp.asarray(cheby_coeffs(delta, dt), dtype=jnp.float32)
    mesh = chain_mesh(n_dev)
    step = make_sharded_cheby_step(mesh, op_sh, delta=delta, e_min=e_min, dt=dt)

    rng = np.random.default_rng(0)
    psi = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
    psi = jnp.asarray(psi / np.linalg.norm(psi), dtype=jnp.complex64)
    v = shard_vector(mesh, psi)
    c = replicate(mesh, coeffs)

    def run(n):
        nonlocal v
        for _ in range(n):
            v = step(op_sh, v, c)
        return float(jnp.linalg.norm(v))

    run(2)  # warm
    t0 = time.perf_counter()
    run(steps)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(3 * steps)
    t3 = time.perf_counter() - t0
    elapsed = max(t3 - t1, 1e-9)
    matvecs = 2 * steps * (coeffs.shape[0] - 1)
    nnz = (L + 1) * 2 ** L
    return matvecs * nnz / elapsed / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L-base", type=int, default=14)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force the CPU backend with N virtual devices "
                         "(in-process: the axon site shim overrides "
                         "JAX_PLATFORMS env)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    for n in counts:
        L = args.L_base + int(np.log2(n))
        gnnz = run_config(n, L, args.steps, args.dt)
        results[n] = {"L": L, "gnnz_total": round(gnnz, 3),
                      "gnnz_per_dev": round(gnnz / n, 3)}
        log(f"{n} devices, L={L}: {gnnz:.2f} Gnnz/s total, "
            f"{gnnz/n:.2f}/device")
    base = results[counts[0]]["gnnz_per_dev"]
    base_total = results[counts[0]]["gnnz_total"]
    for n in counts:
        results[n]["efficiency"] = round(results[n]["gnnz_per_dev"] / base, 3)
        # on virtual devices sharing one physical socket, per-device
        # efficiency trivially reads 1/n; total-throughput retention is
        # the meaningful mechanics check there (SCALING.md)
        results[n]["total_retention"] = round(
            results[n]["gnnz_total"] / base_total, 3
        )
    shared = args.cpu > 0
    last = results[counts[-1]]
    out = {
        "metric": "weak_scaling_efficiency",
        "value": last["total_retention"] if shared else last["efficiency"],
        "unit": (
            "total nnz/s retention (virtual devices, shared hardware)"
            if shared else "nnz/s-per-device vs 1 device"
        ),
        "vs_baseline": last["efficiency"],
        "table": results,
        "note": (
            "virtual CPU devices share one socket: per-device efficiency "
            "reads ~1/n by construction; see SCALING.md for the "
            "hardware-efficiency model" if shared else None
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

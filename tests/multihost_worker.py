"""Worker process for the 2-process ``jax.distributed`` smoke test.

Run as ``python multihost_worker.py <coordinator_port> <process_id>``;
see ``test_multihost.py``.  Each process owns 2 virtual CPU devices, so
the pair forms a 4-device global mesh spanning a real process boundary
— the minimal version of the SURVEY §5 multi-host runtime (the
reference is single-process; `src/propagate.jl` never crosses a process
boundary).
"""

import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_ENABLE_X64"] = "1"

    import jax

    from quantumpropagators.parallel.distributed import initialize_multihost

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2, jax.local_devices()
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    import quantumpropagators as qp
    from quantumpropagators.models.lattice import transverse_field_ising
    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.ops.operators import to_dense
    from quantumpropagators.parallel.mesh import chain_mesh, replicate
    from quantumpropagators.parallel.sharded_chain import (
        make_sharded_cheby_step,
        prepare_sharded_operator,
    )

    L = 8
    N = 2 ** L
    H_diag, H_x = transverse_field_ising(
        L, J=1.0, g=1.2, h=0.3, dtype=jnp.complex128
    )
    op = qp.Operator([H_diag, H_x], np.array([1.0]))
    op_sh = prepare_sharded_operator(op, 4)

    dense = np.asarray(to_dense(op))
    evals = np.linalg.eigvalsh(dense)
    e_min, e_max = float(evals[0]), float(evals[-1])
    delta = e_max - e_min
    dt = 0.1
    coeffs = jnp.asarray(cheby_coeffs(delta, dt))

    rng = np.random.default_rng(7)  # same seed on both processes
    psi_np = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi_np /= np.linalg.norm(psi_np)

    mesh = chain_mesh(4)
    sharding = NamedSharding(mesh, P("x"))
    psi = jax.make_array_from_callback(
        (N,), sharding, lambda idx: psi_np[idx]
    )

    step = make_sharded_cheby_step(
        mesh, op_sh, delta=delta, e_min=e_min, dt=dt
    )
    out = step(op_sh, psi, replicate(mesh, coeffs))

    # exact oracle (scipy dense expm) computed redundantly per process
    from scipy.linalg import expm

    expected = expm(-1j * dt * dense) @ psi_np
    got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    err = float(np.abs(got - expected).max())
    assert err < 1e-10, f"cross-process sharded step error {err:.3e}"

    # one psum across the process boundary for good measure
    nrm = float(jnp.linalg.norm(out))
    assert abs(nrm - 1.0) < 1e-12, nrm

    jax.distributed.shutdown()
    print(f"OK process={pid} err={err:.3e}", flush=True)


if __name__ == "__main__":
    main()

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

    # banded df64 BSR step across the process boundary (BASELINE
    # config 5 at reference accuracy — the dd halo exchange crosses
    # the 2-process gap, round 4)
    import scipy.sparse as sp

    from quantumpropagators.parallel.sharded_bsr import (
        make_sharded_bsr_cheby_step_dd,
        partition_bsr_dd,
    )

    rngb = np.random.default_rng(13)  # same seed on both processes
    Rb, bb = 16, 8
    Nb = Rb * bb
    rows_b, cols_b, blocks_b = [], [], []
    for r in range(Rb):
        for c in (r - 1, r, r + 1):
            if 0 <= c < Rb:
                rows_b.append(r)
                cols_b.append(c)
                blocks_b.append(rngb.normal(size=(bb, bb)))
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(rows_b, minlength=Rb))]
    ).astype(np.int64)
    Ab = sp.bsr_matrix(
        (np.stack(blocks_b), np.asarray(cols_b), indptr), shape=(Nb, Nb)
    ).tocsr()
    Ab = (0.5 * (Ab + Ab.T)).tocsr()
    pb = partition_bsr_dd(Ab, 4, block_size=bb)
    assert pb.halo_blocks == 1
    bound_b = float(np.abs(Ab).sum(axis=1).max())
    delta_b, dt_b = 2 * bound_b, 0.05
    c64 = cheby_coeffs(delta_b, dt_b)
    c_h = jnp.asarray(c64.astype(np.float32))
    c_l = jnp.asarray((c64 - c64.astype(np.float32)).astype(np.float32))
    psib = rngb.standard_normal(Nb) + 1j * rngb.standard_normal(Nb)
    psib /= np.linalg.norm(psib)

    from quantumpropagators.ops.df64_sparse import dd_split_np as dd_split

    planes = (*dd_split(psib.real), *dd_split(psib.imag))
    state4 = tuple(
        jax.make_array_from_callback(
            (Nb,), NamedSharding(mesh, P("x")), lambda idx, p=p: p[idx]
        )
        for p in planes
    )
    dstep = make_sharded_bsr_cheby_step_dd(
        mesh, pb, delta=delta_b, e_min=-bound_b, dt=dt_b
    )
    outdd = dstep(pb, state4, c_h, c_l)
    g4 = [
        np.asarray(multihost_utils.process_allgather(o, tiled=True))
        for o in outdd
    ]
    gotdd = (
        g4[0].astype(np.float64) + g4[1]
    ) + 1j * (g4[2].astype(np.float64) + g4[3])
    exp_dd = expm(-1j * dt_b * Ab.toarray()) @ psib
    err_dd = float(np.abs(gotdd - exp_dd).max())
    assert err_dd < 1e-12, f"cross-process dd BSR step error {err_dd:.3e}"

    jax.distributed.shutdown()
    print(f"OK process={pid} err={err:.3e} dd_bsr_err={err_dd:.3e}",
          flush=True)


if __name__ == "__main__":
    main()

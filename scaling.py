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


def run_config_banded_dd(n_dev: int, R_local: int, b: int, steps: int,
                         dt: float, comm: str = "banded"):
    """Weak-scaling point for the BANDED df64 BSR regime (BASELINE
    config 5 at reference accuracy): block-tridiagonal operator,
    ``R_local`` block-rows per device, halo exchange of 1 block-row per
    side per matvec — the exchange volume is shard-size-independent, so
    this is the regime where the >=80% target is reachable
    (SCALING.md §2b).  Returns (Gnnz/s total, per-step error bound
    check vs f64 on the first step)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.parallel.mesh import chain_mesh, shard_vector
    from quantumpropagators.parallel.sharded_bsr import (
        make_sharded_bsr_cheby_step_dd,
        partition_bsr_dd,
    )

    R = R_local * n_dev
    rng = np.random.default_rng(17)
    # block-tridiagonal symmetric operator with dense random blocks;
    # comm='none' zeroes the hopping blocks (block-diagonal operator,
    # wb=0: same FLOPs/layout, NO exchange — the emulation-overhead
    # control)
    diags = rng.normal(size=(R, b, b))
    offd = rng.normal(size=(R - 1, b, b))
    if comm == "none":
        offd = np.zeros_like(offd)
    if R * b * b <= 1 << 22:
        # small shards: exercise the scipy partition path end to end
        rows, cols, blocks = [], [], []
        for r in range(R):
            for c in (r - 1, r, r + 1):
                if c < 0 or c >= R:
                    continue
                if c == r:
                    B = 0.5 * (diags[r] + diags[r].T)
                elif c == r + 1:
                    B = offd[r]
                else:
                    B = offd[c].T
                rows.append(r)
                cols.append(c)
                blocks.append(B)
        indptr = np.concatenate(
            [[0], np.cumsum(np.bincount(rows, minlength=R))]
        ).astype(np.int64)
        A = sp.bsr_matrix(
            (np.stack(blocks), np.asarray(cols), indptr),
            shape=(R * b, R * b)
        ).tocsr()
        pb = partition_bsr_dd(
            A, n_dev, block_size=b,
            mode=("allgather" if comm == "allgather" else "auto"),
        )
        if comm == "banded":
            # single device: the whole band is slab-local (halo 0)
            assert pb.halo_blocks == (1 if n_dev > 1 else 0)
        bound = float(np.abs(A).sum(axis=1).max())
    else:
        # representative shards (VERDICT r4 item 7: R_local >= 2^10):
        # build the partitioned blocked-ELL planes directly — the
        # scipy round trip would cost GBs of index copies for the
        # same layout
        from quantumpropagators.parallel.sharded_bsr import (
            PartitionedBSRdd,
        )

        k = 3
        blocks64 = np.zeros((R, k, b, b), dtype=np.float64)
        cols_np = np.zeros((R, k), dtype=np.int64)
        sym = 0.5 * (diags + diags.transpose(0, 2, 1))
        blocks64[:, 1] = sym
        cols_np[:, 1] = np.arange(R)
        blocks64[1:, 0] = offd.transpose(0, 2, 1)
        cols_np[1:, 0] = np.arange(R - 1)
        cols_np[0, 0] = 0  # padded (zero) block -> local col
        blocks64[: R - 1, 2] = offd
        cols_np[: R - 1, 2] = np.arange(1, R)
        cols_np[R - 1, 2] = R - 1  # padded
        Rl = R_local
        if comm == "allgather":
            wb = -1
            ext = cols_np.reshape(n_dev, Rl, k)  # global ids
        elif comm == "none":
            wb = 0
            ext = cols_np.reshape(n_dev, Rl, k) - (
                np.arange(n_dev)[:, None, None] * Rl
            )
            nzmask = np.abs(blocks64).max(axis=(2, 3)) > 0
            ext = np.where(nzmask.reshape(n_dev, Rl, k), ext, 0)
        else:
            wb = 1
            ext = cols_np.reshape(n_dev, Rl, k) - (
                np.arange(n_dev)[:, None, None] * Rl - wb
            )
            nzmask = np.abs(blocks64).max(axis=(2, 3)) > 0
            ext = np.where(
                nzmask.reshape(n_dev, Rl, k), ext, wb
            )
        bh = blocks64.astype(np.float32)
        bl = (blocks64 - bh.astype(np.float64)).astype(np.float32)
        pb = PartitionedBSRdd(
            blocks_hi=jnp.asarray(bh.reshape(n_dev, Rl, k, b, b)),
            blocks_lo=jnp.asarray(bl.reshape(n_dev, Rl, k, b, b)),
            cols=jnp.asarray(ext.astype(np.int32)),
            halo_blocks=wb,
            n_block_rows_local=Rl,
            n_devices=n_dev,
            block_size=b,
            shape=(R * b, R * b),
        )
        bound = float(
            np.abs(blocks64).sum(axis=(1, 3)).max()
        )
    e_min, delta = -bound, 2 * bound
    c64 = cheby_coeffs(delta, dt)
    c_h = jnp.asarray(c64.astype(np.float32))
    c_l = jnp.asarray((c64 - c64.astype(np.float32)).astype(np.float32))
    mesh = chain_mesh(n_dev)
    step = make_sharded_bsr_cheby_step_dd(
        mesh, pb, delta=delta, e_min=e_min, dt=dt
    )
    N = R * b
    psi = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi /= np.linalg.norm(psi)

    from quantumpropagators.ops.df64_sparse import dd_split_np as dd_split

    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )

    def run(n, st):
        for _ in range(n):
            st = step(pb, tuple(st), c_h, c_l)
        jax.block_until_ready(st)
        return st

    st = run(2, state4)  # warm
    t0 = time.perf_counter()
    run(steps, st)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(3 * steps, st)
    t3 = time.perf_counter() - t0
    elapsed = max(t3 - t1, 1e-9)
    matvecs = 2 * steps * (c64.shape[0] - 1)
    nnz = (3 * R - 2) * b * b
    return matvecs * nnz / elapsed / 1e9


def run_config_hypercube_dd(n_dev: int, L: int, steps: int, dt: float):
    """Weak-scaling point for the hypercube regime at REFERENCE
    accuracy: the sharded df64 fused kernel (4-plane device-bit
    ppermute exchange, f32 tail with hi-only exchange)."""
    import jax
    import jax.numpy as jnp

    from quantumpropagators.models.lattice import (
        chain_bonds, ising_diagonal_np,
    )
    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.parallel.mesh import chain_mesh, shard_vector
    from quantumpropagators.parallel.sharded_fused import (
        make_sharded_fused_cheby_step_dd,
    )

    J, g, h = 1.0, 1.2, 0.3
    diag64 = ising_diagonal_np(L, chain_bonds(L), J, h)
    bound = J * (L - 1) + abs(h) * L + g * L
    e_min, delta = -bound, 2 * bound
    beta = delta / 2.0 + e_min
    on_tpu = jax.devices()[0].platform == "tpu"
    mesh = chain_mesh(n_dev)
    step = make_sharded_fused_cheby_step_dd(
        mesh, L, g, delta=delta, e_min=e_min, dt=dt,
        tile_rows=(None if on_tpu else 8), interpret=not on_tpu,
    )

    from quantumpropagators.ops.df64_sparse import dd_split_np as dd_split

    rng = np.random.default_rng(0)
    psi = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
    psi /= np.linalg.norm(psi)
    c64 = cheby_coeffs(delta, dt)
    c_h, c_l = dd_split(c64)
    dmb_h, dmb_l = dd_split(diag64 - beta)
    dmb_h = shard_vector(mesh, dmb_h)
    dmb_l = shard_vector(mesh, dmb_l)
    state4 = tuple(
        shard_vector(mesh, p)
        for p in (*dd_split(psi.real), *dd_split(psi.imag))
    )

    def run(n, st):
        for _ in range(n):
            st = step(dmb_h, dmb_l, tuple(st), c_h, c_l)
        jax.block_until_ready(st)
        return st

    st = run(2, state4)
    t0 = time.perf_counter()
    run(steps, st)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(3 * steps, st)
    t3 = time.perf_counter() - t0
    elapsed = max(t3 - t1, 1e-9)
    matvecs = 2 * steps * (c64.shape[0] - 1)
    nnz = (L + 1) * 2 ** L
    return matvecs * nnz / elapsed / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L-base", type=int, default=14)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--mode",
                    choices=("hypercube", "hypercube-dd", "banded-dd",
                             "banded-vs-ag", "both", "all"),
                    default="both",
                    help="hypercube = spin-chain device-bit ppermute "
                         "exchange (ICI-bound regime, f32); "
                         "hypercube-dd = same regime at reference "
                         "accuracy (sharded df64 fused kernel); "
                         "banded-dd = df64 BSR halo exchange at "
                         "reference accuracy (the weak-scaling regime "
                         "of the >=80% BASELINE target); both = banded "
                         "headline + hypercube; all = all three")
    ap.add_argument("--R-local", type=int, default=64,
                    help="banded-dd: block-rows per device")
    ap.add_argument("--block", type=int, default=32,
                    help="banded-dd: block size")
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
    shared = args.cpu > 0
    import os as _os

    pinned = shared and len(_os.sched_getaffinity(0)) == 1

    def table_for(run_point):
        results = {}
        for n in counts:
            gnnz, label = run_point(n)
            results[n] = {
                "size": label, "gnnz_total": round(gnnz, 3),
                "gnnz_per_dev": round(gnnz / n, 3),
            }
            log(f"{n} devices, {label}: {gnnz:.2f} Gnnz/s total, "
                f"{gnnz/n:.2f}/device")
        base = results[counts[0]]["gnnz_per_dev"]
        base_total = results[counts[0]]["gnnz_total"]
        for n in counts:
            results[n]["efficiency"] = round(
                results[n]["gnnz_per_dev"] / base, 3
            )
            # on virtual devices sharing one physical socket, per-device
            # efficiency trivially reads 1/n; total-throughput retention
            # is the meaningful mechanics check there (SCALING.md)
            results[n]["total_retention"] = round(
                results[n]["gnnz_total"] / base_total, 3
            )
        return results

    tables = {}
    if args.mode == "banded-vs-ag":
        # controlled comparison at fixed n: same shards, same virtual-
        # device emulation overhead — ONLY the communication strategy
        # differs (edge-halo ppermute vs full all_gather).  This
        # isolates the exchange design where absolute virtual-CPU
        # retention cannot (per-device emulation overhead dominates it).
        n = counts[-1]
        res = {}
        for comm in ("banded", "allgather", "none"):
            gnnz = run_config_banded_dd(
                n, args.R_local, args.block, args.steps, args.dt,
                comm=comm,
            )
            res[comm] = round(gnnz, 4)
            log(f"{n} devices [{comm}]: {gnnz:.3f} Gnnz/s total")
        ratio = res["banded"] / max(res["allgather"], 1e-12)
        exch_cost = 1.0 - res["banded"] / max(res["none"], 1e-12)
        out = {
            "metric": "banded_halo_vs_allgather_gnnz_ratio",
            "value": round(ratio, 3),
            "unit": (
                f"banded-halo / all-gather total Gnnz/s at {n} shards "
                "(same shards, same emulation overhead; >1 = the "
                "shard-size-independent halo exchange wins)"
            ),
            "vs_baseline": None,
            "n_devices": n,
            "exchange_cost_vs_no_comm": round(exch_cost, 3),
            "note": (
                "'none' = block-diagonal (zero exchange, same FLOPs): "
                "banded/none isolates the halo-exchange cost from the "
                "virtual-device emulation overhead that dominates "
                "absolute retention on a shared host"
            ),
            "tables": {"banded": res["banded"],
                       "allgather": res["allgather"],
                       "no_comm": res["none"],
                       "size": f"R_local={args.R_local},b={args.block}"},
        }
        print(json.dumps(out), flush=True)
        return
    if args.mode in ("banded-dd", "both", "all"):
        log("=== banded-dd regime (reference accuracy, halo exchange) ===")
        tables["banded_dd"] = table_for(
            lambda n: (
                run_config_banded_dd(
                    n, args.R_local, args.block, args.steps, args.dt
                ),
                f"R_local={args.R_local},b={args.block}",
            )
        )
    if args.mode in ("hypercube", "both", "all"):
        log("=== hypercube regime (spin chain, device-bit exchange) ===")
        tables["hypercube"] = table_for(
            lambda n: (
                run_config(
                    n, args.L_base + int(np.log2(n)), args.steps, args.dt
                ),
                f"L={args.L_base + int(np.log2(n))}",
            )
        )
    if args.mode in ("hypercube-dd", "all"):
        log("=== hypercube regime at REFERENCE accuracy (sharded dd) ===")
        tables["hypercube_dd"] = table_for(
            lambda n: (
                run_config_hypercube_dd(
                    n, args.L_base + int(np.log2(n)), args.steps, args.dt
                ),
                f"L={args.L_base + int(np.log2(n))}",
            )
        )

    # headline: the BANDED regime — the structural regime of the >=80%
    # BASELINE target (edge-halo exchange, comm/compute → 0 with shard
    # size; SCALING.md §2b).  The hypercube (spin-model) regime is
    # ICI-bound by its full-shard exchange volume and is reported as a
    # secondary table with its own model-derived ceiling.
    head = (
        tables.get("banded_dd")
        or tables.get("hypercube")
        or tables["hypercube_dd"]
    )
    last = head[counts[-1]]
    # self-describing headline (VERDICT r4 item 7): on shared-socket
    # virtual devices the metric IS total-throughput retention and the
    # pass criterion is >= 1.0 (the n shards share one socket, so
    # per-device efficiency reads ~1/n by construction and is only
    # meaningful on real chips)
    out = {
        "metric": (
            "weak_scaling_total_retention_shared_virtual" if shared
            else "weak_scaling_efficiency"
        ),
        "value": last["total_retention"] if shared else last["efficiency"],
        "unit": (
            "total nnz/s at n devices / total nnz/s at 1 device "
            "(PASS >= 1.0: virtual devices share one socket)"
            if shared else "nnz/s-per-device vs 1 device (target >= 0.8)"
        ),
        "pass_criterion": (
            "retention >= 0.8 (single PINNED core: n-fold work on "
            "constant compute, so retention = exchange-mechanics "
            "efficiency, directly comparable to the real-chip 0.8 bar)"
            if pinned else (
                "retention >= 1.0 on shared-socket virtual devices"
                if shared else "efficiency >= 0.8 on real chips"
            )
        ),
        "vs_baseline": round(
            (last["total_retention"] if shared else last["efficiency"])
            / (0.8 if (pinned or not shared) else 1.0), 3
        ),
        "regime": next(
            r for r in ("banded_dd", "hypercube", "hypercube_dd")
            if r in tables
        ),
        "tables": tables,
        "note": (
            "virtual CPU devices share one socket: per-device efficiency "
            "reads ~1/n by construction; total-throughput retention >= 1 "
            "is the mechanics pass criterion there. Headline regime = "
            "banded df64 BSR (reference-accuracy halo exchange), the "
            "structural regime of the >=80% target; hypercube spin "
            "models are ICI-bound (see SCALING.md §2a for the measured "
            "model and levers)." if shared else None
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

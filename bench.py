"""Benchmark: Chebyshev propagation throughput on the flagship config.

Measures SpMV-equivalent throughput (Gnnz/s) of Chebyshev time
propagation of a transverse-field Ising chain (the BASELINE.md "1D spin
chain" config) on the available accelerator, and compares against a
reference-style CPU sparse (scipy CSR) matvec baseline — the closest
available stand-in for the Julia reference's SuiteSparse SpMV backend.

Prints ONE JSON line to stdout:
``{"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N}``
Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_tfim_scipy(L, J=1.0, g=1.2, h=0.3):
    """Reference-style CSR assembly of the same Hamiltonian."""
    import scipy.sparse as sp

    I = sp.identity(2, format="csr", dtype=np.complex128)
    X = sp.csr_matrix(np.array([[0, 1], [1, 0]], dtype=np.complex128))
    Z = sp.csr_matrix(np.array([[1, 0], [0, -1]], dtype=np.complex128))

    def site(op, i):
        out = sp.identity(1, format="csr", dtype=np.complex128)
        for j in range(L):
            out = sp.kron(out, op if j == i else I, format="csr")
        return out

    H = sp.csr_matrix((2 ** L, 2 ** L), dtype=np.complex128)
    for i in range(L - 1):
        H = H + J * (site(Z, i) @ site(Z, i + 1))
    for i in range(L):
        H = H + h * site(Z, i) + g * site(X, i)
    return H.tocsr()


def cpu_csr_baseline(L_ref: int) -> float:
    """scipy CSR matvec throughput in Gnnz/s (per core, like the
    reference's default single-threaded SpMV)."""
    H = build_tfim_scipy(L_ref)
    rng = np.random.default_rng(0)
    psi = rng.standard_normal(2 ** L_ref) + 1j * rng.standard_normal(2 ** L_ref)
    H @ psi  # warm
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        psi = H @ psi
    dt = time.perf_counter() - t0
    gnnz = reps * H.nnz / dt / 1e9
    log(f"CPU scipy CSR baseline: L={L_ref}, nnz={H.nnz}, {gnnz:.3f} Gnnz/s")
    return gnnz


def bench_rabi():
    """BASELINE config 1: 2-level Rabi, 100-step Chebyshev — steps/s.

    A latency metric (N=2 has no FLOPs to speak of): the whole 100-step
    propagation is one fused ``lax.scan`` on device (the TPU-native
    shape of the reference's host step loop, ``src/propagate.jl:283``),
    timed end to end.
    """
    import jax
    import jax.numpy as jnp

    from quantumpropagators.ops.cheby import cheby_coeffs

    dev = jax.devices()[0]
    n_steps = 100
    dt = 0.1
    omega, rabi = 1.0, 0.5
    delta = 2 * np.sqrt(omega**2 + rabi**2)
    e_min = -delta / 2
    coeffs = jnp.asarray(
        cheby_coeffs(delta, dt), dtype=jnp.float32
    )
    tgrid = np.arange(n_steps) * dt + dt / 2
    eps = jnp.asarray(np.cos(0.2 * tgrid), dtype=jnp.float32)

    @jax.jit
    def run(re, im, eps):
        beta = jnp.float32(delta / 2 + e_min)

        def h_apply(v, e):
            H = jnp.array([[0.5 * omega, 0.0], [0.0, -0.5 * omega]],
                          dtype=v.dtype) + e * rabi * jnp.array(
                [[0.0, 1.0], [1.0, 0.0]], dtype=v.dtype)
            return H @ v

        def step(carry, e):
            r, i = carry
            v0 = r + 1j * i
            v1 = (-2j / delta) * (h_apply(v0, e) - beta * v0)
            phi = coeffs[0] * v0 + coeffs[1] * v1

            def body(k, s):
                v0, v1, phi = s
                v2 = (-4j / delta) * (h_apply(v1, e) - beta * v1) + v0
                return (v1, v2, phi + coeffs[k] * v2)

            v0, v1, phi = jax.lax.fori_loop(
                2, coeffs.shape[0], body, (v0, v1, phi)
            )
            psi = jnp.exp(-1j * beta * dt) * phi
            return (jnp.real(psi), jnp.imag(psi)), None

        (r, i), _ = jax.lax.scan(step, (re, im), eps)
        return jnp.sqrt(jnp.sum(r**2 + i**2))

    re = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
    im = jnp.zeros(2, dtype=jnp.float32)
    float(run(re, im, eps))  # compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        nrm = float(run(re, im, eps))
    elapsed = time.perf_counter() - t0
    steps_per_s = reps * n_steps / elapsed
    log(f"rabi: {steps_per_s:.0f} steps/s, ‖Ψ‖={nrm:.6f} on {dev.platform}")
    print(json.dumps({
        "metric": "rabi_2level_cheby_steps",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": None,
        "extra": {"n_steps": n_steps, "platform": dev.platform,
                  "state_norm_after": round(nrm, 7)},
    }), flush=True)


def bench_transmon():
    """BASELINE config 2: driven transmon ladder N=10, Newton vs Cheby
    matvec counts per 100 steps (reference
    ``docs/src/benchmarks/profiling.md:112``: ≈2000 vs ≈1200 at N=200)
    plus wall-clock steps/s for each method."""
    import jax.numpy as jnp

    import quantumpropagators as qp
    from quantumpropagators.ops.operators import dia_from_scipy
    from quantumpropagators.utils.timings import disable_timings, enable_timings

    import scipy.sparse as sp

    N = 10
    a = sp.diags(np.sqrt(np.arange(1, N, dtype=float)), 1).tocsr()
    ad = a.conj().T.tocsr()
    n_op = (ad @ a).tocsr()
    alpha = -0.2
    H0 = (6.0 * n_op + 0.5 * alpha * (n_op @ (n_op - sp.identity(N)))).tocsr()
    Hd = (a + ad).tocsr()
    eps = lambda t: 0.3 * float(np.cos(5.8 * t))
    gen = qp.hamiltonian(dia_from_scipy(H0), (dia_from_scipy(Hd), eps))
    psi0 = np.zeros(N, complex)
    psi0[0] = 1.0
    tlist = np.linspace(0.0, 10.0, 101)  # 100 steps
    # host-side spectral envelope over the control range (the remote
    # TPU tunnel cannot transfer operator planes back for specrange's
    # exact-diag path; N=10 is host-trivial anyway)
    _H0d, _Hdd = H0.toarray(), Hd.toarray()
    _ev = np.concatenate([
        np.linalg.eigvalsh(_H0d - 0.3 * _Hdd),
        np.linalg.eigvalsh(_H0d + 0.3 * _Hdd),
    ])
    _buf = 0.02 * (_ev.max() - _ev.min())
    sr_kw = dict(specrange_method="manual",
                 E_min=float(_ev.min() - _buf),
                 E_max=float(_ev.max() + _buf))
    import jax as _jax

    # complex buffers cannot cross this tunnel's transfer layer: build
    # the device state from real planes, and fetch real planes only
    psi_dev = _jax.lax.complex(
        jnp.asarray(psi0.real, jnp.float32),
        jnp.asarray(psi0.imag, jnp.float32),
    )

    def fetch_c(x):
        return np.asarray(jnp.real(x), np.float64) + 1j * np.asarray(
            jnp.imag(x), np.float64
        )

    results = {}
    psis = {}
    enable_timings()
    for method, kw in (("cheby", dict(sr_kw)),
                       ("newton", {"m_max": 8, "precision": "native"})):
        prop = qp.init_prop(psi_dev, gen, tlist, method=method, **kw)
        # warm the compile caches, then re-init and time
        while qp.prop_step(prop) is not None:
            pass
        prop = qp.init_prop(psi_dev, gen, tlist, method=method, **kw)
        t0 = time.perf_counter()
        psi = None
        nxt = qp.prop_step(prop)
        while nxt is not None:
            psi, nxt = nxt, qp.prop_step(prop)
        np.asarray(jnp.real(psi))  # sync through a REAL plane
        elapsed = time.perf_counter() - t0
        psis[method] = fetch_c(psi)
        matvecs = int(prop.timing_data.counters.get("matvec", 0))
        results[method] = {
            "matvecs_per_100_steps": matvecs,
            "steps_per_s": round(100 / elapsed, 1),
        }
        log(f"transmon {method}: {matvecs} matvecs, "
            f"{100 / elapsed:.1f} steps/s")
    disable_timings()
    agree = float(np.linalg.norm(psis["cheby"] - psis["newton"]))
    log(f"transmon newton-vs-cheby agreement: {agree:.2e}")

    # --- on-device double-float tier (VERDICT r4 item 1): Newton and
    # expv in compensated df64 vs the f64 HOST oracle — the 1e-10
    # contract ON THE CHIP, not via the CPU-x64 protocol
    from quantumpropagators.models.controls import discretize_on_midpoints
    from quantumpropagators.propagate import propagate_propagator

    vals = discretize_on_midpoints(eps, tlist)
    H0d, Hdd = H0.toarray(), Hd.toarray()
    psi_oracle = psi0.copy()
    from scipy.linalg import expm as _expm

    for n in range(len(tlist) - 1):
        Hn = H0d + vals[n] * Hdd
        psi_oracle = _expm(-1j * (tlist[n + 1] - tlist[n]) * Hn) @ psi_oracle

    dd_errs = {}
    dd_rates = {}
    dd_terms = [H0.astype(np.float64), Hd.astype(np.float64)]
    for method, kw in (("newton", {"m_max": 8}),
                       ("expv", {"m_max": 10})):  # m=N: exact subspace
        prop = qp.init_prop(psi0, gen, tlist, method=method,
                            precision="dd", dd_operator_terms=dd_terms,
                            **kw)
        while qp.prop_step(prop) is not None:
            pass
        sd = prop.state_dd
        got = (
            np.asarray(sd.re.hi, np.float64) + np.asarray(sd.re.lo, np.float64)
        ) + 1j * (
            np.asarray(sd.im.hi, np.float64) + np.asarray(sd.im.lo, np.float64)
        )
        dd_errs[method] = float(np.abs(got - psi_oracle).max())
        prop = qp.init_prop(psi0, gen, tlist, method=method,
                            precision="dd", dd_operator_terms=dd_terms,
                            **kw)
        t0 = time.perf_counter()
        while qp.prop_step(prop) is not None:
            pass
        np.asarray(prop.state_dd.re.hi)  # sync
        dd_rates[method] = round(100 / (time.perf_counter() - t0), 1)
        log(f"transmon {method} dd: err vs f64 oracle "
            f"{dd_errs[method]:.2e}, {dd_rates[method]} steps/s")

    # --- device-driven fixed-Leja Newton (VERDICT r4 item 4): the
    # whole 100-step drive as ONE compiled scan
    from quantumpropagators.ops.newton_leja import newton_leja_propagate_dd

    out, _, plan = newton_leja_propagate_dd(
        psi0, gen, tlist, tol=1e-13,
        dd_operator_terms=dd_terms,
        e_min=sr_kw["E_min"], e_max=sr_kw["E_max"],
    )
    np.asarray(out.re.hi)  # sync (warm compile)
    t0 = time.perf_counter()
    out, _, plan = newton_leja_propagate_dd(
        psi0, gen, tlist, tol=1e-13,
        dd_operator_terms=dd_terms,
        e_min=sr_kw["E_min"], e_max=sr_kw["E_max"],
    )
    np.asarray(out.re.hi)
    leja_rate = round(100 / (time.perf_counter() - t0), 1)
    got = (
        np.asarray(out.re.hi, np.float64) + np.asarray(out.re.lo, np.float64)
    ) + 1j * (
        np.asarray(out.im.hi, np.float64) + np.asarray(out.im.lo, np.float64)
    )
    leja_err = float(np.abs(got - psi_oracle).max())
    log(f"transmon fixed-leja newton: n={len(plan.points)}, "
        f"err {leja_err:.2e}, {leja_rate} steps/s")

    print(json.dumps({
        "metric": "transmon_ladder_matvecs_newton_vs_cheby",
        "value": results["newton"]["matvecs_per_100_steps"],
        "unit": "matvecs/100steps",
        "vs_baseline": round(
            results["newton"]["matvecs_per_100_steps"]
            / max(results["cheby"]["matvecs_per_100_steps"], 1), 2
        ),
        "extra": {**{f"{m}_{k}": v for m, r in results.items()
                     for k, v in r.items()},
                  "newton_vs_cheby_state_diff": agree,
                  "newton_dd_err_vs_f64_oracle": dd_errs["newton"],
                  "expv_dd_err_vs_f64_oracle": dd_errs["expv"],
                  "newton_dd_steps_per_s": dd_rates["newton"],
                  "expv_dd_steps_per_s": dd_rates["expv"],
                  "leja_dd_err_vs_f64_oracle": leja_err,
                  "leja_dd_steps_per_s": leja_rate,
                  "leja_n_nodes": len(plan.points)},
    }), flush=True)


def bench_newton():
    """On-accelerator Newton timing (VERDICT r3 item 6: the suite never
    timed Newton on the TPU).  N=1024 random sparse Hermitian with
    spectral radius 10 — the reference's Newton test configuration
    (``test/test_newton.jl:20``, ``docs/src/benchmarks/profiling.md:112``
    matvec-count protocol) — stepped with restarted Arnoldi on the
    device (CGS2 + rank-k updates on-chip, O(m²) scalar bookkeeping on
    host; all boundary crossings are REAL planes, so the complex-
    transfer-free TPU path is exercised end to end)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from quantumpropagators.ops.newton import NewtonInfo, newton_apply
    from quantumpropagators.ops.operators import bsr_from_scipy

    dev = jax.devices()[0]
    N = 1024
    rng = np.random.default_rng(42)
    A = sp.random(N, N, density=0.01, random_state=rng,
                  data_rvs=rng.standard_normal)
    H = (0.5 * (A + A.T)).tocsr()
    # normalize spectral radius to 10 (reference test config)
    from scipy.sparse.linalg import eigsh

    lam_max = abs(eigsh(H, k=1, which="LA",
                        return_eigenvectors=False)[0])
    lam_min = abs(eigsh(H, k=1, which="SA",
                        return_eigenvectors=False)[0])
    H = H * (10.0 / max(lam_max, lam_min))
    H64 = H.astype(np.float64)
    op = bsr_from_scipy(H.astype(np.float32), block_size=32,
                        dtype=jnp.float32)
    psi0 = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi0 /= np.linalg.norm(psi0)
    # complex formed ON device from real planes (no complex transfer)
    psi = jax.lax.complex(
        jnp.asarray(psi0.real, jnp.float32),
        jnp.asarray(psi0.imag, jnp.float32),
    )
    dt = 0.5
    n_steps = 20
    relerr = 1e-6  # f32 state: reference-accuracy Newton needs x64 (CPU)

    def run(psi, info):
        for _ in range(n_steps):
            psi = newton_apply(
                op, psi, dt, m_max=10, relerr=relerr, info=info,
            )
        return psi

    run(psi, NewtonInfo())  # warm every restart-shape compile
    info = NewtonInfo()
    t0 = time.perf_counter()
    out = run(psi, info)
    # force completion through a real scalar transfer
    nrm = float(jnp.sqrt(jnp.real(jnp.vdot(out, out))))
    elapsed = time.perf_counter() - t0
    steps_per_s = n_steps / elapsed
    matvecs_per_step = info.matvecs / n_steps
    # accuracy vs the f64 host oracle (f32 state: expect ~1e-6 level;
    # the 1e-10 contract configs run Newton in x64 — tests/test_newton)
    from scipy.linalg import expm

    exact = np.linalg.matrix_power(
        expm(-1j * H64.toarray() * dt), n_steps
    ) @ psi0
    got = np.asarray(jnp.real(out), np.float64) + 1j * np.asarray(
        jnp.imag(out), np.float64
    )
    err = float(np.abs(got - exact).max())
    log(f"newton on {dev.platform}: {steps_per_s:.2f} steps/s, "
        f"{matvecs_per_step:.0f} matvecs/step, err={err:.2e} "
        f"(f32 state), ‖Ψ‖={nrm:.6f}")

    # --- adaptive restarted Newton in df64 (VERDICT r4 item 1): the
    # same operator/steps at the reference 1e-10 contract ON CHIP
    from quantumpropagators.ops.df64 import cdd_from_c128
    from quantumpropagators.ops.newton import newton_apply_dd
    from quantumpropagators.ops.dd_linalg import cdd_op_from_matrix

    op_dd = cdd_op_from_matrix(H64, sparse=True, block_size=32)
    n_dd_steps = 5

    def run_dd_newton(psi_dd, info):
        for _ in range(n_dd_steps):
            psi_dd = newton_apply_dd(
                op_dd, psi_dd, dt, m_max=10, relerr=1e-12, info=info,
            )
        return psi_dd

    psi_dd0 = cdd_from_c128(psi0)
    run_dd_newton(psi_dd0, NewtonInfo())  # warm
    info_dd = NewtonInfo()
    t0 = time.perf_counter()
    out_dd = run_dd_newton(psi_dd0, info_dd)
    np.asarray(out_dd.re.hi)  # sync
    dd_elapsed = time.perf_counter() - t0
    dd_steps_per_s = n_dd_steps / dd_elapsed
    got_dd = (
        np.asarray(out_dd.re.hi, np.float64)
        + np.asarray(out_dd.re.lo, np.float64)
    ) + 1j * (
        np.asarray(out_dd.im.hi, np.float64)
        + np.asarray(out_dd.im.lo, np.float64)
    )
    exact_dd = np.linalg.matrix_power(
        expm(-1j * H64.toarray() * dt), n_dd_steps
    ) @ psi0
    err_dd = float(np.abs(got_dd - exact_dd).max())
    log(f"newton dd on {dev.platform}: {dd_steps_per_s:.2f} steps/s, "
        f"err={err_dd:.2e} (df64 state, reference contract 1e-10)")

    # --- device-driven fixed-Leja Newton (VERDICT r4 item 4): one
    # compiled scan over all steps — no per-restart host round trips
    from quantumpropagators.ops.newton_leja import newton_leja_propagate_dd
    from scipy.sparse.linalg import eigsh as _eigsh

    lmax = float(_eigsh(H64, k=1, which="LA",
                        return_eigenvectors=False)[0])
    lmin = float(_eigsh(H64, k=1, which="SA",
                        return_eigenvectors=False)[0])
    buf = 0.01 * (lmax - lmin)
    n_leja_steps = 100  # one compiled scan: amortize dispatch latency
    tl = np.arange(0, (n_leja_steps + 1) * dt - 1e-9, dt)

    H64d = H64.toarray()  # N=1024: the dense dd matvec (one fused
    # VPU contraction) beats the small-block BSR chain per node

    def leja_run():
        # dd_operator_terms=[dense] selects DenseDDOp (scipy input
        # would re-route to the sparse chain)
        return newton_leja_propagate_dd(
            psi0, H64, tl, dd_operator_terms=[H64d],
            e_min=lmin - buf, e_max=lmax + buf, tol=1e-13,
        )

    out_l, _, plan_l = leja_run()
    np.asarray(out_l.re.hi)
    t0 = time.perf_counter()
    out_l, _, plan_l = leja_run()
    np.asarray(out_l.re.hi)
    leja_elapsed = time.perf_counter() - t0
    leja_steps_per_s = n_leja_steps / leja_elapsed
    got_l = (
        np.asarray(out_l.re.hi, np.float64)
        + np.asarray(out_l.re.lo, np.float64)
    ) + 1j * (
        np.asarray(out_l.im.hi, np.float64)
        + np.asarray(out_l.im.lo, np.float64)
    )
    exact_l = np.linalg.matrix_power(
        expm(-1j * H64.toarray() * dt), n_leja_steps
    ) @ psi0
    err_l = float(np.abs(got_l - exact_l).max())
    log(f"newton fixed-leja dd: {leja_steps_per_s:.1f} steps/s "
        f"({len(plan_l.points)} nodes/step), err={err_l:.2e}, "
        f"vs host-driven f32 {steps_per_s:.2f} steps/s "
        f"({leja_steps_per_s / steps_per_s:.1f}x)")

    print(json.dumps({
        "metric": "newton_restarted_arnoldi_steps",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": None,
        "extra": {"matvecs_per_step": round(matvecs_per_step, 1),
                  "n_steps": n_steps, "dim": N,
                  "err_vs_expm_f32_state": err,
                  "dd_steps_per_s": round(dd_steps_per_s, 2),
                  "dd_err_vs_expm": err_dd,
                  "leja_dd_steps_per_s": round(leja_steps_per_s, 1),
                  "leja_dd_err_vs_expm": err_l,
                  "leja_nodes_per_step": len(plan_l.points),
                  "leja_speedup_vs_host_driven":
                      round(leja_steps_per_s / steps_per_s, 1),
                  "platform": dev.platform},
    }), flush=True)


def bench_optomech():
    """BASELINE config 3: optomech cavity (55-dim kron CSR).

    Measures BSR (MXU blocked-ELL) vs gather-CSR apply throughput on
    the device over a batch of states — the layout decision SURVEY
    §7.4.2 calls out.  Operator entries are real (the optomech H has
    real couplings); states are (re, im) planes so no complex buffers
    cross the device boundary.
    """
    import jax
    import jax.numpy as jnp

    import scipy.sparse as sp

    from quantumpropagators.ops.operators import (
        apply, bsr_from_scipy, csr_from_scipy,
    )

    dev = jax.devices()[0]

    def destroy(n):
        return sp.diags(np.sqrt(np.arange(1, n + 1)), 1)

    N_cav, N_mech = 4, 10
    a = sp.kron(destroy(N_cav), sp.identity(N_mech + 1), format="csr")
    b = sp.kron(sp.identity(N_cav + 1), destroy(N_mech), format="csr")
    at, bt = a.T.tocsr(), b.T.tocsr()
    H = (10.0 * (at @ a) + 10.0 * (bt @ b) + 2.0 * (a + at)
         - 1.0 * ((bt + b) @ (at @ a))).tocsr()
    H.eliminate_zeros()
    H = H.real.astype(np.float32)
    N = H.shape[0]

    def measure(H, batch, n_apply, block_size, reps=5):
        rng = np.random.default_rng(0)
        states = jnp.asarray(
            rng.standard_normal((2 * batch, H.shape[0])), dtype=jnp.float32
        )  # re and im planes interleaved as a plain batch
        ops = {
            "bsr": bsr_from_scipy(H, block_size=block_size,
                                  dtype=jnp.float32),
            "csr": csr_from_scipy(H, dtype=jnp.float32),
        }
        rates = {}
        for name, op in ops.items():
            @jax.jit
            def run(op, v):
                def body(v, _):
                    return apply(op, v), None
                v, _ = jax.lax.scan(body, v, None, length=n_apply)
                return jnp.sqrt(jnp.sum(v**2))

            float(run(op, states))
            t0 = time.perf_counter()
            for _ in range(reps):
                float(run(op, states))
            elapsed = time.perf_counter() - t0
            rates[name] = (
                reps * n_apply * 2 * batch * H.nnz / elapsed / 1e9
            )
            log(f"  {name} (dim {H.shape[0]}, batch {batch}): "
                f"{rates[name]:.2f} Gnnz/s")
        return rates

    log("optomech 55-dim (BASELINE config 3):")
    rates = measure(H, batch=4096, n_apply=100, block_size=8)

    # reference-accuracy path: df64 BSR Chebyshev propagation ON the
    # device, error vs an f64 host oracle (VERDICT r2 item 4)
    from scipy.linalg import expm

    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.ops.df64 import CDD, DD, cdd_to_c128
    from quantumpropagators.ops.df64_sparse import (
        bsr_dd_from_scipy, cheby_apply_dd_bsr, dd_split_np,
    )

    H64 = (0.5 * (H + H.T)).astype(np.float64).tocsr()
    op_dd = bsr_dd_from_scipy(H64, block_size=8)
    Npad = op_dd.shape[0]
    evals = np.linalg.eigvalsh(H64.toarray())
    e_min_o, delta_o = float(evals[0]), float(evals[-1] - evals[0])
    dt_o = 0.05
    rng = np.random.default_rng(5)
    psi = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    psi /= np.linalg.norm(psi)
    pp = np.zeros(Npad, complex)
    pp[:N] = psi
    coeffs_o = cheby_coeffs(delta_o, dt_o)
    n_steps_o = 50

    def run_dd():
        z = CDD(DD(*dd_split_np(pp.real)), DD(*dd_split_np(pp.imag)))
        for _ in range(n_steps_o):
            z = cheby_apply_dd_bsr(op_dd, z, coeffs_o, delta_o, e_min_o, dt_o)
        return cdd_to_c128(z)

    run_dd()  # compile
    t0 = time.perf_counter()
    got = run_dd()
    t_dd = time.perf_counter() - t0
    exact = expm(-1j * H64.toarray() * dt_o * n_steps_o) @ psi
    dd_err = float(np.abs(got[:N] - exact).max())
    dd_gnnz = (
        n_steps_o * (len(coeffs_o) - 1) * 2 * H64.nnz / t_dd / 1e9
    )
    log(f"  df64 BSR cheby on-device: {n_steps_o} steps, "
        f"err={dd_err:.2e} (contract 1e-10), {dd_gnnz:.3f} Gnnz/s")
    assert dd_err < 1e-10, dd_err

    # BASELINE config 3 names "Arnoldi expm-Krylov": the dd expv step
    # ON CHIP at the 1e-10 contract (VERDICT r4 item 1 — previously
    # certified only via the CPU-x64 protocol)
    from quantumpropagators.ops.expv import expv_apply_dd
    from quantumpropagators.ops.newton import NewtonInfo as _NI
    from quantumpropagators.ops.newton import newton_apply_dd

    psi_k = psi.copy()
    z = None
    t0 = time.perf_counter()
    n_kry = 10
    for _ in range(n_kry):
        z = expv_apply_dd(H64, psi_k if z is None else z, dt_o, m=30)
    got_k = (
        np.asarray(z.re.hi, np.float64) + np.asarray(z.re.lo, np.float64)
    )[:N] + 1j * (
        np.asarray(z.im.hi, np.float64) + np.asarray(z.im.lo, np.float64)
    )[:N]
    t_kry = time.perf_counter() - t0
    exact_k = expm(-1j * H64.toarray() * dt_o * n_kry) @ psi
    expv_dd_err = float(np.abs(got_k - exact_k).max())
    log(f"  dd expv on-device: {n_kry} steps, err={expv_dd_err:.2e} "
        f"(contract 1e-10), {n_kry / t_kry:.1f} steps/s")
    assert expv_dd_err < 1e-10, expv_dd_err
    # ... and dd Newton on the same operator (config-3 cross-method)
    zn = None
    info_n = _NI()
    for _ in range(n_kry):
        zn = newton_apply_dd(H64, psi_k if zn is None else zn, dt_o,
                             m_max=12, relerr=1e-12, info=info_n)
    got_n = (
        np.asarray(zn.re.hi, np.float64) + np.asarray(zn.re.lo, np.float64)
    )[:N] + 1j * (
        np.asarray(zn.im.hi, np.float64) + np.asarray(zn.im.lo, np.float64)
    )[:N]
    newton_dd_err = float(np.abs(got_n - exact_k).max())
    log(f"  dd newton on-device: err={newton_dd_err:.2e}")
    assert newton_dd_err < 1e-10, newton_dd_err
    # the layout decision at scale: a chain of 1024 coupled 64-level
    # units (dense on-site + dense hopping blocks) at dim 2^16 — the
    # regime where scalar gathers fall out of VMEM and BSR's
    # contiguous block loads + MXU contraction dominate (SURVEY §7.4.2)
    bsz, R = 64, 1024
    rng = np.random.default_rng(1)
    blocks = []
    rows = []
    cols = []
    for r in range(R):
        for c in (r - 1, r, r + 1):
            if 0 <= c < R:
                rows.append(r)
                cols.append(c)
                blocks.append(
                    rng.standard_normal((bsz, bsz)).astype(np.float32)
                )
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(rows, minlength=R))]
    ).astype(np.int64)
    H2 = sp.bsr_matrix(
        (np.stack(blocks), np.asarray(cols), indptr),
        shape=(R * bsz, R * bsz),
    ).tocsr()
    log(f"block-dense chain {H2.shape[0]}-dim (nnz={H2.nnz}):")
    # gather-CSR is pathologically slow here (the point of the
    # comparison) — keep its measured work small
    rates2 = measure(H2, batch=8, n_apply=4, block_size=bsz, reps=2)

    # df64 BSR at SCALE (VERDICT r3 item 5): the reference-accuracy
    # unstructured path measured at dim 2^16, not just the 55-dim
    # optomech — BASELINE configs 3/5 need this number
    H2sym = (0.5 * (H2 + H2.T)).astype(np.float64).tocsr()
    op2_dd = bsr_dd_from_scipy(H2sym, block_size=bsz)
    bound2 = float(np.abs(H2sym).sum(axis=1).max())
    e2, d2 = -bound2, 2 * bound2
    dt2 = 0.02
    c2 = cheby_coeffs(d2, dt2)
    rng = np.random.default_rng(9)
    z2 = CDD(
        DD(*dd_split_np(rng.standard_normal(H2sym.shape[0]))),
        DD(*dd_split_np(rng.standard_normal(H2sym.shape[0]))),
    )
    n2_steps = 2

    def run_dd2(z):
        for _ in range(n2_steps):
            z = cheby_apply_dd_bsr(op2_dd, z, c2, d2, e2, dt2)
        return float(jnp.sum(z.re.hi ** 2) + jnp.sum(z.im.hi ** 2))

    run_dd2(z2)  # compile
    t0 = time.perf_counter()
    run_dd2(z2)
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        run_dd2(z2)
    t_b = time.perf_counter() - t0
    dd2_elapsed = max(t_b - t_a, 1e-9) / 2  # 2 extra invocations
    dd2_gnnz = (
        n2_steps * (len(c2) - 1) * 2 * H2sym.nnz / dd2_elapsed / 1e9
    )
    log(f"  df64 BSR cheby at dim {H2sym.shape[0]} "
        f"({len(c2)} orders/step): {dd2_gnnz:.2f} Gnnz/s")

    # Pallas banded dd kernel (VERDICT r3 item 5 follow-through): the
    # XLA dd chain streams its error-free product planes through HBM;
    # the Pallas kernel keeps the compensated contraction VMEM-resident
    # (ops/bsr_dd_pallas.py).  Cross-checked against the XLA chain's
    # own on-chip result (the b=128 production configuration has no
    # tractable interpret-mode test — see tests/test_bsr_dd_pallas.py).
    from quantumpropagators.ops.bsr_dd_pallas import (
        banded_dd_from_scipy, cheby_apply_dd_banded,
    )

    opb = banded_dd_from_scipy(H2sym)
    log(f"  banded re-block: offsets={opb.offsets}, R={opb.R}, "
        f"b={opb.b}")

    def run_banded(z):
        for _ in range(n2_steps):
            z = cheby_apply_dd_banded(opb, z, c2, d2, e2, dt2,
                                      tile_rows=8)
        return z

    zb = run_banded(z2)  # compile
    # cross-check one propagation vs the XLA dd chain (both on-chip)
    z_ref = z2
    for _ in range(n2_steps):
        z_ref = cheby_apply_dd_bsr(op2_dd, z_ref, c2, d2, e2, dt2)
    diff = float(
        jnp.max(
            jnp.abs((zb.re.hi - z_ref.re.hi) + (zb.re.lo - z_ref.re.lo))
        )
        + jnp.max(
            jnp.abs((zb.im.hi - z_ref.im.hi) + (zb.im.lo - z_ref.im.lo))
        )
    )
    t0 = time.perf_counter()
    jax.block_until_ready(run_banded(z2).re.hi)
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out_b = run_banded(z2)
    jax.block_until_ready(out_b.re.hi)
    t_b = time.perf_counter() - t0
    banded_elapsed = max(t_b - t_a, 1e-9) / 2
    banded_gnnz = (
        n2_steps * (len(c2) - 1) * 2 * H2sym.nnz / banded_elapsed / 1e9
    )
    log(f"  Pallas banded dd cheby at dim {H2sym.shape[0]}: "
        f"{banded_gnnz:.2f} Gnnz/s (logical nnz), "
        f"vs-XLA-dd diff={diff:.2e}")
    print(json.dumps({
        "metric": "optomech_bsr_spmv_throughput",
        "value": round(rates["bsr"], 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(rates["bsr"] / rates["csr"], 2),
        "extra": {"gather_csr_gnnzs": round(rates["csr"], 3),
                  "df64_bsr_cheby_err_50steps": dd_err,
                  "df64_bsr_cheby_gnnzs": round(dd_gnnz, 4),
                  "batch": 4096, "nnz": int(H.nnz), "dim": N,
                  "scaled_dim": int(H2.shape[0]),
                  "scaled_bsr_gnnzs": round(rates2["bsr"], 3),
                  "scaled_csr_gnnzs": round(rates2["csr"], 3),
                  "scaled_speedup": round(rates2["bsr"] / rates2["csr"], 2),
                  "scaled_dd_gnnzs": round(dd2_gnnz, 3),
                  "scaled_banded_pallas_dd_gnnzs": round(banded_gnnz, 3),
                  "banded_vs_xla_dd_diff": diff,
                  "expv_dd_err_on_device": expv_dd_err,
                  "newton_dd_err_on_device": newton_dd_err,
                  "platform": dev.platform},
    }), flush=True)


def bench_banded20(L_dim: int = 20, tile_rows: int = 8, dt=None):
    """VERDICT r4 item 3: the banded df64 Pallas kernel at 2^20 — the
    BASELINE config-5 single-chip anchor through the ACTUAL BSR layout
    (dense 128-blocks), with a stated roofline.

    Operator: block-tridiagonal chain of 2^L_dim/128 coupled 128-level
    units with dense symmetric on-site and dense hopping blocks — every
    stored float is a logical nonzero, so Gnnz/s here is honest
    streamed-nnz throughput.

    Roofline (measured chip model, docs/benchmarks.md:113-160 + the r4
    probe verdicts): per matvec the kernel streams 8 B/nnz of dd
    operator planes at the measured ~989 GB/s AND issues ~30 barriered
    VPU f32 ops/nnz at the ~4 Tflop/s issue wall; compute and DMA
    SERIALIZE on this chip (probe_scatter_r4), so
    ``t ≈ nnz·(8/989e9 + 30/4e12)`` → bound ≈ 63 Gnnz/s."""
    import jax
    import jax.numpy as jnp

    from quantumpropagators.ops.bsr_dd_pallas import (
        BandedDD, banded_dd_apply, cheby_apply_dd_banded,
    )
    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.ops.df64 import CDD, DD

    dev = jax.devices()[0]
    b = 128
    N = 2 ** L_dim
    R = N // b
    rng = np.random.default_rng(33)
    scale = 1.0 / np.sqrt(3 * b)
    # planes[k, i, r, o] = A[r*b+o, (r+offset_k)*b+i], offsets (-1,0,1)
    planes = np.zeros((3, b, R, b), dtype=np.float64)
    D = rng.standard_normal((R, b, b))
    D = 0.5 * (D + D.transpose(0, 2, 1)) * scale
    U = rng.standard_normal((R - 1, b, b)) * scale
    planes[1] = D.transpose(2, 0, 1)               # (i, r, o) = D[r][o,i]
    planes[2, :, : R - 1, :] = U.transpose(2, 0, 1)  # block (r, r+1)=U[r]
    planes[0, :, 1:, :] = U.transpose(1, 0, 2)       # block (r, r-1)=U[r-1]^T
    hi = planes.astype(np.float32)
    lo = (planes - hi.astype(np.float64)).astype(np.float32)
    nnz = 3 * R * b * b - 2 * b * b
    nnz_stored = 3 * R * b * b
    op = BandedDD(
        planes_hi=jnp.asarray(hi), planes_lo=jnp.asarray(lo),
        offsets=(-1, 0, 1), R=R, b=b, shape=(N, N),
        logical_nnz=nnz,
    )
    # Gershgorin bound from the |planes| row sums
    row_abs = np.abs(planes).sum(axis=(0, 1))  # (R, b) -> per-row sums
    bound = float(row_abs.max())
    e_min, delta = -bound, 2 * bound
    if dt is None:
        dt = 6.0 / delta  # Δ·dt/2 = 3 → ~19 coefficients (headline-like)
    c64 = cheby_coeffs(delta, dt)
    n_coeffs = len(c64)
    log(f"banded20 on {dev.platform}: dim 2^{L_dim}, R={R}, b={b}, "
        f"{n_coeffs} coefficients/step, tile_rows={tile_rows}")
    x64 = rng.standard_normal(N)
    y64 = rng.standard_normal(N)
    s = np.sqrt((x64 ** 2 + y64 ** 2).sum())
    x64, y64 = x64 / s, y64 / s

    def dd_split(v):
        h = v.astype(np.float32)
        return (jnp.asarray(h),
                jnp.asarray((v - h.astype(np.float64)).astype(np.float32)))

    interp = dev.platform != "tpu"
    # correctness: one dd matvec vs the host f64 contraction
    yd = banded_dd_apply(op, DD(*dd_split(x64)), tile_rows=tile_rows,
                         interpret=interp)
    got = np.asarray(yd.hi, np.float64) + np.asarray(yd.lo, np.float64)
    xb = x64.reshape(R, b)
    want = np.einsum("iro,ri->ro", planes[1], xb)
    want[: R - 1] += np.einsum("iro,ri->ro", planes[2, :, : R - 1],
                               xb[1:])
    want[1:] += np.einsum("iro,ri->ro", planes[0, :, 1:], xb[: R - 1])
    want = want.reshape(-1)
    mv_err = float(np.abs(got - want).max() / np.abs(want).max())
    log(f"banded20 matvec vs f64: rel err {mv_err:.2e}")
    assert mv_err < 1e-13, mv_err

    z0 = CDD(DD(*dd_split(x64)), DD(*dd_split(y64)))

    def run(z, n_steps):
        for _ in range(n_steps):
            z = cheby_apply_dd_banded(op, z, c64, delta, e_min, dt,
                                      tile_rows=tile_rows,
                                      interpret=interp)
        return z

    na, nb_ = (1, 3) if dev.platform != "tpu" else (3, 9)
    run(z0, 1)  # compile
    t0 = time.perf_counter()
    za = run(z0, na)
    np.asarray(za.re.hi)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    zb = run(z0, nb_)
    np.asarray(zb.re.hi)
    tb = time.perf_counter() - t0
    t_steps = (tb - ta) / (nb_ - na)
    matvecs = 2 * (n_coeffs - 1)  # re+im per order
    gnnz = matvecs * nnz_stored / t_steps / 1e9
    # serialized-chip roofline (measured r4 model: 989 GB/s stream,
    # ~4 Tflop/s VPU issue, no DMA/compute overlap on this chip)
    t_bound_per_nnz = 8 / 989e9 + 30 / 4e12
    bound_gnnz = 1e-9 / t_bound_per_nnz
    log(f"banded20: {gnnz:.2f} Gnnz/s ({t_steps:.3f} s/step, "
        f"{matvecs} matvecs/step), serialized-model bound "
        f"{bound_gnnz:.1f} Gnnz/s -> {100 * gnnz / bound_gnnz:.0f}%")

    # sharded-step overhead probe (VERDICT r4 item 2 "per-shard rate
    # ≈ single-device rate"): the ACTUAL sharded banded dd Chebyshev
    # step on a 1-device mesh — minimal-halo ppermute + plain interior
    # kernel + dense edge correction — timed per-call (min of 3; the
    # same per-call dispatch the unsharded python loop above pays).
    from quantumpropagators.parallel.mesh import chain_mesh, \
        shard_vector
    from quantumpropagators.parallel.sharded_banded import (
        make_sharded_banded_cheby_step_dd, partition_banded_dd,
    )

    pb1 = partition_banded_dd(op, 1, tile_rows=tile_rows)
    mesh1 = chain_mesh(1)
    sstep = make_sharded_banded_cheby_step_dd(
        mesh1, pb1, delta=delta, e_min=e_min, dt=dt,
        interpret=interp,
    )
    ch_, cl_ = dd_split(np.asarray(c64, np.float64))
    st4 = tuple(
        shard_vector(mesh1, p)
        for p in (*dd_split(x64), *dd_split(y64))
    )

    def srun(st, n):
        for _ in range(n):
            st = sstep(pb1, tuple(st), ch_, cl_)
        return st

    np.asarray(srun(st4, 1)[0])  # compile
    n_probe = 6
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(srun(st4, n_probe)[0])
        best = min(best, time.perf_counter() - t0)
    gnnz_sharded = n_probe * matvecs * nnz_stored / best / 1e9
    shard_overhead_pct = 100 * (1 - gnnz_sharded / gnnz)
    log(f"banded20 sharded step (1-device mesh): "
        f"{gnnz_sharded:.2f} Gnnz/s -> sharding overhead "
        f"{shard_overhead_pct:.1f}% vs unsharded")
    print(json.dumps({
        "metric": f"banded_dd_bsr_cheby_2^{L_dim}",
        "value": round(gnnz, 2),
        "unit": "Gnnz/s",
        "vs_baseline": None,
        "extra": {"dim": N, "block": b, "n_bands": 3,
                  "nnz_stored": nnz_stored,
                  "matvecs_per_step": matvecs,
                  "seconds_per_step": round(t_steps, 4),
                  "matvec_rel_err_vs_f64": mv_err,
                  "tile_rows": tile_rows,
                  "roofline_bound_gnnz": round(bound_gnnz, 1),
                  "pct_of_bound": round(100 * gnnz / bound_gnnz, 1),
                  "roofline_model":
                      "serialized t=nnz*(8B/989GBps + 30ops/4Tflops)",
                  "sharded_step_1dev_gnnzs": round(gnnz_sharded, 2),
                  "sharded_step_overhead_pct":
                      round(shard_overhead_pct, 1),
                  "platform": dev.platform},
    }), flush=True)


def bench_multiamp(L: int = 20, n_steps: int = 20):
    """Per-bit f32 tail A/B on a DRIVEN multi-amplitude workload
    (VERDICT r4 item 5): the reference-shaped ``Ĥ₀ + Σₗ aₗ(t)Ĥₗ``
    (two independently-driven flip groups + driven diagonal) at 2^L,
    tail=auto vs tail=0 — the round-4 gate forfeited the measured
    ~+29% exactly here."""
    import jax
    import jax.numpy as jnp

    import quantumpropagators as qp
    from quantumpropagators.fused import cheby_propagate_fused
    from quantumpropagators.models.lattice import (
        SiteOperatorSum, transverse_field_ising,
    )

    dev = jax.devices()[0]
    J, h = 1.0, 0.3
    H_diag, _ = transverse_field_ising(L, J=J, g=1.0, h=h,
                                       dtype=jnp.float32)
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    rng = np.random.default_rng(29)
    g_site = rng.uniform(0.9, 1.3, size=L)
    mats_odd = np.zeros((L, 2, 2))
    mats_even = np.zeros((L, 2, 2))
    for i in range(L):
        (mats_odd if i % 2 else mats_even)[i] = g_site[i] * sx
    Hx_odd = SiteOperatorSum(
        jnp.asarray(mats_odd, jnp.float32), L=L,
        active=tuple(i % 2 == 1 for i in range(L)),
    )
    Hx_even = SiteOperatorSum(
        jnp.asarray(mats_even, jnp.float32), L=L,
        active=tuple(i % 2 == 0 for i in range(L)),
    )
    eps_d = lambda t: 1.0 + 0.3 * np.sin(0.9 * t)
    eps_o = lambda t: 1.2 + 0.4 * np.cos(1.7 * t)
    eps_e = lambda t: 0.9 + 0.5 * np.sin(2.3 * t)
    gen = qp.hamiltonian(
        (H_diag, eps_d), (Hx_odd, eps_o), (Hx_even, eps_e), check=False
    )
    psi0 = rng.standard_normal(2 ** L) + 1j * rng.standard_normal(2 ** L)
    # keep the state HOST-side (complex uploads poison this tunnel;
    # the dd path splits to real planes host-side anyway)
    psi0 = (psi0 / np.linalg.norm(psi0)).astype(np.complex64)
    dt = 0.05
    bound = 1.3 * (J * (L - 1) + abs(h) * L) + 1.6 * float(
        np.abs(g_site).sum()
    )
    kw = dict(specrange_method="manual", E_min=-bound, E_max=bound)
    nnz = (L + 1) * 2 ** L

    from quantumpropagators.ops.cheby import ChebyWorkspace
    from quantumpropagators.propagators.cheby import ChebyPropagator

    ws = ChebyPropagator(
        psi0, gen, np.linspace(0, n_steps * dt, n_steps + 1), **kw
    ).wrk
    n_coeffs = int(ws.coeffs.shape[0])  # shape only: no device transfer

    rates = {}
    psis = {}
    for tail_mode, tail_arg in (("auto", "auto"), ("zero", 0)):
        def run(n):
            tl = np.linspace(0.0, n * dt, n + 1)
            out, _ = cheby_propagate_fused(
                psi0, gen, tl, kernel="dd", f32_tail=tail_arg, **kw
            )
            return out

        # min-of-3 same-length timing: difference timing across two
        # scan lengths proved unstable through the tunnel (server
        # contention produced negative differences); the A/B ratio
        # only needs the two modes measured the same way
        n_run = 3 * n_steps
        np.asarray(jnp.real(run(n_run)))  # warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outb = run(n_run)
            np.asarray(jnp.real(outb))
            best = min(best, time.perf_counter() - t0)
        t_step = best / n_run
        rates[tail_mode] = 2 * (n_coeffs - 1) * nnz / t_step / 1e9
        # fetch via REAL planes (complex transfers unimplemented here)
        psis[tail_mode] = np.asarray(jnp.real(outb), np.float64) \
            + 1j * np.asarray(jnp.imag(outb), np.float64)
        log(f"multiamp tail={tail_mode}: {rates[tail_mode]:.1f} Gnnz/s")
    diff = float(np.abs(psis["auto"] - psis["zero"]).max())
    log(f"multiamp A/B state diff (tail-auto vs tail-0): {diff:.2e}")
    print(json.dumps({
        "metric": f"multiamp_dd_perbit_tail_2^{L}",
        "value": round(rates["auto"], 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(rates["auto"] / rates["zero"], 3),
        "extra": {"tail0_gnnzs": round(rates["zero"], 2),
                  "speedup_from_perbit_tail":
                      round(rates["auto"] / rates["zero"], 3),
                  "state_diff_vs_tail0": diff,
                  "n_steps": n_steps,
                  "platform": dev.platform},
    }), flush=True)


def bench_northstar(n_steps: int = 1000, L: int = 24):
    """VERDICT r4 item 6: the literal BASELINE sentence — a 2^24-dim
    sparse lattice Hamiltonian propagated for 1000 Chebyshev steps,
    recorded end-to-end in ONE artifact: wall-clock, norm drift, a
    3-step f64-oracle error anchor, and a full forward+backward
    round-trip error over all 2x1000 steps."""
    import jax
    import jax.numpy as jnp

    from quantumpropagators.models.lattice import (
        chain_bonds, ising_diagonal_np,
    )
    from quantumpropagators.ops.cheby import cheby_coeffs
    from quantumpropagators.ops.fused_cheby import make_flip_plan
    from quantumpropagators.ops.fused_cheby_dd import (
        cheby_step_fused_dd, dd_tile_rows, f32_tail_orders,
    )

    dev = jax.devices()[0]
    J, g, h = 1.0, 1.2, 0.3
    N = 2 ** L
    dt = 0.05
    bound = J * (L - 1) + abs(h) * L + g * L
    e_min, delta = -bound, 2 * bound
    diag64 = ising_diagonal_np(L, chain_bonds(L), J, h)
    beta = delta / 2.0 + e_min
    tr = dd_tile_rows(L)
    plan = make_flip_plan(L, g, tile_rows=tr)
    c64 = np.asarray(cheby_coeffs(delta, dt))
    tail = f32_tail_orders(c64)
    log(f"northstar on {dev.platform}: 2^{L}, {n_steps} steps, "
        f"{len(c64)} coeffs/step, f32 tail {tail}")

    def dd_split(v):
        h_ = v.astype(np.float32)
        return (jnp.asarray(h_),
                jnp.asarray((v - h_.astype(np.float64)).astype(np.float32)))

    dmb_h, dmb_l = dd_split(diag64 - beta)
    c_h, c_l = dd_split(c64)
    rng = np.random.default_rng(1)
    re0 = rng.standard_normal(N)
    im0 = rng.standard_normal(N)
    nrm0 = np.sqrt((re0 ** 2 + im0 ** 2).sum())
    re0, im0 = re0 / nrm0, im0 / nrm0
    interp = dev.platform != "tpu"

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n", "sign"))
    def run_chunk(state, n, sign):
        def body(s, _):
            return (
                cheby_step_fused_dd(
                    plan, dmb_h, dmb_l, s, c_h, c_l,
                    delta, e_min, sign * dt, forward=(sign > 0),
                    f32_tail=tail, interpret=interp,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    state0 = (dd_split(re0)[0], dd_split(re0)[1],
              dd_split(im0)[0], dd_split(im0)[1])
    # warm both compiles (fwd + bwd) on short chunks
    np.asarray(run_chunk(run_chunk(state0, 2, 1), 2, -1)[0])

    # --- 3-step oracle anchor (host f64; ~10 CPU-min at 2^24)
    state3 = run_chunk(state0, 3, 1)
    got3 = (
        np.asarray(state3[0], np.float64) + np.asarray(state3[1], np.float64)
    ) + 1j * (
        np.asarray(state3[2], np.float64) + np.asarray(state3[3], np.float64)
    )
    psi = (
        np.asarray(state0[0], np.float64) + np.asarray(state0[1], np.float64)
    ) + 1j * (
        np.asarray(state0[2], np.float64) + np.asarray(state0[3], np.float64)
    )
    idx = np.arange(N)
    c = -2.0j / delta

    def hmat(v):
        out = diag64 * v
        for j in range(L):
            out = out + g * v[idx ^ (1 << j)]
        return out

    ref = psi
    for _ in range(3):
        v0 = ref
        v1 = c * (hmat(v0) - beta * v0)
        phi = c64[0] * v0 + c64[1] * v1
        for a in c64[2:]:
            v2 = 2.0 * c * (hmat(v1) - beta * v1) + v0
            phi = phi + a * v2
            v0, v1 = v1, v2
        ref = np.exp(-1j * beta * dt) * phi
    per_step_err = float(np.abs(got3 - ref).max()) / 3.0
    log(f"northstar 3-step oracle: per-step err {per_step_err:.2e}")

    # --- the 1000-step forward run.  At 2^20 one compiled scan is
    # best (per-dispatch tunnel overhead ~2 s); at 2^24 a single
    # ~133 s device program reproducibly crashes the TPU worker
    # (runtime watchdog), so the run is chunked at ~250 steps
    # (~35 s/program) and the wall clock honestly includes the few
    # dispatch overheads.
    chunk = n_steps if L <= 22 else min(250, n_steps)
    n_chunks, rem = divmod(n_steps, chunk)

    def run_all(state, sign):
        for _ in range(n_chunks):
            state = run_chunk(state, chunk, sign)
        if rem:
            state = run_chunk(state, rem, sign)
        return state

    np.asarray(run_all(state0, 1)[0])  # warm
    state = state0
    t0 = time.perf_counter()
    state = run_all(state, 1)
    np.asarray(state[0])
    t_fwd = time.perf_counter() - t0
    rh, rl, ih, il = state
    nrm = float(np.sqrt(np.sum(
        (np.asarray(rh, np.float64) + np.asarray(rl, np.float64)) ** 2
        + (np.asarray(ih, np.float64) + np.asarray(il, np.float64)) ** 2
    )))
    steps_per_s = n_steps / t_fwd
    matvecs = n_steps * (len(c64) - 1)
    nnz = (L + 1) * N  # diagonal + L site-flip planes
    gnnz = matvecs * nnz / t_fwd / 1e9
    log(f"northstar forward: {t_fwd:.1f} s for {n_steps} steps "
        f"({steps_per_s:.2f} steps/s, {gnnz:.1f} Gnnz/s), "
        f"norm drift {abs(nrm - 1.0):.2e}")

    # --- backward: 1000 more steps; total round-trip error
    np.asarray(run_chunk(state, 2, -1)[0])  # warm backward compile path
    if chunk != n_steps:
        np.asarray(run_chunk(state, chunk, -1)[0])  # warm chunk length
    state = run_all(state, -1)
    rh, rl, ih, il = state
    back = (
        np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    ) + 1j * (
        np.asarray(ih, np.float64) + np.asarray(il, np.float64)
    )
    rt_err = float(np.abs(back - psi).max())
    log(f"northstar round trip ({2 * n_steps} steps): max err {rt_err:.2e}")

    print(json.dumps({
        "metric": f"northstar_cheby_2^{L}_{n_steps}steps",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "extra": {"wall_clock_s": round(t_fwd, 1),
                  "n_steps": n_steps,
                  "gnnz_per_s": round(gnnz, 1),
                  "norm_drift": abs(nrm - 1.0),
                  "per_step_err_vs_f64_oracle": per_step_err,
                  "round_trip_2000_step_err": rt_err,
                  "matvecs_per_step": len(c64) - 1,
                  "f32_tail_orders": tail,
                  "platform": dev.platform},
    }), flush=True)


def run_suite():
    """All five BASELINE configs, one JSON line each (VERDICT item 7).

    Chain/2D reuse this script's headline machinery in subprocesses;
    the small CPU-bound configs (rabi latency, transmon matvec counts)
    run on the CPU backend like the reference does.
    """
    import os
    import subprocess

    here = os.path.abspath(__file__)
    cpu_env = dict(
        os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
        JAX_ENABLE_X64="1",
    )
    jobs = [
        (["--config", "rabi"], None),
        (["--config", "transmon"], cpu_env),
        (["--config", "newton"], None),
        (["--config", "optomech"], None),
        (["--L", "20", "--kernel", "dd"], None),
        (["--lattice2d", "4x6", "--kernel", "dd", "--steps", "5"], None),
    ]
    for extra, env in jobs:
        subprocess.run(
            [sys.executable, here, *extra], env=env, check=True
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    choices=("rabi", "transmon", "optomech", "newton",
                             "banded20", "northstar", "multiamp"),
                    default=None,
                    help="run one of the small BASELINE configs instead "
                         "of the headline chain/lattice measurement "
                         "(newton = on-accelerator restarted-Arnoldi "
                         "timing, N=1024)")
    ap.add_argument("--suite", action="store_true",
                    help="run all five BASELINE configs (one JSON line "
                         "per config)")
    ap.add_argument("--L", type=int, default=None,
                    help="chain length (2^L states); with no --L / "
                         "--config / --lattice2d, the default run emits "
                         "the 2^20 line and then the 2^24 north-star "
                         "line (the headline the driver records)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--L-ref", type=int, default=16, help="CPU baseline chain length")
    ap.add_argument("--group-bits", type=int, default=0,
                    help="matricization group size in bits (0 = auto)")
    ap.add_argument("--lattice2d", type=str, default=None,
                    help="LxxLy 2D lattice instead of a chain, e.g. 4x6")
    ap.add_argument("--kernel", choices=("fused", "planar", "complex", "dd"),
                    default="dd",
                    help="dd = df64 double-float Pallas kernel (~1e-13/"
                         "step, reference accuracy; the DEFAULT headline "
                         "— it is the only kernel meeting the reference's "
                         "1e-10 contract); fused = f32 single-pass Pallas "
                         "iteration (ops/fused_cheby.py, ~1e-7/step); "
                         "planar = (re,im)-f32 XLA path; complex = "
                         "complex64 XLA path")
    ap.add_argument("--complex", dest="kernel", action="store_const",
                    const="complex")
    ap.add_argument("--planar", dest="kernel", action="store_const",
                    const="planar")
    ap.add_argument("--tile-rows", type=int, default=512,
                    help="Pallas tile rows for the fused kernel")
    ap.add_argument("--no-oracle", action="store_true",
                    help="skip the per-step f64 host oracle check")
    ap.add_argument("--fast", action="store_true", default="lomxu",
                    help="select the dd kernel's sigma-extraction/MXU "
                         "path (A/B comparison; measured SLOWER than "
                         "the default lomxu variant).  Default (neither "
                         "--fast nor --no-fast): lomxu.  --no-fast "
                         "selects the pure twosum exact cascade")
    ap.add_argument("--no-fast", dest="fast", action="store_false")
    ap.add_argument("--f32-tail", default="auto",
                    help="dd kernel: number of tail polynomial orders "
                         "to run in pure f32 (mixed precision; 'auto' "
                         "= largest count keeping the per-step budget "
                         "under 1e-13, '0' = full dd)")
    ap.add_argument("--dd-remote-bits", type=int, default=0,
                    help="A/B mechanics probe: feed N self-copies of "
                         "the state through the dd kernel's remote-"
                         "plane hook (extra_nb_fn), emulating the "
                         "KERNEL-side cost of N sharded device-bit "
                         "exchanges without ICI.  The physical result "
                         "is meaningless (implies --no-oracle); the "
                         "throughput delta vs --dd-remote-bits 0 "
                         "bounds the sharded step's per-shard overhead "
                         "at equal local size (VERDICT r3 item 2)")
    ap.add_argument("--dd-variant",
                    choices=("twosum", "rows", "sigma", "lomxu", "tlane",
                             "xcross", "mxq"),
                    default=None,
                    help="dd kernel flip-accumulation variant (overrides "
                         "--fast): lomxu = lo-plane lane flips via one "
                         "MXU HIGHEST matmul (DEFAULT, fastest at every "
                         "measured size), twosum = pure exact cascade, "
                         "rows = grouped single-roll row flips, sigma = "
                         "σ-extraction + MXU lane path, tlane = lomxu + "
                         "transposed hi-plane lane flips")
    args = ap.parse_args()

    dd_fast = args.dd_variant if args.dd_variant else args.fast
    if dd_fast == "twosum":
        dd_fast = False
    if dd_fast == "sigma":
        dd_fast = True

    if args.suite:
        run_suite()
        return
    if args.L is None and args.config is None and args.lattice2d is None:
        # headline mode (BASELINE north star): 2^20 for continuity with
        # earlier rounds, then 2^24 LAST — the line the driver parses.
        # User-passed tuning flags (--dd-variant, --f32-tail, ...) are
        # forwarded to both sub-invocations so A/B runs stay labeled
        # correctly; only --L/--steps are forced per size.
        import os
        import subprocess

        here = os.path.abspath(__file__)
        # argparse takes the LAST occurrence, so appending the forced
        # flags after the user's keeps the override while every other
        # user flag survives (user cannot have passed --L here).
        passthrough = list(sys.argv[1:])
        for extra in (["--L", "20"], ["--L", "24", "--steps", "5"]):
            subprocess.run(
                [sys.executable, here, *passthrough, *extra], check=True
            )
        return
    if args.config == "multiamp":
        bench_multiamp(L=args.L or 20,
                       n_steps=(args.steps if args.steps != 20 else 20))
        return
    if args.config == "banded20":
        bench_banded20(
            L_dim=args.L or 20,
            tile_rows=(args.tile_rows if args.tile_rows != 512 else 8),
        )
        return
    if args.config == "northstar":
        bench_northstar(
            n_steps=(args.steps if args.steps != 20 else 1000),
            L=args.L or 24,
        )
        return
    if args.L is None:
        args.L = 20
    if args.config == "rabi":
        bench_rabi()
        return
    if args.config == "transmon":
        bench_transmon()
        return
    if args.config == "newton":
        bench_newton()
        return
    if args.config == "optomech":
        bench_optomech()
        return

    import jax
    import jax.numpy as jnp
    from functools import partial

    from quantumpropagators import Operator
    from quantumpropagators.models.lattice import (
        transverse_field_ising,
        transverse_field_ising_2d,
    )
    from quantumpropagators.ops.cheby import cheby_apply, cheby_coeffs
    from quantumpropagators.ops.fused_cheby import (
        cheby_step_fused,
        make_flip_plan,
    )
    from quantumpropagators.ops.planar import cheby_apply_planar

    J, g, h = 1.0, 1.2, 0.3
    dev = jax.devices()[0]
    # All operator data REAL (f32): this TPU backend runs complex math
    # inside jitted graphs but cannot transfer complex buffers, so the
    # jit boundary carries only real arrays (complex formed in-graph).
    if args.lattice2d:
        Lx, Ly = (int(v) for v in args.lattice2d.lower().split("x"))
        L = Lx * Ly
        N = 2 ** L
        log(f"device: {dev} ({dev.platform}), 2D {Lx}x{Ly}, N={N}")
        H_diag, H_x = transverse_field_ising_2d(
            Lx, Ly, J=J, g=g, h=h, dtype=jnp.float32
        )
        label = f"tfim2d_{Lx}x{Ly}_2^{L}"
    else:
        L = args.L
        N = 2 ** L
        log(f"device: {dev} ({dev.platform}), L={L}, N={N}")
        H_diag, H_x = transverse_field_ising(L, J=J, g=g, h=h, dtype=jnp.float32)
        label = f"tfim_2^{L}"
    # precomputed matricized site groups: d ≈ L/10 real MXU matmuls
    # per matvec (see models/lattice.py GroupedSiteSum)
    # measured optimum: larger groups (fewer memory passes) win up to
    # ~2^21; smaller groups (fewer FLOPs) win beyond
    group_bits = args.group_bits or (10 if L <= 21 else 8)
    log(f"matricization group_bits={group_bits}")
    op = Operator(
        [H_diag, H_x.grouped(group_bits)], np.array([1.0], dtype=np.float32)
    )

    bound = J * (L - 1) + abs(h) * L + g * L
    e_min, delta = -bound, 2 * bound
    coeffs = jnp.asarray(cheby_coeffs(delta, args.dt), dtype=jnp.float32)
    n_coeffs = coeffs.shape[0]
    matvecs_per_step = n_coeffs - 1
    log(f"Chebyshev: {n_coeffs} coefficients per step (Δ·dt/2={delta*args.dt/2:.1f})")

    rng = np.random.default_rng(1)
    re0 = rng.standard_normal(N)
    im0 = rng.standard_normal(N)
    nrm0 = np.sqrt((re0 ** 2 + im0 ** 2).sum())
    re = jnp.asarray(re0 / nrm0, dtype=jnp.float32)
    im = jnp.asarray(im0 / nrm0, dtype=jnp.float32)

    if args.kernel == "fused":
        plan = make_flip_plan(L, g, tile_rows=args.tile_rows)
        log(
            f"fused plan: tile_rows={plan.tile_rows} "
            f"row_bits={plan.n_row_bits} cross_bits={plan.n_cross}"
        )
    elif args.kernel == "dd":
        from quantumpropagators.models.lattice import (
            chain_bonds,
            ising_diagonal_np,
            lattice2d_bonds,
        )
        from quantumpropagators.ops.fused_cheby_dd import (
            cheby_step_fused_dd,
            dd_tile_rows,
            f32_tail_orders,
        )

        tr_dd = args.tile_rows if args.tile_rows != 512 else dd_tile_rows(L)
        plan = make_flip_plan(L, g, tile_rows=tr_dd)
        log(
            f"df64 fused plan: tile_rows={plan.tile_rows} "
            f"cross_bits={plan.n_cross}"
        )
        bonds = (
            lattice2d_bonds(Lx, Ly) if args.lattice2d else chain_bonds(L)
        )
        diag64 = ising_diagonal_np(L, bonds, J, h)
        beta = delta / 2.0 + e_min

        def dd_split(x64):
            hi = x64.astype(np.float32)
            return (
                jnp.asarray(hi),
                jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)),
            )

        dmb_h, dmb_l = dd_split(diag64 - beta)
        c64_dd = np.asarray(cheby_coeffs(delta, args.dt))
        cdd_h, cdd_l = dd_split(c64_dd)
        dd_tail = (
            f32_tail_orders(c64_dd) if args.f32_tail == "auto"
            else int(args.f32_tail)
        )
        log(f"df64 mixed-precision tail: {dd_tail} of {len(c64_dd)} "
            f"orders in f32")
        dd_extra = {}
        if args.dd_remote_bits:
            args.no_oracle = True
            nrb = args.dd_remote_bits

            def _self_nb(state4):
                return [tuple(state4)] * nrb

            def _self_nb_hi(re_hi, im_hi):
                return [(re_hi, im_hi)] * nrb

            dd_extra = dict(
                extra_nb_fn=_self_nb,
                extra_nb_hi_fn=_self_nb_hi,
                extra_gs=(float(g),) * nrb,
            )
            log(f"A/B: {nrb} self-copy remote planes through the "
                f"sharded hook (result non-physical, cost-accurate)")

    @partial(jax.jit, static_argnames=("n_steps",))
    def run(op, re, im, coeffs, n_steps):
        if args.kernel == "dd":
            state = (re, jnp.zeros_like(re), im, jnp.zeros_like(im))

            def body(s, _):
                return (
                    cheby_step_fused_dd(
                        plan, dmb_h, dmb_l, s, cdd_h, cdd_l,
                        delta, e_min, args.dt, fast=dd_fast,
                        f32_tail=dd_tail, **dd_extra,
                    ),
                    None,
                )

            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            rh, rl, ih, il = state
            return jnp.sqrt(jnp.sum((rh + rl) ** 2 + (ih + il) ** 2))

        if args.kernel == "fused":
            def body(carry, _):
                r, i = carry
                return (
                    cheby_step_fused(
                        plan, H_diag.diag, r, i, coeffs,
                        delta, e_min, args.dt,
                    ),
                    None,
                )

            (re, im), _ = jax.lax.scan(body, (re, im), None, length=n_steps)
            return jnp.sqrt(jnp.sum(re ** 2 + im ** 2))

        if args.kernel == "planar":
            # planar fast path: (re, im) f32 planes end-to-end — no
            # complex interleave/deinterleave passes in the loop
            def body(carry, _):
                r, i = carry
                return (
                    cheby_apply_planar(
                        op, r, i, coeffs, delta, e_min, args.dt
                    ),
                    None,
                )

            (re, im), _ = jax.lax.scan(body, (re, im), None, length=n_steps)
            return jnp.sqrt(jnp.sum(re ** 2 + im ** 2))

        psi = re + 1j * im

        def body(psi, _):
            return cheby_apply(op, psi, coeffs, delta, e_min, args.dt), None

        psi, _ = jax.lax.scan(body, psi, None, length=n_steps)
        # ONLY a scalar f32 leaves the device: this backend's complex /
        # bulk transfers are slow or unimplemented, and device
        # block_until_ready under-reports — a forced tiny transfer is
        # the reliable completion point.
        return jnp.sqrt(jnp.sum(jnp.real(psi) ** 2 + jnp.imag(psi) ** 2))

    n1, n2 = args.steps, 3 * args.steps

    def timed(n):
        t0 = time.perf_counter()
        nrm = float(run(op, re, im, coeffs, n))
        return time.perf_counter() - t0, nrm

    t0 = time.perf_counter()
    timed(n1)
    timed(n2)
    log(f"compile+warmup ({n1} and {n2} steps): {time.perf_counter()-t0:.1f}s")

    t_1, nrm1 = timed(n1)
    t_2, nrm = timed(n2)
    elapsed = max(t_2 - t_1, 1e-9)  # isolates (n2-n1) steps of pure device time
    steps_timed = n2 - n1
    log(
        f"{n1} steps: {t_1:.3f}s; {n2} steps: {t_2:.3f}s → "
        f"{steps_timed} steps in {elapsed:.3f}s; ‖Ψ‖={nrm:.6f}"
    )

    nnz_equiv = (L + 1) * N  # diag + one off-diag entry per site per row
    total_matvecs = steps_timed * matvecs_per_step
    gnnz = total_matvecs * nnz_equiv / elapsed / 1e9
    steps_per_s = steps_timed / elapsed
    log(
        f"throughput: {gnnz:.2f} Gnnz/s "
        f"({total_matvecs} matvecs, {steps_per_s:.2f} steps/s)"
    )

    # error budget: one kernel step vs an exact float64 host oracle
    # (the reference contract is 1e-10 total, test/test_cheby.jl:8).
    # Runs at every size (2^24 takes ~2 min of host numpy — the north-
    # star config must ship with its error budget, VERDICT r2 item 1);
    # --no-oracle skips it.
    per_step_err = None
    if args.kernel == "dd" and not args.no_oracle:
        idx = np.arange(N)
        diag_o = (
            ising_diagonal_np(
                L,
                lattice2d_bonds(Lx, Ly) if args.lattice2d else chain_bonds(L),
                J, h,
            )
        )

        def h_apply(v):
            out = diag_o * v
            for j in range(L):
                out = out + g * v[idx ^ (1 << j)]
            return out

        state0 = (re, jnp.zeros_like(re), im, jnp.zeros_like(im))
        s1 = cheby_step_fused_dd(
            plan, dmb_h, dmb_l, state0, cdd_h, cdd_l, delta, e_min,
            args.dt, fast=dd_fast, f32_tail=dd_tail,
        )
        z = (
            np.asarray(s1[0], np.float64) + np.asarray(s1[1], np.float64)
            + 1j * (np.asarray(s1[2], np.float64) + np.asarray(s1[3], np.float64))
        )
        c64o = np.asarray(cheby_coeffs(delta, args.dt))
        v0 = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
        beta_o = delta / 2 + e_min
        v1 = (-2j / delta) * (h_apply(v0) - beta_o * v0)
        phi = c64o[0] * v0 + c64o[1] * v1
        for k in range(2, len(c64o)):
            v2 = (-4j / delta) * (h_apply(v1) - beta_o * v1) + v0
            phi = phi + c64o[k] * v2
            v0, v1 = v1, v2
        oracle = np.exp(-1j * beta_o * args.dt) * phi
        per_step_err = float(np.abs(z - oracle).max())
        log(f"per-step error vs f64 oracle: {per_step_err:.3e}")

    baseline = cpu_csr_baseline(args.L_ref)
    result = {
        "metric": f"cheby_spmv_throughput_{label}",
        "value": round(gnnz, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / baseline, 2),
        "extra": {
            "steps_per_s": round(steps_per_s, 3),
            "matvecs_per_step": matvecs_per_step,
            "kernel": {
                "fused": "fused_pallas",
                "planar": "planar_f32",
                "complex": "complex64",
                "dd": "fused_pallas_df64",
            }[args.kernel],
            "platform": dev.platform,
            "state_norm_after": round(nrm, 9),
            **(
                {"per_step_error_vs_f64": per_step_err}
                if per_step_err is not None
                else {}
            ),
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

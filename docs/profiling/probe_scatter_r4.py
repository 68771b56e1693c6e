"""Round-4 probe: is the 2^22+ dd-kernel gap (55% of streaming)
caused by the XOR-SCATTERED neighbor reads, or is it a plain
many-block streaming limit?

Three kernels over the same (rows, 128) f32 planes, tile_rows=1024,
identical block count (16 inputs + 2 outputs):

- ``seq``:     all 16 inputs read with the IDENTITY index map
               (pure streaming; neighbor blocks happen to be the
               tile's own block)
- ``scatter``: 7 of the 16 inputs read with XOR index maps
               ``i ^ 2^j`` (the dd kernel's neighbor pattern)
- ``stride``:  7 of the 16 inputs read at a FIXED offset
               ``(i + 2^j) % T`` (non-local but monotone — separates
               "non-identity index map" from "XOR bit pattern")

Each kernel computes a trivial running sum (VPU-negligible) so the
measured rate is HBM movement.  Run on the chip:

    python docs/profiling/probe_scatter_r4.py --L 22

Findings feed docs/benchmarks.md's roofline section (VERDICT r3
item 7: demonstrate whether the scatter bound is structural).
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS = False

LANE = 128
N_IN = 16
N_XOR = 7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kernel(n_in, flops, *refs):
    ins = refs[:n_in]
    o1, o2 = refs[n_in:]
    s = ins[0][:]
    for r in ins[1:]:
        s = s + r[:]
    # optional VPU load (--flops): measures how much per-element
    # compute the pipeline can hide under the same DMA schedule — the
    # dd kernel runs ~400 op-equivalents/elem/order
    t = s
    for _ in range(flops // 2):
        t = t * np.float32(0.9999) + s
    o1[:] = t
    o2[:] = s * np.float32(0.5)


def build(mode, rows, tile_rows, flops=0):
    n_tiles = rows // tile_rows
    kw = {"memory_space": pltpu.VMEM} if _HAS else {}
    vec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), **kw)

    # XOR bits must stay inside the grid (i ^ 2^j < n_tiles — an
    # out-of-range block index is a runtime Internal error); cycle
    # through the available tile-index bits like the dd kernel's
    # n_cross ≤ log2(n_tiles) invariant
    n_bits = max(1, int(np.log2(n_tiles)))

    def xor_spec(j):
        d = 1 << (j % n_bits)
        return pl.BlockSpec(
            (tile_rows, LANE), lambda i, _d=d: (i ^ _d, 0), **kw
        )

    def stride_spec(j):
        d = 1 << (j % n_bits)
        return pl.BlockSpec(
            (tile_rows, LANE),
            lambda i, _d=d, _T=n_tiles: ((i + _d) % _T, 0), **kw
        )

    if mode == "seq":
        specs = [vec] * N_IN
    else:
        mk = xor_spec if mode == "scatter" else stride_spec
        specs = [vec] * (N_IN - N_XOR) + [mk(j) for j in range(N_XOR)]

    cparams = (
        pltpu.CompilerParams(
            # "parallel" like the dd kernel (an earlier revision
            # crashed with out-of-range XOR block indices — bits ≥
            # log2(n_tiles) — under either semantics; fixed above)
            dimension_semantics=("parallel",),
            # (N_IN+2) blocks ×2 double-buffered exceeds the default
            # 16 MB scoped-vmem cap at tile 1024
            vmem_limit_bytes=64 << 20,
        )
        if _HAS else None
    )
    ckw = {"compiler_params": cparams} if cparams else {}

    def call(*planes):
        return pl.pallas_call(
            partial(kernel, N_IN, flops),
            grid=(n_tiles,),
            in_specs=specs,
            out_specs=[vec, vec],
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)] * 2,
            **ckw,
        )(*planes)

    # this tunnel's block_until_ready under-reports and separate
    # dispatches pipeline: chain n invocations in ONE jitted scan
    # (outputs feed the first two inputs — a real data dependence) and
    # time through a scalar transfer, differencing n vs 3n like
    # bench.py
    @partial(jax.jit, static_argnames=("n",))
    def run(planes, n):
        a, b = planes[0], planes[1]
        rest = list(planes[2:])

        def body(carry, _):
            o1, o2 = call(carry[0], carry[1], *rest)
            return (o1, o2), None

        (a, b), _ = jax.lax.scan(body, (a, b), None, length=n)
        return jnp.sum(a)

    return run


def build_manual(rows, tile_rows, flops, interpret=False):
    """MANUAL double-buffered DMA variant: inputs live in HBM (ANY
    memory space), the kernel prefetches chunk i+1's 16 planes while
    computing chunk i — the overlap Mosaic's automatic grid pipeline
    does NOT deliver under compute load (measured: +400 flops/elem
    halves the automatic pipeline's streaming rate)."""
    CH = tile_rows
    n_chunks = rows // CH

    def kernel(*refs):
        ins = refs[:N_IN]
        out = refs[N_IN]

        def body(in_scr, out_scr, in_sem, out_sem):
            def dma_in(slot, ci, j):
                return pltpu.make_async_copy(
                    ins[j].at[pl.ds(ci * CH, CH)],
                    in_scr.at[slot, j],
                    in_sem.at[slot, j],
                )

            def dma_out(slot, ci):
                return pltpu.make_async_copy(
                    out_scr.at[slot],
                    out.at[pl.ds(ci * CH, CH)],
                    out_sem.at[slot],
                )

            for j in range(N_IN):
                dma_in(0, 0, j).start()

            def loop(ci, _):
                cur = ci % 2
                nxt = (ci + 1) % 2

                @pl.when(ci + 1 < n_chunks)
                def _():
                    for j in range(N_IN):
                        dma_in(nxt, ci + 1, j).start()

                for j in range(N_IN):
                    dma_in(cur, ci, j).wait()
                # the out DMA issued 2 chunks ago reused this slot
                @pl.when(ci >= 2)
                def _():
                    dma_out(cur, ci - 2).wait()

                s = in_scr[cur, 0]
                for j in range(1, N_IN):
                    s = s + in_scr[cur, j]
                t = s
                for _ in range(flops // 2):
                    t = t * np.float32(0.9999) + s
                out_scr[cur] = t
                dma_out(cur, ci).start()
                return ()

            jax.lax.fori_loop(0, n_chunks, loop, (),
                              unroll=False)
            # drain the last two out DMAs
            @pl.when(n_chunks >= 2)
            def _():
                dma_out((n_chunks - 2) % 2, n_chunks - 2).wait()
            dma_out((n_chunks - 1) % 2, n_chunks - 1).wait()

        pl.run_scoped(
            body,
            in_scr=pltpu.VMEM((2, N_IN, CH, LANE), jnp.float32),
            out_scr=pltpu.VMEM((2, CH, LANE), jnp.float32),
            in_sem=pltpu.SemaphoreType.DMA((2, N_IN)),
            out_sem=pltpu.SemaphoreType.DMA((2,)),
        )

    kw = {"memory_space": pl.ANY} if _HAS else {}
    anyspec = pl.BlockSpec(**kw)

    mparams = (
        pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
        if _HAS and not interpret else None
    )
    mkw = {"compiler_params": mparams} if mparams else {}

    def call(*planes):
        return pl.pallas_call(
            kernel,
            in_specs=[anyspec] * N_IN,
            out_specs=anyspec,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            interpret=interpret,
            **mkw,
        )(*planes)

    @partial(jax.jit, static_argnames=("n",))
    def run(planes, n):
        a = planes[0]
        rest = list(planes[1:])

        def sbody(carry, _):
            return call(carry, *rest), None

        a, _ = jax.lax.scan(sbody, a, None, length=n)
        return jnp.sum(a)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=22)
    ap.add_argument("--tile-rows", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--flops", type=int, default=0,
                    help="extra VPU flops per element inside the "
                         "kernel (overlap test: the dd kernel runs "
                         "~400 op-equivalents/elem/order)")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret mode (CPU smoke test)")
    ap.add_argument("--manual", action="store_true",
                    help="manual double-buffered DMA variant instead "
                         "of the three auto-pipelined modes")
    args = ap.parse_args()
    rows = (1 << args.L) // LANE
    rng = np.random.default_rng(0)
    planes = [
        jnp.asarray(
            rng.standard_normal((rows, LANE)) * 1e-3, dtype=jnp.float32
        )
        for _ in range(N_IN)
    ]
    if args.manual:
        nbytes = (N_IN + 1) * rows * LANE * 4
        log(f"L={args.L} MANUAL dma, flops={args.flops}: "
            f"{nbytes / 2**30:.2f} GiB per invocation")
        run = build_manual(rows, args.tile_rows, args.flops,
                           interpret=args.interpret)
        n = args.reps
        float(run(planes, n))
        float(run(planes, 3 * n))
        t0 = time.perf_counter()
        float(run(planes, n))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(planes, 3 * n))
        t3 = time.perf_counter() - t0
        per = max(t3 - t1, 1e-9) / (2 * n)
        log(f"manual  : {nbytes / per / 1e9:7.1f} GB/s "
            f"({per * 1e3:.2f} ms/invocation)")
        return

    nbytes = (N_IN + 2) * rows * LANE * 4
    log(f"L={args.L}: {N_IN} in + 2 out planes, "
        f"{nbytes / 2**30:.2f} GiB per invocation")
    for mode in ("seq", "stride", "scatter"):
        run = build(mode, rows, args.tile_rows, args.flops)
        n = args.reps
        float(run(planes, n))
        float(run(planes, 3 * n))  # compile both
        t0 = time.perf_counter()
        float(run(planes, n))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(planes, 3 * n))
        t3 = time.perf_counter() - t0
        per = max(t3 - t1, 1e-9) / (2 * n)
        log(f"{mode:8s}: {nbytes / per / 1e9:7.1f} GB/s "
            f"({per * 1e3:.2f} ms/invocation)")


if __name__ == "__main__":
    main()

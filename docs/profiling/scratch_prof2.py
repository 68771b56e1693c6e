"""Profile the v2 dd component kernel: traffic floor vs VPU vs XOR specs."""
import time, sys
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantumpropagators.ops.fused_cheby import make_flip_plan, _LANE
from quantumpropagators.ops import fused_cheby_dd as fdd

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
TR = int(sys.argv[2]) if len(sys.argv) > 2 else 512
variant = sys.argv[3] if len(sys.argv) > 3 else "all"

plan = make_flip_plan(L, 1.2, tile_rows=TR)
n_cross = plan.n_cross
rows = 1 << (L - 7)
n_tiles = rows // TR
print(f"L={L} TR={TR} n_cross={n_cross} n_tiles={n_tiles}")

rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.standard_normal((rows, _LANE)), jnp.float32)
v1h, v1l, dmh, dml, v0h, v0l, phh, phl = (mk() for _ in range(8))
gsplits = tuple(fdd._veltkamp_f64(1.2 * -4.0 / 7.0) for _ in plan.gs)

vec = pl.BlockSpec((TR, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
def nb_spec(j):
    return pl.BlockSpec((TR, _LANE), lambda i, _j=j: (i ^ (1 << _j), 0),
                        memory_space=pltpu.VMEM)
def self_spec(j):
    return pl.BlockSpec((TR, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

smem = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
out4 = [jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)] * 4
cp = pltpu.CompilerParams(dimension_semantics=("parallel",))
a_k2 = jnp.asarray([[0.3, 1e-9]], jnp.float32)

def build(nb_kind, body_kind):
    """nb_kind: 'xor'|'self'|'none'; body_kind: 'full'|'copy'|'noflips'"""
    nc = 0 if nb_kind == "none" else n_cross
    specs = [vec, vec]
    for j in range(nc):
        sp = nb_spec(j) if nb_kind == "xor" else self_spec(j)
        specs += [sp, sp]
    specs += [vec] * 6
    n_in = 1 + 8 + 2 * nc
    phi_base = n_in - 2
    v0_base = n_in - 4
    aliases = {v0_base: 0, v0_base + 1: 1, phi_base: 2, phi_base + 1: 3}

    def kern(a_ref, *refs):
        if body_kind == "copy":
            k = 2 + 2 * nc + 2
            v0h_, v0l_, phh_, phl_ = (r[:] for r in refs[k:k + 4])
            o = refs[k + 4:]
            s = refs[0][:] + refs[1][:]
            for j in range(nc):
                s = s + refs[2 + 2 * j][:]
            o[0][:] = v0h_ + s
            o[1][:] = v0l_
            o[2][:] = phh_
            o[3][:] = phl_
        elif body_kind == "noflips":
            # dd arithmetic without the flip accumulation
            vh, vl = refs[0][:], refs[1][:]
            k = 2 + 2 * nc
            dh, dl = refs[k][:], refs[k + 1][:]
            v0h_, v0l_ = refs[k + 2][:], refs[k + 3][:]
            phh_, phl_ = refs[k + 4][:], refs[k + 5][:]
            o = refs[k + 6:]
            p = vh * dh
            x1, x2 = fdd._split(vh)
            d1, d2 = fdd._split(dh)
            e = (((x1 * d1 - p) + x1 * d2 + x2 * d1) + x2 * d2) + vh * dl + vl * dh
            for j in range(nc):
                nh, nl = refs[2 + 2 * j][:], refs[3 + 2 * j][:]
                p, err = fdd._two_sum(p, nh)
                e = e + err + nl
            v2h, err = fdd._two_sum(p, v0h_)
            v2l = e + v0l_ + err
            v2h, v2l = fdd._two_sum(v2h, v2l)
            ah = a_ref[0, 0]; al = a_ref[0, 1]
            t = fdd._SPLIT * ah
            a1 = t - (t - ah); a2 = ah - a1
            q, qe = fdd._prod_presplit(v2h, a1, a2, ah, al, xl=v2l)
            nphh, err = fdd._two_sum(phh_, q)
            o[0][:] = v2h; o[1][:] = v2l
            o[2][:] = nphh; o[3][:] = phl_ + qe + err
        else:
            fdd._iter_component_kernel(plan, gsplits, True, nc, 1.0, a_ref, *refs)

    return pl.pallas_call(
        kern, grid=(n_tiles,), in_specs=[smem] + specs,
        out_specs=[vec] * 4, out_shape=out4,
        input_output_aliases=aliases, compiler_params=cp)

def run_loop(f, nc, n):
    @partial(jax.jit, static_argnames=("n",))
    def go(v1h, v1l, v0h, v0l, phh, phl, n):
        def body(c, _):
            v1h, v1l, v0h, v0l, phh, phl = c
            args = [v1h, v1l]
            for _ in range(nc):
                args += [v1h, v1l]
            args += [dmh, dml, v0h, v0l, phh, phl]
            o = f(a_k2, *args)
            return (o[0], o[1], v1h, v1l, o[2], o[3]), None
        c, _ = jax.lax.scan(body, (v1h, v1l, v0h, v0l, phh, phl), None, length=n)
        return c[0].sum()
    return go

def difftime(go, n1=96, reps=4):
    n2 = 3 * n1
    float(go(v1h, v1l, v0h, v0l, phh, phl, n1))
    float(go(v1h, v1l, v0h, v0l, phh, phl, n2))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(go(v1h, v1l, v0h, v0l, phh, phl, n1)); t1 = time.perf_counter()
        float(go(v1h, v1l, v0h, v0l, phh, phl, n2)); t2 = time.perf_counter()
        best = min(best, (t2 - t1) - (t1 - t0))
    return best / (n2 - n1)

cases = [
    ("copy/xor", "xor", "copy"),
    ("copy/self", "self", "copy"),
    ("full/xor", "xor", "full"),
    ("full/self", "self", "full"),
    ("full/none", "none", "full"),
    ("noflips/xor", "xor", "noflips"),
]
PL = rows * _LANE * 4 / 1e9
for name, nb, body in cases:
    nc = 0 if nb == "none" else n_cross
    try:
        f = build(nb, body)
        t = difftime(run_loop(f, nc, None))
        planes = 16 + 4 + (0 if nb == "none" else 0)
        planes = 2 + 2 * nc + 6 + 4
        print(f"{name:12s}: {t*1e3:7.3f} ms/call  ({planes} planes → {planes*PL/t:.0f} GB/s)")
    except Exception as e:
        print(f"{name:12s}: FAILED {type(e).__name__} {str(e)[:120]}")

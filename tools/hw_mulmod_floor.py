"""Microbench: the pure-compute floor of the stage-2 replay loop.

Times a Pallas kernel that runs T sequential iterations of EXACTLY the
replay body's arithmetic (norm1(diff) then a dependent mulmod into the
accumulator) on VMEM-resident operands — no DMA, no gathers, one kernel
invocation.  Compares against the same loop with the diff operands swapped
per iteration from a small VMEM ring (to rule out operand-cache effects).
This bounds what any replay kernel can achieve per entry at the flagship
geometry and attributes the remainder to DMA/dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.expanduser("~/.cache/tpu_ecm")
try:
    jax.config.update("jax_compilation_cache_dir",
                      f"{cache}/jax-{jax.default_backend()}")
except Exception:
    pass

from tpu_ecm import params
from tpu_ecm.limbs import layout, pallas_ops

N = (205688069665150755269371147819668813122841983204197482918578443
     * 411376139330301510538742295639337626245683966408394965837157771)
B = int(os.environ.get("MB_BATCH", "2048"))
T = int(os.environ.get("MB_STEPS", "65536"))
ctx = params.make_monty(N)
p = ctx.p
nw, bs = p.nw, B // pallas_ops.LANE
LANE = pallas_ops.LANE

rng = np.random.RandomState(3)
vals = [int.from_bytes(rng.bytes(60), "little") % N for _ in range(B)]
a0 = layout.pack_batch(vals, p.w, p.nw).reshape(nw, bs, LANE)
b0 = np.roll(a0, 1, axis=-1)
acc0 = np.roll(a0, 2, axis=-1)


NB = 16      # ring depth for the dynamic-slot variants (= stream kernel NB)


def make(kind):
    EA = 4       # independent accumulator chains for the multiacc variant

    def kernel(a_in, b_in, acc_in, acc_out, scr, ring):
        mulmod, sqrmod, norm1 = pallas_ops._make_arith(ctx)
        scr[...] = acc_in[...]
        if kind in ("dynslot", "switchslot", "multiacc"):
            for s in range(NB):
                ring[s] = b_in[...]      # values irrelevant to read cost

        def body(k, _):
            if kind == "mul_only":
                d = norm1(a_in[...] - b_in[...])
                scr[...] = mulmod(scr[...], d, pre=True)
            elif kind == "dynslot":
                # the stream-kernel read pattern: operand from a VMEM ring
                # at a DYNAMIC slot index — measures what the dynamic
                # first-axis VMEM load costs over the static floor
                d = norm1(a_in[...] - ring[jax.lax.rem(k, NB)])
                scr[...] = mulmod(scr[...], d, pre=True)
            elif kind == "switchslot":
                # same ring read lowered as a lax.switch over static rows
                slot = jax.lax.rem(k, NB)
                rb = jax.lax.switch(
                    slot, [lambda s=s: ring[s] for s in range(NB)])
                d = norm1(a_in[...] - rb)
                scr[...] = mulmod(scr[...], d, pre=True)
            elif kind == "multiacc":
                # EA independent acc chains per body: the serial body's
                # critical path (norm1 -> mulmod ~2.4us) amortizes over EA
                # entries of ILP — the theory that fori_loop bodies don't
                # software-pipeline across iterations, so per-iteration
                # latency == per-iteration cost regardless of chains
                for s in range(EA):
                    d = norm1(a_in[...] - ring[2 * s])
                    ring[s] = mulmod(ring[s], d, pre=True)
            elif kind == "mul_nonorm":
                # pure mulmod chain, no sub/norm1: is the diff prep the
                # 2.42-vs-1.1 gap?  (round-5 contradiction bisect)
                scr[...] = mulmod(scr[...], b_in[...], pre=True)
            elif kind.startswith("chain"):
                # CV dependent muls inlined per body: does a BIG body
                # amortize a per-body cost the small bodies pay per mul?
                cv = int(kind[5:])
                v = scr[...]
                for _s in range(cv):
                    v = mulmod(v, b_in[...], pre=True)
                scr[...] = v
            elif kind == "sqr8":
                # 8 dependent sqrmods: is SQR at the xadd body's rate
                # while MUL is not?  (xadd is 4 mul + 2 sqr)
                v = scr[...]
                for _s in range(8):
                    v = sqrmod(v, pre=True)
                scr[...] = v
            elif kind == "xadd1":
                # ONE xadd (6 muls, shared operands) per body in THIS
                # harness — if it matches the stage-1 floor's 6.45 us,
                # the harness is not the variable; count = point-ops
                pa0, pa1 = scr[...], a_in[...]
                pb0, pb1 = b_in[...], a_in[...]
                pd0, pd1 = a_in[...], b_in[...]
                s1, d1 = norm1(pa0 + pa1), norm1(pa0 - pa1)
                s2, d2 = norm1(pb0 + pb1), norm1(pb0 - pb1)
                u_ = mulmod(d1, s2, pre=True)
                v_ = mulmod(s1, d2, pre=True)
                t1 = sqrmod(norm1(u_ + v_), pre=True)
                t2 = sqrmod(norm1(u_ - v_), pre=True)
                x2 = mulmod(t1, pd1, pre=True)
                z2 = mulmod(t2, pd0, pre=True)
                scr[...] = norm1(x2 + z2)
            elif kind.startswith("tree"):
                # E diffs tree-reduced as pure VALUES + one acc mul — the
                # ILP shape the xadd body has (u/v then t1/t2 independent)
                # and multiacc does NOT: multiacc's chains read AND write
                # rows of the same scratch ref, which Mosaic may order
                # conservatively; a value tree has no ref carries inside
                # the body.  E muls per E entries, entry count = E * iters.
                ev = int(kind[4:])
                diffs = [norm1(a_in[...] - ring[s % NB])
                         for s in range(ev)]
                while len(diffs) > 1:
                    diffs = ([mulmod(diffs[j], diffs[j + 1], pre=True)
                              for j in range(0, len(diffs) - 1, 2)]
                             + ([diffs[-1]] if len(diffs) % 2 else []))
                scr[...] = mulmod(scr[...], diffs[0], pre=True)
            elif kind == "indep2":
                # TWO independent mulmods per body on pure values (the
                # minimal xadd-like ILP): if per-mul cost drops vs
                # mul_only, the VPU was latency- not throughput-bound
                d1 = norm1(a_in[...] - ring[0])
                d2 = norm1(a_in[...] - ring[1])
                m1 = mulmod(d1, b_in[...], pre=True)
                m2 = mulmod(d2, a_in[...], pre=True)
                scr[...] = norm1(m1 + m2)
            else:   # independent muls: no acc dependency chain
                d = norm1(a_in[...] - b_in[...])
                acc_out[...] = mulmod(d, b_in[...], pre=True)
            return 0

        per_body = (EA if kind == "multiacc"
                    else int(kind[4:]) if kind.startswith("tree")
                    else int(kind[5:]) if kind.startswith("chain")
                    else 8 if kind == "sqr8"
                    else 2 if kind == "indep2" else 1)
        jax.lax.fori_loop(0, T // per_body, body, 0)
        if kind == "multiacc":
            acc_out[...] = mulmod(mulmod(ring[0], ring[1], pre=True),
                                  mulmod(ring[2], ring[3], pre=True),
                                  pre=True)
        elif kind != "indep":
            acc_out[...] = scr[...]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, bs, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nw, bs, LANE), jnp.int32),
                        pltpu.VMEM((NB, nw, bs, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


KINDS = os.environ.get(
    "MB_KINDS",
    "mul_only,mul_nonorm,indep2,tree4,tree8,tree16,multiacc,dynslot,indep"
).split(",")

for kind in KINDS:
    run = jax.jit(make(kind))
    out = run(jnp.asarray(a0), jnp.asarray(b0), jnp.asarray(acc0))
    _ = np.asarray(out[0, 0])
    best = float("inf")
    for _i in range(3):
        t0 = time.time()
        out = run(jnp.asarray(a0), jnp.asarray(b0), jnp.asarray(acc0))
        _ = np.asarray(out[0, 0])
        best = min(best, time.time() - t0)
    print(f"{kind}: {best:.3f}s for {T} iters at [nw={nw}, B={B}] "
          f"=> {best / T * 1e6:.3f} us per norm1+mulmod", flush=True)

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
import time

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
        mulmod, _, norm1 = pallas_ops._make_arith(ctx)
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
            else:   # independent muls: no acc dependency chain
                d = norm1(a_in[...] - b_in[...])
                acc_out[...] = mulmod(d, b_in[...], pre=True)
            return 0

        jax.lax.fori_loop(0, T // EA if kind == "multiacc" else T, body, 0)
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


for kind in ("mul_only", "multiacc", "dynslot", "indep"):
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

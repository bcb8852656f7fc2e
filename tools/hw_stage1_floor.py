"""Microbench: the pure-compute floor of the stage-1 tape body (VERDICT r3
item 7 — the stage-1 analog of tools/hw_mulmod_floor.py).

Three measurements at the flagship geometry (416-bit, B=2048):

1. "body floor": a Pallas kernel running T PRAC-mix point-ops (5 xadd : 1
   xdbl, the measured stage-1 tape mix) on FIXED VMEM slots — no SMEM tape
   reads, no lax.switch, no dynamic slot indexing, no chunk boundaries.
   This bounds what any tape executor can deliver per point-op.
2. "tape executor": the production make_tape_executor on a synthetic
   ADD/DUP tape with the same op mix and count — the delta vs (1) is the
   tape machinery (switch + dynamic register-file indexing + chunking).
3. chunk sweep: (2) at chunk = 4096/8192/16384/32768 — per-chunk dispatch
   vs VMEM-residency trade (default 8192).

The real-tape op mix is printed for reference (ADD:DUP from the actual
B1=1e6 PRAC tape; /root/reference/ecm.c:1806-1854 is the loop being
modeled).
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
from tpu_ecm.curve import ops as curve_ops, prac
from tpu_ecm.limbs import layout, pallas_ops
from tpu_ecm.primes import primes_range

N = (205688069665150755269371147819668813122841983204197482918578443
     * 411376139330301510538742295639337626245683966408394965837157771)
B = int(os.environ.get("MB_BATCH", "2048"))
T = int(os.environ.get("MB_STEPS", "65536"))
REPS = int(os.environ.get("MB_REPS", "3"))
ctx = params.make_monty(N)
p = ctx.p
nw, bs = p.nw, B // pallas_ops.LANE
LANE = pallas_ops.LANE

rng = np.random.RandomState(3)
vals = [int.from_bytes(rng.bytes(60), "little") % N for _ in range(B)]
x0 = layout.pack_batch(vals, p.w, p.nw)
z0 = np.roll(x0, 1, axis=-1)
s0 = np.roll(x0, 2, axis=-1)

# real-tape mix at the flagship B1 (informational; ~5.0 ADD : 1 DUP)
b1 = int(os.environ.get("MB_B1", "1000000"))
tape = prac.cached_stage1_tape(primes_range(0, b1), b1, cache,
                               "bench_full", include_two=True)
opc = np.asarray(tape)[:, 0]
nadd = int(np.count_nonzero(opc == curve_ops.OP_ADD))
ndup = int(np.count_nonzero(opc == curve_ops.OP_DUP))
print(f"real B1={b1} tape: {tape.shape[0]} ops, ADD:DUP = "
      f"{nadd}:{ndup} = {nadd / max(1, ndup):.2f}", flush=True)
ADD_PER_DUP = max(1, round(nadd / max(1, ndup)))


def make_floor():
    """PRAC-mix body on fixed slots: per group, ADD_PER_DUP xadds walking a
    3-slot rotation + one xdbl — every operand a static VMEM address."""
    def kernel(pt_in, s_in, pt_out, scr):
        mulmod, sqrmod, norm1 = pallas_ops._make_arith(ctx)
        s_const = s_in[...]

        def xdbl(X, Z):
            s_, d_ = norm1(X + Z), norm1(X - Z)
            v = sqrmod(d_, pre=True)
            u = sqrmod(s_, pre=True)
            x2 = mulmod(u, v, pre=True)
            w_ = norm1(u - v)
            t = mulmod(w_, s_const, pre=True)
            z2 = mulmod(norm1(t + v), w_, pre=True)
            return jnp.stack([x2, z2])

        def xadd(pa, pb, pd):
            s1, d1 = norm1(pa[0] + pa[1]), norm1(pa[0] - pa[1])
            s2, d2 = norm1(pb[0] + pb[1]), norm1(pb[0] - pb[1])
            u = mulmod(d1, s2, pre=True)
            v = mulmod(s1, d2, pre=True)
            t1 = sqrmod(norm1(u + v), pre=True)
            t2 = sqrmod(norm1(u - v), pre=True)
            return jnp.stack([mulmod(t1, pd[1], pre=True),
                              mulmod(t2, pd[0], pre=True)])

        scr[0] = pt_in[0]
        scr[1] = pt_in[1]
        scr[2] = pt_in[2]
        group = ADD_PER_DUP + 1
        nsteps = T // group

        def body(k, _):
            for i in range(ADD_PER_DUP):
                a, b_, c = i % 3, (i + 1) % 3, (i + 2) % 3
                scr[c] = xadd(scr[a], scr[b_], scr[c])
            scr[0] = xdbl(scr[1][0], scr[1][1])
            return 0

        jax.lax.fori_loop(0, nsteps, body, 0)
        pt_out[...] = scr[0]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nw, bs, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, 2, nw, bs, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def time_best(fn, sync):
    out = fn()
    sync(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        out = fn()
        sync(out)
        best = min(best, time.time() - t0)
    return best


def main():
    group = ADD_PER_DUP + 1
    t_eff = (T // group) * group

    # 1. body floor
    run = jax.jit(make_floor())
    pt = jnp.asarray(np.stack([np.stack([x0, z0]),
                               np.stack([z0, x0]),
                               np.stack([s0, x0])])
                     .reshape(3, 2, nw, bs, LANE))
    sc = jnp.asarray(s0.reshape(nw, bs, LANE))
    best = time_best(lambda: run(pt, sc), lambda o: np.asarray(o[0, 0, 0]))
    floor_us = best / t_eff * 1e6
    print(f"body floor: {best:.3f}s for {t_eff} point-ops "
          f"[nw={nw}, B={B}] => {floor_us:.3f} us/point-op", flush=True)

    # 2 + 3. production tape executor, chunk sweep (8192 = default)
    syn = np.zeros((T, 5), dtype=np.int32)
    syn[:, 0] = curve_ops.OP_ADD
    syn[:, 1:5] = [2, 0, 1, 2]
    syn[group - 1::group, 0] = curve_ops.OP_DUP
    syn[group - 1::group, 1:3] = 1, 0
    pts = np.zeros((curve_ops.NUM_SLOTS, 2, nw, B), dtype=np.int32)
    pts[0, 0], pts[0, 1], pts[1, 0], pts[1, 1], pts[2, 0], pts[2, 1] = \
        x0, z0, z0, x0, s0, x0
    s_const = jnp.asarray(s0)
    for chunk in (4096, 8192, 16384, 32768):
        runp = pallas_ops.make_tape_executor(ctx, B, chunk=chunk)
        # pts is DONATED by the executor: thread the output back in (the
        # values are irrelevant to cost — work is data-oblivious)
        out = runp(jnp.asarray(pts), syn, s_const)
        _ = np.asarray(out[0, 0, :1])
        best = float("inf")
        for _i in range(REPS):
            t0 = time.time()
            out = runp(out, syn, s_const)
            _ = np.asarray(out[0, 0, :1])
            best = min(best, time.time() - t0)
        us = best / T * 1e6
        print(f"tape executor chunk={chunk}: {best:.3f}s for {T} ops "
              f"=> {us:.3f} us/point-op ({us / floor_us:.2f}x floor)",
              flush=True)


if __name__ == "__main__":
    main()

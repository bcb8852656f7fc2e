"""Headline benchmark: ECM stage-1 curves/sec/chip at B1=1e6 on a 416-bit
input (the BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): avx-ecm claims 2x GMP-ECM curves/sec
(/root/reference/README.md:2); the shipped GMP-ECM oracle log gives 16.45 s
for step 1 at B1=1e6 on a 508-bit C153 (/root/reference/test_inputs.txt:26-31).
Scaling by schoolbook-mulmod area (416/508)^2 = 0.67 gives ~11.0 s/curve/core
for GMP-ECM at 416 bits, so avx-ecm ~5.5 s/curve/core, i.e. ~11.6 curves/sec
on the 64-core Skylake-X box named in BASELINE.json.  vs_baseline is
curves/sec divided by that 11.6.

Method: run the real B1=1e6 stage-1 tape (PRAC-planned, ~2.2M ADD/DUP ops)
through the Pallas tape executor for a timed slice and extrapolate linearly
(the tape is uniform work).  Timing is synchronized by pulling the result
back to the host (block_until_ready is not reliable over the axon tunnel).
"""

import json
import os
import sys
import time

BASELINE_CURVES_PER_SEC = 11.6  # avx-ecm on 64-core SKX, 416-bit, B1=1e6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/tpu_ecm")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          f"{cache}/jax-{jax.default_backend()}")
    except Exception:
        pass

    from tpu_ecm import params
    from tpu_ecm.curve import ops, prac, suyama
    from tpu_ecm.limbs import jnp_ops, layout, pallas_ops
    from tpu_ecm.primes import primes_range

    b1 = 1_000_000
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    slice_len = int(os.environ.get("BENCH_SLICE", "65536"))

    n = (205688069665150755269371147819668813122841983204197482918578443
         * 411376139330301510538742295639337626245683966408394965837157771)
    assert n.bit_length() == 416
    ctx = params.make_monty(n)

    t0 = time.time()
    tape = prac.cached_stage1_tape(primes_range(0, b1), b1, cache,
                                   "bench_full", include_two=True)
    plan_t = time.time() - t0
    full_len = tape.shape[0]
    slice_len = min(slice_len, full_len)

    curves = [suyama.build_one_curve(ctx, 7000 + i) for i in range(batch)]
    p = ctx.p
    pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, batch), dtype=np.int32)
    pts[0, 0] = layout.pack_batch([c.x_mont for c in curves], p.w, p.nw)
    pts[0, 1] = layout.pack_batch([c.z_mont for c in curves], p.w, p.nw)
    s_const = jnp.asarray(layout.pack_batch([c.s_mont for c in curves],
                                            p.w, p.nw))
    pts = jnp.asarray(pts)

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        dctx = jnp_ops.device_ctx(ctx)
        runj = jax.jit(ops.run_tape)

        def run(pts, tape):
            return runj(pts, tape, s_const, dctx)
    else:
        runp = pallas_ops.make_tape_executor(ctx, batch)

        def run(pts, tape):
            return runp(pts, tape, s_const)

    # host numpy: the pallas executor slices/uploads fixed-size chunks itself
    tslice = np.asarray(tape[:slice_len])
    out = run(pts, tslice)
    _ = np.asarray(out)      # sync (compile + first run)
    # best-of-N: the tunnel-attached chip's delivered throughput varies with
    # external load (rare 2-20x outliers, see BENCH_NOTES.md); the best
    # sample is the per-chip capability
    reps = int(os.environ.get("BENCH_REPS", "3"))
    dt = float("inf")
    for _i in range(reps):
        t0 = time.time()
        out = run(out, tslice)
        _ = np.asarray(out[0, 0, :1])
        dt = min(dt, time.time() - t0)

    time_full = dt * (full_len / slice_len)
    curves_per_sec = batch / time_full
    print(f"# device={jax.devices()[0]} batch={batch} NW={p.nw} w={p.w} "
          f"tape={full_len} slice={slice_len} slice_time={dt:.3f}s "
          f"extrapolated_full={time_full:.1f}s plan_time={plan_t:.1f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "ecm_stage1_curves_per_sec_per_chip_416bit_B1_1e6",
        "value": round(curves_per_sec, 3),
        "unit": "curves/sec",
        "vs_baseline": round(curves_per_sec / BASELINE_CURVES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

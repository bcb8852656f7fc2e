"""Headline benchmark: END-TO-END ECM curves/sec/chip at B1=1e6, B2=100*B1
(the reference's default bound ratio, /root/reference/main.c:462) on a
416-bit input.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
stage-1-only companion fields (the round-1 metric, kept for continuity).

Baselines (BASELINE.md / BENCH_NOTES.md):
* Stage-1-only 11.6 curves/sec: avx-ecm claims 2x GMP-ECM
  (/root/reference/README.md:2); the shipped GMP-ECM oracle log gives
  16.45 s step 1 at B1=1e6 on a 508-bit C153
  (/root/reference/test_inputs.txt:26-31); (416/508)^2 schoolbook-area
  scaling -> ~5.5 s/curve/core -> 11.6 curves/sec on the 64-core
  Skylake-X box named in BASELINE.json.
* End-to-end 7.93 curves/sec: the reference binary measured on real
  AVX-512 silicon in this container (BENCH_NOTES.md "Reference binary
  measured locally") runs 0.79 curves/s/core stage-1-only and 0.54
  end-to-end at B1=1e6/B2=1e8 — a 0.684 e2e/stage-1 throughput ratio.
  11.6 x 0.684 = 7.93 curves/sec end-to-end for the same 64-core box.

Method: stage 1 runs the real B1=1e6 tape (PRAC-planned, ~2.2M ADD/DUP
ops) for a timed slice, best-of-N, extrapolated linearly (the tape is
uniform work).  Stage 2 is NOT extrapolated: a full real B2=1e8
continuation (init + pairing + replay + batch inversions) is executed
and wall-timed in steady state (a warmup runner first populates the
compiled-executor cache, because in production the driver shares
executors across curve batches).  Timing is synchronized by pulling
results back to the host (block_until_ready is not reliable over the
axon tunnel).  BENCH_E2E=0 skips stage 2 and reports the stage-1-only
metric (the CPU-smoke default).
"""

import json
import os
import sys
import time

BASELINE_CURVES_PER_SEC = 11.6   # avx-ecm 64-core SKX, 416-bit, stage 1 only
E2E_BASELINE_CURVES_PER_SEC = 7.93  # x0.684 measured e2e/stage-1 ratio

# Idle-chip reference for the 65536-op stage-1 slice at B=2048/416-bit:
# 7.10 us/point-op (BENCH_NOTES round 4, tape executor chunk=8192 on an
# idle chip).  The tunnel-attached chip's delivered throughput varies
# ~2x with external load; load_factor = measured/idle quantifies how
# representative this artifact is of per-chip capability (VERDICT r4
# item 7).
IDLE_SLICE_US_PER_OP = 7.10

# Assumed VPU peak for the MFU accounting (VERDICT r4 item 6): 8 sublanes
# x 128 lanes x 4 ALU slots x ~0.94 GHz TensorCore clock = 3.85e12 int32
# MAC/s.  The clock/ALU numbers are not published for v5e; the assumption
# is pinned here so the mfu field is reproducible, and BENCH_NOTES anchors
# it against the measured same-chip arithmetic floor (the xadd body at
# 6.45 us/point-op).
VPU_PEAK_INT32_MAC_PER_S = 8 * 128 * 4 * 0.94e9


def count_macs_per_op(ctx):
    """Exact int32 multiply counts per xadd/xdbl/replay-entry for the
    digit engine at this modulus geometry, by tracing the SAME arithmetic
    generator the Pallas kernels inline (pallas_ops._make_arith) and
    counting `mul` primitives in the jaxpr (integer_pow/shift/mask ops are
    not MACs).  Each counted mul is a full [bs, LANE] tile op, so MACs =
    muls * B elements."""
    import jax
    import jax.numpy as jnp

    from tpu_ecm.curve import ops as curve_ops
    from tpu_ecm.limbs import pallas_ops

    p = ctx.p
    spec = jax.ShapeDtypeStruct((p.nw, 8, 128), jnp.int32)
    mulmod, sqrmod, norm1 = pallas_ops._make_arith(ctx)

    def muls(fn, *specs):
        jaxpr = jax.make_jaxpr(fn)(*specs)
        n = 0
        for eqn in jaxpr.jaxpr.eqns:
            if eqn.primitive.name == "mul":
                n += 1
        return n

    m_mul = muls(lambda a, b: mulmod(a, b, pre=True), spec, spec)
    m_sqr = muls(lambda a: sqrmod(a, pre=True), spec)

    def xadd(pa, pb, pd):
        s1, d1 = norm1(pa[0] + pa[1]), norm1(pa[0] - pa[1])
        s2, d2 = norm1(pb[0] + pb[1]), norm1(pb[0] - pb[1])
        u = mulmod(d1, s2, pre=True)
        v = mulmod(s1, d2, pre=True)
        t1 = sqrmod(norm1(u + v), pre=True)
        t2 = sqrmod(norm1(u - v), pre=True)
        return jnp.stack([mulmod(t1, pd[1], pre=True),
                          mulmod(t2, pd[0], pre=True)])

    def xdbl(X, Z, s_const):
        s_, d_ = norm1(X + Z), norm1(X - Z)
        v = sqrmod(d_, pre=True)
        u = sqrmod(s_, pre=True)
        x2 = mulmod(u, v, pre=True)
        w_ = norm1(u - v)
        t = mulmod(w_, s_const, pre=True)
        z2 = mulmod(norm1(t + v), w_, pre=True)
        return jnp.stack([x2, z2])

    pt = jax.ShapeDtypeStruct((2, p.nw, 8, 128), jnp.int32)
    m_xadd = muls(xadd, pt, pt, pt)
    m_xdbl = muls(xdbl, spec, spec, spec)
    m_entry = muls(lambda acc, a, b: mulmod(acc, norm1(a - b), pre=True),
                   spec, spec, spec)
    del curve_ops
    return dict(mul=m_mul, sqr=m_sqr, xadd=m_xadd, xdbl=m_xdbl,
                entry=m_entry)


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

    b1 = int(os.environ.get("BENCH_B1", "1000000"))  # smoke override only
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
    dt, dt_worst = float("inf"), 0.0
    for _i in range(reps):
        t0 = time.time()
        out = run(out, tslice)
        _ = np.asarray(out[0, 0, :1])
        s = time.time() - t0
        dt, dt_worst = min(dt, s), max(dt_worst, s)
    # tunnel-load indicator: best observed slice rate vs the recorded
    # idle-chip rate (1.0 = idle-chip capability; >1 = external load)
    load_factor = (dt / (slice_len * IDLE_SLICE_US_PER_OP * 1e-6)
                   if (not on_cpu and batch == 2048) else None)
    spread = (dt_worst - dt) / dt if dt > 0 else 0.0

    time_full = dt * (full_len / slice_len)
    extrapolated = time_full
    # Full-tape de-extrapolation: run the WHOLE tape (including every
    # chunk-boundary cost the slice excludes) and use the measured wall as
    # the stage-1 number; the slice extrapolation error is reported
    # alongside.  DEFAULT on hardware since round 4 (VERDICT r3 item 3 —
    # the driver artifact must carry the measured, not extrapolated,
    # headline; round 3 measured the slice UNDERSTATING by ~6%).
    # BENCH_FULL=0 keeps the fast slice-only smoke mode (and stays the
    # default on the CPU backend, where the full tape takes hours).
    full_err = None
    if (os.environ.get("BENCH_FULL", "0" if on_cpu else "1") != "0"
            and full_len > slice_len):
        tfull = np.asarray(tape)
        t0 = time.time()
        out = run(out, tfull)
        _ = np.asarray(out[0, 0, :1])
        t_meas = time.time() - t0
        t0 = time.time()
        out = run(out, tfull)
        _ = np.asarray(out[0, 0, :1])
        t_meas = min(t_meas, time.time() - t0)
        full_err = (t_meas - extrapolated) / t_meas
        time_full = t_meas
        print(f"# full-tape run: measured={t_meas:.1f}s vs "
              f"extrapolated={extrapolated:.1f}s "
              f"(slice error {100 * full_err:+.1f}%)", file=sys.stderr)
    curves_per_sec = batch / time_full
    print(f"# device={jax.devices()[0]} batch={batch} NW={p.nw} w={p.w} "
          f"tape={full_len} slice={slice_len} slice_time={dt:.3f}s "
          f"extrapolated_full={extrapolated:.1f}s plan_time={plan_t:.1f}s "
          f"load_factor={load_factor} spread={spread:.3f}",
          file=sys.stderr)

    # MFU accounting (VERDICT r4 item 6): exact int32-MAC counts from the
    # arithmetic generator's jaxpr x measured wall
    from tpu_ecm.curve import ops as _cops
    macs = count_macs_per_op(ctx)
    opc = np.asarray(tape[:, 0])
    nadd = int(np.count_nonzero(opc == _cops.OP_ADD))
    ndup = int(np.count_nonzero(opc == _cops.OP_DUP))
    s1_macs = (nadd * macs["xadd"] + ndup * macs["xdbl"]) * batch
    s1_mac_per_s = s1_macs / time_full
    s1_mfu = s1_mac_per_s / VPU_PEAK_INT32_MAC_PER_S
    print(f"# macs/op: mul={macs['mul']} sqr={macs['sqr']} "
          f"xadd={macs['xadd']} xdbl={macs['xdbl']} entry={macs['entry']}; "
          f"stage1 {s1_mac_per_s / 1e12:.2f} Tmac/s = {s1_mfu:.1%} of "
          f"assumed VPU peak", file=sys.stderr)

    do_e2e = os.environ.get("BENCH_E2E", "0" if on_cpu else "1") != "0"
    extra = {
        "stage1_mac_per_s": round(s1_mac_per_s, 0),
        "stage1_mfu_vs_assumed_vpu_peak": round(s1_mfu, 4),
        **({"load_factor": round(load_factor, 3)}
           if load_factor is not None else {}),
        "stage1_slice_spread": round(spread, 4),
    }
    if not do_e2e:
        print(json.dumps({
            "metric": "ecm_stage1_curves_per_sec_per_chip_416bit_B1_1e6",
            "value": round(curves_per_sec, 3),
            "unit": "curves/sec",
            "vs_baseline": round(curves_per_sec / BASELINE_CURVES_PER_SEC, 3),
            **extra,
        }))
        return

    # ---- stage 2, full and real (no extrapolation) ----------------------
    from tpu_ecm.limbs import jnp_ops as _jops
    from tpu_ecm.primes.sieve import PrimeStream
    from tpu_ecm.stage2 import exec as s2exec, plan as s2plan

    b2 = int(os.environ.get("BENCH_B2", str(100 * b1)))
    dctx = _jops.device_ctx(ctx)
    sp = s2plan.make_stage2_params(b1, b2)
    stream = PrimeStream()
    pts0 = out[0]                     # stage-1 point [2, NW, B] (values
    s2_cache = {}                     # irrelevant: cost is data-oblivious)
    s2_pairs = [0]                    # total replay entries (for MAC/s)
    pair_cache = {}                   # pairmaps are planned once and shared
                                      # across curve batches (driver
                                      # _pairmaps; ref ecm.c:1449-1459), so
                                      # the steady-state pass replays them

    def stage2_pass() -> float:
        t0 = time.time()
        runner = s2exec.Stage2Runner(ctx, dctx, sp, pts0, s_const, b1,
                                     use_pallas=not on_cpu,
                                     executor_cache=s2_cache)
        runner.init()
        p = b1
        while p < b2:
            q = min(p + stream.chunk, b2)
            if (p, q) not in pair_cache:
                prs = stream.load(p, q + 1000 if q == b2 else q)
                pair_cache[(p, q)] = s2plan.pair(sp, prs, p, q)
                s2_pairs[0] += pair_cache[(p, q)][3]["pairs"]
            map_v, map_u, amin0, _stats = pair_cache[(p, q)]
            runner.run_chunk(map_v, map_u, amin0)
            p = q
        runner.result()               # pulls acc to host: full sync
        return time.time() - t0

    warm = stage2_pass()              # compiles executors (shared cache)
    # steady state (executors cached); best-of-N because tunnel-attached
    # chip throughput varies with external load (BENCH_NOTES.md)
    s2_reps = int(os.environ.get("BENCH_S2_REPS", "3"))
    s2_wall = min(stage2_pass() for _ in range(s2_reps))
    e2e = batch / (time_full + s2_wall)
    s2_mac_per_s = s2_pairs[0] * macs["entry"] * batch / s2_wall
    s2_mfu = s2_mac_per_s / VPU_PEAK_INT32_MAC_PER_S
    print(f"# stage2 warmup={warm:.1f}s steady={s2_wall:.1f}s "
          f"D={sp.D} U={sp.U} num_pb={sp.num_pb} pairs={s2_pairs[0]} "
          f"({s2_mac_per_s / 1e12:.2f} Tmac/s replay-only numerator = "
          f"{s2_mfu:.1%} of assumed VPU peak) "
          f"e2e_time={time_full + s2_wall:.1f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "ecm_curves_per_sec_per_chip_416bit_B1_1e6_B2_1e8_e2e",
        "value": round(e2e, 3),
        "unit": "curves/sec",
        "vs_baseline": round(e2e / E2E_BASELINE_CURVES_PER_SEC, 3),
        "stage1_curves_per_sec": round(curves_per_sec, 3),
        "stage1_vs_baseline": round(curves_per_sec
                                    / BASELINE_CURVES_PER_SEC, 3),
        **({"stage1_slice_extrapolation_error": round(full_err, 4)}
           if full_err is not None else {}),
        **extra,
        "stage2_mac_per_s": round(s2_mac_per_s, 0),
        "stage2_mfu_vs_assumed_vpu_peak": round(s2_mfu, 4),
        "stage2_steady_s": round(s2_wall, 2),
        "stage2_pairs": s2_pairs[0],
    }))


if __name__ == "__main__":
    main()

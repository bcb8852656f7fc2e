"""Measure per-point-op cost across moduli sizes on the current kernels.

Used to place BLOCKED_NW (flat-vs-blocked crossover) and driver.RNS_MIN_BITS
(digit/VPU vs RNS/MXU crossover), and to track the large-moduli numbers
quoted in BENCH_NOTES.md.  Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_large_moduli.py \
        [-rns|-both] [-bw 4,8,16] [-force flat|blocked] [nbits ...]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.expanduser("~/.cache/tpu_ecm")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          f"{cache}/jax-{jax.default_backend()}")
    except Exception:
        pass
    from tpu_ecm import params
    from tpu_ecm.curve import ops, prac, suyama
    from tpu_ecm.limbs import layout, pallas_ops
    from tpu_ecm.primes import primes_range

    args = sys.argv[1:]
    mode = "digit"
    for flag in ("-rns", "-both"):
        if flag in args:
            args.remove(flag)
            mode = flag[1:]
    bws = [pallas_ops.BLOCKED_BW]
    if "-bw" in args:                 # e.g. -bw 4,8,16
        i = args.index("-bw")
        bws = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    force = None                      # force flat/blocked digit schedule
    if "-force" in args:
        i = args.index("-force")
        force = args[i + 1]
        del args[i:i + 2]
    # (-kb/-kab, the hybrid kara+blocked schedule and its interleaved A/B,
    # were removed after the round-4 idle-chip A/B: kara lost 2 of 3 sizes
    # — 840 +8.9%, 1008 -1.8%, 1200 +2.5% — so the schedule was deleted.)
    sizes = [int(a) for a in args] or [605, 999]
    b1 = 3000
    tape = prac.stage1_tape(primes_range(0, b1), b1)
    steps = tape.shape[0]
    def is_prp(n):
        if n % 2 == 0:
            return False
        d, s = n - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            x = pow(a, d, n)
            if x in (1, n - 1):
                continue
            for _ in range(s - 1):
                x = x * x % n
                if x == n - 1:
                    break
            else:
                return False
        return True

    for nbits in sizes:
        # deterministic prime modulus of the requested size (arithmetic
        # cost only depends on the geometry, and a prime never trips the
        # curve-build gcd)
        n = (1 << nbits) - 1
        while not is_prp(n):
            n -= 2
        ctx = params.make_monty(n, mersenne=None)
        p = ctx.p

        if mode in ("digit", "both"):
            if force == "flat":
                pallas_ops.BLOCKED_NW = 10 ** 9
            elif force == "blocked":
                pallas_ops.BLOCKED_NW = 0
            batch = pallas_ops.default_batch(ctx)
            curves = [suyama.build_one_curve(ctx, 7000 + i)
                      for i in range(batch)]
            pts = np.zeros((ops.NUM_SLOTS, 2, p.nw, batch), dtype=np.int32)
            pts[0, 0] = layout.pack_batch([c.x_mont for c in curves],
                                          p.w, p.nw)
            pts[0, 1] = layout.pack_batch([c.z_mont for c in curves],
                                          p.w, p.nw)
            s_const = jnp.asarray(layout.pack_batch(
                [c.s_mont for c in curves], p.w, p.nw))
            sched = ("blocked" if p.nw > pallas_ops.BLOCKED_NW else
                     ("kara" if p.nw >= pallas_ops.KARA_NW else "school"))
            for bw in (bws if sched == "blocked" else bws[:1]):
                pallas_ops.BLOCKED_BW = bw
                run = pallas_ops.make_tape_executor(ctx, batch)
                out = run(jnp.asarray(pts), tape, s_const)
                _ = np.asarray(out[0, 0, :1])
                t0 = time.time()
                out = run(out, tape, s_const)
                _ = np.asarray(out[0, 0, :1])
                dt = (time.time() - t0) / steps
                bwtag = f" bw={bw}" if sched == "blocked" else ""
                print(f"nbits={nbits} nw={p.nw} w={p.w} "
                      f"norm={p.norm_inputs} batch={batch} "
                      f"sched={sched}{bwtag}: {dt*1e6:.1f} us/point-op "
                      f"({dt*1e9/batch:.1f} ns/curve)", flush=True)

        if mode in ("rns", "both"):
            from tpu_ecm.limbs import rns, rns_exec
            h = rns.make_rns(ctx, cw=rns.choose_cw(nbits))
            batch = rns_exec.default_batch(h)
            curves = [suyama.build_one_curve(ctx, 7000 + i)
                      for i in range(batch)]
            conv = ctx.from_mont_int
            pts, sc = rns_exec.init_state(
                h, [conv(c.x_mont) for c in curves],
                [conv(c.z_mont) for c in curves],
                [conv(c.s_mont) for c in curves])
            run = rns_exec.make_rns_tape_executor(h, batch)
            out = run(jnp.asarray(pts), tape, jnp.asarray(sc))
            _ = np.asarray(out[0, 0, :1])
            t0 = time.time()
            out = run(out, tape, sc)
            _ = np.asarray(out[0, 0, :1])
            dt = (time.time() - t0) / steps
            print(f"nbits={nbits} K={h.K} rows={h.dev.rows} "
                  f"split={h.dev.use_split} batch={batch} sched=rns/mxu: "
                  f"{dt*1e6:.1f} us/point-op "
                  f"({dt*1e9/batch:.1f} ns/curve)", flush=True)


if __name__ == "__main__":
    main()

"""Positional CLI compatible with the reference:

    avx-ecm-tpu <input> <numcurves> <B1> [batch/shards] [B2] [sigma]

(/root/reference/main.c:380-384; the reference's [threads] argument maps to
the device batch here — parallelism is the sharded curve axis, not pthreads).
<input> may be an integer expression (io/calc.py), e.g.
"fib(791)/13/677/216416017" or "2^127-1".
"""

from __future__ import annotations

import os
import sys

from .. import driver
from . import calc as _calc


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even when a sitecustomize re-forces its own
    # platform after env processing (observed with the axon TPU plugin:
    # `JAX_PLATFORMS=cpu` was silently ignored without this)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and "," not in plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    argv = list(sys.argv[1:] if argv is None else argv)
    engine = "auto"
    for flag in ("-rns", "-digit"):
        if flag in argv:
            argv.remove(flag)
            engine = flag[1:]
    curve_mode = "suyama"
    if "-edwards" in argv:
        # a=-1 twisted Edwards stage 1 (curve/edwards.py): ~20% fewer
        # weighted muls/bit than Montgomery PRAC, 4 | order vs Suyama's 12
        argv.remove("-edwards")
        curve_mode = "edwards"
    if argv and argv[0] == "-calc":
        # interactive calculator with persistent user variables and `ans`
        # (the calc.c uvar surface, /root/reference/calc.c:273-302)
        return _calc.repl()
    if argv and argv[0] == "-resume":
        # GMP-ECM-style stage-2 resume from a stage-1 savefile:
        #   avx-ecm-tpu -resume save_b1.txt B2
        if len(argv) < 3:
            print("usage: avx-ecm-tpu -resume $savefile $B2")
            return 1
        try:
            res = driver.resume_stage2(argv[1], int(float(argv[2])))
        except (ValueError, OSError) as e:
            print(f"resume failed: {e}")
            return 1
        for h in res.factors:
            kind = "PRP" if h.is_prp else "C"
            print(f"final: {kind}{len(str(h.factor))} factor {h.factor} "
                  f"(stage {h.stage}, sigma {h.sigma})")
        print(f"resumed {res.curves_run} curves; timings: "
              + ", ".join(f"{k}={v:.2f}s" for k, v in res.timings.items()))
        return 0
    if len(argv) < 3:
        print("usage: avx-ecm-tpu $input $numcurves $B1 [$batch] [$B2] [$sigma]"
              "\n       avx-ecm-tpu -edwards ...    (a=-1 Edwards stage 1)"
              "\n       avx-ecm-tpu -rns|-digit ... (force stage-1 engine)"
              "\n       avx-ecm-tpu -resume $savefile $B2"
              "\n       avx-ecm-tpu -calc          (interactive calculator)")
        return 1
    n = _calc.calc(argv[0])
    curves = int(argv[1])
    b1 = int(float(argv[2]))
    batch = int(argv[3]) if len(argv) >= 4 and int(argv[3]) > 0 else None
    if batch is not None and batch < 128:
        # the reference's 4th positional is THREADS (/root/reference/
        # main.c:380-384); here it is the device curve batch.  A verbatim
        # reference command like `... 1e6 4 1e8 sigma` would silently
        # request a tiny batch (rounded up to the TPU minimum anyway).
        print(f"note: arg 4 is the device curve BATCH here (reference: "
              f"threads); {batch} is small and will be rounded up on TPU")
    b2 = None
    if len(argv) >= 5:
        b2 = int(float(argv[4]))
    sigma = int(argv[5]) if len(argv) >= 6 else 0

    print(f"commencing parallel ecm on {n}")
    cfg = driver.RunConfig(n=n, curves=curves, b1=b1, b2=b2, sigma=sigma,
                           batch=batch, curve_mode=curve_mode, engine=engine)
    result = driver.ECMDriver(cfg).run()
    if result.factors:
        for h in result.factors:
            kind = "PRP" if h.is_prp else "C"
            print(f"final: {kind}{len(str(h.factor))} factor {h.factor} "
                  f"(stage {h.stage}, sigma {h.sigma})")
        # cofactor of the ORIGINAL input (result.n is the post-reduction
        # working modulus: powers of 2 stripped, perfect-power base)
        cof = n
        for f in {h.factor for h in result.factors}:
            while cof % f == 0:
                cof //= f
        if cof > 1:
            print(f"cofactor: {savefileclass(cof)} {cof}")
    print(f"ran {result.curves_run} curves; timings: "
          + ", ".join(f"{k}={v:.2f}s" for k, v in result.timings.items()))
    return 0


def savefileclass(x: int) -> str:
    from .savefile import classify_factor
    return classify_factor(x)


if __name__ == "__main__":
    raise SystemExit(main())

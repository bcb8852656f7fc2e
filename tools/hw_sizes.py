"""Measure the driver-set BASELINE configs 4 and 5 end-to-end (VERDICT r4
item 4): every recorded curves/sec-vs-baseline number so far is 416-bit;
the north star says ">=2x per chip ... <=624-bit inputs", so the claim
needs hardware evidence at the stated sizes.

  python -u tools/hw_sizes.py 624     # config 4: 624-bit, 4096 curves,
                                      #   B1=3e6, B2=3e8 (100x default)
  python -u tools/hw_sizes.py 1000    # config 5 single-chip sample:
                                      #   1000-bit, B1=4.3e7, B2=100x,
                                      #   2048 curves (one full batch)

Runs the REAL driver (batched stage 1 + plan-ahead stage 2) on a
synthetic semiprime of the target width — no factor is expected; the
metric is wall-clock curves/sec (cold process, the reference's own
timing convention).

Baseline scaling (same method bench.py documents): the GMP-ECM oracle
log gives 16.45 s/curve/core step 1 at B1=1e6 on a 508-bit C153
(/root/reference/test_inputs.txt:26-31); schoolbook area scaling
(bits/508)^2, linear B1 scaling, x2 for avx-ecm's claimed advantage
(README.md:2 — generous to the baseline at 1000 bits, where the README
itself concedes the crossover), x0.684 measured e2e/stage-1 ratio,
64 cores:

  e2e_baseline(bits, B1) = 64 * 0.684 * 2 / (16.45 * (bits/508)^2
                                             * (B1/1e6))
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "624": dict(bits=624, curves=4096, b1=3_000_000),
    "1000": dict(bits=1000, curves=2048, b1=43_000_000),
}


def _prp(rng: random.Random, bits: int) -> int:
    while True:
        c = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        # Miller-Rabin via Python's pow; 30 rounds is plenty for a bench
        d, s = c - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        for _ in range(30):
            a = rng.randrange(2, c - 1)
            x = pow(a, d, c)
            if x in (1, c - 1):
                continue
            for _ in range(s - 1):
                x = x * x % c
                if x == c - 1:
                    break
            else:
                break
        else:
            return c


def main():
    cfg = CONFIGS[sys.argv[1]]
    bits, curves, b1 = cfg["bits"], cfg["curves"], cfg["b1"]
    b2 = 100 * b1
    rng = random.Random(624)
    # semiprime of exactly `bits` bits, both factors far beyond ECM reach
    while True:
        p = _prp(rng, bits // 2)
        q = _prp(rng, bits - bits // 2)
        if (p * q).bit_length() == bits:
            n = p * q
            break

    from tpu_ecm import driver

    cache = os.path.expanduser("~/.cache/tpu_ecm")
    run_cfg = driver.RunConfig(
        n=n, curves=curves, b1=b1, b2=b2, sigma=8000,
        batch=min(curves, 2048), cache_dir=cache, verbose=1,
        save_b1_path=None, checkpoint_path=None, results_path=None)
    t0 = time.time()
    res = driver.ECMDriver(run_cfg).run()
    wall = time.time() - t0
    assert not res.factors, "synthetic semiprime should not factor"
    e2e = curves / wall
    base = 64 * 0.684 * 2 / (16.45 * (bits / 508) ** 2 * (b1 / 1e6))
    print(json.dumps({
        "metric": f"ecm_curves_per_sec_per_chip_{bits}bit_B1_{b1:.0e}_e2e",
        "value": round(e2e, 3),
        "unit": "curves/sec",
        "vs_baseline": round(e2e / base, 2),
        "baseline_curves_per_sec": round(base, 3),
        "wall_s": round(wall, 1),
        "timings": {k: round(v, 1) for k, v in res.timings.items()},
        "counters": {k: int(v) for k, v in res.counters.items()},
    }))


if __name__ == "__main__":
    main()

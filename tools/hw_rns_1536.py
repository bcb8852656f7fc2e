"""RNS/MXU engine on real hardware: a 1535-bit input (P35 x PRP1500) runs
stage 1 AND stage 2 entirely on residue channels (split bf16 MXU base
extensions) with the Pallas executors, and must surface the P35 at the
pinned sigma (curve order mod P35 is cofactor-independent) — the on-TPU
twin of tests/test_rns_engine.py::test_rns_engine_1536bit_stage2_find."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import random
import tempfile
import time

P35 = 34359738421


def _prp(rng, bits):
    while True:
        c = rng.getrandbits(bits) | 1 | (1 << (bits - 1))
        if all(pow(a, c - 1, c) == 1 for a in (2, 3, 5, 7, 11)):
            return c


def main():
    from tpu_ecm import driver

    n = P35 * _prp(random.Random(5), 1500)
    with tempfile.TemporaryDirectory() as td:
        cfg = driver.RunConfig(
            n=n, curves=128, b1=300, b2=10000, sigma=110, batch=128,
            stop_on_factor=False, verbose=1,
            save_b1_path=f"{td}/save_b1.txt",
            checkpoint_path=f"{td}/checkpoint.txt",
            results_path=f"{td}/ecm_results.txt")
        d = driver.ECMDriver(cfg)
        assert d.engine == "rns", d.engine       # auto-dispatch >= 1400 bits
        assert d._rns_host.dev.use_split         # the MXU formulation
        t0 = time.time()
        res = d.run()
        wall = time.time() - t0
    hits = {(h.factor, h.stage, h.sigma) for h in res.factors}
    print(f"wall={wall:.1f}s K={d._rns_host.K} timings={res.timings} "
          f"hits={sorted(hits)}")
    assert any(f % P35 == 0 and st == 2 and sg == 112
               for f, st, sg in hits), hits
    print("RNS 1535-bit stage-2 find on TPU: OK")


if __name__ == "__main__":
    main()

"""TPU acceptance: the 128-sigma golden sweep must reproduce the exact
57-tuple (factor, stage, sigma) set pinned in tests/test_e2e.py (fixed
sigma => identical factor finds on any engine/backend/grouping)."""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_e2e import GOLDEN_SWEEP, N71  # noqa: E402

from tpu_ecm import driver  # noqa: E402


def main():
    with tempfile.TemporaryDirectory() as td:
        cfg = driver.RunConfig(
            n=N71, curves=128, b1=2000, b2=200000, sigma=110,
            stop_on_factor=False,
            save_b1_path=f"{td}/save_b1.txt",
            checkpoint_path=f"{td}/checkpoint.txt",
            results_path=f"{td}/ecm_results.txt")
        t0 = time.time()
        res = driver.ECMDriver(cfg).run()
        wall = time.time() - t0
    got = {(h.factor, h.stage, h.sigma) for h in res.factors}
    print(f"wall={wall:.1f}s hits={len(got)} timings={res.timings}")
    missing = GOLDEN_SWEEP - got
    extra = got - GOLDEN_SWEEP
    if missing or extra:
        print(f"MISMATCH missing={sorted(missing)} extra={sorted(extra)}")
        sys.exit(1)
    print("golden sweep: EXACT MATCH (57 tuples)")


if __name__ == "__main__":
    main()

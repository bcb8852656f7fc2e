"""Huge-bound hardware validation (the reference's test.csh:33-39 "huge
B1/B2 passed" regimes, one decade past the round-1 validations):

  b2 mode: B1=1e5, B2=1e10 end-to-end, 2048 curves (round 1 validated 1e9)
  b1 mode: B1=1.1e8 stage 1, 2048 curves (the reference's huge-B1 bound)

Pass criterion matches the reference's (completion + internal consistency
+ savefile written); wall/counters recorded for BENCH_NOTES.md."""

import sys
import tempfile
import time

N416 = (205688069665150755269371147819668813122841983204197482918578443
        * 411376139330301510538742295639337626245683966408394965837157771)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "b2"
    from tpu_ecm import driver

    if mode == "b2":
        b1, b2 = 100_000, 10_000_000_000
    else:
        b1, b2 = 110_000_000, 110_000_000
    with tempfile.TemporaryDirectory() as td:
        cfg = driver.RunConfig(
            n=N416, curves=2048, b1=b1, b2=b2, sigma=110, batch=2048,
            stop_on_factor=False, verbose=1,
            save_b1_path=f"{td}/save_b1.txt",
            checkpoint_path=f"{td}/checkpoint.txt",
            results_path=f"{td}/ecm_results.txt")
        t0 = time.time()
        res = driver.ECMDriver(cfg).run()
        wall = time.time() - t0
        with open(f"{td}/save_b1.txt") as fh:
            nrec = sum(1 for _ in fh)
    print(f"mode={mode} B1={b1} B2={b2} wall={wall:.1f}s "
          f"timings={res.timings} counters={res.counters} "
          f"residues={len(res.stage1_residues)} saverecords={nrec}")
    assert len(res.stage1_residues) == 2048
    print("huge-bound run: COMPLETED")


if __name__ == "__main__":
    main()

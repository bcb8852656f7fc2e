"""Back-to-back Edwards a=-1 signed-window vs Montgomery/Suyama PRAC on
the 416-bit headline input, INCLUDING stage 2 (VERDICT round-2 item 6:
the round-1 measurement was stage-1 only; -edwards converts to Montgomery
X:Z for the continuation, so the stage-1 op-count edge dilutes with the
stage-2 share — measure the whole run, report both phases).

Each family runs twice at B1=1e6, B2=1e8, 2048 curves (warmup populates
executor + tape + pairmap caches; second run is timed).  The Edwards ->
Montgomery conversion cost is inside the timed wall (driver.py stage-2
handoff).  Prints stage-1-only and end-to-end curves/s per family plus
the phase breakdown."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import tempfile
import time

N416 = (205688069665150755269371147819668813122841983204197482918578443
        * 411376139330301510538742295639337626245683966408394965837157771)


def main():
    from tpu_ecm import driver

    results = {}
    for mode in ("suyama", "edwards"):
        best = None
        for rep in range(2):
            with tempfile.TemporaryDirectory() as td:
                cfg = driver.RunConfig(
                    n=N416, curves=2048, b1=1_000_000, b2=100_000_000,
                    sigma=110, batch=2048, curve_mode=mode,
                    stop_on_factor=False, verbose=0,
                    save_b1_path=f"{td}/save_b1.txt",
                    checkpoint_path=f"{td}/checkpoint.txt",
                    results_path=f"{td}/ecm_results.txt")
                t0 = time.time()
                res = driver.ECMDriver(cfg).run()
                wall = time.time() - t0
                print(f"{mode} rep{rep}: wall={wall:.1f}s "
                      f"timings={ {k: round(v, 1) for k, v in res.timings.items()} }",
                      flush=True)
                if best is None or wall < best[0]:
                    best = (wall, dict(res.timings))
        results[mode] = best
    for mode, (wall, t) in results.items():
        s1 = t.get("stage1", 0.0)
        s2 = t.get("stage2_init", 0.0) + t.get("stage2", 0.0)
        print(f"{mode}: e2e {2048 / wall:.1f} c/s (wall {wall:.1f}s; "
              f"stage1 {s1:.1f}s = {2048 / s1:.1f} c/s, stage2 {s2:.1f}s)")
    sw, ew = results["suyama"][0], results["edwards"][0]
    s1s = results["suyama"][1].get("stage1", 1.0)
    s1e = results["edwards"][1].get("stage1", 1.0)
    print(f"stage-1-only edwards/suyama speedup x{s1s / s1e:.3f}; "
          f"end-to-end x{sw / ew:.3f}")


if __name__ == "__main__":
    main()

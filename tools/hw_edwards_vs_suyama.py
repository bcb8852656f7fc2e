"""Back-to-back stage-1 throughput: Edwards a=-1 signed-window vs
Montgomery/Suyama PRAC on the 416-bit headline input (VERDICT round-1
item 6: quantify the measured gain, not just the op-count model).

Each family runs twice (warmup populates executor + tape caches, second
run is timed) at B1=1e6, B2=B1 (stage 1 only), 2048 curves."""

import tempfile
import time

N416 = (205688069665150755269371147819668813122841983204197482918578443
        * 411376139330301510538742295639337626245683966408394965837157771)


def main():
    from tpu_ecm import driver

    results = {}
    for mode in ("suyama", "edwards"):
        walls = []
        for rep in range(2):
            with tempfile.TemporaryDirectory() as td:
                cfg = driver.RunConfig(
                    n=N416, curves=2048, b1=1_000_000, b2=1_000_000,
                    sigma=110, batch=2048, curve_mode=mode,
                    stop_on_factor=False, verbose=0,
                    save_b1_path=f"{td}/save_b1.txt",
                    checkpoint_path=f"{td}/checkpoint.txt",
                    results_path=f"{td}/ecm_results.txt")
                t0 = time.time()
                res = driver.ECMDriver(cfg).run()
                walls.append(time.time() - t0)
                print(f"{mode} rep{rep}: wall={walls[-1]:.1f}s "
                      f"timings={res.timings}", flush=True)
        results[mode] = min(walls)
    s, e = results["suyama"], results["edwards"]
    print(f"suyama {2048/s:.1f} c/s vs edwards {2048/e:.1f} c/s "
          f"-> edwards/suyama speedup x{s/e:.3f}")


if __name__ == "__main__":
    main()

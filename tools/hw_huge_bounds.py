"""Huge-bound hardware validation (the reference's test.csh:33-39 "huge
B1/B2 passed" regimes, one decade past the round-1 validations):

  b2 mode:   B1=1e5, B2=1e10 end-to-end, 2048 curves (round 1 validated 1e9)
  b1 mode:   B1=1.1e8 stage 1, 2048 curves (the reference's huge-B1 bound)
  b1b2 mode: the reference's own huge-B1 row verbatim
             (/root/reference/test.csh:34): its 512-bit input, B1=1.1e8,
             B2=1.34e10, pinned sigma 1954032792 at vec 0 — the largest-B1
             regime the reference ever validated, end-to-end.
  row37/row38/row39 modes: the reference's three "#huge B2 passed" rows
             verbatim (/root/reference/test.csh:37-39): B2 = 1.6e10,
             1.64e11 and 1.21e11 with their pinned sigmas at vec 0.
             row38 (B2=1.64e11, ~1640 streamed 1e8-prime chunks) is the
             largest bound the reference ever validated anywhere.

Pass criterion matches the reference's (completion + internal consistency
+ savefile written; b1b2/rowNN additionally expect a factor at the pinned
sigma).  Wall/counters and the host sieve+pair share of stage-2 wall are
recorded for BENCH_NOTES.md."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import tempfile
import time

N416 = (205688069665150755269371147819668813122841983204197482918578443
        * 411376139330301510538742295639337626245683966408394965837157771)

# /root/reference/test.csh:34 (the "#huge B1 passed" row)
N_HUGE_B1 = int(
    "1847681610783338752801312406785743701963807223827456057806962001538614"
    "2834793977613957035253413222160419640514669393339750389809776729202393"
    "893373019289189")
SIGMA_HUGE_B1 = 1954032792

# /root/reference/test.csh:37-39 (the "#huge B2 passed" rows): one pinned
# (N, B1, B2, sigma) tuple per row, sigma at vec 0
HUGE_B2_ROWS = {
    "row37": (int("2762493633765305234092806397173152623813537814660432536"
                  "5579207066042928979902960435124574389222424508047307006"
                  "9478798426088869000784041"),
              7_000_000, 16_000_000_000, 2708170207),
    "row38": (int("1464101628306218327243090276822854018935464651910463764"
                  "0662149790336339306363624462717551269716231642009833321"
                  "75440071790729516180679"),
              9_000_000, 164_000_000_000, 1473889351),
    "row39": (int("1446868911475526178006255468697829417416292492061884429"
                  "1513286842556497012589538616502354515650136548008914400"
                  "095566281995954429761413127417"),
              8_000_000, 121_000_000_000, 3152455236),
}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "b2"
    from tpu_ecm import driver

    n, sigma, curves = N416, 110, 2048
    if mode == "b2":
        b1, b2 = 100_000, 10_000_000_000
    elif mode == "b1b2":
        b1, b2 = 110_000_000, 13_400_000_000
        n, sigma = N_HUGE_B1, SIGMA_HUGE_B1
    elif mode in HUGE_B2_ROWS:
        n, b1, b2, sigma = HUGE_B2_ROWS[mode]
        curves = 128       # one lane tile, like the hardware refsweep
    else:
        b1, b2 = 110_000_000, 110_000_000
    with tempfile.TemporaryDirectory() as td:
        cfg = driver.RunConfig(
            n=n, curves=curves, b1=b1, b2=b2, sigma=sigma, batch=curves,
            stop_on_factor=False, verbose=1,
            save_b1_path=f"{td}/save_b1.txt",
            checkpoint_path=f"{td}/checkpoint.txt",
            results_path=f"{td}/ecm_results.txt")
        t0 = time.time()
        res = driver.ECMDriver(cfg).run()
        wall = time.time() - t0
        with open(f"{td}/save_b1.txt") as fh:
            nrec = sum(1 for _ in fh)
    t = res.timings
    plan = t.get("stage2_sieve", 0.0) + t.get("stage2_pair", 0.0)
    s2 = t.get("stage2", 0.0)
    print(f"mode={mode} B1={b1} B2={b2} wall={wall:.1f}s "
          f"timings={ {k: round(v, 1) for k, v in t.items()} } "
          f"counters={res.counters} "
          f"residues={len(res.stage1_residues)} saverecords={nrec}")
    if s2:
        print(f"host planning: sieve+pair={plan:.1f}s "
              f"({100 * plan / s2:.1f}% of stage-2 wall {s2:.1f}s), "
              f"exposed wait={t.get('stage2_plan_wait', 0.0):.1f}s "
              f"({100 * t.get('stage2_plan_wait', 0.0) / s2:.1f}%)")
    if res.factors:
        for h in res.factors:
            print(f"factor {h.factor} stage {h.stage} sigma {h.sigma}")
    assert len(res.stage1_residues) == curves
    if mode == "b1b2" or mode in HUGE_B2_ROWS:
        assert any(h.sigma == sigma for h in res.factors), \
            f"reference row {mode} finds a factor at the pinned sigma"
        for h in res.factors:
            assert n % h.factor == 0 and 1 < h.factor < n
    print("huge-bound run: COMPLETED")


if __name__ == "__main__":
    main()

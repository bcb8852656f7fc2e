"""Run ALL 22 reference acceptance rows (/root/reference/test.csh:2-30)
through the framework on the real TPU, against the pinned ground truth in
tests/test_acceptance.py (reproduced from the locally built reference
binary, round 2).  Each row: same input, same base sigma, same B1/B2 —
the same factor MUST surface at the same stage.

Standalone (NOT pytest: the test conftest pins JAX to the CPU mesh).
Rows run cheapest-first; a row failure doesn't stop the sweep.  State is
kept in /tmp/r3hw/refsweep_state.json so an interrupted sweep resumes.
Summary table printed at the end; exit 1 on any mismatch.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

STATE = os.environ.get("REFSWEEP_STATE", "/tmp/r3hw/refsweep_state.json")


def row_cost(row):
    _, _, b1, b2, _, _, _ = row
    return b1 + 0.12 * b2          # rough wall model: stage1 ~ B1, s2 ~ B2


def main():
    from test_acceptance import REFSWEEP_ROWS

    from tpu_ecm import driver
    from tpu_ecm.io import calc as _calc

    state = {}
    if os.path.exists(STATE):
        state = json.load(open(STATE))
    os.makedirs(os.path.dirname(STATE), exist_ok=True)

    only = set(int(x) for x in sys.argv[1:]) if len(sys.argv) > 1 else None
    rows = sorted(REFSWEEP_ROWS, key=row_cost)
    for row, expr, b1, b2, sigma, factor, stage in rows:
        if only and row not in only:
            continue
        if str(row) in state and state[str(row)].get("ok"):
            print(f"row{row}: done (skip)")
            continue
        n = _calc.calc(expr)
        t0 = time.time()
        rec = {"b1": b1, "b2": b2, "sigma": sigma}
        try:
            with tempfile.TemporaryDirectory() as td:
                cfg = driver.RunConfig(
                    n=n, curves=128, b1=b1, b2=b2, sigma=sigma,
                    stop_on_factor=False, verbose=1,
                    save_b1_path=f"{td}/save_b1.txt",
                    checkpoint_path=f"{td}/checkpoint.txt",
                    results_path=f"{td}/ecm_results.txt")
                res = driver.ECMDriver(cfg).run()
            hits = [h for h in res.factors if h.sigma == sigma]
            ok = (any(h.factor == factor or factor % h.factor == 0
                      or h.factor % factor == 0 for h in hits)
                  and any(h.stage == stage for h in hits))
            rec.update(
                ok=bool(ok), wall=round(time.time() - t0, 1),
                timings={k: round(v, 1) for k, v in res.timings.items()},
                hits=[(h.factor, h.stage, h.sigma) for h in res.factors],
                expected=(factor, stage))
        except Exception as e:  # noqa: BLE001 — record and continue
            rec.update(ok=False, wall=round(time.time() - t0, 1),
                       error=repr(e))
        state[str(row)] = rec
        json.dump(state, open(STATE, "w"), indent=1)
        print(f"row{row}: {'OK' if rec['ok'] else 'FAIL'} "
              f"wall={rec['wall']}s {rec.get('error', '')}")

    print("\n=== refsweep summary ===")
    print(f"{'row':>4} {'ok':>4} {'wall':>8} {'B1':>10} {'B2':>13} "
          f"{'plan s':>7} {'stage':>5}")
    fails = 0
    for row, expr, b1, b2, sigma, factor, stage in REFSWEEP_ROWS:
        r = state.get(str(row), {})
        t = r.get("timings", {})
        plan = t.get("stage2_sieve", 0) + t.get("stage2_pair", 0)
        ok = r.get("ok", False)
        fails += not ok
        print(f"{row:>4} {'OK' if ok else 'FAIL':>4} "
              f"{r.get('wall', '-'):>8} {b1:>10} {b2:>13} "
              f"{plan:>7.1f} {stage:>5}")
    print(f"{len(REFSWEEP_ROWS) - fails}/{len(REFSWEEP_ROWS)} rows matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

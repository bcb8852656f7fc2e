#!/bin/bash
# Round-3 hardware validation queue — run on the real TPU (axon tunnel).
# Each step logs to /tmp/r3hw/NN_*.log and is independently resumable
# (re-run the script; finished steps are skipped via .done files).  Every
# python invocation is wrapped in `timeout` (the tunnel can hang, see
# BENCH_NOTES.md) — a timed-out step is retried on the next run.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r3hw
mkdir -p $OUT

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  if [ -f $OUT/$name.done ]; then echo "== $name: done (skip)"; return 0; fi
  echo "== $name: start $(date +%T)"
  if timeout "$tmo" "$@" > $OUT/$name.log 2>&1; then
    touch $OUT/$name.done; echo "== $name: OK"
  else
    echo "== $name: FAILED/timeout (exit $?) — see $OUT/$name.log"
  fi
}

cd $OUT

# 1. quick oracle (known factors at pinned sigmas, stage 1 + stage 2) —
#    validates the planner-overlap refactor end-to-end on the chip
step 01_oracle 1200 python -m tpu_ecm.io.cli 2361183246142106764907 4 300 0 10000 110

# 2. huge-B2 end-to-end: B1=1e5, B2=1e10, 2048 curves (VERDICT r2 item 1;
#    reports the host sieve+pair share of stage-2 wall)
#    COMPLETED 2026-08-19 (BENCH_NOTES.md "huge-B2 regime closed") — if
#    /tmp was wiped since, skip the re-run by honoring the recorded result
[ -n "${R3_RERUN_02:-}" ] || touch $OUT/02_hugeb2.done
step 02_hugeb2 7200 python /root/repo/tools/hw_huge_bounds.py b2

# quick steps first (each <~30 min), long sweeps last — an interrupted
# session still lands the high-value short results

# 7. golden sweep: must reproduce the exact 57-tuple set (re-proof after
#    any kernel change; the stream replay kernel became the default in r3)
step 07_golden 2400 python /root/repo/tools/hw_golden_sweep.py

# 6. headline bench with BENCH_FULL de-extrapolation (VERDICT r2 item 4)
step 06_bench_full 5400 env BENCH_FULL=1 python /root/repo/bench.py

# 5. BLOCKED_KARA resolution: hybrid kara+blocked at 840/1008/1200 bits
#    (VERDICT r2 item 5) — enable the flag if it wins, delete if it loses
step 05_kara 3600 python /root/repo/tools/bench_large_moduli.py -kb 840 1008 1200

# 8. Edwards vs Suyama INCLUDING stage 2 (VERDICT r2 item 6 measurement)
step 08_edwards 2400 python /root/repo/tools/hw_edwards_vs_suyama.py

# 4. all 22 acceptance rows through the framework on the chip
#    (VERDICT r2 item 2); resumable row-by-row via refsweep_state.json
step 04_refsweep 14400 python /root/repo/tools/hw_refsweep.py

# 3. the reference's own largest validated regime, verbatim
#    (/root/reference/test.csh:34): 512-bit input, B1=1.1e8, B2=1.34e10,
#    pinned sigma — end-to-end, expects the factor (VERDICT r2 item 1)
step 03_hugeb1b2 14400 python /root/repo/tools/hw_huge_bounds.py b1b2

echo "all steps attempted; logs in $OUT"

#!/bin/bash
# Round-4 hardware validation queue — run on the real TPU (axon tunnel).
# Each step logs to /tmp/r4hw/NN_*.log and is independently resumable
# (re-run the script; finished steps are skipped via .done files).  Every
# python invocation is wrapped in `timeout` (the tunnel can hang, see
# BENCH_NOTES.md) — a timed-out step is retried on the next run.
#
# IMPORTANT: the host has ONE core and the huge-B2 rows hide ~45 min of
# host planning behind device replay — do not run CPU-heavy jobs (pytest,
# other benches) concurrently with steps 03-06.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r4hw
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

# 1. packed-Pb stream replay A/B (VERDICT r3 item 2): decides the
#    TPU_ECM_REPLAY_PACKED default.  Full flagship stage-2 per config.
step 01_replay_packed 5400 env \
  RM_SWEEP="gather:16,stream:16,streampk:16,streampk:8,streampk:16::2,streampk:16::4" \
  python /root/repo/tools/hw_replay_modes.py

# 2. stage-1 compute floor + chunk sweep (VERDICT r3 item 7)
step 02_stage1_floor 3600 python /root/repo/tools/hw_stage1_floor.py

# 3-5. the reference's never-run "#huge B2 passed" rows + the unrecorded
#    test.csh:34 re-run (VERDICT r3 item 1), pinned sigmas, 128 curves
step 03_row37 7200  python /root/repo/tools/hw_huge_bounds.py row37
step 04_row38 21600 python /root/repo/tools/hw_huge_bounds.py row38
step 05_b1b2  14400 python /root/repo/tools/hw_huge_bounds.py b1b2

# 6. third huge-B2 row if the session still has time
step 06_row39 18000 python /root/repo/tools/hw_huge_bounds.py row39

echo "all steps attempted; logs in $OUT"
# Post-queue (run manually after the packed-default decision lands):
#   golden re-proof:  python /root/repo/tools/hw_golden_sweep.py
#   headline bench:   python /root/repo/bench.py   (full-tape default)

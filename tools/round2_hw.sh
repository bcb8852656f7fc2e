#!/bin/bash
# Round-2 hardware validation queue — run on the real TPU once the axon
# tunnel is up.  Each step logs to /tmp/r2hw/NN_*.log and is independently
# resumable (re-run the script; finished steps are skipped via .done files).
# Every python invocation is wrapped in `timeout` (the tunnel can hang,
# see BENCH_NOTES.md) — a timed-out step is retried on the next run.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r2hw
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

# 1. verify oracle (known factors at pinned sigmas, stage 1 + stage 2)
step 01_oracle 1200 python -m tpu_ecm.io.cli 2361183246142106764907 4 300 0 10000 110

# 2. golden sweep on TPU: must reproduce the exact 57-tuple set
step 02_golden 2400 python /root/repo/tools/hw_golden_sweep.py

# 3. headline bench (end-to-end metric)
step 03_bench 3600 python /root/repo/bench.py

# 4. digit vs RNS crossover + symmetric-square effect at large moduli
step 04_large 3600 python /root/repo/tools/bench_large_moduli.py -both 840 1008 1200 1400 1536 2048

# 5. blocked-BW sweep at nw~93 (840-bit) and nw~112 (1008-bit), plus the
#    hybrid kara+blocked schedule at the default BW
step 05_bwsweep 3600 python /root/repo/tools/bench_large_moduli.py -bw 4,8,16 840 1008
step 05b_kara 3600 python /root/repo/tools/bench_large_moduli.py -kb 840 1008 1200

# 6. Edwards vs Suyama stage-1 throughput, back-to-back
step 06_edwards 2400 python /root/repo/tools/hw_edwards_vs_suyama.py

# 7. huge-B2 end-to-end: B1=1e5, B2=1e10, 2048 curves (reference test.csh
#    huge-B2 regime analog, one decade past the round-1 1e9 validation)
step 07_hugeb2 7200 python /root/repo/tools/hw_huge_bounds.py b2

# 8. huge-B1 stage 1: B1=1.1e8 (the reference's "huge B1 passed" bound)
step 08_hugeb1 7200 python /root/repo/tools/hw_huge_bounds.py b1

# 9. RNS engine stage-2 factor find at 1535 bits on real hardware
step 09_rns1536 3600 python /root/repo/tools/hw_rns_1536.py

# 10. stage-2 replay kernel: gather vs VMEM-resident Pb slabs, back-to-back
step 10_replay 3600 python /root/repo/tools/hw_replay_modes.py

echo "all steps attempted; logs in $OUT"

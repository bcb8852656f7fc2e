#!/bin/bash
# Round-4 post-queue steps — run AFTER tools/round4_hw.sh finishes.
# Order matters: golden re-proof before the headline bench; the CPU fast
# suite may overlap the golden chip run (light host load) but NOT the
# bench.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r4hw
mkdir -p $OUT

step() {
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

# RNS stage-2 re-measure on the 2355-bit acceptance row with the new
# RNS stream replay kernel (VERDICT r3 item 4)
step 07_rns_row21 3600 env REFSWEEP_STATE=$OUT/refsweep21.json \
  python /root/repo/tools/hw_refsweep.py 21

# Edwards vs Suyama with the in-add-branch window load (VERDICT r3 item 5)
step 08_edwards 3600 python /root/repo/tools/hw_edwards_vs_suyama.py

# golden 57-tuple re-proof (required after any kernel-default change)
step 09_golden 2400 python /root/repo/tools/hw_golden_sweep.py

# headline bench — full-tape default now; idle chip, quiet host
step 10_bench 5400 python /root/repo/bench.py

echo "post-queue steps attempted"

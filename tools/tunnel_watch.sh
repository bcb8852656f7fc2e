#!/bin/bash
# Probe the axon TPU tunnel every ~4 min; when backend init succeeds, run
# the resumable round-2 hardware queue (tools/round2_hw.sh).  Exits when
# every queue step has a .done marker.  Logs to /tmp/r2hw/watch.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r2hw
mkdir -p $OUT
STEPS=(01_oracle 02_golden 03_bench 04_large 05_bwsweep 05b_kara 06_edwards 07_hugeb2 08_hugeb1 09_rns1536 10_replay)

all_done() {
  for s in "${STEPS[@]}"; do [ -f $OUT/$s.done ] || return 1; done
  return 0
}

while ! all_done; do
  echo "[watch] $(date -u +%FT%TZ) probing tunnel..." >> $OUT/watch.log
  if timeout 660 python -c "import jax; d=jax.devices(); assert d" >> $OUT/watch.log 2>&1; then
    echo "[watch] $(date -u +%FT%TZ) tunnel UP — running queue" >> $OUT/watch.log
    bash /root/repo/tools/round2_hw.sh >> $OUT/watch.log 2>&1
  else
    echo "[watch] $(date -u +%FT%TZ) tunnel down (probe failed)" >> $OUT/watch.log
  fi
  all_done && break
  sleep 240
done
echo "[watch] $(date -u +%FT%TZ) ALL STEPS DONE" >> $OUT/watch.log

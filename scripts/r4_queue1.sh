#!/bin/bash
# Round-4 hardware queue, batch 1: the unmeasured round-3 sphere leads.
# Each item is its own process (a wedged tunnel read only loses that item).
cd /root/repo
LOG=/tmp/r4_queue1.log
: > $LOG
run() {
  echo "=== $* ($(date +%T)) ===" >> $LOG
  timeout 1500 "$@" >> $LOG 2>&1
  echo "--- rc=$? ($(date +%T))" >> $LOG
}
run python scripts/tpu_r3_item.py sphere-fb-wslice OMEGA_PATCH_WSLICE=1
run python scripts/tpu_r3_item.py sphere-fb-tile32 OMEGA_PATCH_TILE=32
run python scripts/tpu_r3_item.py sphere-fb-base
run python scripts/tpu_sphere_breakdown.py
echo "ALL DONE" >> $LOG

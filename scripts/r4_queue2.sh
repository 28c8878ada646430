#!/bin/bash
# Round-4 hardware queue, batch 2: LANETRIM A/B (never measured),
# tile-32 + lanetrim combination, profiler trace of planar+sphere steps.
cd /root/repo
LOG=/tmp/r4_queue2.log
: > $LOG
run() {
  echo "=== $* ($(date +%T)) ===" >> $LOG
  timeout 1500 "$@" >> $LOG 2>&1
  echo "--- rc=$? ($(date +%T))" >> $LOG
}
run python scripts/tpu_r3_item.py sphere-fb-lanetrim OMEGA_PATCH_LANETRIM=1
run python scripts/tpu_r3_item.py sphere-fb-lanetrim-wslice OMEGA_PATCH_LANETRIM=1 OMEGA_PATCH_WSLICE=1
run python scripts/tpu_sphere_breakdown.py
run python scripts/tpu_profile_trace.py
echo "ALL DONE" >> $LOG

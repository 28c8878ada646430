#!/bin/bash
# Round-5 hardware queue 4: clear the 4.63M VMEM overshoot of FB2@32x16
# with the X-roll cache cap, then re-pin the key sphere configs under
# the differenced fetch-terminated timing (the r4 numbers carry
# ~1.2 ms/step of tunnel RTT).  Run from /tmp/repo_snap.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_queue4.log}
run() {
  local t=$1; shift
  echo "### $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout "$t" python "$@" >>"$LOG" 2>&1
  echo "### rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x16 OMEGA_PATCH_XROLL=8 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x16-xr8
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x16 OMEGA_PATCH_XROLL=4 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x16-xr4
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x64 OMEGA_PATCH_XROLL=4 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x64-xr4
run 1500 scripts/tpu_r3_item.py sphere-phys-head
run 1500 scripts/tpu_r3_item.py sphere-split-head
run 1500 scripts/tpu_r3_item.py sphere-rk2-head
run 1800 scripts/tpu_r3_item.py sphere-rk4-head
echo "=== queue4 done ===" | tee -a "$LOG"

#!/bin/bash
# Round-5 hardware queue 3: differenced fetch-terminated timing (the
# tunnel's block_until_ready stopped blocking this session), FB2 A/B,
# PP81/upwind un-gate checks, and the first icos96 single-chip numbers
# via OMEGA_PLANES_ARG=1 (weight-plane stack as a runtime operand, not
# a 530 MB program constant).  Run from /tmp/repo_snap.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_queue3.log}
run() {
  local t=$1; shift
  echo "### $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout "$t" python "$@" >>"$LOG" 2>&1
  echo "### rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# validate the new bench.py timing on the flagship planar config first
OMEGA_BENCH_REPS=3 run 1200 bench.py

# FB2 staged-kernel ladder
OMEGA_PATCH_FB2=1 run 1200 scripts/tpu_r3_item.py sphere-fb-fb2-t16
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x16 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x16

# un-gate checks
OMEGA_PATCH_FB2=1 OMEGA_PATCH_PP81=1 run 1500 scripts/tpu_r3_item.py sphere-pp81-fb2
OMEGA_PATCH_FB2=1 OMEGA_PATCH_K=4 run 1500 scripts/tpu_r3_item.py sphere-upwind-fb2-k4

# bigger slab + baseline re-pin + icos96 first light
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x64 run 1800 scripts/tpu_r3_item.py sphere-fb-fb2-32x64
run 1200 scripts/tpu_r3_item.py sphere-fb-head
OMEGA_PLANES_ARG=1 OMEGA_BENCH_SUBDIV=96 run 2400 scripts/tpu_r3_item.py sphere-fb-icos96
OMEGA_PLANES_ARG=1 OMEGA_BENCH_SUBDIV=96 OMEGA_PATCH_FB2=1 run 1800 scripts/tpu_r3_item.py sphere-fb-icos96-fb2
run 1200 scripts/tpu_r3_item.py sphere-fct-head
echo "=== queue3 done ===" | tee -a "$LOG"

#!/bin/bash
# Round-5 hardware queue 2: FB2 staged-kernel A/B on the sphere
# (VERDICT items 1/3).  Run from a SNAPSHOT (/tmp/repo_snap), never the
# live repo (CLAUDE.md measurement discipline).  One process per item.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_queue2.log}
run() {
  local t=$1; shift
  echo "### $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout "$t" python "$@" >>"$LOG" 2>&1
  echo "### rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# --- FB2 staged two-kernel FB: does staging pay at t16? ---
OMEGA_PATCH_FB2=1 run 1200 scripts/tpu_r3_item.py sphere-fb-fb2-t16

# --- the tile-area lever: FB2 halves the body -> big tiles may fit ---
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x16 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x16
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x16 OMEGA_PATCH_XROLL=4 run 1500 scripts/tpu_r3_item.py sphere-fb-fb2-32x16-xr4

# --- un-gate checks: PP81 fused + upwind at K=4 under FB2 ---
OMEGA_PATCH_FB2=1 OMEGA_PATCH_PP81=1 run 1500 scripts/tpu_r3_item.py sphere-pp81-fb2
OMEGA_PATCH_FB2=1 OMEGA_PATCH_K=4 run 1500 scripts/tpu_r3_item.py sphere-upwind-fb2-k4

# --- bigger slab if 32x16 fit ---
OMEGA_PATCH_FB2=1 OMEGA_PATCH_TILE=32x64 run 1800 scripts/tpu_r3_item.py sphere-fb-fb2-32x64

# --- fused FCT timing (new in r5) + head re-pin for this tunnel session ---
run 1200 scripts/tpu_r3_item.py sphere-fct-head
run 1200 scripts/tpu_r3_item.py sphere-fb-head
echo "=== queue2 done ===" | tee -a "$LOG"

#!/bin/bash
# Round-5 hardware queue 1: planar tie-out + QU240 artifact + sphere
# pool-mode tile ladder. Run from a SNAPSHOT (/tmp/repo_snap), never the
# live repo (CLAUDE.md measurement discipline). One process per item.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_queue1.log}
run() {
  local t=$1; shift
  echo "### $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout "$t" python "$@" >>"$LOG" 2>&1
  echo "### rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# --- planar tie-out (VERDICT item 6): HEAD default, t32, parity off ---
run 1200 bench.py
run 1200 scripts/tpu_r3_item.py planar-fb-t32 OMEGA_MEGA_TILE=32
run 1200 scripts/tpu_r3_item.py planar-fb-parity0 OMEGA_MEGA_PARITY=0

# --- QU240-scale driver artifact (VERDICT item 8) ---
OMEGA_BENCH_MESH=qu240 OMEGA_BENCH_CONSERVE=1000 run 2400 bench.py

# --- sphere pool-mode ladder (VERDICT items 1/3) ---
run 1800 scripts/tpu_r3_item.py sphere-fb-head
run 1800 scripts/tpu_r3_item.py sphere-fb-pool16 OMEGA_PATCH_POOL=1
run 2400 scripts/tpu_r3_item.py sphere-fb-pool32x16 OMEGA_PATCH_POOL=1 OMEGA_PATCH_TILE=32x16
run 2400 scripts/tpu_r3_item.py sphere-fb-pool32x32 OMEGA_PATCH_POOL=1 OMEGA_PATCH_TILE=32x32
run 2400 scripts/tpu_r3_item.py sphere-fb-pool32x64 OMEGA_PATCH_POOL=1 OMEGA_PATCH_TILE=32x64
echo "=== queue1 done ===" | tee -a "$LOG"

#!/bin/bash
# Round-4 hardware queue, batch 3: composed sphere split baseline,
# science-config (wind/drag/vmix fused) A/Bs, rectangular sphere tiles.
cd /root/repo
LOG=/tmp/r4_queue3.log
: > $LOG
run() {
  echo "=== $* ($(date +%T)) ===" >> $LOG
  timeout 1500 "$@" >> $LOG 2>&1
  echo "--- rc=$? ($(date +%T))" >> $LOG
}
run python scripts/tpu_r3_item.py planar-phys
run python scripts/tpu_r3_item.py sphere-phys
run python scripts/tpu_r3_item.py sphere-fb-rect32x16 OMEGA_PATCH_TILE=32x16
run python scripts/tpu_r3_item.py sphere-fb-rect16x32 OMEGA_PATCH_TILE=16x32
run python scripts/tpu_r3_item.py sphere-split
echo "ALL DONE" >> $LOG

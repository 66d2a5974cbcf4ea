#!/bin/bash
# Round-3 serving sweep: run AFTER /tmp/tpu_battery.sh picks the ring config.
# Each point is a full bench.py headline run (BENCH_ONLY=4 skips the
# secondary configs); ~1-6 min/point depending on compile-cache hits.
# Usage: benchmarks/sweep_r3.sh [logfile]
set -u
cd "$(dirname "$0")/.."
log=${1:-/tmp/sweep_r3.log}
run() {
  echo "--- [$(date +%H:%M:%S)] $*" >> "$log"
  env "$@" BENCH_ONLY=4 timeout 1800 python bench.py >> "$log" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" >> "$log"
}
# z-block of the 16-channel ring kernels (VMEM window vs DMA granularity)
run MEDSEG_MANUAL_FETCH=1 MEDSEG_ZB16=4
run MEDSEG_MANUAL_FETCH=1 MEDSEG_ZB16=8
run MEDSEG_MANUAL_FETCH=1 MEDSEG_ZB16=16
# z-block of the C>16 kernels
run MEDSEG_MANUAL_FETCH=1 MEDSEG_ZB32=4
# tanh-approx GELU in the serving ViT (parity impact measured separately)
run MEDSEG_MANUAL_FETCH=1 MEDSEG_FAST_GELU=1
# zrow model batch (h_group * n_w; the config-4 grid is nh=10 h-rows x
# n_w=3 w-windows — test_zrow_headline_grid_structure — so h_group is a
# divisor of 10 and batch = 3*g: default TB=8 -> g=2 -> batch 6; TB=15 ->
# g=5 -> batch 15; TB=30 -> g=10 -> batch 30). Bigger batch = better ViT
# MXU shapes + amortized kernel grids, larger live intermediates. Swept
# with and without the DMA rings.
run MEDSEG_ZROW_TB=15
run MEDSEG_ZROW_TB=30
run MEDSEG_MANUAL_FETCH=1 MEDSEG_ZROW_TB=15
echo "=== sweep done $(date +%H:%M:%S) ===" >> "$log"

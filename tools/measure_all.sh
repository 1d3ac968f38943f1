#!/bin/bash
# Round-5 measurement playbook: run everything that needs the real TPU,
# strictly sequenced (1-core host: never two heavy jobs at once).
# Usage: bash tools/measure_all.sh [outdir]   (default /tmp/measure_r5)
set -u
OUT=${1:-/tmp/measure_r5}
mkdir -p "$OUT"
cd /root/repo

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok:', np.asarray((jnp.ones((128,128),jnp.bfloat16)@jnp.ones((128,128),jnp.bfloat16))[0,0]))
" >"$OUT/probe.log" 2>&1
}

echo "[$(date +%T)] probing tunnel..."
if ! probe; then
  echo "[$(date +%T)] tunnel DOWN; aborting (see $OUT/probe.log)"
  exit 3
fi
echo "[$(date +%T)] tunnel UP"

echo "[$(date +%T)] 1/4 2-D lane-fold A/B (the round-5 lever)"
timeout 2400 python tools/ablate_2d.py >"$OUT/ablate_2d.txt" 2>&1
echo "rc=$?" >>"$OUT/ablate_2d.txt"
tail -6 "$OUT/ablate_2d.txt"

echo "[$(date +%T)] 2/4 headline bench, scan2d variant"
FFMPEG_HT_TPU_KERNEL_VARIANTS=scan2d \
  timeout 3000 python bench.py >"$OUT/bench_scan2d.json" 2>"$OUT/bench_scan2d.err"
echo "rc=$?" >>"$OUT/bench_scan2d.err"
tail -1 "$OUT/bench_scan2d.json"

echo "[$(date +%T)] 3/4 headline bench, default kernel (comparison row)"
timeout 3000 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.err"
echo "rc=$?" >>"$OUT/bench.err"
tail -1 "$OUT/bench.json"

echo "[$(date +%T)] 4/4 stage profile"
timeout 1800 python tools/profile_stages.py >"$OUT/profile_stages.txt" 2>&1
echo "rc=$?" >>"$OUT/profile_stages.txt"

echo "[$(date +%T)] done; results in $OUT"
